"""ERLE quality report: ours vs the C reference, per BASELINE scenario.

The north-star quality gate is "ERLE within 1 dB of the C reference"
(BASELINE.md).  Bit-exactness (tests/test_process_e2e.py) makes the delta
exactly 0.0 dB, but this tool produces the committed EVIDENCE: it runs the
BASELINE scenario set — the 8 kHz demo path (main.cc:97-147 semantics:
msInSndCardBuf=40, echoMode via set_config), 16 kHz, dual-input (clean),
variable sndcard delay, echoMode 0-4, CNG off — through BOTH engines' source
of truth (the batched XLA path, which the fused engine is equality-gated
against) and the compiled C oracle, and reports ERLE per scenario.

Run on CPU (forced, like tests/conftest.py):  python tools/erle_report.py
Writes ERLE.json at the repo root; snapshot it as ERLE_r{N}.json per round.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"   # no-op under the axon plugin, but
import jax                            # harmless elsewhere; the config
jax.config.update("jax_platforms", "cpu")  # update is what actually works

import numpy as np


def _scene(fs: int, n_s: float, delay_ms: float, echo_gain: float,
           seed: int, noise: float = 60.0):
    """Far = speech-shaped modulated noise; near = delayed echo + local
    noise.  Returns (far, near) int16."""
    rng = np.random.default_rng(seed)
    n = int(fs * n_s)
    d = int(fs * delay_ms / 1000.0)
    t = np.arange(n + d + fs)
    env = 0.5 + 0.5 * np.sin(2 * np.pi * t / (fs // 3))
    env *= 0.3 + 0.7 * (np.sin(2 * np.pi * t / (2 * fs)) > 0)  # talk spurts
    ff = (env * rng.normal(0.0, 2800.0, t.shape)).clip(-30000, 30000)
    far = ff[d:d + n]
    near = (echo_gain * ff[:n] + rng.normal(0.0, noise, n)).clip(
        -32000, 32000)
    return far.astype(np.int16), near.astype(np.int16)


def _run_ours(fs, far, near, ms, cng, mode, clean=None):
    import jax
    import jax.numpy as jnp
    from webrtc_aecm_tpu.parallel import batch as pbatch

    B, n = far.shape
    st = pbatch.set_config_batch(
        pbatch.create_batch(B, fs),
        jnp.asarray(cng, jnp.int32), jnp.asarray(mode, jnp.int32))
    fn = jax.jit(lambda s, f, d, m, c: pbatch.run_streams(
        s, f, d, fs, m, clean=c), static_argnames=())
    if clean is None:
        fn = jax.jit(lambda s, f, d, m: pbatch.run_streams(s, f, d, fs, m))
        _, out = fn(st, jnp.asarray(far, jnp.int32),
                    jnp.asarray(near, jnp.int32), jnp.asarray(ms, jnp.int32))
    else:
        _, out = fn(st, jnp.asarray(far, jnp.int32),
                    jnp.asarray(near, jnp.int32), jnp.asarray(ms, jnp.int32),
                    jnp.asarray(clean, jnp.int32))
    return np.asarray(out, np.int32)


def _run_oracle(fs, far, near, ms, cng, mode, clean=None):
    from tests.oracle import RefAecm, get_oracle

    chunk = min(160, fs // 100)
    B, n = far.shape
    out = np.zeros((B, n), np.int16)
    ms = np.broadcast_to(np.asarray(ms), (n // chunk, B))
    for b in range(B):
        ref = RefAecm(get_oracle(), fs, cng_mode=int(np.ravel(cng)[b % np.size(cng)]),
                      echo_mode=int(np.ravel(mode)[b % np.size(mode)]))
        for c in range(n // chunk):
            sl = slice(c * chunk, (c + 1) * chunk)
            ref.buffer_farend(far[b, sl])
            o, ret = ref.process(near[b, sl],
                                 None if clean is None else clean[b, sl],
                                 int(ms[c, b]))
            assert ret in (0,), ret
            out[b, sl] = o
    return out.astype(np.int32)


def main():
    from webrtc_aecm_tpu.utils.metrics import erle_db

    report = {"unit": "dB", "scenarios": {}}
    t0 = time.time()

    def add(name, fs, far, near, out_ours, out_ref, b, skip_s=2.0):
        skip = int(fs * skip_s)
        e_ours = erle_db(near[b], out_ours[b], far[b], skip_samples=skip)
        e_ref = erle_db(near[b], out_ref[b], far[b], skip_samples=skip)
        bitexact = bool(np.array_equal(out_ours[b], out_ref[b]))
        report["scenarios"][name] = {
            "erle_ours_db": round(e_ours, 3),
            "erle_ref_db": round(e_ref, 3),
            "delta_db": round(e_ours - e_ref, 3),
            "bit_exact": bitexact,
        }
        print(f"{name:24s} ours {e_ours:7.3f} dB  ref {e_ref:7.3f} dB  "
              f"delta {e_ours - e_ref:+.3f}  bit_exact={bitexact}",
              flush=True)

    # --- 8 kHz battery: demo path (echoMode 1, main.cc:137), echoMode 0-4,
    # CNG off — one batched run with per-stream config ---
    fs, n_s = 8000, 6.0
    names = (["8k_demo_mode1"] + [f"8k_mode{m}" for m in range(5)]
             + ["8k_cng_off"])
    B = len(names)
    cng = np.array([1, 1, 1, 1, 1, 1, 0], np.int32)
    mode = np.array([1, 0, 1, 2, 3, 4, 3], np.int32)
    far = np.zeros((B, int(fs * n_s)), np.int16)
    near = np.zeros_like(far)
    for b in range(B):
        far[b], near[b] = _scene(fs, n_s, delay_ms=64.0, echo_gain=0.42,
                                 seed=100 + b)
    ours = _run_ours(fs, far, near, 40, cng, mode)
    ref = _run_oracle(fs, far, near, 40, cng, mode)
    for b, name in enumerate(names):
        add(name, fs, far, near, ours, ref, b)

    # --- 16 kHz: default config + variable sndcard delay ---
    fs, n_s = 16000, 6.0
    far = np.zeros((2, int(fs * n_s)), np.int16)
    near = np.zeros_like(far)
    far[0], near[0] = _scene(fs, n_s, delay_ms=32.0, echo_gain=0.42,
                             seed=200)
    far[1], near[1] = _scene(fs, n_s, delay_ms=48.0, echo_gain=0.42,
                             seed=201)
    n_chunks = far.shape[1] // 160
    ms = np.full((n_chunks, 2), 40, np.int32)
    ms[:, 1] += (25 * np.sin(np.arange(n_chunks) / 17.0)).astype(np.int32)
    ms[n_chunks // 2:n_chunks // 2 + 8, 1] += 90     # delay burst
    cng = np.array([1, 1], np.int32)
    mode = np.array([3, 3], np.int32)
    ours = _run_ours(fs, far, near, ms, cng, mode)
    ref = _run_oracle(fs, far, near, ms, cng, mode)
    add("16k_default", fs, far, near, ours, ref, 0)
    add("16k_variable_delay", fs, far, near, ours, ref, 1)

    # --- 16 kHz dual-input (nearendClean) ---
    far1, near1 = _scene(fs, n_s, delay_ms=32.0, echo_gain=0.42, seed=300)
    rng = np.random.default_rng(301)
    clean1 = (0.92 * near1.astype(np.float64)
              + rng.normal(0, 40, near1.shape)).clip(-32000, 32000)
    far = far1[None]
    near = near1[None]
    clean = clean1.astype(np.int16)[None]
    ours = _run_ours(fs, far, near, 40, np.array([1]), np.array([3]),
                     clean=clean)
    ref = _run_oracle(fs, far, near, 40, np.array([1]), np.array([3]),
                      clean=clean)
    add("16k_clean_input", fs, far, near, ours, ref, 0)

    deltas = [abs(s["delta_db"]) for s in report["scenarios"].values()]
    report["max_abs_delta_db"] = max(deltas)
    report["all_bit_exact"] = all(
        s["bit_exact"] for s in report["scenarios"].values())
    report["north_star_within_1db"] = report["max_abs_delta_db"] <= 1.0
    report["elapsed_s"] = round(time.time() - t0, 1)
    try:
        import subprocess
        report["commit"] = subprocess.run(
            ["git", "describe", "--always", "--dirty"], capture_output=True,
            text=True, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))).stdout.strip()
    except Exception:
        report["commit"] = "unknown"

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ERLE.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"\nmax |delta| = {report['max_abs_delta_db']} dB; "
          f"all bit-exact = {report['all_bit_exact']} -> {path}")
    return 0 if report["north_star_within_1db"] else 1


if __name__ == "__main__":
    sys.exit(main())
