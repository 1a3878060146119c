"""Ablation profiling: measure the full chunk step with pieces stubbed out.

Isolated micro-benchmarks of (B, 65)-shaped ops are polluted by scan-carry
relayouts, so instead we measure the REAL serving graph repeatedly, each
time monkeypatching one stage to a near-free stub, and attribute the delta.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 30


def timeit_scan(step, init, args, n=ITERS, reps=3):
    import jax

    @jax.jit
    def run(carry):
        def body(c, _):
            s, out, w = step(c, *args)
            return s, None
        c, _ = jax.lax.scan(body, carry, None, length=n)
        return c

    t0 = time.monotonic()
    out = run(init)
    jax.block_until_ready(out)
    compile_s = time.monotonic() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic()
        out = run(init)
        jax.block_until_ready(out)
        best = min(best, time.monotonic() - t0)
    return best / n, compile_s


def main():
    import jax
    import jax.numpy as jnp
    from webrtc_aecm_tpu import core
    from webrtc_aecm_tpu import delay_estimator as de
    from webrtc_aecm_tpu.parallel import batch as pbatch

    B = int(os.environ.get("B", "1024"))
    I32 = jnp.int32
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} B={B} iters={ITERS}", flush=True)

    chunk16 = jnp.asarray(rng.integers(-3000, 3000, (B, 160)), I32)
    ms = jnp.full((B,), 40, I32)
    st16 = pbatch.create_batch(B, 16000)
    step = pbatch.make_chunk_step(16000)
    args = (chunk16, chunk16, ms)

    def measure(name):
        per, comp = timeit_scan(step, st16, args)
        print(f"{name:44s} {per * 1e3:8.3f} ms/chunk  (compile {comp:5.1f}s)",
              flush=True)
        return per

    base = measure("baseline (full)")

    # --- ablate delay estimator ---
    orig_pf, orig_afs = de.process_fix, de.add_far_spectrum_fix
    de.process_fix = lambda s, f, ns, q, rv=False: (s, jnp.asarray(0, I32))
    de.add_far_spectrum_fix = lambda s, sp, q: s
    d = measure("- delay estimator")
    de.process_fix, de.add_far_spectrum_fix = orig_pf, orig_afs

    # --- ablate comfort noise ---
    orig_cn = core.comfort_noise
    core.comfort_noise = lambda s, dfa, r, i, l: (s, r, i)
    measure("- comfort noise")
    core.comfort_noise = orig_cn

    # --- ablate channel update (NLMS + MSE arbitration) ---
    orig_uc = core.update_channel
    core.update_channel = lambda s, f, q, dfa, mu, e: (s, e)
    measure("- update_channel")
    core.update_channel = orig_uc

    # --- ablate energies/VAD ---
    orig_ce = core.calc_energies
    core.calc_energies = lambda s, f, q, n: (s, f * s.channel_stored)
    measure("- calc_energies")
    core.calc_energies = orig_ce

    # --- ablate both FFT directions ---
    orig_t2f = core.time_to_frequency_domain
    def fake_t2f(ts):
        mag = jnp.abs(ts[..., :65])
        return (jnp.asarray(3, I32), (ts[..., :65], ts[..., 63:]), mag,
                jnp.sum(mag.astype(jnp.uint32), axis=-1, dtype=jnp.uint32))
    core.time_to_frequency_domain = fake_t2f
    measure("- forward FFTs (t2f)")
    core.time_to_frequency_domain = orig_t2f

    orig_ifw = core.inverse_fft_and_window
    def fake_ifw(state, r, i, hc):
        return state, (r[..., :64] + i[..., :64]) & 0x7FFF
    core.inverse_fft_and_window = fake_ifw
    measure("- inverse FFT/OLA")
    core.inverse_fft_and_window = orig_ifw

    # --- ablate the whole Wiener/NLP per-bin section is hard to stub; skip.

    # --- ablate frame/jitter buffering: process_block -> passthrough ---
    orig_pb = core.process_block
    core.process_block = lambda s, f, d, c=None, mult=1: (s, d)
    measure("- process_block entirely (buffers only)")
    core.process_block = orig_pb


if __name__ == "__main__":
    main()
