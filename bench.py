"""Benchmark: concurrent 16 kHz AECM streams per chip at 1x real time.

Runs the flagship batched pipeline (vmap over streams, lax.scan over 10 ms
chunks — one device dispatch per measured run) on the default JAX backend
and reports how many concurrent 16 kHz streams one chip sustains at 1x real
time.  North star (BASELINE.json): >= 1000 streams/chip; vs_baseline is
measured/1000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _log(msg: str) -> None:
    print(f"[bench +{time.monotonic() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


_T0 = time.monotonic()


def main() -> None:
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: XLA compile of the serving graph takes
    # minutes (remote compile service, variable load); cache hits are free.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from webrtc_aecm_tpu import fused

    rate = 16000
    chunk = rate // 100
    n_streams = int(os.environ.get("AECM_BENCH_STREAMS", "4096"))
    audio_s = float(os.environ.get("AECM_BENCH_AUDIO_S", "1.0"))
    # Superchunk depth (10 ms chunks fused per kernel call); bit-identical
    # for any value — throughput/latency trade only.  0 = engine default.
    cps = int(os.environ.get("AECM_BENCH_CPS", "0")) or None
    n_chunks = int(audio_s * 100)
    n_samples = n_chunks * chunk

    rng = np.random.default_rng(0)
    # Realistic echo scene: modulated far-end noise, attenuated echo + local
    # speech-like noise at the near end (keeps VAD/NLMS/CNG paths all live).
    t = np.arange(n_samples + chunk)
    env = 0.5 + 0.5 * np.sin(2 * np.pi * t / (rate // 3))
    far_full = (env * rng.normal(0, 3000, t.shape)).clip(-30000, 30000)
    far1 = far_full[chunk:].astype(np.int16)
    near1 = (0.4 * far_full[:n_samples]
             + rng.normal(0, 200, n_samples)).clip(-32000, 32000
                                                   ).astype(np.int16)
    far = jnp.asarray(np.broadcast_to(far1, (n_streams, n_samples)),
                      jnp.int32)
    near = jnp.asarray(np.broadcast_to(near1, (n_streams, n_samples)),
                       jnp.int32)

    _log(f"backend={jax.default_backend()} streams={n_streams} "
         f"audio={audio_s}s")
    # Flagship serving path: the fused lane-major pipeline — whole core
    # path as one Pallas kernel per chunk (webrtc_aecm_tpu/fused.py),
    # bit-exact with the XLA path and the C oracle.
    state0 = fused.create_fused(n_streams, rate)
    run = jax.jit(lambda s, f, d: fused.run_streams_fused(
        s, f, d, rate, 40, chunks_per_step=cps))

    # Warmup: compile + one full run (also converges NLMS once).
    compiled = run.lower(state0, far, near).compile()
    _log("compiled")
    state, out = compiled(state0, far, near)
    jax.block_until_ready(out)
    _log("warmup run done")

    n_iters = 3
    t0 = time.monotonic()
    for _ in range(n_iters):
        state, out = compiled(state, far, near)
    jax.block_until_ready(out)
    wall = (time.monotonic() - t0) / n_iters
    _log(f"measured {wall:.3f}s per {audio_s}s x {n_streams} streams")

    # stream-seconds of audio processed per wall-second = number of
    # concurrent streams sustainable at exactly 1x real time.
    streams_at_rt = n_streams * audio_s / wall
    baseline = 1000.0  # BASELINE.json north star
    print(json.dumps({
        "metric": "concurrent_16khz_streams_per_chip_at_1x_rt",
        "value": round(streams_at_rt, 1),
        "unit": "streams",
        "vs_baseline": round(streams_at_rt / baseline, 3),
    }))


if __name__ == "__main__":
    main()
