"""Batch-size sweep for the serving benchmark, per-stream distinct scenes.

Backs the docs/PERFORMANCE.md optimal-batch claim with a recorded artifact:

    python tools/bench_sweep.py            # on the TPU machine
    AECM_SWEEP="256 512 1024 2048 4096" python tools/bench_sweep.py

Unlike bench.py (one broadcast scene — fine for a throughput number since
integer DSP runtime is data-independent), every stream here gets a distinct
scene: its own delay offset into a shared far signal, its own echo gain and
local-noise realization, so no accidental cross-stream value sharing exists.
Prints one table row per batch size: wall time per audio-second and
concurrent-streams-at-1x-realtime.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_scenes(n_streams, n_samples, rate, seed=0):
    rng = np.random.default_rng(seed)
    max_delay = 640
    t = np.arange(n_samples + max_delay)
    env = 0.5 + 0.5 * np.sin(2 * np.pi * t / (rate // 3))
    far_full = (env * rng.normal(0, 3000, t.shape)).clip(-30000, 30000)
    delays = rng.integers(0, max_delay // 64, n_streams) * 64
    gains = rng.uniform(0.2, 0.6, n_streams)
    far = np.stack([far_full[max_delay - d:max_delay - d + n_samples]
                    for d in delays]).astype(np.int16)
    noise = rng.normal(0, 200, (n_streams, n_samples))
    near = (gains[:, None] * far_full[max_delay:max_delay + n_samples]
            + noise).clip(-32000, 32000).astype(np.int16)
    return far, near


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from webrtc_aecm_tpu import fused

    rate = int(os.environ.get("AECM_BENCH_RATE", "16000"))
    audio_s = float(os.environ.get("AECM_BENCH_AUDIO_S", "1.0"))
    n_samples = int(audio_s * 100) * (rate // 100)
    sizes = [int(x) for x in os.environ.get(
        "AECM_SWEEP", "256 512 1024 2048 4096").split()]

    print(f"backend={jax.default_backend()} rate={rate} audio={audio_s}s "
          f"(distinct per-stream scenes)", flush=True)
    print(f"{'B':>6} {'wall s/audio-s':>14} {'streams@1xRT':>13} "
          f"{'us/stream-chunk':>16}", flush=True)
    results = []
    for n_streams in sizes:
        far_np, near_np = make_scenes(n_streams, n_samples, rate)
        far = jnp.asarray(far_np, jnp.int32)
        near = jnp.asarray(near_np, jnp.int32)
        state0 = fused.create_fused(n_streams, rate)
        run = jax.jit(
            lambda s, f, d: fused.run_streams_fused(s, f, d, rate, 40))
        compiled = run.lower(state0, far, near).compile()
        state, out = compiled(state0, far, near)
        jax.block_until_ready(out)
        n_iters = 3
        t0 = time.monotonic()
        for _ in range(n_iters):
            state, out = compiled(state, far, near)
        jax.block_until_ready(out)
        wall = (time.monotonic() - t0) / n_iters / audio_s
        streams_rt = n_streams / wall
        us_chunk = wall / 100.0 / n_streams * 1e6
        results.append((n_streams, wall, streams_rt, us_chunk))
        print(f"{n_streams:>6} {wall:>14.3f} {streams_rt:>13.0f} "
              f"{us_chunk:>16.3f}", flush=True)

    best = max(results, key=lambda r: r[2])
    print(f"best: B={best[0]} -> {best[2]:.0f} {rate/1000:.0f} kHz streams/chip at 1x RT",
          flush=True)


if __name__ == "__main__":
    main()
