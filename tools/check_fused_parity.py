"""TPU bit-exactness check for the fused Pallas kernel path.

Runs the fused chunk step with the core path as ONE Pallas kernel
(fused.py kernel path) against the reference XLA batched path on the same
TPU, and asserts sample-exact outputs and bit-identical full state at both
sample rates — single-input and dual-input (clean), superchunk schedules
(incl. the non-dividing tail) and the per-chunk real-time step.  The CPU
counterpart (pure lane-major path) is tests/test_fused.py; run this on
the TPU machine after ANY change to fused.py:

    python tools/check_fused_parity.py

On success (and on failure) it records the result matrix + commit hash in
PARITY.json at the repo root — committed each round as the parity-gate
artifact (the Mosaic lowering traps this script exists for only reproduce
on real hardware: unsigned reductions, `rev`/i1-select_n, dynamic-rotate
miscompiles, scoped-VMEM limits).
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from parity_artifact import record  # noqa: E402  (tools/parity_artifact.py)


def _scene(fs, B, n_chunks, with_clean, echo_delay_blocks=0):
    chunk = min(160, fs // 100)
    n = n_chunks * chunk
    rng = np.random.default_rng(0)
    t = np.arange(n + 640)
    env = 0.5 + 0.5 * np.sin(2 * np.pi * t / (fs // 3))
    ff = (env * rng.normal(0, 3000, t.shape)).clip(-30000, 30000)
    far = np.stack([ff[640 - 5 * (b % 64):640 - 5 * (b % 64) + n]
                    for b in range(B)]).astype(np.int16)
    if echo_delay_blocks:
        # deep echo path: the aligned-farend fetch reads ~echo_delay_blocks
        # behind the newest far block (circular-history wrap coverage)
        d = echo_delay_blocks * 64
        echo = np.zeros_like(far)
        echo[:, d:] = far[:, :-d]
        far_src = echo
    else:
        far_src = far
    near = (0.4 * far_src + rng.normal(0, 150, far.shape)
            ).clip(-32000, 32000).astype(np.int16)
    clean = None
    if with_clean:
        clean = (0.35 * far + rng.normal(0, 120, far.shape)
                 ).clip(-32000, 32000).astype(np.int16)
    # per-(chunk, stream) sndcard delays: the mid-run burst exercises
    # DelayComp stuffing; per-stream offsets desynchronize startup lengths
    # so some streams' rings clamp partial writes while others don't —
    # driving _ring_write_gather's non-uniform (Pallas write) branch and
    # mid-superchunk startup transitions.
    ms = np.full((n_chunks, B), 40, np.int32)
    ms += 15 * (np.arange(B, dtype=np.int32) % 5)[None, :]
    ms[60:70] += 80
    ms[:20] += 23 * (np.arange(B, dtype=np.int32) % 7)[None, :]
    return far, near, clean, ms


def check(fs: int, with_clean: bool, chunks_per_step=None,
          n_chunks: int = 150, lookahead_cap: int = 1,
          echo_delay_blocks: int = 0) -> str:
    import jax
    import jax.numpy as jnp
    from webrtc_aecm_tpu import fused
    from webrtc_aecm_tpu.parallel import batch as pbatch

    B = 256
    far, near, clean, ms = _scene(fs, B, n_chunks, with_clean,
                                  echo_delay_blocks)
    cj = None if clean is None else jnp.asarray(clean, jnp.int32)

    def make_state():
        st = pbatch.create_batch(B, fs)
        if lookahead_cap > 1:
            # reconfigured delay estimator: wider near history + runtime
            # per-stream lookahead (delay_estimator.cc:536-543)
            dn = st.core.de_near
            st = st._replace(core=st.core._replace(de_near=dn._replace(
                binary_history=jnp.zeros((B, lookahead_cap), jnp.uint32),
                lookahead=(jnp.arange(B, dtype=jnp.int32) % lookahead_cap))))
        return st

    st = make_state()
    ref_state, ref_out = jax.jit(
        lambda s, f, d, c: pbatch.run_streams(s, f, d, fs, jnp.asarray(ms),
                                              clean=c))(
        st, jnp.asarray(far, jnp.int32), jnp.asarray(near, jnp.int32), cj)

    fstate = fused.to_fused_state(make_state())
    fin, out = jax.jit(lambda s, f, d, c: fused.run_streams_fused(
        s, f, d, fs, jnp.asarray(ms), use_kernel=True, clean=c,
        chunks_per_step=chunks_per_step))(
        fstate, jnp.asarray(far, jnp.int32), jnp.asarray(near, jnp.int32),
        cj)

    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))
    back = fused.from_fused_state(fin)
    for (kp, xa), xb in zip(jax.tree_util.tree_leaves_with_path(back),
                            jax.tree_util.tree_leaves(ref_state)):
        np.testing.assert_array_equal(
            np.asarray(xa), np.asarray(xb),
            err_msg=f"state leaf {jax.tree_util.keystr(kp)}")
    desc = (f"{fs} Hz {'dual-input' if with_clean else 'single-input'} "
            f"cps={chunks_per_step or 'default'} "
            + (f"lookahead_cap={lookahead_cap} " if lookahead_cap > 1 else "")
            + (f"echo_delay={echo_delay_blocks}blk "
               if echo_delay_blocks else "")
            + f"({B} streams x {n_chunks} chunks)")
    print(f"fused kernel == XLA path @ {desc}: outputs + full state "
          f"bit-exact")
    return desc


def main():
    import jax
    assert jax.default_backend() == "tpu", "run on the TPU machine"
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    configs = [
        dict(fs=8000, with_clean=False),              # superchunk 4 + tail
        dict(fs=16000, with_clean=False),             # superchunk 2
        dict(fs=8000, with_clean=True),
        dict(fs=16000, with_clean=True),
        dict(fs=16000, with_clean=False, chunks_per_step=1,
             n_chunks=60),                            # real-time step path
        dict(fs=16000, with_clean=False, n_chunks=60,
             lookahead_cap=4),                        # reconfigured DE
        dict(fs=16000, with_clean=False, n_chunks=60,
             echo_delay_blocks=70),                   # deep circular fetch
    ]
    done = []
    try:
        for cfg in configs:
            done.append(check(**cfg))
    except Exception as e:
        record("fused_kernel_vs_xla", ok=False, configs=done,
               error=f"{type(e).__name__}: {e}"[:500])
        raise
    record("fused_kernel_vs_xla", ok=True, configs=done)


if __name__ == "__main__":
    main()
