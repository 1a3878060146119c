"""TPU bit-exactness check for the fused Pallas kernel path.

Runs the fused chunk step with the core path as ONE Pallas kernel
(fused.py kernel path) against the reference XLA batched path on the same
TPU, and asserts sample-exact outputs and bit-identical full state at both
sample rates.  The CPU counterpart (pure lane-major path) is
tests/test_fused.py; run this on the TPU machine after ANY change to
fused.py:

    python tools/check_fused_parity.py

Mosaic lowering traps found by this script so far: unsigned reductions
(sum in int32 instead), `rev` and i1-select_n unsupported (permutation
matmuls / logical blends), scoped-VMEM default too small for the resident
state (CompilerParams.vmem_limit_bytes).
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def check(fs: int) -> None:
    import jax
    import jax.numpy as jnp
    from webrtc_aecm_tpu import fused
    from webrtc_aecm_tpu.parallel import batch as pbatch

    B, n_chunks = 256, 150
    chunk = min(160, fs // 100)
    n = n_chunks * chunk
    rng = np.random.default_rng(0)
    t = np.arange(n + 640)
    env = 0.5 + 0.5 * np.sin(2 * np.pi * t / (fs // 3))
    ff = (env * rng.normal(0, 3000, t.shape)).clip(-30000, 30000)
    far = np.stack([ff[640 - 5 * (b % 64):640 - 5 * (b % 64) + n]
                    for b in range(B)]).astype(np.int16)
    near = (0.4 * far + rng.normal(0, 150, far.shape)
            ).clip(-32000, 32000).astype(np.int16)
    # per-(chunk, stream) sndcard delays: the mid-run burst exercises
    # DelayComp stuffing; per-stream offsets desynchronize startup lengths
    # so some streams' rings clamp partial writes while others don't —
    # driving _ring_write_gather's non-uniform (Pallas write) branch.
    ms = np.full((n_chunks, B), 40, np.int32)
    ms += 15 * (np.arange(B, dtype=np.int32) % 5)[None, :]
    ms[60:70] += 80
    ms[:20] += 23 * (np.arange(B, dtype=np.int32) % 7)[None, :]

    st = pbatch.create_batch(B, fs)
    ref_state, ref_out = jax.jit(
        lambda s, f, d: pbatch.run_streams(s, f, d, fs, jnp.asarray(ms)))(
        st, jnp.asarray(far, jnp.int32), jnp.asarray(near, jnp.int32))

    fstate = fused.create_fused(B, fs)
    fin, out = jax.jit(lambda s, f, d: fused.run_streams_fused(
        s, f, d, fs, jnp.asarray(ms), use_kernel=True))(
        fstate, jnp.asarray(far, jnp.int32), jnp.asarray(near, jnp.int32))

    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))
    back = fused.from_fused_state(fin)
    for (kp, xa), xb in zip(jax.tree_util.tree_leaves_with_path(back),
                            jax.tree_util.tree_leaves(ref_state)):
        np.testing.assert_array_equal(
            np.asarray(xa), np.asarray(xb),
            err_msg=f"state leaf {jax.tree_util.keystr(kp)}")
    print(f"fused kernel == XLA path @ {fs} Hz: outputs + full state "
          f"bit-exact ({B} streams x {n_chunks} chunks)")


def main():
    import jax
    assert jax.default_backend() == "tpu", "run on the TPU machine"
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for fs in (8000, 16000):
        check(fs)


if __name__ == "__main__":
    main()
