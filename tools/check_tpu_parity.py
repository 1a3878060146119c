"""TPU-vs-CPU bit-exactness check for the full batched pipeline.

The pytest suite runs on the CPU backend (tests/conftest.py); this script
is the TPU-hardware counterpart: it runs the identical batched workload on
the TPU backend (Pallas ring kernels + batched-major FFT engaged) and on
the CPU backend (lax paths) in a subprocess, and asserts sample-exact
equality.  Run it on a machine with the TPU attached:

    python tools/check_tpu_parity.py

Caught real bugs already: the CNG bilinear table lookup as an f32 matmul
silently ran at bf16 MXU precision on TPU (fixed: integer masked sums),
and tpu.dynamic_rotate's negative-shift miscompile (fixed: positive-shift
formulation in ops/pallas_ring.py).
"""
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from parity_artifact import record  # noqa: E402  (tools/parity_artifact.py)

CPU_LEG = r"""
import sys, numpy as np
sys.path.insert(0, {repo!r})
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from webrtc_aecm_tpu.parallel import batch as pbatch
far = np.load({far!r}); near = np.load({near!r})
fs, B = {fs}, far.shape[0]
st = pbatch.create_batch(B, fs)
_, out = jax.jit(lambda s, f, d: pbatch.run_streams(s, f, d, fs, 40))(
    st, jnp.asarray(far, jnp.int32), jnp.asarray(near, jnp.int32))
np.save({out!r}, np.asarray(out))
"""


def main():
    import jax
    import jax.numpy as jnp
    from webrtc_aecm_tpu.parallel import batch as pbatch

    assert jax.default_backend() == "tpu", "run on the TPU machine"
    fs, B, n = 16000, 8, 16000
    rng = np.random.default_rng(0)
    t = np.arange(n + 640)
    env = 0.5 + 0.5 * np.sin(2 * np.pi * t / (fs // 3))
    ff = (env * rng.normal(0, 3000, t.shape)).clip(-30000, 30000)
    far = np.stack([ff[640 - 40 * b:640 - 40 * b + n]
                    for b in range(B)]).astype(np.int16)
    near = (0.4 * ff[:n] + rng.normal(0, 150, n)).clip(-32000, 32000
                                                       ).astype(np.int16)
    near = np.broadcast_to(near, (B, n)).copy()

    d = tempfile.mkdtemp()
    fp, np_, op = f"{d}/far.npy", f"{d}/near.npy", f"{d}/cpu.npy"
    np.save(fp, far)
    np.save(np_, near)
    subprocess.run([sys.executable, "-c", CPU_LEG.format(
        repo=REPO, far=fp, near=np_, out=op, fs=fs)], check=True)
    cpu = np.load(op)

    st = pbatch.create_batch(B, fs)
    desc = f"{fs} Hz xla-batched path ({B} streams x {n} samples)"
    try:
        _, out = jax.jit(
            lambda s, f, dd: pbatch.run_streams(s, f, dd, fs, 40))(
            st, jnp.asarray(far, jnp.int32), jnp.asarray(near, jnp.int32))
        np.testing.assert_array_equal(np.asarray(out), cpu)
    except Exception as e:
        record("tpu_vs_cpu_full_pipeline", ok=False, configs=[desc],
               error=f"{type(e).__name__}: {e}"[:500])
        raise
    record("tpu_vs_cpu_full_pipeline", ok=True, configs=[desc])
    print("TPU == CPU: bit-exact over", B, "streams x", n, "samples")


if __name__ == "__main__":
    main()
