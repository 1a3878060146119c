"""Fused lane-major path == batched XLA path, bit-exact (CPU).

The fused module (webrtc_aecm_tpu/fused.py) re-implements the whole core
path in a lane-major layout so it can run as one Pallas kernel on TPU.
Its contract is exact equivalence with the reference XLA path
(parallel/batch.py), which the golden suite pins to the C oracle — so
equality here extends oracle bit-exactness to the fused path.  The TPU
kernel-path counterpart of this test is tools/check_fused_parity.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from webrtc_aecm_tpu import fused
from webrtc_aecm_tpu.parallel import batch as pbatch


def _scene(fs, B, n_chunks, seed=0):
    chunk = min(160, fs // 100)
    n = n_chunks * chunk
    rng = np.random.default_rng(seed)
    t = np.arange(n + 640)
    env = 0.5 + 0.5 * np.sin(2 * np.pi * t / (fs // 3))
    ff = (env * rng.normal(0, 3000, t.shape)).clip(-30000, 30000)
    far = np.stack([ff[640 - 40 * b:640 - 40 * b + n]
                    for b in range(B)]).astype(np.int16)
    near = (0.4 * far + rng.normal(0, 150, far.shape)
            ).clip(-32000, 32000).astype(np.int16)
    return far, near


def _assert_tree_equal(a, b, path=""):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves(b)
    for (kp, xa), xb in zip(la, lb):
        np.testing.assert_array_equal(
            np.asarray(xa), np.asarray(xb),
            err_msg=f"state leaf {jax.tree_util.keystr(kp)}")


@pytest.mark.parametrize("fs", [8000, 16000])
def test_fused_pure_matches_xla_path(fs):
    """Outputs and full state across startup + enabled, varying delays."""
    B, n_chunks = 8, 120
    chunk = min(160, fs // 100)
    far, near = _scene(fs, B, n_chunks)
    # per-(chunk, stream) sndcard delays: exercises EstBufDelay/DelayComp
    # under run_mask AND desynchronizes startup lengths across streams so
    # jitter-ring writes clamp (partial n_write) on some streams only
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
        s, f, d, fs, jnp.asarray(ms), use_kernel=False))(
        fstate, jnp.asarray(far, jnp.int32), jnp.asarray(near, jnp.int32))

    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))
    _assert_tree_equal(fused.from_fused_state(fin), ref_state)


def test_fused_roundtrip_layout():
    """to_fused_state / from_fused_state invert exactly."""
    st = pbatch.create_batch(4, 16000)
    back = fused.from_fused_state(fused.to_fused_state(st))
    _assert_tree_equal(back, st)


def test_fused_fft_matches_ops_fft():
    """The in-kernel roll/permutation FFT pair == ops/fft.py, bit-exact."""
    from webrtc_aecm_tpu.ops import fft as fft_mod
    t = fused.make_tables()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(-32768, 32768, (32, 128)), jnp.int32)
    re_ref, im_ref = jax.vmap(fft_mod.real_forward_fft)(x)
    re_f, im_f = fused._real_forward_fft(x.T, t)
    np.testing.assert_array_equal(np.asarray(re_f.T), np.asarray(re_ref))
    np.testing.assert_array_equal(np.asarray(im_f.T), np.asarray(im_ref))

    re = jnp.asarray(rng.integers(-32768, 32768, (32, 65)), jnp.int32)
    im = jnp.asarray(rng.integers(-32768, 32768, (32, 65)), jnp.int32)
    out_ref, sc_ref = jax.vmap(fft_mod.real_inverse_fft)(re, im)
    out_f, sc_f = fused._real_inverse_fft(re.T, im.T, t)
    np.testing.assert_array_equal(np.asarray(out_f.T), np.asarray(out_ref))
    np.testing.assert_array_equal(np.asarray(sc_f[0]), np.asarray(sc_ref))


def test_pipeline_fused_engine(tmp_path):
    """AecmPipeline(engine='fused') == engine='xla': run/step/config/
    checkpoint, including a cross-engine checkpoint resume."""
    from webrtc_aecm_tpu.models import AecmPipeline
    fs, B, n_chunks = 16000, 4, 30
    chunk = 160
    far, near = _scene(fs, B, n_chunks)

    p1 = AecmPipeline(B, fs, engine="xla")
    p2 = AecmPipeline(B, fs, engine="fused")
    np.testing.assert_array_equal(np.asarray(p1.run(far, near)),
                                  np.asarray(p2.run(far, near)))
    np.testing.assert_array_equal(p1.get_echo_paths(), p2.get_echo_paths())

    p1.set_config(1, 2)
    p2.set_config(1, 2)
    np.testing.assert_array_equal(np.asarray(p1.run(far, near)),
                                  np.asarray(p2.run(far, near)))

    o1, _ = p1.step(far[:, :chunk], near[:, :chunk])
    o2, _ = p2.step(far[:, :chunk], near[:, :chunk])
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    ck = str(tmp_path / "ck.npz")
    p2.save(ck)
    p3 = AecmPipeline(B, fs, engine="xla")
    p3.load(ck)
    np.testing.assert_array_equal(np.asarray(p3.run(far, near)),
                                  np.asarray(p1.run(far, near)))
