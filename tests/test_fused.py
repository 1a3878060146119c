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


def test_fused_sharded_step_equals_unsharded():
    """make_sharded_step_fused over the 8-virtual-CPU mesh == the plain
    fused step — the multi-chip serving configuration, bit-exact."""
    from webrtc_aecm_tpu.parallel import (
        make_mesh, make_sharded_step_fused, shard_streams,
        shard_streams_fused)
    fs = 16000
    n_devices = jax.device_count()
    assert n_devices == 8
    B = 2 * n_devices
    n_chunks = 40
    chunk = 160
    far, near = _scene(fs, B, n_chunks, seed=5)

    st = fused.create_fused(B, fs)
    _, ref_out = jax.jit(lambda s, f, d: fused.run_streams_fused(
        s, f, d, fs, 40))(st, jnp.asarray(far, jnp.int32),
                          jnp.asarray(near, jnp.int32))

    mesh = make_mesh()
    sstate = shard_streams_fused(fused.create_fused(B, fs), mesh)
    sfar = shard_streams(jnp.asarray(far, jnp.int32), mesh)
    snear = shard_streams(jnp.asarray(near, jnp.int32), mesh)
    ms = shard_streams(jnp.full((B,), 40, jnp.int32), mesh)
    step = make_sharded_step_fused(fs, mesh)
    out = np.zeros((B, n_chunks * chunk), np.int32)
    for i in range(n_chunks):
        sl = slice(i * chunk, (i + 1) * chunk)
        sstate, o, _ = step(sstate, sfar[:, sl], snear[:, sl], ms)
        out[:, sl] = np.asarray(o)
    np.testing.assert_array_equal(out, np.asarray(ref_out))


def test_fused_per_stream_config_and_abs_approx():
    """Per-stream cng/echo-mode and the abs_approx option through the
    fused path == the XLA path (config parity beyond the defaults)."""
    from webrtc_aecm_tpu.parallel import batch as pbatch
    fs, B, n_chunks = 8000, 8, 60
    far, near = _scene(fs, B, n_chunks, seed=7)
    cng = np.arange(B, dtype=np.int32) % 2
    mode = np.arange(B, dtype=np.int32) % 5

    st = pbatch.set_config_batch(pbatch.create_batch(B, fs), cng, mode)
    _, ref_out = jax.jit(lambda s, f, d: pbatch.run_streams(
        s, f, d, fs, 40))(st, jnp.asarray(far, jnp.int32),
                          jnp.asarray(near, jnp.int32))

    fstate = fused.to_fused_state(st)
    _, out = jax.jit(lambda s, f, d: fused.run_streams_fused(
        s, f, d, fs, 40, use_kernel=False))(
        fstate, jnp.asarray(far, jnp.int32), jnp.asarray(near, jnp.int32))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))

    # abs_approx (AECM_WITH_ABS_APPROX magnitude): fused pure path vs the
    # XLA path built with the same Option
    from webrtc_aecm_tpu import control
    from webrtc_aecm_tpu import core as core_mod
    opts = core_mod.Options(abs_approx=True)
    one = jax.tree_util.tree_map(
        lambda leaf: jnp.broadcast_to(leaf, (B,) + jnp.shape(leaf)),
        control.create(fs))
    step_ref = jax.vmap(lambda s, f, d, m: control.process(
        s, d, None, 80, m, fs, opts))
    buf_ref = jax.vmap(lambda s, f: control.buffer_farend(s, f, 1))

    fstate = fused.to_fused_state(one)
    step_f = fused.make_fused_chunk_step(fs, use_kernel=False,
                                         abs_approx=True)

    @jax.jit
    def run_ref(st, f, d):
        def body(s, xs):
            ff, dd = xs
            s = buf_ref(s, ff)
            s, out, w = step_ref(s, ff, dd, jnp.full((B,), 40, jnp.int32))
            return s, out
        return jax.lax.scan(body, st, (f, d))

    @jax.jit
    def run_f(st, f, d):
        def body(s, xs):
            ff, dd = xs
            s, out, w = step_f(s, ff, dd, 40)
            return s, out
        return jax.lax.scan(body, st, (f, d))

    far_t = jnp.asarray(far, jnp.int32).reshape(B, n_chunks, 80
                                                ).transpose(1, 0, 2)
    near_t = jnp.asarray(near, jnp.int32).reshape(B, n_chunks, 80
                                                  ).transpose(1, 0, 2)
    _, ref_o = run_ref(one, far_t, near_t)
    _, f_o = run_f(fstate, far_t, near_t)
    np.testing.assert_array_equal(np.asarray(f_o), np.asarray(ref_o))
