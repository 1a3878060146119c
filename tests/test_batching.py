"""Batch/sharding equivalence tests (SURVEY.md §4 item 4).

vmap(single-stream step) must equal a per-stream Python loop, a scanned
whole-signal run must equal sequential per-chunk calls, and a mesh-sharded
run on the 8-virtual-device CPU backend must equal the unsharded run.
These are the TPU analog of distributed tests: same assertions, no fake
backend (conftest forces JAX_PLATFORMS=cpu with 8 virtual devices).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webrtc_aecm_tpu import control
from webrtc_aecm_tpu.api import AecmInstance
from webrtc_aecm_tpu.models import AecmPipeline
from webrtc_aecm_tpu.parallel import (
    create_batch, make_chunk_step, make_mesh, make_sharded_step,
    run_streams, set_config_batch, shard_streams)


def _scene(rng, n_samples, delay, fs, echo_gain=0.4):
    t = np.arange(n_samples + delay)
    env = (0.5 + 0.5 * np.sin(2 * np.pi * t / (fs // 3)))
    far_full = (env * rng.normal(0, 3000, t.shape)).clip(-30000, 30000)
    far = far_full[delay:delay + n_samples]
    near = (echo_gain * far_full[:n_samples]
            + rng.normal(0, 200, n_samples)).clip(-32000, 32000)
    return far.astype(np.int16), near.astype(np.int16)


def _batch_scenes(n_streams, n_samples, fs, seed=0):
    rng = np.random.default_rng(seed)
    fars, nears = [], []
    for i in range(n_streams):
        f, n = _scene(rng, n_samples, delay=160 + 80 * i, fs=fs,
                      echo_gain=0.2 + 0.1 * i)
        fars.append(f)
        nears.append(n)
    return np.stack(fars), np.stack(nears)


@pytest.mark.parametrize("fs", [8000, 16000])
def test_vmap_equals_per_stream_loop(fs):
    n_streams, n_ms = 4, 500
    n_samples = n_ms * fs // 1000
    far, near = _batch_scenes(n_streams, n_samples, fs)
    chunk = min(160, fs // 100)

    # per-stream loop through the single-stream instance API
    loop_out = np.zeros_like(near)
    for s in range(n_streams):
        inst = AecmInstance(fs)
        for i in range(n_samples // chunk):
            sl = slice(i * chunk, (i + 1) * chunk)
            inst.buffer_farend(far[s, sl])
            o, _ = inst.process(near[s, sl], None, 40)
            loop_out[s, sl] = o

    # one scanned batched run
    state = create_batch(n_streams, fs)
    _, batch_out = jax.jit(
        lambda st, f, d: run_streams(st, f, d, fs, 40))(state, far, near)
    np.testing.assert_array_equal(np.asarray(batch_out, np.int16), loop_out)


def test_scan_equals_sequential_chunk_steps():
    fs, n_streams = 8000, 3
    n_samples = 8000
    far, near = _batch_scenes(n_streams, n_samples, fs, seed=1)
    chunk = 80

    step = jax.jit(make_chunk_step(fs))
    state = create_batch(n_streams, fs)
    ms = jnp.full((n_streams,), 40, jnp.int32)
    seq_out = np.zeros_like(near)
    for i in range(n_samples // chunk):
        sl = slice(i * chunk, (i + 1) * chunk)
        state, out, _ = step(state, far[:, sl], near[:, sl], ms)
        seq_out[:, sl] = np.asarray(out, np.int16)

    state2 = create_batch(n_streams, fs)
    _, scan_out = jax.jit(
        lambda st, f, d: run_streams(st, f, d, fs, 40))(state2, far, near)
    np.testing.assert_array_equal(np.asarray(scan_out, np.int16), seq_out)


def test_sharded_run_equals_unsharded():
    fs = 8000
    n_devices = jax.device_count()
    assert n_devices == 8
    n_streams = 2 * n_devices
    n_samples = 4000
    far, near = _batch_scenes(n_streams, n_samples, fs, seed=2)

    state = create_batch(n_streams, fs)
    _, ref_out = jax.jit(
        lambda st, f, d: run_streams(st, f, d, fs, 40))(state, far, near)

    mesh = make_mesh()
    sstate = shard_streams(create_batch(n_streams, fs), mesh)
    sfar = shard_streams(jnp.asarray(far, jnp.int32), mesh)
    snear = shard_streams(jnp.asarray(near, jnp.int32), mesh)
    step = make_sharded_step(fs, mesh)
    ms = shard_streams(jnp.full((n_streams,), 40, jnp.int32), mesh)
    chunk = 80
    sh_out = np.zeros_like(near)
    for i in range(n_samples // chunk):
        sl = slice(i * chunk, (i + 1) * chunk)
        sstate, out, _ = step(sstate, sfar[:, sl], snear[:, sl], ms)
        sh_out[:, sl] = np.asarray(out, np.int16)
    np.testing.assert_array_equal(sh_out, np.asarray(ref_out, np.int16))


def test_per_stream_config():
    """Different echoMode/cngMode per stream within one batch."""
    fs, n_samples = 8000, 2400
    far, near = _batch_scenes(5, n_samples, fs, seed=3)
    state = create_batch(5, fs)
    state = set_config_batch(state, jnp.ones((5,), jnp.int32),
                             jnp.arange(5, dtype=jnp.int32))
    _, batch_out = jax.jit(
        lambda st, f, d: run_streams(st, f, d, fs, 40))(state, far, near)

    for mode in range(5):
        inst = AecmInstance(fs, cng_mode=1, echo_mode=mode)
        for i in range(n_samples // 80):
            sl = slice(i * 80, (i + 1) * 80)
            inst.buffer_farend(far[mode, sl])
            o, _ = inst.process(near[mode, sl], None, 40)
            np.testing.assert_array_equal(
                np.asarray(batch_out[mode, sl], np.int16), o,
                err_msg=f"mode={mode} chunk={i}")


def test_pipeline_run_and_erle():
    """Flagship pipeline end-to-end: echo reduced, state persists."""
    from webrtc_aecm_tpu.utils import erle_db
    fs = 16000
    n_samples = 3 * fs  # 3 s for convergence
    far, near = _batch_scenes(2, n_samples, fs, seed=4)
    pipe = AecmPipeline(2, fs, echo_mode=3)
    out = np.asarray(pipe.run(far, near), np.int16)
    for s in range(2):
        e = erle_db(near[s], out[s], far[s], skip_samples=fs)
        assert e > 5.0, f"stream {s}: ERLE {e:.2f} dB too low"


def test_pipeline_echo_path_roundtrip():
    pipe = AecmPipeline(3, 8000)
    far, near = _batch_scenes(3, 1600, 8000, seed=5)
    pipe.run(far, near)
    paths = pipe.get_echo_paths()
    assert paths.shape == (3, 65)
    pipe2 = AecmPipeline(3, 8000)
    pipe2.init_echo_paths(paths)
    np.testing.assert_array_equal(pipe2.get_echo_paths(), paths)


def test_pipeline_reset_streams():
    """Resetting one stream mid-call re-runs its startup; others continue
    bit-identically to an undisturbed run."""
    fs = 8000
    far, near = _batch_scenes(3, 4000, fs, seed=9)
    a = AecmPipeline(3, fs)
    b = AecmPipeline(3, fs)

    a.run(far[:, :2000], near[:, :2000])
    b.run(far[:, :2000], near[:, :2000])
    a.reset_streams([1])

    out_a = np.asarray(a.run(far[:, 2000:], near[:, 2000:]), np.int16)
    out_b = np.asarray(b.run(far[:, 2000:], near[:, 2000:]), np.int16)
    # untouched streams identical
    np.testing.assert_array_equal(out_a[0], out_b[0])
    np.testing.assert_array_equal(out_a[2], out_b[2])
    # reset stream re-enters startup passthrough (differs from continuation)
    assert not np.array_equal(out_a[1], out_b[1])
    # and matches a stream that was freshly created at that point
    c = AecmPipeline(1, fs)
    out_c = np.asarray(c.run(far[1:2, 2000:], near[1:2, 2000:]), np.int16)
    np.testing.assert_array_equal(out_a[1], out_c[0])


def test_pipeline_checkpoint_resume(tmp_path):
    """save()/load(): a resumed pipeline continues bit-identically."""
    fs = 8000
    far, near = _batch_scenes(2, 4000, fs, seed=11)
    a = AecmPipeline(2, fs)
    a.run(far[:, :2000], near[:, :2000])
    ckpt = str(tmp_path / "state.npz")
    a.save(ckpt)

    b = AecmPipeline(2, fs)
    b.load(ckpt)
    out_a = np.asarray(a.run(far[:, 2000:], near[:, 2000:]), np.int16)
    out_b = np.asarray(b.run(far[:, 2000:], near[:, 2000:]), np.int16)
    np.testing.assert_array_equal(out_a, out_b)

    c = AecmPipeline(3, fs)
    with pytest.raises(ValueError):
        c.load(ckpt)


def test_sharded_step_with_clean_input():
    """make_sharded_step(has_clean=True) equals the unsharded clean path."""
    fs = 8000
    n_streams = 8
    far, near = _batch_scenes(n_streams, 1600, fs, seed=13)
    clean = near  # reference demo passes the same buffer

    mesh = make_mesh()
    sstate = shard_streams(create_batch(n_streams, fs), mesh)
    step = make_sharded_step(fs, mesh, has_clean=True)
    ms = shard_streams(jnp.full((n_streams,), 40, jnp.int32), mesh)
    sfar = shard_streams(jnp.asarray(far, jnp.int32), mesh)
    snear = shard_streams(jnp.asarray(near, jnp.int32), mesh)
    sclean = shard_streams(jnp.asarray(clean, jnp.int32), mesh)

    ref_state = create_batch(n_streams, fs)
    ref_step = jax.jit(make_chunk_step(fs, has_clean=True))
    ms_ref = jnp.full((n_streams,), 40, jnp.int32)

    for i in range(1600 // 80):
        sl = slice(i * 80, (i + 1) * 80)
        sstate, s_out, _ = step(sstate, sfar[:, sl], snear[:, sl],
                                sclean[:, sl], ms)
        ref_state, r_out, _ = ref_step(ref_state, far[:, sl], near[:, sl],
                                       clean[:, sl], ms_ref)
        np.testing.assert_array_equal(np.asarray(s_out), np.asarray(r_out),
                                      err_msg=f"chunk {i}")
