"""Golden tests: binary-spectrum delay estimator vs the C reference."""
import numpy as np
import jax
import jax.numpy as jnp

from webrtc_aecm_tpu import delay_estimator as de
from .oracle import get_oracle


def _make_spectra(rng, n_blocks, delay_blocks):
    """Far spectra stream and a near stream = far delayed by delay_blocks."""
    far = rng.integers(0, 4000, size=(n_blocks + delay_blocks, 65)).astype(np.uint16)
    near = far[:n_blocks]                     # near lags far by `delay_blocks`
    far_stream = far[delay_blocks:delay_blocks + n_blocks]
    # far_stream[t] corresponds to near[t + delay]; i.e. the far signal seen
    # at block t equals the near content that will show up `delay` later.
    return far_stream, near


def _run_reference(o, far_stream, near_stream, far_q, near_q, robust=0):
    lib = o.lib
    farend = lib.ref_CreateDelayEstimatorFarend(65, 100)
    est = lib.ref_CreateDelayEstimator(farend, 0)
    lib.ref_InitDelayEstimatorFarend(farend)
    lib.ref_InitDelayEstimator(est)
    lib.ref_enable_robust_validation(est, robust)
    delays = []
    for f, n in zip(far_stream, near_stream):
        assert lib.ref_AddFarSpectrumFix(farend, np.ascontiguousarray(f), 65,
                                         far_q) == 0
        delays.append(lib.ref_DelayEstimatorProcessFix(
            est, np.ascontiguousarray(n), 65, near_q))
    lib.ref_FreeDelayEstimator(est)
    lib.ref_FreeDelayEstimatorFarend(farend)
    return np.array(delays)


def _run_ours(far_stream, near_stream, far_q, near_q, robust=False):
    farend = de.create_farend()
    near = de.create_near()
    if robust:
        near, ret = de.enable_robust_validation(near, 1)
        assert int(ret) == 0

    @jax.jit
    def step(carry, inputs):
        farend, near = carry
        f, n = inputs
        farend = de.add_far_spectrum_fix(farend, f, jnp.int32(far_q))
        near, delay = de.process_fix(near, farend, n, jnp.int32(near_q))
        return (farend, near), delay

    (_, _), delays = jax.lax.scan(
        step, (farend, near),
        (jnp.asarray(far_stream.astype(np.int32)),
         jnp.asarray(near_stream.astype(np.int32))))
    return np.asarray(delays)


def test_delay_estimator_matches_reference_shifted_stream():
    o = get_oracle()
    rng = np.random.default_rng(42)
    for delay in (0, 3, 17, 60):
        far, near = _make_spectra(rng, 400, delay)
        ref = _run_reference(o, far, near, 8, 8)
        ours = _run_ours(far, near, 8, 8)
        np.testing.assert_array_equal(ours, ref, err_msg=f"delay={delay}")


def test_delay_estimator_matches_reference_random_streams():
    """Uncorrelated streams: exercises the no-valid-candidate paths."""
    o = get_oracle()
    rng = np.random.default_rng(7)
    far = rng.integers(0, 3000, size=(300, 65)).astype(np.uint16)
    near = rng.integers(0, 3000, size=(300, 65)).astype(np.uint16)
    ref = _run_reference(o, far, near, 5, 11)
    ours = _run_ours(far, near, 5, 11)
    np.testing.assert_array_equal(ours, ref)


def test_delay_estimator_matches_reference_weak_farend():
    """Mostly-zero far end: exercises stationary-farend freeze paths."""
    o = get_oracle()
    rng = np.random.default_rng(8)
    far = rng.integers(0, 2, size=(200, 65)).astype(np.uint16)
    far[::3] = 0
    near = rng.integers(0, 3000, size=(200, 65)).astype(np.uint16)
    ref = _run_reference(o, far, near, 0, 0)
    ours = _run_ours(far, near, 0, 0)
    np.testing.assert_array_equal(ours, ref)


def test_delay_estimator_robust_validation_matches_reference():
    o = get_oracle()
    rng = np.random.default_rng(9)
    for delay in (5, 40):
        far, near = _make_spectra(rng, 400, delay)
        ref = _run_reference(o, far, near, 8, 8, robust=1)
        ours = _run_ours(far, near, 8, 8, robust=True)
        np.testing.assert_array_equal(ours, ref, err_msg=f"delay={delay}")


def _run_reference_float(o, far_stream, near_stream, robust=0):
    lib = o.lib
    farend = lib.ref_CreateDelayEstimatorFarend(65, 100)
    est = lib.ref_CreateDelayEstimator(farend, 0)
    lib.ref_InitDelayEstimatorFarend(farend)
    lib.ref_InitDelayEstimator(est)
    lib.ref_enable_robust_validation(est, robust)
    delays = []
    for f, n in zip(far_stream, near_stream):
        assert lib.ref_AddFarSpectrumFloat(
            farend, np.ascontiguousarray(f, np.float32), 65) == 0
        delays.append(lib.ref_DelayEstimatorProcessFloat(
            est, np.ascontiguousarray(n, np.float32), 65))
    lib.ref_FreeDelayEstimator(est)
    lib.ref_FreeDelayEstimatorFarend(farend)
    return np.array(delays)


def test_delay_estimator_float_matches_reference():
    """Float wrapper entry points (delay_estimator_wrapper.cc:264-288,478-501)."""
    o = get_oracle()
    rng = np.random.default_rng(7)
    far_stream, near_stream = _make_spectra(rng, 240, 11)
    far_f = far_stream.astype(np.float32)
    near_f = near_stream.astype(np.float32)
    ref = _run_reference_float(o, far_f, near_f)

    farend = de.create_farend(float_spectrum=True)
    near = de.create_near(float_spectrum=True)

    @jax.jit
    def step(carry, inputs):
        farend, near = carry
        f, n = inputs
        farend = de.add_far_spectrum_float(farend, f)
        near, delay = de.process_float(near, farend, n)
        return (farend, near), delay

    (_, _), delays = jax.lax.scan(
        step, (farend, near), (jnp.asarray(far_f), jnp.asarray(near_f)))
    np.testing.assert_array_equal(np.asarray(delays), ref)
