"""Golden tests: delay-estimator runtime reconfiguration vs the C reference.

Covers the wrapper config surface the round-1 build lacked
(delay_estimator_wrapper.cc:227-445): lookahead (creation-time and
set_lookahead), allowed_offset, runtime robust-validation toggling,
the SoftReset pair, and set_history_size resizing.
"""
import numpy as np
import jax
import jax.numpy as jnp

from webrtc_aecm_tpu import delay_estimator as de
from .oracle import get_oracle
from .test_delay_estimator import _make_spectra


class RefDE:
    """Stateful handle over the reference wrapper API."""

    def __init__(self, o, history_size=100, max_lookahead=0, robust=0):
        self.lib = o.lib
        self.farend = self.lib.ref_CreateDelayEstimatorFarend(65, history_size)
        self.est = self.lib.ref_CreateDelayEstimator(self.farend,
                                                     max_lookahead)
        assert self.lib.ref_InitDelayEstimatorFarend(self.farend) == 0
        assert self.lib.ref_InitDelayEstimator(self.est) == 0
        assert self.lib.ref_enable_robust_validation(self.est, robust) == 0

    def step(self, far_spec, near_spec, far_q=8, near_q=8):
        assert self.lib.ref_AddFarSpectrumFix(
            self.farend, np.ascontiguousarray(far_spec), 65, far_q) == 0
        return self.lib.ref_DelayEstimatorProcessFix(
            self.est, np.ascontiguousarray(near_spec), 65, near_q)

    def __del__(self):
        try:
            self.lib.ref_FreeDelayEstimator(self.est)
            self.lib.ref_FreeDelayEstimatorFarend(self.farend)
        except Exception:
            pass


class OurDE:
    """Same streaming interface over our functional state."""

    def __init__(self, history_size=100, max_lookahead=0, robust=False):
        self.farend = de.create_farend(history_size)
        self.near = de.create_near(history_size, max_lookahead=max_lookahead,
                                   robust_validation=robust)

    def run(self, far_stream, near_stream, far_q=8, near_q=8):
        @jax.jit
        def step(carry, inputs):
            farend, near = carry
            f, n = inputs
            farend = de.add_far_spectrum_fix(farend, f, jnp.int32(far_q))
            near, delay = de.process_fix(near, farend, n, jnp.int32(near_q))
            return (farend, near), delay

        (self.farend, self.near), delays = jax.lax.scan(
            step, (self.farend, self.near),
            (jnp.asarray(np.asarray(far_stream, np.int32)),
             jnp.asarray(np.asarray(near_stream, np.int32))))
        return np.asarray(delays)


def _segments(rng, n_blocks, delay):
    far, near = _make_spectra(rng, n_blocks, delay)
    return far, near


def test_lookahead_from_creation():
    """max_lookahead > 0 exercises the near-history shift path
    (delay_estimator.cc:536-543), dead at the AECM default of 0."""
    o = get_oracle()
    rng = np.random.default_rng(30)
    for la in (1, 4, 7):
        far, near = _segments(rng, 300, 12)
        ref = RefDE(o, max_lookahead=la)
        assert o.lib.ref_lookahead(ref.est) == la
        ours = OurDE(max_lookahead=la)
        assert int(de.lookahead(ours.near)) == la
        ref_delays = [ref.step(f, n) for f, n in zip(far, near)]
        np.testing.assert_array_equal(ours.run(far, near), ref_delays,
                                      err_msg=f"lookahead={la}")


def test_set_lookahead_mid_stream():
    o = get_oracle()
    rng = np.random.default_rng(31)
    far, near = _segments(rng, 400, 20)
    ref = RefDE(o, max_lookahead=6)
    ours = OurDE(max_lookahead=6)

    # Out-of-range requests are rejected, state unchanged.
    assert o.lib.ref_set_lookahead(ref.est, 7) == -1
    assert o.lib.ref_set_lookahead(ref.est, -1) == -1
    ours_near, ret = de.set_lookahead(ours.near, 7)
    assert int(ret) == -1 and int(ours_near.lookahead) == 6
    ours_near, ret = de.set_lookahead(ours.near, -1)
    assert int(ret) == -1 and int(ours_near.lookahead) == 6

    ref_delays = [ref.step(f, n) for f, n in zip(far[:200], near[:200])]
    our_delays = list(ours.run(far[:200], near[:200]))

    assert o.lib.ref_set_lookahead(ref.est, 2) == 2
    ours.near, ret = de.set_lookahead(ours.near, 2)
    assert int(ret) == 2

    ref_delays += [ref.step(f, n) for f, n in zip(far[200:], near[200:])]
    our_delays += list(ours.run(far[200:], near[200:]))
    np.testing.assert_array_equal(our_delays, ref_delays)


def test_allowed_offset_with_robust_validation():
    """allowed_offset shapes the histogram-validation fraction
    (delay_estimator.cc:190-205); only observable with robust on."""
    o = get_oracle()
    rng = np.random.default_rng(32)
    far, near = _segments(rng, 400, 25)
    ref = RefDE(o, robust=1)
    ours = OurDE(robust=True)

    assert o.lib.ref_set_allowed_offset(ref.est, -1) == -1
    assert o.lib.ref_set_allowed_offset(ref.est, 3) == 0
    assert o.lib.ref_get_allowed_offset(ref.est) == 3
    ours.near, ret = de.set_allowed_offset(ours.near, -1)
    assert int(ret) == -1 and int(de.get_allowed_offset(ours.near)) == 0
    ours.near, ret = de.set_allowed_offset(ours.near, 3)
    assert int(ret) == 0 and int(de.get_allowed_offset(ours.near)) == 3

    ref_delays = [ref.step(f, n) for f, n in zip(far, near)]
    np.testing.assert_array_equal(ours.run(far, near), ref_delays)


def test_runtime_robust_validation_toggle():
    """The reference toggles robust validation per instance at runtime
    (delay_estimator_wrapper.cc:424-437); ours is traced state."""
    o = get_oracle()
    rng = np.random.default_rng(33)
    far, near = _segments(rng, 450, 15)
    ref = RefDE(o)
    ours = OurDE()
    assert o.lib.ref_is_robust_validation_enabled(ref.est) == 0
    assert int(de.is_robust_validation_enabled(ours.near)) == 0

    ref_delays = [ref.step(f, n) for f, n in zip(far[:150], near[:150])]
    our_delays = list(ours.run(far[:150], near[:150]))

    assert o.lib.ref_enable_robust_validation(ref.est, 1) == 0
    ours.near, ret = de.enable_robust_validation(ours.near, 1)
    assert int(ret) == 0 and int(de.is_robust_validation_enabled(ours.near))

    ref_delays += [ref.step(f, n) for f, n in zip(far[150:300], near[150:300])]
    our_delays += list(ours.run(far[150:300], near[150:300]))

    assert o.lib.ref_enable_robust_validation(ref.est, 2) == -1
    ours.near, ret = de.enable_robust_validation(ours.near, 2)
    assert int(ret) == -1 and int(de.is_robust_validation_enabled(ours.near))

    assert o.lib.ref_enable_robust_validation(ref.est, 0) == 0
    ours.near, ret = de.enable_robust_validation(ours.near, 0)
    assert int(ret) == 0

    ref_delays += [ref.step(f, n) for f, n in zip(far[300:], near[300:])]
    our_delays += list(ours.run(far[300:], near[300:]))
    np.testing.assert_array_equal(our_delays, ref_delays)


def test_soft_reset_mid_stream():
    """SoftReset shifts the far histories and absorbs the remainder into
    the lookahead (delay_estimator.cc:336-367, 506-519)."""
    o = get_oracle()
    rng = np.random.default_rng(34)
    far, near = _segments(rng, 500, 18)
    ref = RefDE(o, max_lookahead=4)
    ours = OurDE(max_lookahead=4)

    ref_delays = [ref.step(f, n) for f, n in zip(far[:250], near[:250])]
    our_delays = list(ours.run(far[:250], near[:250]))

    for shift in (3, -2, 10):
        ref_applied = o.lib.ref_SoftResetDelayEstimator(ref.est, shift)
        o.lib.ref_SoftResetDelayEstimatorFarend(ref.farend, shift)
        ours.near, applied = de.soft_reset_near(ours.near, shift)
        ours.farend = de.soft_reset_farend(ours.farend, shift)
        assert int(applied) == ref_applied, f"shift={shift}"

    ref_delays += [ref.step(f, n) for f, n in zip(far[250:], near[250:])]
    our_delays += list(ours.run(far[250:], near[250:]))
    np.testing.assert_array_equal(our_delays, ref_delays)


def test_set_history_size_resize():
    """set_history_size reallocates histories mid-stream
    (delay_estimator_wrapper.cc:363-377, delay_estimator.cc:445-494).
    Shrink keeps the prefix; growth zero-fills from the old size.  The
    scenario keeps the converged delay inside the shrunken window so no
    reference out-of-bounds dummy reads are involved."""
    o = get_oracle()
    rng = np.random.default_rng(35)
    far, near = _segments(rng, 600, 8)
    ref = RefDE(o)
    ours = OurDE()
    assert o.lib.ref_history_size(ref.est) == 100
    assert de.history_size(ours.near, ours.farend) == 100

    ref_delays = [ref.step(f, n) for f, n in zip(far[:200], near[:200])]
    our_delays = list(ours.run(far[:200], near[:200]))

    assert o.lib.ref_set_history_size(ref.est, 60) == 60
    ours.near, ours.farend = de.set_history_size(ours.near, ours.farend, 60)
    assert de.history_size(ours.near, ours.farend) == 60

    ref_delays += [ref.step(f, n) for f, n in zip(far[200:400], near[200:400])]
    our_delays += list(ours.run(far[200:400], near[200:400]))

    assert o.lib.ref_set_history_size(ref.est, 90) == 90
    ours.near, ours.farend = de.set_history_size(ours.near, ours.farend, 90)
    assert de.history_size(ours.near, ours.farend) == 90

    ref_delays += [ref.step(f, n) for f, n in zip(far[400:], near[400:])]
    our_delays += list(ours.run(far[400:], near[400:]))
    np.testing.assert_array_equal(our_delays, ref_delays)
