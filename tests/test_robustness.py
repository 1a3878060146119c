"""Failure-path golden tests: underrun replay, chaotic call patterns,
and API validation (SURVEY.md §5 'Failure detection / recovery').

The reference degrades gracefully rather than faulting: a far-end underrun
replays the last frame (echo_control_mobile.cc:374-380), buffer stuffing
absorbs delay spikes, and bad arguments return error codes.  All of that
must be bit-exact here too.
"""
import numpy as np
import pytest

from webrtc_aecm_tpu.api import (AECM_BAD_PARAMETER_ERROR,
                                 AECM_NULL_POINTER_ERROR, AecmError,
                                 AecmInstance)
from .oracle import get_oracle, RefAecm


def _scene(seed, n_samples, delay, fs):
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples + delay)
    env = (0.5 + 0.5 * np.sin(2 * np.pi * t / (fs // 3)))
    ff = (env * rng.normal(0, 3000, t.shape)).clip(-30000, 30000)
    far = ff[delay:delay + n_samples].astype(np.int16)
    near = (0.4 * ff[:n_samples] + rng.normal(0, 200, n_samples)).clip(
        -32000, 32000).astype(np.int16)
    return far, near


def test_farend_underrun_replay_matches_reference():
    """Skip BufferFarend on a deterministic-random subset of chunks: the
    canceller must replay farendOld and stay bit-exact."""
    fs = 8000
    far, near = _scene(0, 2000 * fs // 1000, 320, fs)
    ref = RefAecm(get_oracle(), fs)
    ours = AecmInstance(fs)
    rng = np.random.default_rng(1)
    for i in range(len(near) // 80):
        sl = slice(i * 80, (i + 1) * 80)
        if rng.random() > 0.25:  # 25% of chunks: far-end packet lost
            assert ref.buffer_farend(far[sl]) == 0
            ours.buffer_farend(far[sl])
        r, ret = ref.process(near[sl], None, 40)
        assert ret == 0
        u, _ = ours.process(near[sl], None, 40)
        np.testing.assert_array_equal(u, r, err_msg=f"chunk {i}")


def test_farend_burst_and_drought_matches_reference():
    """Bursty far-end delivery (0-3 BufferFarend calls per Process) with a
    drifting sound-card report: stresses DelayComp stuffing and the jitter
    ring wrap paths."""
    fs = 8000
    far, near = _scene(2, 3000 * fs // 1000, 400, fs)
    ref = RefAecm(get_oracle(), fs)
    ours = AecmInstance(fs)
    rng = np.random.default_rng(3)
    fi = 0
    n_chunks = len(near) // 80
    for i in range(n_chunks):
        k = rng.integers(0, 4)
        for _ in range(k):
            if fi + 80 <= len(far):
                chunk = far[fi:fi + 80]
                assert ref.buffer_farend(chunk) == 0
                ours.buffer_farend(chunk)
                fi += 80
        sl = slice(i * 80, (i + 1) * 80)
        ms = int(40 + 60 * np.sin(i / 10.0) + rng.integers(0, 20))
        r, ret = ref.process(near[sl], None, ms)
        u, warn = ours.process(near[sl], None, ms)
        assert ret in (0, 12100) and warn == ret  # clamp warning on ms < 0
        np.testing.assert_array_equal(u, r, err_msg=f"chunk {i} ms={ms}")


def test_extreme_sndcard_values_match_reference():
    """msInSndCardBuf beyond [0,500] is clamped with a warning (12100)."""
    fs = 8000
    far, near = _scene(4, 800, 160, fs)
    ref = RefAecm(get_oracle(), fs)
    ours = AecmInstance(fs)
    for i, ms in enumerate([-5, 0, 500, 700, 40, 40, 40, 40, 40, 40]):
        sl = slice(i * 80, (i + 1) * 80)
        ref.buffer_farend(far[sl])
        ours.buffer_farend(far[sl])
        r, _ = ref.process(near[sl], None, ms)
        u, warn = ours.process(near[sl], None, ms)
        np.testing.assert_array_equal(u, r)
        if ms < 0 or ms > 500:
            assert warn == 12100  # AECM_BAD_PARAMETER_WARNING


def test_api_validation_errors():
    with pytest.raises(AecmError) as e:
        AecmInstance(44100)
    assert e.value.code == AECM_BAD_PARAMETER_ERROR

    inst = AecmInstance(8000)
    with pytest.raises(AecmError) as e:
        inst.buffer_farend(None)
    assert e.value.code == AECM_NULL_POINTER_ERROR
    with pytest.raises(AecmError) as e:
        inst.buffer_farend(np.zeros(100, np.int16))  # bad length
    assert e.value.code == AECM_BAD_PARAMETER_ERROR
    with pytest.raises(AecmError) as e:
        inst.process(None, None, 40)
    assert e.value.code == AECM_NULL_POINTER_ERROR
    with pytest.raises(AecmError) as e:
        inst.process(np.zeros(100, np.int16), None, 40)
    assert e.value.code == AECM_BAD_PARAMETER_ERROR
    with pytest.raises(AecmError) as e:
        inst.set_config(cng_mode=2, echo_mode=3)
    assert e.value.code == AECM_BAD_PARAMETER_ERROR
    with pytest.raises(AecmError) as e:
        inst.set_config(cng_mode=1, echo_mode=5)
    assert e.value.code == AECM_BAD_PARAMETER_ERROR
    with pytest.raises(AecmError) as e:
        inst.init_echo_path(np.zeros(64, np.int16))  # wrong size
    assert e.value.code == AECM_BAD_PARAMETER_ERROR


def test_get_buffer_farend_error_standalone():
    """WebRtcAecm_GetBufferFarendError as a separately callable check
    (echo_control_mobile.cc:195-213)."""
    inst = AecmInstance(16000)
    assert inst.get_buffer_farend_error(None) == AECM_NULL_POINTER_ERROR
    assert inst.get_buffer_farend_error(
        np.zeros(100, np.int16)) == AECM_BAD_PARAMETER_ERROR
    assert inst.get_buffer_farend_error(
        np.zeros(80, np.int16), 77) == AECM_BAD_PARAMETER_ERROR
    assert inst.get_buffer_farend_error(np.zeros(80, np.int16)) == 0
    assert inst.get_buffer_farend_error(np.zeros(160, np.int16)) == 0
