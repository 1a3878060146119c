"""End-to-end golden tests: full WebRtcAecm_Process pipeline vs C reference.

The strongest parity check in the suite: identical int16 streams through
both implementations must produce identical int16 outputs, sample for
sample, including startup passthrough, delay estimation, NLMS adaptation,
NLP, and comfort noise (seeded RNG).
"""
import numpy as np
import pytest

from webrtc_aecm_tpu.api import AecmInstance
from .oracle import get_oracle, RefAecm


def _make_echo_scene(rng, n_samples, delay_samples, fs):
    """Far = AM noise bursts; near = attenuated delayed far + local noise."""
    t = np.arange(n_samples + delay_samples)
    env = (0.5 + 0.5 * np.sin(2 * np.pi * t / (fs // 3))) * (t % (fs // 2) >
                                                             fs // 8)
    far_full = (env * rng.normal(0.0, 3000.0, t.shape)).clip(-30000, 30000)
    far = far_full[delay_samples:delay_samples + n_samples]
    echo = 0.4 * far_full[:n_samples]
    local = rng.normal(0.0, 200.0, n_samples)
    near = (echo + local).clip(-32768, 32767)
    return far.astype(np.int16), near.astype(np.int16)


def _run_pair(fs, n_ms, delay_ms, ms_in_sndcard_buf=40, cng=1, echo_mode=3,
              clean=False, seed=0):
    rng = np.random.default_rng(seed)
    n_samples = n_ms * fs // 1000
    far, near = _make_echo_scene(rng, n_samples, delay_ms * fs // 1000, fs)

    o = get_oracle()
    ref = RefAecm(o, fs, cng_mode=cng, echo_mode=echo_mode)
    ours = AecmInstance(fs, cng_mode=cng, echo_mode=echo_mode)

    samples = min(160, fs // 100)
    n_chunks = n_samples // samples
    ref_out = np.zeros(n_samples, np.int16)
    our_out = np.zeros(n_samples, np.int16)
    for i in range(n_chunks):
        sl = slice(i * samples, (i + 1) * samples)
        assert ref.buffer_farend(far[sl]) == 0
        ours.buffer_farend(far[sl])
        clean_arg = near[sl] if clean else None
        r, ret = ref.process(near[sl], clean_arg, ms_in_sndcard_buf)
        assert ret == 0
        u, _ = ours.process(near[sl], clean_arg, ms_in_sndcard_buf)
        ref_out[sl] = r
        our_out[sl] = u
        if not np.array_equal(r, u):
            idx = np.nonzero(r != u)[0][:8]
            raise AssertionError(
                f"chunk {i}: first diffs at {idx}: ref={r[idx]} ours={u[idx]}")
    return ref_out, our_out


def test_e2e_8k_default_config():
    ref, ours = _run_pair(8000, n_ms=3000, delay_ms=60)
    np.testing.assert_array_equal(ours, ref)


def test_e2e_8k_cng_off():
    ref, ours = _run_pair(8000, n_ms=1500, delay_ms=40, cng=0, seed=1)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("echo_mode", [0, 1, 2, 4])
def test_e2e_8k_echo_modes(echo_mode):
    ref, ours = _run_pair(8000, n_ms=1000, delay_ms=40, echo_mode=echo_mode,
                          seed=2 + echo_mode)
    np.testing.assert_array_equal(ours, ref)


def test_e2e_16k_wideband():
    ref, ours = _run_pair(16000, n_ms=2000, delay_ms=30, seed=3)
    np.testing.assert_array_equal(ours, ref)


def test_e2e_8k_with_clean_input():
    ref, ours = _run_pair(8000, n_ms=1000, delay_ms=40, clean=True, seed=4)
    np.testing.assert_array_equal(ours, ref)


def test_e2e_16k_with_clean_input():
    """16 kHz + clean is a distinct Q-domain configuration: the upper-band
    clamp reads dfa_clean_q-domain quantities (aecm_core_c.cc:618-648),
    so the clean-domain bookkeeping feeds the mult==2-only path here."""
    ref, ours = _run_pair(16000, n_ms=1500, delay_ms=30, clean=True, seed=7)
    np.testing.assert_array_equal(ours, ref)


def test_e2e_16k_cng_off_with_clean():
    ref, ours = _run_pair(16000, n_ms=1000, delay_ms=50, clean=True, cng=0,
                          seed=8)
    np.testing.assert_array_equal(ours, ref)


def test_e2e_variable_sndcard_delay():
    """Delay-governance stress: msInSndCardBuf drifts over the call."""
    fs = 8000
    rng = np.random.default_rng(5)
    n_samples = 2000 * fs // 1000
    far, near = _make_echo_scene(rng, n_samples, 80 * fs // 1000, fs)
    o = get_oracle()
    ref = RefAecm(o, fs)
    ours = AecmInstance(fs)
    for i in range(n_samples // 80):
        sl = slice(i * 80, (i + 1) * 80)
        ms = int(40 + 30 * np.sin(i / 25.0))
        assert ref.buffer_farend(far[sl]) == 0
        ours.buffer_farend(far[sl])
        r, _ = ref.process(near[sl], None, ms)
        u, _ = ours.process(near[sl], None, ms)
        np.testing.assert_array_equal(u, r, err_msg=f"chunk {i} ms={ms}")


def test_echo_path_roundtrip_matches_reference():
    ref, ours = None, None
    o = get_oracle()
    ref = RefAecm(o, 8000)
    ours = AecmInstance(8000)
    rng = np.random.default_rng(6)
    far, near = _make_echo_scene(rng, 8000, 320, 8000)
    for i in range(100):
        sl = slice(i * 80, (i + 1) * 80)
        ref.buffer_farend(far[sl])
        ours.buffer_farend(far[sl])
        ref.process(near[sl], None, 40)
        ours.process(near[sl], None, 40)
    np.testing.assert_array_equal(ours.get_echo_path(), ref.get_echo_path())
