"""Static-option coverage: ABS_APPROX, Control(fixedDelay/nlp), debug taps.

These exercise the reference's compile-time/dormant knobs rebuilt as static
Options (SURVEY.md §5 'Config / flag system').
"""
import numpy as np
import pytest

from webrtc_aecm_tpu.api import AecmInstance
from .oracle import get_oracle_abs_approx, RefAecm


def _make_scene(seed, n_samples, delay, fs):
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples + delay)
    env = (0.5 + 0.5 * np.sin(2 * np.pi * t / (fs // 3)))
    far_full = (env * rng.normal(0, 3000, t.shape)).clip(-30000, 30000)
    far = far_full[delay:delay + n_samples]
    near = (0.4 * far_full[:n_samples]
            + rng.normal(0, 200, n_samples)).clip(-32000, 32000)
    return far.astype(np.int16), near.astype(np.int16)


@pytest.mark.parametrize("fs", [8000, 16000])
def test_abs_approx_matches_reference(fs):
    """AECM_WITH_ABS_APPROX build vs Options(abs_approx=True): bit-exact
    (16 kHz exercises the approximate magnitudes through the upper-band
    clamp path, aecm_core_c.cc:316-341 + 618-648)."""
    chunk = min(160, fs // 100)
    far, near = _make_scene(0, 1500 * fs // 1000, 320, fs)
    ref = RefAecm(get_oracle_abs_approx(), fs)
    ours = AecmInstance(fs, abs_approx=True)
    for i in range(len(near) // chunk):
        sl = slice(i * chunk, (i + 1) * chunk)
        assert ref.buffer_farend(far[sl]) == 0
        ours.buffer_farend(far[sl])
        r, ret = ref.process(near[sl], None, 40)
        assert ret == 0
        u, _ = ours.process(near[sl], None, 40)
        np.testing.assert_array_equal(u, r, err_msg=f"chunk {i}")


def test_control_fixed_delay_and_nlp():
    """WebRtcAecm_Control behavioral test: both knobs change the output and
    the pipeline stays sane (echo still reduced with NLP off)."""
    fs = 8000
    far, near = _make_scene(1, 2000 * fs // 1000, 320, fs)

    def run(**control):
        inst = AecmInstance(fs)
        if control:
            inst.set_control(**control)
        out = inst.run_file_pair(far, near)
        return inst, out

    _, base = run()
    _, nlp_off = run(delay=-1, nlp_flag=0)
    assert not np.array_equal(base, nlp_off)

    # fixed delay = true delay in blocks (320 samples = 5 blocks)
    inst_fd, fixed = run(delay=5, nlp_flag=1)
    from webrtc_aecm_tpu.utils import erle_db
    e = erle_db(near, fixed, far, skip_samples=fs)
    assert e > 5.0, f"fixed-delay ERLE {e:.2f} dB"


def test_debug_taps():
    fs = 8000
    far, near = _make_scene(2, 800, 160, fs)
    inst = AecmInstance(fs)
    taps = None
    for i in range(len(near) // 80):
        sl = slice(i * 80, (i + 1) * 80)
        inst.buffer_farend(far[sl])
        out, warn, taps = inst.process(near[sl], None, 40, debug=True)
    assert set(taps) >= {"hnl_q14", "sup_gain_q8", "mu", "delay_blocks",
                         "vad_far", "delay_quality"}
    assert taps["hnl_q14"].shape == (1, 2, 65)
    assert taps["hnl_q14"].min() >= 0 and taps["hnl_q14"].max() <= 16384
    assert 0.0 <= float(taps["delay_quality"][0, 0]) <= 1.0
    assert taps["delay_blocks"].min() >= 0


def test_delay_quality_api():
    fs = 8000
    far, near = _make_scene(3, 1600, 320, fs)
    inst = AecmInstance(fs)
    for i in range(len(near) // 80):
        sl = slice(i * 80, (i + 1) * 80)
        inst.buffer_farend(far[sl])
        inst.process(near[sl], None, 40)
    q = inst.delay_quality()
    assert 0.0 <= q <= 1.0
