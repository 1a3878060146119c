"""Long-call behavior: state stays O(1) and the pipeline survives
delay drift over extended calls (SURVEY.md §7 stage 8, BASELINE config
'hour-long calls with delay drift')."""
import jax
import numpy as np

from webrtc_aecm_tpu.models import AecmPipeline
from webrtc_aecm_tpu.parallel import create_batch


def _state_bytes(state) -> int:
    return sum(np.asarray(leaf).nbytes
               for leaf in jax.tree_util.tree_leaves(state))


def test_state_is_o1_and_modest():
    """Per-stream state is fixed-shape and small enough for ~10k streams
    per chip (HBM, not VMEM: the scan carry streams through)."""
    one = _state_bytes(create_batch(1, 16000))
    thousand = _state_bytes(create_batch(1000, 16000))
    # exactly linear in streams: no per-call growth anywhere
    assert thousand == 1000 * one
    assert one < 128 * 1024, f"per-stream state {one} bytes"


def test_long_call_with_delay_drift():
    """Minutes-long call in repeated run() segments: state threads through
    (no reset), output stays sane while msInSndCardBuf drifts."""
    fs = 8000
    rng = np.random.default_rng(0)
    pipe = AecmPipeline(2, fs)
    seg = 2 * fs  # 2 s segments
    base = _state_bytes(pipe.state)
    for k in range(5):  # 10 s total
        t = np.arange(seg + 400)
        env = 0.5 + 0.5 * np.sin(2 * np.pi * (t + k * seg) / (fs // 3))
        ff = (env * rng.normal(0, 3000, t.shape)).clip(-30000, 30000)
        far = np.stack([ff[400:400 + seg], ff[200:200 + seg]]
                       ).astype(np.int16)
        near = (0.4 * ff[:seg] + rng.normal(0, 150, seg)).clip(
            -32000, 32000).astype(np.int16)
        near = np.stack([near, near])
        ms = 40 + 25 * (k % 3)  # drifting sound-card report
        out = np.asarray(pipe.run(far, near, ms_in_sndcard_buf=ms))
        assert np.abs(out).max() <= 32767
        assert _state_bytes(pipe.state) == base  # O(1) state
    # after convergence the canceller must be suppressing echo
    from webrtc_aecm_tpu.utils import erle_db
    e = erle_db(near[0], out[0], far[0])
    assert e > 3.0, f"late-call ERLE {e:.2f} dB"
