"""WAV I/O, metrics, and demo-CLI tests (reference: main.cc, dr_wav.h)."""
import os

import numpy as np
import pytest

from webrtc_aecm_tpu.utils import (erle_db, read_wav_int16, segment_erle_db,
                                   write_wav_int16)
from webrtc_aecm_tpu.utils.cli import main as cli_main


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pcm = rng.integers(-32768, 32768, 4000).astype(np.int16)
    path = str(tmp_path / "x.wav")
    write_wav_int16(path, pcm, 8000)
    back, rate = read_wav_int16(path)
    assert rate == 8000
    np.testing.assert_array_equal(back, pcm)


def test_wav_stereo_downmix(tmp_path):
    import wave
    pcm = np.stack([np.arange(100, dtype=np.int16),
                    np.arange(100, dtype=np.int16) + 100], axis=1)
    path = str(tmp_path / "st.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.astype("<i2").tobytes())
    mono, rate = read_wav_int16(path)
    assert rate == 16000
    np.testing.assert_array_equal(mono, np.arange(100) + 50)


def test_erle_basic():
    rng = np.random.default_rng(1)
    near = rng.normal(0, 1000, 8000)
    out = near * 0.1  # 20 dB suppression
    assert abs(erle_db(near, out) - 20.0) < 0.01
    seg = segment_erle_db(near, out, frame=80)
    assert seg.shape == (100,)
    np.testing.assert_allclose(seg, 20.0, atol=0.01)


def test_erle_far_gating():
    near = np.ones(1600) * 1000.0
    out = near * 0.1
    far = np.zeros(1600)
    far[:800] = 5000.0  # far active only in the first half
    e = erle_db(near, out, far)
    assert abs(e - 20.0) < 0.01


def test_cli_end_to_end(tmp_path):
    fs = 8000
    rng = np.random.default_rng(2)
    n = fs  # 1 s
    t = np.arange(n + 320)
    env = 0.5 + 0.5 * np.sin(2 * np.pi * t / (fs // 3))
    far_full = (env * rng.normal(0, 3000, t.shape)).clip(-30000, 30000)
    far = far_full[320:320 + n].astype(np.int16)
    near = (0.4 * far_full[:n] + rng.normal(0, 100, n)).clip(
        -32000, 32000).astype(np.int16)

    far_path = str(tmp_path / "far.wav")
    near_path = str(tmp_path / "near.wav")
    write_wav_int16(far_path, far, fs)
    write_wav_int16(near_path, near, fs)

    rc = cli_main([far_path, near_path, "--erle"])
    assert rc == 0
    out_path = str(tmp_path / "near_out.wav")
    assert os.path.exists(out_path)
    out, rate = read_wav_int16(out_path)
    assert rate == fs and len(out) == n


def test_cli_rejects_rate_mismatch(tmp_path):
    write_wav_int16(str(tmp_path / "a.wav"), np.zeros(100, np.int16), 8000)
    write_wav_int16(str(tmp_path / "b.wav"), np.zeros(100, np.int16), 16000)
    rc = cli_main([str(tmp_path / "a.wav"), str(tmp_path / "b.wav")])
    assert rc == 2


def test_cli_rejects_unsupported_rate(tmp_path):
    write_wav_int16(str(tmp_path / "a.wav"), np.zeros(100, np.int16), 44100)
    write_wav_int16(str(tmp_path / "b.wav"), np.zeros(100, np.int16), 44100)
    rc = cli_main([str(tmp_path / "a.wav"), str(tmp_path / "b.wav")])
    assert rc == 2


def test_cli_batch_mode(tmp_path):
    fs = 8000
    rng = np.random.default_rng(7)
    lines = []
    scenes = []
    for k in range(3):
        n = fs // 2 + 80 * k
        t = np.arange(n + 240)
        env = 0.5 + 0.5 * np.sin(2 * np.pi * t / (fs // 3))
        ff = (env * rng.normal(0, 3000, t.shape)).clip(-30000, 30000)
        far = ff[240:240 + n].astype(np.int16)
        near = (0.4 * ff[:n]).clip(-32000, 32000).astype(np.int16)
        fp, np_ = str(tmp_path / f"far{k}.wav"), str(tmp_path / f"near{k}.wav")
        write_wav_int16(fp, far, fs)
        write_wav_int16(np_, near, fs)
        lines.append(f"{fp} {np_}")
        scenes.append((far, near, n))
    lst = str(tmp_path / "list.txt")
    open(lst, "w").write("\n".join(lines) + "\n")
    rc = cli_main(["--batch", lst, "--erle"])
    assert rc == 0
    for k, (far, near, n) in enumerate(scenes):
        out, rate = read_wav_int16(str(tmp_path / f"near{k}_out.wav"))
        assert rate == fs and len(out) == n

    # batch output must equal the single-pair CLI output, pair by pair
    rc = cli_main([lines[0].split()[0], lines[0].split()[1],
                   "-o", str(tmp_path / "single0.wav")])
    assert rc == 0
    single, _ = read_wav_int16(str(tmp_path / "single0.wav"))
    batch_out, _ = read_wav_int16(str(tmp_path / "near0_out.wav"))
    np.testing.assert_array_equal(batch_out, single)
