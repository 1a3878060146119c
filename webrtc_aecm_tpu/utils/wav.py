"""Minimal int16 WAV reader/writer (replaces the vendored dr_wav.h).

The reference bundles a 6.4 kLoC single-header WAV library (dr_wav.h) used
only by the demo CLI to read/write mono int16 files (main.cc:40-54).  The
stdlib `wave` module covers that surface; multi-channel input is downmixed
to mono by averaging, matching common AEC tooling expectations.
"""
from __future__ import annotations

import wave
from typing import Tuple

import numpy as np


def read_wav_int16(path: str) -> Tuple[np.ndarray, int]:
    """Read a WAV file as mono int16 PCM.  Returns (samples, sample_rate)."""
    with wave.open(path, "rb") as w:
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        rate = w.getframerate()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    if sampwidth == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif sampwidth == 1:  # unsigned 8-bit -> int16 range
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                - 128) << 8
    elif sampwidth == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.int64) >> 16
    else:
        raise ValueError(f"unsupported WAV sample width: {sampwidth}")
    if n_channels > 1:
        data = data.reshape(-1, n_channels).mean(axis=1).astype(np.int64)
    return np.clip(data, -32768, 32767).astype(np.int16), rate


def write_wav_int16(path: str, samples: np.ndarray, sample_rate: int) -> None:
    """Write mono int16 PCM to a WAV file."""
    samples = np.asarray(samples)
    if samples.ndim != 1:
        raise ValueError("write_wav_int16 expects a 1-D mono signal")
    samples = np.clip(samples, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
