"""Host-side utilities: WAV I/O, quality metrics, demo CLI.

Replaces the reference's vendored harness pieces (dr_wav.h WAV loader,
timing.h wall clock, main.cc demo) with small native-Python equivalents —
these run on the host, outside the jitted compute path, so no native shim
is warranted (SURVEY.md §2: the library is pure computation on fixed-size
buffers).
"""
from .wav import read_wav_int16, write_wav_int16
from .metrics import erle_db, segment_erle_db

__all__ = ["read_wav_int16", "write_wav_int16", "erle_db", "segment_erle_db"]
