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


def _run_batch(args) -> int:
    """Batched file processing: all pairs padded to one length and run
    through a single vmapped/scanned pipeline (the TPU serving shape)."""
    from .wav import read_wav_int16, write_wav_int16
    from .metrics import erle_db

    pairs = []
    with open(args.batch) as fh:
        for line in fh:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            if len(parts) == 2:
                parts.append(_out_path(parts[1]))
            pairs.append(parts[:3])
    if not pairs:
        print("error: empty batch list", file=sys.stderr)
        return 2

    fars, nears, rates, lengths = [], [], [], []
    for far_f, near_f, _ in pairs:
        far, fr = read_wav_int16(far_f)
        near, nr = read_wav_int16(near_f)
        if fr != nr or fr not in (8000, 16000):
            print(f"error: bad rates for {far_f}/{near_f}", file=sys.stderr)
            return 2
        rates.append(fr)
        fars.append(far)
        nears.append(near)
        lengths.append(min(len(far), len(near)))
    if len(set(rates)) != 1:
        print("error: all pairs in a batch must share a sample rate",
              file=sys.stderr)
        return 2
    rate = rates[0]
    chunk = min(160, rate // 100)
    n = (max(lengths) // chunk) * chunk
    far_b = np.zeros((len(pairs), n), np.int16)
    near_b = np.zeros((len(pairs), n), np.int16)
    for i, (f, d) in enumerate(zip(fars, nears)):
        m = min(lengths[i], n)
        far_b[i, :m] = f[:m]
        near_b[i, :m] = d[:m]

    from ..models import AecmPipeline
    t0 = time.monotonic()
    pipe = AecmPipeline(len(pairs), rate,
                        cng_mode=0 if args.no_cng else 1,
                        echo_mode=args.echo_mode)
    out = np.asarray(pipe.run(far_b, near_b,
                              ms_in_sndcard_buf=args.ms_in_sndcard_buf),
                     np.int16)
    elapsed = time.monotonic() - t0

    for i, (_, near_f, out_f) in enumerate(pairs):
        full = nears[i].copy()
        m = min(lengths[i], n)
        full[:m] = out[i, :m]
        write_wav_int16(out_f, full, rate)
        if args.erle:
            e = erle_db(nears[i][:m], full[:m], fars[i][:m])
            print(f"{out_f}: ERLE {e:.2f} dB")
    audio_s = sum(lengths) / rate
    print(f"{len(pairs)} pairs, {audio_s:.1f}s audio in "
          f"{int(elapsed * 1000)} ms ({audio_s / max(elapsed, 1e-9):.1f}x "
          "real time)")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="aecm",
        description="TPU-native WebRTC-AECM echo cancellation: "
                    "far (echo) + near (mic) WAV in, cleaned WAV out.")
    p.add_argument("far_file", nargs="?",
                   help="far-end (loudspeaker/echo) WAV")
    p.add_argument("near_file", nargs="?",
                   help="near-end (microphone) WAV")
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
    p.add_argument("--batch", metavar="LIST",
                   help="process many pairs concurrently through one "
                        "vmapped pipeline: LIST is a text file with one "
                        "'far.wav near.wav [out.wav]' triple per line; the "
                        "positional far/near arguments are ignored")
    args = p.parse_args(argv)

    if args.batch:
        return _run_batch(args)
    if not args.far_file or not args.near_file:
        p.error("far_file and near_file are required (or use --batch)")

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
