#!/usr/bin/env python
"""Offline decode throughput: batch enhancement on the current backend.

Times the full device pipeline per utterance — LPS analysis GEMM,
normalize + edge-replicated splice, DNN forward, de-normalize, noisy-phase
synthesis + OLA — over a batch of bucket-padded utterances, reporting
frames/s and the real-time factor (x faster than audio).

Prints one JSON line with the headline numbers; --out additionally writes
the full record (committed as benchmarks/decode.json) so round-over-round
regressions are visible.  Reference analogue: the per-process decode loop
``Test_code/decode.m:24-68``.

Usage: timeout 590 python tools/bench_decode.py [--utts N] [--frames T]
       [--out benchmarks/decode.json]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=32)
    ap.add_argument("--frames", type=int, default=448,
                    help="frames per utterance (~7.2 s at 16 kHz)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=16,
                    help="also bench enhance_batch at this batch size "
                         "(0 = skip)")
    ap.add_argument("--out", default=None, help="write full JSON record here")
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpu_se.infer import Enhancer
    from tpu_se.io import write_wts
    from tpu_se.io.norm import write_norm
    from tpu_se.models import DEFAULT_LAYERSIZES, init_params, params_to_wts

    d = tempfile.mkdtemp()
    wts = os.path.join(d, "m.wts")
    write_wts(wts, params_to_wts(init_params(1, DEFAULT_LAYERSIZES)))
    norm = os.path.join(d, "m.norm")
    rng = np.random.default_rng(0)
    write_norm(norm, rng.normal(size=257).astype(np.float32),
               (1.0 / (1.0 + rng.random(257))).astype(np.float32))

    platform = jax.devices()[0].platform
    enh = Enhancer(wts, norm)
    shift, sr = enh.frame_shift, float(enh.sample_rate)
    n_samples = (args.frames + 1) * shift
    utts = [(rng.normal(size=n_samples) * 1000).astype(np.float32)
            .astype(np.int16) for _ in range(args.utts)]

    # Warm-up: compile every program in the path.
    enh.enhance(utts[0])

    t0 = time.perf_counter()
    total_frames = 0
    for _ in range(args.reps):
        for u in utts:
            wave, _, lps = enh.enhance(u)
            total_frames += lps.shape[0]
    _ = int(wave[-1])
    dt = time.perf_counter() - t0

    fps = total_frames / dt
    audio_rate = fps * shift / sr
    print(f"# platform={platform} utts={args.utts} frames/utt={args.frames} "
          f"reps={args.reps}")
    print(f"decode throughput: {fps:,.0f} frames/s = {audio_rate:,.0f}x "
          f"real-time ({dt / (args.reps * args.utts) * 1e3:.1f} ms per "
          f"{n_samples / sr:.1f} s utterance)")

    # Batched mode: B utterances per device program (one transfer).
    if args.batch > 1:
        batches = [utts[lo: lo + args.batch]
                   for lo in range(0, len(utts), args.batch)]
        enh.enhance_batch(batches[0])      # warm-up
        t0 = time.perf_counter()
        total_frames = 0
        for _ in range(args.reps):
            for b in batches:
                outs = enh.enhance_batch(b)
                total_frames += sum(o[2].shape[0] for o in outs)
        _ = int(outs[-1][0][-1])
        dt = time.perf_counter() - t0
        bfps = total_frames / dt
        print(f"batched (B={args.batch}): {bfps:,.0f} frames/s = "
              f"{bfps * shift / sr:,.0f}x real-time "
              f"({bfps / fps:.2f}x vs per-utterance)")
    else:
        bfps = None

    # Serving fast path: int16-only transfers, framing + int16 cast on
    # device, wave-only output (bitwise-equal waves to enhance_batch).
    if args.batch > 1:
        batches = [utts[lo: lo + args.batch]
                   for lo in range(0, len(utts), args.batch)]
        enh.enhance_batch_waves(batches[0])      # warm-up
        t0 = time.perf_counter()
        total_frames = 0
        for _ in range(args.reps):
            for b in batches:
                outs = enh.enhance_batch_waves(b)
                total_frames += sum((len(o) - shift) // shift
                                    for o in outs if len(o))
        for o in reversed(outs):             # sync on a non-empty output
            if len(o):
                _ = int(o[-1])
                break
        dt = time.perf_counter() - t0
        wfps = total_frames / dt
        print(f"wave-only (B={args.batch}): {wfps:,.0f} frames/s = "
              f"{wfps * shift / sr:,.0f}x real-time "
              f"({wfps / bfps:.2f}x vs full batched)")
    else:
        wfps = None

    record = {
        "platform": platform,
        "utts": args.utts, "frames_per_utt": args.frames, "reps": args.reps,
        "per_utt_frames_per_sec": round(fps, 1),
        "per_utt_x_realtime": round(audio_rate, 1),
        "batch_size": args.batch if args.batch > 1 else None,
        "batched_frames_per_sec": round(bfps, 1) if bfps else None,
        "batched_x_realtime": round(bfps * shift / sr, 1) if bfps else None,
        "wave_only_frames_per_sec": round(wfps, 1) if wfps else None,
        "wave_only_x_realtime": round(wfps * shift / sr, 1) if wfps else None,
    }
    print(json.dumps({"metric": "decode_frames_per_sec",
                      "value": record["wave_only_frames_per_sec"] or
                      record["batched_frames_per_sec"] or
                      record["per_utt_frames_per_sec"],
                      "unit": "frames/s",
                      "per_utt": record["per_utt_frames_per_sec"]}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
