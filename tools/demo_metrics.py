#!/usr/bin/env python
"""Objective quality metrics over the reference's Enh_demos ground truth.

The reference repo's only quality evidence is 56 demo wavs:
{CLEAN, NOISY, MMSE, ML} x 14 noise/SNR conditions (``README.md:116-237``).
This tool scores them with tpu_se's own metric implementations (SegSNR,
LSD, STOI, native P.862 PESQ — ``tpu_se.dsp.metrics``, ``tpu_se.infer``),
reproducing the paper's qualitative claim (ML-GGD beta=0.9 >= MMSE)
quantitatively.

Usage: python tools/demo_metrics.py [--demos DIR] [--markdown]
"""

import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def score(clean, test, fs=16000):
    from tpu_se.infer import score_pair

    return score_pair(clean, test, fs)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--demos", default="/root/reference/Enh_demos")
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    from tpu_se.io import read_wav

    files = os.listdir(args.demos)
    conds = sorted({f.split("_TEST")[0].rsplit("_", 1)[0] for f in files})
    rows = []
    for cond in conds:
        by_kind = {}
        for kind in ("CLEAN", "NOISY", "MMSE", "ML"):
            match = [f for f in files
                     if f.split("_TEST")[0] == f"{cond}_{kind}"]
            assert len(match) == 1, (cond, kind, match)
            by_kind[kind], _ = read_wav(os.path.join(args.demos, match[0]))
        row = {"condition": cond}
        for kind in ("NOISY", "MMSE", "ML"):
            row[kind] = score(by_kind["CLEAN"], by_kind[kind])
        rows.append(row)

    hdr = (f"{'condition':26s} | {'SegSNR n/M/ML':>20s} | "
           f"{'LSD n/M/ML':>17s} | {'STOI n/M/ML':>17s} | "
           f"{'PESQ n/M/ML':>15s}")
    sep = "-" * len(hdr)
    if args.markdown:
        print("| condition | SegSNR noisy/MMSE/ML | LSD noisy/MMSE/ML "
              "| STOI noisy/MMSE/ML | PESQ noisy/MMSE/ML |")
        print("|---|---|---|---|---|")
    else:
        print(hdr)
        print(sep)
    agg = defaultdict(lambda: defaultdict(float))
    for row in rows:
        c = row["condition"]
        vals = {m: [row[k][m] for k in ("NOISY", "MMSE", "ML")]
                for m in ("segsnr", "lsd", "stoi", "pesq")}
        for m in vals:
            for k, v in zip(("NOISY", "MMSE", "ML"), vals[m]):
                agg[m][k] += v / len(rows)
        fmt = (lambda xs, p=2: "/".join(f"{x:.{p}f}" for x in xs))
        if args.markdown:
            print(f"| {c} | {fmt(vals['segsnr'])} | {fmt(vals['lsd'])} "
                  f"| {fmt(vals['stoi'], 3)} | {fmt(vals['pesq'])} |")
        else:
            print(f"{c:26s} | {fmt(vals['segsnr']):>20s} | "
                  f"{fmt(vals['lsd']):>17s} | {fmt(vals['stoi'], 3):>17s} | "
                  f"{fmt(vals['pesq']):>15s}")
    mean = {m: [agg[m][k] for k in ("NOISY", "MMSE", "ML")]
            for m in agg}
    fmt = (lambda xs, p=2: "/".join(f"{x:.{p}f}" for x in xs))
    if args.markdown:
        print(f"| **mean** | {fmt(mean['segsnr'])} | {fmt(mean['lsd'])} "
              f"| {fmt(mean['stoi'], 3)} | {fmt(mean['pesq'])} |")
    else:
        print(sep)
        print(f"{'mean':26s} | {fmt(mean['segsnr']):>20s} | "
              f"{fmt(mean['lsd']):>17s} | {fmt(mean['stoi'], 3):>17s} | "
              f"{fmt(mean['pesq']):>15s}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
