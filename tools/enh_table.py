#!/usr/bin/env python
"""Full 14-condition Enh_demos-style table from tpu_se-trained models.

The reference's shipped ground truth (``/root/reference/README.md:116-237``,
``Enh_demos/`` 56 wavs) demonstrates enhancement improving EVERY one of its
14 noise/SNR conditions.  This tool produces the analogous table for models
trained BY THIS FRAMEWORK: each demo condition's noisy wav is decoded with
the given arms (default: the round-4 headline config, ML-GGD + blend 0.5)
and scored with SegSNR/LSD/STOI/PESQ against the clean reference.

Note the two condition classes are NOT equally hard and the table says so:
the 11 "seen" conditions use noise types that were in the training remix
(with different segments/offsets/SNR jitter); the 3 HELD-OUT conditions'
noise types and sentences were excluded from training entirely
(``tools/ab_objectives.py HELD_OUT``).

Usage (CPU is fine — decode of 14 utterances):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/enh_table.py \
      [--root artifacts/ab_objectives/big_pt8] [--arms MLGGD1,MLGGD09,MMSE]
      [--blend 0.5] [--seed-dir ""] [--out artifacts/.../ENH_TABLE.md]
"""

import argparse
import glob
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

REFERENCE = "/root/reference"
HELD_OUT = ("F-16Cockpit_SNR10", "DestroyerEngine_SNR0", "Pink_SNR-5")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="artifacts/ab_objectives/big_pt8")
    ap.add_argument("--arms", default="MLGGD1,MLGGD09,MMSE")
    ap.add_argument("--blend", default="0.5",
                    help="fixed fraction or 'auto' (adaptive map)")
    ap.add_argument("--smooth-strength", default="0",
                    help="fractional SMOOTHPROCESS (0=off, 1=the "
                         "reference's binary option, 'auto'=impulsiveness-"
                         "gated)")
    ap.add_argument("--seed-dir", default="",
                    help="e.g. s1000 to score that seed's models")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from tpu_se.infer import Enhancer
    from tpu_se.infer.stoi import stoi, pesq_score
    from tpu_se.dsp.metrics import segsnr_lsd_pair
    from tpu_se.io import read_wav

    demo = os.path.join(REFERENCE, "Enh_demos")
    files = os.listdir(demo)
    conds = sorted({f.split("_NOISY_")[0] for f in files if "_NOISY_" in f})
    assert len(conds) == 14

    norm = os.path.join(args.root, "data", "train_noisy.norm")
    arms = {}
    for a in args.arms.split(","):
        wts = os.path.join(args.root, args.seed_dir, a, "mlp.50.wts")
        blend = args.blend if args.blend == "auto" else float(args.blend)
        ss = args.smooth_strength
        ss = ss if ss == "auto" else float(ss)
        arms[a] = Enhancer(wts, norm, blend=blend, smooth_strength=ss)

    rows = []
    n_improved = {a: {"segsnr": 0, "stoi": 0, "lsd": 0, "pesq": 0}
                  for a in arms}
    for cond in conds:
        nw = glob.glob(os.path.join(demo, f"{cond}_NOISY_*.wav"))[0]
        cw = re.sub("_NOISY_", "_CLEAN_", nw)[:-4] + ".WAV"
        noisy, fs = read_wav(nw)
        clean, _ = read_wav(cw)
        t = min(len(noisy), len(clean))
        noisy, clean = noisy[:t], clean[:t]
        row = {"condition": cond, "held_out": cond in HELD_OUT,
               "noisy": {"stoi": round(stoi(clean, noisy, fs), 4),
                         "pesq": round(pesq_score(
                             clean, noisy.astype(np.float64), fs), 3)}}
        for a, enh in arms.items():
            wave, recon, lps = enh.enhance(noisy)
            power = np.where(lps < -50.0, np.exp(-50.0), np.exp(lps))
            m = segsnr_lsd_pair(clean, noisy, recon, power)
            row["noisy"].setdefault("segsnr", round(m["segsnr_noisy"], 2))
            row["noisy"].setdefault("lsd", round(m["lsd_noisy"], 2))
            got = {"segsnr": round(m["segsnr"], 2), "lsd": round(m["lsd"], 2),
                   "stoi": round(stoi(clean[:len(wave)], wave, fs), 4),
                   "pesq": round(pesq_score(
                       clean[:len(wave)], wave.astype(np.float64), fs), 3)}
            row[a] = got
            nz = row["noisy"]
            n_improved[a]["segsnr"] += got["segsnr"] > nz["segsnr"]
            n_improved[a]["stoi"] += got["stoi"] > nz["stoi"]
            n_improved[a]["lsd"] += got["lsd"] < nz["lsd"]
            n_improved[a]["pesq"] += got["pesq"] > nz["pesq"]
        rows.append(row)
        print(f"{cond}: done")

    lines = [
        "# All 14 Enh_demos conditions — tpu_se-trained models "
        f"(blend {args.blend}{', seed ' + args.seed_dir if args.seed_dir else ''})",
        "",
        "The reference's own demo set improves every one of its 14 "
        "conditions (`README.md:116-237`). This is the analogous table for "
        "models trained by tpu_se on the big_pt8 corpus, decoded with the "
        "suppression-depth limiter. Conditions marked **HELD-OUT** had "
        "their noise type AND sentence excluded from training; the rest "
        "use training noise types (different segments/offsets/SNRs).",
        "",
        "Improvement counts vs noisy (out of 14): " + "; ".join(
            f"**{a}**: SegSNR {c['segsnr']}, STOI {c['stoi']}, "
            f"LSD {c['lsd']}, PESQ {c['pesq']}"
            for a, c in n_improved.items()),
        "",
    ]
    for row in rows:
        held = " — **HELD-OUT**" if row["held_out"] else ""
        lines += [f"### {row['condition']}{held}", "",
                  "| System | SegSNR | LSD | STOI | PESQ |",
                  "|---|---|---|---|---|"]
        for s in ["noisy"] + list(arms):
            m = row[s]
            lines.append(f"| {s} | {m['segsnr']:.2f} | {m['lsd']:.2f} | "
                         f"{m['stoi']:.3f} | {m['pesq']:.2f} |")
        lines.append("")

    out = args.out or os.path.join(
        args.root, ("ENH_TABLE"
                    + ("_auto" if args.blend == "auto" else "")
                    + (f"_{args.seed_dir}" if args.seed_dir
                                   else "") + ".md"))
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(out.replace(".md", ".json"), "w") as f:
        json.dump({"rows": rows, "improved_of_14": n_improved,
                   "blend": args.blend}, f, indent=1)
    print("\n".join(lines[:8]))
    print(f"-> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
