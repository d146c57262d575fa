#!/usr/bin/env python
"""A/B: MMSE (beta=2) vs ML-GGD (beta=1) models trained BY THIS FRAMEWORK.

Closes the training-quality loop the reference paper claims
(``README.md:155-158``: ML-GGD-trained enhancement beats MMSE on
perceptual metrics): both objectives are trained on the same demo corpus
with IDENTICAL init seed, schedule, topology and data
(``finetune.pl:25-26`` MLflag/shapefactor being the only difference), the
held-out conditions are decoded with each, and the SegSNR/LSD/STOI/PESQ
table is written to artifacts/ab_objectives/{AB.md,AB.json}.

Every stage skips if its outputs exist, so the script is safely re-runnable
in bounded time slices (the remote-TPU relay requires `timeout`), mirroring
the reference's resume-by-existence (``finetune.pl:49``).

Usage: timeout 590 python tools/ab_objectives.py [workdir] [--epochs 50]
       (re-run until it prints the final table)
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
# Three held-out conditions spanning SNR -5..10 dB and noise character
# (tonal cockpit, broadband engine, pink); the other 11 are train (9) + CV (2).
HELD_OUT = ("F-16Cockpit_SNR10", "DestroyerEngine_SNR0", "Pink_SNR-5")

ARMS = {
    # name -> (ml_flag, shapefactor)
    "MMSE": (False, 2.0),     # classic beta-norm beta=2 (MLflag=0)
    "MLGGD1": (True, 1.0),    # ML-GGD beta=1 (finetune.pl:25-26 defaults)
}


def build_corpus(work: str):
    from tpu_se.dsp import wav_to_lps
    from tpu_se.io import read_wav, write_pfile, write_norm
    from tpu_se.io.norm import compute_norm
    from tpu_se.io.pfile import read_pfile

    demo_dir = os.path.join(REFERENCE, "Enh_demos")
    noisy_wavs = sorted(glob.glob(os.path.join(demo_dir, "*_NOISY_*.wav")))
    pairs = []
    for nw in noisy_wavs:
        cw = re.sub(r"_NOISY_", "_CLEAN_", nw)[:-4] + ".WAV"
        if os.path.exists(cw):
            pairs.append((nw, cw))
    train_pairs = [(n, c) for n, c in pairs
                   if not any(h in n for h in HELD_OUT)]
    test_pairs = [(n, c) for n, c in pairs if any(h in n for h in HELD_OUT)]

    data_dir = os.path.join(work, "data")
    os.makedirs(data_dir, exist_ok=True)
    noisy_pfile = os.path.join(data_dir, "train_noisy.pfile")
    clean_pfile = os.path.join(data_dir, "train_clean.pfile")
    norm_file = os.path.join(data_dir, "train_noisy.norm")
    meta_file = os.path.join(data_dir, "meta.json")
    if not os.path.exists(meta_file):
        noisy_utts, clean_utts = [], []
        for nw, cw in train_pairs:
            n_lps = wav_to_lps(read_wav(nw)[0])
            c_lps = wav_to_lps(read_wav(cw)[0])
            t = min(len(n_lps), len(c_lps))
            noisy_utts.append(n_lps[:t])
            clean_utts.append(c_lps[:t])
        write_pfile(noisy_pfile, noisy_utts)
        write_pfile(clean_pfile, clean_utts)
        mean, inv_std = compute_norm(read_pfile(noisy_pfile).features)
        write_norm(norm_file, mean, inv_std)
        with open(meta_file, "w") as f:
            json.dump({"n_train_utts": len(train_pairs),
                       "frames": int(sum(len(u) for u in noisy_utts))}, f)
        print(f"corpus: {len(train_pairs)} train utts, "
              f"{sum(len(u) for u in noisy_utts)} frames")
    n_utts = json.load(open(meta_file))["n_train_utts"]
    return (noisy_pfile, clean_pfile, norm_file, n_utts, test_pairs)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="artifacts/ab_objectives")
    ap.add_argument("--epochs", type=int, default=50)
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpu_se.infer import decode_files
    from tpu_se.infer.stoi import stoi, pesq_score
    from tpu_se.io import read_wav
    from tpu_se.train import TrainConfig, run_training

    work = args.workdir
    os.makedirs(work, exist_ok=True)
    noisy_pfile, clean_pfile, norm_file, n_utts, test_pairs = \
        build_corpus(work)

    # ---- train both arms (identical seed/schedule; resume-by-existence) ----
    final = {}
    for arm, (ml, beta) in ARMS.items():
        cfg = TrainConfig(
            fea_file=noisy_pfile, targ_file=clean_pfile, norm_file=norm_file,
            out_dir=os.path.join(work, arm),
            ml_flag=ml, shapefactor=beta, epochs=args.epochs,
            train_sent_range=(0, n_utts - 3),
            cv_sent_range=(n_utts - 2, n_utts - 1),
        )
        final[arm] = run_training(cfg)
        print(f"{arm}: {final[arm]}")

    # ---- decode held-out conditions with each arm ---------------------------
    noisy_list = [n for n, _ in test_pairs]
    clean_list = [c for _, c in test_pairs]
    decoded = {}
    for arm in ARMS:
        out_dir = os.path.join(work, "enhanced", arm)
        decoded[arm] = decode_files(final[arm], norm_file, noisy_list,
                                    out_dir, clean_list)

    # ---- score: SegSNR/LSD (from decode) + STOI + PESQ ---------------------
    rows = []
    arm0 = next(iter(ARMS))          # noisy baseline identical across arms
    for i, (nw, cw) in enumerate(test_pairs):
        clean, fs = read_wav(cw)
        noisy, _ = read_wav(nw)
        cond = os.path.basename(nw).split("_NOISY_")[0]
        row = {"condition": cond,
               "noisy": {"segsnr": decoded[arm0][i]["segsnr_noisy"],
                         "lsd": decoded[arm0][i]["lsd_noisy"],
                         "stoi": round(stoi(clean, noisy, fs), 4),
                         "pesq": round(pesq_score(clean, noisy, fs), 3)}}
        for arm in ARMS:
            r = decoded[arm][i]
            enh, _ = read_wav(r["out"])
            c = clean[:len(enh)]
            row[arm] = {"segsnr": r["segsnr"], "lsd": r["lsd"],
                        "stoi": round(stoi(c, enh, fs), 4),
                        "pesq": round(pesq_score(c, enh, fs), 3)}
        rows.append(row)

    systems = ["noisy"] + list(ARMS)
    means = {s: {m: round(float(np.mean([r[s][m] for r in rows])), 3)
                 for m in ("segsnr", "lsd", "stoi", "pesq")}
             for s in systems}
    record = {"held_out": list(HELD_OUT), "epochs": args.epochs,
              "arms": {a: {"ml_flag": ARMS[a][0], "shapefactor": ARMS[a][1]}
                       for a in ARMS},
              "per_condition": rows, "mean": means}
    with open(os.path.join(work, "AB.json"), "w") as f:
        json.dump(record, f, indent=1)

    lines = [
        "# MMSE vs ML-GGD A/B — models trained by tpu_se",
        "",
        f"Both arms: identical init seed, {args.epochs}-epoch finetune.pl "
        "schedule, topology",
        "1799-2048x3-257, bunch 128, parity gradients; the ONLY difference "
        "is the objective",
        "(`MLflag`/`shapefactor`, `finetune.pl:25-26`). Train corpus: 11 "
        "Enh_demos conditions",
        f"(9 train + 2 CV); held out: {', '.join(HELD_OUT)}.",
        "", "## Held-out means", "",
        "| System | SegSNR (dB) | LSD (dB) | STOI | PESQ |",
        "|---|---|---|---|---|",
    ]
    for s in systems:
        m = means[s]
        lines.append(f"| {s} | {m['segsnr']:.2f} | {m['lsd']:.2f} | "
                     f"{m['stoi']:.3f} | {m['pesq']:.2f} |")
    lines += ["", "## Per condition", ""]
    for r in rows:
        lines.append(f"### {r['condition']}")
        lines.append("")
        lines.append("| System | SegSNR | LSD | STOI | PESQ |")
        lines.append("|---|---|---|---|---|")
        for s in systems:
            m = r[s]
            lines.append(f"| {s} | {m['segsnr']:.2f} | {m['lsd']:.2f} | "
                         f"{m['stoi']:.3f} | {m['pesq']:.2f} |")
        lines.append("")
    with open(os.path.join(work, "AB.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    sys.exit(main())
