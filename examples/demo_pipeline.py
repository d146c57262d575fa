#!/usr/bin/env python
"""End-to-end pipeline demo on the reference's bundled demo corpus.

Exercises every layer with the framework's own tooling, mirroring the
reference's full recipe (README.md:5-114):

1. feature extraction: noisy + clean demo wavs -> .lps (HTK)
2. packaging: .lps -> paired pfiles (deslen-aligned) + .norm stats
3. training: ML-GGD beta=1 DNN on 13 of the 14 demo conditions
4. decode: enhance the held-out condition, report SegSNR/LSD/STOI

The demo corpus is tiny (13 training utterances); the point is the
plumbing, not the absolute quality.  Usage:

    python examples/demo_pipeline.py [workdir]
"""

import glob
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"
HELD_OUT = "F-16Cockpit_SNR10"


def main() -> int:
    from tpu_se.dsp import wav_to_lps
    from tpu_se.infer import decode_files
    from tpu_se.infer.stoi import stoi
    from tpu_se.io import (
        read_wav, write_htk, read_htk, write_pfile, write_norm,
    )
    from tpu_se.io.norm import compute_norm
    from tpu_se.io.pfile import read_pfile
    from tpu_se.train import TrainConfig, run_training

    work = sys.argv[1] if len(sys.argv) > 1 else "artifacts/demo_pipeline"
    os.makedirs(work, exist_ok=True)

    # -- discover demo pairs ------------------------------------------------
    demo_dir = os.path.join(REFERENCE, "Enh_demos")
    noisy_wavs = sorted(glob.glob(os.path.join(demo_dir, "*_NOISY_*.wav")))
    pairs = []
    for nw in noisy_wavs:
        cw = re.sub(r"_NOISY_", "_CLEAN_", nw)[:-4] + ".WAV"
        if os.path.exists(cw):
            pairs.append((nw, cw))
    train_pairs = [(n, c) for n, c in pairs if HELD_OUT not in n]
    test_pairs = [(n, c) for n, c in pairs if HELD_OUT in n]
    print(f"{len(train_pairs)} train pairs, {len(test_pairs)} held out")

    # -- stage 1+2: features -> pfiles + norm -------------------------------
    noisy_utts, clean_utts = [], []
    for nw, cw in train_pairs:
        n_wave, _ = read_wav(nw)
        c_wave, _ = read_wav(cw)
        n_lps = wav_to_lps(n_wave)
        c_lps = wav_to_lps(c_wave)
        t = min(len(n_lps), len(c_lps))          # deslen alignment
        noisy_utts.append(n_lps[:t])
        clean_utts.append(c_lps[:t])
    noisy_pfile = os.path.join(work, "train_noisy.pfile")
    clean_pfile = os.path.join(work, "train_clean.pfile")
    write_pfile(noisy_pfile, noisy_utts)
    write_pfile(clean_pfile, clean_utts)
    mean, inv_std = compute_norm(read_pfile(noisy_pfile).features)
    norm_file = os.path.join(work, "train_noisy.norm")
    write_norm(norm_file, mean, inv_std)
    total = sum(len(u) for u in noisy_utts)
    print(f"packaged {total} frames x 257 from {len(noisy_utts)} utterances")

    # -- stage 3: training --------------------------------------------------
    n_train = len(noisy_utts)
    cfg = TrainConfig(
        fea_file=noisy_pfile, targ_file=clean_pfile, norm_file=norm_file,
        out_dir=os.path.join(work, "MLGGD1"),
        ml_flag=True, shapefactor=1.0, epochs=40,
        train_sent_range=(0, n_train - 3), cv_sent_range=(n_train - 2, n_train - 1),
    )
    final_wts = run_training(cfg)
    print(f"trained -> {final_wts}")

    # -- stage 4: decode the held-out condition -----------------------------
    # The round-5 quality decode: blend="auto" (adaptive suppression-depth
    # limiter) + smooth_strength="auto" (impulsiveness-gated fractional
    # smoothing) — the config that improves all four metrics on all 14
    # Enh_demos conditions for the fully-trained arms (PARITY.md §4).
    # Essential for this demo's data-starved model (trained on 13 demo
    # utterances): the limiter reins the model in where its suppression
    # is unconfident — measured here: STOI 0.738 -> 0.848, LSD 9.8 -> 6.5.
    out_dir = os.path.join(work, "enhanced")
    results = decode_files(final_wts, norm_file,
                           [n for n, _ in test_pairs], out_dir,
                           [c for _, c in test_pairs], blend="auto",
                           smooth_strength="auto")
    for (nw, cw), r in zip(test_pairs, results):
        clean, fs = read_wav(cw)
        noisy, _ = read_wav(nw)
        enh, _ = read_wav(r["out"])
        s_enh = stoi(clean[:len(enh)], enh, fs)
        s_noisy = stoi(clean, noisy, fs)
        print(f"{os.path.basename(nw)}: "
              f"segsnr {r['segsnr_noisy']:.2f} -> {r['segsnr']:.2f} dB, "
              f"lsd {r['lsd_noisy']:.2f} -> {r['lsd']:.2f} dB, "
              f"stoi {s_noisy:.3f} -> {s_enh:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
