"""Objective quality scoring of waveform pairs.

The reference computes SegSNR and LSD inside its vocoder
(``Test_code/SourceCode_LogSpec2Wav_be/LogSpec2Wav.c:595-610,734-795``) and
reports PESQ/STOI only in the paper. Here the full metric stack is a
library call over (clean, test) waveform pairs, shared by the ``tpu_se
eval`` CLI and ``tools/demo_metrics.py``.
"""

from __future__ import annotations

import numpy as np

METRICS = ("segsnr", "lsd", "stoi", "pesq")


def score_pair(clean: np.ndarray, test: np.ndarray,
               fs: int = 16000) -> dict:
    """Score a degraded/enhanced waveform against its clean original.

    Returns ``{"segsnr", "lsd", "stoi", "pesq"}`` — SegSNR clamped to
    [-20, 30] dB per frame and LSD with the 50 dB dynamic-range floor,
    both matching the reference vocoder's definitions; STOI and MOS-LQO
    PESQ from tpu_se's native implementations.
    """
    from tpu_se.dsp import frame_signal
    from tpu_se.dsp.metrics import lsd, power_spectra, segsnr
    from tpu_se.infer.pesq import pesq
    from tpu_se.infer.stoi import stoi

    n = min(len(clean), len(test))
    clean, test = clean[:n], test[:n]
    cf, tf = frame_signal(clean), frame_signal(test)
    return {
        "segsnr": segsnr(cf, tf),
        "lsd": lsd(power_spectra(cf), power_spectra(tf)),
        "stoi": stoi(clean, test, fs),
        "pesq": pesq(clean, test, fs),
    }


def score_files(clean_paths: list, test_paths: list) -> list[dict]:
    """Score matching (clean, test) wav file pairs; returns one dict per
    pair with the file name under ``"name"`` plus the four metrics."""
    from tpu_se.io import read_wav

    if len(clean_paths) != len(test_paths):
        raise ValueError(
            f"{len(clean_paths)} clean vs {len(test_paths)} test files")
    rows = []
    for cpath, tpath in zip(clean_paths, test_paths):
        clean, fs_c = read_wav(cpath)
        test, fs_t = read_wav(tpath)
        if fs_c != fs_t:
            raise ValueError(
                f"rate mismatch: {cpath} {fs_c} Hz vs {tpath} {fs_t} Hz")
        row = {"name": str(tpath)}
        row.update(score_pair(np.asarray(clean), np.asarray(test), fs_c))
        rows.append(row)
    return rows
