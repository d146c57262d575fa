"""Objective quality metrics: segmental SNR and log-spectral distortion.

Exact re-implementations of the decode-time metrics in
``Test_code/SourceCode_LogSpec2Wav_be/LogSpec2Wav.c``:

- SegSNR (``:595-610,700-710``): per frame over the analysis framing,
  ``10*log10(sum(clean^2) / sum((x - clean)^2))`` clamped to [-20, 30] dB,
  averaged over frames.  The enhanced signal is evaluated per-frame on the
  de-windowed inverse-FFT output, NOT the final OLA waveform.
- LSD (``:734-795``): power spectra of Hamming-windowed frames; each
  utterance's spectrogram is floored at its global max * 10^(-50/10)
  (50 dB dynamic range); per frame RMS over the 257 bins of
  ``10*log10(P_x / P_clean)``, averaged over frames.

Pure numpy: metric evaluation is host-side bookkeeping — no XLA compiles
per utterance shape.
"""

from __future__ import annotations

import numpy as np

from tpu_se.dsp.analysis import frame_signal, hamming_window, rate_config

LOW_SEGSNR = -20.0
HIGH_SEGSNR = 30.0
DYN_RANGE_DB = 50.0


def segsnr(clean_frames: np.ndarray, test_frames: np.ndarray) -> float:
    """Mean clamped per-frame SNR; inputs are raw (un-windowed) [T,512]."""
    clean = np.asarray(clean_frames, dtype=np.float64)
    test = np.asarray(test_frames, dtype=np.float64)
    sig = (clean * clean).sum(axis=1)
    err = ((test - clean) ** 2).sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        snr = 10.0 * np.log10(sig / err)
    snr = np.clip(np.nan_to_num(snr, nan=HIGH_SEGSNR, posinf=HIGH_SEGSNR,
                                neginf=LOW_SEGSNR),
                  LOW_SEGSNR, HIGH_SEGSNR)
    return float(snr.mean())


def power_spectra(frames: np.ndarray) -> np.ndarray:
    """Raw frames [T,len] -> Hamming-windowed power spectra [T,len/2+1]."""
    frame_length = frames.shape[1]
    win = hamming_window(frame_length).astype(np.float64)
    spec = np.fft.rfft(np.asarray(frames, dtype=np.float64) * win[None, :],
                       n=frame_length, axis=-1)
    return (spec.real ** 2 + spec.imag ** 2).astype(np.float32)


def lsd(clean_power: np.ndarray, test_power: np.ndarray) -> float:
    """Mean per-frame log-spectral distortion with 50 dB dynamic-range floor.

    Both spectrograms are [T,257] linear power; each is floored independently
    at its own global max * 10^-5 (``LogSpec2Wav.c:757-788``).
    """
    def _floor(p):
        p = np.asarray(p, dtype=np.float64)
        return np.maximum(p, p.max() * 10.0 ** (-DYN_RANGE_DB / 10.0))

    pc, px = _floor(clean_power), _floor(test_power)
    diff = 10.0 * np.log10(px / pc)
    per_frame = np.sqrt((diff * diff).mean(axis=1))
    return float(per_frame.mean())


def segsnr_lsd_pair(clean_wave: np.ndarray, noisy_wave: np.ndarray,
                    recon_frames: np.ndarray, enhanced_power: np.ndarray,
                    sample_rate: int = 16000) -> dict:
    """All four decode metrics for one utterance, as ``info.txt`` reports them.

    ``recon_frames`` is the de-windowed per-frame reconstruction from
    ``tpu_se.dsp.synthesis.reconstruct``; ``enhanced_power`` the exp'd
    (floored) enhanced LPS [T,257] (``LogSpec2Wav.c:565-571``, the
    ``denoise_spec_vectors`` are the exp'd features, not a re-analysis).
    """
    frame_length, frame_shift, _ = rate_config(sample_rate)
    clean_frames = frame_signal(clean_wave, frame_length, frame_shift)
    noisy_frames = frame_signal(noisy_wave, frame_length, frame_shift)
    t = min(len(clean_frames), len(noisy_frames), len(recon_frames))
    clean_frames, noisy_frames = clean_frames[:t], noisy_frames[:t]
    p_clean = power_spectra(clean_frames)
    p_noisy = power_spectra(noisy_frames)
    return {
        "segsnr": segsnr(clean_frames, recon_frames[:t]),
        "segsnr_noisy": segsnr(clean_frames, noisy_frames),
        "lsd": lsd(p_clean, enhanced_power[:t]),
        "lsd_noisy": lsd(p_clean, p_noisy),
    }
