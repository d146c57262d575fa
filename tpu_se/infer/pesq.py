"""PESQ — native numpy implementation of the ITU-T P.862 algorithm.

The paper behind the reference evaluates MMSE vs ML-GGD enhancement with
PESQ and STOI (SURVEY.md §6, README.md:3); the reference repo ships no
metric code, the ITU source is not redistributable, and the optional
``pesq`` wheel is not installed in this environment.  This module
implements the published P.862 perceptual model end-to-end:

  level alignment -> time alignment (crude global + utterance-level
  fine) -> Hann STFT -> Bark-domain pitch
  power densities -> partial frequency compensation -> short-term gain
  compensation -> Zwicker loudness -> masked symmetric + asymmetric
  disturbance -> (L2/L1 over frequency, L6-over-syllables/L2-over-time)
  aggregation -> raw PESQ -> MOS-LQO map (P.862.1 narrowband /
  P.862.2 wideband).

The psychoacoustic tables are *derived* from their published formulas
(Schroeder Bark warping ``7*asinh(f/650)``, Terhardt absolute-threshold
curve) rather than copied from the ITU code, so scores are P.862-faithful
in structure and monotone in degradation but are NOT ITU-certified values;
``pesq_score`` in :mod:`tpu_se.infer.stoi` prefers the certified package
whenever it is installed and falls back to this implementation.

Intended use is the same as in the paper: *ranking* enhancement systems
(ML-GGD vs MMSE vs noisy) on matched clean/degraded pairs.
"""

from __future__ import annotations

import numpy as np

_GAMMA = 0.23          # Zwicker loudness exponent
_NB = 49               # Bark bands (P.862 uses 49)
_SL = 0.55             # loudness scale; calibrated so additive-white-noise
                       # MOS-LQO tracks published P.862.2 behavior
                       # (SNR -5/0/10/20/30 dB -> ~1.1/1.2/1.6/2.2/3.0)
_TARGET_POWER = 1e7    # active-speech band power after level alignment
_MASK = 0.25           # masking fraction of min loudness
_ASYM_MIN = 3.0        # asymmetry factor deadzone
_ASYM_MAX = 12.0       # asymmetry factor clip
_FRAME_DISTURBANCE_CAP = 45.0
_SYLLABLE = 20         # frames per L6 aggregation chunk (~320 ms)


def _bark(f: np.ndarray | float) -> np.ndarray:
    return 7.0 * np.arcsinh(np.asarray(f, dtype=np.float64) / 650.0)


def _terhardt_threshold_db(f: np.ndarray) -> np.ndarray:
    """Absolute threshold of hearing (dB SPL), Terhardt 1979."""
    fk = np.maximum(f, 20.0) / 1000.0
    return (3.64 * fk ** -0.8
            - 6.5 * np.exp(-0.6 * (fk - 3.3) ** 2)
            + 1e-3 * fk ** 4)


def _mode_params(fs: int) -> tuple[int, int, float]:
    """(frame, hop, f_hi) — 32 ms Hann frames, 50% overlap."""
    if fs == 16000:
        return 512, 256, 8000.0
    if fs == 8000:
        return 256, 128, 4000.0
    raise ValueError(f"PESQ supports fs of 8000/16000, got {fs}")


def _band_matrix(fs: int, frame: int, f_hi: float
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Bark membership [Nb, bins], centre freqs, threshold power, widths."""
    freqs = np.fft.rfftfreq(frame, d=1.0 / fs)
    z_lo, z_hi = _bark(50.0), _bark(f_hi)
    edges = np.linspace(z_lo, z_hi, _NB + 1)
    z = _bark(freqs)
    mat = np.zeros((_NB, len(freqs)))
    for b in range(_NB):
        sel = (z >= edges[b]) & (z < edges[b + 1])
        if not sel.any():                       # guarantee non-empty bands
            sel[np.argmin(np.abs(z - 0.5 * (edges[b] + edges[b + 1])))] = True
        mat[b] = sel
    centre_f = 650.0 * np.sinh((edges[:-1] + edges[1:]) / 14.0)
    widths = np.diff(edges)                      # bark width per band
    # Power units: level alignment puts active speech at _TARGET_POWER,
    # taken as 79 dB SPL -> threshold T dB SPL = _TARGET_POWER*10^((T-79)/10)
    thresh = _TARGET_POWER * 10.0 ** (
        (_terhardt_threshold_db(centre_f) - 79.0) / 10.0)
    return mat, centre_f, thresh, widths


def _frames(x: np.ndarray, frame: int, hop: int) -> np.ndarray:
    n = 1 + (len(x) - frame) // hop if len(x) >= frame else 0
    idx = np.arange(frame)[None, :] + hop * np.arange(n)[:, None]
    return x[idx]


def _align(ref: np.ndarray, deg: np.ndarray, fs: int
           ) -> tuple[np.ndarray, np.ndarray]:
    """Crude (global) time alignment via envelope cross-correlation.

    P.862 stage 1: one global lag searched within ±0.5 s at 4 ms
    resolution.  Stage 2 (utterance-level fine alignment) is
    :func:`_fine_align`.
    """
    hop = max(fs // 250, 1)
    n = min(len(ref), len(deg)) // hop * hop
    er = np.abs(ref[:n]).reshape(-1, hop).sum(axis=1)
    ed = np.abs(deg[:n]).reshape(-1, hop).sum(axis=1)
    er = er - er.mean()
    ed = ed - ed.mean()
    span = min(len(er) - 1, int(0.5 * fs / hop))
    lags = np.arange(-span, span + 1)
    corr = np.correlate(ed, er, mode="full")
    mid = len(er) - 1
    lag = int(lags[np.argmax(corr[mid - span: mid + span + 1])]) * hop
    if lag > 0:
        deg = deg[lag:]
    elif lag < 0:
        ref = ref[-lag:]
    n = min(len(ref), len(deg))
    return ref[:n], deg[:n]


def _utterance_spans(ref: np.ndarray, fs: int) -> list[tuple[int, int]]:
    """Speech-active utterance spans [start, end) in samples.

    P.862's utterance splitting: a coarse (4 ms) energy envelope is
    thresholded relative to its peak, gaps shorter than 200 ms are closed
    (one utterance spans them), and active sections shorter than 100 ms
    are dropped."""
    hop = max(fs // 250, 1)
    n = len(ref) // hop * hop
    if n == 0:
        return []
    env = np.abs(ref[:n]).reshape(-1, hop).sum(axis=1)
    active = env > env.max() * 1e-2
    min_gap = int(0.200 * fs / hop)
    min_utt = int(0.100 * fs / hop)
    spans = []
    start = None
    silence = 0
    for k, a in enumerate(active):
        if a:
            if start is None:
                start = k
            silence = 0
        elif start is not None:
            silence += 1
            if silence > min_gap:
                end = k - silence + 1
                if end - start >= min_utt:
                    spans.append((start * hop, end * hop))
                start = None
                silence = 0
    if start is not None:
        end = len(active)
        while end > start and not active[end - 1]:
            end -= 1
        if end - start >= min_utt:
            spans.append((start * hop, end * hop))
    return spans


def _fine_align(ref: np.ndarray, deg: np.ndarray, fs: int) -> np.ndarray:
    """P.862 stage 2: per-utterance fine time alignment.

    For each utterance of the (crude-aligned) reference, the sample-level
    lag within ±25 ms that maximizes the envelope cross-correlation against
    the degraded signal is found; low-confidence peaks (flat correlation —
    silence-dominated or heavily corrupted utterances) keep the crude
    delay, as P.862 keeps the previous delay estimate when the alignment
    confidence is poor.  Returns a degraded signal re-timed so every
    utterance is paired at its own delay (silence keeps the crude timing).

    Structural simplification vs the full ITU algorithm: utterances are
    not recursively split on mid-utterance delay CHANGES (VoIP jitter);
    for the delay-per-utterance case (and the delay-free enhancement
    pipelines this framework scores) the behavior matches.
    """
    out = deg.copy()
    span_w = int(0.025 * fs)
    for s, e in _utterance_spans(ref, fs):
        r = np.abs(ref[s:e])
        r = r - r.mean()
        lo = max(0, s - span_w)
        hi = min(len(deg), e + span_w)
        d = np.abs(deg[lo:hi])
        d = d - d.mean()
        if len(d) <= len(r):
            continue
        corr = np.correlate(d, r, mode="valid")   # lag axis: lo-s .. hi-e
        k = int(np.argmax(corr))
        # Confidence gate: normalized cross-correlation at the peak lag.
        # Measured on this exact computation: aligned/delayed utterances
        # score 0.63-0.99 even under heavy noise, while wiped/uncorrelated
        # degraded segments score <= 0.02 (a raw peak/rms statistic does
        # NOT separate these clusters).  Below 0.25 the crude delay is
        # kept, as P.862 keeps its previous delay estimate on low
        # alignment confidence.
        win = d[k: k + len(r)]
        denom = float(np.linalg.norm(r) * np.linalg.norm(win)) or 1.0
        if corr[k] / denom < 0.25:
            continue
        lag = k + (lo - s)                        # delay of deg vs ref
        if lag == 0:
            continue
        src_lo, src_hi = s + lag, e + lag
        seg = deg[max(0, src_lo): min(len(deg), src_hi)]
        pad_l = max(0, -src_lo)
        pad_r = (e - s) - pad_l - len(seg)
        out[s:e] = np.concatenate([
            np.zeros(pad_l), seg, np.zeros(max(0, pad_r))])[: e - s]
    return out


def _power_spectra(x: np.ndarray, frame: int, hop: int) -> np.ndarray:
    win = np.hanning(frame + 2)[1:-1]
    f = _frames(x, frame, hop) * win
    return np.abs(np.fft.rfft(f, axis=1)) ** 2


def _level_align(power: np.ndarray, freqs_mask: np.ndarray) -> np.ndarray:
    """Scale power spectra so active 350-3250 Hz frame power = 1e7."""
    band = power[:, freqs_mask].sum(axis=1)
    active = band > band.max() * 1e-4
    mean_p = band[active].mean() if active.any() else band.mean()
    return power * (_TARGET_POWER / max(mean_p, 1e-30))


def _loudness(pitch_power: np.ndarray, thresh: np.ndarray) -> np.ndarray:
    """Zwicker loudness density per Bark band (sones/bark)."""
    ratio = pitch_power / thresh
    loud = (_SL * (thresh / 0.5) ** _GAMMA
            * ((0.5 + 0.5 * ratio) ** _GAMMA - 1.0))
    return np.where(ratio > 1.0, loud, 0.0)


def _time_aggregate(d: np.ndarray, weights: np.ndarray) -> float:
    """L6 norm over ~320 ms syllables, then L2 over syllables (P.862)."""
    d = d / weights
    n = len(d)
    chunks = []
    for s in range(0, n, _SYLLABLE // 2):        # 50% overlapped syllables
        seg = d[s: s + _SYLLABLE]
        if len(seg):
            chunks.append(np.mean(seg ** 6.0) ** (1.0 / 6.0))
    return float(np.sqrt(np.mean(np.square(chunks))))


def pesq(ref: np.ndarray, deg: np.ndarray, fs: int = 16000,
         return_raw: bool = False, fine_align: bool = True) -> float:
    """P.862-style PESQ MOS-LQO of ``deg`` against clean ``ref``.

    fs=16000 -> wideband model + P.862.2 map (range ~[1.04, 4.64]);
    fs=8000 -> narrowband model + P.862.1 map.  ``return_raw`` gives the
    pre-map raw PESQ in [-0.5, 4.5].  ``fine_align`` enables P.862's
    utterance-level fine time alignment on top of the crude global lag
    (a no-op for delay-free pipelines; pinned by
    ``tests/test_pesq_anchors.py``).
    """
    ref = np.asarray(ref, dtype=np.float64).ravel()
    deg = np.asarray(deg, dtype=np.float64).ravel()
    frame, hop, f_hi = _mode_params(fs)
    ref, deg = _align(ref, deg, fs)
    if fine_align:
        deg = _fine_align(ref, deg, fs)
    if len(ref) < 2 * frame:
        raise ValueError("signal too short for PESQ")

    mat, centre_f, thresh, widths = _band_matrix(fs, frame, f_hi)
    freqs = np.fft.rfftfreq(frame, d=1.0 / fs)
    level_mask = (freqs >= 350.0) & (freqs <= 3250.0)

    p_ref = _level_align(_power_spectra(ref, frame, hop), level_mask)
    p_deg = _level_align(_power_spectra(deg, frame, hop), level_mask)

    # Pitch power densities [T, Nb].
    ppd_ref = p_ref @ mat.T
    ppd_deg = p_deg @ mat.T

    tot_ref = ppd_ref.sum(axis=1)
    active = tot_ref > tot_ref.max() * 1e-4      # speech-active frames

    # Partial frequency compensation: equalize the REFERENCE toward the
    # degraded long-term spectrum, ratio clipped to +/-20 dB (P.862 §10.2.4).
    num = ppd_deg[active].sum(axis=0) + 1e3
    den = ppd_ref[active].sum(axis=0) + 1e3
    ppd_ref_eq = ppd_ref * np.clip(num / den, 1e-2, 1e2)

    # Short-term gain compensation: equalize the DEGRADED frame power to
    # the reference, first-order smoothed, clipped (P.862 §10.2.5).
    g = ((ppd_ref_eq.sum(axis=1) + 5e4)
         / (ppd_deg.sum(axis=1) + 5e4))
    smoothed = np.empty_like(g)
    prev = 1.0
    for t in range(len(g)):                      # T is small; loop is fine
        prev = 0.8 * prev + 0.2 * g[t]
        smoothed[t] = prev
    ppd_deg_eq = ppd_deg * np.clip(smoothed, 3e-4, 5.0)[:, None]

    l_ref = _loudness(ppd_ref_eq, thresh)
    l_deg = _loudness(ppd_deg_eq, thresh)

    # Masked disturbance density.
    diff = l_deg - l_ref
    mask = _MASK * np.minimum(l_deg, l_ref)
    d = np.maximum(np.abs(diff) - mask, 0.0)

    # Asymmetry factor from the (compensated) power densities.
    h = ((ppd_deg_eq + 50.0) / (ppd_ref_eq + 50.0)) ** 1.2
    h = np.where(h < _ASYM_MIN, 0.0, np.minimum(h, _ASYM_MAX))

    # Frequency aggregation over the Bark axis, weighted by band widths:
    # L2 integral for the symmetric disturbance, L1 for the asymmetric
    # (P.862 §10.2.7); both capped per frame.
    d_sym = np.minimum(np.sqrt((widths * d ** 2).sum(axis=1)),
                       _FRAME_DISTURBANCE_CAP)
    d_asym = np.minimum((widths * d * h).sum(axis=1), _FRAME_DISTURBANCE_CAP)

    # Frames weighted down slightly when the reference is loud (P.862 h_n).
    w = ((ppd_ref_eq.sum(axis=1) + 1e5) / 1e7) ** 0.04
    sym = _time_aggregate(d_sym, w)
    asym = _time_aggregate(d_asym, w)

    raw = float(np.clip(4.5 - 0.1 * sym - 0.0309 * asym, -0.5, 4.5))
    if return_raw:
        return raw
    return mos_lqo_map(raw, fs)


def mos_lqo_map(raw: float, fs: int = 16000) -> float:
    """Published raw-PESQ -> MOS-LQO sigmoid.

    fs=16000: ITU-T P.862.2 (wideband), y = 0.999 + 4/(1+e^(-1.3669x+3.8224));
    fs=8000:  ITU-T P.862.1 (narrowband), y = 0.999 + 4/(1+e^(-1.4945x+4.6607)).
    Exposed so conformance tests can probe the exact constants the scoring
    path uses (tests/test_pesq_anchors.py).
    """
    if fs == 16000:
        return 0.999 + 4.0 / (1.0 + np.exp(-1.3669 * raw + 3.8224))
    return 0.999 + 4.0 / (1.0 + np.exp(-1.4945 * raw + 4.6607))
