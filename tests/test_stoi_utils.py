"""STOI metric and utils tests."""

import numpy as np
import pytest

from tpu_se.infer.stoi import stoi, pesq_score
from tpu_se.io import read_wav
from tpu_se.utils import StepTimer, EpochLogger


def test_stoi_identical_is_high(reference_dir):
    clean, fs = read_wav(
        reference_dir / "Enh_demos/F-16Cockpit_SNR10_CLEAN_TEST_DR1_MWBT0_SX23.WAV")
    s = stoi(clean, clean, fs)
    assert s > 0.99


def test_stoi_orders_noisy_vs_clean(reference_dir):
    base = "Enh_demos/F-16Cockpit_SNR10_%s_TEST_DR1_MWBT0_SX23"
    clean, fs = read_wav(reference_dir / ((base % "CLEAN") + ".WAV"))
    noisy, _ = read_wav(reference_dir / ((base % "NOISY") + ".wav"))
    ml, _ = read_wav(reference_dir / ((base % "ML") + ".wav"))
    s_noisy = stoi(clean, noisy, fs)
    s_ml = stoi(clean[:len(ml)], ml, fs)
    assert 0.4 < s_noisy < 1.0
    # The reference's enhanced demo should not be wildly worse than noisy.
    assert s_ml > s_noisy - 0.2


def test_stoi_degrades_with_noise():
    rng = np.random.default_rng(0)
    t = np.arange(30000) / 16000
    clean = (np.sin(2 * np.pi * 440 * t) * 8000
             * (1 + np.sign(np.sin(2 * np.pi * 3 * t)))).astype(np.int16)
    noisy = (clean + rng.normal(scale=6000, size=len(clean))).astype(np.int16)
    assert stoi(clean, noisy, 16000) < stoi(clean, clean, 16000)


def _speechlike(n=32000, fs=16000, seed=0):
    """Amplitude-modulated multi-tone burst signal, speech-shaped enough
    for the level/voice-activity gates in PESQ."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    x = sum(np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
            * a for f, a in ((220, 1.0), (440, 0.7), (880, 0.4),
                             (1760, 0.2), (3000, 0.1)))
    envelope = np.clip(np.sin(2 * np.pi * 2.5 * t), 0, None)
    return (x * envelope * 8000).astype(np.float64)


def test_pesq_score_always_available():
    # gated on the ITU package but falls back to the native P.862 impl
    x = _speechlike()
    s = pesq_score(x, x)
    assert isinstance(s, float) and s > 4.3


def test_pesq_identity_is_max():
    from tpu_se.infer.pesq import pesq
    x = _speechlike()
    assert pesq(x, x, return_raw=True) == 4.5
    assert pesq(x, x) > 4.6


def test_pesq_monotone_in_snr():
    from tpu_se.infer.pesq import pesq
    x = _speechlike()
    rng = np.random.default_rng(1)
    noise = rng.normal(size=len(x))
    noise /= np.sqrt((noise ** 2).mean() / (x ** 2).mean())
    scores = [pesq(x, x + noise * 10 ** (-snr / 20.0))
              for snr in (30, 20, 10, 0)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    # the burst signal is half silence, so even 30 dB SNR noise is plainly
    # audible; require a healthy spread rather than absolute anchors
    assert scores[0] - scores[-1] > 0.5, scores
    assert scores[-1] < 2.0, scores


def test_pesq_narrowband_mode():
    from tpu_se.infer.pesq import pesq
    x = _speechlike(n=16000, fs=8000)
    rng = np.random.default_rng(2)
    noisy = x + rng.normal(scale=x.std() / 2, size=len(x))
    assert pesq(x, x, fs=8000) > 4.4
    assert pesq(x, noisy, fs=8000) < pesq(x, x, fs=8000)


def test_pesq_alignment_recovers_constant_delay():
    from tpu_se.infer.pesq import pesq
    x = _speechlike()
    delayed = np.concatenate([np.zeros(1600), x])[:len(x)]
    # a 100 ms delay must not register as a huge disturbance
    assert pesq(x, delayed) > 3.5


def test_step_timer():
    timer = StepTimer()
    for _ in range(3):
        with timer:
            pass
    s = timer.summary()
    assert s["count"] == 3
    assert s["min_ms"] >= 0


def test_epoch_logger(tmp_path):
    el = EpochLogger(str(tmp_path), 1)
    el("hello")
    el.finish({"cv_squared_error": 1.0, "cv_abs_error": 2.0,
               "cv_ggd_loglik": -3.0})
    assert (tmp_path / "mlp.1.log").exists()
    assert "hello" in (tmp_path / "mlp.1.log").read_text()
    import json
    rec = json.loads((tmp_path / "metrics.jsonl").read_text())
    assert rec["epoch"] == 1


def test_demo_metrics_ml_beats_mmse():
    """Paper claim on Enh_demos ground truth: ML-GGD >= MMSE (PARITY.md §3)."""
    import os
    demos = "/root/reference/Enh_demos"
    if not os.path.isdir(demos):
        import pytest
        pytest.skip("reference demos unavailable")
    from tpu_se.io import read_wav

    def pick(cond, kind):
        match = [f for f in os.listdir(demos)
                 if f.split("_TEST")[0] == f"{cond}_{kind}"]
        return read_wav(os.path.join(demos, match[0]))[0]

    for cond in ("Volvo_SNR-5", "White_SNR5"):
        clean = pick(cond, "CLEAN")
        scores = {}
        for kind in ("NOISY", "MMSE", "ML"):
            test = pick(cond, kind)
            n = min(len(clean), len(test))
            scores[kind] = stoi(clean[:n], test[:n])
        assert scores["ML"] > scores["MMSE"] > scores["NOISY"], (cond, scores)
