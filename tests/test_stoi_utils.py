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


def test_pesq_gated():
    x = np.zeros(16000, dtype=np.int16)
    assert pesq_score(x, x) is None or isinstance(pesq_score(x, x), float)


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
