"""Cross-validation against the reference C tools, compiled and run live.

The strongest parity evidence we can produce: build the reference's own
front-end (``Wav2LPS_be``) and vocoder (``LPS2Wav_be``) from the sources in
``/root/reference`` with gcc, run them on fresh inputs, and compare against
``tpu_se.dsp`` outputs.  Unlike the golden-file tests (which pin 2 checked-in
.lps files), this validates arbitrary inputs through the full decode path —
exp/noisy-phase/OLA reconstruction, SegSNR (clamped), and LSD.

Skipped when gcc or the reference tree is unavailable.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REF = "/root/reference"
WAV = os.path.join(REF, "Feature_prepare/data/TEST_DR8_MPAM0_SX289.wav")

pytestmark = pytest.mark.skipif(
    shutil.which("gcc") is None or not os.path.exists(WAV),
    reason="gcc or reference tree unavailable")


@pytest.fixture(scope="module")
def ref_bins(tmp_path_factory):
    d = tmp_path_factory.mktemp("refbuild")
    for name, src in [
        ("Wav2LPS_be", "Feature_prepare/SourceCode_Wav2LogSpec_be"),
        ("LPS2Wav_be", "Test_code/SourceCode_LogSpec2Wav_be"),
    ]:
        srcs = sorted(
            os.path.join(REF, src, f)
            for f in os.listdir(os.path.join(REF, src)) if f.endswith(".c"))
        subprocess.run(
            ["gcc", "-O2", "-w", "-o", str(d / name), *srcs, "-lm"],
            check=True, capture_output=True)
    return d


def test_lps_extraction_matches_reference_binary(ref_bins, tmp_path):
    from tpu_se.dsp import wav_to_lps
    from tpu_se.io import read_htk, read_wav, write_raw

    wave, _ = read_wav(WAV)
    raw = tmp_path / "in.raw"
    write_raw(raw, wave)
    out = tmp_path / "ref.lps"
    subprocess.run([str(ref_bins / "Wav2LPS_be"), "-F", "RAW", "-fs", "16",
                    str(raw), str(out)], check=True, capture_output=True)
    ref, _ = read_htk(out)
    ours = wav_to_lps(wave)
    assert ours.shape == ref.shape
    d = np.abs(ours - ref)
    # fp32 split-radix FFT vs windowed-DFT GEMM: tiny accumulation diffs
    assert d.max() < 5e-3
    assert d.mean() < 1e-4


def test_vocoder_and_metrics_match_reference_binary(ref_bins, tmp_path):
    from tpu_se.dsp import reconstruct, wav_to_lps
    from tpu_se.dsp.metrics import segsnr_lsd_pair
    from tpu_se.io import read_wav, write_htk, write_raw

    clean, _ = read_wav(WAV)
    rng = np.random.default_rng(7)
    noisy = (clean.astype(np.float32) + rng.normal(0, 800, clean.shape)
             ).clip(-32768, 32767).astype(np.int16)
    # "enhanced" LPS = clean LPS: exercises exp/phase/OLA and both metrics
    enh = wav_to_lps(clean)
    write_raw(tmp_path / "clean.raw", clean)
    write_raw(tmp_path / "noisy.raw", noisy)
    write_htk(tmp_path / "enh.lps", enh, samp_period=160000)

    info = tmp_path / "info.txt"
    out_raw = tmp_path / "out.raw"
    subprocess.run(
        [str(ref_bins / "LPS2Wav_be"), str(tmp_path / "clean.raw"),
         str(tmp_path / "noisy.raw"), str(tmp_path / "enh.lps"),
         str(info), str(out_raw), "-F", "RAW", "-fs", "16"],
        check=True, capture_output=True)

    # reference output raw is native little-endian int16 (LogSpec2Wav.c:825)
    ref_wave = np.fromfile(out_raw, dtype="<i2").astype(np.int32)
    wave, recon = reconstruct(enh, noisy)
    assert len(wave) == len(ref_wave)
    d = np.abs(wave.astype(np.int32) - ref_wave)
    assert d.max() <= 1          # int16 rounding LSB only
    assert d.mean() < 1e-2

    lines = info.read_text().splitlines()
    ref_segsnr = float(lines[lines.index("Segmental SNR:") + 1])
    ref_lsd = float(lines[lines.index("Log-Spectral Distortion:") + 1])
    power = np.where(enh < -50.0, np.exp(-50.0), np.exp(enh))
    m = segsnr_lsd_pair(clean, noisy, recon, power)
    assert m["segsnr"] == pytest.approx(ref_segsnr, abs=2e-4)
    assert m["lsd"] == pytest.approx(ref_lsd, abs=2e-4)


@pytest.mark.parametrize("khz,sr", [(8, 8000), (11, 11000)])
def test_lps_extraction_other_rates(ref_bins, tmp_path, khz, sr):
    """8/11 kHz framing configs (Wav2LogSpec_be.c:340-366) vs the binary."""
    from tpu_se.dsp import wav_to_lps
    from tpu_se.io import read_htk, write_raw

    rng = np.random.default_rng(khz)
    wave = (rng.normal(0, 3000, sr * 2)).clip(-32768, 32767).astype(np.int16)
    raw = tmp_path / "in.raw"
    write_raw(raw, wave)
    out = tmp_path / "ref.lps"
    subprocess.run([str(ref_bins / "Wav2LPS_be"), "-F", "RAW", "-fs",
                    str(khz), str(raw), str(out)],
                   check=True, capture_output=True)
    ref, hdr = read_htk(out)
    assert hdr.n_dim == 129
    ours = wav_to_lps(wave, sample_rate=sr)
    assert ours.shape == ref.shape
    d = np.abs(ours - ref)
    assert d.max() < 5e-3
    assert d.mean() < 1e-4


@pytest.mark.parametrize("khz,sr", [(8, 8000), (11, 11000)])
def test_vocoder_other_rates(ref_bins, tmp_path, khz, sr):
    """Multi-hop OLA (11 kHz overlaps 3 frames) vs the reference binary."""
    from tpu_se.dsp import reconstruct, wav_to_lps
    from tpu_se.io import write_htk, write_raw

    rng = np.random.default_rng(khz + 100)
    t = np.arange(sr)
    clean = (6000 * np.sin(2 * np.pi * 440 * t / sr)
             + rng.normal(0, 500, sr)).clip(-32768, 32767).astype(np.int16)
    noisy = (clean + rng.normal(0, 800, clean.shape)
             ).clip(-32768, 32767).astype(np.int16)
    enh = wav_to_lps(clean, sample_rate=sr)
    write_raw(tmp_path / "clean.raw", clean)
    write_raw(tmp_path / "noisy.raw", noisy)
    write_htk(tmp_path / "enh.lps", enh, samp_period=160000)
    out_raw = tmp_path / "out.raw"
    subprocess.run(
        [str(ref_bins / "LPS2Wav_be"), str(tmp_path / "clean.raw"),
         str(tmp_path / "noisy.raw"), str(tmp_path / "enh.lps"),
         str(tmp_path / "info.txt"), str(out_raw), "-F", "RAW",
         "-fs", str(khz)],
        check=True, capture_output=True)
    ref_wave = np.fromfile(out_raw, dtype="<i2").astype(np.int32)
    wave, _ = reconstruct(enh, noisy, sample_rate=sr)
    assert len(wave) == len(ref_wave)
    d = np.abs(wave.astype(np.int32) - ref_wave)
    assert d.max() <= 1
    assert d.mean() < 1e-2
