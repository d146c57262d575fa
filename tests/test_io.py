"""Codec tests against the reference's bundled golden artifacts."""

import numpy as np
import pytest

from tpu_se.io import (
    read_htk, write_htk, read_norm, write_norm, read_pfile, read_pfile_header,
    write_pfile, read_wav, write_wav, read_wts, write_wts,
)
from tpu_se.io.norm import compute_norm


def test_read_golden_lps(reference_dir):
    data, hdr = read_htk(reference_dir / "Feature_prepare/data/TEST_DR8_MPAM0_SX289.lps")
    assert hdr.n_samples == 168
    assert hdr.samp_period == 160000
    assert hdr.samp_size == 1028
    assert hdr.param_kind == 9
    assert data.shape == (168, 257)
    assert np.all(data >= -50.0)
    assert np.isfinite(data).all()


def test_htk_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(17, 257)).astype(np.float32)
    path = tmp_path / "x.htk"
    write_htk(path, data)
    back, hdr = read_htk(path)
    np.testing.assert_array_equal(back, data)
    assert hdr.n_dim == 257


def test_htk_no_header(tmp_path):
    """-noh output = the same BE float rows with the 12-byte header omitted
    (Wav2LogSpec_be.c:172,602)."""
    rng = np.random.default_rng(1)
    data = rng.normal(size=(5, 257)).astype(np.float32)
    with_hdr, no_hdr = tmp_path / "h.htk", tmp_path / "n.htk"
    write_htk(with_hdr, data)
    write_htk(no_hdr, data, no_header=True)
    assert no_hdr.read_bytes() == with_hdr.read_bytes()[12:]


def test_read_golden_wav(reference_dir):
    wave, sr = read_wav(reference_dir / "Feature_prepare/data/TEST_DR8_MPAM0_SX289.wav")
    assert sr == 16000
    assert wave.dtype == np.int16
    assert len(wave) == 43264


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    wave = rng.integers(-3000, 3000, size=12345).astype(np.int16)
    path = tmp_path / "x.wav"
    write_wav(path, wave, 16000)
    back, sr = read_wav(path)
    assert sr == 16000
    np.testing.assert_array_equal(back, wave)


def test_read_bundled_pfile(reference_dir):
    pf = read_pfile(reference_dir / "tools_pfile/train_noisy.pfile")
    assert pf.num_sentences == 10
    assert pf.num_frames == 1885
    assert pf.dim == 257
    assert pf.sent_ends[-1] == 1885
    # Sentence lengths must match the bundled frame_numbers.len file
    # (one frame-count per line; the pfile holds the first 10 utterances).
    with open(reference_dir / "tools_pfile/frame_numbers.len") as f:
        lens = [int(line) for _, line in zip(range(10), f)]
    np.testing.assert_array_equal(pf.sent_lengths(), lens)
    # Row bookkeeping columns must be consistent with the sentence table.
    assert pf.sent_ids[0] == 0 and pf.sent_ids[-1] == 9
    assert pf.frame_ids[0] == 0
    np.testing.assert_array_equal(
        np.bincount(pf.sent_ids, minlength=10), lens)


def test_noisy_clean_pfiles_aligned(reference_dir):
    noisy = read_pfile(reference_dir / "tools_pfile/train_noisy.pfile")
    clean = read_pfile(reference_dir / "tools_pfile/train_clean.pfile")
    np.testing.assert_array_equal(noisy.sent_ends, clean.sent_ends)
    assert clean.features.shape == noisy.features.shape


def test_pfile_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    utts = [rng.normal(size=(t, 5)).astype(np.float32) for t in (7, 3, 12)]
    path = tmp_path / "x.pfile"
    write_pfile(path, utts)
    pf = read_pfile(path)
    assert pf.num_sentences == 3
    np.testing.assert_array_equal(pf.sent_lengths(), [7, 3, 12])
    for i, utt in enumerate(utts):
        np.testing.assert_array_equal(pf.sentence(i), utt)
    hdr = read_pfile_header(path)
    assert hdr["num_frames"].split()[0] == "22"


def test_read_bundled_norm(reference_dir):
    mean, inv_std = read_norm(reference_dir / "tools_pfile/train_noisy.norm", 257)
    assert mean.shape == (257,) and inv_std.shape == (257,)
    assert abs(mean[0] - 14.2505) < 1e-4
    assert np.all(inv_std > 0)


def test_norm_matches_qnnorm_stats(reference_dir):
    """Our compute_norm must reproduce qnnorm's output on the bundled pfile."""
    pf = read_pfile(reference_dir / "tools_pfile/train_noisy.pfile")
    mean, inv_std = compute_norm(pf.features)
    ref_mean, ref_inv = read_norm(reference_dir / "tools_pfile/train_noisy.norm", 257)
    np.testing.assert_allclose(mean, ref_mean, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(inv_std, ref_inv, rtol=2e-3)


def test_norm_roundtrip(tmp_path):
    mean = np.linspace(-1, 1, 257).astype(np.float32)
    inv = np.linspace(0.5, 2, 257).astype(np.float32)
    for headers in (True, False):
        path = tmp_path / f"x{headers}.norm"
        write_norm(path, mean, inv, with_headers=headers)
        m2, i2 = read_norm(path, 257)
        np.testing.assert_allclose(m2, mean, rtol=1e-5)
        np.testing.assert_allclose(i2, inv, rtol=1e-5)


def test_read_wts_written_by_reference_binary(reference_dir, tmp_path):
    """Read a .wts produced by the reference's own Gen_rand_net binary."""
    import shutil
    import subprocess
    src = reference_dir / "Train_code_ML_GGD/pretraining_weights/Gen_rand_net"
    exe = tmp_path / "Gen_rand_net"
    shutil.copy(src, exe)
    exe.chmod(0o755)
    out = tmp_path / "golden.wts"
    try:
        subprocess.run([str(exe), "4", "21", "16", "16", "9", str(tmp_path),
                        str(out), "1", "2"], check=True, capture_output=True,
                       timeout=60)
    except (OSError, subprocess.CalledProcessError):
        pytest.skip("reference Gen_rand_net binary not runnable here")
    layers = read_wts(out)
    shapes = [(l["w"].shape, l["b"].shape) for l in layers]
    assert shapes == [
        ((21, 16), (16,)), ((16, 16), (16,)), ((16, 9), (9,)),
    ]
    # Gen_rand_net: biases zero, weights uniform in +-2*sqrt(6)/sqrt(nin+nout)
    # (Gen_rand_net.cpp:84-103).
    for layer in layers:
        np.testing.assert_array_equal(layer["b"], 0.0)
        n_in, n_out = layer["w"].shape
        bound = 2.0 * np.sqrt(6.0) / np.sqrt(n_in + n_out)
        assert np.abs(layer["w"]).max() <= bound * 1.0001
        assert np.abs(layer["w"]).max() >= bound * 0.9


def test_wts_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    layers = [
        {"w": rng.normal(size=(10, 8)).astype(np.float32),
         "b": rng.normal(size=8).astype(np.float32)},
        {"w": rng.normal(size=(8, 3)).astype(np.float32),
         "b": rng.normal(size=3).astype(np.float32)},
    ]
    path = tmp_path / "x.wts"
    write_wts(path, layers)
    back = read_wts(path)
    for a, b in zip(layers, back):
        np.testing.assert_array_equal(a["w"], b["w"])
        np.testing.assert_array_equal(a["b"], b["b"])


def test_frames_in_htk_file(reference_dir):
    from tpu_se.io import frames_in_htk_file
    path = reference_dir / "Feature_prepare/data/TEST_DR8_MPAM0_SX289.lps"
    assert frames_in_htk_file(path, 257) == 168


def test_concat_and_deslen(tmp_path):
    from tpu_se.io import concat_pfiles
    rng = np.random.default_rng(7)
    a = [rng.normal(size=(9, 4)).astype(np.float32)]
    b = [rng.normal(size=(5, 4)).astype(np.float32),
         rng.normal(size=(6, 4)).astype(np.float32)]
    write_pfile(tmp_path / "a.pfile", a)
    write_pfile(tmp_path / "b.pfile", b)
    concat_pfiles(tmp_path / "ab.pfile",
                  [tmp_path / "a.pfile", tmp_path / "b.pfile"])
    pf = read_pfile(tmp_path / "ab.pfile")
    assert pf.num_sentences == 3
    np.testing.assert_array_equal(pf.sent_lengths(), [9, 5, 6])
    np.testing.assert_array_equal(pf.sentence(2), b[1])
    # deslenfile-style truncation on write.
    write_pfile(tmp_path / "t.pfile", a + b, desired_lengths=[4, 5, 2])
    pf2 = read_pfile(tmp_path / "t.pfile")
    np.testing.assert_array_equal(pf2.sent_lengths(), [4, 5, 2])
    np.testing.assert_array_equal(pf2.sentence(0), a[0][:4])


def test_nist_sphere_read(tmp_path):
    # Synthesize a minimal NIST SPHERE file and read it back.
    samples = np.arange(-50, 50, dtype="<i2")
    hdr_body = (b"NIST_1A\n   1024\n"
                b"sample_rate -i 16000\n"
                b"channel_count -i 1\n"
                b"sample_byte_format -s2 01\n"
                b"sample_n_bytes -i 2\n"
                b"end_head\n")
    path = tmp_path / "x.sph"
    with open(path, "wb") as f:
        f.write(hdr_body.ljust(1024, b" "))
        f.write(samples.tobytes())
    wave, sr = read_wav(path)
    assert sr == 16000
    np.testing.assert_array_equal(wave, samples)


def test_htk_waveform_read(tmp_path):
    import struct
    from tpu_se.io.wav import read_htk_waveform
    samples = np.arange(100, dtype=np.int16)
    path = tmp_path / "x.htkwav"
    with open(path, "wb") as f:
        f.write(struct.pack(">iihh", len(samples), 625, 2, 0))
        f.write(samples.astype(">i2").tobytes())
    wave, sr = read_htk_waveform(path)
    assert sr == 16000
    np.testing.assert_array_equal(wave, samples)
