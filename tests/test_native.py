"""Native C++ loader vs the numpy oracle."""

import subprocess

import numpy as np
import pytest

from tpu_se.io import native
from tpu_se.io.norm import read_norm
from tpu_se.io.pfile import PFILE_HEADER_SIZE, read_pfile, read_pfile_rows


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        # Try to build it once.
        import pathlib
        root = pathlib.Path(__file__).resolve().parent.parent
        subprocess.run(["make", "-C", str(root / "native")], check=False,
                       capture_output=True)
        native._TRIED = False  # re-probe
        if not native.available():
            pytest.skip("native library not built")


def test_native_read_matches_numpy(reference_dir):
    path = reference_dir / "tools_pfile/train_noisy.pfile"
    mean, inv = read_norm(reference_dir / "tools_pfile/train_noisy.norm", 257)
    got = native.read_chunk_normalized(path, PFILE_HEADER_SIZE, 257,
                                       100, 400, mean, inv)
    rows = read_pfile_rows(path, 257, 100, 400)
    want = (rows - mean) * inv
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_native_splice_scatter():
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(50, 5)).astype(np.float32)
    starts = np.array([0, 10, 20, 3], dtype=np.int32)
    scatter = np.array([2, 0, 3, 1], dtype=np.int32)
    out = native.splice_scatter(frames, starts, scatter, context=3)
    assert out.shape == (4, 15)
    np.testing.assert_array_equal(out[2], frames[0:3].ravel())
    np.testing.assert_array_equal(out[0], frames[10:13].ravel())
    np.testing.assert_array_equal(out[1], frames[3:6].ravel())
    # Identity scatter.
    out2 = native.splice_scatter(frames, starts, None, context=3)
    np.testing.assert_array_equal(out2[0], frames[0:3].ravel())


def test_native_gather_targets():
    rng = np.random.default_rng(1)
    frames = rng.normal(size=(30, 4)).astype(np.float32)
    starts = np.array([0, 5, 9], dtype=np.int32)
    out = native.gather_targets(frames, starts, None, offset=3)
    np.testing.assert_array_equal(out, frames[starts + 3])


def test_dataset_native_matches_numpy(reference_dir):
    from tpu_se.data import PfilePairDataset

    args = (reference_dir / "tools_pfile/train_noisy.pfile",
            reference_dir / "tools_pfile/train_clean.pfile",
            reference_dir / "tools_pfile/train_noisy.norm", (0, 7))
    ds_native = PfilePairDataset(*args, use_native=True)
    ds_numpy = PfilePairDataset(*args, use_native=False)
    cn = ds_native.chunk(0)
    cp = ds_numpy.chunk(0)
    np.testing.assert_allclose(cn.noisy, cp.noisy, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(cn.clean, cp.clean, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(cn.starts, cp.starts)
