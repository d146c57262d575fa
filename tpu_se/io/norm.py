""".norm file codec: global Z-score statistics (mean + RECIPROCAL std-dev).

Text format written by QuickNet's qnnorm (``tools_pfile/get_norm.pl:3``) and
read by the trainer (``Train_code_ML_GGD/Interface.cc:373-399``):

    vec <D>
    <D mean lines>
    vec <D>
    <D inverse-std-dev lines>

The trainer skips exactly one line before each block; the Test_code copy of
the file simply omits the ``vec`` headers for MATLAB ``load``
(``Test_code/decode.m:6-8``).  The reader here accepts both variants.
Normalization everywhere is ``x_norm = (x - mean) * inv_std``.
"""

from __future__ import annotations

import numpy as np


def read_norm(path, dim: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Read a .norm file -> (mean, inv_std) float32 arrays."""
    values = []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "vec":
                continue
            values.append(float(tok[0]))
    arr = np.asarray(values, dtype=np.float32)
    if dim is None:
        if len(arr) % 2:
            raise ValueError(f"odd number of values ({len(arr)}) in norm file")
        dim = len(arr) // 2
    if len(arr) != 2 * dim:
        raise ValueError(f"expected {2*dim} values, got {len(arr)}")
    return arr[:dim].copy(), arr[dim:].copy()


def write_norm(path, mean: np.ndarray, inv_std: np.ndarray,
               with_headers: bool = True) -> None:
    mean = np.asarray(mean).ravel()
    inv_std = np.asarray(inv_std).ravel()
    if mean.shape != inv_std.shape:
        raise ValueError("mean/inv_std shape mismatch")
    d = len(mean)
    with open(path, "w") as f:
        if with_headers:
            f.write(f"vec {d}\n")
        for v in mean:
            f.write(f"{v:.6g}\n")
        if with_headers:
            f.write(f"vec {d}\n")
        for v in inv_std:
            f.write(f"{v:.6g}\n")


def compute_norm(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """qnnorm equivalent: per-dimension mean and reciprocal std over all frames.

    Uses the population (biased) standard deviation, matching QuickNet's
    accumulation of sum / sum-of-squares over N frames.
    """
    features = np.asarray(features, dtype=np.float64)
    mean = features.mean(axis=0)
    var = np.maximum(features.var(axis=0), 1e-20)
    return mean.astype(np.float32), (1.0 / np.sqrt(var)).astype(np.float32)


def compute_norm_pfile(path, block_frames: int | None = None
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Streaming qnnorm: per-dim mean + reciprocal std over a pfile on disk.

    Accumulates float64 sum / sum-of-squares over ``read_pfile_rows`` blocks
    — O(block) memory like QuickNet's streaming qnnorm binary
    (``tools_pfile/get_norm.pl:3``), so 100-hour-scale archives (~24 GB)
    norm fine on a small host.  Matches ``compute_norm`` (which also
    accumulates in float64, after its upfront astype): one-pass
    sum/sumsq-minus-mean² vs numpy's two-pass variance differ only at
    float64 rounding — measured bitwise-identical after the float32 cast
    on a 3M-frame LPS-scale array, and byte-identical .norm output is
    pinned on the bundled fixture.
    """
    from tpu_se.io.pfile import STREAM_BLOCK_FRAMES, read_pfile_rows, \
        read_pfile_meta

    if block_frames is None:
        block_frames = STREAM_BLOCK_FRAMES
    _, n_frames, dim, _ = read_pfile_meta(path)
    s = np.zeros(dim, dtype=np.float64)
    ss = np.zeros(dim, dtype=np.float64)
    done = 0
    while done < n_frames:
        n = min(block_frames, n_frames - done)
        block = read_pfile_rows(path, dim, done, done + n).astype(np.float64)
        s += block.sum(axis=0)
        ss += np.square(block).sum(axis=0)
        done += n
    mean = s / n_frames
    var = np.maximum(ss / n_frames - mean * mean, 1e-20)
    return mean.astype(np.float32), (1.0 / np.sqrt(var)).astype(np.float32)
