"""HTK feature file codec (big-endian), byte-compatible with the reference.

Layout (reference writer ``fileio.c:187-243``, verified against
``Feature_prepare/data/*.lps``):

    int32  nSamples      (big-endian)
    int32  sampPeriod    (160000 for the LPS files)
    int16  sampSize      (bytes per frame = nDim*4; 1028 for 257 dims)
    int16  paramKind     (9 = USER)
    float32[nSamples, nDim]  big-endian, row-major
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

HTK_HEADER_SIZE = 12


@dataclass
class HTKHeader:
    n_samples: int
    samp_period: int
    samp_size: int
    param_kind: int

    @property
    def n_dim(self) -> int:
        return self.samp_size // 4


def read_htk(path) -> tuple[np.ndarray, HTKHeader]:
    """Read a big-endian HTK feature file -> (float32 [T, D], header)."""
    with open(path, "rb") as f:
        raw = f.read()
    n_samples, samp_period, samp_size, param_kind = struct.unpack(">iihh", raw[:12])
    hdr = HTKHeader(n_samples, samp_period, samp_size, param_kind)
    n_dim = hdr.n_dim
    data = np.frombuffer(raw, dtype=">f4", count=n_samples * n_dim, offset=12)
    return data.reshape(n_samples, n_dim).astype(np.float32), hdr


def frames_in_htk_file(path, n_dim: int = 257) -> int:
    """Frame count from file size alone: (size - 12) / 4 / n_dim.

    The ``GetLenForFeaScp.pl:52`` method — used to build length files
    without reading the data.
    """
    import os
    return (os.path.getsize(path) - HTK_HEADER_SIZE) // 4 // n_dim


def write_htk(path, data: np.ndarray, samp_period: int = 160000,
              param_kind: int = 9, no_header: bool = False) -> None:
    """Write float32 [T, D] as a big-endian HTK file (reference layout).

    ``no_header=True`` omits the 12-byte header, matching the reference
    front-end's ``-noh`` flag (``Wav2LogSpec_be.c:172,602``)."""
    data = np.asarray(data, dtype=np.float32)
    if data.ndim != 2:
        raise ValueError(f"expected [T, D] array, got shape {data.shape}")
    t, d = data.shape
    with open(path, "wb") as f:
        if not no_header:
            f.write(struct.pack(">iihh", t, samp_period, d * 4, param_kind))
        f.write(data.astype(">f4").tobytes())
