"""File codecs for the reference pipeline's on-disk formats.

Every cross-layer boundary in the reference is a big-endian binary file
(SURVEY.md §2.3).  These codecs are byte-compatible with the reference
artifacts so models/features/checkpoints interchange both ways.
"""

from tpu_se.io.wav import read_wav, write_wav, read_raw, write_raw
from tpu_se.io.htk import read_htk, write_htk, HTKHeader, frames_in_htk_file
from tpu_se.io.pfile import (read_pfile, write_pfile, concat_pfiles, PFile,
                             PfileWriter, read_pfile_header, read_pfile_meta,
                             read_pfile_rows)
from tpu_se.io.norm import read_norm, write_norm, compute_norm_pfile
from tpu_se.io.wts import read_wts, write_wts

__all__ = [
    "read_wav", "write_wav", "read_raw", "write_raw",
    "read_htk", "write_htk", "HTKHeader", "frames_in_htk_file",
    "read_pfile", "write_pfile", "concat_pfiles", "PFile", "PfileWriter",
    "read_pfile_header", "read_pfile_meta", "read_pfile_rows",
    "read_norm", "write_norm", "compute_norm_pfile",
    "read_wts", "write_wts",
]
