"""Atomic file writes: tmp + flush + fsync + rename, tmp unlinked on error.

Presence-implies-completeness is a load-bearing contract in this framework
(resume-by-existence at epoch AND chunk granularity, ``finetune.pl:49``,
``train/loop.py``), so every checkpoint-class file goes through this one
helper — a crash or kill at any point leaves either the old complete file
or the new complete file under the final name, never a truncated one.
"""

from __future__ import annotations

import os


def atomic_write(path, write_fn, mode: str = "wb") -> None:
    """Write ``path`` atomically: ``write_fn(f)`` fills a tmp file which is
    flushed, fsync'd and renamed over ``path``; on any error the tmp file
    is removed and the exception re-raised."""
    path = os.fspath(path)
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, mode) as f:
            write_fn(f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
