"""Logging/observability.

The reference logs a per-epoch text file: full config echo, chunk progress,
CV metrics (``Interface.cc:338-371``, ``BPtrain.cc:96,132-139``).
``EpochLogger`` reproduces that artifact and adds a machine-readable JSONL
stream alongside (metrics.jsonl) for dashboards/regression tracking.
"""

from __future__ import annotations

import json
import logging
import os
import time


def get_logger(name: str = "tpu_se") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


class EpochLogger:
    """Per-epoch text log + appended metrics.jsonl, reference-style."""

    def __init__(self, out_dir: str, epoch: int):
        self.out_dir = out_dir
        self.epoch = epoch
        self.lines: list[str] = []
        self.t0 = time.time()
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, line: str) -> None:
        self.lines.append(line)

    def config(self, cfg) -> None:
        self("---- config ----")
        for k, v in sorted(vars(cfg).items()):
            self(f"{k} = {v}")
        self("----------------")

    def finish(self, metrics: dict) -> None:
        dt = time.time() - self.t0
        self(f"CV squared error: {metrics.get('cv_squared_error', 0):.6f}")
        self(f"CV abs error: {metrics.get('cv_abs_error', 0):.6f}")
        self(f"CV GGD loglik: {metrics.get('cv_ggd_loglik', 0):.6f}")
        self(f"Total cost time: {dt:.1f} s")
        with open(os.path.join(self.out_dir, f"mlp.{self.epoch}.log"),
                  "w") as f:
            f.write("\n".join(self.lines) + "\n")
        record = {"epoch": self.epoch, "wall_time_s": round(dt, 2), **metrics}
        with open(os.path.join(self.out_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")
