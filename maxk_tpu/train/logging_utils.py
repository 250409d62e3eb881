"""Logging + metric recording.

File+stream logger matching the reference's format (reference
utils/general_utils.py:13-29); scalar metrics go to a JSONL file with
TensorBoard-style tags (``train/loss`` etc. — the tags the reference
writes via tensorboardX at maxk_gnn_dgl.py:105-108), so runs remain
machine-readable without a TB dependency.
"""

from __future__ import annotations

import json
import logging
import os
import time
from pathlib import Path


def get_logger(file_path: str, name: str = "maxk_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.handlers.clear()
    formatter = logging.Formatter("%(message)s")
    fh = logging.FileHandler(file_path)
    fh.setFormatter(formatter)
    sh = logging.StreamHandler()
    sh.setFormatter(formatter)
    logger.addHandler(fh)
    logger.addHandler(sh)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    return logger


class MetricsWriter:
    """Append-only JSONL scalar writer with TB-style tags."""

    def __init__(self, log_dir: str):
        Path(log_dir).mkdir(parents=True, exist_ok=True)
        self._path = Path(log_dir) / "scalars.jsonl"
        self._f = open(self._path, "a")
        self._t0 = time.time()

    def add_scalar(self, tag: str, value, step: int):
        rec = {"tag": tag, "value": float(value), "step": int(step),
               "wall": round(time.time() - self._t0, 3)}
        self._f.write(json.dumps(rec) + "\n")

    def add_text(self, tag: str, text: str, step: int = 0):
        self._f.write(json.dumps({"tag": tag, "text": text,
                                  "step": int(step)}) + "\n")

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()


class AverageMeter:
    """Running average (reference utils/general_utils.py:39-57)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
