"""Logging bootstrap + metrics sink.

Equivalent of utils/log_utils.py:10-38 (loguru sinks + output dir +
resolved-config dump) and the TensorBoard scalar sink of
utils/report_utils.py, with stdlib logging and a JSONL metrics file (no
TensorBoard dependency in this image — the JSONL is trivially plottable).
"""

from __future__ import annotations

import json
import logging
import os
import pathlib
import sys
import time
from typing import Optional


def _stderr_is_file(path: pathlib.Path) -> bool:
    """True when stderr is already redirected into ``path`` (supervisor
    scripts run fits with ``>> output.log 2>&1``) — adding a FileHandler
    for the same file would then duplicate every line."""
    try:
        st_err = os.fstat(sys.stderr.fileno())
        st_f = os.stat(path)
        return (st_err.st_dev, st_err.st_ino) == (st_f.st_dev, st_f.st_ino)
    except (OSError, ValueError):
        return False


def setup_logging(model_path: Optional[str] = None,
                  filename: str = "output.log") -> logging.Logger:
    logger = logging.getLogger("gsvc_tpu")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    logger.propagate = False
    fmt = logging.Formatter(
        "%(asctime)s | %(levelname)s | %(message)s", "%H:%M:%S")
    sh = logging.StreamHandler(sys.stderr)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if model_path:
        p = pathlib.Path(model_path)
        p.mkdir(parents=True, exist_ok=True)
        target = p / filename
        if not (target.exists() and _stderr_is_file(target)):
            fh = logging.FileHandler(target)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


class MetricsWriter:
    """Append-only JSONL scalar sink (the TB-replacement)."""

    def __init__(self, model_path: str, name: str = "metrics.jsonl"):
        p = pathlib.Path(model_path)
        p.mkdir(parents=True, exist_ok=True)
        self._f = open(p / name, "a")

    def write(self, step: int, **scalars):
        rec = {"step": step, "time": time.time()}
        for k, v in scalars.items():
            rec[k] = float(v) if hasattr(v, "__float__") else v
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


def dump_config(cfg, model_path: str):
    from gsvc_tpu.config import save_config

    p = pathlib.Path(model_path)
    p.mkdir(parents=True, exist_ok=True)
    save_config(cfg, str(p / "cfg_args.yaml"))
