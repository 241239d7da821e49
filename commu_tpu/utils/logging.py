"""Run logging (reference: logger.py:1-11, commu/model/exp_utils.py:7-37).

One process owns all devices, so the reference's per-rank log files collapse
to a single ``train.log`` plus console output.
"""
from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Optional


def configure_logging(work_dir: Optional[str] = None,
                      name: str = "ComMU") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    console = logging.StreamHandler(sys.stdout)
    console.setFormatter(fmt)
    logger.addHandler(console)
    if work_dir is not None:
        Path(work_dir).mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(str(Path(work_dir) / "train.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger
