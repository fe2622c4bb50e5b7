"""Structured logging on host 0 — replaces the reference's
accelerate.logging.get_logger + print mix (train_finetune_videodiffusion.py:39,104-116)."""

from __future__ import annotations

import logging
import sys


def get_logger(name: str = "eeg2video_tpu", level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(asctime)s - %(levelname)s - %(name)s - %(message)s",
            datefmt="%m/%d/%Y %H:%M:%S",
        ))
        logger.addHandler(h)
        logger.setLevel(level)
    try:
        import jax
        if jax.process_index() != 0:
            logger.setLevel(logging.ERROR)  # host-0-only logging
    except Exception:
        pass
    return logger
