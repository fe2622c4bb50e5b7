"""Structured logging on host 0 — replaces the reference's
accelerate.logging.get_logger + print mix (train_finetune_videodiffusion.py:39,104-116)."""

from __future__ import annotations

import logging
import sys


class _Host0Filter(logging.Filter):
    """Suppress sub-ERROR records on non-zero hosts, deciding AT EMIT TIME.

    get_logger runs at module import, and calling jax.process_index() there
    initializes the XLA backend — after which jax.distributed.initialize()
    refuses to run, so a CLI could never bootstrap multi-process (round 5;
    the reference's accelerate logger has the same lazy semantics).  By the
    first emitted record, main() has already called init_distributed.
    """

    _is_host0: bool | None = None

    def filter(self, record: logging.LogRecord) -> bool:
        if record.levelno >= logging.ERROR:
            return True
        if self._is_host0 is None:
            try:
                import jax

                _Host0Filter._is_host0 = jax.process_index() == 0
            except Exception:
                return True
        return bool(self._is_host0)


def get_logger(name: str = "eeg2video_tpu", level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(asctime)s - %(levelname)s - %(name)s - %(message)s",
            datefmt="%m/%d/%Y %H:%M:%S",
        ))
        h.addFilter(_Host0Filter())
        logger.addHandler(h)
        logger.setLevel(level)
    return logger
