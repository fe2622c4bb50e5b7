"""Structured per-step training metrics (SURVEY.md section 5.5).

The reference logs through accelerate's tracker into wandb
(train_finetune_videodiffusion.py:264-265, 337) plus ad-hoc prints.  Here:
a host-0 JSONL writer every trainer uses, with an optional wandb backend
when the package + credentials exist (zero-egress safe)."""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, out_dir: str, run_name: str = "train",
                 use_wandb: bool = False, project: str = "eeg2video-tpu"):
        self._fh = None
        self._wandb = None
        try:
            import jax

            if jax.process_index() != 0:
                return
        except Exception:
            pass
        os.makedirs(out_dir, exist_ok=True)
        self._fh = open(os.path.join(out_dir, f"{run_name}_metrics.jsonl"), "a")
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project=project, name=run_name)
            except Exception:
                self._wandb = None  # package missing or offline — JSONL only

    def log(self, step: int, **metrics):
        if self._fh is None:
            return
        rec = {"step": int(step), "time": time.time(), **{
            k: float(v) for k, v in metrics.items()}}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        if self._fh:
            self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
