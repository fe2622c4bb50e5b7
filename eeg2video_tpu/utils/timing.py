"""Timing / metric accumulation (reference EEG-VP/EEG_VP_train_test.py:59-86
``Accumulator``/``Timer`` utilities), plus a jax.profiler trace hook."""

from __future__ import annotations

import contextlib
import time


class Accumulator:
    """Accumulate sums over n variables (reference L59-71)."""

    def __init__(self, n: int):
        self.data = [0.0] * n

    def add(self, *args):
        self.data = [a + float(b) for a, b in zip(self.data, args)]

    def reset(self):
        self.data = [0.0] * len(self.data)

    def __getitem__(self, idx):
        return self.data[idx]


class Timer:
    """Record multiple running times (reference L72-86)."""

    def __init__(self):
        self.times = []
        self.start()

    def start(self):
        self.tik = time.time()

    def stop(self):
        self.times.append(time.time() - self.tik)
        return self.times[-1]

    def sum(self):
        return sum(self.times)

    def avg(self):
        return sum(self.times) / len(self.times) if self.times else 0.0


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """jax.profiler trace region; no-op when logdir is None (the framework's
    replacement for the reference's ad-hoc prints, SURVEY.md section 5.1)."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
