"""Device-trace profiling utilities.

The reference has no profiler beyond a hand-rolled examples/sec Timer
(reference EEG-VP/EEG_VP_train_test.py:72-86).  Here: jax.profiler traces —
which DO capture per-op XLA device events through the axon TPU tunnel — plus
a parser/summarizer for the emitted ``*.trace.json.gz`` so step-time can be
attributed per op/bucket without external tooling (the workflow behind every
round-2 optimization, BENCH_NOTES.md).

Typical use::

    from eeg2video_tpu.utils import profiling
    with profiling.trace("/tmp/my_trace"):
        for _ in range(3):
            out = step_fn(...)
        jax.block_until_ready(out)
    events = profiling.load_trace("/tmp/my_trace")
    print(profiling.summarize(events, n_iters=3))
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import re
from dataclasses import dataclass
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler.trace as a context manager (alias for symmetry with
    load_trace; callers must sync device work inside the block)."""
    import jax

    with jax.profiler.trace(logdir):
        yield


@dataclass
class OpEvent:
    name: str
    dur_us: float
    long_name: str = ""


def load_trace(logdir: str, device_only: bool = True) -> List[OpEvent]:
    """Parse the newest ``*.trace.json.gz`` under ``logdir`` into XLA op
    events.  ``device_only`` keeps only 'XLA Ops' rows of device (TPU)
    processes; on CPU traces (no device process) all 'XLA Ops' rows are
    returned."""
    paths = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_name: Dict[int, str] = {}
    tid_name: Dict[tuple, str] = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_name[e["pid"]] = e["args"]["name"]
            elif e.get("name") == "thread_name":
                tid_name[(e["pid"], e["tid"])] = e["args"]["name"]
    device_pids = {p for p, n in pid_name.items()
                   if "TPU" in n or "GPU" in n}
    out = []
    for e in events:
        if e.get("ph") != "X":
            continue
        tname = tid_name.get((e.get("pid"), e.get("tid")), "")
        if device_pids:
            # device trace: the per-op lane is the 'XLA Ops' thread
            if tname != "XLA Ops" or (device_only
                                      and e.get("pid") not in device_pids):
                continue
        else:
            # CPU traces have no 'XLA Ops' lane; ops run on the PjRt client
            # threads — take everything that is not host python
            if tname == "python":
                continue
        args = e.get("args", {})
        out.append(OpEvent(e.get("name", ""), float(e.get("dur", 0.0)),
                           args.get("long_name", "")))
    return out


def bucket_of(name: str, long_name: str = "") -> str:
    if "_flash" in name:
        return "flash-kernel"
    if "_pallas" in name:
        return "pallas-kernel"
    if ("convert_reduce_fusion" in name or "convolution" in name
            or re.search(r"\bbf16\[3,3,\d+,\d+\]", long_name)):
        # fusions consuming a 3x3 conv weight ARE the convolution on TPU
        return "conv/reduce-fusions"
    for k in ("copy", "pad", "reshape", "slice", "broadcast", "transpose"):
        if name.startswith(k):
            return "layout"
    if "fusion" in name:
        return "fusion(other)"
    return re.sub(r"[.\d]+$", "", name) or "misc"


def summarize(events: List[OpEvent], n_iters: int = 1, top: int = 15) -> str:
    """Human-readable per-iteration attribution: bucket totals + top ops."""
    total = sum(e.dur_us for e in events)
    buckets = collections.Counter()
    per_op = collections.defaultdict(float)
    sample: Dict[str, str] = {}
    for e in events:
        buckets[bucket_of(e.name, e.long_name)] += e.dur_us
        per_op[e.name] += e.dur_us
        if e.long_name and e.name not in sample:
            sample[e.name] = e.long_name.split(" = ")[-1].split(" ")[0][:70]
    lines = [f"total {total / n_iters / 1e3:.2f} ms/iter "
             f"({len(events)} op events / {n_iters} iters)"]
    for k, v in buckets.most_common():
        lines.append(f"  {v / n_iters / 1e3:8.2f} ms  {k}")
    lines.append("top ops:")
    for name, d in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        lines.append(f"  {d / n_iters / 1e3:8.3f} ms  {name:36s} "
                     f"{sample.get(name, '')}")
    return "\n".join(lines)


def profile_fn(fn, *args, logdir: str, iters: int = 3,
               warmup: bool = True) -> str:
    """Compile/warm ``fn``, trace ``iters`` calls, return the summary."""
    import jax

    if warmup:
        jax.block_until_ready(fn(*args))
    with trace(logdir):
        out = None
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    return summarize(load_trace(logdir), n_iters=iters)
