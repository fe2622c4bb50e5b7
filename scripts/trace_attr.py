"""Attribute a captured device trace by module path / phase / efficiency.

The XLA-Ops trace rows carry ``tf_op`` (the jax op_name path), ``model_flops``
and ``bytes_accessed`` per op — enough to answer "where does the step go and
is each bucket compute- or bandwidth-bound" without matching op names against
a separately dumped HLO (numbering drifts between compilations).

Usage:
  python scripts/trace_attr.py /tmp/train_trace --iters 3 [--min-ms 0.5]
      [--leaf-re REGEX]   # only ops whose tf_op matches; prints per-op rows
"""

import argparse
import gzip
import glob
import json
import re
from collections import defaultdict

PEAK_TFS = 197.0  # v5e bf16


def load(logdir):
    paths = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(logdir)
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    pid_name, tid_name = {}, {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_name[e["pid"]] = e["args"]["name"]
            elif e.get("name") == "thread_name":
                tid_name[(e["pid"], e["tid"])] = e["args"]["name"]
    device_pids = {p for p, n in pid_name.items() if "TPU" in n or "GPU" in n}
    for e in data["traceEvents"]:
        if e.get("ph") != "X":
            continue
        if tid_name.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        yield e


def phase_of(tf_op):
    if "rematted_computation" in tf_op:
        return "remat"
    if "transpose(jvp" in tf_op:
        return "bwd"
    return "fwd"


def leaf_of(tf_op):
    tail = tf_op.split("UNet3DConditionModel)/")[-1]
    tail = re.sub(r"(down|up)\d", r"\1*", tail)
    tail = re.sub(r"resnet\d", "resnet*", tail)
    tail = re.sub(r"attn\d\b", "attnM", tail)  # Transformer3DModel index
    parts = [p for p in tail.split("/") if not p.startswith(("jit(", "checkpoint", "rematted"))]
    return "/".join(parts[-3:])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("logdir")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--min-ms", type=float, default=0.5)
    p.add_argument("--leaf-re", default=None)
    p.add_argument("--top", type=int, default=45)
    args = p.parse_args()

    groups = defaultdict(lambda: [0.0, 0.0, 0.0])  # us, flops, bytes
    for e in load(args.logdir):
        a = e.get("args", {})
        tf_op = a.get("tf_op", "?")
        if args.leaf_re and not re.search(args.leaf_re, tf_op):
            continue
        key = ((phase_of(tf_op), leaf_of(tf_op)) if not args.leaf_re
               else (phase_of(tf_op), tf_op[-80:]))
        g = groups[key]
        g[0] += e["dur"]
        g[1] += float(a.get("model_flops", 0) or 0)
        g[2] += float(a.get("raw_bytes_accessed", 0) or 0)

    rows = sorted(groups.items(), key=lambda kv: -kv[1][0])
    tot = sum(g[0] for g in groups.values()) / args.iters / 1e3
    print(f"total {tot:.2f} ms/iter over {len(groups)} groups")
    shown = 0
    for (phase, leaf), (us, fl, by) in rows:
        ms = us / args.iters / 1e3
        if ms < args.min_ms or shown >= args.top:
            continue
        shown += 1
        tfs = fl / us / 1e6 if us else 0.0  # model_flops/us = MFLOP/ms -> TF/s
        gbs = by / us / 1e3 if us else 0.0  # bytes/us -> GB/s
        eff = f"{tfs:6.0f} TF/s" if tfs > 1 else f"{gbs:6.0f} GB/s"
        print(f"{ms:8.3f} ms  {eff}  {phase:5s}  {leaf}")


if __name__ == "__main__":
    main()
