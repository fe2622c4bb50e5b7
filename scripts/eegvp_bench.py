"""EEG-VP 7-fold benchmark throughput: serial folds vs the fold-parallel
vmapped program (train/eegvp.py) at the real recipe shapes — DE_1per1s
(7, 400, 62, 5), glfnet_mlp, batch 256, 100 epochs (reference
EEG-VP/EEG_VP_train_test.py:23-25,134-135).

Usage: PYTHONPATH=. python scripts/eegvp_bench.py [--serial] [--parallel]
Times the SECOND call of each path (first call compiles over the tunnel).
"""

import argparse
import time

import numpy as np

import jax
from eeg2video_tpu.utils.cache import enable_persistent_cache

from eeg2video_tpu.data import meta
from eeg2video_tpu.train.eegvp import EEGVPConfig, run_benchmark


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--serial", action="store_true")
    p.add_argument("--parallel", action="store_true")
    p.add_argument("--epochs", type=int, default=100)
    args = p.parse_args()
    if not (args.serial or args.parallel):
        args.serial = args.parallel = True

    enable_persistent_cache(min_compile_time_secs=1.0)
    rng = np.random.default_rng(0)
    reps = 10  # DE_1per1s: 2 windows x 5 reps
    n = meta.N_CONCEPTS * reps
    feats = rng.standard_normal((7, n, 62, 5)).astype(np.float32)
    labels = meta.all_labels(reps)  # (7, 400)
    cfg = EEGVPConfig(epochs=args.epochs)

    for name, kw in [("serial", {}), ("parallel", {"fold_parallel": True})]:
        if not getattr(args, name):
            continue
        run_benchmark(feats, labels, cfg, seed=0, **kw)  # compile
        t0 = time.time()
        res = run_benchmark(feats, labels, cfg, seed=0, **kw)
        dt = time.time() - t0
        ex = 7 * 5 * n * args.epochs  # 5 train blocks per fold
        print(f"{name}: 7-fold benchmark {dt:.2f} s warm "
              f"({ex / dt / 1e3:.0f}k examples/s, top1_mean "
              f"{res['top1_mean']:.3f})")


if __name__ == "__main__":
    main()
    import os

    os._exit(0)
