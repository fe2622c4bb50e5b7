"""CLI: evaluate generated clips against ground truth.

Contract of reference 40_class_run_metrics.py main loop (legacy L284-374 /
new L352-441): walk 200 test GIFs, map prediction index -> GT video via the
block-6 GT_label ordering, accumulate SSIM/MSE (+ PSNR/hue, fixed versions)
and, when classifier checkpoints are locally available, 2-way/40-way
image (ViT) and video (VideoMAE) n-way accuracies."""

import argparse
import json
import os

import numpy as np

from ..data import meta
from ..data.video import load_gif
from ..eval import (
    hue_score_only,
    mse_score_only,
    psnr_score_only,
    ssim_score_only,
)
from ..utils import get_logger
from ..utils.cache import enable_persistent_cache

log = get_logger(__name__)


def main(argv=None):
    # on-disk XLA executable cache: warm restarts skip minutes of
    # compilation (utils/cache.py for rationale + measurements)
    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pred_dir", required=True, help="generated {i}.gif clips (class order)")
    p.add_argument("--gt_dir", required=True, help="ground-truth Block6 gifs (presentation order)")
    p.add_argument("--n_clips", type=int, default=200)
    p.add_argument("--classifier", action="store_true",
                   help="also run ViT/VideoMAE n-way metrics (needs local HF caches)")
    p.add_argument("--n_way", type=int, nargs="*", default=[2, 40])
    p.add_argument("--num_trials", type=int, default=100)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    # prediction i is the i-th clip in CLASS order; the matching GT clip in
    # presentation order comes through the block-6 reorder indices
    # (reference legacy L284-290)
    idx = meta.block_reorder_indices(6)
    gt_order = (idx[:, None] * meta.N_REPS + np.arange(meta.N_REPS)).reshape(-1)

    preds, gts = [], []
    for i in range(args.n_clips):
        preds.append(load_gif(os.path.join(args.pred_dir, f"{i}.gif")))
        gts.append(load_gif(os.path.join(args.gt_dir, f"{int(gt_order[i])}.gif")))
    preds = np.stack(preds).astype(np.float32)
    gts = np.stack(gts).astype(np.float32)
    pf = preds.reshape(-1, *preds.shape[2:])  # frames
    gf = gts.reshape(-1, *gts.shape[2:])

    results = {}
    results["ssim"], results["ssim_std"] = ssim_score_only(pf, gf)
    results["mse"], results["mse_std"] = mse_score_only(pf, gf)
    results["psnr"], results["psnr_std"] = psnr_score_only(pf, gf)
    results["hue"], results["hue_std"] = hue_score_only(pf, gf)

    if args.classifier:
        from ..eval.metrics import classifier_metrics

        rng = np.random.default_rng(0)
        for nw in args.n_way:
            accs, _ = classifier_metrics(pf, gf, kind="image", n_way=nw,
                                         num_trials=args.num_trials, rng=rng)
            results[f"img_{nw}way"] = float(np.mean(accs))
            accs, _ = classifier_metrics(preds, gts, kind="video", n_way=nw,
                                         num_trials=args.num_trials, rng=rng)
            results[f"video_{nw}way"] = float(np.mean(accs))

    print(json.dumps(results, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    log.info("metrics over %d clips written", args.n_clips)


if __name__ == "__main__":
    main()
