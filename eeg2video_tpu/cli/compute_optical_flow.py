"""CLI: per-clip optical-flow motion scores for DANA.

Produces the ``All_video_optical_flow_score.npy`` table (blocks, clips)
that the reference DANA stage loads but never computes (reference
EEG2Video_New/DANA/add_noise.py:103 — the file ships as external dataset
meta-info with no producer in the tree).  Reads the per-block GIF
directories written by ``cli.extract_gif`` (``Block{i}/{idx}.gif`` in
presentation order, the same order the score table is indexed in) and runs
the batched Horn-Schunck estimator on device.

Scores are mean flow magnitude in pixels/frame-step at GIF resolution;
absolute scale differs from the shipped table's unpublished estimator, so
when feeding these into ``cli.add_noise`` re-anchor the fast/slow split
with its ``--threshold`` (e.g. to the score quantile matching your
dataset's fast-motion fraction).
"""

import argparse
import os

import numpy as np

from ..data import meta
from ..data.io import save_array
from ..utils import get_logger

log = get_logger(__name__)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--gif_dir", default="./data/Video_gifs",
                   help="directory with Block{i}/ GIF subdirectories")
    p.add_argument("--out", default="./data/meta_info/All_video_optical_flow_score.npy")
    p.add_argument("--blocks", type=int, default=meta.N_BLOCKS)
    p.add_argument("--alpha", type=float, default=1.0,
                   help="Horn-Schunck smoothness weight")
    p.add_argument("--iters", type=int, default=100, help="iterations per pyramid level")
    p.add_argument("--levels", type=int, default=3, help="pyramid levels")
    p.add_argument("--chunk", type=int, default=25, help="clips per device dispatch")
    args = p.parse_args(argv)

    from ..data.optical_flow import score_clips
    from ..data.video import load_gif

    expected = meta.N_CONCEPTS * meta.N_REPS
    all_scores = []
    for b in range(args.blocks):
        block_dir = os.path.join(args.gif_dir, f"Block{b}")
        names = sorted((f for f in os.listdir(block_dir) if f.endswith(".gif")),
                       key=lambda f: int(os.path.splitext(f)[0]))
        if len(names) != expected:
            log.warning("Block%d has %d clips (expected %d)", b, len(names), expected)
        clips = [load_gif(os.path.join(block_dir, f)) for f in names]
        # imageio collapses duplicate consecutive GIF frames on read; restore
        # the true frame count by repeating the last frame (a collapsed
        # duplicate is zero motion, so the restored pairs score 0 as they
        # should)
        n_frames = max(c.shape[0] for c in clips)
        clips = [np.concatenate([c] + [c[-1:]] * (n_frames - c.shape[0]))
                 if c.shape[0] < n_frames else c for c in clips]
        frames = np.stack(clips)
        if n_frames == 1:  # every clip fully static
            scores = np.zeros(len(names), np.float32)
        else:
            scores = score_clips(frames, alpha=args.alpha, n_iter=args.iters,
                                 levels=args.levels, chunk=min(args.chunk, len(names)))
        all_scores.append(scores)
        log.info("Block%d: %d clips, score mean %.3f min %.3f max %.3f",
                 b, len(names), scores.mean(), scores.min(), scores.max())

    table = np.stack(all_scores).astype(np.float32)
    save_array(args.out, table)
    log.info("flow scores %s -> %s", table.shape, args.out)


if __name__ == "__main__":
    main()
