"""CLI: DANA dynamic noise adding over Seq2Seq latents.

Contract of reference EEG2Video_New/DANA/add_noise.py __main__ (L100-130):
optical-flow scores -> beta_d per clip (0.3 fast / 0.2 slow, threshold
1.799), 500-step q-sample, saves 40_classes_latent_add_noise.pt.

The reference computes GT-reordered labels but then indexes the UN-reordered
``labels`` (its L120 bug, SURVEY.md 2.3).  Default here is the corrected
(reordered) indexing to match the latents' class order; pass
``--replicate_label_bug`` for bit-faithful reference behavior."""

import argparse

import numpy as np
import jax

from ..data import meta
from ..data.io import load_array, save_array
from ..diffusion import dana
from ..diffusion.dana import dana_add_noise
from ..utils import get_logger
from ..utils.cache import enable_persistent_cache

log = get_logger(__name__)


def main(argv=None):
    # on-disk XLA executable cache: warm restarts skip minutes of
    # compilation (utils/cache.py for rationale + measurements)
    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--latents", default="./outputs/seq2seq/latent_out_block7_40_classes.npy")
    p.add_argument("--flow_scores", default="./data/meta_info/All_video_optical_flow_score.npy")
    p.add_argument("--block", type=int, default=6)
    p.add_argument("--out", default="./outputs/dana/40_classes_latent_add_noise.pt")
    p.add_argument("--seed", type=int, default=3407)
    p.add_argument("--time_steps", type=int, default=500)
    p.add_argument("--replicate_label_bug", action="store_true")
    p.add_argument("--threshold", type=float, default=1.799,
                   help="fast-motion score cut (reference add_noise.py:107); "
                        "re-anchor when using cli.compute_optical_flow scores, "
                        "whose absolute scale differs from the shipped table")
    args = p.parse_args(argv)

    latents = load_array(args.latents).astype(np.float32)  # (200, 6, 4, 36, 64)
    flow = load_array(args.flow_scores)[args.block]  # (200,) presentation order

    labels = np.asarray(flow >= args.threshold, np.int32)
    if not args.replicate_label_bug:
        # reorder flow labels into class order to match the latents
        idx = meta.block_reorder_indices(args.block)
        labels = labels.reshape(meta.N_CONCEPTS, meta.N_REPS)[idx].reshape(-1)
    betas = np.where(labels == 1, dana.BETA_FAST,
                     dana.BETA_SLOW).astype(np.float32)

    out = np.asarray(dana_add_noise(jax.random.key(args.seed), latents, betas,
                                    time_steps=args.time_steps))
    save_array(args.out, out)
    log.info("DANA latents %s -> %s", out.shape, args.out)


if __name__ == "__main__":
    main()
