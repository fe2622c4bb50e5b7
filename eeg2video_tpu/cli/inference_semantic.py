"""CLI: semantic embeddings from DE features (test block).

Reference contract: the predictor output feeds inference_eeg2video as the
(200, 77*768) semantic-embedding array (reference inference_eeg2video.py:43)."""

import argparse
import os

import numpy as np

from ..data import meta
from ..data.io import load_array, save_array
from ..train import checkpoint as ckpt
from ..train.semantic import predict_semantic
from ..utils import StandardScaler, get_logger
from ..utils.cache import enable_persistent_cache

log = get_logger(__name__)


def main(argv=None):
    # on-disk XLA executable cache: warm restarts skip minutes of
    # compilation (utils/cache.py for rationale + measurements)
    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--features", default="./data/Preprocessing/DE_1per2s/sub1.npy")
    p.add_argument("--ckpt", default="./outputs/semantic/ckpt")
    p.add_argument("--torch_ckpt", default=None,
                   help="reference eeg2text_40_classes.pt instead of --ckpt")
    p.add_argument("--scaler", default="./outputs/semantic/scaler.npz")
    p.add_argument("--block", type=int, default=6)
    p.add_argument("--hidden", type=int, default=10000)
    p.add_argument("--int8", action="store_true",
                   help="weight-only-int8 serving (ops/int8_dense): 4x less "
                        "HBM weight traffic, output cosine > 0.999 vs f32")
    p.add_argument("--out", default="./outputs/semantic/semantic_embeddings.npy")
    args = p.parse_args(argv)

    feats = load_array(args.features)  # (7, 40, 5, 62, 5)
    block = meta.reorder_by_gt(feats[args.block], args.block)
    eeg = block.reshape(-1, meta.N_CHANNELS * meta.N_BANDS)
    eeg = StandardScaler.load(args.scaler).transform(eeg)

    if args.torch_ckpt:
        from ..models.semantic import semantic_params_from_torch

        variables = semantic_params_from_torch(ckpt.load_torch_state_dict(args.torch_ckpt))
    else:
        import jax, jax.numpy as jnp
        from ..models.semantic import SemanticPredictor

        model = SemanticPredictor(hidden=args.hidden)
        template = jax.eval_shape(lambda: {"params": model.init(
            jax.random.key(0), jnp.zeros((1, 310)))["params"]})
        variables, _ = ckpt.restore_checkpoint(args.ckpt, template=template)
        if variables is None:
            raise SystemExit(f"no checkpoint in {args.ckpt}")

    if args.int8:
        from ..train.semantic import predict_semantic_int8

        emb = predict_semantic_int8(variables, eeg)
    else:
        emb = predict_semantic(variables, eeg, hidden=args.hidden)
    save_array(args.out, emb)
    log.info("semantic embeddings %s -> %s", emb.shape, args.out)


if __name__ == "__main__":
    main()
