"""CLI: train the semantic predictor (DE features -> CLIP text space).

Contract of reference EEG2Video_New/Semantic/eeg_text.py __main__ (L108-175):
DE_1per2s features, per-block Text_embeddings/block{i}.pt targets (note the
reference's missing-f-string bug at L128 loads the literal 'block{i}.pt' —
NOT replicated), MSE, Adam 5e-4 cosine, 200 epochs, batch 32."""

import argparse
import glob
import os

import numpy as np

from ..data.io import load_array
from ..train import checkpoint as ckpt
from ..train.semantic import SemanticTrainConfig, prepare_semantic_data, train_semantic
from ..utils import get_logger
from ..utils.cache import enable_persistent_cache

log = get_logger(__name__)


def main(argv=None):
    # on-disk XLA executable cache: warm restarts skip minutes of
    # compilation (utils/cache.py for rationale + measurements)
    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--features", default="./data/Preprocessing/DE_1per2s/sub1.npy")
    p.add_argument("--text_dir", default="./data/Text_embeddings",
                   help="dir with block{i}.pt CLIP text embeddings (i=0..5)")
    p.add_argument("--legacy", action="store_true",
                   help="legacy data plumbing: DE_1per1s window-mean features "
                        "+ a single text_embeddings.npy (reference "
                        "train_semantic_predictor.py:80-115)")
    p.add_argument("--text_embeddings", default="./data/Text_embeddings/text_embeddings.npy",
                   help="(--legacy) combined text embedding file")
    p.add_argument("--save_path", default="./outputs/semantic")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--hidden", type=int, default=10000)
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel shards")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stages: the 10000-wide hidden "
                        "stack pipelines one stage per device (GPipe, "
                        "parallel.pipeline) with the 591M-param out head "
                        "column-sharded over the same axis; must divide the "
                        "hidden-layer count (3)")
    p.add_argument("--n_micro", type=int, default=8,
                   help="(--pp) microbatches per step; bubble fraction is "
                        "(pp-1)/(n_micro+pp-1)")
    p.add_argument("--use_8bit_adam", action="store_true",
                   help="int8 blockwise Adam moments: 4x less optimizer "
                        "state/traffic for the 894M-param MLP (train/optim.py)")
    p.add_argument("--seed", type=int, default=114514)
    args = p.parse_args(argv)

    feats = load_array(args.features)
    if args.legacy:
        from ..train.semantic import prepare_semantic_data_legacy

        eeg, text, scaler = prepare_semantic_data_legacy(
            feats, load_array(args.text_embeddings))
    else:
        texts = [load_array(os.path.join(args.text_dir, f"block{i}.pt")) for i in range(6)]
        eeg, text, scaler = prepare_semantic_data(feats, texts)

    cfg = SemanticTrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                              lr=args.lr, hidden=args.hidden,
                              use_8bit_adam=args.use_8bit_adam)
    variables, losses = train_semantic(eeg, text, cfg, seed=args.seed,
                                       tp=args.tp, pp=args.pp,
                                       n_micro=args.n_micro)
    ckpt.save_checkpoint(os.path.join(args.save_path, "ckpt"), args.epochs, variables)
    scaler.save(os.path.join(args.save_path, "scaler.npz"))
    log.info("semantic predictor saved to %s (final loss %.5f)", args.save_path, losses[-1])


if __name__ == "__main__":
    main()
