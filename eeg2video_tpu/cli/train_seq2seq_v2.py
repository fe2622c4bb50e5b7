"""CLI: train the Seq2Seq EEG->latent transformer.

Contracts: reference Seq2Seq/my_autoregressive_transformer.py __main__
(L278-391) plus the README branch flags ``--normalize``/``--stats_path``
saving mean_z/std_z to stats.npz (README.md:129-138)."""

import argparse
import os

import numpy as np

from ..data.io import load_array, save_array
from ..train import checkpoint as ckpt
from ..train.seq2seq import (
    Seq2SeqTrainConfig,
    prepare_seq2seq_data,
    rollout_latents,
    train_seq2seq,
)
from ..utils import get_logger
from ..utils.cache import enable_persistent_cache

log = get_logger(__name__)


def main(argv=None):
    # on-disk XLA executable cache: warm restarts skip minutes of
    # compilation (utils/cache.py for rationale + measurements)
    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--eeg", default="./data/Preprocessing/Segmented_Rawf_200Hz_2s/sub1.npy")
    p.add_argument("--train_latents", default="./data/1200_latent.npy")
    p.add_argument("--test_latents", default="./data/40classes_latents.pt")
    p.add_argument("--save_path", default="./outputs/seq2seq")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--normalize", action="store_true",
                   help="z-score latents; stats saved to --stats_path")
    p.add_argument("--stats_path", default=None, help="default: --save_path/stats.npz")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    eeg = load_array(args.eeg)
    train_lat = load_array(args.train_latents)
    test_lat = load_array(args.test_latents)
    tr_eeg, tr_lat, te_eeg, te_lat, scaler = prepare_seq2seq_data(
        eeg, train_lat, test_lat)
    # persist the train-split EEG scaler: inference/serving can then z-score
    # raw EEG without refitting from the training arrays (the reference
    # refits a StandardScaler from the full training set at inference time,
    # my_autoregressive_transformer.py:321-328)
    os.makedirs(args.save_path, exist_ok=True)
    scaler.save(os.path.join(args.save_path, "eeg_scaler.npz"))

    if args.normalize:
        mean_z = tr_lat.mean(axis=0, keepdims=True)
        std_z = tr_lat.std(axis=0, keepdims=True) + 1e-8
        tr_lat = (tr_lat - mean_z) / std_z
        stats = args.stats_path or os.path.join(args.save_path, "stats.npz")
        os.makedirs(os.path.dirname(stats), exist_ok=True)
        np.savez(stats, mean_z=mean_z, std_z=std_z)
        log.info("latent stats -> %s", stats)

    cfg = Seq2SeqTrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                             lr=args.lr, normalize=args.normalize)
    variables, losses = train_seq2seq(tr_eeg, tr_lat, cfg, seed=args.seed)
    ckpt.save_checkpoint(os.path.join(args.save_path, "ckpt"), args.epochs, variables)

    # block-7 rollout artifact (reference L377-387)
    out = rollout_latents(variables, te_eeg)
    if args.normalize:
        out = out * std_z + mean_z
    save_array(os.path.join(args.save_path, "latent_out_block7_40_classes.npy"), out)
    log.info("saved rollout %s and checkpoint to %s", out.shape, args.save_path)


if __name__ == "__main__":
    main()
