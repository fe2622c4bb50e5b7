"""CLI: Seq2Seq inference -> predicted latents
(reference README Seq2Seq inference contract incl. --stats_path restore)."""

import argparse
import os

import numpy as np

from ..data.io import load_array, save_array
from ..models.seq2seq import Seq2SeqTransformer
from ..train import checkpoint as ckpt
from ..train.seq2seq import prepare_seq2seq_data, rollout_latents
from ..utils import get_logger
from ..utils.cache import enable_persistent_cache

log = get_logger(__name__)


def main(argv=None):
    # on-disk XLA executable cache: warm restarts skip minutes of
    # compilation (utils/cache.py for rationale + measurements)
    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--eeg", default="./data/Preprocessing/Segmented_Rawf_200Hz_2s/sub1.npy")
    p.add_argument("--train_latents", default="./data/1200_latent.npy",
                   help="needed to refit the EEG scaler exactly as in training")
    p.add_argument("--test_latents", default="./data/40classes_latents.pt")
    p.add_argument("--ckpt", default="./outputs/seq2seq/ckpt")
    p.add_argument("--torch_ckpt", default=None,
                   help="load a reference seq2seqmodel.pt instead of --ckpt")
    p.add_argument("--stats_path", default=None,
                   help="stats.npz to restore latent scale (--normalize training)")
    p.add_argument("--eeg_scaler", default=None,
                   help="eeg_scaler.npz saved by train_seq2seq_v2: z-score "
                        "the test EEG with the stored train-split stats "
                        "instead of refitting from --train_latents/--eeg "
                        "(no training arrays needed at inference)")
    p.add_argument("--out", default="./outputs/seq2seq/latent_out_block7_40_classes.npy")
    args = p.parse_args(argv)

    eeg = load_array(args.eeg)
    if args.eeg_scaler:
        from ..data import meta
        from ..train.seq2seq import windows_from_segments
        from ..utils import StandardScaler

        scaler = StandardScaler.load(args.eeg_scaler)
        block = meta.reorder_by_gt(eeg[6], 6).reshape(-1, *eeg.shape[-2:])
        te_eeg = windows_from_segments(block)
        te_eeg = scaler.transform(
            te_eeg.reshape(len(te_eeg), -1)).reshape(te_eeg.shape)
    else:
        tr_lat = load_array(args.train_latents)
        te_lat = load_array(args.test_latents)
        _, _, te_eeg, _, _ = prepare_seq2seq_data(eeg, tr_lat, te_lat)

    if args.torch_ckpt:
        from ..convert.seq2seq_params import seq2seq_params_from_torch

        variables = seq2seq_params_from_torch(ckpt.load_torch_state_dict(args.torch_ckpt))
    else:
        import jax, jax.numpy as jnp

        model = Seq2SeqTransformer()
        template = jax.eval_shape(
            lambda: model.init(jax.random.key(0), jnp.zeros((1, 7, 62, 100))))
        variables, step = ckpt.restore_checkpoint(args.ckpt, template=template)
        if variables is None:
            raise SystemExit(f"no checkpoint found in {args.ckpt}")
        log.info("restored step %s", step)

    out = rollout_latents(variables, te_eeg)
    if args.stats_path:
        z = np.load(args.stats_path)
        out = out * z["std_z"] + z["mean_z"]
    save_array(args.out, out)
    log.info("predicted latents %s -> %s", out.shape, args.out)


if __name__ == "__main__":
    main()
