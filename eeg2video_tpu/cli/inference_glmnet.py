"""CLI: GLMNet inference -> per-window EEG embeddings (B, 7, 512).

README GLMNet inference contract (README.md:93-103): same train-split
normalization parameters reloaded; emits the [batch, 7 windows, 512]
embeddings consumed by the Seq2Seq stage."""

import argparse
import os

import numpy as np

from ..data.io import load_array, save_array
from ..train import checkpoint as ckpt
from ..utils import get_logger
from ..utils.cache import enable_persistent_cache

log = get_logger(__name__)


def main(argv=None):
    # on-disk XLA executable cache: warm restarts skip minutes of
    # compilation (utils/cache.py for rationale + measurements)
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from ..models import make_encoder

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--raw_dir", default="./data/Preprocessing/Segmented_500ms_sw")
    p.add_argument("--de_dir", default="./data/Preprocessing/DE_1per500ms")
    p.add_argument("--sub", type=int, default=1)
    p.add_argument("--ckpt", default="./outputs/glmnet/ckpt")
    p.add_argument("--norm_stats", default="./outputs/glmnet/norm_stats.npz")
    p.add_argument("--emb_dim", type=int, default=256)
    p.add_argument("--out", default="./outputs/glmnet/embeddings.npy")
    args = p.parse_args(argv)

    raw_sw = load_array(os.path.join(args.raw_dir, f"sub{args.sub}.npy"))
    de_sw = load_array(os.path.join(args.de_dir, f"sub{args.sub}.npy"))
    z = np.load(args.norm_stats)
    raw = ((raw_sw - z["mean"].reshape(1, 1, 1, 1, -1, 1))
           / z["std"].reshape(1, 1, 1, 1, -1, 1)).astype(np.float32)

    variables, _ = ckpt.restore_checkpoint(args.ckpt)
    if variables is None:
        raise SystemExit(f"no checkpoint in {args.ckpt}")

    model = make_encoder("glmnet", out_dim=40, emb_dim=args.emb_dim)

    @jax.jit
    def embed(xr, xf):
        return model.apply(variables, xr, xf, train=False, return_embedding=True)

    # (7, 40, 5, 7w, 62, 100) -> per trial (7 windows) embeddings
    b, c, r, w = raw.shape[:4]
    xr = raw.reshape(-1, 1, *raw.shape[4:])
    xf = de_sw.reshape(-1, *de_sw.shape[4:]).astype(np.float32)
    outs = []
    bs = 2048
    for s in range(0, len(xr), bs):
        outs.append(np.asarray(embed(jnp.asarray(xr[s:s + bs]), jnp.asarray(xf[s:s + bs]))))
    emb = np.concatenate(outs).reshape(b, c, r, w, -1)  # (7, 40, 5, 7, 512)
    save_array(args.out, emb)
    log.info("embeddings %s -> %s", emb.shape, args.out)


if __name__ == "__main__":
    main()
