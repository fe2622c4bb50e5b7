"""CLI: VAE-encode per-clip GIFs into video latents.

Contracts of reference Seq2Seq/generate_1200_latent.py (blocks 0-5 ->
1200_latent.npy, (1200, 4, 6, 36, 64)) and generate_40classes_latents.py
(block 6 -> 40classes_latents.pt, (200, 4, 6, 36, 64)).  Uses
``latent_dist.mean`` with no 0.18215 scaling, exactly like the reference
(generate_1200_latent.py:38).
"""

import argparse
import os

import numpy as np

from ..data import meta
from ..data.io import save_array
from ..data.video import load_gif
from ..models.vae import AutoencoderKL, VAEConfig
from ..train import checkpoint as ckpt
from ..utils import get_logger
from ..utils.cache import enable_persistent_cache

log = get_logger(__name__)


def _load_vae(vae_ckpt, torch_ckpt=None, dtype="float32"):
    import jax.numpy as jnp

    # f32 by default: the VAE-latent artifacts are a <=1e-4 parity target
    # (BASELINE.md) and the reference encodes in f32
    vae = AutoencoderKL(VAEConfig(), dtype=jnp.dtype(dtype))
    if torch_ckpt:
        from ..convert.unet_params import vae_params_from_torch

        params = vae_params_from_torch(ckpt.load_torch_state_dict(torch_ckpt))["params"]
    else:
        params, _ = ckpt.restore_checkpoint(vae_ckpt)
        if params is None:
            raise SystemExit(f"no VAE checkpoint at {vae_ckpt}")
        if "params" in params:
            params = params["params"]
    return vae, params


def main(argv=None):
    # on-disk XLA executable cache: warm restarts skip minutes of
    # compilation (utils/cache.py for rationale + measurements)
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--gif_root", default="./data/Video_gifs")
    p.add_argument("--vae", default="./checkpoints/vae/ckpt")
    p.add_argument("--torch_vae", default=None,
                   help="convert a torch AutoencoderKL .bin/.pt instead")
    p.add_argument("--blocks", type=int, nargs="*", default=list(range(6)))
    p.add_argument("--out", default="./data/1200_latent.npy")
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"],
                   help="f32 preserves the <=1e-4 latent-parity target")
    args = p.parse_args(argv)

    vae, params = _load_vae(args.vae, args.torch_vae, dtype=args.dtype)

    @jax.jit
    def encode(frames):  # (N, H, W, 3) in [-1, 1]
        # per-frame inside one dispatch — see train.videodiffusion
        # encode_posteriors (batched large-spatial encode pays ~2.2x in
        # XLA halo relayouts)
        def one(fr):
            mean, _ = vae.apply({"params": params},
                                fr[None].astype(jnp.dtype(args.dtype)),
                                method=AutoencoderKL.encode)
            return mean[0].astype(jnp.float32)

        return jax.lax.map(one, frames)

    latents = []
    for blk in args.blocks:
        d = os.path.join(args.gif_root, f"Block{blk}")
        n_clips = meta.N_CONCEPTS * meta.N_REPS
        for s in range(0, n_clips, args.batch):
            clips = [load_gif(os.path.join(d, f"{i}.gif")) for i in range(s, min(s + args.batch, n_clips))]
            frames = np.concatenate(clips).astype(np.float32) / 127.5 - 1.0
            z = np.asarray(encode(frames))  # (n*6, 36, 64, 4)
            z = z.reshape(len(clips), meta.GIF_FRAMES, *z.shape[1:])
            # reference layout (B, C, F, H, W) (generate_1200_latent.py:43)
            latents.append(np.transpose(z, (0, 4, 1, 2, 3)))
        log.info("block %d encoded", blk)
    out = np.concatenate(latents)
    save_array(args.out, out)
    log.info("latents %s -> %s", out.shape, args.out)


if __name__ == "__main__":
    main()
