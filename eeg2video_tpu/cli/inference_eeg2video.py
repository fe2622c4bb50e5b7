"""CLI: end-to-end EEG -> video generation (the product "serve" path).

Contract of reference EEG2Video_New/Generation/inference_eeg2video.py:
semantic-embedding file (200, 77*768); negative = its mean (L45); latent
source ablations --woSeq2Seq (fresh noise) / --woDANA (Seq2Seq latents) /
default full model (DANA latents); 100 DDIM steps, guidance 12.5, 6 frames @
288x512 (L74-86); GIFs via save_videos_grid.

TPU redesign: clips are processed in jitted batches (default 8 per call)
instead of the reference's one-clip-per-pipe-call Python loop."""

import argparse
import os

import numpy as np
import jax

from ..data.io import load_array
from ..data.video import AsyncVideoWriter, dispatch_ahead
from ..diffusion.pipeline import EEG2VideoPipeline, latents_from_torch_layout
from ..models.unet3d import UNet3DConfig
from ..models.vae import VAEConfig
from ..train import checkpoint as ckpt
from ..utils import get_logger
from ..utils.cache import enable_persistent_cache

log = get_logger(__name__)


def _is_diffusers_dir(path, sub):
    return (os.path.exists(os.path.join(path, sub, "config.json"))
            or os.path.exists(os.path.join(path, "config.json")))


def load_pipeline(unet_dir, vae_ckpt, dtype="bfloat16"):
    """Build the pipeline from checkpoints.  ``unet_dir`` may be a diffusers
    ``save_pretrained`` directory (reference fine-tune output,
    train_finetune_videodiffusion.py:376-382 — loaded by subfolder exactly
    like reference inference L50) or an orbax dir (our training output);
    ``vae_ckpt`` likewise accepts a diffusers dir or an orbax checkpoint."""
    import jax.numpy as jnp

    ucfg, vcfg = UNet3DConfig(), VAEConfig()
    if _is_diffusers_dir(unet_dir, "unet"):
        from ..convert.export_diffusion import load_diffusers_unet

        ucfg, unet_vars = load_diffusers_unet(unet_dir)
        unet_params = unet_vars["params"]
    elif os.path.isdir(os.path.join(unet_dir, "ckpt")) or os.path.isdir(unet_dir):
        unet_params, _ = ckpt.restore_checkpoint(
            unet_dir if os.path.basename(unet_dir) == "ckpt" else os.path.join(unet_dir, "ckpt"))
        if unet_params is None:
            raise SystemExit(f"no UNet checkpoint in {unet_dir}")
        if "params" in unet_params:
            unet_params = unet_params["params"]
    else:
        raise SystemExit(f"unet checkpoint not found: {unet_dir}")
    if _is_diffusers_dir(vae_ckpt, "vae"):
        from ..convert.export_diffusion import load_diffusers_vae

        vcfg, vae_vars = load_diffusers_vae(vae_ckpt)
        vae_params = vae_vars["params"]
    else:
        vae_params = ckpt.restore_checkpoint(vae_ckpt)[0]
        if vae_params is None:
            raise SystemExit(f"no VAE checkpoint in {vae_ckpt}")
        if "params" in vae_params:
            vae_params = vae_params["params"]
    return EEG2VideoPipeline.create(unet_params, vae_params, ucfg, vcfg,
                                    dtype=jnp.dtype(dtype))


def legacy_embeddings(features_path, semantic_ckpt=None, torch_semantic=None,
                      hidden=10000):
    """Legacy in-pipeline EEG encoding, chained in one run.

    Reference EEG2Video/inference_eeg2video.py:38-65: the legacy driver
    GT-reorders every block, averages the per-clip windows, re-fits a
    StandardScaler on the train blocks (0-5) AT INFERENCE TIME (L61) and
    transforms the test block with it (L64); the CLIP MLP then runs inside
    the pipeline's ``_encode_eeg`` (pipeline_tuneeeg2video.py legacy
    L149-150).  Feature plumbing matches our ``train_semantic --legacy``
    (DE_1per1s window-mean -> 310-dim); the legacy tree's raw 62*200 input
    is dimensionally inconsistent with its own CLIP(310) MLP — see PARITY.md.
    Returns (200, 77*768) embeddings for the shared pipeline."""
    import jax.numpy as jnp
    from ..data import meta
    from ..train.semantic import predict_semantic

    feats = load_array(features_path)  # (7, 40, 5, W, 62, 5)
    flat = feats.reshape(feats.shape[0], 40 * 5, -1,
                         meta.N_CHANNELS * meta.N_BANDS)
    per_block = np.stack([meta.reorder_by_gt(flat[b].mean(axis=1), b)
                          for b in range(meta.N_BLOCKS)])
    train = per_block[:6].reshape(-1, per_block.shape[-1])
    test = per_block[6]
    from ..utils import StandardScaler

    scaler = StandardScaler().fit(train)  # reference L61: train-fit at inference
    eeg = scaler.transform(test)

    if torch_semantic:
        from ..models.semantic import semantic_params_from_torch

        variables = semantic_params_from_torch(ckpt.load_torch_state_dict(torch_semantic))
    else:
        from ..models.semantic import SemanticPredictor

        model = SemanticPredictor(hidden=hidden)
        template = jax.eval_shape(lambda: {"params": model.init(
            jax.random.key(0), jnp.zeros((1, eeg.shape[-1])))["params"]})
        variables, _ = ckpt.restore_checkpoint(semantic_ckpt, template=template)
        if variables is None:
            raise SystemExit(f"no semantic checkpoint in {semantic_ckpt}")
    return predict_semantic(variables, eeg, hidden=hidden)


def main(argv=None):
    # on-disk XLA executable cache: warm restarts skip minutes of
    # compilation (utils/cache.py for rationale + measurements)
    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--embeddings", default="./outputs/semantic/semantic_embeddings.npy")
    p.add_argument("--legacy", action="store_true",
                   help="legacy variant: run scaler -> CLIP MLP in-process on "
                        "raw DE features instead of loading precomputed "
                        "embeddings (reference EEG2Video/inference_eeg2video.py:38-65)")
    p.add_argument("--raw_features", default="./data/Preprocessing/DE_1per1s/sub1.npy",
                   help="(--legacy) per-subject DE_1per1s features")
    p.add_argument("--semantic_ckpt", default="./outputs/semantic/ckpt",
                   help="(--legacy) orbax semantic-predictor checkpoint")
    p.add_argument("--torch_semantic", default=None,
                   help="(--legacy) reference eeg2text .pt checkpoint instead")
    p.add_argument("--hidden", type=int, default=10000,
                   help="(--legacy) semantic MLP hidden width")
    p.add_argument("--limit", type=int, default=0,
                   help="generate only the first N clips (0 = all)")
    p.add_argument("--unet", default="./outputs/tuneavideo")
    p.add_argument("--vae", default="./checkpoints/vae/ckpt")
    p.add_argument("--seq2seq_latents", default="./outputs/seq2seq/latent_out_block7_40_classes.npy")
    p.add_argument("--dana_latents", default="./outputs/dana/40_classes_latent_add_noise.pt")
    p.add_argument("--woSeq2Seq", action="store_true", help="fresh-noise latents")
    p.add_argument("--woDANA", action="store_true", help="raw Seq2Seq latents")
    p.add_argument("--negative", default=None,
                   help="negative.npy CFG embedding; note the reference "
                        "pipeline's CFG negative is the committed "
                        "negative.npy artifact (pipeline_tuneeeg2video.py:167)"
                        " — default falls back to the embeddings' mean "
                        "(driver behavior, inference_eeg2video.py:45)")
    p.add_argument("--out_dir", default=None)
    p.add_argument("--num_inference_steps", type=int, default=100)
    p.add_argument("--sampler", default="ddim", choices=("ddim", "dpm++"),
                   help="ddim = reference semantics (100 steps, "
                        "inference_eeg2video.py:74-86); dpm++ = "
                        "DPM-Solver++(2M) fast path (try "
                        "--num_inference_steps 20 for ~5x lower latency)")
    p.add_argument("--guidance_scale", type=float, default=12.5)
    p.add_argument("--height", type=int, default=288)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--video_length", type=int, default=6)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="compute dtype (reference inference is fp16, "
                        "inference_eeg2video.py:50-51; bf16 is the TPU "
                        "equivalent, float32 the parity mode)")
    p.add_argument("--seed", type=int, default=114514)
    p.add_argument("--gif_encoder", default="imageio",
                   choices=("imageio", "fast", "native"),
                   help="imageio = reference mimsave encode (parity default); "
                        "fast = shared-palette PIL encode, ~28x faster per "
                        "clip; native = C++ encoder (csrc/gif_encoder.cpp)")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel generation over a device mesh "
                        "(0 = single device; batch must divide by dp)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel UNet sharding (with --dp)")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel (ring attention) shards: spatial "
                        "attention FLOPs/memory split over an sp mesh axis "
                        "(ops.ring; composes with --tp: the ring also "
                        "splits heads over the tp axis)")
    args = p.parse_args(argv)

    if args.legacy:
        emb = legacy_embeddings(args.raw_features, args.semantic_ckpt,
                                args.torch_semantic, args.hidden)
        emb = emb.reshape(-1, 77 * 768).astype(np.float32)
    else:
        emb = load_array(args.embeddings).reshape(-1, 77 * 768).astype(np.float32)
    if args.negative:
        negative = load_array(args.negative).reshape(-1).astype(np.float32)
    else:
        # reference driver L45: mean over ALL clips — computed before --limit
        # so a limited run reproduces the corresponding clips of a full run
        # (and --limit 1 doesn't collapse CFG to a no-op)
        negative = emb.mean(axis=0)
    if args.limit:
        emb = emb[:args.limit]

    if args.woSeq2Seq:
        latents, tag = None, "40_Classes_woSeq2Seq"
    elif args.woDANA:
        latents = latents_from_torch_layout(load_array(args.seq2seq_latents),
                                            frames=args.video_length)
        tag = "40_Classes_woDANA"
    else:
        latents = latents_from_torch_layout(load_array(args.dana_latents),
                                            frames=args.video_length)
        tag = "40_Classes_Fullmodel"
    out_dir = args.out_dir or f"./outputs/{tag}"

    pipe = load_pipeline(args.unet, args.vae, dtype=args.dtype)
    # created only after the pipeline loads: a failed load leaves no
    # (empty) out_dir for run_pipeline's make-style resume to mistake for
    # a completed stage
    os.makedirs(out_dir, exist_ok=True)
    if args.dp or args.tp > 1 or args.sp > 1:
        from ..parallel import make_mesh
        from ..train import unet_tp_rules

        dp = args.dp or max(1, len(jax.devices()) // (args.tp * args.sp))
        pipe = pipe.shard(make_mesh(dp=dp, tp=args.tp, sp=args.sp),
                          unet_tp_rules if args.tp > 1 else None)
        if args.batch % dp:
            p.error(f"--batch {args.batch} must be divisible by --dp {dp}")
    key = jax.random.key(args.seed)
    n = len(emb)
    dp = pipe.mesh.shape["dp"] if pipe.mesh is not None else 1
    # GIF encodes run on writer threads, and each batch's device dispatch is
    # issued BEFORE the previous batch's host transfer/encode — the device
    # never idles on the host (AsyncVideoWriter; serialized imageio encode
    # added ~0.8 s/clip to the loop)
    writer = AsyncVideoWriter(encoder=args.gif_encoder)

    def run(s):
        e = emb[s:s + args.batch]
        lat = None if latents is None else latents[s:s + args.batch]
        m = len(e)
        if m % dp:  # pad the tail chunk to a dp multiple, drop extras below
            reps = [1] * (m - 1) + [dp - m % dp + 1]
            e = np.repeat(e, reps, axis=0)
            lat = None if lat is None else np.repeat(lat, reps, axis=0)
        return pipe(e, negative, latents=lat, key=jax.random.fold_in(key, s),
                    video_length=args.video_length, height=args.height,
                    width=args.width, num_inference_steps=args.num_inference_steps,
                    guidance_scale=args.guidance_scale, sampler=args.sampler), m

    def flush(out, s):
        videos, m = out
        videos = np.asarray(videos)[:m]
        for j in range(m):
            writer.submit(videos[j:j + 1], os.path.join(out_dir, f"{s + j}.gif"))
        log.info("clips %d..%d -> %s", s, s + m - 1, out_dir)

    try:
        dispatch_ahead(range(0, n, args.batch), run, flush)
    finally:
        writer.close()


if __name__ == "__main__":
    main()
