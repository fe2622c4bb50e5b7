"""CLI: fine-tune the video-diffusion UNet on block-0 clips + BLIP captions.

Contract of reference Generation/train_finetune_videodiffusion.py:66-405 with
its configs/all_40_video.yaml schema (same keys honored via --config):
trainable attn1.to_q/attn2.to_q/attn_temp, AdamW 3e-5, grad clip 1.0, 200
epochs, batch 10, bf16 (the TPU-native counterpart of fp16 autocast),
gradient checkpointing (remat), periodic validation sampling + checkpointing.

TPU redesign: the Accelerate/DDP wrapper (reference L99-102, 240-242,
`accelerate launch` multi-process) becomes a (dp, tp) mesh — ``--dp/--tp``
flags shard the batch over dp and the attention/FFN projections over tp
(Megatron layout) — and the whole epoch runs as ONE on-device ``lax.scan``
with the clip set resident on device (no per-batch host dispatches, no
per-step host syncs; per-step PRNG keys derive from state.step on device).
"""

import argparse
import os

import numpy as np
import yaml

from ..data import meta
from ..data.io import load_array
from ..data.video import VideoClipDataset, save_videos_grid
from ..models.unet3d import UNet3DConditionModel, UNet3DConfig
from ..models.vae import VAEConfig
from ..train import checkpoint as ckpt
from ..train.videodiffusion import (
    VideoDiffusionTrainConfig,
    encode_posteriors,
    init_video_train_state,
    make_video_train_epoch,
    unet_tp_rules,
)
from ..utils import get_logger
from ..utils.cache import enable_persistent_cache

log = get_logger(__name__)


def apply_reference_config(args, cfg_yaml):
    """Map a reference-schema YAML (configs/all_40_video.yaml; the
    reference's own file also loads) onto the CLI args; returns the remat
    flag.

    The reference IGNORES several of these keys: ``max_train_steps`` is dead
    (train_finetune_videodiffusion.py:229 hardcodes ``num_train_epochs=200``,
    the steps->epochs derivation at L259 is commented out) and both
    validation sampling and checkpointing gate on a hardcoded
    ``epoch % 100 == 0`` (L343) regardless of ``checkpointing_steps`` /
    ``validation_steps``.  To reproduce reference runs for any YAML — not
    just the shipped one — a reference-schema config maps those keys to the
    reference's *effective* values (200 epochs, 100-epoch cadence), not
    their literal ones."""
    # pyyaml (YAML 1.1) reads the reference's "3e-5" as a string (no dot);
    # OmegaConf coerced it — coerce numerics here for file compatibility
    coerce = {"learning_rate": float, "train_batch_size": int, "seed": int,
              "output_dir": str}
    for k, fn in coerce.items():
        if k in cfg_yaml:
            setattr(args, k, fn(cfg_yaml[k]))
    if "max_train_steps" in cfg_yaml:
        log.info("max_train_steps=%s ignored: the reference hardcodes 200 "
                 "epochs (train L229; L259 dead)", cfg_yaml["max_train_steps"])
        args.epochs = 200
    for yaml_key, arg_key in (("checkpointing_steps", "checkpointing_epochs"),
                              ("validation_steps", "validation_epochs")):
        if yaml_key in cfg_yaml:
            log.info("%s=%s ignored: the reference gates on epoch%%100 "
                     "(train L343)", yaml_key, cfg_yaml[yaml_key])
            setattr(args, arg_key, 100)
    vd = cfg_yaml.get("validation_data") or {}
    if "num_inference_steps" in vd:
        args.validation_steps = int(vd["num_inference_steps"])
    td = cfg_yaml.get("train_data") or {}
    if "video_dir" in td:
        args.video_dir = td["video_dir"]
    tm = cfg_yaml.get("trainable_modules")
    if tm is not None and sorted(tm) != sorted(
            ["attn1.to_q", "attn2.to_q", "attn_temp"]):
        raise SystemExit(
            "trainable_modules must be the reference mask "
            "attn1.to_q/attn2.to_q/attn_temp (train L72-76)")
    if cfg_yaml.get("enable_xformers_memory_efficient_attention"):
        log.info("enable_xformers_memory_efficient_attention is implicit: "
                 "attention always runs the Pallas flash kernels")
    if "use_8bit_adam" in cfg_yaml:
        # reference: bitsandbytes AdamW8bit (train L163-173); ours:
        # int8 blockwise-quantized moments (train/optim.py)
        args.use_8bit_adam = bool(cfg_yaml["use_8bit_adam"])
    return bool(cfg_yaml.get("gradient_checkpointing", True))


def main(argv=None):
    # on-disk XLA executable cache: warm restarts skip minutes of
    # compilation (utils/cache.py for rationale + measurements)
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None, help="YAML config (reference schema)")
    p.add_argument("--video_dir", default="./data/Video_mp4/Block0")
    p.add_argument("--captions", default="./data/BLIP/1st_10min.txt")
    p.add_argument("--text_embeddings", default="./data/Text_embeddings/block0.pt",
                   help="precomputed CLIP caption embeddings (200, 77, 768)")
    p.add_argument("--unet_torch", default=None,
                   help="diffusers 2D UNet state dict to inflate (from_pretrained_2d)")
    p.add_argument("--unet_ckpt", default=None, help="resume from orbax checkpoint")
    p.add_argument("--vae", default="./checkpoints/vae/ckpt")
    p.add_argument("--output_dir", default="./outputs/tuneavideo")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--train_batch_size", type=int, default=10)
    p.add_argument("--learning_rate", type=float, default=3e-5)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--use_8bit_adam", action="store_true",
                   help="int8 blockwise Adam moments (reference "
                        "use_8bit_adam / bitsandbytes AdamW8bit)")
    p.add_argument("--checkpointing_epochs", type=int, default=100)
    p.add_argument("--validation_epochs", type=int, default=100,
                   help="sample clips with the current params every N epochs "
                        "(reference validates every 100 epochs, train L343)")
    p.add_argument("--validation_steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=33)
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel mesh size (0 = all devices / tp)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel mesh size (Megatron-sharded "
                        "attention/FFN projections)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3-style fully-sharded params/optimizer over "
                        "the dp axis (parallel.shard_params_fsdp): each "
                        "weight all-gathers at use, grads reduce-scatter; "
                        "per-chip param+opt memory drops ~dp-fold")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel mesh size: spatial attention "
                        "(fwd AND bwd) rides ring attention over an sp mesh "
                        "axis (ops.ring) — attention memory/FLOPs scale "
                        "with sp; composes with --tp (ring + Megatron "
                        "head-sharding on one mesh)")
    args = p.parse_args(argv)

    remat = True
    if args.config:
        with open(args.config) as f:
            cfg_yaml = yaml.safe_load(f)
        remat = apply_reference_config(args, cfg_yaml)

    ucfg, vcfg = UNet3DConfig(), VAEConfig()
    tcfg = VideoDiffusionTrainConfig(
        learning_rate=args.learning_rate,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        remat=remat,
        use_8bit_adam=args.use_8bit_adam,
    )

    # dataset: block-0 clips in presentation order + caption embeddings
    # (reference L185-214; the caption file has one line per clip)
    paths = [os.path.join(args.video_dir, f"{i + 1}.mp4")
             for i in range(meta.N_CONCEPTS * meta.N_REPS)]
    paths = [p_ for p_ in paths if os.path.exists(p_)]
    text_emb = load_array(args.text_embeddings).reshape(-1, 77, 768).astype(np.float32)
    ds = VideoClipDataset(paths, np.arange(len(paths)))
    log.info("dataset: %d clips", len(ds))

    # UNet params: inflate a 2-D checkpoint or resume
    unet = UNet3DConditionModel(ucfg)
    sample = jnp.zeros((1, 6, 36, 64, 4), jnp.float32)
    init_params = unet.init(jax.random.key(args.seed), sample,
                            jnp.asarray([0]), jnp.zeros((1, 77, 768)))["params"]
    if args.unet_torch:
        from ..convert.unet_params import unet3d_params_from_torch_2d

        params = unet3d_params_from_torch_2d(
            ckpt.load_torch_state_dict(args.unet_torch), init_params)["params"]
    elif args.unet_ckpt:
        params = init_params  # template; the full state restores below
    else:
        params = init_params
        log.warning("training from random init (no --unet_torch/--unet_ckpt)")

    vae_params, _ = ckpt.restore_checkpoint(args.vae)
    if vae_params is None:
        raise SystemExit(f"no VAE checkpoint at {args.vae}")
    if "params" in vae_params:
        vae_params = vae_params["params"]

    # mesh: dp x tp over the available devices (reference multi-GPU surface:
    # `accelerate launch`, train L99-102/240-242)
    n_dev = len(jax.devices())
    tp = max(args.tp, 1)
    sp = max(args.sp, 1)
    # --sp and --tp compose (round 5): the ring shard_map also splits the
    # head dimension over "tp" (EEG2VideoPipeline.shard / ops.ring)
    dp = args.dp if args.dp > 0 else max(n_dev // (tp * sp), 1)
    if args.train_batch_size % dp != 0:
        # dp shards the batch; an indivisible split would leave GSPMD
        # proposing partial batch shardings the Pallas-kernel partitioners
        # cannot express.  Clamp to the largest divisor (a subset mesh —
        # the extra devices idle, as they would under the reference's DDP
        # with fewer samples than processes).
        dp = max(d for d in range(1, dp + 1) if args.train_batch_size % d == 0)
        log.warning("train_batch_size %d not divisible by dp: clamped dp to %d",
                    args.train_batch_size, dp)
    mesh = None
    if dp * tp * sp > 1:
        from ..parallel import make_mesh, shard_params

        mesh = make_mesh(dp=dp, tp=tp, sp=sp,
                         devices=jax.devices()[: dp * tp * sp])
        tp_rules = unet_tp_rules if tp > 1 else None
        if args.fsdp:
            from ..parallel import shard_params_fsdp

            params = shard_params_fsdp(params, mesh, tp_rules)
            vae_params = shard_params_fsdp(vae_params, mesh, None)
        else:
            params = shard_params(params, mesh, tp_rules)
            vae_params = shard_params(vae_params, mesh, None)
        log.info("mesh: dp=%d tp=%d sp=%d fsdp=%s", dp, tp, sp, args.fsdp)

    state = init_video_train_state(params, tcfg)
    if args.unet_ckpt:
        # full resume: params + optimizer state + step (the reference's
        # resume_from_checkpoint is accepted and ignored, train L91);
        # params-only checkpoints restore with fresh optimizer state
        state, step0 = ckpt.restore_train_state(args.unet_ckpt, state)
        if mesh is not None:
            # orbax restores template-sharded leaves (params/moments) onto
            # the mesh, but scalar leaves (step, optimizer counts) come back
            # committed to a single device — mixed device sets fail the
            # jitted epoch.  Replicate anything not mesh-sharded.
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())

            def _fix(x):
                if isinstance(getattr(x, "sharding", None), NamedSharding):
                    return x
                return jax.device_put(x, repl)

            state = jax.tree.map(_fix, state)
        log.info("resumed from checkpoint step %s (state.step=%d)",
                 step0, int(state.step))
    epoch_fn = make_video_train_epoch(ucfg, vcfg, tcfg, mesh=mesh)

    from ..utils.metrics_logger import MetricsLogger

    metrics = MetricsLogger(args.output_dir, "tuneavideo")
    key = jax.random.key(args.seed)

    # decode every clip once (C++ thread-pool decoder), VAE-encode the set
    # ONCE into posteriors (mean || logvar; ~59 MB vs ~1 GB of pixels at the
    # reference's 200 x 6 x 288 x 512 clips — the encoder is deterministic,
    # per-step posterior sampling stays in the train step), keep it resident
    # on device, and run each epoch as one scan
    pixels_all, prompt_idx = ds.load_all()
    context_all = text_emb[prompt_idx]
    post_all = encode_posteriors(vae_params, pixels_all, vcfg,
                                 tcfg.compute_dtype)
    del pixels_all
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        post_all = jax.device_put(jnp.asarray(post_all), repl)
        context_all = jax.device_put(jnp.asarray(context_all), repl)
    else:
        post_all = jnp.asarray(post_all)
        context_all = jnp.asarray(context_all)

    steps_per_epoch = max(len(ds) // args.train_batch_size, 1)
    rng = np.random.default_rng(args.seed)
    # async checkpoint session + preemption-to-checkpoint (SIGTERM/SIGINT
    # between epoch dispatches saves a resumable state; the reference's only
    # recovery point is its every-100-epochs save_pretrained, train L343-382)
    session = ckpt.CheckpointSession(os.path.join(args.output_dir, "ckpt"))
    guard = ckpt.PreemptionGuard()
    with session, guard:
        _train_loop(args, state, vae_params, post_all, context_all, epoch_fn,
                    key, rng, steps_per_epoch, metrics, text_emb, ucfg, vcfg,
                    session, guard)


def _train_loop(args, state, vae_params, post_all, context_all, epoch_fn, key,
                rng, steps_per_epoch, metrics, text_emb, ucfg, vcfg, session,
                guard):
    import jax
    import jax.numpy as jnp

    for epoch in range(1, args.epochs + 1):
        order = rng.permutation(len(post_all))[: steps_per_epoch * args.train_batch_size]
        perm = order.reshape(steps_per_epoch, args.train_batch_size).astype(np.int32)
        state, ep_loss = epoch_fn(state, vae_params, post_all, context_all,
                                  jnp.asarray(perm), key)
        ep_loss = float(ep_loss)  # one host sync per epoch
        log.info("epoch %d train_loss %.5f", epoch, ep_loss)
        metrics.log(epoch * steps_per_epoch, train_loss=ep_loss, epoch=epoch)
        if guard.preempted:
            session.save(epoch, {"params": state.params,
                                 "opt_state": state.opt_state,
                                 "step": state.step})
            log.warning("preemption signal: resumable checkpoint saved @ "
                        "epoch %d, exiting (resume with --unet_ckpt %s)",
                        epoch, os.path.join(args.output_dir, "ckpt"))
            return
        if epoch % args.validation_epochs == 0:
            # sample a few clips with the current weights (reference L343-369)
            from ..diffusion.pipeline import EEG2VideoPipeline

            pipe = EEG2VideoPipeline.create(state.params, vae_params, ucfg, vcfg)
            val_emb = text_emb[:2].reshape(2, -1)
            vids = pipe(val_emb, val_emb.mean(axis=0),
                        key=jax.random.fold_in(key, 10_000 + epoch),
                        num_inference_steps=args.validation_steps,
                        guidance_scale=12.5)
            sample_path = os.path.join(args.output_dir, "samples", f"sample-{epoch}.gif")
            save_videos_grid(np.asarray(vids), sample_path)
            log.info("validation samples -> %s", sample_path)
        if epoch % args.checkpointing_epochs == 0 or epoch == args.epochs:
            # async: the write drains on the session's background thread
            # while the next epoch trains (CheckpointSession.close waits)
            session.save(epoch, {"params": state.params,
                                 "opt_state": state.opt_state,
                                 "step": state.step})
            # reference checkpoints are a diffusers pipeline directory
            # (pipeline.save_pretrained(output_dir), train L376-382) that
            # its inference reloads by subfolder (inference L50); emit the
            # same layout so a TPU-fine-tuned UNet flows back into the
            # reference stack
            from ..convert.export_diffusion import save_diffusers_pipeline

            save_diffusers_pipeline(
                args.output_dir, {"params": jax.device_get(state.params)},
                ucfg, {"params": jax.device_get(vae_params)}, vcfg)
            log.info("checkpoint @ epoch %d -> %s (orbax + diffusers layout)",
                     epoch, args.output_dir)


if __name__ == "__main__":
    main()
