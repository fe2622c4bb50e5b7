"""Training throughput on one chip at the reference's batch size.

Reference fine-tune recipe: batch 10 clips x 6 frames @ 288x512
(train_finetune_videodiffusion.py:77), fp16 autocast, grad checkpointing.
Ours: bf16 compute, remat, masked AdamW (attn1.to_q/attn2.to_q/attn_temp),
VAE posterior encode + DDPM q-sample + UNet fwd/bwd in ONE jitted step.

Usage: PYTHONPATH=. python scripts/train_throughput_bench.py [--batch 10]
Prints ms/step and the epoch/recipe projections for BENCH_NOTES.
"""

import argparse
import time

import numpy as np
import jax
from eeg2video_tpu.utils.cache import enable_persistent_cache
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=10)
    p.add_argument("--remat_min_hw", type=int, default=0)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--pixels", action="store_true",
                   help="feed raw pixels (in-step VAE encode) instead of the "
                        "product path's precomputed posteriors")
    p.add_argument("--trace", default=None,
                   help="capture a device trace of the timed steps to this "
                        "logdir and print the per-op bucket summary")
    args = p.parse_args()

    enable_persistent_cache(min_compile_time_secs=1.0)

    from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
    from eeg2video_tpu.models.vae import AutoencoderKL, VAEConfig
    from eeg2video_tpu.train.videodiffusion import (
        VideoDiffusionTrainConfig,
        init_video_train_state,
        make_video_train_step,
    )

    ucfg, vcfg = UNet3DConfig(), VAEConfig()
    tcfg = VideoDiffusionTrainConfig(remat_min_hw=args.remat_min_hw)
    unet = UNet3DConditionModel(ucfg)
    vae = AutoencoderKL(vcfg)

    b, f, h, w = args.batch, 6, 288, 512
    sample = jnp.zeros((1, f, h // 8, w // 8, 4), jnp.float32)
    ctx1 = jnp.zeros((1, 77, 768), jnp.float32)
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: unet.init(jax.random.key(0), sample,
                                         jnp.asarray([0]), ctx1)))["params"]
    vae_params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: vae.init(jax.random.key(1),
                                        jnp.zeros((1, 64, 64, 3)))))["params"]

    state = init_video_train_state(params, tcfg)
    step = make_video_train_step(ucfg, vcfg, tcfg)

    if args.pixels:
        pixels = jax.device_put(
            np.random.default_rng(0).standard_normal((b, f, h, w, 3)).astype(np.float32))
    else:
        # the product path: posteriors precomputed once per dataset
        pixels = jax.device_put(
            np.random.default_rng(0).standard_normal(
                (b, f, h // 8, w // 8, 8)).astype(np.float32))
    ctx = jax.device_put(
        np.random.default_rng(1).standard_normal((b, 77, 768)).astype(np.float32))
    key = jax.random.key(2)

    t0 = time.time()
    state, loss = step(state, vae_params, pixels, ctx, key)
    _ = float(loss)
    print(f"compile+first step: {time.time() - t0:.1f}s loss={float(loss):.4f}")

    import contextlib

    from eeg2video_tpu.utils import profiling

    tracer = (profiling.trace(args.trace) if args.trace
              else contextlib.nullcontext())
    t0 = time.time()
    with tracer:
        for _ in range(args.iters):
            state, loss = step(state, vae_params, pixels, ctx, key)
        _ = float(loss)  # host sync
    ms = (time.time() - t0) / args.iters * 1e3
    if args.trace:
        print(profiling.summarize(profiling.load_trace(args.trace),
                                  n_iters=args.iters))
    clips_s = b / (ms / 1e3)
    from eeg2video_tpu.utils.flops import mfu, train_step_flops

    step_flops = train_step_flops(ucfg, batch=b)
    print(f"batch {b}: {ms:.0f} ms/step  ({clips_s:.1f} clips/s; "
          f"200-clip epoch ~{200 / clips_s:.1f}s; "
          f"200-epoch recipe ~{200 * 200 / clips_s / 3600:.2f}h; "
          f"step_tflop={step_flops / 1e12:.1f} "
          f"mfu={100 * mfu(step_flops, ms / 1e3):.1f}%)")


if __name__ == "__main__":
    main()
    import os

    os._exit(0)
