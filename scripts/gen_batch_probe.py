#!/usr/bin/env python
"""Re-probe batch>1 single-chip generation throughput (round-4 VERDICT #3).

The "chip saturates at B=1" note dates from the round-1 graphs; ~24% of
UNet-step time and half the decode have been removed since.  This measures
warm end-to-end s/clip for B in {1, 2, 4} on the current graphs (zero
weights — timing is data-independent; 20 DDIM steps, the per-step graph is
identical to the 100-step recipe's, so clips/s ratios transfer).

Run on the real chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/gen_batch_probe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from eeg2video_tpu.diffusion.pipeline import EEG2VideoPipeline
from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from eeg2video_tpu.models.vae import AutoencoderKL, VAEConfig

STEPS = 20
REPS = 3


def main():
    ucfg, vcfg = UNet3DConfig(), VAEConfig()
    unet = UNet3DConditionModel(ucfg, dtype=jnp.bfloat16)
    vae = AutoencoderKL(vcfg, dtype=jnp.bfloat16)
    up = jax.eval_shape(lambda: unet.init(
        jax.random.key(0), jnp.zeros((1, 6, 36, 64, 4), jnp.bfloat16),
        jnp.asarray([0]), jnp.zeros((1, 77, 768), jnp.bfloat16)))["params"]
    up = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), up)
    vp = jax.eval_shape(lambda: vae.init(
        jax.random.key(1), jnp.zeros((1, 32, 32, 3), jnp.bfloat16)))["params"]
    vp = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), vp)
    pipe = EEG2VideoPipeline(unet=unet, unet_params=up, vae=vae,
                             vae_params=vp, dtype=jnp.bfloat16)

    results = {}
    for b in (1, 2, 4):
        emb = jax.device_put(jnp.zeros((b, 77 * 768), jnp.float32))
        neg = jax.device_put(jnp.zeros((77 * 768,), jnp.float32))
        lat = jax.device_put(jnp.zeros((b, 6, 36, 64, 4), jnp.float32))

        def run():
            out = pipe(emb, neg, latents=lat, key=jax.random.key(0),
                       num_inference_steps=STEPS)
            float(jnp.sum(out))  # host reduction: real sync over the tunnel

        t0 = time.time()
        run()  # compile + first run
        print(f"B={b}: first run (incl compile) {time.time() - t0:.1f}s",
              flush=True)
        times = []
        for _ in range(REPS):
            t0 = time.time()
            run()
            times.append(time.time() - t0)
        best = min(times)
        results[b] = best / b
        print(f"B={b}: warm {best:.3f}s total = {best / b:.3f} s/clip "
              f"({b / best:.3f} clips/s) at {STEPS} steps", flush=True)

    r1 = results[1]
    for b in (2, 4):
        print(f"B={b} speedup per clip vs B=1: {r1 / results[b]:.3f}x",
              flush=True)
    import os

    os._exit(0)  # interpreter teardown can hang over the tunnel (bench.py)


if __name__ == "__main__":
    main()
