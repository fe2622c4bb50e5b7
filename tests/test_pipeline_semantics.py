"""The jitted lax.scan sampling loop must match a hand-rolled Python DDIM
loop step for step (CFG pair order, scheduler wiring, timestep order)."""

import numpy as np

import jax
import jax.numpy as jnp

from eeg2video_tpu.diffusion.pipeline import EEG2VideoPipeline
from eeg2video_tpu.diffusion.schedulers import DDIMSchedule
from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from eeg2video_tpu.models.vae import AutoencoderKL, VAEConfig


def test_scan_loop_matches_manual_loop(rng):
    ucfg = UNet3DConfig.tiny()
    ucfg = type(ucfg)(**{**ucfg.__dict__, "cross_attention_dim": 768})
    vcfg = VAEConfig.tiny()
    unet = UNet3DConditionModel(ucfg, dtype=jnp.float32)
    vae = AutoencoderKL(vcfg)
    b, f, h8, w8 = 1, 2, 4, 4
    up = unet.init(jax.random.key(0), np.zeros((b, f, h8, w8, 4), np.float32),
                   jnp.asarray([0]), np.zeros((b, 77, 768), np.float32))["params"]
    vp = vae.init(jax.random.key(1), np.zeros((1, 32, 32, 3), np.float32))["params"]
    pipe = EEG2VideoPipeline.create(up, vp, ucfg, vcfg, dtype=jnp.float32)

    emb = rng.standard_normal((b, 77 * 768)).astype(np.float32)
    neg = rng.standard_normal((77 * 768,)).astype(np.float32)
    lat0 = rng.standard_normal((b, f, h8, w8, 4)).astype(np.float32)
    steps, gs = 4, 12.5

    out = np.asarray(pipe(emb, neg, latents=lat0, video_length=f, height=32,
                          width=32, num_inference_steps=steps,
                          guidance_scale=gs, decode=False))

    # manual loop with the same components
    sched = DDIMSchedule.create(steps)
    ctx = np.concatenate([np.broadcast_to(neg.reshape(1, 77, 768), (b, 77, 768)),
                          emb.reshape(b, 77, 768)], axis=0)
    lat = jnp.asarray(lat0) * sched.init_noise_sigma
    for t in np.asarray(sched.timesteps):
        inp = jnp.concatenate([lat, lat], axis=0)
        eps = unet.apply({"params": up}, inp,
                         jnp.broadcast_to(jnp.asarray(t), (2 * b,)),
                         jnp.asarray(ctx))
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        eps_g = eps_u + gs * (eps_c - eps_u)
        lat = sched.step(eps_g, jnp.asarray(t), lat)
    np.testing.assert_allclose(out, np.asarray(lat), rtol=2e-4, atol=2e-4)
