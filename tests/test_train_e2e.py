"""Trained-model end-to-end quality gate (VERDICT round-1 next #5): overfit a
tiny UNet on two synthetic clips with fixed context->clip mapping, generate
with the full pipeline from pure noise, and assert each generated clip is
measurably closer (SSIM and MSE) to ITS OWN target than to the other clip's —
proof that the train -> sample loop LEARNS, not just runs.

Targets are VAE-roundtripped (decode(encode(x))) since the VAE is random-init
here; the gate tests the diffusion training/sampling loop, not the VAE.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eeg2video_tpu.diffusion.pipeline import EEG2VideoPipeline
from eeg2video_tpu.eval.metrics import ssim
from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from eeg2video_tpu.models.vae import AutoencoderKL, VAEConfig, SD_VAE_SCALE
from eeg2video_tpu.train.videodiffusion import (
    VideoDiffusionTrainConfig,
    init_video_train_state,
    make_video_train_epoch,
)

F, HH, WW = 2, 32, 32


def _clips():
    """Two visually distinct clips in [-1, 1]: a horizontal ramp and a
    checkerboard, constant over frames."""
    x = np.linspace(-1, 1, WW, dtype=np.float32)
    ramp = np.broadcast_to(x[None, None, :, None], (F, HH, WW, 3)).copy()
    yy, xx = np.mgrid[0:HH, 0:WW]
    checker = (((yy // 8 + xx // 8) % 2) * 2.0 - 1.0).astype(np.float32)
    checker = np.broadcast_to(checker[None, :, :, None], (F, HH, WW, 3)).copy()
    return np.stack([ramp, checker])  # (2, F, H, W, 3)


def test_overfit_then_generate_aligns():
    # a LOCAL generator, not the shared session fixture: the session rng's
    # state at this test depends on which tests ran before it, so the
    # overfit margin silently varied with suite composition (observed as a
    # suite-only flake when unrelated tests were added)
    rng = np.random.default_rng(1234)
    ucfg = UNet3DConfig(block_out_channels=(32, 64, 64, 64),
                        attention_heads=4, cross_attention_dim=768,
                        norm_num_groups=8)
    vcfg = VAEConfig.tiny()
    tcfg = VideoDiffusionTrainConfig(
        learning_rate=2e-3, compute_dtype="float32", remat=False,
        train_all=True, weight_decay=0.0)

    unet = UNet3DConditionModel(ucfg)
    vae = AutoencoderKL(vcfg)
    pixels = _clips()
    ctx = rng.standard_normal((2, 77, 768)).astype(np.float32)

    sample = jnp.zeros((2, F, HH // 8, WW // 8, 4), jnp.float32)
    params = unet.init(jax.random.key(0), sample, jnp.zeros((2,), jnp.int32),
                       jnp.asarray(ctx))["params"]
    vae_params = vae.init(jax.random.key(1),
                          jnp.zeros((1, HH, WW, 3), jnp.float32))["params"]

    state = init_video_train_state(params, tcfg)
    epoch_fn = make_video_train_epoch(ucfg, vcfg, tcfg)

    steps = 150
    perm = jnp.asarray(np.tile(np.asarray([[0, 1]], np.int32), (steps, 1)))
    losses = []
    for r in range(3):  # 3 x 150 steps; one dispatch per chunk
        state, loss = epoch_fn(state, vae_params, jnp.asarray(pixels),
                               jnp.asarray(ctx), perm, jax.random.key(7 + r))
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"training did not reduce loss: {losses}"

    # the achievable target: the VAE roundtrip of each training clip
    frames = jnp.asarray(pixels.reshape(2 * F, HH, WW, 3))
    mean, _ = vae.apply({"params": vae_params}, frames,
                        method=AutoencoderKL.encode)
    rt = vae.apply({"params": vae_params}, mean, method=AutoencoderKL.decode)
    rt = np.asarray((rt / 2 + 0.5).clip(0, 1)).reshape(2, F, HH, WW, 3)

    pipe = EEG2VideoPipeline.create(state.params, vae_params, ucfg, vcfg,
                                    dtype=jnp.float32)
    vids = np.asarray(pipe(ctx.reshape(2, -1), np.zeros(77 * 768, np.float32),
                           key=jax.random.key(42), video_length=F,
                           height=HH, width=WW, num_inference_steps=50,
                           guidance_scale=1.0))

    def score(a, b):
        s = [ssim(a[f], b[f], data_range=1.0) for f in range(F)]
        return float(np.mean(s))

    for i in range(2):
        j = 1 - i
        own_ssim, other_ssim = score(vids[i], rt[i]), score(vids[i], rt[j])
        own_mse = float(np.mean((vids[i] - rt[i]) ** 2))
        other_mse = float(np.mean((vids[i] - rt[j]) ** 2))
        assert own_ssim > other_ssim, (i, own_ssim, other_ssim)
        assert own_mse < other_mse, (i, own_mse, other_mse)

    # DPM-Solver++(2M) fast path on the TRAINED model (round-4 VERDICT #4):
    # the 20-step serving graph must pass the same alignment gate AND sit in
    # the same quality tier as DDIM — until now its quality was pinned only
    # to scheduler math on a Gaussian toy (tests/test_dpm_solver.py), never
    # to a trained sampler output.  Gate: per-clip alignment (own target
    # beats the swapped target on SSIM and MSE) plus mean own-target SSIM
    # within 0.1 of the DDIM-50 clips' (per-clip SSIM on this tiny overfit
    # model is noisy — measured ddim/dpm own-SSIM pairs (0.256, 0.130) and
    # (0.341, 0.392); the means differ by ~0.04).
    vids_dpm = np.asarray(pipe(ctx.reshape(2, -1),
                               np.zeros(77 * 768, np.float32),
                               key=jax.random.key(42), video_length=F,
                               height=HH, width=WW, num_inference_steps=20,
                               guidance_scale=1.0, sampler="dpm++"))
    own_ddim, own_dpm = [], []
    for i in range(2):
        j = 1 - i
        own, other = score(vids_dpm[i], rt[i]), score(vids_dpm[i], rt[j])
        assert own > other, ("dpm++", i, own, other)
        own_mse = float(np.mean((vids_dpm[i] - rt[i]) ** 2))
        other_mse = float(np.mean((vids_dpm[i] - rt[j]) ** 2))
        assert own_mse < other_mse, ("dpm++", i, own_mse, other_mse)
        own_dpm.append(own)
        own_ddim.append(score(vids[i], rt[i]))
    assert np.mean(own_dpm) > np.mean(own_ddim) - 0.1, (
        "dpm++-20 quality fell out of the DDIM-50 tier", own_dpm, own_ddim)
