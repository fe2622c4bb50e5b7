"""DPM-Solver++(2M) sampler correctness.

The sampler is a beyond-reference fast path (the reference ships only
100-step DDIM, inference_eeg2video.py:74-86).  Correctness is pinned
analytically: both samplers discretize the same probability-flow ODE, so

1. for a model whose x0-prediction is a constant ``mu`` the update is EXACT
   at any step count (the exponential integrator integrates the linear ODE
   in closed form), and
2. for a generic linear model eps(x, t) = c*x, few-step DPM++ must land
   near the fine-grained DDIM solution — and closer than few-step DDIM does
   (second order vs first order).
"""

import numpy as np
import jax
import jax.numpy as jnp

from eeg2video_tpu.diffusion.schedulers import DDIMSchedule, DPMSolverPPSchedule


def _run_dpm(eps_fn, x, n_steps):
    sched = DPMSolverPPSchedule.create(n_steps)
    x0p = jnp.zeros_like(x)
    for i in range(n_steps):
        t = int(sched.timesteps[i])
        eps = eps_fn(x, t)
        x, x0p = sched.step(eps, jnp.asarray(i), x, x0p)
    return np.asarray(x)


def _run_ddim(eps_fn, x, n_steps):
    sched = DDIMSchedule.create(n_steps)
    for i in range(n_steps):
        t = int(sched.timesteps[i])
        x = sched.step(eps_fn(x, t), jnp.asarray(t), x)
    return np.asarray(x)


def test_constant_x0_model_is_exact():
    # eps constructed so the implied x0-prediction is exactly mu at every t:
    # eps = (x - sqrt(ac_t) mu) / sqrt(1 - ac_t)
    sched = DPMSolverPPSchedule.create(10)
    ac = sched.alphas_cumprod
    mu = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3)), jnp.float32)

    def eps_fn(x, t):
        a = jnp.take(ac, t)
        return (x - jnp.sqrt(a) * mu) / jnp.sqrt(1.0 - a)

    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 3)), jnp.float32)
    for n in (1, 4, 10):
        out = _run_dpm(eps_fn, x, n)
        # final state: alpha_final*mu + (sigma_final/sigma_start)*(x - a_s mu);
        # easier: DDIM with the same model is also exact per-interval, so the
        # two must agree to float tolerance at ANY step count
        ref = _run_ddim(eps_fn, x, n)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_second_order_beats_ddim_on_gaussian_model():
    # the exact eps-posterior of Gaussian data x0 ~ N(0, S2*I): a stable
    # probability-flow ODE with genuine curvature (a plain eps = c*x model
    # is an expanding map under this noise schedule and overflows f32 long
    # before the fine-grained reference converges)
    S2 = 4.0
    sched_ac = np.asarray(DPMSolverPPSchedule.create(10).alphas_cumprod)

    def eps_fn(x, t):
        a = np.float32(sched_ac[min(int(t), len(sched_ac) - 1)])
        return np.sqrt(1.0 - a) * x / (a * S2 + (1.0 - a))

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 5)), jnp.float32)
    ref = _run_ddim(eps_fn, x, 500)  # fine-grained ground truth
    dpm_err = np.abs(_run_dpm(eps_fn, x, 20) - ref).max()
    ddim_err = np.abs(_run_ddim(eps_fn, x, 20) - ref).max()
    scale = np.abs(ref).max()
    # measured: dpm 0.046 / ddim 0.255 at scale 4.84 (ratio 0.18); DDIM
    # halves per step-doubling (first order), DPM++ is 4-7x closer
    assert dpm_err < 0.03 * scale, (dpm_err, scale)
    assert dpm_err < 0.4 * ddim_err, (dpm_err, ddim_err)


def test_pipeline_dpm_sampler_smoke():
    from eeg2video_tpu.diffusion.pipeline import EEG2VideoPipeline
    from eeg2video_tpu.models.unet3d import UNet3DConfig, UNet3DConditionModel
    from eeg2video_tpu.models.vae import AutoencoderKL, VAEConfig

    # micro(): this smoke gates the dpm++ sampler plumbing, not UNet shape
    ucfg = UNet3DConfig(**{**UNet3DConfig.micro().__dict__,
                           "cross_attention_dim": 768})
    vcfg = VAEConfig.tiny()
    unet = UNet3DConditionModel(ucfg)
    vae = AutoencoderKL(vcfg)
    b, f, hw = 1, 2, 32
    up = unet.init(jax.random.key(0), jnp.zeros((b, f, hw // 8, hw // 8, 4)),
                   jnp.zeros((b,), jnp.int32), jnp.zeros((b, 77, 768)))["params"]
    vp = vae.init(jax.random.key(1), jnp.zeros((1, hw, hw, 3)))["params"]
    pipe = EEG2VideoPipeline.create(up, vp, ucfg, vcfg, dtype=jnp.float32)
    emb = np.random.default_rng(0).standard_normal((b, 77 * 768)).astype(np.float32)
    vids = pipe(emb, emb.mean(axis=0), video_length=f, height=hw, width=hw,
                num_inference_steps=4, guidance_scale=7.5, sampler="dpm++")
    assert vids.shape == (b, f, hw, hw, 3)
    assert np.isfinite(np.asarray(vids)).all()
