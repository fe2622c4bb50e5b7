"""DDPM / DDIM noise schedules in jnp, matching the semantics the reference
gets from diffusers 0.11.1 (DDPMScheduler for training, DDIMScheduler for
inference — reference train_finetune_videodiffusion.py:132,222-228 and
pipeline_tuneeeg2video.py:284-322).

Stable Diffusion v1-4 config: 1000 train timesteps, scaled_linear betas
0.00085 -> 0.012, steps_offset 1, clip_sample False, prediction_type epsilon,
set_alpha_to_one False.  Everything is a frozen pytree of precomputed tables
+ pure functions, so the whole denoise loop jits as one ``lax.scan``
(SURVEY.md section 7 step 8).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp


def make_beta_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    schedule: str = "scaled_linear",
) -> np.ndarray:
    if schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    if schedule == "scaled_linear":
        return (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64) ** 2
        )
    raise ValueError(f"unknown beta schedule '{schedule}'")


def _extract(table, t, ndim):
    """Gather per-timestep scalars and broadcast to an ndim-shaped batch."""
    vals = jnp.take(table, t)
    return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))


def _ddim_spacing(num_inference_steps, num_train_timesteps, beta_start,
                  beta_end, schedule, steps_offset):
    """The diffusers-0.11.1 leading-space discretization both samplers ride
    (DDIM and DPM-Solver++ must use the IDENTICAL grid — their docstrings
    promise they discretize the same probability-flow ODE).  Returns f64
    ``(betas, alphas_cumprod, step_ratio, timesteps)``."""
    if not 1 <= num_inference_steps <= num_train_timesteps:
        # past the cap, step_ratio floors to 0: DDIM silently no-ops every
        # step and DPM++ divides 0/0 into all-NaN output (diffusers raises
        # ValueError at the same point)
        raise ValueError(
            f"num_inference_steps={num_inference_steps} must be in "
            f"[1, {num_train_timesteps}]")
    betas = make_beta_schedule(num_train_timesteps, beta_start, beta_end,
                               schedule)
    ac = np.cumprod(1.0 - betas)
    step_ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy()
    ts = ts.astype(np.int32) + steps_offset
    return betas, ac, step_ratio, ts


@dataclasses.dataclass(frozen=True)
class DDPMSchedule:
    """Forward (q) process + ancestral sampling tables."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    num_train_timesteps: int

    @classmethod
    def create(cls, num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
               schedule="scaled_linear"):
        betas = make_beta_schedule(num_train_timesteps, beta_start, beta_end, schedule)
        ac = np.cumprod(1.0 - betas)
        return cls(
            betas=jnp.asarray(betas, jnp.float32),
            alphas_cumprod=jnp.asarray(ac, jnp.float32),
            num_train_timesteps=num_train_timesteps,
        )

    def add_noise(self, x0, noise, t):
        """q(x_t | x_0): sqrt(ac_t) x0 + sqrt(1-ac_t) eps  (diffusers
        DDPMScheduler.add_noise semantics; reference train L296-304)."""
        sa = _extract(jnp.sqrt(self.alphas_cumprod), t, x0.ndim)
        so = _extract(jnp.sqrt(1.0 - self.alphas_cumprod), t, x0.ndim)
        return sa * x0 + so * noise

    def velocity(self, x0, noise, t):
        """v-prediction target (diffusers get_velocity)."""
        sa = _extract(jnp.sqrt(self.alphas_cumprod), t, x0.ndim)
        so = _extract(jnp.sqrt(1.0 - self.alphas_cumprod), t, x0.ndim)
        return sa * noise - so * x0


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Deterministic DDIM sampler (eta=0) with diffusers-0.11.1 timestep
    spacing: ``timesteps = (arange(N) * (T//N))[::-1] + steps_offset``."""

    alphas_cumprod: jnp.ndarray
    timesteps: jnp.ndarray  # descending, length = num_inference_steps
    final_alpha_cumprod: jnp.ndarray
    num_train_timesteps: int
    num_inference_steps: int
    init_noise_sigma: float = 1.0  # DDIM scale_model_input is identity

    @classmethod
    def create(cls, num_inference_steps: int, num_train_timesteps=1000,
               beta_start=0.00085, beta_end=0.012, schedule="scaled_linear",
               steps_offset: int = 1, set_alpha_to_one: bool = False):
        betas, ac, _, ts = _ddim_spacing(
            num_inference_steps, num_train_timesteps, beta_start, beta_end,
            schedule, steps_offset)
        final_ac = np.float32(1.0) if set_alpha_to_one else np.float32(ac[0])
        return cls(
            alphas_cumprod=jnp.asarray(ac, jnp.float32),
            timesteps=jnp.asarray(ts, jnp.int32),
            final_alpha_cumprod=jnp.asarray(final_ac),
            num_train_timesteps=num_train_timesteps,
            num_inference_steps=num_inference_steps,
        )

    def step(self, model_output, t, sample):
        """x_t -> x_{t-step_ratio} (eta=0, clip_sample=False, epsilon pred).

        ``t`` may be a traced scalar — suitable for lax.scan over
        ``self.timesteps``.
        """
        step_ratio = self.num_train_timesteps // self.num_inference_steps
        prev_t = t - step_ratio
        a_t = jnp.take(self.alphas_cumprod, t)
        a_prev = jnp.where(prev_t >= 0, jnp.take(self.alphas_cumprod, jnp.maximum(prev_t, 0)),
                           self.final_alpha_cumprod)
        sqrt_a_t = jnp.sqrt(a_t)
        sqrt_one_minus_a_t = jnp.sqrt(1.0 - a_t)
        x0 = (sample - sqrt_one_minus_a_t * model_output) / sqrt_a_t
        dir_xt = jnp.sqrt(1.0 - a_prev) * model_output
        return jnp.sqrt(a_prev) * x0 + dir_xt

    def inverse_step(self, model_output, t, sample):
        """Reverse DDIM (x_{t-step} -> x_t): the core of ddim_inversion
        (reference tuneavideo/util.py:34-101, next_step L37-46)."""
        step_ratio = self.num_train_timesteps // self.num_inference_steps
        next_t = t
        prev_t = t - step_ratio
        a_prev = jnp.where(prev_t >= 0, jnp.take(self.alphas_cumprod, jnp.maximum(prev_t, 0)),
                           self.final_alpha_cumprod)
        a_next = jnp.take(self.alphas_cumprod, next_t)
        x0 = (sample - jnp.sqrt(1.0 - a_prev) * model_output) / jnp.sqrt(a_prev)
        return jnp.sqrt(a_next) * x0 + jnp.sqrt(1.0 - a_next) * model_output


@dataclasses.dataclass(frozen=True)
class DPMSolverPPSchedule:
    """DPM-Solver++(2M): a second-order multistep ODE sampler (Lu et al.
    2022, "DPM-Solver++", data-prediction / multistep variant) — an optional
    fast path beyond the reference (which only ships 100-step DDIM,
    inference_eeg2video.py:74-86): 15-25 steps land within the DDIM-quality
    envelope, cutting generation latency ~4-6x.

    Same SD-v1.4 noise schedule and diffusers-0.11.1 timestep spacing as
    ``DDIMSchedule`` so the two samplers discretize the same probability-flow
    ODE.  All per-step coefficients are precomputed host-side; ``step`` takes
    the scan index so the whole loop jits as one ``lax.scan`` with a
    ``(latents, prev_x0)`` carry.  The final step drops to first order
    (the standard lower-order-final rule: the 2M correction extrapolates
    x0 across the exactly-zero h of the last interval otherwise).
    """

    alphas_cumprod: jnp.ndarray
    timesteps: jnp.ndarray            # descending, length N
    alpha_s: jnp.ndarray              # sqrt(ac) at the CURRENT t of step i
    sigma_s: jnp.ndarray              # sqrt(1-ac) at the current t
    alpha_t: jnp.ndarray              # sqrt(ac) at the TARGET t of step i
    sigma_t: jnp.ndarray              # sqrt(1-ac) at the target t
    h: jnp.ndarray                    # lambda_t - lambda_s per step
    r: jnp.ndarray                    # h_{i-1} / h_i (1.0 at i=0)
    num_train_timesteps: int
    num_inference_steps: int
    init_noise_sigma: float = 1.0

    @classmethod
    def create(cls, num_inference_steps: int, num_train_timesteps=1000,
               beta_start=0.00085, beta_end=0.012, schedule="scaled_linear",
               steps_offset: int = 1, set_alpha_to_one: bool = False):
        betas, ac, step_ratio, ts = _ddim_spacing(
            num_inference_steps, num_train_timesteps, beta_start, beta_end,
            schedule, steps_offset)
        final_ac = np.float64(1.0 - betas[0]) if not set_alpha_to_one else np.float64(1.0)
        # DDIM-convention target timesteps: prev_t = t - step_ratio, with the
        # final interval landing on final_alpha_cumprod (= ac[0] here)
        ac_s = ac[ts]
        prev = ts - step_ratio
        ac_t = np.where(prev >= 0, ac[np.maximum(prev, 0)], final_ac)
        al_s, si_s = np.sqrt(ac_s), np.sqrt(1.0 - ac_s)
        al_t, si_t = np.sqrt(ac_t), np.sqrt(1.0 - ac_t)
        lam_s = np.log(al_s / si_s)
        lam_t = np.log(al_t / si_t)
        h = lam_t - lam_s
        h_prev = np.concatenate([[h[0]], h[:-1]])
        r = h_prev / h
        return cls(
            alphas_cumprod=jnp.asarray(ac, jnp.float32),
            timesteps=jnp.asarray(ts, jnp.int32),
            alpha_s=jnp.asarray(al_s, jnp.float32),
            sigma_s=jnp.asarray(si_s, jnp.float32),
            alpha_t=jnp.asarray(al_t, jnp.float32),
            sigma_t=jnp.asarray(si_t, jnp.float32),
            h=jnp.asarray(h, jnp.float32),
            r=jnp.asarray(r, jnp.float32),
            num_train_timesteps=num_train_timesteps,
            num_inference_steps=num_inference_steps,
        )

    def step(self, model_output, i, sample, prev_x0):
        """One 2M update at scan index ``i`` (epsilon-prediction model).

        Returns ``(new_sample, x0)`` — thread ``x0`` back in as ``prev_x0``
        of the next step (any array works at i=0; its weight is zero).
        """
        al_s, si_s = jnp.take(self.alpha_s, i), jnp.take(self.sigma_s, i)
        al_t, si_t = jnp.take(self.alpha_t, i), jnp.take(self.sigma_t, i)
        h, r = jnp.take(self.h, i), jnp.take(self.r, i)
        x0 = (sample - si_s * model_output) / al_s
        c = 1.0 / (2.0 * r)
        d2 = (1.0 + c) * x0 - c * prev_x0
        # first step has no history; last step drops to first order
        first_order = (i == 0) | (i == self.num_inference_steps - 1)
        d = jnp.where(first_order, x0, d2)
        new = (si_t / si_s) * sample - al_t * jnp.expm1(-h) * d
        return new, x0
