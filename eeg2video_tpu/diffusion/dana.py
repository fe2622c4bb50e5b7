"""DANA — dynamic noise adding (reference EEG2Video_New/DANA/add_noise.py:18-65).

Mixes per-frame iid noise (weight sqrt(1-beta_d)) with one noise sample shared
across frames (weight sqrt(beta_d)), then q-samples at a random timestep with
a *linear* 1e-4 -> 0.02 beta schedule over 500 steps (reference L42-43).
beta_d encodes optical-flow "dynamism": 0.3 for fast clips, 0.2 otherwise
(reference L120, threshold 1.799 on the flow score, L107).

Pure-jnp with explicit PRNG keys (the reference seeds torch globally with
3407, L81); vmappable over a batch of clips.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

DANA_TIME_STEPS = 500
FLOW_THRESHOLD = 1.799
BETA_FAST = 0.3
BETA_SLOW = 0.2


def dana_betas(time_steps: int = DANA_TIME_STEPS, start=1e-4, end=2e-2) -> np.ndarray:
    return np.linspace(start, end, time_steps, dtype=np.float64)


def dana_add_noise(key, x0, dynamic_beta, time_steps: int = DANA_TIME_STEPS):
    """Noise a batch of latents (B, F, C, H, W).

    ``dynamic_beta``: scalar or (B,) per-clip mixing weight.
    Matches reference Diffusion.forward (add_noise.py:45-65): per-item random
    t ~ U[0, T), diverse + shared noise mix, q-sample.
    """
    b, f = x0.shape[0], x0.shape[1]
    kt, kd, ks = jax.random.split(key, 3)
    t = jax.random.randint(kt, (b,), 0, time_steps)
    diverse = jax.random.normal(kd, x0.shape, x0.dtype)
    same = jax.random.normal(ks, (b, 1) + x0.shape[2:], x0.dtype)
    same = jnp.broadcast_to(same, x0.shape)

    beta_d = jnp.asarray(dynamic_beta, x0.dtype)
    beta_d = beta_d.reshape((-1,) + (1,) * (x0.ndim - 1)) if beta_d.ndim else beta_d
    noise = diverse * jnp.sqrt(1.0 - beta_d) + same * jnp.sqrt(beta_d)

    ac = jnp.asarray(np.cumprod(1.0 - dana_betas(time_steps)), x0.dtype)
    sa = jnp.take(jnp.sqrt(ac), t).reshape((b,) + (1,) * (x0.ndim - 1))
    so = jnp.take(jnp.sqrt(1.0 - ac), t).reshape((b,) + (1,) * (x0.ndim - 1))
    return sa * x0 + so * noise


def flow_to_beta(flow_scores, threshold: float = FLOW_THRESHOLD) -> jnp.ndarray:
    """Optical-flow score -> beta_d (reference add_noise.py:106,120).

    ``threshold`` defaults to the reference's 1.799 fast-motion cut; the
    CLIs expose it (--threshold / --dana_threshold) because the shipped
    score table's estimator/scale is unpublished."""
    return jnp.where(jnp.asarray(flow_scores) >= threshold, BETA_FAST, BETA_SLOW)
