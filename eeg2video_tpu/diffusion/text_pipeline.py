"""Text-conditioned generation + DDIM inversion — the reference's
``TuneAVideoPipeline`` (pipeline_tuneavideo.py:40-412) and ``ddim_inversion``
(tuneavideo/util.py:56-101) counterparts.

Conditioning comes from the Flax CLIP text tower; the negative/unconditional
embedding is the empty-prompt encoding (the artifact the reference dumps to
negative.npy, pipeline_tuneavideo.py:230-233).  Sampling shares the jitted
lax.scan machinery of diffusion.pipeline.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.clip_text import CLIPTextConfig, CLIPTextModel
from ..models.unet3d import UNet3DConditionModel
from ..models.vae import AutoencoderKL, SD_VAE_SCALE
from .pipeline import EEG2VideoPipeline
from .schedulers import DDIMSchedule


@dataclasses.dataclass
class TextToVideoPipeline:
    """Prompt-conditioned wrapper: tokenizer + CLIP text encoder in front of
    the shared sampling core."""

    base: EEG2VideoPipeline
    text_model: CLIPTextModel
    text_params: dict
    tokenizer: object  # transformers CLIPTokenizer (local files)

    @classmethod
    def create(cls, pipe: EEG2VideoPipeline, text_params, tokenizer,
               text_config: CLIPTextConfig = CLIPTextConfig()):
        return cls(pipe, CLIPTextModel(text_config), text_params, tokenizer)

    def encode_prompts(self, prompts: List[str]):
        ids = self.tokenizer(prompts, max_length=77, padding="max_length",
                             truncation=True, return_tensors="np").input_ids
        return np.asarray(self.text_model.apply(self.text_params, jnp.asarray(ids)))

    def __call__(self, prompts: List[str], **kw):
        emb = self.encode_prompts(prompts).reshape(len(prompts), -1)
        negative = self.encode_prompts([""]).reshape(-1)
        return self.base(emb, negative, **kw)


@functools.partial(
    jax.jit, static_argnames=("unet", "dtype", "num_inv_steps"))
def ddim_inversion(unet, dtype, unet_params, video_latents, context,
                   num_inv_steps: int = 50):
    """Deterministic DDIM inversion of clean latents into noise space
    (reference tuneavideo/util.py:56-101: uncond-only ddim_loop).

    video_latents: (B, F, h, w, 4) channels-last, already x0.18215-scaled.
    context: (B, 77, 768) (the reference uses the empty-prompt embedding).
    Returns the inverted latents after ``num_inv_steps`` reverse steps.
    """
    sched = DDIMSchedule.create(num_inv_steps)
    b = video_latents.shape[0]

    def step(lat, t):
        eps = unet.apply({"params": unet_params}, lat.astype(dtype),
                         jnp.broadcast_to(t, (b,)), context.astype(dtype)
                         ).astype(jnp.float32)
        return sched.inverse_step(eps, t, lat), None

    # reverse-time walk: ascending timesteps (util.py:92-95)
    lat, _ = jax.lax.scan(step, video_latents.astype(jnp.float32),
                          sched.timesteps[::-1])
    return lat
