"""AutoencoderKL (Stable-Diffusion VAE) in Flax, channels-last.

The reference consumes ``diffusers.AutoencoderKL`` off the shelf for latent
generation (reference EEG2Video_New/Seq2Seq/generate_1200_latent.py:13,38 —
note it uses ``latent_dist.mean`` with NO 0.18215 scaling) and for pipeline
decode (pipeline_tuneeeg2video.py:172-181 — 1/0.18215 then per-frame decode).
diffusers is not vendored here; this is a from-scratch Flax implementation of
the same architecture (SD v1 VAE: blocks (128, 256, 512, 512), 2 layers per
encoder block, mid attention, GroupNorm(32, eps 1e-6), SiLU).

API: images are (N, H, W, 3) in [-1, 1]; latents (N, H/8, W/8, 4).
``encode`` returns the distribution moments; ``decode`` maps latents back.
Frame folding for video is the caller's job (frames are independent).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

SD_VAE_SCALE = 0.18215


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    sample_channels: int = 3

    @classmethod
    def tiny(cls):
        return cls(block_out_channels=(32, 32, 64, 64), layers_per_block=1,
                   norm_num_groups=8)


class _VAEResnet(nn.Module):
    features: int
    groups: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class _VAEAttention(nn.Module):
    """Single-head self-attention block of the VAE mid section."""

    groups: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        flat = x.reshape(n, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="query")(flat)
        k = nn.Dense(c, dtype=self.dtype, name="key")(flat)
        v = nn.Dense(c, dtype=self.dtype, name="value")(flat)
        logits = jnp.einsum("nqc,nkc->nqk", q, k, preferred_element_type=jnp.float32)
        probs = jnp.asarray(
            nn.softmax(logits / jnp.sqrt(jnp.float32(c)), axis=-1), q.dtype
        )
        out = jnp.einsum("nqk,nkc->nqc", probs, v)
        out = nn.Dense(c, dtype=self.dtype, name="proj_attn")(out)
        return res + out.reshape(n, h, w, c)


class Encoder(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        g = cfg.norm_num_groups
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = _VAEResnet(ch, g, dtype=self.dtype, name=f"down{i}_res{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                # diffusers Downsample2D with asymmetric pad ((0,1),(0,1))
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"down{i}_downsample")(h)
        ch = cfg.block_out_channels[-1]
        h = _VAEResnet(ch, g, dtype=self.dtype, name="mid_res0")(h)
        h = _VAEAttention(g, dtype=self.dtype, name="mid_attn")(h)
        h = _VAEResnet(ch, g, dtype=self.dtype, name="mid_res1")(h)
        h = nn.GroupNorm(num_groups=g, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        g = cfg.norm_num_groups
        rev = list(reversed(cfg.block_out_channels))
        h = nn.Conv(rev[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_in")(z)
        h = _VAEResnet(rev[0], g, dtype=self.dtype, name="mid_res0")(h)
        h = _VAEAttention(g, dtype=self.dtype, name="mid_attn")(h)
        h = _VAEResnet(rev[0], g, dtype=self.dtype, name="mid_res1")(h)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = _VAEResnet(ch, g, dtype=self.dtype, name=f"up{i}_res{j}")(h)
            if i < len(rev) - 1:
                n, hh, ww, c = h.shape
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"up{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=g, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.sample_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype, name="post_quant_conv")

    def encode(self, x):
        """-> (mean, logvar); the reference's latent generators use the mean
        (generate_1200_latent.py:38)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x):
        mean, logvar = self.encode(x)
        return self.decode(mean)
