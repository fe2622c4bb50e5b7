"""UNet3DConditionModel — the SD-1.4 UNet inflated to pseudo-3D, in Flax.

Reference: EEG2Video_New/Generation/models/unet.py:37-413 (architecture and
forward orchestration) and :415-449 (2D->3D checkpoint inflation, implemented
in convert/unet_params.py).

Config fixed to the SD-1.4 shape the reference uses (unet.py:40-78):
in/out 4 channels, blocks (320, 640, 1280, 1280), 2 layers per block,
3x CrossAttnDownBlock3D + DownBlock3D down, UpBlock3D + 3x CrossAttnUpBlock3D
up, mid UNetMidBlock3DCrossAttn, cross_attention_dim 768, 8 attention heads.

I/O contract (channels-last): sample (B, F, H, W, C_in), timesteps (B,) or
scalar, context (B, S, 768) -> (B, F, H, W, C_out).  The torch-facing
pipeline wrappers rearrange from/to the reference's (B, C, F, H, W).

``remat`` wraps each down/mid/up block in jax.checkpoint — the XLA-native
equivalent of the reference's gradient checkpointing (unet.py:274-276).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .unet_blocks import (
    CrossAttnDownBlock3D,
    CrossAttnUpBlock3D,
    DownBlock3D,
    UNetMidBlock3DCrossAttn,
    UpBlock3D,
)
from .resnet3d import PseudoConv3d


@dataclasses.dataclass(frozen=True)
class UNet3DConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_heads: int = 8
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    freq_shift: int = 0
    flip_sin_to_cos: bool = True

    @classmethod
    def tiny(cls):
        """Small config for tests."""
        return cls(block_out_channels=(32, 64, 64, 64), attention_heads=4,
                   cross_attention_dim=16, norm_num_groups=8)

    @classmethod
    def micro(cls):
        """Smallest structurally-complete config: 2 levels x 1 layer still
        instantiates every block class (CrossAttnDown, Down, Mid, Up,
        CrossAttnUp) and keeps heads/channels divisible for tp<=4, at ~1/4
        of tiny()'s trace+compile cost.  For tests whose assertion is about
        parallelism/step semantics rather than the 4-level architecture."""
        return cls(block_out_channels=(32, 64), layers_per_block=1,
                   attention_heads=4, cross_attention_dim=16,
                   norm_num_groups=8)


def timestep_embedding(timesteps, dim: int, flip_sin_to_cos=True, freq_shift=0,
                       max_period=10000.0, dtype=jnp.float32):
    """diffusers get_timestep_embedding semantics (used via Timesteps,
    reference unet.py:88,339)."""
    half = dim // 2
    exponent = -np.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    return emb.astype(dtype)


class UNet3DConditionModel(nn.Module):
    config: UNet3DConfig = UNet3DConfig()
    dtype: Optional[jnp.dtype] = None
    remat: bool = False
    # selective gradient checkpointing: only blocks whose input spatial size
    # (H*W) is >= this threshold are remat'd.  Deep levels (9x16, 5x8) carry
    # tiny activations but the most expensive convs to recompute — saving
    # their activations costs ~nothing and skips the priciest recompute.
    # 0 = remat everywhere (the reference's uniform gradient checkpointing,
    # train L154-155).
    remat_min_hw: int = 0
    # save resnet conv outputs inside remat'd blocks (HBM permitting)
    # instead of recomputing the frozen-weight convs; see maybe_remat
    remat_save_convs: bool = True
    # save the flash-attention kernel outputs (out + lse, named "flash_out"
    # in the custom_vjp fwd rules, ops/attention.py) inside remat'd blocks:
    # the attention backward needs them as residuals anyway, so recomputing
    # the forward kernels was ~60 ms/step of duplicate launches at the
    # reference batch (device trace, BENCH_NOTES round 3); ~1.3 GB of HBM
    # at batch 10
    remat_save_attn: bool = True

    @nn.compact
    def __call__(self, sample, timesteps, context, *, attention_mask=None,
                 train: bool = False):
        cfg = self.config
        b = sample.shape[0]
        if jnp.ndim(timesteps) == 0:
            timesteps = jnp.broadcast_to(timesteps, (b,))

        # attention_mask -> additive bias, (1 - m) * -1e4 (unet.py:314-317),
        # applied to attn1 (sparse-causal self-attention) at every level.
        # The mask arrives at latent resolution, (B, H, W) or flat (B, H*W),
        # and is stride-2-resampled per level to follow the downsamplers —
        # the reference instead reuses one mask everywhere, which
        # shape-errors in torch past level 0 (and its attn2/F.pad quirk is
        # unreachable), so cross-attention takes no bias here.
        level_bias = [None] * len(cfg.block_out_channels)
        if attention_mask is not None:
            m = attention_mask.astype(jnp.float32)
            if m.ndim == 2:
                m = m.reshape(b, sample.shape[2], sample.shape[3])
            for i in range(len(cfg.block_out_channels)):
                level_bias[i] = ((1.0 - m.reshape(b, 1, -1)) * -10000.0)
                m = m[:, ::2, ::2]

        # time embedding: sinusoidal -> Dense -> SiLU -> Dense (unet.py:88-91)
        t_emb = timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift,
            dtype=self.dtype or jnp.float32,
        )
        temb = nn.Dense(cfg.block_out_channels[0] * 4, dtype=self.dtype, name="time_embed_1")(t_emb)
        temb = nn.Dense(cfg.block_out_channels[0] * 4, dtype=self.dtype, name="time_embed_2")(nn.silu(temb))

        def maybe_remat(mod_cls, hw):
            use = self.remat and hw >= self.remat_min_hw
            if not use:
                return mod_cls
            # save the (frozen-weight) resnet conv outputs instead of
            # recomputing them: the training-graph emitter runs several of
            # those convs at 27-70 TF/s and their recompute is dead weight
            # for the masked fine-tune (BENCH_NOTES round 3)
            names = ()
            if self.remat_save_convs:
                names += ("resnet_conv",)
            if self.remat_save_attn:
                names += ("flash_out", "ff_out")
            policy = (jax.checkpoint_policies.save_only_these_names(*names)
                      if names else None)
            return nn.remat(mod_cls, static_argnums=(), policy=policy)

        x = PseudoConv3d(cfg.block_out_channels[0], dtype=self.dtype, name="conv_in")(sample)

        # down path (unet.py:113-139, 361-373)
        skips = (x,)
        n_blocks = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            is_final = i == n_blocks - 1
            if not is_final:
                block = maybe_remat(CrossAttnDownBlock3D, x.shape[2] * x.shape[3])(
                    ch, cfg.norm_num_groups, cfg.norm_eps,
                    cfg.layers_per_block, cfg.attention_heads,
                    add_downsample=True, dtype=self.dtype, name=f"down{i}",
                    train=train,
                )
                x, states = block(x, temb, context, level_bias[i])
            else:
                block = maybe_remat(DownBlock3D, x.shape[2] * x.shape[3])(
                    ch, cfg.norm_num_groups, cfg.norm_eps,
                    cfg.layers_per_block, add_downsample=False,
                    dtype=self.dtype, name=f"down{i}", train=train,
                )
                x, states = block(x, temb)
            skips += states

        # mid (unet.py:142-156, 376-378)
        x = maybe_remat(UNetMidBlock3DCrossAttn, x.shape[2] * x.shape[3])(
            cfg.block_out_channels[-1], cfg.norm_num_groups, cfg.norm_eps,
            attn_heads=cfg.attention_heads,
            dtype=self.dtype, name="mid", train=train,
        )(x, temb, context, level_bias[-1])

        # up path (unet.py:163-202, 381-404); layers_per_block + 1 resnets
        rev = list(reversed(cfg.block_out_channels))
        n_up = cfg.layers_per_block + 1
        for i, ch in enumerate(rev):
            is_final = i == n_blocks - 1
            res_skips = skips[-n_up:]
            skips = skips[:-n_up]
            upsample_size = None if is_final else tuple(skips[-1].shape[2:4])
            if i == 0:
                block = maybe_remat(UpBlock3D, x.shape[2] * x.shape[3])(
                    ch, cfg.norm_num_groups, cfg.norm_eps,
                    n_up, add_upsample=not is_final, dtype=self.dtype,
                    name=f"up{i}", train=train, upsample_size=upsample_size,
                )
                x = block(x, res_skips, temb)
            else:
                block = maybe_remat(CrossAttnUpBlock3D, x.shape[2] * x.shape[3])(
                    ch, cfg.norm_num_groups, cfg.norm_eps,
                    n_up, cfg.attention_heads, add_upsample=not is_final,
                    dtype=self.dtype, name=f"up{i}", train=train,
                    upsample_size=upsample_size,
                )
                x = block(x, res_skips, temb, context, level_bias[n_blocks - 1 - i])

        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=cfg.norm_eps,
                         dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return PseudoConv3d(cfg.out_channels, dtype=self.dtype, name="conv_out")(x)
