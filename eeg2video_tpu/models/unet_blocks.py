"""Down/mid/up blocks of the video UNet.

Reference: EEG2Video_New/Generation/models/unet_blocks.py — factories L10-121,
UNetMidBlock3DCrossAttn L124-206, CrossAttnDownBlock3D L208-318, DownBlock3D
L321-397, CrossAttnUpBlock3D L400-515, UpBlock3D L517-588.

Gradient checkpointing: instead of the reference's per-module
torch.utils.checkpoint (unet_blocks.py:289-305), pass ``remat=True`` to the
UNet and whole blocks are wrapped with jax.checkpoint — the XLA-native way
to trade FLOPs for HBM.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .attention3d import Transformer3DModel
from .resnet3d import Downsample3D, ResnetBlock3D, Upsample3D


class CrossAttnDownBlock3D(nn.Module):
    features: int
    groups: int = 32
    eps: float = 1e-5
    n_layers: int = 2
    attn_heads: int = 8
    add_downsample: bool = True
    dtype: Optional[jnp.dtype] = None
    train: bool = False  # attribute (static) so remat sees no bool args

    @nn.compact
    def __call__(self, x, temb, context, attention_bias=None):
        train = self.train
        states = ()
        head_dim = self.features // self.attn_heads
        for i in range(self.n_layers):
            x = ResnetBlock3D(self.features, groups=self.groups, eps=self.eps, dtype=self.dtype, name=f"resnet{i}")(x, temb, train=train)
            x = Transformer3DModel(
                self.attn_heads, head_dim, groups=self.groups,
                dtype=self.dtype, name=f"attn{i}"
            )(x, context, attention_bias=attention_bias, train=train)
            states += (x,)
        if self.add_downsample:
            x = Downsample3D(self.features, dtype=self.dtype, name="downsample")(x)
            states += (x,)
        return x, states


class DownBlock3D(nn.Module):
    features: int
    groups: int = 32
    eps: float = 1e-5
    n_layers: int = 2
    add_downsample: bool = True
    dtype: Optional[jnp.dtype] = None
    train: bool = False

    @nn.compact
    def __call__(self, x, temb):
        train = self.train
        states = ()
        for i in range(self.n_layers):
            x = ResnetBlock3D(self.features, groups=self.groups, eps=self.eps, dtype=self.dtype, name=f"resnet{i}")(x, temb, train=train)
            states += (x,)
        if self.add_downsample:
            x = Downsample3D(self.features, dtype=self.dtype, name="downsample")(x)
            states += (x,)
        return x, states


class UNetMidBlock3DCrossAttn(nn.Module):
    features: int
    groups: int = 32
    eps: float = 1e-5
    n_layers: int = 1
    attn_heads: int = 8
    dtype: Optional[jnp.dtype] = None
    train: bool = False

    @nn.compact
    def __call__(self, x, temb, context, attention_bias=None):
        train = self.train
        head_dim = self.features // self.attn_heads
        x = ResnetBlock3D(self.features, groups=self.groups, eps=self.eps, dtype=self.dtype, name="resnet0")(x, temb, train=train)
        for i in range(self.n_layers):
            x = Transformer3DModel(
                self.attn_heads, head_dim, groups=self.groups,
                dtype=self.dtype, name=f"attn{i}"
            )(x, context, attention_bias=attention_bias, train=train)
            x = ResnetBlock3D(self.features, groups=self.groups, eps=self.eps, dtype=self.dtype, name=f"resnet{i + 1}")(x, temb, train=train)
        return x


class CrossAttnUpBlock3D(nn.Module):
    features: int
    groups: int = 32
    eps: float = 1e-5
    n_layers: int = 3
    attn_heads: int = 8
    add_upsample: bool = True
    dtype: Optional[jnp.dtype] = None
    train: bool = False
    upsample_size: Optional[Tuple[int, int]] = None  # static under remat

    @nn.compact
    def __call__(self, x, skips: Tuple, temb, context, attention_bias=None):
        train = self.train
        upsample_size = self.upsample_size
        head_dim = self.features // self.attn_heads
        for i in range(self.n_layers):
            skip = skips[-1]
            skips = skips[:-1]
            # skip passed as a separate operand — ResnetBlock3D computes the
            # exact concat([x, skip]) math from per-half convs/GN partials
            # without materializing the concat (resnet3d.py)
            x = ResnetBlock3D(self.features, groups=self.groups, eps=self.eps, dtype=self.dtype, name=f"resnet{i}")(x, temb, skip=skip, train=train)
            x = Transformer3DModel(
                self.attn_heads, head_dim, groups=self.groups,
                dtype=self.dtype, name=f"attn{i}"
            )(x, context, attention_bias=attention_bias, train=train)
        if self.add_upsample:
            x = Upsample3D(self.features, dtype=self.dtype, name="upsample")(x, upsample_size)
        return x


class UpBlock3D(nn.Module):
    features: int
    groups: int = 32
    eps: float = 1e-5
    n_layers: int = 3
    add_upsample: bool = True
    dtype: Optional[jnp.dtype] = None
    train: bool = False
    upsample_size: Optional[Tuple[int, int]] = None  # static under remat

    @nn.compact
    def __call__(self, x, skips: Tuple, temb):
        train = self.train
        upsample_size = self.upsample_size
        for i in range(self.n_layers):
            skip = skips[-1]
            skips = skips[:-1]
            x = ResnetBlock3D(self.features, groups=self.groups, eps=self.eps, dtype=self.dtype, name=f"resnet{i}")(x, temb, skip=skip, train=train)
        if self.add_upsample:
            x = Upsample3D(self.features, dtype=self.dtype, name="upsample")(x, upsample_size)
        return x
