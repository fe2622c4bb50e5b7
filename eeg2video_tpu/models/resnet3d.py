"""Pseudo-3D conv building blocks for the video UNet, channels-last.

Reference: EEG2Video_New/Generation/models/resnet.py (InflatedConv3d L10-18,
Upsample3D L21-73, Downsample3D L76-107, ResnetBlock3D L110-204).

TPU-first choices:
- activations are (B, F, H, W, C) channels-last; every spatial conv folds
  frames into the batch axis ((B*F, H, W, C)) so XLA hits its native 2-D
  conv path — the same math as the reference's InflatedConv3d without
  NCHW<->NHWC shuffles.
- GroupNorm/SiLU/conv chains are left to XLA fusion.
- the reference's bf16 upsample workaround (resnet.py:47-50) is unnecessary:
  jax.image.resize-free nearest upsampling is a pure gather that supports
  bf16 natively.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn


def fold_frames(x):
    """(B, F, H, W, C) -> (B*F, H, W, C)"""
    b, f = x.shape[0], x.shape[1]
    return x.reshape((b * f,) + x.shape[2:]), b, f


def unfold_frames(x, b, f):
    return x.reshape((b, f) + x.shape[1:])


class PseudoConv3d(nn.Module):
    """Per-frame 2-D convolution (InflatedConv3d semantics, resnet.py:10-18)."""

    features: int
    kernel: tuple = (3, 3)
    stride: tuple = (1, 1)
    padding: str | tuple = ((1, 1), (1, 1))
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        folded, b, f = fold_frames(x)
        out = nn.Conv(
            self.features, self.kernel, strides=self.stride, padding=self.padding,
            dtype=self.dtype, name="conv",
        )(folded)
        return unfold_frames(out, b, f)


class Upsample3D(nn.Module):
    """Nearest 2x spatial upsample per frame + 3x3 conv (resnet.py:21-73)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, output_size=None):
        b, f, h, w, c = x.shape
        if output_size is None:
            oh, ow = h * 2, w * 2
        else:
            oh, ow = output_size
        # nearest-neighbor: pure gather, dtype-agnostic
        rows = (jnp.arange(oh) * h) // oh
        cols = (jnp.arange(ow) * w) // ow
        x = x[:, :, rows][:, :, :, cols]
        return PseudoConv3d(self.features, dtype=self.dtype, name="conv")(x)


class Downsample3D(nn.Module):
    """Stride-2 3x3 conv per frame (resnet.py:76-107)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return PseudoConv3d(
            self.features, stride=(2, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv",
        )(x)


class ResnetBlock3D(nn.Module):
    """GN -> SiLU -> conv -> (+time) -> GN -> SiLU -> dropout -> conv -> +shortcut
    (resnet.py:110-204, output_scale_factor=1)."""

    features: int
    dropout: float = 0.0
    groups: int = 32
    eps: float = 1e-6
    use_in_shortcut: Optional[bool] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, temb=None, *, train: bool = False):
        in_features = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = PseudoConv3d(self.features, dtype=self.dtype, name="conv1")(h)

        if temb is not None:
            t = nn.Dense(self.features, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, None, :]

        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = PseudoConv3d(self.features, dtype=self.dtype, name="conv2")(h)

        use_short = (
            in_features != self.features if self.use_in_shortcut is None else self.use_in_shortcut
        )
        if use_short:
            x = PseudoConv3d(
                self.features, kernel=(1, 1), padding=((0, 0), (0, 0)),
                dtype=self.dtype, name="conv_shortcut",
            )(x)
        return x + h
