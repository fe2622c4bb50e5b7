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

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..ops.conv2d import (fused_conv3x3_t, fused_conv3x3_t_stats,
                          eligible as _conv_eligible)


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


class _GNParams(nn.Module):
    """Param holder matching nn.GroupNorm's tree ({scale, bias}) for blocks
    whose normalization runs inside the fused conv kernel."""

    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones_init(),
                           (self.features,)),
                self.param("bias", nn.initializers.zeros_init(),
                           (self.features,)))


class _ConvParams(nn.Module):
    """Param holder matching nn.Conv's tree ({kernel, bias})."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           (3, 3, self.in_features, self.features)),
                self.param("bias", nn.initializers.zeros_init(),
                           (self.features,)))


class _PseudoConvParams(nn.Module):
    """Param holder matching PseudoConv3d's tree (conv/{kernel, bias})."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return _ConvParams(self.in_features, self.features, name="conv")()


def _gn_affine_from_stats(stats, b, f, hw, gamma, beta, groups, eps):
    """Same (scale, shift) as _gn_affine, but from the conv kernel's
    per-image channel (sum, sum²) partials (ops.conv2d stats epilogue) —
    no separate stats reduce over the conv output."""
    c = stats.shape[-1]
    gpc = c // groups
    s = stats.reshape(b, f, 2, groups, gpc).sum(axis=(1, 4))  # (B, 2, G)
    cnt = f * hw * gpc
    mean = s[:, 0] / cnt
    var = s[:, 1] / cnt - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    scale = (gamma.astype(jnp.float32).reshape(groups, gpc)[None]
             * rstd[:, :, None])
    shift = (beta.astype(jnp.float32).reshape(groups, gpc)[None]
             - mean[:, :, None] * scale)
    return scale.reshape(b, c), shift.reshape(b, c)


def _gn_affine(x, gamma, beta, groups, eps):
    """Per-(image, channel) scale/shift of the GroupNorm affine, stats pooled
    over (F, H, W, group-channels) like the reference's 5-D GN
    (resnet.py:178): returns (B, C) f32 so the conv kernel's prologue
    computes silu(x*scale + shift) == silu(GN(x))."""
    b, f, hh, ww, c = x.shape
    xg = x.astype(jnp.float32).reshape(b, f, hh, ww, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 2, 3, 5))  # (B, G)
    var = jnp.mean(jnp.square(xg), axis=(1, 2, 3, 5)) - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    gpc = c // groups
    scale = (gamma.astype(jnp.float32).reshape(groups, gpc)[None]
             * rstd[:, :, None])  # (B, G, C/G)
    shift = (beta.astype(jnp.float32).reshape(groups, gpc)[None]
             - mean[:, :, None] * scale)
    return scale.reshape(b, c), shift.reshape(b, c)


class ResnetBlock3D(nn.Module):
    """GN -> SiLU -> conv -> (+time) -> GN -> SiLU -> dropout -> conv -> +shortcut
    (resnet.py:110-204, output_scale_factor=1).

    At level-0 generation shapes (bf16, lane-exact H*W, lane-padded Cout) the
    two GN->SiLU->conv chains run through the fused transposed implicit-GEMM
    Pallas kernel (ops.conv2d) — same params, same math, ~20% fewer MXU
    cycles than XLA's standard-orientation conv (BENCH_NOTES round 2)."""

    features: int
    dropout: float = 0.0
    groups: int = 32
    eps: float = 1e-6
    use_in_shortcut: Optional[bool] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, temb=None, *, train: bool = False):
        in_features = x.shape[-1]
        b, f, hh, ww, _ = x.shape
        # each GN->SiLU->conv chain dispatches independently (e.g. an
        # up-block's first resnet can have an ineligible 960-channel conv1
        # from the skip concat while its conv2 is the eligible 320->320).
        # Inference-only: routing the training forward through the kernel
        # measured a net LOSS (1183 -> 1206 ms/step at the reference batch —
        # XLA reorganizes the remat/backward fusions around the custom
        # call; device trace, BENCH_NOTES round 2), so training keeps the
        # all-XLA path.
        # (Routing the training-graph skip-concat conv1s (cin > cout) through
        # the kernel was tried in round 3 — XLA's 27 TF/s emitter for them
        # suggested a 2.4x win — but measured 1032 -> 1046 ms/step: the
        # by-dy Cin=960 slab rebuild runs ~4.3 ms/call in the training graph
        # and XLA regroups the displaced stats fusions.  Reverted; details
        # in BENCH_NOTES round 3.)
        use1 = not train and _conv_eligible(hh, ww, in_features,
                                            self.features, self.dtype)
        use2 = not train and _conv_eligible(hh, ww, self.features,
                                            self.features, self.dtype)
        dt = self.dtype or x.dtype
        conv1_stats = None

        if use1:
            g1, bt1 = _GNParams(in_features, name="norm1")()
            wk1, wb1 = _PseudoConvParams(in_features, self.features, name="conv1")()
            temb_row = None
            if temb is not None:
                t = nn.Dense(self.features, dtype=self.dtype,
                             name="time_emb_proj")(nn.silu(temb))
                temb_row = jnp.repeat(t.astype(jnp.float32), f, axis=0)
            s1, sh1 = _gn_affine(x, g1, bt1, self.groups, self.eps)
            conv1_stats = None
            if use2:
                # stats epilogue: conv1 emits the per-image (sum, sum²)
                # partials norm2 needs, killing its separate stats reduce
                h, conv1_stats = fused_conv3x3_t_stats(
                    x.reshape(b * f, hh, ww, in_features).astype(dt),
                    wk1.astype(dt), wb1,
                    jnp.repeat(s1, f, axis=0), jnp.repeat(sh1, f, axis=0),
                    temb_row)
            else:
                h = fused_conv3x3_t(
                    x.reshape(b * f, hh, ww, in_features).astype(dt),
                    wk1.astype(dt), wb1,
                    jnp.repeat(s1, f, axis=0), jnp.repeat(sh1, f, axis=0),
                    temb_row)
            h = h.reshape(b, f, hh, ww, self.features)
        else:
            h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
            h = nn.silu(h)
            h = PseudoConv3d(self.features, dtype=self.dtype, name="conv1")(h)

            if temb is not None:
                t = nn.Dense(self.features, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
                h = h + t[:, None, None, None, :]
            # saveable under the remat policy (unet3d remat_save_convs): the
            # conv weights are frozen in the fine-tune, so recomputing the
            # forward convs in the remat pass is pure waste — and XLA's
            # TRAINING-graph emitter runs several of them at 27-70 TF/s
            # (BENCH_NOTES round 3)
            h = checkpoint_name(h, "resnet_conv")

        if use2:
            g2, bt2 = _GNParams(self.features, name="norm2")()
            wk2, wb2 = _PseudoConvParams(self.features, self.features, name="conv2")()
            if use1 and conv1_stats is not None:
                s2, sh2 = _gn_affine_from_stats(
                    conv1_stats, b, f, hh * ww, g2, bt2, self.groups, self.eps)
            else:
                s2, sh2 = _gn_affine(h, g2, bt2, self.groups, self.eps)
            h = fused_conv3x3_t(
                h.reshape(b * f, hh, ww, self.features).astype(dt),
                wk2.astype(dt), wb2,
                jnp.repeat(s2, f, axis=0), jnp.repeat(sh2, f, axis=0), None)
            h = h.reshape(b, f, hh, ww, self.features)
        else:
            h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, dtype=self.dtype, name="norm2")(h)
            h = nn.silu(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = PseudoConv3d(self.features, dtype=self.dtype, name="conv2")(h)
            h = checkpoint_name(h, "resnet_conv")

        use_short = (
            in_features != self.features if self.use_in_shortcut is None else self.use_in_shortcut
        )
        if use_short:
            x = PseudoConv3d(
                self.features, kernel=(1, 1), padding=((0, 0), (0, 0)),
                dtype=self.dtype, name="conv_shortcut",
            )(x)
        return x + h
