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
    kernel_size: tuple = (3, 3)

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           self.kernel_size + (self.in_features, self.features)),
                self.param("bias", nn.initializers.zeros_init(),
                           (self.features,)))


class _PseudoConvParams(nn.Module):
    """Param holder matching PseudoConv3d's tree (conv/{kernel, bias})."""

    in_features: int
    features: int
    kernel_size: tuple = (3, 3)

    @nn.compact
    def __call__(self):
        return _ConvParams(self.in_features, self.features,
                           kernel_size=self.kernel_size, name="conv")()


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


def _gn_affine_pair(x, skip, gamma, beta, groups, eps):
    """GroupNorm affine of the logical concat([x, skip], channels) WITHOUT
    materializing it: per-channel (sum, sum²) partials from each half are
    concatenated at (B, C) size (tiny) and pooled into group stats.  Returns
    the per-(image, channel) (scale, shift) split back per half."""
    b, f, hh, ww, cx = x.shape
    cs = skip.shape[-1]
    c = cx + cs

    def chan_sums(t):
        tf32 = t.astype(jnp.float32)
        return (jnp.sum(tf32, axis=(1, 2, 3)),
                jnp.sum(jnp.square(tf32), axis=(1, 2, 3)))  # (B, C_half)

    sx, sx2 = chan_sums(x)
    ss, ss2 = chan_sums(skip)
    s1 = jnp.concatenate([sx, ss], axis=-1).reshape(b, groups, c // groups)
    s2 = jnp.concatenate([sx2, ss2], axis=-1).reshape(b, groups, c // groups)
    cnt = f * hh * ww * (c // groups)
    mean = jnp.sum(s1, axis=-1) / cnt  # (B, G)
    var = jnp.sum(s2, axis=-1) / cnt - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    gpc = c // groups
    scale = (gamma.astype(jnp.float32).reshape(groups, gpc)[None]
             * rstd[:, :, None])
    shift = (beta.astype(jnp.float32).reshape(groups, gpc)[None]
             - mean[:, :, None] * scale)
    scale = scale.reshape(b, c)
    shift = shift.reshape(b, c)
    return (scale[:, :cx], shift[:, :cx]), (scale[:, cx:], shift[:, cx:])


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
    def __call__(self, x, temb=None, *, skip=None, train: bool = False):
        cx = x.shape[-1]
        in_features = cx + (skip.shape[-1] if skip is not None else 0)
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
        use2 = not train and _conv_eligible(hh, ww, self.features,
                                            self.features, self.dtype)
        dt = self.dtype or x.dtype
        conv1_stats = None

        if skip is not None:
            # ``skip`` is the up-block's lateral state, logically
            # concat([x, skip], channels) (reference unet_blocks.py:442-444,
            # 556-558).  Convs are linear in input channels and GN statistics
            # pool per group, so the concat never needs to exist: norm1's
            # affine comes from per-half (sum, sum²) partials and conv1 /
            # conv_shortcut run as per-half convs summed.  The training
            # graph otherwise materializes the (B,F,H,W,C_total) concat
            # TWICE (different layouts for conv1 vs conv_shortcut) at
            # ~0.86 ms each (device trace, BENCH_NOTES round 3).
            g1, bt1 = _GNParams(in_features, name="norm1")()
            wk1, wb1 = _PseudoConvParams(in_features, self.features,
                                         name="conv1")()
            (s1x, sh1x), (s1s, sh1s) = _gn_affine_pair(
                x, skip, g1, bt1, self.groups, self.eps)
            t = None
            if temb is not None:
                t = nn.Dense(self.features, dtype=self.dtype,
                             name="time_emb_proj")(nn.silu(temb))
            use1 = (not train
                    and _conv_eligible(hh, ww, cx, self.features, self.dtype)
                    and _conv_eligible(hh, ww, in_features - cx,
                                       self.features, self.dtype))
            if use1:
                temb_row = (jnp.repeat(t.astype(jnp.float32), f, axis=0)
                            if t is not None else None)
                ha = fused_conv3x3_t(
                    x.reshape(b * f, hh, ww, cx).astype(dt),
                    wk1[:, :, :cx].astype(dt), wb1,
                    jnp.repeat(s1x, f, axis=0), jnp.repeat(sh1x, f, axis=0),
                    temb_row)
                hb = fused_conv3x3_t(
                    skip.reshape(b * f, hh, ww, in_features - cx).astype(dt),
                    wk1[:, :, cx:].astype(dt), jnp.zeros_like(wb1),
                    jnp.repeat(s1s, f, axis=0), jnp.repeat(sh1s, f, axis=0),
                    None)
                h = (ha + hb).reshape(b, f, hh, ww, self.features)
            else:
                def _half(tens, sc, sh, w_half):
                    tf = (tens.astype(jnp.float32) * sc[:, None, None, None, :]
                          + sh[:, None, None, None, :])
                    tf = nn.silu(tf).astype(dt)
                    folded = tf.reshape(b * f, hh, ww, tens.shape[-1])
                    return jax.lax.conv_general_dilated(
                        folded, w_half.astype(dt), (1, 1), ((1, 1), (1, 1)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                h = (_half(x, s1x, sh1x, wk1[:, :, :cx])
                     + _half(skip, s1s, sh1s, wk1[:, :, cx:]))
                h = (h.astype(jnp.float32)
                     + wb1.astype(jnp.float32)[None, None, None, :])
                h = h.astype(dt).reshape(b, f, hh, ww, self.features)
                if t is not None:
                    h = h + t[:, None, None, None, :].astype(h.dtype)
                h = checkpoint_name(h, "resnet_conv")
        elif (use1 := not train and _conv_eligible(hh, ww, in_features,
                                                   self.features, self.dtype)):
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
        if skip is not None:
            # per-half 1x1 shortcut on the un-concatenated operands (always
            # present: the concat input width never equals the output width)
            wks, wbs = _PseudoConvParams(in_features, self.features,
                                         kernel_size=(1, 1),
                                         name="conv_shortcut")()
            x = (jnp.tensordot(x.astype(dt), wks[0, 0, :cx].astype(dt),
                               axes=[[4], [0]])
                 + jnp.tensordot(skip.astype(dt), wks[0, 0, cx:].astype(dt),
                                 axes=[[4], [0]])
                 + wbs.astype(dt))
        elif use_short:
            x = PseudoConv3d(
                self.features, kernel=(1, 1), padding=((0, 0), (0, 0)),
                dtype=self.dtype, name="conv_shortcut",
            )(x)
        return x + h
