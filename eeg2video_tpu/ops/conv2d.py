"""Fused 3x3 conv for the UNet's level-0 resnet blocks — a transposed
implicit-GEMM Pallas kernel with the GroupNorm-apply + SiLU prologue inside.

Why (device-trace evidence, BENCH_NOTES.md round 2): XLA's conv mega-fusions
(GN-apply + SiLU + 3x3 conv + bias/temb + next-GN stats in one fusion) run the
level-0 Cout=320 convolutions at 106-110 TF/s.  The bound is the MXU lane
quantization of the standard GEMM orientation, (HW, 9*Cin) x (9*Cin, Cout):
the N axis quantizes to 128-lane tiles, so Cout=320 pads to 384 and burns 20%
of the MXU cycles.  Computed TRANSPOSED — (Cout, 9*Cin) x (9*Cin, HW) — Cout
rides the 8-row M axis (320 is a multiple of 8: zero waste) and HW=2304 sits
exactly on the lane axis (18*128).  This is the same quantization trick as the
flash kernel's PV-transposed GEMM (ops.attention).

The kernel only dispatches at shapes where the transposed orientation wins:
stride-1 3x3 SAME, HW % 128 == 0 (lane-exact pixels), Cout % 128 != 0 (the
standard orientation pads), Cout % 8 == 0.  Everything else (640/1280-channel
levels, strided downsamples, conv_in/out) stays on XLA's native conv path,
which already runs at 134-147 TF/s there.

Structure per grid cell (one image n, one tap-group j):
  j==0: zero a (H+2)(W+2) padded plane in VMEM, apply the prologue
        silu(x*scale + shift) (the folded GroupNorm affine), write interior.
  all j: build an im2col slab (HW, g*Cin) from g shifted plane views, one
        accumulated GEMM (Cout, g*Cin) x (g*Cin, HW)^T -> f32 (Cout, HW).
  j==last: + bias (+ temb), transpose to channels-minor, store bf16.

Backward: custom_vjp recomputes through the plain-XLA formulation (prologue +
lax.conv), so gradients — including scale/shift/temb — are exact without a
dedicated Pallas pass (same policy as the biased attention backward,
ops.attention).

Reference behavior implemented: InflatedConv3d (reference
EEG2Video_New/Generation/models/resnet.py:10-18) inside ResnetBlock3D's
GN->SiLU->conv chains (resnet.py:110-204).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_t_kernel(x_ref, scale_ref, shift_ref, w_ref, bt_ref, o_ref,
                      *rest, H, W, Cin, Cout, g, n_groups, prologue,
                      with_stats=False):
    """Grid (N, n_groups).  Refs:
    x (1, H, W, Cin) bf16 | scale/shift (1, 1, Cin) f32 | w (1, Cout,
    g*Cin) bf16, indexed by group | bt (1, 2?, Cout) f32 bias row (+ optional temb row,
    pre-summed host-side to one row) | out (1, H, W, Cout) bf16.
    Scratch: plane ((H+2)(W+2) rows, Cin) bf16, col (HW, g*Cin) bf16,
    acc (Cout, HW) f32.
    ``with_stats``: rest leads with a (1, 8, Cout) f32 stats output — rows
    0/1 get the per-image channel (sum, sum-of-squares) of the STORED bf16
    output, the partials the next GroupNorm needs (its separate stats
    reduce over this tensor then never runs; rows 2-7 are padding)."""
    if with_stats:
        stats_ref, *rest = rest
    (plane_ref, col_ref, acc_ref) = rest
    j = pl.program_id(1)
    Wp = W + 2

    @pl.when(j == 0)
    def _build_plane():
        plane_ref[...] = jnp.zeros_like(plane_ref)
        xa = x_ref[0].reshape(H * W, Cin)
        if prologue:
            xf = (xa.astype(jnp.float32) * scale_ref[0, 0][None, :]
                  + shift_ref[0, 0][None, :])
            xa = (xf * jax.nn.sigmoid(xf)).astype(plane_ref.dtype)  # SiLU
        else:
            xa = xa.astype(plane_ref.dtype)
        for y in range(H):
            base = (y + 1) * Wp + 1
            plane_ref[base:base + W, :] = xa[y * W:(y + 1) * W, :]

    # im2col slab for this tap group: column block ti holds the (dy, dx) tap,
    # whose source rows are a statically-shifted view of the padded plane.
    # Tap groups are contiguous; g in {3, 9} so groups tile the 9 taps.
    for ti in range(g):
        if n_groups > 1:
            # j is traced; build every group's taps under a static unroll
            for jj in range(n_groups):
                t = jj * g + ti
                dy, dx = t // 3, t % 3

                @pl.when(j == jj)
                def _copy(dy=dy, dx=dx, ti=ti):
                    for y in range(H):
                        src = (y + dy) * Wp + dx
                        col_ref[y * W:(y + 1) * W,
                                ti * Cin:(ti + 1) * Cin] = (
                            plane_ref[src:src + W, :])
        else:
            dy, dx = ti // 3, ti % 3
            for y in range(H):
                src = (y + dy) * Wp + dx
                col_ref[y * W:(y + 1) * W, ti * Cin:(ti + 1) * Cin] = (
                    plane_ref[src:src + W, :])

    @pl.when(j == 0)
    def _zero_acc():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        w_ref[0], col_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (Cout, HW)

    @pl.when(j == n_groups - 1)
    def _store():
        out_t = acc_ref[...] + bt_ref[0, 0][:, None]
        ot = out_t.T.astype(o_ref.dtype)  # (HW, Cout) channels-minor
        o_ref[0] = ot.reshape(H, W, Cout)
        if with_stats:
            of = ot.astype(jnp.float32)  # stats of the STORED bf16 values
            stats_ref[0, 0, :] = jnp.sum(of, axis=0)
            stats_ref[0, 1, :] = jnp.sum(of * of, axis=0)


def eligible(h, w, cin, cout, dtype):
    """Shapes where the transposed orientation beats XLA's conv (see module
    docstring): lane-exact pixel count, lane-padded Cout, bf16 compute, and
    a by-dy im2col slab that fits the VMEM budget."""
    # the by-dy slab bound (9MB) also excludes Cin=960, which measured ~6%
    # SLOWER than XLA's fusion (the 3x-rebuilt im2col slab outweighs the pad
    # win there; conv microbench, BENCH_NOTES round 2)
    return (dtype == jnp.bfloat16 and (h * w) % 128 == 0 and cout % 128 != 0
            and cout % 8 == 0 and cin % 8 == 0 and h >= 3 and w >= 3
            and (h * w) * 3 * cin * 2 <= 9 * 1024 * 1024)


def _tap_groups(hw, cin):
    """Whole-K when the im2col slab fits ~27MB of VMEM (one K=9*Cin GEMM per
    cell; Cin=640 measured 91 vs 80 TF/s grouped), else by-dy groups."""
    if hw * 9 * cin * 2 <= 27 * 1024 * 1024:
        return 9, 1
    return 3, 3


def _conv3x3_t_ref(x, w, b, scale, shift, temb):
    """Plain-XLA formulation (backward recompute + interpret fallback)."""
    xf = x.astype(jnp.float32)
    if scale is not None:
        xf = xf * scale[:, None, None, :] + shift[:, None, None, :]
        xf = xf * jax.nn.sigmoid(xf)
    # dtype-uniform conv (XLA's TPU conv accumulates f32 internally either
    # way; a preferred_element_type=f32 here breaks the conv transpose rule
    # with mixed bf16/f32 operands in the custom_vjp backward)
    out = jax.lax.conv_general_dilated(
        xf.astype(x.dtype), w.astype(x.dtype), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = out.astype(jnp.float32) + b.astype(jnp.float32)[None, None, None, :]
    if temb is not None:
        out = out + temb.astype(jnp.float32)[:, None, None, :]
    return out.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "with_stats"))
def _conv3x3_t_fwd(x, w, b, scale, shift, temb, interpret=False,
                   with_stats=False):
    N, H, W, Cin = x.shape
    Cout = w.shape[-1]
    prologue = scale is not None
    g, n_groups = _tap_groups(H * W, Cin)

    # weight flattened tap-major to match the im2col column order; 3-D
    # (n_groups, Cout, g*Cin) so the per-group block equals the trailing
    # dims exactly (g*Cin need not be 128-divisible, e.g. 3*960=2880)
    w_flat = (w.transpose(3, 0, 1, 2).reshape(Cout, n_groups, g * Cin)
              .transpose(1, 0, 2))
    # bias (+ temb) folded into one f32 row per image
    bt = jnp.broadcast_to(b.astype(jnp.float32)[None, None, :], (N, 1, Cout))
    if temb is not None:
        bt = bt + temb.astype(jnp.float32)[:, None, :]
    if not prologue:
        scale = jnp.zeros((N, Cin), jnp.float32)
        shift = jnp.zeros((N, Cin), jnp.float32)
    scale3 = scale[:, None, :]
    shift3 = shift[:, None, :]

    kern = functools.partial(
        _conv3x3_t_kernel, H=H, W=W, Cin=Cin, Cout=Cout, g=g,
        n_groups=n_groups, prologue=prologue, with_stats=with_stats)
    rows = (H + 2) * (W + 2)
    rows += (-rows) % 8
    out_shape = [jax.ShapeDtypeStruct((N, H, W, Cout), x.dtype)]
    out_specs = [pl.BlockSpec((1, H, W, Cout), lambda n, j: (n, 0, 0, 0))]
    if with_stats:
        out_shape.append(jax.ShapeDtypeStruct((N, 8, Cout), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 8, Cout), lambda n, j: (n, 0, 0)))
    res = pl.pallas_call(
        kern,
        out_shape=tuple(out_shape),
        grid=(N, n_groups),
        in_specs=[
            pl.BlockSpec((1, H, W, Cin), lambda n, j: (n, 0, 0, 0)),
            pl.BlockSpec((1, 1, Cin), lambda n, j: (n, 0, 0)),
            pl.BlockSpec((1, 1, Cin), lambda n, j: (n, 0, 0)),
            pl.BlockSpec((1, Cout, g * Cin), lambda n, j: (j, 0, 0)),
            pl.BlockSpec((1, 1, Cout), lambda n, j: (n, 0, 0)),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((rows, Cin), x.dtype),
            pltpu.VMEM((H * W, g * Cin), x.dtype),
            pltpu.VMEM((Cout, H * W), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=80 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, scale3, shift3, w_flat, bt)
    if with_stats:
        return res[0], res[1][:, :2]
    return res[0]


def _dispatch(x, w, b, scale, shift, temb):
    if jax.default_backend() != "tpu":
        # interpret-mode im2col of these sizes is minutes-slow; the ref
        # formulation is the same math
        return _conv3x3_t_ref(x, w, b, scale, shift, temb)
    return _conv3x3_t_fwd(x, w, b, scale, shift, temb)


def fused_conv3x3_t_stats(x, w, b, scale, shift, temb):
    """fused_conv3x3_t + per-image channel (sum, sum²) of the output as a
    second (N, 2, Cout) f32 result — the partials the FOLLOWING GroupNorm
    needs (resnet conv1 -> norm2 chains), so its stats reduce over the conv
    output never runs as a separate HBM pass.  Inference-only: no vjp (the
    training forward stays all-XLA by measurement, BENCH_NOTES round 2)."""
    if jax.default_backend() != "tpu":
        out = _conv3x3_t_ref(x, w, b, scale, shift, temb)
        of = out.astype(jnp.float32)
        stats = jnp.stack([jnp.sum(of, axis=(1, 2)),
                           jnp.sum(of * of, axis=(1, 2))], axis=1)
        return out, stats
    return _conv3x3_t_fwd(x, w, b, scale, shift, temb, with_stats=True)


@jax.custom_vjp
def fused_conv3x3_t(x, w, b, scale, shift, temb):
    """Transposed implicit-GEMM 3x3 SAME conv with optional fused
    silu(x*scale+shift) prologue and per-image temb epilogue.

    x (N, H, W, Cin) bf16; w (3, 3, Cin, Cout); b (Cout,);
    scale/shift: None or (N, Cin) f32; temb: None or (N, Cout).
    Use ``eligible()`` to decide dispatch — other shapes belong on XLA."""
    return _dispatch(x, w, b, scale, shift, temb)


def _fused_conv_fwd(x, w, b, scale, shift, temb):
    return _dispatch(x, w, b, scale, shift, temb), (x, w, b, scale, shift, temb)


def _fused_conv_bwd(res, g):
    x, w, b, scale, shift, temb = res
    has_pro = scale is not None
    has_temb = temb is not None

    def ref(x, w, b, scale, shift, temb):
        return _conv3x3_t_ref(x, w, b,
                              scale if has_pro else None,
                              shift if has_pro else None,
                              temb if has_temb else None)

    zeros = lambda t: t if t is not None else jnp.zeros((), jnp.float32)
    _, vjp = jax.vjp(ref, x, w, b, zeros(scale), zeros(shift), zeros(temb))
    dx, dw, db, dscale, dshift, dtemb = vjp(g)
    return (dx, dw, db,
            dscale if has_pro else None, dshift if has_pro else None,
            dtemb if has_temb else None)


fused_conv3x3_t.defvjp(_fused_conv_fwd, _fused_conv_bwd)
