"""Fused GEGLU gate -> output-projection GEMM (one Pallas kernel).

The video UNet's FeedForward (diffusers geglu, reference
EEG2Video_New/Generation/models/attention.py:186-191 FeedForward/GEGLU) ends
in ``(h * gelu(gate)) @ W_out + b``.  Left to XLA this costs either

- the gate fused as the out-GEMM's per-tile operand prologue — the GEMM then
  runs at ~38 TF/s instead of ~148 (the elementwise erf stalls the MXU;
  device trace, BENCH_NOTES.md round 2), or
- a materialization barrier — a full HBM round-trip of the (T, inner)
  gated tensor (~140 MB per level-0 call at the generation shape).

Here the whole (T, 2*inner) projection output is ONE kernel operand (the
round-1 attempt passed the two ``jnp.split`` halves separately, which
manifested as real sliced copies in the graph, +2.6 ms of layout work);
the gate runs on the VPU over a VMEM-resident row block and the MXU GEMM
consumes it without touching HBM.

Backward (training) recomputes through the XLA formulation — exact grads,
and the frozen-FF fine-tune path (train_finetune_videodiffusion.py:142-146)
prunes the weight grads anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _geglu_ref(h2, w, b):
    """XLA reference: h2 (..., 2I) x w (I, C) + b (C,) -> (..., C)."""
    inner = w.shape[0]
    h, gate = h2[..., :inner], h2[..., inner:]
    gated = (h * jax.nn.gelu(gate, approximate=False)).astype(w.dtype)
    return jnp.dot(gated, w, preferred_element_type=jnp.float32).astype(
        h2.dtype) + b.astype(h2.dtype)


def _erf(x):
    """f32 erf for the Mosaic kernel (no erf/erfc primitive in Pallas TPU):
    Numerical Recipes 6.2 erfc rational-exp approximation, max fractional
    error 1.2e-7 — far below bf16 resolution (eps 7.8e-3)."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.5 * a)
    y = t * jnp.exp(
        -a * a - 1.26551223 + t * (1.00002368 + t * (0.37409196 + t * (
            0.09678418 + t * (-0.18628806 + t * (0.27886807 + t * (
                -1.13520398 + t * (1.48851587 + t * (
                    -0.82215223 + t * 0.17087277)))))))))
    return jnp.where(x >= 0, 1.0 - y, y - 1.0)


def _geglu_kernel(h2_ref, w_ref, b_ref, o_ref, *, inner):
    h2 = h2_ref[...]
    hv = h2[:, :inner].astype(jnp.float32)
    gv = h2[:, inner:].astype(jnp.float32)
    # exact (erf) gelu — matches jax.nn.gelu(approximate=False) to ~1e-7
    gated = (hv * (0.5 * gv * (1.0 + _erf(gv * np.float32(2 ** -0.5))))
             ).astype(w_ref.dtype)
    out = jax.lax.dot(gated, w_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (out + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _row_block(T, inner):
    # VMEM budget: h2 block (bm, 2I) + gated f32 temp + out block, double
    # buffered, alongside the (I, C) weight tile — stay well under the 64MB
    # scoped limit even at the level-2 width (I=5120).
    cap = 1024 if inner <= 2560 else 256
    if T <= cap:
        return -(-T // 16) * 16
    # prefer a block that DIVIDES T: a remainder means a full HBM pad copy
    # of the (T, 2I) operand (~73MB at the level-1 generation shape, +1.3
    # ms/step measured).  Sublane granularity is 16 rows (bf16 tiles).
    for bm in range(cap - cap % 16, 127, -16):
        if T % bm == 0:
            return bm
    return cap


@functools.partial(jax.jit, static_argnames=("interpret",))
def _geglu_pallas(h2, w, b, interpret=False):
    T, two_i = h2.shape
    inner, C = w.shape
    bm = _row_block(T, inner)
    Tp = -(-T // bm) * bm
    if Tp != T:
        h2 = jnp.pad(h2, ((0, Tp - T), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_geglu_kernel, inner=inner),
        out_shape=jax.ShapeDtypeStruct((Tp, C), h2.dtype),
        grid=(Tp // bm,),
        in_specs=[
            pl.BlockSpec((bm, two_i), lambda i: (i, 0)),
            pl.BlockSpec((inner, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, C), lambda i: (i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(h2, w, b.reshape(1, C))
    return out[:T]


def _geglu_bwd_kernel(h2_ref, g_ref, w_ref, dh2_ref, *, inner):
    """dh2 of the gate->GEMM in one row-block pass: recompute the gate chain
    from the VMEM-resident h2 block, dgated = g @ w^T, gate backward —
    no HBM dgated/gated intermediates (177 MB each at the 1280-wide
    training level).  dw/db stay XLA ops outside (DCE'd when frozen)."""
    h2 = h2_ref[...]
    hv = h2[:, :inner].astype(jnp.float32)
    gv = h2[:, inner:].astype(jnp.float32)
    gelug, dgelu = _gelu_and_grad(gv)
    dgated = jax.lax.dot_general(
        g_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (bm, I)
    dh = dgated * gelug
    dgate = dgated * hv * dgelu
    dh2_ref[...] = jnp.concatenate([dh, dgate], axis=1).astype(dh2_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _geglu_bwd_pallas(h2, g, w, interpret=False):
    T, two_i = h2.shape
    inner, C = w.shape
    bm = min(256, _row_block(T, inner))
    Tp = -(-T // bm) * bm
    if Tp != T:
        h2 = jnp.pad(h2, ((0, Tp - T), (0, 0)))
        g = jnp.pad(g, ((0, Tp - T), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_geglu_bwd_kernel, inner=inner),
        out_shape=jax.ShapeDtypeStruct((Tp, two_i), h2.dtype),
        grid=(Tp // bm,),
        in_specs=[
            pl.BlockSpec((bm, two_i), lambda i: (i, 0)),
            pl.BlockSpec((bm, C), lambda i: (i, 0)),
            pl.BlockSpec((inner, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, two_i), lambda i: (i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(h2, g, w)
    return out[:T]


@jax.custom_vjp
def _geglu_fused(h2, w, b):
    interpret = jax.default_backend() != "tpu"
    return _geglu_pallas(h2, w, b, interpret=interpret)


def _geglu_fused_fwd(h2, w, b):
    # named saveable under the unet3d remat policy (remat_save_attn): skips
    # re-launching the forward kernel in the backward-side remat recompute
    out = checkpoint_name(_geglu_fused(h2, w, b), "ff_out")
    return out, (h2, w, b)


def _geglu_fused_bwd(res, g):
    h2, w, b = res
    interpret = jax.default_backend() != "tpu"
    dh2 = _geglu_bwd_pallas(h2, g, w, interpret=interpret)
    # dw/db as separate XLA ops: DCE'd on the frozen fine-tune path
    _, vjp = jax.vjp(lambda w_, b_: _geglu_ref(h2, w_, b_), w, b)
    dw, db = vjp(g)
    return dh2, dw, db


_geglu_fused.defvjp(_geglu_fused_fwd, _geglu_fused_bwd)


# =============================================================================
# Whole-FF fusion: LayerNorm -> proj GEMM -> geglu gate -> out GEMM -> +residual
#
# The FF sub-block of BasicTransformerBlock (attention.py:139-269 FeedForward
# + its pre-LN + residual) left to XLA costs, per level-0 call: the LN-stat
# reduce fusion, a 2560-wide h2 HBM round-trip (~283 MB), the gate chain, and
# the out GEMM with a fused erf prologue (38 TF/s).  Here one kernel reads the
# (T, C) tokens once, keeps everything through the second GEMM in VMEM, and
# writes the residual-added (T, C) output once.  Weights live whole in VMEM
# (<=10 MB at C=640); C=1280 levels stay on the plain geglu kernel above.
# =============================================================================


def _ff_ref(x, gamma, beta, wp, bp, wo, bo, eps):
    """XLA reference for the fused FF block (also the backward recompute)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    xn = xn * gamma + beta
    h2 = jnp.dot(xn, wp, preferred_element_type=jnp.float32).astype(x.dtype) + bp
    inner = wo.shape[0]
    h, gate = h2[..., :inner], h2[..., inner:]
    gated = (h * jax.nn.gelu(gate, approximate=False)).astype(wo.dtype)
    out = jnp.dot(gated, wo, preferred_element_type=jnp.float32).astype(x.dtype) + bo
    return x + out


def _ff_kernel(x_ref, g_ref, be_ref, wp_ref, bp_ref, wo_ref, bo_ref, o_ref, *,
               inner, eps):
    x = x_ref[...].astype(jnp.float32)  # (bm, C)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    xn = (xn * g_ref[...].astype(jnp.float32)
          + be_ref[...].astype(jnp.float32)).astype(wp_ref.dtype)
    h2 = jax.lax.dot(xn, wp_ref[...], preferred_element_type=jnp.float32)
    h2 = h2 + bp_ref[...].astype(jnp.float32)
    hv = h2[:, :inner]
    gv = h2[:, inner:]
    gated = (hv * (0.5 * gv * (1.0 + _erf(gv * np.float32(2 ** -0.5))))
             ).astype(wo_ref.dtype)
    out = jax.lax.dot(gated, wo_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (x + out + bo_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _ff_row_block(T):
    if T <= 768:
        return -(-T // 16) * 16
    for bm in range(768, 127, -16):
        if T % bm == 0:
            return bm
    return 768


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _ff_pallas(x, gamma, beta, wp, bp, wo, bo, eps, interpret=False):
    T, C = x.shape
    inner = wo.shape[0]
    bm = _ff_row_block(T)
    Tp = -(-T // bm) * bm
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ff_kernel, inner=inner, eps=eps),
        out_shape=jax.ShapeDtypeStruct((Tp, C), x.dtype),
        grid=(Tp // bm,),
        in_specs=[
            pl.BlockSpec((bm, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((C, 2 * inner), lambda i: (0, 0)),
            pl.BlockSpec((1, 2 * inner), lambda i: (0, 0)),
            pl.BlockSpec((inner, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, C), lambda i: (i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, gamma.reshape(1, C), beta.reshape(1, C), wp, bp.reshape(1, 2 * inner),
      wo, bo.reshape(1, C))
    return out[:T]


def _gelu_and_grad(z):
    """(gelu(z), gelu'(z)) in f32: Phi(z) + z*phi(z)."""
    Phi = 0.5 * (1.0 + _erf(z * np.float32(2 ** -0.5)))
    phi = jnp.exp(-0.5 * z * z) * np.float32(1.0 / np.sqrt(2.0 * np.pi))
    return z * Phi, Phi + z * phi


def _ff_bwd_kernel(x_ref, g_ref, gam_ref, bet_ref, wp_ref, bp_ref, wo_ref,
                   dx_ref, *, inner, eps):
    """dx of the whole-FF block in ONE row-block pass (round 3): recompute
    LN/proj/gate in VMEM, then dgated = g@wo^T, gate backward, dh2@wp^T and
    the LayerNorm backward — the (T, 2I) h2 tensor (~700 MB at the level-0
    training shape) never exists in HBM in the backward either.  Parameter
    grads are NOT computed here: the caller emits them as separate XLA ops
    so the frozen fine-tune (stop_gradient on FF params,
    train_finetune_videodiffusion.py:142-146) dead-code-eliminates them."""
    x = x_ref[...].astype(jnp.float32)  # (bm, C)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    gam = gam_ref[...].astype(jnp.float32)
    xn = (xhat * gam + bet_ref[...].astype(jnp.float32)).astype(wp_ref.dtype)
    h2 = jax.lax.dot(xn, wp_ref[...], preferred_element_type=jnp.float32)
    h2 = h2 + bp_ref[...].astype(jnp.float32)
    hv = h2[:, :inner]
    gv = h2[:, inner:]
    gelug, dgelu = _gelu_and_grad(gv)

    g = g_ref[...]  # (bm, C) cotangent of (x + FF(LN(x)))
    # dgated = g @ wo^T: contract the C axis of both operands
    dgated = jax.lax.dot_general(
        g, wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (bm, I)
    dh = dgated * gelug
    dgate = dgated * hv * dgelu
    dh2 = jnp.concatenate([dh, dgate], axis=1).astype(wp_ref.dtype)
    # d(xn*gamma+beta) = dh2 @ wp^T
    dxa = jax.lax.dot_general(
        dh2, wp_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (bm, C)
    dxn = dxa * gam
    # LayerNorm backward (no-affine part)
    m1 = jnp.mean(dxn, axis=1, keepdims=True)
    m2 = jnp.mean(dxn * xhat, axis=1, keepdims=True)
    dx = rstd * (dxn - m1 - xhat * m2)
    dx_ref[...] = (g.astype(jnp.float32) + dx).astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _ff_bwd_pallas(x, g, gamma, beta, wp, bp, wo, eps, interpret=False):
    T, C = x.shape
    inner = wo.shape[0]
    bm = _ff_row_block(T)
    Tp = -(-T // bm) * bm
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
        g = jnp.pad(g, ((0, Tp - T), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ff_bwd_kernel, inner=inner, eps=eps),
        out_shape=jax.ShapeDtypeStruct((Tp, C), x.dtype),
        grid=(Tp // bm,),
        in_specs=[
            pl.BlockSpec((bm, C), lambda i: (i, 0)),
            pl.BlockSpec((bm, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((C, 2 * inner), lambda i: (0, 0)),
            pl.BlockSpec((1, 2 * inner), lambda i: (0, 0)),
            pl.BlockSpec((inner, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, C), lambda i: (i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, g, gamma.reshape(1, C), beta.reshape(1, C), wp,
      bp.reshape(1, 2 * inner), wo)
    return out[:T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _ff_fused(x, gamma, beta, wp, bp, wo, bo, eps):
    interpret = jax.default_backend() != "tpu"
    return _ff_pallas(x, gamma, beta, wp, bp, wo, bo, eps, interpret=interpret)


def _ff_fused_fwd(x, gamma, beta, wp, bp, wo, bo, eps):
    # named saveable under the unet3d remat policy (remat_save_attn)
    out = checkpoint_name(_ff_fused(x, gamma, beta, wp, bp, wo, bo, eps),
                          "ff_out")
    return out, (x, gamma, beta, wp, bp, wo, bo)


def _ff_fused_bwd(eps, res, g):
    x, gamma, beta, wp, bp, wo, bo = res
    interpret = jax.default_backend() != "tpu"
    # dx through the Pallas kernel; parameter grads as separate XLA ops so
    # the frozen path DCEs them (and dbo is just the row-sum of g)
    dx = _ff_bwd_pallas(x, g, gamma, beta, wp, bp, wo, eps,
                        interpret=interpret)
    _, vjp = jax.vjp(
        lambda gam, be, wp_, bp_, wo_, bo_: _ff_ref(x, gam, be, wp_, bp_,
                                                    wo_, bo_, eps),
        gamma, beta, wp, bp, wo, bo)
    dgamma, dbeta, dwp, dbp, dwo, dbo = vjp(g)
    return dx, dgamma, dbeta, dwp, dbp, dwo, dbo


_ff_fused.defvjp(_ff_fused_fwd, _ff_fused_bwd)


def fused_ff_ln(x, gamma, beta, wp, bp, wo, bo, eps=1e-5):
    """Pre-LN GEGLU FeedForward with residual: ``x + FF(LN(x))`` as one
    Pallas kernel.  x (..., C) channels-minor; gamma/beta (C,) LN affine;
    wp (C, 2*I), bp (2*I,); wo (I, C), bo (C,).  Wide or off-grid shapes
    (C > 640 keeps the weights out of VMEM; tiny test models) fall back to
    XLA / the plain geglu kernel.

    All operands must share ONE dtype (the model promotes via
    nn.dtypes.promote_dtype, attention3d.py): mixed f32/bf16 operands make
    the backward's recompute emit a different output dtype than the forward
    kernel, and the vjp rejects the cotangent."""
    C = x.shape[-1]
    inner = wo.shape[0]
    lead = x.shape[:-1]
    T = 1
    for d in lead:
        T *= d
    # C needs only sublane (8) alignment — Mosaic pads the lane dim of the
    # (bm, C) blocks internally, so the UNet's C=320 level (the token-heaviest)
    # runs in-kernel; inner stays 128-aligned for the h2 half-slices.
    if C % 8 or inner % 128 or T < 256 or C > 640:
        if C % 8 == 0 and inner % 128 == 0 and T >= 256:
            # levels whose weights exceed the VMEM budget: LN via XLA, the
            # gate+out GEMM through the plain geglu kernel
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            xc = xf - mu
            var = jnp.mean(xc * xc, axis=-1, keepdims=True)
            xn = (xc * jax.lax.rsqrt(var + eps)).astype(x.dtype) * gamma + beta
            h2 = jnp.dot(xn, wp,
                         preferred_element_type=jnp.float32).astype(x.dtype) + bp
            return x + fused_geglu_out(h2, wo, bo)
        return _ff_ref(x, gamma, beta, wp, bp, wo, bo, eps)
    out = _ff_fused(x.reshape(T, C), gamma, beta, wp, bp, wo, bo, eps)
    return out.reshape(*lead, C)


def fused_geglu_out(h2, w, b):
    """``(h * gelu(gate)) @ w + b`` with the gate fused into the GEMM's VMEM
    pipeline.  h2 (..., 2*I) channels-minor (I = w.shape[0]), w (I, C),
    b (C,).  Shapes off the 128-lane grid (tiny test models) fall back to
    the XLA formulation."""
    inner, C = w.shape
    lead = h2.shape[:-1]
    T = 1
    for d in lead:
        T *= d
    if inner % 128 or C % 128 or T < 256:
        return _geglu_ref(h2, w, b)
    out = _geglu_fused(h2.reshape(T, 2 * inner), w, b)
    return out.reshape(*lead, C)
