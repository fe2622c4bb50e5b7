"""Fused multi-head attention for TPU — the replacement for the reference's
xformers memory-efficient attention (reference EEG2Video_New/Generation/models/
attention.py:204-230,313-316) and attention slicing (unet.py:209-272).

One kernel serves all three attention layouts of the video UNet
(SURVEY.md 2.4): sparse-causal self-attention (K/V pre-gathered per frame),
text/EEG cross-attention, and temporal attention.  Layout plumbing lives in
models.attention3d; this module only sees (B, H, L, D) tensors.

Design (shapes in this domain: Lq <= 2304, Lkv <= 4608, D in {40, 80, 160}):

- Pallas flash-attention forward with online softmax, grid
  (batch*heads, q_blocks, kv_blocks), f32 statistics/accumulator in VMEM —
  the (L, L) probability matrix never touches HBM.  At 288x512 generation
  XLA would materialize ~2 GB of probabilities per UNet level-0 call.
- head_dim padded to a 128 lane multiple, sequence lengths padded to block
  multiples with explicit masking of out-of-range KV columns.
- Short sequences (cross-attn Lkv=77, temporal L=6) go through the XLA path:
  at those sizes the fusion win is zero and the XLA kernel is optimal.
- Training: full Pallas flash backward (custom_vjp) recomputing
  probabilities from the saved log-sum-exp residual, so the (Lq, Lkv)
  probability matrix never hits HBM in either direction.  At the
  reference's training batch (10 clips x 6 frames,
  train_finetune_videodiffusion.py:77) an XLA-recompute backward would need
  ~10 GB of transient probabilities at level-0 shapes and OOM one v5e.
  The packed path keeps the backward channels-minor too: whole-KV cells,
  base-2 probability recompute against the prescaled lse, transposed dk/dv
  GEMMs — no D 40->128 HBM pads, no L<->H transposes (the round-1
  (B,H,L,D) backward ran 46 ms/call at level-0 training shapes).  Round 3
  COMBINED the dq and dk/dv passes into one kernel (_packed_dqkv_kernel):
  the score/dp recompute is shared, dq accumulates in per-head f32 VMEM
  scratch across KV blocks (33.2 -> 20.8 ms/call at level 0); the split
  passes remain for the biased variant (with the dbias output) and as the
  VMEM-overflow fallback.
- Sparse-causal attention runs DUAL-KV end to end (fused_attention_dual):
  frame-0 K/V enter once per batch element via BlockSpec indexing instead
  of a (b*(f-2), 2l, H*D) HBM concat; the backward is two combined-kernel
  calls — previous-frame half block-diagonal, frame-0 half with the m
  frames folded into the query axis so dk0/dv0 accumulate in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
_FLASH_MIN_LQ = 256  # below this the XLA path wins
_LOG2E = float(np.log2(np.e))  # packed kernels run softmax in base 2: the
_LN2 = float(np.log(2.0))      # VPU computes 2^x natively; e^x costs an
#                                extra multiply per score element


def mha_reference(q, k, v, scale=None, bias=None):
    """Plain XLA attention, (B, H, Lq, D) x (B, H, Lkv, D) -> (B, H, Lq, D).

    ``bias``: optional (B, 1, Lkv) additive attention bias (broadcast over
    heads and query rows — the reference's attention_mask contract)."""
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)[:, :, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref, *,
                  scale, kv_len, block_k, n_kv):
    """One (bh, iq, ik) grid cell: online-softmax update over a KV block."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # scale folded into Q (saves one full VPU pass over the scores matrix)
    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)  # (block_q, D)
    k = k_ref[0]  # (block_k, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_k)

    # mask KV columns past the true length (padding)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * block_k
    s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)

    m_prev = m_ref[...]  # (block_q, 128) broadcast lanes
    l_prev = l_ref[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # (block_q, 1)
    m_next = jnp.maximum(m_prev, m_curr)  # (block_q, 128)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_ref[...] = m_next
    l_ref[...] = l_next

    v = v_ref[0]  # (block_k, D)
    pv = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv

    @pl.when(ik == n_kv - 1)
    def _store():
        o_ref[0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)
        # log-sum-exp residual for the Pallas backward (lane-replicated)
        lse_ref[0] = m_ref[...] + jnp.log(l_ref[...])


def _flash_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                     acc_ref, *, scale, kv_len, block_k, n_kv):
    """dq: grid (bh, iq, ik); probabilities recomputed from the lse residual
    (standard flash backward), dq accumulated over KV blocks in f32."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * block_k
    s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)
    p = jnp.exp(s - lse_ref[0][:, :1])  # (bq, bk)
    do = do_ref[0]
    dp = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0][:, :1]) * scale  # (bq, bk) f32
    acc_ref[...] += jax.lax.dot(ds.astype(k.dtype), k,
                                preferred_element_type=jnp.float32)

    @pl.when(ik == n_kv - 1)
    def _store():
        dq_ref[0] = acc_ref[...].astype(dq_ref.dtype)


def _flash_dkv_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                      dk_ref, dv_ref, *, scale, kv_len, block_q, block_k, n_q):
    """dk/dv for one (bh, ik) cell: loop q blocks, accumulate in f32."""
    ik = pl.program_id(1)
    k = k_ref[0]
    v = v_ref[0]
    dk = jnp.zeros(k.shape, jnp.float32)
    dv = jnp.zeros(v.shape, jnp.float32)

    def body(i, carry):
        dk, dv = carry
        sl = pl.ds(i * block_q, block_q)
        q = (q_ref[0, sl, :].astype(jnp.float32) * scale).astype(k.dtype)
        do = do_ref[0, sl, :]
        lse = lse_ref[0, sl, :]
        delta = delta_ref[0, sl, :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * block_k
        s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)
        p = jnp.exp(s - lse[:, :1]).astype(do.dtype)  # (bq, bk)
        dv = dv + jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # q above is pre-scaled, so ds^T @ q_scaled already carries the
        # softmax scale — no extra factor here
        ds = (p.astype(jnp.float32) * (dp - delta[:, :1])).astype(q.dtype)
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    dk, dv = jax.lax.fori_loop(0, n_q, body, (dk, dv))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads)


def _round_up(x, m):
    return -(-x // m) * m


def _blocks(Lq, Lkv):
    """Adaptive tiling (tuned on v5e): take the WHOLE (padded) KV per grid
    cell when it fits — the online-softmax loop then runs once, which
    measured fastest (6.4ms vs 7.3ms at the level-0 shape) — and size the
    q block so the f32 scores tile stays within ~8MB of VMEM.

    Note: the default scoped-VMEM limit here is 16MB;
    CompilerParams(vmem_limit_bytes=...) can raise it (verified to 96MB on
    v5e), but bigger tiles measured no faster — the kernel is compute-bound
    at these shapes, so the default tiles stay."""
    block_k = min(4608, _round_up(Lkv, 128))
    budget = (8 * 1024 * 1024) // (4 * block_k)  # rows of f32 scores
    block_q = min(768, _round_up(Lq, 128), max(128, (budget // 128) * 128))
    return block_q, block_k


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret", "return_lse"))
def _flash_fwd(q, k, v, scale, block_q=None, block_k=None, interpret=False,
               return_lse=False):
    B, H, Lq, D = q.shape
    Lkv = k.shape[2]
    bq_auto, bk_auto = _blocks(Lq, Lkv)
    block_q = block_q or bq_auto
    block_k = block_k or bk_auto
    qp = _pad_to(_pad_to(q, 3, 128), 2, block_q)
    kp = _pad_to(_pad_to(k, 3, 128), 2, block_k)
    vp = _pad_to(_pad_to(v, 3, 128), 2, block_k)
    Dp = qp.shape[3]
    bh = B * H
    qp = qp.reshape(bh, -1, Dp)
    kp = kp.reshape(bh, -1, Dp)
    vp = vp.reshape(bh, -1, Dp)
    Lqp = qp.shape[1]
    n_q = Lqp // block_q
    n_kv = kp.shape[1] // block_k

    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=Lkv, block_k=block_k, n_kv=n_kv),
        out_shape=(
            jax.ShapeDtypeStruct(qp.shape, q.dtype),
            jax.ShapeDtypeStruct((bh, Lqp, 128), jnp.float32),
        ),
        grid=(bh, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max (lane-tiled)
            pltpu.VMEM((block_q, 128), jnp.float32),  # running sum
            pltpu.VMEM((block_q, Dp), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp)

    out = out.reshape(B, H, -1, Dp)[:, :, :Lq, :D]
    if return_lse:
        return out, lse  # lse stays padded/lane-replicated (bh, Lqp, 128)
    return out


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _flash_bwd(q, k, v, do, lse, delta, scale, interpret=False):
    """Pallas flash backward: dq pass (grid bh x q-blocks, whole KV in VMEM)
    + dk/dv pass (grid bh, fori over q blocks, f32 accumulators).  The
    (Lq, Lkv) probability matrix is never materialized in HBM — the XLA
    fallback would need ~10GB of transient probabilities at the reference's
    training batch (10 clips, 6 frames, level-0 shapes)."""
    B, H, Lq, D = q.shape
    Lkv = k.shape[2]
    # backward tiles are tighter than forward: two (bq, bk) f32 buffers (p
    # and dp) must fit the 16MB scoped-VMEM limit alongside accumulators
    block_q = min(256, _round_up(Lq, 128))
    block_k = min(1536, _round_up(Lkv, 128))
    qp = _pad_to(_pad_to(q, 3, 128), 2, block_q)
    kp = _pad_to(_pad_to(k, 3, 128), 2, block_k)
    vp = _pad_to(_pad_to(v, 3, 128), 2, block_k)
    dop = _pad_to(_pad_to(do, 3, 128), 2, block_q)
    Dp = qp.shape[3]
    bh = B * H
    qp, kp, vp, dop = (t.reshape(bh, -1, Dp) for t in (qp, kp, vp, dop))
    Lqp, Lkvp = qp.shape[1], kp.shape[1]
    n_q = Lqp // block_q
    n_kv = Lkvp // block_k

    # delta lane-replicated + padded like lse; lse comes from the forward at
    # its own block_q padding — re-pad to this pass's Lqp if needed
    lse = _pad_to(lse, 1, block_q)[:, :Lqp]
    deltap = jnp.zeros((bh, Lqp), jnp.float32).at[:, :Lq].set(
        delta.reshape(bh, Lq))
    deltap = jnp.broadcast_to(deltap[:, :, None], (bh, Lqp, 128))

    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, scale=scale, kv_len=Lkv,
                          block_k=block_k, n_kv=n_kv),
        # emit dq in the input dtype: a padded f32 buffer here is ~380MB at
        # the reference's training batch
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        grid=(bh, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dp), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, Dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lse, deltap)

    # the dk/dv pass streams whole q/do/lse/delta per cell: tighter tiles
    bq2 = min(128, block_q)
    bk2 = min(1024, _round_up(Lkv, 128))
    kp2 = _pad_to(k, 3, 128)
    kp2 = _pad_to(kp2, 2, bk2).reshape(bh, -1, Dp)
    vp2 = _pad_to(v, 3, 128)
    vp2 = _pad_to(vp2, 2, bk2).reshape(bh, -1, Dp)
    Lkvp2 = kp2.shape[1]
    n_kv2 = Lkvp2 // bk2
    n_q2 = Lqp // bq2

    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, scale=scale, kv_len=Lkv,
                          block_q=bq2, block_k=bk2, n_q=n_q2),
        out_shape=(
            jax.ShapeDtypeStruct(kp2.shape, k.dtype),
            jax.ShapeDtypeStruct(vp2.shape, v.dtype),
        ),
        grid=(bh, n_kv2),
        in_specs=[
            pl.BlockSpec((1, Lqp, Dp), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, Lqp, Dp), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, Lqp, 128), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, Lqp, 128), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, bk2, Dp), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, bk2, Dp), lambda b, j: (b, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bk2, Dp), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, bk2, Dp), lambda b, j: (b, j, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(qp, dop, lse, deltap, kp2, vp2)

    shape4 = lambda t, L: t.reshape(B, H, -1, Dp)[:, :, :L, :D]
    return (shape4(dq, Lq).astype(q.dtype), shape4(dk, Lkv).astype(k.dtype),
            shape4(dv, Lkv).astype(v.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention(q, k, v, scale):
    interpret = jax.default_backend() != "tpu"
    return _flash_fwd(q, k, v, scale, interpret=interpret)


def _flash_attention_fwd(q, k, v, scale):
    interpret = jax.default_backend() != "tpu"
    out, lse = _flash_fwd(q, k, v, scale, interpret=interpret, return_lse=True)
    return out, (q, k, v, out, lse)


def _flash_attention_bwd(scale, res, g):
    q, k, v, out, lse = res
    interpret = jax.default_backend() != "tpu"
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    return _flash_bwd(q, k, v, g, lse, delta, scale, interpret=interpret)


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def fused_attention(q, k, v, scale=None):
    """Dispatching attention: Pallas flash kernel for long sequences, XLA for
    short ones.  (B, H, Lq, D) / (B, H, Lkv, D) -> (B, H, Lq, D)."""
    if scale is None:
        scale = 1.0 / float(np.sqrt(q.shape[-1]))
    if q.shape[2] >= _FLASH_MIN_LQ:
        return _flash_attention(q, k, v, float(scale))
    return mha_reference(q, k, v, scale)


# =============================================================================
# Packed-layout flash attention (round 2)
#
# The (B, H, L, D) kernel above forces three graph-level costs at head_dim 40
# (measured via a device trace, BENCH_NOTES.md round 2):
#   - HBM pads of D 40 -> 128 on every q/k/v (~3 ms/UNet step),
#   - L<->H transposes around each call (~4 ms of `copy`),
#   - the attention output ends up L-minor, so every following LayerNorm
#     reduction over channels is strided (~6 ms of slow reduce fusions).
#
# This kernel instead takes q/k/v EXACTLY as the to_q/to_k/to_v Dense layers
# produce them — (N, L, H*D) channels-minor — and loops the H heads inside
# the grid cell on VMEM-resident slices.  D is padded to lanes only inside
# VMEM (free), never in HBM; the output is written back channels-minor.
# MXU time is unchanged (a K=40 contraction costs the same pass as K=128),
# the savings are pure HBM traffic / layout.
# =============================================================================


def _packed_single_kernel(q_ref, k_ref, v_ref, *rest,
                          scale, heads, head_dim, kv_len, with_lse,
                          with_bias):
    """Whole-KV-in-one-block specialization (the generation path): no
    running-max/sum scratch, no per-cell memsets — straight softmax.
    ``rest`` is ([bias_ref,] o_ref [, lse_ref])."""
    if with_bias:
        bias_ref, *rest = rest
    if with_lse:
        o_ref, lse_ref = rest
    else:
        (o_ref,) = rest

    # scale ·= log2(e): scores land in base-2 units, softmax runs on the
    # VPU's native 2^x (p/alpha below) — one fewer multiply per score element
    qa = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    ka = k_ref[0]
    va = v_ref[0]
    need_mask = kv_len < ka.shape[0]
    if need_mask and not with_bias:
        col = jax.lax.broadcasted_iota(
            jnp.int32, (qa.shape[0], ka.shape[0]), 1)
    if with_bias:
        brow = bias_ref[0, 0, :].astype(jnp.float32)[None, :] * _LOG2E

    def qk(h):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(qa[:, sl], ka[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if with_bias:
            s = s + brow  # bias KV-tail is pre-filled with the mask value
        elif need_mask:
            s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)
        return s

    outs, lses = [], []
    # software-pipelined: head h+1's QK GEMM is issued before head h's
    # softmax so the MXU stream and the VPU exp2/reductions can overlap
    # (serialized, QK 0.88 + softmax ~0.7 + PV 0.28 ms summed per level-0
    # sparse call — device trace, BENCH_NOTES round 2)
    s = qk(0)
    for h in range(heads):
        s_next = qk(h + 1) if h + 1 < heads else None
        sl = slice(h * head_dim, (h + 1) * head_dim)
        # Static-shift softmax: any constant shift cancels in pv/l, so the
        # per-row max pass (a cross-lane VPU reduction serialized against the
        # MXU stream) is replaced by an elementwise clamp of the base-2
        # scores to ±100 — exp2 cannot overflow (l <= Lkv·2^100 << 2^128)
        # and an all-underflow row cannot hit l=0 (p >= 2^-100), so no NaNs
        # for any input.  Exact whenever the row max is <=100 base-2 units
        # (~69 natural-log units, far beyond trained-attention logit
        # ranges); masked/padded columns keep ~2^-100 relative mass.
        p = jnp.exp2(jnp.clip(s, -100.0, 100.0))
        # (row-sum as a rank-8 ones-GEMM with p emitted in bf16 measured a
        # big LOSS: flash 13.4 -> 20.4 ms/step — the extra MXU op breaks the
        # QK/softmax overlap of the pipelined loop; keep the VPU reduce)
        l = jnp.sum(p, axis=1, keepdims=True)
        pv_t = jax.lax.dot_general(
            va[:, sl], p.astype(va.dtype), (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (D, bq)
        outs.append((pv_t / l[:, 0][None, :]).T.astype(o_ref.dtype))
        if with_lse:
            # residual in natural-log units (the backward passes are e-based);
            # shift is zero, so lse = ln(l) directly
            lses.append(jnp.broadcast_to(
                jnp.log(l)[:, 0][None, :], (8, qa.shape[0])))
        s = s_next
    o_ref[0] = jnp.concatenate(outs, axis=-1)
    if with_lse:
        lse_ref[0] = jnp.stack(lses, axis=0)  # (H, 8, block_q)


def _packed_kernel(q_ref, k_ref, v_ref, *rest,
                   scale, heads, head_dim, kv_len, block_k, n_kv, with_lse,
                   with_bias):
    """Grid (N, n_q, n_kv); refs are (1, block, H*D) packed; heads unrolled.
    ``rest`` is ([bias_ref,] o_ref, [lse_ref,] m_ref, l_ref, acc_ref)."""
    if with_bias:
        bias_ref, *rest = rest
    o_ref, *rest = rest
    if with_lse:
        lse_ref, m_ref, l_ref, acc_ref = rest
    else:
        m_ref, l_ref, acc_ref = rest
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # scale (·log2e: base-2 softmax, see _packed_single_kernel) folded into Q
    # once for all heads (single VPU pass)
    qa = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    ka = k_ref[0]  # (block_k, H*D)
    va = v_ref[0]
    # KV-tail masking is dead work when Lkv pads exactly (level-0's 4608 does)
    need_mask = kv_len % block_k != 0
    if need_mask:
        col = jax.lax.broadcasted_iota(
            jnp.int32, (qa.shape[0], ka.shape[0]), 1) + ik * block_k
    if with_bias:
        brow = bias_ref[0, 0, :].astype(jnp.float32)[None, :] * _LOG2E

    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(qa[:, sl], ka[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if with_bias:
            # additive bias, shared across heads (the reference repeats the
            # mask per head, attention.py:318-321 / unet.py:314-317)
            s = s + brow
        if need_mask:
            s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)

        m_prev = m_ref[h]  # (block_q, 128)
        l_prev = l_ref[h]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, :1])
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[h] = m_next
        l_ref[h] = l_next
        # PV computed TRANSPOSED: (D, bk) x (bk, bq) -> (D, bq).  On the MXU
        # only the streaming (M) axis has 8-row granularity; K and N quantize
        # to 128 tiles, so putting head_dim=40 on N wastes 3.2x of the PV
        # cycles while on M it costs exactly its FLOPs.
        pv_t = jax.lax.dot_general(
            va[:, sl], p.astype(va.dtype), (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (D, block_q)
        acc_ref[h] = acc_ref[h] * alpha[:, 0][None, :] + pv_t

    @pl.when(ik == n_kv - 1)
    def _store():
        outs = []
        for h in range(heads):
            out_t = acc_ref[h] / l_ref[h][:, 0][None, :]  # (D, block_q)
            outs.append(out_t.T.astype(o_ref.dtype))
        o_ref[0] = jnp.concatenate(outs, axis=-1)
        if with_lse:
            # natural-log units for the e-based backward passes
            lse_ref[0] = jnp.stack(
                [jnp.broadcast_to(
                    (m_ref[h] * _LN2 + jnp.log(l_ref[h]))[:, 0][None, :],
                    (8, m_ref.shape[1]))
                 for h in range(heads)],
                axis=0)  # (H, 8, block_q)


def _packed_dual_kernel(q_ref, k0_ref, v0_ref, k1_ref, v1_ref, *rest,
                        scale, heads, head_dim, kv_len, with_bias,
                        with_lse=False):
    """Sparse-causal dual-KV specialization: softmax over the union of a
    SHARED frame-0 KV block (one copy per batch element, indexed n//m by the
    BlockSpec) and a per-frame previous-frame KV block — the reference's
    concat([K0, K_prev]) contract (attention.py:292-301) WITHOUT the
    (b·(f-2), 2l, H*D) HBM concat + frame-0 broadcast the round-2 path
    materialized before every level-0/1 sparse call.

    Whole-KV single block (both halves resident), static-shift clamped
    base-2 softmax, software-pipelined head loop, transposed PV — the same
    schedule as _packed_single_kernel.  ``rest`` = ([bias_ref,] o_ref);
    bias (the reference attention_mask) covers the frame-0 half only, with
    the previous-frame half unmasked — the reference's F.pad quirk
    (attention.py:318-321)."""
    if with_bias:
        bias_ref, *rest = rest
        brow = bias_ref[0, 0, :].astype(jnp.float32)[None, :] * _LOG2E
    if with_lse:
        o_ref, lse_ref = rest
    else:
        (o_ref,) = rest

    qa = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    k0 = k0_ref[0]
    v0 = v0_ref[0]
    k1 = k1_ref[0]
    v1 = v1_ref[0]
    need_mask = kv_len < k0.shape[0]
    if need_mask:
        col = jax.lax.broadcasted_iota(
            jnp.int32, (qa.shape[0], k0.shape[0]), 1)

    def qk(h):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s0 = jax.lax.dot_general(qa[:, sl], k0[:, sl], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        s1 = jax.lax.dot_general(qa[:, sl], k1[:, sl], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if with_bias:
            s0 = s0 + brow  # bias tail pre-filled with the mask value
        elif need_mask:
            s0 = jnp.where(col < kv_len, s0, DEFAULT_MASK_VALUE)
        if need_mask:
            s1 = jnp.where(col < kv_len, s1, DEFAULT_MASK_VALUE)
        return s0, s1

    outs, lses = [], []
    s0, s1 = qk(0)
    for h in range(heads):
        nxt = qk(h + 1) if h + 1 < heads else None
        sl = slice(h * head_dim, (h + 1) * head_dim)
        p0 = jnp.exp2(jnp.clip(s0, -100.0, 100.0))
        p1 = jnp.exp2(jnp.clip(s1, -100.0, 100.0))
        l = (jnp.sum(p0, axis=1, keepdims=True)
             + jnp.sum(p1, axis=1, keepdims=True))
        pv_t = jax.lax.dot_general(
            v0[:, sl], p0.astype(v0.dtype), (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        pv_t = pv_t + jax.lax.dot_general(
            v1[:, sl], p1.astype(v1.dtype), (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (D, bq)
        outs.append((pv_t / l[:, 0][None, :]).T.astype(o_ref.dtype))
        if with_lse:
            # natural-log residual, zero shift (static-shift softmax)
            lses.append(jnp.broadcast_to(
                jnp.log(l)[:, 0][None, :], (8, qa.shape[0])))
        if nxt is not None:
            s0, s1 = nxt
    o_ref[0] = jnp.concatenate(outs, axis=-1)
    if with_lse:
        lse_ref[0] = jnp.stack(lses, axis=0)  # (H, 8, block_q)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "m",
                                             "interpret", "return_lse"))
def _flash_dual_fwd_packed(q, k0, v0, k1, v1, heads, scale, m,
                           interpret=False, bias0=None, return_lse=False):
    """q/k1/v1 (N, L, H*D) with N = b*m; k0/v0 (b, L, H*D) shared per batch
    element across its m frames.  ``return_lse`` adds the (N, H, 8, Lqp)
    natural-log residual for the backward."""
    N, Lq, HD = q.shape
    Lkv = k0.shape[1]
    D = HD // heads
    # same whole-KV q-block sizing as the single-block kernel, with the
    # combined two-half KV width
    lkvp = _round_up(Lkv, 128)
    block_q, _ = _blocks_packed(Lq, 2 * lkvp, HD, heads, return_lse)
    qp = _pad_to(q, 1, block_q)
    k0p = _pad_to(k0, 1, 128)
    v0p = _pad_to(v0, 1, 128)
    k1p = _pad_to(k1, 1, 128)
    v1p = _pad_to(v1, 1, 128)
    Lqp = qp.shape[1]
    n_q = Lqp // block_q

    inputs = [qp, k0p, v0p, k1p, v1p]
    in_specs = [
        pl.BlockSpec((1, block_q, HD), lambda n, i: (n, i, 0)),
        pl.BlockSpec((1, lkvp, HD), lambda n, i: (n // m, 0, 0)),
        pl.BlockSpec((1, lkvp, HD), lambda n, i: (n // m, 0, 0)),
        pl.BlockSpec((1, lkvp, HD), lambda n, i: (n, 0, 0)),
        pl.BlockSpec((1, lkvp, HD), lambda n, i: (n, 0, 0)),
    ]
    if bias0 is not None:
        bp = jnp.pad(bias0.astype(jnp.float32),
                     ((0, 0), (0, 0), (0, lkvp - Lkv)),
                     constant_values=DEFAULT_MASK_VALUE)
        inputs.append(bp)
        in_specs.append(pl.BlockSpec((1, 1, lkvp), lambda n, i: (n // m, 0, 0)))

    out_shape = [jax.ShapeDtypeStruct((N, Lqp, HD), q.dtype)]
    out_specs = [pl.BlockSpec((1, block_q, HD), lambda n, i: (n, i, 0))]
    if return_lse:
        out_shape.append(jax.ShapeDtypeStruct((N, heads, 8, Lqp), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, heads, 8, block_q), lambda n, i: (n, 0, 0, i)))

    res = pl.pallas_call(
        functools.partial(_packed_dual_kernel, scale=scale, heads=heads,
                          head_dim=D, kv_len=Lkv, with_bias=bias0 is not None,
                          with_lse=return_lse),
        out_shape=tuple(out_shape),
        grid=(N, n_q),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    if return_lse:
        return res[0][:, :Lq], res[1]
    return res[0][:, :Lq]


@functools.lru_cache(maxsize=None)
def _dual_cp(heads, head_dim, scale, m, with_bias, interpret):
    """custom_partitioning wrapper for the dual-KV kernel (same rationale as
    _packed_cp): batch (nb) and heads (h) shard; m/lq/lkv/d replicate.  The
    q/k1/v1 leading dim is the COMPOUND (nb m), so a dp sharding on it
    shards nb — each shard keeps whole per-batch frame groups, matching the
    n//m BlockSpec indexing of the shared frame-0 operands."""
    from jax.experimental.custom_partitioning import (
        CompoundFactor,
        SdyShardingRule,
        custom_partitioning,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    @custom_partitioning
    def f(q, k0, v0, k1, v1, *bias):
        return _flash_dual_fwd_packed(q, k0, v0, k1, v1, heads, scale, m,
                                      interpret=interpret,
                                      bias0=bias[0] if bias else None)

    def _shardings(mesh, q_sharding):
        spec = getattr(q_sharding, "spec", P())
        n_ax, c_ax = _spec_get(spec, 0), _spec_get(spec, 2)
        tp = _axis_size(mesh, c_ax)
        if heads % tp != 0:
            c_ax, tp = None, 1
        big = NamedSharding(mesh, P(n_ax, None, c_ax))
        small = NamedSharding(mesh, P(n_ax, None, c_ax))
        bias_s = NamedSharding(mesh, P(n_ax, None, None))
        return big, small, bias_s, tp

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        big, _, _, _ = _shardings(mesh, arg_shapes[0].sharding)
        return big

    def partition(mesh, arg_shapes, result_shape):
        big, small, bias_s, tp = _shardings(mesh, arg_shapes[0].sharding)

        def lower_fn(q, k0, v0, k1, v1, *bias):
            return _flash_dual_fwd_packed(q, k0, v0, k1, v1, heads // tp,
                                          scale, m, interpret=interpret,
                                          bias0=bias[0] if bias else None)

        args = (big, small, small, big, big)
        if with_bias:
            args += (bias_s,)
        return mesh, lower_fn, big, args

    hd = CompoundFactor("h", "d")
    nm = CompoundFactor("nb", "m")
    operands = ((nm, "lq", hd), ("nb", "lkv", hd), ("nb", "lkv", hd),
                (nm, "lkv", hd), (nm, "lkv", hd))
    if with_bias:
        operands += (("nb", "b1", "lkv"),)
    rule = SdyShardingRule(
        operands, ((nm, "lq", hd),),
        # sorted by first-appearance order: m < lq < d < lkv (< b1)
        need_replication_factors=("m", "lq", "d", "lkv")
        + (("b1",) if with_bias else ()),
        m=m, d=head_dim, h=heads,  # h/m/d never appear as whole dimensions
    )
    f.def_partition(
        infer_sharding_from_operands=infer_sharding_from_operands,
        partition=partition,
        sharding_rule=rule,
    )
    return f


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_attention_dual(q, k0, v0, k1, v1, heads, scale, m):
    interpret = jax.default_backend() != "tpu"
    return _dual_cp(heads, q.shape[-1] // heads, scale, m, False,
                    interpret)(q, k0, v0, k1, v1)


def _flash_attention_dual_fwd(q, k0, v0, k1, v1, heads, scale, m):
    interpret = jax.default_backend() != "tpu"
    out, lse = _flash_dual_fwd_packed(q, k0, v0, k1, v1, heads, scale, m,
                                      interpret=interpret, return_lse=True)
    out = checkpoint_name(out, "flash_out")  # see _flash_attention_packed_fwd
    lse = checkpoint_name(lse[:, :, 0, :], "flash_out")
    return out, (q, k0, v0, k1, v1, out, lse)


def _flash_attention_dual_bwd(heads, scale, m, res, g):
    """Dual-KV backward: ONE combined-kernel call over the concatenated
    width, then a clean frame-sum/slice split of dkg/dvg.

    The forward (and its remat recompute) never materializes the concat —
    that was ~15 ms/step of kg/vg assembly at the reference training batch.
    The backward builds it once: the score recompute must cover the full
    [K0 | K_prev] width anyway, and two half-width calls were measured
    WORSE (+25 ms/step: the frame-0 half either re-duplicates the score
    recompute as split passes or blows the scoped-VMEM budget with m*Lq
    query rows resident — both variants traced, BENCH_NOTES round 3).
    dk0 = sum over the m frames of the frame-0 slice — one XLA reduce, not
    the pad+add gradient chains of concat-in-model autodiff."""
    q, k0, v0, k1, v1, out, lse = res
    b = k0.shape[0]
    N, Lq, HD = q.shape
    Lkv = k0.shape[1]
    interpret = jax.default_backend() != "tpu"
    kg = jnp.concatenate(
        [jnp.broadcast_to(k0[:, None], (b, m) + k0.shape[1:]
                          ).reshape(N, Lkv, HD), k1], axis=1)
    vg = jnp.concatenate(
        [jnp.broadcast_to(v0[:, None], (b, m) + v0.shape[1:]
                          ).reshape(N, Lkv, HD), v1], axis=1)
    dq, dkg, dvg = _bwd_cp(heads, HD // heads, scale,
                           interpret)(q, kg, vg, g, out, lse)
    dk0 = dkg[:, :Lkv].reshape(b, m, Lkv, HD).sum(axis=1).astype(k0.dtype)
    dv0 = dvg[:, :Lkv].reshape(b, m, Lkv, HD).sum(axis=1).astype(v0.dtype)
    return dq, dk0, dv0, dkg[:, Lkv:], dvg[:, Lkv:]


_flash_attention_dual.defvjp(_flash_attention_dual_fwd,
                             _flash_attention_dual_bwd)


def fused_attention_dual(q, k0, v0, k1, v1, heads, m, scale=None, bias0=None):
    """Sparse-causal dual-KV attention: softmax over [K0 | K_prev] without
    materializing the concatenation.  q/k1/v1 (b*m, L, H*D), k0/v0
    (b, L, H*D); ``bias0`` optional (b, 1, L) frame-0-half bias.

    Long sequences hit the dual-KV Pallas kernel; short ones (and any shape
    whose combined KV exceeds the whole-block VMEM budget) fall back to the
    explicit-concat packed path.  Inference-only (the training path keeps
    the concat formulation, which has the full Pallas backward)."""
    hd = q.shape[-1] // heads
    if scale is None:
        scale = 1.0 / float(np.sqrt(hd))
    b = k0.shape[0]
    Lkv = k0.shape[1]
    lkvp = _round_up(Lkv, 128)
    _, bk = _blocks_packed(q.shape[1], 2 * lkvp, q.shape[-1], heads, False)
    if q.shape[1] >= _FLASH_MIN_LQ and bk >= 2 * lkvp:
        if bias0 is None:
            # full custom_vjp: differentiable (training path)
            return _flash_attention_dual(q, k0, v0, k1, v1, heads,
                                         float(scale), m)
        interpret = jax.default_backend() != "tpu"
        return _dual_cp(heads, hd, float(scale), m, True,
                        interpret)(q, k0, v0, k1, v1, bias0)
    # fallback: explicit concat (the round-2 formulation)
    kg = jnp.concatenate(
        [jnp.broadcast_to(k0[:, None], (b, m) + k0.shape[1:]).reshape(b * m, Lkv, -1),
         k1], axis=1)
    vg = jnp.concatenate(
        [jnp.broadcast_to(v0[:, None], (b, m) + v0.shape[1:]).reshape(b * m, Lkv, -1),
         v1], axis=1)
    bias = None
    if bias0 is not None:
        bias = jnp.repeat(
            jnp.concatenate([bias0, jnp.zeros_like(bias0)], axis=-1), m, axis=0)
    return fused_attention_packed(q, kg, vg, heads, scale, bias=bias)


def _blocks_packed(Lq, Lkv, HD, heads, with_lse):
    """Tile sizes for the packed kernel under the scoped-VMEM limit.

    Accounts for Mosaic's double-buffering of in/out blocks (x2 on q/k/v/out
    and the lse block) plus the f32 scores temporary and per-head m/l/acc
    scratch; aims at ~11MB to leave headroom for Mosaic-internal temporaries
    (33MB stack OOM observed with naive whole-KV packed tiles)."""
    lkvp = _round_up(Lkv, 128)
    # whole-KV when it fits the (raised, 64MB) scoped-VMEM budget: the
    # online-softmax loop then runs once per q block — measured fastest
    # (half-KV pipelining experiment: flash 17.9 -> 19.4 ms/step, reverted)
    bk = min(lkvp, max(128, (12 * 1024 * 1024 // (4 * HD * 2)) // 128 * 128))
    budget = 40 * 1024 * 1024 - 2 * 2 * bk * HD * 2
    lqp = _round_up(Lq, 128)
    if bk == lkvp and not with_lse:
        # single-block kernel: no m/l/acc scratch, no lse block — the q block
        # can grow until the scores temporaries bound it.  Small-KV calls
        # (cross-attention, Lkv=77) were 36 tiny grid cells at bq=768 and ran
        # ~4x over their compute bound on per-cell overhead (device trace).
        # two in-flight f32 score buffers (software-pipelined head loop)
        # + partially-reused bf16 p
        per_row = 10 * bk + 2 * HD * 2 * 2
        # only small-KV calls (cross-attention) benefit from huge q blocks;
        # at Lkv>=2304 the bigger scores working set measured slower
        cap = min(2304 if bk <= 256 else 768, lqp)
    else:
        per_row = (4 * bk  # f32 scores
                   + heads * 4 * 128 * 3  # m, l, acc scratch
                   + (heads * 4 * 128 * 2 if with_lse else 0)  # lse block x2
                   + 2 * HD * 2 * 2)  # q + out blocks, double-buffered
        cap = min(768, lqp)
    cap = min(cap, max(128, (budget // per_row) // 128 * 128))
    # largest 128-multiple <= cap dividing the padded q length: a non-divisor
    # block pads q in HBM and burns whole cells on garbage rows
    for bq in range(cap, 127, -128):
        if lqp % bq == 0:
            return bq, bk
    return 128, bk


def _packed_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse2_ref, delta_ref, *rest,
                      scale, heads, head_dim, with_bias=False):
    """Packed-layout dq: grid (N, n_q), whole KV per cell, heads unrolled.

    lse2_ref is the forward residual prescaled by log2(e) (base-2 units,
    matching the base-2 score recompute); delta_ref is sum(g*out) per head.
    Zero-padded KV rows contribute nothing (ka rows are 0), so no masking.
    ``with_bias``: rest leads with a (1, 1, Lkvp) additive-bias ref (the
    reference's attention_mask, shared across heads/rows) added to the
    base-2 scores before the clamp, exactly as the forward does.

    Same two schedule tricks as the forward (BENCH_NOTES round 2): the head
    loop is software-pipelined (head h+1's score/dp GEMMs issue before head
    h's exp2/ds VPU work so MXU and VPU overlap), and the dq output GEMM is
    computed transposed — (D, bk) x (bk, bq) puts head_dim=40 on the 8-row
    M axis instead of the 128-lane-quantized N axis (3.2x fewer cycles).
    """
    if with_bias:
        bias_ref, dq_ref = rest
        brow2 = bias_ref[0, 0, :].astype(jnp.float32)[None, :] * _LOG2E
    else:
        (dq_ref,) = rest
    qa = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    ka = k_ref[0]
    va = v_ref[0]
    do = do_ref[0]

    def qk_dp(h):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s2 = jax.lax.dot_general(qa[:, sl], ka[:, sl], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do[:, sl], va[:, sl], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return s2, dp

    outs = []
    s2, dp = qk_dp(0)
    for h in range(heads):
        nxt = qk_dp(h + 1) if h + 1 < heads else None
        sl = slice(h * head_dim, (h + 1) * head_dim)
        if with_bias:
            s2 = s2 + brow2
        # clamp mirrors the forward's static-shift softmax (the single-block
        # kernel clips base-2 scores to ±100): keeps the recomputed p
        # identical to the forward's under extreme logits and bounds exp2
        p = jnp.exp2(jnp.clip(s2, -100.0, 100.0) - lse2_ref[0][:, h:h + 1])
        ds = (p * (dp - delta_ref[0][:, h:h + 1]) * scale).astype(ka.dtype)
        dq_t = jax.lax.dot_general(ka[:, sl], ds, (((0,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        outs.append(dq_t.T.astype(dq_ref.dtype))
        if nxt is not None:
            s2, dp = nxt
    dq_ref[0] = jnp.concatenate(outs, axis=-1)


def _packed_dkv_kernel(q_ref, do_ref, lse2_ref, delta_ref, k_ref, v_ref,
                       *rest, scale, heads, head_dim, with_bias=False):
    """Packed-layout dk/dv: grid (N, n_kv), whole Q per cell, transposed
    scores (KV rows on the GEMM M axis).  lse2/delta come as (1, H, Lqp)
    rows.  dk = ds^T q scale: qa below carries scale*log2e, so folding ln2
    into ds^T makes dsT @ qa == ds^T q * scale exactly.
    ``with_bias``: rest leads with a (1, bk, 1) bias COLUMN ref (transposed
    host-side to match the transposed scores) and trails with a (1, bk, 1)
    dbias output — dbias = sum over heads and query rows of the natural-units
    ds, the exact vjp of the broadcast additive bias."""
    if with_bias:
        bias_ref, dk_ref, dv_ref, dbias_ref = rest
        bcol2 = bias_ref[0].astype(jnp.float32) * _LOG2E  # (bk, 1)
        db_acc = jnp.zeros((bias_ref.shape[1], 1), jnp.float32)
    else:
        dk_ref, dv_ref = rest
    qa = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    do = do_ref[0]
    ka = k_ref[0]
    va = v_ref[0]

    # software-pipelined like the forward: head h+1's score^T / dp^T GEMMs
    # issue before head h's exp2/ds VPU work; dv/dk output GEMMs computed
    # transposed ((D, Lqp) x (Lqp, bk)) so head_dim=40 rides the 8-row M axis
    # instead of the 128-lane-quantized N axis (3.2x fewer MXU cycles each)
    def qk_dp(h):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s2t = jax.lax.dot_general(ka[:, sl], qa[:, sl], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dpt = jax.lax.dot_general(va[:, sl], do[:, sl], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return s2t, dpt

    dks, dvs = [], []
    s2t, dpt = qk_dp(0)
    for h in range(heads):
        nxt = qk_dp(h + 1) if h + 1 < heads else None
        sl = slice(h * head_dim, (h + 1) * head_dim)
        if with_bias:
            s2t = s2t + bcol2
        # same ±100 clamp as the forward's static-shift softmax (see
        # _packed_dq_kernel) so fwd/bwd probabilities agree under extremes
        pt = jnp.exp2(jnp.clip(s2t, -100.0, 100.0)
                      - lse2_ref[0, h:h + 1, :])  # (bk, Lqp)
        dv_t = jax.lax.dot_general(
            do[:, sl], pt.astype(do.dtype), (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (D, bk)
        dvs.append(dv_t.T.astype(dv_ref.dtype))
        ds_nat = pt * (dpt - delta_ref[0, h:h + 1, :])  # (bk, Lqp) f32
        if with_bias:
            db_acc = db_acc + jnp.sum(ds_nat, axis=1, keepdims=True)
        dst = (ds_nat * _LN2).astype(qa.dtype)
        dk_t = jax.lax.dot_general(
            qa[:, sl], dst, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (D, bk)
        dks.append(dk_t.T.astype(dk_ref.dtype))
        if nxt is not None:
            s2t, dpt = nxt
    dk_ref[0] = jnp.concatenate(dks, axis=-1)
    dv_ref[0] = jnp.concatenate(dvs, axis=-1)
    if with_bias:
        dbias_ref[0] = db_acc


def _packed_dqkv_kernel(q_ref, do_ref, lse2_ref, delta_ref, k_ref, v_ref,
                        dk_ref, dv_ref, dq_ref, dq_acc, *,
                        scale, heads, head_dim, n_kv):
    """COMBINED packed backward (round 3): one score/dp recompute feeds
    dk/dv AND dq.  The split dq/dkv passes each recompute the (Lq, Lkv)
    score and dp GEMMs — at the level-0 training shape that duplication is
    ~8.8 ms of MXU work and a second full exp2/ds VPU sweep per call
    (device trace, BENCH_NOTES round 3).  Grid (N, n_kv) with the kv axis
    sequential ('arbitrary'): each cell emits its dk/dv block and folds its
    dq contribution into a per-head f32 VMEM accumulator, stored once at
    the last kv block.

    Same orientation/schedule tricks as the split passes: transposed scores
    (KV rows on the GEMM M axis), head loop software-pipelined, all output
    GEMMs computed (D, L) so head_dim=40 rides the 8-row M axis."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    qa = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    do = do_ref[0]
    ka = k_ref[0]
    va = v_ref[0]

    def qk_dp(h):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s2t = jax.lax.dot_general(ka[:, sl], qa[:, sl], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dpt = jax.lax.dot_general(va[:, sl], do[:, sl], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return s2t, dpt

    dks, dvs = [], []
    s2t, dpt = qk_dp(0)
    for h in range(heads):
        nxt = qk_dp(h + 1) if h + 1 < heads else None
        sl = slice(h * head_dim, (h + 1) * head_dim)
        # ±100 clamp: see _packed_dq_kernel (forward static-shift parity)
        pt = jnp.exp2(jnp.clip(s2t, -100.0, 100.0)
                      - lse2_ref[0, h:h + 1, :])  # (bk, Lqp)
        dv_t = jax.lax.dot_general(
            do[:, sl], pt.astype(do.dtype), (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (D, bk)
        dvs.append(dv_t.T.astype(dv_ref.dtype))
        dst = (pt * (dpt - delta_ref[0, h:h + 1, :]) * _LN2).astype(qa.dtype)
        dk_t = jax.lax.dot_general(
            qa[:, sl], dst, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (D, bk)
        dks.append(dk_t.T.astype(dk_ref.dtype))
        # dq contribution of this kv block, reusing the SAME bf16 dst the dk
        # GEMM consumes (one cast pass): dst = ds_nat^T·ln2 against unscaled
        # k gives ln2·(ds_nat @ k)^T — the constant scale/ln2 is applied
        # once at store time instead of re-scaling ds per block
        dq_acc[h] += jax.lax.dot_general(
            ka[:, sl], dst, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (D, Lqp)
        if nxt is not None:
            s2t, dpt = nxt
    dk_ref[0] = jnp.concatenate(dks, axis=-1)
    dv_ref[0] = jnp.concatenate(dvs, axis=-1)

    @pl.when(j == n_kv - 1)
    def _store_dq():
        c = scale / _LN2
        outs = [(dq_acc[h] * c).T.astype(dq_ref.dtype) for h in range(heads)]
        dq_ref[0] = jnp.concatenate(outs, axis=-1)


def _bwd_blocks_packed(Lq, Lkv, HD, heads):
    """(bq for the dq pass, bk for the dkv pass) under the scoped-VMEM
    budget: two f32 score temporaries per in-flight head + the whole
    counterpart sequence resident."""
    lqp = _round_up(Lq, 128)
    lkvp = _round_up(Lkv, 128)
    budget = 40 * 1024 * 1024

    def pick(l_self, l_other, cap):
        fixed = 2 * 2 * l_other * HD * 2  # counterpart seq double-buffered
        # four in-flight f32 score temporaries per row: p/ds of the current
        # head + the software-pipelined next head's score/dp GEMM outputs
        per_row = 16 * l_other + 4 * HD * 2
        c = min(cap, max(128, ((budget - fixed) // per_row) // 128 * 128))
        for b in range(c, 127, -128):
            if l_self % b == 0:
                return b
        return 128

    return pick(lqp, lkvp, min(768, lqp)), pick(lkvp, lqp, min(1152, lkvp))


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def _flash_bwd_packed(q, k, v, do, out, lse, scale, heads, interpret=False,
                      bias=None):
    """Packed-layout flash backward: q/k/v/do/out (N, L, H*D) channels-minor,
    lse (N, H, Lqp) natural-log units from the forward.  No D 40->128 HBM
    pads and no L<->H transposes (the round-1 (B,H,L,D) backward spent more
    time in layout copies + padded GEMMs than in math: 46 ms/call at the
    level-0 training shape vs ~10 here).

    ``bias``: optional (N, 1, Lkv) additive attention bias (the reference's
    attention_mask, unet.py:314-317) — threaded through both passes' score
    recompute, with a fourth return value dbias (N, 1, Lkv).  The (Lq, Lkv)
    probability matrix is never materialized for masked attention either
    (the round-2 XLA fallback would OOM at level-0 training shapes)."""
    N, Lq, HD = q.shape
    Lkv = k.shape[1]
    D = HD // heads
    bq, bk = _bwd_blocks_packed(Lq, Lkv, HD, heads)
    qp = _pad_to(q, 1, bq)
    dop = _pad_to(do, 1, bq)
    kp = _pad_to(k, 1, bk)
    vp = _pad_to(v, 1, bk)
    Lqp, Lkvp = qp.shape[1], kp.shape[1]

    # delta = sum(g * out) per head, f32 (N, Lq, H) -> padded
    delta = jnp.sum(
        (do.astype(jnp.float32) * out.astype(jnp.float32)
         ).reshape(N, Lq, heads, D), axis=-1)
    delta = _pad_to(delta, 1, bq)
    # the forward may have padded lse to a different block multiple (or the
    # dual backward passes the exact-length residual): re-pad to this Lqp;
    # zero rows are safe (padded q/do rows are zero, see kernel notes)
    lse = (lse[:, :, :Lqp] if lse.shape[2] >= Lqp
           else jnp.pad(lse, ((0, 0), (0, 0), (0, Lqp - lse.shape[2]))))
    lse2_col = (lse * _LOG2E).transpose(0, 2, 1)  # (N, Lqp, H) base-2
    delta_col = delta  # (N, Lqp, H)
    lse2_row = lse * _LOG2E  # (N, H, Lqp)
    delta_row = delta.transpose(0, 2, 1)

    cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel"),
        # 96M: the dual backward's frame-0 half folds m frames into the q
        # axis (Lqp 9216 at level 0) and its dkv pass overflows the 64M
        # scoped limit by ~0.4M; the chip carries 128M VMEM (~120M usable)
        vmem_limit_bytes=96 * 1024 * 1024,
    )
    if bias is None:
        # combined one-pass backward: the score/dp recompute is shared
        # between dq and dk/dv (the split passes below each redo it).
        # The budget leans on the raised 96M scoped limit so the dual
        # backward's FOLDED frame-0 half (Lqp = m*Lq, 9216 at level 0)
        # still lands here — its split-pass fallback re-duplicates the
        # score recompute and measured +25 ms/step (BENCH_NOTES round 3)
        budget = 78 * 1024 * 1024
        fixed = (3 * 2 * Lqp * HD * 2 + HD * Lqp * 4
                 + 4 * heads * Lqp * 4)
        per_row = 16 * Lqp + 4 * HD * 2
        cap = min(1152, _round_up(Lkv, 128))
        bkc = min(cap, max(0, ((budget - fixed) // per_row) // 128 * 128))
        lkvp2 = _round_up(Lkv, 128)
        bkc2 = 0
        for bb in range(bkc, 127, -128):
            if lkvp2 % bb == 0:
                bkc2 = bb
                break
        if bkc2:
            kp2 = _pad_to(k, 1, bkc2)
            vp2 = _pad_to(v, 1, bkc2)
            Lkvp2 = kp2.shape[1]
            dk, dv, dq = pl.pallas_call(
                functools.partial(_packed_dqkv_kernel, scale=scale,
                                  heads=heads, head_dim=D,
                                  n_kv=Lkvp2 // bkc2),
                out_shape=(jax.ShapeDtypeStruct(kp2.shape, k.dtype),
                           jax.ShapeDtypeStruct(vp2.shape, v.dtype),
                           jax.ShapeDtypeStruct(qp.shape, q.dtype)),
                grid=(N, Lkvp2 // bkc2),
                in_specs=[
                    pl.BlockSpec((1, Lqp, HD), lambda b, j: (b, 0, 0)),
                    pl.BlockSpec((1, Lqp, HD), lambda b, j: (b, 0, 0)),
                    pl.BlockSpec((1, heads, Lqp), lambda b, j: (b, 0, 0)),
                    pl.BlockSpec((1, heads, Lqp), lambda b, j: (b, 0, 0)),
                    pl.BlockSpec((1, bkc2, HD), lambda b, j: (b, j, 0)),
                    pl.BlockSpec((1, bkc2, HD), lambda b, j: (b, j, 0)),
                ],
                out_specs=(
                    pl.BlockSpec((1, bkc2, HD), lambda b, j: (b, j, 0)),
                    pl.BlockSpec((1, bkc2, HD), lambda b, j: (b, j, 0)),
                    pl.BlockSpec((1, Lqp, HD), lambda b, j: (b, 0, 0)),
                ),
                scratch_shapes=[pltpu.VMEM((heads, D, Lqp), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary"),
                    vmem_limit_bytes=96 * 1024 * 1024,
                ),
                interpret=interpret,
            )(qp, dop, lse2_row, delta_row, kp2, vp2)
            return dq[:, :Lq], dk[:, :Lkv], dv[:, :Lkv]

    dq_inputs = [qp, kp, vp, dop, lse2_col, delta_col]
    dq_specs = [
        pl.BlockSpec((1, bq, HD), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, Lkvp, HD), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, Lkvp, HD), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, bq, HD), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, bq, heads), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, bq, heads), lambda b, i: (b, i, 0)),
    ]
    if bias is not None:
        # pad the KV tail with the mask value like the forward: recomputed p
        # stays identical to the forward's in the padded columns
        bias_row = jnp.pad(bias.astype(jnp.float32),
                           ((0, 0), (0, 0), (0, Lkvp - Lkv)),
                           constant_values=DEFAULT_MASK_VALUE)
        dq_inputs.append(bias_row)
        dq_specs.append(pl.BlockSpec((1, 1, Lkvp), lambda b, i: (b, 0, 0)))
    dq = pl.pallas_call(
        functools.partial(_packed_dq_kernel, scale=scale, heads=heads,
                          head_dim=D, with_bias=bias is not None),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        grid=(N, Lqp // bq),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((1, bq, HD), lambda b, i: (b, i, 0)),
        compiler_params=cparams,
        interpret=interpret,
    )(*dq_inputs)

    dkv_inputs = [qp, dop, lse2_row, delta_row, kp, vp]
    dkv_specs = [
        pl.BlockSpec((1, Lqp, HD), lambda b, j: (b, 0, 0)),
        pl.BlockSpec((1, Lqp, HD), lambda b, j: (b, 0, 0)),
        pl.BlockSpec((1, heads, Lqp), lambda b, j: (b, 0, 0)),
        pl.BlockSpec((1, heads, Lqp), lambda b, j: (b, 0, 0)),
        pl.BlockSpec((1, bk, HD), lambda b, j: (b, j, 0)),
        pl.BlockSpec((1, bk, HD), lambda b, j: (b, j, 0)),
    ]
    dkv_outs = [jax.ShapeDtypeStruct(kp.shape, k.dtype),
                jax.ShapeDtypeStruct(vp.shape, v.dtype)]
    dkv_out_specs = [pl.BlockSpec((1, bk, HD), lambda b, j: (b, j, 0)),
                     pl.BlockSpec((1, bk, HD), lambda b, j: (b, j, 0))]
    if bias is not None:
        # bias as a COLUMN (N, Lkvp, 1) matching the transposed scores; the
        # dbias output rides the same layout
        bias_col = bias_row.transpose(0, 2, 1)
        dkv_inputs.append(bias_col)
        dkv_specs.append(pl.BlockSpec((1, bk, 1), lambda b, j: (b, j, 0)))
        dkv_outs.append(jax.ShapeDtypeStruct((N, Lkvp, 1), jnp.float32))
        dkv_out_specs.append(pl.BlockSpec((1, bk, 1), lambda b, j: (b, j, 0)))
    res = pl.pallas_call(
        functools.partial(_packed_dkv_kernel, scale=scale, heads=heads,
                          head_dim=D, with_bias=bias is not None),
        out_shape=tuple(dkv_outs),
        grid=(N, Lkvp // bk),
        in_specs=dkv_specs,
        out_specs=tuple(dkv_out_specs),
        compiler_params=cparams,
        interpret=interpret,
    )(*dkv_inputs)

    if bias is not None:
        dk, dv, dbias = res
        return (dq[:, :Lq], dk[:, :Lkv], dv[:, :Lkv],
                dbias[:, :Lkv, 0][:, None, :].astype(bias.dtype))
    dk, dv = res
    return dq[:, :Lq], dk[:, :Lkv], dv[:, :Lkv]


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret",
                                             "return_lse"))
def _flash_fwd_packed(q, k, v, heads, scale, interpret=False,
                      return_lse=False, bias=None):
    """q (N, Lq, H*D), k/v (N, Lkv, H*D) channels-minor -> out (N, Lq, H*D).

    ``bias``: optional (N, 1, Lkv) additive attention bias, shared across
    heads and query rows (the reference's attention_mask contract,
    unet.py:314-317).  lse (if requested) is (N, H, Lqp, 128)."""
    N, Lq, HD = q.shape
    Lkv = k.shape[1]
    D = HD // heads
    block_q, block_k = _blocks_packed(Lq, Lkv, HD, heads, return_lse)
    qp = _pad_to(q, 1, block_q)
    kp = _pad_to(k, 1, block_k)
    vp = _pad_to(v, 1, block_k)
    Lqp = qp.shape[1]
    n_q = Lqp // block_q
    n_kv = kp.shape[1] // block_k

    inputs = [qp, kp, vp]
    in_specs = [
        pl.BlockSpec((1, block_q, HD), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_k, HD), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_k, HD), lambda b, i, j: (b, j, 0)),
    ]
    if bias is not None:
        # pad the KV tail with the mask value so padded columns stay dead
        # even when block_k divides Lkv exactly elsewhere
        bp = jnp.pad(bias.astype(jnp.float32),
                     ((0, 0), (0, 0), (0, n_kv * block_k - Lkv)),
                     constant_values=DEFAULT_MASK_VALUE)
        inputs.append(bp)
        in_specs.append(pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b, 0, j)))

    out_shape = [jax.ShapeDtypeStruct((N, Lqp, HD), q.dtype)]
    out_specs = [pl.BlockSpec((1, block_q, HD), lambda b, i, j: (b, i, 0))]
    if return_lse:
        # (N, H, 8, Lqp): Lqp on lanes, minimal sublane replication — the
        # lane-replicated (…, Lqp, 128) form costs 16x the HBM (540MB at the
        # training batch)
        out_shape.append(jax.ShapeDtypeStruct((N, heads, 8, Lqp), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, heads, 8, block_q), lambda b, i, j: (b, 0, 0, i)))

    if n_kv == 1:
        # whole-KV single block (the generation path): no online-softmax
        # state, no scratch memsets
        kern = functools.partial(
            _packed_single_kernel, scale=scale, heads=heads, head_dim=D,
            kv_len=Lkv, with_lse=return_lse, with_bias=bias is not None)
        scratch = []
    else:
        kern = functools.partial(
            _packed_kernel, scale=scale, heads=heads, head_dim=D, kv_len=Lkv,
            block_k=block_k, n_kv=n_kv, with_lse=return_lse,
            with_bias=bias is not None)
        scratch = [
            pltpu.VMEM((heads, block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((heads, block_q, 128), jnp.float32),  # running sum
            pltpu.VMEM((heads, D, block_q), jnp.float32),  # out accumulators^T
        ]

    res = pl.pallas_call(
        kern,
        out_shape=tuple(out_shape),
        grid=(N, n_q, n_kv),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # Mosaic's own temporaries put the packed tiles slightly past the
            # 16MB default scoped limit; the chip carries 128MB VMEM
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)

    if return_lse:
        out, lse = res
        return out[:, :Lq], lse
    return res[0][:, :Lq]


# --- GSPMD partitioning ------------------------------------------------------
#
# Without this, pjit treats the pallas_call as opaque and REPLICATES it: a
# tp-sharded UNet all-gathers q/k/v around every flash call (measured: 12
# all-gathers at one call on an 8-device mesh).  The packed layout makes the
# partitioning natural: dim 0 is batch (dp), dim 2 is head-major channels, so
# a "tp" sharding on the Dense outputs splits on head boundaries and each
# shard runs the kernel on its local heads.

def _spec_get(spec, i):
    return spec[i] if i < len(spec) else None


def _axis_size(mesh, names):
    if names is None:
        return 1
    if isinstance(names, (tuple, list)):
        size = 1
        for n in names:
            size *= mesh.shape[n]
        return size
    return mesh.shape[names]


@functools.lru_cache(maxsize=None)
def _packed_cp(heads, head_dim, scale, return_lse, interpret,
               with_bias=False):
    from jax.experimental.custom_partitioning import (
        SdyShardingRule,
        custom_partitioning,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    if with_bias:
        # bias (N, 1, Lkv) is shared across heads: batch shards with the
        # tokens, the head split leaves it whole per shard (round 4 — the
        # biased forward previously bypassed custom_partitioning entirely,
        # so masked attention replicated under tp)
        @custom_partitioning
        def f(q, k, v, bias):
            return _flash_fwd_packed(q, k, v, heads, scale,
                                     interpret=interpret,
                                     return_lse=return_lse, bias=bias)
    else:
        @custom_partitioning
        def f(q, k, v):
            return _flash_fwd_packed(q, k, v, heads, scale,
                                     interpret=interpret,
                                     return_lse=return_lse)

    def _shardings(mesh, q_sharding, head_dim):
        spec = getattr(q_sharding, "spec", P())
        n_ax, c_ax = _spec_get(spec, 0), _spec_get(spec, 2)
        tp = _axis_size(mesh, c_ax)
        if heads % tp != 0:  # cannot split inside a head: replicate channels
            c_ax, tp = None, 1
        arg = NamedSharding(mesh, P(n_ax, None, c_ax))
        outs = (NamedSharding(mesh, P(n_ax, None, c_ax)),)
        if return_lse:
            outs += (NamedSharding(mesh, P(n_ax, c_ax, None, None)),)
        bias_sh = NamedSharding(mesh, P(n_ax, None, None))
        return arg, outs, tp, bias_sh

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        _, outs, _, _ = _shardings(mesh, arg_shapes[0].sharding, None)
        return outs if return_lse else outs[0]

    def partition(mesh, arg_shapes, result_shape):
        arg, outs, tp, bias_sh = _shardings(mesh, arg_shapes[0].sharding, None)

        if with_bias:
            def lower_fn(q, k, v, bias):
                return _flash_fwd_packed(q, k, v, heads // tp, scale,
                                         interpret=interpret,
                                         return_lse=return_lse, bias=bias)

            args = (arg, arg, arg, bias_sh)
        else:
            def lower_fn(q, k, v):
                return _flash_fwd_packed(q, k, v, heads // tp, scale,
                                         interpret=interpret,
                                         return_lse=return_lse)

            args = (arg, arg, arg)

        return (mesh, lower_fn, outs if return_lse else outs[0], args)

    # Shardy rule: channels are a compound (h d) factor; only n (batch) and
    # h (heads) may shard — lq/lkv/d (and the lse minor dims) must stay whole.
    from jax.experimental.custom_partitioning import CompoundFactor

    hd = CompoundFactor("h", "d")
    operands = (("n", "lq", hd), ("n", "lkv", hd), ("n", "lkv", hd))
    if with_bias:
        operands += (("n", "r1", "lkv"),)
    results = (("n", "lq", hd),)
    if return_lse:
        results += (("n", "h", "r8", "lqp"),)
    # factor sizes only for factors that never appear as a whole dimension
    sizes = {"d": head_dim}
    if not return_lse:
        sizes["h"] = heads
    rule = SdyShardingRule(
        operands, results,
        # must be sorted by first-appearance factor index: lq < d < lkv < ...
        need_replication_factors=("lq", "d", "lkv")
        + (("r1",) if with_bias else ())
        + (("r8", "lqp") if return_lse else ()),
        **sizes,
    )

    f.def_partition(
        infer_sharding_from_operands=infer_sharding_from_operands,
        partition=partition,
        sharding_rule=rule,
    )
    return f


@functools.lru_cache(maxsize=None)
def _bwd_cp(heads, head_dim, scale, interpret):
    """custom_partitioning for the packed flash BACKWARD (round 3): without
    it a tp-sharded training step all-gathers q/k/v/do around every
    backward pallas_call even though the forward partitions cleanly.  Batch
    (n) and heads (h — dim 2 of the packed tensors, dim 1 of lse) shard;
    lq/lkv/d replicate, exactly like the forward rule."""
    from jax.experimental.custom_partitioning import (
        CompoundFactor,
        SdyShardingRule,
        custom_partitioning,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    @custom_partitioning
    def f(q, k, v, do, out, lse):
        return _flash_bwd_packed(q, k, v, do, out, lse, scale, heads,
                                 interpret=interpret)

    def _shardings(mesh, q_sharding):
        spec = getattr(q_sharding, "spec", P())
        n_ax, c_ax = _spec_get(spec, 0), _spec_get(spec, 2)
        tp = _axis_size(mesh, c_ax)
        if heads % tp != 0:
            c_ax, tp = None, 1
        tok = NamedSharding(mesh, P(n_ax, None, c_ax))
        lse_s = NamedSharding(mesh, P(n_ax, c_ax, None))
        return tok, lse_s, tp

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        tok, _, _ = _shardings(mesh, arg_shapes[0].sharding)
        return (tok, tok, tok)

    def partition(mesh, arg_shapes, result_shape):
        tok, lse_s, tp = _shardings(mesh, arg_shapes[0].sharding)

        def lower_fn(q, k, v, do, out, lse):
            return _flash_bwd_packed(q, k, v, do, out, lse, scale,
                                     heads // tp, interpret=interpret)

        return (mesh, lower_fn, (tok, tok, tok),
                (tok, tok, tok, tok, tok, lse_s))

    hd = CompoundFactor("h", "d")
    operands = (("n", "lq", hd), ("n", "lkv", hd), ("n", "lkv", hd),
                ("n", "lq", hd), ("n", "lq", hd), ("n", "h", "lqp"))
    results = (("n", "lq", hd), ("n", "lkv", hd), ("n", "lkv", hd))
    rule = SdyShardingRule(
        operands, results,
        # first-appearance order: lq < d < lkv < lqp
        need_replication_factors=("lq", "d", "lkv", "lqp"),
        d=head_dim,
    )
    f.def_partition(
        infer_sharding_from_operands=infer_sharding_from_operands,
        partition=partition,
        sharding_rule=rule,
    )
    return f


@functools.lru_cache(maxsize=None)
def _biased_bwd_cp(heads, head_dim, scale, interpret):
    """custom_partitioning for the BIASED packed flash backward (round 4):
    the one previously-unpartitioned pass — a tp-sharded masked training
    step replicated (all-gathered) around it (PARITY round-3 "Known
    limitations").  Batch (n) and heads shard exactly like _bwd_cp; the
    (N, 1, Lkv) bias is head-shared, so each head shard computes a PARTIAL
    dbias over its local heads and the lowered body psums them over the
    head-sharding mesh axes.  Mask contract: reference
    EEG2Video_New/Generation/models/unet.py:314-317."""
    from jax.experimental.custom_partitioning import (
        CompoundFactor,
        SdyShardingRule,
        custom_partitioning,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    @custom_partitioning
    def f(q, k, v, do, out, lse, bias):
        return _flash_bwd_packed(q, k, v, do, out, lse, scale, heads,
                                 interpret=interpret, bias=bias)

    def _shardings(mesh, q_sharding):
        spec = getattr(q_sharding, "spec", P())
        n_ax, c_ax = _spec_get(spec, 0), _spec_get(spec, 2)
        tp = _axis_size(mesh, c_ax)
        if heads % tp != 0:
            c_ax, tp = None, 1
        tok = NamedSharding(mesh, P(n_ax, None, c_ax))
        lse_s = NamedSharding(mesh, P(n_ax, c_ax, None))
        bias_s = NamedSharding(mesh, P(n_ax, None, None))
        return tok, lse_s, bias_s, c_ax, tp

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        tok, _, bias_s, _, _ = _shardings(mesh, arg_shapes[0].sharding)
        return (tok, tok, tok, bias_s)

    def partition(mesh, arg_shapes, result_shape):
        tok, lse_s, bias_s, c_ax, tp = _shardings(mesh, arg_shapes[0].sharding)

        def lower_fn(q, k, v, do, out, lse, bias):
            dq, dk, dv, dbias = _flash_bwd_packed(
                q, k, v, do, out, lse, scale, heads // tp,
                interpret=interpret, bias=bias)
            if tp > 1:
                # each shard's dbias covers only its local heads
                dbias = jax.lax.psum(dbias, c_ax)
            return dq, dk, dv, dbias

        return (mesh, lower_fn, (tok, tok, tok, bias_s),
                (tok, tok, tok, tok, tok, lse_s, bias_s))

    hd = CompoundFactor("h", "d")
    operands = (("n", "lq", hd), ("n", "lkv", hd), ("n", "lkv", hd),
                ("n", "lq", hd), ("n", "lq", hd), ("n", "h", "lqp"),
                ("n", "r1", "lkv"))
    results = (("n", "lq", hd), ("n", "lkv", hd), ("n", "lkv", hd),
               ("n", "r1", "lkv"))
    rule = SdyShardingRule(
        operands, results,
        # first-appearance order: lq < d < lkv < lqp < r1
        need_replication_factors=("lq", "d", "lkv", "lqp", "r1"),
        d=head_dim,
    )
    f.def_partition(
        infer_sharding_from_operands=infer_sharding_from_operands,
        partition=partition,
        sharding_rule=rule,
    )
    return f


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_attention_packed(q, k, v, heads, scale):
    interpret = jax.default_backend() != "tpu"
    return _packed_cp(heads, q.shape[-1] // heads, scale, False,
                      interpret)(q, k, v)


def _flash_attention_packed_fwd(q, k, v, heads, scale):
    interpret = jax.default_backend() != "tpu"
    out, lse = _packed_cp(heads, q.shape[-1] // heads, scale, True,
                          interpret)(q, k, v)
    # keep one sublane of the (N, H, 8, Lqp) replicated lse as the residual.
    # checkpoint_name marks the kernel outputs saveable under a remat policy
    # (unet3d remat_save_attn): inside a jax.checkpoint'd block the fwd rule
    # is what the bwd-side recompute re-traces, so saving (out, lse) elides
    # the second flash-forward launch entirely — q/k/v (cheap GEMMs) still
    # recompute.
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse[:, :, 0, :], "flash_out")
    return out, (q, k, v, out, lse)


def _flash_attention_packed_bwd(heads, scale, res, g):
    """Packed-layout Pallas backward — same channels-minor layout as the
    forward, no D pads or L<->H transposes in the grad graph; partitioned
    under GSPMD like the forward (_bwd_cp)."""
    q, k, v, out, lse = res
    interpret = jax.default_backend() != "tpu"
    return _bwd_cp(heads, q.shape[-1] // heads, scale,
                   interpret)(q, k, v, g, out, lse)


_flash_attention_packed.defvjp(_flash_attention_packed_fwd,
                               _flash_attention_packed_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_attention_packed_biased(q, k, v, bias, heads, scale):
    interpret = jax.default_backend() != "tpu"
    return _packed_cp(heads, q.shape[-1] // heads, scale, False, interpret,
                      with_bias=True)(q, k, v, bias)


def _packed_xla(q, k, v, bias, heads, scale):
    n, lq = q.shape[0], q.shape[1]
    lkv = k.shape[1]
    hd = q.shape[-1] // heads

    def split(t, l):
        return t.reshape(n, l, heads, hd).transpose(0, 2, 1, 3)

    out = mha_reference(split(q, lq), split(k, lkv), split(v, lkv), scale,
                        bias=bias)
    return out.transpose(0, 2, 1, 3).reshape(n, lq, heads * hd)


def _flash_packed_biased_fwd(q, k, v, bias, heads, scale):
    interpret = jax.default_backend() != "tpu"
    out, lse = _packed_cp(heads, q.shape[-1] // heads, scale, True, interpret,
                          with_bias=True)(q, k, v, bias)
    out = checkpoint_name(out, "flash_out")  # see _flash_attention_packed_fwd
    lse = checkpoint_name(lse[:, :, 0, :], "flash_out")
    return out, (q, k, v, bias, out, lse)


def _flash_packed_biased_bwd(heads, scale, res, g):
    """Pallas backward with the bias threaded through the score recompute of
    both packed passes (dbias = summed natural-units ds rows) — masked
    training at level-0 shapes no longer materializes (Lq, Lkv) scores the
    way the round-2 XLA fallback did.  Partitioned under GSPMD like the
    unbiased pass (_biased_bwd_cp, round 4): batch + heads shard, dbias
    psums over the head shards."""
    q, k, v, bias, out, lse = res
    interpret = jax.default_backend() != "tpu"
    return _biased_bwd_cp(heads, q.shape[-1] // heads, scale,
                          interpret)(q, k, v, g, out, lse, bias)


_flash_attention_packed_biased.defvjp(_flash_packed_biased_fwd,
                                      _flash_packed_biased_bwd)


def fused_attention_packed(q, k, v, heads, scale=None, bias=None):
    """Packed-layout dispatching attention: (N, Lq, H*D) x (N, Lkv, H*D) ->
    (N, Lq, H*D), no head-axis transposes in the graph.  Long sequences hit
    the packed Pallas kernel; short ones unpack to the XLA path.

    ``bias``: optional (N, 1, Lkv) additive attention bias (the reference's
    attention_mask converted via (1-m)*-1e4, unet.py:314-317)."""
    hd = q.shape[-1] // heads
    if scale is None:
        scale = 1.0 / float(np.sqrt(hd))
    if q.shape[1] >= _FLASH_MIN_LQ:
        if bias is not None:
            return _flash_attention_packed_biased(q, k, v, bias, heads,
                                                  float(scale))
        return _flash_attention_packed(q, k, v, heads, float(scale))
    return _packed_xla(q, k, v, bias, heads, float(scale))
