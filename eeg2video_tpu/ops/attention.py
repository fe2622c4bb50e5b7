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
- Training: full Pallas flash backward (custom_vjp) — a dq pass and a
  dk/dv pass recompute probabilities from the saved log-sum-exp residual, so
  the (Lq, Lkv) probability matrix never hits HBM in either direction.  At
  the reference's training batch (10 clips x 6 frames,
  train_finetune_videodiffusion.py:77) an XLA-recompute backward would need
  ~10 GB of transient probabilities at level-0 shapes and OOM one v5e;
  the Pallas backward runs it in 153 ms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
_FLASH_MIN_LQ = 256  # below this the XLA path wins


def mha_reference(q, k, v, scale=None):
    """Plain XLA attention, (B, H, Lq, D) x (B, H, Lkv, D) -> (B, H, Lq, D)."""
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
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
    lse = lse[:, :Lqp] if lse.shape[1] >= Lqp else _pad_to(lse, 1, block_q)
    deltap = jnp.zeros((bh, Lqp), jnp.float32).at[:, :Lq].set(
        delta.reshape(bh, Lq))
    deltap = jnp.broadcast_to(deltap[:, :, None], (bh, Lqp, 128))

    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, scale=scale, kv_len=Lkv,
                          block_k=block_k, n_kv=n_kv),
        out_shape=jax.ShapeDtypeStruct(qp.shape, jnp.float32),
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
            jax.ShapeDtypeStruct(kp2.shape, jnp.float32),
            jax.ShapeDtypeStruct(vp2.shape, jnp.float32),
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
