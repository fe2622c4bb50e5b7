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
- Training: custom_vjp whose backward rematerializes attention through the
  XLA path (exact same math) — correct gradients today; a Pallas backward is
  a later optimization (only to_q / attn_temp train in the fine-tune recipe,
  reference train_finetune_videodiffusion.py:72-76).
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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
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


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def _flash_fwd(q, k, v, scale, block_q=None, block_k=None, interpret=False):
    B, H, Lq, D = q.shape
    Lkv = k.shape[2]
    # adaptive tiling (tuned on v5e): take the WHOLE (padded) KV per grid
    # cell when it fits — the online-softmax loop then runs once, which
    # measured fastest (6.4ms vs 7.3ms at the level-0 shape) — and size the
    # q block so the f32 scores tile stays within ~8MB of VMEM
    if block_k is None:
        block_k = min(4608, _round_up(Lkv, 128))
    if block_q is None:
        budget = (8 * 1024 * 1024) // (4 * block_k)  # rows of f32 scores
        block_q = min(768, _round_up(Lq, 128), max(128, (budget // 128) * 128))
    qp = _pad_to(_pad_to(q, 3, 128), 2, block_q)
    kp = _pad_to(_pad_to(k, 3, 128), 2, block_k)
    vp = _pad_to(_pad_to(v, 3, 128), 2, block_k)
    Dp = qp.shape[3]
    bh = B * H
    qp = qp.reshape(bh, -1, Dp)
    kp = kp.reshape(bh, -1, Dp)
    vp = vp.reshape(bh, -1, Dp)
    n_q = qp.shape[1] // block_q
    n_kv = kp.shape[1] // block_k

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=Lkv, block_k=block_k, n_kv=n_kv),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        grid=(bh, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, Dp), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dp), lambda b, i, j: (b, i, 0)),
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

    out = out.reshape(B, H, -1, Dp)
    return out[:, :, :Lq, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention(q, k, v, scale):
    interpret = jax.default_backend() != "tpu"
    return _flash_fwd(q, k, v, scale, interpret=interpret)


def _flash_attention_fwd(q, k, v, scale):
    return _flash_attention(q, k, v, scale), (q, k, v)


def _flash_attention_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: mha_reference(q, k, v, scale), q, k, v)
    return vjp(g)


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def fused_attention(q, k, v, scale=None):
    """Dispatching attention: Pallas flash kernel for long sequences, XLA for
    short ones.  (B, H, Lq, D) / (B, H, Lkv, D) -> (B, H, Lq, D)."""
    if scale is None:
        scale = 1.0 / float(np.sqrt(q.shape[-1]))
    if q.shape[2] >= _FLASH_MIN_LQ:
        return _flash_attention(q, k, v, float(scale))
    return mha_reference(q, k, v, scale)
