"""Ring attention: context-parallel ("sp") flash attention over a mesh axis.

A TPU-native capability with no reference analog: the reference caps
resolution and clip length at what one GPU's memory can attend over
(xformers + attention slicing, reference
EEG2Video_New/Generation/models/attention.py:305-309 and
pipeline_tuneeeg2video.py's enable_vae_slicing) — slicing trades memory for
serialized time on ONE device.  Here the spatial-token axis shards over an
"sp" mesh axis and the K/V shards rotate around the ring via
``lax.ppermute`` (ICI neighbor hops on a real slice), so both memory AND
FLOPs scale with the ring size: sequences that cannot fit one chip's HBM
attend at full flash-kernel speed per hop, and XLA overlaps each hop's
collective-permute with the previous hop's kernel.

Forward (exact, not approximate): each device holds a (N, L/sp, H*D) shard
of q/k/v.  sp hops of the packed flash kernel
(ops.attention._flash_fwd_packed) produce block-local (out_i, lse_i); the
streaming-softmax combine is

    lse = logsumexp_i(lse_i),   out = sum_i exp(lse_i - lse) * out_i,

the same math the in-kernel online softmax runs across KV tiles, lifted one
level up to ring hops.

Backward: a second ring pass rotates (k, v, dk, dv) while q/do/out/lse stay
device-resident.  Each hop calls the combined packed backward
(ops.attention._flash_bwd_packed) with the GLOBAL (out, lse) residuals —
the kernel recomputes p = exp(s - lse) against the global normalizer, which
makes its per-block dq/dk/dv partials exact.  dq accumulates locally (f32);
dk/dv accumulate inside the rotating buffers and arrive back at their home
device on the final hop.

Layout/precision notes: operands stay channels-minor (N, L, H*D) end to
end, exactly as the to_q/to_k/to_v Dense layers produce them (BENCH_NOTES
round 2 packed-layout rationale).  The combine and grad accumulators run in
f32; kernel outputs are cast back to the operand dtype at the boundary.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .attention import _flash_fwd_packed, _flash_bwd_packed


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _shift(xs, axis_name, sp):
    """Rotate each array one ring position: device i receives block i+1.

    perm maps (source -> dest); block held by device j moves to j-1, so
    after t hops device i holds block (i + t) % sp."""
    perm = [(j, (j - 1) % sp) for j in range(sp)]
    return tuple(jax.lax.ppermute(x, axis_name, perm) for x in xs)


def _weighted(out_f32, w, heads):
    """Multiply (N, L, H*D) by per-(N, H, L) weights."""
    n, l, hd = out_f32.shape
    d = hd // heads
    w = w.transpose(0, 2, 1)[..., None]  # (N, L, H, 1)
    return (out_f32.reshape(n, l, heads, d) * w).reshape(n, l, hd)


def _ring_fwd(q, k, v, heads, scale, axis_name, sp, bias=None):
    """Local shards in, (combined out, global natural-units lse) out.

    ``bias``: optional LOCAL (N, 1, Lkv/sp) additive-bias shard — it is
    KV-aligned, so it rotates around the ring with its K/V block."""
    lq = q.shape[1]
    out = None
    lse = None
    kb, vb, bb = k, v, bias
    for t in range(sp):
        o_i, l_i = _flash_fwd_packed(q, kb, vb, heads, scale,
                                     interpret=_interpret(), return_lse=True,
                                     bias=bb)
        l_i = l_i[:, :, 0, :lq]  # (N, H, Lq), natural-log units
        o_i = o_i.astype(jnp.float32)
        if out is None:
            out, lse = o_i, l_i
        else:
            m = jnp.maximum(lse, l_i)
            a = jnp.exp(lse - m)
            b = jnp.exp(l_i - m)
            denom = a + b
            out = (_weighted(out, a / denom, heads)
                   + _weighted(o_i, b / denom, heads))
            lse = m + jnp.log(denom)
        if t + 1 < sp:  # last hop's KV state is not needed again
            if bb is None:
                kb, vb = _shift((kb, vb), axis_name, sp)
            else:
                kb, vb, bb = _shift((kb, vb, bb), axis_name, sp)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _ring_attention_local(q, k, v, heads, scale, axis_name, sp):
    out, _ = _ring_fwd(q, k, v, heads, scale, axis_name, sp)
    return out.astype(q.dtype)


def _ring_local_fwd(q, k, v, heads, scale, axis_name, sp):
    out, lse = _ring_fwd(q, k, v, heads, scale, axis_name, sp)
    out = out.astype(q.dtype)
    return out, (q, k, v, out, lse)


def _ring_local_bwd(heads, scale, axis_name, sp, res, g):
    q, k, v, out, lse = res
    dq = jnp.zeros(q.shape, jnp.float32)
    # rotating buffers: the KV block plus its grad accumulators travel
    # together; after sp hops they are back at the block's home device
    kb, vb = k, v
    dkb = jnp.zeros(k.shape, jnp.float32)
    dvb = jnp.zeros(v.shape, jnp.float32)
    for _ in range(sp):
        dq_p, dk_p, dv_p = _flash_bwd_packed(
            q, kb, vb, g, out, lse, scale, heads, interpret=_interpret())
        dq = dq + dq_p.astype(jnp.float32)
        dkb = dkb + dk_p.astype(jnp.float32)
        dvb = dvb + dv_p.astype(jnp.float32)
        kb, vb, dkb, dvb = _shift((kb, vb, dkb, dvb), axis_name, sp)
    return dq.astype(q.dtype), dkb.astype(k.dtype), dvb.astype(v.dtype)


_ring_attention_local.defvjp(_ring_local_fwd, _ring_local_bwd)


# --- replicated-KV mode -------------------------------------------------------
#
# For attention whose KV side is short and not divisible by the ring size
# (the UNet's 77-token cross-attention context, reference
# EEG2Video_New/Generation/models/attention.py:231-257): the QUERY tokens
# shard over "sp" while k/v stay replicated.  Zero hops — each device runs
# one flash call over its query shard against the whole KV — and the
# backward psums dk/dv over the ring axis (each shard contributes the
# gradient of its own query rows).  Exact, like the ring mode.


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _repkv_attention_local(q, k, v, heads, scale, axis_name):
    out = _flash_fwd_packed(q, k, v, heads, scale, interpret=_interpret())
    return out.astype(q.dtype)


def _repkv_local_fwd(q, k, v, heads, scale, axis_name):
    out, lse = _flash_fwd_packed(q, k, v, heads, scale,
                                 interpret=_interpret(), return_lse=True)
    out = out.astype(q.dtype)
    return out, (q, k, v, out, lse[:, :, 0, :q.shape[1]])


def _repkv_local_bwd(heads, scale, axis_name, res, g):
    # dk/dv are PARTIAL over the ring (each shard differentiates its own
    # query rows); the cross-shard sum is inserted by shard_map's transpose
    # for the replicated in_spec — adding a psum here would double-count.
    q, k, v, out, lse = res
    dq, dk, dv = _flash_bwd_packed(q, k, v, g, out, lse, scale, heads,
                                   interpret=_interpret())
    return dq, dk, dv


_repkv_attention_local.defvjp(_repkv_local_fwd, _repkv_local_bwd)


# --- biased modes (round 5) ---------------------------------------------------
#
# The (N, 1, Lkv) additive attention bias (the reference's attention_mask,
# unet.py:314-317) is KV-ALIGNED: in the ring mode its shard rotates around
# the ring with the K/V block it masks; in the replicated-KV mode it stays
# replicated like k/v.  Exact forward AND backward — the packed kernels
# carry bias through both passes and emit dbias (summed over heads and
# query rows per shard; cross-shard sums come from the rotation returning
# accumulators home / shard_map's transpose for replicated operands).


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _ring_attention_local_biased(q, k, v, bias, heads, scale, axis_name, sp):
    out, _ = _ring_fwd(q, k, v, heads, scale, axis_name, sp, bias=bias)
    return out.astype(q.dtype)


def _ring_local_biased_fwd(q, k, v, bias, heads, scale, axis_name, sp):
    out, lse = _ring_fwd(q, k, v, heads, scale, axis_name, sp, bias=bias)
    out = out.astype(q.dtype)
    return out, (q, k, v, bias, out, lse)


def _ring_local_biased_bwd(heads, scale, axis_name, sp, res, g):
    q, k, v, bias, out, lse = res
    dq = jnp.zeros(q.shape, jnp.float32)
    kb, vb, bb = k, v, bias
    dkb = jnp.zeros(k.shape, jnp.float32)
    dvb = jnp.zeros(v.shape, jnp.float32)
    dbb = jnp.zeros(bias.shape, jnp.float32)
    for _ in range(sp):
        dq_p, dk_p, dv_p, db_p = _flash_bwd_packed(
            q, kb, vb, g, out, lse, scale, heads, interpret=_interpret(),
            bias=bb)
        dq = dq + dq_p.astype(jnp.float32)
        dkb = dkb + dk_p.astype(jnp.float32)
        dvb = dvb + dv_p.astype(jnp.float32)
        dbb = dbb + db_p.astype(jnp.float32)
        kb, vb, bb, dkb, dvb, dbb = _shift((kb, vb, bb, dkb, dvb, dbb),
                                           axis_name, sp)
    return (dq.astype(q.dtype), dkb.astype(k.dtype), dvb.astype(v.dtype),
            dbb.astype(bias.dtype))


_ring_attention_local_biased.defvjp(_ring_local_biased_fwd,
                                    _ring_local_biased_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _repkv_attention_local_biased(q, k, v, bias, heads, scale, axis_name):
    out = _flash_fwd_packed(q, k, v, heads, scale, interpret=_interpret(),
                            bias=bias)
    return out.astype(q.dtype)


def _repkv_local_biased_fwd(q, k, v, bias, heads, scale, axis_name):
    out, lse = _flash_fwd_packed(q, k, v, heads, scale,
                                 interpret=_interpret(), return_lse=True,
                                 bias=bias)
    out = out.astype(q.dtype)
    return out, (q, k, v, bias, out, lse[:, :, 0, :q.shape[1]])


def _repkv_local_biased_bwd(heads, scale, axis_name, res, g):
    # dk/dv/dbias are PARTIAL over the ring (each shard differentiates its
    # own query rows); shard_map's transpose psums the replicated in_specs
    q, k, v, bias, out, lse = res
    return _flash_bwd_packed(q, k, v, g, out, lse, scale, heads,
                             interpret=_interpret(), bias=bias)


_repkv_attention_local_biased.defvjp(_repkv_local_biased_fwd,
                                     _repkv_local_biased_bwd)


def ring_attention_inner(q, k, v, heads, scale, axis_name, sp):
    """Shard-level entry point, for callers already inside a ``shard_map``
    over ``axis_name``: q/k/v are the LOCAL (N, L/sp, H*D) shards."""
    return _ring_attention_local(q, k, v, heads, float(scale), axis_name,
                                 int(sp))


def ring_attention_packed(q, k, v, heads, mesh: Mesh, scale=None,
                          axis_name: str = "sp", batch_axis=None,
                          head_axis=None, bias=None):
    """Context-parallel attention over GLOBAL channels-minor operands.

    q/k/v: (N, L, H*D) with Lq divisible by ``mesh.shape[axis_name]``; the
    query-token axis is sharded over ``axis_name`` (and optionally the batch
    axis over ``batch_axis``, e.g. "dp") via ``shard_map``.  When Lkv is
    also divisible, the KV shards rotate around the ring (memory AND FLOPs
    scale with sp); otherwise (e.g. the 77-token cross-attention context)
    k/v stay replicated and only the query side shards (FLOPs scale, dk/dv
    psum over the ring).  Exact either way — matches
    ``fused_attention_packed`` to kernel tolerance at any ring size,
    including sp=1 (plain flash, zero hops).

    ``head_axis`` (round 5): additionally shard the HEAD dimension of the
    channels axis over that mesh axis (Megatron tp composing with the
    ring) — attention is per-head independent, so each (sp, tp) shard runs
    the ring over its own heads//tp heads; requires heads %
    mesh.shape[head_axis] == 0.

    ``bias`` (round 5): optional (N, 1, Lkv) additive attention bias; its
    KV-aligned shard rotates with the K/V block in ring mode and stays
    replicated in repkv mode.  Exact dbias either way (bias is shared
    across heads, so under ``head_axis`` the per-shard dbias psums over
    the head shards via shard_map's transpose)."""
    hd = q.shape[-1] // heads
    if scale is None:
        scale = 1.0 / float(np.sqrt(hd))
    sp = mesh.shape[axis_name]
    if q.shape[1] % sp:
        raise ValueError(
            f"query token axis {q.shape[1]} not divisible by {axis_name}={sp}")
    tp = mesh.shape[head_axis] if head_axis else 1
    if heads % tp:
        raise ValueError(f"heads={heads} not divisible by "
                         f"{head_axis}={tp} for head sharding")
    heads_l = heads // tp
    spec = P(batch_axis, axis_name, head_axis)
    ring_kv = k.shape[1] % sp == 0
    kv_spec = spec if ring_kv else P(batch_axis, None, head_axis)
    scale = float(scale)

    if bias is None:
        if ring_kv:
            def local(ql, kl, vl):
                # positional calls throughout: custom_vjp with
                # nondiff_argnums rejects kwargs
                return _ring_attention_local(ql, kl, vl, heads_l, scale,
                                             axis_name, int(sp))
        else:
            def local(ql, kl, vl):
                return _repkv_attention_local(ql, kl, vl, heads_l, scale,
                                              axis_name)

        fn = jax.shard_map(local, mesh=mesh,
                           in_specs=(spec, kv_spec, kv_spec),
                           out_specs=spec, check_vma=False)
        return fn(q, k, v)

    bias_spec = P(batch_axis, None, axis_name if ring_kv else None)
    if ring_kv:
        def local(ql, kl, vl, bl):
            return _ring_attention_local_biased(ql, kl, vl, bl, heads_l,
                                                scale, axis_name, int(sp))
    else:
        def local(ql, kl, vl, bl):
            return _repkv_attention_local_biased(ql, kl, vl, bl, heads_l,
                                                 scale, axis_name)

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(spec, kv_spec, kv_spec, bias_spec),
                       out_specs=spec, check_vma=False)
    return fn(q, k, v, bias)
