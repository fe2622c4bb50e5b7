"""Fused temporal (frame-axis) attention kernel.

The reference's ``attn_temp`` attends over the 6-frame axis after a
``(b f) d c -> (b d) f c`` rearrange (reference
EEG2Video_New/Generation/models/attention.py:193-202,261-267).  Our model
avoids that transpose with rowwise F x F math over contiguous
(B, F, L, H*D) frame slices (models/attention3d.py) — but each of the 36
(fi, gi) pairs streams whole frame slices from HBM, and the training-step
trace put the rowwise backward at ~16-17 ms/step, AT the HBM roofline
(BENCH_NOTES round 3, lead #4).

This kernel is the "all-heads segmented-reduce design" that lead calls
for: one Pallas pass per row block with all F frames of q/k/v (and dout)
resident in VMEM, so every operand is read from HBM exactly ONCE.  The
per-head dot products never slice 40-lane head groups (a 3.2x VPU waste —
the measured reason a naive in-kernel form loses): the (bl, H*D) -> (bl, H)
segmented reduction rides the MXU as a GEMM against a block-diagonal
one-hot (H*D, H) matrix, and the (bl, H) -> (bl, H*D) probability
broadcast is the transposed GEMM.  Logits/probs live as F*F small (bl, H)
tiles (plain 2-D, no 3-D relayouts); softmax and the dL row terms are
VPU ops on those tiles.

HBM traffic per training step at the level-0 shape drops ~6x (read q/k/v
once forward + q/k/v/dout once backward, write dq/dk/dv once); the MXU
one-hot GEMMs are ~40x the logits' useful FLOPs but total <1 ms at 197
TF/s — cheap insurance against the lane-slicing tax.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _seg(hd, heads, dtype, transpose=False):
    """Block-diagonal one-hot segment matrix: (hd, heads) mapping lane ->
    head (or its transpose).  Built from iota in-kernel — never touches HBM."""
    d = hd // heads
    shape = (heads, hd) if transpose else (hd, heads)
    lane = lax.broadcasted_iota(jnp.int32, shape, 1 if transpose else 0)
    head = lax.broadcasted_iota(jnp.int32, shape, 0 if transpose else 1)
    return (lane // d == head).astype(dtype)


def _softmax_tiles(cols):
    """Numerically-stable softmax across a list of (bl, H) logit tiles."""
    m = cols[0]
    for c in cols[1:]:
        m = jnp.maximum(m, c)
    es = [jnp.exp(c - m) for c in cols]
    s = es[0]
    for e in es[1:]:
        s = s + e
    return [e / s for e in es]


def _probs(q_ref, k_ref, heads, f, scale):
    """Logit tiles + softmax.  GEMM operands round to the INPUT dtype: bf16
    inputs take bf16 MXU passes (flash-kernel convention), f32 inputs keep
    an f32 path so the executed-reference parity suite holds at 3e-5."""
    hd = q_ref.shape[-1]
    dt = q_ref.dtype
    seg = _seg(hd, heads, dt)
    qs = [q_ref[0, fi].astype(jnp.float32) for fi in range(f)]
    ks = [k_ref[0, gi].astype(jnp.float32) for gi in range(f)]
    ps = []
    for fi in range(f):
        cols = [
            lax.dot((qs[fi] * ks[gi] * scale).astype(dt), seg,
                    preferred_element_type=jnp.float32)  # (bl, H)
            for gi in range(f)
        ]
        ps.append(_softmax_tiles(cols))
    return qs, ks, ps


def _temporal_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, heads, f, scale):
    hd = q_ref.shape[-1]
    dt = q_ref.dtype
    seg_t = _seg(hd, heads, dt, transpose=True)
    _, _, ps = _probs(q_ref, k_ref, heads, f, scale)
    for fi in range(f):
        acc = jnp.zeros(q_ref.shape[-2:], jnp.float32)
        for gi in range(f):
            pb = lax.dot(ps[fi][gi].astype(dt), seg_t,
                         preferred_element_type=jnp.float32)  # (bl, hd)
            acc = acc + pb * v_ref[0, gi].astype(jnp.float32)
        o_ref[0, fi] = acc.astype(o_ref.dtype)


def _temporal_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                         *, heads, f, scale):
    hd = q_ref.shape[-1]
    dt = q_ref.dtype
    seg = _seg(hd, heads, dt)
    seg_t = _seg(hd, heads, dt, transpose=True)
    qs, ks, ps = _probs(q_ref, k_ref, heads, f, scale)
    vs = [v_ref[0, gi].astype(jnp.float32) for gi in range(f)]
    dos = [do_ref[0, fi].astype(jnp.float32) for fi in range(f)]

    # dp[fi][gi] = per-head <dout_fi, v_gi>; dL = p * (dp - rowsum(p*dp))
    dls = []
    for fi in range(f):
        dp = [
            lax.dot((dos[fi] * vs[gi]).astype(dt), seg,
                    preferred_element_type=jnp.float32)
            for gi in range(f)
        ]
        r = ps[fi][0] * dp[0]
        for gi in range(1, f):
            r = r + ps[fi][gi] * dp[gi]
        dls.append([ps[fi][gi] * (dp[gi] - r) for gi in range(f)])

    def bcast(tile):  # (bl, H) -> (bl, hd), head value on its lanes
        return lax.dot(tile.astype(dt), seg_t,
                       preferred_element_type=jnp.float32)

    # each broadcast GEMM feeds BOTH dq (x k) and dk (x q): compute once
    dlb = [[bcast(dls[fi][gi] * scale) for gi in range(f)] for fi in range(f)]
    for fi in range(f):
        acc = jnp.zeros(q_ref.shape[-2:], jnp.float32)
        for gi in range(f):
            acc = acc + dlb[fi][gi] * ks[gi]
        dq_ref[0, fi] = acc.astype(dq_ref.dtype)
    for gi in range(f):
        acck = jnp.zeros(q_ref.shape[-2:], jnp.float32)
        accv = jnp.zeros(q_ref.shape[-2:], jnp.float32)
        for fi in range(f):
            acck = acck + dlb[fi][gi] * qs[fi]
            accv = accv + bcast(ps[fi][gi]) * dos[fi]
        dk_ref[0, gi] = acck.astype(dk_ref.dtype)
        dv_ref[0, gi] = accv.astype(dv_ref.dtype)


_BLOCKS = (512, 384, 288, 256, 192, 144, 128, 96, 64, 48, 32, 16)


def _row_block(l):
    lp = -(-l // 16) * 16
    for bl in _BLOCKS:
        if lp % bl == 0 and bl <= lp:
            return lp, bl
    raise AssertionError(f"unreachable: 16 divides lp={lp}")  # 16 in _BLOCKS


def _pad_rows(x, lp):
    l = x.shape[2]
    if l == lp:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, lp - l), (0, 0)))


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def _temporal_fwd_pallas(q, k, v, heads, scale, interpret=False):
    n, f, l, hd = q.shape
    lp, bl = _row_block(l)
    q, k, v = (_pad_rows(t, lp) for t in (q, k, v))
    spec = pl.BlockSpec((1, f, bl, hd), lambda i, j: (i, 0, j, 0))
    out = pl.pallas_call(
        functools.partial(_temporal_fwd_kernel, heads=heads, f=f, scale=scale),
        out_shape=jax.ShapeDtypeStruct((n, f, lp, hd), q.dtype),
        grid=(n, lp // bl),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :l]


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def _temporal_bwd_pallas(q, k, v, do, heads, scale, interpret=False):
    n, f, l, hd = q.shape
    lp, bl = _row_block(l)
    q, k, v, do = (_pad_rows(t, lp) for t in (q, k, v, do))
    spec = pl.BlockSpec((1, f, bl, hd), lambda i, j: (i, 0, j, 0))
    shape = jax.ShapeDtypeStruct((n, f, lp, hd), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_temporal_bwd_kernel, heads=heads, f=f, scale=scale),
        out_shape=(shape, shape, shape),
        grid=(n, lp // bl),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, v, do)
    return dq[:, :, :l], dk[:, :, :l], dv[:, :, :l]


# --- GSPMD partitioning (same pattern as ops.attention): batch (n) and
# heads (the compound (h d) channel factor) shard; f/l/d replicate. ---------

def _spec_get(spec, i):
    return spec[i] if i < len(spec) else None


def _axis_size(mesh, names):
    if names is None:
        return 1
    if isinstance(names, (tuple, list)):
        size = 1
        for a in names:
            size *= mesh.shape[a]
        return size
    return mesh.shape[names]


@functools.lru_cache(maxsize=None)
def _fwd_cp(heads, head_dim, scale, interpret):
    from jax.experimental.custom_partitioning import (
        CompoundFactor,
        SdyShardingRule,
        custom_partitioning,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    @custom_partitioning
    def f(q, k, v):
        return _temporal_fwd_pallas(q, k, v, heads, scale, interpret=interpret)

    def _shardings(mesh, q_sharding):
        spec = getattr(q_sharding, "spec", P())
        n_ax, c_ax = _spec_get(spec, 0), _spec_get(spec, 3)
        tp = _axis_size(mesh, c_ax)
        if heads % tp != 0:
            c_ax, tp = None, 1
        return NamedSharding(mesh, P(n_ax, None, None, c_ax)), tp

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        s, _ = _shardings(mesh, arg_shapes[0].sharding)
        return s

    def partition(mesh, arg_shapes, result_shape):
        s, tp = _shardings(mesh, arg_shapes[0].sharding)

        def lower_fn(q, k, v):
            return _temporal_fwd_pallas(q, k, v, heads // tp, scale,
                                        interpret=interpret)

        return mesh, lower_fn, s, (s, s, s)

    hd = CompoundFactor("h", "d")
    rule = SdyShardingRule(
        (("n", "f", "l", hd),) * 3, (("n", "f", "l", hd),),
        need_replication_factors=("f", "l", "d"),
        h=heads, d=head_dim,
    )
    f.def_partition(infer_sharding_from_operands=infer_sharding_from_operands,
                    partition=partition, sharding_rule=rule)
    return f


@functools.lru_cache(maxsize=None)
def _bwd_cp(heads, head_dim, scale, interpret):
    from jax.experimental.custom_partitioning import (
        CompoundFactor,
        SdyShardingRule,
        custom_partitioning,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    @custom_partitioning
    def f(q, k, v, do):
        return _temporal_bwd_pallas(q, k, v, do, heads, scale,
                                    interpret=interpret)

    def _shardings(mesh, q_sharding):
        spec = getattr(q_sharding, "spec", P())
        n_ax, c_ax = _spec_get(spec, 0), _spec_get(spec, 3)
        tp = _axis_size(mesh, c_ax)
        if heads % tp != 0:
            c_ax, tp = None, 1
        return NamedSharding(mesh, P(n_ax, None, None, c_ax)), tp

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        s, _ = _shardings(mesh, arg_shapes[0].sharding)
        return (s, s, s)

    def partition(mesh, arg_shapes, result_shape):
        s, tp = _shardings(mesh, arg_shapes[0].sharding)

        def lower_fn(q, k, v, do):
            return _temporal_bwd_pallas(q, k, v, do, heads // tp, scale,
                                        interpret=interpret)

        return mesh, lower_fn, (s, s, s), (s, s, s, s)

    hd = CompoundFactor("h", "d")
    rule = SdyShardingRule(
        (("n", "f", "l", hd),) * 4, (("n", "f", "l", hd),) * 3,
        need_replication_factors=("f", "l", "d"),
        h=heads, d=head_dim,
    )
    f.def_partition(infer_sharding_from_operands=infer_sharding_from_operands,
                    partition=partition, sharding_rule=rule)
    return f


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def temporal_attention(q, k, v, heads, scale):
    """Frame-axis multi-head attention on packed (N, F, L, H*D) tensors.

    Equivalent math to models.attention3d._temporal_core (the reference
    attn_temp semantics, attention.py:261-267) with q/k/v consumed exactly
    as the Dense projections emit them — no (B*L, F, C) rearrange, no
    per-head slicing.
    """
    interpret = jax.default_backend() != "tpu"
    return _fwd_cp(heads, q.shape[-1] // heads, scale, interpret)(q, k, v)


def _fwd_rule(q, k, v, heads, scale):
    from jax.ad_checkpoint import checkpoint_name

    # named INSIDE the fwd rule (what a remat'd backward re-traces) so the
    # UNet's save_only_these_names policy keeps the kernel output instead of
    # re-running the forward pass — same pattern as the flash/FF kernels
    # (BENCH_NOTES round 3, "flash_out" checkpoint_name)
    out = checkpoint_name(temporal_attention(q, k, v, heads, scale),
                          "flash_out")
    return out, (q, k, v)


def _bwd_rule(heads, scale, res, do):
    q, k, v = res
    interpret = jax.default_backend() != "tpu"
    do = do.astype(q.dtype)
    return _bwd_cp(heads, q.shape[-1] // heads, scale, interpret)(q, k, v, do)


temporal_attention.defvjp(_fwd_rule, _bwd_rule)
