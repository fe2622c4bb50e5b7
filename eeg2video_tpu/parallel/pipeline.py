"""GPipe-style pipeline parallelism ("pp") over a mesh axis.

Completes the mesh-dimension set (dp batch / tp Megatron / sp ring
attention / FSDP ZeRO-3) with stage parallelism for deep stacks of
HOMOGENEOUS blocks — the canonical fit is N identical layers whose
inter-stage activation shape is constant (transformer layers, the semantic
predictor's 10000-wide hidden stack).  The reference has no analog: its
only distribution strategy is replicated DDP (SURVEY.md section 2.5).

TPU-native formulation (the "collective pipelining" recipe): each device
holds ONE stage's parameters (the stacked leading axis sharded over "pp"),
and a single ``lax.scan`` runs ``n_micro + pp - 1`` ticks.  Every tick,
every device applies its stage to its current activation and hands the
result to the next device with a one-hop ``lax.ppermute`` (neighbor ICI on
a real slice, overlappable with the next tick's compute).  Stage 0 injects
microbatch t at tick t; the last stage's results are psum-broadcast so the
caller sees a replicated output.  Bubble fraction is the textbook
(pp-1)/(n_micro+pp-1) — pick n_micro >> pp.

The whole schedule is differentiable as written (scan + ppermute +
where-masked injection/collection all have exact VJPs; ppermute's is the
inverse permutation), so ``jax.grad`` through a pipelined forward yields
the same gradients as the sequential stack — asserted in
tests/test_pipeline_parallel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def _gpipe_local(stage_params, x, fn, axis_name, pp, n_micro):
    """Shard-level GPipe schedule.

    stage_params: this device's stage slice (leading pp axis already split
    by shard_map, length 1) — squeezed before use.
    x: (n_micro, mb, ...) microbatched input, replicated across stages.
    Returns (n_micro, mb, ...) outputs, identical on every device.
    """
    stage_params = jax.tree.map(lambda p: p[0], stage_params)
    idx = lax.axis_index(axis_name)
    is_first = idx == 0
    is_last = idx == pp - 1
    zero_mb = jnp.zeros_like(x[0])
    outs0 = jnp.zeros((n_micro,) + x.shape[1:], x.dtype)
    fwd = [(j, (j + 1) % pp) for j in range(pp)]

    def tick(carry, t):
        recv, outs = carry
        # stage 0 swaps in microbatch t (zeros once the feed is exhausted —
        # those bubble ticks' outputs are masked out of `outs` below)
        feed = lax.dynamic_index_in_dim(
            x, jnp.minimum(t, n_micro - 1), keepdims=False)
        feed = jnp.where(t < n_micro, feed, zero_mb)
        a = jnp.where(is_first, feed, recv)
        y = fn(stage_params, a)
        # last stage: microbatch t emerges at tick t + pp - 1
        s = jnp.clip(t - (pp - 1), 0, n_micro - 1)
        cur = lax.dynamic_index_in_dim(outs, s, keepdims=False)
        val = jnp.where(is_last & (t >= pp - 1), y, cur)
        outs = lax.dynamic_update_index_in_dim(outs, val, s, axis=0)
        # hand y to the next stage (the wrap back into stage 0 is dead —
        # overwritten by the injection above)
        recv = lax.ppermute(y, axis_name, fwd)
        return (recv, outs), None

    (_, outs), _ = lax.scan(tick, (zero_mb, outs0),
                            jnp.arange(n_micro + pp - 1))
    # replicate the last stage's collected outputs to every device
    return lax.psum(jnp.where(is_last, outs, jnp.zeros_like(outs)),
                    axis_name)


def gpipe_apply(fn, stacked_params, x, mesh: Mesh, n_micro: int,
                axis_name: str = "pp"):
    """Run ``x`` through ``pp`` pipelined stages of ``fn``.

    fn: (stage_params, (mb, ...)) -> (mb, ...) — one homogeneous block;
    input and output activation shapes must match (constant inter-stage
    width).
    stacked_params: pytree whose leaves carry a leading stage axis of size
    ``mesh.shape[axis_name]`` (e.g. ``jax.tree.map(lambda *l: jnp.stack(l),
    *per_stage_params)``); sharded over "pp" so each device holds one stage.
    x: (batch, ...) global input, split into ``n_micro`` microbatches.
    Returns (batch, ...) outputs, replicated over the pp axis.
    """
    pp = mesh.shape[axis_name]
    b = x.shape[0]
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by n_micro={n_micro}")
    xm = x.reshape((n_micro, b // n_micro) + x.shape[1:])

    param_specs = jax.tree.map(
        lambda p: P(axis_name, *([None] * (p.ndim - 1))), stacked_params)

    run = jax.shard_map(
        functools.partial(_gpipe_local, fn=fn, axis_name=axis_name,
                          pp=int(pp), n_micro=int(n_micro)),
        mesh=mesh, in_specs=(param_specs, P()), out_specs=P(),
        check_vma=False)
    out = run(stacked_params, xm)
    return out.reshape((b,) + out.shape[2:])
