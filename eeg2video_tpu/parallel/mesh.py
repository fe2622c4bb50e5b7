"""Device mesh / sharding utilities — the TPU-native replacement for the
reference's HF-Accelerate DDP layer (reference train_finetune_videodiffusion.py:99-102,
240-242; SURVEY.md section 2.5).

Design: a 2-D logical mesh ("dp", "tp").  Data parallelism shards the batch
axis over "dp"; tensor parallelism shards large weight matrices over "tp"
(used by the 387M-parameter semantic predictor and optionally the UNet).
All collectives are mesh-axis reductions inserted by GSPMD — ICI-ridden on a
real slice, simulated on the virtual CPU mesh in tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1, sp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp[, sp], tp) mesh.  ``dp*sp*tp`` must equal the device
    count.  The "sp" (sequence/context-parallel ring attention, ops.ring)
    axis is only materialized when sp > 1, so existing (dp, tp) call sites
    and their GSPMD shardings are unchanged."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp * sp * tp != n:
        raise ValueError(f"dp*sp*tp = {dp*sp*tp} != {n} devices")
    if sp > 1:
        arr = np.asarray(devices).reshape(dp, sp, tp)
        return Mesh(arr, axis_names=("dp", "sp", "tp"))
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh, rules):
    """Apply ``rules`` (a callable path -> PartitionSpec or None) to a pytree
    of parameters and device_put accordingly.  ``None`` means replicate."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def place(path, leaf):
        spec = rules(path) if rules is not None else None
        return jax.device_put(leaf, NamedSharding(mesh, spec or P()))

    leaves = [place(p, l) for p, l in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def fsdp_spec(shape, base_spec, dp: int, axis_name: str = "dp") -> P:
    """ZeRO-3-style spec for one parameter: add ``axis_name`` on the largest
    dimension that is divisible by ``dp`` and not already sharded by
    ``base_spec`` (the tp rule).  Returns ``base_spec`` unchanged when no
    dimension qualifies (small/odd leaves stay replicated — GSPMD would pad
    them otherwise)."""
    base = tuple(base_spec) if base_spec is not None else ()
    base = base + (None,) * (len(shape) - len(base))
    cands = [d for d in range(len(shape))
             if base[d] is None and shape[d] % dp == 0 and shape[d] >= dp]
    if not cands:
        return P(*base) if any(base) else P()
    d = max(cands, key=lambda i: shape[i])
    new = list(base)
    new[d] = axis_name
    return P(*new)


def shard_params_fsdp(params, mesh: Mesh, base_rules=None, axis_name: str = "dp"):
    """Fully-sharded data parallelism for a parameter (or optimizer-state)
    pytree: every leaf is sharded over the ``dp`` mesh axis on its largest
    eligible dimension, on top of any tensor-parallel ``base_rules``.

    With params placed this way, the jitted train step (which infers input
    shardings) makes GSPMD all-gather each weight at its use site and
    reduce-scatter its gradient — ZeRO-3 semantics with zero trainer-code
    changes.  Per-chip param+optimizer memory drops ~dp-fold; the reference
    has no analog (its only strategy is replicated DDP, SURVEY.md 2.5).

    Leaves whose shape has no dp-divisible dimension (biases at odd sizes,
    scalars such as optimizer counts) stay at ``base_rules``/replicated."""
    dp = mesh.shape[axis_name]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def place(path, leaf):
        base = base_rules(path) if base_rules is not None else None
        spec = fsdp_spec(np.shape(leaf), base, dp, axis_name)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    leaves = [place(p, l) for p, l in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def is_host0() -> bool:
    """Replacement for accelerator.is_main_process guards
    (reference train_finetune_videodiffusion.py:123, 264)."""
    return jax.process_index() == 0
