"""Pallas flash attention x GSPMD: the packed kernel must PARTITION under a
(dp, tp) mesh, not silently replicate (VERDICT round-1 weak #3 / next #4).

custom_partitioning + SdyShardingRule declare batch (dim 0) and the head-major
packed channel dim (dim 2) shardable; lq/lkv/head_dim must stay whole.  The
tests run the flash shape (Lq >= 256, interpret-mode Pallas on the CPU mesh),
assert numerical equality with the replicated run, and assert the compiled
HLO contains NO all-gather (replication would insert one per operand).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eeg2video_tpu.ops.attention import fused_attention_packed

H, D = 8, 40


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()).reshape(2, 4), ("dp", "tp"))


def _inputs(rng, N=2, L=256, Lkv=384):
    q = rng.standard_normal((N, L, H * D)).astype(np.float32)
    k = rng.standard_normal((N, Lkv, H * D)).astype(np.float32)
    v = rng.standard_normal((N, Lkv, H * D)).astype(np.float32)
    return q, k, v


def test_tp_sharded_flash_matches_replicated(mesh, rng):
    q, k, v = _inputs(rng)
    sh = NamedSharding(mesh, P("dp", None, "tp"))
    fn = lambda q, k, v: fused_attention_packed(q, k, v, H)
    with mesh:
        out = np.asarray(jax.jit(fn, in_shardings=(sh, sh, sh))(q, k, v))
    ref = np.asarray(fn(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_tp_sharded_flash_does_not_allgather(mesh, rng):
    q, k, v = _inputs(rng)
    sh = NamedSharding(mesh, P("dp", None, "tp"))
    fn = lambda q, k, v: fused_attention_packed(q, k, v, H)
    txt = jax.jit(fn, in_shardings=(sh, sh, sh)).lower(q, k, v).compile().as_text()
    assert txt.count("all-gather") == 0, "flash kernel replicated under tp"


def test_tp_sharded_flash_grad_matches(mesh, rng):
    q, k, v = _inputs(rng)
    sh = NamedSharding(mesh, P("dp", None, "tp"))

    def loss(q, k, v):
        return jnp.sum(fused_attention_packed(q, k, v, H) ** 2)

    with mesh:
        gs = jax.jit(jax.grad(loss, (0, 1, 2)), in_shardings=(sh, sh, sh))(q, k, v)
    gr = jax.grad(loss, (0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_tp_sharded_flash_grad_does_not_allgather(mesh, rng):
    """Round 3: the BACKWARD is partitioned too (_bwd_cp) — a tp-sharded
    training step must not all-gather around the grad pallas_calls."""
    q, k, v = _inputs(rng)
    sh = NamedSharding(mesh, P("dp", None, "tp"))

    def loss(q, k, v):
        return jnp.sum(fused_attention_packed(q, k, v, H) ** 2)

    txt = (jax.jit(jax.grad(loss, (0, 1, 2)), in_shardings=(sh, sh, sh))
           .lower(q, k, v).compile().as_text())
    assert txt.count("all-gather") == 0, "flash backward replicated under tp"


def test_tp_sharded_biased_flash_matches_replicated(mesh, rng):
    """Round 4: the BIASED forward+backward are partitioned too
    (_packed_cp(with_bias=True) / _biased_bwd_cp) — previously masked
    attention was the one unpartitioned kernel surface.  dq/dk/dv shard on
    heads like the unbiased pass; dbias (head-shared) psums over the head
    shards.  Mask contract: reference unet.py:314-317."""
    q, k, v = _inputs(rng)
    bias = ((rng.random((2, 1, 384)) > 0.3) * -1e4).astype(np.float32)
    sh = NamedSharding(mesh, P("dp", None, "tp"))
    bsh = NamedSharding(mesh, P("dp", None, None))

    def loss(q, k, v, bias):
        return jnp.sum(fused_attention_packed(q, k, v, H, bias=bias) ** 2)

    fn = lambda q, k, v, b: fused_attention_packed(q, k, v, H, bias=b)
    with mesh:
        out = np.asarray(jax.jit(fn, in_shardings=(sh, sh, sh, bsh))(q, k, v, bias))
        gs = jax.jit(jax.grad(loss, (0, 1, 2, 3)),
                     in_shardings=(sh, sh, sh, bsh))(q, k, v, bias)
    ref = np.asarray(fn(*(jnp.asarray(x) for x in (q, k, v, bias))))
    gr = jax.grad(loss, (0, 1, 2, 3))(*(jnp.asarray(x) for x in (q, k, v, bias)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    for a, b, name in zip(gs, gr, ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4, err_msg=name)


def test_tp_sharded_biased_flash_does_not_allgather(mesh, rng):
    q, k, v = _inputs(rng)
    bias = np.zeros((2, 1, 384), np.float32)
    sh = NamedSharding(mesh, P("dp", None, "tp"))
    bsh = NamedSharding(mesh, P("dp", None, None))

    def loss(q, k, v, bias):
        return jnp.sum(fused_attention_packed(q, k, v, H, bias=bias) ** 2)

    txt = (jax.jit(jax.grad(loss, (0, 1, 2, 3)),
                   in_shardings=(sh, sh, sh, bsh))
           .lower(q, k, v, bias).compile().as_text())
    assert txt.count("all-gather") == 0, "biased flash replicated under tp"


def test_odd_tp_falls_back_to_replicated_channels(mesh, rng):
    """heads=8 not divisible by a 3-way split can't happen on this mesh, but
    a sharding proposal that lands inside a head must be rejected: sharding
    over 'tp'=4 with heads=2 (head size 160) forces channel replication."""
    N, L = 2, 256
    q = rng.standard_normal((N, L, 2 * 160)).astype(np.float32)
    k = rng.standard_normal((N, L, 2 * 160)).astype(np.float32)
    v = rng.standard_normal((N, L, 2 * 160)).astype(np.float32)
    sh = NamedSharding(mesh, P("dp", None, "tp"))
    fn = lambda q, k, v: fused_attention_packed(q, k, v, 2)
    with mesh:
        out = np.asarray(jax.jit(fn, in_shardings=(sh, sh, sh))(q, k, v))
    ref = np.asarray(fn(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
