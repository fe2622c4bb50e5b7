"""Dual-KV sparse-causal attention (round 3): the fused kernel takes the
shared frame-0 K/V ONCE per batch element (BlockSpec-indexed n//m) instead of
the reference's materialized concat (attention.py:292-301).  Forward, biased
forward, full gradient set, and the tp/dp custom_partitioning are checked
against the explicit-concat packed path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eeg2video_tpu.ops.attention import (fused_attention_dual,
                                         fused_attention_packed)

H, D = 8, 40


def _inputs(rng, b=2, m=4, l=256):
    q = jnp.asarray(rng.standard_normal((b * m, l, H * D)).astype(np.float32))
    k0 = jnp.asarray(rng.standard_normal((b, l, H * D)).astype(np.float32))
    v0 = jnp.asarray(rng.standard_normal((b, l, H * D)).astype(np.float32))
    k1 = jnp.asarray(rng.standard_normal((b * m, l, H * D)).astype(np.float32))
    v1 = jnp.asarray(rng.standard_normal((b * m, l, H * D)).astype(np.float32))
    return q, k0, v0, k1, v1


def _concat(k0, v0, k1, v1, b, m):
    l, hd = k0.shape[1], k0.shape[2]
    kg = jnp.concatenate(
        [jnp.broadcast_to(k0[:, None], (b, m, l, hd)).reshape(b * m, l, hd),
         k1], axis=1)
    vg = jnp.concatenate(
        [jnp.broadcast_to(v0[:, None], (b, m, l, hd)).reshape(b * m, l, hd),
         v1], axis=1)
    return kg, vg


@pytest.mark.parametrize("b,m,l", [(2, 4, 256), (1, 3, 300)])
def test_dual_matches_concat(rng, b, m, l):
    q, k0, v0, k1, v1 = _inputs(rng, b, m, l)
    out = np.asarray(fused_attention_dual(q, k0, v0, k1, v1, H, m=m))
    kg, vg = _concat(k0, v0, k1, v1, b, m)
    ref = np.asarray(fused_attention_packed(q, kg, vg, H))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_dual_biased_matches_concat(rng):
    b, m, l = 2, 4, 256
    q, k0, v0, k1, v1 = _inputs(rng, b, m, l)
    # frame-0-half bias, previous-frame half unmasked (the reference's
    # F.pad-by-query-length quirk, attention.py:318-321)
    bias0 = jnp.asarray(
        ((rng.random((b, 1, l)) > 0.3) - 1.0) * 10000.0).astype(jnp.float32)
    out = np.asarray(fused_attention_dual(q, k0, v0, k1, v1, H, m=m,
                                          bias0=bias0))
    kg, vg = _concat(k0, v0, k1, v1, b, m)
    bias = jnp.repeat(jnp.concatenate([bias0, jnp.zeros_like(bias0)],
                                      axis=-1), m, axis=0)
    ref = np.asarray(fused_attention_packed(q, kg, vg, H, bias=bias))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_dual_grads_match_concat(rng):
    b, m, l = 2, 3, 256
    q, k0, v0, k1, v1 = _inputs(rng, b, m, l)

    def loss_dual(q, k0, v0, k1, v1):
        return jnp.sum(fused_attention_dual(q, k0, v0, k1, v1, H, m=m) ** 2)

    def loss_concat(q, k0, v0, k1, v1):
        kg, vg = _concat(k0, v0, k1, v1, b, m)
        return jnp.sum(fused_attention_packed(q, kg, vg, H) ** 2)

    gd = jax.grad(loss_dual, (0, 1, 2, 3, 4))(q, k0, v0, k1, v1)
    gc = jax.grad(loss_concat, (0, 1, 2, 3, 4))(q, k0, v0, k1, v1)
    for name, a, bb in zip("q k0 v0 k1 v1".split(), gd, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_dual_short_sequence_falls_back(rng):
    """l below the flash threshold routes to the concat/XLA path and stays
    differentiable."""
    b, m, l = 2, 2, 32
    q, k0, v0, k1, v1 = _inputs(rng, b, m, l)
    out = fused_attention_dual(q, k0, v0, k1, v1, H, m=m)
    kg, vg = _concat(k0, v0, k1, v1, b, m)
    ref = fused_attention_packed(q, kg, vg, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dual_tp_sharded_matches(rng):
    """Under the (dp, tp) mesh the compound (nb m) batch factor shards nb
    and heads shard on tp — output equals the replicated run, no gathers."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("dp", "tp"))
    b, m, l = 2, 4, 256
    q, k0, v0, k1, v1 = _inputs(rng, b, m, l)
    big = NamedSharding(mesh, P("dp", None, "tp"))
    small = NamedSharding(mesh, P("dp", None, "tp"))

    fn = lambda *a: fused_attention_dual(*a, H, m=m)
    with mesh:
        out = np.asarray(jax.jit(
            fn, in_shardings=(big, small, small, big, big))(q, k0, v0, k1, v1))
    ref = np.asarray(fn(q, k0, v0, k1, v1))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
    txt = (jax.jit(fn, in_shardings=(big, small, small, big, big))
           .lower(q, k0, v0, k1, v1).compile().as_text())
    assert txt.count("all-gather") == 0, "dual kernel replicated under tp"
