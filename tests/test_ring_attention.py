"""Ring (context-parallel, "sp") attention vs the single-device packed path.

Exactness contract: ring attention is the flash online-softmax combine
lifted to mesh hops, so outputs AND gradients must match the single-device
``fused_attention_packed`` to kernel tolerance at every ring size.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eeg2video_tpu.ops import fused_attention_packed
from eeg2video_tpu.ops.ring import ring_attention_packed

HEADS, D = 2, 40
N, L = 2, 512  # L/sp = 128 local tokens at sp=4


def _qkv(seed, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(
        rng.standard_normal((N, L, HEADS * D)), dtype=dtype)
    return mk(), mk(), mk()


def _sp_mesh(sp):
    return Mesh(np.asarray(jax.devices()[:sp]), ("sp",))


@pytest.mark.parametrize("sp", [1, 2, 4])
def test_forward_matches_single_device(sp):
    q, k, v = _qkv(0)
    ref = fused_attention_packed(q, k, v, HEADS)
    out = ring_attention_packed(q, k, v, HEADS, _sp_mesh(sp))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_grads_match_single_device():
    q, k, v = _qkv(1)
    cot = jnp.asarray(
        np.random.default_rng(2).standard_normal((N, L, HEADS * D)),
        jnp.float32)
    mesh = _sp_mesh(4)

    def loss_ref(q, k, v):
        return jnp.sum(fused_attention_packed(q, k, v, HEADS) * cot)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention_packed(q, k, v, HEADS, mesh) * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5, err_msg=f"d{name}")


def test_dp_times_sp_mesh():
    """Batch over dp and tokens over sp simultaneously (2x4 of the 8-device
    CPU mesh); inputs pre-placed with the global sharding."""
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("dp", "sp"))
    q, k, v = _qkv(3)
    sh = NamedSharding(mesh, P("dp", "sp", None))
    q, k, v = (jax.device_put(x, sh) for x in (q, k, v))
    ref = fused_attention_packed(q, k, v, HEADS)
    out = ring_attention_packed(q, k, v, HEADS, mesh, batch_axis="dp")
    assert out.sharding.is_equivalent_to(sh, out.ndim)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_bf16_operands():
    q, k, v = _qkv(4, jnp.bfloat16)
    ref = fused_attention_packed(q, k, v, HEADS)
    out = ring_attention_packed(q, k, v, HEADS, _sp_mesh(2))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2)


def test_indivisible_tokens_raise():
    q, k, v = _qkv(5)
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention_packed(q[:, :500], k[:, :500], v[:, :500], HEADS,
                              _sp_mesh(8))


def test_replicated_kv_mode_forward_and_grads():
    """Lkv not divisible by sp (the 77-token cross-attention context): the
    query side shards, k/v stay replicated, dk/dv psum over the ring —
    exact vs the single-device path."""
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.standard_normal((N, L, HEADS * D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((N, 77, HEADS * D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((N, 77, HEADS * D)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((N, L, HEADS * D)), jnp.float32)
    mesh = _sp_mesh(4)

    out = ring_attention_packed(q, k, v, HEADS, mesh)
    ref = fused_attention_packed(q, k, v, HEADS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) * cot)

    g_ring = jax.grad(loss(lambda q, k, v: ring_attention_packed(
        q, k, v, HEADS, mesh)), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss(lambda q, k, v: fused_attention_packed(
        q, k, v, HEADS)), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5, err_msg=f"d{name}")


def _bias(seed, lkv=L):
    rng = np.random.default_rng(seed)
    # mask-like: a random half of the keys carry -1e4 (the reference's
    # (1-m)*-1e4 attention_mask contract), plus small dense noise so dbias
    # has structure
    mask = (rng.uniform(size=(N, 1, lkv)) < 0.5) * -1e4
    return jnp.asarray(mask + rng.standard_normal((N, 1, lkv)), jnp.float32)


@pytest.mark.parametrize("sp", [2, 4])
def test_biased_ring_forward_and_grads(sp):
    """Round 5: the (N, 1, Lkv) bias rides the ring — its KV-aligned shard
    rotates with the K/V block — and out/dq/dk/dv/dbias all match the
    single-device biased packed path."""
    q, k, v = _qkv(3)
    bias = _bias(4)
    cot = jnp.asarray(
        np.random.default_rng(5).standard_normal((N, L, HEADS * D)),
        jnp.float32)
    mesh = _sp_mesh(sp)

    ref = fused_attention_packed(q, k, v, HEADS, bias=bias)
    out = ring_attention_packed(q, k, v, HEADS, mesh, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss_ref(q, k, v, bias):
        return jnp.sum(fused_attention_packed(q, k, v, HEADS, bias=bias) * cot)

    def loss_ring(q, k, v, bias):
        return jnp.sum(
            ring_attention_packed(q, k, v, HEADS, mesh, bias=bias) * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(g_ring, g_ref, ["q", "k", "v", "bias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5, err_msg=f"d{name}")


def test_biased_repkv_forward_and_grads():
    """Indivisible KV (the 77-token cross-attention shape) with a bias:
    replicated-KV mode, dbias psummed over the ring by shard_map."""
    q, k, v = _qkv(6)
    k, v = k[:, :77], v[:, :77]
    bias = _bias(7, lkv=77)
    cot = jnp.asarray(
        np.random.default_rng(8).standard_normal((N, L, HEADS * D)),
        jnp.float32)
    mesh = _sp_mesh(4)

    ref = fused_attention_packed(q, k, v, HEADS, bias=bias)
    out = ring_attention_packed(q, k, v, HEADS, mesh, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss_ref(q, k, v, bias):
        return jnp.sum(fused_attention_packed(q, k, v, HEADS, bias=bias) * cot)

    def loss_ring(q, k, v, bias):
        return jnp.sum(
            ring_attention_packed(q, k, v, HEADS, mesh, bias=bias) * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(g_ring, g_ref, ["q", "k", "v", "bias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5, err_msg=f"d{name}")


@pytest.mark.parametrize("with_bias", [False, True])
def test_sp_tp_head_sharded_composition(with_bias):
    """Round 5: head-sharding tp composes with the ring on a (sp, tp) mesh
    — attention is per-head independent, so each shard runs the ring over
    heads//tp heads; out and all grads match single-device."""
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("sp", "tp"))
    q, k, v = _qkv(9)
    bias = _bias(10) if with_bias else None
    cot = jnp.asarray(
        np.random.default_rng(11).standard_normal((N, L, HEADS * D)),
        jnp.float32)

    ref = fused_attention_packed(q, k, v, HEADS, bias=bias)
    out = ring_attention_packed(q, k, v, HEADS, mesh, head_axis="tp",
                                bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    args = (q, k, v) if bias is None else (q, k, v, bias)

    def loss_ref(*a):
        return jnp.sum(fused_attention_packed(*a[:3], HEADS,
                                              bias=a[3] if len(a) > 3
                                              else None) * cot)

    def loss_ring(*a):
        return jnp.sum(ring_attention_packed(
            *a[:3], HEADS, mesh, head_axis="tp",
            bias=a[3] if len(a) > 3 else None) * cot)

    nums = tuple(range(len(args)))
    g_ref = jax.grad(loss_ref, argnums=nums)(*args)
    g_ring = jax.grad(loss_ring, argnums=nums)(*args)
    for a, b, name in zip(g_ring, g_ref, ["q", "k", "v", "bias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5, err_msg=f"d{name}")


def test_head_sharding_requires_divisible_heads():
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("sp", "tp"))
    q, k, v = _qkv(12)
    with pytest.raises(ValueError, match="heads"):
        ring_attention_packed(q, k, v, 2, mesh, head_axis="tp")
