"""Fused temporal-attention kernel (ops/temporal.py) vs the rowwise oracle.

The oracle is models.attention3d._temporal_core — itself parity-tested
against the executed reference attn_temp (tests/test_temporal_attention.py)
— so kernel == oracle pins the reference semantics transitively.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eeg2video_tpu.models.attention3d import _temporal_core
from eeg2video_tpu.ops.temporal import temporal_attention


def _mk(rng, n, f, l, heads, d, dtype=np.float32):
    hd = heads * d
    return [rng.standard_normal((n, f, l, hd)).astype(dtype) for _ in range(3)]


def _oracle(q, k, v, heads, scale):
    n, f, l, hd = q.shape
    split = lambda t: t.reshape(n, f, l, heads, hd // heads)
    return _temporal_core(split(q), split(k), split(v), scale).reshape(q.shape)


@pytest.mark.parametrize("n,f,l,heads,d", [
    (2, 6, 64, 8, 40),   # UNet-like (level-3 spatial size, real head geometry)
    (1, 6, 36, 8, 40),   # L=36 exercises the row padding path
    (2, 3, 48, 4, 16),   # tiny-config geometry
])
def test_forward_matches_oracle(rng, n, f, l, heads, d):
    q, k, v = _mk(rng, n, f, l, heads, d)
    scale = 1.0 / np.sqrt(d)
    out = temporal_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                             heads, scale)
    ref = _oracle(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)  # bf16 MXU-GEMM rounding
    # tighter check on the mean error (rounding, not structure)
    assert np.mean(np.abs(np.asarray(out) - np.asarray(ref))) < 2e-3


def test_grads_match_oracle(rng):
    n, f, l, heads, d = 2, 6, 48, 4, 32
    q, k, v = _mk(rng, n, f, l, heads, d)
    scale = 1.0 / np.sqrt(d)
    args = tuple(jnp.asarray(t) for t in (q, k, v))

    def loss_kernel(q, k, v):
        o = temporal_attention(q, k, v, heads, scale)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape) * 0.01))

    def loss_oracle(q, k, v):
        o = _oracle(q, k, v, heads, scale)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape) * 0.01))

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(*args)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2))(*args)
    for a, b, name in zip(gk, go, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-2,
                                   atol=3e-2, err_msg=f"d{name}")
        assert np.mean(np.abs(np.asarray(a) - np.asarray(b))) < 3e-3, name


def test_bf16_inputs(rng):
    n, f, l, heads, d = 1, 6, 64, 8, 40
    q, k, v = _mk(rng, n, f, l, heads, d)
    scale = 1.0 / np.sqrt(d)
    args = tuple(jnp.asarray(t, jnp.bfloat16) for t in (q, k, v))
    out = temporal_attention(*args, heads, scale)
    assert out.dtype == jnp.bfloat16
    ref = _oracle(*(a.astype(jnp.float32) for a in args), heads, scale)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)


def test_tp_partitioning_compiles_without_allgather():
    """On a tp-sharded channel axis the kernel partitions by heads: the
    compiled HLO must contain no all-gather of the (N, F, L, HD) operands."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, ("tp",))
    n, f, l, heads, d = 2, 6, 64, 8, 40
    rng = np.random.default_rng(0)
    q, k, v = _mk(rng, n, f, l, heads, d)
    sh = NamedSharding(mesh, P(None, None, None, "tp"))
    args = tuple(jax.device_put(jnp.asarray(t), sh) for t in (q, k, v))

    def fn(q, k, v):
        return temporal_attention(q, k, v, heads, 0.1)

    txt = jax.jit(fn).lower(*args).compile().as_text()
    assert "all-gather" not in txt

    def loss(q, k, v):
        return jnp.sum(temporal_attention(q, k, v, heads, 0.1) ** 2)

    txt_g = jax.jit(jax.grad(loss, argnums=(0, 1, 2))).lower(*args).compile().as_text()
    assert "all-gather" not in txt_g

    out = jax.jit(fn)(*args)
    ref = _oracle(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads, 0.1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2,
                               atol=2e-2)
