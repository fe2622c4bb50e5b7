"""Flash-attention kernel correctness (interpret mode on CPU) and gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eeg2video_tpu.ops import fused_attention, mha_reference
from eeg2video_tpu.ops.attention import _flash_attention


@pytest.mark.parametrize(
    "B,H,Lq,Lkv,D",
    [
        (1, 2, 256, 512, 40),    # level-0-like, padded head dim
        (2, 2, 300, 600, 64),    # non-multiple seq lengths (mask path)
        (1, 1, 2304, 4608, 40),  # the real sparse-causal level-0 shape
    ],
)
def test_flash_matches_reference(rng, B, H, Lq, Lkv, D):
    q = rng.standard_normal((B, H, Lq, D)).astype(np.float32)
    k = rng.standard_normal((B, H, Lkv, D)).astype(np.float32)
    v = rng.standard_normal((B, H, Lkv, D)).astype(np.float32)
    ref = np.asarray(mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    out = np.asarray(_flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                      1.0 / np.sqrt(D)))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_dispatcher_short_seq_uses_xla(rng):
    q = rng.standard_normal((2, 4, 6, 40)).astype(np.float32)  # temporal attn shape
    k = rng.standard_normal((2, 4, 6, 40)).astype(np.float32)
    v = rng.standard_normal((2, 4, 6, 40)).astype(np.float32)
    out = fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    ref = mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_flash_gradients_match_reference(rng):
    B, H, Lq, Lkv, D = 1, 2, 256, 512, 40
    q = rng.standard_normal((B, H, Lq, D)).astype(np.float32)
    k = rng.standard_normal((B, H, Lkv, D)).astype(np.float32)
    v = rng.standard_normal((B, H, Lkv, D)).astype(np.float32)
    scale = 1.0 / np.sqrt(D)

    def loss_flash(q, k, v):
        return jnp.sum(_flash_attention(q, k, v, scale) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, scale) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_flash_gradients_masked_shapes(rng):
    """Backward with non-block-multiple Lq/Lkv (mask + padding paths)."""
    B, H, Lq, Lkv, D = 1, 2, 300, 450, 40
    q = rng.standard_normal((B, H, Lq, D)).astype(np.float32)
    k = rng.standard_normal((B, H, Lkv, D)).astype(np.float32)
    v = rng.standard_normal((B, H, Lkv, D)).astype(np.float32)
    scale = 1.0 / np.sqrt(D)

    gf = jax.grad(lambda q, k, v: jnp.sum(_flash_attention(q, k, v, scale) ** 2),
                  argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    gr = jax.grad(lambda q, k, v: jnp.sum(mha_reference(q, k, v, scale) ** 2),
                  argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def _packed_ref(q, k, v, heads, scale):
    n, lq, hd = q.shape
    lkv, d = k.shape[1], hd // heads
    split = lambda t, l: t.reshape(n, l, heads, d).transpose(0, 2, 1, 3)
    out = mha_reference(split(q, lq), split(k, lkv), split(v, lkv), scale)
    return out.transpose(0, 2, 1, 3).reshape(n, lq, hd)


@pytest.mark.parametrize("N,H,Lq,Lkv,D", [
    (2, 4, 256, 512, 40),   # exact-pad (the generation/training shapes)
    (1, 2, 300, 450, 40),   # non-multiple rows (padded-tail safety)
])
def test_packed_flash_gradients_match_reference(rng, N, H, Lq, Lkv, D):
    """The packed-layout Pallas backward (channels-minor dq/dkv passes) vs
    XLA reference grads."""
    from eeg2video_tpu.ops.attention import fused_attention_packed

    q = jnp.asarray(rng.standard_normal((N, Lq, H * D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((N, Lkv, H * D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((N, Lkv, H * D)).astype(np.float32))
    scale = 1.0 / np.sqrt(D)

    gf = jax.grad(lambda *a: jnp.sum(fused_attention_packed(*a, H, scale) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: jnp.sum(_packed_ref(*a, H, scale) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
