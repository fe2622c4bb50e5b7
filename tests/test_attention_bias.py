"""Additive attention-bias operand (VERDICT round-1 missing #5 / next #8):
the fused kernel takes the reference's converted attention_mask
((1-m)*-1e4, unet.py:314-317) as one extra operand, masked-add before the
online softmax.  Tested against the XLA path, through grad, and end to end
through the UNet."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eeg2video_tpu.ops.attention import fused_attention_packed

H, D = 8, 40


def test_flash_bias_matches_xla(rng):
    N, L, Lkv = 2, 256, 300
    q = rng.standard_normal((N, L, H * D)).astype(np.float32)
    k = rng.standard_normal((N, Lkv, H * D)).astype(np.float32)
    v = rng.standard_normal((N, Lkv, H * D)).astype(np.float32)
    mask = (rng.random((N, 1, Lkv)) > 0.3).astype(np.float32)
    bias = (1.0 - mask) * -10000.0
    out = np.asarray(fused_attention_packed(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H, bias=jnp.asarray(bias)))

    from eeg2video_tpu.ops.attention import _packed_xla

    ref = np.asarray(_packed_xla(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v), jnp.asarray(bias), H,
                                 1.0 / np.sqrt(D)))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
    # masked columns must have (near-)zero influence: fully masking all but
    # one column reproduces that column's value row
    one = np.full((N, 1, Lkv), -10000.0, np.float32)
    one[:, :, 7] = 0.0
    out1 = np.asarray(fused_attention_packed(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H, bias=jnp.asarray(one)))
    np.testing.assert_allclose(out1, np.broadcast_to(v[:, 7:8], out1.shape),
                               rtol=1e-3, atol=1e-3)


def test_flash_bias_grad_matches_xla(rng):
    N, L = 1, 256
    q = jnp.asarray(rng.standard_normal((N, L, H * D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((N, L, H * D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((N, L, H * D)).astype(np.float32))
    bias = jnp.asarray(
        ((rng.random((N, 1, L)) > 0.2) - 1.0) * 10000.0).astype(jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(fused_attention_packed(q, k, v, H, bias=bias) ** 2)

    from eeg2video_tpu.ops.attention import _packed_xla

    def loss_xla(q, k, v):
        return jnp.sum(_packed_xla(q, k, v, bias, H, 1.0 / np.sqrt(D)) ** 2)

    gf = jax.grad(loss_flash, (0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, (0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_flash_bias_grad_includes_dbias(rng):
    """The Pallas biased backward (round 3): grads wrt q/k/v AND the bias
    itself match the XLA formulation, on ragged (padded) lengths."""
    N, L, Lkv = 2, 300, 420
    q = jnp.asarray(rng.standard_normal((N, L, H * D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((N, Lkv, H * D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((N, Lkv, H * D)).astype(np.float32))
    bias = jnp.asarray(
        rng.standard_normal((N, 1, Lkv)).astype(np.float32))  # soft bias

    def loss_flash(q, k, v, b):
        return jnp.sum(fused_attention_packed(q, k, v, H, bias=b) ** 2)

    from eeg2video_tpu.ops.attention import _packed_xla

    def loss_xla(q, k, v, b):
        return jnp.sum(_packed_xla(q, k, v, b, H, 1.0 / np.sqrt(D)) ** 2)

    gf = jax.grad(loss_flash, (0, 1, 2, 3))(q, k, v, bias)
    gx = jax.grad(loss_xla, (0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gf, gx):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_unet_attention_mask(rng):
    """all-ones mask == no mask; zeroing a spatial region changes the
    output there at every level (the mask is stride-2-tracked)."""
    from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig

    cfg = UNet3DConfig.micro()  # 2 levels: one stride-2 mask resample
    model = UNet3DConditionModel(cfg)
    x = rng.standard_normal((1, 2, 12, 16, 4)).astype(np.float32)
    ctx = rng.standard_normal((1, 7, cfg.cross_attention_dim)).astype(np.float32)
    variables = model.init(jax.random.key(0), x, jnp.asarray([3]), ctx)

    base = np.asarray(model.apply(variables, x, jnp.asarray([3]), ctx))
    ones = np.ones((1, 12, 16), np.float32)
    masked_same = np.asarray(model.apply(variables, x, jnp.asarray([3]), ctx,
                                         attention_mask=jnp.asarray(ones)))
    np.testing.assert_allclose(masked_same, base, rtol=1e-5, atol=1e-5)

    hole = ones.copy()
    hole[:, :6, :8] = 0.0
    masked = np.asarray(model.apply(variables, x, jnp.asarray([3]), ctx,
                                    attention_mask=jnp.asarray(hole)))
    assert not np.allclose(masked, base, atol=1e-4)
    assert np.all(np.isfinite(masked))


def test_unet_attention_mask_under_sp(rng):
    """Round 5: masked attention no longer exits the ring path — the
    (N, 1, Lkv) mask bias rides the ring (KV-aligned shards rotating with
    their K/V blocks), so the masked UNet forward AND backward under an
    sp mesh match the single-device masked run."""
    from jax.sharding import Mesh

    from eeg2video_tpu.models import attention3d
    from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig

    cfg = UNet3DConfig.micro()
    model = UNet3DConditionModel(cfg)
    x = rng.standard_normal((1, 2, 12, 16, 4)).astype(np.float32)
    ctx = rng.standard_normal((1, 7, cfg.cross_attention_dim)).astype(np.float32)
    variables = model.init(jax.random.key(0), x, jnp.asarray([3]), ctx)
    hole = np.ones((1, 12, 16), np.float32)
    hole[:, :6, :8] = 0.0
    hole = jnp.asarray(hole)

    def fwd(v):
        return model.apply(v, x, jnp.asarray([3]), ctx, attention_mask=hole)

    def loss(v):
        return jnp.sum(fwd(v) ** 2)

    ref = np.asarray(fwd(variables))
    g_ref = jax.grad(loss)(variables)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    with attention3d.sp_scope(mesh):
        out = np.asarray(fwd(variables))
        g_sp = jax.grad(loss)(variables)

    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
    flat_sp = {jax.tree_util.keystr(p): l for p, l in
               jax.tree_util.tree_leaves_with_path(g_sp)}
    for p, leaf in jax.tree_util.tree_leaves_with_path(g_ref):
        name = jax.tree_util.keystr(p)
        np.testing.assert_allclose(np.asarray(flat_sp[name]),
                                   np.asarray(leaf), rtol=5e-5, atol=5e-5,
                                   err_msg=name)
