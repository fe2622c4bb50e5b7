"""Split-skip ResnetBlock3D: the up-block path computes the exact
concat([x, skip]) math from per-half operands (resnet3d.py) — these tests pin
the equivalence against an explicit concat reference and the remat-policy
behavior that motivated it.

Reference semantics: EEG2Video_New/Generation/models/unet_blocks.py:442-444
(torch.cat([hidden_states, res_hidden_states], dim=1) before each up-block
resnet)."""

import io
import contextlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eeg2video_tpu.models.resnet3d import ResnetBlock3D


def _params_for(block, x, temb, skip):
    return block.init(jax.random.key(0), x, temb, skip=skip)["params"]


def _concat_reference(params, x, skip, temb, features, groups=32, eps=1e-6):
    """The reference math on the materialized concat, f32 numpy-style."""
    cat = jnp.concatenate([x, skip], axis=-1).astype(jnp.float32)
    b, f, hh, ww, c = cat.shape

    def gn(t, scale, bias):
        g = t.reshape(b, f, hh, ww, groups, t.shape[-1] // groups)
        mean = g.mean(axis=(1, 2, 3, 5), keepdims=True)
        var = g.var(axis=(1, 2, 3, 5), keepdims=True)
        out = (g - mean) / jnp.sqrt(var + eps)
        out = out.reshape(t.shape)
        return out * scale + bias

    def conv(t, kern, bias):
        folded = t.reshape(b * f, hh, ww, t.shape[-1])
        out = jax.lax.conv_general_dilated(
            folded, kern, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out.reshape(b, f, hh, ww, -1) + bias

    h = jax.nn.silu(gn(cat, params["norm1"]["scale"], params["norm1"]["bias"]))
    h = conv(h, params["conv1"]["conv"]["kernel"].astype(jnp.float32),
             params["conv1"]["conv"]["bias"])
    t = jax.nn.silu(temb.astype(jnp.float32))
    t = t @ params["time_emb_proj"]["kernel"] + params["time_emb_proj"]["bias"]
    h = h + t[:, None, None, None, :]
    h = jax.nn.silu(gn(h, params["norm2"]["scale"], params["norm2"]["bias"]))
    h = conv(h, params["conv2"]["conv"]["kernel"].astype(jnp.float32),
             params["conv2"]["conv"]["bias"])
    short = (cat @ params["conv_shortcut"]["conv"]["kernel"][0, 0].astype(jnp.float32)
             + params["conv_shortcut"]["conv"]["bias"])
    return short + h


@pytest.mark.parametrize("train", [False, True])
def test_skip_matches_concat(train):
    rng = np.random.default_rng(0)
    b, f, hh, ww = 2, 3, 8, 16
    cx, cs, feat = 64, 32, 32
    x = jnp.asarray(rng.standard_normal((b, f, hh, ww, cx)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((b, f, hh, ww, cs)), jnp.float32)
    temb = jnp.asarray(rng.standard_normal((b, feat * 4)), jnp.float32)

    block = ResnetBlock3D(feat, groups=8)
    params = _params_for(block, x, temb, skip)
    got = block.apply({"params": params}, x, temb, skip=skip, train=train)
    want = _concat_reference(params, x, skip, temb, feat, groups=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_skip_param_tree_matches_concat_module():
    """The split-skip block must keep the exact param tree of a plain block
    called on the concat (checkpoint compatibility)."""
    rng = np.random.default_rng(1)
    b, f, hh, ww = 1, 2, 4, 8
    cx, cs, feat = 32, 16, 16
    x = jnp.asarray(rng.standard_normal((b, f, hh, ww, cx)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((b, f, hh, ww, cs)), jnp.float32)
    temb = jnp.asarray(rng.standard_normal((b, feat * 4)), jnp.float32)
    cat = jnp.concatenate([x, skip], axis=-1)

    block = ResnetBlock3D(feat, groups=8)
    tree_skip = jax.tree_util.tree_map(
        lambda a: (a.shape, str(a.dtype)),
        block.init(jax.random.key(0), x, temb, skip=skip)["params"])
    tree_cat = jax.tree_util.tree_map(
        lambda a: (a.shape, str(a.dtype)),
        block.init(jax.random.key(0), cat, temb)["params"])
    assert tree_skip == tree_cat


def test_skip_gradients_flow():
    rng = np.random.default_rng(2)
    b, f, hh, ww = 1, 2, 4, 8
    cx, cs, feat = 32, 16, 16
    x = jnp.asarray(rng.standard_normal((b, f, hh, ww, cx)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((b, f, hh, ww, cs)), jnp.float32)
    temb = jnp.asarray(rng.standard_normal((b, feat * 4)), jnp.float32)
    block = ResnetBlock3D(feat, groups=8)
    params = _params_for(block, x, temb, skip)

    def loss(p, x, s):
        return jnp.sum(jnp.square(
            block.apply({"params": p}, x, temb, skip=s, train=True)))

    gp, gx, gs = jax.grad(loss, argnums=(0, 1, 2))(params, x, skip)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(gp))
    assert float(jnp.abs(gx).sum()) > 0
    assert float(jnp.abs(gs).sum()) > 0


def test_remat_policy_saves_flash_and_ff_outputs():
    """The unet3d remat policy ("flash_out"/"ff_out" names inside the
    custom_vjp fwd rules) must make the kernel outputs saveable — i.e. the
    backward-side recompute does not re-launch the forward kernels."""
    from jax.ad_checkpoint import print_saved_residuals
    from eeg2video_tpu.ops.attention import fused_attention_packed

    def f(q, k, v):
        g = jax.checkpoint(
            lambda q, k, v: fused_attention_packed(q, k, v, 2).sum(),
            policy=jax.checkpoint_policies.save_only_these_names(
                "resnet_conv", "flash_out", "ff_out"))
        return g(q, k, v)

    q = jnp.ones((2, 256, 16), jnp.float32)  # Lq >= _FLASH_MIN_LQ
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        print_saved_residuals(f, q, q, q)
    assert "named 'flash_out'" in buf.getvalue()
