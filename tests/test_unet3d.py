"""UNet3D / VAE: shape contracts, 2D-inflation equivalence property, and
converter structural round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import chex

from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from eeg2video_tpu.models.vae import AutoencoderKL, VAEConfig
from eeg2video_tpu.convert.unet_params import (
    unet3d_params_from_torch_2d,
    vae_params_from_torch,
)

CFG = UNet3DConfig.tiny()


@pytest.fixture(scope="module")
def unet_and_params():
    model = UNet3DConditionModel(CFG)
    sample = np.zeros((1, 2, 12, 16, 4), np.float32)
    ctx = np.zeros((1, 7, CFG.cross_attention_dim), np.float32)
    variables = model.init(jax.random.key(0), sample, jnp.asarray([3]), ctx)
    return model, variables


def test_unet_forward_shapes(unet_and_params, rng):
    model, variables = unet_and_params
    # 12x16 is NOT divisible by 2**3 — exercises forced upsample sizes, the
    # same situation as the real 36x64 latents (reference unet.py:300-311)
    sample = rng.standard_normal((2, 2, 12, 16, 4)).astype(np.float32)
    ctx = rng.standard_normal((2, 7, CFG.cross_attention_dim)).astype(np.float32)
    out = model.apply(variables, sample, jnp.asarray([1, 999]), ctx)
    assert out.shape == (2, 2, 12, 16, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_identical_frames_collapse_to_2d(unet_and_params, rng):
    """At init attn_temp's out-proj is zero, so with every frame identical the
    3-D UNet must reduce to the 2-D UNet: all frame outputs equal."""
    model, variables = unet_and_params
    frame = rng.standard_normal((1, 1, 12, 16, 4)).astype(np.float32)
    sample = np.broadcast_to(frame, (1, 3, 12, 16, 4)).copy()
    ctx = rng.standard_normal((1, 7, CFG.cross_attention_dim)).astype(np.float32)
    out = np.asarray(model.apply(variables, sample, jnp.asarray([42]), ctx))
    np.testing.assert_allclose(out[:, 0], out[:, 1], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(out[:, 0], out[:, 2], rtol=2e-5, atol=2e-5)


# --- synthetic diffusers-style state dicts (inverse of the converter) --------

def _inv_leaf(flax_path, leaf):
    """flax (path, array) -> (torch_suffix, torch-shaped array) inverse rules."""
    name = flax_path[-1]
    arr = np.asarray(leaf)
    if name == "kernel":
        if arr.ndim == 4:  # conv (kh,kw,I,O) -> (O,I,kh,kw)
            return "weight", np.transpose(arr, (3, 2, 0, 1))
        return "weight", np.transpose(arr)  # dense
    if name == "scale":
        return "weight", arr
    return "bias", arr


def _unet_flax_to_torch_key(path):
    """Map a flax param path (strings) to the diffusers 2-D torch key prefix.
    Returns None for keys absent from 2-D checkpoints (_temp modules)."""
    p = list(path)
    if "attn_temp" in p or "norm_temp" in p:
        return None
    out = []
    i = 0
    top = p[0]
    trans = {
        "conv_in": "conv_in", "conv_out": "conv_out", "conv_norm_out": "conv_norm_out",
        "time_embed_1": "time_embedding.linear_1", "time_embed_2": "time_embedding.linear_2",
    }
    if top in trans:
        key = trans[top]
        return key  # possible trailing pseudo-conv "conv" handled by caller
    m = {"down": "down_blocks", "up": "up_blocks"}
    if top.startswith("down") or top.startswith("up"):
        blocks = m["down" if top.startswith("down") else "up"]
        idx = top[len("down" if top.startswith("down") else "up"):]
        base = f"{blocks}.{idx}"
        sub = p[1]
        if sub.startswith("resnet"):
            return f"{base}.resnets.{sub[len('resnet'):]}"
        if sub.startswith("attn"):
            return f"{base}.attentions.{sub[len('attn'):]}"
        if sub == "downsample":
            return f"{base}.downsamplers.0.conv"
        if sub == "upsample":
            return f"{base}.upsamplers.0.conv"
    if top == "mid":
        sub = p[1]
        if sub.startswith("resnet"):
            return f"mid_block.resnets.{sub[len('resnet'):]}"
        if sub.startswith("attn"):
            return f"mid_block.attentions.{sub[len('attn'):]}"
    raise KeyError(path)


def _attn_suffix(rest):
    mapping = {
        ("norm",): "norm", ("proj_in",): "proj_in", ("proj_out",): "proj_out",
    }
    if tuple(rest[:1]) in mapping and len(rest) == 2:
        return mapping[tuple(rest[:1])]
    # block{i} -> transformer_blocks.{i}
    blk = rest[0]
    i = blk[len("block"):]
    inner = rest[1]
    tb = f"transformer_blocks.{i}"
    if inner in ("attn1", "attn2"):
        proj = rest[2]
        if proj == "to_out":
            return f"{tb}.{inner}.to_out.0"
        return f"{tb}.{inner}.{proj}"
    if inner in ("norm1", "norm2", "norm3"):
        return f"{tb}.{inner}"
    if inner == "ff":
        return f"{tb}.ff.net.0.proj" if rest[2] == "proj" else f"{tb}.ff.net.2"
    raise KeyError(rest)


def synthetic_torch_unet_sd(init_params):
    """Walk the flax init tree and emit the diffusers-2D-named state dict."""
    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(init_params)[0]
    for path, leaf in flat:
        keys = [k.key for k in path]
        if "attn_temp" in keys or "norm_temp" in keys:
            continue
        suffix, arr = _inv_leaf(keys, leaf)
        # strip pseudo-conv nesting "conv"
        clean = [k for k in keys[:-1] if k != "conv"]
        base = _unet_flax_to_torch_key(clean)
        rest = clean[1:] if clean[0].startswith(("down", "up", "mid")) else []
        if clean[0] == "mid" or clean[0].startswith(("down", "up")):
            sub = clean[1]
            if sub.startswith("attn") and len(clean) > 2:
                base = base + "." + _attn_suffix(clean[2:] + [keys[-1]])
            elif sub.startswith("resnet"):
                base = base + "." + clean[2]
        sd[f"{base}.{suffix}"] = arr + 1.0  # shift so fresh-init != converted
    return sd


def test_unet_converter_structural_roundtrip(unet_and_params):
    model, variables = unet_and_params
    init_params = variables["params"]
    sd = synthetic_torch_unet_sd(init_params)
    converted = unet3d_params_from_torch_2d(sd, init_params)
    chex.assert_trees_all_equal_shapes(converted["params"], init_params)
    # non-temp leaves must equal sd values (+1 shift), temp leaves fresh init
    conv_in = converted["params"]["conv_in"]["conv"]["kernel"]
    ref = np.transpose(sd["conv_in.weight"], (2, 3, 1, 0))
    np.testing.assert_array_equal(np.asarray(conv_in), ref)


# --- VAE ---------------------------------------------------------------------

def test_vae_shapes_and_converter(rng):
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    variables = vae.init(jax.random.key(0), x)
    mean, logvar = vae.apply(variables, x, method=AutoencoderKL.encode)
    assert mean.shape == (2, 4, 4, 4)
    rec = vae.apply(variables, mean, method=AutoencoderKL.decode)
    assert rec.shape == (2, 32, 32, 3)

    # structural inverse round-trip
    sd = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables["params"])[0]:
        keys = [k.key for k in path]
        suffix, arr = _inv_leaf(keys, leaf)
        parts = keys[:-1]
        top = parts[0]
        if top in ("quant_conv", "post_quant_conv"):
            tkey = top
        else:
            coder = top  # encoder / decoder
            name = parts[1]
            if name in ("conv_in", "conv_out", "conv_norm_out"):
                tkey = f"{coder}.{name}"
            elif name.startswith("mid_res"):
                tkey = f"{coder}.mid_block.resnets.{name[-1]}" + ("." + parts[2] if len(parts) > 2 else "")
            elif name == "mid_attn":
                tkey = f"{coder}.mid_block.attentions.0." + parts[2]
            elif "_downsample" in name:
                i = name[len("down"):name.index("_")]
                tkey = f"{coder}.down_blocks.{i}.downsamplers.0.conv"
            elif "_upsample" in name:
                i = name[len("up"):name.index("_")]
                tkey = f"{coder}.up_blocks.{i}.upsamplers.0.conv"
            elif "_res" in name:
                kind = "down_blocks" if name.startswith("down") else "up_blocks"
                i = name[len("down" if name.startswith("down") else "up"):name.index("_")]
                j = name[name.index("_res") + 4:]
                tkey = f"{coder}.{kind}.{i}.resnets.{j}" + ("." + parts[2] if len(parts) > 2 else "")
            else:
                raise KeyError(name)
            if name.startswith("mid_res") or "_res" in name:
                pass
        sd[f"{tkey}.{suffix}"] = arr
    converted = vae_params_from_torch(sd, n_blocks=4, enc_layers=cfg.layers_per_block)
    chex.assert_trees_all_equal_shapes(converted["params"], variables["params"])
