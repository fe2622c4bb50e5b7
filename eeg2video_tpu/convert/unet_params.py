"""Stable-Diffusion checkpoint conversion: diffusers torch state dicts ->
Flax variables for UNet3DConditionModel and AutoencoderKL.

Implements the reference's ``from_pretrained_2d`` inflation semantics
(reference EEG2Video_New/Generation/models/unet.py:415-449): every 2-D UNet
weight maps onto the matching pseudo-3D module; keys that only exist in the
3-D model (``attn_temp`` / ``norm_temp``, i.e. '_temp.' keys) are taken from
the freshly initialized Flax model — with attn_temp's zero-initialized output
projection (attention.py:201) the inflated model reproduces the 2-D UNet
exactly on each frame at load time.

Torch key naming follows diffusers 0.11.1 (UNet2DConditionModel /
AutoencoderKL); layout rules are those of convert.torch_params.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from .torch_params import conv_kernel_from_torch, dense_from_torch


def _conv(sd, p):
    out = {"kernel": conv_kernel_from_torch(sd[f"{p}.weight"])}
    if f"{p}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{p}.bias"])
    return out


def _pconv(sd, p):
    # PseudoConv3d wraps an nn.Conv named "conv"
    return {"conv": _conv(sd, p)}


def _dense(sd, p, bias=True):
    out = {"kernel": dense_from_torch(sd[f"{p}.weight"])}
    if bias and f"{p}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{p}.bias"])
    return out


def _norm(sd, p):
    return {"scale": np.asarray(sd[f"{p}.weight"]), "bias": np.asarray(sd[f"{p}.bias"])}


def _resnet3d(sd, p):
    out = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _pconv(sd, f"{p}.conv1"),
        "time_emb_proj": _dense(sd, f"{p}.time_emb_proj"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _pconv(sd, f"{p}.conv2"),
    }
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _pconv(sd, f"{p}.conv_shortcut")
    return out


def _attention(sd, p):
    """CrossAttention / SparseCausalAttention: to_q/k/v no-bias, to_out.0."""
    return {
        "to_q": _dense(sd, f"{p}.to_q", bias=False),
        "to_k": _dense(sd, f"{p}.to_k", bias=False),
        "to_v": _dense(sd, f"{p}.to_v", bias=False),
        "to_out": _dense(sd, f"{p}.to_out.0"),
    }


def _transformer3d(sd, p, init_block=None, num_layers=1):
    """Transformer3DModel.  With ``init_block`` (a freshly initialized Flax
    block tree), missing temporal modules are backfilled from it
    (from_pretrained_2d semantics, unet.py:445-447); with ``init_block=None``
    the state dict must be a 3-D checkpoint carrying attn_temp/norm_temp keys
    (e.g. a reference fine-tuned UNet saved by save_pretrained,
    train_finetune_videodiffusion.py:376-382)."""
    out = {
        "norm": _norm(sd, f"{p}.norm"),
        "proj_in": _conv(sd, f"{p}.proj_in"),
        "proj_out": _conv(sd, f"{p}.proj_out"),
    }
    for i in range(num_layers):
        tb = f"{p}.transformer_blocks.{i}"
        if init_block is None:
            temp = {
                "attn_temp": _attention(sd, f"{tb}.attn_temp"),
                "norm_temp": _norm(sd, f"{tb}.norm_temp"),
            }
        else:
            ib = init_block[f"block{i}"]
            temp = {"attn_temp": ib["attn_temp"], "norm_temp": ib["norm_temp"]}
        out[f"block{i}"] = {
            "attn1": _attention(sd, f"{tb}.attn1"),
            "norm1": _norm(sd, f"{tb}.norm1"),
            "attn2": _attention(sd, f"{tb}.attn2"),
            "norm2": _norm(sd, f"{tb}.norm2"),
            "ff": {
                "proj": _dense(sd, f"{tb}.ff.net.0.proj"),
                "out": _dense(sd, f"{tb}.ff.net.2"),
            },
            "norm3": _norm(sd, f"{tb}.norm3"),
            **temp,
        }
    return out


def unet3d_params_from_torch_2d(sd: Mapping[str, np.ndarray], init_params,
                                n_down=4, layers_per_block=2):
    """diffusers UNet2DConditionModel state dict + fresh Flax init ->
    inflated UNet3DConditionModel params."""
    return _unet3d_params(sd, init_params, n_down, layers_per_block)


def unet3d_params_from_torch_3d(sd: Mapping[str, np.ndarray],
                                n_down=4, layers_per_block=2):
    """Reference 3-D UNet state dict (with attn_temp/norm_temp keys, e.g. a
    fine-tuned checkpoint) -> Flax UNet3DConditionModel params."""
    return _unet3d_params(sd, None, n_down, layers_per_block)


def _unet3d_params(sd, init_params, n_down, layers_per_block):
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p = {
        "conv_in": _pconv(sd, "conv_in"),
        "time_embed_1": _dense(sd, "time_embedding.linear_1"),
        "time_embed_2": _dense(sd, "time_embedding.linear_2"),
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _pconv(sd, "conv_out"),
    }
    for i in range(n_down):
        t = f"down_blocks.{i}"
        blk = {}
        for j in range(layers_per_block):
            blk[f"resnet{j}"] = _resnet3d(sd, f"{t}.resnets.{j}")
            if f"{t}.attentions.{j}.norm.weight" in sd:
                blk[f"attn{j}"] = _transformer3d(
                    sd, f"{t}.attentions.{j}",
                    init_params[f"down{i}"][f"attn{j}"] if init_params else None,
                )
        if f"{t}.downsamplers.0.conv.weight" in sd:
            blk["downsample"] = {"conv": _pconv(sd, f"{t}.downsamplers.0.conv")}
        p[f"down{i}"] = blk

    mid = {
        "resnet0": _resnet3d(sd, "mid_block.resnets.0"),
        "resnet1": _resnet3d(sd, "mid_block.resnets.1"),
        "attn0": _transformer3d(
            sd, "mid_block.attentions.0",
            init_params["mid"]["attn0"] if init_params else None),
    }
    p["mid"] = mid

    n_up_layers = layers_per_block + 1
    for i in range(n_down):
        t = f"up_blocks.{i}"
        blk = {}
        for j in range(n_up_layers):
            blk[f"resnet{j}"] = _resnet3d(sd, f"{t}.resnets.{j}")
            if f"{t}.attentions.{j}.norm.weight" in sd:
                blk[f"attn{j}"] = _transformer3d(
                    sd, f"{t}.attentions.{j}",
                    init_params[f"up{i}"][f"attn{j}"] if init_params else None,
                )
        if f"{t}.upsamplers.0.conv.weight" in sd:
            blk["upsample"] = {"conv": _pconv(sd, f"{t}.upsamplers.0.conv")}
        p[f"up{i}"] = blk
    return {"params": p}


# --- VAE ---------------------------------------------------------------------

def _vae_resnet(sd, p):
    out = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _vae_attn(sd, p):
    return {
        "group_norm": _norm(sd, f"{p}.group_norm"),
        "query": _dense(sd, f"{p}.query"),
        "key": _dense(sd, f"{p}.key"),
        "value": _dense(sd, f"{p}.value"),
        "proj_attn": _dense(sd, f"{p}.proj_attn"),
    }


def vae_params_from_torch(sd: Mapping[str, np.ndarray], n_blocks=4,
                          enc_layers=2):
    """diffusers AutoencoderKL state dict -> Flax AutoencoderKL params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    enc = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "mid_res0": _vae_resnet(sd, "encoder.mid_block.resnets.0"),
        "mid_attn": _vae_attn(sd, "encoder.mid_block.attentions.0"),
        "mid_res1": _vae_resnet(sd, "encoder.mid_block.resnets.1"),
        "conv_norm_out": _norm(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
    }
    for i in range(n_blocks):
        for j in range(enc_layers):
            enc[f"down{i}_res{j}"] = _vae_resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            enc[f"down{i}_downsample"] = _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")

    dec = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid_res0": _vae_resnet(sd, "decoder.mid_block.resnets.0"),
        "mid_attn": _vae_attn(sd, "decoder.mid_block.attentions.0"),
        "mid_res1": _vae_resnet(sd, "decoder.mid_block.resnets.1"),
        "conv_norm_out": _norm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
    }
    for i in range(n_blocks):
        for j in range(enc_layers + 1):
            dec[f"up{i}_res{j}"] = _vae_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            dec[f"up{i}_upsample"] = _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")

    return {"params": {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }}
