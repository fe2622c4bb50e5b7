"""Flax -> torch-state-dict export: the inverse of the convert.* loaders, so
checkpoints flow BOTH ways between this framework and the reference
("identical checkpoints-in/outputs-out", BASELINE.md).  Exported dicts load
directly into the reference's model classes (verified round-trip in tests).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(x):
    return np.asarray(x)


def conv_to_torch(kernel):  # (kh, kw, I, O) -> (O, I, kh, kw)
    return np.transpose(_t(kernel), (3, 2, 0, 1))


def dense_to_torch(kernel):  # (I, O) -> (O, I)
    return np.transpose(_t(kernel))


def _emit_dense(sd, prefix, p):
    sd[f"{prefix}.weight"] = dense_to_torch(p["kernel"])
    if "bias" in p:
        sd[f"{prefix}.bias"] = _t(p["bias"])


def _emit_conv(sd, prefix, p):
    sd[f"{prefix}.weight"] = conv_to_torch(p["kernel"])
    if "bias" in p:
        sd[f"{prefix}.bias"] = _t(p["bias"])


def _emit_bn(sd, prefix, params, stats):
    sd[f"{prefix}.weight"] = _t(params["scale"])
    sd[f"{prefix}.bias"] = _t(params["bias"])
    sd[f"{prefix}.running_mean"] = _t(stats["mean"])
    sd[f"{prefix}.running_var"] = _t(stats["var"])
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def encoder_to_torch(name: str, variables) -> Dict[str, np.ndarray]:
    """Any reference encoder (models.py:105-413) Flax variables -> torch
    state dict; inverse of torch_params.encoder_params_from_torch, driven by
    the same per-architecture spec tables so the two can't drift."""
    from .torch_params import _SPECS

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}

    def emit_spec(spec, p, s, torch_root=""):
        for flax_name, kind, tprefix in spec:
            full = f"{torch_root}{tprefix}"
            if kind == "conv":
                _emit_conv(sd, full, p[flax_name])
            elif kind == "dense":
                _emit_dense(sd, full, p[flax_name])
            elif kind == "bn":
                _emit_bn(sd, full, p[flax_name], s[flax_name])

    if name in _SPECS:
        emit_spec(_SPECS[name], params, stats)
        return sd
    if name == "glfnet":
        emit_spec(_SPECS["shallownet"], params["globalnet"],
                  stats["globalnet"], "globalnet.")
        emit_spec(_SPECS["shallownet"], params["occipital_localnet"],
                  stats["occipital_localnet"], "occipital_localnet.")
        _emit_dense(sd, "out", params["out"])
        return sd
    if name == "glfnet_mlp":
        return glfnet_mlp_to_torch(variables)
    if name == "conformer":
        return _conformer_to_torch(params, stats)
    raise ValueError(f"no exporter for encoder '{name}'")


def _conformer_to_torch(p, s) -> Dict[str, np.ndarray]:
    """Inverse of torch_params._convert_conformer (reference models.py:343-350:
    Sequential of PatchEmbedding(0), TransformerEncoder(1),
    ClassificationHead(2))."""
    sd: Dict[str, np.ndarray] = {}
    _emit_conv(sd, "0.shallownet.0", p["patch_conv1"])
    _emit_conv(sd, "0.shallownet.1", p["patch_conv2"])
    _emit_bn(sd, "0.shallownet.2", p["patch_bn"], s["patch_bn"])
    _emit_conv(sd, "0.projection.0", p["patch_proj"])
    _emit_dense(sd, "2.fc.0", p["fc"])
    # the reference ClassificationHead's clshead branch is DEAD (forward uses
    # only fc, models.py:337-340); emit identity-LN + zero-Linear filler so
    # strict load_state_dict succeeds
    emb_size = _t(p["patch_proj"]["kernel"]).shape[-1]
    out_dim = _t(p["fc"]["kernel"]).shape[-1]
    sd["2.clshead.1.weight"] = np.ones((emb_size,), np.float32)
    sd["2.clshead.1.bias"] = np.zeros((emb_size,), np.float32)
    sd["2.clshead.2.weight"] = np.zeros((out_dim, emb_size), np.float32)
    sd["2.clshead.2.bias"] = np.zeros((out_dim,), np.float32)
    for d in range(3):
        root = f"1.{d}"
        ln1 = p[f"block{d}_ln1"]
        sd[f"{root}.0.fn.0.weight"] = _t(ln1["scale"])
        sd[f"{root}.0.fn.0.bias"] = _t(ln1["bias"])
        mha = p[f"block{d}_mha"]
        for flax_name, t in [("queries", "queries"), ("keys", "keys"),
                             ("values", "values"), ("projection", "projection")]:
            _emit_dense(sd, f"{root}.0.fn.1.{t}", mha[flax_name])
        ln2 = p[f"block{d}_ln2"]
        sd[f"{root}.1.fn.0.weight"] = _t(ln2["scale"])
        sd[f"{root}.1.fn.0.bias"] = _t(ln2["bias"])
        _emit_dense(sd, f"{root}.1.fn.1.0", p[f"block{d}_ff1"])
        _emit_dense(sd, f"{root}.1.fn.1.3", p[f"block{d}_ff2"])
    return sd


def semantic_to_torch(variables) -> Dict[str, np.ndarray]:
    """SemanticPredictor -> reference CLIP-MLP state dict (mlp.0/2/4/6/8,
    eeg_text.py:11-33)."""
    p = variables["params"]
    sd: Dict[str, np.ndarray] = {}
    for i, name in enumerate(["fc0", "fc1", "fc2", "fc3", "out"]):
        _emit_dense(sd, f"mlp.{2 * i}", p[name])
    return sd


def mlpnet_to_torch(params, prefix="") -> Dict[str, np.ndarray]:
    """MLPNet -> reference mlpnet Sequential keys (models.py:375-390)."""
    sd: Dict[str, np.ndarray] = {}
    for flax_name, t in [("fc1", "net.1"), ("fc2", "net.3"), ("fc3", "net.5")]:
        _emit_dense(sd, f"{prefix}{t}", params[flax_name])
    return sd


def glfnet_mlp_to_torch(variables) -> Dict[str, np.ndarray]:
    """GLFNetMLP -> reference glfnet_mlp keys (models.py:392-413)."""
    p = variables["params"]
    sd = {}
    sd.update(mlpnet_to_torch(p["globalnet"], "globalnet."))
    sd.update(mlpnet_to_torch(p["occipital_localnet"], "occipital_localnet."))
    _emit_dense(sd, "out", p["out"])
    return sd


def seq2seq_to_torch(variables) -> Dict[str, np.ndarray]:
    """Seq2SeqTransformer -> reference myTransformer state dict
    (my_autoregressive_transformer.py:123-149); the unused nn.Embedding
    (reference L129) is emitted zero-filled for load_state_dict
    compatibility."""
    p = variables["params"]
    s = variables["batch_stats"]["eeg_embedding"]
    sd: Dict[str, np.ndarray] = {}

    ee = p["eeg_embedding"]
    sd["eeg_embedding.block_1.1.weight"] = conv_to_torch(ee["conv1"]["kernel"])
    _emit_bn(sd, "eeg_embedding.block_1.2", ee["bn1"], s["bn1"])
    sd["eeg_embedding.block_2.0.weight"] = conv_to_torch(ee["conv2"]["kernel"])
    _emit_bn(sd, "eeg_embedding.block_2.1", ee["bn2"], s["bn2"])
    sd["eeg_embedding.block_3.1.weight"] = conv_to_torch(ee["conv3"]["kernel"])
    sd["eeg_embedding.block_3.2.weight"] = conv_to_torch(ee["conv4"]["kernel"])
    _emit_bn(sd, "eeg_embedding.block_3.3", ee["bn3"], s["bn3"])
    _emit_dense(sd, "eeg_embedding.embedding", ee["embedding"])

    _emit_dense(sd, "img_embedding", p["img_embedding"])
    _emit_dense(sd, "txtpredictor", p["txtpredictor"])
    _emit_dense(sd, "predictor", p["predictor"])
    sd["embedding.weight"] = np.zeros((10, 512), np.float32)
    # PE buffer (reference registers it via register_buffer, L112)
    from ..models.seq2seq import sinusoidal_positions

    sd["positional_encoding.pe"] = sinusoidal_positions(5000, 512)[None]

    def emit_mha(prefix, m):
        qw = dense_to_torch(m["q_proj"]["kernel"])
        kw = dense_to_torch(m["k_proj"]["kernel"])
        vw = dense_to_torch(m["v_proj"]["kernel"])
        sd[f"{prefix}.in_proj_weight"] = np.concatenate([qw, kw, vw], axis=0)
        sd[f"{prefix}.in_proj_bias"] = np.concatenate(
            [_t(m["q_proj"]["bias"]), _t(m["k_proj"]["bias"]), _t(m["v_proj"]["bias"])])
        _emit_dense(sd, f"{prefix}.out_proj", m["out_proj"])

    def emit_ln(prefix, ln):
        sd[f"{prefix}.weight"] = _t(ln["scale"])
        sd[f"{prefix}.bias"] = _t(ln["bias"])

    for i in range(2):
        root = f"transformer_encoder.layers.{i}"
        layer = p[f"enc{i}"]
        emit_mha(f"{root}.self_attn", layer["self_attn"])
        _emit_dense(sd, f"{root}.linear1", layer["linear1"])
        _emit_dense(sd, f"{root}.linear2", layer["linear2"])
        emit_ln(f"{root}.norm1", layer["norm1"])
        emit_ln(f"{root}.norm2", layer["norm2"])
    for i in range(4):
        root = f"transformer_decoder.layers.{i}"
        layer = p[f"dec{i}"]
        emit_mha(f"{root}.self_attn", layer["self_attn"])
        emit_mha(f"{root}.multihead_attn", layer["cross_attn"])
        _emit_dense(sd, f"{root}.linear1", layer["linear1"])
        _emit_dense(sd, f"{root}.linear2", layer["linear2"])
        emit_ln(f"{root}.norm1", layer["norm1"])
        emit_ln(f"{root}.norm2", layer["norm2"])
        emit_ln(f"{root}.norm3", layer["norm3"])
    return sd


def save_torch_state_dict(sd: Dict[str, np.ndarray], path: str):
    import torch

    torch.save({"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                               for k, v in sd.items()}}, path)
