"""Torch-checkpoint -> Flax parameter conversion for the EEG encoders.

The reference stores either plain ``state_dict`` checkpoints
(eeg_text.py:175, my_autoregressive_transformer.py:391) or whole pickled
modules (EEG_VP_train_test.py:167).  These converters take a *state dict as
a name->ndarray mapping* (load it with torch on the host; this module is
torch-free) and emit the matching Flax variable tree, satisfying the
"identical checkpoints-in/outputs-out" requirement of BASELINE.md.

Layout rules:
- torch Conv2d weight (O, I, kh, kw)  ->  flax kernel (kh, kw, I, O)
- torch Linear weight (O, I)          ->  flax kernel (I, O)
  (valid because the Flax encoders flatten activations in torch NCHW order
  — see encoders._flatten_as_torch)
- BatchNorm weight/bias -> scale/bias; running stats -> batch_stats.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def conv_kernel_from_torch(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def dense_from_torch(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


def bn_from_torch(sd: Mapping[str, np.ndarray], prefix: str):
    params = {"scale": np.asarray(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}
    stats = {"mean": np.asarray(sd[f"{prefix}.running_mean"]), "var": np.asarray(sd[f"{prefix}.running_var"])}
    return params, stats


def _conv_entry(sd, prefix, use_bias=True):
    out = {"kernel": conv_kernel_from_torch(sd[f"{prefix}.weight"])}
    if use_bias and f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _dense_entry(sd, prefix):
    return {"kernel": dense_from_torch(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}


# --- per-architecture specs ---------------------------------------------------
# (flax_name, kind, torch_prefix); kinds: conv / dense / bn
_SPECS = {
    # reference models.py:105-123 — Sequential indices: 0,1 convs; 2 bn; out linear
    "shallownet": [
        ("conv1", "conv", "net.0"),
        ("conv2", "conv", "net.1"),
        ("bn", "bn", "net.2"),
        ("out", "dense", "out"),
    ],
    # models.py:125-161 — indices 0,1 convs; 2 bn; 6 conv; 7 bn; 11 conv; 12 bn; 16 conv; 17 bn
    "deepnet": [
        ("conv1", "conv", "net.0"),
        ("conv2", "conv", "net.1"),
        ("bn1", "bn", "net.2"),
        ("conv3", "conv", "net.6"),
        ("bn2", "bn", "net.7"),
        ("conv4", "conv", "net.11"),
        ("bn3", "bn", "net.12"),
        ("conv5", "conv", "net.16"),
        ("bn4", "bn", "net.17"),
        ("out", "dense", "out"),
    ],
    # models.py:163-187 — 0 conv; 1 bn; 2 conv; 3 bn; 7 conv; 8 bn
    "eegnet": [
        ("conv1", "conv", "net.0"),
        ("bn1", "bn", "net.1"),
        ("conv2", "conv", "net.2"),
        ("bn2", "bn", "net.3"),
        ("conv3", "conv", "net.7"),
        ("bn3", "bn", "net.8"),
        ("out", "dense", "out"),
    ],
    # models.py:189-209 — 0 conv; 2 bn; 4 conv; 5 bn
    "tsconv": [
        ("conv1", "conv", "net.0"),
        ("bn1", "bn", "net.2"),
        ("conv2", "conv", "net.4"),
        ("bn2", "bn", "net.5"),
        ("out", "dense", "out"),
    ],
    # models.py:375-390 — Sequential: 0 Flatten; 1,3,5 Linear
    "mlpnet": [
        ("fc1", "dense", "net.1"),
        ("fc2", "dense", "net.3"),
        ("fc3", "dense", "net.5"),
    ],
}


def _convert_spec(sd: Mapping[str, np.ndarray], spec, torch_root: str = ""):
    params: Dict = {}
    stats: Dict = {}
    for flax_name, kind, tprefix in spec:
        full = f"{torch_root}{tprefix}"
        if kind == "conv":
            params[flax_name] = _conv_entry(sd, full)
        elif kind == "dense":
            params[flax_name] = _dense_entry(sd, full)
        elif kind == "bn":
            p, s = bn_from_torch(sd, full)
            params[flax_name] = p
            stats[flax_name] = s
    return params, stats


def encoder_params_from_torch(name: str, sd: Mapping[str, np.ndarray]):
    """Convert a reference encoder state dict into Flax variables.

    Returns ``{"params": ..., "batch_stats": ...}`` matching the module tree
    of :mod:`eeg2video_tpu.models.encoders`.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if name in _SPECS:
        params, stats = _convert_spec(sd, _SPECS[name])
        return _pack(params, stats)

    if name == "glfnet":
        gp, gs = _convert_spec(sd, _SPECS["shallownet"], "globalnet.")
        lp, ls = _convert_spec(sd, _SPECS["shallownet"], "occipital_localnet.")
        params = {"globalnet": gp, "occipital_localnet": lp, "out": _dense_entry(sd, "out")}
        stats = {"globalnet": gs, "occipital_localnet": ls}
        return _pack(params, stats)

    if name == "glfnet_mlp":
        gp, _ = _convert_spec(sd, _SPECS["mlpnet"], "globalnet.")
        lp, _ = _convert_spec(sd, _SPECS["mlpnet"], "occipital_localnet.")
        params = {"globalnet": gp, "occipital_localnet": lp, "out": _dense_entry(sd, "out")}
        return {"params": params}

    if name == "conformer":
        return _pack(*_convert_conformer(sd))

    raise ValueError(f"no converter for encoder '{name}'")


def _convert_conformer(sd):
    """reference models.py:343-350: Sequential of PatchEmbedding(0),
    TransformerEncoder(1), ClassificationHead(2)."""
    params = {
        "patch_conv1": _conv_entry(sd, "0.shallownet.0"),
        "patch_conv2": _conv_entry(sd, "0.shallownet.1"),
        "patch_proj": _conv_entry(sd, "0.projection.0"),
        "fc": _dense_entry(sd, "2.fc.0"),
    }
    bn_p, bn_s = bn_from_torch(sd, "0.shallownet.2")
    params["patch_bn"] = bn_p
    stats = {"patch_bn": bn_s}
    for d in range(3):
        # block structure (models.py:296-315): 1.<d>.0.fn = [LN, MHA, Drop],
        # 1.<d>.1.fn = [LN, FF(0,3 linears)]
        root = f"1.{d}"
        params[f"block{d}_ln1"] = {
            "scale": sd[f"{root}.0.fn.0.weight"], "bias": sd[f"{root}.0.fn.0.bias"]}
        mha = f"{root}.0.fn.1"
        params[f"block{d}_mha"] = {
            "queries": _dense_entry(sd, f"{mha}.queries"),
            "keys": _dense_entry(sd, f"{mha}.keys"),
            "values": _dense_entry(sd, f"{mha}.values"),
            "projection": _dense_entry(sd, f"{mha}.projection"),
        }
        params[f"block{d}_ln2"] = {
            "scale": sd[f"{root}.1.fn.0.weight"], "bias": sd[f"{root}.1.fn.0.bias"]}
        params[f"block{d}_ff1"] = _dense_entry(sd, f"{root}.1.fn.1.0")
        params[f"block{d}_ff2"] = _dense_entry(sd, f"{root}.1.fn.1.3")
    return params, stats


def _pack(params, stats):
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out
