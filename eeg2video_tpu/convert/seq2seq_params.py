"""Convert reference Seq2Seq checkpoints (``seq2seqmodel.pt`` state dicts,
reference my_autoregressive_transformer.py:388-391) to Flax variables for
:class:`eeg2video_tpu.models.seq2seq.Seq2SeqTransformer`."""

from __future__ import annotations

from typing import Mapping

import numpy as np

from .torch_params import bn_from_torch, conv_kernel_from_torch, dense_from_torch


def _dense(sd, prefix):
    return {"kernel": dense_from_torch(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}


def _ln(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}


def _mha(sd, prefix):
    """torch nn.MultiheadAttention packed in-proj -> separate q/k/v Dense."""
    w = np.asarray(sd[f"{prefix}.in_proj_weight"])  # (3E, E)
    b = np.asarray(sd[f"{prefix}.in_proj_bias"])  # (3E,)
    E = w.shape[1]
    qw, kw, vw = w[:E], w[E : 2 * E], w[2 * E :]
    qb, kb, vb = b[:E], b[E : 2 * E], b[2 * E :]
    return {
        "q_proj": {"kernel": qw.T, "bias": qb},
        "k_proj": {"kernel": kw.T, "bias": kb},
        "v_proj": {"kernel": vw.T, "bias": vb},
        "out_proj": _dense(sd, f"{prefix}.out_proj"),
    }


def _eegnet_embedding(sd, root="eeg_embedding"):
    """reference MyEEGNet_embedding state dict -> EEGNetEmbedding params."""
    p = {
        "conv1": {"kernel": conv_kernel_from_torch(sd[f"{root}.block_1.1.weight"])},
        "conv2": {"kernel": conv_kernel_from_torch(sd[f"{root}.block_2.0.weight"])},
        "conv3": {"kernel": conv_kernel_from_torch(sd[f"{root}.block_3.1.weight"])},
        "conv4": {"kernel": conv_kernel_from_torch(sd[f"{root}.block_3.2.weight"])},
        "embedding": _dense(sd, f"{root}.embedding"),
    }
    stats = {}
    for flax_name, tname in [("bn1", "block_1.2"), ("bn2", "block_2.1"), ("bn3", "block_3.3")]:
        bp, bs = bn_from_torch(sd, f"{root}.{tname}")
        p[flax_name] = bp
        stats[flax_name] = bs
    return p, stats


def _enc_layer(sd, prefix):
    return {
        "self_attn": _mha(sd, f"{prefix}.self_attn"),
        "linear1": _dense(sd, f"{prefix}.linear1"),
        "linear2": _dense(sd, f"{prefix}.linear2"),
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
    }


def _dec_layer(sd, prefix):
    return {
        "self_attn": _mha(sd, f"{prefix}.self_attn"),
        "cross_attn": _mha(sd, f"{prefix}.multihead_attn"),
        "linear1": _dense(sd, f"{prefix}.linear1"),
        "linear2": _dense(sd, f"{prefix}.linear2"),
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "norm3": _ln(sd, f"{prefix}.norm3"),
    }


def seq2seq_params_from_torch(sd: Mapping[str, np.ndarray], n_enc=2, n_dec=4):
    sd = {k: np.asarray(v) for k, v in sd.items()}
    eeg_p, eeg_s = _eegnet_embedding(sd)
    params = {
        "eeg_embedding": eeg_p,
        "img_embedding": _dense(sd, "img_embedding"),
        "txtpredictor": _dense(sd, "txtpredictor"),
        "predictor": _dense(sd, "predictor"),
    }
    for i in range(n_enc):
        params[f"enc{i}"] = _enc_layer(sd, f"transformer_encoder.layers.{i}")
    for i in range(n_dec):
        params[f"dec{i}"] = _dec_layer(sd, f"transformer_decoder.layers.{i}")
    return {"params": params, "batch_stats": {"eeg_embedding": eeg_s}}
