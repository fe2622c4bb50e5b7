"""CLIP text encoder in Flax (the SD v1 text encoder: CLIP ViT-L/14 text
tower) — the reference consumes ``transformers.CLIPTextModel`` off the shelf
(reference train_finetune_videodiffusion.py:134, :307 uses last_hidden_state)
to produce the (77, 768) conditioning and the per-block
``Text_embeddings/block{i}.pt`` targets (README.md section 4.1).

Architecture: token + position embeddings, 12 pre-LN transformer layers with
causal masking and quick-gelu MLPs, final LayerNorm.  Converter from the HF
torch state dict included (text_model.* key space)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 77

    @classmethod
    def tiny(cls):
        return cls(vocab_size=100, hidden=32, layers=2, heads=4,
                   intermediate=64, max_positions=77)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class _CLIPAttention(nn.Module):
    hidden: int
    heads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask):
        h, hd = self.heads, self.hidden // self.heads
        B, L, _ = x.shape
        q = nn.Dense(self.hidden, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.hidden, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.hidden, dtype=self.dtype, name="v_proj")(x)
        split = lambda t: t.reshape(B, L, h, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k),
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        logits = logits + mask
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(B, L, self.hidden)
        return nn.Dense(self.hidden, dtype=self.dtype, name="out_proj")(out)


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig = CLIPTextConfig()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.config
        B, L = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden, dtype=self.dtype, name="token_embedding")(input_ids)
        pos = nn.Embed(cfg.max_positions, cfg.hidden, dtype=self.dtype, name="position_embedding")(
            jnp.arange(L)[None, :]
        )
        x = tok + pos
        causal = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)[None, None]
        for i in range(cfg.layers):
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"l{i}_ln1")(x)
            x = x + _CLIPAttention(cfg.hidden, cfg.heads, dtype=self.dtype, name=f"l{i}_attn")(h, causal)
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"l{i}_ln2")(x)
            h = nn.Dense(cfg.intermediate, dtype=self.dtype, name=f"l{i}_fc1")(h)
            h = quick_gelu(h)
            h = nn.Dense(cfg.hidden, dtype=self.dtype, name=f"l{i}_fc2")(h)
            x = x + h
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_ln")(x)


def clip_text_params_from_torch(sd, layers=12):
    """HF CLIPTextModel state dict ('text_model.*' keys) -> Flax params."""
    from ..convert.torch_params import dense_from_torch

    g = lambda k: np.asarray(sd[k])
    d = lambda p: {"kernel": dense_from_torch(sd[f"{p}.weight"]), "bias": g(f"{p}.bias")}
    ln = lambda p: {"scale": g(f"{p}.weight"), "bias": g(f"{p}.bias")}
    out = {
        "token_embedding": {"embedding": g("text_model.embeddings.token_embedding.weight")},
        "position_embedding": {"embedding": g("text_model.embeddings.position_embedding.weight")},
        "final_ln": ln("text_model.final_layer_norm"),
    }
    for i in range(layers):
        p = f"text_model.encoder.layers.{i}"
        out[f"l{i}_ln1"] = ln(f"{p}.layer_norm1")
        out[f"l{i}_ln2"] = ln(f"{p}.layer_norm2")
        out[f"l{i}_attn"] = {
            "q_proj": d(f"{p}.self_attn.q_proj"),
            "k_proj": d(f"{p}.self_attn.k_proj"),
            "v_proj": d(f"{p}.self_attn.v_proj"),
            "out_proj": d(f"{p}.self_attn.out_proj"),
        }
        out[f"l{i}_fc1"] = d(f"{p}.mlp.fc1")
        out[f"l{i}_fc2"] = d(f"{p}.mlp.fc2")
    return {"params": out}
