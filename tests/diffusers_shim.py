"""Faithful torch reimplementation of the diffusers-0.11.1 primitives the
reference models import, so the REFERENCE code itself (attention.py, unet.py,
unet_blocks.py, resnet.py under /root/reference/EEG2Video_New/Generation/
models/) can be executed for parity tests without diffusers installed
(VERDICT round-1 missing #1).

Each class mirrors the diffusers-0.11.1 source semantics exactly:
- CrossAttention: diffusers/models/attention.py (to_q/k/v Linear no-bias,
  head-to-batch reshape, baddbmm with alpha=scale, softmax, bmm,
  to_out = [Linear, Dropout]).
- FeedForward/GEGLU: Linear(dim, 2*inner) -> chunk -> x * gelu(gate) ->
  Dropout -> Linear(inner, dim).
- Timesteps/TimestepEmbedding: diffusers/models/embeddings.py
  get_timestep_embedding (sin|cos concat, optional flip) and the
  Linear-SiLU-Linear MLP.
- ConfigMixin/register_to_config/ModelMixin: just enough for
  `self.config.<field>` and `self.dtype` as used by the reference forward.

Install with ``install()`` BEFORE importing the reference modules.
"""

import inspect
import logging as _logging
import math
import sys
import types

import torch
import torch.nn.functional as F
from torch import nn


class CrossAttention(nn.Module):
    def __init__(self, query_dim, cross_attention_dim=None, heads=8,
                 dim_head=64, dropout=0.0, bias=False, upcast_attention=False,
                 upcast_softmax=False, added_kv_proj_dim=None,
                 norm_num_groups=None):
        super().__init__()
        inner_dim = dim_head * heads
        cross_attention_dim = (cross_attention_dim if cross_attention_dim
                               is not None else query_dim)
        self.upcast_attention = upcast_attention
        self.upcast_softmax = upcast_softmax
        self.scale = dim_head**-0.5
        self.heads = heads
        self._slice_size = None
        self._use_memory_efficient_attention_xformers = False
        self.added_kv_proj_dim = added_kv_proj_dim
        self.group_norm = (nn.GroupNorm(num_channels=inner_dim,
                                        num_groups=norm_num_groups,
                                        eps=1e-5, affine=True)
                           if norm_num_groups is not None else None)
        self.to_q = nn.Linear(query_dim, inner_dim, bias=bias)
        self.to_k = nn.Linear(cross_attention_dim, inner_dim, bias=bias)
        self.to_v = nn.Linear(cross_attention_dim, inner_dim, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(inner_dim, query_dim),
                                     nn.Dropout(dropout)])

    def reshape_heads_to_batch_dim(self, tensor):
        batch_size, seq_len, dim = tensor.shape
        head_size = self.heads
        tensor = tensor.reshape(batch_size, seq_len, head_size,
                                dim // head_size)
        tensor = tensor.permute(0, 2, 1, 3).reshape(
            batch_size * head_size, seq_len, dim // head_size)
        return tensor

    def reshape_batch_dim_to_heads(self, tensor):
        batch_size, seq_len, dim = tensor.shape
        head_size = self.heads
        tensor = tensor.reshape(batch_size // head_size, head_size, seq_len,
                                dim)
        tensor = tensor.permute(0, 2, 1, 3).reshape(
            batch_size // head_size, seq_len, dim * head_size)
        return tensor

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None):
        batch_size, sequence_length, _ = hidden_states.shape
        if self.group_norm is not None:
            hidden_states = self.group_norm(
                hidden_states.transpose(1, 2)).transpose(1, 2)
        query = self.to_q(hidden_states)
        encoder_hidden_states = (encoder_hidden_states
                                 if encoder_hidden_states is not None
                                 else hidden_states)
        key = self.to_k(encoder_hidden_states)
        value = self.to_v(encoder_hidden_states)
        query = self.reshape_heads_to_batch_dim(query)
        key = self.reshape_heads_to_batch_dim(key)
        value = self.reshape_heads_to_batch_dim(value)
        if attention_mask is not None:
            if attention_mask.shape[-1] != query.shape[1]:
                target_length = query.shape[1]
                attention_mask = F.pad(attention_mask,
                                       (0, target_length), value=0.0)
                attention_mask = attention_mask.repeat_interleave(
                    self.heads, dim=0)
        hidden_states = self._attention(query, key, value, attention_mask)
        hidden_states = self.to_out[0](hidden_states)
        hidden_states = self.to_out[1](hidden_states)
        return hidden_states

    def _attention(self, query, key, value, attention_mask=None):
        if self.upcast_attention:
            query = query.float()
            key = key.float()
        attention_scores = torch.baddbmm(
            torch.empty(query.shape[0], query.shape[1], key.shape[1],
                        dtype=query.dtype, device=query.device),
            query, key.transpose(-1, -2), beta=0, alpha=self.scale)
        if attention_mask is not None:
            attention_scores = attention_scores + attention_mask
        if self.upcast_softmax:
            attention_scores = attention_scores.float()
        attention_probs = attention_scores.softmax(dim=-1)
        attention_probs = attention_probs.to(value.dtype)
        hidden_states = torch.bmm(attention_probs, value)
        hidden_states = self.reshape_batch_dim_to_heads(hidden_states)
        return hidden_states


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, hidden_states):
        hidden_states, gate = self.proj(hidden_states).chunk(2, dim=-1)
        return hidden_states * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                 activation_fn="geglu"):
        super().__init__()
        inner_dim = int(dim * mult)
        dim_out = dim_out if dim_out is not None else dim
        assert activation_fn == "geglu", activation_fn
        self.net = nn.ModuleList([GEGLU(dim, inner_dim), nn.Dropout(dropout),
                                  nn.Linear(inner_dim, dim_out)])

    def forward(self, hidden_states):
        for module in self.net:
            hidden_states = module(hidden_states)
        return hidden_states


class AdaLayerNorm(nn.Module):
    """Imported by the reference but only constructed when
    num_embeds_ada_norm is set, which the reference never does."""

    def __init__(self, *a, **k):
        raise NotImplementedError("reference never uses AdaLayerNorm")


def get_timestep_embedding(timesteps, embedding_dim, flip_sin_to_cos=False,
                           downscale_freq_shift=1, scale=1, max_period=10000):
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * torch.arange(
        start=0, end=half_dim, dtype=torch.float32, device=timesteps.device)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = torch.exp(exponent)
    emb = timesteps[:, None].float() * emb[None, :]
    emb = scale * emb
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
    if embedding_dim % 2 == 1:
        emb = torch.nn.functional.pad(emb, (0, 1, 0, 0))
    return emb


class Timesteps(nn.Module):
    def __init__(self, num_channels, flip_sin_to_cos, downscale_freq_shift):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.downscale_freq_shift = downscale_freq_shift

    def forward(self, timesteps):
        return get_timestep_embedding(
            timesteps, self.num_channels,
            flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.downscale_freq_shift)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_channels, time_embed_dim, act_fn="silu"):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim)
        self.act = nn.SiLU() if act_fn == "silu" else None
        self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

    def forward(self, sample):
        sample = self.linear_1(sample)
        if self.act is not None:
            sample = self.act(sample)
        return self.linear_2(sample)


# --- config / model plumbing -------------------------------------------------

class _Config(dict):
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e


def register_to_config(init):
    def wrapped(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
        init(self, *args, **kwargs)
        self._internal_dict = _Config(cfg)
    return wrapped


class ConfigMixin:
    @property
    def config(self):
        return self._internal_dict


class ModelMixin(nn.Module):
    @property
    def dtype(self):
        return next(self.parameters()).dtype


class BaseOutput:
    pass


def is_xformers_available():
    return False


def install():
    """Register the shim as the ``diffusers`` package in sys.modules."""
    root = types.ModuleType("diffusers")
    cfgmod = types.ModuleType("diffusers.configuration_utils")
    cfgmod.ConfigMixin = ConfigMixin
    cfgmod.register_to_config = register_to_config
    modmod = types.ModuleType("diffusers.modeling_utils")
    modmod.ModelMixin = ModelMixin
    utils = types.ModuleType("diffusers.utils")
    utils.BaseOutput = BaseOutput
    utils.logging = types.SimpleNamespace(get_logger=_logging.getLogger)
    utils.WEIGHTS_NAME = "diffusion_pytorch_model.bin"
    iutils = types.ModuleType("diffusers.utils.import_utils")
    iutils.is_xformers_available = is_xformers_available
    utils.import_utils = iutils
    models = types.ModuleType("diffusers.models")
    attn = types.ModuleType("diffusers.models.attention")
    attn.CrossAttention = CrossAttention
    attn.FeedForward = FeedForward
    attn.AdaLayerNorm = AdaLayerNorm
    emb = types.ModuleType("diffusers.models.embeddings")
    emb.TimestepEmbedding = TimestepEmbedding
    emb.Timesteps = Timesteps
    emb.get_timestep_embedding = get_timestep_embedding
    models.attention = attn
    models.embeddings = emb
    root.configuration_utils = cfgmod
    root.modeling_utils = modmod
    root.utils = utils
    root.models = models
    for name, mod in [
        ("diffusers", root),
        ("diffusers.configuration_utils", cfgmod),
        ("diffusers.modeling_utils", modmod),
        ("diffusers.utils", utils),
        ("diffusers.utils.import_utils", iutils),
        ("diffusers.models", models),
        ("diffusers.models.attention", attn),
        ("diffusers.models.embeddings", emb),
    ]:
        sys.modules.setdefault(name, mod)
