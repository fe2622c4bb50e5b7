"""Seq2Seq EEG -> video-latent transformer, Flax + scanned fixed-length rollout.

Re-design of the reference ``myTransformer``
(reference EEG2Video_New/Seq2Seq/my_autoregressive_transformer.py:123-192):

- ``EEGNetEmbedding``: EEGNet-style depthwise/separable CNN embedding one
  (1, 62, 100) EEG window to d_model (reference L16-86).
- torch ``nn.TransformerEncoder`` (2 post-LN layers) / ``nn.TransformerDecoder``
  (4 post-LN layers), 4 heads, FFN 2048, replicated exactly — including
  torch defaults (post-norm, ReLU, dropout 0.1, eps 1e-5).
- The reference's decode loop is autoregressive *even in training*: it starts
  from a zero token and feeds its own outputs back for 6 steps with causal
  masks (L176-181); the embedded teacher ``tgt`` is computed but unused, and
  the rollout tokens never receive positional encoding.  Here the rollout is
  a fixed-length ``nn.scan`` (6 steps, params broadcast — same param tree
  as an unrolled loop, so torch checkpoints interchange) over a
  preallocated (B, 7, d) buffer — semantics identical because the causal
  mask makes position i depend only on positions <= i.
- Dual heads: ``txtpredictor`` Linear(512->13) on the mean encoder output
  (trained never — kept for checkpoint parity) and ``predictor``
  Linear(512 -> 4*36*64) (L145-149).

Input contract: ``src`` (B, 7, 62, 100) EEG windows, ``tgt`` (B, 7, 4, 36, 64)
zero-padded latents (teacher, unused by the rollout — accepted for API parity).
Output: ``(txt_logits (B, 13), latents (B, 7, 4, 36, 64))``; training loss uses
``latents[:, :-1]`` like the reference (L369).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..data import meta

LATENT_DIM = meta.LATENT_CHANNELS * meta.LATENT_HEIGHT * meta.LATENT_WIDTH  # 9216
N_WINDOWS = 7
WINDOW_LEN = 100


class EEGNetEmbedding(nn.Module):
    """reference my_autoregressive_transformer.py:16-86 (MyEEGNet_embedding).

    (B, 1, C, T) -> (B, d_model).  Uses NHWC internally; grouped convs map to
    ``feature_group_count``.
    """

    d_model: int = 512
    C: int = meta.N_CHANNELS
    T: int = WINDOW_LEN
    F1: int = 16
    D: int = 4
    F2: int = 16
    cross_subject: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        drop = 0.25 if self.cross_subject else 0.5
        x = jnp.transpose(x, (0, 2, 3, 1))  # (B, C, T, 1)
        # block 1: ZeroPad2d(31,32) + Conv(1->F1,(1,64),no bias) + BN (L24-35)
        x = jnp.pad(x, ((0, 0), (0, 0), (31, 32), (0, 0)))
        x = nn.Conv(self.F1, (1, 64), padding="VALID", use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn1")(x)
        # block 2: depthwise Conv(F1->F1*D,(C,1),groups=F1) + BN + ELU +
        # AvgPool(1,4) + Dropout (L38-50)
        x = nn.Conv(self.F1 * self.D, (self.C, 1), padding="VALID", use_bias=False,
                    feature_group_count=self.F1, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn2")(x)
        x = nn.elu(x)
        x = nn.avg_pool(x, (1, 4), strides=(1, 4), padding="VALID")
        x = nn.Dropout(drop, deterministic=not train)(x)
        # block 3: ZeroPad2d(7,8) + separable conv (depthwise (1,16) groups=F1*D
        # then 1x1) + BN + ELU + AvgPool(1,8) + Dropout (L52-74)
        x = jnp.pad(x, ((0, 0), (0, 0), (7, 8), (0, 0)))
        x = nn.Conv(self.F1 * self.D, (1, 16), padding="VALID", use_bias=False,
                    feature_group_count=self.F1 * self.D, name="conv3")(x)
        x = nn.Conv(self.F2, (1, 1), padding="VALID", use_bias=False, name="conv4")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn3")(x)
        x = nn.elu(x)
        x = nn.avg_pool(x, (1, 8), strides=(1, 8), padding="VALID")
        x = nn.Dropout(drop, deterministic=not train)(x)
        # flatten in torch NCHW order then Linear(48 -> d_model) (L76,84-85)
        b = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
        return nn.Dense(self.d_model, name="embedding")(x)


def sinusoidal_positions(length: int, d_model: int) -> np.ndarray:
    """Standard sin/cos table (reference PositionalEncoding L89-120)."""
    pos = np.arange(length, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(np.log(10000.0) / d_model))
    pe = np.zeros((length, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe.astype(np.float32)


class _TorchMHA(nn.Module):
    """torch nn.MultiheadAttention-equivalent (packed in-proj, per-head scale)."""

    d_model: int
    nhead: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q, k, v, mask=None, *, train: bool = False):
        B, Lq, E = q.shape
        h, hd = self.nhead, self.d_model // self.nhead
        wq = nn.Dense(E, name="q_proj")(q).reshape(B, Lq, h, hd).transpose(0, 2, 1, 3)
        wk = nn.Dense(E, name="k_proj")(k).reshape(B, k.shape[1], h, hd).transpose(0, 2, 1, 3)
        wv = nn.Dense(E, name="v_proj")(v).reshape(B, v.shape[1], h, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", wq, wk) / np.sqrt(hd)
        if mask is not None:
            logits = logits + mask  # additive mask, -inf for disallowed
        att = jax.nn.softmax(logits, axis=-1)
        att = nn.Dropout(self.dropout, deterministic=not train)(att)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, wv)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, E)
        return nn.Dense(E, name="out_proj")(out)


class _EncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer defaults: post-LN, ReLU, FFN 2048."""

    d_model: int
    nhead: int = 4
    dim_ff: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        a = _TorchMHA(self.d_model, self.nhead, self.dropout, name="self_attn")(x, x, x, train=train)
        a = nn.Dropout(self.dropout, deterministic=not train)(a)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + a)
        f = nn.Dense(self.dim_ff, name="linear1")(x)
        f = nn.relu(f)
        f = nn.Dropout(self.dropout, deterministic=not train)(f)
        f = nn.Dense(self.d_model, name="linear2")(f)
        f = nn.Dropout(self.dropout, deterministic=not train)(f)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + f)


class _DecoderLayer(nn.Module):
    """torch nn.TransformerDecoderLayer defaults (post-LN)."""

    d_model: int
    nhead: int = 4
    dim_ff: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, memory, tgt_mask=None, *, train: bool = False):
        a = _TorchMHA(self.d_model, self.nhead, self.dropout, name="self_attn")(
            x, x, x, mask=tgt_mask, train=train)
        a = nn.Dropout(self.dropout, deterministic=not train)(a)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + a)
        c = _TorchMHA(self.d_model, self.nhead, self.dropout, name="cross_attn")(
            x, memory, memory, train=train)
        c = nn.Dropout(self.dropout, deterministic=not train)(c)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + c)
        f = nn.Dense(self.dim_ff, name="linear1")(x)
        f = nn.relu(f)
        f = nn.Dropout(self.dropout, deterministic=not train)(f)
        f = nn.Dense(self.d_model, name="linear2")(f)
        f = nn.Dropout(self.dropout, deterministic=not train)(f)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(x + f)


class Seq2SeqTransformer(nn.Module):
    """EEG windows -> video latents (reference myTransformer, L123-192)."""

    d_model: int = 512
    n_enc_layers: int = 2
    n_dec_layers: int = 4
    nhead: int = 4
    n_frames: int = 6
    # (C, H, W) of one predicted latent frame.  The default is the SEED-DV
    # geometry the reference hardcodes (4*36*64 = 9216, reference L130);
    # configurable so tiny-shape tests / non-288x512 pipelines can pair a
    # Seq2Seq with a matching diffusion pipeline.
    latent_shape: tuple = (meta.LATENT_CHANNELS, meta.LATENT_HEIGHT,
                           meta.LATENT_WIDTH)

    @property
    def latent_dim(self) -> int:
        return int(np.prod(self.latent_shape))

    def setup(self):
        self.eeg_embedding = EEGNetEmbedding(d_model=self.d_model, name="eeg_embedding")
        self.img_embedding = nn.Dense(self.d_model, name="img_embedding")
        self.enc_layers = [
            _EncoderLayer(self.d_model, self.nhead, name=f"enc{i}") for i in range(self.n_enc_layers)
        ]
        self.dec_layers = [
            _DecoderLayer(self.d_model, self.nhead, name=f"dec{i}") for i in range(self.n_dec_layers)
        ]
        self.txtpredictor = nn.Dense(13, name="txtpredictor")
        self.predictor = nn.Dense(self.latent_dim, name="predictor")

    def _decode(self, tgt_buf, memory, tgt_mask, *, train: bool):
        x = tgt_buf
        for layer in self.dec_layers:
            x = layer(x, memory, tgt_mask=tgt_mask, train=train)
        return x

    def __call__(self, src, tgt=None, *, train: bool = False):
        B = src.shape[0]
        # (B, 7, 62, 100) windows -> (B*7, 1, 62, 100) -> (B, 7, d)
        flat = src.reshape(B * N_WINDOWS, 1, src.shape[-2], src.shape[-1])
        emb = self.eeg_embedding(flat, train=train).reshape(B, N_WINDOWS, self.d_model)
        emb = emb + jnp.asarray(sinusoidal_positions(N_WINDOWS, self.d_model))
        # note: the reference's PositionalEncoding has dropout=0 (L143)

        # the reference embeds the teacher ``tgt`` but the rollout never uses
        # it (L157-158 vs L176-181); computed here too so img_embedding
        # params exist for checkpoint interchange, then dropped (XLA DCE).
        teacher = tgt if tgt is not None else jnp.zeros(
            (B, 1, self.latent_dim), emb.dtype)
        _ = self.img_embedding(teacher.reshape(B, -1, self.latent_dim))

        memory = emb
        for layer in self.enc_layers:
            memory = layer(memory, train=train)

        # fixed-length autoregressive rollout from a zero token (L176-181);
        # tokens are raw decoder outputs — no embedding, no PE, matching the
        # reference exactly.  The 6-step loop runs as nn.scan with
        # variable_broadcast="params": the decoder params are created once
        # (identical tree to an unrolled loop — torch checkpoint interchange
        # keeps working, tests/test_export_torch.py) while the traced
        # program holds ONE decoder body instead of six.
        L = self.n_frames + 1
        causal = jnp.triu(jnp.full((L, L), -jnp.inf), k=1)[None, None]
        buf0 = jnp.zeros((B, L, self.d_model), dtype=emb.dtype)

        def rollout_step(mdl, buf, i):
            dec = mdl._decode(buf, memory, causal, train=train)
            tok = jax.lax.dynamic_slice_in_dim(dec, i, 1, axis=1)
            return jax.lax.dynamic_update_slice_in_dim(buf, tok, i + 1,
                                                       axis=1), None

        buf, _ = nn.scan(
            rollout_step,
            variable_broadcast="params",
            variable_axes={},
            split_rngs={"params": False, "dropout": True},
        )(self, buf0, jnp.arange(self.n_frames))

        txt = self.txtpredictor(jnp.mean(memory, axis=1))
        lat = self.predictor(buf).reshape(B, L, *self.latent_shape)
        return txt, lat
