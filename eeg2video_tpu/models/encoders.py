"""EEG encoder family in Flax (reference EEG2Video/models/models.py:105-413).

Same architectures and tensor contracts as the reference's PyTorch classes
(shallownet/deepnet/eegnet/tsconv/conformer/glfnet/mlpnet/glfnet_mlp), written
TPU-first:

- NHWC layout ((B, C_eeg, T, 1) "image") so convolutions hit XLA's native TPU
  conv path; flattening transposes back to NCHW order first so torch Linear
  checkpoints convert weight-for-weight (see convert/torch_params.py).
- BatchNorm carries explicit ``batch_stats`` collections (functional state).
- Dropout takes an explicit PRNG key — the reference's cudnn-determinism knobs
  become JAX's always-explicit keys.

Raw-EEG encoders take (B, 1, C, T); DE/PSD encoders take (B, C, 5) — the same
contracts as the reference forward() signatures.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from ..data import meta


def _to_nhwc(x):
    # (B, 1, C, T) torch-style input -> (B, C, T, 1)
    return jnp.transpose(x, (0, 2, 3, 1))


def _flatten_as_torch(x):
    # (B, H, W, F) -> flatten in torch NCHW order: (B, F*H*W)
    b = x.shape[0]
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)


class _ConvBlockMixin:
    """Helpers shared by the conv encoders."""

    def _conv(self, x, features, kernel, name, stride=(1, 1), use_bias=True):
        return nn.Conv(
            features, kernel, strides=stride, padding="VALID", use_bias=use_bias, name=name
        )(x)

    def _bn(self, x, train, name):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )(x)


class ShallowNet(nn.Module, _ConvBlockMixin):
    """reference models.py:105-123: Conv(1->40,(1,25)) -> Conv(40->40,(C,1))
    -> BN -> ELU -> AvgPool((1,51),(1,5)) -> Dropout -> Linear."""

    out_dim: int
    C: int = meta.N_CHANNELS
    T: int = 2 * meta.FS
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = _to_nhwc(x)
        x = self._conv(x, 40, (1, 25), "conv1")
        x = self._conv(x, 40, (self.C, 1), "conv2")
        x = self._bn(x, train, "bn")
        x = nn.elu(x)
        x = nn.avg_pool(x, (1, 51), strides=(1, 5), padding="VALID")
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = _flatten_as_torch(x)
        return nn.Dense(self.out_dim, name="out")(x)


class DeepNet(nn.Module, _ConvBlockMixin):
    """reference models.py:125-161: 4x {Conv -> BN -> ELU -> MaxPool(1,2) -> Drop}."""

    out_dim: int
    C: int = meta.N_CHANNELS
    T: int = 2 * meta.FS
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = _to_nhwc(x)
        x = self._conv(x, 25, (1, 10), "conv1")
        x = self._conv(x, 25, (self.C, 1), "conv2")
        x = self._bn(x, train, "bn1")
        x = nn.elu(x)
        x = nn.max_pool(x, (1, 2), strides=(1, 2), padding="VALID")
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for i, ch in enumerate((50, 100, 200), start=3):
            x = self._conv(x, ch, (1, 10), f"conv{i}")
            x = self._bn(x, train, f"bn{i - 1}")
            x = nn.elu(x)
            x = nn.max_pool(x, (1, 2), strides=(1, 2), padding="VALID")
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = _flatten_as_torch(x)
        return nn.Dense(self.out_dim, name="out")(x)


class EEGNet(nn.Module, _ConvBlockMixin):
    """reference models.py:163-187."""

    out_dim: int
    C: int = meta.N_CHANNELS
    T: int = 2 * meta.FS
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = _to_nhwc(x)
        x = self._conv(x, 8, (1, 64), "conv1")
        x = self._bn(x, train, "bn1")
        x = self._conv(x, 16, (self.C, 1), "conv2")
        x = self._bn(x, train, "bn2")
        x = nn.elu(x)
        x = nn.avg_pool(x, (1, 2), strides=(1, 2), padding="VALID")
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = self._conv(x, 16, (1, 16), "conv3")
        x = self._bn(x, train, "bn3")
        x = nn.elu(x)
        x = nn.avg_pool(x, (1, 2), strides=(1, 2), padding="VALID")
        # reference uses Dropout2d here; identical in inference, and per-channel
        # dropout at train time — replicate by dropping whole feature maps.
        x = nn.Dropout(
            self.dropout, broadcast_dims=(1, 2), deterministic=not train
        )(x)
        x = _flatten_as_torch(x)
        return nn.Dense(self.out_dim, name="out")(x)


class TSConv(nn.Module, _ConvBlockMixin):
    """reference models.py:189-209: temporal conv -> pool -> BN -> ELU ->
    spatial conv -> BN -> ELU -> Dropout -> Linear."""

    out_dim: int
    C: int = meta.N_CHANNELS
    T: int = 2 * meta.FS
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = _to_nhwc(x)
        x = self._conv(x, 40, (1, 25), "conv1")
        x = nn.avg_pool(x, (1, 51), strides=(1, 5), padding="VALID")
        x = self._bn(x, train, "bn1")
        x = nn.elu(x)
        x = self._conv(x, 40, (self.C, 1), "conv2")
        x = self._bn(x, train, "bn2")
        x = nn.elu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = _flatten_as_torch(x)
        return nn.Dense(self.out_dim, name="out")(x)


class _ConformerMHA(nn.Module):
    """The reference's hand-rolled MHA (models.py:240-266): note it scales by
    sqrt(emb_size) — the *full* embedding size, not per-head dim."""

    emb_size: int
    num_heads: int
    dropout: float

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        B, N, E = x.shape
        h = self.num_heads
        q = nn.Dense(E, name="queries")(x).reshape(B, N, h, E // h).transpose(0, 2, 1, 3)
        k = nn.Dense(E, name="keys")(x).reshape(B, N, h, E // h).transpose(0, 2, 1, 3)
        v = nn.Dense(E, name="values")(x).reshape(B, N, h, E // h).transpose(0, 2, 1, 3)
        energy = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        att = nn.softmax(energy / (self.emb_size ** 0.5), axis=-1)
        att = nn.Dropout(self.dropout, deterministic=not train)(att)
        out = jnp.einsum("bhal,bhlv->bhav", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, E)
        return nn.Dense(E, name="projection")(out)


class Conformer(nn.Module):
    """reference models.py:343-350: PatchEmbedding (shallownet-style patcher,
    AvgPool(1,75)/stride 15) -> 3x pre-LN transformer blocks -> flatten ->
    Linear(280 -> out)."""

    out_dim: int
    emb_size: int = 40
    depth: int = 3
    num_heads: int = 10
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        # PatchEmbedding (models.py:213-237), C fixed at 62 in the reference
        h = _to_nhwc(x)
        h = nn.Conv(40, (1, 25), padding="VALID", name="patch_conv1")(h)
        h = nn.Conv(40, (62, 1), padding="VALID", name="patch_conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="patch_bn")(h)
        h = nn.elu(h)
        h = nn.avg_pool(h, (1, 75), strides=(1, 15), padding="VALID")
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        # projection conv 1x1 then tokens along (h w): (B,1,W,40) -> (B, W, emb)
        h = nn.Conv(self.emb_size, (1, 1), name="patch_proj")(h)
        B = h.shape[0]
        tokens = h.reshape(B, -1, self.emb_size)

        for d in range(self.depth):
            # pre-LN MHA with residual (models.py:296-315)
            y = nn.LayerNorm(epsilon=1e-5, name=f"block{d}_ln1")(tokens)
            y = _ConformerMHA(self.emb_size, self.num_heads, self.dropout, name=f"block{d}_mha")(y, train=train)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
            tokens = tokens + y
            y = nn.LayerNorm(epsilon=1e-5, name=f"block{d}_ln2")(tokens)
            y = nn.Dense(self.emb_size * 4, name=f"block{d}_ff1")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
            y = nn.Dense(self.emb_size, name=f"block{d}_ff2")(y)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
            tokens = tokens + y

        # ClassificationHead (models.py:323-340): flatten -> Linear(280, out)
        flat = tokens.reshape(B, -1)
        return nn.Dense(self.out_dim, name="fc")(flat)


class GLFNet(nn.Module):
    """reference models.py:352-373: global ShallowNet on all channels +
    local ShallowNet on occipital channels 50..61, concat -> Linear."""

    out_dim: int
    emb_dim: int
    C: int = meta.N_CHANNELS
    T: int = 2 * meta.FS

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        g = ShallowNet(self.emb_dim, self.C, self.T, name="globalnet")(x, train=train)
        occ = x[:, :, list(meta.OCCIPITAL_CHANNELS), :]
        l = ShallowNet(self.emb_dim, len(meta.OCCIPITAL_CHANNELS), self.T, name="occipital_localnet")(occ, train=train)
        return nn.Dense(self.out_dim, name="out")(jnp.concatenate([g, l], axis=1))


class MLPNet(nn.Module):
    """reference models.py:375-390: Flatten -> 512 -> GELU -> 256 -> GELU -> out,
    for (B, C, 5) DE/PSD features."""

    out_dim: int

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(512, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(256, name="fc2")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim, name="fc3")(x)


class GLFNetMLP(nn.Module):
    """reference models.py:392-413: global MLPNet(input_dim) + occipital
    MLPNet(12*5) -> concat -> Linear.  Input (B, C, 5)."""

    out_dim: int
    emb_dim: int

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        g = MLPNet(self.emb_dim, name="globalnet")(x, train=train)
        occ = x[:, list(meta.OCCIPITAL_CHANNELS), :]
        l = MLPNet(self.emb_dim, name="occipital_localnet")(occ, train=train)
        return nn.Dense(self.out_dim, name="out")(jnp.concatenate([g, l], axis=1))


class GLMNet(nn.Module):
    """README-branch GLMNet variant (reference README.md:72-91): a ShallowNet
    on raw EEG windows plus an MLPNet on the matching DE/PSD features,
    concatenated into a Linear head.  (The checked-out tree's ``glfnet`` is
    raw-only global/local; this combined raw+spectral model is the
    train_glmnet.py contract.)  Inputs: raw (B, 1, C, T), feat (B, C, 5)."""

    out_dim: int
    emb_dim: int = 64
    C: int = meta.N_CHANNELS
    T: int = meta.FS // 2  # 500 ms windows

    @nn.compact
    def __call__(self, raw, feat, *, train: bool = False, return_embedding: bool = False):
        r = ShallowNetFlexible(self.emb_dim, self.C, name="rawnet")(raw, train=train)
        f = MLPNet(self.emb_dim, name="featnet")(feat, train=train)
        emb = jnp.concatenate([r, f], axis=1)  # (B, 2*emb_dim) "EEG embedding"
        # (512-d when constructed with emb_dim=256; the class default is 64)
        if return_embedding:
            return emb
        return nn.Dense(self.out_dim, name="out")(emb)


class ShallowNetFlexible(nn.Module, _ConvBlockMixin):
    """ShallowNet with adaptive pooling so any T works (the README branch
    replaces AvgPool2d with AdaptiveAvgPool2d, README.md:74): pool output is
    fixed at 26 time bins (the T=200 shape of the original)."""

    out_dim: int
    C: int = meta.N_CHANNELS
    pooled: int = 26

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = _to_nhwc(x)
        x = self._conv(x, 40, (1, 25), "conv1")
        x = self._conv(x, 40, (self.C, 1), "conv2")
        x = self._bn(x, train, "bn")
        x = nn.elu(x)
        # adaptive average pool to (1, pooled): torch AdaptiveAvgPool2d bins
        b, h, w, c = x.shape
        starts = (np.arange(self.pooled) * w) // self.pooled
        ends = np.maximum((((np.arange(self.pooled) + 1) * w) + self.pooled - 1) // self.pooled, starts + 1)
        cs = jnp.cumsum(jnp.concatenate([jnp.zeros_like(x[:, :, :1]), x], axis=2), axis=2)
        pooled = (cs[:, :, ends] - cs[:, :, starts]) / jnp.asarray(
            (ends - starts)[None, None, :, None], x.dtype)
        x = nn.Dropout(0.5, deterministic=not train)(pooled)
        x = _flatten_as_torch(x)
        return nn.Dense(self.out_dim, name="out")(x)


_ENCODERS = {
    "shallownet": ShallowNet,
    "deepnet": DeepNet,
    "eegnet": EEGNet,
    "tsconv": TSConv,
    "conformer": Conformer,
    "glfnet": GLFNet,
    "mlpnet": MLPNet,
    "glfnet_mlp": GLFNetMLP,
    "glmnet": GLMNet,
}


def make_encoder(name: str, **kwargs) -> nn.Module:
    """Factory mirroring the reference's model-class names."""
    try:
        return _ENCODERS[name](**kwargs)
    except KeyError:
        raise ValueError(f"unknown encoder '{name}'; available: {sorted(_ENCODERS)}")
