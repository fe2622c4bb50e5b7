"""Semantic predictor: DE features -> CLIP text-embedding space.

The reference ``CLIP`` MLP (reference EEG2Video_New/Semantic/eeg_text.py:11-33;
byte-identical class in EEG2Video/models/train_semantic_predictor.py:11-32):
310 -> 10000 -> 10000 -> 10000 -> 10000 -> 77*768 with ReLU, ~894M params (310·10⁴ + 3·10⁸ + 10⁴·59136).

TPU-first: this is the first model big enough to warrant tensor parallelism.
``semantic_sharding_rules`` alternates column/row sharding over the "tp" mesh
axis (Megatron-style) so each ReLU sits on a sharded activation and GSPMD
inserts exactly one psum per row-sharded layer.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn
from jax.sharding import PartitionSpec as P

CLIP_TOKENS = 77
CLIP_DIM = 768
HIDDEN = 10000
N_HIDDEN_LAYERS = 4


class SemanticPredictor(nn.Module):
    """310-dim DE features (flattened 62x5) -> (77*768,) CLIP text embedding."""

    hidden: int = HIDDEN
    n_hidden: int = N_HIDDEN_LAYERS
    out_dim: int = CLIP_TOKENS * CLIP_DIM

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.reshape(x.shape[0], -1)
        for i in range(self.n_hidden):
            x = nn.Dense(self.hidden, name=f"fc{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.out_dim, name="out")(x)


def semantic_sharding_rules(path):
    """PartitionSpec per parameter (for parallel.mesh.shard_params).

    Alternating column/row sharding: fc0/fc2 column-sharded (output dim on
    tp), fc1/fc3 row-sharded (input dim on tp), final ``out`` column-sharded.
    Biases follow the output-dim sharding of their layer.
    """
    keys = [getattr(p, "key", str(p)) for p in path]
    name = keys[-2] if len(keys) >= 2 else ""
    leaf = keys[-1]
    col = {"fc0": True, "fc1": False, "fc2": True, "fc3": False, "out": True}
    if name not in col:
        return P()
    if leaf == "kernel":
        return P(None, "tp") if col[name] else P("tp", None)
    if leaf == "bias":
        return P("tp") if col[name] else P()
    return P()


def semantic_params_from_torch(sd):
    """reference eeg_text.py checkpoint (``{'state_dict': ...}`` with keys
    mlp.0/2/4/6/8) -> Flax params."""
    import numpy as np

    out = {}
    order = ["fc0", "fc1", "fc2", "fc3", "out"]
    for i, name in enumerate(order):
        w = np.asarray(sd[f"mlp.{2 * i}.weight"])
        b = np.asarray(sd[f"mlp.{2 * i}.bias"])
        out[name] = {"kernel": w.T, "bias": b}
    return {"params": out}
