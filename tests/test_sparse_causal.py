"""SparseCausalAttention split formulation (frames 0-1 on K0 only) must equal
the reference's plain gather-and-concat semantics (attention.py:292-301,
including the duplicated-K0 softmax weighting for frames 0 and 1)."""

import numpy as np

import jax
import jax.numpy as jnp

from eeg2video_tpu.models.attention3d import SparseCausalAttention
from eeg2video_tpu.ops.attention import mha_reference


def _reference_sparse(x, p, heads, head_dim):
    b, f, l, c = x.shape
    inner = heads * head_dim
    flat = x.reshape(b * f, l, c)
    q = flat @ p["to_q"]["kernel"]
    k = flat @ p["to_k"]["kernel"]
    v = flat @ p["to_v"]["kernel"]
    prev = np.maximum(np.arange(f) - 1, 0)
    first = np.zeros(f, np.int64)

    def gather(t):
        t = t.reshape(b, f, l, inner)
        return np.concatenate([t[:, first], t[:, prev]], axis=2).reshape(b * f, 2 * l, inner)

    kg, vg = gather(k), gather(v)
    split = lambda t, ln: t.reshape(b * f, ln, heads, head_dim).transpose(0, 2, 1, 3)
    out = np.asarray(mha_reference(jnp.asarray(split(q, l)), jnp.asarray(split(kg, 2 * l)),
                                   jnp.asarray(split(vg, 2 * l))))
    out = out.transpose(0, 2, 1, 3).reshape(b * f, l, inner)
    return (out @ p["to_out"]["kernel"] + p["to_out"]["bias"]).reshape(b, f, l, c)


def test_split_matches_gather_semantics(rng):
    b, f, l, c = 2, 6, 8, 32
    heads, head_dim = 4, 8
    mod = SparseCausalAttention(heads, head_dim)
    x = rng.standard_normal((b, f, l, c)).astype(np.float32)
    variables = mod.init(jax.random.key(0), x)
    p = jax.tree.map(np.asarray, variables["params"])
    out = np.asarray(mod.apply({"params": p}, jnp.asarray(x)))
    ref = _reference_sparse(x, p, heads, head_dim)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
