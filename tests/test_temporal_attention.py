"""TemporalAttentionUnrolled must equal the canonical rearrange-to-(B*L,F,C)
MHA with the SAME weights (the zero-init out-proj is overridden so the test
actually sees the attention output)."""

import numpy as np

import jax
import jax.numpy as jnp

from eeg2video_tpu.models.attention3d import TemporalAttentionUnrolled


def _reference_temporal(x, p, heads, head_dim):
    """Canonical formulation: (B,F,L,C) -> (B*L,F,C) -> standard MHA."""
    b, f, l, c = x.shape
    t = np.transpose(x, (0, 2, 1, 3)).reshape(b * l, f, c)
    q = t @ p["to_q"]["kernel"]
    k = t @ p["to_k"]["kernel"]
    v = t @ p["to_v"]["kernel"]
    split = lambda z: z.reshape(b * l, f, heads, head_dim).transpose(0, 2, 1, 3)
    Q, K, V = split(q), split(k), split(v)
    logits = np.einsum("nhqd,nhkd->nhqk", Q, K) / np.sqrt(head_dim)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    out = np.einsum("nhqk,nhkd->nhqd", probs, V)
    out = out.transpose(0, 2, 1, 3).reshape(b * l, f, heads * head_dim)
    out = out @ p["to_out"]["kernel"] + p["to_out"]["bias"]
    return out.reshape(b, l, f, c).transpose(0, 2, 1, 3)


def test_unrolled_matches_canonical(rng):
    b, f, l, c = 2, 6, 5, 32
    heads, head_dim = 4, 8
    mod = TemporalAttentionUnrolled(heads, head_dim)
    x = rng.standard_normal((b, f, l, c)).astype(np.float32)
    variables = mod.init(jax.random.key(0), x)
    # replace the zero out-proj with random weights so attention is visible
    p = jax.tree.map(lambda a: np.asarray(a), variables["params"])
    p["to_out"]["kernel"] = rng.standard_normal(p["to_out"]["kernel"].shape).astype(np.float32)
    out = np.asarray(mod.apply({"params": p}, jnp.asarray(x)))
    ref = _reference_temporal(x, p, heads, head_dim)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
