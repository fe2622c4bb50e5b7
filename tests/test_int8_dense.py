"""Weight-only-int8 dense kernel (ops/int8_dense) — serving quantization
for the semantic predictor.  No reference counterpart (the reference serves
fp16 at best); correctness is pinned against the f32 path.
"""

import numpy as np
import jax
import jax.numpy as jnp

from eeg2video_tpu.ops.int8_dense import (
    int8_dense,
    quantize_dense_tree,
    quantize_int8,
)


def test_kernel_matches_dequant_reference():
    rng = np.random.default_rng(0)
    k, n, m = 200, 700, 9  # deliberately unpadded shapes
    w = rng.standard_normal((k, n)).astype(np.float32)
    b = rng.standard_normal((n,)).astype(np.float32)
    x = rng.standard_normal((m, k)).astype(np.float32)
    w_q, scale = quantize_int8(w, bn=256)
    y = np.asarray(int8_dense(jnp.asarray(x), jnp.asarray(w_q),
                              jnp.asarray(scale), b, n_out=n, bn=256))
    # reference: same bf16 operand cast, f32 accumulation, scale epilogue
    xp = jnp.pad(jnp.asarray(x), ((0, 0), (0, w_q.shape[0] - k)))
    ref = jnp.dot(xp.astype(jnp.bfloat16),
                  jnp.asarray(w_q).astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    ref = np.asarray(ref * scale[None, :] + np.pad(b, (0, scale.shape[0] - n)))
    np.testing.assert_allclose(y, ref[:, :n], rtol=1e-5, atol=1e-5)


def test_quantization_accuracy():
    rng = np.random.default_rng(1)
    k, n, m = 128, 512, 16
    w = rng.standard_normal((k, n)).astype(np.float32)
    b = rng.standard_normal((n,)).astype(np.float32)
    x = rng.standard_normal((m, k)).astype(np.float32)
    w_q, scale = quantize_int8(w)
    y = np.asarray(int8_dense(jnp.asarray(x), jnp.asarray(w_q),
                              jnp.asarray(scale), b, n_out=n))
    ref = x @ w + b
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 0.02, rel


def test_semantic_int8_serving_cosine():
    from eeg2video_tpu.models.semantic import SemanticPredictor
    from eeg2video_tpu.train.semantic import (
        predict_semantic,
        predict_semantic_int8,
    )

    model = SemanticPredictor(hidden=256, out_dim=384)
    rng = np.random.default_rng(2)
    eeg = rng.standard_normal((12, 310)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 310)))
    ref = predict_semantic(variables, eeg, hidden=256, out_dim=384)
    q = predict_semantic_int8(variables, eeg, bn=128)
    assert q.shape == ref.shape
    cos = (q * ref).sum(axis=1) / (
        np.linalg.norm(q, axis=1) * np.linalg.norm(ref, axis=1))
    assert cos.min() > 0.999, cos.min()
