"""Fused GEGLU->out-GEMM kernel (ops.geglu) correctness + module parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eeg2video_tpu.ops.geglu import fused_geglu_out, _geglu_fused, _geglu_ref


@pytest.mark.parametrize(
    "T,I,C",
    [
        (512, 128, 128),   # minimal lane-aligned shape
        (300, 256, 128),   # non-multiple rows (pad path)
        (256, 128, 320),   # C off the 128-lane grid (UNet level 0)
    ],
)
def test_geglu_kernel_matches_reference(rng, T, I, C):
    h2 = jnp.asarray(rng.standard_normal((T, 2 * I)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((I, C)) * 0.05).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((C,)).astype(np.float32))
    out = _geglu_fused(h2, w, b)  # interpret-mode Pallas on CPU
    ref = _geglu_ref(h2, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_geglu_dispatcher_small_shapes_use_xla(rng):
    # tiny widths (test-scale UNets) stay off the kernel grid
    h2 = jnp.asarray(rng.standard_normal((2, 6, 10, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((32, 16)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((16,)).astype(np.float32))
    out = fused_geglu_out(h2, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_geglu_ref(h2, w, b)),
                               rtol=1e-6, atol=1e-6)


def test_geglu_gradients_match_reference(rng):
    T, I, C = 384, 128, 128
    h2 = jnp.asarray(rng.standard_normal((T, 2 * I)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((I, C)) * 0.05).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((C,)).astype(np.float32))

    gf = jax.grad(lambda *a: jnp.sum(_geglu_fused(*a) ** 2), argnums=(0, 1, 2))(h2, w, b)
    gr = jax.grad(lambda *a: jnp.sum(_geglu_ref(*a) ** 2), argnums=(0, 1, 2))(h2, w, b)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("T,C,I", [(512, 128, 512), (300, 256, 1024),
                                   (256, 320, 1280)])
def test_ff_ln_kernel_matches_reference(rng, T, C, I):
    from eeg2video_tpu.ops.geglu import _ff_fused, _ff_ref

    x = jnp.asarray(rng.standard_normal((T, C)).astype(np.float32))
    gamma = jnp.asarray(1 + 0.1 * rng.standard_normal(C).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))
    wp = jnp.asarray((rng.standard_normal((C, 2 * I)) * 0.05).astype(np.float32))
    bp = jnp.asarray(0.1 * rng.standard_normal(2 * I).astype(np.float32))
    wo = jnp.asarray((rng.standard_normal((I, C)) * 0.05).astype(np.float32))
    bo = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))
    out = _ff_fused(x, gamma, beta, wp, bp, wo, bo, 1e-5)
    ref = _ff_ref(x, gamma, beta, wp, bp, wo, bo, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)


def test_ff_ln_gradients_match_reference(rng):
    from eeg2video_tpu.ops.geglu import _ff_fused, _ff_ref

    T, C, I = 256, 128, 512
    args = (
        jnp.asarray(rng.standard_normal((T, C)).astype(np.float32)),
        jnp.asarray(1 + 0.1 * rng.standard_normal(C).astype(np.float32)),
        jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32)),
        jnp.asarray((rng.standard_normal((C, 2 * I)) * 0.05).astype(np.float32)),
        jnp.asarray(0.1 * rng.standard_normal(2 * I).astype(np.float32)),
        jnp.asarray((rng.standard_normal((I, C)) * 0.05).astype(np.float32)),
        jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32)),
    )
    gf = jax.grad(lambda *a: jnp.sum(_ff_fused(*a, 1e-5) ** 2),
                  argnums=tuple(range(7)))(*args)
    gr = jax.grad(lambda *a: jnp.sum(_ff_ref(*a, 1e-5) ** 2),
                  argnums=tuple(range(7)))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_block_ff_param_tree_matches_module_branch(rng):
    """The fused-FF block path (dropout=0) and the module path (dropout>0)
    must create identical norm3/ff param trees so checkpoints interchange."""
    from eeg2video_tpu.models.attention3d import BasicTransformerBlock

    x = jnp.asarray(rng.standard_normal((1, 2, 12, 32)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 7, 16)).astype(np.float32))
    blk_f = BasicTransformerBlock(heads=2, head_dim=16, dropout=0.0)
    blk_m = BasicTransformerBlock(heads=2, head_dim=16, dropout=0.1)
    p_f = blk_f.init(jax.random.key(0), x, ctx)["params"]
    p_m = blk_m.init(jax.random.key(0), x, ctx)["params"]
    assert jax.tree.structure(p_f) == jax.tree.structure(p_m)
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_m)):
        assert a.shape == b.shape

    # identical params -> identical eval outputs across the two branches
    out_f = blk_f.apply({"params": p_m}, x, ctx)
    out_m = blk_m.apply({"params": p_m}, x, ctx)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_m),
                               rtol=2e-5, atol=2e-5)


def test_ff_module_fused_param_tree_matches_dense(rng):
    """The fused "out" submodule must create the exact param tree of the
    nn.Dense branch so checkpoints interchange (train vs inference graphs)."""
    from eeg2video_tpu.models.attention3d import GEGLUFeedForward

    x = jnp.asarray(rng.standard_normal((2, 20, 32)).astype(np.float32))
    ff_d = GEGLUFeedForward(dropout=0.5)  # train branch -> nn.Dense
    ff_f = GEGLUFeedForward(dropout=0.0)  # fused branch
    p_dense = ff_d.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)}, x, train=True)["params"]
    p_fused = ff_f.init(jax.random.key(0), x, train=False)["params"]
    assert jax.tree.structure(p_dense) == jax.tree.structure(p_fused)
    for a, b in zip(jax.tree.leaves(p_dense), jax.tree.leaves(p_fused)):
        assert a.shape == b.shape and a.dtype == b.dtype

    # and identical params give identical outputs across the two branches
    out_f = ff_f.apply({"params": p_dense}, x, train=False)
    h, gate = jnp.split(
        x @ p_dense["proj"]["kernel"] + p_dense["proj"]["bias"], 2, axis=-1)
    ref = (h * jax.nn.gelu(gate, approximate=False)) @ p_dense["out"]["kernel"] \
        + p_dense["out"]["bias"]
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
