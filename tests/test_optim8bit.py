"""8-bit Adam (train/optim.py): convergence parity with f32 Adam, state size,
and the AdamW composition the reference's use_8bit_adam flag maps to."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from eeg2video_tpu.train.optim import (adam8bit, adamw8bit,
                                       scale_by_adam8bit, state_bytes)


def _train(tx, params, steps, data):
    x, y = data
    state = tx.init(params)

    def loss_fn(p):
        h = jnp.tanh(x @ p["w1"] + p["b1"])
        return jnp.mean((h @ p["w2"] + p["b2"] - y) ** 2)

    @jax.jit
    def step(params, state):
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, state = tx.update(g, state, params)
        return optax.apply_updates(params, updates), state, loss

    for _ in range(steps):
        params, state, loss = step(params, state)
    return float(loss)


def _problem(rng):
    x = jnp.asarray(rng.standard_normal((256, 64)), jnp.float32)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    y = jnp.asarray(np.tanh(np.asarray(x) @ w) @ rng.standard_normal((32, 8)).astype(np.float32))
    params = {
        "w1": jnp.asarray(rng.standard_normal((64, 32)) * 0.1, jnp.float32),
        "b1": jnp.zeros((32,), jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((32, 8)) * 0.1, jnp.float32),
        "b2": jnp.zeros((8,), jnp.float32),
    }
    return params, (x, y)


def test_adam8bit_converges_like_adam(rng):
    params, data = _problem(rng)
    l8 = _train(adam8bit(1e-2), params, 300, data)
    lf = _train(optax.adam(1e-2), params, 300, data)
    # quantization noise costs a little; it must stay the same order
    assert l8 < max(3.0 * lf, 1e-3)
    # and actually optimize: far below the variance of the targets
    assert l8 < 0.05 * float(jnp.mean(jnp.square(data[1])))


def test_single_update_matches_adam_first_step(rng):
    """Step 1 starts from zero moments on both sides -> identical up to the
    requantization of the UPDATE's inputs (which is exact at step 1: m, v are
    fresh from g, quantized AFTER the update is computed)."""
    params, (x, y) = _problem(rng)
    g = jax.tree.map(lambda p: jnp.asarray(rng.standard_normal(p.shape),
                                           jnp.float32), params)
    u8, _ = scale_by_adam8bit().update(g, scale_by_adam8bit().init(params))
    uf, _ = optax.scale_by_adam().update(g, optax.scale_by_adam().init(params))
    for a, b in zip(jax.tree.leaves(u8), jax.tree.leaves(uf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_state_is_4x_smaller(rng):
    params = {"w": jnp.zeros((4096, 512), jnp.float32)}
    s8 = scale_by_adam8bit().init(params)
    sf = optax.scale_by_adam().init(params)
    b8, bf = state_bytes(s8), state_bytes(sf)
    assert b8 < bf / 3.5  # int8 moments + per-2048 scales vs two f32 trees


def test_adamw8bit_masked_composition(rng):
    """The fine-tune chain shape: masked AdamW with decoupled decay."""
    params, data = _problem(rng)
    mask = {"w1": True, "b1": True, "w2": True, "b2": False}
    tx = adamw8bit(1e-2, weight_decay=1e-2, mask=mask)
    l = _train(tx, params, 100, data)
    assert np.isfinite(l)


def test_videodiffusion_masked_8bit_wiring(rng):
    """use_8bit_adam flows through the fine-tune's masked optimizer chain:
    frozen leaves get no moment state, trainable leaves get int8 moments."""
    from eeg2video_tpu.train.videodiffusion import (
        VideoDiffusionTrainConfig, make_optimizer)

    params = {"up0": {"attn_temp": {"to_q": {"kernel": jnp.zeros((8, 8))}},
                      "conv1": {"kernel": jnp.zeros((3, 3, 8, 8))}}}
    cfg = VideoDiffusionTrainConfig(use_8bit_adam=True)
    tx = make_optimizer(cfg, params)
    state = tx.init(params)
    dtypes = {str(x.dtype) for x in jax.tree.leaves(state)
              if hasattr(x, "dtype")}
    assert "int8" in dtypes
    g = jax.tree.map(lambda p: jnp.ones_like(p), params)
    u, _ = tx.update(g, state, params)
    assert float(jnp.abs(u["up0"]["attn_temp"]["to_q"]["kernel"]).sum()) > 0
    assert float(jnp.abs(u["up0"]["conv1"]["kernel"]).sum()) == 0  # frozen


def test_scalar_param_leaves(rng):
    """Scalar (0-d) parameter leaves update without error and track f32 Adam
    (regression: the per-row reduces used axis=-1 on the 0-d stored moments
    and crashed at trace time)."""
    import optax

    from eeg2video_tpu.train.optim import adam8bit

    params = {"w": jnp.asarray(rng.standard_normal((8, 16)), jnp.float32),
              "s": jnp.asarray(0.5, jnp.float32)}
    tx8 = adam8bit(1e-2)
    txf = optax.adam(1e-2)
    p8 = jax.tree.map(jnp.copy, params)
    pf = jax.tree.map(jnp.copy, params)
    s8, sf = tx8.init(p8), txf.init(pf)
    for i in range(10):
        grads = jax.tree.map(
            lambda p: jnp.asarray(np.cos(np.asarray(p) + i), jnp.float32), p8)
        u8, s8 = tx8.update(grads, s8, p8)
        p8 = optax.apply_updates(p8, u8)
        uf, sf = txf.update(grads, sf, pf)
        pf = optax.apply_updates(pf, uf)
    np.testing.assert_allclose(float(p8["s"]), float(pf["s"]), atol=5e-3)
