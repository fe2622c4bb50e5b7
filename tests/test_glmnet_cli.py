"""GLMNet train/inference CLI smoke over tiny synthetic artifacts."""

import os

import numpy as np
import pytest


def _write_sub(tmp_path, rng):
    raw_dir, de_dir = tmp_path / "raw", tmp_path / "de"
    os.makedirs(raw_dir)
    os.makedirs(de_dir)
    # (7, 40 concepts, 1 rep, 1 window, 62, 100)
    raw = rng.standard_normal((7, 40, 1, 1, 62, 100)).astype(np.float32)
    de = rng.standard_normal((7, 40, 1, 1, 62, 5)).astype(np.float32)
    np.save(raw_dir / "sub1.npy", raw)
    np.save(de_dir / "sub1.npy", de)
    return raw_dir, de_dir


def test_train_and_inference_glmnet(tmp_path, rng):
    from eeg2video_tpu.cli import inference_glmnet, train_glmnet

    raw_dir, de_dir = _write_sub(tmp_path, rng)

    out = tmp_path / "out"
    train_glmnet.main([
        "--raw_dir", str(raw_dir), "--de_dir", str(de_dir), "--sub", "1",
        "--save_path", str(out), "--epochs", "1", "--batch_size", "32",
        "--emb_dim", "16", "--scheduler", "cosine"])
    assert (out / "norm_stats.npz").exists()

    emb_out = tmp_path / "emb.npy"
    inference_glmnet.main([
        "--raw_dir", str(raw_dir), "--de_dir", str(de_dir), "--sub", "1",
        "--ckpt", str(out / "ckpt"), "--norm_stats", str(out / "norm_stats.npz"),
        "--emb_dim", "16", "--out", str(emb_out)])
    emb = np.load(emb_out)
    assert emb.shape == (7, 40, 1, 1, 32)  # 2 * emb_dim embeddings per window
    assert np.all(np.isfinite(emb))


def test_train_glmnet_dp_rejects_batch_smaller_than_dp(tmp_path, rng):
    """--dp N with batch_size < N has no positive multiple of dp to round
    down to; the CLI must fail loudly up front, not round the batch UP past
    what the epoch-scan reshape can slice (the round-5 review found the old
    max(bs//dp,1)*dp clamp did exactly that)."""
    from eeg2video_tpu.cli import train_glmnet

    raw_dir, de_dir = _write_sub(tmp_path, rng)
    with pytest.raises(SystemExit, match="cannot shard"):
        train_glmnet.main([
            "--raw_dir", str(raw_dir), "--de_dir", str(de_dir), "--sub", "1",
            "--save_path", str(tmp_path / "out"), "--epochs", "1",
            "--batch_size", "5", "--dp", "8", "--emb_dim", "16"])


def test_glmnet_plateau_lr_injection_reaches_traced_step():
    """The plateau scheduler's LR lives in the injected optimizer state (a
    jitted argument), so host-side changes reach the already-traced step —
    rebinding a closed-over tx would silently keep the traced LR (the bug
    this replaced).  Verified by zeroing the injected LR and observing the
    params freeze without retracing."""
    import jax
    import jax.numpy as jnp
    import optax

    tx = optax.inject_hyperparams(optax.adamw)(learning_rate=1e-2)
    params = {"w": jnp.ones((4,))}
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        grads = {"w": jnp.ones((4,))}
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    p1, opt_state = step(params, opt_state)
    moved = float(jnp.max(jnp.abs(p1["w"] - params["w"])))
    assert moved > 1e-4

    opt_state.hyperparams["learning_rate"] = jnp.asarray(0.0, jnp.float32)
    p2, opt_state = step(p1, opt_state)
    frozen = float(jnp.max(jnp.abs(p2["w"] - p1["w"])))
    assert frozen < 1e-7, frozen
