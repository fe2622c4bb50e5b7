"""GLMNet train/inference CLI smoke over tiny synthetic artifacts."""

import os

import numpy as np


def test_train_and_inference_glmnet(tmp_path, rng):
    from eeg2video_tpu.cli import inference_glmnet, train_glmnet

    raw_dir, de_dir = tmp_path / "raw", tmp_path / "de"
    os.makedirs(raw_dir)
    os.makedirs(de_dir)
    # (7, 40 concepts, 1 rep, 1 window, 62, 100)
    raw = rng.standard_normal((7, 40, 1, 1, 62, 100)).astype(np.float32)
    de = rng.standard_normal((7, 40, 1, 1, 62, 5)).astype(np.float32)
    np.save(raw_dir / "sub1.npy", raw)
    np.save(de_dir / "sub1.npy", de)

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
