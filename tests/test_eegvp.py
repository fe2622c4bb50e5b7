"""EEG-VP benchmark trainer: learns separable synthetic data on one fold."""

import numpy as np

from eeg2video_tpu.data import meta
from eeg2video_tpu.train.eegvp import EEGVPConfig, make_fold_splits, train_fold


def test_fold_splits():
    tr, val, te = make_fold_splits(6)
    assert val == 5 and te == 6 and tr == [0, 1, 2, 3, 4]
    tr, val, te = make_fold_splits(0)
    assert val == 6 and te == 0 and tr == [1, 2, 3, 4, 5]


def test_train_fold_learns_separable_data(rng):
    """10-class synthetic DE features with class-dependent means must reach
    high accuracy in a few epochs; exercises the scan-epoch + best-val path."""
    n_cls, reps = 10, 12
    n = n_cls * reps
    feats = np.zeros((7, n, 62, 5), np.float32)
    labels = np.zeros((7, n), np.int64)
    for b in range(7):
        y = rng.permutation(np.repeat(np.arange(n_cls), reps))
        labels[b] = y
        centers = np.linspace(-2, 2, n_cls)
        feats[b] = centers[y][:, None, None] + 0.1 * rng.standard_normal((n, 62, 5))
    cfg = EEGVPConfig(out_dim=n_cls, emb_dim=16, batch_size=32, epochs=8)
    r = train_fold(feats, labels, test_block=6, cfg=cfg, seed=0)
    assert r["test_top1"] > 0.9, r["test_top1"]
    assert r["confusion"].sum() == n
    assert r["predictions"].shape == (n,)


def _synthetic(rng, n_cls=8, reps=10):
    n = n_cls * reps
    feats = np.zeros((7, n, 62, 5), np.float32)
    labels = np.zeros((7, n), np.int64)
    for b in range(7):
        y = rng.permutation(np.repeat(np.arange(n_cls), reps))
        labels[b] = y
        centers = np.linspace(-2, 2, n_cls)
        feats[b] = centers[y][:, None, None] + 0.1 * rng.standard_normal((n, 62, 5))
    return feats, labels


def test_fold_parallel_matches_serial(rng):
    """The vmapped 7-fold program reproduces the serial loop (same per-fold
    seeds/keys/data) — accuracies equal, predictions identical."""
    from eeg2video_tpu.train.eegvp import run_benchmark

    feats, labels = _synthetic(rng)
    cfg = EEGVPConfig(out_dim=8, emb_dim=16, batch_size=32, epochs=4)
    serial = run_benchmark(feats, labels, cfg, seed=3)
    par = run_benchmark(feats, labels, cfg, seed=3, fold_parallel=True)
    for rs, rp in zip(serial["folds"], par["folds"]):
        assert abs(rs["test_top1"] - rp["test_top1"]) < 1e-6
        np.testing.assert_array_equal(rs["predictions"], rp["predictions"])


def test_fold_parallel_sharded_mesh(rng):
    """Fold axis sharded over a 7-device 'fold' mesh: results match the
    single-device vmapped run."""
    import jax
    from jax.sharding import Mesh
    from eeg2video_tpu.train.eegvp import run_benchmark

    feats, labels = _synthetic(rng)
    cfg = EEGVPConfig(out_dim=8, emb_dim=16, batch_size=32, epochs=4)
    mesh = Mesh(np.asarray(jax.devices()[:7]), ("fold",))
    par = run_benchmark(feats, labels, cfg, seed=3, fold_parallel=True)
    shd = run_benchmark(feats, labels, cfg, seed=3, fold_parallel=True, mesh=mesh)
    for rp, rm in zip(par["folds"], shd["folds"]):
        assert abs(rp["test_top1"] - rm["test_top1"]) < 1e-6
        np.testing.assert_array_equal(rp["predictions"], rm["predictions"])
