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
