"""Seq2Seq / semantic trainer smoke: scan-epoch path runs and reduces loss."""

import numpy as np

from eeg2video_tpu.train.seq2seq import (
    Seq2SeqTrainConfig,
    prepare_seq2seq_data,
    rollout_latents,
    train_seq2seq,
)
from eeg2video_tpu.train.semantic import (
    SemanticTrainConfig,
    prepare_semantic_data,
    predict_semantic,
    train_semantic,
)


def test_semantic_trainer_learns(rng):
    eeg = rng.standard_normal((96, 310)).astype(np.float32)
    W = (0.05 * rng.standard_normal((310, 64))).astype(np.float32)
    text = (eeg @ W).astype(np.float32)
    cfg = SemanticTrainConfig(epochs=60, batch_size=16, lr=1e-3, hidden=64, out_dim=64)
    variables, losses = train_semantic(eeg, text, cfg, seed=0)
    assert losses[-1] < 0.5 * losses[0]
    pred = predict_semantic(variables, eeg[:8], hidden=64, out_dim=64)
    assert pred.shape == (8, 64)


def test_prepare_semantic_data_shapes(rng):
    de = rng.standard_normal((7, 40, 5, 62, 5))
    texts = [rng.standard_normal((200, 77, 8)).astype(np.float32) for _ in range(6)]
    eeg, text, scaler = prepare_semantic_data(de, texts)
    assert eeg.shape == (1200, 310)
    assert text.shape == (1200, 77 * 8)


def test_prepare_seq2seq_data_and_rollout(rng):
    raw = rng.standard_normal((7, 40, 5, 62, 400)).astype(np.float32)
    tr_lat = rng.standard_normal((1200, 4, 6, 36, 64)).astype(np.float32)
    te_lat = rng.standard_normal((200, 4, 6, 36, 64)).astype(np.float32)
    tr_eeg, tr_l, te_eeg, te_l, scaler = prepare_seq2seq_data(raw, tr_lat, te_lat)
    assert tr_eeg.shape == (1200, 7, 62, 100)
    assert tr_l.shape == (1200, 6, 4, 36, 64)
    assert te_eeg.shape == (200, 7, 62, 100)
    assert te_l.shape == (200, 6, 4, 36, 64)

    # one-epoch train on a small slice exercises the scan path end to end
    cfg = Seq2SeqTrainConfig(epochs=1, batch_size=8)
    variables, losses = train_seq2seq(tr_eeg[:16], tr_l[:16], cfg, seed=0)
    assert np.isfinite(losses[0])
    out = rollout_latents(variables, te_eeg[:4], batch_size=4)
    assert out.shape == (4, 6, 4, 36, 64)


def test_prepare_semantic_data_legacy(rng):
    from eeg2video_tpu.train.semantic import prepare_semantic_data_legacy

    de = rng.standard_normal((7, 40, 5, 2, 62, 5))
    text = rng.standard_normal((1400, 77, 8)).astype(np.float32)
    eeg, t, scaler = prepare_semantic_data_legacy(de, text)
    assert eeg.shape == (1200, 310)
    assert t.shape == (1200, 77 * 8)
    # window-mean semantics
    b0 = de[0]
    import numpy as _np
    from eeg2video_tpu.data import meta as _meta
    reordered = _meta.reorder_by_gt(b0, 0).reshape(200, 2, 310).mean(axis=1)
    _np.testing.assert_allclose(scaler.transform(reordered), eeg[:200], rtol=1e-5)
