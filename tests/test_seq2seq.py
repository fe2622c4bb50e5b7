"""Seq2Seq parity vs the reference myTransformer (torch, CPU with .cuda()
monkeypatched to a no-op)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# the reference module calls .cuda() inside forward (L176); neuter it for CPU
torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self

sys.path.insert(0, "/root/reference/EEG2Video_New/Seq2Seq")
import my_autoregressive_transformer as ref_s2s  # noqa: E402

from eeg2video_tpu.convert.seq2seq_params import seq2seq_params_from_torch
from eeg2video_tpu.models.seq2seq import EEGNetEmbedding, Seq2SeqTransformer


def test_eegnet_embedding_parity(rng):
    torch.manual_seed(0)
    ref = ref_s2s.MyEEGNet_embedding(d_model=512, C=62, T=100).eval()
    x = rng.standard_normal((4, 1, 62, 100)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    from eeg2video_tpu.convert.seq2seq_params import _eegnet_embedding

    sd = {f"e.{k}": v.numpy() for k, v in ref.state_dict().items()}
    p, s = _eegnet_embedding(sd, root="e")
    mod = EEGNetEmbedding(d_model=512)
    out = mod.apply({"params": p, "batch_stats": s}, x, train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3, atol=1e-3)


def test_full_seq2seq_parity(rng):
    torch.manual_seed(1)
    ref = ref_s2s.myTransformer(d_model=512).eval()
    B = 2
    src = rng.standard_normal((B, 7, 62, 100)).astype(np.float32)
    tgt = rng.standard_normal((B, 7, 4, 36, 64)).astype(np.float32)
    with torch.no_grad():
        ref_txt, ref_lat = ref(torch.from_numpy(src), torch.from_numpy(tgt))

    variables = seq2seq_params_from_torch({k: v.numpy() for k, v in ref.state_dict().items()})
    mod = Seq2SeqTransformer()
    txt, lat = mod.apply(variables, src, tgt, train=False)
    np.testing.assert_allclose(np.asarray(txt), ref_txt.numpy(), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lat), ref_lat.numpy(), rtol=1e-3, atol=2e-3)


def test_seq2seq_shapes_and_rollout_determinism():
    mod = Seq2SeqTransformer()
    import jax

    src = np.zeros((2, 7, 62, 100), np.float32)
    variables = mod.init(jax.random.key(0), src, train=False)
    txt, lat = mod.apply(variables, src, train=False)
    assert txt.shape == (2, 13)
    assert lat.shape == (2, 7, 4, 36, 64)
