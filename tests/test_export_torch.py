"""Round-trip checkpoint interchange: Flax params -> torch state dict ->
loads into the reference model classes and produces the same outputs."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self

import jax

from eeg2video_tpu.convert.export_torch import (
    glfnet_mlp_to_torch,
    semantic_to_torch,
    seq2seq_to_torch,
)
from eeg2video_tpu.models import make_encoder
from eeg2video_tpu.models.semantic import SemanticPredictor
from eeg2video_tpu.models.seq2seq import Seq2SeqTransformer


def test_glfnet_mlp_roundtrip(rng):
    sys.path.insert(0, "/root/reference/EEG2Video/models")
    import models as ref_models

    mod = make_encoder("glfnet_mlp", out_dim=40, emb_dim=64)
    x = rng.standard_normal((4, 62, 5)).astype(np.float32)
    variables = mod.init(jax.random.key(0), x)
    ours = np.asarray(mod.apply(variables, x))

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in glfnet_mlp_to_torch(variables).items()}
    ref = ref_models.glfnet_mlp(out_dim=40, emb_dim=64, input_dim=310)
    ref.load_state_dict(sd)
    ref.eval()
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_semantic_export_shapes(rng):
    mod = SemanticPredictor(hidden=64, out_dim=77 * 8)
    variables = mod.init(jax.random.key(0), np.zeros((1, 310), np.float32))
    sd = semantic_to_torch(variables)
    assert sd["mlp.0.weight"].shape == (64, 310)
    assert sd["mlp.8.weight"].shape == (77 * 8, 64)


def test_seq2seq_roundtrip(rng):
    sys.path.insert(0, "/root/reference/EEG2Video_New/Seq2Seq")
    import my_autoregressive_transformer as ref_s2s

    mod = Seq2SeqTransformer()
    src = rng.standard_normal((2, 7, 62, 100)).astype(np.float32)
    tgt = rng.standard_normal((2, 7, 4, 36, 64)).astype(np.float32)
    variables = mod.init(jax.random.key(1), src, train=False)
    txt_ours, lat_ours = mod.apply(variables, src, train=False)

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in seq2seq_to_torch(variables).items()}
    ref = ref_s2s.myTransformer(d_model=512)
    ref.load_state_dict(sd)
    ref.eval()
    with torch.no_grad():
        txt_ref, lat_ref = ref(torch.from_numpy(src), torch.from_numpy(tgt))
    np.testing.assert_allclose(np.asarray(txt_ours), txt_ref.numpy(), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lat_ours), lat_ref.numpy(), rtol=1e-3, atol=2e-3)
