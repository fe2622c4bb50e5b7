"""Encoder parity: Flax forward vs the reference PyTorch models with converted
weights (torch runs on CPU; the reference models.py only needs torch+einops)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference/EEG2Video/models")

import jax
import models as ref_models  # noqa: E402  — reference torch module

from eeg2video_tpu.convert import encoder_params_from_torch
from eeg2video_tpu.models import make_encoder

C, T = 62, 200  # the reference Linear-size formulas only hold at T=200


def _compare(name, ref_net, flax_mod, x, atol=1e-3):
    ref_net.eval()
    with torch.no_grad():
        ref_out = ref_net(torch.from_numpy(x).float()).numpy()
    sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
    variables = encoder_params_from_torch(name, sd)
    out = np.asarray(flax_mod.apply(variables, x, train=False))
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=atol)


@pytest.mark.parametrize("name", ["shallownet", "deepnet", "eegnet", "tsconv"])
def test_raw_encoders_parity(name, rng):
    torch.manual_seed(0)
    ref = getattr(ref_models, name)(out_dim=40, C=C, T=T)
    mod = make_encoder(name, out_dim=40, C=C, T=T)
    x = rng.standard_normal((4, 1, C, T)).astype(np.float32)
    _compare(name, ref, mod, x)


def test_glfnet_parity(rng):
    torch.manual_seed(1)
    ref = ref_models.glfnet(out_dim=40, emb_dim=64, C=C, T=T)
    mod = make_encoder("glfnet", out_dim=40, emb_dim=64, C=C, T=T)
    x = rng.standard_normal((3, 1, C, T)).astype(np.float32)
    _compare("glfnet", ref, mod, x)


def test_mlpnet_parity(rng):
    torch.manual_seed(2)
    ref = ref_models.mlpnet(out_dim=40, input_dim=310)
    mod = make_encoder("mlpnet", out_dim=40)
    x = rng.standard_normal((5, 62, 5)).astype(np.float32)
    _compare("mlpnet", ref, mod, x)


def test_glfnet_mlp_parity(rng):
    torch.manual_seed(3)
    ref = ref_models.glfnet_mlp(out_dim=40, emb_dim=64, input_dim=310)
    mod = make_encoder("glfnet_mlp", out_dim=40, emb_dim=64)
    x = rng.standard_normal((5, 62, 5)).astype(np.float32)
    _compare("glfnet_mlp", ref, mod, x)


def test_conformer_parity(rng):
    torch.manual_seed(4)
    ref = ref_models.conformer(emb_size=40, depth=3, out_dim=40)
    mod = make_encoder("conformer", out_dim=40)
    x = rng.standard_normal((2, 1, C, T)).astype(np.float32)
    # 3 attention blocks amplify f32 conv-accumulation noise (~4e-4 at the
    # patch embedding, verified bug-free against torch intermediates)
    _compare("conformer", ref, mod, x, atol=2e-2)


def test_encoder_init_and_grad():
    """Encoders must init and differentiate under jit (training path)."""
    mod = make_encoder("glfnet_mlp", out_dim=40, emb_dim=64)
    x = np.zeros((2, 62, 5), np.float32)
    variables = mod.init(jax.random.key(0), x, train=False)

    def loss_fn(params):
        out = mod.apply({"params": params}, x, train=False)
        return (out ** 2).mean()

    g = jax.jit(jax.grad(loss_fn))(variables["params"])
    assert jax.tree_util.tree_all(
        jax.tree.map(lambda a: np.all(np.isfinite(a)), g)
    )
