"""The analytic matmul-FLOP counter (utils/flops.py) must track the real
compiled graph: XLA's own cost analysis of the tiny UNet forward is the
oracle (XLA additionally counts elementwise FLOPs, so agreement within a few
percent means the matmul walk is structurally right)."""

import jax
import jax.numpy as jnp

from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from eeg2video_tpu.models.vae import VAEConfig
from eeg2video_tpu.utils.flops import (
    generation_clip_flops,
    train_step_flops,
    unet3d_forward_flops,
)


def test_unet_flops_match_xla_cost_analysis():
    # micro() (2 levels, 1 layer): the walk in utils/flops.py is driven by
    # the same config fields as the model, so structural agreement here
    # validates the per-block formulas at ~1/4 the lower+compile cost
    cfg = UNet3DConfig.micro()
    m = UNet3DConditionModel(cfg)
    B, F, H, W = 2, 2, 12, 16
    x = jnp.zeros((B, F, H, W, 4))
    ctx = jnp.zeros((B, 7, cfg.cross_attention_dim))
    v = m.init(jax.random.key(0), x, jnp.asarray([0] * B), ctx)
    comp = jax.jit(lambda p: m.apply({"params": p}, x, jnp.asarray([0] * B),
                                     ctx)).lower(v["params"]).compile()
    ca = comp.cost_analysis()
    xla = ca["flops"] if isinstance(ca, dict) else ca[0]["flops"]
    ours = unet3d_forward_flops(cfg, B, F, H, W, ctx_len=7)["total"]
    assert abs(ours - xla) / xla < 0.05


def test_flops_scale_linearly_in_batch():
    cfg = UNet3DConfig.tiny()
    f1 = unet3d_forward_flops(cfg, 1, 2, 12, 16)
    f2 = unet3d_forward_flops(cfg, 2, 2, 12, 16)
    # time-embedding MLP is the only non-batch-linear term (negligible)
    assert abs(f2["total"] - 2 * f1["total"]) / f1["total"] < 1e-3


def test_fullsize_magnitudes():
    """Headline-config invariants: one CFG clip is a few hundred TFLOP and
    the batch-10 train step sits between 2x and 4x its forward."""
    ucfg, vcfg = UNet3DConfig(), VAEConfig()
    clip = generation_clip_flops(ucfg, vcfg)
    assert 300e12 < clip < 900e12
    fwd = unet3d_forward_flops(ucfg, 10, 6, 36, 64)["total"]
    step = train_step_flops(ucfg, batch=10)
    assert 2 * fwd < step < 4 * fwd
