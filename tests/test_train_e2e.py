"""Trained-model end-to-end quality gate (VERDICT round-1 next #5): overfit a
tiny UNet on two synthetic clips with fixed context->clip mapping, generate
with the full pipeline from pure noise, and assert each generated clip is
measurably closer (SSIM and MSE) to ITS OWN target than to the other clip's —
proof that the train -> sample loop LEARNS, not just runs.

Targets are VAE-roundtripped (decode(encode(x))) since the VAE is random-init
here; the gate tests the diffusion training/sampling loop, not the VAE.

Round 5 adds the retrieval-gate proxy (VERDICT round-4 next #8): the same
trained model's clips chain through the FULL cli.run_metrics loop (GT_label
index mapping, SSIM/MSE/PSNR/hue, injected tiny ViT classifier n-way).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eeg2video_tpu.diffusion.pipeline import EEG2VideoPipeline
from eeg2video_tpu.eval.metrics import ssim
from eeg2video_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from eeg2video_tpu.models.vae import AutoencoderKL, VAEConfig, SD_VAE_SCALE
from eeg2video_tpu.train.videodiffusion import (
    VideoDiffusionTrainConfig,
    init_video_train_state,
    make_video_train_epoch,
)

F, HH, WW = 2, 32, 32


def _clips():
    """Two visually distinct clips in [-1, 1]: a horizontal ramp and a
    checkerboard, constant over frames."""
    x = np.linspace(-1, 1, WW, dtype=np.float32)
    ramp = np.broadcast_to(x[None, None, :, None], (F, HH, WW, 3)).copy()
    yy, xx = np.mgrid[0:HH, 0:WW]
    checker = (((yy // 8 + xx // 8) % 2) * 2.0 - 1.0).astype(np.float32)
    checker = np.broadcast_to(checker[None, :, :, None], (F, HH, WW, 3)).copy()
    return np.stack([ramp, checker])  # (2, F, H, W, 3)


@pytest.fixture(scope="module")
def overfit():
    """Train once per module; both gates below consume the same model.

    Uses a LOCAL generator, not the shared session fixture: the session
    rng's state here depends on which tests ran before it, so the overfit
    margin silently varied with suite composition (observed as a
    suite-only flake when unrelated tests were added)."""
    rng = np.random.default_rng(1234)
    ucfg = UNet3DConfig(block_out_channels=(32, 64, 64, 64),
                        attention_heads=4, cross_attention_dim=768,
                        norm_num_groups=8)
    vcfg = VAEConfig.tiny()
    tcfg = VideoDiffusionTrainConfig(
        learning_rate=2e-3, compute_dtype="float32", remat=False,
        train_all=True, weight_decay=0.0)

    unet = UNet3DConditionModel(ucfg)
    vae = AutoencoderKL(vcfg)
    pixels = _clips()
    ctx = rng.standard_normal((2, 77, 768)).astype(np.float32)

    sample = jnp.zeros((2, F, HH // 8, WW // 8, 4), jnp.float32)
    params = unet.init(jax.random.key(0), sample, jnp.zeros((2,), jnp.int32),
                       jnp.asarray(ctx))["params"]
    vae_params = vae.init(jax.random.key(1),
                          jnp.zeros((1, HH, WW, 3), jnp.float32))["params"]

    state = init_video_train_state(params, tcfg)
    epoch_fn = make_video_train_epoch(ucfg, vcfg, tcfg)

    steps = 150
    perm = jnp.asarray(np.tile(np.asarray([[0, 1]], np.int32), (steps, 1)))
    losses = []
    for r in range(3):  # 3 x 150 steps; one dispatch per chunk
        state, loss = epoch_fn(state, vae_params, jnp.asarray(pixels),
                               jnp.asarray(ctx), perm, jax.random.key(7 + r))
        losses.append(float(loss))

    # the achievable target: the VAE roundtrip of each training clip
    frames = jnp.asarray(pixels.reshape(2 * F, HH, WW, 3))
    mean, _ = vae.apply({"params": vae_params}, frames,
                        method=AutoencoderKL.encode)
    rt = vae.apply({"params": vae_params}, mean, method=AutoencoderKL.decode)
    rt = np.asarray((rt / 2 + 0.5).clip(0, 1)).reshape(2, F, HH, WW, 3)

    pipe = EEG2VideoPipeline.create(state.params, vae_params, ucfg, vcfg,
                                    dtype=jnp.float32)
    vids = np.asarray(pipe(ctx.reshape(2, -1), np.zeros(77 * 768, np.float32),
                           key=jax.random.key(42), video_length=F,
                           height=HH, width=WW, num_inference_steps=50,
                           guidance_scale=1.0))
    return {"pipe": pipe, "rt": rt, "ctx": ctx, "vids": vids,
            "losses": losses}


def _score(a, b):
    s = [ssim(a[f], b[f], data_range=1.0) for f in range(F)]
    return float(np.mean(s))


def test_overfit_then_generate_aligns(overfit):
    losses, rt, vids, pipe = (overfit["losses"], overfit["rt"],
                              overfit["vids"], overfit["pipe"])
    ctx = overfit["ctx"]
    assert losses[-1] < losses[0], f"training did not reduce loss: {losses}"

    for i in range(2):
        j = 1 - i
        own_ssim, other_ssim = _score(vids[i], rt[i]), _score(vids[i], rt[j])
        own_mse = float(np.mean((vids[i] - rt[i]) ** 2))
        other_mse = float(np.mean((vids[i] - rt[j]) ** 2))
        assert own_ssim > other_ssim, (i, own_ssim, other_ssim)
        assert own_mse < other_mse, (i, own_mse, other_mse)

    # DPM-Solver++(2M) fast path on the TRAINED model (round-4 VERDICT #4):
    # the 20-step serving graph must pass the same alignment gate AND sit in
    # the same quality tier as DDIM — until now its quality was pinned only
    # to scheduler math on a Gaussian toy (tests/test_dpm_solver.py), never
    # to a trained sampler output.  Gate: per-clip alignment (own target
    # beats the swapped target on SSIM and MSE) plus mean own-target SSIM
    # within 0.1 of the DDIM-50 clips' (per-clip SSIM on this tiny overfit
    # model is noisy — measured ddim/dpm own-SSIM pairs (0.256, 0.130) and
    # (0.341, 0.392); the means differ by ~0.04).
    vids_dpm = np.asarray(pipe(ctx.reshape(2, -1),
                               np.zeros(77 * 768, np.float32),
                               key=jax.random.key(42), video_length=F,
                               height=HH, width=WW, num_inference_steps=20,
                               guidance_scale=1.0, sampler="dpm++"))
    own_ddim, own_dpm = [], []
    for i in range(2):
        j = 1 - i
        own, other = _score(vids_dpm[i], rt[i]), _score(vids_dpm[i], rt[j])
        assert own > other, ("dpm++", i, own, other)
        own_mse = float(np.mean((vids_dpm[i] - rt[i]) ** 2))
        other_mse = float(np.mean((vids_dpm[i] - rt[j]) ** 2))
        assert own_mse < other_mse, ("dpm++", i, own_mse, other_mse)
        own_dpm.append(own)
        own_ddim.append(_score(vids[i], rt[i]))
    assert np.mean(own_dpm) > np.mean(own_ddim) - 0.1, (
        "dpm++-20 quality fell out of the DDIM-50 tier", own_dpm, own_ddim)


def test_overfit_chain_through_run_metrics(overfit, tmp_path, monkeypatch):
    """Retrieval-gate proxy (VERDICT round-4 next #8): the overfit model's
    generated clips run through the FULL cli.run_metrics loop — GIF IO,
    the block-6 GT_label index mapping (reference
    40_class_run_metrics.py:352-361), SSIM/MSE/PSNR/hue, and the n-way
    classifier path with an injected tiny ViT.  Gates: the correctly
    GT-mapped layout scores a higher SSIM than a swapped-GT layout (the
    mapping has power), and 2-way classifier accuracy beats chance."""
    import functools
    import json

    torch = pytest.importorskip("torch")
    from transformers import (ViTConfig, ViTForImageClassification,
                              ViTImageProcessor)

    import eeg2video_tpu.eval.metrics as eval_metrics
    from eeg2video_tpu.cli import run_metrics
    from eeg2video_tpu.data import meta
    from eeg2video_tpu.data.video import save_videos_grid

    vids, rt = overfit["vids"], overfit["rt"]
    pred_dir = tmp_path / "pred"
    os.makedirs(pred_dir)
    for i in range(2):
        save_videos_grid(vids[i:i + 1], str(pred_dir / f"{i}.gif"))

    # prediction i (class order) pairs with the GT clip at the block-6
    # presentation position of class i — place the GT files there
    idx = meta.block_reorder_indices(6)
    gt_order = (idx[:, None] * meta.N_REPS + np.arange(meta.N_REPS)).reshape(-1)

    def write_gt(d, clips):
        os.makedirs(d)
        for i, c in enumerate(clips):
            save_videos_grid(c[None], os.path.join(str(d),
                                                   f"{int(gt_order[i])}.gif"))

    write_gt(tmp_path / "gt", [rt[0], rt[1]])
    write_gt(tmp_path / "gt_swapped", [rt[1], rt[0]])

    # tiny seeded ViT injected through the REAL classifier_metrics loop
    cfg = ViTConfig(hidden_size=32, num_hidden_layers=1,
                    num_attention_heads=2, intermediate_size=64,
                    image_size=224, num_labels=10)
    torch.manual_seed(0)
    model = ViTForImageClassification(cfg)
    processor = ViTImageProcessor(size={"height": 224, "width": 224})
    monkeypatch.setattr(
        eval_metrics, "classifier_metrics",
        functools.partial(eval_metrics.classifier_metrics, model=model,
                          processor=processor))

    def run(gt_dir, out_name, classifier=False):
        out = tmp_path / out_name
        run_metrics.main([
            "--pred_dir", str(pred_dir), "--gt_dir", str(gt_dir),
            "--n_clips", "2", "--out", str(out),
            *(["--classifier", "--n_way", "2", "--num_trials", "50"]
              if classifier else [])])
        return json.loads(out.read_text())

    res = run(tmp_path / "gt", "metrics.json", classifier=True)
    swapped = run(tmp_path / "gt_swapped", "metrics_swapped.json")

    for k in ("ssim", "mse", "psnr", "hue"):
        assert np.isfinite(res[k]), (k, res)
    # the GT_label mapping end to end: pairing each prediction with its
    # OWN target must beat the swapped pairing
    assert res["ssim"] > swapped["ssim"], (res["ssim"], swapped["ssim"])
    assert res["mse"] < swapped["mse"], (res["mse"], swapped["mse"])
    # n-way retrieval proxy: 2-way accuracy beats chance (0.5)
    assert res["img_2way"] > 0.5, res
    assert 0.0 <= res["video_2way"] <= 1.0, res