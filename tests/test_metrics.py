"""Pixel-metric correctness: SSIM vs a straightforward numpy oracle with
skimage semantics, PSNR/MSE/hue sanity, n-way accuracy."""

import numpy as np

from eeg2video_tpu.eval import (
    hue_score_only,
    mse_score_only,
    n_way_top_k_acc,
    psnr_score_only,
    ssim,
    ssim_score_only,
)


def _ssim_numpy_oracle(x, y, data_range=255.0, win=7):
    """Direct skimage-semantics SSIM: uniform window, sample covariance,
    border crop.  O(HWC*win^2) — test-only."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    K1, K2 = 0.01, 0.03
    C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
    NP = win * win
    cov_norm = NP / (NP - 1)
    pad = win // 2

    def uf(a):
        ap = np.pad(a, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")
        out = np.zeros_like(a)
        for i in range(a.shape[0]):
            for j in range(a.shape[1]):
                out[i, j] = ap[i:i + win, j:j + win].mean(axis=(0, 1))
        return out

    ux, uy = uf(x), uf(y)
    vx = cov_norm * (uf(x * x) - ux * ux)
    vy = cov_norm * (uf(y * y) - uy * uy)
    vxy = cov_norm * (uf(x * y) - ux * uy)
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / ((ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))
    return S[pad:-pad, pad:-pad].mean()


def test_ssim_matches_oracle(rng):
    x = rng.uniform(0, 255, (24, 32, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 20, x.shape), 0, 255).astype(np.float32)
    ours = float(ssim(x, y))
    ref = _ssim_numpy_oracle(x, y)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
    assert float(ssim(x, x)) > 0.9999


def test_score_helpers(rng):
    pred = rng.uniform(0, 255, (3, 16, 16, 3)).astype(np.float32)
    gt = pred.copy()
    m, s = mse_score_only(pred, gt)
    assert m == 0.0
    p, _ = psnr_score_only(pred, np.clip(pred + 1, 0, 255))
    assert 40 < p < 60
    h, _ = hue_score_only(pred, pred)
    np.testing.assert_allclose(h, 1.0, atol=1e-5)
    ss, _ = ssim_score_only(pred, gt)
    np.testing.assert_allclose(ss, 1.0, atol=1e-5)


def test_n_way_top_k_acc():
    rng = np.random.default_rng(0)
    probs = np.zeros(40)
    probs[7] = 1.0  # classifier certain of class 7
    acc, _ = n_way_top_k_acc(probs, 7, n_way=2, num_trials=50, rng=rng)
    assert acc == 1.0
    acc, _ = n_way_top_k_acc(probs, 3, n_way=2, num_trials=50, rng=rng)
    assert acc < 0.2


def test_config_tree(tmp_path):
    from eeg2video_tpu.config import Config, load_config

    cfg = load_config()
    assert cfg.generation.num_inference_steps == 100
    y = tmp_path / "c.yaml"
    y.write_text("generation:\n  guidance_scale: 7.5\nunet:\n  attention_heads: 4\n")
    cfg = load_config(str(y), overrides=["generation.seed=7", "data.outputs=./o2"])
    assert cfg.generation.guidance_scale == 7.5
    assert cfg.unet.attention_heads == 4
    assert cfg.generation.seed == 7
    assert cfg.data.outputs == "./o2"


def test_classifier_metrics_from_pretrained_image(tmp_path, rng):
    """The REAL loading branch (eval/metrics.py image kind): a random-weight
    ViT saved with save_pretrained is loaded back via model_path — the code
    path users hit with actual hub checkpoints, exercised offline."""
    import pytest

    torch = pytest.importorskip("torch")
    from transformers import ViTConfig, ViTForImageClassification, ViTImageProcessor

    from eeg2video_tpu.eval.metrics import classifier_metrics

    d = tmp_path / "vit"
    cfg = ViTConfig(hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                    intermediate_size=64, image_size=32, patch_size=16,
                    num_labels=10)
    torch.manual_seed(0)
    ViTForImageClassification(cfg).save_pretrained(d)
    ViTImageProcessor(size={"height": 32, "width": 32}).save_pretrained(d)

    frames = rng.uniform(0, 255, (2, 32, 32, 3)).astype(np.float32)
    accs, _ = classifier_metrics(frames, frames, kind="image", n_way=2,
                                 num_trials=10, model_path=str(d),
                                 rng=np.random.default_rng(0))
    assert len(accs) == 2 and all(a == 1.0 for a in accs)


def test_classifier_metrics_from_pretrained_video(tmp_path, rng):
    """Same for the VideoMAE video branch, including the num_frames override
    classifier_metrics passes to from_pretrained."""
    import pytest

    torch = pytest.importorskip("torch")
    from transformers import (VideoMAEConfig, VideoMAEForVideoClassification,
                              VideoMAEImageProcessor)

    from eeg2video_tpu.eval.metrics import classifier_metrics

    d = tmp_path / "videomae"
    cfg = VideoMAEConfig(hidden_size=32, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=64,
                         image_size=32, patch_size=16, num_frames=2,
                         tubelet_size=2, num_labels=10)
    torch.manual_seed(0)
    VideoMAEForVideoClassification(cfg).save_pretrained(d)
    VideoMAEImageProcessor(size={"shortest_edge": 32},
                           crop_size={"height": 32, "width": 32}).save_pretrained(d)

    clips = rng.uniform(0, 255, (2, 2, 32, 32, 3)).astype(np.uint8)
    accs, _ = classifier_metrics(clips, clips, kind="video", n_way=2,
                                 num_trials=10, model_path=str(d),
                                 rng=np.random.default_rng(0))
    assert len(accs) == 2 and all(a == 1.0 for a in accs)


def test_clip_score_from_pretrained(tmp_path, rng):
    """clip_score's real CLIPModel/CLIPProcessor loading path, offline: a
    tiny random-weight CLIP (with a 2-token tokenizer — clip_score only uses
    the vision tower) saved and reloaded by directory."""
    import json

    import pytest

    torch = pytest.importorskip("torch")
    from transformers import (CLIPConfig, CLIPImageProcessor, CLIPModel,
                              CLIPProcessor, CLIPTextConfig, CLIPTokenizer,
                              CLIPVisionConfig)

    from eeg2video_tpu.eval.metrics import clip_score

    d = tmp_path / "clip"
    d.mkdir()
    (d / "vocab.json").write_text(json.dumps(
        {"<|startoftext|>": 0, "<|endoftext|>": 1}))
    (d / "merges.txt").write_text("#version: 0.2\n")
    tok = CLIPTokenizer(str(d / "vocab.json"), str(d / "merges.txt"))
    proc = CLIPProcessor(
        image_processor=CLIPImageProcessor(size={"shortest_edge": 32},
                                           crop_size={"height": 32, "width": 32}),
        tokenizer=tok)
    proc.save_pretrained(d)
    cfg = CLIPConfig(
        text_config=CLIPTextConfig(vocab_size=4, hidden_size=32,
                                   num_hidden_layers=1, num_attention_heads=2,
                                   intermediate_size=64).to_dict(),
        vision_config=CLIPVisionConfig(hidden_size=32, num_hidden_layers=1,
                                       num_attention_heads=2,
                                       intermediate_size=64, image_size=32,
                                       patch_size=16).to_dict(),
        projection_dim=16)
    torch.manual_seed(0)
    CLIPModel(cfg).save_pretrained(d)

    imgs = rng.uniform(0, 255, (3, 32, 32, 3)).astype(np.uint8)
    sims = clip_score(imgs, imgs, model_path=str(d))
    assert sims.shape == (3,)
    np.testing.assert_allclose(sims, 1.0, atol=1e-5)


def test_classifier_metrics_with_injected_model(rng):
    """Exercise the ViT n-way path offline with a config-instantiated tiny
    model (no hub access)."""
    import pytest

    torch = pytest.importorskip("torch")
    from transformers import ViTConfig, ViTForImageClassification, ViTImageProcessor

    from eeg2video_tpu.eval.metrics import classifier_metrics

    cfg = ViTConfig(hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                    intermediate_size=64, image_size=224, num_labels=10)
    torch.manual_seed(0)
    model = ViTForImageClassification(cfg)
    processor = ViTImageProcessor(size={"height": 224, "width": 224})

    frames = rng.uniform(0, 255, (2, 224, 224, 3)).astype(np.float32)
    accs, stds = classifier_metrics(frames, frames, kind="image", n_way=2,
                                    num_trials=10, model=model,
                                    processor=processor,
                                    rng=np.random.default_rng(0))
    assert len(accs) == 2
    # pred == gt: the GT top-3 classes include the pred argmax -> perfect 2-way
    assert all(a == 1.0 for a in accs)
