"""Evaluation metrics (reference EEG2Video/40_class_run_metrics.py and
EEG2Video_New/Generation/40_class_run_metrics.py).

Pixel metrics (SSIM / MSE / PSNR / hue) are pure jnp — vmapped over clips and
jitted; SSIM reproduces skimage.metrics.structural_similarity defaults
(win_size=7 uniform filter, K1=0.01, K2=0.03, channel-averaged), the exact
call the reference makes with data_range=255 (reference legacy L213-233).

Note two reference bugs NOT replicated (SURVEY.md 2.4): the new metrics file
defines ``psnr_score_only``/``hue_score_only`` that call undefined ``psnr``/
``calculate_hue_similarity`` helpers (new L249-276) — here both are real
implementations (PSNR standard; hue similarity = mean cosine similarity of
HSV hue angles).

Classifier metrics (CLIP / ViT / VideoMAE n-way accuracy) are host-side HF
calls, evaluation-only (not part of the TPU path) — see
``classifier_metrics`` which requires locally cached checkpoints.
``n_way_top_k_acc`` (reference L57-70) is pure numpy and vendored here.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


# --- SSIM (skimage structural_similarity semantics) ---------------------------

def _uniform_filter(x, size=7):
    """Separable uniform filter with 'reflect' padding on (H, W) axes."""
    pad = size // 2
    for axis in (0, 1):
        pads = [(0, 0)] * x.ndim
        pads[axis] = (pad, pad)
        xp = jnp.pad(x, pads, mode="reflect")
        # convolve along `axis` via cumulative sum (exact uniform filter)
        xp = jnp.moveaxis(xp, axis, -1)
        c = jnp.cumsum(jnp.concatenate([jnp.zeros_like(xp[..., :1]), xp], axis=-1), axis=-1)
        out = (c[..., size:] - c[..., :-size]) / size
        x = jnp.moveaxis(out, -1, axis)
    return x


@functools.partial(jax.jit, static_argnames=("win_size",))
def ssim(img1, img2, data_range=255.0, win_size=7):
    """(H, W, C) single-image SSIM, channel-averaged (skimage defaults:
    uniform window, K1=0.01, K2=0.03, sample covariance normalization)."""
    x = jnp.asarray(img1, jnp.float32)
    y = jnp.asarray(img2, jnp.float32)
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win_size ** 2
    cov_norm = NP / (NP - 1)  # skimage sample covariance

    ux = _uniform_filter(x, win_size)
    uy = _uniform_filter(y, win_size)
    uxx = _uniform_filter(x * x, win_size)
    uyy = _uniform_filter(y * y, win_size)
    uxy = _uniform_filter(x * y, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
    B1, B2 = ux ** 2 + uy ** 2 + C1, vx + vy + C2
    S = (A1 * A2) / (B1 * B2)

    # skimage crops the filter radius border before averaging
    pad = (win_size - 1) // 2
    return jnp.mean(S[pad:-pad, pad:-pad])


def _per_clip(fn, pred_videos, gt_videos, **kw):
    scores = [float(fn(p, g, **kw)) for p, g in zip(np.asarray(pred_videos), np.asarray(gt_videos))]
    return float(np.mean(scores)), float(np.std(scores))


def ssim_score_only(pred_videos, gt_videos, **kw):
    """Mean/std SSIM over clips of (H, W, C) uint8-range frames
    (reference legacy L213-233; channel-last handled by caller)."""
    return _per_clip(lambda p, g: ssim(p, g, data_range=255.0), pred_videos, gt_videos)


def mse_score_only(pred_videos, gt_videos, **kw):
    """Pixel MSE on 0-1 normalized values (reference legacy L201-211)."""
    f = lambda p, g: jnp.mean((jnp.asarray(p, jnp.float32) / 255.0
                               - jnp.asarray(g, jnp.float32) / 255.0) ** 2)
    return _per_clip(f, pred_videos, gt_videos)


def psnr_score_only(pred_videos, gt_videos, **kw):
    """PSNR in dB (the reference's new file references an undefined helper —
    this is a standard implementation)."""
    def f(p, g):
        mse = jnp.mean((jnp.asarray(p, jnp.float32) - jnp.asarray(g, jnp.float32)) ** 2)
        return 10.0 * jnp.log10(255.0 ** 2 / jnp.maximum(mse, 1e-10))
    return _per_clip(f, pred_videos, gt_videos)


def _rgb_to_hue(img):
    """(…, 3) 0-255 RGB -> hue angle in radians."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = jnp.maximum(mx - mn, 1e-6)
    h = jnp.where(mx == r, (g - b) / d % 6.0,
                  jnp.where(mx == g, (b - r) / d + 2.0, (r - g) / d + 4.0))
    return h * (jnp.pi / 3.0)


def hue_score_only(pred_videos, gt_videos, **kw):
    """Mean cosine similarity of per-pixel hue angles (the reference's new
    file references an undefined helper; deterministic definition here)."""
    def f(p, g):
        hp = _rgb_to_hue(jnp.asarray(p, jnp.float32))
        hg = _rgb_to_hue(jnp.asarray(g, jnp.float32))
        return jnp.mean(jnp.cos(hp - hg))
    return _per_clip(f, pred_videos, gt_videos)


# --- classifier-based n-way metrics -------------------------------------------

def n_way_top_k_acc(pred, class_ids, n_way, num_trials=40, top_k=1, rng=None):
    """Random-distractor n-way top-k accuracy (reference L57-70): for each
    trial draw n_way-1 distractor classes and test whether the GT class's
    predicted probability ranks in the top-k."""
    pred = np.asarray(pred)
    if isinstance(class_ids, (int, np.integer)):
        class_ids = [int(class_ids)]
    class_ids = [int(c) for c in np.asarray(class_ids).reshape(-1)]
    rng = np.random.default_rng() if rng is None else rng
    pick_range = [i for i in range(len(pred)) if i not in class_ids]
    corrects = 0
    for _ in range(num_trials):
        picked = rng.choice(pick_range, n_way - 1, replace=False)
        for gt in class_ids:
            cand = np.concatenate([pred[gt:gt + 1], pred[picked]])
            if 0 in np.argsort(cand)[-top_k:]:
                corrects += 1
                break
    acc = corrects / num_trials
    return acc, float(np.sqrt(acc * (1 - acc) / num_trials))


def classifier_metrics(pred_videos, gt_videos, kind="image", n_way=50,
                       num_trials=100, top_k=1, cache_dir=".cache",
                       model_path: Optional[str] = None, rng=None,
                       model=None, processor=None):
    """ViT-image / VideoMAE-video n-way classification accuracy
    (reference L72-142).  Requires locally cached HF checkpoints
    ('google/vit-base-patch16-224' / 'MCG-NJU/videomae-base-finetuned-kinetics'
    or ``model_path``), or pass ``model``/``processor`` directly (used by
    tests and custom classifiers).  Evaluation-only host path, torch CPU."""
    import torch

    if kind == "image":
        if model is None:
            from transformers import ViTForImageClassification, ViTImageProcessor

            name = model_path or "google/vit-base-patch16-224"
            processor = ViTImageProcessor.from_pretrained(name, cache_dir=cache_dir)
            model = ViTForImageClassification.from_pretrained(name, cache_dir=cache_dir)
        model = model.eval()
        prep = lambda clip: processor(images=clip.astype(np.uint8), return_tensors="pt")
    elif kind == "video":
        if model is None:
            from transformers import VideoMAEForVideoClassification, VideoMAEImageProcessor

            name = model_path or "MCG-NJU/videomae-base-finetuned-kinetics"
            processor = VideoMAEImageProcessor.from_pretrained(name, cache_dir=cache_dir)
            model = VideoMAEForVideoClassification.from_pretrained(
                name, num_frames=len(gt_videos[0]), cache_dir=cache_dir)
        model = model.eval()
        prep = lambda clip: processor(list(clip), return_tensors="pt")
    else:
        raise ValueError(kind)

    accs, stds = [], []
    with torch.no_grad():
        for pred, gt in zip(pred_videos, gt_videos):
            gt_ids = model(**prep(gt)).logits.argsort(-1).flatten()[-3:].numpy()
            probs = model(**prep(pred)).logits.softmax(-1).flatten().numpy()
            a, s = n_way_top_k_acc(probs, gt_ids, n_way, num_trials, top_k, rng=rng)
            accs.append(a)
            stds.append(s)
    return accs, stds


def clip_score(images1, images2, model_path: Optional[str] = None,
               cache_dir=".cache"):
    """CLIP image-embedding cosine similarity (reference L20-55 /
    new L27-61).  Host-side, needs a locally cached CLIP checkpoint."""
    import torch
    from transformers import CLIPModel, CLIPProcessor

    name = model_path or "openai/clip-vit-base-patch32"
    model = CLIPModel.from_pretrained(name, cache_dir=cache_dir).eval()
    processor = CLIPProcessor.from_pretrained(name, cache_dir=cache_dir)
    with torch.no_grad():
        f1 = model.get_image_features(**processor(images=list(images1), return_tensors="pt"))
        f2 = model.get_image_features(**processor(images=list(images2), return_tensors="pt"))
        return torch.nn.functional.cosine_similarity(f1, f2, dim=-1).numpy()
