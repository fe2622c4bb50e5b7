"""TPU-native per-clip motion scoring (coarse-to-fine Horn-Schunck flow).

The reference's DANA stage consumes a precomputed per-clip motion-score
table ``All_video_optical_flow_score.npy`` of shape (7, 200) and thresholds
it at 1.799 to pick the dynamic-noise beta (reference
EEG2Video_New/DANA/add_noise.py:103,107,120) — but no producer for that
file exists anywhere in the reference tree; it ships as external dataset
meta-info.  This module closes that loop with a batched optical-flow
estimator written entirely in jnp (3x3 convolutions + ``lax.scan`` Jacobi
iterations + bilinear warps, vmappable over clips — all device work, no
host loop per pixel), and a scorer reducing flow magnitude to one scalar
per clip.

Estimator: classic Horn-Schunck (quadratic data + smoothness terms) run
coarse-to-fine over an image pyramid with inter-level warping, which keeps
the linearized brightness-constancy assumption valid for the large
displacements the 3-fps GIF clips exhibit.  Scores are mean flow magnitude
in full-resolution pixels per frame step.  Absolute scale therefore differs
from the shipped table (whose estimator is unpublished); the CLI exposes
``--threshold``-free raw scores and ``cli.add_noise --threshold`` re-anchors
the fast/slow split if needed.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# Horn-Schunck neighbourhood average (the standard 8-neighbour stencil).
_AVG = np.array([[1 / 12, 1 / 6, 1 / 12],
                 [1 / 6, 0.0, 1 / 6],
                 [1 / 12, 1 / 6, 1 / 12]], np.float32)
# 2x2 derivative stencils (Horn & Schunck 1981 eqs. 5-7): the spatial
# derivatives average over both frames, the temporal one over the 2x2 patch.
_KX = 0.25 * np.array([[-1, 1], [-1, 1]], np.float32)
_KY = 0.25 * np.array([[-1, -1], [1, 1]], np.float32)
_KT = 0.25 * np.array([[1, 1], [1, 1]], np.float32)


def _conv(x, k):
    """(N, H, W) * (kh, kw) -> (N, H, W), SAME padding."""
    return lax.conv_general_dilated(
        x[:, None], jnp.asarray(k)[None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]


def _warp(img, u, v):
    """Bilinear backward warp: sample ``img`` at (x + u, y + v).

    img, u, v: (N, H, W).  Out-of-frame samples clamp to the border (the
    conventional choice; keeps the data term finite everywhere).
    """
    n, h, w = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=img.dtype),
                          jnp.arange(w, dtype=img.dtype), indexing="ij")
    xs = jnp.clip(xx[None] + u, 0.0, w - 1.0)
    ys = jnp.clip(yy[None] + v, 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 2)
    y0 = jnp.clip(jnp.floor(ys), 0, h - 2)
    fx = xs - x0
    fy = ys - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    flat = img.reshape(n, h * w)
    base = y0 * w + x0

    def take(offset):
        return jnp.take_along_axis(flat, (base + offset).reshape(n, h * w),
                                   axis=1).reshape(n, h, w)

    i00, i01 = take(0), take(1)
    i10, i11 = take(w), take(w + 1)
    top = i00 * (1 - fx) + i01 * fx
    bot = i10 * (1 - fx) + i11 * fx
    return top * (1 - fy) + bot * fy


def _hs_level(i1, i2, u, v, alpha, n_iter):
    """Horn-Schunck Jacobi iterations at one pyramid level.

    i2 is pre-warped by the incoming (u, v), so the solved increment (du, dv)
    is added to the initial flow on return.
    """
    i2w = _warp(i2, u, v)
    ix = _conv(i1 + i2w, _KX)
    iy = _conv(i1 + i2w, _KY)
    it = _conv(i2w - i1, _KT)
    denom = alpha * alpha + ix * ix + iy * iy

    def body(carry, _):
        du, dv = carry
        dub = _conv(du, _AVG)
        dvb = _conv(dv, _AVG)
        t = (ix * dub + iy * dvb + it) / denom
        return (dub - ix * t, dvb - iy * t), None

    (du, dv), _ = lax.scan(body, (jnp.zeros_like(u), jnp.zeros_like(v)),
                           None, length=n_iter)
    return u + du, v + dv


def _downsample(x):
    """2x average-pool (N, H, W) -> (N, H//2, W//2)."""
    n, h, w = x.shape
    return x[:, : h - h % 2, : w - w % 2].reshape(
        n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))


@partial(jax.jit, static_argnames=("n_iter", "levels"))
def horn_schunck(i1, i2, alpha=1.0, n_iter=100, levels=3):
    """Batched coarse-to-fine Horn-Schunck flow.

    i1, i2: (N, H, W) float32 grayscale in [0, 1].
    Returns (u, v), each (N, H, W), in pixels of the input resolution
    (u = x/column displacement, v = y/row displacement).
    """
    i1 = i1.astype(jnp.float32)
    i2 = i2.astype(jnp.float32)
    pyr = [(i1, i2)]
    for _ in range(levels - 1):
        pyr.append((_downsample(pyr[-1][0]), _downsample(pyr[-1][1])))

    a, b = pyr[-1]
    u = jnp.zeros_like(a)
    v = jnp.zeros_like(a)
    for lvl in range(levels - 1, -1, -1):
        a, b = pyr[lvl]
        if u.shape != a.shape:  # upsample flow to this level, scale values 2x
            u = 2.0 * jax.image.resize(u, a.shape, "bilinear")
            v = 2.0 * jax.image.resize(v, a.shape, "bilinear")
        u, v = _hs_level(a, b, u, v, alpha, n_iter)
    return u, v


def _to_gray(frames):
    """(..., H, W, 3) uint8/float -> (..., H, W) float32 luma in [0, 1]."""
    f = jnp.asarray(frames, jnp.float32)
    if frames.dtype == np.uint8 or (hasattr(frames, "dtype") and
                                    frames.dtype == jnp.uint8):
        f = f / 255.0
    return (0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2])


@partial(jax.jit, static_argnames=("alpha", "n_iter", "levels"))
def clip_motion_scores(frames, alpha=1.0, n_iter=100, levels=3):
    """(B, F, H, W, 3) frames -> (B,) mean flow magnitude per frame pair.

    The reduction runs every consecutive pair of every clip as one flat
    flow batch (B*(F-1) pairs), then averages |flow| over pixels and pairs.
    """
    gray = _to_gray(frames)  # (B, F, H, W)
    b, f, h, w = gray.shape
    i1 = gray[:, :-1].reshape(b * (f - 1), h, w)
    i2 = gray[:, 1:].reshape(b * (f - 1), h, w)
    u, v = horn_schunck(i1, i2, alpha=alpha, n_iter=n_iter, levels=levels)
    mag = jnp.sqrt(u * u + v * v)
    return mag.reshape(b, f - 1, h, w).mean(axis=(1, 2, 3))


def score_clips(frames, alpha=1.0, n_iter=100, levels=3, chunk=25):
    """Host driver: chunk clips to bound device memory, return np.ndarray.

    frames: (B, F, H, W, 3) uint8.  A (200, 6, 288, 512) f32 pair batch plus
    iteration temporaries would not fit comfortably; ``chunk`` clips go per
    dispatch (one compiled program reused across chunks and blocks).
    """
    out = []
    n = frames.shape[0]
    for s in range(0, n, chunk):
        part = frames[s: s + chunk]
        if part.shape[0] != chunk:  # pad the tail to reuse the compiled shape
            pad = chunk - part.shape[0]
            part = np.concatenate([part, np.zeros((pad,) + part.shape[1:],
                                                  part.dtype)], axis=0)
            out.append(np.asarray(clip_motion_scores(
                part, alpha=alpha, n_iter=n_iter, levels=levels))[: n - s])
        else:
            out.append(np.asarray(clip_motion_scores(
                part, alpha=alpha, n_iter=n_iter, levels=levels)))
    return np.concatenate(out)
