"""Optical-flow motion scoring (data/optical_flow.py + its CLI).

The DANA score table has no producer in the reference (it loads
``All_video_optical_flow_score.npy`` as shipped dataset meta,
add_noise.py:103); these tests pin our Horn-Schunck estimator's accuracy
on known synthetic motion and the CLI's table layout.
"""

import os

import numpy as np
import pytest

from eeg2video_tpu.data.optical_flow import (clip_motion_scores, horn_schunck,
                                             score_clips)


def _smooth_pattern(rng, h, w, blur=6):
    """Low-pass random image in [0,1] — textured enough for flow, smooth
    enough that bilinear shifts stay well-described by the linearization."""
    x = rng.standard_normal((h + 4 * blur, w + 4 * blur))
    k = np.ones(blur) / blur
    for axis in (0, 1):
        x = np.apply_along_axis(np.convolve, axis, x, k, mode="same")
    x = x[2 * blur: 2 * blur + h, 2 * blur: 2 * blur + w]
    return ((x - x.min()) / (np.ptp(x) + 1e-9)).astype(np.float32)


def _shift(img, dx, dy):
    """Integer-shift with edge replication (backward-warp ground truth
    (u, v) = (dx, dy))."""
    h, w = img.shape
    pad = np.pad(img, max(abs(dx), abs(dy), 1), mode="edge")
    o = max(abs(dx), abs(dy), 1)
    return pad[o - dy: o - dy + h, o - dx: o - dx + w]


def test_horn_schunck_recovers_translation(rng):
    img = _smooth_pattern(rng, 96, 128)
    dx, dy = 2, 1
    i2 = _shift(img, dx, dy)
    u, v = horn_schunck(img[None], i2[None], n_iter=200, levels=3)
    # interior mean (borders are unconstrained under edge replication)
    ui = np.asarray(u)[0, 16:-16, 16:-16].mean()
    vi = np.asarray(v)[0, 16:-16, 16:-16].mean()
    assert abs(ui - dx) < 0.6, ui
    assert abs(vi - dy) < 0.6, vi


def test_static_clip_scores_near_zero(rng):
    img = _smooth_pattern(rng, 64, 96)
    frames = np.repeat((img[None, None, ..., None] * 255).astype(np.uint8),
                       3, axis=-1)
    frames = np.repeat(frames, 6, axis=1)  # (1, 6, H, W, 3), all identical
    score = np.asarray(clip_motion_scores(frames))[0]
    assert score < 0.05, score


def test_scores_monotonic_in_speed(rng):
    img = _smooth_pattern(rng, 64, 96)

    def clip(step):
        fr = [img]
        for _ in range(5):
            fr.append(_shift(fr[-1], step, 0))
        f = np.stack(fr)[..., None] * 255
        return np.repeat(f.astype(np.uint8), 3, axis=-1)

    frames = np.stack([clip(0), clip(1), clip(3)])
    s = np.asarray(clip_motion_scores(frames, n_iter=150))
    assert s[0] < s[1] < s[2], s
    assert s[1] > 0.4, s  # ~1 px/frame motion scores near 1


def test_score_clips_chunking_matches_single_batch(rng):
    frames = (rng.random((5, 3, 32, 48, 3)) * 255).astype(np.uint8)
    whole = np.asarray(clip_motion_scores(frames, n_iter=20, levels=2))
    chunked = score_clips(frames, n_iter=20, levels=2, chunk=2)
    np.testing.assert_allclose(chunked, whole, rtol=1e-5, atol=1e-6)


def test_compute_optical_flow_cli(tmp_path, rng, monkeypatch):
    import imageio

    from eeg2video_tpu.cli import compute_optical_flow
    from eeg2video_tpu.data import meta

    # tiny geometry: 2 blocks x 4 clips of 3 frames
    monkeypatch.setattr(meta, "N_CONCEPTS", 2)
    monkeypatch.setattr(meta, "N_REPS", 2)
    img = (_smooth_pattern(rng, 24, 32) * 255).astype(np.uint8)
    for b in range(2):
        d = tmp_path / f"Block{b}"
        d.mkdir()
        for i in range(4):
            step = 2 if (b == 1 and i == 0) else 0  # one fast clip
            fr, cur = [], img
            for _ in range(3):
                fr.append(np.repeat(cur[..., None], 3, axis=-1))
                cur = _shift(cur, step, 0)
            imageio.mimsave(str(d / f"{i}.gif"), fr, duration=0.333)

    out = tmp_path / "scores.npy"
    compute_optical_flow.main(["--gif_dir", str(tmp_path), "--out", str(out),
                               "--blocks", "2", "--chunk", "4", "--iters", "60"])
    table = np.load(out)
    assert table.shape == (2, 4)
    assert table[1, 0] == table.max()  # the fast clip dominates
    assert table[1, 0] > 5 * max(table[0].max(), table[1, 1:].max() + 1e-6)
