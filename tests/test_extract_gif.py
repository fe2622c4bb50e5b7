"""Video -> GIF extraction (data.video), reference EEG2Video/extract_gif.py.

Covers the boolean frame schedule (3 s hint discarded, 5x2 s clips, L42-45),
the every-8th-of-48 -> 6 frame selection (L70-71), and the per-clip GIF
writing, using a synthesized block video where each frame encodes its global
index in pixel values.
"""

import os

import numpy as np
import pytest

from eeg2video_tpu.data import meta, video


def test_clip_frame_schedule_shape_and_labels():
    sched = video.clip_frame_schedule()
    assert len(sched) == meta.N_CONCEPTS * (meta.BASELINE_SEC + meta.N_REPS * meta.CLIP_SEC) * meta.VIDEO_FPS
    per = (meta.BASELINE_SEC + meta.N_REPS * meta.CLIP_SEC) * meta.VIDEO_FPS
    first = sched[:per]
    # 3 s hint zeroed, then reps 1..5 each 2 s at 24 fps
    assert (first[: meta.BASELINE_SEC * meta.VIDEO_FPS] == 0).all()
    for rep in range(1, meta.N_REPS + 1):
        s = (meta.BASELINE_SEC + (rep - 1) * meta.CLIP_SEC) * meta.VIDEO_FPS
        assert (first[s: s + meta.CLIP_SEC * meta.VIDEO_FPS] == rep).all()
    # schedule tiles identically across concepts
    assert (sched[per: 2 * per] == first).all()


def _write_test_video(path, n_frames, w, h):
    import cv2

    for codec, ext in (("mp4v", path), ("MJPG", path.replace(".mp4", ".avi"))):
        vw = cv2.VideoWriter(ext, cv2.VideoWriter_fourcc(*codec),
                             meta.VIDEO_FPS, (w, h))
        if not vw.isOpened():
            continue
        for i in range(n_frames):
            # encode the global frame index in a flat color (lossy-codec safe:
            # indices spaced by visible steps in the red channel)
            frame = np.full((h, w, 3), 0, np.uint8)
            frame[..., 2] = (i * 5) % 250  # BGR: red channel
            vw.write(frame)
        vw.release()
        return ext
    return None


def test_extract_gifs_from_block(tmp_path):
    cv2 = pytest.importorskip("cv2")
    # frames for ONE concept only (3 s hint + 5 clips x 2 s) — the extractor
    # stops at end-of-video and flushes the last clip
    per_concept = (meta.BASELINE_SEC + meta.N_REPS * meta.CLIP_SEC) * meta.VIDEO_FPS
    vid = _write_test_video(str(tmp_path / "block0.mp4"), per_concept, 64, 36)
    if vid is None:
        pytest.skip("no usable cv2 video codec in this build")

    out = str(tmp_path / "gifs")
    written = video.extract_gifs_from_block(vid, out, height=18, width=32)
    assert written == [0, 1, 2, 3, 4]

    hint = meta.BASELINE_SEC * meta.VIDEO_FPS
    clip_len = meta.CLIP_SEC * meta.VIDEO_FPS
    for rep in range(meta.N_REPS):
        g = video.load_gif(os.path.join(out, f"{rep}.gif"))
        assert g.shape == (meta.GIF_FRAMES, 18, 32, 3)
        # every-8th selection: GIF frame k holds source frame hint + rep*48 + 8k
        for k in range(meta.GIF_FRAMES):
            src = hint + rep * clip_len + 8 * k
            expect = (src * 5) % 250
            got = float(np.median(g[k, :, :, 0]))  # RGB: red channel
            assert abs(got - expect) < 20, (rep, k, got, expect)


def test_fast_gif_encoder_roundtrip(tmp_path):
    """Shared-palette encoder: same frame count/shape, pixels within
    palette-quantization distance of the source on smooth data."""
    t = np.linspace(0, 1, 4)[:, None, None, None]
    yy, xx = np.mgrid[0:36, 0:64]
    base = np.stack([np.sin(xx / 9), np.cos(yy / 7), xx * 0.0 + 0.5], -1) * 0.5 + 0.5
    v = np.clip(base[None] * (0.5 + 0.5 * t), 0, 1).astype(np.float32)[None, :, :, :, :]
    v = v[0][None] if v.ndim == 6 else v  # (1, 4, 36, 64, 3)
    path = str(tmp_path / "fast.gif")
    video.save_videos_grid(v, path, encoder="fast")
    g = video.load_gif(path)
    assert g.shape == (4, 36, 64, 3)
    src = (v[0] * 255).astype(np.int32)
    assert np.abs(g.astype(np.int32) - src).mean() < 16


def test_async_video_writer(tmp_path):
    rng = np.random.default_rng(0)
    v = rng.random((1, 3, 18, 32, 3)).astype(np.float32)
    w = video.AsyncVideoWriter(encoder="fast")
    paths = [str(tmp_path / f"{i}.gif") for i in range(3)]
    for p in paths:
        w.submit(v, p)
    w.close()
    for p in paths:
        assert video.load_gif(p).shape == (3, 18, 32, 3)


def test_async_video_writer_propagates_errors(tmp_path):
    import pytest

    v = np.zeros((1, 2, 8, 8, 3), np.float32)
    w = video.AsyncVideoWriter()
    w.submit(np.zeros((2, 8, 8, 3), np.float32),  # wrong rank
             str(tmp_path / "bad.gif"))
    w.submit(v, str(tmp_path / "ok.gif"))
    with pytest.raises(ValueError):
        w.close()
