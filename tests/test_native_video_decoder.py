"""Native C++ thread-pool video decoder (csrc/video_decoder.cpp) vs the cv2
python path — the framework's counterpart of the reference's decord loader
(dataset.py:41-88).  Requires cv2 for fixture generation; the native library
builds on demand (opencv4 headers are in the image)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from eeg2video_tpu.data import native
from eeg2video_tpu.data.video import VideoClipDataset, read_video_frames


def _write_clip(path, n_frames=20, h=48, w=64, seed=0):
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 24,
                         (w, h))
    if not wr.isOpened():
        pytest.skip("cv2 mp4 encoder unavailable")
    rng = np.random.default_rng(seed)
    for _ in range(n_frames):
        wr.write(rng.integers(0, 255, (h, w, 3), np.uint8))
    wr.release()


@pytest.fixture(scope="module")
def clips(tmp_path_factory):
    d = tmp_path_factory.mktemp("clips")
    paths = []
    for i in range(3):
        p = d / f"{i}.mp4"
        _write_clip(p, n_frames=20 if i < 2 else 6, seed=i)
        paths.append(str(p))
    return paths


def test_native_decoder_builds():
    assert native.video_decoder_available(), \
        "libvideodecoder.so failed to build (opencv4 expected in the image)"


def test_native_matches_python(clips):
    if not native.video_decoder_available():
        pytest.skip("native decoder unavailable")
    n_frames, stride, start = 4, 3, 1
    h, w = 32, 40
    got = native.decode_clips(clips, w, h, n_frames, stride, start)
    assert got.shape == (3, n_frames, h, w, 3)
    for i, p in enumerate(clips):
        frames = read_video_frames(p, resize_hw=(h, w))
        idx = np.arange(start, len(frames), stride)[:n_frames]
        want = frames[idx].astype(np.float32) / 127.5 - 1.0
        np.testing.assert_allclose(got[i, :len(want)], want, atol=2e-2)
        # short clip: zero-padded tail
        if len(want) < n_frames:
            assert np.all(got[i, len(want):] == 0.0)


def test_dataset_load_all_matches_items(clips):
    ds = VideoClipDataset(clips[:2], np.asarray([5, 7]), width=40, height=32,
                          n_sample_frames=3, sample_frame_rate=2)
    pixels, ids = ds.load_all()
    assert pixels.shape == (2, 3, 32, 40, 3)
    assert ids.tolist() == [5, 7]
    for i in range(2):
        np.testing.assert_allclose(pixels[i], ds[i]["pixel_values"], atol=2e-2)
