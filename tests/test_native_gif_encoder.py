"""Native C++ GIF encoder (csrc/gif_encoder.cpp via data.native).

The serving path's GIF encode; validated by round-tripping through imageio
(an independent GIF decoder): frame count/geometry survive, quantization
error is bounded and comparable to the Pillow shared-palette path, and the
save_videos_grid "native" encoder falls back cleanly.
"""

import os

import numpy as np
import pytest

from eeg2video_tpu.data import native


pytestmark = pytest.mark.skipif(not native.gif_encoder_available(),
                                reason="native gif encoder unavailable")


def _clip(rng, f=6, h=48, w=64):
    x = np.linspace(0, 1, w)[None, :] * np.linspace(0, 1, h)[:, None]
    frames = []
    for i in range(f):
        fr = np.stack([np.roll(x, 5 * i, axis=1), x ** 2, 1 - x], axis=-1)
        fr = np.clip(fr + rng.normal(0, 0.02, fr.shape), 0, 1)
        frames.append((fr * 255).astype(np.uint8))
    return np.stack(frames)


def test_roundtrip_geometry_and_error(tmp_path, rng):
    import imageio

    frames = _clip(rng)
    path = str(tmp_path / "clip.gif")
    native.write_gif_native(path, frames, 333.0)
    back = np.stack([f[..., :3] for f in imageio.mimread(path)])
    assert back.shape == frames.shape
    err = np.abs(back.astype(np.float64) - frames.astype(np.float64)).mean()
    assert err < 8.0, err  # shared 256-color palette on noisy gradients


def test_error_comparable_to_pillow_path(tmp_path, rng):
    import imageio

    from eeg2video_tpu.data.video import _write_gif_fast

    frames = _clip(rng)
    native.write_gif_native(str(tmp_path / "n.gif"), frames, 333.0)
    _write_gif_fast(str(tmp_path / "p.gif"), list(frames), 333.0)
    back_n = np.stack([f[..., :3] for f in imageio.mimread(str(tmp_path / "n.gif"))])
    back_p = np.stack([f[..., :3] for f in imageio.mimread(str(tmp_path / "p.gif"))])
    err_n = np.abs(back_n.astype(float) - frames).mean()
    err_p = np.abs(back_p.astype(float) - frames).mean()
    assert err_n < err_p * 1.5, (err_n, err_p)


def test_flat_color_and_single_frame(tmp_path):
    import imageio

    frames = np.full((1, 16, 16, 3), 120, np.uint8)
    path = str(tmp_path / "flat.gif")
    native.write_gif_native(path, frames, 100.0)
    back = imageio.mimread(path)[0][..., :3]
    assert np.all(np.abs(back.astype(int) - 120) <= 8)


def test_save_videos_grid_native_encoder(tmp_path, rng):
    import imageio

    from eeg2video_tpu.data.video import save_videos_grid

    vids = rng.random((2, 3, 24, 32, 3)).astype(np.float32)
    path = str(tmp_path / "grid.gif")
    save_videos_grid(vids, path, encoder="native")
    back = imageio.mimread(path)
    assert len(back) == 3
    assert back[0].shape[:2] == (24, 64)  # 1x2 grid


def test_lossless_on_lattice_colors(tmp_path, rng):
    """Frames whose colors sit on the 5-bit inverse-lattice cell centers
    (r*8+4) with <=256 unique colors must round-trip EXACTLY: median-cut
    boxes converge to the exact colors, the lattice maps each to itself,
    so any pixel difference is an LZW/bitstream bug.  Random content at
    64x96 overflows the 4096-code dictionary, covering the clear-code
    reset and every code-width increment."""
    import imageio

    vals = np.array([4, 60, 124, 188, 252], np.uint8)  # lattice centers
    frames = vals[rng.integers(0, 5, (3, 64, 96, 3))]  # <=125 unique colors
    path = str(tmp_path / "exact.gif")
    native.write_gif_native(path, frames, 100.0)
    back = np.stack([f[..., :3] for f in imageio.mimread(path)])
    np.testing.assert_array_equal(back, frames)


def test_dict_reset_on_long_noise(tmp_path, rng):
    """Noise frames overflow the 4096-code LZW dictionary many times; the
    clear-code reset path must still decode exactly."""
    import imageio

    frames = (rng.random((2, 64, 96, 3)) * 255).astype(np.uint8)
    path = str(tmp_path / "noise.gif")
    native.write_gif_native(path, frames, 50.0)
    back = np.stack([f[..., :3] for f in imageio.mimread(path)])
    assert back.shape == frames.shape
    # palette-mapped noise: large per-pixel error is expected, but the
    # decode must be deterministic & finite and mean error bounded by the
    # 256-color budget
    assert np.abs(back.astype(float) - frames).mean() < 40
