"""DSP parity tests: segmentation geometry and DE/PSD golden values."""

import os

import numpy as np
import pytest

from eeg2video_tpu.data import meta
from eeg2video_tpu.dsp import (
    de_psd,
    de_psd_numpy,
    extract_2s_segment,
    segment_subject,
    sliding_windows,
)


def test_gt_label_is_permutation_table():
    assert meta.GT_LABEL.shape == (7, 40)
    for b in range(7):
        assert sorted(meta.GT_LABEL[b]) == list(range(1, 41))
        idx = meta.block_reorder_indices(b)
        # gathering the row with its reorder indices yields sorted labels
        assert list(meta.GT_LABEL[b][idx]) == list(range(1, 41))


def test_segment_subject_matches_scalar_path(rng):
    T = 40 * (3 * 200 + 5 * 2 * 200)
    data = rng.standard_normal((7, 62, T)).astype(np.float32)
    segs = np.asarray(segment_subject(data))
    assert segs.shape == meta.SHAPES["segmented_raw_2s"]
    for blk, cpt, rep in [(0, 0, 0), (3, 17, 2), (6, 39, 4)]:
        ref = extract_2s_segment(data, blk, cpt, rep)
        np.testing.assert_array_equal(segs[blk, cpt, rep], ref)


def test_sliding_windows_shape_and_golden(fixtures_dir):
    f = os.path.join(fixtures_dir, "sliding_window_golden.npz")
    if not os.path.exists(f):
        pytest.skip("golden fixture missing; run scripts/gen_golden_fixtures.py")
    g = np.load(f)
    # pure index op — exact once both sides are in the same dtype
    w = np.asarray(sliding_windows(g["x"].astype(np.float32), 0.5, 0.25))
    np.testing.assert_array_equal(w, g["w"].astype(np.float32))


def test_sliding_windows_canonical_shape(rng):
    x = rng.standard_normal((2, 4, 5, 62, 400)).astype(np.float32)
    w = sliding_windows(x)
    assert w.shape == (2, 4, 5, 7, 62, 100)


@pytest.mark.parametrize("case,win", [("w2s", 2.0), ("w500ms", 0.5), ("w1s", 1.0)])
def test_de_psd_golden_vs_reference(fixtures_dir, case, win):
    """Parity gate: the float64 path (used by the extraction CLIs) must match
    the reference scipy implementation to <=1e-4 rel err (it is ~1e-15);
    the float32 on-device kernel is loose-tolerance (DFT cancellation)."""
    f = os.path.join(fixtures_dir, "de_psd_golden.npz")
    if not os.path.exists(f):
        pytest.skip("golden fixture missing; run scripts/gen_golden_fixtures.py")
    g = np.load(f)
    x = g[f"{case}_x"]

    # strict gate — float64 oracle (the default CLI extraction path)
    de64, psd64 = de_psd_numpy(x, 200, win)
    np.testing.assert_allclose(psd64, g[f"{case}_psd"], rtol=1e-10)
    np.testing.assert_allclose(de64, g[f"{case}_de"], rtol=1e-10)

    # float32 TPU kernel — same math, f32 accumulation
    de, psd = de_psd(x, fs=200, win_sec=win)
    np.testing.assert_allclose(np.asarray(psd), g[f"{case}_psd"], rtol=2e-2)
    np.testing.assert_allclose(np.asarray(de), g[f"{case}_de"], rtol=2e-2, atol=2e-3)


def test_de_psd_batched_matches_per_channel(rng):
    x = rng.standard_normal((3, 4, 62, 400)).astype(np.float32)
    de, psd = de_psd(x, fs=200, win_sec=2.0)
    assert de.shape == (3, 4, 62, 5)
    de_ref, psd_ref = de_psd_numpy(x[1, 2].astype(np.float64), 200, 2.0)
    np.testing.assert_allclose(np.asarray(de)[1, 2], de_ref, rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(psd)[1, 2], psd_ref, rtol=2e-2)
