"""Native npy batch loader: parity with numpy indexing + normalization."""

import numpy as np
import pytest

from eeg2video_tpu.data.native import NpyBatchLoader, native_available


@pytest.fixture(scope="module")
def npy_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    p = tmp_path_factory.mktemp("native") / "data.npy"
    arr = rng.standard_normal((500, 62, 5)).astype(np.float32)
    np.save(p, arr)
    return str(p), arr


def test_gather_matches_numpy(npy_file, rng):
    path, arr = npy_file
    ld = NpyBatchLoader(path)
    assert ld.n_rows == 500 and ld.row_dim == 310
    idx = rng.integers(0, 500, 64)
    out = ld.gather(idx)
    np.testing.assert_array_equal(out, arr[idx].reshape(64, -1))
    ld.close()


def test_gather_normalized(npy_file, rng):
    path, arr = npy_file
    ld = NpyBatchLoader(path)
    flat = arr.reshape(500, -1)
    mean, std = flat.mean(0), flat.std(0)
    idx = rng.integers(0, 500, 128)
    out = ld.gather_normalized(idx, mean, std)
    ref = (flat[idx] - mean) / std
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    with pytest.raises(IndexError):
        ld.gather(np.array([10_000]))
    ld.close()


def test_float64_file(tmp_path, rng):
    arr = rng.standard_normal((20, 7)).astype(np.float64)
    p = tmp_path / "d64.npy"
    np.save(p, arr)
    ld = NpyBatchLoader(str(p))
    out = ld.gather_normalized(np.arange(20), np.zeros(7), np.ones(7))
    np.testing.assert_allclose(out, arr.astype(np.float32), rtol=1e-6)
    ld.close()


def test_native_actually_loaded():
    # g++ is in this image: the native path must be active, not the fallback
    assert native_available()
