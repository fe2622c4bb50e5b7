"""ctypes bindings for the native data-path runtime (csrc/npy_loader.cpp):
multi-threaded mmap'd .npy row gather with fused z-score normalization —
the framework's counterpart of the reference's native loaders (decord +
DataLoader workers).  Falls back to numpy transparently when the shared
library is absent (run scripts/build_native.sh to build)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "_native", "libnpyloader.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        # best-effort build (g++ is in the image); stay silent on failure
        script = os.path.join(os.path.dirname(path), "..", "..", "scripts", "build_native.sh")
        try:
            subprocess.run(["bash", os.path.abspath(script)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.nbl_open.restype = ctypes.c_void_p
    lib.nbl_open.argtypes = [ctypes.c_char_p]
    lib.nbl_rows.restype = ctypes.c_int64
    lib.nbl_rows.argtypes = [ctypes.c_void_p]
    lib.nbl_row_bytes.restype = ctypes.c_int64
    lib.nbl_row_bytes.argtypes = [ctypes.c_void_p]
    lib.nbl_dtype.restype = ctypes.c_int
    lib.nbl_dtype.argtypes = [ctypes.c_void_p]
    lib.nbl_gather.restype = ctypes.c_int
    lib.nbl_gather.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                               ctypes.c_void_p]
    lib.nbl_gather_norm_f32.restype = ctypes.c_int
    lib.nbl_gather_norm_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
    lib.nbl_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


class NpyBatchLoader:
    """Row-gather view over one .npy file (leading axis = samples)."""

    def __init__(self, path: str):
        self.path = path
        self._lib = _load_lib()
        self._h = None
        if self._lib is not None:
            self._h = self._lib.nbl_open(path.encode())
            if not self._h:
                self._lib = None  # unsupported layout -> numpy fallback
        if self._lib is None:
            self._arr = np.load(path, mmap_mode="r")
        else:
            self._rows = self._lib.nbl_rows(self._h)
            self._row_bytes = self._lib.nbl_row_bytes(self._h)
            self._elem = self._lib.nbl_dtype(self._h)

    @property
    def n_rows(self) -> int:
        return int(self._rows if self._lib else self._arr.shape[0])

    @property
    def row_dim(self) -> int:
        if self._lib:
            return int(self._row_bytes // self._elem)
        return int(np.prod(self._arr.shape[1:]))

    def gather(self, idx: np.ndarray) -> np.ndarray:
        """Raw rows (n, row_dim) in the file dtype."""
        idx = np.ascontiguousarray(idx, np.int64)
        if self._lib is None:
            return np.asarray(self._arr[idx]).reshape(len(idx), -1)
        dt = np.float32 if self._elem == 4 else np.float64
        out = np.empty((len(idx), self.row_dim), dt)
        rc = self._lib.nbl_gather(self._h, idx.ctypes.data, len(idx),
                                  out.ctypes.data)
        if rc:
            raise IndexError("row index out of range")
        return out

    def gather_normalized(self, idx: np.ndarray, mean: np.ndarray,
                          std: np.ndarray) -> np.ndarray:
        """(x[idx] - mean) / std as float32, computed in native threads."""
        idx = np.ascontiguousarray(idx, np.int64)
        mean = np.ascontiguousarray(np.broadcast_to(mean, (self.row_dim,)), np.float32)
        std = np.ascontiguousarray(np.broadcast_to(std, (self.row_dim,)), np.float32)
        if self._lib is None:
            x = self.gather(idx).astype(np.float32)
            return (x - mean) / std
        out = np.empty((len(idx), self.row_dim), np.float32)
        rc = self._lib.nbl_gather_norm_f32(
            self._h, idx.ctypes.data, len(idx), mean.ctypes.data,
            std.ctypes.data, self.row_dim, out.ctypes.data)
        if rc == 2:
            raise ValueError("dim mismatch")
        if rc:
            raise IndexError("row index out of range")
        return out

    def close(self):
        if self._lib is not None and self._h:
            self._lib.nbl_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# --- native video clip decoder ----------------------------------------------

_VLIB_PATH = os.path.join(os.path.dirname(__file__), "..", "_native",
                          "libvideodecoder.so")
_vlib = None


def _load_video_lib():
    global _vlib
    if _vlib is not None:
        return _vlib
    path = os.path.abspath(_VLIB_PATH)
    if not os.path.exists(path):
        script = os.path.join(os.path.dirname(path), "..", "..", "scripts",
                              "build_native.sh")
        try:
            subprocess.run(["bash", os.path.abspath(script)], check=True,
                           capture_output=True, timeout=300)
        except Exception:
            return None
        if not os.path.exists(path):
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.e2v_decode_clips.restype = ctypes.c_int
    lib.e2v_decode_clips.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    _vlib = lib
    return lib


def video_decoder_available() -> bool:
    return _load_video_lib() is not None


def decode_clips(paths, width: int, height: int, n_frames: int,
                 frame_stride: int = 1, start_idx: int = 0,
                 n_threads: int = 0) -> np.ndarray:
    """Decode a list of videos into one (N, n_frames, H, W, 3) float32 array
    in [-1, 1] — the reference's decord dataset semantics (dataset.py:41-88)
    — using the C++ thread-pool decoder (csrc/video_decoder.cpp); falls back
    to the per-clip cv2 python loop when the native library is unavailable.

    Short clips are zero-padded on the frame axis (and reported via the
    returned array only; callers with ragged clips should keep lists)."""
    lib = _load_video_lib()
    n = len(paths)
    out = np.empty((n, n_frames, height, width, 3), np.float32)
    if lib is not None and n > 0:
        cpaths = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
        written = np.zeros((n,), np.int32)
        ok = lib.e2v_decode_clips(cpaths, n, width, height, n_frames,
                                  frame_stride, start_idx, out.ctypes.data,
                                  written.ctypes.data, n_threads)
        if ok == n:
            return out
        # fall through to the python path for robustness if any clip failed
    from .video import read_video_frames

    for i, p in enumerate(paths):
        frames = read_video_frames(p, resize_hw=(height, width))
        idx = np.arange(start_idx, len(frames), frame_stride)[:n_frames]
        clip = frames[idx].astype(np.float32) / 127.5 - 1.0
        out[i] = 0.0
        out[i, :len(clip)] = clip
    return out


# --- native GIF encoder ------------------------------------------------------

_GLIB_PATH = os.path.join(os.path.dirname(__file__), "..", "_native",
                          "libgifencoder.so")
_glib = None


def _load_gif_lib():
    global _glib
    if _glib is not None:
        return _glib
    path = os.path.abspath(_GLIB_PATH)
    if not os.path.exists(path):
        script = os.path.join(os.path.dirname(path), "..", "..", "scripts",
                              "build_native.sh")
        try:
            subprocess.run(["bash", os.path.abspath(script)], check=True,
                           capture_output=True, timeout=300)
        except Exception:
            return None
        if not os.path.exists(path):
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.gif_encode_rgb.restype = ctypes.c_int
    lib.gif_encode_rgb.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_char_p]
    _glib = lib
    return lib


def gif_encoder_available() -> bool:
    return _load_gif_lib() is not None


def write_gif_native(path: str, frames: np.ndarray, duration_ms: float) -> None:
    """Write (F, H, W, 3) uint8 frames as a looping GIF via the C++ encoder
    (csrc/gif_encoder.cpp): shared median-cut palette, 5-bit inverse-lattice
    pixel mapping, threaded per-frame LZW.  Raises RuntimeError on failure
    (callers fall back to the Pillow path)."""
    lib = _load_gif_lib()
    if lib is None:
        raise RuntimeError("native gif encoder unavailable")
    frames = np.ascontiguousarray(frames, np.uint8)
    f, h, w, c = frames.shape
    if c != 3:
        raise ValueError(f"expected RGB frames, got {frames.shape}")
    rc = lib.gif_encode_rgb(frames.ctypes.data_as(ctypes.c_void_p),
                            f, h, w, max(int(round(duration_ms / 10.0)), 1),
                            path.encode())
    if rc != 0:
        raise RuntimeError(f"gif_encode_rgb failed with code {rc}")
