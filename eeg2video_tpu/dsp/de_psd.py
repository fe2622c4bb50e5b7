"""Differential-entropy / power-spectral-density band features, TPU-first.

The reference computes DE/PSD with a per-channel Python loop over 86,800
scipy FFTs plus a scalar band-accumulation loop (reference DE_PSD.py:55-68).
Here the whole computation is two matmuls:

    features = |(x * hann)[..., :200] @ DFT_basis|^2 @ band_matrix

which XLA maps straight onto the MXU and fuses with the surrounding
elementwise ops.  Behavioral quirks of the reference are reproduced exactly
(they are output-affecting and gate the <=1e-4 parity target, SURVEY.md 2.1):

1. the nonstandard Hann window ``0.5 - 0.5*cos(2*pi*n/(H+1))`` for n=1..H
   (DE_PSD.py:51) — not scipy/numpy ``hanning``;
2. ``fft(x, n=200)`` semantics: the windowed signal is *truncated* to its
   first 200 samples when longer (2 s windows, H=400) and zero-padded when
   shorter (0.5 s windows, H=100) (DE_PSD.py:58);
3. per-band energy averages bins ``[int(fStart/fs*200) - 1, int(fEnd/fs*200))``
   — an off-by-one window whose first bin overlaps the previous band — and
   normalises by ``fEnd - fStart + 1`` (DE_PSD.py:63-66);
4. ``psd = E`` and ``de = log2(100 * E)`` (DE_PSD.py:67-68).

Precision: :func:`de_psd_numpy` (vectorised float64) matches the reference to
~1e-15 relative and is what the extraction CLIs use — the <=1e-4 parity gate.
The f32 :func:`de_psd` jit kernel is for on-device pipelines; DFT cancellation
limits it to ~1e-3 worst-band relative error, irrelevant to the MLPs it feeds.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..data import meta

STFTN = 200  # frequency-domain sampling rate (reference DE_PSD.py:27)
N_BINS = STFTN // 2


def hann_window_ref(length: int, dtype=np.float64) -> np.ndarray:
    """The reference's Hann variant: 0.5 - 0.5*cos(2*pi*n/(H+1)), n = 1..H."""
    n = np.arange(1, length + 1, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / (length + 1))).astype(dtype)


def _band_bounds(fs: int):
    """Integer bin bounds per band: int(f/fs*STFTN) for start and end."""
    starts = [int(f / fs * STFTN) for f in meta.BAND_STARTS_HZ]
    ends = [int(f / fs * STFTN) for f in meta.BAND_ENDS_HZ]
    return starts, ends


@functools.lru_cache(maxsize=8)
def _band_matrix(fs: int, dtype_name: str = "float32") -> np.ndarray:
    """(N_BINS, 5) matrix: column p averages |X|^2 over the reference's
    off-by-one band window [starts[p]-1, ends[p]) with weight
    1/(ends[p]-starts[p]+1)."""
    starts, ends = _band_bounds(fs)
    B = np.zeros((N_BINS, meta.N_BANDS), dtype=np.float64)
    for p in range(meta.N_BANDS):
        lo, hi = starts[p] - 1, ends[p]
        B[lo:hi, p] = 1.0 / (ends[p] - starts[p] + 1)
    return B.astype(dtype_name)


@functools.lru_cache(maxsize=4)
def _dft_bases(dtype_name: str = "float32"):
    """Real/imag DFT bases of shape (STFTN, N_BINS).

    ``x @ cos_basis`` and ``x @ sin_basis`` give Re/Im of the first 100 bins
    of a 200-point DFT.  Built in float64 then cast, so the basis itself
    carries no rounding noise beyond the target dtype.
    """
    n = np.arange(STFTN, dtype=np.float64)[:, None]
    k = np.arange(N_BINS, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / STFTN
    return np.cos(ang).astype(dtype_name), (-np.sin(ang)).astype(dtype_name)


def _prep_windowed(x: jnp.ndarray, window: np.ndarray) -> jnp.ndarray:
    """Apply the Hann variant then truncate/zero-pad the time axis to STFTN."""
    xw = x * jnp.asarray(window, dtype=x.dtype)
    H = x.shape[-1]
    if H >= STFTN:
        return xw[..., :STFTN]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, STFTN - H)]
    return jnp.pad(xw, pad)


@functools.partial(jax.jit, static_argnames=("fs", "win_sec", "dtype"))
def de_psd(x, fs: int = meta.FS, win_sec: float = 2.0, dtype=jnp.float32):
    """Compute (de, psd) band features for windows ``x`` of shape (..., T).

    Drop-in numerical equivalent of reference ``DE_PSD(data, fre, time_window)``
    (DE_PSD.py:8-71) but batched over arbitrary leading axes: the reference
    signature takes (n_channels, T) and returns two (n_channels, 5) arrays;
    this accepts e.g. the full (7, 40, 5, 62, 400) tensor at once.

    Returns ``(de, psd)`` with shape ``x.shape[:-1] + (5,)``.
    """
    H = int(round(fs * win_sec))
    if x.shape[-1] != H:
        raise ValueError(f"expected last axis {H} (= fs*win_sec), got {x.shape[-1]}")
    x = jnp.asarray(x, dtype=dtype)
    window = hann_window_ref(H, dtype=np.dtype(dtype).name if not isinstance(dtype, str) else dtype)
    xw = _prep_windowed(x, window)

    lead = xw.shape[:-1]
    flat = xw.reshape((-1, STFTN))
    dname = np.dtype(jnp.dtype(dtype)).name
    cos_b, sin_b = _dft_bases(dname)
    # HIGHEST precision: TPU f32 matmuls otherwise run as bf16 MXU passes
    # (~3e-3 rel on raw PSD energies, scripts/tpu_kernel_check.py) — the
    # multi-pass f32 product keeps the TPU path inside the <=1e-4 parity
    # budget while staying far above the CPU path's throughput
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(flat, jnp.asarray(cos_b), precision=hi)
    im = jnp.dot(flat, jnp.asarray(sin_b), precision=hi)
    mag2 = re * re + im * im  # |X_k|^2, first 100 bins

    psd = jnp.dot(mag2, jnp.asarray(_band_matrix(fs, dname)), precision=hi)
    de = jnp.log2(100.0 * psd)
    return de.reshape(lead + (meta.N_BANDS,)), psd.reshape(lead + (meta.N_BANDS,))


def de_psd_numpy(data: np.ndarray, fre: int = meta.FS, time_window: float = 2.0):
    """Float64 NumPy oracle with the reference's exact call convention:
    ``(n_channels, T) -> (de, psd)`` each (n_channels, 5).  Used by golden
    tests and the extraction CLIs; implements the same math as
    :func:`de_psd` without JAX.

    Runs chunked over a reused scratch buffer with ``rfft``: whole-subject
    f64 temporaries hit pathological first-touch page-fault cost on small
    VMs (a (1400,62,400) windowing multiply alone measured 12+ s), and
    numpy's complex ``fft`` is ~100x slower than the real path at this
    shape.  rfft of a real signal is the same DFT — bins match ``fft`` to
    float64 rounding.  Only the first STFTN window taps are applied because
    ``fft(x, n=STFTN)`` truncates the signal anyway (reference DE_PSD.py:58).
    """
    H = int(round(fre * time_window))
    assert data.shape[-1] == H
    w = hann_window_ref(H)
    lead = data.shape[:-1]
    flat = data.reshape(-1, H)
    n = flat.shape[0]
    band = _band_matrix(fre, "float64")
    psd = np.empty((n, band.shape[1]), np.float64)
    chunk = min(n, 4096)
    buf = np.zeros((chunk, STFTN), np.float64)
    for i in range(0, n, chunk):
        m = min(chunk, n - i)
        if H >= STFTN:
            np.multiply(flat[i:i + m, :STFTN], w[:STFTN], out=buf[:m])
        else:
            np.multiply(flat[i:i + m], w, out=buf[:m, :H])
        X = np.fft.rfft(buf[:m], n=STFTN, axis=-1)[..., :N_BINS]
        mag2 = np.abs(X)
        np.square(mag2, out=mag2)
        np.matmul(mag2, band, out=psd[i:i + m])
    psd = psd.reshape(lead + (band.shape[1],))
    de = np.log2(100.0 * psd)
    return de, psd
