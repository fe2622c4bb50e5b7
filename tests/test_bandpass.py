"""Butterworth bandpass parity vs scipy.signal (VERDICT round-1 #6).

Coefficient design is compared against scipy.signal.butter to f64 precision;
filtfilt is compared against scipy.signal.filtfilt both in-process (f32,
loose) and in a JAX_ENABLE_X64 subprocess for the <=1e-6 gate (x64 is a
process-global JAX config, so the strict check gets its own interpreter).
"""

import os
import subprocess
import sys

import numpy as np
import pytest
from scipy import signal

from eeg2video_tpu.dsp.bandpass import (
    bandpass_filter,
    butter_bandpass,
    butter_bandpass_sos,
    filtfilt,
    lfilter_zi,
)


@pytest.mark.parametrize("order,low,high,fs", [
    (4, 1.0, 49.0, 200.0),
    (2, 4.0, 31.0, 200.0),
    (5, 8.0, 14.0, 200.0),
    (3, 0.5, 70.0, 1000.0),
])
def test_butter_design_matches_scipy(order, low, high, fs):
    b, a = butter_bandpass(order, low, high, fs)
    b_ref, a_ref = signal.butter(order, [low, high], btype="band", fs=fs)
    np.testing.assert_allclose(b, b_ref, rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(a, a_ref, rtol=1e-10, atol=1e-14)


def test_lfilter_zi_matches_scipy():
    b, a = butter_bandpass(4, 1.0, 49.0, 200.0)
    np.testing.assert_allclose(lfilter_zi(b, a), signal.lfilter_zi(b, a),
                               rtol=1e-9, atol=1e-12)


def test_sos_expansion_matches_tf():
    """The biquad cascade expands to the same (b, a) polynomial."""
    for order in (2, 3, 4, 5):
        b, a = butter_bandpass(order, 4.0, 31.0, 200.0)
        sos = butter_bandpass_sos(order, 4.0, 31.0, 200.0)
        bb, aa = np.array([1.0]), np.array([1.0])
        for row in sos:
            bb = np.polymul(bb, row[:3])
            aa = np.polymul(aa, row[3:])
        np.testing.assert_allclose(bb, b, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(aa, a, rtol=1e-9, atol=1e-12)


def test_bandpass_filter_matches_scipy_f32():
    """The SOS device path stays accurate in f32 (the TF form does not:
    measured 0.33 abs error at order 4 — why bandpass_filter is SOS-only)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 62, 400)).astype(np.float32)
    b, a = butter_bandpass(4, 1.0, 49.0, 200.0)
    got = np.asarray(bandpass_filter(x, 1.0, 49.0, 200.0, order=4))
    want = signal.filtfilt(b, a, x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_filtfilt_matches_scipy_f64_subprocess():
    """The <=1e-6 parity gate, run under JAX_ENABLE_X64=1 in a fresh process."""
    code = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from scipy import signal
from eeg2video_tpu.dsp.bandpass import bandpass_filter, butter_bandpass, filtfilt
rng = np.random.default_rng(1)
x = rng.standard_normal((5, 62, 400))
b, a = butter_bandpass(4, 1.0, 49.0, 200.0)
want = signal.filtfilt(b, a, x, axis=-1)
for got in (np.asarray(filtfilt(b, a, x)),
            np.asarray(bandpass_filter(x, 1.0, 49.0, 200.0, order=4))):
    err = np.max(np.abs(got - want))
    assert err < 1e-6, err
print("OK", err)
"""
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", ""))
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert out.stdout.startswith("OK")


def test_bandpass_filter_attenuates_out_of_band():
    fs, t = 200.0, np.arange(2000) / 200.0
    inband = np.sin(2 * np.pi * 10.0 * t)  # 10 Hz, inside [4, 31]
    outband = np.sin(2 * np.pi * 60.0 * t)  # 60 Hz, outside
    y_in = np.asarray(bandpass_filter(inband.astype(np.float32), 4.0, 31.0, fs))
    y_out = np.asarray(bandpass_filter(outband.astype(np.float32), 4.0, 31.0, fs))
    mid = slice(500, 1500)
    assert np.std(y_in[mid]) > 0.9 * np.std(inband[mid])
    assert np.std(y_out[mid]) < 0.02 * np.std(outband[mid])


def test_segment_cli_bandpass_flag(tmp_path):
    from eeg2video_tpu.cli import segment_raw_signals_200hz as cli
    fs = 200
    T = 40 * (3 * fs + 5 * 2 * fs)
    rng = np.random.default_rng(2)
    raw = rng.standard_normal((7, 62, T)).astype(np.float32)
    np.save(tmp_path / "sub1.npy", raw)
    outdir = tmp_path / "seg"
    cli.main(["--eeg_root", str(tmp_path), "--output_dir", str(outdir),
              "--subs", "1", "--bandpass", "1", "49"])
    segs = np.load(outdir / "sub1.npy")
    assert segs.shape == (7, 40, 5, 62, 2 * fs)
    # filtered output must differ from the unfiltered segmentation
    cli.main(["--eeg_root", str(tmp_path), "--output_dir", str(tmp_path / "seg0"),
              "--subs", "1"])
    segs0 = np.load(tmp_path / "seg0" / "sub1.npy")
    assert not np.allclose(segs, segs0)
