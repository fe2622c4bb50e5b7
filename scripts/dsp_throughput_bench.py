"""Preprocessing throughput: TPU matmul-DFT DE/PSD vs the reference loop.

The reference extracts DE/PSD with a per-(block, concept, rep) Python loop
calling DE_PSD (reference extract_DE_PSD_features_1per2s.py:20-26), which
itself loops 62 channels x scipy fft + a scalar band loop (DE_PSD.py:55-68).
This script times one full subject (7x40x5 segments of (62, 400)):

- reference: the actual /root/reference implementation, executed in-process;
- ours (CPU f64): dsp.de_psd_numpy, the vectorised parity path the CLIs use;
- ours (TPU f32): dsp.de_psd jitted over the whole (1400, 62, 400) tensor.

Usage: PYTHONPATH=. python scripts/dsp_throughput_bench.py [--skip_reference]
"""

import argparse
import importlib.util
import sys
import time

import numpy as np


def load_reference_de_psd():
    spec = importlib.util.spec_from_file_location(
        "ref_de_psd", "/root/reference/EEG_preprocessing/DE_PSD.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.DE_PSD


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip_reference", action="store_true")
    p.add_argument("--ref_segments", type=int, default=100,
                   help="reference segments to time (extrapolated to 1400)")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    subject = rng.standard_normal((1400, 62, 400)).astype(np.float64)

    rows = []

    if not args.skip_reference:
        ref = load_reference_de_psd()
        n = args.ref_segments
        t0 = time.perf_counter()
        for i in range(n):
            ref(subject[i], 200, 2)
        ref_dt = (time.perf_counter() - t0) / n * 1400
        rows.append(("reference DE_PSD loop (scipy, extrapolated)", ref_dt))

    from eeg2video_tpu.dsp import de_psd, de_psd_numpy

    t0 = time.perf_counter()
    de_psd_numpy(subject, 200, 2.0)
    rows.append(("ours CPU f64 (de_psd_numpy, parity path)",
                 time.perf_counter() - t0))

    import jax
    import jax.numpy as jnp

    x = jax.device_put(jnp.asarray(subject, jnp.float32))
    de, psd = de_psd(x)  # compile + warm
    float(jnp.sum(de) + jnp.sum(psd))
    t0 = time.perf_counter()
    de, psd = de_psd(x)
    float(jnp.sum(de) + jnp.sum(psd))  # host reduction = tunnel-safe sync
    rows.append((f"ours {jax.default_backend()} f32 (de_psd jit)",
                 time.perf_counter() - t0))

    base = rows[0][1]
    print(f"\nfull subject = 7x40x5 = 1400 segments of (62, 400):")
    for name, dt in rows:
        print(f"  {dt*1000:10.1f} ms  {base/dt:8.1f}x  {name}")


if __name__ == "__main__":
    main()
    import os

    os._exit(0)
