"""Generate golden parity fixtures by *running* the reference implementation.

The reference repo (read-only at /root/reference) ships no tests; parity
fixtures are the critical asset for the <=1e-4 numerical targets.  This
script executes reference functions on fixed random inputs and stores the
outputs under tests/fixtures/.  No reference code is copied into the repo —
fixtures capture behavior, our implementations are written from scratch.

Run from repo root:  python scripts/gen_golden_fixtures.py
"""

import os
import sys

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
os.makedirs(OUT, exist_ok=True)


def gen_de_psd():
    sys.path.insert(0, os.path.join(REF, "EEG_preprocessing"))
    from DE_PSD import DE_PSD  # noqa: E402  (reference module, torch-free)

    rng = np.random.default_rng(1234)
    cases = {}
    for name, win in [("w2s", 2.0), ("w500ms", 0.5), ("w1s", 1.0)]:
        T = int(200 * win)
        x = rng.standard_normal((8, T)) * 20.0 + rng.standard_normal((8, 1))
        de, psd = DE_PSD(x, 200, win)
        cases[f"{name}_x"] = x
        cases[f"{name}_de"] = de
        cases[f"{name}_psd"] = psd
    np.savez(os.path.join(OUT, "de_psd_golden.npz"), **cases)
    print("de_psd_golden.npz written:", {k: v.shape for k, v in cases.items()})


def gen_sliding_window():
    sys.path.insert(0, os.path.join(REF, "EEG_preprocessing"))
    from segment_sliding_window import seg_sliding_window  # noqa: E402

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 3, 2, 5, 400))
    w = seg_sliding_window(x, 0.5, 0.25, fs=200)
    np.savez(os.path.join(OUT, "sliding_window_golden.npz"), x=x, w=w)
    print("sliding_window_golden.npz written:", w.shape)


if __name__ == "__main__":
    gen_de_psd()
    gen_sliding_window()
