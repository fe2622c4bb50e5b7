"""CLI: DE/PSD band-power features at 2 s / 1 s / 500 ms granularity.

Contracts of the three reference drivers (extract_DE_PSD_features_1per2s.py,
_1per1s.py, and _1per500ms.py whose --raw_dir/--de_dir/--psd_dir/--subs
argparse interface is preserved, reference :33-39).  The per-window DE_PSD
loop (86,800 scipy FFTs) becomes one vectorised float64 pass — the <=1e-4
parity path (see dsp.de_psd); pass --f32 to use the on-device kernel instead.
"""

import argparse

import numpy as np

from ..data.io import save_array, subject_files
from ..dsp import de_psd, de_psd_numpy
from ..utils import get_logger

log = get_logger(__name__)

_MODES = {
    # mode: (window seconds, how to window the (7,40,5,62,400) segments)
    "1per2s": 2.0,
    "1per1s": 1.0,
    "1per500ms": 0.5,
}


def _windows(segs: np.ndarray, mode: str) -> np.ndarray:
    if mode == "1per2s":
        return segs  # (..., 62, 400)
    if mode == "1per1s":
        # two 1 s halves (reference _1per1s.py:46-47) -> (7,40,5,2,62,200)
        halves = np.stack([segs[..., :200], segs[..., 200:]], axis=3)
        return halves
    if mode == "1per500ms":
        # expects pre-windowed Segmented_500ms_sw input (7,40,5,7,62,100)
        return segs
    raise ValueError(mode)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=sorted(_MODES), default="1per2s")
    p.add_argument("--raw_dir", default=None,
                   help="default: Segmented_Rawf_200Hz_2s (2s/1s modes) or "
                        "Segmented_500ms_sw (500ms mode)")
    p.add_argument("--de_dir", default=None)
    p.add_argument("--psd_dir", default=None)
    p.add_argument("--subs", type=int, nargs="*", default=None)
    p.add_argument("--fs", type=int, default=200)
    p.add_argument("--f32", action="store_true",
                   help="use the on-device f32 kernel instead of the float64 parity path")
    args = p.parse_args(argv)

    if args.raw_dir is None:
        args.raw_dir = ("./data/Preprocessing/Segmented_500ms_sw"
                        if args.mode == "1per500ms"
                        else "./data/Preprocessing/Segmented_Rawf_200Hz_2s")
    suffix = {"1per2s": "1per2s", "1per1s": "1per1s", "1per500ms": "1per500ms"}[args.mode]
    de_dir = args.de_dir or f"./data/Preprocessing/DE_{suffix}"
    psd_dir = args.psd_dir or f"./data/Preprocessing/PSD_{suffix}"
    win_sec = _MODES[args.mode]

    for sub, path in subject_files(args.raw_dir, args.subs):
        segs = np.load(path)
        w = _windows(segs, args.mode)
        if args.f32:
            de, psd = (np.asarray(a) for a in de_psd(w, fs=args.fs, win_sec=win_sec))
        else:
            de, psd = de_psd_numpy(w, args.fs, win_sec)
        save_array(f"{de_dir}/sub{sub}.npy", de.astype(np.float64))
        save_array(f"{psd_dir}/sub{sub}.npy", psd.astype(np.float64))
        log.info("sub%d %s -> de%s", sub, args.mode, de.shape)


if __name__ == "__main__":
    main()
