"""CLI: segment raw SEED-DV EEG into (7, 40, 5, 62, 400) arrays.

Contract of reference EEG_preprocessing/segment_raw_signals_200Hz.py
(defaults included), vectorised on device instead of the triple Python loop.
"""

import argparse

import numpy as np

from ..data.io import save_array, subject_files
from ..dsp import bandpass_filter, segment_subject
from ..utils import get_logger

log = get_logger(__name__)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--eeg_root", default="./data/EEG")
    p.add_argument("--output_dir", default="./data/Preprocessing/Segmented_Rawf_200Hz_2s")
    p.add_argument("--fs", type=int, default=200)
    p.add_argument("--subs", type=int, nargs="*", default=None)
    p.add_argument(
        "--bandpass", type=float, nargs=2, metavar=("LOW", "HIGH"),
        default=None,
        help="optional zero-phase Butterworth bandpass (Hz) applied to the "
             "raw signal before segmentation (BASELINE.md preprocessing path)")
    p.add_argument("--bandpass_order", type=int, default=4)
    p.add_argument("--mmap", action="store_true",
                   help="memory-map the raw file instead of loading it "
                        "(reference use_mmap, segment_raw_signals_200Hz.py:47 "
                        "— a whole-session raw file is ~0.5 GB/subject)")
    args = p.parse_args(argv)

    for sub, path in subject_files(args.eeg_root, args.subs):
        data = np.load(path, mmap_mode="r" if args.mmap else None)
        if args.bandpass is not None:
            low, high = args.bandpass
            data = np.asarray(
                bandpass_filter(data, low, high, fs=args.fs,
                                order=args.bandpass_order)).astype(data.dtype)
        segs = np.asarray(segment_subject(data, fs=args.fs))
        out = f"{args.output_dir}/sub{sub}.npy"
        save_array(out, segs.astype(data.dtype))
        log.info("sub%d -> %s %s", sub, out, segs.shape)


if __name__ == "__main__":
    main()
