"""CLI: block mp4s -> per-clip 6-frame 288x512 GIFs
(contract of reference EEG2Video/extract_gif.py)."""

import argparse
import os

from ..data.video import extract_gifs_from_block
from ..utils import get_logger

log = get_logger(__name__)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video_dir", default="./data/Video")
    p.add_argument("--out_root", default="./data/Video_gifs")
    p.add_argument("--blocks", type=int, nargs="*", default=list(range(7)))
    args = p.parse_args(argv)

    for blk in args.blocks:
        src = os.path.join(args.video_dir, f"{blk + 1}.mp4")
        out = os.path.join(args.out_root, f"Block{blk}")
        written = extract_gifs_from_block(src, out)
        log.info("block %d: %d gifs -> %s", blk, len(written), out)


if __name__ == "__main__":
    main()
