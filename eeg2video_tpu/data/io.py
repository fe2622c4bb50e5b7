"""Inter-stage artifact IO: .npy / .pt loaders and writers.

The reference pipeline communicates between stages exclusively through
files on disk (SURVEY.md section 1) — .npy feature tensors, .pt latent /
checkpoint tensors, GIFs.  These helpers read both formats into numpy
(torch only needed for .pt)."""

from __future__ import annotations

import os

import numpy as np


def load_array(path: str) -> np.ndarray:
    """Load .npy or .pt (torch tensor / array) as numpy."""
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".npz"):
        return np.load(path)
    if path.endswith(".pt") or path.endswith(".pth"):
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(obj, "numpy"):
            return obj.detach().cpu().numpy()
        return np.asarray(obj)
    raise ValueError(f"unsupported artifact format: {path}")


def save_array(path: str, arr) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arr = np.asarray(arr)
    if path.endswith(".npy"):
        np.save(path, arr)
    elif path.endswith(".pt"):
        import torch

        torch.save(torch.from_numpy(arr), path)
    else:
        raise ValueError(f"unsupported artifact format: {path}")


def subject_files(root: str, subs=None):
    """Enumerate sub*.npy files like the reference drivers
    (segment_raw_signals_200Hz.py:81-83; extract_DE_PSD_*: --subs)."""
    if subs:
        return [(int(s), os.path.join(root, f"sub{int(s)}.npy")) for s in subs]
    out = []
    for f in sorted(os.listdir(root)):
        if f.startswith("sub") and f.endswith(".npy"):
            out.append((int(f[3:-4]), os.path.join(root, f)))
    return out
