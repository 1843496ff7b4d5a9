"""Shared per-image segmentation file IO (one helper for both the
effectiveness and damage metrics)."""

from __future__ import annotations

import os

import numpy as np


def load_seg(path_base: str):
    """Load {path_base}.npz (seg_stats format) or the reference's torch
    .pth format."""
    if os.path.exists(path_base + ".npz"):
        return np.load(path_base + ".npz")["seg"]
    if os.path.exists(path_base + ".pth"):
        import torch
        return torch.load(path_base + ".pth", map_location="cpu").numpy()
    raise FileNotFoundError(path_base + ".{npz,pth}")
