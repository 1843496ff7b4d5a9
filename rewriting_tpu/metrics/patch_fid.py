"""Per-layer patch-FID sweep (reference metrics/patch_metrics/
fid_image_patches.py + fid_patches.sh): sample image patches corresponding
to fixed-size crops of a layer's activations, from the clean vs the edited
model, and FID them — localizing how much an edit perturbs each layer."""

from __future__ import annotations

import os
import random
from typing import Optional, Sequence

import numpy as np

from ..utils import pbar
from . import fid as fid_mod


def sample_patches(gw, crop_size: int, n: int, seed: int = 1,
                   batch_indices: Optional[Sequence[int]] = None
                   ) -> np.ndarray:
    """n patch images from the rewriter's current params
    (reference fid_image_patches.py:29-57 uses random crops per image)."""
    rng = random.Random(seed)
    h = gw.k_shape[1]
    out = []
    idxs = batch_indices if batch_indices is not None else range(n)
    for i in pbar.pbar(list(idxs)[:n], desc=f"patches {crop_size}"):
        xi = rng.randint(0, h - crop_size)
        yi = rng.randint(0, h - crop_size)
        img = np.asarray(gw.sample_image_patch(
            gw.get_z(i % len(gw.zds)), crop_size, seed=(xi, yi)))
        out.append(img[0])
    return np.stack(out)


def patch_fid_sweep(gw_clean, gw_edited, crop_sizes: Sequence[int],
                    n: int = 1000, feature_fn=None) -> dict:
    """{crop_size: FID(clean patches, edited patches)}."""
    results = {}
    for cs in crop_sizes:
        a = sample_patches(gw_clean, cs, n, seed=1)
        b = sample_patches(gw_edited, cs, n, seed=1)
        results[cs] = fid_mod.compute_fid(a, b, feature_fn=feature_fn)
        pbar.print(f"crop {cs}: FID {results[cs]:.3f}")
    return results
