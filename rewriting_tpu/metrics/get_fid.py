"""Precompute and compare FID statistics for models and datasets
(working equivalent of reference metrics/get_fid.py, whose own imports are
broken upstream — get_gt_lsun is not vendored).

Stats are (mu, sigma) npz files computed from 50k samples (reference N,
get_fid.py:8) of either a generator or an image directory."""

from __future__ import annotations

import os

import numpy as np

from ..utils import pbar
from . import fid as fid_mod

N = 50000


def model_stats(model, params, n: int = N, batch_size: int = 50,
                feature_fn=None, offset: int = 0):
    """(mu, sigma) over n generated images (per-image z-seed contract)."""
    import jax
    from .sample import per_image_z
    if feature_fn is None:
        feature_fn = fid_mod.FeatureExtractor(batch_size=batch_size)
    from ..ops.jitopts import tuned_jit
    sample_fn = tuned_jit(lambda p, z: model(p, z))

    def batches():
        for lo in pbar.pbar(range(0, n, batch_size)):
            nums = [i + offset for i in range(lo, min(lo + batch_size, n))]
            zs = per_image_z(model, nums)
            if len(zs) < batch_size:
                zs = np.concatenate([zs, np.zeros(
                    (batch_size - len(zs),) + zs.shape[1:], zs.dtype)])
            yield np.asarray(sample_fn(params, zs))[:len(nums)]

    return fid_mod.compute_feature_stats(batches(), feature_fn)


def save_model_stats(path: str, model, params, **kwargs):
    if os.path.exists(path):
        print(path, "exists")
        return
    mu, sigma = model_stats(model, params, **kwargs)
    fid_mod.save_stats(path, mu, sigma)


def save_dir_stats(path: str, image_dir: str, batch_size: int = 50,
                   feature_fn=None):
    if os.path.exists(path):
        print(path, "exists")
        return
    if feature_fn is None:
        feature_fn = fid_mod.FeatureExtractor(batch_size=batch_size)
    mu, sigma = fid_mod.compute_feature_stats(
        fid_mod._image_dir_batches(image_dir, batch_size), feature_fn)
    fid_mod.save_stats(path, mu, sigma)


def main():  # pragma: no cover - CLI
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="church")
    ap.add_argument("--image_dir", default=None,
                    help="compute stats for a directory instead")
    ap.add_argument("--out", default=None)
    ap.add_argument("--n", type=int, default=N)
    ap.add_argument("--compare", nargs=2, default=None,
                    metavar=("A.npz", "B.npz"))
    args = ap.parse_args()
    if args.compare:
        m1, s1 = fid_mod.load_stats(args.compare[0])
        m2, s2 = fid_mod.load_stats(args.compare[1])
        print(fid_mod.calculate_frechet_distance(m1, s1, m2, s2))
        return
    out = args.out or (f"{args.dataset}_stats.npz" if not args.image_dir
                       else "dir_stats.npz")
    if args.image_dir:
        save_dir_stats(out, args.image_dir)
    else:
        from ..models.zoo import load_seq_stylegan
        model, params = load_seq_stylegan(args.dataset, truncation=0.5)
        save_model_stats(out, model, params, n=args.n)


if __name__ == "__main__":  # pragma: no cover
    main()
