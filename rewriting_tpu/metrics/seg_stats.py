"""Segment all sampled images and save per-image label maps
(reference metrics/seg_stats.py: 10k images -> one .pth per image; here
one .npz per image via the async worker pool)."""

from __future__ import annotations

import os

import numpy as np

from ..utils import pbar, renormalize
from ..utils.pidfile import mark_job_done, reserve_dir
from ..utils.workerpool import WorkerBase, WorkerPool


class SaveSegWorker(WorkerBase):
    def work(self, path, seg):
        np.savez_compressed(path, seg=np.asarray(seg))


class SaveSegPool(WorkerPool):
    def __init__(self, **kwargs):
        super().__init__(worker=SaveSegWorker, **kwargs)


def process(segmodel, img_path: str, result_path: str, n: int = 10000,
            batch_size: int = 8):
    """Segment {img_path}/{i}.png -> {result_path}/{i}.npz
    (reference seg_stats.py:16-27)."""
    import PIL.Image
    os.makedirs(result_path, exist_ok=True)
    saver = SaveSegPool()
    batch, nums = [], []

    def flush():
        if not batch:
            return
        imgs = np.stack(batch)
        segs = np.asarray(segmodel.segment_batch(imgs))
        for num, seg in zip(nums, segs):
            saver.add(os.path.join(result_path, f"{num}.npz"), seg)
        batch.clear()
        nums.clear()

    from ..native import read_image_rgb
    for i in pbar.pbar(range(n)):
        img = read_image_rgb(
            os.path.join(img_path, f"{i}.png")).astype(np.float32) / 255.0
        batch.append(renormalize.renormalize(img, "pt", "zc"))
        nums.append(i)
        if len(batch) == batch_size:
            flush()
    flush()
    saver.join()


def main():  # pragma: no cover - CLI (reference seg_stats.py:41-58)
    import argparse
    ap = argparse.ArgumentParser("seg")
    ap.add_argument("exp_name", type=str)
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--results", default="results/samples")
    args = ap.parse_args()
    from .load_seg import load_seg_model
    segmodel = load_seg_model(args.exp_name)
    img_path = os.path.join(args.results, args.exp_name)
    result_path = os.path.join(args.results, "seg", args.exp_name)
    reserve_dir(result_path)
    process(segmodel, img_path, result_path, n=args.n)
    mark_job_done(result_path)


if __name__ == "__main__":  # pragma: no cover
    main()
