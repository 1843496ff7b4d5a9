"""Segment all sampled images and save per-image label maps
(reference metrics/seg_stats.py: 10k images -> one .pth per image; here
one .npz per image via the async worker pool)."""

from __future__ import annotations

import os

import numpy as np

from ..utils import pbar, renormalize
from ..utils.pidfile import mark_job_done, reserve_dir
from ..utils.workerpool import WorkerBase, WorkerPool
from .sample import pad_batch


class SaveSegWorker(WorkerBase):
    def work(self, path, seg):
        # int64 in the file regardless of the transfer dtype, matching
        # the reference's torch.save(long) artifact contract
        np.savez_compressed(path, seg=np.asarray(seg, np.int64))


class SaveSegPool(WorkerPool):
    def __init__(self, **kwargs):
        super().__init__(worker=SaveSegWorker, **kwargs)


def process(segmodel, img_path: str, result_path: str, n: int = 10000,
            batch_size: int = 8):
    """Segment {img_path}/{i}.png -> {result_path}/{i}.npz
    (reference seg_stats.py:16-27).

    Pipelined driver: PNGs are decoded by a readahead THREAD pool
    (native.read_batches — the ctypes inflate releases the GIL, so
    decode parallelizes AND overlaps device compute), and segmenters
    exposing `segment_batch_device` (uint8 in, async device uint8 labels
    out) have their label downloads overlapped on a bounded multi-stream
    fetcher (utils/fetcher.py) while later batches compute.  Only ~1/24
    the bytes of the naive fp32/int64 round-trip cross the host link."""
    os.makedirs(result_path, exist_ok=True)
    saver = SaveSegPool()
    device_path = hasattr(segmodel, "segment_batch_device")

    def write(nums, labels):
        for num, seg in zip(nums, labels):
            saver.add(os.path.join(result_path, f"{num}.npz"), seg)

    from ..native import read_batches
    from ..utils.fetcher import AsyncFetcher
    paths = [os.path.join(img_path, f"{i}.png") for i in range(n)]
    try:
        # the with-block aborts (not drains) the fetcher on exception so
        # a faulted device can't hang the exit or leave orphaned fetch
        # threads contending the host link
        with AsyncFetcher(write, streams=2, window=3) as fetcher:
            start = 0
            for imgs in pbar.pbar(read_batches(paths, batch_size),
                                  total=(n + batch_size - 1) // batch_size):
                nums = list(range(start, start + imgs.shape[0]))
                start += imgs.shape[0]
                imgs = pad_batch(imgs, batch_size)
                if device_path:
                    dev = segmodel.segment_batch_device(imgs)
                elif getattr(segmodel, "accepts_uint8", False):
                    # device-side normalize (segmenter raw_seg_prediction)
                    dev = segmodel.segment_batch(imgs)
                else:  # duck-typed segmenters take zc float batches
                    dev = segmodel.segment_batch(renormalize.renormalize(
                        imgs.astype(np.float32) / 255.0, "pt", "zc"))
                fetcher.submit(nums, dev)
    finally:
        saver.close()  # flushes queued writes; idempotent


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
