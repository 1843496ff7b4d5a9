"""Single-pass fused metrics pipeline: sample -> segment -> FID features
in one device pass per batch.

The reference pipeline (reference experiments.sh:10-48) runs three
artifact-staged processes: sample 10k PNGs (metrics/sample.py), re-read
and segment them (metrics/seg_stats.py), re-read them again for FID
feature stats (metrics/fid.py).  Staging is the right default for
resumability, and the staged drivers here are already transfer-lean —
but each stage pays the device<->host link again, and on a networked
accelerator runtime that link is the measured wall of the whole workload
(docs/PERF_NOTES.md round 3: ~18 MB/s aggregate; 10k 256px images are
~2 GB of uint8).

This driver produces the SAME artifacts (per-image PNGs, per-image label
npz, feature-stat npz) in one pass: each sampled batch is segmented and
featurized while still RESIDENT ON DEVICE, so pixels cross the link
exactly once (down), labels once (down), and nothing is ever uploaded
back.  FID features never leave the device at all (the running
covariance update is jitted).  Image and label downloads share one
bounded multi-stream fetcher so the link stays saturated while the chip
computes the next batch.

Exactness: byte-identical artifacts to the staged path — the PNGs are
written from the same device-quantized uint8 batches sample_clean
produces, the labels from the same segment_batch_device dispatch
seg_stats.process issues on the (losslessly) re-decoded pixels, and the
FID features from the same uint8 values the staged FID pass re-uploads
(asserted in tests/test_fused_pipeline.py)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..utils import pbar
from ..utils.fetcher import AsyncFetcher
from ..utils.imgsave import SaveImagePool
from .sample import per_image_z, quantize_uint8
from .seg_stats import SaveSegPool


def run_fused(model, params, outdir: str, segmodel=None, feature_fn=None,
              n: int = 10000, batch_size: int = 64, offset: int = 0,
              seg_dir: Optional[str] = None,
              stats_path: Optional[str] = None,
              sample_fn=None, seg_downsample: int = 1):
    """Sample n images under the per-image z-seed contract and, per
    device batch, optionally segment (labels -> {seg_dir}/{i}.npz) and
    accumulate FID feature stats (-> stats_path / returned (mu, sigma)).

    Artifact layout matches the staged drivers (sample_clean +
    seg_stats.process + get_fid.save_model_stats), so downstream stages
    (seg_correct_mod, distances, fid comparisons) consume either."""
    import jax.numpy as jnp

    from .sample import default_sample_fn, pad_batch, write_lightbox

    write_lightbox(outdir)
    if sample_fn is None:
        sample_fn = default_sample_fn(model)
    seg_device = hasattr(segmodel, "segment_batch_device")
    if segmodel is not None:
        seg_dir = seg_dir or os.path.join(outdir, "seg")
        os.makedirs(seg_dir, exist_ok=True)
    cov = None
    dev_feature_fn = None
    if feature_fn is not None:
        from ..stats.running import RunningCovariance
        cov = RunningCovariance()
        # same plain-callable tolerance as fid.compute_feature_stats
        dev_feature_fn = getattr(feature_fn, "device_features", feature_fn)

    img_saver = SaveImagePool()
    seg_saver = SaveSegPool() if segmodel is not None else None

    def write(tag, arr):
        kind, nums = tag
        if kind == "img":
            for num, img in zip(nums, arr):
                img_saver.add(img, os.path.join(outdir, f"{num}.png"))
        else:
            for num, seg in zip(nums, arr):
                seg_saver.add(os.path.join(seg_dir, f"{num}.npz"), seg)

    try:
        with AsyncFetcher(write, streams=2, window=4) as fetcher:
            for lo in pbar.pbar(range(0, n, batch_size),
                                desc="fused pipeline"):
                nums = list(range(lo, min(lo + batch_size, n)))
                zs = pad_batch(per_image_z(model,
                                           [i + offset for i in nums]),
                               batch_size)
                imgs = quantize_uint8(sample_fn(params, zs))
                fetcher.submit(("img", nums), imgs[:len(nums)])
                if segmodel is not None:
                    # same three-way dispatch as seg_stats.process so
                    # the label artifacts match the staged driver
                    if seg_device:
                        labels = segmodel.segment_batch_device(
                            imgs, downsample=seg_downsample)
                    else:
                        # all in-repo segment_batch implementations take a
                        # downsample kwarg; only forward it when non-default
                        # so minimal duck-typed segmenters keep working
                        kw = ({} if seg_downsample == 1
                              else {"downsample": seg_downsample})
                        if getattr(segmodel, "accepts_uint8", False):
                            labels = segmodel.segment_batch(imgs, **kw)
                        else:  # duck-typed segmenters take zc float batches
                            from ..utils import renormalize
                            labels = segmodel.segment_batch(
                                renormalize.renormalize(
                                    np.asarray(imgs).astype(np.float32)
                                    / 255.0, "pt", "zc"), **kw)
                    # device labels fetch async below; host labels pass
                    # through np.asarray as a no-op — never re-uploaded
                    fetcher.submit(("seg", nums), labels[:len(nums)])
                if cov is not None:
                    feats = dev_feature_fn(imgs)
                    cov.add(jnp.asarray(feats)[:len(nums)])
    finally:
        img_saver.close()
        if seg_saver is not None:
            seg_saver.close()

    if cov is None:
        return None
    mu = np.asarray(cov.mean())
    sigma = np.asarray(cov.covariance(unbiased=True))
    if stats_path:
        from . import fid as fid_mod
        fid_mod.save_stats(stats_path, mu, sigma)
    return mu, sigma


def main():  # pragma: no cover - CLI
    import argparse
    ap = argparse.ArgumentParser(
        "fused sample+segment+FID pipeline (one device pass)")
    ap.add_argument("--dataset", default="church")
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--results", default="results/fused")
    ap.add_argument("--seg", default=None,
                    help="experiment name for the load_seg registry "
                         "(omit to skip segmentation)")
    ap.add_argument("--fid_stats", action="store_true",
                    help="also accumulate Inception feature stats")
    args = ap.parse_args()
    from ..models.zoo import load_seq_stylegan
    from ..utils.pidfile import mark_job_done, reserve_dir
    model, params = load_seq_stylegan(args.dataset, truncation=0.5)
    segmodel = None
    if args.seg:
        from .load_seg import load_seg_model
        segmodel = load_seg_model(args.seg)
    feature_fn = None
    if args.fid_stats:
        from .fid import FeatureExtractor
        feature_fn = FeatureExtractor(batch_size=args.batch_size)
    outdir = os.path.join(args.results, args.dataset)
    reserve_dir(outdir)
    run_fused(model, params, outdir, segmodel=segmodel,
              feature_fn=feature_fn, n=args.n, batch_size=args.batch_size,
              stats_path=(os.path.join(outdir, "fid_stats.npz")
                          if args.fid_stats else None))
    mark_job_done(outdir)


if __name__ == "__main__":  # pragma: no cover
    main()
