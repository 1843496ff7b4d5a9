"""Watermark-removal experiment (paper §5.2).

Behavioral rebuild of reference metrics/make_watermark_images.py: build a
rewriter whose key covariance comes from a truncation-1.0 model (cached and
shared), erase the watermark rule from the truncation-0.5 sampling model —
'ours' (apply_erase, repeated nreps times) vs 'gandissect' (zero the
context direction) vs 'none' — then dump the zds sample images."""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import numpy as np

from ..utils import pbar, renormalize
from ..utils.imgsave import SaveImagePool
from ..utils.pidfile import mark_job_done, reserve_dir
from ..utils.zdataset import z_dataset_for_model


def save_zds_images(dirname: str, model, params, zds, batch_size: int = 10,
                    name_template: str = "image_{}.png", indices=None):
    """Render every z in the dataset and write image_{i}.png
    (reference make_watermark_images.py:100-130)."""
    import jax
    os.makedirs(dirname, exist_ok=True)
    from ..ops.jitopts import tuned_jit
    sample_fn = tuned_jit(lambda p, z: model(p, z))
    saver = SaveImagePool()
    idxs = list(indices) if indices is not None else list(range(len(zds)))
    for lo in pbar.pbar(range(0, len(idxs), batch_size),
                        desc="Saving images"):
        chunk = idxs[lo:lo + batch_size]
        zs = np.stack([zds[i] for i in chunk])
        if len(chunk) < batch_size:
            zs = np.concatenate([zs, np.zeros(
                (batch_size - len(chunk),) + zs.shape[1:], zs.dtype)])
        imgs = np.asarray(sample_fn(params, zs))[:len(chunk)]
        imgs = renormalize.renormalize(np.clip(imgs, -1, 1), "zc", "byte")
        for i, img in zip(chunk, imgs):
            saver.add(img, os.path.join(dirname, name_template.format(i)))
    saver.join()


def erase_watermark(model, params, params_for_covariance, request: dict,
                    layer: int, outdir: str, rank: int = 1, drank: int = 1,
                    niters: int = 2001, piters: int = 10, lr: float = 0.05,
                    nreps: int = 2, erasemethod: str = "ours",
                    sample_size: int = 1000, save_images: bool = True):
    """Returns the rewriter after erasing; optionally dumps sample images.

    The covariance statistic comes from the truncation-1.0 params
    (populating the shared npz cache), while the edit applies to the
    truncation-0.5 sampling params (reference :39-54)."""
    from ..rewrite import SeqStyleGanRewriter
    zds = z_dataset_for_model(model, size=sample_size)
    key_method = {"ours": "zca", "gandissect": "gandissect",
                  "none": "zca"}[erasemethod]
    os.makedirs(outdir, exist_ok=True)
    if params_for_covariance is not None:
        # populate the r2m cache from the truncation-1.0 model
        SeqStyleGanRewriter(
            model, params_for_covariance, zds, layer, cachedir=outdir,
            low_rank_insert=True, low_rank_gradient=True,
            key_method=key_method)
    gw = SeqStyleGanRewriter(
        model, params, zds, layer, cachedir=outdir,
        low_rank_insert=True, low_rank_gradient=True,
        key_method=key_method)
    if erasemethod == "ours":
        for rep in range(nreps):
            pbar.print("erasing objects from model (rep %d)" % rep)
            gw.apply_erase(request, rank=rank, drank=drank, niter=niters,
                           piter=piters, lr=lr)
    elif erasemethod == "gandissect":
        mkey = gw.multi_key_from_selection(request["key"], rank=drank)
        gw.zero(mkey)
    else:
        assert erasemethod == "none"
    if save_images:
        savedir = os.path.join(outdir, "images")
        os.makedirs(savedir, exist_ok=True)
        shutil.copyfile(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         "utils", "lightbox.html"),
            os.path.join(savedir, "+lightbox.html"))
        save_zds_images(savedir, model, gw.params, zds)
    return gw


def main():  # pragma: no cover - CLI (reference :12-96)
    import argparse
    ap = argparse.ArgumentParser(description="make_watermark_images")
    ap.add_argument("--outdir", default="results/watermark")
    ap.add_argument("--gan", default="stylegan")
    ap.add_argument("--model", default="church")
    ap.add_argument("--request", default="multikey_markandbottom")
    ap.add_argument("--requestdir", default="notebooks/masks")
    ap.add_argument("--sample_size", type=int, default=1000)
    ap.add_argument("--layer", type=int, default=6)
    ap.add_argument("--rank", type=int, default=1)
    ap.add_argument("--drank", type=int, default=1)
    ap.add_argument("--niters", type=int, default=2001)
    ap.add_argument("--piters", type=int, default=10)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--nreps", type=int, default=2)
    ap.add_argument("--erasemethod", default="ours",
                    choices=["ours", "gandissect", "none"])
    args = ap.parse_args()
    subdir = (f"erase-{args.gan}-{args.model}-{args.request}-{args.layer}"
              f"-{args.rank}-{args.niters}-{args.lr}-{args.erasemethod}"
              f"-{args.drank}"
              + (f"-{args.nreps}" if args.erasemethod == "ours" else ""))
    outdir = reserve_dir(os.path.join(args.outdir, subdir))
    from ..models.zoo import load_seq_stylegan
    model, params_cov = load_seq_stylegan(args.model, truncation=1.0)
    model05, params = load_seq_stylegan(args.model, truncation=0.5)
    reqfn = os.path.join(args.requestdir, args.gan, args.model,
                         f"{args.request}.json")
    with open(reqfn) as f:
        request = json.load(f)
    erase_watermark(model05, params, params_cov, request, args.layer,
                    outdir, rank=args.rank, drank=args.drank,
                    niters=args.niters, piters=args.piters, lr=args.lr,
                    nreps=args.nreps, erasemethod=args.erasemethod,
                    sample_size=args.sample_size)
    mark_job_done(outdir)


if __name__ == "__main__":  # pragma: no cover
    main()
