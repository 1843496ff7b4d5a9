"""quickdissect: mini-GANdissect — label generator units by IoU against
segmentation classes.

Behavioral rebuild of reference utils/quickdissect.py: retain a layer's
activations over a z sample, sketch per-unit quantiles, threshold at the
0.99 level, tally per-segmentation-class indicator means, compute all-pairs
IoU, and write labels.json / iou.npy / top-activating unit image strips.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .core.instrument import InstrumentedPipeline
from .stats import tally
from .utils import imgsave, imgviz, pbar, pidfile
from .utils.upsample import upsampler
from .utils.zdataset import z_dataset_for_model


def dissect(model, params, layer: str, segmodel, seglabels, outdir: str,
            sample_size: int = 1000, batch_size: int = 10,
            upsample_to=(64, 64), cutoff: float = 0.99,
            save_unit_images: bool = True, topk_k: int = 5):
    """Run the dissection; writes rq.npz / cmv.npz / iou.npy / labels.json
    under outdir and returns the unit records dict
    (reference quickdissect.py:10-92)."""
    os.makedirs(outdir, exist_ok=True)
    inst = InstrumentedPipeline(model, params)
    inst.retain_layer(layer)
    zds = z_dataset_for_model(model, size=sample_size, seed=1)

    _ = inst(zds.zs[:1])
    sample_act = np.asarray(inst.retained_layer(layer)["fmap"])
    upfn = upsampler(upsample_to, sample_act.shape[1:3])

    def flat_acts(zbatch):
        _ = inst(zbatch)
        acts = upfn(np.asarray(inst.retained_layer(layer)["fmap"]))
        return acts.reshape(-1, acts.shape[-1])

    rq = tally.tally_quantile(flat_acts, zds, batch_size=batch_size,
                              cachefile=os.path.join(outdir, "rq.npz"))
    level = np.asarray(rq.quantiles([cutoff]))[:, 0]  # (units,)

    def compute_cond_indicator(zbatch):
        imgs = inst(zbatch)
        seg = segmodel.segment_batch(np.asarray(imgs))
        acts = upfn(np.asarray(inst.retained_layer(layer)["fmap"]))
        # align segmentation to the upsampled activation grid
        iacts = (acts > level[None, None, None, :]).astype(np.float32)
        return tally.conditional_samples(iacts, seg)

    cmv = tally.tally_conditional_mean(
        compute_cond_indicator, zds, batch_size=batch_size,
        cachefile=os.path.join(outdir, "cmv.npz"))

    iou_table = np.asarray(
        tally.iou_from_conditional_indicator_mean(cmv)).T  # (units, conds)
    np.save(os.path.join(outdir, "iou.npy"), iou_table)

    best_cond = iou_table.argmax(axis=1)
    best_iou = iou_table.max(axis=1)
    unit_records = {"units": [
        {"unit": int(u), "iou": float(best_iou[u]),
         "label": seglabels[int(best_cond[u])]
         if int(best_cond[u]) < len(seglabels) else str(best_cond[u]),
         "cls": int(best_cond[u])}
        for u in range(len(best_iou))]}
    with open(os.path.join(outdir, "labels.json"), "w") as f:
        json.dump(unit_records, f)
    with open(os.path.join(outdir, "seglabels.json"), "w") as f:
        json.dump(list(seglabels), f)

    if save_unit_images:
        def compute_image_max(zbatch):
            _ = inst(zbatch)
            acts = np.asarray(inst.retained_layer(layer)["fmap"])
            return acts.max(axis=(1, 2))

        topk = tally.tally_topk(
            compute_image_max, zds, k=topk_k, batch_size=batch_size,
            cachefile=os.path.join(outdir, "topk.npz"))
        vals, idx = (np.asarray(v) for v in topk.result())
        iv = imgviz.ImageVisualizer(128, quantiles=rq)
        # render each needed sample ONCE (top-k lists share images)
        needed = sorted({int(i) for row in idx[:, :topk_k] for i in row})
        cache = {}
        for lo in pbar.pbar(range(0, len(needed), batch_size),
                            desc="render topk"):
            chunk = needed[lo:lo + batch_size]
            imgs = np.asarray(inst(zds.zs[np.asarray(chunk)]))
            fmaps = np.asarray(inst.retained_layer(layer)["fmap"])
            for j, i in enumerate(chunk):
                cache[i] = (imgs[j], fmaps[j])
        rows = []
        for u in pbar.pbar(range(sample_act.shape[-1]),
                           desc="unit images"):
            cells = []
            for i in idx[u][:topk_k]:
                img, fmap = cache[int(i)]
                # dataset-level per-unit threshold (the rq sketch), not
                # the single image's own quantile
                cells.append(iv.masked_image(
                    img, activations=fmap[:, :, u],
                    level=float(level[u])))
            rows.append(iv.image_row(cells))
        imgsave.save_image_set(rows, os.path.join(outdir,
                                                  "imgs/unit_%d.png"))
    return unit_records


class DissectVis:
    """Reader for dissection outputs (reference quickdissect.py:95-143)."""

    def __init__(self, outdir="results", model="church", layers=None,
                 seg="netpqc", sample_size=1000):
        layers = layers or ["layer%d" % i for i in range(1, 15)]
        labels, iou, images = {}, {}, {}
        dirname = None
        for k in layers:
            dirname = os.path.join(outdir, model, k, seg, str(sample_size))
            with open(os.path.join(dirname, "labels.json")) as f:
                labels[k] = json.load(f)["units"]
            iou[k] = np.load(os.path.join(dirname, "iou.npy"))
            images[k] = [None] * len(iou[k])
        with open(os.path.join(dirname, "seglabels.json")) as f:
            self.seglabels = json.load(f)
        self.labels = labels
        self.ioutable = iou
        self.images = images
        self.basedir = os.path.join(outdir, model)
        self.setting = os.path.join(seg, str(sample_size))

    def label(self, layer, unit):
        return self.labels[layer][unit]["label"]

    def iou(self, layer, unit):
        return self.labels[layer][unit]["iou"]

    def top_units(self, layer, seglabel, k=20):
        col = self.seglabels.index(seglabel)
        return self.ioutable[layer][:, col].argsort()[::-1][:k].tolist()

    def image(self, layer, unit):
        import PIL.Image
        result = self.images[layer][unit]
        if result is None:
            result = PIL.Image.open(os.path.join(
                self.basedir, layer, self.setting,
                "imgs/unit_%d.png" % unit))
            result.load()
            self.images[layer][unit] = result
        return result


def main():  # pragma: no cover - CLI (reference quickdissect.py:10-33)
    import argparse
    ap = argparse.ArgumentParser(description="quickdissect")
    ap.add_argument("--outdir", default="results")
    ap.add_argument("--model", default="church")
    ap.add_argument("--layer", default="layer4")
    ap.add_argument("--seg", default="netpqc")
    ap.add_argument("--sample_size", type=int, default=1000)
    args = ap.parse_args()
    outdir = os.path.join(args.outdir, args.model, args.layer, args.seg,
                          str(args.sample_size))
    pidfile.reserve_dir(outdir)
    from .models.zoo import load_proggan
    from .segment import load_segmenter
    model, params = load_proggan(args.model)
    segmodel, seglabels = load_segmenter(args.seg)
    dissect(model, params, args.layer, segmodel, seglabels, outdir,
            sample_size=args.sample_size)
    pidfile.mark_job_done(outdir)


if __name__ == "__main__":  # pragma: no cover
    main()
