"""Dissection: IoU statistics from conditional reducers + the quickdissect
pipeline on a tiny model with a toy segmenter."""

import json
import os

import jax
import numpy as np

from rewriting_tpu.dissect import DissectVis, dissect
from rewriting_tpu.models import ProgressiveGenerator
from rewriting_tpu.stats import tally
from rewriting_tpu.stats.running import RunningConditionalMean
from rewriting_tpu.stats.running import RunningConditionalQuantile


def test_iou_from_conditional_indicator_mean_synthetic():
    """Unit 0 fires exactly on condition 1 (IoU 1), unit 1 never fires."""
    rng = np.random.RandomState(0)
    cmv = RunningConditionalMean()
    n = 1000
    cond = rng.randint(1, 3, size=n)  # conditions 1 and 2, equal-ish
    ind = np.zeros((n, 2), np.float32)
    ind[:, 0] = (cond == 1)
    cmv.add(0, ind)
    cmv.add(1, ind[cond == 1])
    cmv.add(2, ind[cond == 2])
    iou = np.asarray(tally.iou_from_conditional_indicator_mean(cmv))
    assert iou.shape == (3, 2)
    np.testing.assert_allclose(iou[1, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(iou[2, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(iou[:, 1], 0.0, atol=1e-5)


def test_iou_from_conditional_quantile_synthetic():
    """Condition 1 contains the top-5% values of unit 0 -> high IoU at the
    0.95 cutoff."""
    rng = np.random.RandomState(1)
    n = 20000
    vals = rng.rand(n, 2).astype(np.float32)
    cond1 = vals[:, 0] > 0.95
    cq = RunningConditionalQuantile(resolution=1024)
    for lo in range(0, n, 2048):
        sel = slice(lo, lo + 2048)
        cq.add(0, vals[sel])
        if cond1[sel].any():
            cq.add(1, vals[sel][cond1[sel]])
    iou = np.asarray(tally.iou_from_conditional_quantile(cq, cutoff=0.95))
    assert iou.shape[0] == 2
    assert iou[0, 1] > 0.7, iou[:, 1]   # unit 0 matches condition 1
    assert iou[1, 1] < 0.3, iou[:, 1]   # unit 1 doesn't
    mi = np.asarray(tally.mi_from_conditional_quantile(cq, cutoff=0.95))
    assert mi[0, 1] > mi[1, 1]


class ToySegmenter:
    """Labels pixels by red-channel sign: class 1 where r > 0 else 2."""

    def segment_batch(self, imgs, downsample=1):
        imgs = np.asarray(imgs)
        seg = np.where(imgs[..., 0] > 0, 1, 2).astype(np.int64)
        return seg[:, None, :, :]


def test_dissect_pipeline(tmp_path):
    model = ProgressiveGenerator(sizes=[8, 8, 8])
    params = model.init_params(jax.random.PRNGKey(0))
    outdir = str(tmp_path / "church" / "layer2" / "toy" / "40")
    records = dissect(model, params, "layer2", ToySegmenter(),
                      ["-", "red", "notred"], outdir, sample_size=40,
                      batch_size=10, upsample_to=(8, 8),
                      save_unit_images=True, topk_k=3)
    assert len(records["units"]) == 8
    assert os.path.exists(os.path.join(outdir, "iou.npy"))
    iou = np.load(os.path.join(outdir, "iou.npy"))
    assert iou.shape[0] == 8 and np.isfinite(iou).all()
    assert 0.0 <= iou.max() <= 1.0
    assert os.path.exists(os.path.join(outdir, "imgs/unit_0.png"))
    # reader
    vis = DissectVis(outdir=str(tmp_path), model="church",
                     layers=["layer2"], seg="toy", sample_size=40)
    assert vis.label("layer2", 0) in ["-", "red", "notred"]
    top = vis.top_units("layer2", "red", k=3)
    assert len(top) == 3
