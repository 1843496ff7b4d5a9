"""End-to-end §5.1-style pipeline on a tiny model with a toy segmenter:
sample clean -> apply edit -> sample edited -> segment both -> compute the
effectiveness and damage metrics, exercising the actual metric drivers."""

import os

import jax
import numpy as np
import pytest

from rewriting_tpu.metrics import distances, seg_correct_mod, seg_stats
from rewriting_tpu.metrics.sample import sample_clean
from rewriting_tpu.models import ProgressiveGenerator
from rewriting_tpu.rewrite import ProgressiveGanRewriter
from rewriting_tpu.utils.renormalize import mask_to_url
from rewriting_tpu.utils.zdataset import z_dataset_for_model
from conftest import blob




class ToySegmenter:
    """3-channel multilabel: brightness-class map in every channel."""

    def segment_batch(self, imgs, downsample=1):
        imgs = np.asarray(imgs)
        lum = imgs.mean(-1)
        seg = np.where(lum > 0.2, 1708, np.where(lum < -0.2, 5, 0))
        return np.repeat(seg[:, None, :, :], 3, axis=1).astype(np.int64)


@pytest.mark.slow
def test_full_metric_pipeline(tmp_path):
    n = 8
    model = ProgressiveGenerator(sizes=[16, 16, 8, 8])
    params = model.init_params(jax.random.PRNGKey(3))
    zds = z_dataset_for_model(model, 20)

    clean_dir = str(tmp_path / "church_clean")
    edited_dir = str(tmp_path / "dome2x")
    sample_clean(model, params, clean_dir, n=n, batch_size=4)
    assert os.path.exists(os.path.join(clean_dir, f"{n - 1}.png"))

    # edit then sample the edited model through the same driver
    gw = ProgressiveGanRewriter(model, params, zds, layernum=3,
                                stats_batch_size=10)
    vh, vw = gw.v_shape[1:3]
    request = {"object": [0, mask_to_url(blob(vh, vw, 2, 2, 2))],
               "paste": [1, mask_to_url(blob(vh, vw, 5, 5, 2))]}
    gw.apply_edit(request, rank=1, niter=31)
    sample_clean(model, gw.params, edited_dir, n=n, batch_size=4)

    # segment both image sets with the driver
    seg = ToySegmenter()
    seg_clean = str(tmp_path / "seg" / "church_clean")
    seg_edited = str(tmp_path / "seg" / "dome2x")
    seg_stats.process(seg, clean_dir, seg_clean, n=n, batch_size=4)
    seg_stats.process(seg, edited_dir, seg_edited, n=n, batch_size=4)
    assert os.path.exists(os.path.join(seg_clean, f"{n - 1}.npz"))

    # effectiveness: src pixels remapped to tgt label
    total, count = seg_correct_mod.compute_dl(
        seg_clean, seg_edited, range(n), tgt=[5], tgtc=0, src=[1708],
        srcc=2)
    assert count >= 0 and total <= count

    # damage: masked L1 outside the src region
    d_total, d_count = distances.compute_dl(
        clean_dir, seg_clean, edited_dir, range(n), src=[1708], srcc=2,
        metric="l1", batch_size=4)
    assert d_count > 0 and np.isfinite(d_total)
    # the edit changed something somewhere
    assert d_total > 0 or total > 0
