"""§5.2 watermark-removal workflow (reference make_watermark_images.py):
erase a rule with 'ours' (repeated apply_erase) vs 'gandissect' (zero the
key direction) vs 'none', with the covariance populated by a separate
truncation-1.0 model — exercised end to end on a tiny StyleGAN2."""

import os

import jax
import numpy as np
import pytest

from rewriting_tpu.metrics.watermark import erase_watermark
from rewriting_tpu.models import SeqStyleGAN2
from rewriting_tpu.utils.renormalize import mask_to_url
from conftest import blob


@pytest.mark.slow
def test_erase_watermark_methods(tmp_path):
    model = SeqStyleGAN2(size=16, style_dim=32, n_mlp=2, truncation=1.0)
    params = model.init_params(jax.random.PRNGKey(0))
    # 'sampling' params: same weights, stand-in for the truncation-0.5
    # model (truncation only matters with a real latent_avg)
    request = None
    gw0 = None
    before = None
    results = {}
    for method in ("ours", "gandissect", "none"):
        outdir = str(tmp_path / method)
        if request is None:
            # build the request against the first rewriter's geometry
            from rewriting_tpu.rewrite import SeqStyleGanRewriter
            from rewriting_tpu.utils.zdataset import z_dataset_for_model
            zds = z_dataset_for_model(model, 12)
            gw0 = SeqStyleGanRewriter(model, params, zds, 4,
                                      stats_batch_size=6)
            vh, vw = gw0.v_shape[1:3]
            mask = mask_to_url(blob(vh, vw, 2, 2, 2))
            request = {"paste": [1, mask], "key": [[0, mask], [2, mask]]}
            before = np.asarray(gw0.render_image(1), np.float32)
        gw = erase_watermark(model, params, params, request, layer=4,
                             outdir=outdir, rank=1, drank=2, niters=11,
                             nreps=2, erasemethod=method, sample_size=12,
                             save_images=(method == "ours"))
        results[method] = np.asarray(gw.render_image(1), np.float32)
        # the shared covariance cache was populated
        assert os.path.isfile(os.path.join(outdir, "r2m.npz"))
    # 'ours' and 'gandissect' both modify the model; 'none' does not
    assert np.abs(results["ours"] - before).max() > 1.0
    assert np.abs(results["gandissect"] - before).max() > 1.0
    np.testing.assert_array_equal(results["none"], before)
    # the erased models differ from each other (different mechanisms)
    assert np.abs(results["ours"] - results["gandissect"]).max() > 1.0
    # image dump happened for the 'ours' run
    dumped = os.listdir(os.path.join(tmp_path, "ours", "images"))
    assert "+lightbox.html" in dumped
    assert sum(f.endswith(".png") for f in dumped) >= 12
