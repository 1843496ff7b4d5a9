"""Integration with the published edit-request JSONs (vendored data corpus
at notebooks/masks/, see its README): decode the real painted mask data
URLs and run the erase flow with them."""

import json
import os

import numpy as np
import pytest

REF_MASKS = os.path.join(os.path.dirname(__file__), "..", "notebooks",
                         "masks")




def test_decode_published_masks():
    from rewriting_tpu.utils.renormalize import mask_from_url
    path = os.path.join(REF_MASKS, "stylegan/church",
                        "multikey_markandbottom.json")
    with open(path) as f:
        req = json.load(f)
    assert set(req) >= {"key", "paste"}
    for imgnum, url in [req["paste"]] + req["key"][:3]:
        assert isinstance(imgnum, int)
        m = mask_from_url(url)
        assert m.ndim == 2 and 0.0 <= m.min() and m.max() <= 1.0
        assert m.sum() > 0, "painted mask decodes non-empty"
        small = mask_from_url(url, size=(8, 8))
        assert small.shape == (8, 8)


@pytest.mark.slow
def test_apply_erase_with_published_request(goldens):
    import jax
    from rewriting_tpu.models import SeqStyleGAN2
    from rewriting_tpu.models.stylegan2 import params_from_state_dict
    from rewriting_tpu.rewrite import SeqStyleGanRewriter
    from rewriting_tpu.utils.zdataset import z_dataset_for_model
    g = goldens("stylegan2_tiny")
    sd = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
    model = SeqStyleGAN2(size=16, style_dim=64, n_mlp=2)
    params = params_from_state_dict(model, sd)
    # published masks reference imgnums up to ~1000
    zds = z_dataset_for_model(model, 1000)
    gw = SeqStyleGanRewriter(model, params, zds, layernum=3,
                             stats_batch_size=50)
    with open(os.path.join(REF_MASKS, "stylegan/church",
                           "multikey_markandbottom.json")) as f:
        req = json.load(f)
    w0 = np.asarray(gw.target_weight())
    gw.apply_erase(req, rank=1, drank=4, niter=5)
    w1 = np.asarray(gw.target_weight())
    assert np.isfinite(w1).all()
    assert np.abs(w1 - w0).max() > 0  # the real request drove an edit
