"""VGG16 tap parity vs raw-torch golden (LPIPS/NBB feature stack) and the
all-weights 'overfit' baseline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rewriting_tpu.metrics.lpips import params_from_torch, vgg16_taps
from rewriting_tpu.models import ProgressiveGenerator
from rewriting_tpu.rewrite import ProgressiveGanRewriter
from rewriting_tpu.utils.renormalize import mask_to_url
from rewriting_tpu.utils.zdataset import z_dataset_for_model
from conftest import blob


def test_vgg16_tap_parity(goldens):
    g = goldens("vgg16_taps")
    sd = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
    params = params_from_torch(sd)
    x = np.transpose(g["x"], (0, 2, 3, 1))
    taps = vgg16_taps(params, jnp.asarray(x))
    names = ["relu1_2", "relu2_2", "relu3_3", "relu4_3", "relu5_3"]
    for tap, name in zip(taps, names):
        want = np.transpose(g[f"tap.{name}"], (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(tap), want, atol=1e-4,
                                   rtol=1e-3, err_msg=name)




@pytest.mark.slow
def test_apply_overfit(goldens):
    """The all-weights 'overfit' baseline optimizes every generator param
    against the pasted RGB target (reference ganrewrite.py:300-331), with
    an optional perceptual term."""
    model = ProgressiveGenerator(sizes=[16, 16, 8, 8])
    params = model.init_params(jax.random.PRNGKey(3))
    zds = z_dataset_for_model(model, 10)
    gw = ProgressiveGanRewriter(model, params, zds, layernum=3,
                                stats_batch_size=5)
    xh, xw = gw.x_shape[1:3]
    req = {"object": [0, mask_to_url(blob(xh, xw, 4, 4, 3))],
           "paste": [1, mask_to_url(blob(xh, xw, 10, 10, 3))]}
    w0 = jax.tree_util.tree_map(np.asarray, gw.params)
    gw.apply_overfit(req, niter=8, lr=0.01)
    # every layer's weights moved (all-params optimization)
    moved = 0
    for k in w0:
        for p in w0[k]:
            if np.abs(np.asarray(gw.params[k][p]) - w0[k][p]).max() > 0:
                moved += 1
    assert moved >= len(w0)  # at least one param per stage group moved
    gw.revert()
    # with a perceptual feature term
    g = goldens("vgg16_taps")
    sd = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
    vgg_params = params_from_torch(sd)

    def feats(img):
        return vgg16_taps(vgg_params, img)[2]  # relu3_3 features

    gw.apply_overfit(req, niter=4, lr=0.01, feature_loss_fn=feats)
    assert np.isfinite(np.asarray(gw.target_weight())).all()
    gw.revert()
