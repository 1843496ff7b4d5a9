"""End-to-end rewriting engine tests on tiny models: the low-rank constraint
is verified algebraically (the weight delta must lie in span(D) along the
input-channel axis), the solve must reduce loss, and edits must change
rendered output while reverting restores it."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rewriting_tpu.models import ProgressiveGenerator, SeqStyleGAN2
from rewriting_tpu.rewrite import (ProgressiveGanRewriter,
                                   SeqStyleGanRewriter, projected_conv,
                                   zca_from_cov)
from rewriting_tpu.rewrite.solve import solve_spd
from rewriting_tpu.utils.renormalize import mask_to_url, mask_from_url
from rewriting_tpu.utils.zdataset import z_dataset_for_model
from conftest import blob as blob_mask




@pytest.fixture(scope="module")
def pg_rewriter():
    model = ProgressiveGenerator(sizes=[16, 16, 8, 8])
    params = model.init_params(jax.random.PRNGKey(3))
    zds = z_dataset_for_model(model, 30)
    return ProgressiveGanRewriter(model, params, zds, layernum=3,
                                  stats_batch_size=10)


def test_construction_shapes(pg_rewriter):
    gw = pg_rewriter
    assert gw.k_shape[0] == 1 and gw.v_shape[0] == 1
    assert gw.x_shape[-1] == 3
    C = gw.k_shape[-1]
    assert gw.c_matrix.shape == (C, C)
    # split covers the full pipeline
    names = (gw.context_pipe.stage_names() + gw.target_pipe.stage_names()
             + gw.rendering_pipe.stage_names())
    assert names == gw.model.pipeline.stage_names()


def test_zca_and_solve_numerics(pg_rewriter):
    gw = pg_rewriter
    C = np.asarray(gw.c_matrix, np.float64)
    zca = np.asarray(gw.zca_matrix, np.float64)
    # zca @ C @ zca ≈ I on the well-conditioned subspace
    approx_i = zca @ C @ zca
    evals = np.linalg.eigvalsh(C)
    if evals.min() > 1e-6 * evals.max():
        np.testing.assert_allclose(approx_i, np.eye(len(C)), atol=1e-2)
    k = np.random.RandomState(0).randn(len(C)).astype(np.float32)
    x = np.asarray(solve_spd(gw.c_matrix, k))
    np.testing.assert_allclose(C @ x, k, atol=1e-3)


def test_multi_key_orthonormal(pg_rewriter):
    gw = pg_rewriter
    h, w = gw.k_shape[1:3]
    mask = mask_to_url(blob_mask(h, w, h // 2, w // 2, max(1, h // 3)))
    for method in ["zca", "gandissect", "svd", "mean"]:
        rank = 1 if method == "mean" else 2
        d = np.asarray(gw.multi_key_from_selection([(0, mask), (1, mask)],
                                                   rank=rank,
                                                   key_method=method))
        assert d.shape == (rank, gw.k_shape[-1])
        np.testing.assert_allclose(d @ d.T, np.eye(rank), atol=1e-4)


def test_apply_edit_low_rank_and_loss(pg_rewriter):
    gw = pg_rewriter
    gw.revert()
    w0 = np.asarray(gw.target_weight())
    vh, vw = gw.v_shape[1:3]
    request = {
        "object": [2, mask_to_url(blob_mask(vh, vw, vh // 3, vw // 3, 2))],
        "paste": [5, mask_to_url(blob_mask(vh, vw, 2 * vh // 3,
                                           2 * vw // 3, 2))],
        "key": [[5, mask_to_url(blob_mask(vh, vw, 2 * vh // 3,
                                          2 * vw // 3, 3))]],
    }
    losses = []
    before = np.asarray(gw.sample_image_from_latent(gw.get_z(5)))
    gw.apply_edit(request, rank=1, niter=61, piter=10, lr=0.05,
                  update_callback=lambda it, loss: losses.append(
                      float(loss)))
    w1 = np.asarray(gw.target_weight())
    delta = jnp.asarray(w1 - w0)
    # the solve must make progress
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])
    # the weight update must lie in span(D) along the input axis:
    # projecting the delta onto the context directions must reproduce it
    d = gw.multi_key_from_selection(request["key"], rank=1)
    proj = np.asarray(projected_conv(delta, d))
    residual = np.abs(np.asarray(delta) - proj).max()
    assert residual < 1e-5, residual
    # rendering changed, and revert restores it
    after = np.asarray(gw.sample_image_from_latent(gw.get_z(5)))
    assert np.abs(after - before).max() > 1e-4
    gw.revert()
    restored = np.asarray(gw.sample_image_from_latent(gw.get_z(5)))
    np.testing.assert_array_equal(restored, before)


def test_zero_erase(pg_rewriter):
    gw = pg_rewriter
    gw.revert()
    h, w = gw.k_shape[1:3]
    mask = mask_to_url(blob_mask(h, w, h // 2, w // 2, max(1, h // 3)))
    d = gw.multi_key_from_selection([(0, mask)], rank=1)
    w0 = gw.target_weight()
    gw.zero(d)
    w1 = gw.target_weight()
    # component along d is now zero
    np.testing.assert_allclose(np.asarray(projected_conv(w1, d)), 0.0,
                               atol=1e-5)
    # orthogonal component unchanged
    ortho0 = np.asarray(w0 - projected_conv(w0, d))
    ortho1 = np.asarray(w1 - projected_conv(w1, d))
    np.testing.assert_allclose(ortho0, ortho1, atol=1e-6)
    gw.revert()


def test_apply_erase_runs(pg_rewriter):
    gw = pg_rewriter
    gw.revert()
    h, w = gw.k_shape[1:3]
    request = {"paste": [1, mask_to_url(blob_mask(h, w, h // 2, w // 2,
                                                  max(1, h // 3)))]}
    gw.apply_erase(request, rank=1, drank=3, niter=11, piter=5)
    assert np.isfinite(np.asarray(gw.target_weight())).all()
    gw.revert()


def test_linear_insert_matches_constraint(pg_rewriter):
    gw = pg_rewriter
    gw.revert()
    gw.use_linear_insert = True
    try:
        vh, vw = gw.v_shape[1:3]
        request = {
            "object": [0, mask_to_url(blob_mask(vh, vw, vh // 2, vw // 2,
                                                2))],
            "paste": [1, mask_to_url(blob_mask(vh, vw, vh // 2, vw // 2,
                                               2))],
        }
        w0 = np.asarray(gw.target_weight())
        gw.apply_edit(request, rank=1, niter=31)
        delta = jnp.asarray(np.asarray(gw.target_weight()) - w0)
        d = gw.multi_key_from_selection(request["key"]
                                        if "key" in request
                                        else [request["paste"]], rank=1)
        proj = np.asarray(projected_conv(delta, d))
        # linear param: delta = Lambda D exactly
        np.testing.assert_allclose(np.asarray(delta), proj, atol=1e-5)
    finally:
        gw.use_linear_insert = False
        gw.revert()


@pytest.mark.slow
def test_stylegan_rewriter_smoke(goldens):
    g = goldens("stylegan2_tiny")
    sd = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
    from rewriting_tpu.models.stylegan2 import params_from_state_dict
    model = SeqStyleGAN2(size=16, style_dim=64, n_mlp=2)
    params = params_from_state_dict(model, sd)
    zds = z_dataset_for_model(model, 20)
    gw = SeqStyleGanRewriter(model, params, zds, layernum=3,
                             stats_batch_size=10)
    assert gw.target_weight().ndim == 5
    vh, vw = gw.v_shape[1:3]
    request = {
        "object": [0, mask_to_url(blob_mask(vh, vw, vh // 3, vw // 3, 2))],
        "paste": [1, mask_to_url(blob_mask(vh, vw, 2 * vh // 3,
                                           2 * vw // 3, 2))],
    }
    w0 = np.asarray(gw.target_weight())
    losses = []
    gw.apply_edit(request, rank=1, niter=41, piter=10,
                  update_callback=lambda it, l: losses.append(float(l)))
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    delta = jnp.asarray(np.asarray(gw.target_weight()) - w0)
    d = gw.multi_key_from_selection([request["paste"]], rank=1)
    np.testing.assert_allclose(np.asarray(delta),
                               np.asarray(projected_conv(delta, d)),
                               atol=1e-5)


def test_mask_url_roundtrip():
    mask = blob_mask(16, 16, 8, 8, 4)
    url = mask_to_url(mask)
    assert url.startswith("data:image/png;base64,")
    back = mask_from_url(url)
    np.testing.assert_allclose(back, mask, atol=0.02)
    resized = mask_from_url(url, size=(8, 8))
    assert resized.shape == (8, 8)
