"""Batched multi-edit server: N simultaneous vmapped solves, sharded over
the virtual device mesh, with live preview rendering."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rewriting_tpu.models import ProgressiveGenerator
from rewriting_tpu.parallel import make_mesh
from rewriting_tpu.rewrite import ProgressiveGanRewriter, projected_conv
from rewriting_tpu.rewrite.multi import (batch_apply_edits, build_goals,
                                         preview_edits)
from rewriting_tpu.utils.renormalize import mask_to_url
from rewriting_tpu.utils.zdataset import z_dataset_for_model
from conftest import blob




@pytest.fixture(scope="module")
def gw():
    model = ProgressiveGenerator(sizes=[16, 16, 8, 8])
    params = model.init_params(jax.random.PRNGKey(3))
    zds = z_dataset_for_model(model, 20)
    return ProgressiveGanRewriter(model, params, zds, layernum=3,
                                  stats_batch_size=10)


def _requests(gw, n):
    vh, vw = gw.v_shape[1:3]
    reqs = []
    for i in range(n):
        reqs.append({
            "object": [i, mask_to_url(blob(vh, vw, 2 + i % 3, 2, 2))],
            "paste": [i + 4, mask_to_url(blob(vh, vw, 5, 5 - i % 2, 2))],
        })
    return reqs


def test_batch_edits_match_sequential(gw):
    reqs = _requests(gw, 4)
    weights, losses = batch_apply_edits(gw, reqs, rank=1, niter=15,
                                        lr=0.05)
    assert len(weights) == 4 and np.isfinite(losses).all()
    w0 = np.asarray(gw.target_weight())
    # each batched solve equals its own sequential fast solve
    goals = build_goals(gw, reqs, rank=1)
    for i in (0, 3):
        goal_in, goal_out, d = goals[i]
        gw.fast_linear_insert(goal_in,
                              type(goal_in)(goal_in, fmap=goal_out),
                              d, niter=15, lr=0.05)
        w_seq = np.asarray(gw.target_weight())
        gw.revert()
        np.testing.assert_allclose(np.asarray(weights[i]), w_seq,
                                   atol=1e-4, err_msg=f"edit {i}")
        # low-rank constraint per edit
        delta = jnp.asarray(np.asarray(weights[i]) - w0)
        np.testing.assert_allclose(np.asarray(delta),
                                   np.asarray(projected_conv(delta, d)),
                                   atol=1e-5)
    # distinct requests give distinct edits
    assert np.abs(np.asarray(weights[0]) - np.asarray(weights[1])).max() \
        > 1e-6


def test_batch_edits_on_mesh(gw):
    mesh = make_mesh(4)
    reqs = _requests(gw, 4)
    weights, losses = batch_apply_edits(gw, reqs, rank=1, niter=6,
                                        lr=0.05, mesh=mesh)
    assert len(weights) == 4
    previews = preview_edits(gw, weights, gw.zds.zs[:2])
    assert previews.shape == (4, 2, 16, 16, 3)
    # previews differ across edits, and gw.params stayed pristine
    assert np.abs(previews[0] - previews[1]).max() > 1e-6
    np.testing.assert_array_equal(
        np.asarray(gw.target_weight()),
        np.asarray(gw.original_params[gw.firstlayer]["weight"]))


def test_batch_edits_generic_fallback_seqpre():
    """SeqPre windows have no fast low-rank decomposition (window starts at
    adain); batch_apply_edits must fall back to the vmapped generic linear
    solve instead of asserting, and match the sequential linear_insert."""
    from rewriting_tpu.models import SeqStyleGAN2
    from rewriting_tpu.rewrite import SeqPreStyleGanRewriter

    model = SeqStyleGAN2(size=16, style_dim=32, n_mlp=2)
    params = model.init_params(jax.random.PRNGKey(5))
    zds = z_dataset_for_model(model, 12)
    gw = SeqPreStyleGanRewriter(model, params, zds, layernum=4,
                                stats_batch_size=6)
    assert gw.fast_parts_cached() is None
    reqs = _requests(gw, 2)
    weights, losses = batch_apply_edits(gw, reqs, rank=1, niter=9, lr=0.05)
    assert len(weights) == 2 and np.isfinite(losses).all()
    # matches the sequential linear_insert on the same goals: vmap reorders
    # reductions and Adam amplifies fp noise, so compare the loss
    # trajectory endpoint + the Lambda*D constraint, not raw weights
    goals = build_goals(gw, reqs, rank=1)
    w0 = np.asarray(gw.target_weight())
    for i in range(2):
        goal_in, goal_out, d = goals[i]
        seq_losses = []
        gw.linear_insert(goal_in, type(goal_in)(goal_in, fmap=goal_out), d,
                         niter=9, lr=0.05,
                         update_callback=lambda it, l: seq_losses.append(
                             float(l)))
        gw.revert()
        np.testing.assert_allclose(losses[i], seq_losses[-1], atol=1e-4)
        delta = jnp.asarray(np.asarray(weights[i]) - w0)
        np.testing.assert_allclose(np.asarray(delta),
                                   np.asarray(projected_conv(delta, d)),
                                   atol=1e-5)
    assert np.abs(np.asarray(weights[0])
                  - np.asarray(weights[1])).max() > 1e-7
