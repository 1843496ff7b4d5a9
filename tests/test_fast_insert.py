"""Fast low-rank-decomposed linear insert must match the direct
linear_insert parameterization exactly (same Λ·D math, same Adam
trajectory)."""

import numpy as np
import jax
import pytest

from rewriting_tpu.models import ProgressiveGenerator, SeqStyleGAN2
from rewriting_tpu.rewrite import (ProgressiveGanRewriter,
                                   SeqStyleGanRewriter)
from rewriting_tpu.utils.renormalize import mask_to_url
from rewriting_tpu.utils.zdataset import z_dataset_for_model
from conftest import blob




def _edit_goals(gw):
    vh, vw = gw.v_shape[1:3]
    req = {"object": [0, mask_to_url(blob(vh, vw, vh // 3, vw // 3, 2))],
           "paste": [1, mask_to_url(blob(vh, vw, 2 * vh // 3,
                                         2 * vw // 3, 2))]}
    obj_acts, _, obj_area, _ = gw.object_from_selection(*req["object"])
    goal_in, goal_out, _, _ = gw.paste_from_selection(
        req["paste"][0], req["paste"][1], obj_acts, obj_area)
    d = gw.multi_key_from_selection([req["paste"]], rank=1)
    return goal_in, goal_out, d


def _compare(gw, atol):
    """The two parameterizations are the same math, but Adam amplifies
    fp-noise sign flips on loss-insensitive Λ coordinates into full ±lr
    steps, so exact weight equality is not stable.  Compare what matters:
    per-iteration losses (identical trajectories), the low-rank
    constraint, and the solved window outputs."""
    from rewriting_tpu.rewrite import projected_conv
    import jax.numpy as jnp
    goal_in, goal_out, d = _edit_goals(gw)
    w0 = np.asarray(gw.target_weight())
    ref_losses, fast_losses = [], []
    gw.linear_insert(goal_in, goal_out, d, niter=25, lr=0.05,
                     update_callback=lambda i, l: ref_losses.append(
                         float(l)))
    w_ref = np.asarray(gw.target_weight())
    v_ref = np.asarray(gw.target_acts(gw._target(gw.params, goal_in)))
    gw.revert()
    gw.fast_linear_insert(goal_in, goal_out, d, niter=25, lr=0.05,
                          update_callback=lambda i, l: fast_losses.append(
                              float(l)))
    w_fast = np.asarray(gw.target_weight())
    v_fast = np.asarray(gw.target_acts(gw._target(gw.params, goal_in)))
    gw.revert()
    assert np.abs(w_ref - w0).max() > 1e-5, "solve did nothing"
    np.testing.assert_allclose(fast_losses, ref_losses, atol=atol)
    delta = jnp.asarray(w_fast - w0)
    np.testing.assert_allclose(np.asarray(delta),
                               np.asarray(projected_conv(delta, d)),
                               atol=1e-5)
    # the problem is underdetermined: loss-insensitive coordinates may
    # settle differently, so compare goal attainment, not raw outputs
    goal = np.asarray(gw.target_acts(goal_out))
    l1_ref = np.abs(goal - v_ref).mean()
    l1_fast = np.abs(goal - v_fast).mean()
    np.testing.assert_allclose(l1_fast, l1_ref, atol=atol)


def test_fast_insert_proggan():
    model = ProgressiveGenerator(sizes=[16, 16, 8, 8])
    params = model.init_params(jax.random.PRNGKey(3))
    zds = z_dataset_for_model(model, 20)
    gw = ProgressiveGanRewriter(model, params, zds, layernum=3,
                                stats_batch_size=10)
    _compare(gw, atol=1e-4)


@pytest.mark.slow
def test_fast_insert_stylegan_nonup_and_up(goldens):
    g = goldens("stylegan2_tiny")
    sd = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
    from rewriting_tpu.models.stylegan2 import params_from_state_dict
    model = SeqStyleGAN2(size=16, style_dim=64, n_mlp=2)
    params = params_from_state_dict(model, sd)
    zds = z_dataset_for_model(model, 15)
    # layer4: non-upsampling window
    gw = SeqStyleGanRewriter(model, params, zds, layernum=4,
                             stats_batch_size=5)
    _compare(gw, atol=2e-4)
    # layer3: upsampling window (conv-transpose + blur in the tail)
    gw_up = SeqStyleGanRewriter(model, params, zds, layernum=3,
                                stats_batch_size=5)
    _compare(gw_up, atol=2e-4)


# ---------------------------------------------------------------------------
# The chunk-restructured projected-insert scan (prologue + statically-placed
# projections, rewrite/solve.py) must reproduce the reference trajectory —
# Adam step then project when (it % piter == 0) | (it == niter-1), reference
# ganrewrite.py:279-294 — bit-for-bit, including ragged niter/piter combos.
# ---------------------------------------------------------------------------

def _reference_insert_loop(window_fn, w0, goal_in, goal_out, direction,
                           niter, piter, lr, low_rank_insert=True,
                           low_rank_gradient=False):
    import jax.numpy as jnp
    import optax
    from rewriting_tpu.rewrite.solve import projected_conv
    ortho = w0 - projected_conv(w0, direction)
    opt = optax.adam(lr)
    state = opt.init(w0)
    w = w0
    losses = []

    def loss_fn(w):
        return jnp.mean(jnp.abs(goal_out - window_fn(w, goal_in)))

    for it in range(niter):
        loss, grad = jax.value_and_grad(loss_fn)(w)
        if low_rank_gradient:
            grad = projected_conv(grad, direction)
        updates, state = opt.update(grad, state, w)
        w = optax.apply_updates(w, updates)
        if low_rank_insert and (it % piter == 0 or it == niter - 1):
            w = ortho + projected_conv(w, direction)
        losses.append(float(loss))
    return w, np.array(losses)


@pytest.mark.parametrize("niter,piter", [(1, 10), (7, 3), (13, 5),
                                         (21, 10), (10, 4), (13, 50)])
def test_insert_scan_matches_reference_loop(niter, piter):
    import jax.numpy as jnp
    from jax import lax
    from rewriting_tpu.rewrite.solve import insert_solve
    from rewriting_tpu.ops.precision import get_precision
    rng = np.random.RandomState(0)
    w0 = jnp.asarray(rng.randn(8, 6, 3, 3), jnp.float32)
    x = jnp.asarray(rng.randn(2, 5, 5, 6), jnp.float32)
    goal = jnp.asarray(rng.randn(2, 5, 5, 8), jnp.float32)
    d = jnp.asarray(rng.randn(2, 6), jnp.float32)
    d, _ = np.linalg.qr(np.asarray(d).T)
    d = jnp.asarray(d.T)

    def window_fn(w, goal_in):
        return lax.conv_general_dilated(
            goal_in, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "OIHW", "NHWC"),
            precision=get_precision())

    for lri, lrg in [(True, False), (False, False), (True, True)]:
        w_ref, losses_ref = _reference_insert_loop(
            window_fn, w0, x, goal, d, niter, piter, 0.05,
            low_rank_insert=lri, low_rank_gradient=lrg)
        w_new, losses_new = insert_solve(
            window_fn, w0, x, goal, d, niter=niter, piter=piter, lr=0.05,
            low_rank_insert=lri, low_rank_gradient=lrg)
        np.testing.assert_allclose(np.asarray(losses_new), losses_ref,
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(w_new), np.asarray(w_ref),
                                   rtol=1e-5, atol=1e-6)


def test_insert_scan_niter_zero_noop():
    import jax.numpy as jnp
    from jax import lax
    from rewriting_tpu.rewrite.solve import insert_solve
    from rewriting_tpu.ops.precision import get_precision
    rng = np.random.RandomState(0)
    w0 = jnp.asarray(rng.randn(4, 3, 3, 3), jnp.float32)
    x = jnp.asarray(rng.randn(1, 5, 5, 3), jnp.float32)
    goal = jnp.asarray(rng.randn(1, 5, 5, 4), jnp.float32)
    d = jnp.asarray(rng.randn(1, 3), jnp.float32)

    def window_fn(w, goal_in):
        return lax.conv_general_dilated(
            goal_in, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "OIHW", "NHWC"),
            precision=get_precision())

    w, losses = insert_solve(window_fn, w0, x, goal, d, niter=0)
    np.testing.assert_array_equal(np.asarray(w), np.asarray(w0))
    assert np.asarray(losses).shape == (0,)
