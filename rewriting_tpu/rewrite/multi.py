"""Batched multi-rule editing: solve N independent edit requests
simultaneously, vmapped over the edit axis and sharded across a device
mesh — the 'batched editing server' configuration (new capability over
the reference, which solves edits one at a time; BASELINE.json config #5).

Design: goals are built with tight_paste=False so every edit shares the
window's full feature-map shape (uniform shapes for vmap); the solver is
the fast low-rank-decomposed linear insert, so N simultaneous solves cost
roughly one window forward per iteration *total* per device."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import DataBag
from . import solve
from ..ops import precision


def build_goals(gw, requests: Sequence[dict], rank: int = 1):
    """Per-request (goal_in bag, goal_out fmap, direction) with uniform
    shapes (tight_paste disabled for the batch)."""
    old_tp = gw.tight_paste
    gw.tight_paste = False
    try:
        goals = []
        for request in requests:
            o_imgnum, o_mask = request["object"]
            p_imgnum, p_mask = request["paste"]
            keys = request.get("key", [(p_imgnum, p_mask)])
            obj_acts, _, obj_area, _ = gw.object_from_selection(o_imgnum,
                                                                o_mask)
            goal_in, goal_out, _, _ = gw.paste_from_selection(
                p_imgnum, p_mask, obj_acts, obj_area)
            direction = gw.multi_key_from_selection(keys, rank=rank)
            goals.append((goal_in, gw.target_acts(goal_out), direction))
    finally:
        gw.tight_paste = old_tp
    return goals


def batch_apply_edits(gw, requests: Sequence[dict], rank: int = 1,
                      niter: int = 2001, lr: float = 0.05,
                      mesh=None, axis: str = "data") -> List[jnp.ndarray]:
    """Solve all requests at once; returns one edited target weight per
    request (gw.params is left untouched — callers pick which edit to
    commit via gw.set_target_weight or keep all for serving)."""
    parts = gw.fast_parts_cached()
    goals = build_goals(gw, requests, rank=rank)

    # stack goal bags (uniform shapes; shared keys like noise buffers are
    # identical across edits -> broadcast instead of stacked)
    bag0 = goals[0][0]
    stacked_bag, in_axes_bag = {}, {}
    for key in bag0:
        vals = [np.asarray(g[0][key]) for g in goals]
        if all(np.array_equal(vals[0], v) for v in vals[1:]):
            stacked_bag[key] = jnp.asarray(vals[0])
            in_axes_bag[key] = None
        else:
            stacked_bag[key] = jnp.asarray(np.stack(vals))
            in_axes_bag[key] = 0
    goal_outs = jnp.asarray(np.stack([np.asarray(g[1]) for g in goals]))
    directions = jnp.asarray(np.stack([np.asarray(g[2]) for g in goals]))
    w0 = gw.target_weight()

    if parts is not None:
        conv_fn, tail_fn, scale, use_demod = parts

        def one(bag, goal_out, direction):
            w, losses = solve._fast_linear_scan(
                conv_fn, tail_fn, (DataBag(bag), gw.params), goal_out, w0,
                direction, scale, niter, lr, use_demod)
            return w, losses[-1]
    else:
        # generic fallback for window families without a fast low-rank
        # decomposition (e.g. SeqPre, whose window starts at adain): vmap
        # the plain Lambda-parameterized linear solve over the edit axis —
        # same math, just without the hoisted constant conv
        window_fn = gw._window_fn

        def one(bag, goal_out, direction):
            w, losses = solve._linear_insert_scan(
                window_fn, w0, (DataBag(bag), gw.params), goal_out,
                direction, niter, lr)
            return w, losses[-1]

    vsolve = jax.vmap(one, in_axes=(in_axes_bag, 0, 0))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def sharded(bag, gouts, dirs):
            bag = {k: (jax.lax.with_sharding_constraint(
                v, NamedSharding(mesh, P(axis)))
                if in_axes_bag[k] == 0 else v)
                for k, v in bag.items()}
            gouts, dirs = (jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(axis))) for x in (gouts, dirs))
            return vsolve(bag, gouts, dirs)
        run = jax.jit(sharded)
    else:
        run = jax.jit(vsolve)
    with precision.schedule_suspended():  # edit math pins the global tier
        weights, final_losses = run(stacked_bag, goal_outs, directions)
    return [weights[i] for i in range(len(requests))], np.asarray(
        final_losses)


def preview_edits(gw, edited_weights: Sequence, z,
                  batched: bool = True) -> np.ndarray:
    """Render the same latents under each edited weight:
    (n_edits, B, H, W, 3) live previews."""
    model = gw.model
    stacked = jnp.stack([jnp.asarray(w) for w in edited_weights])
    base_params = gw.params
    key = gw.firstlayer
    if key not in base_params:  # SeqPre: weight lives at the dconv stage
        key = key.replace(".adain", ".dconv")

    def render(w):
        p = dict(base_params)
        p[key] = {**base_params[key], "weight": w}
        bag = model.make_bag(jnp.asarray(z))
        return gw.rendering_pipe(
            p, gw.target_pipe(p, gw.context_pipe(p, bag)))["output"]

    with precision.schedule_suspended():  # rewriter renders pin the tier
        if batched:
            return np.asarray(jax.jit(jax.vmap(render))(stacked))
        return np.stack([np.asarray(render(w)) for w in stacked])
