"""The rewriting engine: treat a conv layer as a linear associative memory
and rewrite it with a rank-constrained weight edit.

Behavioral rebuild of rewrite/ganrewrite.py (ProgressiveGanRewriter /
SeqStyleGanRewriter) on the functional stage-pipeline substrate:

- The generator splits into context / target / rendering sub-pipelines by
  name (reference ganrewrite.py:48-58 via nethook.subsequence; here:
  StagePipeline.subsequence — pure list slicing, weights shared through the
  single params dict).
- Key second-moment statistics accumulate in a single jitted lax.scan
  (reference: the 1000-z DataLoader loop, tally.py:438-440), cached to npz.
- The edit solve runs as one compiled optimization program
  (rewrite/solve.py), replacing the in-place Python Adam loop.
- Edits are *functional*: ``apply_edit`` swaps a new weight into
  ``self.params``; ``original_params`` keeps the pristine tree for
  revert/toggle (reference keeps a deepcopied state dict,
  rewriteapp.py:24,263-282 — here array immutability makes that free).

The edit-request JSON format is kept verbatim (reference
ganrewrite.py:139-166): ``{"object": [imgnum, mask_url], "paste":
[imgnum, mask_url], "key": [[imgnum, mask_url], ...]}`` with masks as
base64 PNG data URLs.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import DataBag
from ..stats import running, tally
from ..stats.quantile import RunningQuantile
from ..utils import renormalize
from . import geometry, solve


class GanRewriter:
    """Generic rewriter over a functional stage-pipeline generator.

    Subclasses pick the edit window via :meth:`maplayers`. `model` must
    provide ``pipeline``, ``make_bag(z)`` and ``z_dim``.
    """

    def __init__(self, model, params, zds, layernum,
                 cachedir: Optional[str] = None,
                 low_rank_insert: bool = True,
                 low_rank_gradient: bool = False,
                 use_linear_insert: bool = False,
                 tight_paste: bool = True,
                 alpha_area: bool = True,
                 key_method: str = "zca",
                 stats_batch_size: int = 10,
                 mesh=None):
        self.model = model
        self.zds = zds
        self.cachedir = cachedir
        self.low_rank_insert = low_rank_insert
        self.low_rank_gradient = low_rank_gradient
        self.use_linear_insert = use_linear_insert
        self.tight_paste = tight_paste
        self.alpha_area = alpha_area
        self.key_method = key_method
        self.stats_batch_size = stats_batch_size
        self.mesh = mesh  # shards the statistics scan over a device mesh
        self.unit_rq = None
        self.unit_rs = None
        self.cad_rq = None

        self.firstlayer, self.lastlayer = self.maplayers(layernum)
        # own copy of the params dict: edits never touch the caller's tree
        # (reference deepcopies the model, ganrewrite.py:47; jax arrays are
        # immutable so a dict copy suffices)
        self.params: Dict = dict(params)
        self.original_params: Dict = dict(params)

        pipe = model.pipeline
        self.context_pipe = pipe.subsequence(upto_layer=self.firstlayer)
        self.target_pipe = pipe.subsequence(first_layer=self.firstlayer,
                                            last_layer=self.lastlayer)
        self.rendering_pipe = pipe.subsequence(after_layer=self.lastlayer)

        from ..ops.jitopts import tuned_jit
        from ..ops.precision import suspend_schedule_in
        # the whole editing engine is a parity surface: keys, goals, stats,
        # solves, and rewriter-side renders all pin the GLOBAL precision
        # tier even when a mixed-precision *sampling* schedule is installed
        # (ops/precision.py schedule_suspended)
        self._context = tuned_jit(suspend_schedule_in(
            self.context_pipe.__call__))
        self._target = tuned_jit(suspend_schedule_in(
            self.target_pipe.__call__))
        self._render = tuned_jit(suspend_schedule_in(
            self.rendering_pipe.__call__))

        # stable-identity window fn for the jitted solve: only the target
        # weight is optimized; all other params ride along as traced inputs
        firstlayer = self.firstlayer
        target_pipe = self.target_pipe

        def _window(w, goal):
            bag, p = goal
            p = dict(p)
            p[firstlayer] = {**p[firstlayer], "weight": w}
            return target_pipe(p, bag)["fmap"]

        self._window_fn = _window

        # probe shapes (reference ganrewrite.py:59-66)
        sample_bag = model.make_bag(self.get_z(0))
        k_bag = self._context(self.params, sample_bag)
        v_bag = self._target(self.params, k_bag)
        x_bag = self._render(self.params, v_bag)
        self.k_shape = tuple(self.context_acts(k_bag).shape)   # (1,H,W,C)
        self.v_shape = tuple(self.target_acts(v_bag).shape)
        self.x_shape = tuple(self.rendered_image(x_bag).shape)

        self.c_matrix = self.collect_2nd_moment()
        self.zca_matrix = solve.zca_from_cov(self.c_matrix)

    # -- model-family hooks ---------------------------------------------------
    def maplayers(self, layernum: int) -> Tuple[str, str]:
        raise NotImplementedError

    def context_acts(self, bag: DataBag):
        return bag["fmap"]

    def target_acts(self, bag: DataBag):
        return bag["fmap"]

    def rendered_image(self, bag: DataBag):
        return bag["output"]

    def merge_target_output(self, bag: DataBag, new_acts,
                            crop_bounds) -> DataBag:
        """Renderable bag with replaced activations; optionally crop the
        accumulated rgb output to the bounds (reference ganrewrite.py:722-729).
        """
        new = DataBag(bag)
        if crop_bounds is not None and "output" in new:
            t, l, b, r = crop_bounds
            new["output"] = new["output"][:, t:b, l:r, :]
        new["fmap"] = jnp.asarray(new_acts)
        return new

    # -- basics -----------------------------------------------------------------
    def get_z(self, imgnum: int):
        return jnp.asarray(self.zds[imgnum][None])

    def context_of(self, imgnum: int) -> DataBag:
        return self._context(self.params, self.model.make_bag(
            self.get_z(imgnum)))

    def sample_image_from_latent(self, z):
        bag = self.model.make_bag(jnp.asarray(z))
        return self.rendered_image(self._render(
            self.params, self._target(self.params,
                                      self._context(self.params, bag))))

    def target_weight(self):
        return self.params[self.firstlayer]["weight"]

    def set_target_weight(self, w):
        self.params = dict(self.params)
        self.params[self.firstlayer] = {**self.params[self.firstlayer],
                                        "weight": jnp.asarray(w)}

    def revert(self):
        """Restore pristine weights (reference UI 'Revert'/'Toggle
        Original', rewriteapp.py:263-282, 450-455)."""
        self.params = dict(self.original_params)

    def is_empty_mask(self, mask_url) -> bool:
        return renormalize.mask_from_url(mask_url).sum() == 0.0

    def rf(self, fn):
        if self.cachedir is None:
            return None
        return os.path.join(self.cachedir, fn)

    # -- statistics -------------------------------------------------------------
    def _key_rows_fn(self):
        params = self.params
        pipe = self.context_pipe
        model = self.model

        def rows(zbatch):
            acts = pipe(params, model.make_bag(zbatch))["fmap"]
            return acts.reshape(-1, acts.shape[-1])
        return rows

    def collect_2nd_moment(self):
        """Uncentered second moment C = E[k kᵀ] of context keys over the z
        dataset, as one jitted scan; npz-cached (reference
        ganrewrite.py:83-96)."""
        cachefile = self.rf("r2m.npz")
        args = {"sample_size": len(self.zds), "layer": self.firstlayer}
        cached = tally.load_cached_state(cachefile, args)
        if cached is not None:
            r = running.RunningSecondMoment.from_state_dict(cached)
        else:
            from ..ops import precision
            with precision.schedule_suspended():  # stats pin the global tier
                r = tally.tally_second_moment_scan(
                    self._key_rows_fn(), self.zds.zs, self.stats_batch_size,
                    mesh=self.mesh)
            tally.save_cached_state(cachefile, r, args)
        return r.moment()

    def covariance_adjusted_query_key(self, k):
        """C^{-1} k (reference ganrewrite.py:101-105)."""
        return solve.solve_spd(self.c_matrix, k)

    def covariance_adjusted_key(self, k, kout_bag):
        return self.covariance_adjusted_query_key(k)

    def zca_whitened_query_key(self, k):
        """C^{-1/2} k; rows in, rows out (reference ganrewrite.py:107-110)."""
        k = jnp.asarray(k)
        if k.ndim == 1:
            return self.zca_matrix @ k
        return k @ self.zca_matrix  # zca is symmetric

    def square_scales_for_units(self):
        """Per-unit mean squared activation (reference ganrewrite.py:541-552).
        """
        if self.unit_rs is None:
            rows = self._key_rows_fn()
            r = tally.tally_mean(lambda z: jnp.square(rows(z)), self.zds,
                                 batch_size=self.stats_batch_size,
                                 cachefile=self.rf("unit_rs.npz"))
            self.unit_rs = r.mean()
        return self.unit_rs

    def quantiles_for_units(self):
        """Per-unit quantile sketch of activations (reference :554-565)."""
        if self.unit_rq is None:
            self.unit_rq = tally.tally_quantile(
                self._key_rows_fn(), self.zds,
                batch_size=self.stats_batch_size,
                cachefile=self.rf("unit_rq.npz"))
        return self.unit_rq

    def quantiles_for_covariance_adjusted_directions(self):
        """(reference :567-580 — adjusts through the covariance_adjusted_key
        hook so subclass overrides apply)"""
        if self.cad_rq is None:
            params, pipe, model = self.params, self.context_pipe, self.model

            def rows(zbatch):
                bag = pipe(params, model.make_bag(zbatch))
                acts = bag["fmap"]
                flat = acts.reshape(-1, acts.shape[-1])
                return self.covariance_adjusted_key(flat, bag)

            self.cad_rq = tally.tally_quantile(
                rows, self.zds, batch_size=self.stats_batch_size,
                cachefile=self.rf("unit_cad.npz"))
        return self.cad_rq

    def _key_response_fn(self):
        """Memoized jitted (params, key, zbatch) -> (per-image max, flat
        heat) — params/key as traced ARGUMENTS so repeated searches (and
        searches after edits) reuse one compiled program instead of
        burning the weights into a fresh compile each call."""
        if not hasattr(self, "_key_response_jit"):
            pipe, model = self.context_pipe, self.model
            from ..ops.jitopts import tuned_jit

            from ..ops.precision import suspend_schedule_in

            @tuned_jit
            @suspend_schedule_in
            def image_max_sel(params, key, zbatch):
                acts = pipe(params, model.make_bag(zbatch))["fmap"]
                heat = jnp.sum(acts * key[None, None, None, :], axis=-1)
                maxmap = heat.reshape(heat.shape[0], -1).max(axis=1)
                return maxmap[:, None], heat.reshape(-1, 1)
            self._key_response_jit = image_max_sel
        return self._key_response_jit

    def ranking_for_key(self, key, k=12):
        """Top-k images by key response + quantile sketch of the heatmap
        (drives the UI 'Search'; reference :582-594)."""
        key = jnp.asarray(key)
        fn = self._key_response_fn()
        params = self.params

        topk, rq = tally.tally_topk_and_quantile(
            lambda zbatch: fn(params, key, zbatch), self.zds, k=k,
            batch_size=self.stats_batch_size)
        return topk.result()[1][0], rq

    # -- selections (masks -> activations) ---------------------------------------
    def _mask_at(self, mask_url, shape):
        """Decode a mask data URL at a feature-map (H, W) resolution."""
        return renormalize.mask_from_url(mask_url, size=shape)

    def query_key_from_selection(self, imgnum, mask):
        """Mask-averaged, covariance-adjusted, normalized key
        (reference ganrewrite.py:427-436)."""
        area = self._mask_at(mask, self.k_shape[1:3])
        k_acts = self.context_acts(self.context_of(imgnum))  # (1,H,W,C)
        mean = (np.asarray(k_acts[0]) * area[:, :, None]).sum((0, 1)) / (
            1e-10 + area.sum())
        k = np.asarray(self.covariance_adjusted_query_key(mean))
        return jnp.asarray(k / (1e-10 + np.linalg.norm(k)))

    def object_from_selection(self, imgnum, mask):
        """Crop the copied object's target activations (reference :442-451).
        """
        area = self._mask_at(mask, self.v_shape[1:3])
        k_bag = self.context_of(imgnum)
        v_bag = self._target(self.params, k_bag)
        v_acts = np.asarray(self.target_acts(v_bag))
        t, l, b, r = geometry.positive_bounding_box(area)
        return (v_acts[:, t:b, l:r, :], v_bag, area[t:b, l:r], (t, l, b, r))

    def paste_from_selection(self, imgnum, mask, obj_acts, obj_area):
        """Build (goal_in, goal_out, viz_out, bounds) for the paste edit
        (reference :498-520)."""
        area = self._mask_at(mask, self.v_shape[1:3])
        source_bag = self.context_of(imgnum)
        source_acts = np.asarray(self.context_acts(source_bag))
        unchanged_bag = self._target(self.params, source_bag)
        unchanged_acts = np.asarray(self.target_acts(unchanged_bag))
        target_acts, bounds = geometry.paste_clip_at_center(
            unchanged_acts, obj_acts, geometry.centered_location(area),
            obj_area if self.alpha_area else None)
        full_target_acts = target_acts
        if self.tight_paste:
            source_acts, target_acts, source_bounds, target_bounds = (
                geometry.crop_clip_to_bounds(source_acts, target_acts,
                                             bounds))
        else:
            source_bounds, target_bounds = None, None
        goal_in = self.merge_target_output(source_bag, source_acts,
                                           source_bounds)
        goal_out = self.merge_target_output(unchanged_bag, target_acts,
                                            target_bounds)
        viz_out = self.merge_target_output(unchanged_bag, full_target_acts,
                                           None)
        return goal_in, goal_out, viz_out, bounds

    def erase_from_selection(self, imgnum, mask, context_mask_pairs, drank):
        """Erase goal: target acts with the top-drank context units zeroed
        (reference :472-496)."""
        k_area = self._mask_at(mask, self.k_shape[1:3])
        area = self._mask_at(mask, self.v_shape[1:3])
        source_bag = self.context_of(imgnum)
        source_acts = np.asarray(self.context_acts(source_bag))
        unchanged_bag = self._target(self.params, source_bag)
        d_units = np.asarray(self.normdissect_units(context_mask_pairs,
                                                    drank))
        erased = source_acts.copy()
        erased[..., d_units] = 0.0
        erased_in = self.merge_target_output(source_bag, erased, None)
        erased_out = self._target(self.params, erased_in)
        target_acts = np.asarray(self.target_acts(erased_out))
        if self.tight_paste:
            source_bounds = geometry.positive_bounding_box(k_area)
            target_bounds = geometry.positive_bounding_box(area)
        else:
            source_bounds, target_bounds = None, None
        goal_in = self.merge_target_output(source_bag, source_acts,
                                           source_bounds)
        goal_out = self.merge_target_output(unchanged_bag, target_acts,
                                            target_bounds)
        return goal_in, goal_out

    def rgb_from_selection(self, imgnum, mask):
        """(reference :522-529)"""
        area = self._mask_at(mask, self.x_shape[1:3])
        x = np.asarray(self.sample_image_from_latent(self.get_z(imgnum)))
        t, l, b, r = geometry.positive_bounding_box(area)
        return x[:, t:b, l:r, :], x, area[t:b, l:r], (t, l, b, r)

    def rgbpaste_from_selection(self, imgnum, mask, obj_rgb, obj_area):
        """(reference :531-539)"""
        area = self._mask_at(mask, self.x_shape[1:3])
        source_z = self.get_z(imgnum)
        unchanged = np.asarray(self.sample_image_from_latent(source_z))
        changed, bounds = geometry.paste_clip_at_center(
            unchanged, obj_rgb, geometry.centered_location(area), obj_area)
        return source_z, changed, bounds

    # -- context directions ---------------------------------------------------
    def normdissect_units(self, imgnum_mask_pairs, rank):
        """Top units by mask-weighted squared activation relative to their
        global scale (reference ganrewrite.py:453-470)."""
        obs, wts = self._gather_masked_obs(imgnum_mask_pairs,
                                           keep_all=True)
        sq = np.asarray(self.square_scales_for_units())
        score = (obs ** 2) / sq[None, :]
        mean_score = (score * wts).sum(0) / wts.sum()
        return jnp.asarray(np.argsort(-mean_score)[:rank].copy())

    def _gather_masked_obs(self, imgnum_mask_pairs, keep_all=False):
        """Stack (pixels, C) context activations and (pixels, 1) mask
        weights across selection pairs."""
        all_obs, all_w = [], []
        for imgnum, mask in imgnum_mask_pairs:
            k_acts = np.asarray(self.context_acts(self.context_of(imgnum)))
            area = self._mask_at(mask, self.k_shape[1:3])
            all_obs.append(k_acts.reshape(-1, k_acts.shape[-1]))
            all_w.append(area.reshape(-1, 1))
        obs = np.concatenate(all_obs)
        w = np.concatenate(all_w)
        if keep_all:
            return obs, w
        sel = w[:, 0] > 0
        return obs[sel], w[sel]

    def multi_key_from_selection(self, imgnum_mask_pairs, rank=1,
                                 key_method=None):
        """Build the rank-r orthonormal context direction matrix D from
        (imgnum, mask) pairs (reference ganrewrite.py:333-425).

        Methods: 'zca' (whiten, SVD, map back to row space, QR, sign-align),
        'gandissect' (per-unit quantile log-score -> one-hot units),
        'svd'/'mean' (C^{-1}-adjusted keys -> SVD / normalized mean).
        """
        key_method = key_method or self.key_method
        if key_method == "zca":
            obs, w = self._gather_masked_obs(imgnum_mask_pairs)
            zca_k = np.asarray(self.zca_whitened_query_key(obs)) * w
            # top right-singular vectors in whitened space
            _, _, vh = np.linalg.svd(zca_k, full_matrices=False)
            top_e_vec = vh[:rank].T                          # (C, rank)
            # back to row space (= applying ZCA a second time)
            row_dirs = np.asarray(self.zca_whitened_query_key(top_e_vec.T))
            just_avg = zca_k.sum(0)
            q, _ = np.linalg.qr(row_dirs.T)                  # (C, rank)
            signs = np.sign((q * just_avg[:, None]).sum(0))
            signs[signs == 0] = 1.0
            return jnp.asarray((q * signs[None, :]).T)       # (rank, C)
        if key_method == "gandissect":
            obs, w = self._gather_masked_obs(imgnum_mask_pairs,
                                             keep_all=True)
            rq = self.quantiles_for_units()
            ranks = np.asarray(rq.normalize(obs.T)).T
            logscore = -np.log(np.maximum(1.0 - ranks, 1e-20))
            mean_logscore = (logscore * w).sum(0) / w.sum()
            top = np.argsort(-mean_logscore)[:rank]
            result = np.zeros((rank, obs.shape[1]), np.float32)
            result[np.arange(rank), top] = 1.0
            return jnp.asarray(result)
        assert key_method in ("svd", "mean"), key_method
        # per-pair adjustment through the covariance_adjusted_key hook so
        # subclass overrides (SeqPre's style-adjusted C·diag(s), reference
        # ganrewrite.py:751-760) apply (reference routes each pair's
        # k_outs through the hook, :404-414)
        adjusted = []
        for imgnum, mask in imgnum_mask_pairs:
            k_bag = self.context_of(imgnum)
            k_acts = np.asarray(self.context_acts(k_bag))
            area = self._mask_at(mask, self.k_shape[1:3])
            weighted = (k_acts.reshape(-1, k_acts.shape[-1])
                        * area.reshape(-1, 1))
            nonzero = weighted[np.linalg.norm(weighted, axis=1) > 0]
            if len(nonzero):
                adjusted.append(np.asarray(
                    self.covariance_adjusted_key(nonzero, k_bag)))
        all_k = np.concatenate(adjusted)
        just_avg = all_k.mean(0)
        if key_method == "mean":
            assert rank == 1
            return jnp.asarray((just_avg / np.linalg.norm(just_avg))[None])
        u, s, vh = np.linalg.svd(all_k.T, full_matrices=True)
        if (just_avg * u[:, 0]).sum() < 0:
            u[:, 0] = -u[:, 0]
        return jnp.asarray(u.T[:rank])

    # -- the weight solves -------------------------------------------------------
    def insert(self, goal_in: DataBag, goal_out: DataBag, context=None,
               update_callback=None, niter=2001, piter=10, lr=0.05,
               return_timing=False):
        """Rank-constrained solve; commits the new weight into self.params
        (reference ganrewrite.py:254-298)."""
        if self.use_linear_insert:
            return self.linear_insert(goal_in, goal_out, context,
                                      update_callback=update_callback,
                                      niter=niter, lr=lr,
                                      return_timing=return_timing)
        out = solve.insert_solve(
            self._window_fn, self.target_weight(),
            (goal_in, self.params), self.target_acts(goal_out),
            context, niter=niter, piter=piter, lr=lr,
            low_rank_insert=self.low_rank_insert,
            low_rank_gradient=self.low_rank_gradient,
            update_callback=update_callback, return_timing=return_timing)
        self.set_target_weight(out[0])
        if return_timing:
            return out[2]

    def linear_insert(self, goal_in, goal_out, context=None,
                      update_callback=None, niter=2001, lr=0.05,
                      return_timing=False):
        """(reference ganrewrite.py:201-252)"""
        out = solve.linear_insert_solve(
            self._window_fn, self.target_weight(),
            (goal_in, self.params), self.target_acts(goal_out),
            context, niter=niter, lr=lr,
            update_callback=update_callback, return_timing=return_timing)
        self.set_target_weight(out[0])
        if return_timing:
            return out[2]

    # -- fast low-rank solve ------------------------------------------------
    def _fast_parts(self, goal_in):
        """(conv_fn, tail_fn, scale, use_demod) for the low-rank-decomposed
        solve, or None when the window doesn't support it."""
        return None

    def fast_parts_cached(self):
        """Memoized _fast_parts: the closures are static args of the jitted
        solve, so they must be identity-stable across calls to hit the jit
        cache (one compile per rewriter, not per insert)."""
        if not hasattr(self, "_fast_parts_memo"):
            self._fast_parts_memo = self._fast_parts(None)
        return self._fast_parts_memo

    def fast_linear_insert(self, goal_in, goal_out, context,
                           update_callback=None, niter=2001, lr=0.05,
                           return_timing=False):
        """Low-rank-decomposed linear insert: mathematically the same Λ·D
        parameterization as linear_insert, but the full conv is hoisted out
        of the loop (solve.fast_linear_insert_solve) — orders of magnitude
        fewer FLOPs per iteration."""
        parts = self.fast_parts_cached()
        if parts is None:
            return self.linear_insert(goal_in, goal_out, context,
                                      update_callback=update_callback,
                                      niter=niter, lr=lr,
                                      return_timing=return_timing)
        conv_fn, tail_fn, scale, use_demod = parts
        out = solve.fast_linear_insert_solve(
            conv_fn, tail_fn, goal_in, self.params,
            self.target_acts(goal_out), self.target_weight(), context,
            scale, niter=niter, lr=lr, use_demod=use_demod,
            update_callback=update_callback, return_timing=return_timing)
        self.set_target_weight(out[0])
        if return_timing:
            return out[2]

    def zero(self, context, amount=0.0):
        """GANdissect-style erase: remove the weight component along the
        context directions (reference ganrewrite.py:190-199)."""
        w = self.target_weight()
        ortho = w - solve.projected_conv(w, context)
        self.set_target_weight(
            ortho + amount * solve.projected_conv(jnp.ones_like(w), context))

    def all_weights_insert(self, x_target, z, bounds=None,
                           update_callback=None, niter=20001, lr=0.01,
                           feature_loss_fn=None, feature_weight=1e-2):
        """'Overfit' baseline: optimize ALL generator params against a
        pasted RGB target with L1 (+ optional perceptual feature MSE)
        (reference ganrewrite.py:300-331; the reference uses VGG16 layer-20
        features — pass feature_loss_fn to enable the equivalent)."""
        import optax
        model, pipe = self.model, self.model.pipeline
        x_target = jnp.asarray(x_target)
        z = jnp.asarray(z)
        bag = model.make_bag(z)

        def loss_fn(params):
            out = pipe(params, bag)["output"]
            if bounds is None:
                gt, pred = x_target, out
            else:
                t, l, b, r = bounds
                gt = x_target[:, t:b, l:r, :]
                pred = out[:, t:b, l:r, :]
            loss = jnp.mean(jnp.abs(gt - pred))
            if feature_loss_fn is not None:
                loss = loss + feature_weight * jnp.mean(
                    jnp.square(feature_loss_fn(gt) - feature_loss_fn(pred)))
            return loss

        opt = optax.adam(lr)

        @jax.jit
        def step(params, opt_state):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        from ..ops import precision
        params = self.params
        opt_state = opt.init(params)
        with precision.schedule_suspended():  # pin the global parity tier
            for it in range(niter):
                params, opt_state, loss = step(params, opt_state)
                if update_callback is not None and it % 50 == 0:
                    update_callback(it, loss)
        self.params = params

    # -- edit-request entry points -------------------------------------------
    def apply_edit(self, request, rank=1, niter=2001, piter=10, lr=0.05,
                   update_callback=None, single_key=-1,
                   return_timing=False):
        """Apply a UI-format JSON edit request (reference
        ganrewrite.py:148-169)."""
        o_imgnum, o_mask = request["object"]
        p_imgnum, p_mask = request["paste"]
        key_examples = request.get("key", [(p_imgnum, p_mask)])
        if single_key >= 0:
            key_examples = [key_examples[single_key]]
        obj_acts, _, obj_area, _ = self.object_from_selection(o_imgnum,
                                                              o_mask)
        goal_in, goal_out, _, _ = self.paste_from_selection(
            p_imgnum, p_mask, obj_acts, obj_area)
        mkey = self.multi_key_from_selection(key_examples, rank=rank)
        return self.insert(goal_in, goal_out, mkey,
                           update_callback=update_callback, niter=niter,
                           piter=piter, lr=lr, return_timing=return_timing)

    def apply_erase(self, request, rank=1, drank=30, niter=2001, piter=10,
                    lr=0.05, update_callback=None):
        """(reference ganrewrite.py:135-146)"""
        p_imgnum, p_mask = request["paste"]
        key_examples = request.get("key", [(p_imgnum, p_mask)])
        goal_in, goal_out = self.erase_from_selection(
            p_imgnum, p_mask, key_examples, drank)
        mkey = self.multi_key_from_selection(key_examples, rank=rank)
        return self.insert(goal_in, goal_out, mkey,
                           update_callback=update_callback, niter=niter,
                           piter=piter, lr=lr)

    def apply_overfit(self, request, niter=20001, lr=0.01,
                      update_callback=None, feature_loss_fn=None):
        """(reference ganrewrite.py:171-181)"""
        o_imgnum, o_mask = request["object"]
        p_imgnum, p_mask = request["paste"]
        rgb_clip, _, obj_area, _ = self.rgb_from_selection(o_imgnum, o_mask)
        host_z, changed_rgb, bounds = self.rgbpaste_from_selection(
            p_imgnum, p_mask, rgb_clip, obj_area)
        self.all_weights_insert(changed_rgb, host_z, bounds=bounds,
                                update_callback=update_callback,
                                niter=niter, lr=lr,
                                feature_loss_fn=feature_loss_fn)

    # -- rendering ---------------------------------------------------------------
    def render_object(self, target_bag, box=None):
        """Render a target bag; optionally outline `box` (t, l, b, r in
        v-fmap coordinates) in red (reference ganrewrite.py:596-608)."""
        img = np.asarray(self.rendered_image(
            self._render(self.params, target_bag)))
        if box is None:
            return renormalize.as_image(img[0])
        from ..utils import imgviz
        t, l, b, r = box
        lowres = np.zeros(self.v_shape[1:3], np.float32)
        lowres[t:b, l:r] = 1.0
        iv = imgviz.ImageVisualizer(img.shape[1:3])
        return iv.masked_image(img[0], mask=lowres,
                               border_color=(255, 0, 0), thickness=3,
                               outside_bright=1.0)

    def render_image(self, imgnum):
        img = np.asarray(self.sample_image_from_latent(self.get_z(imgnum)))
        return renormalize.as_image(img[0])

    def render_image_batch(self, imgnums, key=None, level=None,
                           batch_size=8, **kwargs):
        """Render images; when (key, level) are given, overlay the key's
        response heatmap thresholded at `level` — the inline Search
        highlight (reference ganrewrite.py:626-650)."""
        out = []
        iv = None
        if key is not None and level is not None:
            from ..utils import imgviz
            key = jnp.asarray(key)
            iv = imgviz.ImageVisualizer(self.x_shape[1:3])
        for i in range(0, len(imgnums), batch_size):
            zb = jnp.asarray(np.stack([self.zds[j]
                                       for j in imgnums[i:i + batch_size]]))
            imgs = np.asarray(self.sample_image_from_latent(zb))
            if iv is not None:
                acts = self.context_acts(self._context(
                    self.params, self.model.make_bag(zb)))
                heat = np.asarray(jnp.sum(
                    acts * key[None, None, None, :], axis=-1))
                out.extend(iv.masked_image(im, activations=heat[j],
                                           level=float(level), **kwargs)
                           for j, im in enumerate(imgs))
            else:
                out.extend(renormalize.as_image(im) for im in imgs)
        return out


class ProgressiveGanRewriter(GanRewriter):
    """Edit window = the bare conv of a ProgGAN block
    (reference ganrewrite.py:78-81)."""

    def maplayers(self, layernum):
        name = f"layer{layernum}.conv"
        return name, name

    def _fast_parts(self, goal_in):
        from ..models.proggan import conv2d_nhwc_oihw
        block = self.firstlayer[:-len(".conv")]
        padding = self.model._conv_specs[block][3]

        def conv_fn(x, w):
            return conv2d_nhwc_oihw(x, w, padding)

        def tail_fn(params, bag):
            return bag  # window is the bare conv
        return conv_fn, tail_fn, 1.0, False


class SeqStyleGanRewriter(GanRewriter):
    """Edit window = dconv .. activate of a StyleGAN2 layer
    (reference ganrewrite.py:662-665)."""

    def maplayers(self, layernum):
        prefix = "conv" if layernum == 2 else "sconv"
        return (f"layer{layernum}.{prefix}.mconv.dconv",
                f"layer{layernum}.{prefix}.activate")

    def _fast_parts(self, goal_in):
        import math
        from jax import lax as _lax
        from ..ops.precision import get_precision
        spec = self.model._param_specs.get(self.firstlayer)
        if spec is None or spec[0] != "dconv":
            # window doesn't start at the linear conv (e.g. SeqPre's
            # adain window) — fall back to the direct parameterization
            return None
        _, in_c, out_c, k, upsample = spec
        scale = 1.0 / math.sqrt(in_c * k * k)

        def conv_fn(x, w):
            if upsample:
                # spatial flip commutes with the input-channel contraction,
                # so conv(D·x, flip(Λ)) == conv(x, flip(Λ·D)) exactly
                wf = jnp.flip(w, (-2, -1))
                return _lax.conv_general_dilated(
                    x, wf, (1, 1), ((k - 1, k - 1),) * 2,
                    lhs_dilation=(2, 2),
                    dimension_numbers=("NHWC", "OIHW", "NHWC"),
                    precision=get_precision())
            return _lax.conv_general_dilated(
                x, w, (1, 1), ((k // 2, k // 2),) * 2,
                dimension_numbers=("NHWC", "OIHW", "NHWC"),
                precision=get_precision())

        if self.firstlayer == self.lastlayer:
            def tail_fn(params, bag):
                return bag
        else:
            tail = self.model.pipeline.subsequence(
                after_layer=self.firstlayer, last_layer=self.lastlayer)

            def tail_fn(params, bag):
                return tail(params, bag)
        return conv_fn, tail_fn, scale, True

    def sample_image_patch(self, z, act_crop_size: int, seed=(None, None)):
        """Render the image patch corresponding to a crop of the edit
        window's input activations — used by the per-layer patch-FID sweep
        (reference ganrewrite.py:667-698)."""
        import random as _random
        bag = self._context(self.params, self.model.make_bag(
            jnp.asarray(z)))
        h, w = bag["fmap"].shape[1:3]
        assert act_crop_size <= h
        if seed[0] is not None:
            xi, yi = seed
        else:
            xi = _random.randint(0, h - act_crop_size)
            yi = _random.randint(0, w - act_crop_size)
        cropped = _patched_bag(bag, xi, yi, act_crop_size)
        out = self._render(self.params,
                           self._target(self.params, cropped))
        return self.rendered_image(out)


def _patched_bag(bag: DataBag, xi, yi, size) -> DataBag:
    new = DataBag(bag)
    fmap = bag["fmap"]
    new["fmap"] = fmap[:, xi:xi + size, yi:yi + size, :]
    if "output" in bag:
        out = bag["output"]
        if out.shape[1:3] == fmap.shape[1:3]:
            new["output"] = out[:, xi:xi + size, yi:yi + size, :]
        else:
            # the running rgb output is 2x the activation resolution
            # (reference ganrewrite.py:683-687)
            new["output"] = out[:, 2 * xi:2 * (xi + size),
                                2 * yi:2 * (yi + size), :]
    return new


class SeqTinyStyleGanRewriter(SeqStyleGanRewriter):
    """dconv-only window: no nonlinearity in the target
    (reference ganrewrite.py:732-739)."""

    def maplayers(self, layernum):
        prefix = "conv" if layernum == 2 else "sconv"
        name = f"layer{layernum}.{prefix}.mconv.dconv"
        return name, name
    # _fast_parts inherits: the base handles the dconv-only window with an
    # identity tail


class SeqPreStyleGanRewriter(SeqStyleGanRewriter):
    """Window starts at adain (style modulation inside the window), so the
    covariance is adjusted by the style: keys solve against C·diag(s)
    (reference ganrewrite.py:742-760)."""

    def maplayers(self, layernum):
        prefix = "conv" if layernum == 2 else "sconv"
        return (f"layer{layernum}.{prefix}.mconv.adain",
                f"layer{layernum}.{prefix}.activate")

    def target_weight(self):
        # the learned conv lives one stage after adain
        dconv = self.firstlayer.replace(".adain", ".dconv")
        return self.params[dconv]["weight"]

    def set_target_weight(self, w):
        dconv = self.firstlayer.replace(".adain", ".dconv")
        self.params = dict(self.params)
        self.params[dconv] = {**self.params[dconv],
                              "weight": jnp.asarray(w)}

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # rebind the solve's weight injection to the dconv stage
        dconv = self.firstlayer.replace(".adain", ".dconv")
        target_pipe = self.target_pipe

        def _window(w, goal):
            bag, p = goal
            p = dict(p)
            p[dconv] = {**p[dconv], "weight": w}
            return target_pipe(p, bag)["fmap"]
        self._window_fn = _window

    def covariance_adjusted_key(self, k, kout_bag):
        """Solve against C·diag(style) — the style of this selection's
        bag (reference ganrewrite.py:751-760, 'CS version')."""
        style = np.asarray(kout_bag["style"])[0]
        cs = np.asarray(self.c_matrix) * style[None, :]
        kk = np.asarray(k, np.float64)
        single = kk.ndim == 1
        x = np.linalg.solve(np.asarray(cs, np.float64),
                            kk[:, None] if single else kk.T)
        out = x[:, 0] if single else x.T
        return jnp.asarray(out.astype(np.float32))
