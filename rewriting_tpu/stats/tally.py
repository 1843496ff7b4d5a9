"""Tally drivers: run a compute closure over a z dataset and feed a reducer.

Mirrors the behavior of the reference's utils/tally.py — each ``tally_*``
drives ``compute(zbatch)`` over dataset batches into a Running* accumulator,
with npz cache-file memoization keyed on arguments (reference
tally.py:703-730: a cache-key mismatch recomputes and resaves).

Two execution styles:

- the generic host loop (any reducer, any compute), used like the reference's
  DataLoader loop;
- :func:`tally_second_moment_scan` — the rewriter's hot statistic compiled as
  ONE XLA program: ``lax.scan`` over device-resident z batches with the
  reducer update fused into the generator forward (reference equivalent:
  the 1000-z loop at tally.py:438-440 feeding RunningSecondMoment).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import running
from .quantile import RunningQuantile


# ---------------------------------------------------------------------------
# npz cache (arg-keyed memoization, reference tally.py:703-730)
# ---------------------------------------------------------------------------

def load_cached_state(cachefile: Optional[str], args: dict):
    if cachefile is None or not os.path.exists(cachefile):
        return None
    dat = dict(np.load(cachefile, allow_pickle=False))
    for a, v in args.items():
        if a not in dat or str(dat[a]) != str(v):
            print(f"{cachefile} differs at {a}: {dat.get(a)} vs {v}; "
                  "recomputing")
            return None
        # validated cache-key args must not leak into the restored state
        # (string args like layer names are not valid array entries)
        del dat[a]
    return dat


def save_cached_state(cachefile: Optional[str], obj, args: dict):
    if cachefile is None:
        return
    d = obj.state_dict()
    for a, v in args.items():
        if a in d:
            assert str(d[a]) == str(v), f"cache arg {a} collides"
        d[a] = np.array(v)
    os.makedirs(os.path.dirname(cachefile) or ".", exist_ok=True)
    np.savez(cachefile, **d)


def _run(compute: Callable, zds, reducer, batch_size: int,
         cachefile: Optional[str], args: dict, restore):
    cached = load_cached_state(cachefile, args)
    if cached is not None:
        restore(cached)
        return reducer
    for zbatch, valid in zds.batches(batch_size):
        out = compute(jnp.asarray(zbatch[:valid]))
        if isinstance(out, tuple):
            reducer.add(*out)
        else:
            reducer.add(out)
    save_cached_state(cachefile, reducer, args)
    return reducer


def _tally(reducer, compute, zds, batch_size=10, cachefile=None,
           extra_args=None):
    args = {"sample_size": len(zds), "batch_size": batch_size}
    args.update(extra_args or {})
    return _run(compute, zds, reducer, batch_size, cachefile, args,
                reducer.set_state_dict)


# ---------------------------------------------------------------------------
# Generic tallies
# ---------------------------------------------------------------------------

def tally_mean(compute, zds, batch_size=10, cachefile=None):
    return _tally(running.RunningMean(), compute, zds, batch_size, cachefile)


def tally_variance(compute, zds, batch_size=10, cachefile=None):
    return _tally(running.RunningVariance(), compute, zds, batch_size,
                  cachefile)


def tally_covariance(compute, zds, batch_size=10, cachefile=None):
    return _tally(running.RunningCovariance(), compute, zds, batch_size,
                  cachefile)


def tally_cross_covariance(compute, zds, batch_size=10, cachefile=None):
    return _tally(running.RunningCrossCovariance(), compute, zds,
                  batch_size, cachefile)


def tally_second_moment(compute, zds, batch_size=10, cachefile=None):
    """Uncentered second moment — the rewriter's key covariance statistic
    (reference tally.py:424-443)."""
    return _tally(running.RunningSecondMoment(), compute, zds, batch_size,
                  cachefile)


def tally_bincount(compute, zds, batch_size=10, size=1024, cachefile=None):
    return _tally(running.RunningBincount(size=size), compute, zds,
                  batch_size, cachefile, {"size": size})


def tally_topk(compute, zds, k=100, batch_size=10, cachefile=None):
    return _tally(running.RunningTopK(k=k), compute, zds, batch_size,
                  cachefile, {"k": k})


def gather_topk(compute, zds, topk, k=None, batch_size=10):
    """Gather per-(unit, rank) data for each unit's top-k samples: run
    ``compute(zbatch)`` only over batches containing needed samples and
    store compute's per-sample rows into a GatherTensor
    (reference tally.py:71-103)."""
    vals, idx = (np.asarray(v) for v in topk.result())
    k = k or idx.shape[1]
    needed = {}
    for unit in range(idx.shape[0]):
        for rank in range(k):
            needed.setdefault(int(idx[unit, rank]), []).append(
                (unit, rank))
    gt = running.GatherTensor(topk=topk, k=k)
    for lo in range(0, len(zds), batch_size):
        hit = [i for i in range(lo, min(lo + batch_size, len(zds)))
               if i in needed]
        if not hit:
            continue
        out = np.asarray(compute(jnp.asarray(
            zds.zs[lo:lo + batch_size])))
        for i in hit:
            for unit, rank in needed[i]:
                gt.add(unit, rank, out[i - lo])
    return gt


def tally_quantile(compute, zds, resolution=6 * 1024, batch_size=10,
                   cachefile=None):
    return _tally(RunningQuantile(resolution=resolution), compute, zds,
                  batch_size, cachefile, {"resolution": resolution})


def tally_topk_and_quantile(compute, zds, k=100, resolution=6 * 1024,
                            batch_size=10, cachefile=None):
    """One pass feeding both a TopK (per-image max scores) and a quantile
    sketch (flattened scores); compute returns (maxval_rows, flat_rows)
    (reference tally.py:157-180). Both reducers cache into one npz."""
    topk = running.RunningTopK(k=k)
    rq = RunningQuantile(resolution=resolution)
    args = {"sample_size": len(zds), "batch_size": batch_size, "k": k,
            "resolution": resolution}
    cached = load_cached_state(cachefile, args)
    if cached is not None:
        topk.set_state_dict({kk[len("topk."):]: v for kk, v in
                             cached.items() if kk.startswith("topk.")})
        rq.set_state_dict({kk[len("rq."):]: v for kk, v in cached.items()
                           if kk.startswith("rq.")})
        return topk, rq
    for zbatch, valid in zds.batches(batch_size):
        maxval, flat = compute(jnp.asarray(zbatch[:valid]))
        topk.add(maxval)
        rq.add(flat)
    if cachefile is not None:
        class _Obj:
            def state_dict(self):
                d = {f"topk.{kk}": v
                     for kk, v in topk.state_dict().items()}
                d.update({f"rq.{kk}": v
                          for kk, v in rq.state_dict().items()})
                return d
        save_cached_state(cachefile, _Obj(), args)
    return topk, rq


def tally_cat(compute, zds, batch_size=10, cachefile=None):
    """Concatenate compute outputs over the dataset (reference
    tally.py:327-346)."""
    args = {"sample_size": len(zds), "batch_size": batch_size}
    cached = load_cached_state(cachefile, args)
    if cached is not None:
        return jnp.asarray(cached["cat"])
    outs = [np.asarray(compute(jnp.asarray(z[:v])))
            for z, v in zds.batches(batch_size)]
    result = np.concatenate(outs, axis=0)
    if cachefile is not None:

        class _Obj:
            def state_dict(self):
                return {"cat": result}
        save_cached_state(cachefile, _Obj(), args)
    return jnp.asarray(result)


def tally_cat_dict(compute, zds, batch_size=10, cachefile=None):
    """Concatenate dict-of-tensors compute outputs over the dataset
    (reference tally.py:349-377): compute returns {key: rows} per batch;
    results concatenate per key along the first axis."""
    args = {"sample_size": len(zds), "batch_size": batch_size}
    cached = load_cached_state(cachefile, args)
    if cached is not None:
        return {k: jnp.asarray(v) for k, v in cached.items()}
    outs = {}
    for z, v in zds.batches(batch_size):
        for k, rows in compute(jnp.asarray(z[:v])).items():
            outs.setdefault(k, []).append(np.asarray(rows))
    result = {k: np.concatenate(v, axis=0) for k, v in outs.items()}
    if cachefile is not None:

        class _Obj:
            def state_dict(self):
                return dict(result)  # save_cached_state adds args in place
        save_cached_state(cachefile, _Obj(), args)
    return {k: jnp.asarray(v) for k, v in result.items()}


def tally_conditional_mean(compute, zds, batch_size=10, cachefile=None):
    """compute yields [(condition, rows), ...] per batch (reference
    tally.py:274-297)."""
    cm = running.RunningConditionalMean()
    args = {"sample_size": len(zds), "batch_size": batch_size}
    cached = load_cached_state(cachefile, args)
    if cached is not None:
        cm.set_state_dict(cached)
        return cm
    for zbatch, valid in zds.batches(batch_size):
        for cond, rows in compute(jnp.asarray(zbatch[:valid])):
            cm.add(cond, rows)
    save_cached_state(cachefile, cm, args)
    return cm


def tally_conditional_topk(compute, zds, k=100, batch_size=10,
                           cachefile=None):
    """Per-condition top-k (reference tally.py:106-129); compute yields
    [(condition, rows), ...] per batch."""
    ct = running.RunningConditionalTopK(k=k)
    args = {"sample_size": len(zds), "batch_size": batch_size, "k": k}
    cached = load_cached_state(cachefile, args)
    if cached is not None:
        ct.set_state_dict(cached)
        return ct
    for zbatch, valid in zds.batches(batch_size):
        for cond, rows in compute(jnp.asarray(zbatch[:valid])):
            ct.add(cond, rows)
    save_cached_state(cachefile, ct, args)
    return ct


def tally_conditional_quantile(compute, zds, resolution=6 * 1024,
                               batch_size=10, cachefile=None):
    """Per-condition quantile sketches (reference tally.py:183-215)."""
    cq = running.RunningConditionalQuantile(resolution=resolution)
    args = {"sample_size": len(zds), "batch_size": batch_size,
            "resolution": resolution}
    cached = load_cached_state(cachefile, args)
    if cached is not None:
        cq.set_state_dict(cached)
        return cq
    for zbatch, valid in zds.batches(batch_size):
        for cond, rows in compute(jnp.asarray(zbatch[:valid])):
            cq.add(cond, rows)
    save_cached_state(cachefile, cq, args)
    return cq


def tally_all_intersection_and_union(compute, zds, batch_size=10,
                                     cachefile=None):
    return _tally(running.RunningAllIntersectionAndUnion(), compute, zds,
                  batch_size, cachefile)


def conditional_samples(acts, segs):
    """Pair activations with segmentation labels: yields (label, rows of
    acts at positions with that label), plus (0, all rows) — the all-pixels
    condition (reference tally.py:218-249).

    acts (B, H, W, C) NHWC; segs (B, M, H', W') multi-label int maps.
    """
    acts = np.asarray(acts)
    segs = np.asarray(segs)
    b, h, w, c = acts.shape
    if segs.shape[-2:] != (h, w):
        # nearest-neighbor align labels onto the activation grid (handles
        # larger, smaller, and non-multiple segmentation resolutions)
        ys = (np.arange(h) * segs.shape[-2] // h)
        xs = (np.arange(w) * segs.shape[-1] // w)
        segs = segs[:, :, ys][:, :, :, xs]
    flat_acts = acts.reshape(-1, c)
    flat_segs = segs.transpose(0, 2, 3, 1).reshape(-1, segs.shape[1])
    out = [(0, flat_acts)]
    labels = np.unique(flat_segs)
    for label in labels:
        if label == 0:
            continue
        mask = (flat_segs == label).any(axis=1)
        if mask.any():
            out.append((int(label), flat_acts[mask]))
    return out


# ---------------------------------------------------------------------------
# IoU / mutual-information statistics from conditional reducers
# (reference tally.py:483-620)
# ---------------------------------------------------------------------------

def iou_from_conditional_indicator_mean(condmv) -> jnp.ndarray:
    """RunningConditionalMean over 0/1 indicators -> (conditions, units)
    all-pairs IoU (reference tally.py:483-511)."""
    uncond = condmv.conditional(0)
    act = np.asarray(uncond.mean())
    units = act.shape[0]
    conditions = max(condmv.keys()) + 1
    gt = np.zeros(conditions, np.float32)
    isect = np.zeros((conditions, units), np.float32)
    for k in condmv.keys():
        gt[k] = condmv.conditional(k).count / uncond.count
        isect[k] = np.asarray(condmv.conditional(k).mean()) * gt[k]
    union = act[None, :] + gt[:, None] - isect
    return jnp.asarray(isect / np.maximum(union, 1e-20))


def intersection_over_union(arr):
    return arr[0, 0] / np.maximum(1 - arr[1, 1], 1e-20)


def mutual_information(arr):
    """arr is [[p(a&b), p(a&!b)], [p(!a&b), p(!a&!b)]] (+ trailing dims)
    (reference tally.py:592-602)."""
    total = 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        for j in range(2):
            for k in range(2):
                joint = arr[j, k]
                ind = arr[j].sum(axis=0) * arr[:, k].sum(axis=0)
                term = joint * np.log(joint / ind)
                total = total + np.nan_to_num(term)
    return np.maximum(total, 0)


def joint_entropy(arr):
    total = 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        for j in range(2):
            for k in range(2):
                joint = arr[j, k]
                total = total + np.nan_to_num(joint * np.log(joint))
    return np.maximum(-total, 0)


def information_quality_ratio(arr):
    with np.errstate(divide="ignore", invalid="ignore"):
        iqr = mutual_information(arr) / joint_entropy(arr)
    return np.nan_to_num(iqr)


def intersection_from_conditional_quantile(
        condq, statistic=lambda x: x[0, 0], cutoff=0.95, min_batches=2):
    """All-pairs statistics of thresholded activations vs conditions from
    per-condition quantile sketches (reference tally.py:551-585).
    Returns (units, conditions[, cutoffs])."""
    cutoff = np.atleast_1d(np.asarray(cutoff, np.float64))
    uncond = condq.conditional(0)
    units = uncond.units
    scores = np.zeros((units, max(condq.keys()) + 1) + cutoff.shape,
                      np.float32)
    actlevel = np.asarray(uncond.quantiles(cutoff))  # (units, n_cutoffs)
    for c in sorted(condq.keys()):
        rq = condq.conditional(c)
        if c == 0 or rq.batchcount < min_batches:
            continue
        condp = np.asarray(rq.normalize(actlevel))       # (units, n_cut)
        truth = float(rq.count) / uncond.count
        isect = truth * (1 - condp)
        pred = (1 - cutoff)[None, :]
        union = pred + truth - isect
        arr = np.stack([isect, pred - isect,
                        truth - isect, 1 - union]).reshape(
            (2, 2) + isect.shape)
        scores[:, c, ...] = statistic(arr)
    return jnp.asarray(scores if cutoff.shape != (1,)
                       else scores[..., 0])


def iou_from_conditional_quantile(condq, cutoff=0.95, min_batches=2):
    """(reference tally.py:514-527)"""
    return intersection_from_conditional_quantile(
        condq, statistic=intersection_over_union, cutoff=cutoff,
        min_batches=min_batches)


def mi_from_conditional_quantile(condq, cutoff=0.95, min_batches=2):
    return intersection_from_conditional_quantile(
        condq, statistic=mutual_information, cutoff=cutoff,
        min_batches=min_batches)


def iqr_from_conditional_quantile(condq, cutoff=0.95, min_batches=2):
    return intersection_from_conditional_quantile(
        condq, statistic=information_quality_ratio, cutoff=cutoff,
        min_batches=min_batches)


# ---------------------------------------------------------------------------
# Fully-jitted scan reduction (one XLA program, device-resident data)
# ---------------------------------------------------------------------------

def tally_second_moment_scan(rows_fn, zs, batch_size: int,
                             dim: Optional[int] = None, mesh=None,
                             axis: str = "data"):
    """Compute the uncentered second moment of ``rows_fn(zbatch)`` over all
    z in one compiled scan.  ``zs`` (N, zdim) must be divisible into
    (N//batch_size, batch_size, zdim); rows_fn returns (rows, dim).

    This is the TPU-native version of the reference's hot 1000-z loop
    (SURVEY.md stack 3.1): generator forward + xᵀx reduction fused into a
    single XLA program with no host round-trips.
    """
    zs = jnp.asarray(zs)
    n = zs.shape[0] - zs.shape[0] % batch_size
    zb = zs[:n].reshape(-1, batch_size, zs.shape[1])
    if mesh is not None:
        # shard each scan step's batch over the mesh: the xᵀx contraction
        # over the sharded sample axis compiles to a psum over ICI
        from jax.sharding import NamedSharding, PartitionSpec as P
        zb = jax.device_put(zb, NamedSharding(mesh, P(None, axis)))

    if dim is None:
        dim = jax.eval_shape(rows_fn, zb[0]).shape[-1]

    @jax.jit
    def run(zb):
        init = running.second_moment_init(dim)

        def step(state, z):
            return running.second_moment_update(state, rows_fn(z)), None
        state, _ = jax.lax.scan(step, init, zb)
        return state

    state = run(zb)
    rem = zs[n:]
    if rem.shape[0]:
        state = running.second_moment_update(state, rows_fn(rem))
    r = running.RunningSecondMoment()
    r.state = state
    return r
