"""Streaming statistics as jit-compatible reducer states.

The reference implements these as stateful accumulator classes over torch
tensors (utils/runningstats.py).  Here every reducer is a *pure functional
core* — ``init() -> state``, ``update(state, batch) -> state``,
``merge(a, b) -> state`` — over a dict-of-arrays pytree, so a reduction can
run as a jitted ``lax.scan`` over batches on one chip, or data-parallel over
a device mesh where per-shard states are combined with ``merge`` (a psum-like
tree reduction over ICI).  Thin OO wrappers keep the reference's ergonomic
API (``r2m.add(batch); r2m.moment()``) and its npz ``state_dict`` round-trip
contract (runningstats.py:121-134).

All ``update`` functions are linear-algebra formulations (matmuls feed the
MXU; no per-sample python loops):

- SecondMoment: uncentered sum x xᵀ / n — the statistic the rewriter's ZCA
  uses (reference runningstats.py:1072-1120).
- Variance/Covariance/CrossCovariance: Chan-style numerically stable merges
  (reference :748-819, :879-980, :983-1069).
- TopK: fixed (units, k+B) concat + lax.top_k compaction (reference keeps a
  5k-slot buffer and compacts on overflow, :31-145).
- Bincount: fixed-length bincount accumulation (reference :1123-1178).
- AllIntersectionAndUnion: indicator-matmul intersection counts (:1286-1344).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray
State = Dict[str, Array]


def _to_np_state(state: State) -> Dict[str, np.ndarray]:
    return {k: np.asarray(v) for k, v in state.items()}


class _Running:
    """Base OO wrapper: holds a state pytree, serializes to/from npz dicts
    with a `constructor` tag (matching the reference tally cache format)."""

    _constructor: str = ""

    def __init__(self, state=None):
        self.state = state

    def state_dict(self) -> Dict[str, np.ndarray]:
        d = _to_np_state(self.state)
        d["constructor"] = np.array(self._constructor)
        return d

    @classmethod
    def from_state_dict(cls, d):
        state = {k: jnp.asarray(v) for k, v in d.items()
                 if k != "constructor"}
        obj = cls.__new__(cls)
        obj.state = state
        return obj

    def set_state_dict(self, d):
        self.state = {k: jnp.asarray(v) for k, v in d.items()
                      if k != "constructor"}


# ---------------------------------------------------------------------------
# Mean
# ---------------------------------------------------------------------------

def mean_init(shape, dtype=jnp.float32) -> State:
    return {"count": jnp.zeros((), jnp.float32),
            "mean": jnp.zeros(shape, dtype)}


@jax.jit
def mean_update(state: State, batch: Array) -> State:
    nb = jnp.float32(batch.shape[0])
    count = state["count"] + nb
    bmean = jnp.mean(batch, axis=0)
    return {"count": count,
            "mean": state["mean"] + (bmean - state["mean"]) * (nb / count)}


@jax.jit
def mean_merge(a: State, b: State) -> State:
    count = a["count"] + b["count"]
    w = jnp.where(count > 0, b["count"] / jnp.maximum(count, 1e-20), 0.0)
    return {"count": count, "mean": a["mean"] + (b["mean"] - a["mean"]) * w}


class RunningMean(_Running):
    _constructor = "rewriting_tpu.stats.RunningMean"

    def add(self, batch):
        batch = jnp.asarray(batch).reshape(-1, *jnp.shape(batch)[1:])
        if self.state is None:
            self.state = mean_init(batch.shape[1:], batch.dtype)
        self.state = mean_update(self.state, batch)

    def mean(self):
        return self.state["mean"]

    @property
    def count(self):
        return float(self.state["count"])


# ---------------------------------------------------------------------------
# Uncentered second moment (the rewriter's key statistic)
# ---------------------------------------------------------------------------

def second_moment_init(dim: int, dtype=jnp.float32) -> State:
    return {"count": jnp.zeros((), jnp.float32),
            "mom": jnp.zeros((dim, dim), dtype)}


@jax.jit
def second_moment_update(state: State, batch: Array) -> State:
    """batch (N, C): mom' = (n*mom + batchᵀbatch) / (n + N). The matmul is
    the MXU hot path; stable incremental weighting avoids overflow."""
    nb = jnp.float32(batch.shape[0])
    count = state["count"] + nb
    xtx = jnp.dot(batch.T, batch, precision=jax.lax.Precision.HIGHEST)
    return {"count": count,
            "mom": state["mom"] + (xtx - nb * state["mom"]) / count}


@jax.jit
def second_moment_merge(a: State, b: State) -> State:
    count = a["count"] + b["count"]
    w = jnp.where(count > 0, b["count"] / jnp.maximum(count, 1e-20), 0.0)
    return {"count": count, "mom": a["mom"] + (b["mom"] - a["mom"]) * w}


class RunningSecondMoment(_Running):
    _constructor = "rewriting_tpu.stats.RunningSecondMoment"

    def add(self, batch):
        batch = jnp.asarray(batch)
        if self.state is None:
            self.state = second_moment_init(batch.shape[-1], batch.dtype)
        self.state = second_moment_update(self.state, batch)

    def moment(self):
        return self.state["mom"]

    @property
    def count(self):
        return float(self.state["count"])


# ---------------------------------------------------------------------------
# Variance (per-unit, Chan update)
# ---------------------------------------------------------------------------

def variance_init(shape, dtype=jnp.float32) -> State:
    return {"count": jnp.zeros((), jnp.float32),
            "mean": jnp.zeros(shape, dtype),
            "m2": jnp.zeros(shape, dtype)}


@jax.jit
def variance_update(state: State, batch: Array) -> State:
    nb = jnp.float32(batch.shape[0])
    count = state["count"] + nb
    bmean = jnp.mean(batch, axis=0)
    bm2 = jnp.sum(jnp.square(batch - bmean), axis=0)
    delta = bmean - state["mean"]
    w = nb / count
    return {"count": count,
            "mean": state["mean"] + delta * w,
            "m2": state["m2"] + bm2 + jnp.square(delta) * state["count"] * w}


@jax.jit
def variance_merge(a: State, b: State) -> State:
    count = a["count"] + b["count"]
    safe = jnp.maximum(count, 1e-20)
    delta = b["mean"] - a["mean"]
    return {"count": count,
            "mean": a["mean"] + delta * (b["count"] / safe),
            "m2": a["m2"] + b["m2"]
                  + jnp.square(delta) * a["count"] * b["count"] / safe}


class RunningVariance(_Running):
    _constructor = "rewriting_tpu.stats.RunningVariance"

    def add(self, batch):
        batch = jnp.asarray(batch)
        if self.state is None:
            self.state = variance_init(batch.shape[1:], batch.dtype)
        self.state = variance_update(self.state, batch)

    def mean(self):
        return self.state["mean"]

    def variance(self, unbiased=True):
        n = self.state["count"]
        return self.state["m2"] / jnp.maximum(n - (1.0 if unbiased else 0.0),
                                              1e-20)

    def stdev(self, unbiased=True):
        return jnp.sqrt(self.variance(unbiased))

    @property
    def count(self):
        return float(self.state["count"])


# ---------------------------------------------------------------------------
# Covariance (full matrix, Chan update)
# ---------------------------------------------------------------------------

def covariance_init(dim: int, dtype=jnp.float32) -> State:
    return {"count": jnp.zeros((), jnp.float32),
            "mean": jnp.zeros((dim,), dtype),
            "cmom2": jnp.zeros((dim, dim), dtype)}


@jax.jit
def covariance_update(state: State, batch: Array) -> State:
    nb = jnp.float32(batch.shape[0])
    count = state["count"] + nb
    bmean = jnp.mean(batch, axis=0)
    centered = batch - bmean
    bc2 = jnp.dot(centered.T, centered, precision=jax.lax.Precision.HIGHEST)
    delta = bmean - state["mean"]
    w = nb / count
    return {"count": count,
            "mean": state["mean"] + delta * w,
            "cmom2": state["cmom2"] + bc2
                     + jnp.outer(delta, delta) * state["count"] * w}


@jax.jit
def covariance_merge(a: State, b: State) -> State:
    count = a["count"] + b["count"]
    safe = jnp.maximum(count, 1e-20)
    delta = b["mean"] - a["mean"]
    return {"count": count,
            "mean": a["mean"] + delta * (b["count"] / safe),
            "cmom2": a["cmom2"] + b["cmom2"]
                     + jnp.outer(delta, delta) * a["count"] * b["count"]
                     / safe}


class RunningCovariance(_Running):
    _constructor = "rewriting_tpu.stats.RunningCovariance"

    def add(self, batch):
        batch = jnp.asarray(batch)
        if self.state is None:
            self.state = covariance_init(batch.shape[-1], batch.dtype)
        self.state = covariance_update(self.state, batch)

    def mean(self):
        return self.state["mean"]

    def covariance(self, unbiased=True):
        n = self.state["count"]
        return self.state["cmom2"] / jnp.maximum(
            n - (1.0 if unbiased else 0.0), 1e-20)

    def correlation(self):
        cov = self.covariance()
        rstd = jax.lax.rsqrt(jnp.maximum(jnp.diag(cov), 1e-30))
        return cov * rstd[:, None] * rstd[None, :]

    def variance(self, unbiased=True):
        return jnp.diag(self.covariance(unbiased))

    @property
    def count(self):
        return float(self.state["count"])


# ---------------------------------------------------------------------------
# Cross covariance (off-diagonal block between two feature sets)
# ---------------------------------------------------------------------------

def cross_covariance_init(dim_a: int, dim_b: int, dtype=jnp.float32) -> State:
    return {"count": jnp.zeros((), jnp.float32),
            "mean_a": jnp.zeros((dim_a,), dtype),
            "mean_b": jnp.zeros((dim_b,), dtype),
            "cmom2": jnp.zeros((dim_a, dim_b), dtype)}


@jax.jit
def cross_covariance_update(state: State, a: Array, b: Array) -> State:
    nb = jnp.float32(a.shape[0])
    count = state["count"] + nb
    amean, bmean = jnp.mean(a, axis=0), jnp.mean(b, axis=0)
    cc = jnp.dot((a - amean).T, b - bmean,
                 precision=jax.lax.Precision.HIGHEST)
    da, db = amean - state["mean_a"], bmean - state["mean_b"]
    w = nb / count
    return {"count": count,
            "mean_a": state["mean_a"] + da * w,
            "mean_b": state["mean_b"] + db * w,
            "cmom2": state["cmom2"] + cc
                     + jnp.outer(da, db) * state["count"] * w}


class RunningCrossCovariance(_Running):
    _constructor = "rewriting_tpu.stats.RunningCrossCovariance"

    def add(self, a, b):
        a, b = jnp.asarray(a), jnp.asarray(b)
        if self.state is None:
            self.state = cross_covariance_init(a.shape[-1], b.shape[-1],
                                               a.dtype)
        self.state = cross_covariance_update(self.state, a, b)

    def mean(self):
        return self.state["mean_a"], self.state["mean_b"]

    def cross_covariance(self, unbiased=True):
        n = self.state["count"]
        return self.state["cmom2"] / jnp.maximum(
            n - (1.0 if unbiased else 0.0), 1e-20)

    @property
    def count(self):
        return float(self.state["count"])


# ---------------------------------------------------------------------------
# Bincount
# ---------------------------------------------------------------------------

def bincount_init(size: int) -> State:
    return {"count": jnp.zeros((), jnp.float32),
            "bins": jnp.zeros((size,), jnp.float32)}


@functools.partial(jax.jit, static_argnames=("size",))
def bincount_update(state: State, batch: Array, size: int) -> State:
    bins = state["bins"] + jnp.bincount(batch.reshape(-1), length=size)
    return {"count": state["count"] + batch.shape[0], "bins": bins}


class RunningBincount(_Running):
    _constructor = "rewriting_tpu.stats.RunningBincount"

    def __init__(self, size: int = 1024, state=None):
        super().__init__(state)
        self.size = size

    def add(self, batch, size=None):
        if self.state is None:
            self.state = bincount_init(size or self.size)
        self.state = bincount_update(self.state, jnp.asarray(batch),
                                     self.state["bins"].shape[0])

    def result(self):
        return self.state["bins"]

    @property
    def count(self):
        return float(self.state["count"])


# ---------------------------------------------------------------------------
# TopK (per-unit top scores + the sample indices that achieved them)
# ---------------------------------------------------------------------------

def topk_init(units: int, k: int) -> State:
    return {"count": jnp.zeros((), jnp.int32),
            "values": jnp.full((units, k), -jnp.inf, jnp.float32),
            "indices": jnp.zeros((units, k), jnp.int32)}


@jax.jit
def topk_update(state: State, batch: Array) -> State:
    """batch (B, units): merge batch scores into the per-unit top-k."""
    b = batch.shape[0]
    scores = batch.T.astype(jnp.float32)                     # (units, B)
    idx = state["count"] + jnp.arange(b, dtype=jnp.int32)    # global sample ids
    all_vals = jnp.concatenate([state["values"], scores], axis=1)
    all_idx = jnp.concatenate(
        [state["indices"], jnp.broadcast_to(idx, scores.shape)], axis=1)
    k = state["values"].shape[1]
    top_vals, pos = jax.lax.top_k(all_vals, k)
    top_idx = jnp.take_along_axis(all_idx, pos, axis=1)
    return {"count": state["count"] + b, "values": top_vals,
            "indices": top_idx}


class RunningTopK(_Running):
    _constructor = "rewriting_tpu.stats.RunningTopK"

    def __init__(self, k: int = 100, state=None):
        super().__init__(state)
        self.k = k

    def add(self, batch):
        batch = jnp.asarray(batch)
        if batch.ndim == 1:
            batch = batch[:, None]
        if self.state is None:
            self.state = topk_init(batch.shape[1], self.k)
        self.state = topk_update(self.state, batch)

    def result(self):
        """(values (units,k), indices (units,k)) sorted descending, matching
        reference RunningTopK.result() (runningstats.py:96-119)."""
        return self.state["values"], self.state["indices"]

    @property
    def count(self):
        return int(self.state["count"])


# ---------------------------------------------------------------------------
# GatherTensor: lazily-allocated (unit, rank) -> data grid for top-k
# visualizations (reference runningstats.py:204-266)
# ---------------------------------------------------------------------------

class GatherTensor:
    """Collects one data row per (unit, rank) slot, allocated on first
    add; used to gather e.g. the image crops of each unit's top-k
    activations without holding everything in memory."""

    def __init__(self, topk=None, k: Optional[int] = None):
        self.topk = topk
        self.k = k if k is not None else (topk.k if topk else None)
        self._data = None

    def add(self, unit: int, rank: int, value):
        value = np.asarray(value)
        if self._data is None:
            units = (self.topk.state["values"].shape[0]
                     if self.topk is not None else unit + 1)
            self._data = np.zeros((units, self.k) + value.shape,
                                  value.dtype)
        if unit >= self._data.shape[0]:  # grow lazily
            grown = np.zeros((unit + 1,) + self._data.shape[1:],
                             self._data.dtype)
            grown[:self._data.shape[0]] = self._data
            self._data = grown
        self._data[unit, rank] = value

    def result(self):
        return self._data

    def state_dict(self):
        return {"constructor": np.array(
            "rewriting_tpu.stats.GatherTensor"),
            "k": np.array(self.k),
            "data": self._data if self._data is not None
            else np.zeros((0, 0))}

    def set_state_dict(self, d):
        self.k = int(d["k"])
        data = np.asarray(d["data"])
        self._data = data if data.size else None


# ---------------------------------------------------------------------------
# All-pairs intersection and union (for IoU label matching)
# ---------------------------------------------------------------------------

def iou_init(n_a: int, n_b: int) -> State:
    return {"intersection": jnp.zeros((n_a, n_b), jnp.float32),
            "total_a": jnp.zeros((n_a,), jnp.float32),
            "total_b": jnp.zeros((n_b,), jnp.float32),
            "count": jnp.zeros((), jnp.float32)}


@jax.jit
def iou_update(state: State, masks_a: Array, masks_b: Array) -> State:
    """masks_* (N, n_units) boolean/0-1 indicators per sample position.
    Intersection counts via a single indicator matmul (MXU), mirroring the
    reference's SᵀG trick (runningstats.py:1322-1325)."""
    a = masks_a.astype(jnp.float32)
    b = masks_b.astype(jnp.float32)
    return {"intersection": state["intersection"]
            + jnp.dot(a.T, b, precision=jax.lax.Precision.HIGHEST),
            "total_a": state["total_a"] + jnp.sum(a, axis=0),
            "total_b": state["total_b"] + jnp.sum(b, axis=0),
            "count": state["count"] + a.shape[0]}


class RunningAllIntersectionAndUnion(_Running):
    _constructor = "rewriting_tpu.stats.RunningAllIntersectionAndUnion"

    def add(self, masks_a, masks_b):
        masks_a, masks_b = jnp.asarray(masks_a), jnp.asarray(masks_b)
        if self.state is None:
            self.state = iou_init(masks_a.shape[1], masks_b.shape[1])
        self.state = iou_update(self.state, masks_a, masks_b)

    def iou(self):
        inter = self.state["intersection"]
        union = (self.state["total_a"][:, None]
                 + self.state["total_b"][None, :] - inter)
        return inter / jnp.maximum(union, 1e-20)

    def intersection(self):
        return self.state["intersection"]


# ---------------------------------------------------------------------------
# Conditional variants: host-side dict of per-condition reducers
# (conditions are data-dependent label sets — inherently host-driven,
#  mirroring reference RunningConditional* classes, runningstats.py:148-201,
#  623-745, 822-876)
# ---------------------------------------------------------------------------

class _RunningConditional:
    _inner_cls = None
    _constructor = ""

    def __init__(self, **kwargs):
        self.stats = {}
        self.kwargs = kwargs

    def add(self, condition, *batches):
        if condition not in self.stats:
            self.stats[condition] = self._inner_cls(**self.kwargs)
        self.stats[condition].add(*batches)

    def keys(self):
        return self.stats.keys()

    def conditional(self, condition):
        return self.stats[condition]

    def has_conditional(self, condition):
        return condition in self.stats

    def most_common_conditions(self, n):
        counts = sorted(((s.count, c) for c, s in self.stats.items()),
                        reverse=True)
        return [c for _, c in counts[:n]]

    def state_dict(self):
        d = {"constructor": np.array(self._constructor),
             "conditions": np.array([repr(c) for c in self.stats])}
        for c, s in self.stats.items():
            for k, v in s.state_dict().items():
                d[f"c.{c!r}.{k}"] = v
        return d

    def set_state_dict(self, d):
        conds = [c for c in d["conditions"]]
        for c_repr in conds:
            prefix = f"c.{c_repr}."
            sub = {k[len(prefix):]: v for k, v in d.items()
                   if k.startswith(prefix)}
            import ast
            try:
                cond = ast.literal_eval(c_repr)
            except (ValueError, SyntaxError):
                cond = c_repr
            inner = self._inner_cls(**self.kwargs)
            inner.set_state_dict(sub)
            self.stats[cond] = inner


class RunningConditionalMean(_RunningConditional):
    _inner_cls = RunningMean
    _constructor = "rewriting_tpu.stats.RunningConditionalMean"


class RunningConditionalVariance(_RunningConditional):
    _inner_cls = RunningVariance
    _constructor = "rewriting_tpu.stats.RunningConditionalVariance"


class RunningConditionalTopK(_RunningConditional):
    _inner_cls = RunningTopK
    _constructor = "rewriting_tpu.stats.RunningConditionalTopK"


class RunningConditionalQuantile(_RunningConditional):
    _constructor = "rewriting_tpu.stats.RunningConditionalQuantile"

    def __init__(self, **kwargs):
        from .quantile import RunningQuantile
        super().__init__(**kwargs)
        self._inner_cls = RunningQuantile
