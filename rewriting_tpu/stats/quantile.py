"""Streaming per-unit quantile sketch.

The reference uses a KLL-style sketch (Karnin-Lang-Liberty FOCS'16) with
multi-level sorted buffers and random-offset downsampling (reference:
utils/runningstats.py:269-620).  This is a from-scratch implementation of
the same idea shaped for the TPU execution model:

- Level buffers are *device* arrays with static shapes (units, capacity).
  Ingest is a jitted ``lax.dynamic_update_slice`` write; compaction is a
  jitted device ``jnp.sort`` + strided slice.  Incoming batches never
  synchronize to host.
- Fill counters are host-side integers.  They are data-INdependent (the
  compaction cadence depends only on element counts), so for a fixed batch
  size the fill sequence cycles through a small set of configurations and
  every device op compiles once per configuration.
- The summary query side (``quantiles``, ``normalize``, ``integrate``) runs
  on host numpy — it is called once per statistic, not per batch.

Guarantees mirrored from the reference self-test (runningstats.py:1205-1283):
exact min/max, and quantile estimates within ~1/1000-ile rank error for
adversarially ordered streams (validated in tests/test_stats.py with the
reference's 0.1% bound at the default resolution; measured ~0.0003
across seeds for 50k-1M-sample adversarial streams).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@jax.jit
def _extremes_update(extremes, x):
    """extremes (units, 2); x (units, n) -> updated extremes."""
    return jnp.stack([jnp.minimum(extremes[:, 0], x.min(axis=1)),
                      jnp.maximum(extremes[:, 1], x.max(axis=1))], axis=1)


@functools.partial(jax.jit, static_argnames=("fill",))
def _write(buf, chunk, fill: int):
    """Write chunk (units, take) into buf (units, cap) at column `fill`."""
    return lax.dynamic_update_slice(buf, chunk, (0, fill))


@functools.partial(jax.jit, static_argnames=("offset",))
def _compact_full(buf, offset: int):
    """Sort a full buffer and keep every other element starting at the
    random offset (weights double one level up). buf (units, cap) with cap
    even -> survivors (units, cap // 2)."""
    s = jnp.sort(buf, axis=1)
    return s[:, offset::2]


class RunningQuantile:
    """Per-unit streaming quantiles over batches shaped (N, units)."""

    def __init__(self, resolution: int = 6 * 1024, seed: int = 0,
                 state=None):
        self.resolution = int(resolution)
        # level capacity: power-of-two chunk of the resolution budget
        self.cap = max(32, int(resolution) // 2)
        assert self.cap % 2 == 0
        self.rng = np.random.RandomState(seed)
        self.units: Optional[int] = None
        self.count = 0.0
        self.batchcount = 0
        # levels[i]: device (units, cap) buffer; fill[i] host int
        self.levels: List[jnp.ndarray] = []
        self.fill: List[int] = []
        self.extremes: Optional[jnp.ndarray] = None  # (units, 2) min/max
        # query-side caches, keyed on _version (bumped by every mutation):
        # the merged summary and its offset-flattened search index
        self._version = 0
        self._summary_cache = None
        self._flat_cache = {}
        if state is not None:
            self.set_state_dict(state)

    # -- ingest -------------------------------------------------------------
    def _ensure(self, units: int):
        if self.units is None:
            self.units = units
            self.levels = [jnp.zeros((units, self.cap), jnp.float32)]
            self.fill = [0]
            self.extremes = jnp.stack(
                [jnp.full((units,), jnp.inf, jnp.float32),
                 jnp.full((units,), -jnp.inf, jnp.float32)], axis=1)
        assert units == self.units, (units, self.units)

    def add(self, batch):
        """batch (N, units) — stays on device; no host math."""
        batch = jnp.asarray(batch)
        if batch.dtype != jnp.float32:
            batch = batch.astype(jnp.float32)
        if batch.ndim == 1:
            batch = batch[:, None]
        self._ensure(batch.shape[1])
        x = batch.T  # (units, N)
        self.extremes = _extremes_update(self.extremes, x)
        self.count += batch.shape[0]
        self.batchcount += 1
        self._version += 1
        n = x.shape[1]
        pos = 0
        while pos < n:
            space = self.cap - self.fill[0]
            if space == 0:
                self._compact(0)
                space = self.cap - self.fill[0]
            take = min(space, n - pos)
            self.levels[0] = _write(self.levels[0],
                                    lax.slice(x, (0, pos), (x.shape[0],
                                                            pos + take)),
                                    self.fill[0])
            self.fill[0] += take
            pos += take

    def _compact(self, level: int):
        """Device sort + strided slice; survivors (weight doubled) move one
        level up. Fill bookkeeping stays on host."""
        assert self.fill[level] == self.cap
        survivors = _compact_full(self.levels[level],
                                  int(self.rng.randint(2)))
        self.fill[level] = 0
        if level + 1 == len(self.levels):
            self.levels.append(jnp.zeros((self.units, self.cap),
                                         jnp.float32))
            self.fill.append(0)
        if self.cap - self.fill[level + 1] < survivors.shape[1]:
            self._compact(level + 1)
        self.levels[level + 1] = _write(self.levels[level + 1], survivors,
                                        self.fill[level + 1])
        self.fill[level + 1] += survivors.shape[1]

    # -- summary ------------------------------------------------------------
    def _summary(self):
        """(values (units, M) sorted, weights (units, M)) merged across
        levels — host numpy.  Memoized on the mutation version: interactive
        query paths (gandissect scoring, Search ranking) call this many
        times against a frozen sketch."""
        if (self._summary_cache is not None
                and self._summary_cache[0] == self._version):
            return self._summary_cache[1]
        out = self._summary_uncached()
        self._summary_cache = (self._version, out)
        return out

    def _summary_uncached(self):
        vals, weights = [], []
        for lvl, (buf, f) in enumerate(zip(self.levels, self.fill)):
            if f > 0:
                vals.append(np.asarray(buf[:, :f]))
                weights.append(np.full(f, 2.0 ** lvl, np.float32))
        if not vals:
            z = np.zeros((self.units or 1, 1), np.float32)
            return z, np.ones((self.units or 1, 1), np.float32)
        v = np.concatenate(vals, axis=1)
        w = np.concatenate(weights)
        order = np.argsort(v, axis=1)
        v = np.take_along_axis(v, order, axis=1)
        w = w[order]  # (units, M)
        return v, w

    def _np_extremes(self):
        return np.asarray(self.extremes)

    # Crossover between the two _row_searchsorted strategies, measured on
    # this image's 1-core host at U=512, M=4096 (see docs/PERF_NOTES.md
    # round 5): the cached flat search is 9.7x faster at N=1 and ~1.07x at
    # N=64, but 0.74x at N=6400 — its binary searches are log2(U*M) deep
    # instead of log2(M), which loses once the per-row numpy-call overhead
    # is amortized over many queries per unit.
    _FLAT_SEARCH_MAX_N = 128

    def _flat_index(self, key, a):
        """Offset-flattened copy of row-sorted a (U, M), cached per sketch
        version, so repeated interactive queries pay the O(U*M) transform
        once. Returns None when a is non-finite (flat offsets would NaN)."""
        tag = (self._version, key)
        hit = self._flat_cache.get(key)
        if hit is not None and hit[0] == tag[0]:
            return hit[1]
        a64 = np.asarray(a, np.float64)
        if not np.isfinite(a64).all():
            entry = None
        else:
            lo = a64.min() - 1.0
            hi = a64.max() + 1.0
            span = (hi - lo) + 1.0
            offs = np.arange(a64.shape[0], dtype=np.float64)[:, None] * span
            entry = ((a64 - lo) + offs).ravel(), lo, hi, offs
        self._flat_cache[key] = (self._version, entry)
        return entry

    def _row_searchsorted(self, key, a, b, side="left"):
        """Batched per-row searchsorted: a (U, M) row-sorted, b (U, N) ->
        indices (U, N) in [0, M].  Hybrid, measured on this host (see
        _FLAT_SEARCH_MAX_N): small-N interactive queries go through one
        flat ``np.searchsorted`` over a version-cached row-offset copy of
        a; bulk queries (gandissect scoring over all pixels x units,
        rewrite/rewriter.py:441-451) keep the per-row loop, which wins
        there because each search stays log2(M) deep."""
        a = np.asarray(a)
        b = np.asarray(b)
        U, M = a.shape
        entry = (self._flat_index(key, a)
                 if b.shape[1] <= self._FLAT_SEARCH_MAX_N else None)
        if entry is not None and np.isfinite(b).all():
            a_flat, lo, hi, offs = entry
            b64 = np.clip(b.astype(np.float64), lo, hi)
            flat = np.searchsorted(a_flat, (b64 - lo) + offs, side)
            return flat - np.arange(U)[:, None] * M
        return np.stack([np.searchsorted(a[u], b[u], side)
                         for u in range(U)])

    def quantiles(self, qs):
        """Per-unit quantile estimates; qs scalar or array in [0,1].
        Returns (units, len(qs)). Endpoints are the exact extremes."""
        qs = np.atleast_1d(np.asarray(qs, dtype=np.float64))
        v, w = self._summary()
        extremes = self._np_extremes()
        cum = np.cumsum(w, axis=1)
        total = cum[:, -1:]
        # midpoint rank positions of each summary sample; strictly
        # increasing per row (w > 0), so linear interpolation between
        # neighbors reproduces np.interp without the per-unit loop
        positions = (cum - w / 2.0) / total
        U, M = positions.shape
        i = self._row_searchsorted("positions", positions,
                                   np.broadcast_to(qs, (U, len(qs))),
                                   side="right")
        lo_i = np.clip(i - 1, 0, M - 1)
        hi_i = np.clip(i, 0, M - 1)
        plo = np.take_along_axis(positions, lo_i, axis=1)
        phi = np.take_along_axis(positions, hi_i, axis=1)
        vlo = np.take_along_axis(v.astype(np.float64), lo_i, axis=1)
        vhi = np.take_along_axis(v.astype(np.float64), hi_i, axis=1)
        denom = phi - plo
        t = np.clip((qs[None, :] - plo)
                    / np.where(denom > 0, denom, 1.0), 0.0, 1.0)
        out = vlo + t * (vhi - vlo)
        # outside the summary's rank range: the exact extremes
        out = np.where(qs[None, :] < positions[:, :1],
                       extremes[:, :1].astype(np.float64), out)
        out = np.where(qs[None, :] > positions[:, -1:],
                       extremes[:, 1:].astype(np.float64), out)
        out = out.astype(np.float32)
        # exact endpoints
        out[:, qs <= 0.0] = extremes[:, :1]
        out[:, qs >= 1.0] = extremes[:, 1:]
        return jnp.asarray(out)

    def normalize(self, values):
        """Estimated CDF per unit: values (units, N) -> quantile ranks in
        [0,1] (reference runningstats.py:598-620)."""
        values = np.asarray(values, dtype=np.float32)
        squeeze = values.ndim == 1
        if squeeze:
            values = values[:, None]
        v, w = self._summary()
        cum = np.cumsum(w, axis=1)
        total = cum[:, -1]
        idx = self._row_searchsorted("values", v, values, side="right")
        ranks = np.where(idx > 0,
                         np.take_along_axis(cum, np.maximum(idx - 1, 0),
                                            axis=1), 0.0)
        out = (ranks / total[:, None]).astype(np.float32)
        out = np.clip(out, 0.0, 1.0)
        return jnp.asarray(out[:, 0] if squeeze else out)

    def integrate(self, fun):
        """Weighted integral sum_i w_i * fun(v_i) per unit
        (reference runningstats.py:575-589)."""
        v, w = self._summary()
        return jnp.asarray(np.sum(np.asarray(fun(v)) * w, axis=1))

    def mean(self):
        v, w = self._summary()
        return jnp.asarray(np.sum(v * w, axis=1) / np.sum(w, axis=1))

    def min(self):
        return jnp.asarray(self._np_extremes()[:, 0])

    def max(self):
        return jnp.asarray(self._np_extremes()[:, 1])

    @property
    def size(self):
        return self.count

    # -- serialization --------------------------------------------------------
    def state_dict(self):
        d = {"constructor": np.array("rewriting_tpu.stats.RunningQuantile"),
             "resolution": np.array(self.resolution),
             "cap": np.array(self.cap),
             "count": np.array(self.count),
             "batchcount": np.array(self.batchcount),
             "units": np.array(self.units if self.units else 0),
             "fill": np.array(self.fill, np.int64),
             "extremes": (self._np_extremes()
                          if self.extremes is not None
                          else np.zeros((0, 2), np.float32))}
        for i, (buf, f) in enumerate(zip(self.levels, self.fill)):
            d[f"level_{i}"] = np.asarray(buf[:, :f])
        return d

    def set_state_dict(self, d):
        self._version += 1
        self._summary_cache = None
        self._flat_cache = {}
        self.resolution = int(d["resolution"])
        self.cap = int(d["cap"])
        self.count = float(d["count"])
        self.batchcount = int(d.get("batchcount", 0))
        units = int(d["units"])
        self.units = units if units else None
        self.fill = [int(f) for f in d["fill"]]
        self.extremes = jnp.asarray(np.asarray(d["extremes"], np.float32))
        self.levels = []
        for i, f in enumerate(self.fill):
            buf = np.zeros((units, self.cap), np.float32)
            buf[:, :f] = np.asarray(d[f"level_{i}"], np.float32)
            self.levels.append(jnp.asarray(buf))
