"""Streaming per-unit quantile sketch.

The reference uses a KLL-style sketch (Karnin-Lang-Liberty FOCS'16) with
multi-level sorted buffers and random-offset downsampling (reference:
utils/runningstats.py:269-620).  This is a from-scratch implementation of
the same idea shaped for the TPU execution model:

- All buffers have *static* shapes (units, capacity); fill levels are
  host-side integers, so every device op (sort / concat / gather) compiles
  once per fill configuration.  Compaction is a device sort + strided gather.
- The summary query side (``quantiles``, ``normalize``, ``integrate``) runs
  on host numpy — it is called once per statistic, not per batch.

Guarantees mirrored from the reference self-test (runningstats.py:1205-1283):
exact min/max, and quantile estimates within a small relative rank error for
adversarially ordered streams (validated in tests/test_stats.py).
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np


class RunningQuantile:
    """Per-unit streaming quantiles over batches shaped (N, units)."""

    def __init__(self, resolution: int = 6 * 1024, seed: int = 0,
                 state=None):
        self.resolution = int(resolution)
        # level capacity: power-of-two chunk of the resolution budget
        self.cap = max(32, int(resolution) // 2)
        self.rng = np.random.RandomState(seed)
        self.units: Optional[int] = None
        self.count = 0.0
        self.batchcount = 0
        # levels[i]: numpy (units, cap) sorted-insertion buffer; fill[i] int
        self.levels: List[np.ndarray] = []
        self.fill: List[int] = []
        self.extremes: Optional[np.ndarray] = None  # (units, 2) min/max
        if state is not None:
            self.set_state_dict(state)

    # -- ingest -------------------------------------------------------------
    def _ensure(self, units: int):
        if self.units is None:
            self.units = units
            self.levels = [np.empty((units, self.cap), np.float32)]
            self.fill = [0]
            self.extremes = np.stack(
                [np.full(units, np.inf, np.float32),
                 np.full(units, -np.inf, np.float32)], axis=1)
        assert units == self.units, (units, self.units)

    def add(self, batch):
        """batch (N, units) — device or host array."""
        batch = np.asarray(batch, dtype=np.float32)
        if batch.ndim == 1:
            batch = batch[:, None]
        self._ensure(batch.shape[1])
        x = batch.T  # (units, N)
        self.extremes[:, 0] = np.minimum(self.extremes[:, 0], x.min(axis=1))
        self.extremes[:, 1] = np.maximum(self.extremes[:, 1], x.max(axis=1))
        self.count += batch.shape[0]
        self.batchcount += 1
        n = x.shape[1]
        pos = 0
        while pos < n:
            space = self.cap - self.fill[0]
            if space == 0:
                self._compact(0)
                space = self.cap - self.fill[0]
            take = min(space, n - pos)
            self.levels[0][:, self.fill[0]:self.fill[0] + take] = (
                x[:, pos:pos + take])
            self.fill[0] += take
            pos += take

    def _compact(self, level: int):
        """Sort the full level buffer, keep every other element (random
        offset), push the survivors (weight doubled) one level up."""
        assert self.fill[level] == self.cap
        buf = np.sort(self.levels[level][:, :self.cap], axis=1)
        offset = int(self.rng.randint(2))
        survivors = buf[:, offset::2]             # (units, cap // 2)
        self.fill[level] = 0
        if level + 1 == len(self.levels):
            self.levels.append(np.empty((self.units, self.cap), np.float32))
            self.fill.append(0)
        if self.cap - self.fill[level + 1] < survivors.shape[1]:
            self._compact(level + 1)
        f = self.fill[level + 1]
        self.levels[level + 1][:, f:f + survivors.shape[1]] = survivors
        self.fill[level + 1] += survivors.shape[1]

    # -- summary ------------------------------------------------------------
    def _summary(self):
        """(values (units, M) sorted, weights (M,)) merged across levels."""
        vals, weights = [], []
        for lvl, (buf, f) in enumerate(zip(self.levels, self.fill)):
            if f > 0:
                vals.append(buf[:, :f])
                weights.append(np.full(f, 2.0 ** lvl, np.float32))
        if not vals:
            z = np.zeros((self.units or 1, 1), np.float32)
            return z, np.ones(1, np.float32)
        v = np.concatenate(vals, axis=1)
        w = np.concatenate(weights)
        order = np.argsort(v, axis=1)
        v = np.take_along_axis(v, order, axis=1)
        w = w[order]  # (units, M)
        return v, w

    def quantiles(self, qs):
        """Per-unit quantile estimates; qs scalar or array in [0,1].
        Returns (units, len(qs)). Endpoints are the exact extremes."""
        qs = np.atleast_1d(np.asarray(qs, dtype=np.float64))
        v, w = self._summary()
        if w.ndim == 1:
            w = np.broadcast_to(w[None, :], v.shape)
        cum = np.cumsum(w, axis=1)
        total = cum[:, -1:]
        # midpoint rank positions of each summary sample
        positions = (cum - w / 2.0) / total
        out = np.empty((v.shape[0], len(qs)), np.float32)
        for u in range(v.shape[0]):
            out[u] = np.interp(qs, positions[u], v[u],
                               left=self.extremes[u, 0],
                               right=self.extremes[u, 1])
        # exact endpoints
        out[:, qs <= 0.0] = self.extremes[:, :1]
        out[:, qs >= 1.0] = self.extremes[:, 1:]
        return jnp.asarray(out)

    def normalize(self, values):
        """Estimated CDF per unit: values (units, N) -> quantile ranks in
        [0,1] (reference runningstats.py:598-620)."""
        values = np.asarray(values, dtype=np.float32)
        squeeze = values.ndim == 1
        if squeeze:
            values = values[:, None]
        v, w = self._summary()
        if w.ndim == 1:
            w = np.broadcast_to(w[None, :], v.shape)
        cum = np.cumsum(w, axis=1)
        total = cum[:, -1]
        out = np.empty_like(values)
        for u in range(v.shape[0]):
            idx = np.searchsorted(v[u], values[u], side="right")
            ranks = np.where(idx > 0, cum[u][np.maximum(idx - 1, 0)], 0.0)
            out[u] = ranks / total[u]
        out = np.clip(out, 0.0, 1.0)
        return jnp.asarray(out[:, 0] if squeeze else out)

    def integrate(self, fun):
        """Weighted integral sum_i w_i * fun(v_i) per unit
        (reference runningstats.py:575-589)."""
        v, w = self._summary()
        if w.ndim == 1:
            w = np.broadcast_to(w[None, :], v.shape)
        return jnp.asarray(np.sum(np.asarray(fun(v)) * w, axis=1))

    def mean(self):
        v, w = self._summary()
        if w.ndim == 1:
            w = np.broadcast_to(w[None, :], v.shape)
        return jnp.asarray(np.sum(v * w, axis=1) / np.sum(w, axis=1))

    def min(self):
        return jnp.asarray(self.extremes[:, 0])

    def max(self):
        return jnp.asarray(self.extremes[:, 1])

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
             "extremes": (self.extremes if self.extremes is not None
                          else np.zeros((0, 2), np.float32))}
        for i, (buf, f) in enumerate(zip(self.levels, self.fill)):
            d[f"level_{i}"] = buf[:, :f].copy()
        return d

    def set_state_dict(self, d):
        self.resolution = int(d["resolution"])
        self.cap = int(d["cap"])
        self.count = float(d["count"])
        self.batchcount = int(d.get("batchcount", 0))
        units = int(d["units"])
        self.units = units if units else None
        self.fill = [int(f) for f in d["fill"]]
        self.extremes = np.asarray(d["extremes"], np.float32)
        self.levels = []
        for i, f in enumerate(self.fill):
            buf = np.empty((units, self.cap), np.float32)
            buf[:, :f] = np.asarray(d[f"level_{i}"], np.float32)
            self.levels.append(buf)
