"""Bounded multi-stream device->host fetch.

The streaming metric drivers (metrics/sample.py, metrics/seg_stats.py)
are downlink-bound through a remote-device transport: the reference's
single-GPU equivalent is a PCIe copy (~10 GB/s, free), but on a
networked accelerator runtime the device->host link is the 10k
pipeline's wall (measured here: ~13 MB/s on one stream, saturating at
~18 MB/s aggregate with 2+ concurrent streams — docs/PERF_NOTES.md
round 3).  `np.asarray` on a jax Array releases the GIL for the
duration of the transfer, so a small thread pool overlaps multiple
in-flight fetches AND lets host work (PNG encode workers, decode
readahead) run inside the transfer waits.

`AsyncFetcher` keeps driver code sequential: submit device arrays with
a tag, get `(tag, np.ndarray)` pairs delivered to a consumer callback
IN SUBMISSION ORDER, with a bounded in-flight window so device memory
holding un-fetched outputs stays capped.
"""

from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class AsyncFetcher:
    """Overlapped, order-preserving device->host fetches.

    consume: callback receiving (tag, host_array) for each submitted
        batch, called in submission order from the submitting thread.
    streams: fetch threads (2 saturates this image's tunnel; more adds
        contention — measured sweep in docs/PERF_NOTES.md).
    window: max un-consumed batches in flight; bounds both device
        memory pinned by pending outputs and host memory of fetched-
        but-unconsumed results.
    """

    def __init__(self, consume, streams: int = 2, window: int = 4):
        assert window >= 1
        self._consume = consume
        self._pool = ThreadPoolExecutor(max_workers=max(1, streams))
        self._window = window
        self._futs = deque()  # (tag, future) in submission order

    def submit(self, tag, device_array) -> None:
        """Queue one batch; blocks (consuming the oldest) only when the
        window is full."""
        self._futs.append(
            (tag, self._pool.submit(np.asarray, device_array)))
        while len(self._futs) > self._window:
            self._drain_one()

    def _drain_one(self) -> None:
        tag, fut = self._futs.popleft()
        self._consume(tag, fut.result())

    def drain(self) -> None:
        """Consume everything still in flight (call once after the last
        submit; close() also drains)."""
        while self._futs:
            self._drain_one()

    def close(self) -> None:
        try:
            self.drain()
        finally:
            self._pool.shutdown(wait=True)

    def abort(self) -> None:
        """Tear down WITHOUT consuming in-flight work — the error-path
        close.  Draining through a faulted device can block forever and
        orphaned fetch threads contend the host link for whatever runs
        next; dropping the pending futures releases both."""
        self._futs.clear()
        self._pool.shutdown(wait=False, cancel_futures=True)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *exc):
        if exc_type is not None:
            self.abort()
        else:
            self.close()
