"""Worker pool for I/O-heavy side work (image/stat saving).

Role equivalent of the reference's multiprocess workerpool
(utils/workerpool.py): a pool of workers drains a task queue so the
device-driving thread never blocks on disk I/O; ``join`` flushes and stops.

TPU-native twist: the default workers are *threads*, not processes.  The
pool's workload here is file I/O plus GIL-releasing C calls (the native
ctypes PNG encoder, zlib, PIL's encoders), so threads give the same
parallelism without fork-from-threaded-runtime hazards (the JAX runtime is
heavily threaded) and without spawn/forkserver's __main__ re-import (which
breaks notebook/REPL parents).  Pass ``start_method='fork'|'spawn'|
'forkserver'`` for CPU-bound pure-Python work that needs real processes.
"""

from __future__ import annotations

import atexit
import os
import queue as _queue
import threading


def default_nworkers(cap: int = 4) -> int:
    """Worker count for the save/encode pools: `cap` by default,
    constrained by the REWRITING_TPU_SAVE_WORKERS env var.

    The caps (8 image writers / 4 seg writers) are the configuration the
    round-3 pipeline numbers were measured with; on multi-core hosts the
    encoders release the GIL (native PNG deflate, npz zlib) so the
    threads parallelize, while a round-4 A/B on a 1-core TPU-tunnel host
    found worker count makes no measurable difference there (the stages
    are device->host transfer-bound — docs/PERF_NOTES.md round 4).  The
    env knob exists for processes that must stay responsive while
    cohabiting with the pools on a starved host: the test suite sets it
    to cpu_count so writer threads can't starve an nbclient kernel's
    heartbeat on 1-core CI (the round-3 DeadKernelError flake class)."""
    env = os.environ.get("REWRITING_TPU_SAVE_WORKERS")
    if env:
        return max(1, min(cap, int(env)))
    return max(1, cap)


class WorkerBase:
    """Subclass and override work(*args); optionally setup()/finish()."""

    def __init__(self):
        self.setup()

    def setup(self):
        pass

    def work(self, *args, **kwargs):  # pragma: no cover - abstract
        raise NotImplementedError

    def finish(self):
        pass


def _drain(worker, q):
    while True:
        task = q.get()
        if task is None:
            break
        args, kwargs = task
        try:
            worker.work(*args, **kwargs)
        except Exception:
            import traceback
            traceback.print_exc()
    worker.finish()


def _process_main(worker_cls, init_args, q):  # pragma: no cover
    import signal
    signal.signal(signal.SIGINT, signal.SIG_IGN)  # parent handles ctrl-C
    _drain(worker_cls(*init_args), q)


class WorkerPool:
    def __init__(self, worker=WorkerBase, nworkers=None,
                 maxqueue: int = 64, init_args=(),
                 start_method: str = "thread"):
        if nworkers is None:
            nworkers = default_nworkers(4)
        self._closed = False
        if start_method == "thread":
            self.queue = _queue.Queue(maxsize=maxqueue)
            self.procs = [
                threading.Thread(target=_drain,
                                 args=(worker(*init_args), self.queue),
                                 daemon=True)
                for _ in range(nworkers)]
        else:
            import multiprocessing as mp
            ctx = mp.get_context(start_method)
            self.queue = ctx.Queue(maxsize=maxqueue)
            self.procs = [
                ctx.Process(target=_process_main,
                            args=(worker, init_args, self.queue),
                            daemon=True)
                for _ in range(nworkers)]
        for p in self.procs:
            p.start()
        atexit.register(self.close)

    def add(self, *args, **kwargs):
        assert not self._closed, "pool already joined"
        self.queue.put((args, kwargs))

    def join(self):
        """Flush the queue and stop all workers."""
        if self._closed:
            return
        for _ in self.procs:
            self.queue.put(None)
        for p in self.procs:
            p.join()
        self._closed = True

    def close(self):
        if not self._closed:
            try:
                self.join()
            except Exception:
                for p in self.procs:
                    if hasattr(p, "terminate") and p.is_alive():
                        p.terminate()
                self._closed = True
