"""Tracing/profiling helpers — the TPU equivalents of the reference's
wall-clock instrumentation (reference: ganrewrite.py return_timing +
torch.cuda.synchronize, SURVEY.md §5): block-until-ready timers and
jax.profiler trace capture."""

from __future__ import annotations

import contextlib
import time
from typing import Callable


def timed(fn: Callable, *args, iters: int = 1, warmup: int = 1, **kwargs):
    """(result, elapsed_ms_per_iter) with device synchronization — the
    equivalent of the reference's return_timing=True measurements."""
    import jax
    result = None
    for _ in range(warmup):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    return result, (time.perf_counter() - t0) * 1000.0 / iters


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace viewable in TensorBoard /
    Perfetto."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in profiler traces."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
