"""Backend-aware jit defaults for the hot paths.

On TPU, a 64 MiB scoped-vmem scratch limit measurably helps both the
sampling pipeline (+1.2%) and dramatically the edit-solve scan (1149 ms ->
624 ms on v5e; see docs/PERF_NOTES.md).  CPU (tests) gets a plain jit.
Resolved lazily at first call so importing never touches the backend."""

from __future__ import annotations

import jax

TPU_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def tuned_jit(fn=None, **jit_kwargs):
    """Drop-in jax.jit replacement applying TPU compiler options."""
    if fn is None:
        return lambda f: tuned_jit(f, **jit_kwargs)
    jitted = {}

    def call(*args, **kwargs):
        tracing = any(isinstance(x, jax.core.Tracer)
                      for x in jax.tree_util.tree_leaves((args, kwargs)))
        if tracing:
            # nested under an outer jit/vmap: compiler_options are only
            # legal on a top-level jit, and the outer trace will compile
            # this anyway — inline
            return fn(*args, **kwargs)
        backend = jax.default_backend()
        if backend not in jitted:
            opts = TPU_OPTIONS if backend != "cpu" else None
            try:
                jitted[backend] = jax.jit(fn, compiler_options=opts,
                                          **jit_kwargs)
            except Exception:
                jitted[backend] = jax.jit(fn, **jit_kwargs)
        return jitted[backend](*args, **kwargs)

    call.__wrapped__ = fn
    return call
