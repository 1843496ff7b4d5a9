"""Matmul/conv precision policy.

TPU MXU defaults to bf16 multiplies; the rewriting pipeline's contract is
fp32-tolerance parity with the reference (BASELINE.md north star), so all
convs/matmuls on the parity path read the policy below at trace time.

- "highest": full fp32 (default — parity mode).  Every multiply and
  accumulate runs in fp32; this is fp32-FAITHFUL, not bit-stable: ops may
  pick the fastest fp32 formulation for the backend (e.g. the separable
  matmul form of narrow-channel FIR upsampling, ops/upfirdn2d.py), which
  reassociates sums and can move low-order bits vs another formulation.
  Parity tests therefore assert fp32-level tolerances, never bitwise
  equality across formulations.
- "default": bf16 MXU passes (throughput mode; use for benchmarking /
  preview sampling where bit-parity doesn't matter)

Set the policy *before* the first jit trace of the functions you care about.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Callable, Optional

from jax import lax

_PRECISION = "highest"

# per-stage mixed-precision schedule: stage name -> tier override (or None
# to keep the global tier).  Consulted only while a pipeline stage scope
# is active, so non-pipeline code (solvers, metrics) always sees the
# global policy.  Like the global policy, set BEFORE the first jit trace.
_SCHEDULE: Optional[Callable[[str], Optional[str]]] = None
_CURRENT_STAGE: contextvars.ContextVar = contextvars.ContextVar(
    "precision_stage", default=None)

_TIERS = {"highest": lax.Precision.HIGHEST,
          "high": lax.Precision.HIGH,
          "default": lax.Precision.DEFAULT}


def set_precision(p: str) -> None:
    global _PRECISION
    assert p in _TIERS, p
    _PRECISION = p


def set_precision_schedule(
        schedule: Optional[Callable[[str], Optional[str]]]) -> None:
    """Install (or clear, with None) a per-stage precision schedule.

    ``schedule(stage_name)`` returns a tier name to override the global
    policy for ops traced inside that pipeline stage, or None to keep it.
    See models.stylegan2.mixed_precision_schedule for the measured
    per-resolution policy (docs/PERF_NOTES.md round 4)."""
    global _SCHEDULE
    _SCHEDULE = schedule


@contextlib.contextmanager
def stage_scope(name: str):
    """Marks ops traced within as belonging to pipeline stage `name`
    (entered by StagePipeline around every stage call)."""
    token = _CURRENT_STAGE.set(name)
    try:
        yield
    finally:
        _CURRENT_STAGE.reset(token)


def get_precision() -> lax.Precision:
    tier = _PRECISION
    if _SCHEDULE is not None:
        stage = _CURRENT_STAGE.get()
        if stage is not None:
            override = _SCHEDULE(stage)
            if override is not None:
                tier = override
    return _TIERS[tier]


def cast_pytree(tree, dtype):
    """Cast all float leaves of a params/noise pytree (throughput mode:
    bf16 activations end-to-end give ~+20% over bf16-MXU-only on v5e;
    the stage functions are dtype-polymorphic)."""
    import jax
    import jax.numpy as jnp

    def cast(x):
        x = jnp.asarray(x)
        return x.astype(dtype) if jnp.issubdtype(x.dtype,
                                                 jnp.floating) else x
    return jax.tree_util.tree_map(cast, tree)
