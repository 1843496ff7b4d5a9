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
# is active.  The rewriter's solve/stat paths run StagePipeline windows
# too (their stage names match the schedule), so they pin the global
# policy explicitly via schedule_suspended() — an installed sampling
# schedule must never degrade the edit math.  Like the global policy,
# set BEFORE the first jit trace.
_SCHEDULE: Optional[Callable[[str], Optional[str]]] = None
_CURRENT_STAGE: contextvars.ContextVar = contextvars.ContextVar(
    "precision_stage", default=None)
_SCHEDULE_SUSPENDED: contextvars.ContextVar = contextvars.ContextVar(
    "precision_schedule_suspended", default=False)

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


@contextlib.contextmanager
def schedule_suspended():
    """Pin the GLOBAL policy for ops traced within: per-stage schedule
    overrides are ignored.  The rewriter's solver and statistics entry
    points (solve.insert_solve / linear variants, all_weights_insert,
    collect_2nd_moment) enter this around their traces so that a
    mixed-precision *sampling* schedule never leaks into the edit math,
    whose contract is the global parity tier.  Trace-time semantics: like
    the rest of the policy, the suspension must be active when the jitted
    function is first traced."""
    token = _SCHEDULE_SUSPENDED.set(True)
    try:
        yield
    finally:
        _SCHEDULE_SUSPENDED.reset(token)


def suspend_schedule_in(fn):
    """Wrap fn so ops traced inside it ignore the per-stage schedule.
    Works under jit: the suspension contextvar is live while the wrapped
    body executes, which is when tracing reads the policy."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with schedule_suspended():
            return fn(*args, **kwargs)
    return wrapped


def get_tier() -> str:
    """Resolved tier NAME for the current trace point (global policy or
    the active stage's schedule override).  Unlike get_precision this may
    return "int8" — the quantized-MXU serving tier, which is not a
    lax.Precision but a dtype swap handled at supporting conv sites (see
    models.stylegan2._make_dconv / ops/quant.py)."""
    tier = _PRECISION
    if _SCHEDULE is not None and not _SCHEDULE_SUSPENDED.get():
        stage = _CURRENT_STAGE.get()
        if stage is not None:
            override = _SCHEDULE(stage)
            if override is not None:
                tier = override
    return tier


def int8_active() -> bool:
    """True when the current stage's resolved tier is the int8 serving
    tier.  Conv sites that support the int8 MXU core consult this at
    trace time; all other ops in the stage fall back to bf16 via
    get_precision."""
    return get_tier() == "int8"


def get_precision() -> lax.Precision:
    tier = get_tier()
    # ops without an int8 path (demod dot, blur, style MLP) run the
    # throughput precision inside an int8-scheduled stage
    return _TIERS.get(tier, _TIERS["default"])


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
