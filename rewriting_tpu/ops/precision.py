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

from jax import lax

_PRECISION = "highest"


def set_precision(p: str) -> None:
    global _PRECISION
    assert p in ("highest", "high", "default"), p
    _PRECISION = p


def get_precision() -> lax.Precision:
    return {"highest": lax.Precision.HIGHEST,
            "high": lax.Precision.HIGH,
            "default": lax.Precision.DEFAULT}[_PRECISION]


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
