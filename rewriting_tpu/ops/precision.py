"""Matmul/conv precision policy.

TPU MXU defaults to bf16 multiplies; the rewriting pipeline's contract is
fp32-tolerance parity with the reference (BASELINE.md north star), so all
convs/matmuls on the parity path read the policy below at trace time.

- "highest": full fp32 (default — parity mode)
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
