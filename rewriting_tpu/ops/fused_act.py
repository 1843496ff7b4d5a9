"""Fused bias + leaky-ReLU + scale.

The reference implements this as a custom CUDA kernel with a hand-written
double-backward (utils/stylegan2/op/fused_act.py, fused_bias_act_kernel.cu):

    y = scale * leaky_relu(x + b),  slope 0.2, scale sqrt(2)

On TPU this is a pure VPU elementwise op that XLA fuses into the preceding
convolution's epilogue, so a hand-written kernel would only add dispatch
overhead; the jnp formulation below compiles to exactly the fused epilogue,
and autodiff provides the (double-)backward for free.

Layout: NHWC (or any layout where the channel axis is last) — ``bias`` is a
(C,) vector broadcast over the trailing axis.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

SQRT2 = math.sqrt(2.0)


def fused_leaky_relu(x, bias=None, negative_slope: float = 0.2,
                     scale: float = SQRT2):
    """y = scale * leaky_relu(x + bias); bias broadcasts over the last axis."""
    if bias is not None:
        x = x + bias
    return scale * jnp.where(x >= 0, x, negative_slope * x)


def leaky_relu(x, negative_slope: float = 0.2):
    return jnp.where(x >= 0, x, negative_slope * x)
