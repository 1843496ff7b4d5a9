"""Symmetric int8 quantization primitives for the serving path.

TPU MXUs advertise 2x int8 throughput over bf16 (v5e: 394 vs 197
TOP/s).  These primitives implement the standard W8A8 recipe — static
per-output-channel weight scales, dynamic per-tensor activation scales,
int32 accumulation, float dequantize epilogue — as pure jittable
functions, so a conv stage can swap its matmul core for the int8 MXU
without changing anything around it.

Whether the swap *pays* on a given XLA/toolchain is an empirical
question (scripts/bench_int8_probe.py measures it on the StyleGAN2
hot-layer shapes; docs/PERF_NOTES.md records the verdict).  The math
here is backend-independent and exactness-tested on CPU against an
explicit float emulation of the same rounding.

Measured verdict on TPU v5e (round 5, docs/PERF_NOTES.md): NOT
recommended — the MXU int8 core is real (1.31-1.78x microbench) but the
unfusable activation-quant HBM pass and the per-tensor scale collapse
under style modulation leave every int8 schedule strictly dominated by
the plain bf16 "default" tier (slower AND lower PSNR end-to-end).  Kept
as an explicit opt-in for backends where the full 2x int8 peak is
delivered; the known quality fix (per-input-channel activation scales
folded into the weight scales) is described in the PERF_NOTES entry.

Reference counterpart: none — the reference (davidbau/rewriting) is
fp32-only (setup/renv.yml:6-9); this is a TPU-native serving tier
alongside ops/precision.py's bf16 policy.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# int8 symmetric range.  -128 is excluded so negation stays in range and
# the zero-point is exactly representable.
_QMAX = 127.0
# floor for scales so all-zero tensors quantize to zeros instead of
# producing inf/nan scales.
_EPS = 1e-12


def quantize_weight_per_channel(w, axis: int = 0):
    """Quantize a float weight to int8 with one scale per slice of `axis`.

    Returns ``(w_i8, scale)`` with ``scale`` shaped like `w` reduced over
    every axis but `axis` (kept as size-1 dims, so ``w_i8 * scale``
    broadcasts back to the dequantized weight).
    """
    w = jnp.asarray(w, jnp.float32)
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis % w.ndim)
    scale = jnp.maximum(
        jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True), _EPS) / _QMAX
    w_i8 = jnp.clip(jnp.round(w / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return w_i8, scale


def quantize_activation(x):
    """Dynamic symmetric per-tensor activation quantization.

    Returns ``(x_i8, scale)`` where ``scale`` is a float32 scalar.  The
    max-reduce is a cheap VPU pass XLA fuses with the producer; per-tensor
    (not per-channel) so the conv's dequantize stays a rank-1 rescale.
    """
    x = jnp.asarray(x)
    scale = (jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32), _EPS)
             / _QMAX)
    x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                    -_QMAX, _QMAX).astype(jnp.int8)
    return x_i8, scale


def conv2d_w8a8(x, w_i8, w_scale, *, window_strides=(1, 1),
                padding=((1, 1), (1, 1)), lhs_dilation=None,
                out_dtype=jnp.float32):
    """3x3-style conv with an int8 MXU core and float epilogue.

    `x` is float NHWC; `w_i8`/`w_scale` come from
    :func:`quantize_weight_per_channel` on an OIHW weight (axis=0).  The
    activation is quantized per dispatch (dynamic range), the conv
    accumulates in int32, and the result is dequantized by the combined
    ``x_scale * w_scale[o]`` factor.
    """
    x_i8, x_scale = quantize_activation(x)
    acc = lax.conv_general_dilated(
        x_i8, w_i8, window_strides, padding, lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        preferred_element_type=jnp.int32)
    # w_scale is (O,1,1,1) for OIHW axis=0 -> broadcast over the NHWC
    # channel-last output as (O,).  Dequantize in fp32 (the int32
    # accumulator is exact; a low-precision out_dtype only rounds once,
    # at the final cast).
    rescale = x_scale * w_scale.reshape(-1).astype(jnp.float32)
    return (acc.astype(jnp.float32) * rescale).astype(out_dtype)


def dequantize(w_i8, scale, dtype=jnp.float32):
    """Inverse of :func:`quantize_weight_per_channel` (up to rounding)."""
    return w_i8.astype(dtype) * scale.astype(dtype)
