"""Shared functional NN helpers for the segmenter ports (NHWC, inference
only — BatchNorms are folded into convs at checkpoint conversion)."""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.precision import get_precision


def conv(x, p: Dict, stride: int = 1, padding: int = 0, relu: bool = False,
         dilation: int = 1, groups: int = 1, relu6: bool = False):
    """NHWC conv with OIHW weight + bias (+ optional relu/relu6). `groups`
    maps to feature_group_count (grouped/depthwise convs: ResNeXt,
    MobileNetV2)."""
    out = lax.conv_general_dilated(
        x, p["weight"], (stride, stride),
        ((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        feature_group_count=groups,
        precision=get_precision())
    if "bias" in p:
        out = out + p["bias"]
    if relu6:
        return jnp.clip(out, 0.0, 6.0)
    return jax.nn.relu(out) if relu else out


def maxpool(x, k=3, s=2, p=1):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k, 1),
                             (1, s, s, 1), ((0, 0), (p, p), (p, p), (0, 0)))


def global_avg_pool(x):
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def resize_bilinear(x, size: Tuple[int, int], align_corners: bool = False):
    """torch F.interpolate(bilinear) parity for both align_corners modes."""
    n, h, w, c = x.shape
    th, tw = size
    if not align_corners:
        return jax.image.resize(x, (n, th, tw, c), method="bilinear")
    # align_corners=True: source = dst * (in-1)/(out-1)
    ys = jnp.linspace(0.0, h - 1.0, th)
    xs = jnp.linspace(0.0, w - 1.0, tw)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    cduck = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + cduck * wy * (1 - wx) + d * wy * wx)


def resize_nearest(x, size: Tuple[int, int]):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method="nearest")


def _adaptive_weights(in_n: int, out_n: int) -> np.ndarray:
    """torch AdaptiveAvgPool bin-averaging weights: (out_n, in_n)."""
    w = np.zeros((out_n, in_n), np.float32)
    for i in range(out_n):
        lo = (i * in_n) // out_n
        hi = -((-(i + 1) * in_n) // out_n)  # ceil
        w[i, lo:hi] = 1.0 / (hi - lo)
    return w


def adaptive_avg_pool(x, size: Tuple[int, int]):
    """Exact torch AdaptiveAvgPool2d semantics (integer bin boundaries),
    as used by the multi-resolution voting resize (reference
    segmenter.py:268-271)."""
    wy = jnp.asarray(_adaptive_weights(x.shape[1], size[0]))
    wx = jnp.asarray(_adaptive_weights(x.shape[2], size[1]))
    out = jnp.einsum("oh,nhwc->nowc", wy, x, precision=get_precision())
    return jnp.einsum("pw,nowc->nopc", wx, out, precision=get_precision())


# ---------------------------------------------------------------------------
# parameter init / conversion helpers
# ---------------------------------------------------------------------------

def init_conv(key, out_c, in_c, k, scale=None):
    kh, kw = (k, k) if isinstance(k, int) else k
    if scale is None:
        scale = 1.0 / math.sqrt(in_c * kh * kw)
    return {"weight": jax.random.normal(key, (out_c, in_c, kh, kw),
                                        jnp.float32) * scale,
            "bias": jnp.zeros((out_c,), jnp.float32)}


def fold_bn(sd, conv_key: str, bn_prefix: Optional[str], eps: float = 1e-5
            ) -> Dict:
    """Fold 'bn_prefix.{weight,bias,running_mean,running_var}' into the
    conv at conv_key. bn_prefix=None -> plain conv (+bias if present)."""
    def as_np(v):
        return np.asarray(getattr(v, "numpy", lambda: v)(), np.float32)

    w = as_np(sd[conv_key + ".weight"])
    b = as_np(sd[conv_key + ".bias"]) if conv_key + ".bias" in sd else \
        np.zeros(w.shape[0], np.float32)
    if bn_prefix is not None:
        g = as_np(sd[bn_prefix + ".weight"])
        beta = as_np(sd[bn_prefix + ".bias"])
        mean = as_np(sd[bn_prefix + ".running_mean"])
        var = as_np(sd[bn_prefix + ".running_var"])
        scale = g / np.sqrt(var + eps)
        w = w * scale[:, None, None, None]
        b = beta + (b - mean) * scale
    return {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}
