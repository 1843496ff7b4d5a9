"""Precise RoI Pooling (PrRoI, Jia et al. ECCV'18) as closed-form hat
integrals — the TPU equivalent of the reference's CUDA extension
(utils/upsegmodel/prroi_pool/src/prroi_pooling_gpu_impl.cu).

PrRoI pooling averages the *continuous* bilinear interpolant of the feature
map over each bin.  Because bilinear interpolation is a separable sum of
hat functions, the exact bin integral factorizes:

    avg over [y0,y1]x[x0,x1] of f  =  (Wy F Wxᵀ) / area,
    Wy[i] = ∫ φ_i(y) dy over [y0,y1],  φ_i = the unit hat at grid point i

so the whole op is two small matmuls per bin axis — exact, differentiable,
and MXU-friendly.  Values outside the feature map are treated as zero
(matching the CUDA kernel)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _hat_integral_weights(n: int, lo: float, hi: float) -> np.ndarray:
    """∫_{lo}^{hi} φ_i(t) dt for unit hats centered at i = 0..n-1."""
    w = np.zeros(n, np.float64)

    def antider(i, t):
        # antiderivative of φ_i on each linear piece, clamped to support
        t = np.clip(t, i - 1.0, i + 1.0)
        if t <= i:
            u = t - (i - 1.0)
            return 0.5 * u * u
        u = t - i
        return 0.5 + u - 0.5 * u * u

    for i in range(n):
        a = max(lo, i - 1.0)
        b = min(hi, i + 1.0)
        if b > a:
            w[i] = antider(i, b) - antider(i, a)
    return w


def prroi_pool2d(features, rois, pooled_height: int, pooled_width: int,
                 spatial_scale: float = 1.0):
    """features (N, H, W, C) NHWC; rois (R, 5) rows of
    (batch_index, x0, y0, x1, y1) in input coordinates (reference
    functional signature, prroi_pool/functional.py:71).
    Returns (R, pooled_height, pooled_width, C)."""
    features = np.asarray(features, np.float32)
    rois = np.asarray(rois, np.float32)
    n, h, w, c = features.shape
    out = np.zeros((len(rois), pooled_height, pooled_width, c), np.float32)
    for r, roi in enumerate(rois):
        bi = int(roi[0])
        x0, y0, x1, y1 = roi[1:] * spatial_scale
        bin_h = (y1 - y0) / pooled_height
        bin_w = (x1 - x0) / pooled_width
        fmap = features[bi]
        for py in range(pooled_height):
            wy = _hat_integral_weights(h, y0 + py * bin_h,
                                       y0 + (py + 1) * bin_h)
            rows = np.tensordot(wy, fmap, axes=(0, 0))  # (W, C)
            for px in range(pooled_width):
                wx = _hat_integral_weights(w, x0 + px * bin_w,
                                           x0 + (px + 1) * bin_w)
                area = max(bin_h * bin_w, 1e-12)
                out[r, py, px] = np.tensordot(wx, rows,
                                              axes=(0, 0)) / area
    return jnp.asarray(out)


def prroi_pool_full_image(x, pooled: int):
    """The UPerNet PPM usage: the RoI is the whole feature map
    ((0,0)-(W,H), reference upsegmodel/models.py:333-339).  Weights depend
    only on (H, W, pooled), so this jits as two constant matmuls."""
    h, w = x.shape[1:3]
    wy = np.stack([_hat_integral_weights(h, i * h / pooled,
                                         (i + 1) * h / pooled)
                   for i in range(pooled)]).astype(np.float32)
    wx = np.stack([_hat_integral_weights(w, i * w / pooled,
                                         (i + 1) * w / pooled)
                   for i in range(pooled)]).astype(np.float32)
    area = (h / pooled) * (w / pooled)
    from ..ops.precision import get_precision
    out = jnp.einsum("oh,nhwc->nowc", jnp.asarray(wy), x,
                     precision=get_precision())
    out = jnp.einsum("pw,nowc->nopc", jnp.asarray(wx), out,
                     precision=get_precision())
    return out / area
