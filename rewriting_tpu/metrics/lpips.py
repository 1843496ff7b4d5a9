"""LPIPS perceptual distance (net-lin VGG16, spatial) in JAX.

Role equivalent of the reference's PerceptualLoss wrapper around the
PerceptualSimilarity submodule (reference: metrics/distances.py:18-59, the
masked 'undesired change' metric).  Implements the standard LPIPS pipeline:
imagenet-style rescaling, VGG16 relu1_2..relu5_3 features, channel-unit
normalization, squared differences, learned non-negative 1x1 heads,
spatially-upsampled maps combined under an optional mask.

Weights: ``params_from_torch(vgg_sd, lpips_sd)`` converts torchvision VGG16
features + an LPIPS 'lin' checkpoint; ``init_params`` gives random weights
(pipeline tests; not calibrated distances).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.precision import get_precision

# VGG16 cfg 'D' conv channel plan; features after each relu slice
_VGG_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]
# torchvision features indices of the conv layers
_CONV_IDXS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
# relu positions (count of convs applied) after which to tap features
_TAP_AFTER_CONV = [2, 4, 7, 10, 13]  # relu1_2, 2_2, 3_3, 4_3, 5_3

# LPIPS input scaling constants
_SHIFT = np.array([-.030, -.088, -.188], np.float32)
_SCALE = np.array([.458, .448, .450], np.float32)


def _conv_relu(x, p):
    out = lax.conv_general_dilated(
        x, p["weight"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        precision=get_precision())
    return jax.nn.relu(out + p["bias"])


def _maxpool2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), ((0, 0), (0, 0), (0, 0), (0, 0)))


def vgg16_taps(params: Dict, x):
    """x (B,H,W,3) zc -> list of 5 tapped relu feature maps."""
    taps = []
    conv_i = 0
    for item in _VGG_PLAN:
        if item == "M":
            x = _maxpool2(x)
        else:
            x = _conv_relu(x, params["convs"][conv_i])
            conv_i += 1
            if conv_i in _TAP_AFTER_CONV:
                taps.append(x)
    return taps


def _unit_normalize(x, eps=1e-10):
    return x * lax.rsqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True)
                         + eps)


class LPIPS:
    """lpips(params, a, b[, mask]) -> scalar distance per batch element.

    a/b are zc [-1,1] NHWC images; mask (B,H,W) or (B,H,W,1) weights the
    spatial distance map (the reference's masked LPIPS)."""

    def __init__(self, spatial: bool = True):
        self.spatial = spatial
        self._jitted = jax.jit(self._forward)

    def _forward(self, params, a, b, mask=None):
        # imagenet-style scaling (the LPIPS 'ScalingLayer')
        def prep(x):
            return (x - _SHIFT) / _SCALE
        taps_a = vgg16_taps(params, prep(jnp.asarray(a, jnp.float32)))
        taps_b = vgg16_taps(params, prep(jnp.asarray(b, jnp.float32)))
        h, w = a.shape[1:3]
        total = 0.0
        for i, (fa, fb) in enumerate(zip(taps_a, taps_b)):
            diff = jnp.square(_unit_normalize(fa) - _unit_normalize(fb))
            lin = jnp.maximum(params["lins"][i]["weight"], 0.0)  # (C,)
            dist = jnp.einsum("bhwc,c->bhw", diff, lin)
            if self.spatial:
                dist = jax.image.resize(dist, (dist.shape[0], h, w),
                                        method="bilinear")
                if mask is not None:
                    m = jnp.asarray(mask, jnp.float32).reshape(
                        mask.shape[0], h, w)
                    dist = jnp.sum(dist * m, axis=(1, 2)) / (
                        jnp.sum(m, axis=(1, 2)) + 1e-10)
                else:
                    dist = jnp.mean(dist, axis=(1, 2))
            else:
                dist = jnp.mean(dist, axis=(1, 2))
            total = total + dist
        return total

    def __call__(self, params, a, b, mask=None):
        return self._jitted(params, a, b, mask)

    # -- params ------------------------------------------------------------------
    @staticmethod
    def init_params(key) -> Dict:
        convs = []
        in_c = 3
        tap_cs = []
        conv_i = 0
        for item in _VGG_PLAN:
            if item == "M":
                continue
            key, k1 = jax.random.split(key)
            convs.append({
                "weight": jax.random.normal(
                    k1, (item, in_c, 3, 3), jnp.float32)
                / math.sqrt(in_c * 9),
                "bias": jnp.zeros((item,), jnp.float32)})
            in_c = item
            conv_i += 1
            if conv_i in _TAP_AFTER_CONV:
                tap_cs.append(item)
        key, k2 = jax.random.split(key)
        lins = [{"weight": jax.random.uniform(
            jax.random.fold_in(k2, i), (c,), jnp.float32)}
            for i, c in enumerate(tap_cs)]
        return {"convs": convs, "lins": lins}


def params_from_torch(vgg_sd, lpips_sd=None) -> Dict:
    """Convert torchvision vgg16 'features.N.weight/bias' + LPIPS
    'lin{k}.model.1.weight' heads (uniform heads if lpips_sd is None)."""
    def as_np(v):
        return np.asarray(getattr(v, "numpy", lambda: v)(), np.float32)

    convs = []
    for idx in _CONV_IDXS:
        w = as_np(vgg_sd[f"features.{idx}.weight"])
        b = as_np(vgg_sd[f"features.{idx}.bias"])
        convs.append({"weight": jnp.asarray(w), "bias": jnp.asarray(b)})
    tap_cs = [64, 128, 256, 512, 512]
    lins = []
    for i, c in enumerate(tap_cs):
        if lpips_sd is not None:
            w = as_np(lpips_sd[f"lin{i}.model.1.weight"]).reshape(-1)
        else:
            w = np.full((c,), 1.0 / c, np.float32)
        lins.append({"weight": jnp.asarray(w)})
    return {"convs": convs, "lins": lins}
