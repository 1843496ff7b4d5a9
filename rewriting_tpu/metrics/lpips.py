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
        self._jitted_map = jax.jit(self._spatial_map)

    def _spatial_map(self, params, a, b):
        """The full-resolution spatial distance map (B, H, W): per-tap
        lin-weighted squared diffs, bilinear-upsampled and summed over
        taps (what the reference's spatial net-lin forward returns when
        called without a mask)."""
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
            total = total + jax.image.resize(
                dist, (dist.shape[0], h, w), method="bilinear")
        return total

    def distance_map(self, params, a, b):
        """(B, H, W) spatial LPIPS map (requires spatial=True semantics)."""
        return self._jitted_map(params, a, b)

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


# channels of the five tapped relu layers (relu1_2 .. relu5_3)
_TAP_CHANNELS = (64, 128, 256, 512, 512)


def _as_np(v):
    return np.asarray(getattr(v, "numpy", lambda: v)(), np.float32)


def lins_from_state_dict(lpips_sd) -> list:
    """Validating converter for the official PerceptualSimilarity linear
    ('lin') head checkpoint — the calibrated weights the reference's
    net-lin LPIPS loads (reference metrics/distances.py:18-33 via the
    PerceptualSimilarity submodule, weights/v0.1/vgg.pth).

    Accepts the three historical key layouts
    (``lin{i}.model.1.weight`` / ``lin{i}.1.weight`` / ``lin{i}.weight``),
    checks every head's size against the VGG16 tap channel plan, and
    rejects unconsumed tensors — any layout drift raises with a shape
    table instead of silently mis-scaling distances (the slimnet.py
    converter contract)."""
    sd = {k: _as_np(v) for k, v in dict(lpips_sd).items()}
    lins = []
    for i, c in enumerate(_TAP_CHANNELS):
        for key in (f"lin{i}.model.1.weight", f"lin{i}.1.weight",
                    f"lin{i}.weight"):
            if key in sd:
                w = sd.pop(key)
                break
        else:
            table = "\n".join(f"  {k}: {tuple(v.shape)}"
                              for k, v in sorted(sd.items()))
            raise KeyError(
                f"no lin{i} head found in LPIPS checkpoint; tensors "
                f"present:\n{table}\nIf the official vgg.pth uses other "
                "key names, extend lins_from_state_dict in "
                "rewriting_tpu/metrics/lpips.py.")
        if w.size != c:
            raise ValueError(
                f"lin{i} head has {w.size} weights (shape "
                f"{tuple(w.shape)}), expected {c} — not a VGG16 LPIPS "
                "head checkpoint")
        lins.append({"weight": jnp.asarray(w.reshape(-1))})
    leftover = sorted(sd)
    if leftover:
        raise ValueError(f"unconsumed LPIPS tensors: {leftover}")
    return lins


def uniform_lins() -> list:
    """The documented fallback when no calibrated heads are available:
    equal per-channel weighting (distances remain monotone in perceptual
    difference but are NOT calibrated LPIPS; see PARITY.md)."""
    return [{"weight": jnp.full((c,), 1.0 / c, jnp.float32)}
            for c in _TAP_CHANNELS]


def params_from_torch(vgg_sd, lpips_sd=None) -> Dict:
    """Convert torchvision vgg16 'features.N.weight/bias' (+ official
    LPIPS lin heads via lins_from_state_dict; uniform heads if
    lpips_sd is None)."""
    convs = []
    for idx in _CONV_IDXS:
        w = _as_np(vgg_sd[f"features.{idx}.weight"])
        b = _as_np(vgg_sd[f"features.{idx}.bias"])
        convs.append({"weight": jnp.asarray(w), "bias": jnp.asarray(b)})
    lins = (lins_from_state_dict(lpips_sd) if lpips_sd is not None
            else uniform_lins())
    return {"convs": convs, "lins": lins}
