"""InceptionV3 pool3 feature extractor for FID, in JAX (NHWC).

The reference computes FID with the TF1 Inception graph loaded into a TF
session (reference: metrics/fid.py:31-131) — a process-level framework
boundary.  Here the standard FID Inception (torchvision layout, with the
pytorch-fid variant quirks) is a jitted NHWC forward so FID feature
extraction fuses into the same XLA pipeline as sampling.

Weights: convert a torchvision/pytorch-fid checkpoint with
``params_from_torch_state_dict`` (BatchNorms are folded into conv weights at
load time — inference only).  ``init_params`` gives random weights for
shape/pipeline tests.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.precision import get_precision


def _conv(x, p, stride=1, padding=(0, 0)):
    if isinstance(padding, int):
        padding = (padding, padding)
    out = lax.conv_general_dilated(
        x, p["weight"], window_strides=(stride, stride),
        padding=(padding[0] if isinstance(padding[0], tuple)
                 else (padding[0], padding[0]),
                 padding[1] if isinstance(padding[1], tuple)
                 else (padding[1], padding[1])),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        precision=get_precision())
    return jax.nn.relu(out + p["bias"])


def _maxpool(x, k=3, s=2, p=0):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k, 1),
                             (1, s, s, 1), ((0, 0), (p, p), (p, p), (0, 0)))


def _avgpool(x, k=3, s=1, p=1, count_include_pad=False):
    summed = lax.reduce_window(x, 0.0, lax.add, (1, k, k, 1), (1, s, s, 1),
                               ((0, 0), (p, p), (p, p), (0, 0)))
    if count_include_pad:
        return summed / (k * k)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = lax.reduce_window(ones, 0.0, lax.add, (1, k, k, 1),
                               (1, s, s, 1),
                               ((0, 0), (p, p), (p, p), (0, 0)))
    return summed / counts


def _inception_a(x, p):
    b1 = _conv(x, p["branch1x1"])
    b5 = _conv(_conv(x, p["branch5x5_1"]), p["branch5x5_2"], padding=2)
    b3 = _conv(_conv(_conv(x, p["branch3x3dbl_1"]), p["branch3x3dbl_2"],
                     padding=1), p["branch3x3dbl_3"], padding=1)
    bp = _conv(_avgpool(x), p["branch_pool"])
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(x, p):
    b3 = _conv(x, p["branch3x3"], stride=2)
    bd = _conv(_conv(_conv(x, p["branch3x3dbl_1"]), p["branch3x3dbl_2"],
                     padding=1), p["branch3x3dbl_3"], stride=2)
    return jnp.concatenate([b3, bd, _maxpool(x)], axis=-1)


def _inception_c(x, p):
    b1 = _conv(x, p["branch1x1"])
    b7 = _conv(_conv(_conv(x, p["branch7x7_1"]), p["branch7x7_2"],
                     padding=((0, 0), (3, 3))), p["branch7x7_3"],
               padding=((3, 3), (0, 0)))
    bd = x
    for name, pad in [("branch7x7dbl_1", (0, 0)),
                      ("branch7x7dbl_2", ((3, 3), (0, 0))),
                      ("branch7x7dbl_3", ((0, 0), (3, 3))),
                      ("branch7x7dbl_4", ((3, 3), (0, 0))),
                      ("branch7x7dbl_5", ((0, 0), (3, 3)))]:
        bd = _conv(bd, p[name], padding=pad if pad != (0, 0) else (0, 0))
    bp = _conv(_avgpool(x), p["branch_pool"])
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(x, p):
    b3 = _conv(_conv(x, p["branch3x3_1"]), p["branch3x3_2"], stride=2)
    b7 = _conv(_conv(_conv(x, p["branch7x7x3_1"]), p["branch7x7x3_2"],
                     padding=((0, 0), (3, 3))), p["branch7x7x3_3"],
               padding=((3, 3), (0, 0)))
    b7 = _conv(b7, p["branch7x7x3_4"], stride=2)
    return jnp.concatenate([b3, b7, _maxpool(x)], axis=-1)


def _inception_e(x, p, pool="avg"):
    b1 = _conv(x, p["branch1x1"])
    b3 = _conv(x, p["branch3x3_1"])
    b3 = jnp.concatenate([
        _conv(b3, p["branch3x3_2a"], padding=((0, 0), (1, 1))),
        _conv(b3, p["branch3x3_2b"], padding=((1, 1), (0, 0)))], axis=-1)
    bd = _conv(_conv(x, p["branch3x3dbl_1"]), p["branch3x3dbl_2"],
               padding=1)
    bd = jnp.concatenate([
        _conv(bd, p["branch3x3dbl_3a"], padding=((0, 0), (1, 1))),
        _conv(bd, p["branch3x3dbl_3b"], padding=((1, 1), (0, 0)))],
        axis=-1)
    # pytorch-fid's FIDInceptionE_2 uses max-pool in the pool branch
    pooled = _maxpool(x, 3, 1, 1) if pool == "max" else _avgpool(x)
    bp = _conv(pooled, p["branch_pool"])
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features:
    """images (B, H, W, 3) in [-1, 1] -> (B, 2048) pool3 features."""

    def __init__(self, resize_to: int = 299):
        self.resize_to = resize_to

    def __call__(self, params: Dict, images) -> jnp.ndarray:
        x = jnp.asarray(images)
        if x.dtype == jnp.uint8:
            # device-side normalize: bytes [0,255] -> zc [-1,1], the
            # renormalize("pt","zc") arithmetic.  4x fewer host-link
            # bytes; XLA folds /255*2 into one multiply, so values can
            # differ from the host fp32 pipeline by <=1 ulp (features
            # agree to ~1e-4 relative; labels/argmax are unaffected).
            x = x.astype(jnp.float32) / 255.0 * 2.0 - 1.0
        x = x.astype(jnp.float32)
        if x.shape[1:3] != (self.resize_to, self.resize_to):
            # plain bilinear (no antialias) to match the reference FID
            # pipeline's resize semantics
            x = jax.image.resize(
                x, (x.shape[0], self.resize_to, self.resize_to, 3),
                method="bilinear", antialias=False)
        x = _conv(x, params["Conv2d_1a_3x3"], stride=2)
        x = _conv(x, params["Conv2d_2a_3x3"])
        x = _conv(x, params["Conv2d_2b_3x3"], padding=1)
        x = _maxpool(x)
        x = _conv(x, params["Conv2d_3b_1x1"])
        x = _conv(x, params["Conv2d_4a_3x3"])
        x = _maxpool(x)
        for name in ["Mixed_5b", "Mixed_5c", "Mixed_5d"]:
            x = _inception_a(x, params[name])
        x = _inception_b(x, params["Mixed_6a"])
        for name in ["Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"]:
            x = _inception_c(x, params[name])
        x = _inception_d(x, params["Mixed_7a"])
        x = _inception_e(x, params["Mixed_7b"], pool="avg")
        x = _inception_e(x, params["Mixed_7c"], pool="max")
        return jnp.mean(x, axis=(1, 2))  # global average pool -> 2048

    # -- parameter construction ----------------------------------------------
    # (out_c, in_c, kh, kw) conv specs per torchvision module name
    _SPECS = None

    @classmethod
    def conv_specs(cls):
        if cls._SPECS is not None:
            return cls._SPECS
        specs = {}

        def add(name, o, i, k):
            kh, kw = (k, k) if isinstance(k, int) else k
            specs[name] = (o, i, kh, kw)

        add("Conv2d_1a_3x3", 32, 3, 3)
        add("Conv2d_2a_3x3", 32, 32, 3)
        add("Conv2d_2b_3x3", 64, 32, 3)
        add("Conv2d_3b_1x1", 80, 64, 1)
        add("Conv2d_4a_3x3", 192, 80, 3)
        in_c = 192
        for name, pf in [("Mixed_5b", 32), ("Mixed_5c", 64),
                         ("Mixed_5d", 64)]:
            add(f"{name}.branch1x1", 64, in_c, 1)
            add(f"{name}.branch5x5_1", 48, in_c, 1)
            add(f"{name}.branch5x5_2", 64, 48, 5)
            add(f"{name}.branch3x3dbl_1", 64, in_c, 1)
            add(f"{name}.branch3x3dbl_2", 96, 64, 3)
            add(f"{name}.branch3x3dbl_3", 96, 96, 3)
            add(f"{name}.branch_pool", pf, in_c, 1)
            in_c = 64 + 64 + 96 + pf
        add("Mixed_6a.branch3x3", 384, in_c, 3)
        add("Mixed_6a.branch3x3dbl_1", 64, in_c, 1)
        add("Mixed_6a.branch3x3dbl_2", 96, 64, 3)
        add("Mixed_6a.branch3x3dbl_3", 96, 96, 3)
        in_c = 384 + 96 + in_c
        for name, c7 in [("Mixed_6b", 128), ("Mixed_6c", 160),
                         ("Mixed_6d", 160), ("Mixed_6e", 192)]:
            add(f"{name}.branch1x1", 192, in_c, 1)
            add(f"{name}.branch7x7_1", c7, in_c, 1)
            add(f"{name}.branch7x7_2", c7, c7, (1, 7))
            add(f"{name}.branch7x7_3", 192, c7, (7, 1))
            add(f"{name}.branch7x7dbl_1", c7, in_c, 1)
            add(f"{name}.branch7x7dbl_2", c7, c7, (7, 1))
            add(f"{name}.branch7x7dbl_3", c7, c7, (1, 7))
            add(f"{name}.branch7x7dbl_4", c7, c7, (7, 1))
            add(f"{name}.branch7x7dbl_5", 192, c7, (1, 7))
            add(f"{name}.branch_pool", 192, in_c, 1)
            in_c = 192 * 4
        add("Mixed_7a.branch3x3_1", 192, in_c, 1)
        add("Mixed_7a.branch3x3_2", 320, 192, 3)
        add("Mixed_7a.branch7x7x3_1", 192, in_c, 1)
        add("Mixed_7a.branch7x7x3_2", 192, 192, (1, 7))
        add("Mixed_7a.branch7x7x3_3", 192, 192, (7, 1))
        add("Mixed_7a.branch7x7x3_4", 192, 192, 3)
        in_c = 320 + 192 + in_c
        for name in ["Mixed_7b", "Mixed_7c"]:
            add(f"{name}.branch1x1", 320, in_c, 1)
            add(f"{name}.branch3x3_1", 384, in_c, 1)
            add(f"{name}.branch3x3_2a", 384, 384, (1, 3))
            add(f"{name}.branch3x3_2b", 384, 384, (3, 1))
            add(f"{name}.branch3x3dbl_1", 448, in_c, 1)
            add(f"{name}.branch3x3dbl_2", 384, 448, 3)
            add(f"{name}.branch3x3dbl_3a", 384, 384, (1, 3))
            add(f"{name}.branch3x3dbl_3b", 384, 384, (3, 1))
            add(f"{name}.branch_pool", 192, in_c, 1)
            in_c = 320 + 768 + 768 + 192
        cls._SPECS = specs
        return specs

    def init_params(self, key) -> Dict:
        params: Dict = {}
        for name, (o, i, kh, kw) in self.conv_specs().items():
            key, k1 = jax.random.split(key)
            leaf = {"weight": jax.random.normal(
                k1, (o, i, kh, kw), jnp.float32) / math.sqrt(i * kh * kw),
                "bias": jnp.zeros((o,), jnp.float32)}
            parts = name.split(".")
            node = params
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = leaf
        return params


def params_from_torch_state_dict(sd) -> Dict:
    """Convert a torchvision/pytorch-fid InceptionV3 state dict, folding
    each BatchNorm into its conv: W' = W * g / sqrt(var + eps),
    b' = beta - mean * g / sqrt(var + eps)."""
    eps = 1e-3
    out: Dict = {}

    def as_np(v):
        return np.asarray(getattr(v, "numpy", lambda: v)(), np.float32)

    conv_keys = [k for k in sd if k.endswith(".conv.weight")]
    for ck in conv_keys:
        base = ck[:-len(".conv.weight")]
        w = as_np(sd[ck])
        g = as_np(sd[base + ".bn.weight"])
        beta = as_np(sd[base + ".bn.bias"])
        mean = as_np(sd[base + ".bn.running_mean"])
        var = as_np(sd[base + ".bn.running_var"])
        scale = g / np.sqrt(var + eps)
        leaf = {"weight": jnp.asarray(w * scale[:, None, None, None]),
                "bias": jnp.asarray(beta - mean * scale)}
        parts = base.split(".")
        node = out
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = leaf
    return out
