"""BiSeNet face parser (19 classes) in JAX/NHWC.

Behavioral rebuild of the vendored face-parsing.PyTorch BiSeNet
(reference: metrics/face-parsing.PyTorch/model.py:230-260): a resnet18
context path with attention refinement + global context, the res8 feature
standing in for the spatial path, feature fusion, and 1x1 class heads
upsampled with align_corners=True.  The InPlace-ABN CUDA module reduces to
frozen BN folded into convs at conversion (inference only).

FaceSegmenter wraps it with the reference's resize-512 / per-image argmax
protocol (metrics/load_seg.py:11-35)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .nn import (conv, fold_bn, global_avg_pool, init_conv,
                 resize_bilinear, resize_nearest)
from .resnet import init_resnet18, resnet18_features, resnet18_from_torch


def _arm(p: Dict, x):
    """Attention refinement (reference model.py:67-91)."""
    feat = conv(x, p["conv"], padding=1, relu=True)
    atten = global_avg_pool(feat)
    atten = jax.nn.sigmoid(conv(atten, p["conv_atten"]))
    return feat * atten


def _ffm(p: Dict, fsp, fcp):
    """Feature fusion (reference model.py:180-211)."""
    feat = conv(jnp.concatenate([fsp, fcp], axis=-1), p["convblk"],
                relu=True)
    atten = global_avg_pool(feat)
    atten = jax.nn.relu(conv(atten, p["conv1"]))
    atten = jax.nn.sigmoid(conv(atten, p["conv2"]))
    return feat * atten + feat


def _output_head(p: Dict, x):
    return conv(conv(x, p["conv"], padding=1, relu=True), p["conv_out"])


class BiSeNet:
    def __init__(self, n_classes: int = 19):
        self.n_classes = n_classes

    def __call__(self, params: Dict, x):
        """x (B,H,W,3) preprocessed; returns the main class-score map
        (B,H,W,n_classes), upsampled align_corners=True
        (reference model.py:241-253; auxiliary heads omitted at
        inference — only out[0] is consumed, load_seg.py:30)."""
        h, w = x.shape[1:3]
        feat8, feat16, feat32 = resnet18_features(params["resnet"], x)
        cp = params["cp"]
        avg = conv(global_avg_pool(feat32), cp["conv_avg"], relu=True)
        avg_up = jnp.broadcast_to(avg, feat32.shape[:3] + (avg.shape[-1],))
        feat32_sum = _arm(cp["arm32"], feat32) + avg_up
        feat32_up = resize_nearest(feat32_sum, feat16.shape[1:3])
        feat32_up = conv(feat32_up, cp["conv_head32"], padding=1, relu=True)
        feat16_sum = _arm(cp["arm16"], feat16) + feat32_up
        feat16_up = resize_nearest(feat16_sum, feat8.shape[1:3])
        feat16_up = conv(feat16_up, cp["conv_head16"], padding=1, relu=True)
        fuse = _ffm(params["ffm"], feat8, feat16_up)
        out = _output_head(params["conv_out"], fuse)
        return resize_bilinear(out, (h, w), align_corners=True)

    def init_params(self, key) -> Dict:
        key, kr = jax.random.split(key)
        params = {"resnet": init_resnet18(kr)}
        cp = {}
        for name, (o, i, k) in [("conv_avg", (128, 512, 1)),
                                ("conv_head32", (128, 128, 3)),
                                ("conv_head16", (128, 128, 3))]:
            key, k1 = jax.random.split(key)
            cp[name] = init_conv(k1, o, i, k)
        for arm, in_c in [("arm16", 256), ("arm32", 512)]:
            key, k1, k2 = jax.random.split(key, 3)
            cp[arm] = {"conv": init_conv(k1, 128, in_c, 3),
                       "conv_atten": init_conv(k2, 128, 128, 1)}
        params["cp"] = cp
        key, k1, k2, k3 = jax.random.split(key, 4)
        params["ffm"] = {"convblk": init_conv(k1, 256, 256, 1),
                         "conv1": init_conv(k2, 64, 256, 1),
                         "conv2": init_conv(k3, 256, 64, 1)}
        key, k1, k2 = jax.random.split(key, 3)
        params["conv_out"] = {"conv": init_conv(k1, 256, 256, 3),
                              "conv_out": init_conv(k2, self.n_classes,
                                                    256, 1)}
        return params

    def params_from_torch(self, sd: Dict) -> Dict:
        params = {"resnet": resnet18_from_torch(sd, "cp.resnet.")}
        cp = {
            "conv_avg": fold_bn(sd, "cp.conv_avg.conv", "cp.conv_avg.bn"),
            "conv_head32": fold_bn(sd, "cp.conv_head32.conv",
                                   "cp.conv_head32.bn"),
            "conv_head16": fold_bn(sd, "cp.conv_head16.conv",
                                   "cp.conv_head16.bn"),
        }
        for arm in ["arm16", "arm32"]:
            cp[arm] = {
                "conv": fold_bn(sd, f"cp.{arm}.conv.conv",
                                f"cp.{arm}.conv.bn"),
                "conv_atten": fold_bn(sd, f"cp.{arm}.conv_atten",
                                      f"cp.{arm}.bn_atten"),
            }
        params["cp"] = cp
        params["ffm"] = {
            "convblk": fold_bn(sd, "ffm.convblk.conv", "ffm.convblk.bn"),
            "conv1": fold_bn(sd, "ffm.conv1", None),
            "conv2": fold_bn(sd, "ffm.conv2", None),
        }
        params["conv_out"] = {
            "conv": fold_bn(sd, "conv_out.conv.conv", "conv_out.conv.bn"),
            "conv_out": fold_bn(sd, "conv_out.conv_out", None),
        }
        return params


# face-parsing class list incl. background at 0
FACE_CLASSES = ["background", "skin", "l_brow", "r_brow", "l_eye", "r_eye",
                "eye_g", "l_ear", "r_ear", "ear_r", "nose", "mouth",
                "u_lip", "l_lip", "neck", "neck_l", "cloth", "hair", "hat"]


class FaceSegmenter:
    """Reference protocol (metrics/load_seg.py:11-35): resize to 512,
    argmax the main head, resize labels back to the input size."""

    def __init__(self, params=None, weights_path=None):
        self.net = BiSeNet(n_classes=19)
        if params is None:
            if weights_path is None:
                from ..models.zoo import weights_dir
                import os
                weights_path = os.path.join(weights_dir(),
                                            "face-parsing-02dd3f6f.pth")
            import os
            if not os.path.exists(weights_path):
                raise FileNotFoundError(
                    f"face parser weights not found at {weights_path}; "
                    "place face-parsing-02dd3f6f.pth from "
                    "rewriting.csail.mit.edu/data/models/ there.")
            from ..models.zoo import _torch_load_numpy
            params = self.net.params_from_torch(
                _torch_load_numpy(weights_path))
        self.params = params
        self._jit = jax.jit(self.net.__call__)
        self._e2e = jax.jit(self._labels, static_argnums=(2,))

    def get_label_and_category_names(self):
        return [(c, "face") for c in FACE_CLASSES], ["face"]

    def _labels(self, params, xs, target):
        """One fused program: resize-to-512 + (uint8) normalize + BiSeNet
        + argmax + label resize -> (B,1,*target) uint8 labels.  A single
        dispatch instead of four, with uint8 in/out, matters through a
        remote-device link: fp32 upload + int64 label download is 24x the
        bytes of the uint8 pair."""
        if xs.dtype == jnp.uint8:
            # nearest resize is value-preserving, so resizing the uint8
            # bytes first then normalizing equals the host-side
            # read/255 -> renormalize("pt","zc") -> resize order exactly
            # (pt->zc is x*2-1 with exact fp32 constants).
            x512 = jax.image.resize(xs, (xs.shape[0], 512, 512, 3),
                                    "nearest")
            x512 = x512.astype(jnp.float32) / 255.0 * 2.0 - 1.0
        else:
            x512 = jax.image.resize(xs.astype(jnp.float32),
                                    (xs.shape[0], 512, 512, 3), "nearest")
        out = self.net(params, x512)
        labels = jnp.argmax(out, axis=-1)[:, None]
        if target != (512, 512):
            labels = jax.image.resize(
                labels, (labels.shape[0], 1) + target, "nearest")
        return labels.astype(jnp.uint8)

    def segment_batch_device(self, xs, downsample: int = 1):
        """Async device path: xs (B,H,W,3) uint8 RGB [0,255] or zc float
        -> DEVICE (B,1,H/d,W/d) uint8 labels.  Does not block; callers
        pipeline host work against the dispatch and fetch with
        np.asarray when needed (metrics/seg_stats.py)."""
        xs = jnp.asarray(xs)
        og = xs.shape[1:3]
        target = (og[0] // downsample, og[1] // downsample)
        return self._e2e(self.params, xs, target)

    def segment_batch(self, xs, downsample: int = 1):
        """xs (B,H,W,3) zc RGB (or uint8) -> (B,1,H/d,W/d) int64 labels."""
        return np.asarray(
            self.segment_batch_device(xs, downsample)).astype(np.int64)
