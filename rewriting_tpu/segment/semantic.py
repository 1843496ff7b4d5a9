"""Semantic segmentation zoo pieces: dilated ResNet encoder + PPM / C1
decoders and a single-category segmenter wrapper.

Behavioral rebuild of the reference's ADE20k-style zoo
(utils/segmodel/models.py: ResnetDilated :209, PPM :390, C1 :364,
SegmentationModule :24) and the SemanticSegmenter wrapper
(utils/segmenter.py:392): plain per-pixel object classes, multi-resolution
voting, argmax labels."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .nn import (adaptive_avg_pool, conv, fold_bn, init_conv, maxpool,
                 resize_bilinear)
from .prroi import prroi_pool_full_image
from .resnet import (R50_LAYERS, R101_LAYERS, R50_PLANES, init_resnet50,
                     resnet50_from_torch)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _layer_dilations(dilate_scale: int):
    """Per-layer 'dilate' factors and strides matching the reference's
    _nostride_dilate conversion (segmodel models.py:209-270): in a dilated
    layer the formerly-strided conv gets dilation dilate//2 while every
    other 3x3 conv gets the full dilate."""
    if dilate_scale == 8:
        return [1, 1, 2, 4], [1, 2, 1, 1]
    if dilate_scale == 16:
        return [1, 1, 1, 2], [1, 2, 2, 1]
    return [1, 1, 1, 1], [1, 2, 2, 2]


def _dilated_bottleneck(p: Dict, x, stride: int, dilate: int,
                        first_block: bool, groups: int = 1):
    # conv2 is the (formerly) strided 3x3; groups > 1 for ResNeXt's
    # GroupBottleneck (reference segmodel/resnext.py:32-68)
    d_strided = max(dilate // 2, 1) if first_block else dilate
    out = conv(x, p["conv1"], relu=True)
    out = conv(out, p["conv2"], stride=stride, padding=d_strided,
               dilation=d_strided, relu=True, groups=groups)
    out = conv(out, p["conv3"])
    res = conv(x, p["downsample"], stride=stride) if "downsample" in p \
        else x
    return jax.nn.relu(out + res)


def resnet50_dilated_features(params: Dict, x, dilate_scale: int = 8,
                              layers=None) -> List:
    """CSAIL deep-stem bottleneck resnet (50 by default, 101 via
    `layers`) with layer3/layer4 dilated so the output stride is
    `dilate_scale` (reference ResnetDilated, segmodel models.py:209-270)."""
    layers = layers or R50_LAYERS
    x = conv(x, params["conv1"], stride=2, padding=1, relu=True)
    x = conv(x, params["conv2"], padding=1, relu=True)
    x = conv(x, params["conv3"], padding=1, relu=True)
    x = maxpool(x)
    dilations, strides = _layer_dilations(dilate_scale)
    outs = []
    for li, nblocks in enumerate(layers):
        for bi in range(nblocks):
            stride = strides[li] if bi == 0 else 1
            x = _dilated_bottleneck(params[f"layer{li + 1}"][bi], x,
                                    stride, dilations[li], bi == 0)
        outs.append(x)
    return outs


def _dilated_basic_block(p: Dict, x, stride: int, dilate: int,
                         first_block: bool):
    # conv1 is the (formerly) strided 3x3 of a BasicBlock
    d1 = max(dilate // 2, 1) if first_block else dilate
    out = conv(x, p["conv1"], stride=stride, padding=d1, dilation=d1,
               relu=True)
    out = conv(out, p["conv2"], padding=dilate, dilation=dilate)
    res = conv(x, p["downsample"], stride=stride) if "downsample" in p \
        else x
    return jax.nn.relu(out + res)


def resnet18_dilated_features(params: Dict, x, dilate_scale: int = 8
                              ) -> List:
    """CSAIL deep-stem resnet18 (BasicBlocks), dilated — the encoder of
    the texture/color semantic models (segarch 'resnet18dilated',
    reference segmenter.py:28-34)."""
    from .resnet import R18_LAYERS
    x = conv(x, params["conv1"], stride=2, padding=1, relu=True)
    x = conv(x, params["conv2"], padding=1, relu=True)
    x = conv(x, params["conv3"], padding=1, relu=True)
    x = maxpool(x)
    dilations, strides = _layer_dilations(dilate_scale)
    outs = []
    for li, nblocks in enumerate(R18_LAYERS):
        for bi in range(nblocks):
            stride = strides[li] if bi == 0 else 1
            x = _dilated_basic_block(params[f"layer{li + 1}"][bi], x,
                                     stride, dilations[li], bi == 0)
        outs.append(x)
    return outs


def init_resnet18_deepstem(key) -> Dict:
    """Random init for the CSAIL deep-stem resnet18."""
    from .resnet import R18_LAYERS, R18_PLANES
    params: Dict = {}
    key, k1, k2, k3 = jax.random.split(key, 4)
    params["conv1"] = init_conv(k1, 64, 3, 3)
    params["conv2"] = init_conv(k2, 64, 64, 3)
    params["conv3"] = init_conv(k3, 128, 64, 3)
    in_c = 128
    for li, (nblocks, planes) in enumerate(zip(R18_LAYERS, R18_PLANES)):
        blocks = []
        for bi in range(nblocks):
            key, ka, kb, kd = jax.random.split(key, 4)
            p = {"conv1": init_conv(ka, planes, in_c, 3),
                 "conv2": init_conv(kb, planes, planes, 3)}
            if bi == 0 and (li > 0 or in_c != planes):
                p["downsample"] = init_conv(kd, planes, in_c, 1)
            blocks.append(p)
            in_c = planes
        params[f"layer{li + 1}"] = blocks
    return params


def resnet18_deepstem_from_torch(sd: Dict, prefix: str = "") -> Dict:
    from .resnet import R18_LAYERS
    p = prefix
    params: Dict = {
        "conv1": fold_bn(sd, p + "conv1", p + "bn1"),
        "conv2": fold_bn(sd, p + "conv2", p + "bn2"),
        "conv3": fold_bn(sd, p + "conv3", p + "bn3"),
    }
    for li, nblocks in enumerate(R18_LAYERS):
        blocks = []
        for bi in range(nblocks):
            base = f"{p}layer{li + 1}.{bi}."
            blk = {"conv1": fold_bn(sd, base + "conv1", base + "bn1"),
                   "conv2": fold_bn(sd, base + "conv2", base + "bn2")}
            if base + "downsample.0.weight" in sd:
                blk["downsample"] = fold_bn(sd, base + "downsample.0",
                                            base + "downsample.1")
            blocks.append(blk)
        params[f"layer{li + 1}"] = blocks
    return params


# ---------------------------------------------------------------------------
# MobileNetV2Dilated encoder (reference segmodel/models.py:272-325 over the
# vendored mobilenet.py InvertedResidual stack)
# ---------------------------------------------------------------------------

# (expand_ratio t, out_channels c, repeats n, stride s) — mobilenet.py:93-101
MBV2_SETTINGS = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                 (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
MBV2_DOWN_IDX = [2, 4, 7, 14]  # feature indices of stride-2 blocks (:283)


def _mbv2_block_plan(dilate_scale: int):
    """Static per-block (orig_stride, use_residual, dw_stride, dw_dilation)
    from the reference's _nostride_dilate rewrite (models.py:284-311):
    features[7:14] get dilate 2 and features[14:] dilate 4 at scale 8;
    features[14:] get dilate 2 at scale 16."""
    plan = []
    in_c = 32
    idx = 1
    for t, c, n, s in MBV2_SETTINGS:
        for bi in range(n):
            stride = s if bi == 0 else 1
            if dilate_scale == 8:
                dilate = 2 if 7 <= idx < 14 else (4 if idx >= 14 else None)
            elif dilate_scale == 16:
                dilate = 2 if idx >= 14 else None
            else:
                dilate = None
            if dilate is not None:
                dw_stride = 1
                dw_dil = dilate // 2 if stride == 2 else dilate
            else:
                dw_stride, dw_dil = stride, 1
            # residual decided at construction from the ORIGINAL stride
            # (mobilenet.py:53; _nostride_dilate mutates the conv only)
            plan.append(dict(t=t, in_c=in_c, out_c=c, dw_stride=dw_stride,
                             dw_dil=dw_dil,
                             residual=(stride == 1 and in_c == c)))
            in_c = c
            idx += 1
    return plan


def mobilenetv2_dilated_features(params: Dict, x,
                                 dilate_scale: int = 8) -> List:
    """Reference MobileNetV2Dilated forward with return_feature_maps
    (models.py:313-325): conv_out collected after each down block plus the
    final block."""
    x = conv(x, params["stem"], stride=2, padding=1, relu6=True)
    plan = _mbv2_block_plan(dilate_scale)
    outs = []
    for idx, (p, cfg) in enumerate(zip(params["blocks"], plan), start=1):
        inp = x
        h = inp
        if cfg["t"] != 1:
            h = conv(h, p["expand"], relu6=True)
        hidden = cfg["in_c"] * cfg["t"]
        h = conv(h, p["dw"], stride=cfg["dw_stride"], padding=cfg["dw_dil"],
                 dilation=cfg["dw_dil"], groups=hidden, relu6=True)
        h = conv(h, p["project"])
        x = inp + h if cfg["residual"] else h
        if idx in MBV2_DOWN_IDX:
            outs.append(x)
    outs.append(x)
    return outs


def init_mobilenetv2(key) -> Dict:
    params: Dict = {}
    key, k = jax.random.split(key)
    params["stem"] = init_conv(k, 32, 3, 3)
    blocks = []
    for cfg in _mbv2_block_plan(8):
        hidden = cfg["in_c"] * cfg["t"]
        key, k1, k2, k3 = jax.random.split(key, 4)
        p = {"dw": init_conv(k2, hidden, 1, 3),
             "project": init_conv(k3, cfg["out_c"], hidden, 1)}
        if cfg["t"] != 1:
            p["expand"] = init_conv(k1, hidden, cfg["in_c"], 1)
        blocks.append(p)
    params["blocks"] = blocks
    return params


def mobilenetv2_from_torch(sd: Dict, prefix: str = "features.") -> Dict:
    """Fold the vendored-MobileNetV2 state dict (mobilenet.py:30-119 layout:
    features.0 stem, features.1..17 InvertedResiduals; the final 1x1
    conv features.18 is dropped by MobileNetV2Dilated)."""
    p = prefix
    params: Dict = {"stem": fold_bn(sd, p + "0.0", p + "0.1")}
    blocks = []
    for idx, cfg in enumerate(_mbv2_block_plan(8), start=1):
        base = f"{p}{idx}.conv."
        if cfg["t"] == 1:  # Sequential(dw, bn, relu6, 1x1, bn)
            blk = {"dw": fold_bn(sd, base + "0", base + "1"),
                   "project": fold_bn(sd, base + "3", base + "4")}
        else:  # Sequential(1x1, bn, relu6, dw, bn, relu6, 1x1, bn)
            blk = {"expand": fold_bn(sd, base + "0", base + "1"),
                   "dw": fold_bn(sd, base + "3", base + "4"),
                   "project": fold_bn(sd, base + "6", base + "7")}
        blocks.append(blk)
    params["blocks"] = blocks
    return params


# ---------------------------------------------------------------------------
# ResNeXt101 encoder (reference segmodel/resnext.py: GroupBottleneck
# expansion 2, groups 32, deep stem; used UNdilated via the Resnet wrapper,
# models.py:1043-1045)
# ---------------------------------------------------------------------------

RNX101_LAYERS = [3, 4, 23, 3]
RNX101_PLANES = [128, 256, 512, 1024]
RNX_GROUPS = 32


def resnext101_features(params: Dict, x, dilate_scale: int = 32) -> List:
    """Deep-stem ResNeXt101; dilate_scale 8/16 applies the same
    _nostride_dilate conversion as the resnet encoders, 32 = undilated."""
    x = conv(x, params["conv1"], stride=2, padding=1, relu=True)
    x = conv(x, params["conv2"], padding=1, relu=True)
    x = conv(x, params["conv3"], padding=1, relu=True)
    x = maxpool(x)
    dilations, strides = _layer_dilations(dilate_scale)
    outs = []
    for li, nblocks in enumerate(RNX101_LAYERS):
        for bi in range(nblocks):
            stride = strides[li] if bi == 0 else 1
            x = _dilated_bottleneck(params[f"layer{li + 1}"][bi], x,
                                    stride, dilations[li], bi == 0,
                                    groups=RNX_GROUPS)
        outs.append(x)
    return outs


def init_resnext101(key) -> Dict:
    params: Dict = {}
    key, k1, k2, k3 = jax.random.split(key, 4)
    params["conv1"] = init_conv(k1, 64, 3, 3)
    params["conv2"] = init_conv(k2, 64, 64, 3)
    params["conv3"] = init_conv(k3, 128, 64, 3)
    in_c = 128
    for li, (nblocks, planes) in enumerate(zip(RNX101_LAYERS,
                                               RNX101_PLANES)):
        blocks = []
        for bi in range(nblocks):
            key, ka, kb, kc, kd = jax.random.split(key, 5)
            p = {"conv1": init_conv(ka, planes, in_c, 1),
                 "conv2": init_conv(kb, planes, planes // RNX_GROUPS, 3),
                 "conv3": init_conv(kc, planes * 2, planes, 1)}
            if bi == 0:
                p["downsample"] = init_conv(kd, planes * 2, in_c, 1)
            blocks.append(p)
            in_c = planes * 2
        params[f"layer{li + 1}"] = blocks
    return params


def resnext101_from_torch(sd: Dict, prefix: str = "") -> Dict:
    p = prefix
    params: Dict = {
        "conv1": fold_bn(sd, p + "conv1", p + "bn1"),
        "conv2": fold_bn(sd, p + "conv2", p + "bn2"),
        "conv3": fold_bn(sd, p + "conv3", p + "bn3"),
    }
    for li, nblocks in enumerate(RNX101_LAYERS):
        blocks = []
        for bi in range(nblocks):
            base = f"{p}layer{li + 1}.{bi}."
            blk = {"conv1": fold_bn(sd, base + "conv1", base + "bn1"),
                   "conv2": fold_bn(sd, base + "conv2", base + "bn2"),
                   "conv3": fold_bn(sd, base + "conv3", base + "bn3")}
            if base + "downsample.0.weight" in sd:
                blk["downsample"] = fold_bn(sd, base + "downsample.0",
                                            base + "downsample.1")
            blocks.append(blk)
        params[f"layer{li + 1}"] = blocks
    return params


class PPMDecoder:
    """Pyramid pooling decoder (reference PPM, segmodel models.py:390-437):
    pool conv5 at scales (1,2,3,6), 1x1 convs, concat, 3x3 conv head."""

    POOL_SCALES = (1, 2, 3, 6)

    def __init__(self, num_class: int, fc_dim: int = 2048):
        self.num_class = num_class
        self.fc_dim = fc_dim

    def __call__(self, params: Dict, conv_out, seg_size=None):
        conv5 = conv_out[-1]
        ppm = [conv5]
        for i, scale in enumerate(self.POOL_SCALES):
            pooled = adaptive_avg_pool(conv5, (scale, scale))
            pooled = conv(pooled, params["ppm"][i], relu=True)
            ppm.append(resize_bilinear(pooled, conv5.shape[1:3]))
        x = jnp.concatenate(ppm, axis=-1)
        x = conv(x, params["conv_last_0"], padding=1, relu=True)
        x = conv(x, params["conv_last_1"])
        if seg_size is not None:
            x = resize_bilinear(x, seg_size)
        return jax.nn.softmax(x, axis=-1)

    def init_params(self, key) -> Dict:
        ppm = []
        for _ in self.POOL_SCALES:
            key, k1 = jax.random.split(key)
            ppm.append(init_conv(k1, 512, self.fc_dim, 1))
        key, k1, k2 = jax.random.split(key, 3)
        return {"ppm": ppm,
                "conv_last_0": init_conv(
                    k1, 512, self.fc_dim + 512 * len(self.POOL_SCALES), 3),
                "conv_last_1": init_conv(k2, self.num_class, 512, 1)}

    def params_from_torch(self, sd: Dict) -> Dict:
        ppm = [fold_bn(sd, f"ppm.{i}.1", f"ppm.{i}.2")
               for i in range(len(self.POOL_SCALES))]
        return {"ppm": ppm,
                "conv_last_0": fold_bn(sd, "conv_last.0", "conv_last.1"),
                "conv_last_1": fold_bn(sd, "conv_last.4", None)}


class PPMDeepsupDecoder(PPMDecoder):
    """PPMDeepsup (reference segmodel models.py:438-498): identical to PPM
    at inference — the deep-supervision branch (cbr_deepsup /
    conv_last_deepsup) only runs in training mode, and the ppm/conv_last
    key layout matches PPM, so the converter is inherited and the deepsup
    checkpoint keys are simply unused."""


class C1Decoder:
    """Single 3x3 conv head (reference C1, segmodel models.py:364-388)."""

    def __init__(self, num_class: int, fc_dim: int = 2048):
        self.num_class = num_class
        self.fc_dim = fc_dim

    def __call__(self, params: Dict, conv_out, seg_size=None):
        x = conv(conv_out[-1], params["cbr"], padding=1, relu=True)
        x = conv(x, params["conv_last"])
        if seg_size is not None:
            x = resize_bilinear(x, seg_size)
        return jax.nn.softmax(x, axis=-1)

    def init_params(self, key) -> Dict:
        k1, k2 = jax.random.split(key)
        return {"cbr": init_conv(k1, self.fc_dim // 4, self.fc_dim, 3),
                "conv_last": init_conv(k2, self.num_class,
                                       self.fc_dim // 4, 1)}

    def params_from_torch(self, sd: Dict) -> Dict:
        return {"cbr": fold_bn(sd, "cbr.0", "cbr.1"),
                "conv_last": fold_bn(sd, "conv_last", None)}


class C1DeepSupDecoder(C1Decoder):
    """C1DeepSup (reference segmodel models.py:327-362): identical to C1 at
    inference (deepsup branch train-only, same cbr/conv_last keys)."""


class SemanticSegmenter:
    """Single-category semantic segmenter (reference SemanticSegmenter,
    utils/segmenter.py:392): normalized input (imageformat-driven, like
    the reference's model meta), multi-resolution softmax voting, argmax
    labels in channel 0.

    arch: 'resnet50dilated' (default), 'resnet18dilated' (the texture/
    color models), 'mobilenetv2dilated', or 'resnext101' (undilated, the
    reference wraps it in plain Resnet — models.py:1043-1045); category
    names what the vocab describes."""

    FC_DIMS = {"resnet50dilated": 2048, "resnet18dilated": 512,
               "resnet101dilated": 2048, "resnet101": 2048,
               "mobilenetv2dilated": 320, "resnext101": 2048}

    def __init__(self, params: Dict, labels: Sequence[str],
                 decoder="ppm", segsizes=None, dilate_scale: int = 8,
                 arch: str = "resnet50dilated", category: str = "object",
                 imageformat: Optional[Dict] = None):
        self.labels = list(labels)
        self.segsizes = segsizes or [256]
        if arch in ("resnext101", "resnet101"):
            dilate_scale = 32  # undilated Resnet wrapper
        self.dilate_scale = dilate_scale
        self.arch = arch
        self.category = category
        fc_dim = self.FC_DIMS[arch]
        dec_cls = {"ppm": PPMDecoder, "ppm_deepsup": PPMDeepsupDecoder,
                   "c1": C1Decoder, "c1_deepsup": C1DeepSupDecoder}[decoder]
        self.decoder = dec_cls(num_class=len(self.labels), fc_dim=fc_dim)
        # imageformat: {'byteorder': 'RGB'|'BGR', 'mean': [...],
        #               'scale'/'stdev': [...]} on [0,1] inputs
        # (reference reads this from the model's labels.json meta)
        self.imageformat = imageformat or {
            "byteorder": "RGB", "mean": list(IMAGENET_MEAN),
            "stdev": list(IMAGENET_STD)}
        if params is None:  # random init (shape/pipeline tests)
            params = self.init_params(jax.random.PRNGKey(0))
        self.params = params
        self._jit = jax.jit(self._forward, static_argnames=("seg_size",))

    _ENCODERS = {
        "resnet50dilated": (resnet50_dilated_features,
                            lambda k: init_resnet50(k)),
        "resnet101dilated": (
            lambda p, x, d: resnet50_dilated_features(
                p, x, d, layers=R101_LAYERS),
            lambda k: init_resnet50(k, layers=R101_LAYERS)),
        "resnet101": (
            lambda p, x, d: resnet50_dilated_features(
                p, x, d, layers=R101_LAYERS),
            lambda k: init_resnet50(k, layers=R101_LAYERS)),
        "resnet18dilated": (resnet18_dilated_features,
                            lambda k: init_resnet18_deepstem(k)),
        "mobilenetv2dilated": (mobilenetv2_dilated_features,
                               lambda k: init_mobilenetv2(k)),
        "resnext101": (resnext101_features,
                       lambda k: init_resnext101(k)),
    }

    def _forward(self, params, x, seg_size):
        feats_fn = self._ENCODERS[self.arch][0]
        feats = feats_fn(params["encoder"], x, self.dilate_scale)
        return self.decoder(params["decoder"], feats, seg_size=seg_size)

    def init_params(self, key) -> Dict:
        k1, k2 = jax.random.split(key)
        enc = self._ENCODERS[self.arch][1](k1)
        return {"encoder": enc, "decoder": self.decoder.init_params(k2)}

    def get_label_and_category_names(self):
        return ([(label, self.category) for label in self.labels],
                [self.category])

    accepts_uint8 = True  # device-normalized byte input (seg_stats driver)

    def raw_seg_prediction(self, images, downsample: int = 1):
        """Input RGB zc NHWC float, or uint8 [0,255] normalized on device
        (bytes/255 -> the same [0,1] scale the zc path reaches)."""
        x = jnp.asarray(images)
        h, w = x.shape[1:3]
        # zc (or bytes) -> [0,1] -> model-meta normalization
        mean = np.asarray(self.imageformat["mean"], np.float32)
        std = np.asarray(self.imageformat.get(
            "stdev", self.imageformat.get("scale", [1, 1, 1])), np.float32)
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        else:
            x = (jnp.asarray(x, jnp.float32) + 1.0) / 2.0
        if self.imageformat.get("byteorder", "RGB") == "BGR":
            x = x[..., ::-1]
        x = (x - mean) / std
        seg_shape = (h // downsample, w // downsample)
        pred = 0.0
        for s in self.segsizes:
            resized = x if (s, s) == x.shape[1:3] else \
                adaptive_avg_pool(x, (s, s))
            pred = pred + self._jit(self.params, resized,
                                    seg_size=seg_shape)
        return pred

    def segment_batch(self, images, downsample: int = 1):
        pred = self.raw_seg_prediction(images, downsample)
        return np.asarray(jnp.argmax(pred, axis=-1))[:, None].astype(
            np.int64)

    def predict_single_class(self, images, classnum: int,
                             downsample: int = 1):
        pred = self.raw_seg_prediction(images, downsample)
        return (pred[..., classnum],
                jnp.argmax(pred, axis=-1) == classnum)
