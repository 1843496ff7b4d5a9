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
from .resnet import R50_LAYERS, R50_PLANES, init_resnet50, resnet50_from_torch

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
                        first_block: bool):
    # conv2 is the (formerly) strided 3x3
    d_strided = max(dilate // 2, 1) if first_block else dilate
    out = conv(x, p["conv1"], relu=True)
    out = conv(out, p["conv2"], stride=stride, padding=d_strided,
               dilation=d_strided, relu=True)
    out = conv(out, p["conv3"])
    res = conv(x, p["downsample"], stride=stride) if "downsample" in p \
        else x
    return jax.nn.relu(out + res)


def resnet50_dilated_features(params: Dict, x, dilate_scale: int = 8
                              ) -> List:
    """CSAIL deep-stem resnet50 with layer3/layer4 dilated so the output
    stride is `dilate_scale` (reference ResnetDilated, segmodel
    models.py:209-270)."""
    x = conv(x, params["conv1"], stride=2, padding=1, relu=True)
    x = conv(x, params["conv2"], padding=1, relu=True)
    x = conv(x, params["conv3"], padding=1, relu=True)
    x = maxpool(x)
    dilations, strides = _layer_dilations(dilate_scale)
    outs = []
    for li, nblocks in enumerate(R50_LAYERS):
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


class SemanticSegmenter:
    """Single-category semantic segmenter (reference SemanticSegmenter,
    utils/segmenter.py:392): normalized input (imageformat-driven, like
    the reference's model meta), multi-resolution softmax voting, argmax
    labels in channel 0.

    arch: 'resnet50dilated' (default) or 'resnet18dilated' (the
    texture/color models); category names what the vocab describes."""

    def __init__(self, params: Dict, labels: Sequence[str],
                 decoder="ppm", segsizes=None, dilate_scale: int = 8,
                 arch: str = "resnet50dilated", category: str = "object",
                 imageformat: Optional[Dict] = None):
        self.labels = list(labels)
        self.segsizes = segsizes or [256]
        self.dilate_scale = dilate_scale
        self.arch = arch
        self.category = category
        fc_dim = 2048 if arch == "resnet50dilated" else 512
        dec_cls = {"ppm": PPMDecoder, "c1": C1Decoder}[decoder]
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

    def _forward(self, params, x, seg_size):
        if self.arch == "resnet18dilated":
            feats = resnet18_dilated_features(params["encoder"], x,
                                              self.dilate_scale)
        else:
            feats = resnet50_dilated_features(params["encoder"], x,
                                              self.dilate_scale)
        return self.decoder(params["decoder"], feats, seg_size=seg_size)

    def init_params(self, key) -> Dict:
        k1, k2 = jax.random.split(key)
        enc = (init_resnet18_deepstem(k1)
               if self.arch == "resnet18dilated" else init_resnet50(k1))
        return {"encoder": enc, "decoder": self.decoder.init_params(k2)}

    def get_label_and_category_names(self):
        return ([(label, self.category) for label in self.labels],
                [self.category])

    def raw_seg_prediction(self, images, downsample: int = 1):
        x = jnp.asarray(images, jnp.float32)
        h, w = x.shape[1:3]
        # zc -> [0,1] -> model-meta normalization
        mean = np.asarray(self.imageformat["mean"], np.float32)
        std = np.asarray(self.imageformat.get(
            "stdev", self.imageformat.get("scale", [1, 1, 1])), np.float32)
        x = (x + 1.0) / 2.0
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
