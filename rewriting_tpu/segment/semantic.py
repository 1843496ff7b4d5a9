"""Semantic segmentation zoo pieces: dilated ResNet encoder + PPM / C1
decoders and a single-category segmenter wrapper.

Behavioral rebuild of the reference's ADE20k-style zoo
(utils/segmodel/models.py: ResnetDilated :209, PPM :390, C1 :364,
SegmentationModule :24) and the SemanticSegmenter wrapper
(utils/segmenter.py:392): plain per-pixel object classes, multi-resolution
voting, argmax labels."""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .nn import (adaptive_avg_pool, conv, fold_bn, init_conv, maxpool,
                 resize_bilinear)
from .prroi import prroi_pool_full_image
from .resnet import R50_LAYERS, R50_PLANES, init_resnet50, resnet50_from_torch

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _dilated_bottleneck(p: Dict, x, stride: int, dilation: int):
    out = conv(x, p["conv1"], relu=True)
    out = conv(out, p["conv2"], stride=stride, padding=dilation,
               dilation=dilation, relu=True)
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
    if dilate_scale == 8:
        dilations = [1, 1, 2, 4]
        strides = [1, 2, 1, 1]
    elif dilate_scale == 16:
        dilations = [1, 1, 1, 2]
        strides = [1, 2, 2, 1]
    else:
        dilations = [1, 1, 1, 1]
        strides = [1, 2, 2, 2]
    outs = []
    for li, nblocks in enumerate(R50_LAYERS):
        for bi in range(nblocks):
            stride = strides[li] if bi == 0 else 1
            x = _dilated_bottleneck(params[f"layer{li + 1}"][bi], x,
                                    stride, dilations[li])
        outs.append(x)
    return outs


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
    utils/segmenter.py:392): imagenet-normalized input, multi-resolution
    softmax voting, argmax labels in channel 0."""

    def __init__(self, params: Dict, labels: Sequence[str],
                 decoder="ppm", segsizes=None, dilate_scale: int = 8):
        self.labels = list(labels)
        self.segsizes = segsizes or [256]
        self.dilate_scale = dilate_scale
        dec_cls = {"ppm": PPMDecoder, "c1": C1Decoder}[decoder]
        self.decoder = dec_cls(num_class=len(self.labels))
        self.params = params
        self._jit = jax.jit(self._forward, static_argnames=("seg_size",))

    def _forward(self, params, x, seg_size):
        feats = resnet50_dilated_features(params["encoder"], x,
                                          self.dilate_scale)
        return self.decoder(params["decoder"], feats, seg_size=seg_size)

    def init_params(self, key) -> Dict:
        k1, k2 = jax.random.split(key)
        return {"encoder": init_resnet50(k1),
                "decoder": self.decoder.init_params(k2)}

    def get_label_and_category_names(self):
        return [(label, "object") for label in self.labels], ["object"]

    def raw_seg_prediction(self, images, downsample: int = 1):
        x = jnp.asarray(images, jnp.float32)
        h, w = x.shape[1:3]
        # zc -> [0,1] -> imagenet normalization
        x = ((x + 1.0) / 2.0 - IMAGENET_MEAN) / IMAGENET_STD
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
