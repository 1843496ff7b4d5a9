"""ResNet feature extractors for the segmenter back-ends (NHWC, inference,
BN folded into convs).

- resnet50 (CSAIL variant): deep 3x3x3 stem to 128 channels, bottleneck
  layers [3,4,6,3], returns the four stage feature maps
  (reference: utils/upsegmodel/resnet.py:103-150, encoder wrapper
  models.py:230-248).
- resnet18 (torchvision-style 7x7 stem): returns feat8/feat16/feat32 for
  BiSeNet (reference: metrics/face-parsing.PyTorch/resnet.py:58-78).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from .nn import conv, fold_bn, init_conv, maxpool


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def bottleneck(p: Dict, x, stride: int):
    out = conv(x, p["conv1"], relu=True)
    out = conv(out, p["conv2"], stride=stride, padding=1, relu=True)
    out = conv(out, p["conv3"])
    res = conv(x, p["downsample"], stride=stride) if "downsample" in p \
        else x
    return jax.nn.relu(out + res)


def basic_block(p: Dict, x, stride: int):
    out = conv(x, p["conv1"], stride=stride, padding=1, relu=True)
    out = conv(out, p["conv2"], padding=1)
    res = conv(x, p["downsample"], stride=stride) if "downsample" in p \
        else x
    return jax.nn.relu(out + res)


# ---------------------------------------------------------------------------
# resnet50 (CSAIL deep stem)
# ---------------------------------------------------------------------------

R50_LAYERS = [3, 4, 6, 3]
R101_LAYERS = [3, 4, 23, 3]
R50_PLANES = [64, 128, 256, 512]


def resnet50_features(params: Dict, x) -> List:
    """x NHWC -> [c2, c3, c4, c5] stage features (strides 4/8/16/32)."""
    x = conv(x, params["conv1"], stride=2, padding=1, relu=True)
    x = conv(x, params["conv2"], padding=1, relu=True)
    x = conv(x, params["conv3"], padding=1, relu=True)
    x = maxpool(x)
    outs = []
    for li, nblocks in enumerate(R50_LAYERS):
        for bi in range(nblocks):
            stride = 2 if (bi == 0 and li > 0) else 1
            x = bottleneck(params[f"layer{li + 1}"][bi], x, stride)
        outs.append(x)
    return outs


def init_resnet50(key, layers=None) -> Dict:
    layers = layers or R50_LAYERS
    params: Dict = {}
    key, k1, k2, k3 = jax.random.split(key, 4)
    params["conv1"] = init_conv(k1, 64, 3, 3)
    params["conv2"] = init_conv(k2, 64, 64, 3)
    params["conv3"] = init_conv(k3, 128, 64, 3)
    in_c = 128
    for li, (nblocks, planes) in enumerate(zip(layers, R50_PLANES)):
        blocks = []
        for bi in range(nblocks):
            key, ka, kb, kc, kd = jax.random.split(key, 5)
            p = {"conv1": init_conv(ka, planes, in_c, 1),
                 "conv2": init_conv(kb, planes, planes, 3),
                 "conv3": init_conv(kc, planes * 4, planes, 1)}
            if bi == 0:
                p["downsample"] = init_conv(kd, planes * 4, in_c, 1)
            blocks.append(p)
            in_c = planes * 4
        params[f"layer{li + 1}"] = blocks
    return params


def resnet50_from_torch(sd: Dict, prefix: str = "", layers=None) -> Dict:
    """Convert a CSAIL deep-stem bottleneck-resnet state dict (BN folded);
    `layers` selects the depth (default resnet50, R101_LAYERS for 101)."""
    p = prefix
    layers = layers or R50_LAYERS
    params: Dict = {
        "conv1": fold_bn(sd, p + "conv1", p + "bn1"),
        "conv2": fold_bn(sd, p + "conv2", p + "bn2"),
        "conv3": fold_bn(sd, p + "conv3", p + "bn3"),
    }
    for li, nblocks in enumerate(layers):
        blocks = []
        for bi in range(nblocks):
            base = f"{p}layer{li + 1}.{bi}."
            blk = {
                "conv1": fold_bn(sd, base + "conv1", base + "bn1"),
                "conv2": fold_bn(sd, base + "conv2", base + "bn2"),
                "conv3": fold_bn(sd, base + "conv3", base + "bn3"),
            }
            if base + "downsample.0.weight" in sd:
                blk["downsample"] = fold_bn(sd, base + "downsample.0",
                                            base + "downsample.1")
            blocks.append(blk)
        params[f"layer{li + 1}"] = blocks
    return params


# ---------------------------------------------------------------------------
# resnet18 (7x7 stem) for BiSeNet
# ---------------------------------------------------------------------------

R18_LAYERS = [2, 2, 2, 2]
R18_PLANES = [64, 128, 256, 512]


def resnet18_features(params: Dict, x):
    """x NHWC -> (feat8, feat16, feat32) at strides 8/16/32
    (reference face-parsing resnet.py:71-78)."""
    x = conv(x, params["conv1"], stride=2, padding=3, relu=True)
    x = maxpool(x)
    feats = []
    for li, nblocks in enumerate(R18_LAYERS):
        for bi in range(nblocks):
            stride = 2 if (bi == 0 and li > 0) else 1
            x = basic_block(params[f"layer{li + 1}"][bi], x, stride)
        feats.append(x)
    return feats[1], feats[2], feats[3]


def init_resnet18(key) -> Dict:
    params: Dict = {}
    key, k1 = jax.random.split(key)
    params["conv1"] = init_conv(k1, 64, 3, 7)
    in_c = 64
    for li, (nblocks, planes) in enumerate(zip(R18_LAYERS, R18_PLANES)):
        blocks = []
        for bi in range(nblocks):
            key, ka, kb, kd = jax.random.split(key, 4)
            p = {"conv1": init_conv(ka, planes, in_c, 3),
                 "conv2": init_conv(kb, planes, planes, 3)}
            if bi == 0 and li > 0:
                p["downsample"] = init_conv(kd, planes, in_c, 1)
            blocks.append(p)
            in_c = planes
        params[f"layer{li + 1}"] = blocks
    return params


def resnet18_from_torch(sd: Dict, prefix: str = "") -> Dict:
    p = prefix
    params: Dict = {"conv1": fold_bn(sd, p + "conv1", p + "bn1")}
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
