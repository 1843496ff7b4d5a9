"""UPerNet unified-parsing decoder (inference path) in JAX/NHWC.

Behavioral rebuild of the CSAIL unified parsing network used as the
reference's 'netpqc' segmenter (reference: utils/upsegmodel/models.py:252-427
UPerNet; wrapper SegmentationModule :48-76): a resnet50 encoder feeds a PPM
pyramid (PrRoI-pooled, here exact hat-integral pooling), an FPN top-down
pass, and object / part / material / scene heads; inference applies softmax
and resizes to seg_size.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from .nn import conv, fold_bn, init_conv, resize_bilinear
from .prroi import prroi_pool_full_image
from .resnet import (init_resnet50, resnet50_features, resnet50_from_torch)

POOL_SCALES = (1, 2, 3, 6)
FPN_INPLANES = (256, 512, 1024, 2048)
# the released 'upernet' decoder is built with fpn_dim=512
# (reference models.py:286-291 via build_decoder, fc_dim=2048)
FPN_DIM = 512
FC_DIM = 2048  # resnet50 conv5 channels


class UPerNet:
    """nr_classes: dict with 'object', 'part', 'material', 'scene' counts;
    object_with_part / object_part define the per-object part heads
    (reference SegmentationModule.__init__, models.py:64-73)."""

    def __init__(self, nr_classes: Dict[str, int],
                 object_with_part: Sequence[int],
                 object_part: Dict[int, List[int]]):
        self.nr_classes = dict(nr_classes)
        self.object_with_part = list(object_with_part)
        self.object_part = {int(k): list(v) for k, v in object_part.items()}

    # -- forward ---------------------------------------------------------------
    def __call__(self, params: Dict, img, seg_size=None,
                 output_switch=None) -> Dict:
        """img (B,H,W,3) preprocessed (BGR, mean-subtracted); returns dict
        with softmax 'object'/'material' (B,h,w,C) maps at seg_size, 'part'
        as a list per owning object, and 'scene' (B,C)."""
        switch = output_switch or {"object": True, "part": True,
                                   "material": True, "scene": True}
        conv_out = resnet50_features(params["encoder"], img)
        dec = params["decoder"]
        conv5 = conv_out[-1]
        ppm_out = [conv5]
        for i, scale in enumerate(POOL_SCALES):
            pooled = prroi_pool_full_image(conv5, scale)
            pooled = conv(pooled, dec["ppm_conv"][i], relu=True)
            ppm_out.append(resize_bilinear(pooled, conv5.shape[1:3]))
        f = conv(jnp.concatenate(ppm_out, axis=-1), dec["ppm_last_conv"],
                 padding=1, relu=True)

        out: Dict = {}
        if switch.get("scene"):
            x = conv(f, dec["scene_head_conv"], padding=1, relu=True)
            x = jnp.mean(x, axis=(1, 2), keepdims=True)
            x = conv(x, dec["scene_head_out"])
            out["scene"] = jax.nn.softmax(x[:, 0, 0, :], axis=-1)

        fpn_features = [f]
        for i in reversed(range(len(conv_out) - 1)):
            lateral = conv(conv_out[i], dec["fpn_in"][i], relu=True)
            f = lateral + resize_bilinear(f, lateral.shape[1:3])
            fpn_features.append(conv(f, dec["fpn_out"][i], padding=1,
                                     relu=True))
        fpn_features.reverse()  # [P2 .. P5]

        if switch.get("material"):
            x = conv(fpn_features[0], dec["material_head_conv"], padding=1,
                     relu=True)
            x = conv(x, dec["material_head_out"])
            if seg_size is not None:
                x = resize_bilinear(x, seg_size)
            out["material"] = jax.nn.softmax(x, axis=-1)

        if switch.get("object") or switch.get("part"):
            size2 = fpn_features[0].shape[1:3]
            fusion = jnp.concatenate(
                [fpn_features[0]] + [resize_bilinear(p, size2)
                                     for p in fpn_features[1:]], axis=-1)
            x = conv(fusion, dec["conv_fusion"], padding=1, relu=True)
            if switch.get("object"):
                o = conv(conv(x, dec["object_head_conv"], padding=1,
                              relu=True), dec["object_head_out"])
                if seg_size is not None:
                    o = resize_bilinear(o, seg_size)
                out["object"] = jax.nn.softmax(o, axis=-1)
            if switch.get("part"):
                pmap = conv(conv(x, dec["part_head_conv"], padding=1,
                                 relu=True), dec["part_head_out"])
                if seg_size is not None:
                    pmap = resize_bilinear(pmap, seg_size)
                parts, head = [], 0
                for obj in self.object_with_part:
                    n = len(self.object_part[obj])
                    parts.append(jax.nn.softmax(
                        pmap[..., head:head + n], axis=-1))
                    head += n
                out["part"] = parts
        return out

    # -- params -----------------------------------------------------------------
    def init_params(self, key) -> Dict:
        key, ke = jax.random.split(key)
        dec: Dict = {}
        ppm = []
        for _ in POOL_SCALES:
            key, k1 = jax.random.split(key)
            ppm.append(init_conv(k1, 512, FC_DIM, 1))
        dec["ppm_conv"] = ppm
        key, k1 = jax.random.split(key)
        dec["ppm_last_conv"] = init_conv(
            k1, FPN_DIM, FC_DIM + len(POOL_SCALES) * 512, 3)
        fpn_in, fpn_out = [], []
        for inplane in FPN_INPLANES[:-1]:
            key, k1, k2 = jax.random.split(key, 3)
            fpn_in.append(init_conv(k1, FPN_DIM, inplane, 1))
            fpn_out.append(init_conv(k2, FPN_DIM, FPN_DIM, 3))
        dec["fpn_in"], dec["fpn_out"] = fpn_in, fpn_out
        key, k1 = jax.random.split(key)
        dec["conv_fusion"] = init_conv(k1, FPN_DIM,
                                       len(FPN_INPLANES) * FPN_DIM, 3)
        for head, n in [("scene", self.nr_classes["scene"]),
                        ("object", self.nr_classes["object"]),
                        ("part", self.nr_classes["part"]),
                        ("material", self.nr_classes["material"])]:
            key, k1, k2 = jax.random.split(key, 3)
            dec[f"{head}_head_conv"] = init_conv(k1, FPN_DIM, FPN_DIM, 3)
            dec[f"{head}_head_out"] = init_conv(k2, n, FPN_DIM, 1)
        return {"encoder": init_resnet50(ke), "decoder": dec}

    def params_from_torch(self, enc_sd: Dict, dec_sd: Dict) -> Dict:
        """Convert the released encoder/decoder checkpoints (BN folded).
        Key layout per reference upsegmodel/models.py:252-320."""
        dec: Dict = {}
        dec["ppm_conv"] = [
            fold_bn(dec_sd, f"ppm_conv.{i}.0", f"ppm_conv.{i}.1")
            for i in range(len(POOL_SCALES))]
        dec["ppm_last_conv"] = fold_bn(dec_sd, "ppm_last_conv.0",
                                       "ppm_last_conv.1")
        dec["fpn_in"] = [fold_bn(dec_sd, f"fpn_in.{i}.0", f"fpn_in.{i}.1")
                         for i in range(len(FPN_INPLANES) - 1)]
        dec["fpn_out"] = [fold_bn(dec_sd, f"fpn_out.{i}.0.0",
                                  f"fpn_out.{i}.0.1")
                          for i in range(len(FPN_INPLANES) - 1)]
        dec["conv_fusion"] = fold_bn(dec_sd, "conv_fusion.0",
                                     "conv_fusion.1")
        for head in ["scene", "object", "part", "material"]:
            dec[f"{head}_head_conv"] = fold_bn(
                dec_sd, f"{head}_head.0.0", f"{head}_head.0.1")
            out_idx = 2 if head == "scene" else 1
            dec[f"{head}_head_out"] = fold_bn(
                dec_sd, f"{head}_head.{out_idx}", None)
        return {"encoder": resnet50_from_torch(enc_sd),
                "decoder": dec}
