"""Segmenter wrappers: unified parsing ('netpqc'), merged, and null
segmenters — behavioral rebuild of reference utils/segmenter.py.

Images enter as RGB [-1, 1] NHWC; outputs are multilabel long maps
(B, M, H, W) where channel 0 = object class, 1 = material (offset into the
shared numbering), 2 = part, optionally 3-4 = quad-subdivided objects
(reference segment_batch, segmenter.py:281-318)."""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .nn import adaptive_avg_pool
from .upernet import UPerNet

# BGR mean subtraction constants (reference segmenter.py:255-258 — the
# released model was trained on BGR caffe-style inputs)
MEAN_BGR = np.array([102.9801, 115.9465, 122.7717], np.float32)


class BaseSegmenter:
    def get_label_and_category_names(self):
        raise NotImplementedError

    def segment_batch(self, tensor_images, downsample=1):
        raise NotImplementedError

    def predict_single_class(self, tensor_images, classnum, downsample=1):
        raise NotImplementedError


class NoSegmenter(BaseSegmenter):
    """(reference segmenter.py:116-147)"""

    def get_label_and_category_names(self):
        return [("-", "-")], ["-"]

    def segment_batch(self, tensor_images, downsample=1):
        x = np.asarray(tensor_images)
        return np.zeros((x.shape[0], 1, x.shape[1] // downsample,
                         x.shape[2] // downsample), np.int64)

    def predict_single_class(self, tensor_images, classnum, downsample=1):
        x = np.asarray(tensor_images)
        shape = (x.shape[0], x.shape[1] // downsample,
                 x.shape[2] // downsample)
        return np.zeros(shape, np.float32), np.zeros(shape, bool)


class MergedSegmenter(BaseSegmenter):
    """Concatenate several segmenters' channels with offset label spaces
    (reference segmenter.py:82-113: each component's labels are appended
    verbatim and its label values shifted by the cumulative offset —
    including its background channel, matching the reference exactly)."""

    def __init__(self, component_segmenters: Sequence[BaseSegmenter]):
        self.segmenters = list(component_segmenters)
        self.accepts_uint8 = all(getattr(s, "accepts_uint8", False)
                                 for s in self.segmenters)
        self.labels = []
        self.cats = []
        self.offsets = []
        for seg in self.segmenters:
            self.offsets.append(len(self.labels))
            labels, cats = seg.get_label_and_category_names()
            self.labels.extend(labels)
            for c in cats:
                if c not in self.cats:
                    self.cats.append(c)

    def get_label_and_category_names(self):
        return self.labels, self.cats

    def segment_batch(self, tensor_images, downsample=1):
        outs = []
        for off, seg in zip(self.offsets, self.segmenters):
            s = np.asarray(seg.segment_batch(tensor_images, downsample))
            outs.append(s + off)
        return np.concatenate(outs, axis=1)

    def predict_single_class(self, tensor_images, classnum, downsample=1):
        """Route a merged class number to the owning component
        (reference segmenter.py:107-113)."""
        seg = self.segmenters[-1]
        for i, s in enumerate(self.segmenters):
            if i + 1 == len(self.offsets) or \
                    classnum < self.offsets[i + 1]:
                seg = s
                classnum -= self.offsets[i]
                break
        return seg.predict_single_class(tensor_images, classnum,
                                        downsample=downsample)


def _component_masks(seg_batch: np.ndarray):
    """Yield (image_index, component_mask) for connected components of each
    image's object map, separated *per class value* with 8-connectivity
    (matching the reference's skimage.morphology.label semantics)."""
    import scipy.ndimage
    eight = np.ones((3, 3), int)
    for i, seg in enumerate(seg_batch):
        for value in np.unique(seg):
            if value == 0:
                continue
            labeled, n = scipy.ndimage.label(seg == value,
                                             structure=eight)
            for comp in range(1, n + 1):
                yield i, labeled == comp


class UnifiedParsingSegmenter(BaseSegmenter):
    """The 'netpqc' multilabel segmenter (reference segmenter.py:150-389):
    multi-resolution voting over softmax maps, shared object/material/part
    numbering, optional quad subdivision.

    Needs a labeldata dict (the released labels json) and UPerNet params;
    ``load_segmenter('netpqc')`` resolves both from the weights dir.
    """

    def __init__(self, params, labeldata: Dict, segsizes=None, segdiv=None,
                 all_parts: bool = False):
        self.segsizes = segsizes or [256]
        self.segdiv = segdiv or "undivided"
        mult = 5 if self.segdiv == "quad" else 1
        self.divmult = mult
        self.labeldata = labeldata
        object_to_num = {k: v for v, k in enumerate(labeldata["object"])}
        part_to_num = {k: v for v, k in enumerate(labeldata["part"])}
        object_part = {object_to_num[k]: [part_to_num[p] for p in v]
                       for k, v in labeldata["object_part"].items()}
        object_with_part = sorted(object_part.keys())
        nr_classes = {"object": len(labeldata["object"]),
                      "part": sum(len(v) for v in object_part.values()),
                      "material": len(labeldata["material"]),
                      "scene": len(labeldata.get("scene", ["-"]))}
        self.net = UPerNet(nr_classes, object_with_part, object_part)
        self.params = params
        self._jit_fwd = jax.jit(self.net.__call__,
                                static_argnames=("seg_size",))

        # shared numbering: 0, objects, [divided], materials, parts
        # (reference segmenter.py:179-216)
        first_partnumber = ((len(labeldata["object"]) - 1) * mult + 1
                            + (len(labeldata["material"]) - 1))
        if all_parts:
            partobjects = list(labeldata["object_part"].keys())
        else:
            partobjects = [p for p in ["sky", "building", "person"]
                           if p in labeldata["object_part"]]
        partnumbers, partnames = {}, []
        part_index_translation = []
        for owner in partobjects:
            numeric = []
            for part in labeldata["object_part"][owner]:
                if part in object_to_num:
                    numeric.append(object_to_num[part])
                elif part in partnumbers:
                    numeric.append(partnumbers[part])
                else:
                    partnumbers[part] = len(partnames) + first_partnumber
                    partnames.append(part)
                    numeric.append(partnumbers[part])
            part_index_translation.append(np.array(numeric, np.int64))
        self.objects_with_parts = [object_to_num[o] for o in partobjects]
        self._owner_head = {object_to_num[o]: object_with_part.index(
            object_to_num[o]) for o in partobjects}
        self.part_index = part_index_translation
        self.part_names = partnames
        self.num_classes = (1 + (len(labeldata["object"]) - 1) * mult
                            + (len(labeldata["material"]) - 1)
                            + len(partnames))
        self.num_object_classes = len(labeldata["object"]) - 1

    def get_label_and_category_names(self):
        """(reference segmenter.py:220-242)"""
        suffixes = ["t", "l", "b", "r"] if self.segdiv == "quad" else []
        divided = [("%s-%s" % (label, s), "part")
                   for s in suffixes
                   for label in self.labeldata["object"][1:]]
        labelcats = (
            [(label, "object") for label in self.labeldata["object"]]
            + divided
            + [(label, "material")
               for label in self.labeldata["material"][1:]]
            + [(label, "part") for label in self.part_names])
        return labelcats, ["object", "part", "material"]

    # -- prediction ---------------------------------------------------------
    accepts_uint8 = True  # device-normalized byte input (seg_stats driver)

    def raw_seg_prediction(self, tensor_images, downsample: int = 1):
        """Multi-resolution voting on softmax maps
        (reference segmenter.py:244-280). Input RGB zc NHWC, or uint8
        [0,255] (the model's native scale — the zc->[0,255] round-trip
        cancels, so bytes go straight to BGR mean subtraction; 4x fewer
        host-link bytes for streaming drivers like metrics/seg_stats)."""
        x = jnp.asarray(tensor_images)
        b, y, xdim = x.shape[0], x.shape[1], x.shape[2]
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32)
        else:
            # zc -> [0,255]
            x = (jnp.asarray(x, jnp.float32) + 1.0) / 2.0 * 255.0
        # RGB -> BGR, subtract channel means
        x = x[..., ::-1] - jnp.asarray(MEAN_BGR)
        seg_shape = (y // downsample, xdim // downsample)
        pred = {k: 0.0 for k in ["object", "material"]}
        part_pred = {i: 0.0 for i in range(len(self.part_index))}
        for s in self.segsizes:
            resized = x if (s, s) == x.shape[1:3] else \
                adaptive_avg_pool(x, (s, s))
            r = self._jit_fwd(self.params, resized, seg_size=seg_shape)
            for k in pred:
                pred[k] = pred[k] + r[k]
            for i, owner in enumerate(self.objects_with_parts):
                part_pred[i] = part_pred[i] + r["part"][
                    self._owner_head[owner]]
        return pred, part_pred

    def segment_batch(self, tensor_images, downsample: int = 1):
        """(B, 3[+2], H, W) int64 multilabel maps
        (reference segmenter.py:281-318)."""
        pred, part_pred = self.raw_seg_prediction(tensor_images, downsample)
        piece_channels = 2 if self.segdiv == "quad" else 0
        obj = np.asarray(jnp.argmax(pred["object"], axis=-1))
        mat = np.asarray(jnp.argmax(pred["material"], axis=-1))
        b, h, w = obj.shape
        segs = np.zeros((b, 3 + piece_channels, h, w), np.int64)
        segs[:, 0] = obj
        maskout = mat == 0
        mat = mat + (len(self.labeldata["object"]) - 1) * self.divmult
        mat[maskout] = 0
        segs[:, 1] = mat
        for i, object_index in enumerate(self.objects_with_parts):
            trans = self.part_index[i]
            seg = trans[np.asarray(jnp.argmax(part_pred[i], axis=-1))]
            mask = segs[:, 0] == object_index
            segs[:, 2][mask] = seg[mask]
        if self.segdiv == "quad":
            segs = self.expand_segment_quad(segs)
        return segs

    def predict_single_class(self, tensor_images, classnum: int,
                             downsample: int = 1):
        """(differentiable class score map, argmax mask)
        (reference segmenter.py:320-361)."""
        pred, part_pred = self.raw_seg_prediction(tensor_images, downsample)
        material_offset = (len(self.labeldata["object"]) - 1) * self.divmult
        if material_offset < classnum < material_offset + len(
                self.labeldata["material"]):
            c = classnum - material_offset
            return (pred["material"][..., c],
                    jnp.argmax(pred["material"], axis=-1) == c)
        result, mask = None, None
        if classnum < len(self.labeldata["object"]):
            result = pred["object"][..., classnum]
            mask = jnp.argmax(pred["object"], axis=-1) == classnum
        for i, object_index in enumerate(self.objects_with_parts):
            local = np.nonzero(self.part_index[i] == classnum)[0]
            if len(local) == 0:
                continue
            local = int(local[0])
            mask2 = (jnp.argmax(pred["object"], axis=-1) == object_index) \
                & (jnp.argmax(part_pred[i], axis=-1) == local)
            mask = mask2 if mask is None else (mask | mask2)
            add = part_pred[i][..., local]
            result = add if result is None else result + add
        assert result is not None, f"unrecognized class {classnum}"
        return result, mask

    def expand_segment_quad(self, segs: np.ndarray):
        """Split each object component into t/l/b/r quadrant labels
        (reference segmenter.py:363-389)."""
        segs[:, 3:] = segs[:, 0:1]
        n = self.num_object_classes
        for i, mask in _component_masks(segs[:, 0]):
            rows = np.nonzero(mask.any(axis=1))[0]
            cols = np.nonzero(mask.any(axis=0))[0]
            vmid = (rows[0] + rows[-1] + 1) // 2
            hmid = (cols[0] + cols[-1] + 1) // 2
            quad = np.repeat(mask[None], 4, axis=0).astype(np.int64)
            quad[0, vmid:, :] = 0  # top
            quad[1, :, hmid:] = 0  # right
            quad[2, :vmid, :] = 0  # bottom
            quad[3, :, :hmid] = 0  # left
            segs[i, 3] += quad[0] * n + quad[2] * (3 * n)
            segs[i, 4] += quad[1] * (2 * n) + quad[3] * (4 * n)
        small = segs[:, 3:] <= n
        segs[:, 3:][small] = 0
        return segs


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------

def load_segmenter(segmenter_name: str = "netpqc", params=None,
                   labeldata: Optional[Dict] = None):
    """(segmenter, label list) — reference utils/segmenter.py:16-41.
    Flags after 'net': p=all parts, q=quad subdivision, x=texture model,
    c=color model; e.g. 'netpqc' -> unified parsing with all parts + quad,
    merged with the color semantic segmenter."""
    assert segmenter_name.startswith("net")
    flags = segmenter_name[3:]
    segdiv = "quad" if "q" in flags else None
    all_parts = "p" in flags
    if params is None or labeldata is None:
        params, labeldata = _load_released_upp()
    segmodels = [UnifiedParsingSegmenter(params, labeldata, segdiv=segdiv,
                                         all_parts=all_parts)]
    if "x" in flags:
        segmodels.append(_load_released_semantic("texture"))
    if "c" in flags:
        segmodels.append(_load_released_semantic("color"))
    seg = segmodels[0] if len(segmodels) == 1 else \
        MergedSegmenter(segmodels)
    labels, cats = seg.get_label_and_category_names()
    return seg, [label for label, cat in labels]


def _load_released_semantic(vocab: str):
    """Load a released texture/color semantic model
    ($REWRITING_TPU_WEIGHTS/segmodel/{vocab}-resnet18dilated-ppm_deepsup/
    with encoder/decoder .pth + labels.json; reference
    ensure_segmenter_downloaded, segmenter.py:651-669)."""
    from ..models.zoo import _torch_load_numpy, weights_dir
    from .semantic import (PPMDecoder, SemanticSegmenter,
                           resnet18_deepstem_from_torch)
    base = os.path.join(weights_dir(), "segmodel",
                        f"{vocab}-resnet18dilated-ppm_deepsup")
    import glob
    encs = sorted(glob.glob(os.path.join(base, "encoder_epoch_*.pth")))
    decs = sorted(glob.glob(os.path.join(base, "decoder_epoch_*.pth")))
    lab = os.path.join(base, "labels.json")
    if not (encs and decs and os.path.exists(lab)):
        raise FileNotFoundError(
            f"{vocab} semantic model not found under {base}; place "
            "encoder/decoder epoch .pth and labels.json from the "
            "netdissect segmodel release there.")
    with open(lab) as f:
        meta = json.load(f)
    label_names = ["-"] + [
        (l["name"] if isinstance(l, dict) else str(l))
        for l in meta["labels"]]
    imageformat = meta.get("imageformat")
    dec = PPMDecoder(num_class=len(label_names) - 1, fc_dim=512)
    params = {"encoder": resnet18_deepstem_from_torch(
        _torch_load_numpy(encs[-1])),
        "decoder": dec.params_from_torch(_torch_load_numpy(decs[-1]))}
    return SemanticSegmenter(params, label_names[1:],
                             arch="resnet18dilated", category=vocab,
                             imageformat=imageformat,
                             segsizes=meta.get("segsizes", [256]))


def _load_released_upp():
    """Load the released unified-parsing checkpoint from the weights dir
    ($REWRITING_TPU_WEIGHTS/upp/): encoder_epoch_40.pth,
    decoder_epoch_40.pth, labels.json."""
    from ..models.zoo import weights_dir
    base = os.path.join(weights_dir(), "upp")
    enc = os.path.join(base, "encoder_epoch_40.pth")
    dec = os.path.join(base, "decoder_epoch_40.pth")
    lab = os.path.join(base, "labels.json")
    if not all(os.path.exists(p) for p in [enc, dec, lab]):
        raise FileNotFoundError(
            f"unified-parsing checkpoint not found under {base}; place "
            "encoder_epoch_40.pth / decoder_epoch_40.pth / labels.json "
            "from the CSAIL unifiedparsing release there.")
    with open(lab) as f:
        labeldata = json.load(f)
    from ..models.zoo import _torch_load_numpy
    enc_sd = _torch_load_numpy(enc)
    dec_sd = _torch_load_numpy(dec)
    object_to_num = {k: v for v, k in enumerate(labeldata["object"])}
    part_to_num = {k: v for v, k in enumerate(labeldata["part"])}
    object_part = {object_to_num[k]: [part_to_num[p] for p in v]
                   for k, v in labeldata["object_part"].items()}
    net = UPerNet({"object": len(labeldata["object"]),
                   "part": sum(len(v) for v in object_part.values()),
                   "material": len(labeldata["material"]),
                   "scene": len(labeldata.get("scene", ["-"]))},
                  sorted(object_part.keys()), object_part)
    return net.params_from_torch(enc_sd, dec_sd), labeldata
