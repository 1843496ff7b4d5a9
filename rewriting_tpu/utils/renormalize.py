"""Image <-> tensor <-> base64 data-URL conversions.

Behavioral port of the reference's normalization registry and data-URL
codec (reference: utils/renormalize.py) for NHWC numpy/JAX arrays.  Edit
requests store painted masks as base64 PNG data URLs (reference
rewriteapp.py:570-574), so this codec defines the on-disk edit format.

Normalization schemes (reference renormalize.py:84-92):
    zc       - zero centered [-1, 1] (generator output space)
    pt       - [0, 1]
    imagenet - imagenet mean/std
    byte     - [0, 255] uint8
"""

from __future__ import annotations

import base64
import io
import re

import numpy as np

try:
    import PIL.Image
    HAVE_PIL = True
except ImportError:  # pragma: no cover
    HAVE_PIL = False

OFFSET_SCALE = {
    "pt": ([0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),
    "zc": ([0.5, 0.5, 0.5], [0.5, 0.5, 0.5]),
    "imagenet": ([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
    "imagenet_meanonly": ([0.485, 0.456, 0.406],
                          [1 / 255.0, 1 / 255.0, 1 / 255.0]),
    "places_meanonly": ([0.475, 0.441, 0.408],
                        [1 / 255.0, 1 / 255.0, 1 / 255.0]),
    "byte": ([0.0, 0.0, 0.0], [1 / 255.0, 1 / 255.0, 1 / 255.0]),
}


def renormalize(data, source="zc", target="zc"):
    """Convert an (..., H, W, C) array between normalization schemes."""
    so, ss = (np.array(v, np.float32) for v in OFFSET_SCALE[source])
    to, ts = (np.array(v, np.float32) for v in OFFSET_SCALE[target])
    data = np.asarray(data, np.float32)
    out = data * (ss / ts) + (so - to) / ts
    if target == "byte":
        out = np.clip(out, 0, 255).astype(np.uint8)
    return out


def as_image(data, source="zc"):
    """(H, W, C) array -> PIL image."""
    assert HAVE_PIL, "PIL required"
    arr = renormalize(np.asarray(data), source, "byte")
    return PIL.Image.fromarray(arr)


def as_url(data, source="zc", size=None):
    """(H, W, C) array or PIL image -> base64 PNG data URL
    (reference renormalize.py:22-32)."""
    img = data if (HAVE_PIL and isinstance(data, PIL.Image.Image)) else \
        as_image(data, source)
    if size is not None:
        img = img.resize((size[1], size[0]), resample=PIL.Image.BILINEAR)
    buf = io.BytesIO()
    img.save(buf, format="png")
    return "data:image/png;base64," + base64.b64encode(
        buf.getvalue()).decode("utf-8")


def from_image(im, target="zc", size=None):
    """PIL image -> (H, W, C) float array in `target` normalization.
    `size` is (H, W)."""
    if im.mode != "RGB":
        im = im.convert("RGB")
    if size is not None:
        im = im.resize((size[1], size[0]), resample=PIL.Image.BILINEAR)
    arr = np.asarray(im, np.float32) / 255.0
    return renormalize(arr, "pt", target)


def from_url(url, target="zc", size=None):
    """base64 data URL -> (H, W, C) array (or PIL image if target='image')
    (reference renormalize.py:45-50)."""
    assert HAVE_PIL, "PIL required"
    image_data = re.sub("^data:image/.+;base64,", "", url)
    im = PIL.Image.open(io.BytesIO(base64.b64decode(image_data)))
    if target == "image" and size is None:
        return im
    return from_image(im, target, size=size)


def mask_from_url(url, size=None):
    """Decode a painted mask data URL to an (H, W) float array in [0, 1]
    (the reference uses channel 0 of the 'pt'-normalized decode,
    ganrewrite.py:344-345)."""
    return from_url(url, target="pt", size=size)[:, :, 0]


def mask_to_url(mask):
    """(H, W) float mask in [0,1] -> data URL (for building edit requests
    programmatically)."""
    arr = np.clip(np.asarray(mask, np.float32), 0, 1)
    rgb = np.stack([arr] * 3, axis=-1)
    return as_url(rgb, source="pt")
