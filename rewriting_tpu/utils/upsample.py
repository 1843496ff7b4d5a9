"""Activation upsampling with receptive-field-aligned coordinates.

Behavioral equivalent of the reference's upsample module (utils/upsample.py):
maps low-resolution feature-map grids onto image pixel coordinates using the
(scale, offset) induced by a stack of conv/pool layers, then bilinearly
interpolates.  Host-side numpy (visualization path)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def convconfig_scale_offset(convconfigs):
    """Compose (kernel, stride, padding) stages into the affine map from
    output-grid coords to input coords: x_in = scale * x_out + offset
    (reference upsample.py:85-98).  convconfigs: [(k, s, p), ...]."""
    scale, offset = 1.0, 0.0
    for k, s, p in reversed(convconfigs):
        offset = offset * s + (k - 1) / 2.0 - p
        scale = scale * s
    return scale, offset


def sequence_scale_offset(convconfigs):
    """Alias mirroring the reference name (operating on explicit configs
    rather than torch modules)."""
    return convconfig_scale_offset(convconfigs)


def convconfig_data_size(convconfigs, data_size):
    """Output spatial size after applying the conv stack to `data_size`
    (reference upsample.py:99-106)."""
    size = np.asarray(data_size, float)
    for k, s, p in convconfigs:
        size = np.floor((size + 2 * p - k) / s) + 1
    return tuple(int(v) for v in size)


def _axis_coords(target_n, data_n, scale=None, offset=None):
    if scale is None:
        # default: proportional stretch with half-pixel alignment
        scale = target_n / data_n
        offset = scale / 2.0 - 0.5
    # source coordinate of each target pixel
    return (np.arange(target_n) - offset) / scale


def resize_bilinear(data: np.ndarray, target_shape: Tuple[int, int],
                    scale_offset=None) -> np.ndarray:
    """Bilinear resize of (H, W) or (H, W, C) data to target_shape, with
    optional per-axis (scale, offset) mapping from data grid to target
    pixels (edge-clamped)."""
    data = np.asarray(data, np.float32)
    h, w = data.shape[:2]
    th, tw = target_shape
    if scale_offset is None:
        ys = _axis_coords(th, h)
        xs = _axis_coords(tw, w)
    else:
        (sy, oy), (sx, ox) = scale_offset
        ys = (np.arange(th) - oy) / sy
        xs = (np.arange(tw) - ox) / sx
    ys = np.clip(ys, 0, h - 1)
    xs = np.clip(xs, 0, w - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    if data.ndim == 3:
        wy = wy[..., None]
        wx = wx[..., None]
    a = data[y0][:, x0]
    b = data[y0][:, x1]
    c = data[y1][:, x0]
    d = data[y1][:, x1]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx)


def upsampler(target_shape, data_shape=None, image_size=None,
              scale_offset=None):
    """Returns fn(data) that upsamples (H, W[, C]) or (B, H, W[, C]) data
    to target_shape with receptive-field alignment when scale_offset (from
    sequence_scale_offset) is given (reference upsample.py:5-44)."""
    def up(data):
        data = np.asarray(data)
        if data.ndim >= 3 and data_shape is not None \
                and data.shape[:2] != tuple(data_shape):
            # batched input
            return np.stack([up(d) for d in data])
        if data.ndim == 4 or (data.ndim == 3 and data_shape is not None
                              and data.shape[0] != data_shape[0]):
            return np.stack([up(d) for d in data])
        so = None
        if scale_offset is not None:
            (s, o) = scale_offset
            if image_size is not None:
                # map feature grid -> image grid -> target pixels
                sy = target_shape[0] / image_size[0]
                sx = target_shape[1] / image_size[1]
                so = ((s * sy, o * sy), (s * sx, o * sx))
            else:
                # target IS image space: apply alignment directly
                so = ((s, o), (s, o))
        return resize_bilinear(data, tuple(target_shape), so)
    return up


# class names the reference treats as "sizing" transforms
# (reference upsample.py:175-177: torchvision Resize/RandomCrop/
# RandomResizedCrop/CenterCrop); matched by name so this works both with
# torchvision objects and with any duck-typed transform of the same role.
_SIZER_TYPENAMES = ("Resize", "RandomCrop", "RandomResizedCrop",
                    "CenterCrop")


def find_sizer(source):
    """Crawl the transforms attached to a dataset looking for the last
    crop/resize transform (reference upsample.py:168-186).  Follows
    `.transform` then each of `.transforms` in reverse; a sizer is an
    object whose type name matches a known sizing transform and which
    exposes `.size`."""
    if source is None:
        return None
    if type(source).__name__ in _SIZER_TYPENAMES and hasattr(source, "size"):
        return source
    t = getattr(source, "transform", None)
    if t is not None:
        return find_sizer(t)
    ts = getattr(source, "transforms", None)
    if ts is not None:
        for t in reversed(list(ts)):
            result = find_sizer(t)
            if result is not None:
                return result
    return None


def image_size_from_source(source):
    """(H, W) produced by a dataset/source: its last sizing transform if
    any, else its `resolution` attribute (reference upsample.py:158-165).
    Also accepts a bare `image_size` attribute (our model configs)."""
    sizer = find_sizer(source)
    if sizer is not None:
        size = sizer.size
    elif hasattr(source, "resolution"):
        size = source.resolution
    elif hasattr(source, "image_size"):
        size = source.image_size
    else:
        raise ValueError(
            f"cannot infer image size from {type(source).__name__!r}: no "
            "sizing transform, resolution, or image_size attribute")
    if hasattr(size, "__len__"):
        return tuple(size)
    return (size, size)
