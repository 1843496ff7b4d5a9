"""Selection geometry: bounding boxes, center pasting, crop alignment.

NHWC equivalents of the reference's mask/activation geometry helpers
(reference: rewrite/ganrewrite.py:767-803).  These run on host data (masks
are painted in the UI), so shapes become static Python ints — exactly what
the jitted solve downstream needs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

Box = Tuple[int, int, int, int]  # (top, left, bottom, right) exclusive b/r


def positive_bounding_box(mask) -> Box:
    """Tight bbox of mask > 0 (reference ganrewrite.py:767-777)."""
    mask = np.asarray(mask)
    pos = mask > 0
    if not pos.any():
        return 0, 0, 0, 0
    rows = np.nonzero(pos.any(axis=1))[0]
    cols = np.nonzero(pos.any(axis=0))[0]
    return int(rows[0]), int(cols[0]), int(rows[-1]) + 1, int(cols[-1]) + 1


def centered_location(mask) -> Tuple[int, int]:
    t, l, b, r = positive_bounding_box(mask)
    return (t + b) // 2, (l + r) // 2


def paste_clip_at_center(source, clip, center, area=None):
    """Paste `clip` (B, h, w, C) into `source` (B, H, W, C) centered at
    `center`, clamped in-bounds; optional alpha-area blend
    (reference ganrewrite.py:785-794). Returns (pasted, (t, l, b, r))."""
    source = np.asarray(source)
    clip = np.asarray(clip)
    target = source.copy()
    (h, w), (H, W) = clip.shape[1:3], source.shape[1:3]
    t = max(0, min(H - h, center[0] - h // 2))
    l = max(0, min(W - w, center[1] - w // 2))
    b, r = t + h, l + w
    if area is None:
        target[:, t:b, l:r, :] = clip
    else:
        a = np.asarray(area, np.float32)[None, :, :, None]
        target[:, t:b, l:r, :] = (1 - a) * target[:, t:b, l:r, :] + a * clip
    return target, (t, l, b, r)


def crop_clip_to_bounds(source, target, bounds: Box):
    """Tight-paste cropping: crop both the (possibly lower-resolution)
    source fmap and the target fmap to the paste bounds, respecting the
    integer resolution ratio between them (reference ganrewrite.py:797-803).

    Returns (src_crop, tgt_crop, src_bounds, tgt_bounds)."""
    t, l, b, r = bounds
    vr = target.shape[1] // source.shape[1]
    hr = target.shape[2] // source.shape[2]
    st, sl = t // vr, l // hr
    sb, sr = -(-b // vr), -(-r // hr)   # ceil div
    tt, tl, tb, tr = st * vr, sl * hr, sb * vr, sr * hr
    cs = source[:, st:sb, sl:sr, :]
    ct = target[:, tt:tb, tl:tr, :]
    return cs, ct, (st, sl, sb, sr), (tt, tl, tb, tr)
