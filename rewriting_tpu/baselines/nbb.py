"""Neural Best-Buddies baseline: sparse cross-image correspondences,
MLS warping, and Poisson blending.

Compact clean-room rebuild of the reference's vendored NBB baseline
(baselines/neural_best_buddies/: algorithms/neural_best_buddies.py, MLS
warp util/MLS.py, poisson blending pyflow/poisson_image_editing.py) used
as a copy-paste comparison method:

1. extract feature pyramids for two images (any multi-tap extractor; by
   default the LPIPS VGG16 taps),
2. find *mutual nearest neighbor* feature pairs (best buddies) at the
   coarsest level via a normalized cross-correlation matrix (one matmul),
3. refine coarse-to-fine by searching small windows around each upsampled
   correspondence,
4. keep the top-k pairs by activation energy,
5. warp with moving-least-squares and blend seamlessly by solving the
   Poisson equation (scipy sparse).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# features
# ---------------------------------------------------------------------------

def default_feature_pyramid(images) -> List[np.ndarray]:
    """(B, H, W, 3) zc images -> list of NHWC feature maps, fine->coarse,
    from the LPIPS VGG16 taps (random weights still give meaningful
    correlation structure; pass converted weights for the real method)."""
    import jax
    from ..metrics.lpips import LPIPS, vgg16_taps, _SHIFT, _SCALE
    params = LPIPS.init_params(jax.random.PRNGKey(0))
    taps = vgg16_taps(params, (np.asarray(images, np.float32)
                               - _SHIFT) / _SCALE)
    return [np.asarray(t) for t in taps]


def _normalize_feats(f: np.ndarray) -> np.ndarray:
    flat = f.reshape(-1, f.shape[-1])
    return flat / (np.linalg.norm(flat, axis=1, keepdims=True) + 1e-10)


def mutual_nearest_neighbors(fa: np.ndarray, fb: np.ndarray
                             ) -> List[Tuple[int, int]]:
    """Best buddies between (H, W, C) feature maps: pairs (ia, ib) of flat
    indices that are each other's nearest neighbor under cosine
    similarity."""
    na = _normalize_feats(fa)
    nb = _normalize_feats(fb)
    sim = na @ nb.T
    a2b = sim.argmax(axis=1)
    b2a = sim.argmax(axis=0)
    return [(ia, ib) for ia, ib in enumerate(a2b) if b2a[ib] == ia]


def _window_argmax(feats_n, center, vec, radius):
    """Best-correlated position with `vec` within a window around center."""
    h, w = feats_n.shape[:2]
    y, x = center
    y0, y1 = max(y - radius, 0), min(y + radius + 1, h)
    x0, x1 = max(x - radius, 0), min(x + radius + 1, w)
    window = feats_n[y0:y1, x0:x1].reshape(-1, feats_n.shape[-1])
    k = int((window @ vec).argmax())
    wy, wx = np.unravel_index(k, (y1 - y0, x1 - x0))
    return (y0 + int(wy), x0 + int(wx))


def _refine_level(fa, fb, pairs_coarse, scale: int, radius: int = 1):
    """Local two-step refinement on a finer level: fix the upsampled a
    location, re-localize b within a small window, then re-localize a
    against the refined b.  Duplicates are collapsed."""
    na = fa / (np.linalg.norm(fa, axis=-1, keepdims=True) + 1e-10)
    nb = fb / (np.linalg.norm(fb, axis=-1, keepdims=True) + 1e-10)
    ha, wa = fa.shape[:2]
    hb, wb = fb.shape[:2]
    refined = []
    seen = set()
    for (ya, xa), (yb, xb) in pairs_coarse:
        pa = (min(int(ya) * scale, ha - 1), min(int(xa) * scale, wa - 1))
        pb0 = (min(int(yb) * scale, hb - 1), min(int(xb) * scale, wb - 1))
        pb = _window_argmax(nb, pb0, na[pa[0], pa[1]], radius)
        pa = _window_argmax(na, pa, nb[pb[0], pb[1]], radius)
        key = (pa, pb)
        if key not in seen:
            seen.add(key)
            refined.append((pa, pb))
    return refined


def neural_best_buddies(images_a, images_b, k: int = 10,
                        feature_fn: Optional[Callable] = None,
                        radius: int = 2):
    """Top-k sparse correspondences between two (1, H, W, 3) zc images,
    returned as pixel coordinates [((ya, xa), (yb, xb)), ...]."""
    feature_fn = feature_fn or default_feature_pyramid
    pyr_a = feature_fn(images_a)
    pyr_b = feature_fn(images_b)
    # coarsest level: global mutual nearest neighbors
    fa, fb = pyr_a[-1][0], pyr_b[-1][0]
    pairs = [(tuple(int(v) for v in np.unravel_index(ia, fa.shape[:2])),
              tuple(int(v) for v in np.unravel_index(ib, fb.shape[:2])))
             for ia, ib in mutual_nearest_neighbors(fa, fb)]
    # energy ranking: product of mean activations at the two points
    def energy(level_a, level_b, p):
        (ya, xa), (yb, xb) = p
        return (np.abs(level_a[ya, xa]).mean()
                * np.abs(level_b[yb, xb]).mean())
    pairs.sort(key=lambda p: -energy(fa, fb, p))
    pairs = pairs[:max(k * 3, k)]
    # coarse-to-fine refinement
    for level in range(len(pyr_a) - 2, -1, -1):
        la, lb = pyr_a[level][0], pyr_b[level][0]
        scale = la.shape[0] // pyr_a[level + 1][0].shape[0]
        pairs = _refine_level(la, lb, pairs, scale, radius=radius)
    la, lb = pyr_a[0][0], pyr_b[0][0]
    pairs.sort(key=lambda p: -energy(la, lb, p))
    h_img = np.asarray(images_a).shape[1]
    scale = h_img // la.shape[0]
    return [((ya * scale, xa * scale), (yb * scale, xb * scale))
            for (ya, xa), (yb, xb) in pairs[:k]]


# ---------------------------------------------------------------------------
# moving least squares warp (similarity variant)
# ---------------------------------------------------------------------------

def mls_warp(image, src_points, dst_points, alpha: float = 1.0):
    """Warp (H, W, C) so that dst control points map onto src ones
    (backward warping with MLS affine deformation; reference util/MLS.py).
    Points are (y, x)."""
    image = np.asarray(image, np.float32)
    h, w = image.shape[:2]
    p = np.asarray(dst_points, np.float64)  # control pts in OUTPUT space
    q = np.asarray(src_points, np.float64)  # their positions in INPUT
    if len(p) == 0:
        return image.copy()
    gy, gx = np.mgrid[0:h, 0:w]
    v = np.stack([gy, gx], axis=-1).astype(np.float64)  # (H, W, 2)
    # weights w_i = 1 / |p_i - v|^(2*alpha)
    d2 = ((v[:, :, None, :] - p[None, None, :, :]) ** 2).sum(-1)
    wgt = 1.0 / np.maximum(d2, 1e-8) ** alpha           # (H, W, n)
    wsum = wgt.sum(-1, keepdims=True)
    pstar = (wgt[..., None] * p).sum(2) / wsum          # (H, W, 2)
    qstar = (wgt[..., None] * q).sum(2) / wsum
    ph = p[None, None] - pstar[:, :, None, :]           # (H, W, n, 2)
    qh = q[None, None] - qstar[:, :, None, :]
    # affine MLS: M = (sum w p̂ᵀ p̂)^-1 (sum w p̂ᵀ q̂)
    A = np.einsum("hwn,hwni,hwnj->hwij", wgt, ph, ph)
    B = np.einsum("hwn,hwni,hwnj->hwij", wgt, ph, qh)
    # regularize and solve
    A += np.eye(2)[None, None] * 1e-8
    M = np.linalg.solve(A, B)
    src = np.einsum("hwi,hwij->hwj", v - pstar, M) + qstar
    sy = np.clip(src[..., 0], 0, h - 1)
    sx = np.clip(src[..., 1], 0, w - 1)
    y0 = np.floor(sy).astype(int)
    x0 = np.floor(sx).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (sy - y0)[..., None]
    fx = (sx - x0)[..., None]
    out = (image[y0, x0] * (1 - fy) * (1 - fx)
           + image[y0, x1] * (1 - fy) * fx
           + image[y1, x0] * fy * (1 - fx)
           + image[y1, x1] * fy * fx)
    return out.astype(image.dtype)


# ---------------------------------------------------------------------------
# poisson blending
# ---------------------------------------------------------------------------

def poisson_blend(target, source, mask):
    """Seamless cloning: solve the Poisson equation with source gradients
    inside mask and target boundary values (reference
    pyflow/poisson_image_editing.py). target/source (H, W, C), mask (H, W)
    boolean."""
    import scipy.sparse
    import scipy.sparse.linalg
    target = np.asarray(target, np.float64)
    source = np.asarray(source, np.float64)
    mask = np.asarray(mask) > 0
    h, w = mask.shape
    idx = -np.ones((h, w), np.int64)
    ys, xs = np.nonzero(mask)
    idx[ys, xs] = np.arange(len(ys))
    n = len(ys)
    if n == 0:
        return target.copy()
    rows, cols, vals = [], [], []
    b = np.zeros((n, target.shape[2]))
    for eq, (y, x) in enumerate(zip(ys, xs)):
        rows.append(eq)
        cols.append(eq)
        vals.append(4.0)
        lap = 4.0 * source[y, x]
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            yy, xx = y + dy, x + dx
            if not (0 <= yy < h and 0 <= xx < w):
                lap -= source[y, x]
                b[eq] += target[y, x]
                continue
            lap -= source[yy, xx]
            if mask[yy, xx]:
                rows.append(eq)
                cols.append(idx[yy, xx])
                vals.append(-1.0)
            else:
                b[eq] += target[yy, xx]
        b[eq] += lap
    A = scipy.sparse.csr_matrix((vals, (rows, cols)), shape=(n, n))
    out = target.copy()
    sol = scipy.sparse.linalg.spsolve(A, b)
    out[ys, xs] = sol.reshape(n, -1)
    return out


def nbb_paste(image_a, image_b, mask_a, k: int = 10,
              feature_fn: Optional[Callable] = None):
    """The full baseline: find correspondences, MLS-warp image_a's masked
    region into image_b's frame, poisson-blend (reference main.py driver
    behavior)."""
    pairs = neural_best_buddies(image_a[None], image_b[None], k=k,
                                feature_fn=feature_fn)
    src_pts = [p[0] for p in pairs]
    dst_pts = [p[1] for p in pairs]
    warped = mls_warp(image_a, src_pts, dst_pts)
    warped_mask = mls_warp(np.asarray(mask_a, np.float32)[..., None],
                           src_pts, dst_pts)[..., 0] > 0.5
    return poisson_blend(image_b, warped, warped_mask), pairs
