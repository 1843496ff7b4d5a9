"""Neural Best-Buddies baseline: sparse cross-image correspondences,
MLS warping, and Poisson blending.

Clean-room rebuild of the reference's vendored NBB baseline
(baselines/neural_best_buddies/: algorithms/neural_best_buddies.py, MLS
warp util/MLS.py, poisson blending pyflow/poisson_image_editing.py) used
as a copy-paste comparison method.  The correspondence engine follows the
reference algorithm step for step (vectorized numpy instead of per-pixel
torch loops):

1. extract a 5-level feature pyramid per image (any multi-tap extractor;
   by default the LPIPS VGG16 taps),
2. at the coarsest level, compute patch-correlation nearest-neighbor
   mappings in both directions (reference find_mapping,
   neural_best_buddies.py:27-63) and keep the cycle-consistent pairs
   ("best buddies", :157-172),
3. refine coarse-to-fine: per surviving pair, re-run the best-buddy
   search inside the x2-upsampled receptive fields (:147-153, :174-178),
   matching against *common-appearance* features — the average of each
   image's own features with the warped-and-reconstructed features of the
   other image (transfer_style_local, :335-349; patch-average warp
   :65-76, warp_to_mid :78-92),
4. accumulate per-pair responses across levels (:195-204), drop pairs
   below the normalized-response threshold tau (:222-235), and pick the
   spatially-spread top-k via k-means clusters in (ya, xa, yb, xb) space
   (:303-325),
5. warp with moving-least-squares and blend seamlessly by solving the
   Poisson equation (scipy sparse).
"""

from __future__ import annotations

import math
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


# ---------------------------------------------------------------------------
# the reference algorithm's primitives (neural_best_buddies.py), vectorized
# ---------------------------------------------------------------------------

# per level L (1-indexed, L=1 finest): square patch side and search radius
# (reference patch_size_list / search_box_radius_list, :21-22)
PATCH_SIZES = (5, 5, 3, 3, 3)
SEARCH_RADII = (3, 3, 2, 2, 2)


def normalize_per_pix(F: np.ndarray) -> np.ndarray:
    """Unit-norm the channel vector at every spatial position
    (reference feature_metric.normalize_per_pix)."""
    n = np.sqrt((F * F).sum(-1, keepdims=True))
    return F / np.maximum(n, 1e-12)


def _stretch01(x: np.ndarray) -> np.ndarray:
    """Min-max normalize to [0, 1]; constant maps -> 0
    (reference feature_metric.stretch_tensor_0_to_1)."""
    lo, hi = x.min(), x.max()
    if hi == lo:
        return np.zeros_like(x)
    return (x - lo) / (hi - lo)


def response_l2(F: np.ndarray) -> np.ndarray:
    """sqrt(sum_c F^2): the per-position activation response used for
    ranking pairs (reference feature_metric.response, style='l2')."""
    return np.sqrt((F * F).sum(-1))


def get_M(F: np.ndarray, tau: float = 0.05) -> np.ndarray:
    """Boolean high-activation mask: normalized SQUARED response >= tau
    (reference get_M, neural_best_buddies.py:117-123 — note it uses the
    squared response, unlike the l2 response used for ranking)."""
    return _stretch01((F * F).sum(-1)) >= tau


def identity_map(h: int, w: int) -> np.ndarray:
    """(H, W, 2) int map of own coordinates (reference identity_map)."""
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([yy, xx], axis=-1)


def _fit_shape(arr: np.ndarray, shape) -> np.ndarray:
    """Nearest index-resize of the leading two axes to (H, W)."""
    th, tw = shape
    sh, sw = arr.shape[:2]
    if (sh, sw) == (th, tw):
        return arr
    yi = np.minimum((np.arange(th) * sh) // th, sh - 1)
    xi = np.minimum((np.arange(tw) * sw) // tw, sw - 1)
    return arr[yi][:, xi]


def upsample_mapping(mapping: np.ndarray, factor: int = 2,
                     shape=None) -> np.ndarray:
    """Nearest-upsample a (H, W, 2) coordinate map, scaling the stored
    coordinates (reference upsample_mapping, :113-115).

    `shape` gives the target (H, W) for pyramids whose levels are not
    exact 2x halvings (odd sizes floor-halve through the extractor's
    pools; the reference only ever sees square power-of-2-friendly inputs
    where every level is exact): the grid is index-resized and the
    coordinates scale by the true per-axis ratio.  When shape IS the
    exact factor-multiple, this is bit-identical to the reference path."""
    sh, sw = mapping.shape[:2]
    if shape is None or tuple(shape) == (factor * sh, factor * sw):
        m = factor * mapping
        return m.repeat(factor, axis=0).repeat(factor, axis=1)
    th, tw = shape
    m = _fit_shape(mapping, shape).astype(np.float64)
    cy = np.clip(np.rint(m[..., 0] * (th / sh)), 0, th - 1)
    cx = np.clip(np.rint(m[..., 1] * (tw / sw)), 0, tw - 1)
    return np.stack([cy, cx], axis=-1).astype(np.int64)


def find_mapping(A: np.ndarray, B: np.ndarray, patch: int,
                 initial_mapping: np.ndarray, radius: int) -> np.ndarray:
    """Per-position nearest-neighbor map A -> B by patch correlation
    within a search box around the initial mapping (reference
    find_mapping/find_closest_patch_index, :27-63).

    A/B are (H, W, C) per-pixel-normalized features; returns (H, W, 2)
    int coordinates into B.  Vectorized as (patch^2 x box^2) shifted
    whole-image dot products instead of the reference's per-pixel conv2d
    loop; candidate scan order (row-major, first max wins) matches the
    reference's torch.max tie-breaking."""
    h, w, _ = A.shape
    d = patch // 2
    Ap = np.pad(A, ((d, d), (d, d), (0, 0)), mode="reflect")
    Bp = np.pad(B, ((d, d), (d, d), (0, 0)), mode="reflect")
    iy = initial_mapping[..., 0].astype(np.int64)
    ix = initial_mapping[..., 1].astype(np.int64)
    best = np.full((h, w), -np.inf, np.float32)
    by = np.zeros((h, w), np.int64)
    bx = np.zeros((h, w), np.int64)
    for dy in range(-radius, radius + 1):
        cy = iy + dy
        vy = (cy >= 0) & (cy < h)
        cyc = np.clip(cy, 0, h - 1)
        for dx in range(-radius, radius + 1):
            cx = ix + dx
            valid = vy & (cx >= 0) & (cx < w)
            cxc = np.clip(cx, 0, w - 1)
            score = np.zeros((h, w), np.float32)
            for u in range(patch):
                for v in range(patch):
                    score += np.einsum("hwc,hwc->hw",
                                       Ap[u:u + h, v:v + w],
                                       Bp[cyc + u, cxc + v])
            score = np.where(valid, score, -np.inf)
            take = score > best  # strict: first (row-major) max wins
            best = np.where(take, score, best)
            by = np.where(take, cyc, by)
            bx = np.where(take, cxc, bx)
    return np.stack([by, bx], axis=-1)


def find_best_buddies(a_to_b: np.ndarray, b_to_a: np.ndarray,
                      box_a=None, box_b=None):
    """Cycle-consistent pairs: positions whose forward map maps straight
    back (reference find_best_buddies, :157-172).  Optional [top_left,
    bottom_right) boxes restrict the a positions and the mapped b
    positions (used for receptive-field-local refinement).  Returns
    (pts_a, pts_b) int arrays of shape (n, 2) in row-major scan order."""
    h, w = a_to_b.shape[:2]
    my, mx = a_to_b[..., 0], a_to_b[..., 1]
    back = b_to_a[my, mx]
    yy, xx = np.mgrid[0:h, 0:w]
    cyc = (back[..., 0] == yy) & (back[..., 1] == xx)
    if box_a is not None:
        (t1, b1) = box_a
        cyc &= (yy >= t1[0]) & (yy < b1[0]) & (xx >= t1[1]) & (xx < b1[1])
    if box_b is not None:
        (t2, b2) = box_b
        cyc &= (my >= t2[0]) & (my < b2[0]) & (mx >= t2[1]) & (mx < b2[1])
    ys, xs = np.nonzero(cyc)
    pts_a = np.stack([ys, xs], axis=-1)
    pts_b = np.stack([my[ys, xs], mx[ys, xs]], axis=-1)
    return pts_a, pts_b


def extract_receptive_field(y: int, x: int, radius: int, shape):
    """The x2-upsampled receptive field of a coarse position, as a
    [top_left, bottom_right) box (reference extract_receptive_field)."""
    cy, cx = 2 * y, 2 * x
    return ([max(cy - radius, 0), max(cx - radius, 0)],
            [min(cy + radius + 1, shape[0]), min(cx + radius + 1, shape[1])])


def warp(B: np.ndarray, patch: int, mapping: np.ndarray) -> np.ndarray:
    """Patch-average warp of B into the mapping's source frame: every
    output patch accumulates the B patch its center maps to, then
    normalizes by coverage (reference warp, :65-76)."""
    h, w, c = B.shape
    d = patch // 2
    Bp = np.pad(B, ((d, d), (d, d), (0, 0)), mode="reflect")
    acc = np.zeros((h + 2 * d, w + 2 * d, c), B.dtype)
    cnt = np.zeros((h + 2 * d, w + 2 * d, 1), B.dtype)
    my = mapping[..., 0].astype(np.int64)
    mx = mapping[..., 1].astype(np.int64)
    for u in range(patch):
        for v in range(patch):
            acc[u:u + h, v:v + w] += Bp[my + u, mx + v]
            cnt[u:u + h, v:v + w] += 1
    out = acc / cnt
    return out[d:d + h, d:d + w]


def warp_to_mid(B: np.ndarray, A: np.ndarray, patch: int,
                mapping: np.ndarray) -> np.ndarray:
    """Common-appearance midpoint warp: like warp() but each accumulated
    patch is the average of A's own patch and the mapped B patch
    (reference warp_to_mid, :78-92)."""
    h, w, c = B.shape
    d = patch // 2
    Bp = np.pad(B, ((d, d), (d, d), (0, 0)), mode="reflect")
    Ap = np.pad(A, ((d, d), (d, d), (0, 0)), mode="reflect")
    acc = np.zeros((h + 2 * d, w + 2 * d, c), B.dtype)
    cnt = np.zeros((h + 2 * d, w + 2 * d, 1), B.dtype)
    my = mapping[..., 0].astype(np.int64)
    mx = mapping[..., 1].astype(np.int64)
    for u in range(patch):
        for v in range(patch):
            acc[u:u + h, v:v + w] += 0.5 * (Ap[u:u + h, v:v + w]
                                            + Bp[my + u, mx + v])
            cnt[u:u + h, v:v + w] += 1
    out = acc / cnt
    return out[d:d + h, d:d + w]


def _kmeans_labels(feats: np.ndarray, k: int, iters: int = 50) -> np.ndarray:
    """Deterministic Lloyd's k-means: first point + farthest-point init,
    fixed iteration cap.  Fallback when scikit-learn is absent."""
    n = len(feats)
    centers = [feats[0]]
    for _ in range(1, k):
        d2 = np.min([((feats - c) ** 2).sum(1) for c in centers], axis=0)
        centers.append(feats[int(np.argmax(d2))])
    centers = np.stack(centers)
    labels = np.full(n, -1, np.int64)
    for _ in range(iters):
        d2 = ((feats[:, None, :] - centers[None]) ** 2).sum(-1)
        new_labels = d2.argmin(1)
        if (new_labels == labels).all():
            break
        labels = new_labels
        for i in range(k):
            sel = feats[labels == i]
            if len(sel):
                centers[i] = sel.mean(0)
    return labels


def top_k_in_clusters(pts_a, pts_b, resp, k: int):
    """Spatially-spread top-k: k-means the pairs in (ya, xa, yb, xb)
    space and keep the highest-response pair per cluster (reference
    top_k_in_clusters, :303-325, sklearn KMeans random_state=0)."""
    n = len(pts_a)
    # strict >: with k == n the reference still runs k-means, which
    # REORDERS the pairs by cluster index — and downstream per-parent
    # refinement + first-max tie-breaks depend on that order (:304-305)
    if k > n:
        return pts_a, pts_b, resp
    feats = np.concatenate([np.asarray(pts_a, np.float64),
                            np.asarray(pts_b, np.float64)], axis=1)
    try:
        from sklearn.cluster import KMeans
        labels = KMeans(n_clusters=k, random_state=0).fit(feats).labels_
    except ImportError:
        # sklearn is optional: a deterministic Lloyd fallback (farthest-
        # point init) keeps the spread-selection heuristic working; exact
        # cluster boundaries may differ from the reference's sklearn
        # k-means, which only matters for golden-parity tests (those skip
        # without sklearn).
        labels = _kmeans_labels(feats, k)
    keep = []
    for i in range(k):
        best, best_j = 0.0, None
        for j in range(n):
            if labels[j] == i and resp[j] > best:
                best, best_j = resp[j], j
        if best_j is not None:
            keep.append(best_j)
    keep = np.asarray(keep, np.int64)
    return pts_a[keep], pts_b[keep], resp[keep]


def default_reconstruct(F: np.ndarray, src_level: int, dst_level: int,
                        out_channels: int, seed: int = 0,
                        out_shape=None) -> np.ndarray:
    """Deterministic stand-in for the reference's deconvolutional feature
    inversion (vgg19_model.deconve — an iterative optimization): nearest
    2x upsample per level step plus a fixed seeded linear projection into
    the finer level's channel count, rectified like the VGG taps it
    imitates.  Pluggable: pass `reconstruct_fn` for the real thing.
    `out_shape` fits the result to the finer level's true (H, W) when the
    pyramid is not an exact 2x halving (odd sizes)."""
    steps = src_level - dst_level
    out = F.repeat(2 ** steps, axis=0).repeat(2 ** steps, axis=1)
    if out_shape is not None:
        out = _fit_shape(out, out_shape)
    rng = np.random.RandomState(seed + 100 * src_level + dst_level)
    proj = rng.randn(F.shape[-1], out_channels).astype(F.dtype)
    proj /= math.sqrt(F.shape[-1])
    return np.maximum(out @ proj, 0.0)


def _call_reconstruct(fn, F, src_level, dst_level, out_channels, out_shape):
    """Invoke a reconstruct_fn, passing out_shape only if it accepts it
    (legacy signatures predate non-exact-2x pyramid support), and fit the
    result to the target shape either way."""
    import inspect
    try:
        takes_shape = "out_shape" in inspect.signature(fn).parameters
    except (TypeError, ValueError):
        takes_shape = False
    if takes_shape:
        out = fn(F, src_level, dst_level, out_channels, out_shape=out_shape)
    else:
        out = fn(F, src_level, dst_level, out_channels)
    return _fit_shape(np.asarray(out), out_shape)


def sparse_correspondence(pyr_a: Sequence[np.ndarray],
                          pyr_b: Sequence[np.ndarray],
                          reconstruct_fn: Optional[Callable] = None,
                          tau: float = 0.05,
                          k_per_level: Optional[int] = None,
                          border: int = 7,
                          l_final: int = 1):
    """The full reference NBB pipeline (run loop, :361-414) over a
    fine->coarse feature pyramid pair ((H/2^(L-1), W/2^(L-1), C_L) arrays,
    level L = pyr[L-1]).

    Returns (pts_a, pts_b, resp): correspondence pixel coordinates at the
    finest-level resolution scaled by 2^(l_final-1), after per-level
    refinement, response thresholding, optional per-level k-means capping,
    dedup, and border filtering.  `reconstruct_fn(F, src_level, dst_level,
    out_channels)` inverts features one level finer for the
    common-appearance average (default: default_reconstruct)."""
    reconstruct_fn = reconstruct_fn or default_reconstruct
    l_start = len(pyr_a)
    F_A = np.asarray(pyr_a[l_start - 1], np.float32)
    F_B = np.asarray(pyr_b[l_start - 1], np.float32)
    F_Am, F_Bm = F_A, F_B
    map_ab = identity_map(*F_A.shape[:2])
    map_ba = map_ab.copy()
    pts_a = pts_b = resp = None
    for L in range(l_start, l_final - 1, -1):
        patch = PATCH_SIZES[L - 1]
        radius = SEARCH_RADII[L - 1]
        a2b = find_mapping(normalize_per_pix(F_Am), normalize_per_pix(F_Bm),
                           patch, map_ab, radius)
        b2a = find_mapping(normalize_per_pix(F_Bm), normalize_per_pix(F_Am),
                           patch, map_ba, radius)
        # per-pair response: average of the two endpoints' normalized l2
        # responses of the *unmixed* features (calculate_activations,
        # :195-204); accumulates across levels during refinement (:187)
        ra = _stretch01(response_l2(F_A))
        rb = _stretch01(response_l2(F_B))
        if L == l_start:
            pts_a, pts_b = find_best_buddies(a2b, b2a)
            resp = 0.5 * (ra[pts_a[:, 0], pts_a[:, 1]]
                          + rb[pts_b[:, 0], pts_b[:, 1]])
        else:
            # refine each surviving pair inside its upsampled receptive
            # field; children inherit the parent's accumulated response
            # (find_neural_best_buddies non-deepest branch, :147-153,
            # appended in reverse parent order per
            # replace_refined_correspondence, :180-193)
            na, nb, nr = [], [], []
            shape = a2b.shape[:2]
            # the buddy set is a property of the level's mappings; compute
            # it once (row-major order) and box-filter per parent
            ga, gb = find_best_buddies(a2b, b2a)
            for i in range(len(pts_a) - 1, -1, -1):
                t1, b1 = extract_receptive_field(pts_a[i, 0], pts_a[i, 1],
                                                 radius, shape)
                t2, b2 = extract_receptive_field(pts_b[i, 0], pts_b[i, 1],
                                                 radius, shape)
                inside = ((ga[:, 0] >= t1[0]) & (ga[:, 0] < b1[0])
                          & (ga[:, 1] >= t1[1]) & (ga[:, 1] < b1[1])
                          & (gb[:, 0] >= t2[0]) & (gb[:, 0] < b2[0])
                          & (gb[:, 1] >= t2[1]) & (gb[:, 1] < b2[1]))
                ca, cb = ga[inside], gb[inside]
                cr = resp[i] + 0.5 * (ra[ca[:, 0], ca[:, 1]]
                                      + rb[cb[:, 0], cb[:, 1]])
                na.append(ca)
                nb.append(cb)
                nr.append(cr)
            pts_a = np.concatenate(na) if na else np.zeros((0, 2), np.int64)
            pts_b = np.concatenate(nb) if nb else np.zeros((0, 2), np.int64)
            resp = np.concatenate(nr) if nr else np.zeros((0,), np.float32)
        # response threshold at both endpoints (:222-235)
        ma, mb = get_M(F_A, tau), get_M(F_B, tau)
        keep = (ma[pts_a[:, 0], pts_a[:, 1]]
                & mb[pts_b[:, 0], pts_b[:, 1]])
        pts_a, pts_b, resp = pts_a[keep], pts_b[keep], resp[keep]
        if k_per_level is not None:
            pts_a, pts_b, resp = top_k_in_clusters(pts_a, pts_b, resp,
                                                   int(k_per_level))
        if L > l_final:
            # common-appearance transfer to the next finer level
            # (transfer_style_local, :335-349): warp each image's features
            # into the other's frame, reconstruct one level finer, and
            # average with the true finer-level features
            F_An = np.asarray(pyr_a[L - 2], np.float32)
            F_Bn = np.asarray(pyr_b[L - 2], np.float32)
            RB = _call_reconstruct(reconstruct_fn, warp(F_B, patch, a2b),
                                   L, L - 1, F_An.shape[-1],
                                   F_An.shape[:2])
            RA = _call_reconstruct(reconstruct_fn, warp(F_A, patch, b2a),
                                   L, L - 1, F_Bn.shape[-1],
                                   F_Bn.shape[:2])
            F_Am = 0.5 * (F_An + RB)
            F_Bm = 0.5 * (F_Bn + RA)
            F_A, F_B = F_An, F_Bn
            # non-exact halvings (odd sizes) resize to the true next shape
            map_ab = upsample_mapping(a2b, shape=F_An.shape[:2])
            map_ba = upsample_mapping(b2a, shape=F_Bn.shape[:2])
    # finalize (make_correspondence_unique + scale_correspondence +
    # remove_border_correspondence, :241-253, :289-301, :254-281)
    seen = set()
    keep = []
    for i in range(len(pts_a)):
        key = (int(pts_a[i, 0]), int(pts_a[i, 1]))
        if key not in seen:
            seen.add(key)
            keep.append(i)
    keep = np.asarray(keep, np.int64)
    pts_a, pts_b, resp = pts_a[keep], pts_b[keep], resp[keep]
    scale = 2 ** (l_final - 1)
    pts_a = pts_a * scale
    pts_b = pts_b * scale
    if border > 0:
        # per-axis bounds (y vs height, x vs width).  The reference forces
        # square inputs (vgg19_model.py:27 image_height = image_width) and
        # bounds both axes by image_width (:248-269), so this coincides
        # with it on every input it supports while staying correct for
        # non-square pyramids.
        h0, w0 = pyr_a[0].shape[:2]
        hi = np.array([h0 - border, w0 - border])
        ok = ((pts_a >= border) & (pts_a <= hi)
              & (pts_b >= border) & (pts_b <= hi)).all(axis=1)
        pts_a, pts_b, resp = pts_a[ok], pts_b[ok], resp[ok]
    return pts_a, pts_b, resp


def neural_best_buddies(images_a, images_b, k: int = 10,
                        feature_fn: Optional[Callable] = None,
                        tau: float = 0.05,
                        k_per_level: Optional[int] = None,
                        border: Optional[int] = None,
                        reconstruct_fn: Optional[Callable] = None):
    """Top-k sparse correspondences between two (1, H, W, 3) zc images,
    returned as pixel coordinates [((ya, xa), (yb, xb)), ...] — the
    reference algorithm end to end (run + top_k_in_clusters with
    k_final=k, neural_best_buddies.py:361-414)."""
    feature_fn = feature_fn or default_feature_pyramid
    pyr_a = [np.asarray(f[0], np.float32) for f in feature_fn(images_a)]
    pyr_b = [np.asarray(f[0], np.float32) for f in feature_fn(images_b)]
    if border is None:
        # reference default --border_size 7 is calibrated for 224px
        # inputs; scale it for smaller test images
        border = max(1, min(7, pyr_a[0].shape[0] // 32))
    pts_a, pts_b, resp = sparse_correspondence(
        pyr_a, pyr_b, reconstruct_fn=reconstruct_fn, tau=tau,
        k_per_level=k_per_level, border=border)
    pts_a, pts_b, resp = top_k_in_clusters(pts_a, pts_b, resp, k)
    # feature grid -> image pixels (finest tap may sit below image res)
    h_img = np.asarray(images_a).shape[1]
    scale = max(1, h_img // max(1, pyr_a[0].shape[0]))
    order = np.argsort(-resp, kind="stable")
    return [((int(pts_a[i, 0]) * scale, int(pts_a[i, 1]) * scale),
             (int(pts_b[i, 0]) * scale, int(pts_b[i, 1]) * scale))
            for i in order]


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
