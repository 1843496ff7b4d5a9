"""NBB baseline: correspondences, MLS warp, Poisson blend."""

import numpy as np
import pytest

from rewriting_tpu.baselines.nbb import (mls_warp, mutual_nearest_neighbors,
                                         neural_best_buddies, poisson_blend,
                                         sparse_correspondence,
                                         top_k_in_clusters, warp,
                                         warp_to_mid, identity_map)


def test_nbb_golden_correspondence(goldens):
    """The rebuilt engine reproduces the reference NBB algorithm exactly
    on the golden fixture: same correspondences in the same order, same
    accumulated responses, same k-means top-k selection (fixture made by
    scripts/make_goldens.py:make_nbb_golden driving the reference's
    algorithms/neural_best_buddies.py over a shared feature pyramid)."""
    pytest.importorskip("sklearn")
    g = goldens("nbb_correspondence")
    pyr_a = [g[f"pyr_a_{i}"] for i in range(1, 6)]
    pyr_b = [g[f"pyr_b_{i}"] for i in range(1, 6)]
    pa, pb, resp = sparse_correspondence(
        pyr_a, pyr_b, tau=float(g["tau"]),
        k_per_level=int(g["k_per_level"]), border=int(g["border"]))
    np.testing.assert_array_equal(pa, g["pts_a"])
    np.testing.assert_array_equal(pb, g["pts_b"])
    np.testing.assert_allclose(resp, g["resp"], atol=1e-5)
    ta, tb, tr = top_k_in_clusters(pa, pb, resp, int(g["k_final"]))
    np.testing.assert_array_equal(ta, g["top_a"])
    np.testing.assert_array_equal(tb, g["top_b"])
    np.testing.assert_allclose(tr, g["top_resp"], atol=1e-5)


def test_nbb_warps():
    rng = np.random.RandomState(3)
    A = rng.rand(8, 8, 4).astype(np.float32)
    B = rng.rand(8, 8, 4).astype(np.float32)
    ident = identity_map(8, 8)
    # identity mapping: warp is a no-op, warp_to_mid is the plain average
    np.testing.assert_allclose(warp(B, 3, ident), B, atol=1e-6)
    np.testing.assert_allclose(warp_to_mid(B, A, 3, ident), 0.5 * (A + B),
                               atol=1e-6)
    # a constant shift moves content (interior pixels away from pads)
    shift = ident.copy()
    shift[..., 1] = np.clip(shift[..., 1] + 2, 0, 7)
    w = warp(B, 1, shift)  # patch 1: pure gather
    np.testing.assert_allclose(w[:, :5], B[:, 2:7], atol=1e-6)


def test_mutual_nn_identity():
    rng = np.random.RandomState(0)
    f = rng.randn(6, 6, 8).astype(np.float32)
    pairs = mutual_nearest_neighbors(f, f)
    # every point is its own best buddy
    assert all(a == b for a, b in pairs)
    assert len(pairs) == 36


def test_nbb_identical_images():
    rng = np.random.RandomState(1)
    img = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    pairs = neural_best_buddies(img[None], img[None], k=5)
    assert len(pairs) > 0
    for (ya, xa), (yb, xb) in pairs:
        assert abs(ya - yb) <= 2 and abs(xa - xb) <= 2


def test_nbb_nonsquare_keeps_right_half():
    """Per-axis border bounds: on a landscape pyramid, correspondences in
    the right half (x > height) survive the border filter.  The reference
    is square-only (vgg19_model.py:27) so its single image_width bound
    coincides with this on every input it supports."""
    rng = np.random.RandomState(4)
    h, w = 16, 32
    pyr = [rng.rand(h // 2 ** i, w // 2 ** i, 8).astype(np.float32) + 0.3
           for i in range(3)]
    pa, pb, _ = sparse_correspondence(pyr, pyr, tau=0.0, border=2)
    assert len(pa) > 0
    np.testing.assert_array_equal(pa, pb)  # identical pyramids: identity
    assert pa[:, 1].max() > h  # right half not discarded
    assert pa[:, 1].max() <= w - 2 and pa[:, 0].max() <= h - 2


def test_nbb_odd_size_pyramid():
    """Non-exact-2x pyramids (odd sizes floor-halve through pooling) run
    end to end instead of crashing on a broadcast mismatch; pairs stay
    in bounds."""
    rng = np.random.RandomState(5)
    img = rng.uniform(-1, 1, (36, 36, 3)).astype(np.float32)
    pairs = neural_best_buddies(img[None], img[None], k=4)
    assert len(pairs) > 0
    for (ya, xa), (yb, xb) in pairs:
        assert 0 <= ya < 36 and 0 <= xa < 36
        assert abs(ya - yb) <= 4 and abs(xa - xb) <= 4


def test_mls_identity_and_translation():
    rng = np.random.RandomState(2)
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    pts = [(4, 4), (4, 12), (12, 4), (12, 12)]
    # identity control points -> identity warp
    out = mls_warp(img, pts, pts)
    np.testing.assert_allclose(out, img, atol=1e-4)
    # uniform translation: dst = src + (2, 0) -> content shifts down
    dst = [(y + 2, x) for y, x in pts]
    out = mls_warp(img, pts, dst)
    np.testing.assert_allclose(out[4:14, 2:14], img[2:12, 2:14], atol=1e-3)


def test_poisson_blend():
    target = np.zeros((12, 12, 3))
    source = np.ones((12, 12, 3)) * 0.5
    mask = np.zeros((12, 12), bool)
    mask[4:8, 4:8] = True
    # source is constant (zero gradients) -> interior becomes the smooth
    # interpolation of the target boundary (all zeros)
    out = poisson_blend(target, source, mask)
    np.testing.assert_allclose(out[mask], 0.0, atol=1e-8)
    np.testing.assert_allclose(out[~mask], target[~mask])
    # a source gradient inside the mask survives blending
    source2 = source.copy()
    source2[6:, :, :] += 0.3
    out2 = poisson_blend(target, source2, mask)
    inner_step = out2[6, 5, 0] - out2[5, 5, 0]
    assert inner_step > 0.1  # gradient preserved
