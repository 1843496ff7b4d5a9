"""NBB baseline: correspondences, MLS warp, Poisson blend."""

import numpy as np
import pytest

from rewriting_tpu.baselines.nbb import (mls_warp, mutual_nearest_neighbors,
                                         neural_best_buddies, poisson_blend)


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
