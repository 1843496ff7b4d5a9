"""Segmenter ports: PrRoI pooling math, backbone/decoder shapes, unified
parsing label bookkeeping, face parser protocol."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rewriting_tpu.segment import (MergedSegmenter, NoSegmenter,
                                   UnifiedParsingSegmenter)
from rewriting_tpu.segment.faceparse import BiSeNet, FaceSegmenter
from rewriting_tpu.segment.prroi import (prroi_pool2d,
                                         prroi_pool_full_image)
from rewriting_tpu.segment.resnet import (init_resnet18, init_resnet50,
                                          resnet18_features,
                                          resnet50_features)
from rewriting_tpu.segment.upernet import UPerNet

LABELDATA = {
    "object": ["-", "sky", "building", "tree"],
    "part": ["-", "roof", "window", "tree"],
    "material": ["-", "brick", "glass"],
    "scene": ["-", "outdoor"],
    "object_part": {"building": ["roof", "window", "tree"]},
}


# ---------------------------------------------------------------------------
# PrRoI pooling (reference test analog: avg-pool ground truth,
# upsegmodel/prroi_pool/test_prroi_pooling2d.py)
# ---------------------------------------------------------------------------

def _bilinear_at(fmap, ys, xs):
    """Dense evaluation of the zero-extended bilinear interpolant."""
    h, w = fmap.shape
    out = np.zeros((len(ys), len(xs)))
    for i in range(h):
        wy = np.maximum(0.0, 1.0 - np.abs(ys - i))
        for j in range(w):
            wx = np.maximum(0.0, 1.0 - np.abs(xs - j))
            out += fmap[i, j] * wy[:, None] * wx[None, :]
    return out


def test_prroi_matches_numerical_integration():
    """Exactness vs dense numerical integration of the interpolant (the
    same continuous function the reference CUDA kernel integrates)."""
    rng = np.random.RandomState(0)
    h, w, pooled = 5, 7, 3
    fmap = rng.randn(h, w).astype(np.float32)
    out = np.asarray(prroi_pool_full_image(
        jnp.asarray(fmap[None, :, :, None]), pooled))[0, :, :, 0]
    n = 2000
    for py in range(pooled):
        for px in range(pooled):
            ys = np.linspace(py * h / pooled, (py + 1) * h / pooled, n)
            xs = np.linspace(px * w / pooled, (px + 1) * w / pooled, n)
            avg = _bilinear_at(fmap, ys, xs).mean()
            np.testing.assert_allclose(out[py, px], avg, atol=5e-3,
                                       err_msg=f"bin {py},{px}")


def test_prroi_constant_interior():
    # interior bins of a constant map stay constant; edge bins shrink by
    # the boundary decay of the interpolant (true PrRoI edge semantics)
    x = np.full((1, 6, 6, 2), 3.5, np.float32)
    out = np.asarray(prroi_pool_full_image(jnp.asarray(x), 3))
    np.testing.assert_allclose(out[0, 1, 1], 3.5, rtol=1e-5)
    # the interpolant decays past the last pixel, so the far-edge bin
    # integrates a deficit (the leading edge's half-hats sum to full area)
    assert out[0, 2, 2, 0] < 3.5


def test_prroi_linear_ramp_exact():
    # bilinear interpolant of a linear ramp is the ramp itself, so the bin
    # average equals the ramp value at the bin center.
    h, w = 8, 8
    ramp = np.arange(w, dtype=np.float32)[None, None, :, None]
    x = np.broadcast_to(ramp, (1, h, w, 1)).copy()
    out = np.asarray(prroi_pool_full_image(jnp.asarray(x), 2))
    # bins cover x in [0,4] and [4,8] of continuous coords; the interpolant
    # is linear on [0,7] and constant-extrapolated-to-zero outside, handled
    # by hat weights; interior bin centers: 2.0 and 6.0 minus edge effects
    assert out.shape == (1, 2, 2, 1)
    assert out[0, 0, 0, 0] < out[0, 0, 1, 0]
    # roi interface matches full-image helper
    roi = np.array([[0, 0, 0, w, h]], np.float32)
    out2 = np.asarray(prroi_pool2d(x, roi, 2, 2))
    np.testing.assert_allclose(out2, out, rtol=1e-5)


def test_prroi_matches_avgpool_when_aligned():
    # with bins of exactly 1x1 px at integer offsets, the continuous
    # average over [i, i+1] of the interpolant equals the midpoint value
    # (trapezoid of adjacent samples)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 4, 1).astype(np.float32)
    out = np.asarray(prroi_pool_full_image(jnp.asarray(x), 4))
    want = 0.5 * (x[:, :, :, :] + np.pad(
        x, ((0, 0), (0, 1), (0, 0), (0, 0)))[:, 1:, :, :])
    want = 0.5 * (want + np.pad(
        want, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:, :])
    np.testing.assert_allclose(out, want, atol=1e-5)


# ---------------------------------------------------------------------------
# backbones
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_resnet_shapes():
    p50 = init_resnet50(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))
    c2, c3, c4, c5 = resnet50_features(p50, x)
    assert c2.shape == (1, 16, 16, 256)
    assert c5.shape == (1, 2, 2, 2048)
    p18 = init_resnet18(jax.random.PRNGKey(1))
    f8, f16, f32 = resnet18_features(p18, x)
    assert f8.shape == (1, 8, 8, 128)
    assert f16.shape == (1, 4, 4, 256)
    assert f32.shape == (1, 2, 2, 512)


# ---------------------------------------------------------------------------
# unified parsing
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def upp_seg():
    object_to_num = {k: v for v, k in enumerate(LABELDATA["object"])}
    part_to_num = {k: v for v, k in enumerate(LABELDATA["part"])}
    object_part = {object_to_num[k]: [part_to_num[p] for p in v]
                   for k, v in LABELDATA["object_part"].items()}
    net = UPerNet({"object": 4, "part": 3, "material": 3, "scene": 2},
                  sorted(object_part.keys()), object_part)
    params = net.init_params(jax.random.PRNGKey(0))
    return UnifiedParsingSegmenter(params, LABELDATA, segsizes=[64])


@pytest.mark.slow
def test_upp_segment_batch(upp_seg):
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3),
                           minval=-1, maxval=1)
    segs = upp_seg.segment_batch(x)
    assert segs.shape == (2, 3, 64, 64)
    assert segs.dtype == np.int64
    # objects in [0, 3]; materials either 0 or offset into shared space
    assert segs[:, 0].max() <= 3
    mats = segs[:, 1][segs[:, 1] > 0]
    if mats.size:
        assert mats.min() > 3
    labels, cats = upp_seg.get_label_and_category_names()
    assert len(labels) == upp_seg.num_classes
    assert cats == ["object", "part", "material"]


@pytest.mark.slow
def test_upp_quad_subdivision():
    object_to_num = {k: v for v, k in enumerate(LABELDATA["object"])}
    part_to_num = {k: v for v, k in enumerate(LABELDATA["part"])}
    object_part = {object_to_num[k]: [part_to_num[p] for p in v]
                   for k, v in LABELDATA["object_part"].items()}
    net = UPerNet({"object": 4, "part": 3, "material": 3, "scene": 2},
                  sorted(object_part.keys()), object_part)
    params = net.init_params(jax.random.PRNGKey(0))
    seg = UnifiedParsingSegmenter(params, LABELDATA, segsizes=[64],
                                  segdiv="quad")
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3),
                           minval=-1, maxval=1)
    segs = seg.segment_batch(x)
    assert segs.shape == (1, 5, 64, 64)
    # divided labels live above the object range
    divided = segs[:, 3:][segs[:, 3:] > 0]
    if divided.size:
        assert divided.min() > seg.num_object_classes


@pytest.mark.slow
def test_upp_predict_single_class(upp_seg):
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3),
                           minval=-1, maxval=1)
    score, mask = upp_seg.predict_single_class(x, 2)  # 'building'
    assert score.shape == (1, 64, 64)
    assert mask.shape == (1, 64, 64)
    assert mask.dtype == jnp.bool_ or mask.dtype == np.bool_


# ---------------------------------------------------------------------------
# face parser + merged/no segmenters
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_face_segmenter_random():
    net = BiSeNet(n_classes=19)
    params = net.init_params(jax.random.PRNGKey(0))
    seg = FaceSegmenter(params=params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3),
                           minval=-1, maxval=1)
    out = seg.segment_batch(x)
    assert out.shape == (1, 1, 64, 64)
    assert out.max() < 19 and out.min() >= 0


@pytest.mark.slow
def test_face_segmenter_uint8_matches_host_fp32():
    """The uint8 device path (resize bytes -> normalize on device, one
    fused dispatch, metrics/seg_stats.py driver) must reproduce the host
    read/255 -> renormalize('pt','zc') float pipeline exactly."""
    from rewriting_tpu.utils import renormalize
    net = BiSeNet(n_classes=19)
    params = net.init_params(jax.random.PRNGKey(0))
    seg = FaceSegmenter(params=params)
    rng = np.random.RandomState(7)
    u8 = rng.randint(0, 256, (2, 64, 64, 3), np.uint8)
    host = renormalize.renormalize(u8.astype(np.float32) / 255.0,
                                   "pt", "zc")
    out_f = seg.segment_batch(host)
    out_u = seg.segment_batch(u8)
    assert out_u.dtype == out_f.dtype == np.int64
    np.testing.assert_array_equal(out_u, out_f)
    # the async device handle agrees and stays uint8
    dev = seg.segment_batch_device(u8)
    assert np.asarray(dev).dtype == np.uint8
    np.testing.assert_array_equal(np.asarray(dev).astype(np.int64), out_f)


@pytest.mark.slow
def test_upp_uint8_matches_zc_float(upp_seg):
    """uint8 input (device-normalized, segmenter.raw_seg_prediction: the
    zc->[0,255] round-trip cancels so bytes feed BGR mean subtraction
    directly) must match the host zc-float pipeline up to the ~1-ulp
    round-trip rounding of the input bytes."""
    from rewriting_tpu.utils import renormalize
    rng = np.random.RandomState(11)
    u8 = rng.randint(0, 256, (2, 64, 64, 3), np.uint8)
    zc = renormalize.renormalize(u8.astype(np.float32) / 255.0, "pt", "zc")
    assert upp_seg.accepts_uint8
    pred_u, parts_u = upp_seg.raw_seg_prediction(u8)
    pred_f, parts_f = upp_seg.raw_seg_prediction(zc)
    for k in pred_u:
        np.testing.assert_allclose(np.asarray(pred_u[k]),
                                   np.asarray(pred_f[k]),
                                   rtol=1e-3, atol=1e-4)
    seg_u, seg_f = upp_seg.segment_batch(u8), upp_seg.segment_batch(zc)
    assert seg_u.shape == seg_f.shape and seg_u.dtype == np.int64
    # argmax can flip only where the top-2 logits tie within the input's
    # 1-ulp perturbation — essentially never, but not provably never
    agree = (seg_u == seg_f).mean()
    assert agree > 0.995, agree


def test_no_and_merged_segmenter():
    a = NoSegmenter()
    x = np.zeros((2, 16, 16, 3), np.float32)
    assert a.segment_batch(x).shape == (2, 1, 16, 16)
    m = MergedSegmenter([a, a])
    assert not m.accepts_uint8  # NoSegmenter takes only zc floats
    out = m.segment_batch(x)
    assert out.shape == (2, 2, 16, 16)
    # reference semantics: each component's values are shifted by the
    # cumulative label offset (second NoSegmenter's zeros become 1)
    assert out[:, 0].max() == 0 and (out[:, 1] == 1).all()
    labels, cats = m.get_label_and_category_names()
    assert len(labels) == 2
    score, mask = m.predict_single_class(x, 1)
    assert score.shape[0] == 2
