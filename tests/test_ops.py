"""Op parity: upfirdn2d / fused_leaky_relu vs the reference CUDA-op spec."""

import jax
import jax.numpy as jnp
import numpy as np

from rewriting_tpu.ops import fused_leaky_relu, upfirdn2d


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_upfirdn2d_matches_reference_spec(goldens):
    g = goldens("upfirdn2d")
    x = nchw_to_nhwc(g["x"])
    for name in ["up2_k4", "down2_k4", "blur_k4", "updown_k3", "negpad"]:
        up, down, p0, p1 = (int(v) for v in g[f"cfg_{name}"])
        k = g["k3"] if "k3" in name else g["k4"]
        out = upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=up, down=down,
                        pad=(p0, p1))
        want = nchw_to_nhwc(g[f"out_{name}"])
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-5,
                                   rtol=1e-5, err_msg=name)


def test_upfirdn2d_differentiable():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 6, 6, 2),
                    dtype=jnp.float32)
    k = jnp.asarray(np.outer([1, 3, 3, 1], [1, 3, 3, 1]) / 64.0,
                    dtype=jnp.float32)

    def f(x):
        return jnp.sum(upfirdn2d(x, k, up=2, down=1, pad=(2, 1)) ** 2)

    grad = jax.grad(f)(x)
    assert grad.shape == x.shape
    # numerical check on one coordinate
    eps = 1e-3
    dx = np.zeros(x.shape, np.float32)
    dx[0, 2, 3, 1] = eps
    num = (f(x + dx) - f(x - dx)) / (2 * eps)
    np.testing.assert_allclose(grad[0, 2, 3, 1], num, rtol=1e-2)


def test_upfirdn2d_alternative_formulations(goldens):
    """The shift-and-add stencil and the separable banded-matmul
    formulations must match the reference spec exactly."""
    import jax.numpy as jnp
    from rewriting_tpu.ops.upfirdn2d import (separable_taps,
                                             upfirdn2d_matmul)
    g = goldens("upfirdn2d")
    x = jnp.asarray(nchw_to_nhwc(g["x"]))
    taps = separable_taps([1, 3, 3, 1])
    for name in ["up2_k4", "blur_k4", "negpad"]:
        up, down, p0, p1 = (int(v) for v in g[f"cfg_{name}"])
        want = nchw_to_nhwc(g[f"out_{name}"])
        sten = upfirdn2d(x, jnp.asarray(g["k4"]), up=up, down=down,
                         pad=(p0, p1), stencil=True)
        np.testing.assert_allclose(np.asarray(sten), want, atol=1e-5,
                                   rtol=1e-5, err_msg=f"stencil {name}")
        mm = upfirdn2d_matmul(x, taps, taps, up=up, down=down,
                              pad=(p0, p1))
        np.testing.assert_allclose(np.asarray(mm), want, atol=1e-5,
                                   rtol=1e-5, err_msg=f"matmul {name}")
    # matmul handles downsampling too
    up, down, p0, p1 = (int(v) for v in g["cfg_down2_k4"])
    mm = upfirdn2d_matmul(x, taps, taps, up=up, down=down, pad=(p0, p1))
    np.testing.assert_allclose(np.asarray(mm),
                               nchw_to_nhwc(g["out_down2_k4"]),
                               atol=1e-5, rtol=1e-5)


def test_fused_leaky_relu():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 4, 3).astype(np.float32)
    b = rng.randn(3).astype(np.float32)
    out = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
    pre = x + b
    want = np.sqrt(2.0) * np.where(pre >= 0, pre, 0.2 * pre)
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_upsample2d_narrow_channel_matmul_dispatch():
    """upsample2d routes C<=8 maps (the RGB skip path) through the
    separable banded-matmul formulation; must match the depthwise-conv
    formulation exactly for the production blur kernel."""
    from rewriting_tpu.ops import make_kernel, upsample2d
    from rewriting_tpu.ops.upfirdn2d import _separable_taps_2d, upfirdn2d

    kern = jnp.asarray(make_kernel([1, 3, 3, 1]))
    assert _separable_taps_2d(kern) is not None
    # non-separable kernel -> no taps, falls back
    assert _separable_taps_2d(jnp.asarray(np.eye(4, dtype=np.float32))) is None
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 3), jnp.float32)
    got = upsample2d(x, kern, factor=2)
    kh = kern.shape[0]
    p = kh - 2
    want = upfirdn2d(x, kern * 4.0, up=2, down=1,
                     pad=((p + 1) // 2 + 1, p // 2))
    assert got.shape == want.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_conv3x3_s2d_matches_plain_conv():
    """Space-to-depth 3x3 conv (narrow-channel high-res path) is an exact
    regrouping of the plain SAME conv."""
    from jax import lax
    from rewriting_tpu.models.stylegan2 import _conv3x3_s2d

    rng = np.random.RandomState(1)
    for h, ci, co in ((8, 3, 5), (16, 32, 32), (12, 64, 32)):
        x = jnp.asarray(rng.randn(2, h, h, ci), jnp.float32)
        w = jnp.asarray(rng.randn(co, ci, 3, 3), jnp.float32)
        want = lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "OIHW", "NHWC"))
        got = _conv3x3_s2d(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)


def test_quantize_weight_roundtrip_bound():
    from rewriting_tpu.ops.quant import (quantize_weight_per_channel,
                                         dequantize)
    w = np.random.RandomState(3).randn(8, 16, 3, 3).astype(np.float32)
    w_i8, scale = quantize_weight_per_channel(jnp.asarray(w), axis=0)
    assert w_i8.dtype == jnp.int8 and scale.shape == (8, 1, 1, 1)
    back = np.asarray(dequantize(w_i8, scale))
    # symmetric rounding: per-element error <= half a quantization step
    np.testing.assert_array_less(
        np.abs(back - w),
        np.broadcast_to(np.asarray(scale) / 2 + 1e-7, w.shape))
    # all-zero channel must not produce nan/inf
    w[0] = 0.0
    w_i8, scale = quantize_weight_per_channel(jnp.asarray(w), axis=0)
    assert np.isfinite(np.asarray(dequantize(w_i8, scale))).all()


def test_conv2d_w8a8_matches_integer_emulation():
    from rewriting_tpu.ops.quant import (conv2d_w8a8, quantize_activation,
                                         quantize_weight_per_channel)
    rng = np.random.RandomState(4)
    x = rng.randn(2, 8, 8, 16).astype(np.float32)
    w = (rng.randn(8, 16, 3, 3) * 0.1).astype(np.float32)
    w_i8, w_scale = quantize_weight_per_channel(jnp.asarray(w), axis=0)
    got = np.asarray(conv2d_w8a8(jnp.asarray(x), w_i8, w_scale))
    # exact integer emulation in float64 (products fit exactly)
    x_i8, x_scale = quantize_activation(jnp.asarray(x))
    acc = jax.lax.conv_general_dilated(
        np.asarray(x_i8, np.float64), np.asarray(w_i8, np.float64),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"))
    want = np.asarray(acc) * (float(x_scale)
                              * np.asarray(w_scale).reshape(-1))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # and the quantized conv tracks the fp32 conv within quantization noise
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    rel = (np.linalg.norm(got - np.asarray(ref))
           / np.linalg.norm(np.asarray(ref)))
    assert rel < 0.02, rel


def test_conv2d_w8a8_lhs_dilation():
    # the upsampling formulation (lhs_dilation=2) must quantize too
    from rewriting_tpu.ops.quant import (conv2d_w8a8,
                                         quantize_weight_per_channel)
    rng = np.random.RandomState(5)
    x = rng.randn(1, 6, 6, 8).astype(np.float32)
    w = (rng.randn(8, 8, 3, 3) * 0.1).astype(np.float32)
    w_i8, w_scale = quantize_weight_per_channel(jnp.asarray(w), axis=0)
    got = np.asarray(conv2d_w8a8(jnp.asarray(x), w_i8, w_scale,
                                 padding=((2, 2), (2, 2)),
                                 lhs_dilation=(2, 2)))
    ref = np.asarray(jax.lax.conv_general_dilated(
        x, w, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        precision=jax.lax.Precision.HIGHEST))
    assert got.shape == ref.shape
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel
