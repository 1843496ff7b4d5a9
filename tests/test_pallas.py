"""Pallas FIR kernels: exact-math validation in interpret mode (the
compiled path is gated off on this image's experimental TPU runtime —
see ops/pallas_upfirdn.py STATUS note)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from rewriting_tpu.ops import make_kernel, upfirdn2d
from rewriting_tpu.ops.pallas_upfirdn import (blur2d_pallas,
                                              upsample2x_pallas)


def test_pallas_blur_and_upsample_interpret():
    k = np.asarray(make_kernel([1, 3, 3, 1]))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 128), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        blur = blur2d_pallas(x, k, (1, 1))
        up2 = upsample2x_pallas(x, k * 4.0, (2, 1))
    ref_blur = upfirdn2d(x, jnp.asarray(k), up=1, down=1, pad=(1, 1))
    ref_up2 = upfirdn2d(x, jnp.asarray(k * 4.0), up=2, down=1, pad=(2, 1))
    np.testing.assert_allclose(np.asarray(blur), np.asarray(ref_blur),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(up2), np.asarray(ref_up2),
                               atol=1e-5)
    assert up2.shape == (2, 32, 32, 128)


def test_pallas_odd_sizes_interpret():
    k = np.asarray(make_kernel([1, 2, 1]))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 12, 20, 64), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        blur = blur2d_pallas(x, k, (1, 1))
    ref = upfirdn2d(x, jnp.asarray(k), up=1, down=1, pad=(1, 1))
    np.testing.assert_allclose(np.asarray(blur), np.asarray(ref),
                               atol=1e-5)


def test_pallas_probe_gating(tmp_path, monkeypatch):
    """The compiled-Pallas probe never runs unless authorized, caches its
    verdict, and the FIR ops honor it."""
    import rewriting_tpu.ops.pallas_probe as probe
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
    monkeypatch.delenv("REWRITING_TPU_TRY_PALLAS", raising=False)
    probe._cached = None
    assert probe.compiled_pallas_supported() is False  # no probe unasked
    # a cached verdict short-circuits everything
    import json
    with open(tmp_path / "pallas_probe.json", "w") as f:
        json.dump({"supported": True}, f)
    probe._cached = None
    assert probe.compiled_pallas_supported() is True
    probe._cached = None  # reset for other tests

    from rewriting_tpu.ops.upfirdn2d import _pallas_eligible
    import jax.numpy as jnp
    k = jnp.ones((4, 4)) / 16.0
    x_rgb = jnp.zeros((1, 8, 8, 3))
    assert not _pallas_eligible(x_rgb, k)  # narrow maps: XLA path


def test_blockspec_blur_interpret():
    """BlockSpec-only halo blur (no manual DMA) matches the XLA
    formulation exactly in interpret mode, across pads and tile shapes."""
    import numpy as np
    import jax.numpy as jnp
    from rewriting_tpu.ops.upfirdn2d import make_kernel, upfirdn2d
    from rewriting_tpu.ops.pallas_upfirdn import blur2d_pallas_bs

    kern = np.asarray(make_kernel([1, 3, 3, 1]))
    rng = np.random.RandomState(0)
    for shape, pad in (((2, 32, 32, 128), (2, 1)),
                       ((2, 33, 33, 64), (1, 1)),
                       ((1, 16, 16, 8), (2, 1)),
                       # ho=34: no tile <=16 divides it and is a multiple
                       # of 3 -> single-tile fallback (used to hang)
                       ((1, 35, 35, 8), (1, 1)),
                       ((1, 18, 18, 8), (1, 1))):  # ho=17 prime -> hb=th=17
        x = jnp.asarray(rng.randn(*shape), jnp.float32)
        want = upfirdn2d(x, jnp.asarray(kern) * 4.0, up=1, down=1, pad=pad)
        got = blur2d_pallas_bs(x, kern * 4.0, pad, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)


def test_fused_upconv_blur_interpret():
    """The fused up-conv+blur kernel (ops/pallas_upconv.py) matches the
    composition of the two seq stages (lhs-dilated convT then depthwise
    blur) exactly in interpret mode, across shapes, tile configs, and
    boundary tiles."""
    import numpy as np
    import jax.numpy as jnp
    from rewriting_tpu.ops.pallas_upconv import (upconv_blur_pallas,
                                                 upconv_blur_reference)

    rng = np.random.RandomState(0)
    for (h, w, ic, oc), kw in (
            ((8, 8, 16, 8), {}),
            ((16, 12, 8, 16), {}),
            ((4, 4, 4, 4), {}),            # single-tile: both halos masked
            ((16, 8, 8, 16), {"th": 4}),   # multiple row tiles
            ((8, 8, 8, 16), {"ob": 8})):   # gridded output channels
        x = jnp.asarray(rng.randn(2, h, w, ic), jnp.float32)
        wt = jnp.asarray(rng.randn(3, 3, ic, oc), jnp.float32) * 0.1
        want = np.asarray(upconv_blur_reference(x, wt))
        got = np.asarray(upconv_blur_pallas(x, wt, interpret=True, **kw))
        assert got.shape == (2, 2 * h, 2 * w, oc)
        rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
        assert rel < 1e-5, ((h, w, ic, oc), kw, rel)
    # asymmetric taps: both fns take kf in FIR (upfirdn2d) orientation —
    # the kernel flips internally (regression: unflipped taps only looked
    # right because [1,3,3,1] is symmetric)
    kf = (0.1, 0.5, 0.9, 0.5)
    x = jnp.asarray(rng.randn(1, 8, 8, 16), jnp.float32)
    wt = jnp.asarray(rng.randn(3, 3, 16, 8), jnp.float32) * 0.1
    want = np.asarray(upconv_blur_reference(x, wt, kf=kf))
    got = np.asarray(upconv_blur_pallas(x, wt, kf=kf, interpret=True))
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    assert rel < 1e-5, ("asymmetric kf", rel)


def test_fused_upconv_blur_bf16x3_dot():
    """_dot_hp's explicit bf16x3 decomposition (Mosaic has no HIGH
    precision) is fp32-tolerance-accurate vs a full-fp32 dot."""
    import numpy as np
    import jax.numpy as jnp
    from jax import lax
    from rewriting_tpu.ops.pallas_upconv import _dot_hp

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(64, 128), jnp.float32)
    w = jnp.asarray(rng.randn(128, 32), jnp.float32)
    exact = np.asarray(jnp.dot(x, w, precision=lax.Precision.HIGHEST))
    approx = np.asarray(_dot_hp(x, w, lax.Precision.HIGH))
    rel = np.abs(approx - exact).max() / np.abs(exact).max()
    assert rel < 1e-5, rel


def test_fused_upconv_epilogue_interpret():
    """The in-kernel demod+noise+bias+lrelu epilogue matches the
    elementwise chain applied after the two-stage reference."""
    import numpy as np
    import jax.numpy as jnp
    from rewriting_tpu.ops.fused_act import fused_leaky_relu
    from rewriting_tpu.ops.pallas_upconv import (upconv_blur_pallas,
                                                 upconv_blur_reference)

    rng = np.random.RandomState(2)
    b, h, w, ic, oc = 2, 8, 8, 16, 8
    x = jnp.asarray(rng.randn(b, h, w, ic), jnp.float32)
    wt = jnp.asarray(rng.randn(3, 3, ic, oc), jnp.float32) * 0.1
    demod = jnp.asarray(rng.rand(b, oc) + 0.5, jnp.float32)
    noise = jnp.asarray(rng.randn(b, 2 * h, 2 * w, 1), jnp.float32)
    bias = jnp.asarray(rng.randn(oc), jnp.float32)
    want = upconv_blur_reference(x, wt)
    want = want * demod[:, None, None, :] + noise
    want = np.asarray(fused_leaky_relu(want, bias))
    got = np.asarray(upconv_blur_pallas(x, wt, demod=demod, noise=noise,
                                        bias=bias, interpret=True))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-5, rel
    # broadcast (1, 2H, 2W, 1) noise with batch > 1: served to every
    # batch index via the BlockSpec index map, matching the seq stage's
    # natural broadcasting (regression: this used to be rejected)
    n1 = jnp.asarray(rng.randn(1, 2 * h, 2 * w, 1), jnp.float32)
    want_b = upconv_blur_reference(x, wt) * demod[:, None, None, :] + n1
    want_b = np.asarray(fused_leaky_relu(want_b, bias))
    got_b = np.asarray(upconv_blur_pallas(x, wt, demod=demod, noise=n1,
                                          bias=bias, interpret=True))
    rel = np.abs(got_b - want_b).max() / np.abs(want_b).max()
    assert rel < 1e-5, rel
