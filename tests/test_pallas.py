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
