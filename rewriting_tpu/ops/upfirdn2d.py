"""upfirdn2d — upsample, pad, FIR filter, downsample, in one fused op.

The reference ships a templated CUDA kernel for this
(utils/stylegan2/op/upfirdn2d_kernel.cu) with a hand-written double-backward
(utils/stylegan2/op/upfirdn2d.py:18-84).  The exact semantics are specified by
its pure-torch fallback ``upfirdn2d_native`` (op/upfirdn2d.py:152-186):

    1. insert (up-1) zeros after every input sample (incl. trailing zeros),
    2. pad by (pad0, pad1) on each spatial edge (negative pad crops),
    3. correlate with the spatially-flipped FIR kernel,
    4. keep every down-th sample.

On TPU this maps *exactly* onto ``lax.conv_general_dilated`` with
``lhs_dilation=up`` and explicit padding — one XLA op that the compiler
pipelines with neighbouring ops, and that is differentiable (the blur sits in
the backward path of the edit solve, so differentiability is required).  The
only subtlety: lhs_dilation produces (n-1)*up+1 samples (no trailing zeros),
so the trailing (up-1) zeros move into the right/bottom padding.

Layout: NHWC. The FIR kernel is shared across channels (depthwise).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .precision import get_precision


def make_kernel(k) -> jnp.ndarray:
    """Build a normalized 2-d FIR kernel from a 1-d or 2-d tap list
    (reference: utils/stylegan2/models.py:449-454)."""
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum()
    return jnp.asarray(k)


def upfirdn2d(x, kernel, up: int = 1, down: int = 1,
              pad: Tuple[int, int] = (0, 0), stencil: bool = False):
    """Apply upfirdn to an NHWC tensor with a (kh, kw) FIR kernel.

    Matches torch ``op.upfirdn2d(input_nchw, kernel, up, down, pad)``
    (reference: utils/stylegan2/op/upfirdn2d.py:144-149) with symmetric
    x/y factors and pad = (pad0, pad1) applied to both axes.

    The shift-and-add stencil variant (stencil=True) exists for reference
    and CPU use; on TPU the materialized zero-inserted intermediate makes
    it memory-bound-slower than the dilated-conv formulation, so the conv
    path is the default.  The Pallas kernel (pallas.py) is the fast path
    for lane-friendly channel counts.
    """
    if stencil is True and down == 1 and \
            kernel.shape[0] * kernel.shape[1] <= 64:
        return _upfirdn2d_stencil(x, kernel, up, pad)
    return upfirdn2d_general(x, kernel, up_x=up, up_y=up, down_x=down,
                             down_y=down, pad_x=(pad[0], pad[1]),
                             pad_y=(pad[0], pad[1]))


def _upfirdn2d_stencil(x, kernel, up: int, pad: Tuple[int, int]):
    """Zero-insert + padded shift-and-add correlation with the flipped
    kernel (identical math to the reference spec)."""
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    kflip = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    if up > 1:
        xd = jnp.zeros((n, h * up, w * up, c), x.dtype)
        xd = xd.at[:, ::up, ::up, :].set(x)
    else:
        xd = x
    p0, p1 = pad
    xp = jnp.pad(xd, ((0, 0), (max(p0, 0), max(p1, 0)),
                      (max(p0, 0), max(p1, 0)), (0, 0)))
    if p0 < 0 or p1 < 0:
        xp = xp[:, max(-p0, 0): xp.shape[1] - max(-p1, 0),
                max(-p0, 0): xp.shape[2] - max(-p1, 0), :]
    ho = xp.shape[1] - kh + 1
    wo = xp.shape[2] - kw + 1
    out = jnp.zeros((n, ho, wo, c), x.dtype)
    for i in range(kh):
        for j in range(kw):
            out = out + kflip[i, j] * xp[:, i:i + ho, j:j + wo, :]
    return out


def upfirdn2d_general(x, kernel, up_x=1, up_y=1, down_x=1, down_y=1,
                      pad_x=(0, 0), pad_y=(0, 0)):
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    # True convolution = correlation with the flipped kernel
    # (reference spec flips: op/upfirdn2d.py:177).
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    # Depthwise: one shared filter per channel.
    k = jnp.broadcast_to(k[:, :, None, None], (kh, kw, 1, c))
    pad_y = (pad_y[0], pad_y[1] + up_y - 1)  # fold trailing zeros into pad
    pad_x = (pad_x[0], pad_x[1] + up_x - 1)
    return lax.conv_general_dilated(
        x, k,
        window_strides=(down_y, down_x),
        padding=(pad_y, pad_x),
        lhs_dilation=(up_y, up_x),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=get_precision(),
    )


# ---------------------------------------------------------------------------
# Banded-matmul formulation: upfirdn is separable, so it factors into
# out = My @ x @ Mxᵀ with 1-D operator matrices.  The matrices are mostly
# zero (bandwidth = kernel taps), but on TPU the MXU runs them so much
# faster than the depthwise-conv path that the redundant FLOPs win by a
# wide margin for typical StyleGAN2 shapes (measured on v5e).  The
# operator matrices are built on host by pushing an identity basis
# through the exact upfirdn math, so any (up, down, pad) config is
# supported and correctness is inherited by construction.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=256)
def _upfirdn1d_matrix(n: int, taps: tuple, up: int, down: int,
                      pad0: int, pad1: int) -> np.ndarray:
    """(out_n, n) matrix of the 1-D upfirdn operator."""
    k = np.asarray(taps, np.float32)
    eye = np.eye(n, dtype=np.float32)
    # zero-insert
    upd = np.zeros((n, n * up), np.float32)
    upd[:, ::up] = eye
    # pad (negative crops)
    if pad0 >= 0 and pad1 >= 0:
        padded = np.pad(upd, ((0, 0), (pad0, pad1)))
    else:
        padded = upd[:, max(-pad0, 0): upd.shape[1] - max(-pad1, 0)]
        padded = np.pad(padded, ((0, 0), (max(pad0, 0), max(pad1, 0))))
    # correlate with flipped taps, stride = down
    kf = k[::-1]
    m = padded.shape[1]
    out_n = (m - len(k)) // down + 1
    op = np.zeros((n, out_n), np.float32)
    for o in range(out_n):
        sl = padded[:, o * down: o * down + len(k)]
        op[:, o] = sl @ kf
    return op.T  # (out_n, n)


def upfirdn2d_matmul(x, kernel_taps_y, kernel_taps_x, up=1, down=1,
                     pad=(0, 0), gain=1.0):
    """Separable upfirdn via two MXU matmuls. kernel_taps_* are the 1-D
    factor taps (e.g. [1,3,3,1] normalized); total kernel = outer product
    times `gain`."""
    from .precision import get_precision
    n, h, w, c = x.shape
    my = jnp.asarray(_upfirdn1d_matrix(h, tuple(float(t) for t
                                                in kernel_taps_y),
                                       up, down, pad[0], pad[1]))
    mx = jnp.asarray(_upfirdn1d_matrix(w, tuple(float(t) for t
                                                in kernel_taps_x),
                                       up, down, pad[0], pad[1]))
    out = jnp.einsum("oh,nhwc->nowc", my, x, precision=get_precision())
    out = jnp.einsum("pw,nowc->nopc", mx, out, precision=get_precision())
    return out * gain


def separable_taps(kernel_1d) -> tuple:
    """Normalized 1-D taps whose outer product is make_kernel(kernel_1d)."""
    k = np.asarray(kernel_1d, np.float64)
    k = k / k.sum()
    return tuple(float(v) for v in k)


def _pallas_eligible(x, kernel) -> bool:
    """Use the Pallas FIR kernels for lane-friendly feature maps on
    runtimes where the compiled-Pallas probe has passed (pallas_probe.py;
    never on this image's axon runtime, where compiled Pallas faults the
    worker — the XLA formulation is the verified default)."""
    import jax as _jax
    if isinstance(kernel, _jax.core.Tracer):
        return False  # taps must be compile-time constants
    if x.shape[-1] < 64 or x.shape[-1] % 8 != 0:
        return False  # RGB/narrow maps stay on the XLA path
    from .pallas_probe import compiled_pallas_supported
    return compiled_pallas_supported()


def _separable_taps_2d(kernel) -> Optional[Tuple[tuple, tuple]]:
    """(taps_y, taps_x) if the concrete 2-d kernel is rank-1 (all StyleGAN2
    FIR kernels are outer products), else None."""
    import jax as _jax
    if isinstance(kernel, _jax.core.Tracer):
        return None
    k = np.asarray(kernel, np.float64)
    if k.ndim != 2:
        return None
    u, s, vt = np.linalg.svd(k)
    if s[0] <= 0 or (len(s) > 1 and s[1] > 1e-10 * s[0]):
        return None
    ty = u[:, 0] * np.sqrt(s[0])
    tx = vt[0] * np.sqrt(s[0])
    if ty.sum() < 0:  # fix SVD sign so taps are the positive factors
        ty, tx = -ty, -tx
    return (tuple(float(t) for t in ty), tuple(float(t) for t in tx))


def upsample2d(x, kernel, factor: int = 2):
    """FIR upsample (reference Upsample, utils/stylegan2/models.py:435-447):
    gain factor**2, pad ((p+1)//2 + factor - 1, p//2) with p = kh - factor.
    NOT itself jitted: callers trace it inside their own jits, and jitting
    here would turn `kernel` into a Tracer and disable the Pallas/matmul
    dispatch (taps must be compile-time constants)."""
    kh = kernel.shape[0]
    p = kh - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    if factor == 2 and _pallas_eligible(x, kernel) and \
            x.shape[1] * 2 + pad0 + pad1 - kh + 1 == 2 * x.shape[1]:
        from .pallas_upfirdn import upsample2x_pallas
        return upsample2x_pallas(x, np.asarray(kernel) * 4.0, (pad0, pad1))
    if x.shape[-1] <= 8:
        # Narrow-channel maps (the RGB skip path): the depthwise-conv
        # lowering is catastrophic on TPU for C << 128 (3 of 128 lanes,
        # and the zero-dilated intermediate can materialize: measured
        # 75 ms of a 119 ms StyleGAN2-1024 forward in ONE 3-channel
        # 512->1024 upsample).  The separable banded-matmul formulation
        # runs it as two full-shape MXU matmuls instead (~1 ms there);
        # exact by construction (docs/PERF_NOTES.md).  Note: at "highest"
        # this reassociates the FIR sum through two fp32 matmuls — fp32-
        # faithful but not bit-identical to the depthwise formulation
        # (the documented "highest" contract, ops/precision.py).
        sep = _separable_taps_2d(kernel)
        if sep is not None:
            return upfirdn2d_matmul(x, sep[0], sep[1], up=factor, down=1,
                                    pad=(pad0, pad1), gain=factor ** 2)
    return upfirdn2d(x, kernel * (factor ** 2), up=factor, down=1,
                     pad=(pad0, pad1))


def blur2d(x, kernel, pad: Tuple[int, int], upsample_factor: int = 1):
    """FIR blur (reference Blur, utils/stylegan2/models.py:468-479)."""
    if upsample_factor > 1:
        kernel = kernel * (upsample_factor ** 2)
    if _pallas_eligible(x, kernel):
        from .pallas_upfirdn import blur2d_pallas
        return blur2d_pallas(x, np.asarray(kernel), pad)
    return upfirdn2d(x, kernel, up=1, down=1, pad=pad)
