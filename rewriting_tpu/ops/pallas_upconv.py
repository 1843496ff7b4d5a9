"""Fused 2x-upsampling modulated-conv + FIR-blur Pallas TPU kernel.

This is the TPU analog of the reference's reason for a native kernel:
its CUDA upfirdn2d exists to fuse upsampling with the FIR filter so the
pre-blur activation never round-trips memory (reference
utils/stylegan2/op/upfirdn2d_kernel.cu:52-137).  On the XLA path the
up-dconv writes the (2H+1, 2W+1, O) pre-blur tensor to HBM and the
depthwise blur reads it back — measured 13.5 ms of a 116 ms
StyleGAN2-256 batch-64 forward on v5e (docs/PERF_NOTES.md,
"Stage-knockout"), pure HBM bandwidth.  This kernel computes

    y = blur_4x4( conv_transpose_3x3_stride2(x, w) ) * gain4

in one pass per output tile, entirely in VMEM:

1. convT phase decomposition — 9 MXU matmuls per tile (one per 3x3 tap,
   (rows*cols, I) x (I, O)), accumulated into the four (row-phase,
   col-phase) pre-blur signals over the UNdilated grid.  Same useful MACs
   as XLA's phase-efficient lhs-dilated lowering; no zero-inserted or
   4x-redundant composite kernel (the blur-folded (4O, I, 3, 3) composite
   costs 4x the MACs — a loss for lane-saturated channel counts).
2. the separable [1,3,3,1] blur applied in phase space as VPU
   shifted-FMAs on the in-VMEM phase signals (the blur splits by output
   parity into 2-tap combinations of the phase signals).
3. phase interleave to the final NHWC (2H, 2W, O) tile.

Halo scheme: BlockSpec-only (this runtime faults on manual HBM->VMEM
async DMA — docs/PERF_NOTES.md "capability map"): the input is passed
three times — a (th, W, I) main block plus 1-row top/bottom halo blocks
whose index maps clamp at the array edge; the kernel zeroes the halo rows
at t==0 / t==T-1 (conv zero-padding) and pads W in VMEM.  Extra HBM read
traffic: 2/th of the input.

Grid: (batch, H/th, O/ob) with the O axis innermost so consecutive
iterations reuse the same input blocks (only the weight block changes).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .precision import get_precision

# convT(stride 2, k=3, pad k-1) phase decomposition along one axis:
# output phase 0 at position u reads taps {0: x[u-1], 2: x[u]}, phase 1
# reads {1: x[u]} — i.e. tap d maps to (phase, shift): the matmul of tap
# d computed at input row r contributes to phase p at position r + shift.
_TAP_PHASE_SHIFT = {0: (0, 1), 1: (1, 0), 2: (0, 0)}


def _dot_hp(x, w, precision):
    """dot_general over the last axis of x with Mosaic-supported
    precision.  Mosaic lowers DEFAULT and HIGHEST but not HIGH, so the
    bf16x3 algorithm XLA uses for HIGH is spelled out: split each operand
    into a bf16 high part + bf16 residual and take the three significant
    cross terms (error O(2^-22), fp32-tolerance)."""
    import jax.lax as lax
    dims = (((x.ndim - 1,), (0,)), ((), ()))
    if precision == lax.Precision.HIGH:
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        wh = w.astype(jnp.bfloat16)
        wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
        kw = dict(preferred_element_type=jnp.float32,
                  precision=lax.Precision.DEFAULT)
        return (jax.lax.dot_general(xh, wh, dims, **kw)
                + (jax.lax.dot_general(xh, wl, dims, **kw)
                   + jax.lax.dot_general(xl, wh, dims, **kw)))
    return jax.lax.dot_general(x, w, dims,
                               preferred_element_type=jnp.float32,
                               precision=precision)


def _upconv_blur_body(main, top, bot, w_ref, *rest, kf, th, w_in,
                      nt, precision, epilogue):
    if epilogue:
        demod_ref, noise_ref, bias_ref, out_ref = rest
    else:
        (out_ref,) = rest
    t = pl.program_id(1)
    in_dtype = main.dtype
    x_main = main[0]                                   # (th, W, I)
    zero = jnp.zeros((), in_dtype)
    x_top = jnp.where(t == 0, zero, 1).astype(in_dtype) * top[0, 0]
    x_bot = jnp.where(t == nt - 1, zero, 1).astype(in_dtype) * bot[0, 0]
    x_t = jnp.concatenate([x_top[None], x_main, x_bot[None]], axis=0)
    o_c = out_ref.shape[3]
    # All second-minor (column) widths are kept 8-aligned: unaligned
    # widths put every Mosaic op on its masked-edge path, which blew
    # compile time up by orders of magnitude at W >= 64.
    CA = -(-(w_in + 4) // 8) * 8          # >= W+3, 8-aligned
    x_t = jnp.pad(x_t, ((0, 0), (1, CA - w_in - 1), (0, 0)))  # W halo

    # 1. convT phases, ONE concatenated matmul (3 dots under bf16x3)
    #    instead of 9 per-tap dots: (R, CA, I) x (I, 9*ob).  The weight
    #    operand arrives pre-packed (host-side) with this O-block's nine
    #    per-tap (I, ob) matrices laid out tap-major in the lane dim.
    big = _dot_hp(x_t, w_ref[:], precision)            # (R, CA, 9*ob)
    # Y[(p, q)][j, k] covers pre-blur position (u, v) = (j-1, k-1)
    Y = {}
    for dy in range(3):
        py, sy = _TAP_PHASE_SHIFT[dy]
        for dx in range(3):
            px, sx = _TAP_PHASE_SHIFT[dx]
            d = dy * 3 + dx
            tap = big[:, :, d * o_c:(d + 1) * o_c]     # lane-slice, free
            pad = jnp.pad(tap, ((sy, 1 - sy), (0, 0), (0, 0)))
            if sx:
                pad = jnp.roll(pad, 1, axis=1)
            key = (py, px)
            Y[key] = pad if key not in Y else Y[key] + pad

    # 2. separable blur in phase space.  1-D: out[2u+0] = kf0*y1[u-1] +
    #    kf1*y0[u] + kf2*y1[u] + kf3*y0[u+1]; out[2u+1] = kf0*y0[u] +
    #    kf1*y1[u] + kf2*y0[u+1] + kf3*y1[u+1]  (kf = flipped blur taps;
    #    [1,3,3,1] is symmetric).  Array index j = u + 1.
    kf0, kf1, kf2, kf3 = [jnp.float32(v) for v in kf]
    rb = {}
    for q in (0, 1):
        Y0, Y1 = Y[(0, q)], Y[(1, q)]
        rb[(0, q)] = (kf0 * Y1[0:th] + kf1 * Y0[1:th + 1]
                      + kf2 * Y1[1:th + 1] + kf3 * Y0[2:th + 2])
        rb[(1, q)] = (kf0 * Y0[1:th + 1] + kf1 * Y1[1:th + 1]
                      + kf2 * Y0[2:th + 2] + kf3 * Y1[2:th + 2])
    o = {}
    for p in (0, 1):
        A0, A1 = rb[(p, 0)], rb[(p, 1)]
        o[(p, 0)] = (kf0 * A1[:, 0:w_in] + kf1 * A0[:, 1:w_in + 1]
                     + kf2 * A1[:, 1:w_in + 1] + kf3 * A0[:, 2:w_in + 2])
        o[(p, 1)] = (kf0 * A0[:, 1:w_in + 1] + kf1 * A1[:, 1:w_in + 1]
                     + kf2 * A0[:, 2:w_in + 2] + kf3 * A1[:, 2:w_in + 2])

    # 3. phase interleave -> (2th, 2W, ob)
    c0 = jnp.stack([o[(0, 0)], o[(0, 1)]], axis=2).reshape(
        th, 2 * w_in, o_c)
    c1 = jnp.stack([o[(1, 0)], o[(1, 1)]], axis=2).reshape(
        th, 2 * w_in, o_c)
    out = jnp.stack([c0, c1], axis=1).reshape(2 * th, 2 * w_in, o_c)

    # 4. optional fused epilogue: demod * out + noise, then bias +
    #    leaky-relu * sqrt(2) — the whole post-conv elementwise chain
    #    (demod/noise/activate stages) without another HBM round-trip.
    if epilogue:
        out = out * demod_ref[0, 0][None, None, :]
        out = out + noise_ref[0, :, :, 0][:, :, None]
        out = out + bias_ref[0][None, None, :]
        out = jnp.float32(math.sqrt(2.0)) * jnp.where(
            out >= 0, out, jnp.float32(0.2) * out)
    out_ref[0] = out.astype(out_ref.dtype)


def _pick(n: int, target: int) -> int:
    for v in range(min(target, n), 0, -1):
        if n % v == 0:
            return v
    return n


def upconv_blur_pallas(x, wt, *, kf=(0.25, 0.75, 0.75, 0.25),
                       demod=None, noise=None, bias=None,
                       th: Optional[int] = None, ob: Optional[int] = None,
                       interpret: bool = False):
    """Fused up-conv + blur for StyleGAN2's upsampling layers.

    x:  (B, H, W, I) NHWC input fmap (the adain output).
    wt: (3, 3, I, O) correlation taps of the transposed conv — i.e. the
        seq dconv's flipped+scaled weight, axes moved to HWIO
        (models/stylegan2.py _make_dconv: w = flip(w5[0]) * scale;
        wt = w.transpose(2, 3, 1, 0)).
    kf: 1-D factor taps of the blur INCLUDING the 4x upsample gain
        ([1,3,3,1]/8 * 2 for the standard kernel), in FIR (upfirdn2d /
        upconv_blur_reference) orientation; the kernel body consumes the
        flipped (convolution-orientation) taps, flipped here — only
        visible for asymmetric kernels.
    noise: optional (B, 2H, 2W, 1) or broadcast (1, 2H, 2W, 1) — the
        batch-1 form is served to every batch index via the BlockSpec
        index map (free; no materialized tiling).

    Returns (B, 2H, 2W, O) == blur2d(up_dconv(x), pad=(1,1), gain 4),
    the exact composition of the two seq stages.
    """
    n, h, w, in_c = x.shape
    out_c = wt.shape[3]
    if not interpret and jax.default_backend() == "cpu":
        interpret = True  # no Mosaic on CPU; tests run the same math
    th = th or _pick(h, 8)
    ob = ob or _pick(out_c, 128)
    nt = h // th
    grid = (n, nt, out_c // ob)
    hmax = h - 1
    # pack (3, 3, I, O) -> (I, (O/ob) * 9 * ob): O-block-major, then
    # tap-major lanes, so each grid step's weight block (I, 9*ob) is one
    # contiguous lane slice and the kernel needs no weight shuffling
    wp = jnp.transpose(wt.reshape(9, in_c, out_c // ob, ob),
                       (1, 2, 0, 3)).reshape(in_c, 9 * out_c)
    epilogue = demod is not None
    assert epilogue == (noise is not None) == (bias is not None), \
        "demod/noise/bias must be passed together (the fused epilogue)"
    in_specs = [
        pl.BlockSpec((1, th, w, in_c), lambda b, t, o: (b, t, 0, 0)),
        pl.BlockSpec((1, 1, w, in_c),
                     lambda b, t, o, th=th:
                     (b, jnp.maximum(t * th - 1, 0), 0, 0)),
        pl.BlockSpec((1, 1, w, in_c),
                     lambda b, t, o, th=th, hmax=hmax:
                     (b, jnp.minimum(t * th + th, hmax), 0, 0)),
        pl.BlockSpec((in_c, 9 * ob), lambda b, t, o: (0, o)),
    ]
    args = [x, x, x, wp]
    if epilogue:
        assert demod.shape == (n, out_c), demod.shape
        assert noise.shape in ((n, 2 * h, 2 * w, 1),
                               (1, 2 * h, 2 * w, 1)), noise.shape
        assert bias.shape == (out_c,), bias.shape
        noise_b = (lambda b, t, o: (0, t, 0, 0)) if noise.shape[0] == 1 \
            else (lambda b, t, o: (b, t, 0, 0))
        # compiled Mosaic requires the last-2 block dims to be 8/128-
        # aligned or whole: give demod/bias a unit second-minor axis
        in_specs += [
            pl.BlockSpec((1, 1, ob), lambda b, t, o: (b, 0, o)),
            pl.BlockSpec((1, 2 * th, 2 * w, 1), noise_b),
            pl.BlockSpec((1, ob), lambda b, t, o: (0, o)),
        ]
        args += [demod[:, None, :], noise, bias[None, :]]
    return pl.pallas_call(
        functools.partial(_upconv_blur_body, kf=tuple(float(v) for v
                                                      in kf)[::-1],
                          th=th, w_in=w, nt=nt,
                          precision=get_precision(), epilogue=epilogue),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, out_c), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 2 * th, 2 * w, ob),
                               lambda b, t, o: (b, t, 0, o)),
        interpret=interpret,
    )(*args)


_FUSED_MODE = "off"  # "off" | "on" | "auto"
_FUSED_MIN_RES = 256  # min OUTPUT resolution; the 256-out layer is where
# the kernel beats XLA's two-pass chain (13.7 vs 16.7 ms at b32 on v5e —
# docs/PERF_NOTES.md round 3); the 64/128-out layers measured ties, and
# every enabled layer pays a worker-side program load at first execution


def set_fused_upconv(mode: str, min_res: Optional[int] = None) -> None:
    """Select the fused up-conv+blur dispatch for pipeline_fast's wide
    upsampling layers: "off" (XLA two-pass), "on" (all eligible shapes,
    for benchmarking), "auto" (compiled-Pallas probe + shape gates +
    the measured min-output-resolution gate).  Set before the first
    trace."""
    global _FUSED_MODE, _FUSED_MIN_RES
    assert mode in ("off", "on", "auto"), mode
    _FUSED_MODE = mode
    if min_res is not None:
        _FUSED_MIN_RES = min_res


_FUSED_EPILOGUE = True


def set_fused_epilogue(on: bool) -> None:
    """Toggle the in-kernel demod+noise+bias+lrelu epilogue (A/B knob;
    on by default — it removes the whole post-conv elementwise pass)."""
    global _FUSED_EPILOGUE
    _FUSED_EPILOGUE = bool(on)


def fused_epilogue_active(in_c: int, out_c: int,
                          res: Optional[int] = None) -> bool:
    return _FUSED_EPILOGUE and fused_upconv_active(in_c, out_c, res)


def fused_upconv_active(in_c: int, out_c: int,
                        res: Optional[int] = None) -> bool:
    """Trace-time gate for the fused kernel (called from the model's
    fast-pipeline stage fns).  `res` = the layer's OUTPUT resolution."""
    if _FUSED_MODE == "off":
        return False
    if in_c < 64 or out_c < 64 or in_c % 8 or out_c % 8:
        return False  # lane-starved shapes stay on the XLA path
    if res is not None and res < _FUSED_MIN_RES:
        return False  # sub-gate layers measured as ties: not worth the
        # per-program worker load ("on" included; pass min_res to widen)
    if _FUSED_MODE == "on":
        return True
    from .pallas_probe import fused_upconv_supported
    return fused_upconv_supported()


def upconv_blur_reference(x, wt, kf=(0.25, 0.75, 0.75, 0.25)):
    """XLA reference of the same math (the two seq stages composed):
    lhs-dilated convT then depthwise blur — used for exactness tests and
    as the measured baseline the kernel must beat."""
    from jax import lax
    in_c, out_c = wt.shape[2], wt.shape[3]
    w_oihw = jnp.transpose(wt, (3, 2, 0, 1))           # (O, I, 3, 3)
    y = lax.conv_general_dilated(
        x, w_oihw, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        precision=get_precision())                     # (B, 2H+1, 2W+1, O)
    kf = np.asarray(kf, np.float32)
    k2 = np.outer(kf, kf)
    from .upfirdn2d import upfirdn2d
    return upfirdn2d(y, jnp.asarray(k2), up=1, down=1, pad=(1, 1))
