"""StyleGAN2 generator as a functional stage pipeline (TPU-native).

Rebuilds the reference's sequentialized StyleGAN2 (utils/stylegan2/models.py)
— weight-compatible with the rosinality pytorch port — as a pure-function
pipeline over a DataBag pytree:

- The essential rewriting trick is preserved (reference models.py:12-22):
  the modulated conv is split into modulation -> adain -> dconv -> blur so
  the *linear* convolution (``dconv``) can be treated as a linear associative
  memory and rewritten directly.
- Compute is NHWC (TPU conv layout). Conv weights are stored in the torch
  order — dconv keeps the 5-d (1, O, I, kh, kw) shape — so the rewriting
  einsum ``goiyx,di->godyx`` (reference ganrewrite.py:806-813) and checkpoint
  conversion are layout-identical; XLA folds the relayout into the program.
- The reference's custom CUDA ops map to XLA-native formulations:
  upfirdn2d -> lax.conv_general_dilated with lhs_dilation (ops/upfirdn2d.py),
  fused_bias_act -> a fused VPU epilogue (ops/fused_act.py).
- Noise: the reference's NoiseInjectionF always regenerates deterministic
  ``np.random.RandomState(0).randn(batch, h*w)`` noise (models.py:540-546 —
  the registered noise_i buffers are injected into the bag but never read).
  We reproduce that contract, but pass the noise arrays in as runtime inputs
  (bag keys ``noise_{h}x{w}``) instead of burning them into the compiled
  program as constants.

Stage names mirror the reference module paths exactly (``layer4.sconv.mconv.
dconv`` etc.) so saved edit requests and surgery code work unchanged.
"""

from __future__ import annotations

import functools
import math
import re
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core import DataBag, Stage, StagePipeline
from ..ops import fused_leaky_relu, make_kernel, upsample2d, blur2d
from ..ops.precision import get_precision, int8_active
from ..ops.quant import conv2d_w8a8, quantize_weight_per_channel

CHANNELS = lambda cm: {4: 512, 8: 512, 16: 512, 32: 512, 64: 256 * cm,
                       128: 128 * cm, 256: 64 * cm, 512: 32 * cm,
                       1024: 16 * cm}


# ---------------------------------------------------------------------------
# Deterministic reference noise (RandomState(0), prefix-stable in batch)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _reference_noise(batch: int, h: int, w: int) -> np.ndarray:
    """np.random.RandomState(0).randn(batch, h*w) reshaped NHWC — the exact
    fallback noise of reference NoiseInjectionF (models.py:543-545)."""
    noise = np.random.RandomState(0).randn(batch, h * w).astype(np.float32)
    return noise.reshape(batch, h, w, 1)


def noise_key(h: int, w: int) -> str:
    return f"noise_{h}x{w}"


# ---------------------------------------------------------------------------
# Stage functions
# ---------------------------------------------------------------------------

def _bag_in(params, z) -> DataBag:
    if isinstance(z, DataBag):
        return z
    return DataBag(latent=jnp.asarray(z))


def _pixel_norm_latent(params, d: DataBag) -> DataBag:
    x = d["latent"]
    return DataBag(d, latent=x * lax.rsqrt(
        jnp.mean(jnp.square(x), axis=1, keepdims=True) + 1e-8))


def _equal_linear(params, x, scale, lr_mul, activation):
    w = params["weight"] * scale
    out = jnp.dot(x, w.T, precision=get_precision())
    if activation == "fused_lrelu":
        return fused_leaky_relu(out, params["bias"] * lr_mul)
    return out + params["bias"] * lr_mul


def _make_style_linear(in_dim, lr_mul):
    scale = (1.0 / math.sqrt(in_dim)) * lr_mul

    def fn(params, d: DataBag) -> DataBag:
        return DataBag(d, latent=_equal_linear(params, d["latent"], scale,
                                               lr_mul, "fused_lrelu"))
    return fn


def _make_modulation(style_dim):
    scale = 1.0 / math.sqrt(style_dim)

    def fn(params, d: DataBag) -> DataBag:
        return DataBag(d, style=_equal_linear(params, d["style"], scale,
                                              1.0, None))
    return fn


def _make_adjust_latent(n_latent, truncation):
    def fn(params, d: DataBag) -> DataBag:
        latent = d["latent"]
        avg = params["latent_avg"]
        if truncation != 1.0 and jnp.ndim(avg) > 0:
            latent = avg + truncation * (latent - avg)
        latent = jnp.repeat(latent[:, None, :], n_latent, axis=1)
        return DataBag(d, latent=latent)
    return fn


def _noises_stage(params, d: DataBag) -> DataBag:
    # Reference FixedNoiseBuffers injects noise_i buffers into the bag
    # (models.py:331-352); they are carried but never consumed (the
    # injection stages read shape-keyed noise instead — see module docstring).
    out = DataBag(d)
    for k, v in params.items():
        if k.startswith("noise_") and k not in out:
            out[k] = v
    return out


def _constant_input(params, d: DataBag) -> DataBag:
    batch = d["latent"].shape[0]
    const = params["input"]
    return DataBag(d, fmap=jnp.broadcast_to(
        const, (batch,) + const.shape[1:]))


def _make_pick_latent(index):
    def fn(params, d: DataBag) -> DataBag:
        return DataBag(d, style=d["latent"][:, index])
    return fn


def _apply_style(params, d: DataBag) -> DataBag:
    # adain: per-sample per-input-channel scaling (models.py:616-620); NHWC.
    return DataBag(d, fmap=d["style"][:, None, None, :] * d["fmap"])


@functools.lru_cache(maxsize=1)
def _s2d_placement() -> np.ndarray:
    """(p, q, t, d) one-hot: original 3x3 tap d contributing to output
    phase p reads input phase q of the space-to-depth block at offset
    t-1 (p + d - 1 == 2*(t-1) + q)."""
    A = np.zeros((2, 2, 3, 3), np.float32)
    for p in range(2):
        for d in range(3):
            r = p + d - 1
            q = r % 2
            A[p, q, (r - q) // 2 + 1, d] = 1.0
    return A


def _conv3x3_s2d(x, w):
    """3x3 SAME conv computed in space-to-depth layout.

    Narrow-channel high-resolution convs are lane-starved on TPU (C of 128
    MXU lanes used; measured 3.4 TF/s for the 32-channel 1024x1024 conv vs
    ~65 TF/s achievable).  Reshaping (H, W, C) -> (H/2, W/2, 4C) and
    convolving with the phase-transformed kernel (4O, 4I, 3, 3) does 2x
    the MACs of the exact conv but with full lane occupancy — a large net
    win.  Exact regrouping of the same products (each original tap appears
    once; structural zeros elsewhere).  NHWC-in/NHWC-out wrapper around
    the fast-tail helpers; the production tail avoids the two transposes
    by staying in s2d layout across stages."""
    return _d2s_of(_conv3x3_s2d_pre(_s2d_of(x), _s2d_kernel_transform(w)))


def _make_dconv(in_c, out_c, kernel_size, demodulate, upsample):
    fan_in = in_c * kernel_size ** 2
    scale = 1.0 / math.sqrt(fan_in)
    padding = kernel_size // 2

    def fn(params, d: DataBag) -> DataBag:
        w5 = params["weight"]            # (1, O, I, kh, kw), torch order
        x = d["fmap"]
        if upsample:
            # torch F.conv_transpose2d(x, w.transpose(1,2)[0], stride=2) ==
            # dilated conv with the spatially-flipped kernel and k-1 padding.
            w = jnp.flip(w5[0], (-2, -1)) * scale      # (O, I, kh, kw)
            pad = ((kernel_size - 1, kernel_size - 1),) * 2
            if int8_active():
                w_i8, w_scale = quantize_weight_per_channel(w, axis=0)
                out = conv2d_w8a8(x, w_i8, w_scale, padding=pad,
                                  lhs_dilation=(2, 2),
                                  out_dtype=x.dtype)
            else:
                out = lax.conv_general_dilated(
                    x, w, window_strides=(1, 1), padding=pad,
                    lhs_dilation=(2, 2),
                    dimension_numbers=("NHWC", "OIHW", "NHWC"),
                    precision=get_precision())
        else:
            pad = ((padding, padding), (padding, padding))
            if int8_active():
                w_i8, w_scale = quantize_weight_per_channel(
                    w5[0] * scale, axis=0)
                out = conv2d_w8a8(x, w_i8, w_scale, padding=pad,
                                  out_dtype=x.dtype)
            else:
                out = lax.conv_general_dilated(
                    x, w5[0] * scale, window_strides=(1, 1), padding=pad,
                    dimension_numbers=("NHWC", "OIHW", "NHWC"),
                    precision=get_precision())
        if demodulate:
            # demod = rsqrt(sum_{I,kh,kw} (scale*W*style)^2 + 1e-8) per (B,O)
            # (reference models.py:324-328). Commutes with the conv, applied
            # post-hoc so the conv itself stays a plain linear map.
            style = d["style"]                          # (B, I)
            w_sq = jnp.sum(jnp.square(w5[0] * scale), axis=(-2, -1))  # (O, I)
            demod = lax.rsqrt(jnp.dot(jnp.square(style), w_sq.T,
                                      precision=get_precision()) + 1e-8)

            out = out * demod[:, None, None, :]
        return DataBag(d, fmap=out)
    return fn


def _make_blur(blur_kernel, pad, upsample_factor):
    kern = np.asarray(make_kernel(blur_kernel))

    def fn(params, d: DataBag) -> DataBag:
        return DataBag(d, fmap=blur2d(d["fmap"], jnp.asarray(kern), pad,
                                      upsample_factor))
    return fn


def _make_fused_upconv_dconv(prefix, in_c, out_c, blur_kernel, res=None):
    """pipeline_fast dconv override for wide upsampling layers: when the
    fused Pallas up-conv+blur kernel is enabled (ops/pallas_upconv.py —
    the TPU analog of the reference's upfirdn2d CUDA fusion,
    utils/stylegan2/op/upfirdn2d_kernel.cu), compute dconv AND blur (and,
    with the fused epilogue, demod+noise+activate too) in one pass;
    otherwise fall through to the seq dconv (the downstream stages
    dispatch on the resulting shape / the same trace-time gates).  Exact
    math either way.  Receives FULL params (fn._full_params) because the
    epilogue consumes the noise and activate stages' parameters."""
    seq_fn = _make_dconv(in_c, out_c, 3, True, upsample=True)
    scale = 1.0 / math.sqrt(in_c * 9)
    k = np.asarray(blur_kernel, np.float64)
    kf = tuple(float(v) for v in (k / k.sum()) * 2.0)  # 1-D taps w/ gain

    def fn(params, d: DataBag) -> DataBag:
        from ..ops.pallas_upconv import (fused_epilogue_active,
                                         fused_upconv_active,
                                         upconv_blur_pallas)
        own = params.get(f"{prefix}.mconv.dconv", {})
        if not fused_upconv_active(in_c, out_c, res):
            return seq_fn(own, d)
        w5 = own["weight"]
        wf = jnp.flip(w5[0], (-2, -1)) * scale
        wt = jnp.transpose(wf, (2, 3, 1, 0))            # (3, 3, I, O)
        x = d["fmap"]
        # demod commutes with the (channel-diagonal) blur
        style = d["style"]
        w_sq = jnp.sum(jnp.square(w5[0] * scale), axis=(-2, -1))
        demod = lax.rsqrt(jnp.dot(jnp.square(style), w_sq.T,
                                  precision=get_precision()) + 1e-8)
        if fused_epilogue_active(in_c, out_c, res):
            b, h = x.shape[0], x.shape[1]
            noise = d.get(noise_key(2 * h, 2 * x.shape[2]))
            if noise is None:
                noise = jnp.asarray(_reference_noise(b, 2 * h,
                                                     2 * x.shape[2]))
            nscaled = params[f"{prefix}.noise"]["weight"] * noise
            bias = params[f"{prefix}.activate"]["bias"]
            out = upconv_blur_pallas(x, wt, kf=kf, demod=demod,
                                     noise=nscaled, bias=bias)
            return DataBag(d, fmap=out)
        out = upconv_blur_pallas(x, wt, kf=kf)          # (B, 2H, 2W, O)
        return DataBag(d, fmap=out * demod[:, None, None, :])
    fn._full_params = True
    return fn


def _make_shape_dispatch_blur(blur_kernel, pad, upsample_factor):
    """pipeline_fast blur override paired with _make_fused_upconv_dconv:
    the seq up-dconv emits (2H+1, 2W+1) (still needs the blur), the
    fused kernel emits the final even-sized (2H, 2W) (blur already
    applied) — dispatch on the trace-time shape parity."""
    blur_fn = _make_blur(blur_kernel, pad, upsample_factor)

    def fn(params, d: DataBag) -> DataBag:
        if d["fmap"].shape[1] % 2 == 0:
            return d  # fused kernel already applied the blur
        return blur_fn(params, d)
    return fn


def _make_epilogue_skip(seq_fn, in_c, out_c, res):
    """noise / activate overrides for fused-epilogue-capable layers:
    identity when the epilogue ran inside the kernel (same trace-time
    gate as the dconv stage, so the stages always agree)."""
    def fn(params, d: DataBag) -> DataBag:
        from ..ops.pallas_upconv import fused_epilogue_active
        if fused_epilogue_active(in_c, out_c, res):
            return d
        return seq_fn(params, d)
    return fn


def _subpixel3_kernel(wf, out_c, in_c):
    """(O, I, 3, 3) correlation taps -> (4O, I, 2, 2) subpixel phase
    kernels for a stride-2 transposed conv (pad k-1).

    The dilated conv's output y[s] = sum_b xd[s+b-2]*wf[b] (xd = 2x
    zero-dilated input) splits by output parity p = s mod 2 into two
    3-to-2-tap correlations over the UNdilated input:
    p=0 taps [wf0, wf2] at {u-1, u}; p=1 taps [0, wf1] at {u}.  One conv
    with 4O phase channels at input resolution does 2.25x fewer MACs than
    the dense dilated conv XLA would otherwise emit, with full MXU lane
    occupancy on the output channels."""
    idx = jnp.array([[0, 2], [0, 1]])
    msk = jnp.array([[1.0, 1.0], [0.0, 1.0]], wf.dtype)
    ky = wf[:, :, idx, :] * msk[None, None, :, :, None]    # (O,I,2,2,3)
    k = ky[:, :, :, :, idx] * msk[None, None, None, None]  # (O,I,p,ty,q,tx)
    return k.transpose(2, 4, 0, 1, 3, 5).reshape(4 * out_c, in_c, 2, 2)


def _make_subpixel_up_dconv(in_c, out_c, kernel_size, demodulate):
    """Alternate formulation for the upsampling dconv: subpixel (phase)
    decomposition instead of the zero-dilated conv (see _subpixel3_kernel).
    Bit-equivalent math; the FIR blur stage that follows is unchanged.
    (The previously-tried alternative — folding the blur into a 6x6
    dilated kernel — measured 1.6x SLOWER on TPU because XLA computes
    dilated convs dense, so k**2 growth dominates; see
    scripts/bench_upconv.py.)"""
    assert kernel_size == 3
    fan_in = in_c * kernel_size ** 2
    scale = 1.0 / math.sqrt(fan_in)

    def fn(params, d: DataBag) -> DataBag:
        w5 = params["weight"]
        wf = jnp.flip(w5[0], (-2, -1)) * scale         # correlation taps
        kconv = _subpixel3_kernel(wf, out_c, in_c)
        x = d["fmap"]
        ph = lax.conv_general_dilated(
            x, kconv, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "OIHW", "NHWC"),
            precision=get_precision())                  # (B, h+1, w+1, 4O)
        if demodulate:
            style = d["style"]
            w_sq = jnp.sum(jnp.square(w5[0] * scale), axis=(-2, -1))
            demod = lax.rsqrt(jnp.dot(jnp.square(style), w_sq.T,
                                      precision=get_precision()) + 1e-8)
            ph = ph * jnp.tile(demod, (1, 4))[:, None, None, :]
        b, hp, wp = ph.shape[:3]
        t = ph.reshape(b, hp, wp, 2, 2, out_c)
        t = t.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * hp, 2 * wp, out_c)
        out = t[:, :2 * hp - 1, :2 * wp - 1, :]         # (B, 2h+1, 2w+1, O)
        return DataBag(d, fmap=out)
    return fn


# ---------------------------------------------------------------------------
# Fast s2d tail: for narrow-channel high-resolution layers (the 1024-model
# tail), the production sampling pipeline folds the FIR blur into the
# upsampling dconv (one composite conv whose per-phase 3x3 kernels are the
# subpixel decomposition of the 6x6 blur*convT filter) and carries the
# feature map in space-to-depth layout (B, H/2, W/2, 4C) so every conv runs
# with full MXU lane occupancy.  Exact math (same products, regrouped);
# stage BOUNDARY values differ (fmap is s2d, blur is folded), so the seq
# pipeline remains the instrumentation/editing surface — mirroring the
# reference, whose fast grouped-conv mconv is the default sampling path
# while the sequential split exists for rewriting (reference
# utils/stylegan2/models.py:12-22, 354-425).
# ---------------------------------------------------------------------------

def _composite_up_kernel(wf, blur_kern, out_c, in_c):
    """(O, I, 3, 3) correlation taps + 4x4 FIR -> (4O, I, 3, 3) per-phase
    taps of blur∘convT over the undilated input.

    convT(stride 2, k3, pad k-1) then FIR blur (pad (1,1), gain 4) is a
    correlation of the zero-dilated input (total pad 3) with the 6x6 full
    convolution C = wf * flip(blur); output phase p takes taps
    C[3-p+2Δ] for Δ in {-1,0,1} — a plain 3x3 conv producing 4O phase
    channels at input resolution (phase-major channel order, matching the
    s2d layout convention)."""
    kf = jnp.flip(jnp.asarray(blur_kern, wf.dtype), (0, 1)) * 4.0
    comp = jnp.zeros((out_c, in_c, 6, 6), wf.dtype)
    for by in range(4):
        for bx in range(4):
            comp = comp.at[:, :, by:by + 3, bx:bx + 3].add(
                wf * kf[by, bx])
    idx = jnp.array([[1, 3, 5], [0, 2, 4]])       # rows for phase p=0,1
    k = comp[:, :, idx, :]                        # (O, I, p, 3, 6)
    k = k[:, :, :, :, idx]                        # (O, I, p, 3, P, 3)
    return k.transpose(2, 4, 0, 1, 3, 5).reshape(4 * out_c, in_c, 3, 3)


def _conv3x3_s2d_pre(xs, wt):
    """3x3 SAME conv on an s2d-layout map with a pre-transformed kernel."""
    return lax.conv_general_dilated(
        xs, wt, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        precision=get_precision())


def _s2d_kernel_transform(w):
    """(O, I, 3, 3) -> (4O, 4I, 3, 3) phase-transformed kernel (see
    _conv3x3_s2d)."""
    A = jnp.asarray(_s2d_placement())
    o_c, i_c = w.shape[0], w.shape[1]
    wt = jnp.einsum("pqtd,PQTD,oidD->pPoqQitT", A, A, w)
    return wt.reshape(4 * o_c, 4 * i_c, 3, 3)


def _s2d_of(x):
    """NHWC -> s2d layout (phase-major channels)."""
    b, h, w, c = x.shape
    xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _d2s_of(y):
    """s2d layout -> NHWC."""
    b, h2, w2, c4 = y.shape
    c = c4 // 4
    ys = y.reshape(b, h2, w2, 2, 2, c)
    return ys.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h2, 2 * w2, c)


def _make_fast_up_dconv_s2d(in_c, out_c, kernel_size, demodulate,
                            blur_kernel, from_s2d=False):
    """Blur-folded subpixel upsampling dconv producing an s2d-layout fmap.
    Replaces dconv+blur in the fast pipeline (exact composite).
    from_s2d: the previous tail layer already emits s2d layout."""
    assert kernel_size == 3
    fan_in = in_c * kernel_size ** 2
    scale = 1.0 / math.sqrt(fan_in)
    bk = np.asarray(make_kernel(blur_kernel))

    def fn(params, d: DataBag) -> DataBag:
        w5 = params["weight"]
        wf = jnp.flip(w5[0], (-2, -1)) * scale
        kconv = _composite_up_kernel(wf, bk, out_c, in_c)
        x = d["fmap"]                               # NHWC (tail entry)
        if from_s2d:
            x = _d2s_of(x)
        ph = lax.conv_general_dilated(
            x, kconv, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "OIHW", "NHWC"),
            precision=get_precision())              # (B, h, w, 4O) s2d
        if demodulate:
            style = d["style"]
            w_sq = jnp.sum(jnp.square(w5[0] * scale), axis=(-2, -1))
            demod = lax.rsqrt(jnp.dot(jnp.square(style), w_sq.T,
                                      precision=get_precision()) + 1e-8)
            ph = ph * jnp.tile(demod, (1, 4))[:, None, None, :]
        return DataBag(d, fmap=ph)
    return fn


def _make_dconv_s2d(in_c, out_c):
    """Plain 3x3 dconv consuming and producing s2d-layout fmaps.
    Always demodulates (every styled 3x3 conv in the model does)."""
    scale = 1.0 / math.sqrt(in_c * 9)

    def fn(params, d: DataBag) -> DataBag:
        w5 = params["weight"]
        wt = _s2d_kernel_transform(w5[0] * scale)
        out = _conv3x3_s2d_pre(d["fmap"], wt)
        style = d["style"]
        w_sq = jnp.sum(jnp.square(w5[0] * scale), axis=(-2, -1))
        demod = lax.rsqrt(jnp.dot(jnp.square(style), w_sq.T,
                                  precision=get_precision()) + 1e-8)
        out = out * jnp.tile(demod, (1, 4))[:, None, None, :]
        return DataBag(d, fmap=out)
    return fn


def _apply_style_s2d(params, d: DataBag) -> DataBag:
    return DataBag(d, fmap=jnp.tile(d["style"], (1, 4))[:, None, None, :]
                   * d["fmap"])


def _apply_style_from_s2d(params, d: DataBag) -> DataBag:
    """adain for a layer that ends the fast s2d tail: bridge the incoming
    s2d-layout fmap back to NHWC, then apply style normally (the rest of
    the layer runs its seq stages)."""
    return DataBag(d, fmap=d["style"][:, None, None, :] * _d2s_of(d["fmap"]))


def _noise_inject_s2d(params, d: DataBag) -> DataBag:
    x = d["fmap"]                                   # (B, h2, w2, 4C)
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    noise = d.get(noise_key(2 * h2, 2 * w2))
    if noise is None:
        noise = jnp.asarray(_reference_noise(b, 2 * h2, 2 * w2))
    ns = _s2d_of(noise)                             # (B, h2, w2, 4)
    ns = jnp.repeat(ns, c, axis=-1)                 # phase-major broadcast
    return DataBag(d, fmap=x + params["weight"] * ns)


def _fused_lrelu_s2d(params, d: DataBag) -> DataBag:
    return DataBag(d, fmap=fused_leaky_relu(d["fmap"],
                                            jnp.tile(params["bias"], 4)))


def _make_to_rgb_s2d(in_c, style_dim, skip, blur_kernel):
    """to_rgb consuming an s2d-layout fmap; output stays NHWC."""
    mod_scale = 1.0 / math.sqrt(style_dim)
    conv_scale = 1.0 / math.sqrt(in_c)
    kern = np.asarray(make_kernel(blur_kernel))

    def fn(params, d: DataBag) -> DataBag:
        style = _equal_linear(params["modulation"], d["style"], mod_scale,
                              1.0, None)            # (B, in_c)
        w = params["weight"][0, :, :, 0, 0] * conv_scale     # (3, in_c)
        x = d["fmap"] * jnp.tile(style, (1, 4))[:, None, None, :]
        b, h2, w2, c4 = x.shape
        xp = x.reshape(b, h2, w2, 4, in_c)
        rgb = jnp.einsum("bhwpi,ri->bhwpr", xp, w,
                         precision=get_precision())  # (B,h2,w2,4,3)
        out = _d2s_of(rgb.reshape(b, h2, w2, 12)) + params["bias"]
        if skip:
            prev = d["output"]
            if prev.shape[1:3] != out.shape[1:3]:
                prev = upsample2d(prev, jnp.asarray(kern), factor=2)
            out = out + prev
        return DataBag(d, output=out)
    return fn


def _noise_inject(params, d: DataBag) -> DataBag:
    x = d["fmap"]
    b, h, w, _ = x.shape
    noise = d.get(noise_key(h, w))
    if noise is None:
        noise = jnp.asarray(_reference_noise(b, h, w))
    return DataBag(d, fmap=x + params["weight"] * noise)


def _fused_lrelu_stage(params, d: DataBag) -> DataBag:
    return DataBag(d, fmap=fused_leaky_relu(d["fmap"], params["bias"]))


def _make_upsample_output(blur_kernel):
    kern = np.asarray(make_kernel(blur_kernel))

    def fn(params, d: DataBag) -> DataBag:
        return DataBag(d, output=upsample2d(d["output"], jnp.asarray(kern),
                                            factor=2))
    return fn


def _make_to_rgb(in_c, style_dim, skip, blur_kernel):
    mod_scale = 1.0 / math.sqrt(style_dim)
    conv_scale = 1.0 / math.sqrt(in_c)  # 1x1 kernel, fan_in = in_c
    kern = np.asarray(make_kernel(blur_kernel))

    def fn(params, d: DataBag) -> DataBag:
        # Modulated 1x1 conv, no demodulation (models.py:628-655): equal to
        # scaling input channels by style then a plain 1x1 conv == matmul.
        style = _equal_linear(params["modulation"], d["style"], mod_scale,
                              1.0, None)                     # (B, in_c)
        w = params["weight"][0, :, :, 0, 0] * conv_scale     # (3, in_c)
        x = d["fmap"] * style[:, None, None, :]
        out = jnp.dot(x, w.T, precision=get_precision()) + params["bias"]
        if skip:
            prev = d["output"]
            if prev.shape[1:3] != out.shape[1:3]:
                prev = upsample2d(prev, jnp.asarray(kern), factor=2)
            out = out + prev
        return DataBag(d, output=out)
    return fn


def _return_output(params, d: DataBag):
    return DataBag(d, output=d["output"])


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

class SeqStyleGAN2:
    """Functional sequential StyleGAN2 (reference: SeqStyleGAN2,
    utils/stylegan2/models.py:31-141). Stage names mirror the reference."""

    # fast s2d tail gates (measured on v5e, docs/PERF_NOTES.md): layers
    # with out_c <= s2d_tail_max_c at res >= s2d_tail_min_res run the
    # blur-folded s2d formulation in pipeline_fast
    s2d_tail_max_c = 32
    s2d_tail_min_res = 512

    def __init__(self, size, style_dim=512, n_mlp=8, channel_multiplier=2,
                 blur_kernel=(1, 3, 3, 1), lr_mlp=0.01, truncation=1.0,
                 mconv="seq", s2d_tail_max_c=None):
        assert mconv in (None, "seq", "fast"), mconv
        if s2d_tail_max_c is not None:
            self.s2d_tail_max_c = s2d_tail_max_c
        self.size = size
        self.style_dim = style_dim
        self.z_dim = style_dim
        self.n_mlp = n_mlp
        self.lr_mlp = lr_mlp
        self.truncation = truncation
        self.blur_kernel = list(blur_kernel)
        self.channels = CHANNELS(channel_multiplier)
        self.log_size = int(math.log2(size))
        self.num_layers = (self.log_size - 2) * 2 + 1
        self.n_latent = self.log_size * 2 - 2

        stages: List[Stage] = [Stage("bag_in", _bag_in)]
        # specs used by init_params: name -> (kind, shapes...)
        self._param_specs: Dict[str, tuple] = {}
        # alternate sampling pipeline: subpixel-decomposed upsampling
        # dconvs (same params, same names). NOTE: measured SLOWER than the
        # sequential pipeline on v5e (docs/PERF_NOTES.md) — kept as the
        # exact-math experimental alternate, not the production path.
        self._fused_overrides: Dict[str, object] = {}
        # production sampling pipeline: narrow-channel high-res tail runs
        # blur-folded in s2d layout (see "Fast s2d tail" above); empty for
        # models with no <=32-channel layers (256-model at cm=2)
        self._fast_overrides: Dict[str, object] = {}
        self._s2d_tail = False

        # style MLP (models.py:59-65)
        stages.append(Stage("style.0", _pixel_norm_latent))
        for i in range(n_mlp):
            stages.append(Stage(f"style.{i + 1}",
                                _make_style_linear(style_dim, lr_mlp)))
            self._param_specs[f"style.{i + 1}"] = ("linear", style_dim,
                                                   style_dim, lr_mlp, 0.0)

        stages.append(Stage("latents",
                            _make_adjust_latent(self.n_latent, truncation)))
        self._param_specs["latents"] = ("latent_avg",)
        stages.append(Stage("noises", _noises_stage))
        self._param_specs["noises"] = ("noises", self.num_layers)
        stages.append(Stage("input", _constant_input))
        self._param_specs["input"] = ("const", self.channels[4])

        def styled_conv(prefix, in_c, out_c, lat_idx, upsample, res=None):
            """layerN.{conv|sconv}: lat pick + mconv(seq) + noise + activate
            (models.py:232-289). `res` = this conv's output resolution."""
            sub = []
            sub.append(Stage(f"{prefix}.mconv.modulation",
                             _make_modulation(style_dim)))
            self._param_specs[f"{prefix}.mconv.modulation"] = (
                "linear", style_dim, in_c, 1.0, 1.0)
            sub.append(Stage(f"{prefix}.mconv.adain", _apply_style))
            sub.append(Stage(f"{prefix}.mconv.dconv",
                             _make_dconv(in_c, out_c, 3, True, upsample)))
            self._param_specs[f"{prefix}.mconv.dconv"] = (
                "dconv", in_c, out_c, 3, upsample)
            if upsample:
                factor, k = 2, 3
                p = (len(self.blur_kernel) - factor) - (k - 1)
                pad0 = (p + 1) // 2 + factor - 1
                pad1 = p // 2 + 1
                sub.append(Stage(f"{prefix}.mconv.blur",
                                 _make_blur(self.blur_kernel, (pad0, pad1),
                                            factor)))
                self._fused_overrides[f"{prefix}.mconv.dconv"] = \
                    _make_subpixel_up_dconv(in_c, out_c, 3, True)
            sub.append(Stage(f"{prefix}.noise", _noise_inject))
            self._param_specs[f"{prefix}.noise"] = ("noise_w",)
            sub.append(Stage(f"{prefix}.activate", _fused_lrelu_stage))
            self._param_specs[f"{prefix}.activate"] = ("act_bias", out_c)
            # fast s2d tail (production sampling): measured win on v5e for
            # <=32-channel layers at >=512 resolution (docs/PERF_NOTES.md)
            if (upsample and out_c <= self.s2d_tail_max_c
                    and (res or 0) >= self.s2d_tail_min_res
                    and len(self.blur_kernel) == 4):
                # (the blur-folded composite kernel is, like the fused
                # Pallas kernel below, specialized to 4-tap FIRs)
                if self._s2d_tail:  # previous tail layer emits s2d
                    self._fast_overrides[f"{prefix}.mconv.adain"] = \
                        _apply_style_s2d
                self._fast_overrides[f"{prefix}.mconv.dconv"] = \
                    _make_fast_up_dconv_s2d(in_c, out_c, 3, True,
                                            self.blur_kernel,
                                            from_s2d=self._s2d_tail)
                self._fast_overrides[f"{prefix}.mconv.blur"] = \
                    lambda params, d: d
                self._fast_overrides[f"{prefix}.noise"] = _noise_inject_s2d
                self._fast_overrides[f"{prefix}.activate"] = _fused_lrelu_s2d
                self._s2d_tail = True
            elif (upsample and not self._s2d_tail
                    and len(self.blur_kernel) == 4):
                # wide upsampling layer: fused Pallas up-conv+blur(+
                # epilogue) when enabled (ops/pallas_upconv.
                # set_fused_upconv), else these overrides reduce to the
                # seq stages at trace time.  The kernel's phase-space blur
                # is specialized to 4-tap FIRs (the len==4 gate keeps ALL
                # four stage overrides consistently absent otherwise —
                # pipeline_fast then runs the exact seq stages here).
                self._fast_overrides[f"{prefix}.mconv.dconv"] = \
                    _make_fused_upconv_dconv(prefix, in_c, out_c,
                                             self.blur_kernel, res=res)
                self._fast_overrides[f"{prefix}.mconv.blur"] = \
                    _make_shape_dispatch_blur(self.blur_kernel,
                                              (pad0, pad1), factor)
                self._fast_overrides[f"{prefix}.noise"] = \
                    _make_epilogue_skip(_noise_inject, in_c, out_c, res)
                self._fast_overrides[f"{prefix}.activate"] = \
                    _make_epilogue_skip(_fused_lrelu_stage, in_c, out_c,
                                        res)
            elif (not upsample and self._s2d_tail
                    and in_c <= self.s2d_tail_max_c
                    and out_c <= self.s2d_tail_max_c):
                self._fast_overrides[f"{prefix}.mconv.adain"] = \
                    _apply_style_s2d
                self._fast_overrides[f"{prefix}.mconv.dconv"] = \
                    _make_dconv_s2d(in_c, out_c)
                self._fast_overrides[f"{prefix}.noise"] = _noise_inject_s2d
                self._fast_overrides[f"{prefix}.activate"] = _fused_lrelu_s2d
            elif self._s2d_tail:
                # A non-qualifying (wide or otherwise unusual) layer after
                # the tail engaged: degrade gracefully — end the tail with
                # a d2s bridge at this layer's adain and fall back to the
                # seq stages, so construction always succeeds and
                # pipeline_fast stays e2e-exact for any valid config.
                self._fast_overrides[f"{prefix}.mconv.adain"] = \
                    _apply_style_from_s2d
                self._s2d_tail = False
            return sub

        def to_rgb(name, in_c, lat_idx, skip):
            sub = [Stage(f"{name}.lat{lat_idx}", _make_pick_latent(lat_idx)),
                   Stage(f"{name}.rgb",
                         _make_to_rgb(in_c, style_dim, skip,
                                      self.blur_kernel))]
            if self._s2d_tail:
                self._fast_overrides[f"{name}.rgb"] = _make_to_rgb_s2d(
                    in_c, style_dim, skip, self.blur_kernel)
            self._param_specs[f"{name}.rgb"] = ("to_rgb", in_c)
            return sub

        # layer2 + to_rgb1 (models.py:101-110) — note layer2 uses 'conv',
        # layers >= 3 use 'sconv', matching reference naming exactly.
        c4 = self.channels[4]
        stages.append(Stage("layer2.lat0", _make_pick_latent(0)))
        stages.extend(styled_conv("layer2.conv", c4, c4, 0, upsample=False))
        stages.extend(to_rgb("to_rgb1", c4, 1, skip=False))

        in_c = c4
        lat_i = 1
        for i in range(3, self.log_size + 1):
            out_c = self.channels[2 ** i]
            stages.append(Stage(f"up_rgb{i - 2}",
                                _make_upsample_output(self.blur_kernel)))
            stages.append(Stage(f"layer{lat_i + 2}.lat{lat_i}",
                                _make_pick_latent(lat_i)))
            stages.extend(styled_conv(f"layer{lat_i + 2}.sconv", in_c, out_c,
                                      lat_i, upsample=True, res=2 ** i))
            stages.append(Stage(f"layer{lat_i + 3}.lat{lat_i + 1}",
                                _make_pick_latent(lat_i + 1)))
            stages.extend(styled_conv(f"layer{lat_i + 3}.sconv", out_c, out_c,
                                      lat_i + 1, upsample=False,
                                      res=2 ** i))
            stages.extend(to_rgb(f"to_rgb{i - 1}", out_c, lat_i + 2,
                                 skip=True))
            in_c = out_c
            lat_i += 2

        stages.append(Stage("output", _return_output))
        self.pipeline = StagePipeline(stages)
        # alternate sampling pipeline: identical math with the upsampling
        # dconvs subpixel-decomposed; reads the SAME params, so edits
        # apply to both pipelines (slower on v5e — docs/PERF_NOTES.md)
        self.pipeline_fused = StagePipeline([
            Stage(s.name, self._fused_overrides.get(s.name, s.fn))
            for s in stages])
        # production sampling pipeline: seq stages + the fast s2d tail
        # (identical to pipeline when no layer qualifies). E2E-exact; per-
        # stage boundary values differ in the tail, so instrumentation and
        # editing always run on `pipeline` (the seq split).
        self.pipeline_fast = StagePipeline([
            Stage(s.name, self._fast_overrides.get(s.name, s.fn))
            for s in stages])

    # -- noise inputs -------------------------------------------------------
    def prepare_noise(self, batch: int) -> Dict[str, jnp.ndarray]:
        """Per-resolution deterministic noise inputs for a full forward."""
        out = {}
        for i in range(2, self.log_size + 1):
            r = 2 ** i
            out[noise_key(r, r)] = jnp.asarray(_reference_noise(batch, r, r))
        return out

    # -- parameters ---------------------------------------------------------
    def init_params(self, key) -> Dict[str, dict]:
        """Random init matching reference distributions (EqualLinear weight
        ~ N(0, 1/lr_mul), bias = bias_init; dconv/const ~ N(0,1); noise
        weight 0; activate/to_rgb bias 0; latent_avg scalar 0 — truncation
        stays off until a real latent_avg is loaded, models.py:570-583)."""
        params: Dict[str, dict] = {}
        for name, spec in self._param_specs.items():
            kind = spec[0]
            key, k1 = jax.random.split(key)
            if kind == "linear":
                _, in_d, out_d, lr_mul, bias_init = spec
                params[name] = {
                    "weight": jax.random.normal(k1, (out_d, in_d),
                                                jnp.float32) / lr_mul,
                    "bias": jnp.full((out_d,), float(bias_init), jnp.float32)}
            elif kind == "latent_avg":
                params[name] = {"latent_avg": jnp.float32(0.0)}
            elif kind == "noises":
                bufs = {}
                rng = np.random.RandomState(1)  # FixedNoiseBuffers seed 1
                for li in range(spec[1]):
                    res = (li + 5) // 2
                    nz = rng.randn(1, 1, 2 ** res, 2 ** res).astype(np.float32)
                    bufs[f"noise_{li}"] = jnp.asarray(
                        nz.transpose(0, 2, 3, 1))
                params[name] = bufs
            elif kind == "const":
                params[name] = {"input": jax.random.normal(
                    k1, (1, 4, 4, spec[1]), jnp.float32)}
            elif kind == "dconv":
                _, in_c, out_c, k = spec[:4]
                params[name] = {"weight": jax.random.normal(
                    k1, (1, out_c, in_c, k, k), jnp.float32)}
            elif kind == "noise_w":
                params[name] = {"weight": jnp.zeros((1,), jnp.float32)}
            elif kind == "act_bias":
                params[name] = {"bias": jnp.zeros((spec[1],), jnp.float32)}
            elif kind == "to_rgb":
                in_c = spec[1]
                key, k2 = jax.random.split(key)
                params[name] = {
                    "modulation": {
                        "weight": jax.random.normal(k1, (in_c, self.style_dim),
                                                    jnp.float32),
                        "bias": jnp.ones((in_c,), jnp.float32)},
                    "weight": jax.random.normal(k2, (1, 3, in_c, 1, 1),
                                                jnp.float32),
                    "bias": jnp.zeros((3,), jnp.float32)}
            else:  # pragma: no cover
                raise ValueError(kind)
        return params

    # -- application --------------------------------------------------------
    def make_bag(self, z, noise: Optional[dict] = None) -> DataBag:
        """Input bag: latent + deterministic per-resolution noise inputs."""
        bag = DataBag(latent=jnp.asarray(z))
        bag.update(noise if noise is not None
                   else self.prepare_noise(bag["latent"].shape[0]))
        return bag

    def __call__(self, params, z, noise: Optional[dict] = None,
                 fused: bool = False, fast: bool = True):
        """z (B, style_dim) -> NHWC image. Deterministic reference noise is
        passed as runtime inputs unless explicitly provided.

        fast=True (default) runs the production sampling pipeline — the
        seq stages with the narrow-channel tail blur-folded in s2d layout
        (e2e-exact; == seq stages when no layer qualifies). Mirrors the
        reference, whose fast grouped-conv mconv is the default sampling
        configuration (models.py:354-425). fused=True selects the
        subpixel-decomposed alternate pipeline (identical math; measured
        slower on v5e — docs/PERF_NOTES.md)."""
        pipe = (self.pipeline_fused if fused
                else self.pipeline_fast if fast else self.pipeline)
        return pipe(params, self.make_bag(z, noise))["output"]

    def apply_bag(self, params, bag: DataBag) -> DataBag:
        return self.pipeline(params, bag)


# ---------------------------------------------------------------------------
# Checkpoint conversion
# ---------------------------------------------------------------------------

def _seq_names_from_rosinality(sd: dict, latent_avg=None) -> dict:
    """Regex rename of rosinality checkpoint keys to sequential names
    (reference: models.py:149-202)."""
    if len(sd) < 10 and "g_ema" in sd:
        latent_avg = sd.get("latent_avg", latent_avg)
        sd = sd["g_ema"]
    new = {}
    for k, v in sd.items():
        k = re.sub(r"^conv1\.conv\.", "layer2.conv.mconv.", k)
        k = re.sub(r"^conv1\.", "layer2.conv.", k)
        k = re.sub(r"^convs\.(\d+)\.conv",
                   lambda m: f"layer{int(m.group(1)) + 3}.sconv.mconv", k)
        k = re.sub(r"^convs\.(\d+)\.",
                   lambda m: f"layer{int(m.group(1)) + 3}.sconv.", k)
        k = re.sub(r"^to_rgb1\.(conv\.|bias$)",
                   lambda m: f"to_rgb1.rgb.{m.group(1)}", k)
        k = re.sub(r"^to_rgbs\.(\d+)\.upsample\.",
                   lambda m: f"up_rgb{int(m.group(1)) + 1}.", k)
        k = re.sub(r"^to_rgbs\.(\d+)\.",
                   lambda m: f"to_rgb{int(m.group(1)) + 2}.rgb.", k)
        k = re.sub(r"mconv\.weight$", "mconv.dconv.weight", k)
        new[k] = v
    if latent_avg is not None:
        new["latents.latent_avg"] = latent_avg
    return new


def params_from_state_dict(model: SeqStyleGAN2, sd: dict,
                           latent_avg=None) -> Dict[str, dict]:
    """Convert a sequential-format (or rosinality-format) torch state dict
    into our params pytree. Values may be numpy arrays or torch tensors."""
    def as_np(v):
        return np.asarray(getattr(v, "numpy", lambda: v)(), dtype=np.float32)

    sd = {k: v for k, v in sd.items()}
    if not any(k.startswith(("layer2.", "style.")) for k in sd):
        sd = _seq_names_from_rosinality(sd, latent_avg)
    elif latent_avg is not None:
        sd["latents.latent_avg"] = latent_avg

    params = model.init_params(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    expected_shapes = jax.tree_util.tree_map(lambda x: str(np.shape(x)),
                                             params)
    # snapshot leaf identities: anything still identical after the loop
    # was never assigned from the checkpoint
    init_leaves = jax.tree_util.tree_map(lambda x: x, params)
    for k, v in sd.items():
        v = as_np(v)
        if re.match(r"^style\.\d+\.(weight|bias)$", k):
            stage, pname = k.rsplit(".", 1)
            params[stage][pname] = v
        elif k == "latents.latent_avg":
            params["latents"]["latent_avg"] = v
        elif re.match(r"^noises\.noise_\d+$", k):
            params["noises"][k.split(".")[1]] = v.transpose(0, 2, 3, 1)
        elif k == "input.input":
            params["input"]["input"] = v.transpose(0, 2, 3, 1)
        elif k.endswith(".mconv.modulation.weight"):
            params[k[:-len(".weight")]]["weight"] = v
        elif k.endswith(".mconv.modulation.bias"):
            params[k[:-len(".bias")]]["bias"] = v
        elif k.endswith(".mconv.dconv.weight"):
            params[k[:-len(".weight")]]["weight"] = v  # (1,O,I,kh,kw)
        elif k.endswith(".mconv.weight"):
            # fast-mconv naming; same tensor as the seq dconv weight
            # (reference models.py:185-189)
            params[k[:-len(".weight")] + ".dconv"]["weight"] = v
        elif k.endswith(".noise.weight"):
            params[k[:-len(".weight")]]["weight"] = v.reshape(1)
        elif k.endswith(".activate.bias"):
            params[k[:-len(".bias")]]["bias"] = v
        elif re.match(r"^to_rgb\d+\.rgb\.conv\.modulation\.(weight|bias)$", k):
            stage = k.split(".conv.modulation.")[0]
            params[stage]["modulation"][k.rsplit(".", 1)[1]] = v
        elif re.match(r"^to_rgb\d+\.rgb\.conv\.weight$", k):
            params[k[:-len(".conv.weight")]]["weight"] = v  # (1,3,C,1,1)
        elif re.match(r"^to_rgb\d+\.rgb\.bias$", k):
            params[k[:-len(".bias")]]["bias"] = v.reshape(3)
        elif re.match(r"^up_rgb\d+\.kernel$", k):
            pass  # fixed FIR kernel buffer, recomputed from blur_kernel
        elif k.endswith(".mconv.blur.kernel"):
            pass
        else:
            raise ValueError(f"unrecognized StyleGAN2 param {k!r}")
    # shape validation: a checkpoint for a different architecture must not
    # be silently half-loaded (latent_avg legitimately grows from the
    # scalar placeholder to a (style_dim,) vector)
    got_shapes = jax.tree_util.tree_map(lambda x: str(np.shape(x)), params)
    for (path, want), (_, got) in zip(
            jax.tree_util.tree_leaves_with_path(expected_shapes),
            jax.tree_util.tree_leaves_with_path(got_shapes)):
        name = jax.tree_util.keystr(path)
        if "latent_avg" in name:
            continue
        if want != got:
            raise ValueError(f"checkpoint param {name} has shape {got}, "
                             f"model expects {want}")
    # coverage validation: every learned param must have been assigned
    # from the checkpoint (the reference load is strict; noise buffers
    # and latent_avg are legitimately optional, models.py:195-201)
    missing = [jax.tree_util.keystr(path)
               for (path, leaf), (_, orig) in zip(
                   jax.tree_util.tree_leaves_with_path(params),
                   jax.tree_util.tree_leaves_with_path(init_leaves))
               if leaf is orig
               and "latent_avg" not in jax.tree_util.keystr(path)
               and "noise_" not in jax.tree_util.keystr(path)]
    if missing:
        raise ValueError(
            f"checkpoint is missing {len(missing)} learned params "
            f"(e.g. {missing[:4]}); refusing a silent partial load")
    return jax.tree_util.tree_map(jnp.asarray, params)


# ---------------------------------------------------------------------------
# Per-layer mixed precision
# ---------------------------------------------------------------------------

def stage_resolution(name: str) -> Optional[int]:
    """Output resolution of a SeqStyleGAN2 stage, inferred from its
    reference-mirroring name (layerN / up_rgbN / to_rgbN); None for
    resolution-free stages (style MLP, latents, noises, input, output)."""
    m = re.match(r"layer(\d+)\.", name)
    if m:
        n = int(m.group(1))
        return 4 if n == 2 else 2 ** ((n - 3) // 2 + 3)
    m = re.match(r"up_rgb(\d+)$", name)
    if m:
        return 2 ** (int(m.group(1)) + 2)
    m = re.match(r"to_rgb(\d+)\.", name)
    if m:
        n = int(m.group(1))
        return 4 if n == 1 else 2 ** (n + 1)
    return None


def mixed_precision_schedule(min_res: int = 128, tier: str = "default",
                             keep_rgb: bool = True,
                             pin: Tuple[str, ...] = ()):
    """The measured per-layer mixed-precision policy (VERDICT round-3
    item 2; sweep in docs/PERF_NOTES.md round 4): stages whose output
    resolution is >= min_res run their matmuls/convs at `tier` (bf16 MXU
    passes), everything below — the style MLP and the early low-res
    layers, whose errors are amplified through every subsequent upsample —
    keeps the global policy (fp32 at "high"/"highest").

    Install with::

        from rewriting_tpu.ops import precision
        precision.set_precision("high")
        precision.set_precision_schedule(mixed_precision_schedule())

    before the first jit trace.  The FLOPs live in the high-res tail, so
    this buys most of the all-bf16 throughput while keeping the
    quality-controlling trunk exact; the reference has no equivalent knob
    (it is implicitly fp32 everywhere, setup/renv.yml:6-9).

    The defaults are the measured optimum on v5e at 256 scale
    (docs/PERF_NOTES.md round-4 sweep): min_res=128 + keep_rgb=True gives
    908 img/s/chip at batch 128 — 1.62x the all-fp32 "high" mode — at
    50.4 dB PSNR vs "highest" and random-feature FID delta 0.0.

    keep_rgb=True additionally pins the output skip chain (up_rgb/to_rgb
    stages) at the global precision regardless of resolution — those
    1x1 convs write straight into the accumulated RGB output, so their
    rounding hits the image un-attenuated, while they carry a tiny share
    of the FLOPs (measured +PSNR at ~equal rate, docs/PERF_NOTES.md
    round 4).

    Scope: the schedule applies to SAMPLING — direct pipeline calls.  The
    rewriting engine's numerics (key/goal extraction, second-moment stats,
    every solver, and rewriter-side renders) pin the global parity tier
    even while a schedule is installed (ops/precision.schedule_suspended),
    so installing one never changes an edit."""
    def schedule(stage_name: str) -> Optional[str]:
        if keep_rgb and re.match(r"(up_rgb|to_rgb)\d+", stage_name):
            return None
        if any(stage_name == p or stage_name.startswith(p + ".")
               for p in pin):
            return None
        r = stage_resolution(stage_name)
        if r is not None and r >= min_res:
            return tier
        return None
    return schedule


# measured per-scale optimum for the >=50 dB PSNR contract (v5e sweeps,
# docs/PERF_NOTES.md rounds 4-5): key = model size,
# value = (min_res, pinned stages)
_RECOMMENDED = {256: (128, ()), 512: (256, ("layer13",)),
                1024: (512, ("layer15",))}


def recommended_precision_schedule(model) -> Callable[[str], Optional[str]]:
    """The measured per-scale mixed-precision optimum for a SeqStyleGAN2
    instance — the scale-aware default the round-4 sweeps called for: one
    min_res does NOT fit all scales (docs/PERF_NOTES.md round-4 §512/§1024
    tables).  Chooses the largest measured-optimal transition that holds
    the >=50 dB PSNR + Frechet-delta-0 quality gate for ``model.size``:

    ======  =================  ======================================
    size    schedule           measured (v5e, global "high")
    ======  =================  ======================================
    256     min_res=128        908 img/s/chip, 1.62x high, 50.4 dB
    512     256 + pin layer13  352.9 img/s/chip, 1.47x high, 50.4 dB
    1024    512 + pin layer15  108.9 img/s/chip, 1.21x high, 51.5 dB
    ======  =================  ======================================

    The 512/1024 entries are the round-5 fine-grained discovery
    (scripts/bench_mixed_fine.py): the per-resolution knob moves both
    styled convs of a resolution at once and overshoots the gate, but
    pinning just the UP-conv of the second-highest resolution fp32
    (layer13 at 512-scale, layer15 at 1024-scale) recovers the >=50 dB
    gate at little-to-no throughput cost — +7.5% / +8.6% over the
    conservative min_res=model-size rows.  The up-conv is the
    quality-dominant half of the pair (its output feeds both the next
    conv and the rgb skip) and its dilated formulation is the less
    MXU-efficient one, so keeping it fp32 is nearly free.

    Unlisted sizes fall back to min_res=model size (the conservative
    per-scale contract).  Install with
    ``ops.precision.set_precision_schedule`` before the first trace; the
    global tier stays the user's parity mode ("high"/"highest")."""
    size = int(getattr(model, "size", 0)) or 1024
    min_res, pin = _RECOMMENDED.get(size, (size, ()))
    return mixed_precision_schedule(min_res, pin=pin)
