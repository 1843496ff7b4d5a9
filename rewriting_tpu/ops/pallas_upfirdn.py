"""Pallas TPU kernels for the StyleGAN2 FIR ops: blur (up=1) and 2x FIR
upsample — the framework's replacement for the reference's upfirdn2d CUDA
kernel (utils/stylegan2/op/upfirdn2d_kernel.cu) on its hot feature-map
path.

Why a kernel: XLA expresses these as depthwise convolutions, which map
poorly onto the TPU conv path; measured on v5e they cost several ms per
layer.  These kernels stream halo'd row-tiles of the pre-padded input
HBM->VMEM with explicit async DMA (overlapping tiles are not expressible
with BlockSpecs), apply the k x k stencil as VPU FMAs over in-VMEM shifted
slices, and write each output element exactly once.  The 2x upsample is
computed polyphase — each output phase reads the *undilated* input, so no
zero-inserted intermediate ever exists.

Layout: NHWC with C as the lane dimension — intended for feature maps
(C >= 64); the 3-channel RGB path stays on the XLA formulation.

STATUS: math validated exactly against the XLA formulation in Pallas
interpret mode (tests/test_pallas.py).  On this image's experimental
'axon' TPU runtime the compiled kernel faults the remote TPU worker;
round-2 isolation (docs/PERF_NOTES.md "Compiled Pallas on this runtime")
pinned the trigger to manual HBM->VMEM async DMA itself — a DMA-only
kernel with no stencil also faults, while pure-BlockSpec kernels run —
so no halo-tiled kernel can work there.  The model paths enable these
kernels only where the real-kernel probe (pallas_probe.py) has passed.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _choose_tile(h: int, target: int = 16) -> int:
    for th in range(min(target, h), 0, -1):
        if h % th == 0:
            return th
    return h


# ---------------------------------------------------------------------------
# blur: valid correlation of a pre-padded input with a k x k kernel
# ---------------------------------------------------------------------------

def _blur_body(x_hbm, out_ref, scratch, sem, *, kflip, th, hp):
    b = pl.program_id(0)
    t = pl.program_id(1)
    kh, kw = kflip.shape
    rows = scratch.shape[0]
    # x_hbm is (N*Hp, Wp, C): one flat row axis -> single-level dynamic
    # slice for the DMA
    copy = pltpu.make_async_copy(
        x_hbm.at[pl.ds(b * hp + t * th, rows)], scratch, sem)
    copy.start()
    copy.wait()
    wo = out_ref.shape[2]
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for i in range(kh):
        for j in range(kw):
            acc += kflip[i, j] * scratch[i:i + th, j:j + wo, :].astype(
                jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def blur2d_pallas(x, kernel, pad: Tuple[int, int] = (1, 1)):
    """upfirdn2d(x, k, up=1, down=1, pad) for NHWC feature maps.
    `kernel` must be a concrete (host numpy) array — taps become
    compile-time constants."""
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    kflip = np.flip(np.asarray(kernel, np.float32), (0, 1))
    p0, p1 = pad
    xp = jnp.pad(x, ((0, 0), (p0, p1), (p0, p1), (0, 0)))
    ho = h + p0 + p1 - kh + 1
    wo = w + p0 + p1 - kw + 1
    th = _choose_tile(ho)
    hp = xp.shape[1]
    xp_flat = xp.reshape(n * hp, xp.shape[2], c)
    return pl.pallas_call(
        functools.partial(_blur_body, kflip=kflip, th=th, hp=hp),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, c), x.dtype),
        grid=(n, ho // th),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, th, wo, c), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((th + kh - 1, xp.shape[2], c), x.dtype),
                        pltpu.SemaphoreType.DMA],
    )(xp_flat)


# ---------------------------------------------------------------------------
# 2x FIR upsample, polyphase
# ---------------------------------------------------------------------------

def _phase_taps(kernel: np.ndarray, p0: int):
    """Decompose zero-insert+pad+correlate into per-output-phase taps over
    the undilated input: output row t = 2y + a gets kflip[i] * x[y + (a +
    i - p0)//2] for each i with (a + i - p0) even.  Returns
    ({(a, b): [((dy, dx), coef)]}, halo, tail) with dy/dx shifted
    non-negative for a halo-padded tile."""
    kflip = np.flip(np.asarray(kernel, np.float32), (0, 1))
    kh, kw = kflip.shape
    offsets = {}
    for a in (0, 1):
        offsets[a] = [(i, (a + i - p0) // 2) for i in range(kh)
                      if (a + i - p0) % 2 == 0]
    min_d = min(d for offs in offsets.values() for _, d in offs)
    max_d = max(d for offs in offsets.values() for _, d in offs)
    halo = -min_d
    taps = {}
    for a in (0, 1):
        for b in (0, 1):
            taps[(a, b)] = [((dy + halo, dx + halo),
                             float(kflip[i, j]))
                            for i, dy in offsets[a]
                            for j, dx in offsets[b]]
    return taps, halo, max_d


def _up2_body(x_hbm, out_ref, scratch, sem, *, taps, th, w_in, hp):
    b = pl.program_id(0)
    t = pl.program_id(1)
    rows = scratch.shape[0]
    copy = pltpu.make_async_copy(
        x_hbm.at[pl.ds(b * hp + t * th, rows)], scratch, sem)
    copy.start()
    copy.wait()
    c = out_ref.shape[3]
    phases = []
    for a in (0, 1):
        cols = []
        for bb in (0, 1):
            acc = jnp.zeros((th, w_in, c), jnp.float32)
            for (dy, dx), coef in taps[(a, bb)]:
                acc += coef * scratch[dy:dy + th, dx:dx + w_in, :].astype(
                    jnp.float32)
            cols.append(acc)
        interleaved = jnp.stack(cols, axis=2).reshape(th, 2 * w_in, c)
        phases.append(interleaved)
    out = jnp.stack(phases, axis=1).reshape(2 * th, 2 * w_in, c)
    out_ref[0] = out.astype(out_ref.dtype)


def upsample2x_pallas(x, kernel, pad: Tuple[int, int]):
    """upfirdn2d(x, k, up=2, down=1, pad) for configs whose output is
    exactly 2x (all StyleGAN2 upsample/blur configs)."""
    n, h, w, c = x.shape
    kh = kernel.shape[0]
    ho = h * 2 + pad[0] + pad[1] - kh + 1
    assert ho == 2 * h, (ho, 2 * h, "non-2x output needs the XLA path")
    taps, halo, max_d = _phase_taps(np.asarray(kernel), pad[0])
    xp = jnp.pad(x, ((0, 0), (halo, max_d), (halo, max_d), (0, 0)))
    th = _choose_tile(h)
    hp, wp = xp.shape[1], xp.shape[2]
    xp_flat = xp.reshape(n * hp, wp, c)
    return pl.pallas_call(
        functools.partial(_up2_body, taps=taps, th=th, w_in=w, hp=hp),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c), x.dtype),
        grid=(n, h // th),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 2 * th, 2 * w, c),
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((th + halo + max_d, wp, c), x.dtype),
                        pltpu.SemaphoreType.DMA],
    )(xp_flat)


# ---------------------------------------------------------------------------
# BlockSpec-only blur: the halo trick without manual DMA
# ---------------------------------------------------------------------------
#
# The kernels above stream halo'd row-tiles with explicit HBM->VMEM
# async copies — the one construct that faults this image's axon worker.
# But a halo IS expressible with pure BlockSpecs: pass the SAME padded
# input twice at two block granularities — a (th, Wp, C) main block at
# row t*th, plus a (hb, Wp, C) halo block whose index map selects rows
# [(t+1)*th, (t+1)*th + hb) (valid whenever hb divides (t+1)*th, i.e.
# th % hb == 0). The automatic pipelining does all data movement.
# Extra read traffic = hb/th of the input (hb = 4 rows for the 4x4 FIR).

def _blur_bs_body(main, halo, out_ref, *, kflip, th):
    kh, kw = kflip.shape
    rows = jnp.concatenate([main[0], halo[0, :kh - 1]], axis=0)
    wo = out_ref.shape[2]
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for i in range(kh):
        for j in range(kw):
            acc += kflip[i, j] * rows[i:i + th, j:j + wo, :].astype(
                jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def blur2d_pallas_bs(x, kernel, pad: Tuple[int, int] = (1, 1),
                     interpret: bool = False):
    """upfirdn2d(x, k, up=1, down=1, pad) via BlockSpec-only pipelining.
    `kernel` must be concrete (host numpy). Channels are gridded in
    lane-sized blocks (depthwise ⇒ independent) to bound the Mosaic
    scoped-VMEM stack."""
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    kflip = np.flip(np.asarray(kernel, np.float32), (0, 1))
    p0, p1 = pad
    ho = h + p0 + p1 - kh + 1
    wo = w + p0 + p1 - kw + 1
    assert ho >= kh - 1, (ho, kh, "output too small for the halo scheme")
    hb = max(kh - 1, 1)
    # th must be a multiple of hb that divides ho (so every halo offset
    # (t+1)*th is a block multiple). Fallback for ho with no such tile
    # (e.g. prime): a single full tile, with hb the smallest divisor of
    # ho >= kh-1 so the one halo offset (= ho) stays block-aligned.
    th = next((t for t in range(min(16, ho), 0, -1)
               if ho % t == 0 and t % hb == 0), None)
    if th is None:
        th = ho
        hb = next(b for b in range(max(kh - 1, 1), ho + 1) if ho % b == 0)
    cb = c if c <= 128 else 128
    while c % cb:
        cb //= 2
    # pad rows so the last halo block [(T)*th, T*th + hb) is in bounds
    extra = ho + hb - (h + p0 + p1)
    xp = jnp.pad(x, ((0, 0), (p0, p1 + max(extra, 0)), (p0, p1), (0, 0)))
    wp = xp.shape[2]
    return pl.pallas_call(
        functools.partial(_blur_bs_body, kflip=kflip, th=th),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, c), x.dtype),
        grid=(n, ho // th, c // cb),
        in_specs=[
            pl.BlockSpec((1, th, wp, cb), lambda b, t, k: (b, t, 0, k)),
            pl.BlockSpec((1, hb, wp, cb),
                         lambda b, t, k, th=th, hb=hb:
                         (b, ((t + 1) * th) // hb, 0, k)),
        ],
        out_specs=pl.BlockSpec((1, th, wo, cb),
                               lambda b, t, k: (b, t, 0, k)),
        interpret=interpret,
    )(xp, xp)
