"""Microbench: up-conv formulations for the StyleGAN2 upsampling path.

A: lhs_dilated 3x3 conv + separate depthwise FIR blur   (current seq)
B: lhs_dilated 6x6 blur-folded conv                     (current fused)
C: subpixel: one 3x3 conv with 4*O phase channels at input res, then
   depth-to-space interleave                            (candidate)

All three compute the same function (up-conv + blur). Prints timing and
max-abs deviation of B/C vs A."""

import json
import time

import jax
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
import jax.numpy as jnp
import numpy as np
from jax import lax

from rewriting_tpu.ops import make_kernel, blur2d
from rewriting_tpu.ops.precision import set_precision, get_precision

set_precision("high")

BLUR = np.asarray(make_kernel([1, 3, 3, 1]))  # 4x4, sums to 1
K = 3
# blur pad for factor=2, k=3 (models.py styled_conv): pad0=1, pad1=1
BLUR_PAD = (1, 1)


def variant_a(x, w):  # w: (O, I, 3, 3) pre-flipped conv kernel
    out = lax.conv_general_dilated(
        x, w, (1, 1), ((K - 1, K - 1),) * 2, lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        precision=get_precision())
    return blur2d(out, jnp.asarray(BLUR), BLUR_PAD, 2)


def fused_kernel(w):
    """Compose flipped conv kernel with flipped blur*4 -> (O, I, 6, 6)."""
    o, i = w.shape[:2]
    kb = BLUR * 4.0
    kc = K + kb.shape[0] - 1
    return lax.conv_general_dilated(
        w.reshape(o * i, 1, K, K),
        jnp.asarray(kb)[None, None],
        (1, 1), ((kb.shape[0] - 1,) * 2, (kb.shape[1] - 1,) * 2),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=get_precision()).reshape(o, i, kc, kc)


def variant_b(x, w):
    fk = fused_kernel(w)
    pad = (K - 1 + BLUR_PAD[0], K - 1 + BLUR_PAD[1])
    return lax.conv_general_dilated(
        x, fk, (1, 1), (pad, pad), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        precision=get_precision())


def subpixel_kernels(w):
    """Phase kernels from the fused 6x6 kernel.

    out[2u+p, 2v+q] = sum_{a=p', b=q'} x[u + (a-offset)] fk[.., taps]
    correlation with pad 3: out[t] = sum_a xd[t+a-3] fk[a], xd dilated.
    t=2u+p: nonzero terms need t+a-3 even -> a parity = (3-p) % 2.
    p=0: a in {1,3,5}, j = u + (a-3)/2 in {u-1,u,u+1}
    p=1: a in {0,2,4}, j = u + (a-2)/2 in {u-1,u,u+1}  (pad left 1)
    Both are 3-tap correlations over x with pad 1, kernel = strided slice.
    Returns (2,2,O,I,3,3) phase kernels K[p][q][o,i,dy,dx] such that
    phase_pq = correlate(x, K[p][q], pad=1)."""
    fk = fused_kernel(w)  # (O, I, 6, 6)
    # correlation index j = u-1+dy uses tap a = 2*dy + (1 if p==0 else 0)
    # p=0: a = 1,3,5 -> a = 2*dy+1 ; p=1: a = 0,2,4 -> a = 2*dy
    k00 = fk[:, :, 1::2, 1::2]
    k01 = fk[:, :, 1::2, 0::2]
    k10 = fk[:, :, 0::2, 1::2]
    k11 = fk[:, :, 0::2, 0::2]
    return jnp.stack([jnp.stack([k00, k01]), jnp.stack([k10, k11])])


def variant_c(x, w):
    pk = subpixel_kernels(w)             # (2,2,O,I,3,3)
    o = w.shape[0]
    kall = pk.reshape(4 * o, w.shape[1], 3, 3)
    out = lax.conv_general_dilated(
        x, kall, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        precision=get_precision())        # (B, H, W, 4*O)
    b, h, wd = out.shape[:3]
    out = out.reshape(b, h, wd, 2, 2, o)
    out = out.transpose(0, 1, 3, 2, 4, 5)   # (B, H, 2, W, 2, O)
    return out.reshape(b, 2 * h, 2 * wd, o)


def timeit(fn, x, *args, iters=20):
    # fetch-warmed on a perturbed copy; one value-distinct dispatch per
    # iteration (identical (program, values) pairs can be served from the
    # runtime's execution cache — docs/PERF_NOTES.md). The first arg must
    # be the input tensor.
    float(jnp.sum(fn(x + 0.01, *args)))
    t0 = time.perf_counter()
    outs = [fn(x + 1e-6 * (i + 1), *args) for i in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    shapes = [
        (64, 128, 128, 128, 64),    # res 256 up-conv
        (64, 64, 64, 256, 128),     # res 128
        (64, 32, 32, 512, 256),     # res 64
        (64, 16, 16, 512, 512),     # res 32
        (64, 8, 8, 512, 512),       # res 16
    ]
    fa, fb, fc = (jax.jit(variant_a), jax.jit(variant_b),
                  jax.jit(variant_c))
    for b, h, wd, ic, oc in shapes:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(b, h, wd, ic), jnp.float32)
        w = jnp.asarray(rng.randn(oc, ic, K, K) / np.sqrt(ic * 9),
                        jnp.float32)
        ya = fa(x, w)
        yb = fb(x, w)
        yc = fc(x, w)
        err_b = float(jnp.max(jnp.abs(ya - yb)))
        err_c = float(jnp.max(jnp.abs(ya - yc)))
        ta = timeit(fa, x, w)
        tb = timeit(fb, x, w)
        tc = timeit(fc, x, w)
        print(json.dumps({
            "shape": [b, h, wd, ic, oc],
            "ms_dilated_plus_blur": round(ta, 2),
            "ms_fused_dilated6x6": round(tb, 2),
            "ms_subpixel": round(tc, 2),
            "err_fused": err_b, "err_subpixel": err_c}), flush=True)



# --- variant D: subpixel decomposition of the bare 3x3 (2x2 phase kernels,
# 2.25x fewer MACs than the dense dilated conv), interleave to 257, then
# the cheap depthwise FIR blur as in variant A. ---

def subpixel3_kernel(w):
    """(O, I, 3, 3) flipped conv taps -> (4O, I, 2, 2) phase kernels.
    Phase (p, q) output at (u, v) with pad 1 correlation:
    out[u] = sum_ty in[u - 1 + ty] * K[p, ty], K rows:
    p=0 -> [wf0, wf2]; p=1 -> [0, wf1] (and same along x)."""
    wf = w  # already flipped+scaled by caller
    o, i = wf.shape[:2]
    idx = jnp.array([[0, 2], [0, 1]])
    msk = jnp.array([[1.0, 1.0], [0.0, 1.0]], wf.dtype)
    ky = wf[:, :, idx, :] * msk[None, None, :, :, None]   # (O,I,2,2,3)
    k = ky[:, :, :, :, idx] * msk[None, None, None, None] # (O,I,2,2,2,2)
    # (O,I,p,ty,q,tx) -> (p,q,O,I,ty,tx) -> (4O, I, 2, 2)
    k = k.transpose(2, 4, 0, 1, 3, 5)
    return k.reshape(4 * o, i, 2, 2)


def variant_d(x, w):
    o = w.shape[0]
    kconv = subpixel3_kernel(w)  # w is already correlation taps here
    ph = lax.conv_general_dilated(
        x, kconv, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        precision=get_precision())          # (B, h+1, w+1, 4O)
    b, hp, wp = ph.shape[:3]
    t = ph.reshape(b, hp, wp, 2, 2, o)
    t = t.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * hp, 2 * wp, o)
    t = t[:, :2 * (hp - 1) + 1, :2 * (wp - 1) + 1, :]
    return blur2d(t, jnp.asarray(BLUR), BLUR_PAD, 2)


def main_d():
    shapes = [
        (64, 128, 128, 128, 64),
        (64, 64, 64, 256, 128),
        (64, 32, 32, 512, 256),
        (64, 16, 16, 512, 512),
    ]
    fa, fd = jax.jit(variant_a), jax.jit(variant_d)
    for bt, h, wd, ic, oc in shapes:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(bt, h, wd, ic), jnp.float32)
        w = jnp.asarray(rng.randn(oc, ic, K, K) / np.sqrt(ic * 9),
                        jnp.float32)
        ya = fa(x, w)
        yd = fd(x, w)
        err = float(jnp.max(jnp.abs(ya - yd)))
        # distinct pre-materialized inputs per call: no chain ops in the
        # timed loop, and no identical-execution dedup/caching
        def distinct(f, x, w, iters=6):
            xs = [jnp.asarray(np.asarray(x) + 1e-6 * i) for i in
                  range(iters)]
            jax.block_until_ready(xs)
            out = f(x, w)
            jax.block_until_ready(out)
            import time as _t
            t0 = _t.perf_counter()
            for xi in xs:  # block per call: outputs freed, no dedup
                jax.block_until_ready(f(xi, w))
            return (_t.perf_counter() - t0) / iters * 1e3
        ta = distinct(fa, x, w)
        td = distinct(fd, x, w)
        print(json.dumps({"shape": [bt, h, wd, ic, oc],
                          "ms_dilated_plus_blur": round(ta, 2),
                          "ms_subpixel3": round(td, 2),
                          "err": err}), flush=True)

if __name__ == "__main__":
    import sys
    main_d() if "--d" in sys.argv else main()
