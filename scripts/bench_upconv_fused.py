"""Measure the fused up-conv+blur Pallas kernel vs the XLA two-pass chain
on the real TPU (round-3 headline: close the 13.5 ms blur budget).

Timing per the trust rules (CLAUDE.md / docs/PERF_NOTES.md): distinct
pre-materialized inputs per dispatch, fetch-warmed (host sum) before any
timed loop, all outputs referenced until one final block.

Usage:
  python scripts/bench_upconv_fused.py [--shape i] [--batch 64]
         [--th 8] [--ob 128] [--precision high] [--compile-only]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--shape", type=int, default=None,
                    help="index into SHAPES; default all")
    ap.add_argument("--th", type=int, default=None)
    ap.add_argument("--ob", type=int, default=None)
    ap.add_argument("--precision", default="high")
    ap.add_argument("--compile-only", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    import jax.numpy as jnp
    import numpy as np
    from rewriting_tpu.ops.precision import set_precision
    set_precision(args.precision)
    from rewriting_tpu.ops.pallas_upconv import (upconv_blur_pallas,
                                                 upconv_blur_reference)

    # the StyleGAN2-256 upsampling layers (input res, I, O); the last
    # three carry nearly all the blur cost
    SHAPES = [(8, 512, 512), (16, 512, 512), (32, 512, 512),
              (64, 512, 256), (128, 256, 128)]
    if args.shape is not None:
        SHAPES = [SHAPES[args.shape]]

    b = args.batch
    rng = np.random.RandomState(0)

    def fetch(x):
        return float(jnp.sum(jnp.abs(x).astype(jnp.float32)))

    for (res, ic, oc) in SHAPES:
        wt = jnp.asarray(rng.randn(3, 3, ic, oc), jnp.float32) * 0.05
        # iters+1 inputs: xs[0] is burned by the exactness check below
        # (its (program, values) pair lands in the runtime's value-level
        # execution cache), so the timed loop uses xs[1:] — each value
        # dispatched exactly once
        xs = [jnp.asarray(rng.randn(b, res, res, ic), jnp.float32) * 0.5
              for _ in range(args.iters + 1)]
        jax.block_until_ready(xs)
        kw = {}
        if args.th:
            kw["th"] = args.th
        if args.ob:
            kw["ob"] = args.ob
        pk = jax.jit(lambda x, w: upconv_blur_pallas(x, w, **kw))
        xr = jax.jit(upconv_blur_reference)

        # compile + exactness + residency (host fetch)
        t0 = time.perf_counter()
        o_p = pk(xs[0], wt)
        s_p = fetch(o_p)
        t_compile = time.perf_counter() - t0
        o_r = xr(xs[0], wt)
        s_r = fetch(o_r)
        rel = float(jnp.max(jnp.abs(o_p - o_r))
                    / jnp.max(jnp.abs(o_r)))
        print(f"res {res:4d} I={ic} O={oc}: compile {t_compile:.1f}s "
              f"rel_err {rel:.2e} sums {s_p:.1f}/{s_r:.1f}", flush=True)
        if args.compile_only:
            continue
        # perturb-warm both (avoid the value cache on the timed loops)
        fetch(pk(xs[1] + 0.01, wt))
        fetch(xr(xs[1] + 0.01, wt))
        for name, fn in (("pallas", pk), ("xla", xr)):
            t0 = time.perf_counter()
            outs = [fn(xs[1 + i], wt) for i in range(args.iters)]
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / args.iters * 1000
            gb = (b * res * res * ic + b * 4 * res * res * oc) * 4 / 1e9
            tf = b * res * res * ic * oc * 9 * 2 / 1e12
            print(f"    {name:6s} {dt:7.2f} ms  "
                  f"({tf / (dt / 1e3):5.1f} TF/s useful, "
                  f"{gb / (dt / 1e3):5.0f} GB/s min-traffic)", flush=True)


if __name__ == "__main__":
    main()
