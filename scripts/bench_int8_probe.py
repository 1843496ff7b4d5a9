"""Microbench: is int8 MXU throughput worth a quantized serving path?

TPU v5e advertises 2x int8 peak over bf16 (394 vs 197 TOP/s).  This
probe measures whether XLA actually delivers that on the shapes our
sampling path is made of:

  1. dot_general: (8192,8192)x(8192,8192) — MXU speed-of-light check.
  2. conv_general_dilated 3x3 at the StyleGAN2-256 hot-layer shapes
     (64x64x512, 128x128x256, 256x256x128, NHWC batch 64).

Each shape is timed bf16-in/f32-accum vs int8-in/int32-accum with the
bench.py timing hygiene (distinct pre-materialized inputs, host-fetch
warmup, references held until block_until_ready).  If the int8 conv
ratio lands near 2x, a per-channel-scaled weight-quantized sampling
mode is the next throughput tier after the bf16 'default' policy; if
XLA converts s8 convs up to bf16 internally the ratio will be ~1x and
we record the negative result instead (PERF_NOTES).
"""

import json
import time

import jax
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
import jax.numpy as jnp
import numpy as np
from jax import lax

ITERS = 20


def timed(fn, inputs, flops):
    # same hygiene as bench.py timeit_distinct: perturbed-warmup with a
    # host fetch, distinct inputs per dispatch, hold all outputs
    w = fn(inputs[0])
    float(jnp.sum(jnp.abs(w.astype(jnp.float32))))
    t0 = time.perf_counter()
    outs = [fn(inputs[i % len(inputs)]) for i in range(ITERS)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / ITERS
    return dt, flops / dt / 1e12


def probe_dot(n=8192):
    rng = np.random.RandomState(0)
    flops = 2.0 * n * n * n
    out = {}
    for name, dt, acc in (("bf16", jnp.bfloat16, jnp.float32),
                          ("int8", jnp.int8, jnp.int32)):
        if name == "int8":
            xs = [jnp.asarray(rng.randint(-127, 128, (n, n)), dt)
                  for _ in range(4)]
            wmat = jnp.asarray(rng.randint(-127, 128, (n, n)), dt)
        else:
            xs = [jnp.asarray(rng.randn(n, n), dt) for _ in range(4)]
            wmat = jnp.asarray(rng.randn(n, n), dt)
        f = jax.jit(lambda x, w=wmat, a=acc: lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=a))
        jax.block_until_ready(xs + [wmat])
        dt_s, tops = timed(f, xs, flops)
        out[name] = {"ms": round(dt_s * 1e3, 3), "tops": round(tops, 1)}
    out["ratio"] = round(out["bf16"]["ms"] / out["int8"]["ms"], 2)
    return out


def probe_conv(h, cin, cout, batch=64):
    rng = np.random.RandomState(1)
    flops = 2.0 * batch * h * h * cin * cout * 9
    out = {"shape": f"b{batch} {h}x{h} {cin}->{cout} 3x3"}
    for name, dt, acc in (("bf16", jnp.bfloat16, jnp.float32),
                          ("int8", jnp.int8, jnp.int32)):
        if name == "int8":
            xs = [jnp.asarray(rng.randint(-127, 128, (batch, h, h, cin)), dt)
                  for _ in range(4)]
            wmat = jnp.asarray(rng.randint(-127, 128, (cout, cin, 3, 3)), dt)
        else:
            xs = [jnp.asarray(rng.randn(batch, h, h, cin), dt)
                  for _ in range(4)]
            wmat = jnp.asarray(rng.randn(cout, cin, 3, 3) * 0.05, dt)
        # reduce each output to (cout,) on device: holding ITERS full
        # f32/i32 conv outputs exhausts HBM at the 128/256-res shapes
        # (64,256,256,128) x 20 iters ~= 40 GB; the sum consumes the conv
        # so the dispatch still runs, while the held values are tiny
        f = jax.jit(lambda x, w=wmat, a=acc: lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "OIHW", "NHWC"),
            preferred_element_type=a).sum(axis=(0, 1, 2)))
        jax.block_until_ready(xs + [wmat])
        try:
            dt_s, tops = timed(f, xs, flops)
        except Exception as e:  # unsupported lowering is a result too
            out[name] = {"error": type(e).__name__, "msg": str(e)[:200]}
            continue
        out[name] = {"ms": round(dt_s * 1e3, 3), "tops": round(tops, 1)}
    if "ms" in out.get("int8", {}) and "ms" in out.get("bf16", {}):
        out["ratio"] = round(out["bf16"]["ms"] / out["int8"]["ms"], 2)
    return out


def main():
    print(jax.devices())
    print(json.dumps({"dot_8192": probe_dot()}))
    for h, cin, cout in ((64, 512, 512), (128, 256, 256), (256, 128, 128)):
        print(json.dumps({"conv": probe_conv(h, cin, cout)}))


if __name__ == "__main__":
    main()
