"""Calibrate achievable MXU throughput on this chip: big matmul vs 3x3 conv
at model shapes, at each precision. Prints achieved TFLOP/s."""

import json
import time

import jax
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def run(name, fn, args, flops):
    f = jax.jit(fn)
    dt = timeit(f, *args)
    print(json.dumps({"op": name, "ms": round(dt * 1e3, 2),
                      "tflops": round(flops / dt / 1e12, 1)}), flush=True)


def main():
    rng = np.random.RandomState(0)
    for prec_name, prec in [("DEFAULT", lax.Precision.DEFAULT),
                            ("HIGH", lax.Precision.HIGH),
                            ("HIGHEST", lax.Precision.HIGHEST)]:
        print(json.dumps({"precision": prec_name}), flush=True)
        # big matmul
        m = k = n = 8192
        a = jnp.asarray(rng.randn(m, k), jnp.float32)
        b = jnp.asarray(rng.randn(k, n), jnp.float32)
        run("matmul8k", lambda a, b: jnp.dot(a, b, precision=prec),
            (a, b), 2 * m * k * n)
        # conv shapes from the model (batch 64)
        for (bt, h, c_in, c_out) in [(64, 64, 256, 256), (64, 128, 128, 128),
                                     (64, 256, 64, 64), (64, 32, 512, 512)]:
            x = jnp.asarray(rng.randn(bt, h, h, c_in), jnp.float32)
            w = jnp.asarray(rng.randn(c_out, c_in, 3, 3) * 0.01, jnp.float32)

            def conv(x, w):
                return lax.conv_general_dilated(
                    x, w, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "OIHW", "NHWC"),
                    precision=prec)
            flops = 2 * bt * h * h * c_in * c_out * 9
            run(f"conv{h}x{h}x{c_in}->{c_out}", conv, (x, w), flops)
        # bf16 end-to-end matmul for reference
    print(json.dumps({"precision": "pure_bf16"}), flush=True)
    a16 = jnp.asarray(rng.randn(8192, 8192), jnp.bfloat16)
    b16 = jnp.asarray(rng.randn(8192, 8192), jnp.bfloat16)
    run("matmul8k_bf16", lambda a, b: jnp.dot(a, b), (a16, b16),
        2 * 8192 ** 3)
    x16 = jnp.asarray(rng.randn(64, 64, 64, 256), jnp.bfloat16)
    w16 = jnp.asarray(rng.randn(256, 256, 3, 3) * 0.01, jnp.bfloat16)

    def conv16(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "OIHW", "NHWC"))
    run("conv64x64x256->256_bf16", conv16, (x16, w16),
        2 * 64 * 64 * 64 * 256 * 256 * 9)


if __name__ == "__main__":
    main()
