"""Calibration v2: chain iterations (each call consumes the previous
output) so no layer can cache/dedupe repeated identical executions."""
import json, time
import jax
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
import jax.numpy as jnp
import numpy as np
from jax import lax

def chain_time(step, x0, iters=10):
    x = step(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters

def main():
    rng = np.random.RandomState(0)
    for prec_name, prec in [("DEFAULT", lax.Precision.DEFAULT),
                            ("HIGH", lax.Precision.HIGH),
                            ("HIGHEST", lax.Precision.HIGHEST)]:
        m = k = n = 4096
        b = jnp.asarray(rng.randn(k, n) * 0.01, jnp.float32)
        a = jnp.asarray(rng.randn(m, k), jnp.float32)
        step = jax.jit(lambda x: jnp.tanh(jnp.dot(x, b, precision=prec)))
        dt = chain_time(step, a)
        print(json.dumps({"prec": prec_name, "op": "matmul4k_chain",
                          "ms": round(dt*1e3, 3),
                          "tflops": round(2*m*k*n/dt/1e12, 1)}), flush=True)
        for (bt, h, c) in [(64, 64, 256), (64, 128, 128), (64, 256, 64),
                           (64, 32, 512)]:
            x0 = jnp.asarray(rng.randn(bt, h, h, c), jnp.float32)
            w = jnp.asarray(rng.randn(c, c, 3, 3) * (0.1/c), jnp.float32)
            stepc = jax.jit(lambda x: lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "OIHW", "NHWC"),
                precision=prec))
            dt = chain_time(stepc, x0)
            fl = 2 * bt * h * h * c * c * 9
            print(json.dumps({"prec": prec_name, "op": f"conv{h}x{c}",
                              "ms": round(dt*1e3, 3),
                              "tflops": round(fl/dt/1e12, 1)}), flush=True)

if __name__ == "__main__":
    main()
