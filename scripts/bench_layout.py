"""NHWC vs NCHW conv lowering for the late (64-128ch) layers at HIGH."""
# CAVEAT: isolated single-op timings on this stack are untrustworthy even
# chained (see docs/PERF_NOTES.md "Measurement trust levels"); kept for
# methodology reference only.
import json, time, sys
import jax
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
import jax.numpy as jnp
import numpy as np
from jax import lax

PREC = lax.Precision.HIGH

def timed(f, xs, w, iters=8):
    # chained: each call consumes the previous output (reshaped back to
    # the input shape via a cheap slice/pad) so no result caching is
    # possible; single-op timings are otherwise unreliable on this stack
    x = xs[0]
    def step(x):
        y = f(x, w)
        # map output back to input shape: broadcast-add a scalar derived
        # from y onto the ORIGINAL input (keeps values bounded)
        return xs[1] + jnp.mean(y) * 1e-12
    y = step(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters * 1e3

for (b, h, ci, co) in [(64, 256, 64, 64), (64, 128, 128, 128),
                       (64, 256, 128, 64)]:
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(co, ci, 3, 3) * 0.01, jnp.float32)
    xs_nhwc = [jnp.asarray(rng.randn(b, h, h, ci), jnp.float32)
               for _ in range(3)]
    xs_nchw = [jnp.transpose(x, (0, 3, 1, 2)) for x in xs_nhwc]
    jax.block_until_ready(xs_nchw)

    f_nhwc = jax.jit(lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"), precision=PREC))
    f_nchw = jax.jit(lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=PREC))
    t1 = timed(f_nhwc, xs_nhwc, w)
    t2 = timed(f_nchw, xs_nchw, w)
    print(json.dumps({"shape": [b, h, ci, co],
                      "ms_nhwc": round(t1, 2),
                      "ms_nchw": round(t2, 2)}), flush=True)
