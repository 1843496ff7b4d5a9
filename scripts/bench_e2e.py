"""Quick e2e forward timing for StyleGAN2 at several sizes (HIGH)."""

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

from rewriting_tpu.models import SeqStyleGAN2
from rewriting_tpu.ops.precision import set_precision
from rewriting_tpu.ops.jitopts import tuned_jit


def main():
    set_precision("high")
    sizes = [int(s) for s in (sys.argv[1:] or ["256", "512", "1024"])]
    batches = {256: 64, 512: 16, 1024: 8}
    for size in sizes:
        b = batches[size]
        model = SeqStyleGAN2(size=size)
        params = model.init_params(jax.random.PRNGKey(0))
        noise = model.prepare_noise(b)
        iters = 12 if size == 256 else 8
        # one distinct z per timed dispatch + one for warmup: repeated
        # (program, values) pairs can be served from the runtime's
        # value-level execution cache (docs/PERF_NOTES.md)
        zs = [jax.random.normal(jax.random.PRNGKey(i), (b, 512))
              for i in range(iters + 1)]
        jax.block_until_ready(zs)
        fwd = tuned_jit(lambda z, p, n: model(p, z, n))
        # host fetch: block_until_ready can return while the dispatch is
        # still queued behind the remote program load (docs/PERF_NOTES.md)
        float(jnp.sum(fwd(zs[-1], params, noise)))
        t0 = time.perf_counter()
        outs = [fwd(zs[i], params, noise) for i in range(iters)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"size": size, "batch": b,
                          "ms": round(dt * 1000, 2),
                          "img_per_sec": round(b / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
