"""Per-layer cumulative profile of StyleGAN2-1024 (batch 8, HIGH)."""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp
import numpy as np

from rewriting_tpu.models import SeqStyleGAN2
from rewriting_tpu.ops.precision import set_precision


def timeit(fn, zs, *args, iters=6):
    # one distinct z per timed dispatch (zs[-1] warms): repeated
    # (program, values) pairs can be served from the runtime's value
    # cache (docs/PERF_NOTES.md)
    import jax.numpy as _jnp
    assert len(zs) > iters
    float(_jnp.sum(fn(zs[-1], *args)))  # host fetch: real warmup
    t0 = time.perf_counter()
    outs = [fn(zs[i], *args) for i in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def main():
    set_precision("high")
    size = 1024
    model = SeqStyleGAN2(size=size)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = 8
    zs = [jax.random.normal(jax.random.PRNGKey(i + 1), (batch, 512))
          for i in range(7)]
    jax.block_until_ready(zs)
    noise = model.prepare_noise(batch)
    # cuts: every layer from 64x64 up + final rgb stages
    cuts = ["layer10", "layer11", "layer12", "layer13", "layer14",
            "layer15", "layer16", "layer17", "layer18", "to_rgb9",
            "output"]
    names = [s.name for s in model.pipeline.stages]

    def pos(c):
        return max(i for i, n in enumerate(names)
                   if n == c or n.startswith(c + "."))
    order = [c for c in cuts if any(n == c or n.startswith(c + ".")
                                    for n in names)]
    order.sort(key=pos)
    prev = 0.0
    for cut in order:
        pre = model.pipeline.subsequence(last_layer=cut)

        def run(p, z, n):
            bag = model.make_bag(z, n)
            out = pre(p, bag)
            # consume BOTH carried tensors: returning only 'output' lets
            # XLA dead-code the trunk tail (and vice versa), which made an
            # earlier version of this profile attribute the whole trunk to
            # to_rgb9
            total = jnp.mean(out["fmap"])
            if "output" in out:
                total = total + jnp.mean(out["output"])
            return total

        def runz(z, p, n):
            return run(p, z, n)
        f = jax.jit(runz)
        dt = timeit(f, zs, params, noise) * 1000
        print(json.dumps({"cut": cut, "cum_ms": round(dt, 2),
                          "delta_ms": round(dt - prev, 2)}), flush=True)
        prev = dt


if __name__ == "__main__":
    main()
