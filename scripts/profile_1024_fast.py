"""Round-5 1024 decomposition, part 2: the PRODUCTION (fast) pipeline.

scripts/profile_1024.py cuts the seq pipeline; this cuts pipeline_fast
(the s2d-tail production path the bench numbers use) at the same layer
boundaries, then probes the batch-16 HBM-capacity claim from the round-4
1024 analysis ("batch 8 HBM-bounded").

Usage: PYTHONPATH=... python scripts/profile_1024_fast.py
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp
import numpy as np

from rewriting_tpu.models import SeqStyleGAN2
from rewriting_tpu.ops.precision import set_precision, set_precision_schedule


def timeit(fn, zs, *args, iters=6):
    assert len(zs) > iters
    float(jnp.sum(fn(zs[-1], *args)))  # host fetch: real warmup
    t0 = time.perf_counter()
    outs = [fn(zs[i], *args) for i in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def main():
    set_precision("high")
    model = SeqStyleGAN2(size=1024)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = 8
    zs = [jax.random.normal(jax.random.PRNGKey(i + 1), (batch, 512))
          for i in range(7)]
    jax.block_until_ready(zs)
    noise = model.prepare_noise(batch)
    cuts = ["layer10", "layer12", "layer14", "layer15", "layer16",
            "layer17", "layer18", "to_rgb9", "output"]
    names = [s.name for s in model.pipeline_fast.stages]

    def pos(c):
        return max(i for i, n in enumerate(names)
                   if n == c or n.startswith(c + "."))
    order = sorted((c for c in cuts
                    if any(n == c or n.startswith(c + ".")
                           for n in names)), key=pos)
    prev = 0.0
    for cut in order:
        pre = model.pipeline_fast.subsequence(last_layer=cut)

        def runz(z, p, n):
            bag = model.make_bag(z, n)
            out = pre(p, bag)
            total = jnp.mean(out["fmap"])
            if "output" in out:
                total = total + jnp.mean(out["output"])
            return total
        f = jax.jit(runz)
        dt = timeit(f, zs, params, noise) * 1000
        print(json.dumps({"cut": cut, "cum_ms": round(dt, 2),
                          "delta_ms": round(dt - prev, 2)}), flush=True)
        prev = dt

    # batch-capacity probe (PERF_NOTES round 5: 24 is the measured
    # serving optimum; 32 OOMs — the capacity edge)
    from rewriting_tpu.models.stylegan2 import recommended_precision_schedule
    for b in (8, 16, 24, 32):
        zsb = [jax.random.normal(jax.random.PRNGKey(100 + i), (b, 512))
               for i in range(7)]
        jax.block_until_ready(zsb)
        nb = model.prepare_noise(b)
        for label, sched in (("high", None),
                             ("recommended", recommended_precision_schedule(
                                 model))):
            set_precision("high")
            set_precision_schedule(sched)
            try:
                f = jax.jit(lambda z, p, n: model(p, z, n))
                try:
                    dt = timeit(f, zsb, params, nb)
                except Exception as e:
                    print(json.dumps({"batch": b, "config": label,
                                      "error": type(e).__name__,
                                      "msg": str(e)[:160]}), flush=True)
                    continue
                print(json.dumps({"batch": b, "config": label,
                                  "img_per_sec": round(b / dt, 1)}),
                      flush=True)
            finally:
                set_precision_schedule(None)


if __name__ == "__main__":
    main()
