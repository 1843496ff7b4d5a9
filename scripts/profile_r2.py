"""Round-2 perf probe: fused vs unfused sampling, batch sweep, insert-solve
per-iter floor. Run on the real TPU. Prints one JSON line per measurement."""

import argparse
import json
import time

import jax
jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp
import numpy as np

from rewriting_tpu.ops.precision import set_precision
from rewriting_tpu.models import SeqStyleGAN2
from rewriting_tpu.core import DataBag


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def timeit_distinct(fn, zs, *args, iters=10):
    # one distinct z per timed dispatch, fetch-warmed on a perturbed copy
    # (value-cache + program-residency traps: docs/PERF_NOTES.md)
    import jax.numpy as _jnp
    assert len(zs) >= iters, (len(zs), iters)
    float(_jnp.sum(fn(zs[0] + 0.01, *args)))
    t0 = time.perf_counter()
    outs = [fn(zs[i], *args) for i in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="sample",
                    choices=["sample", "solve", "segments", "variants", "diagnose", "solve_once", "solve_vmem"])
    ap.add_argument("--precision", default="high")
    args = ap.parse_args()

    print(json.dumps({"devices": jax.device_count(),
                      "kind": jax.devices()[0].device_kind}), flush=True)

    if args.what == "segments":
        segments()
        return
    if args.what == "variants":
        variants()
        return
    if args.what == "diagnose":
        diagnose()
        return
    if args.what == "solve_once":
        solve_once()
        return
    if args.what == "solve_vmem":
        solve_vmem()
        return
    if args.what == "sample":
        set_precision(args.precision)
        model = SeqStyleGAN2(size=256)
        params = model.init_params(jax.random.PRNGKey(0))
        for batch in (64, 128):
            zs = [jax.random.normal(jax.random.PRNGKey(i), (batch, 512))
                  for i in range(10)]
            jax.block_until_ready(zs)
            noise = model.prepare_noise(batch)
            for fused in (False, True):
                fwd = jax.jit(lambda z, p, n, f=fused: model(p, z, n,
                                                             fused=f))
                dt = timeit_distinct(fwd, zs, params, noise)
                print(json.dumps({
                    "what": "sample", "batch": batch, "fused": fused,
                    "precision": args.precision,
                    "img_per_sec": round(batch / dt, 1)}), flush=True)
    else:
        from rewriting_tpu.rewrite.solve import insert_solve
        set_precision(args.precision)
        model = SeqStyleGAN2(size=256)
        params = model.init_params(jax.random.PRNGKey(0))
        layer = "layer8.sconv"
        window = model.pipeline.subsequence(
            first_layer=f"{layer}.mconv.dconv",
            last_layer=f"{layer}.activate")
        wkey = f"{layer}.mconv.dconv"
        w0 = params[wkey]["weight"]
        rng = np.random.RandomState(0)
        in_c = w0.shape[2]
        bag = DataBag(fmap=jnp.asarray(rng.randn(1, 32, 32, in_c),
                                       jnp.float32),
                      style=jnp.asarray(rng.randn(1, in_c), jnp.float32))
        goal_out = jnp.asarray(rng.randn(1, 32, 32, w0.shape[1]),
                               jnp.float32)

        def window_fn(w, goal):
            b, p = goal
            p = dict(p)
            p[wkey] = {**p[wkey], "weight": w}
            return window(p, b)["fmap"]

        direction = jnp.asarray(rng.randn(1, in_c), jnp.float32)
        direction = direction / jnp.linalg.norm(direction)
        for niter in (101, 2001):
            insert_solve(window_fn, w0, (bag, params), goal_out, direction,
                         niter=niter, piter=10, lr=0.05)
            _, _, ms = insert_solve(window_fn, w0, (bag, params), goal_out,
                                    direction, niter=niter, piter=10,
                                    lr=0.05, return_timing=True)
            print(json.dumps({"what": "insert", "niter": niter,
                              "precision": args.precision,
                              "ms": round(ms, 1)}), flush=True)



def segments():
    """Cumulative prefix timing of the StyleGAN2-256 forward at batch 64."""
    set_precision("high")
    model = SeqStyleGAN2(size=256)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = 64
    z = jax.random.normal(jax.random.PRNGKey(1), (batch, 512))
    noise = model.prepare_noise(batch)
    cuts = (["input"] +
            [f"layer{i}" for i in range(2, 15)] +
            [f"to_rgb{i}" for i in range(1, 8)] +
            [f"up_rgb{i}" for i in range(1, 7)] + ["output"])
    names = [s.name for s in model.pipeline.stages]
    results = []
    prev = 0.0
    order = [c for c in cuts if any(n == c or n.startswith(c + ".")
                                    for n in names)]
    # sort cuts by pipeline position
    def pos(c):
        return max(i for i, n in enumerate(names)
                   if n == c or n.startswith(c + "."))
    order.sort(key=pos)
    for cut in order:
        pre = model.pipeline.subsequence(upto_layer=None, last_layer=cut)

        def run(p, z, n):
            bag = model.make_bag(z, n)
            return pre(p, bag)

        f = jax.jit(run)
        dt = timeit(f, params, z, noise, iters=10) * 1000
        results.append({"cut": cut, "cum_ms": round(dt, 2),
                        "delta_ms": round(dt - prev, 2)})
        prev = dt
    for r in results:
        print(json.dumps(r), flush=True)



def variants():
    """One-change-at-a-time e2e variants at HIGH precision."""
    set_precision("high")
    model = SeqStyleGAN2(size=256)
    params = model.init_params(jax.random.PRNGKey(0))
    for batch in (96, 160):
        zs = [jax.random.normal(jax.random.PRNGKey(i), (batch, 512))
              for i in range(10)]
        jax.block_until_ready(zs)
        noise = model.prepare_noise(batch)
        fwd = jax.jit(lambda z, p, n: model(p, z, n))
        dt = timeit_distinct(fwd, zs, params, noise)
        print(json.dumps({"variant": f"seq_batch{batch}",
                          "img_per_sec": round(batch / dt, 1)}), flush=True)
    # fused only on the last upsample layer (64-ch, worst lane waste)
    keep = {k: v for k, v in model._fused_overrides.items()
            if k.startswith("layer13.")}
    from rewriting_tpu.core import Stage, StagePipeline
    pipe13 = StagePipeline([
        Stage(s.name, keep.get(s.name, s.fn))
        for s in model.pipeline.stages])
    batch = 64
    zs = [jax.random.normal(jax.random.PRNGKey(i), (batch, 512))
          for i in range(10)]
    noise = model.prepare_noise(batch)
    fwd13 = jax.jit(lambda z, p, n: pipe13(p, model.make_bag(z, n))[
        "output"])
    dt = timeit_distinct(fwd13, zs, params, noise)
    print(json.dumps({"variant": "subpixel_layer13_only_b64",
                      "img_per_sec": round(batch / dt, 1)}), flush=True)



def diagnose():
    """Cost attribution diagnostics (NOT exact math): rgb path cost, vmem
    compiler option, solve strategies."""
    set_precision("high")
    model = SeqStyleGAN2(size=256)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = 64
    zs = [jax.random.normal(jax.random.PRNGKey(i), (batch, 512))
          for i in range(10)]
    noise = model.prepare_noise(batch)

    fwd = jax.jit(lambda z, p, n: model(p, z, n))
    dt = timeit_distinct(fwd, zs, params, noise)
    print(json.dumps({"diag": "baseline",
                      "img_per_sec": round(batch / dt, 1)}), flush=True)

    # (a) strip the rgb skip path: replace to_rgb*/up_rgb* with no-ops and
    # emit the last fmap (diagnostic-only lower bound for the conv trunk)
    from rewriting_tpu.core import Stage, StagePipeline
    def noop(pfx):
        return lambda p, d: d
    trunk = StagePipeline([
        Stage(s.name, noop(s.name)
              if (".rgb" in s.name or s.name.startswith("up_rgb")
                  or s.name == "output") else s.fn)
        for s in model.pipeline.stages])
    ftrunk = jax.jit(lambda z, p, n: jnp.mean(
        trunk(p, model.make_bag(z, n))["fmap"]))
    dt = timeit_distinct(ftrunk, zs, params, noise)
    print(json.dumps({"diag": "trunk_only(no_rgb)",
                      "img_per_sec": round(batch / dt, 1)}), flush=True)

    # (b) bigger scoped vmem
    try:
        fvm = jax.jit(lambda z, p, n: model(p, z, n),
                      compiler_options={
                          "xla_tpu_scoped_vmem_limit_kib": "65536"})
        dt = timeit_distinct(fvm, zs, params, noise)
        print(json.dumps({"diag": "vmem64m",
                          "img_per_sec": round(batch / dt, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"diag": "vmem64m", "error": str(e)[:200]}),
              flush=True)


def solve_once():
    from rewriting_tpu.rewrite.solve import insert_solve
    set_precision("high")
    model = SeqStyleGAN2(size=256)
    params = model.init_params(jax.random.PRNGKey(0))
    layer = "layer8.sconv"
    window = model.pipeline.subsequence(
        first_layer=f"{layer}.mconv.dconv", last_layer=f"{layer}.activate")
    wkey = f"{layer}.mconv.dconv"
    w0 = params[wkey]["weight"]
    rng = np.random.RandomState(0)
    in_c = w0.shape[2]
    from rewriting_tpu.core import DataBag as DB
    bag = DB(fmap=jnp.asarray(rng.randn(1, 32, 32, in_c), jnp.float32),
             style=jnp.asarray(rng.randn(1, in_c), jnp.float32))
    goal_out = jnp.asarray(rng.randn(1, 32, 32, w0.shape[1]), jnp.float32)

    def window_fn(w, goal):
        b, p = goal
        p = dict(p)
        p[wkey] = {**p[wkey], "weight": w}
        return window(p, b)["fmap"]

    direction = jnp.asarray(rng.randn(1, in_c), jnp.float32)
    direction = direction / jnp.linalg.norm(direction)
    insert_solve(window_fn, w0, (bag, params), goal_out, direction,
                 niter=2001, piter=10, lr=0.05)
    _, _, ms = insert_solve(window_fn, w0, (bag, params), goal_out,
                            direction, niter=2001, piter=10, lr=0.05,
                            return_timing=True)
    print(json.dumps({"what": "insert_innerscan", "ms": round(ms, 1)}),
          flush=True)



def solve_vmem():
    """Insert solve with bigger scoped vmem."""
    import functools
    from rewriting_tpu.rewrite import solve as solve_mod
    set_precision("high")
    model = SeqStyleGAN2(size=256)
    params = model.init_params(jax.random.PRNGKey(0))
    layer = "layer8.sconv"
    window = model.pipeline.subsequence(
        first_layer=f"{layer}.mconv.dconv", last_layer=f"{layer}.activate")
    wkey = f"{layer}.mconv.dconv"
    w0 = params[wkey]["weight"]
    rng = np.random.RandomState(0)
    in_c = w0.shape[2]
    from rewriting_tpu.core import DataBag as DB
    bag = DB(fmap=jnp.asarray(rng.randn(1, 32, 32, in_c), jnp.float32),
             style=jnp.asarray(rng.randn(1, in_c), jnp.float32))
    goal_out = jnp.asarray(rng.randn(1, 32, 32, w0.shape[1]), jnp.float32)

    def window_fn(w, goal):
        b, p = goal
        p = dict(p)
        p[wkey] = {**p[wkey], "weight": w}
        return window(p, b)["fmap"]

    direction = jnp.asarray(rng.randn(1, in_c), jnp.float32)
    direction = direction / jnp.linalg.norm(direction)
    raw = solve_mod._insert_scan.__wrapped__
    for name, opts in [("vmem128m", {"xla_tpu_scoped_vmem_limit_kib":
                                     "131072"}),
                       ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib":
                                    "65536"})]:
        try:
            jitted = jax.jit(
                raw, static_argnames=("window_fn", "niter", "piter",
                                      "low_rank_insert",
                                      "low_rank_gradient"),
                compiler_options=opts)
            w, _ = jitted(window_fn, w0, (bag, params), goal_out,
                          direction, 2001, 10, 0.05, True, False)
            jax.block_until_ready(w)
            t0 = time.perf_counter()
            w, _ = jitted(window_fn, w0, (bag, params), goal_out,
                          direction, 2001, 10, 0.05, True, False)
            jax.block_until_ready(w)
            ms = (time.perf_counter() - t0) * 1e3
            print(json.dumps({"solve_variant": name, "ms": round(ms, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"solve_variant": name,
                              "error": str(e)[:150]}), flush=True)


if __name__ == "__main__":
    main()
