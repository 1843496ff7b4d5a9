"""Benchmark: StyleGAN2-256 sampling throughput + rank-1 edit solve latency.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline (BASELINE.md north star): 5000 img/s on a TPU v5p-8 for
StyleGAN2-256 sampling == 625 img/s/chip; rank-1 edit solve < 1 s.
vs_baseline is measured img/s/chip divided by 625.
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes on CPU for a fast correctness run")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--precision", default="high",
                    choices=["highest", "high", "default"],
                    help="headline mode: 'high' = fp32-tolerance parity "
                         "(2e-4 vs torch golden on TPU); 'highest' = "
                         "bit-level fp32; 'default' = bf16 throughput")
    ap.add_argument("--edit-iters", type=int, default=2001)
    args = ap.parse_args()

    if args.smoke:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from rewriting_tpu.ops.precision import set_precision
    from rewriting_tpu.models import SeqStyleGAN2
    from rewriting_tpu.core import DataBag
    from rewriting_tpu.rewrite.solve import insert_solve

    set_precision(args.precision)

    if args.smoke:
        size, style_dim, n_mlp, batch, iters = 32, 64, 2, 4, 2
        edit_iters = 21
    else:
        size, style_dim, n_mlp, batch, iters = (256, 512, 8, args.batch,
                                                args.iters)
        edit_iters = args.edit_iters

    model = SeqStyleGAN2(size=size, style_dim=style_dim, n_mlp=n_mlp)
    params = model.init_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (batch, model.z_dim))
    noise = model.prepare_noise(batch)

    def measure(prec):
        set_precision(prec)
        fwd = jax.jit(lambda p, z, n: model(p, z, n))
        jax.block_until_ready(fwd(params, z, noise))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(params, z, noise)
        jax.block_until_ready(out)
        return batch * iters / (time.perf_counter() - t0)

    rates = {}
    for prec in (["highest", "high", "default"] if not args.smoke
                 else [args.precision]):
        rates[prec] = measure(prec)
    if not args.smoke:
        # throughput mode: bf16 activations end-to-end
        from rewriting_tpu.ops.precision import cast_pytree
        set_precision("default")
        pc = cast_pytree(params, jnp.bfloat16)
        zc = z.astype(jnp.bfloat16)
        nc = cast_pytree(noise, jnp.bfloat16)
        fwd = jax.jit(lambda p, z, n: model(p, z, n))
        jax.block_until_ready(fwd(pc, zc, nc))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(pc, zc, nc)
        jax.block_until_ready(out)
        rates["bf16_acts"] = batch * iters / (time.perf_counter() - t0)
    set_precision(args.precision)
    img_per_sec = rates[args.precision]
    n_dev = jax.device_count()
    img_per_sec_chip = img_per_sec / n_dev

    # rank-1 edit solve on a realistic window (layer8-style: 512ch conv +
    # noise + act). Reference default workload: 2001 Adam iters, piter 10
    # (ganrewrite.py:254-255).
    # pick the second (non-upsampling) conv at its resolution so the window
    # preserves spatial shape: layer8 = 32x32/512ch for the 256 model
    layer = "layer8.sconv" if size >= 256 else "layer4.sconv"
    window = model.pipeline.subsequence(
        first_layer=f"{layer}.mconv.dconv", last_layer=f"{layer}.activate")
    wkey = f"{layer}.mconv.dconv"
    w0 = params[wkey]["weight"]
    res = {256: 32, 32: 8}[size]
    in_c = w0.shape[2]
    rng = np.random.RandomState(0)
    bag = DataBag(fmap=jnp.asarray(rng.randn(1, res, res, in_c),
                                   jnp.float32),
                  style=jnp.asarray(rng.randn(1, in_c), jnp.float32))
    goal_out = jnp.asarray(rng.randn(1, res, res, w0.shape[1]), jnp.float32)

    def window_fn(w, goal):
        b, p = goal
        p = dict(p)
        p[wkey] = {**p[wkey], "weight": w}
        return window(p, b)["fmap"]

    direction = jnp.asarray(rng.randn(1, in_c), jnp.float32)
    direction = direction / jnp.linalg.norm(direction)
    # compile
    insert_solve(window_fn, w0, (bag, params), goal_out, direction,
                 niter=edit_iters, piter=10, lr=0.05)
    _, _, edit_ms = insert_solve(window_fn, w0, (bag, params), goal_out,
                                 direction, niter=edit_iters, piter=10,
                                 lr=0.05, return_timing=True)

    # fast low-rank-decomposed linear insert (full conv hoisted out of the
    # loop; rewrite/solve.py fast_linear_insert_solve)
    import math
    from jax import lax
    from rewriting_tpu.rewrite.solve import fast_linear_insert_solve
    from rewriting_tpu.ops.precision import get_precision
    scale = 1.0 / math.sqrt(in_c * 9)

    def conv_fn(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "OIHW", "NHWC"),
            precision=get_precision())

    tail = model.pipeline.subsequence(first_layer=f"{layer}.noise",
                                      last_layer=f"{layer}.activate")

    def tail_fn(p, b):
        return tail(p, b)

    fast_linear_insert_solve(conv_fn, tail_fn, bag, params, goal_out, w0,
                             direction, scale, niter=edit_iters,
                             use_demod=True)
    _, _, fast_ms = fast_linear_insert_solve(
        conv_fn, tail_fn, bag, params, goal_out, w0, direction, scale,
        niter=edit_iters, use_demod=True, return_timing=True)

    print(json.dumps({
        "metric": "stylegan2_256_sampling" if not args.smoke
                  else "stylegan2_smoke_sampling",
        "value": round(img_per_sec_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec_chip / 625.0, 4),
        "total_images_per_sec": round(img_per_sec, 2),
        "devices": n_dev,
        "device_kind": jax.devices()[0].device_kind,
        "batch": batch,
        "precision": args.precision,
        "rank1_edit_solve_ms": round(edit_ms, 1),
        "rank1_fast_linear_solve_ms": round(fast_ms, 1),
        "edit_iters": edit_iters,
        "img_per_sec_by_precision": {k: round(v, 1)
                                     for k, v in rates.items()},
        "note": "baseline normalization: 5000 img/s on v5p-8 == 625/chip "
                "on chips ~2.3x faster than this one; 'high' is the "
                "fp32-tolerance parity mode (2e-4 vs torch golden)",
    }))


if __name__ == "__main__":
    main()
