"""Sweep the per-layer mixed-precision schedule on real TPU.

For each transition resolution, stages with output res >= min_res run
their convs at bf16 MXU precision ('default') while the trunk keeps fp32
('high'/'highest' global).  Measures throughput (distinct pipelined
inputs, outputs referenced — bench.py recipe) and quality vs the fp32
'highest' render (PSNR + random-feature Frechet delta).

Usage:  PYTHONPATH=... python scripts/bench_mixed_precision.py \
            [size] [batch] [iters] [family]
family: stylegan2 (default) or proggan (models/proggan.py schedule).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import materialize, timeit_distinct  # noqa: E402
from rewriting_tpu.ops import precision  # noqa: E402
from rewriting_tpu.ops.jitopts import tuned_jit  # noqa: E402


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    family = sys.argv[4] if len(sys.argv) > 4 else "stylegan2"
    if family == "proggan":
        from rewriting_tpu.models.proggan import (ProgressiveGenerator,
                                                  mixed_precision_schedule)
        model = ProgressiveGenerator(resolution=size)
        noise = None
    else:
        from rewriting_tpu.models.stylegan2 import (SeqStyleGAN2,
                                                    mixed_precision_schedule)
        model = SeqStyleGAN2(size=size, style_dim=512, n_mlp=8)
        noise = model.prepare_noise(batch)
    params = model.init_params(jax.random.PRNGKey(0))
    zs = [jax.random.normal(jax.random.PRNGKey(i), (batch, model.z_dim))
          for i in range(iters)]
    jax.block_until_ready(zs)
    zq = jax.random.normal(jax.random.PRNGKey(999), (batch, model.z_dim))

    from rewriting_tpu.metrics.fid import (FeatureExtractor,
                                           calculate_frechet_distance,
                                           compute_feature_stats)
    fe = FeatureExtractor(params=None, batch_size=batch, allow_random=True)
    zqs = [jax.random.normal(jax.random.PRNGKey(1000 + i),
                             (batch, model.z_dim)) for i in range(4)]

    def run(config_name, global_tier, min_res):
        precision.set_precision(global_tier)
        precision.set_precision_schedule(
            None if min_res is None
            else mixed_precision_schedule(min_res=min_res))
        try:
            fwd = (tuned_jit(lambda z, p: model(p, z)) if noise is None
                   else tuned_jit(lambda z, p, n: model(p, z, n)))
            extra = () if noise is None else (noise,)
            t0 = time.time()
            dt = timeit_distinct(fwd, zs, params, *extra, iters=iters)
            rate = batch / dt
            img = np.asarray(fwd(zq, params, *extra), np.float32)
            mus = compute_feature_stats(
                [np.asarray(fwd(z, params, *extra), np.float32)
                 for z in zqs], fe)
            return dict(rate=round(rate, 1), img=img, stats=mus,
                        wall=round(time.time() - t0, 1))
        finally:
            precision.set_precision_schedule(None)

    results = {}
    ref = run("highest", "highest", None)
    results["highest"] = {"img_per_sec": ref["rate"]}
    print(json.dumps({"config": "highest", "rate": ref["rate"]}),
          flush=True)

    configs = [("high", "high", None)]
    for mr in (1024, 512, 256, 128, 64, 32, 16):
        if mr <= size:
            configs.append((f"mixed_{mr}", "high", mr))
    configs.append(("default", "default", None))

    for name, tier, mr in configs:
        out = run(name, tier, mr)
        mse = float(np.mean((out["img"] - ref["img"]) ** 2))
        psnr = round(10.0 * np.log10(4.0 / max(mse, 1e-12)), 1)
        fd = round(calculate_frechet_distance(*ref["stats"],
                                              *out["stats"]), 4)
        results[name] = {"img_per_sec": out["rate"], "psnr_db": psnr,
                         "fid_rand_features": fd}
        print(json.dumps({"config": name, "rate": out["rate"],
                          "psnr_db": psnr, "fid_rand_features": fd,
                          "wall_s": out["wall"]}), flush=True)

    print("RESULT " + json.dumps({"family": family,
                                  "size": size, "batch": batch,
                                  "results": results}), flush=True)


if __name__ == "__main__":
    main()
