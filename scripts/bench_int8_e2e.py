"""End-to-end int8 W8A8 serving-tier measurement (round 5).

The microbench (scripts/bench_int8_probe.py) showed v5e int8 conv gains
on MXU-bound shapes (1.33x on b64 64x64 512ch).  This measures whether
that survives in the sampling pipeline: StyleGAN2-256 batch 128, the
mixed schedule's bf16 tail (res >= min_res) switched to the int8 tier
(ops/quant.py W8A8 per-channel path), vs the measured bf16 row — with
the same PSNR-vs-highest + random-feature Frechet quality gates as every
precision row (docs/PERF_NOTES.md).

Usage: PYTHONPATH=... python scripts/bench_int8_e2e.py [size] [batch] [iters]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import numpy as np  # noqa: E402

from bench import timeit_distinct  # noqa: E402
from rewriting_tpu.ops import precision  # noqa: E402
from rewriting_tpu.ops.jitopts import tuned_jit  # noqa: E402
from rewriting_tpu.models.stylegan2 import (SeqStyleGAN2,  # noqa: E402
                                            mixed_precision_schedule)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    model = SeqStyleGAN2(size=size, style_dim=512, n_mlp=8)
    params = model.init_params(jax.random.PRNGKey(0))
    noise = model.prepare_noise(batch)
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

    def run(sched):
        precision.set_precision("high")
        precision.set_precision_schedule(sched)
        try:
            fwd = tuned_jit(lambda z, p, n: model(p, z, n))
            t0 = time.time()
            dt = timeit_distinct(fwd, zs, params, noise, iters=iters)
            img = np.asarray(fwd(zq, params, noise), np.float32)
            stats = compute_feature_stats(
                [np.asarray(fwd(z, params, noise), np.float32)
                 for z in zqs], fe)
            return batch / dt, img, stats, time.time() - t0
        finally:
            precision.set_precision_schedule(None)

    precision.set_precision("highest")
    fhi = tuned_jit(lambda z, p, n: model(p, z, n))
    ref = np.asarray(fhi(zq, params, noise), np.float32)
    ref_stats = compute_feature_stats(
        [np.asarray(fhi(z, params, noise), np.float32) for z in zqs], fe)

    for name, mr, tier in (("mixed_128_bf16", 128, "default"),
                           ("mixed_128_int8", 128, "int8"),
                           ("mixed_64_int8", 64, "int8")):
        if mr > size:
            continue
        rate, img, stats, wall = run(mixed_precision_schedule(mr, tier=tier))
        mse = float(np.mean((img - ref) ** 2))
        psnr = round(10.0 * np.log10(4.0 / max(mse, 1e-12)), 1)
        fd = round(calculate_frechet_distance(*ref_stats, *stats), 4)
        print(json.dumps({"config": name, "rate": round(rate, 1),
                          "psnr_db": psnr, "fid_rand_features": fd,
                          "wall_s": round(wall, 1)}), flush=True)


if __name__ == "__main__":
    main()
