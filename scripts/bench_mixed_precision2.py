"""Round-2 mixed-precision sweep: keep_rgb variants + batch-128 confirm.

Follows scripts/bench_mixed_precision.py (which measured the plain
per-resolution schedule); this one measures the keep-rgb-fp32 variants
and confirms the winning configs at the headline batch 128.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import jax  # noqa: E402

from bench import timeit_distinct  # noqa: E402
from rewriting_tpu.models.stylegan2 import (SeqStyleGAN2,  # noqa: E402
                                            mixed_precision_schedule)
from rewriting_tpu.ops import precision  # noqa: E402
from rewriting_tpu.ops.jitopts import tuned_jit  # noqa: E402


def main():
    model = SeqStyleGAN2(size=256, style_dim=512, n_mlp=8)
    params = model.init_params(jax.random.PRNGKey(0))

    def measure(batch, schedule, iters=8, quality=True):
        noise = model.prepare_noise(batch)
        zs = [jax.random.normal(jax.random.PRNGKey(i),
                                (batch, model.z_dim)) for i in range(iters)]
        jax.block_until_ready(zs)
        precision.set_precision("high")
        precision.set_precision_schedule(schedule)
        try:
            fwd = tuned_jit(lambda z, p, n: model(p, z, n))
            dt = timeit_distinct(fwd, zs, params, noise, iters=iters)
            rate = batch / dt
            psnr = None
            if quality:
                zq = jax.random.normal(jax.random.PRNGKey(999),
                                       (batch, model.z_dim))
                img = np.asarray(fwd(zq, params, noise), np.float32)
                precision.set_precision_schedule(None)
                precision.set_precision("highest")
                fhi = tuned_jit(lambda z, p, n: model(p, z, n))
                ref = np.asarray(fhi(zq, params, noise), np.float32)
                mse = float(np.mean((img - ref) ** 2))
                psnr = round(10.0 * np.log10(4.0 / max(mse, 1e-12)), 1)
            return rate, psnr
        finally:
            precision.set_precision_schedule(None)

    for name, mr, keep_rgb, batch in (
            ("mixed_128_rgb32_b64", 128, True, 64),
            ("mixed_64_rgb32_b64", 64, True, 64),
            ("mixed_32_rgb32_b64", 32, True, 64),
            ("mixed_256_b128", 256, False, 128),
            ("mixed_128_rgb32_b128", 128, True, 128),
    ):
        t0 = time.time()
        rate, psnr = measure(batch,
                             mixed_precision_schedule(mr,
                                                      keep_rgb=keep_rgb))
        print(json.dumps({"config": name, "rate": round(rate, 1),
                          "psnr_db": psnr,
                          "wall_s": round(time.time() - t0, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
