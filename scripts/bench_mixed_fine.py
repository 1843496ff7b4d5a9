"""Fine-grained mixed-precision sweep at the capacity scales (round 5).

The round-4 per-resolution sweeps (docs/PERF_NOTES.md) showed the >=50 dB
quality gate forces min_res=model_size at 512/1024 — the next step down
(bf16 for the top TWO resolutions) overshoots: mixed_512@1024 = 49.8 dB,
0.2 dB under the gate.  The per-resolution knob moves two styled convs at
once; this sweep tests the finer knob: bf16 for the top resolution plus
ONE of the two second-resolution convs (each resolution r >= 8 has two
layer stages, layer(2k+1)/layer(2k+2) — stylegan2.stage_resolution).

Usage:  PYTHONPATH=... python scripts/bench_mixed_fine.py [size] [batch] [iters]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import jax  # noqa: E402
jax.config.update("jax_compilation_cache_dir", ".jax_cache")

from bench import timeit_distinct  # noqa: E402
from rewriting_tpu.ops import precision  # noqa: E402
from rewriting_tpu.ops.jitopts import tuned_jit  # noqa: E402
from rewriting_tpu.models.stylegan2 import (SeqStyleGAN2,  # noqa: E402
                                            mixed_precision_schedule,
                                            stage_resolution)


def pinned_schedule(min_res, pinned):
    """mixed_precision_schedule(min_res) but with the named layer stages
    pinned at the global tier regardless of resolution."""
    base = mixed_precision_schedule(min_res)

    def schedule(stage_name):
        if any(stage_name.startswith(p + ".") or stage_name == p
               for p in pinned):
            return None
        return base(stage_name)
    return schedule


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    model = SeqStyleGAN2(size=size, style_dim=512, n_mlp=8)
    params = model.init_params(jax.random.PRNGKey(0))
    noise = model.prepare_noise(batch)
    zs = [jax.random.normal(jax.random.PRNGKey(i), (batch, model.z_dim))
          for i in range(iters)]
    jax.block_until_ready(zs)
    zq = jax.random.normal(jax.random.PRNGKey(999), (batch, model.z_dim))

    # layer stages at the second-highest resolution (two of them)
    second = size // 2
    seconds = sorted(
        {n.split(".")[0] for n in model.pipeline.stage_names()
         if n.startswith("layer")
         and stage_resolution(n) == second})
    assert len(seconds) == 2, seconds

    def run(name, sched):
        precision.set_precision("high")
        precision.set_precision_schedule(sched)
        try:
            fwd = tuned_jit(lambda z, p, n: model(p, z, n))
            t0 = time.time()
            dt = timeit_distinct(fwd, zs, params, noise, iters=iters)
            rate = batch / dt
            img = np.asarray(fwd(zq, params, noise), np.float32)
            return rate, img, time.time() - t0
        finally:
            precision.set_precision_schedule(None)

    precision.set_precision("highest")
    fhi = tuned_jit(lambda z, p, n: model(p, z, n))
    ref = np.asarray(fhi(zq, params, noise), np.float32)

    configs = [
        (f"mixed_{size}", mixed_precision_schedule(size)),
        (f"mixed_{second}", mixed_precision_schedule(second)),
        (f"mixed_{second}_pin_{seconds[0]}",
         pinned_schedule(second, [seconds[0]])),
        (f"mixed_{second}_pin_{seconds[1]}",
         pinned_schedule(second, [seconds[1]])),
    ]
    for name, sched in configs:
        rate, img, wall = run(name, sched)
        mse = float(np.mean((img - ref) ** 2))
        psnr = round(10.0 * np.log10(4.0 / max(mse, 1e-12)), 1)
        print(json.dumps({"config": name, "rate": round(rate, 1),
                          "psnr_db": psnr, "wall_s": round(wall, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
