"""Compiled-Pallas validation on the real TPU: exactness vs the XLA
formulation on the production StyleGAN2 shapes, then e2e sampling rate
with the Pallas FIR path enabled.  Run standalone (a kernel fault only
kills this process; the worker restarts in ~1-2 min)."""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp
import numpy as np

from rewriting_tpu.ops.precision import set_precision
from rewriting_tpu.ops.upfirdn2d import make_kernel, upfirdn2d


def check(tag, got, want, tol):
    d = float(jnp.max(jnp.abs(got - want)))
    rel = d / float(jnp.max(jnp.abs(want)) + 1e-30)
    ok = rel < tol
    print(json.dumps({"check": tag, "max_abs": d, "rel": rel, "ok": ok}),
          flush=True)
    return ok


def main():
    set_precision("high")
    from rewriting_tpu.ops.pallas_upfirdn import (blur2d_pallas,
                                                  upsample2x_pallas)
    kern = np.asarray(make_kernel([1, 3, 3, 1]))
    ok = True

    # blur shapes: the three big post-dconv maps (2h+1 inputs) + even case
    for (n, h, c) in [(2, 257, 128), (2, 129, 256), (2, 65, 512),
                      (2, 64, 512)]:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(n, h, h, c), jnp.float32)
        k4 = jnp.asarray(kern * 4.0)
        want = upfirdn2d(x, k4, up=1, down=1, pad=(1, 1))
        got = jax.jit(lambda x: blur2d_pallas(x, kern * 4.0, (1, 1)))(x)
        jax.block_until_ready(got)
        ok &= check(f"blur_{h}x{c}", got, want, 1e-6)

    # 2x upsample (the up_rgb path shape class, C>=64 variant)
    for (n, h, c) in [(2, 64, 128), (2, 32, 256)]:
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(n, h, h, c), jnp.float32)
        pad0, pad1 = (4 - 2 + 1) // 2 + 1, (4 - 2) // 2  # factor-2 pads
        want = upfirdn2d(x, jnp.asarray(kern) * 4.0, up=2, down=1,
                         pad=(pad0, pad1))
        got = jax.jit(lambda x: upsample2x_pallas(x, kern * 4.0,
                                                  (pad0, pad1)))(x)
        jax.block_until_ready(got)
        ok &= check(f"up2_{h}x{c}", got, want, 1e-6)

    if not ok:
        print(json.dumps({"verdict": "MISMATCH - do not enable"}))
        sys.exit(1)

    # e2e sampling with the Pallas path live (probe cache already positive)
    from rewriting_tpu.models import SeqStyleGAN2
    from rewriting_tpu.ops.pallas_probe import compiled_pallas_supported
    print(json.dumps({"pallas_enabled": compiled_pallas_supported()}),
          flush=True)
    model = SeqStyleGAN2(size=256)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = 64
    zs = [jax.random.normal(jax.random.PRNGKey(i), (batch, 512))
          for i in range(4)]
    jax.block_until_ready(zs)
    noise = model.prepare_noise(batch)
    fwd = jax.jit(lambda z, p, n: model(p, z, n))
    out = fwd(zs[0], params, noise)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fwd(zs[i % 4], params, noise) for i in range(10)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 10
    print(json.dumps({"e2e_with_pallas_img_per_sec": round(batch / dt, 1),
                      "ms_per_batch": round(dt * 1000, 2)}), flush=True)


if __name__ == "__main__":
    main()
