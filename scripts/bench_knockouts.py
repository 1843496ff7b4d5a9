"""E2E stage-knockout + compiler-flag diagnostics for StyleGAN2-256 at HIGH.

Each variant is a FULL-MODEL timing (distinct pipelined inputs, outputs
referenced) with one class of stages replaced by no-ops — math-wrong but
cost-attributing: the delta vs baseline is that stage class's true e2e cost
including what XLA can(not) fuse around it.  Isolated single-op timings are
untrustworthy on this stack (docs/PERF_NOTES.md "Measurement trust levels").

Prints one JSON line per variant.
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp
import numpy as np

from rewriting_tpu.core import Stage, StagePipeline
from rewriting_tpu.models import SeqStyleGAN2
from rewriting_tpu.ops.precision import set_precision


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
    set_precision("high")
    model = SeqStyleGAN2(size=256)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = 64
    zs = [jax.random.normal(jax.random.PRNGKey(i), (batch, 512))
          for i in range(10)]
    jax.block_until_ready(zs)
    noise = model.prepare_noise(batch)

    def noop(p, d):
        return d

    def variant_pipeline(pred):
        """Pipeline with stages matching pred(name) replaced by no-ops."""
        return StagePipeline([
            Stage(s.name, noop if pred(s.name) else s.fn)
            for s in model.pipeline.stages])

    import os as _os
    _only = _os.environ.get("KNOCKOUTS_ONLY")

    def run(name, pipe):
        if _only and name != "baseline" and name not in _only.split(","):
            return None
        fwd = jax.jit(lambda z, p, n: pipe(p, model.make_bag(z, n))[
            "output"])
        dt = timeit_distinct(fwd, zs, params, noise)
        print(json.dumps({"variant": name,
                          "img_per_sec": round(batch / dt, 1),
                          "ms_per_batch": round(dt * 1000, 2)}), flush=True)
        return dt

    import os
    base = run("baseline", model.pipeline)
    if os.environ.get("KNOCKOUTS_FLAGS_ONLY"):
        flag_sweep(model, params, zs, noise, batch)
        return
    # knockouts (math-wrong; cost attribution only)
    def crop_only(p, d):
        # stand-in for blur: keep its 2h+1 -> 2h crop, skip the FIR math
        x = d["fmap"]
        h, w = x.shape[1] // 2 * 2, x.shape[2] // 2 * 2
        return dict(d, fmap=x[:, :h, :w, :])
    run("no_blur", StagePipeline([
        Stage(s.name, crop_only if s.name.endswith(".mconv.blur") else s.fn)
        for s in model.pipeline.stages]))
    run("no_noise_inject", variant_pipeline(lambda n: n.endswith(".noise")))
    run("no_activate", variant_pipeline(lambda n: n.endswith(".activate")))
    # rgb skip path: to_rgb* + up_rgb* (bag keeps missing 'output', so
    # patch the final stage to emit the fmap instead)
    def rgbless():
        stages = []
        for s in model.pipeline.stages:
            if ".rgb" in s.name or s.name.startswith("up_rgb"):
                stages.append(Stage(s.name, noop))
            elif s.name == "output":
                # reduce to a scalar: holding 10 full fmaps OOMs 16GB HBM
                stages.append(Stage(s.name,
                                    lambda p, d: dict(
                                        d, output=jnp.mean(d["fmap"]))))
            else:
                stages.append(s)
        return StagePipeline(stages)
    run("no_rgb_path", rgbless())

    # ---- blur FORMULATION variants (exact math, not knockouts) ----
    from rewriting_tpu.models.stylegan2 import _make_blur
    from rewriting_tpu.ops.upfirdn2d import (_upfirdn2d_stencil, make_kernel,
                                             upfirdn2d_matmul)

    def blur_variant(make_fn):
        stages = []
        for s in model.pipeline.stages:
            if s.name.endswith(".mconv.blur"):
                stages.append(Stage(s.name, make_fn()))
            else:
                stages.append(s)
        return StagePipeline(stages)

    kern = make_kernel([1, 3, 3, 1])

    def stencil_blur():
        # shift-and-add: fusable with surrounding elementwise ops
        def fn(p, d):
            k = jnp.asarray(kern) * 4.0  # upsample_factor**2 gain
            return dict(d, fmap=_upfirdn2d_stencil(d["fmap"], k, 1, (1, 1)))
        return fn

    def matmul_blur():
        taps = tuple(float(t) for t in np.array([1., 3., 3., 1.]) / 8.0)
        def fn(p, d):
            return dict(d, fmap=upfirdn2d_matmul(d["fmap"], taps, taps,
                                                 up=1, down=1, pad=(1, 1),
                                                 gain=4.0))
        return fn

    def sep2pass_blur():
        t1 = jnp.asarray(np.array([1., 3., 3., 1.], np.float32) / 8. * 2.)
        def fn(p, d):
            from jax import lax
            from rewriting_tpu.ops.precision import get_precision
            x = d["fmap"]
            c = x.shape[-1]
            ky = jnp.broadcast_to(t1[:, None, None, None], (4, 1, 1, c))
            kx = jnp.broadcast_to(t1[None, :, None, None], (1, 4, 1, c))
            y = lax.conv_general_dilated(
                x, ky, (1, 1), ((1, 1), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c, precision=get_precision())
            y = lax.conv_general_dilated(
                y, kx, (1, 1), ((0, 0), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c, precision=get_precision())
            return dict(d, fmap=y)
        return fn

    run("blur_stencil", blur_variant(stencil_blur))
    run("blur_matmul", blur_variant(matmul_blur))
    run("blur_sep2pass", blur_variant(sep2pass_blur))
    run("no_style_mlp", variant_pipeline(lambda n: n.startswith("style.")
                                         and n != "style.0"))

    # to_rgb reformulation: fold the style multiply into the (tiny) 1x1
    # weight instead of scaling the full fmap — same math, avoids a
    # materialized NHWC intermediate (TPU dots don't input-fuse producers)
    import math as _math
    from rewriting_tpu.models.stylegan2 import _equal_linear
    from rewriting_tpu.ops.upfirdn2d import upsample2d

    def make_to_rgb_einsum(in_c, skip):
        mod_scale = 1.0 / _math.sqrt(512)
        conv_scale = 1.0 / _math.sqrt(in_c)
        kern4 = make_kernel([1, 3, 3, 1])

        def fn(p, d):
            style = _equal_linear(p["modulation"], d["style"], mod_scale,
                                  1.0, None)                   # (B, in_c)
            w = p["weight"][0, :, :, 0, 0] * conv_scale        # (3, in_c)
            wb = style[:, :, None] * w.T[None]                 # (B, in_c, 3)
            from rewriting_tpu.ops.precision import get_precision
            out = jnp.einsum("nhwi,nio->nhwo", d["fmap"], wb,
                             precision=get_precision()) + p["bias"]
            if skip:
                prev = d["output"]
                if prev.shape[1:3] != out.shape[1:3]:
                    prev = upsample2d(prev, jnp.asarray(kern4), factor=2)
                out = out + prev
            return dict(d, output=out)
        return fn

    def to_rgb_einsum_pipeline():
        stages = []
        for s in model.pipeline.stages:
            if s.name.endswith(".rgb"):
                idx = int(s.name.split(".")[0][len("to_rgb"):])
                res = 4 * 2 ** (idx - 1)
                in_c = model.channels[res]
                stages.append(Stage(s.name,
                                    make_to_rgb_einsum(in_c, idx > 1)))
            else:
                stages.append(s)
        return StagePipeline(stages)

    run("to_rgb_einsum", to_rgb_einsum_pipeline())
    if not _only:
        flag_sweep(model, params, zs, noise, batch)


def flag_sweep(model, params, zs, noise, batch):
    # compiler-flag sweep on the unmodified pipeline
    flagsets = {
        "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
        "vmem128m": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
        "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
        "no_multilevel": {"xla_tpu_use_multilevel_scheduling": "false"},
        "aggressive_fusion": {
            "xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"},
        "licm": {"xla_tpu_enable_dot_strength_reduction": "false"},
        "bf16_sum": {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"},
        "vector_loads": {"xla_tpu_vector_load_fusion_window": "2048"},
        "mxu_batch": {"xla_tpu_enable_experimental_fusion_cost_model":
                      "true"},
    }
    for name, opts in flagsets.items():
        try:
            fwd = jax.jit(lambda z, p, n: model(p, z, n),
                          compiler_options=opts)
            dt = timeit_distinct(fwd, zs, params, noise)
            print(json.dumps({"flags": name,
                              "img_per_sec": round(batch / dt, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"flags": name, "error": str(e)[:120]}),
                  flush=True)


if __name__ == "__main__":
    main()
