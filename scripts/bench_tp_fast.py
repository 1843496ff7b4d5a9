"""Structural cost analysis: tensor-parallel seq vs fast pipelines.

Compiles the tp-sharded SeqStyleGAN2 sampler on a virtual 8-device mesh
with the s2d fast tail engaged (narrow-channel config) and counts the
collectives GSPMD inserted, summing their element counts — the evidence
that tp+fast composes without a resharding tax (see parallel/tensor.py
docstring and docs/PERF_NOTES.md round 4).

Usage: python scripts/bench_tp_fast.py  (forces the 8-device CPU mesh)
"""

import re
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from rewriting_tpu.parallel.tensor import tensor_shard_params  # noqa: E402

COLLECTIVES = ("all-reduce", "all-gather", "all-to-all",
               "collective-permute", "reduce-scatter")


def collective_stats(compiled_text: str):
    """{collective: (op count, total output elements)} from HLO text."""
    stats = {}
    for coll in COLLECTIVES:
        elems = 0
        cnt = 0
        for m in re.finditer(
                r"= (\w+)\[([\d,]*)\][^ ]* " + coll + r"\(",
                compiled_text):
            cnt += 1
            n = 1
            for d in m.group(2).split(","):
                if d:
                    n *= int(d)
            elems += n
        if cnt:
            stats[coll] = (cnt, elems)
    return stats


def tiny_tail_model(size=512):
    """Narrow-channel SeqStyleGAN2 whose s2d tail engages at CPU scale
    (mirrors tests/conftest.tiny_channel_stylegan)."""
    import rewriting_tpu.models.stylegan2 as sg
    orig = sg.CHANNELS
    sg.CHANNELS = lambda cm: {4: 16, 8: 16, 16: 16, 32: 16, 64: 16,
                              128: 16, 256: 16, 512: 8, 1024: 8}
    try:
        return sg.SeqStyleGAN2(size=size, style_dim=32, n_mlp=1)
    finally:
        sg.CHANNELS = orig


def main():
    mesh = Mesh(np.array(jax.devices()[:8]), ("model",))
    model = tiny_tail_model()
    assert model._s2d_tail, "fixture must engage the fast s2d tail"
    params = model.init_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, model.z_dim))
    noise = model.prepare_noise(2)
    placed = tensor_shard_params(model, params, mesh, axis="model")

    for fast in (False, True):
        comp = jax.jit(
            lambda p, z_, n, fast=fast: model(p, z_, n, fast=fast)
        ).lower(placed, z, noise).compile()
        label = "fast" if fast else "seq"
        print(label, collective_stats(comp.as_text()), flush=True)


if __name__ == "__main__":
    main()
