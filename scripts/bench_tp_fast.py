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
    """{collective: (op count, total output elements)} from HLO text.

    Parses every assignment whose op is a collective, including
    tuple-shaped combined collectives (``= (f32[..], f32[..])
    all-reduce(...)``) and async pairs (the ``-start`` row carries the
    shape; ``-done`` rows are skipped to avoid double counting); warns on
    any collective row whose shape it cannot parse rather than silently
    undercounting."""
    stats = {c: [0, 0] for c in COLLECTIVES}
    unparsed = 0
    pat = re.compile(r"= (.*?) (" + "|".join(COLLECTIVES)
                     + r")(-start|-done)?\(")
    for line in compiled_text.splitlines():
        m = pat.search(line)
        if m is None or m.group(3) == "-done":
            continue
        shapes = re.findall(r"\w+\[([\d,]*)\]", m.group(1))
        if not shapes:
            unparsed += 1
            continue
        n = 0
        for s in shapes:
            k = 1
            for d in s.split(","):
                if d:
                    k *= int(d)
            n += k
        stats[m.group(2)][0] += 1
        stats[m.group(2)][1] += n
    if unparsed:
        print(f"WARNING: {unparsed} collective rows had unparseable "
              "shapes; counts below are a lower bound", file=sys.stderr)
    return {c: tuple(v) for c, v in stats.items() if v[0]}


def tiny_tail_model(size=512):
    """Narrow-channel SeqStyleGAN2 whose s2d tail engages at CPU scale —
    the SAME fixture the exactness tests pin (tests/conftest.py)."""
    sys.path.insert(0, "/root/repo/tests")
    from conftest import tiny_channel_stylegan
    return tiny_channel_stylegan(size)


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
