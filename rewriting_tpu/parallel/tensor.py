"""Tensor (model) parallelism for the generator — GSPMD weight sharding.

The reference is single-GPU, so its largest model (StyleGAN2-1024) must
fit one device (SURVEY.md §2.10).  The TPU-native scale-out for *model
memory* is tensor parallelism over a mesh axis: shard the channel axes
of the big conv/linear weights, annotate nothing else, and let XLA's
SPMD partitioner insert the collectives (scaling-book recipe: pick a
mesh, annotate shardings, let XLA insert collectives).

Layout (Megatron-style alternation, expressed as GSPMD annotations):

- conv k (in trunk order layer2, layer3, ...) is **column-parallel** for
  even k — dconv weight ``(1, O, I, kh, kw)`` sharded on O, activate
  bias sharded — and **row-parallel** for odd k — weight sharded on I,
  with the adain modulation that produces the per-input-channel style
  sharded to match, so the activations stay channel-sharded between the
  pair and XLA emits one all-reduce per row layer (the conv contracts
  over the sharded I axis).
- ``to_rgb`` skips always consume a column layer's output (layer 2K),
  so their ``(1, 3, I, 1, 1)`` weight and modulation shard on I and the
  3-channel output all-reduces.
- the style MLP alternates the same way on its ``(O, I)`` weights.
- any axis not divisible by the mesh axis falls back to replication for
  that leaf (GSPMD re-shards transparently; correctness is unaffected).

This is *weight*-sharded tp: every weight shard lives on exactly one
device, which is what lets a model larger than one chip's HBM run at
all.  Throughput-wise the 256 model is batch-bound and prefers pure dp
(docs/PERF_NOTES.md); tp is the capacity axis, composable with dp on a
2-D (data x model) mesh via ``axis_data``.

Reference for what the weights are: rewrite/ganrewrite.py edits target
these same dconv tensors; tp sharding reuses the exact param tree, so a
rewriter edit applied to the host copy re-shards with ``device_put``.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_LAYER_RE = re.compile(r"^layer(\d+)\.")
_STYLE_RE = re.compile(r"^style\.(\d+)$")
_TORGB_RE = re.compile(r"^to_rgb(\d+)\.")


def _div(dim: int, n: int) -> bool:
    return dim % n == 0


def tp_param_sharding(model, params, mesh: Mesh, axis: str = "model"):
    """NamedSharding pytree for a SeqStyleGAN2 param tree: Megatron-style
    alternating column/row sharding of the conv trunk + style MLP over
    ``axis``.  Leaves whose sharded dim isn't divisible by the mesh axis
    size are replicated (GSPMD inserts the reshard)."""
    n = mesh.shape[axis]
    rep = NamedSharding(mesh, P())

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    out = {}
    for name, group in params.items():
        m = _LAYER_RE.match(name)
        s = _STYLE_RE.match(name)
        r = _TORGB_RE.match(name)
        if m:
            k = int(m.group(1)) - 2          # conv index in trunk order
            column = (k % 2 == 0)
            sub = {}
            for key, leaf in group.items():
                if name.endswith(".mconv.dconv") and key == "weight":
                    o_c, i_c = leaf.shape[1], leaf.shape[2]
                    if column and _div(o_c, n):
                        sub[key] = ns(None, axis, None, None, None)
                    elif not column and _div(i_c, n):
                        sub[key] = ns(None, None, axis, None, None)
                    else:
                        sub[key] = rep
                elif (name.endswith(".mconv.modulation") and not column
                      and _div(leaf.shape[0], n)):
                    # row layer: per-input-channel styles sharded like I
                    sub[key] = ns(axis) if leaf.ndim == 1 else ns(axis, None)
                elif (name.endswith(".activate") and key == "bias"
                      and column and _div(leaf.shape[0], n)):
                    sub[key] = ns(axis)
                else:
                    sub[key] = rep
            out[name] = sub
        elif s:
            column = ((int(s.group(1)) - 1) % 2 == 0)
            sub = {}
            for key, leaf in group.items():
                if key == "weight":          # (O, I)
                    if column and _div(leaf.shape[0], n):
                        sub[key] = ns(axis, None)
                    elif not column and _div(leaf.shape[1], n):
                        sub[key] = ns(None, axis)
                    else:
                        sub[key] = rep
                elif key == "bias" and column and _div(leaf.shape[0], n):
                    sub[key] = ns(axis)
                else:
                    sub[key] = rep
            out[name] = sub
        elif r:
            # to_rgbK consumes layer(2K)'s output: conv index 2K-2, always
            # column => its input channel axis arrives sharded.
            sub = {}
            for key, leaf in group.items():
                if key == "weight" and _div(leaf.shape[2], n):
                    sub[key] = ns(None, None, axis, None, None)
                elif key == "modulation":
                    i_c = leaf["weight"].shape[0]
                    sub[key] = ({"weight": ns(axis, None), "bias": ns(axis)}
                                if _div(i_c, n)
                                else {"weight": rep, "bias": rep})
                else:
                    sub[key] = rep
            out[name] = sub
        else:
            out[name] = jax.tree_util.tree_map(lambda _: rep, group)
    return out


def tensor_shard_params(model, params, mesh: Mesh, axis: str = "model"):
    """Place a host/replicated param tree with tp sharding: after this,
    each device holds 1/n of every big conv weight."""
    return jax.device_put(params, tp_param_sharding(model, params, mesh,
                                                    axis))


def tensor_sharded_sampler(model, mesh: Mesh, axis_model: str = "model",
                           axis_data: Optional[str] = None,
                           fast: bool = True):
    """jitted (tp-sharded params, z[, noise]) -> images.

    fast=True (default) runs the production ``pipeline_fast`` under tp:
    the s2d tail's space-to-depth reshapes interleave channel with
    spatial phase, but the tail only ever engages on <=32-channel layers,
    so GSPMD's reshards there are tiny — measured on the 8-device mesh,
    tp+fast compiles to the SAME all-reduce budget as tp+seq (9 ops,
    marginally fewer elements) plus ~4 small all-gathers (~10k elements
    total vs the ~9.1M-element activation all-reduces;
    scripts/bench_tp_fast.py, docs/PERF_NOTES.md
    round 4), so the fast tail's 2.2x layer-compute win carries over to
    the >1-chip-HBM capacity case it was built for.  fast=False selects
    the sequential pipeline (the bit-exact instrumentation/editing
    surface).  Images come back replicated, or sharded over
    ``axis_data`` for a 2-D dp x tp mesh."""
    out_spec = P(axis_data) if axis_data else P()

    @jax.jit
    def sample(params, z, noise=None):
        images = model(params, z, noise, fast=fast)
        return jax.lax.with_sharding_constraint(
            images, NamedSharding(mesh, out_spec))
    return sample
