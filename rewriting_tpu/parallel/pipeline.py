"""Pipeline parallelism: a GPipe executor on shard_map + ppermute.

The reference has no pipeline axis (single GPU, SURVEY.md §2.10).  On a
TPU mesh the natural pp target is a trunk of *equal-shape* stages —
here the StyleGAN2 style MLP (n_mlp identical EqualLinear layers,
models.py:59-65): device s holds layer-group s's weights, microbatches
flow s -> s+1 over ICI via ``lax.ppermute``, and the whole schedule is
one ``lax.scan`` of M + S - 1 ticks (GPipe fill/drain bubble = (S-1)/M
of the schedule).

The conv trunk is deliberately NOT pipelined: its stage shapes grow
4x per resolution (4x4x512 -> 1024x1024x32), so a shape-homogeneous
ppermute ring would have to pad every hop to the largest fmap.  The
production scale axes for the trunk are batch (dp) and image height
(sp) — see ``mesh.spatial_sharded_sampler`` — with tp (tensor.py) as
the weight-capacity axis.  pp is provided as the generic executor for
any equal-shape stack plus the style-MLP instance.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map            # jax >= 0.8
except ImportError:                      # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def gpipe(stage_fn: Callable, stacked_params, x, mesh: Mesh,
          axis: str = "stage", n_micro: Optional[int] = None):
    """Run ``x`` through S pipeline stages laid out over mesh axis ``axis``.

    ``stacked_params``: pytree whose leaves have a leading stage axis of
    size S = mesh.shape[axis]; device s executes
    ``stage_fn(params[s], micro_batch)`` (same output shape as input).
    ``x``: (B, ...) with B divisible by ``n_micro`` (default S, the
    smallest schedule with a full ring).  Returns (B, ...) replicated.

    Schedule: classic GPipe.  Tick t, device s is active iff
    s <= t < s + M; device 0 feeds microbatch t, device S-1 banks its
    output at t - (S - 1); one non-cyclic ppermute per tick moves
    activations one hop down the ring (ICI neighbours on a TPU torus).
    """
    S = mesh.shape[axis]
    M = n_micro or S
    B = x.shape[0]
    assert B % M == 0, (B, M)

    def body(wstack, xfull):
        idx = lax.axis_index(axis)
        local = jax.tree_util.tree_map(lambda a: a[0], wstack)
        micro = xfull.reshape(M, B // M, *xfull.shape[1:])
        perm = [(i, i + 1) for i in range(S - 1)]

        def tick(carry, t):
            buf, acc = carry
            feed = micro[jnp.clip(t, 0, M - 1)]
            inp = jnp.where(idx == 0, feed, buf)
            active = (t >= idx) & (t < idx + M)
            out = jnp.where(active, stage_fn(local, inp), buf)
            o = jnp.clip(t - (S - 1), 0, M - 1)
            prev = lax.dynamic_index_in_dim(acc, o, 0, keepdims=False)
            done = (idx == S - 1) & active
            acc = lax.dynamic_update_index_in_dim(
                acc, jnp.where(done, out, prev), o, 0)
            nxt = lax.ppermute(out, axis, perm)
            return (nxt, acc), None

        # the carry is device-varying (each device holds its own in-flight
        # microbatch); mark the zero-init as such for the scan vma check
        def vary(a):
            # fall back only when pcast itself is absent; a TypeError from
            # a real pcast call (bad operand) must propagate from pcast
            pcast = getattr(lax, "pcast", None)
            if pcast is None:                    # pragma: no cover
                return lax.pvary(a, axis)        # jax < 0.8.2 spelling
            return pcast(a, axis, to="varying")
        acc0 = vary(jnp.zeros_like(micro))
        buf0 = vary(jnp.zeros_like(micro[0]))
        (_, acc), _ = lax.scan(tick, (buf0, acc0),
                               jnp.arange(M + S - 1))
        # only the last device banked real outputs; replicate them
        acc = lax.psum(jnp.where(idx == S - 1, acc, jnp.zeros_like(acc)),
                       axis)
        return acc.reshape(B, *xfull.shape[1:])

    fn = shard_map(body, mesh=mesh, in_specs=(P(axis), P()), out_specs=P())
    return fn(stacked_params, x)


def pipelined_style_mapper(model, mesh: Mesh, axis: str = "stage",
                           n_micro: Optional[int] = None):
    """jitted (params, z) -> w: the style MLP as a GPipe pipeline.

    Device s holds n_mlp/S consecutive EqualLinear layers; the latent
    pixel-norm runs replicated up front.  Bit-identical to the seq
    ``style.*`` stages (same `_equal_linear` math, same order)."""
    import math

    from ..models.stylegan2 import _equal_linear

    S = mesh.shape[axis]
    assert model.n_mlp % S == 0, (model.n_mlp, S)
    L = model.n_mlp // S
    scale = (1.0 / math.sqrt(model.style_dim)) * model.lr_mlp
    lr_mul = model.lr_mlp

    def stack(params):
        """(S, L, D, D) / (S, L, D) stacks from the style.{1..n_mlp} tree."""
        ws = jnp.stack([params[f"style.{i + 1}"]["weight"]
                        for i in range(model.n_mlp)])
        bs = jnp.stack([params[f"style.{i + 1}"]["bias"]
                        for i in range(model.n_mlp)])
        D = model.style_dim
        return {"weight": ws.reshape(S, L, D, D), "bias": bs.reshape(S, L, D)}

    def stage_fn(local, x):
        for j in range(L):
            x = _equal_linear({"weight": local["weight"][j],
                               "bias": local["bias"][j]},
                              x, scale, lr_mul, "fused_lrelu")
        return x

    @jax.jit
    def run(params, z):
        z = jnp.asarray(z)
        x = z * lax.rsqrt(jnp.mean(jnp.square(z), axis=1, keepdims=True)
                          + 1e-8)
        return gpipe(stage_fn, stack(params), x, mesh, axis=axis,
                     n_micro=n_micro)
    return run
