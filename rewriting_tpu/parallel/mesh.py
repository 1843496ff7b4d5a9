"""Device-mesh parallelism for sampling, statistics, and multi-edit solving.

The reference is single-process single-GPU (SURVEY.md §2.10) — its only
scale-out is job-level pidfile sharding.  The TPU-native equivalents are
SPMD over a ``jax.sharding.Mesh``:

- **data-parallel sampling**: z batches sharded over the 'data' axis; the
  generator runs replicated-weights SPMD, images come back sharded (used by
  the 10k-image metric pipelines).
- **sharded second-moment accumulation**: rows sharded over 'data'; the
  xᵀx contraction over the sharded row axis makes XLA insert the psum over
  ICI automatically.
- **vmapped multi-edit solving**: N independent edit solves vmapped over a
  leading 'edit' axis and sharded across devices — N simultaneous rule
  edits for the price of one (the batched editing server configuration).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Place an array with its leading dim sharded over the mesh axis."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def sharded_sampler(model, mesh: Mesh, axis: str = "data"):
    """jitted (params, z[, noise]) -> images with z/images sharded over the
    batch axis and params replicated."""

    from ..ops.jitopts import tuned_jit

    @tuned_jit
    def sample(params, z, noise=None):
        images = (model(params, z, noise) if noise is not None
                  else model(params, z))
        return jax.lax.with_sharding_constraint(
            images, NamedSharding(mesh, P(axis)))
    return sample


def sharded_second_moment(rows_fn, mesh: Mesh, axis: str = "data"):
    """jitted z-batch -> (xᵀx, n) where the z batch is sharded over `axis`.
    The contraction over the sharded sample axis compiles to a psum over
    ICI."""

    @jax.jit
    def moment(zbatch):
        rows = rows_fn(zbatch)
        xtx = jnp.dot(rows.T, rows, precision=jax.lax.Precision.HIGHEST)
        return (jax.lax.with_sharding_constraint(
            xtx, NamedSharding(mesh, P())),
            jnp.float32(rows.shape[0]))
    return moment


def vmapped_multi_edit(insert_fn, mesh: Mesh, axis: str = "data"):
    """Batch N independent edit solves: vmap the jitted solve over stacked
    (weight0, goal_in, goal_out, direction) and shard the edit axis over
    devices. Each edit is independent, so this is embarrassingly parallel
    over ICI."""

    vsolve = jax.vmap(insert_fn)

    @jax.jit
    def run(weights0, goals_in, goals_out, directions):
        sharded = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(axis))),
            (weights0, goals_in, goals_out, directions))
        return vsolve(*sharded)
    return run


def make_mesh_2d(n_data: int, n_spatial: int,
                 axes=("data", "spatial")) -> Mesh:
    """(data x spatial) mesh for batch + spatial sharding."""
    devices = np.array(jax.devices()[:n_data * n_spatial]).reshape(
        n_data, n_spatial)
    return Mesh(devices, axes)


def spatial_sharded_sampler(model, mesh: Mesh, axis_data: str = "data",
                            axis_spatial: str = "spatial"):
    """Sampler sharding BOTH the batch and the image-height axis over the
    mesh — the scale-out design for the 1024px faces model whose per-image
    activations dominate HBM (SURVEY.md §5 'long-context' note: the
    reference has no sequence axis, its scale axes are batch x resolution).

    Only the OUTPUT (and the dominant high-resolution fmaps, via
    constraint propagation) is annotated; XLA's SPMD partitioner inserts
    the halo exchanges the 3x3 convs/FIR blurs need at shard boundaries —
    collectives ride ICI, no manual communication."""

    from ..ops.jitopts import tuned_jit

    out_sharding = NamedSharding(mesh, P(axis_data, axis_spatial))

    @tuned_jit
    def sample(params, z, noise=None):
        images = (model(params, z, noise) if noise is not None
                  else model(params, z))
        return jax.lax.with_sharding_constraint(images, out_sharding)
    return sample
