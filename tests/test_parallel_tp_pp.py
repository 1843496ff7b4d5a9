"""Tensor-parallel (parallel/tensor.py) and pipeline-parallel
(parallel/pipeline.py) executors on the virtual 8-device CPU mesh.

The reference is single-GPU (SURVEY.md §2.10); tp/pp are new TPU-native
scale axes.  These tests pin the two correctness contracts:

- gpipe: the GPipe schedule (any equal-shape stage stack, any microbatch
  count) computes exactly the sequential composition of its stages.
- tp: a Megatron-style GSPMD weight sharding of SeqStyleGAN2 changes
  device placement only — sampled images match the replicated run, and
  the big conv weights really are split (1/n per device).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rewriting_tpu.parallel.pipeline import gpipe, pipelined_style_mapper
from rewriting_tpu.parallel.tensor import (tensor_shard_params,
                                           tensor_sharded_sampler,
                                           tp_param_sharding)


def _mesh(n, axis):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis,))


@pytest.mark.parametrize("n_micro", [None, 8, 16])
def test_gpipe_matches_sequential(n_micro):
    """gpipe(S=4 affine stages) == applying the 4 stages in order,
    for the minimal (M=S), even (M=8), and oversubscribed (M=16)
    schedules."""
    mesh = _mesh(4, "stage")
    S, D, B = 4, 6, 16
    key = jax.random.PRNGKey(0)
    kw, kb, kx = jax.random.split(key, 3)
    ws = jax.random.normal(kw, (S, D, D)) / math.sqrt(D)
    bs = jax.random.normal(kb, (S, D))
    x = jax.random.normal(kx, (B, D))

    def stage_fn(p, h):
        return jnp.tanh(h @ p["w"] + p["b"])

    out = gpipe(stage_fn, {"w": ws, "b": bs}, x, mesh,
                axis="stage", n_micro=n_micro)

    ref = x
    for s in range(S):
        ref = stage_fn({"w": ws[s], "b": bs[s]}, ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("stages", [4, 8])
def test_pipelined_style_mapper_matches_seq(stages):
    """The GPipe style MLP == the seq style.{1..n_mlp} stages composed
    in order (same _equal_linear math), on 4- and 8-stage rings."""
    from rewriting_tpu.models import SeqStyleGAN2
    from rewriting_tpu.models.stylegan2 import _equal_linear

    mesh = _mesh(stages, "stage")
    model = SeqStyleGAN2(size=16, style_dim=16, n_mlp=8)
    params = model.init_params(jax.random.PRNGKey(2))
    z = jax.random.normal(jax.random.PRNGKey(3), (stages * 2, 16))

    w = pipelined_style_mapper(model, mesh, axis="stage")(params, z)

    scale = (1.0 / math.sqrt(model.style_dim)) * model.lr_mlp
    ref = z * jax.lax.rsqrt(jnp.mean(jnp.square(z), axis=1,
                                     keepdims=True) + 1e-8)
    for i in range(model.n_mlp):
        ref = _equal_linear(params[f"style.{i + 1}"], ref, scale,
                            model.lr_mlp, "fused_lrelu")
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_tp_sharding_splits_the_big_weights():
    """The annotation pass must actually shard: every divisible dconv
    weight lands split over the model axis (column layers on O, row
    layers on I), and each device holds 1/n of those weights."""
    from rewriting_tpu.models import SeqStyleGAN2

    mesh = _mesh(4, "model")
    model = SeqStyleGAN2(size=16, style_dim=16, n_mlp=2)
    params = model.init_params(jax.random.PRNGKey(0))
    sh = tp_param_sharding(model, params, mesh, axis="model")

    dconv_specs = {name: sub["weight"].spec for name, sub in sh.items()
                   if name.endswith(".mconv.dconv")}
    assert dconv_specs, "no dconv leaves annotated"
    # layer2 (conv index 0) is column: O sharded; layer3 (index 1) row: I
    assert dconv_specs["layer2.conv.mconv.dconv"] == P(
        None, "model", None, None, None)
    assert dconv_specs["layer3.sconv.mconv.dconv"] == P(
        None, None, "model", None, None)
    n_sharded = sum(1 for s in dconv_specs.values() if tuple(s) != ())
    assert n_sharded == len(dconv_specs), dconv_specs

    placed = tensor_shard_params(model, params, mesh, axis="model")
    w = placed["layer2.conv.mconv.dconv"]["weight"]
    shard_shapes = {tuple(s.data.shape) for s in w.addressable_shards}
    o_c = w.shape[1]
    assert shard_shapes == {(1, o_c // 4, w.shape[2], 3, 3)}


def test_tp_sampler_matches_replicated():
    """tp-sharded sampling == single-device sampling (placement-only
    transform; XLA inserts the all-reduces)."""
    from rewriting_tpu.models import SeqStyleGAN2

    mesh = _mesh(4, "model")
    model = SeqStyleGAN2(size=16, style_dim=16, n_mlp=2)
    params = model.init_params(jax.random.PRNGKey(5))
    z = jax.random.normal(jax.random.PRNGKey(6), (3, 16))
    noise = model.prepare_noise(3)

    ref = np.asarray(model(params, z, noise, fast=False))
    placed = tensor_shard_params(model, params, mesh, axis="model")
    out = tensor_sharded_sampler(model, mesh, axis_model="model")(
        placed, z, noise)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=2e-5)


def test_tp_composes_with_fast_tail():
    """tp sharding composes with the production fast pipeline: with the
    s2d tail engaged, the tp-sharded fast sampler matches the unsharded
    fast forward (GSPMD's tail reshards are tiny — the tail only engages
    on narrow layers; scripts/bench_tp_fast.py measures the collective
    budget vs seq)."""
    from conftest import tiny_channel_stylegan

    mesh = _mesh(8, "model")
    model = tiny_channel_stylegan(512)
    assert model._s2d_tail, "fixture must engage the fast s2d tail"
    params = model.init_params(jax.random.PRNGKey(9))
    z = jax.random.normal(jax.random.PRNGKey(10), (2, model.z_dim))
    noise = model.prepare_noise(2)

    ref = np.asarray(model(params, z, noise, fast=True))
    placed = tensor_shard_params(model, params, mesh, axis="model")
    out = tensor_sharded_sampler(model, mesh, axis_model="model",
                                 fast=True)(placed, z, noise)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=2e-5)
    # and fast under tp == seq under tp (the e2e-exactness contract holds
    # in the sharded program too)
    out_seq = tensor_sharded_sampler(model, mesh, axis_model="model",
                                     fast=False)(placed, z, noise)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_seq),
                               rtol=0, atol=2e-4)


def test_tp_composes_with_mixed_schedule():
    """An installed mixed-precision sampling schedule composes with the
    tp-sharded sampler: the per-stage scopes are plain contextvars read
    at trace time, so GSPMD sharding sees the same per-stage tiers as the
    unsharded forward and matches it (each tier may pick different conv
    algorithms even on CPU, so the reference is the unsharded forward
    under the SAME schedule)."""
    from rewriting_tpu.models.stylegan2 import mixed_precision_schedule
    from rewriting_tpu.ops import precision
    from conftest import tiny_channel_stylegan

    mesh = _mesh(8, "model")
    model = tiny_channel_stylegan(64)
    params = model.init_params(jax.random.PRNGKey(11))
    z = jax.random.normal(jax.random.PRNGKey(12), (2, model.z_dim))
    noise = model.prepare_noise(2)
    placed = tensor_shard_params(model, params, mesh, axis="model")
    precision.set_precision_schedule(mixed_precision_schedule(min_res=16))
    try:
        ref = np.asarray(model(params, z, noise))
        out = tensor_sharded_sampler(model, mesh, axis_model="model")(
            placed, z, noise)
    finally:
        precision.set_precision_schedule(None)
    # sharded reassociation at the DEFAULT-tier stages lands a few
    # elements marginally past the usual 2e-5 fp32 bound
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=5e-5)


def test_tp_composes_with_dp():
    """2x2 data x model mesh: batch sharded over `data`, weights over
    `model`; output comes back sharded on the batch axis and matches
    the replicated run."""
    from rewriting_tpu.models import SeqStyleGAN2

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.array(devs[:4]).reshape(2, 2), ("data", "model"))
    model = SeqStyleGAN2(size=16, style_dim=16, n_mlp=2)
    params = model.init_params(jax.random.PRNGKey(7))
    z = jax.random.normal(jax.random.PRNGKey(8), (4, 16))
    noise = model.prepare_noise(4)

    ref = np.asarray(model(params, z, noise, fast=False))
    placed = tensor_shard_params(model, params, mesh, axis="model")
    zs = jax.device_put(z, NamedSharding(mesh, P("data")))
    out = tensor_sharded_sampler(model, mesh, axis_model="model",
                                 axis_data="data")(placed, zs, noise)
    assert out.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=2e-5)
