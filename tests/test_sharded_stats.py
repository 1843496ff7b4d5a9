"""Mesh-sharded statistics: the sharded second-moment scan must equal the
single-device computation (psum over the virtual 8-device mesh)."""

import numpy as np
import jax

from rewriting_tpu.models import ProgressiveGenerator
from rewriting_tpu.parallel import make_mesh
from rewriting_tpu.rewrite import ProgressiveGanRewriter
from rewriting_tpu.stats import tally
from rewriting_tpu.utils.zdataset import ZDataset, z_dataset_for_model


def test_sharded_second_moment_scan_matches():
    rng = np.random.RandomState(0)
    zs = rng.randn(96, 12).astype(np.float32)

    def rows(z):
        return z * 2.0 + 1.0

    single = tally.tally_second_moment_scan(rows, zs, batch_size=16)
    mesh = make_mesh(8)
    sharded = tally.tally_second_moment_scan(rows, zs, batch_size=16,
                                             mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded.moment()),
                               np.asarray(single.moment()), rtol=1e-5,
                               atol=1e-5)


def test_rewriter_with_mesh():
    model = ProgressiveGenerator(sizes=[8, 8, 8])
    params = model.init_params(jax.random.PRNGKey(0))
    zds = z_dataset_for_model(model, 32)
    gw_single = ProgressiveGanRewriter(model, params, zds, layernum=2,
                                       stats_batch_size=8)
    gw_mesh = ProgressiveGanRewriter(model, params, zds, layernum=2,
                                     stats_batch_size=8,
                                     mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(gw_mesh.c_matrix),
                               np.asarray(gw_single.c_matrix),
                               rtol=1e-5, atol=1e-5)


def test_tally_conditional_topk():
    rng = np.random.RandomState(1)
    zds = ZDataset(rng.randn(40, 4).astype(np.float32))

    def compute(z):
        z = np.asarray(z)
        return [(1, z[z[:, 0] > 0]), (2, z[z[:, 0] <= 0])]

    ct = tally.tally_conditional_topk(compute, zds, k=3, batch_size=10)
    assert set(ct.keys()) == {1, 2}
    vals1, _ = ct.conditional(1).result()
    assert np.asarray(vals1).shape == (4, 3)
    assert float(np.asarray(vals1)[0].min()) > 0  # condition-1 rows only

def test_spatial_sharded_sampler_matches_single_device():
    """batch x height sharding over a 2x4 mesh: XLA inserts the conv/blur
    halo exchanges; output must equal the unsharded forward exactly."""
    import jax
    import jax.numpy as jnp
    from rewriting_tpu.models import SeqStyleGAN2
    from rewriting_tpu.parallel import make_mesh_2d, spatial_sharded_sampler
    from jax.sharding import NamedSharding, PartitionSpec as P

    model = SeqStyleGAN2(size=32, style_dim=32, n_mlp=2)
    params = model.init_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    noise = model.prepare_noise(4)
    want = np.asarray(model(params, z, noise))

    mesh = make_mesh_2d(2, 4)
    zs = jax.device_put(z, NamedSharding(mesh, P("data")))
    sampler = spatial_sharded_sampler(model, mesh)
    got = sampler(params, zs, noise)
    shard_shapes = {s.data.shape for s in got.addressable_shards}
    assert shard_shapes == {(2, 8, 32, 3)}, shard_shapes  # B/2, H/4
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_sample_clean_on_mesh(tmp_path):
    """The 10k-image sampling driver generates data-parallel over the
    mesh and writes identical files to the single-device run."""
    import jax
    from rewriting_tpu.metrics.sample import sample_clean
    from rewriting_tpu.models import ProgressiveGenerator
    from rewriting_tpu.parallel import make_mesh

    model = ProgressiveGenerator(sizes=[8, 8, 8])
    params = model.init_params(jax.random.PRNGKey(0))
    a, b = tmp_path / "single", tmp_path / "mesh"
    sample_clean(model, params, str(a), n=10, batch_size=8)
    sample_clean(model, params, str(b), n=10, batch_size=8,
                 mesh=make_mesh(4))
    for i in range(10):
        pa = (a / f"{i}.png").read_bytes()
        pb = (b / f"{i}.png").read_bytes()
        assert pa == pb, f"image {i} differs"


def test_fast_s2d_tail_under_mesh_sharding():
    """The production fast pipeline (s2d tail) must compile and run
    data-parallel over a device mesh — the tail's layout tricks are all
    per-sample, so batch sharding must pass through untouched."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from conftest import tiny_channel_stylegan

    m = tiny_channel_stylegan(512)
    assert m._s2d_tail
    p = m.init_params(jax.random.PRNGKey(0))
    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs).reshape(-1), ("dp",))
    z = jax.random.normal(jax.random.PRNGKey(1), (8, 32))
    zsh = jax.device_put(z, NamedSharding(mesh, P("dp", None)))
    out = jax.jit(lambda p, z: m(p, z))(p, zsh)
    ref = m(p, z, fast=False)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert out.shape == (8, 512, 512, 3) and rel < 1e-4, rel
