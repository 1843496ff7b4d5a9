"""ProgGAN parity vs reference golden activations + surgery semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from rewriting_tpu.core import DataBag
from rewriting_tpu.models.proggan import (ProgressiveGenerator,
                                          from_state_dict,
                                          sizes_from_state_dict)
from rewriting_tpu.utils.zdataset import standard_z_sample


def nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def _golden_model(goldens):
    g = goldens("proggan_tiny")
    sd = {k[len("sd."):]: g[k] for k in g.files if k.startswith("sd.")}
    model, params = from_state_dict(sd)
    return g, model, params


def test_sizes_from_state_dict(goldens):
    g, model, _ = _golden_model(goldens)
    assert model.sizes == [16, 16, 8, 4]
    assert model.resolution == 16
    assert model.z_dim == 16


def test_forward_parity(goldens):
    g, model, params = _golden_model(goldens)
    out = jax.jit(model.__call__)(params, jnp.asarray(g["z"]))
    np.testing.assert_allclose(nchw(out), g["out"], atol=2e-5, rtol=1e-4)


def test_intermediate_parity_and_surgery(goldens):
    g, model, params = _golden_model(goldens)
    # context = everything before layer3.conv; target = just the conv
    context = model.pipeline.subsequence(upto_layer="layer3.conv")
    target = model.pipeline.subsequence(first_layer="layer3.conv",
                                        last_layer="layer3.conv")
    rendering = model.pipeline.subsequence(after_layer="layer3.conv")
    k = context(params, DataBag(latent=jnp.asarray(g["z"])))
    # layer3 is an upscale block: context(upto=conv) ends after the 2x
    # nearest upsample, i.e. nearest-up of the captured norm output.
    want_k = g["layer3_norm_out"].repeat(2, axis=2).repeat(2, axis=3)
    np.testing.assert_allclose(nchw(k["fmap"]), want_k, atol=2e-5, rtol=1e-4)
    v = target(params, k)
    np.testing.assert_allclose(nchw(v["fmap"]), g["layer3_conv_out"],
                               atol=2e-5, rtol=1e-4)
    x = rendering(params, v)
    np.testing.assert_allclose(nchw(x["output"]), g["out"], atol=2e-5,
                               rtol=1e-4)


def test_random_init_runs():
    model = ProgressiveGenerator(sizes=[8, 8, 4])
    params = model.init_params(jax.random.PRNGKey(0))
    z = standard_z_sample(2, model.z_dim)
    out = model(params, jnp.asarray(z))
    assert out.shape == (2, 8, 8, 3)
    assert np.all(np.abs(np.asarray(out)) <= 1.0)


def test_z_prefix_stability():
    a = standard_z_sample(10, 16, seed=1)
    b = standard_z_sample(100, 16, seed=1)
    np.testing.assert_array_equal(a, b[:10])


def test_proggan_fast_s2d_tail_matches_seq():
    """pipeline_fast (nearest-up folded into the conv + s2d layout for the
    <=32-channel >=512-res tail) must be e2e-exact vs the seq pipeline,
    including the chained two-up-block case."""
    from rewriting_tpu.models import ProgressiveGenerator

    # 256-res models stay fully seq (measured faster at 256res/b64)
    m256 = ProgressiveGenerator(sizes=[32, 16, 16, 16, 16, 16, 16, 8])
    assert m256.resolution == 256 and not m256._fast_overrides
    for sizes, res in (([32, 16, 16, 16, 16, 16, 16, 16, 8], 512),
                       ([32, 16, 16, 16, 16, 16, 16, 16, 16, 8], 1024)):
        m = ProgressiveGenerator(sizes=sizes)
        assert m.resolution == res and m._fast_overrides
        p = m.init_params(jax.random.PRNGKey(0))
        z = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
        o_seq = np.asarray(m(p, z, fast=False))
        o_fast = np.asarray(m(p, z, fast=True))
        rel = np.max(np.abs(o_fast - o_seq)) / max(np.max(np.abs(o_seq)),
                                                   1e-9)
        assert rel < 1e-4, (res, rel)
    # small models have no qualifying layers: fast pipeline == seq stages
    m8 = ProgressiveGenerator(resolution=8)
    assert not m8._fast_overrides


def test_proggan_mixed_precision_schedule():
    """ProgGAN family mixed precision: stage_resolution maps every
    pipeline stage name (verified against a constructed 256 model), and
    an installed schedule overrides get_precision only inside matching
    stage scopes, with keep_rgb pinning the output_DxD RGB block (the
    numeric effect is TPU-only — CPU computes fp32 at every tier — so
    the quality/throughput table lives in docs/PERF_NOTES.md)."""
    from jax import lax
    from rewriting_tpu.models import ProgressiveGenerator
    from rewriting_tpu.models.proggan import (mixed_precision_schedule,
                                              stage_resolution)
    from rewriting_tpu.ops import precision

    m = ProgressiveGenerator(resolution=256)
    expected = {"layer1": 4, "layer2": 4, "layer3": 8, "layer4": 8,
                "layer5": 16, "layer6": 16, "layer7": 32, "layer8": 32,
                "layer9": 64, "layer10": 64, "layer11": 128,
                "layer12": 128, "layer13": 256, "layer14": 256,
                "output_256x256": 256, "input": None, "output": None}
    for s in m.pipeline.stages:
        assert stage_resolution(s.name) == expected[s.name.split(".")[0]]

    precision.set_precision("highest")
    precision.set_precision_schedule(
        mixed_precision_schedule(min_res=128, tier="default"))
    try:
        assert precision.get_precision() == lax.Precision.HIGHEST
        with precision.stage_scope("layer12.conv"):       # res 128
            assert precision.get_precision() == lax.Precision.DEFAULT
        with precision.stage_scope("layer10.conv"):       # res 64
            assert precision.get_precision() == lax.Precision.HIGHEST
        with precision.stage_scope("output_256x256.conv"):  # keep_rgb
            assert precision.get_precision() == lax.Precision.HIGHEST
        precision.set_precision_schedule(
            mixed_precision_schedule(min_res=128, tier="default",
                                     keep_rgb=False))
        with precision.stage_scope("output_256x256.conv"):
            assert precision.get_precision() == lax.Precision.DEFAULT
        # the schedule reaches real traces through StagePipeline's
        # stage_scope and never disturbs CPU fp32 output
        import numpy as np
        precision.set_precision_schedule(
            mixed_precision_schedule(min_res=128, tier="default"))
        p = m.init_params(jax.random.PRNGKey(0))
        z = jax.random.normal(jax.random.PRNGKey(1), (2, m.z_dim))
        out = np.asarray(m(p, z))
        precision.set_precision_schedule(None)
        ref = np.asarray(m(p, z))
        np.testing.assert_allclose(out, ref, rtol=0, atol=2e-6)
    finally:
        precision.set_precision_schedule(None)
