"""StyleGAN2 parity vs reference goldens: full forward, window activations,
truncation, and surgery at the rewriting edit window."""

import jax
import jax.numpy as jnp
import numpy as np

from rewriting_tpu.core import DataBag
from rewriting_tpu.models.stylegan2 import SeqStyleGAN2, params_from_state_dict


def nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def _golden_model(goldens, truncation=1.0):
    g = goldens("stylegan2_tiny")
    sd = {k[len("sd."):]: g[k] for k in g.files if k.startswith("sd.")}
    model = SeqStyleGAN2(size=16, style_dim=64, n_mlp=2,
                         truncation=truncation)
    params = params_from_state_dict(model, sd)
    return g, model, params


def test_forward_parity(goldens):
    g, model, params = _golden_model(goldens)
    out = model(params, jnp.asarray(g["z"]))
    np.testing.assert_allclose(nchw(out), g["out"], atol=3e-4, rtol=1e-3)


def test_window_activation_parity(goldens):
    g, model, params = _golden_model(goldens)
    z = jnp.asarray(g["z"])
    # context -> edit window split used by SeqStyleGanRewriter
    # (reference ganrewrite.py:662-665)
    context = model.pipeline.subsequence(
        upto_layer="layer3.sconv.mconv.dconv")
    window = model.pipeline.subsequence(
        first_layer="layer3.sconv.mconv.dconv",
        last_layer="layer3.sconv.activate")
    bag = DataBag(latent=z)
    bag.update(model.prepare_noise(z.shape[0]))
    kbag = context(params, bag)
    np.testing.assert_allclose(nchw(kbag["fmap"]), g["layer3_adain"],
                               atol=3e-4, rtol=1e-3)
    vbag = window(params, kbag)
    np.testing.assert_allclose(nchw(vbag["fmap"]), g["layer3_act"],
                               atol=3e-4, rtol=1e-3)


def test_dconv_only_window_parity(goldens):
    g, model, params = _golden_model(goldens)
    z = jnp.asarray(g["z"])
    context = model.pipeline.subsequence(
        upto_layer="layer3.sconv.mconv.dconv")
    dconv = model.pipeline.subsequence(
        first_layer="layer3.sconv.mconv.dconv",
        last_layer="layer3.sconv.mconv.dconv")
    bag = DataBag(latent=z)
    bag.update(model.prepare_noise(z.shape[0]))
    out = dconv(params, context(params, bag))
    np.testing.assert_allclose(nchw(out["fmap"]), g["layer3_dconv"],
                               atol=3e-4, rtol=1e-3)


def test_truncation_parity(goldens):
    gt = goldens("stylegan2_tiny_trunc")
    g, model, params = _golden_model(goldens, truncation=0.5)
    params["latents"]["latent_avg"] = jnp.asarray(gt["latent_avg"])
    out = model(params, jnp.asarray(gt["z"]))
    np.testing.assert_allclose(nchw(out), gt["out"], atol=3e-4, rtol=1e-3)


def test_fused_pipeline_matches_seq(goldens):
    """The blur-folded sampling fast path must be numerically equivalent
    to the sequential (editable) pipeline and hit the torch golden."""
    g, model, params = _golden_model(goldens)
    z = jnp.asarray(g["z"])
    a = np.asarray(model(params, z))
    b = np.asarray(model(params, z, fused=True))
    np.testing.assert_allclose(a, b, atol=1e-5)
    np.testing.assert_allclose(nchw(b), g["out"], atol=3e-4, rtol=1e-3)


def test_jit_and_random_init():
    model = SeqStyleGAN2(size=16, style_dim=32, n_mlp=2)
    params = model.init_params(jax.random.PRNGKey(1))
    z = jax.random.normal(jax.random.PRNGKey(2), (4, 32))
    fwd = jax.jit(lambda p, z, noise: model(p, z, noise))
    out = fwd(params, z, model.prepare_noise(4))
    assert out.shape == (4, 16, 16, 3)
    out2 = fwd(params, z, model.prepare_noise(4))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
