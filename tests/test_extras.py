"""SeqPreStyleGanRewriter, GatherTensor/gather_topk, TF converter."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rewriting_tpu.models import SeqStyleGAN2
from rewriting_tpu.models.proggan import (from_state_dict,
                                          state_dict_from_tf_parameters)
from rewriting_tpu.rewrite import SeqPreStyleGanRewriter, projected_conv
from rewriting_tpu.stats import tally
from rewriting_tpu.stats.running import GatherTensor, RunningTopK
from rewriting_tpu.utils.renormalize import mask_to_url
from rewriting_tpu.utils.zdataset import ZDataset, z_dataset_for_model
from conftest import blob




@pytest.mark.slow
def test_pre_stylegan_rewriter(goldens):
    g = goldens("stylegan2_tiny")
    sd = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
    from rewriting_tpu.models.stylegan2 import params_from_state_dict
    model = SeqStyleGAN2(size=16, style_dim=64, n_mlp=2)
    params = params_from_state_dict(model, sd)
    zds = z_dataset_for_model(model, 15)
    gw = SeqPreStyleGanRewriter(model, params, zds, layernum=3,
                                stats_batch_size=5)
    # window starts at adain: context acts are pre-style fmaps
    assert gw.firstlayer.endswith(".adain")
    vh, vw = gw.v_shape[1:3]
    req = {"object": [0, mask_to_url(blob(vh, vw, vh // 3, vw // 3, 2))],
           "paste": [1, mask_to_url(blob(vh, vw, 2 * vh // 3,
                                         2 * vw // 3, 2))]}
    w0 = np.asarray(gw.target_weight())
    gw.apply_edit(req, rank=1, niter=21)
    delta = jnp.asarray(np.asarray(gw.target_weight()) - w0)
    d = gw.multi_key_from_selection([req["paste"]], rank=1)
    np.testing.assert_allclose(np.asarray(delta),
                               np.asarray(projected_conv(delta, d)),
                               atol=1e-5)
    # style-adjusted covariance solve: C diag(s) x = k
    kbag = gw.context_of(0)
    k = np.asarray(kbag["fmap"])[0, 0, 0]
    x = np.asarray(gw.covariance_adjusted_key(k, kbag))
    cs = np.asarray(gw.c_matrix) * np.asarray(kbag["style"])[0][None, :]
    np.testing.assert_allclose(cs @ x, k, atol=1e-2, rtol=1e-3)


@pytest.mark.slow
def test_sample_image_patch(goldens):
    g = goldens("stylegan2_tiny")
    sd = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
    from rewriting_tpu.models.stylegan2 import params_from_state_dict
    from rewriting_tpu.rewrite import SeqStyleGanRewriter
    model = SeqStyleGAN2(size=16, style_dim=64, n_mlp=2)
    params = params_from_state_dict(model, sd)
    zds = z_dataset_for_model(model, 10)
    gw = SeqStyleGanRewriter(model, params, zds, layernum=4,
                             stats_batch_size=5)
    patch = gw.sample_image_patch(gw.get_z(0), act_crop_size=4,
                                  seed=(1, 2))
    assert patch.ndim == 4 and patch.shape[0] == 1
    # deterministic for a fixed seed position
    patch2 = gw.sample_image_patch(gw.get_z(0), act_crop_size=4,
                                   seed=(1, 2))
    np.testing.assert_array_equal(np.asarray(patch), np.asarray(patch2))


def test_gather_tensor_and_gather_topk():
    rng = np.random.RandomState(0)
    data = rng.randn(40, 3).astype(np.float32)
    topk = RunningTopK(k=4)
    topk.add(data)
    zds = ZDataset(rng.randn(40, 5).astype(np.float32))

    def compute(zbatch):
        # per-sample visualization row: just an identifying vector
        base = np.zeros((len(zbatch), 2), np.float32)
        return base + np.arange(len(zbatch))[:, None]

    gt = tally.gather_topk(lambda z: compute(z), zds, topk, batch_size=8)
    out = gt.result()
    assert out.shape == (3, 4, 2)
    # each gathered row should correspond to the sample's in-batch offset
    vals, idx = (np.asarray(v) for v in topk.result())
    for unit in range(3):
        for rank in range(4):
            assert out[unit, rank, 0] == idx[unit, rank] % 8


def test_tf_parameter_conversion_roundtrip():
    """Invert the documented TF->torch transform on a known state dict and
    check the converter reproduces it (proggan.py:242-295 semantics)."""
    rng = np.random.RandomState(0)
    sizes = [16, 16, 8]  # 4 layers -> 8x8 output
    # build a tiny reference-format sd
    sd = {}
    dims = [(16, 16, 4), (16, 16, 3), (16, 8, 3), (8, 8, 3)]
    for i, (in_c, out_c, k) in enumerate(dims):
        sd[f"layer{i + 1}.conv.weight"] = rng.randn(
            out_c, in_c, k, k).astype(np.float32)
        sd[f"layer{i + 1}.wscale.b"] = rng.randn(out_c).astype(np.float32)
    sd["output_8x8.conv.weight"] = rng.randn(3, 8, 1, 1).astype(
        np.float32)
    sd["output_8x8.wscale.b"] = rng.randn(3).astype(np.float32)

    # invert each documented transform to get TF-named params
    tf = {}
    names = ["4x4/Dense", "4x4/Conv", "8x8/Conv0_up", "8x8/Conv1"]
    for i, name in enumerate(names):
        w = sd[f"layer{i + 1}.conv.weight"]
        if i == 0:
            tfw = w[:, :, ::-1, ::-1].transpose(1, 0, 2, 3).reshape(
                w.shape[1], -1)
        elif i % 2 == 0:
            tfw = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
        else:
            tfw = w.transpose(2, 3, 1, 0)
        tf[f"{name}/weight"] = tfw
        tf[f"{name}/bias"] = sd[f"layer{i + 1}.wscale.b"]
    tf["ToRGB_lod0/weight"] = sd["output_8x8.conv.weight"].transpose(
        2, 3, 1, 0)
    tf["ToRGB_lod0/bias"] = sd["output_8x8.wscale.b"]

    back = state_dict_from_tf_parameters(tf)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k], err_msg=k)
    model, params = from_state_dict(back)
    assert model.sizes == sizes
