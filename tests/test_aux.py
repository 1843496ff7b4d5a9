"""Aux subsystems: profiling timers, params checkpoint IO, StyleGAN
dissection."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rewriting_tpu.utils.paramio import load_params, save_params
from rewriting_tpu.utils.profiling import annotate, timed


def test_timed():
    f = jax.jit(lambda x: x * 2 + 1)
    out, ms = timed(f, jnp.arange(8.0), iters=3)
    np.testing.assert_allclose(np.asarray(out), np.arange(8.0) * 2 + 1)
    assert ms >= 0.0
    with annotate("region"):
        pass


def test_paramio_roundtrip(tmp_path):
    from rewriting_tpu.segment.resnet import init_resnet18
    params = {"a": {"weight": jnp.arange(6.0).reshape(2, 3),
                    "bias": jnp.zeros(2)},
              "resnet": init_resnet18(jax.random.PRNGKey(0)),
              "scalar": jnp.float32(3.5)}
    path = str(tmp_path / "ckpt.npz")
    save_params(path, params)
    loaded = load_params(path)
    # structure round-trips, including the list-of-blocks resnet layers
    assert isinstance(loaded["resnet"]["layer1"], list)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_edited_params_roundtrip(tmp_path):
    """Persisting an edited model for serving: edit -> save -> load ->
    identical renders."""
    from rewriting_tpu.models import ProgressiveGenerator
    from rewriting_tpu.rewrite import ProgressiveGanRewriter
    from rewriting_tpu.utils.renormalize import mask_to_url
    from rewriting_tpu.utils.zdataset import z_dataset_for_model

    def blob(h, w, cy, cx, r):
        yy, xx = np.mgrid[0:h, 0:w]
        return ((yy - cy) ** 2 + (xx - cx) ** 2
                <= r * r).astype(np.float32)

    model = ProgressiveGenerator(sizes=[8, 8, 8])
    params = model.init_params(jax.random.PRNGKey(0))
    zds = z_dataset_for_model(model, 10)
    gw = ProgressiveGanRewriter(model, params, zds, layernum=2,
                                stats_batch_size=5)
    vh, vw = gw.v_shape[1:3]
    gw.apply_edit({"object": [0, mask_to_url(blob(vh, vw, 1, 1, 1))],
                   "paste": [1, mask_to_url(blob(vh, vw, 2, 2, 1))]},
                  rank=1, niter=11)
    path = str(tmp_path / "edited.npz")
    save_params(path, gw.params)
    loaded = load_params(path)
    a = np.asarray(model(gw.params, zds.zs[:2]))
    b = np.asarray(model(loaded, zds.zs[:2]))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_dissect_on_stylegan(tmp_path, goldens):
    """Dissection works on the StyleGAN2 pipeline (bag carries noise)."""
    from rewriting_tpu.dissect import dissect
    from rewriting_tpu.models import SeqStyleGAN2
    from rewriting_tpu.models.stylegan2 import params_from_state_dict
    g = goldens("stylegan2_tiny")
    sd = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
    model = SeqStyleGAN2(size=16, style_dim=64, n_mlp=2)
    params = params_from_state_dict(model, sd)

    class ToySeg:
        def segment_batch(self, imgs, downsample=1):
            imgs = np.asarray(imgs)
            return np.where(imgs[..., 0] > 0, 1, 2).astype(
                np.int64)[:, None]

    out = str(tmp_path / "sg" / "layer3" / "toy" / "20")
    rec = dissect(model, params, "layer3.sconv", ToySeg(),
                  ["-", "red", "notred"], out, sample_size=20,
                  batch_size=5, upsample_to=(8, 8), topk_k=2)
    assert len(rec["units"]) == params[
        "layer3.sconv.activate"]["bias"].shape[0]
    assert os.path.exists(os.path.join(out, "imgs/unit_0.png"))
