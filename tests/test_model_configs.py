"""Published model configurations construct with the right topology
(sizes 256/512/1024, the zoo table's shapes)."""

import numpy as np
import pytest

from rewriting_tpu.models import ProgressiveGenerator, SeqStyleGAN2
from rewriting_tpu.models.zoo import PROGGAN_ZOO, STYLEGAN2_ZOO


@pytest.mark.parametrize("size,n_latent,last_layer", [
    (256, 14, "layer14"), (512, 16, "layer16"), (1024, 18, "layer18")])
def test_stylegan2_topology(size, n_latent, last_layer):
    m = SeqStyleGAN2(size=size)
    assert m.n_latent == n_latent
    names = m.pipeline.stage_names()
    assert f"{last_layer}.sconv.activate" in names
    assert f"to_rgb{int(np.log2(size)) - 1}.rgb" in names
    # channel schedule at the top resolution (channel_multiplier=2)
    spec = m._param_specs[f"{last_layer}.sconv.mconv.dconv"]
    want_c = {256: 128, 512: 64, 1024: 32}[size]
    assert spec[2] == want_c  # out channels
    # edit-window names exist for every published layernum
    for layernum in (6, 8, 10):
        if layernum <= 2 * int(np.log2(size)) - 2:
            assert f"layer{layernum}.sconv.mconv.dconv" in names


def test_proggan_topology():
    m = ProgressiveGenerator(resolution=256)
    assert m.resolution == 256 and m.z_dim == 512
    names = m.pipeline.stage_names()
    assert "layer14.conv" in names and "output_256x256.conv" in names
    m2 = ProgressiveGenerator(resolution=1024)
    assert m2.resolution == 1024


@pytest.mark.slow
def test_rewriter_boundary_layers(goldens):
    """The edit window works at layer2 (which uses the 'conv' prefix in the
    reference naming) and at the last layer."""
    import jax
    import numpy as np
    from rewriting_tpu.models.stylegan2 import params_from_state_dict
    from rewriting_tpu.rewrite import SeqStyleGanRewriter
    from rewriting_tpu.utils.zdataset import z_dataset_for_model
    g = goldens("stylegan2_tiny")
    sd = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
    model = SeqStyleGAN2(size=16, style_dim=64, n_mlp=2)
    params = params_from_state_dict(model, sd)
    zds = z_dataset_for_model(model, 10)
    for layernum in (2, 6):  # first ('conv' prefix) and last layer
        gw = SeqStyleGanRewriter(model, params, zds, layernum,
                                 stats_batch_size=5)
        assert gw.target_weight().ndim == 5
        out = gw.sample_image_from_latent(gw.get_z(0))
        assert np.asarray(out).shape == (1, 16, 16, 3)


def test_zoo_tables():
    assert set(STYLEGAN2_ZOO) == {"bedroom", "car", "cat", "church",
                                  "faces", "horse", "kitchen", "places"}
    assert STYLEGAN2_ZOO["car"][1] == 512
    assert STYLEGAN2_ZOO["faces"][1] == 1024
    assert len(PROGGAN_ZOO) == 8
