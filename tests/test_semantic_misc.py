"""Semantic segmenter decoders, get_fid stats, zdataset loaders."""

import jax
import numpy as np
import pytest

from rewriting_tpu.metrics.get_fid import model_stats
from rewriting_tpu.models import ProgressiveGenerator
from rewriting_tpu.segment.semantic import (C1Decoder, PPMDecoder,
                                            SemanticSegmenter,
                                            resnet50_dilated_features)
from rewriting_tpu.segment.resnet import init_resnet50
from rewriting_tpu.utils.zdataset import epoch_grouper, training_loader
from rewriting_tpu.utils.zdataset import testing_loader as eval_loader


@pytest.mark.slow
def test_dilated_resnet_output_stride():
    p = init_resnet50(jax.random.PRNGKey(0))
    x = np.zeros((1, 64, 64, 3), np.float32)
    outs = resnet50_dilated_features(p, x, dilate_scale=8)
    # dilate8: layers 3/4 keep the stride-8 resolution
    assert outs[1].shape[1:3] == (8, 8)
    assert outs[2].shape[1:3] == (8, 8)
    assert outs[3].shape[1:3] == (8, 8)
    outs16 = resnet50_dilated_features(p, x, dilate_scale=16)
    assert outs16[3].shape[1:3] == (4, 4)


@pytest.mark.slow
def test_dilated_resnet_parity(goldens):
    """Both dilated encoders match the reference's ResnetDilated exactly
    (incl. the dilate//2 rule on the formerly-strided conv)."""
    import jax.numpy as jnp
    from rewriting_tpu.segment.resnet import resnet50_from_torch
    from rewriting_tpu.segment.semantic import (
        resnet18_deepstem_from_torch, resnet18_dilated_features,
        resnet50_dilated_features)
    g = goldens("dilated_resnet")
    x = np.transpose(g["x"], (0, 2, 3, 1))
    for name, conv, feats_fn in [
            ("r18", resnet18_deepstem_from_torch,
             resnet18_dilated_features),
            ("r50", resnet50_from_torch, resnet50_dilated_features)]:
        sd = {k[len(name) + 4:]: g[k] for k in g.files
              if k.startswith(f"{name}.sd.")}
        params = conv(sd)
        feats = feats_fn(params, jnp.asarray(x), dilate_scale=8)
        for i in range(4):
            ref = g[f"{name}.feat_{i}"]
            scale = max(np.abs(ref).max(), 1e-6)
            np.testing.assert_allclose(
                np.transpose(np.asarray(feats[i]), (0, 3, 1, 2)) / scale,
                ref / scale, atol=2e-5,
                err_msg=f"{name} feat_{i}")


def test_load_segmenter_flags():
    """Flag parsing: x/c demand the semantic checkpoints (clear error
    offline); plain 'netq' builds without parts."""
    from rewriting_tpu.segment import load_segmenter
    from rewriting_tpu.segment.upernet import UPerNet
    labeldata = {"object": ["-", "a", "b"], "part": ["-", "p"],
                 "material": ["-", "m"], "scene": ["-", "s"],
                 "object_part": {"a": ["p"]}}
    object_part = {1: [1]}
    net = UPerNet({"object": 3, "part": 1, "material": 2, "scene": 2},
                  [1], object_part)
    import jax
    params = net.init_params(jax.random.PRNGKey(0))
    seg, labels = load_segmenter("netq", params=params,
                                 labeldata=labeldata)
    assert seg.segdiv == "quad"
    with pytest.raises(FileNotFoundError, match="color"):
        load_segmenter("netqc", params=params, labeldata=labeldata)


@pytest.mark.slow
def test_semantic_segmenter():
    labels = ["-", "sky", "building", "tree", "grass"]
    seg = SemanticSegmenter(None, labels, segsizes=[64])
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3),
                           minval=-1, maxval=1)
    out = seg.segment_batch(x)
    assert out.shape == (2, 1, 64, 64)
    assert out.max() < len(labels)
    score, mask = seg.predict_single_class(x, 2)
    assert score.shape == (2, 64, 64)
    labelcats, cats = seg.get_label_and_category_names()
    assert cats == ["object"] and len(labelcats) == 5


@pytest.mark.slow
def test_semantic_segmenter_uint8_matches_zc_float():
    """uint8 input (device bytes/255 -> [0,1], semantic.py
    raw_seg_prediction) must match the host zc-float pipeline up to the
    1-ulp round-trip rounding of the input bytes."""
    from rewriting_tpu.utils import renormalize
    labels = ["-", "sky", "building", "tree", "grass"]
    seg = SemanticSegmenter(None, labels, segsizes=[64])
    assert seg.accepts_uint8
    rng = np.random.RandomState(12)
    u8 = rng.randint(0, 256, (2, 64, 64, 3), np.uint8)
    zc = renormalize.renormalize(u8.astype(np.float32) / 255.0, "pt", "zc")
    pred_u = np.asarray(seg.raw_seg_prediction(u8))
    pred_f = np.asarray(seg.raw_seg_prediction(zc))
    np.testing.assert_allclose(pred_u, pred_f, rtol=1e-3, atol=1e-4)
    agree = (seg.segment_batch(u8) == seg.segment_batch(zc)).mean()
    assert agree > 0.995, agree


def test_c1_decoder_shapes():
    dec = C1Decoder(num_class=7, fc_dim=32)
    params = dec.init_params(jax.random.PRNGKey(0))
    conv_out = [None, None, None,
                np.zeros((1, 4, 4, 32), np.float32)]
    out = dec(params, conv_out, seg_size=(16, 16))
    assert out.shape == (1, 16, 16, 7)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)


def test_model_stats_smoke():
    model = ProgressiveGenerator(sizes=[8, 8, 4])
    params = model.init_params(jax.random.PRNGKey(0))
    mu, sigma = model_stats(model, params, n=12, batch_size=4,
                            feature_fn=lambda x: np.asarray(x).reshape(
                                len(x), -1)[:, :16])
    assert mu.shape == (16,) and sigma.shape == (16, 16)
    assert np.isfinite(mu).all()


def test_zdataset_loaders():
    model = ProgressiveGenerator(sizes=[8, 8, 4])
    tl = training_loader(model, batch_size=4, epoch_size=10)
    batches = [next(tl) for _ in range(6)]
    assert all(b.shape[1] == 8 for b in batches)
    # epoch 1 has 3 batches (4+4+2); batch 4 starts epoch 2 (different seed)
    assert batches[0].shape == (4, 8) and batches[2].shape == (2, 8)
    assert not np.allclose(batches[0], batches[3])
    test_batches = list(eval_loader(model, batch_size=8, test_size=20))
    assert sum(len(b) for b in test_batches) == 20
    groups = epoch_grouper(training_loader(model, 4, epoch_size=8), 2)
    first = list(next(groups))
    assert len(first) == 2


# ---------------------------------------------------------------------------
# round-2 segmodel zoo: MobileNetV2Dilated, ResNeXt101, deepsup decoders
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_mobilenetv2_dilated_parity(goldens):
    """MobileNetV2Dilated encoder matches the reference exactly, including
    the _nostride_dilate rewrite of blocks 7-17 and the original-stride
    residual rule (reference segmodel/models.py:272-325)."""
    import jax.numpy as jnp
    from rewriting_tpu.segment.semantic import (
        mobilenetv2_dilated_features, mobilenetv2_from_torch)
    g = goldens("segzoo")
    x = np.transpose(g["x"], (0, 2, 3, 1))
    sd = {k[len("mbv2.sd."):]: g[k] for k in g.files
          if k.startswith("mbv2.sd.")}
    params = mobilenetv2_from_torch(sd)
    feats = mobilenetv2_dilated_features(params, jnp.asarray(x),
                                         dilate_scale=8)
    assert len(feats) == 5
    for i in range(5):
        ref = g[f"mbv2.feat_{i}"]
        scale = max(np.abs(ref).max(), 1e-6)
        np.testing.assert_allclose(
            np.transpose(np.asarray(feats[i]), (0, 3, 1, 2)) / scale,
            ref / scale, atol=3e-5, err_msg=f"mbv2 feat_{i}")


@pytest.mark.slow
def test_resnext101_parity(goldens):
    """ResNeXt101 (grouped bottlenecks, deep stem, undilated Resnet
    wrapper) matches the reference (segmodel/resnext.py:32-135)."""
    import jax.numpy as jnp
    from rewriting_tpu.segment.semantic import (resnext101_features,
                                                resnext101_from_torch)
    g = goldens("segzoo")
    x = np.transpose(g["x"], (0, 2, 3, 1))
    sd = {k[len("rnx.sd."):]: g[k] for k in g.files
          if k.startswith("rnx.sd.")}
    params = resnext101_from_torch(sd)
    feats = resnext101_features(params, jnp.asarray(x))
    assert feats[3].shape[-1] == 2048
    for i in range(4):
        ref = g[f"rnx.feat_{i}"]
        scale = max(np.abs(ref).max(), 1e-6)
        np.testing.assert_allclose(
            np.transpose(np.asarray(feats[i]), (0, 3, 1, 2)) / scale,
            ref / scale, atol=5e-5, err_msg=f"rnx feat_{i}")


def test_deepsup_decoders_parity(goldens):
    """PPMDeepsup / C1DeepSup at inference == PPM / C1 with the same
    conv_last key layout (reference segmodel/models.py:327-498)."""
    import jax.numpy as jnp
    from rewriting_tpu.segment.semantic import (C1DeepSupDecoder,
                                                PPMDeepsupDecoder)
    g = goldens("segzoo")
    conv5 = jnp.asarray(np.transpose(g["ppmds.conv5"], (0, 2, 3, 1)))
    conv4 = jnp.asarray(np.transpose(g["ppmds.conv4"], (0, 2, 3, 1)))
    for name, cls in [("ppmds", PPMDeepsupDecoder),
                      ("c1ds", C1DeepSupDecoder)]:
        sd = {k[len(name) + 4:]: g[k] for k in g.files
              if k.startswith(f"{name}.sd.")}
        dec = cls(num_class=7, fc_dim=64)
        params = dec.params_from_torch(sd)
        out = dec(params, [conv4, conv5], seg_size=(32, 32))
        ref = g[f"{name}.out"]
        np.testing.assert_allclose(
            np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, atol=2e-5,
            err_msg=name)


@pytest.mark.slow
def test_semantic_segmenter_new_archs():
    """The new archs run through the full SemanticSegmenter pipeline."""
    from rewriting_tpu.segment.semantic import SemanticSegmenter
    labels = ["-", "a", "b"]
    rng = np.random.RandomState(0)
    imgs = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    for arch, dec in [("mobilenetv2dilated", "c1_deepsup"),
                      ("resnext101", "ppm_deepsup")]:
        seg = SemanticSegmenter(None, labels, decoder=dec, arch=arch,
                                segsizes=[64])
        out = seg.segment_batch(imgs)
        assert out.shape == (1, 1, 64, 64)
        assert out.max() < len(labels)
