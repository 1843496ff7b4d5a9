"""Instrumentation (retain/edit), visualization, upsampling, and zoo
round-trips."""

import io
import os

import jax
import numpy as np
import pytest

from rewriting_tpu.core.instrument import InstrumentedPipeline
from rewriting_tpu.models import ProgressiveGenerator
from rewriting_tpu.utils import imgviz, segviz
from rewriting_tpu.utils.upsample import (convconfig_scale_offset,
                                          resize_bilinear, upsampler)
from rewriting_tpu.utils.zdataset import z_dataset_for_model


@pytest.fixture(scope="module")
def small_model():
    model = ProgressiveGenerator(sizes=[8, 8, 8])
    params = model.init_params(jax.random.PRNGKey(0))
    zds = z_dataset_for_model(model, 4)
    return model, params, zds


def test_retain_layer(small_model):
    model, params, zds = small_model
    inst = InstrumentedPipeline(model, params)
    inst.retain_layer("layer2.conv")
    out = inst(zds.zs[:2])
    assert out.shape == (2, 8, 8, 3)
    bag = inst.retained_layer("layer2.conv")
    assert bag is not None and bag["fmap"].shape[0] == 2
    # retained value equals the direct subsequence computation
    ctx = model.pipeline.subsequence(last_layer="layer2.conv")
    direct = ctx(params, model.make_bag(zds.zs[:2]))["fmap"]
    np.testing.assert_array_equal(np.asarray(bag["fmap"]),
                                  np.asarray(direct))


def test_edit_layer_rule_and_ablation(small_model):
    model, params, zds = small_model
    inst = InstrumentedPipeline(model, params)
    base = np.asarray(inst(zds.zs[:1]))
    # zeroing rule changes output; removing the edit restores it
    inst.edit_layer("layer2.conv", rule=lambda x: x * 0.0)
    edited = np.asarray(inst(zds.zs[:1]))
    assert np.abs(edited - base).max() > 1e-5
    inst.remove_edits()
    np.testing.assert_array_equal(np.asarray(inst(zds.zs[:1])), base)
    # full ablation == zeroing rule
    inst.edit_layer("layer2.conv", ablation=1.0, replacement=0.0)
    ablated = np.asarray(inst(zds.zs[:1]))
    np.testing.assert_allclose(ablated, edited, atol=1e-6)


def test_retain_and_edit_same_layer(small_model):
    """Regression: retaining and editing the same layer must not create
    duplicate hook stages."""
    model, params, zds = small_model
    inst = InstrumentedPipeline(model, params)
    inst.retain_layer("layer2.conv")
    inst.edit_layer("layer2.conv", rule=lambda x: x * 0.0)
    out = inst(zds.zs[:1])
    assert out.shape == (1, 8, 8, 3)
    # retained value is captured after the edit rule runs
    np.testing.assert_allclose(
        np.asarray(inst.retained_layer("layer2.conv")["fmap"]), 0.0)


def test_instrumented_jit(small_model):
    model, params, zds = small_model
    inst = InstrumentedPipeline(model, params)
    inst.retain_layer("layer2.relu")
    pipe = inst._instrumented()
    fwd = jax.jit(pipe.__call__)
    out = fwd(params, model.make_bag(zds.zs[:2]))
    assert any(k.startswith("_retained:") for k in out)


def test_upsample_math():
    # a stride-2 k=4 p=1 conv: centers at 2x + 0.5
    scale, offset = convconfig_scale_offset([(4, 2, 1)])
    assert scale == 2.0 and offset == 0.5
    # composition of two stride-2 convs: scale 4
    scale, _ = convconfig_scale_offset([(4, 2, 1), (4, 2, 1)])
    assert scale == 4.0
    data = np.arange(16, dtype=np.float32).reshape(4, 4)
    up = resize_bilinear(data, (8, 8))
    assert up.shape == (8, 8)
    np.testing.assert_allclose(up.min(), 0.0)
    np.testing.assert_allclose(up.max(), 15.0)
    # identity resize
    np.testing.assert_allclose(resize_bilinear(data, (4, 4)), data,
                               atol=1e-6)


def test_imgviz(small_model):
    model, params, zds = small_model
    img = np.asarray(model(params, zds.zs[:1]))[0]
    acts = np.random.RandomState(0).randn(4, 4).astype(np.float32)
    iv = imgviz.ImageVisualizer(32)
    heat = iv.heatmap(acts)
    assert heat.size == (32, 32)
    masked = iv.masked_image(img, activations=acts, percent_level=0.7)
    assert masked.size == (32, 32)
    arr = np.asarray(masked)
    assert (arr == np.array([255, 255, 0])).all(-1).any(), "border drawn"
    row = iv.image_row([heat, masked])
    assert row.size == (32 * 2 + 5, 32)


def test_border_from_mask():
    mask = np.zeros((10, 10), bool)
    mask[3:7, 3:7] = True
    border = imgviz.border_from_mask(mask, thickness=1)
    assert border.sum() > 0
    assert not (border & mask).any()  # outside border


def test_segviz():
    seg = np.random.RandomState(0).randint(0, 20, (16, 16))
    rgb = segviz.segment_visualization(seg)
    assert rgb.shape == (16, 16, 3) and rgb.dtype == np.uint8
    # label 0 is black, same labels same colors
    seg0 = np.zeros((4, 4), int)
    assert (segviz.segment_visualization(seg0) == 0).all()


def test_segviz_legend_helpers():
    # swatch_image: solid palette-colored PIL square (reference
    # segviz.py:12-14)
    sw = segviz.swatch_image(3, size=7)
    assert sw.size == (7, 7)
    arr = np.asarray(sw)
    assert (arr == arr[0, 0]).all(), "swatch is a solid color"
    palette = segviz.high_contrast_palette()
    assert tuple(arr[0, 0]) == tuple(palette[3])

    # segment_key: descending-pixel-count (swatch, name) legend
    # (reference segviz.py:17-27)
    class FakeSeg:
        def get_label_and_category_names(self):
            return ([(f"label{i}", "object") for i in range(10)], ["object"])

    seg = np.zeros((8, 8), int)
    seg[:4] = 2       # 32 px of label 2
    seg[4:6] = 5      # 16 px of label 5
    key = segviz.segment_key(seg, FakeSeg(), max_labels=2)
    assert [name for _, name in key] == ["label2", "label5"]
    assert all(sw.size == (15, 15) for sw, _ in key)
    # zero-count labels never appear even with a generous max
    key_all = segviz.segment_key(seg, FakeSeg(), max_labels=8)
    assert [name for _, name in key_all] == ["label2", "label5", "label0"]


def test_show_incremental_api():
    import rewriting_tpu.utils.show as show
    show.reset()
    # a() accumulates; flush renders the row (reference show.py:122-141)
    show.a("alpha")
    show.a("beta")
    out = show.flush()
    assert "alpha" in out and "beta" in out
    assert show.flush() is None or show.flush() == ""  # buffer cleared
    # cols triggers auto-flush (output lost outside IPython, buffer drains)
    show.a("x", cols=2)
    assert show._buffer == ["x"]
    show.a("y", cols=2)
    assert show._buffer is None
    # show() flushes pending rows first
    show.a("pending")
    out = show.show("body")
    assert "pending" in out and "body" in out
    assert out.index("pending") < out.index("body")
    # the module itself is callable (CallableModule trick,
    # reference show.py:153-164)
    assert callable(show)
    assert "direct" in show("direct")
    show.reset()


def test_upsample_source_sizing():
    from rewriting_tpu.utils.upsample import (find_sizer,
                                              image_size_from_source)

    class Resize:  # duck-typed torchvision-style sizing transform
        def __init__(self, size):
            self.size = size

    class CenterCrop:
        def __init__(self, size):
            self.size = size

    class DS:
        def __init__(self, transforms=None, transform=None):
            if transforms is not None:
                self.transforms = transforms
            if transform is not None:
                self.transform = transform

    # last sizing transform wins (reference upsample.py:179-186 walks
    # .transforms in reverse)
    ds = DS(transforms=[Resize(64), CenterCrop(32)])
    assert find_sizer(ds).size == 32
    assert image_size_from_source(ds) == (32, 32)
    # nested .transform chain
    assert image_size_from_source(DS(transform=Resize((48, 24)))) == (48, 24)
    # resolution fallback
    class Model:
        resolution = 256
    assert image_size_from_source(Model()) == (256, 256)
    assert find_sizer(None) is None
    import pytest as _pytest
    with _pytest.raises(ValueError):
        image_size_from_source(object())


def test_zoo_missing_checkpoint_message(tmp_path, monkeypatch):
    from rewriting_tpu.models import zoo
    monkeypatch.setenv("REWRITING_TPU_WEIGHTS", str(tmp_path))
    monkeypatch.setattr("urllib.request.urlretrieve",
                        lambda *a, **k: (_ for _ in ()).throw(
                            OSError("no egress")))
    with pytest.raises(FileNotFoundError) as ei:
        zoo.load_seq_stylegan("church")
    assert "stylegan2_church.pt" in str(ei.value)


def test_zoo_local_checkpoint_roundtrip(tmp_path, monkeypatch, goldens):
    """Save the golden tiny model as a torch .pt and load it via the zoo."""
    import torch
    from rewriting_tpu.models import zoo
    g = goldens("stylegan2_tiny")
    sd = {k[3:]: torch.from_numpy(g[k]) for k in g.files
          if k.startswith("sd.")}
    p = tmp_path / "tiny.pt"
    torch.save(sd, p)
    # (the real zoo entries are all style_dim=512; the tiny golden is 64,
    #  so exercise the unpickle+convert path directly)
    from rewriting_tpu.models.stylegan2 import (SeqStyleGAN2,
                                                params_from_state_dict)
    model = SeqStyleGAN2(size=16, style_dim=64, n_mlp=2)
    params = params_from_state_dict(model, zoo._torch_load_numpy(str(p)))
    out = model(params, g["z"])
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               g["out"], atol=3e-4, rtol=1e-3)
