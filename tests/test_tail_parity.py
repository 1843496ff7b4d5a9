"""Tests for the long-tail parity modules: real-image sampling
(reference utils/get_samples.py), NBB correspondence viz + missing scan
(reference baselines/neural_best_buddies/util/draw_correspondence.py,
get_missing.py), patch-FID plotting (reference
metrics/patch_metrics/plot_patch_fids.py), parallel folders and the
bit-packed segmentation dataset (reference utils/segdata.py)."""

import json
import os

import numpy as np
import pytest

from rewriting_tpu.baselines import nbbviz
from rewriting_tpu.metrics import samples as samples_mod
from rewriting_tpu.metrics.plot_patch_fids import plot_patch_fids
from rewriting_tpu.utils import sampler
from rewriting_tpu.utils.parallelfolder import ParallelImageFolders
from rewriting_tpu.utils.segdata import MultiSegmentDataset


@pytest.fixture(scope="module")
def tiny_stylegan():
    import jax
    from conftest import tiny_channel_stylegan
    model = tiny_channel_stylegan(16)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def _write_png(path, arr):
    import PIL.Image
    os.makedirs(os.path.dirname(path), exist_ok=True)
    PIL.Image.fromarray(np.asarray(arr, np.uint8)).save(path)


@pytest.fixture()
def image_dir(tmp_path):
    rng = np.random.RandomState(0)
    root = tmp_path / "imgs"
    for i in range(8):
        _write_png(str(root / f"sub{i % 2}" / f"im_{i}.png"),
                   rng.randint(0, 255, (12 + 2 * i, 10 + i, 3)))
    return str(root)


# ---------------------------------------------------------------------------
# metrics/samples.py (reference utils/get_samples.py)
# ---------------------------------------------------------------------------

def test_get_image_paths_walk_and_txt(image_dir, tmp_path):
    paths = samples_mod.get_image_paths(image_dir, 5, seed=1)
    assert len(paths) == 5 and all(p.endswith(".png") for p in paths)
    assert paths == samples_mod.get_image_paths(image_dir, 5, seed=1)
    assert paths != samples_mod.get_image_paths(image_dir, 5, seed=2)
    # .txt listing takes precedence (reference get_samples.py:35-44)
    listed = sorted(os.path.relpath(p, image_dir)
                    for p in samples_mod.get_image_paths(image_dir))[:3]
    with open(image_dir + ".txt", "w") as f:
        f.write("\n".join(listed) + "\n")
    via_txt = samples_mod.get_image_paths(image_dir, 10)
    assert sorted(os.path.relpath(p, image_dir) for p in via_txt) == listed


def test_gt_samples_shape_and_range(image_dir):
    imgs = samples_mod.get_gt_samples(image_dir, size=8, n=4)
    assert imgs.shape == (4, 8, 8, 3) and imgs.dtype == np.float32
    assert imgs.min() >= -1.0 and imgs.max() <= 1.0
    batches = list(samples_mod.gt_sample_batches(image_dir, 8, 4,
                                                 batch_size=3))
    assert [b.shape[0] for b in batches] == [3, 1]
    np.testing.assert_allclose(np.concatenate(batches), imgs, atol=0)


def test_cropped_gt_samples(image_dir):
    crops = samples_mod.get_cropped_gt_samples(
        image_dir, size=8, n=3, crop_sizes=(2, 4), seed=3)
    assert crops[0].shape == (3, 2, 2, 3)
    assert crops[1].shape == (3, 4, 4, 3)


def test_cropped_fake_samples(tiny_stylegan):
    model, params = tiny_stylegan
    crops = samples_mod.get_cropped_fake_samples(
        model, params, n=3, crop_sizes=(4,), batch_size=2)
    assert crops[0].shape[:1] == (3,) and crops[0].shape[1:3] == (4, 4)
    # per-image z contract: image i identical regardless of batch size
    again = samples_mod.get_fake_samples(model, params, n=3, batch_size=3)
    first = samples_mod.get_fake_samples(model, params, n=3, batch_size=1)
    np.testing.assert_allclose(again, first, atol=1e-5)


def test_gt_stats_runs(image_dir):
    def toy_features(images):
        flat = np.asarray(images).reshape(len(images), -1)
        return flat[:, :7]
    mu, sigma = samples_mod.gt_stats(image_dir, size=8, n=4, batch_size=2,
                                     feature_fn=toy_features)
    assert mu.shape == (7,) and sigma.shape == (7, 7)


# ---------------------------------------------------------------------------
# baselines/nbbviz.py
# ---------------------------------------------------------------------------

def test_draw_marks_shapes_and_pixels():
    img = np.zeros((20, 20, 3), np.uint8)
    sq = nbbviz.draw_square(img, (10, 10), [255, 0, 0], radius=2)
    assert sq.shape == img.shape and not img.any()  # input untouched
    assert (sq[8, 8:13] == [255, 0, 0]).all() and (sq[12, 10] == 255).any()
    assert not sq[10, 10].any()  # hollow center
    circ = nbbviz.draw_circle(img, (10, 10), [0, 255, 0], radius=4)
    assert (circ[10, 10] == [0, 255, 0]).all()
    assert (circ[10, 14] == [255, 255, 255]).all()  # border ring
    dot = nbbviz.draw_dot(img, (0, 0), [9, 9, 9])
    assert (dot[0, 0] == 9).all() and dot.sum() == 27
    # clipping near edges must not raise
    nbbviz.draw_square(img, (0, 19), [1, 1, 1], radius=3)
    nbbviz.draw_circle(img, (19, 0), [1, 1, 1])


def test_draw_correspondence_levels(tmp_path):
    a = np.zeros((16, 16, 3), np.uint8)
    b = np.full((16, 16, 3), 50, np.uint8)
    pairs = [((4, 4), (8, 8)), ((10, 3), (2, 12))]
    ma, mb = nbbviz.draw_correspondence(a, b, pairs, level=0)
    # matching colors at matched points (first palette entry = red)
    assert (ma[4, 4] == nbbviz.color_map(0)).all()
    assert (mb[8, 8] == nbbviz.color_map(0)).all()
    ma3, _ = nbbviz.draw_correspondence(a, b, pairs, level=3, radius=2)
    assert not ma3[4, 4].any()  # squares are hollow at coarse levels
    nbbviz.save_correspondence(a, b, pairs, str(tmp_path), level=1,
                               name="_x")
    assert os.path.exists(tmp_path / "A_level_1_x.png")
    assert os.path.exists(tmp_path / "B_level_1_x.png")
    assert nbbviz.draw_points(a, [(1, 1), (5, 5)], level=2).any()


def test_check_missing(tmp_path):
    src = tmp_path / "horse"
    os.makedirs(src)
    for i in (0, 1, 2, 7):
        _write_png(str(src / f"horse_{i}.png"), np.zeros((4, 4, 3)))
    (src / "notes.txt").write_text("ignored")
    results = tmp_path / "results"
    os.makedirs(results / "1")
    np.save(results / "1" / "BtoA.npy", np.zeros(2))
    os.makedirs(results / "7")  # dir exists but artifact missing
    missing = nbbviz.check_missing(str(src), str(results))
    assert missing == [0, 2, 7]
    # a source dir violating the {basename}_{num}.png contract is an
    # error, not silently "nothing missing"
    with pytest.raises(ValueError):
        nbbviz.check_missing(str(tmp_path), str(results))


# ---------------------------------------------------------------------------
# metrics/plot_patch_fids.py
# ---------------------------------------------------------------------------

def test_plot_patch_fids(tmp_path):
    results = {"church": {1: 5.0, 4: 3.0, 16: 1.0},
               "kitchen": {1: 6.0, 4: 2.5}}
    out = plot_patch_fids(results, str(tmp_path / "p" / "fids.png"))
    assert os.path.getsize(out) > 500
    # layer-sweep transpose (labels = layer numbers)
    out2 = plot_patch_fids({"6": {16: 4.0}, "8": {16: 2.0}},
                           str(tmp_path / "by_layer.png"), by_layer=True)
    assert os.path.exists(out2)
    # file-stem labels like 'layer8' carry the layer number; a label
    # with no digits is a clear error, not an int() crash
    out3 = plot_patch_fids({"layer6": {16: 4.0}},
                           str(tmp_path / "stems.png"), by_layer=True)
    assert os.path.exists(out3)
    with pytest.raises(ValueError):
        plot_patch_fids({"church": {16: 4.0}},
                        str(tmp_path / "bad.png"), by_layer=True)
    # CLI loader roundtrip
    from rewriting_tpu.metrics.plot_patch_fids import _load
    p = tmp_path / "r.json"
    p.write_text(json.dumps({"16": 4.0}))
    assert _load([str(p)], ["l8"]) == {"l8": {16: 4.0}}


# ---------------------------------------------------------------------------
# utils/parallelfolder.py + utils/segdata.py
# ---------------------------------------------------------------------------

def _make_segdataset(tmp_path, n=8):
    rng = np.random.RandomState(1)
    labels = [{"field": "object", "index": 0, "bitshift": 0,
               "bitmask": 0x3, "label": ["-", "sky", "tree", "dome"]},
              {"field": "part", "index": 1, "bitshift": 2,
               "bitmask": 0x1, "label": ["-", "window"]}]
    root = tmp_path / "segds"
    for i in range(n):
        _write_png(str(root / "img" / f"s_{i}.png"),
                   rng.randint(0, 255, (6, 6, 3)))
        seg = np.zeros((6, 6, 3), np.uint8)
        seg[..., 0] = rng.randint(0, 4, (6, 6))          # object bits
        seg[..., 1] = rng.randint(0, 2, (6, 6)) << 2     # part bit
        _write_png(str(root / "seg" / f"s_{i}.png"), seg)
    with open(root / "labelnames.json", "w") as f:
        json.dump(labels, f)
    return str(root)


def test_parallel_image_folders(tmp_path):
    ds_root = _make_segdataset(tmp_path)
    ds = ParallelImageFolders([os.path.join(ds_root, "img"),
                               os.path.join(ds_root, "seg")])
    assert len(ds) == 8 and len(ds.images[0]) == 2
    img, seg = ds[0]
    assert img.size == (6, 6)
    # stems must correspond pairwise
    for a, b in ds.images:
        assert os.path.basename(a) == os.path.basename(b)
    # unmatched extra file is an error
    _write_png(str(tmp_path / "segds" / "img" / "extra.png"),
               np.zeros((4, 4, 3)))
    with pytest.raises(ValueError):
        ParallelImageFolders([os.path.join(ds_root, "img"),
                              os.path.join(ds_root, "seg")])
    # same stem with two extensions is ambiguous, not a silent drop
    import PIL.Image
    PIL.Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(
        str(tmp_path / "segds" / "img" / "extra.jpg"))
    with pytest.raises(ValueError, match="ambiguous stem"):
        ParallelImageFolders([os.path.join(ds_root, "img")])


def test_async_fetcher_abort_on_exception():
    """Exception inside the with-block must abort (no draining through a
    possibly-faulted device) instead of consuming pending fetches."""
    from rewriting_tpu.utils.fetcher import AsyncFetcher
    consumed = []
    with pytest.raises(RuntimeError):
        with AsyncFetcher(lambda tag, arr: consumed.append(tag),
                          streams=1, window=4) as f:
            f.submit("a", np.zeros(3))
            f.submit("b", np.zeros(3))
            raise RuntimeError("device fault")
    assert consumed == []
    assert not f._futs
    # and the success path still drains in order
    with AsyncFetcher(lambda tag, arr: consumed.append(tag),
                      streams=1, window=1) as f:
        f.submit("a", np.zeros(3))
        f.submit("b", np.zeros(3))
    assert consumed == ["a", "b"]


def test_multisegment_dataset(tmp_path):
    root = _make_segdataset(tmp_path)
    ds = MultiSegmentDataset(root)
    val = MultiSegmentDataset(root, val=True)
    assert len(ds) == 6 and len(val) == 2  # 75/25 split (segdata.py:45-52)
    assert ds.categories == ["object", "part"]
    assert ds.labels == ["-", "sky", "tree", "dome", "window"]
    assert ds.label_category == [0, 0, 0, 0, 1]
    img, segout, bincount = ds[0]
    assert segout.shape == (2, 6, 6) and segout.dtype == np.int64
    # object channel decodes bits 0-1 of channel 0 into labels 0..3
    assert set(np.unique(segout[0])) <= {0, 1, 2, 3}
    # part channel decodes bit 2 of channel 1 into {0 ("-"), 4 (window)}
    assert set(np.unique(segout[1])) <= {0, 4}
    assert bincount.sum() == 2 * 36 and len(bincount) == 5
    assert bincount[4] == (segout[1] == 4).sum()
    size_limited = MultiSegmentDataset(root, size=2)
    assert len(size_limited) == 2


def test_subsample_folder(tmp_path, image_dir):
    out = str(tmp_path / "subset")
    copied = sampler.subsample_folder(image_dir, out, size=5, seed=1)
    assert len(copied) == 5 and len(os.listdir(out)) == 5
    assert copied == sorted(copied, key=copied.index)  # stable order
    again = str(tmp_path / "subset2")
    assert sampler.subsample_folder(image_dir, again, size=5, seed=1) \
        == copied
    with pytest.raises(FileExistsError):
        sampler.subsample_folder(image_dir, out, size=5)
