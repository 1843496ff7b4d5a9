"""The fused single-pass pipeline (metrics/fused_pipeline.py) must
produce byte-identical artifacts to the staged drivers it replaces
(sample_clean -> seg_stats.process -> compute_feature_stats): same PNGs,
same per-image label npz, same feature stats."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rewriting_tpu.metrics import fid as fid_mod
from rewriting_tpu.metrics import seg_stats
from rewriting_tpu.metrics.fused_pipeline import run_fused
from rewriting_tpu.metrics.sample import sample_clean


@pytest.fixture(scope="module")
def tiny_model():
    from conftest import tiny_channel_stylegan
    model = tiny_channel_stylegan(16)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


class ToySeg:
    """Minimal segmenter exposing the async device path the real
    FaceSegmenter has (segment/faceparse.py segment_batch_device)."""

    @staticmethod
    @jax.jit
    def _labels(xs):
        return (xs[..., 0] > 127).astype(jnp.uint8)[:, None]

    def segment_batch_device(self, xs, downsample: int = 1):
        assert downsample == 1
        return self._labels(jnp.asarray(xs))

    def segment_batch(self, xs, downsample: int = 1):
        return np.asarray(self.segment_batch_device(xs)).astype(np.int64)


class ToyFeatures:
    """Feature extractor with the device_features contract of
    metrics/fid.FeatureExtractor."""

    @staticmethod
    @jax.jit
    def _feats(xs):
        x = jnp.asarray(xs, jnp.float32) / 255.0
        return x.reshape(x.shape[0], -1)[:, :12]

    def device_features(self, images):
        return self._feats(jnp.asarray(images))

    def __call__(self, images):
        return np.asarray(self.device_features(images))


def test_fused_matches_staged(tmp_path, tiny_model):
    model, params = tiny_model
    # n > 10 crosses the lexicographic/numeric filename ordering boundary
    # ('10.png' < '2.png' lexicographically): the staged FID re-read must
    # still stream in generation order for bit-identical stats
    n, bs = 12, 4

    # staged reference run
    staged_img = str(tmp_path / "staged_imgs")
    staged_seg = str(tmp_path / "staged_segs")
    sample_clean(model, params, staged_img, n=n, batch_size=bs)
    seg_stats.process(ToySeg(), staged_img, staged_seg, n=n, batch_size=bs)
    mu_s, sig_s = fid_mod.compute_feature_stats(
        fid_mod._image_dir_batches(staged_img, bs, as_uint8=True),
        ToyFeatures())

    # fused run
    fused_img = str(tmp_path / "fused")
    mu_f, sig_f = run_fused(model, params, fused_img, segmodel=ToySeg(),
                            feature_fn=ToyFeatures(), n=n, batch_size=bs,
                            stats_path=str(tmp_path / "stats.npz"))

    # identical PNG bytes per image
    for i in range(n):
        with open(os.path.join(staged_img, f"{i}.png"), "rb") as f:
            a = f.read()
        with open(os.path.join(fused_img, f"{i}.png"), "rb") as f:
            b = f.read()
        assert a == b, f"image {i} differs"
    assert os.path.exists(os.path.join(fused_img, "+lightbox.html"))

    # identical labels (int64 artifact contract)
    for i in range(n):
        a = np.load(os.path.join(staged_seg, f"{i}.npz"))["seg"]
        b = np.load(os.path.join(fused_img, "seg", f"{i}.npz"))["seg"]
        assert a.dtype == b.dtype == np.int64
        np.testing.assert_array_equal(a, b)

    # bit-identical feature statistics (same values, same batch
    # partitioning, same Chan-update order)
    np.testing.assert_array_equal(mu_f, mu_s)
    np.testing.assert_array_equal(sig_f, sig_s)
    st = np.load(tmp_path / "stats.npz")
    np.testing.assert_array_equal(st["mu"], mu_f)


def test_fused_sample_only(tmp_path, tiny_model):
    model, params = tiny_model
    out = str(tmp_path / "imgs_only")
    assert run_fused(model, params, out, n=3, batch_size=2) is None
    assert len(glob.glob(os.path.join(out, "*.png"))) == 3
    assert not os.path.exists(os.path.join(out, "seg"))


def test_fused_duck_typed_segmenter(tmp_path, tiny_model):
    """A segmenter without segment_batch_device gets the seg_stats
    contract — zc float batches — and produces the same label artifacts
    as the staged driver."""
    model, params = tiny_model

    class HostSeg:
        def segment_batch(self, xs):
            xs = np.asarray(xs)
            assert xs.dtype == np.float32 and xs.min() < -0.01, \
                "duck-typed segmenters must receive zc floats"
            return (xs[..., 1] > 0).astype(np.int64)[:, None]

    staged_img = str(tmp_path / "duck_staged_imgs")
    staged_seg = str(tmp_path / "duck_staged_segs")
    sample_clean(model, params, staged_img, n=3, batch_size=2)
    seg_stats.process(HostSeg(), staged_img, staged_seg, n=3, batch_size=2)

    out = str(tmp_path / "duck")
    run_fused(model, params, out, segmodel=HostSeg(), n=3, batch_size=2)
    segs = sorted(glob.glob(os.path.join(out, "seg", "*.npz")))
    assert len(segs) == 3
    for i in range(3):
        a = np.load(os.path.join(staged_seg, f"{i}.npz"))["seg"]
        b = np.load(os.path.join(out, "seg", f"{i}.npz"))["seg"]
        assert a.dtype == b.dtype == np.int64
        np.testing.assert_array_equal(a, b)

    # seg_downsample forwards to any segment_batch that accepts it (all
    # in-repo segmenters do); a minimal duck segmenter without the kwarg
    # fails loudly only when a non-default downsample is requested
    class DownSeg(HostSeg):
        def segment_batch(self, xs, downsample=1):
            return super().segment_batch(xs)[:, :, ::downsample, ::downsample]

    out3 = str(tmp_path / "duck3")
    run_fused(model, params, out3, segmodel=DownSeg(), n=2, batch_size=2,
              seg_downsample=2)
    seg = np.load(os.path.join(out3, "seg", "0.npz"))["seg"]
    full = np.load(os.path.join(out, "seg", "0.npz"))["seg"]
    assert seg.shape[-1] == full.shape[-1] // 2

    with pytest.raises(TypeError, match="downsample"):
        run_fused(model, params, str(tmp_path / "duck2"),
                  segmodel=HostSeg(), n=2, batch_size=2, seg_downsample=2)
