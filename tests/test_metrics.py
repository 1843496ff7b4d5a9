"""Metrics machinery: Frechet distance, feature stats, Inception/LPIPS
pipelines (random weights — shapes/invariances), sampling drivers, and the
effectiveness/damage metrics on toy data."""

import os

import jax
import numpy as np
import pytest

from rewriting_tpu.metrics import fid as fid_mod
from rewriting_tpu.metrics import seg_correct_mod, distances
from rewriting_tpu.metrics.lpips import LPIPS
from rewriting_tpu.metrics.sample import per_image_z, sample_clean
from rewriting_tpu.models import ProgressiveGenerator
from rewriting_tpu.utils import renormalize


def test_frechet_distance_identity_and_analytic():
    rng = np.random.RandomState(0)
    mu = rng.randn(8)
    a = rng.randn(8, 8)
    sigma = a @ a.T + np.eye(8)
    assert abs(fid_mod.calculate_frechet_distance(mu, sigma, mu, sigma)) \
        < 1e-6
    # diagonal analytic case
    mu1, mu2 = np.zeros(4), np.ones(4)
    s1 = np.diag([1.0, 2.0, 3.0, 4.0])
    s2 = np.diag([2.0, 2.0, 1.0, 1.0])
    want = (np.sum((mu1 - mu2) ** 2)
            + np.sum(np.diag(s1) + np.diag(s2)
                     - 2 * np.sqrt(np.diag(s1) * np.diag(s2))))
    got = fid_mod.calculate_frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_feature_stats_stream_equals_direct():
    rng = np.random.RandomState(1)
    feats = rng.randn(300, 6).astype(np.float32)
    mu, sigma = fid_mod.compute_feature_stats(
        (feats[i:i + 64] for i in range(0, 300, 64)), lambda x: x)
    np.testing.assert_allclose(mu, feats.mean(0), atol=1e-5)
    np.testing.assert_allclose(sigma, np.cov(feats.T), atol=1e-4)


def test_feature_extractor_uint8_matches_host_fp32():
    """uint8 batches (device-normalized, metrics/inception.py) must give
    the same features as the host read/255 -> renormalize zc pipeline up
    to the <=1-ulp input rounding difference (XLA folds /255*2 into one
    multiply; see the inception.py normalize comment)."""
    from rewriting_tpu.utils import renormalize
    fe = fid_mod.FeatureExtractor(params=None, batch_size=4,
                                  allow_random=True)
    rng = np.random.RandomState(3)
    u8 = rng.randint(0, 256, (2, 64, 64, 3), np.uint8)
    host = renormalize.renormalize(u8.astype(np.float32) / 255.0,
                                   "pt", "zc")
    a, b = fe(u8), fe(host)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)
    # async device handle is exactly the blocking call's value
    np.testing.assert_array_equal(np.asarray(fe.device_features(u8)), a)


def test_compute_fid_with_cheap_features():
    rng = np.random.RandomState(2)

    def feat(x):
        x = np.asarray(x)
        return x.reshape(x.shape[0], -1)[:, :32]

    a = rng.randn(200, 8, 8, 3).astype(np.float32) * 0.1
    b = a + 0.0
    same = fid_mod.compute_fid(a, b, feature_fn=feat, batch_size=64)
    shifted = fid_mod.compute_fid(a, a + 1.0, feature_fn=feat,
                                  batch_size=64)
    assert same < 1e-3
    assert shifted > 10.0


def test_fid_stats_roundtrip(tmp_path):
    mu, sigma = np.arange(4.0), np.eye(4)
    p = str(tmp_path / "stats.npz")
    fid_mod.save_stats(p, mu, sigma)
    m2, s2 = fid_mod.load_stats(p)
    np.testing.assert_array_equal(m2, mu)
    d = fid_mod.compute_fid(p, p, feature_fn=lambda x: x)
    assert d < 1e-8


@pytest.mark.slow
def test_inception_shapes():
    from rewriting_tpu.metrics.inception import InceptionV3Features
    net = InceptionV3Features(resize_to=299)
    params = net.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 0.1
    feats = net(params, x)
    assert feats.shape == (2, 2048)
    assert bool(np.isfinite(np.asarray(feats)).all())


def test_lpips_invariances():
    lp = LPIPS(spatial=True)
    params = LPIPS.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    a = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    d_aa = np.asarray(lp(params, a, a))
    d_ab = np.asarray(lp(params, a, b))
    d_ba = np.asarray(lp(params, b, a))
    assert np.all(d_aa < 1e-6)
    assert np.all(d_ab > 1e-4)
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-4)
    # mask restricted to an identical region -> near zero
    c = a.copy()
    c[:, 16:, :, :] = b[:, 16:, :, :]  # differs only in bottom half
    mask_top = np.zeros((2, 32, 32), np.float32)
    mask_top[:, :8, :] = 1.0  # stay away from the seam
    d_masked = np.asarray(lp(params, a, c, mask_top))
    d_full = np.asarray(lp(params, a, c))
    assert np.all(d_masked < d_full)


def test_lpips_lin_head_converter():
    """The validating converter accepts all three historical LPIPS 'lin'
    checkpoint layouts and rejects wrong shapes / stray tensors (the
    official PerceptualSimilarity vgg.pth drops in unchanged)."""
    from rewriting_tpu.metrics.lpips import (_TAP_CHANNELS,
                                             lins_from_state_dict,
                                             uniform_lins)
    rng = np.random.RandomState(0)
    heads = [rng.rand(1, c, 1, 1).astype(np.float32)
             for c in _TAP_CHANNELS]
    for pattern in ("lin{i}.model.1.weight", "lin{i}.1.weight",
                    "lin{i}.weight"):
        sd = {pattern.format(i=i): h for i, h in enumerate(heads)}
        lins = lins_from_state_dict(sd)
        assert len(lins) == 5
        for lin, h, c in zip(lins, heads, _TAP_CHANNELS):
            assert lin["weight"].shape == (c,)
            np.testing.assert_allclose(np.asarray(lin["weight"]),
                                       h.reshape(-1))
    sd = {f"lin{i}.model.1.weight": h for i, h in enumerate(heads)}
    with pytest.raises(ValueError, match="unconsumed"):
        lins_from_state_dict({**sd, "extra.weight": heads[0]})
    bad = dict(sd)
    bad["lin2.model.1.weight"] = heads[0]  # 64 weights where 256 expected
    with pytest.raises(ValueError, match="lin2"):
        lins_from_state_dict(bad)
    with pytest.raises(KeyError, match="lin3"):
        lins_from_state_dict({k: v for k, v in sd.items() if "lin3" not
                              in k})
    # the uniform fallback matches the tap plan
    assert [u["weight"].shape[0] for u in uniform_lins()] == \
        list(_TAP_CHANNELS)


def test_perceptual_loss_wrapper():
    """distances.PerceptualLoss: reference call semantics (reference
    metrics/distances.py:49-56) — w=None returns the raw (B, 1, H, W)
    spatial map, a mask returns per-image scalars; the reference's
    use_gpu/precision kwargs are accepted; random weights for the smoke
    path."""
    from rewriting_tpu.metrics.distances import PerceptualLoss
    loss = PerceptualLoss(use_gpu=False, precision="float",
                          params=LPIPS.init_params(jax.random.PRNGKey(0)))
    rng = np.random.RandomState(1)
    a = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    assert np.all(np.asarray(loss(a, a)) < 1e-6)
    d = np.asarray(loss(a, b))
    assert d.shape == (2, 1, 32, 32) and np.all(d.mean((1, 2, 3)) > 1e-4)
    w = np.zeros((2, 32, 32), np.float32)
    w[:, :8] = 1.0
    dm = np.asarray(loss(a, b, w))
    assert dm.shape == (2,) and np.isfinite(dm).all()
    # the mask path is the w-weighted normalization of the w=None map
    expect = (d[:, 0] * w).sum((1, 2)) / w.sum((1, 2))
    assert np.allclose(dm, expect, rtol=1e-5, atol=1e-7)
    with pytest.raises(NotImplementedError):
        PerceptualLoss(net="alex")
    with pytest.raises(ValueError):
        PerceptualLoss(precision="int8")


def test_seg_correct_mod_toy(tmp_path):
    before = tmp_path / "before"
    after = tmp_path / "after"
    before.mkdir()
    after.mkdir()
    for i in range(3):
        b = np.zeros((3, 8, 8), np.int64)
        b[2, :4, :] = 1708  # source region in channel 2
        a = np.zeros((3, 8, 8), np.int64)
        a[0, :2, :] = 5     # half of it became the target label
        np.savez_compressed(before / f"{i}.npz", seg=b)
        np.savez_compressed(after / f"{i}.npz", seg=a)
    total, count = seg_correct_mod.compute_dl(
        str(before), str(after), range(3), tgt=[5], tgtc=0, src=[1708],
        srcc=2)
    assert count == 3 * 4 * 8
    assert total == 3 * 2 * 8


def test_distances_l1_toy(tmp_path):
    import PIL.Image
    before = tmp_path / "b"
    seg = tmp_path / "s"
    after = tmp_path / "a"
    for d in (before, seg, after):
        d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        img = rng.randint(0, 256, (8, 8, 3), np.uint8)
        PIL.Image.fromarray(img).save(before / f"{i}.png")
        img2 = img.copy()
        img2[:4] = 0  # edited region (top half), masked out by seg
        PIL.Image.fromarray(img2).save(after / f"{i}.png")
        s = np.zeros((3, 8, 8), np.int64)
        s[2, :4, :] = 1708
        np.savez_compressed(seg / f"{i}.npz", seg=s)
    total, count = distances.compute_dl(
        str(before), str(seg), str(after), range(2), src=[1708], srcc=2,
        metric="l1")
    # outside the masked (edited) region nothing changed
    assert count == 2 * 4 * 8 and total == 0.0


def test_per_image_z_contract():
    model = ProgressiveGenerator(sizes=[8, 8, 4])
    zs = per_image_z(model, [0, 1, 5])
    from rewriting_tpu.utils.zdataset import standard_z_sample
    np.testing.assert_array_equal(zs[2], standard_z_sample(1, 8, seed=5)[0])


def test_sample_clean_writes_images(tmp_path):
    import PIL.Image
    model = ProgressiveGenerator(sizes=[8, 8, 4])
    params = model.init_params(jax.random.PRNGKey(0))
    out = str(tmp_path / "clean")
    sample_clean(model, params, out, n=5, batch_size=2)
    assert os.path.exists(os.path.join(out, "+lightbox.html"))
    img = np.asarray(PIL.Image.open(os.path.join(out, "3.png")))
    # determinism: re-render image 3 directly from its z
    z = per_image_z(model, [3])
    direct = renormalize.renormalize(
        np.clip(np.asarray(model(params, z))[0], -1, 1), "zc", "byte")
    # the on-device uint8 quantization uses the same fp32 scale constants
    # and truncating cast as the host renormalize path; a backend that
    # contracts clip(x)*s+s into a single-rounded FMA may differ by 1 at
    # integer boundaries, so assert round-trip equivalence (<=1 LSB), not
    # bitwise equality
    assert np.max(np.abs(img.astype(np.int16)
                         - direct.astype(np.int16))) <= 1


# ---------------------------------------------------------------------------
# num_smiles (reference metrics/num_smiles.py)
# ---------------------------------------------------------------------------

def test_count_smiles_with_injected_classifier(tmp_path):
    """count_smiles streams an image directory through a pluggable
    attribute classifier (the reference's SlimNet is external and
    unvendored upstream too; any fn(images)->(B,) bool plugs in)."""
    import PIL.Image
    from rewriting_tpu.metrics.num_smiles import count_smiles
    rng = np.random.RandomState(0)
    smiling = {1, 3, 4}
    for i in range(6):
        arr = rng.randint(0, 100, (8, 8, 3), np.uint8)
        if i in smiling:
            arr[:, :, 0] = 250  # red-dominant marks a 'smile'
        PIL.Image.fromarray(arr).save(tmp_path / f"{i}.png")

    def classifier(images_zc):  # (B, H, W, 3) in [-1, 1]
        return images_zc[:, :, :, 0].mean((1, 2)) > 0.5

    # batch sizes that do and do not divide n (the tail-flush path)
    assert count_smiles(str(tmp_path), n=6, batch_size=2,
                        classifier=classifier) == 3
    assert count_smiles(str(tmp_path), n=6, batch_size=4,
                        classifier=classifier) == 3


def test_mouth_heuristic_classifier_shapes():
    """The face-parser fallback classifier runs end-to-end (random
    weights: decisions are arbitrary but shapes/typing are pinned)."""
    import jax
    from rewriting_tpu.metrics.num_smiles import mouth_heuristic_classifier
    from rewriting_tpu.segment.faceparse import BiSeNet

    net = BiSeNet(n_classes=19)
    params = net.init_params(jax.random.PRNGKey(0))
    clf = mouth_heuristic_classifier(params=params)
    rng = np.random.RandomState(1)
    out = np.asarray(clf(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(
        np.float32)))
    assert out.shape == (2,) and out.dtype == bool


@pytest.mark.slow
def test_patch_fid_sweep_tiny(goldens):
    """Per-layer patch-FID sweep on a tiny StyleGAN2: clean-vs-clean is ~0
    and clean-vs-edited grows with a real weight perturbation
    (reference patch_metrics/fid_image_patches.py + fid_patches.sh)."""
    import jax.numpy as jnp
    from rewriting_tpu.metrics.patch_fid import patch_fid_sweep
    from rewriting_tpu.models import SeqStyleGAN2
    from rewriting_tpu.models.stylegan2 import params_from_state_dict
    from rewriting_tpu.rewrite import SeqStyleGanRewriter
    from rewriting_tpu.utils.zdataset import z_dataset_for_model

    g = goldens("stylegan2_tiny")
    sd = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
    model = SeqStyleGAN2(size=16, style_dim=64, n_mlp=2)
    params = params_from_state_dict(model, sd)
    zds = z_dataset_for_model(model, 24)
    gw_clean = SeqStyleGanRewriter(model, params, zds, 4,
                                   stats_batch_size=8)
    gw_edit = SeqStyleGanRewriter(model, params, zds, 4,
                                  stats_batch_size=8)
    w = np.asarray(gw_edit.target_weight())
    gw_edit.set_target_weight(jnp.asarray(w + 0.5 * np.abs(w).max()
                                          * np.sign(w)))
    from rewriting_tpu.metrics.fid import FeatureExtractor
    fe = FeatureExtractor(batch_size=8, allow_random=True)
    same = patch_fid_sweep(gw_clean, gw_clean, crop_sizes=[4], n=16,
                           feature_fn=fe)
    diff = patch_fid_sweep(gw_clean, gw_edit, crop_sizes=[4], n=16,
                           feature_fn=fe)
    # random-weight inception features give small absolute FIDs; the
    # discriminative signal is the orders-of-magnitude gap
    assert abs(same[4]) < 1e-7, same
    assert diff[4] > 1e-6 and diff[4] > 100 * abs(same[4]), (same, diff)


def test_slimnet_converter_and_forward():
    """SlimNet attribute classifier (metrics/slimnet.py): the validating
    converter consumes a checkpoint in the documented layout completely,
    the jitted forward produces 40 finite logits at the reference's input
    geometry (178x218), resizing engages for other sizes, and the
    'Smiling' threshold matches sigmoid(logit) > 0.5."""
    import jax
    from rewriting_tpu.metrics import slimnet

    sd = slimnet.init_random_state_dict(0)
    clf = slimnet.SlimNetClassifier(state_dict=dict(sd))
    rng = np.random.RandomState(1)
    imgs = rng.uniform(-1, 1, (2, 178, 218, 3)).astype(np.float32)
    logits = np.asarray(clf.logits(imgs))
    assert logits.shape == (2, 40) and np.isfinite(logits).all()
    # resize path: different input size, same pipeline
    small = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    assert np.asarray(clf.logits(small)).shape == (2, 40)
    want = 1.0 / (1.0 + np.exp(-logits[:, slimnet.SMILING])) > 0.5
    np.testing.assert_array_equal(clf(imgs), want)
    # converter validation: a missing tensor raises with diagnostics
    bad = dict(sd)
    bad.pop("slim_module_2.dws.pointwise.weight")
    with pytest.raises(KeyError, match="layout mismatch"):
        slimnet.params_from_state_dict(bad)
    # ... and an extra tensor is flagged, not silently dropped
    extra = dict(sd)
    extra["mystery.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        slimnet.params_from_state_dict(extra)

def test_parity_images_pinned():
    """The FID A/B parity gate's image set must never drift: the golden
    (make_goldens.py::make_fid_parity_golden, offline torch side) and the
    gated test generate pixels independently, so pin the exact bytes."""
    import hashlib
    a = fid_mod.parity_images(1)
    b = fid_mod.parity_images(2)
    assert a.shape == (64, 128, 128, 3) and a.dtype == np.uint8
    ha = hashlib.sha256(a.tobytes()).hexdigest()
    hb = hashlib.sha256(b.tobytes()).hexdigest()
    assert ha.startswith("f20c287675485a38"), ha
    assert hb.startswith("f9e028b051025e68"), hb
