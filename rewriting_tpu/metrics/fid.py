"""Frechet Inception Distance: feature statistics + Frechet distance.

Machinery equivalent of the reference's metrics/fid.py (TF1 Inception
pool_3 activations :90-131, Frechet distance :137-187, m/s npz stats) with
a pluggable jitted feature extractor (metrics/inception.py by default) and
streaming covariance accumulation (stats.RunningCovariance) so the 50k-image
statistics never materialize the full activation matrix.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from ..stats.running import RunningCovariance


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2,
                               eps: float = 1e-6) -> float:
    """||mu1 - mu2||^2 + Tr(s1 + s2 - 2 sqrt(s1 s2)) (reference
    fid.py:137-187, incl. the eps-on-diagonal retry and imaginary-part
    check)."""
    mu1, mu2 = np.atleast_1d(np.asarray(mu1)), np.atleast_1d(np.asarray(mu2))
    sigma1 = np.atleast_2d(np.asarray(sigma1, np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, np.float64))
    diff = mu1.astype(np.float64) - mu2.astype(np.float64)

    def _sqrtm(a):
        out = scipy.linalg.sqrtm(a)
        return out[0] if isinstance(out, tuple) else out

    covmean = _sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


class FeatureExtractor:
    """Default FID feature extractor: jitted InceptionV3 pool3.

    Without trained weights FID is meaningless, so params=None loads the
    standard FID Inception checkpoint from the weights dir and FAILS
    otherwise; pass allow_random=True only for pipeline tests."""

    WEIGHTS_FILENAME = "pt_inception-2015-12-05.pth"

    def __init__(self, params=None, batch_size: int = 50,
                 allow_random: bool = False):
        from .inception import InceptionV3Features
        self.net = InceptionV3Features()
        if params is None:
            import os
            from ..models.zoo import _torch_load_numpy, weights_dir
            path = os.path.join(weights_dir(), self.WEIGHTS_FILENAME)
            if os.path.exists(path):
                from .inception import params_from_torch_state_dict
                params = params_from_torch_state_dict(
                    _torch_load_numpy(path))
            elif allow_random:
                params = self.net.init_params(jax.random.PRNGKey(0))
            else:
                raise FileNotFoundError(
                    f"FID Inception weights not found at {path}; place "
                    "the pytorch-fid checkpoint there (or pass "
                    "allow_random=True for a pipeline smoke test — the "
                    "resulting numbers are NOT FID).")
        self.params = params
        self.batch_size = batch_size
        self._jitted = jax.jit(self.net.__call__)

    def __call__(self, images) -> np.ndarray:
        return np.asarray(self.device_features(images))

    def device_features(self, images) -> jnp.ndarray:
        """Async path: zc float or uint8 batch -> DEVICE (B, 2048)
        features without a host sync, so streaming drivers overlap the
        next batch's decode/upload with this batch's forward."""
        return self._jitted(self.params, jnp.asarray(images))


def compute_feature_stats(batches: Iterable, feature_fn: Callable
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Stream batches of NHWC images (zc float, or uint8 if feature_fn
    supports it) into (mu, sigma) feature stats.  When feature_fn exposes
    `device_features`, the whole stream stays on device (the running
    covariance update is jitted), so the loop is bound by host decode +
    upload, not by per-batch round-trips."""
    cov = RunningCovariance()
    dev_fn = getattr(feature_fn, "device_features", feature_fn)
    for batch in batches:
        cov.add(jnp.asarray(dev_fn(batch)))
    return np.asarray(cov.mean()), np.asarray(cov.covariance(unbiased=True))


def save_stats(path: str, mu, sigma):
    """m/s npz format compatible with the reference's cached stats
    (reference get_fid.py / fid.py use keys 'mu' and 'sigma')."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, mu=np.asarray(mu), sigma=np.asarray(sigma))


def load_stats(path: str) -> Tuple[np.ndarray, np.ndarray]:
    d = np.load(path)
    return d["mu"], d["sigma"]


def parity_images(seed: int, n: int = 64, size: int = 128) -> np.ndarray:
    """Deterministic uint8 image set for the FID A/B parity gate
    (BASELINE.md north star: |ours - pytorch-fid| <= 0.1 on a fixed set).

    Pure numpy so scripts/make_goldens.py (torch side, offline) and
    tests/test_real_weights.py (jax side) generate bit-identical pixels:
    low-resolution RandomState noise kron-upsampled for spatial structure
    plus fine noise, quantized to uint8.  Returns (n, size, size, 3)."""
    rng = np.random.RandomState(seed)
    coarse = rng.uniform(0.15, 0.85, (n, size // 16, size // 16, 3))
    imgs = np.kron(coarse, np.ones((1, 16, 16, 1)))
    imgs = imgs + rng.uniform(-0.08, 0.08, imgs.shape)
    return (np.clip(imgs, 0.0, 1.0) * 255.0).round().astype(np.uint8)


def _image_dir_batches(path: str, batch_size: int, as_uint8: bool = False):
    """Decode {path}/*.png|jpg into zc batches; with as_uint8=True yield
    raw uint8 batches (the FeatureExtractor normalizes on device — 4x
    fewer bytes over the host link and no host-side fp32 pass).  Decoding
    runs on a readahead thread pool (native.read_batches), overlapping
    the consumer's device work."""
    from ..utils import renormalize

    def key(f):
        # numeric stems ({imgnum}.png, the sample_clean artifact layout)
        # sort numerically so streamed batch partitions match generation
        # order (fused_pipeline's stats are then bit-identical, not just
        # fp-close, to the staged re-read — same Chan-update order)
        stem = os.path.splitext(f)[0]
        # isdecimal (not isdigit) so exotic Unicode digit names that
        # int() rejects fall into the lexicographic bucket
        return (0, int(stem), f) if stem.isdecimal() else (1, 0, f)

    files = sorted((f for f in os.listdir(path)
                    if f.lower().endswith((".png", ".jpg", ".jpeg"))),
                   key=key)
    from ..native import read_batches
    for batch in read_batches([os.path.join(path, f) for f in files],
                              batch_size):
        if not as_uint8:
            batch = renormalize.renormalize(
                batch.astype(np.float32) / 255.0, "pt", "zc")
        yield batch


def compute_fid(a, b, feature_fn: Optional[Callable] = None,
                batch_size: int = 50) -> float:
    """FID between two sources; each of a/b may be an image directory path,
    an (N, H, W, 3) zc array, an iterable of batches, or a stats npz path
    (reference fid.py:232-245 CLI behavior)."""
    if feature_fn is None:
        feature_fn = FeatureExtractor(batch_size=batch_size)

    def stats_of(src):
        if isinstance(src, str) and src.endswith(".npz"):
            return load_stats(src)
        if isinstance(src, str):
            return compute_feature_stats(
                _image_dir_batches(src, batch_size,
                                   as_uint8=isinstance(feature_fn,
                                                       FeatureExtractor)),
                feature_fn)
        if isinstance(src, np.ndarray) or hasattr(src, "shape"):
            arr = np.asarray(src)
            return compute_feature_stats(
                (arr[i:i + batch_size]
                 for i in range(0, len(arr), batch_size)), feature_fn)
        return compute_feature_stats(src, feature_fn)

    mu1, s1 = stats_of(a)
    mu2, s2 = stats_of(b)
    return calculate_frechet_distance(mu1, s1, mu2, s2)


def main():  # pragma: no cover - CLI smoke (reference fid.py:248-282)
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("path_a")
    ap.add_argument("path_b")
    ap.add_argument("--batch_size", type=int, default=50)
    ap.add_argument("--inception_weights", default=None,
                    help="torch .pth with torchvision/pytorch-fid weights")
    args = ap.parse_args()
    feature_fn = None
    if args.inception_weights:
        import torch
        from .inception import params_from_torch_state_dict
        sd = torch.load(args.inception_weights, map_location="cpu")
        feature_fn = FeatureExtractor(params_from_torch_state_dict(sd),
                                      args.batch_size)
    print(compute_fid(args.path_a, args.path_b, feature_fn,
                      args.batch_size))


if __name__ == "__main__":  # pragma: no cover
    main()
