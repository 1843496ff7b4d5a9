"""'Undesired change' damage metric: distance outside the edited region.

Behavioral rebuild of reference metrics/distances.py compute_dl (:96-136):
for each image index, mask out the source-labeled region (from the clean
model's segmentation) and measure masked LPIPS (spatial net-lin VGG) or
per-pixel L1 between the clean and edited renders over the *rest* of the
image.  The reference's only multi-GPU use is DataParallel around LPIPS
(:28); here the batch axis shards over the device mesh instead."""

from __future__ import annotations

import os
from typing import Iterable, Optional, Sequence

import numpy as np

from ..utils import renormalize


def _load_image(path: str) -> np.ndarray:
    import PIL.Image
    from ..native import read_image_rgb
    img = read_image_rgb(path).astype(np.float32) / 255.
    return renormalize.renormalize(img, "pt", "zc")


from .segio import load_seg as _load_seg  # noqa: E402  (shared helper)


def default_lpips_params(allow_random: bool = False):
    """Resolve LPIPS weights from $REWRITING_TPU_WEIGHTS:
    vgg16_features.pth (torchvision VGG16 features state dict) plus, when
    present, lpips_vgg_lins.pth (the official PerceptualSimilarity
    calibrated lin heads, converted by the validating
    lpips.lins_from_state_dict); uniform heads otherwise."""
    from ..models.zoo import _torch_load_numpy, weights_dir
    from .lpips import LPIPS, params_from_torch
    vgg_path = os.path.join(weights_dir(), "vgg16_features.pth")
    lin_path = os.path.join(weights_dir(), "lpips_vgg_lins.pth")
    if os.path.exists(vgg_path):
        return params_from_torch(
            _torch_load_numpy(vgg_path),
            _torch_load_numpy(lin_path) if os.path.exists(lin_path)
            else None)
    if allow_random:
        import jax
        return LPIPS.init_params(jax.random.PRNGKey(0))
    raise FileNotFoundError(
        f"LPIPS weights not found ({vgg_path}); place a torchvision vgg16 "
        "state dict there (and optionally lpips_vgg_lins.pth for the "
        "calibrated official lin heads), or pass allow_random=True for a "
        "pipeline smoke test — the resulting numbers are NOT calibrated "
        "LPIPS.")


class PerceptualLoss:
    """Reference-parity LPIPS wrapper (reference metrics/distances.py
    PerceptualLoss, :18-59): spatial net-lin VGG16 distance, callable as
    ``loss(im0, im1, w=None)`` on NHWC zc arrays.  Matching the reference
    forward (:49-56): with a mask ``w`` returns per-image scalars
    ``sum(map * w) / sum(w)``; with ``w=None`` returns the RAW spatial
    distance map, shaped (B, 1, H, W) like the reference's NCHW output,
    for callers that do their own spatial weighting/indexing.

    ``use_gpu`` is accepted for signature parity and ignored (JAX places
    computation itself; the reference uses it to pick .cuda() +
    nn.DataParallel, :26-28 — the jitted forward shards over devices
    instead).  ``precision`` accepts the reference's 'half'/'float'/
    'double' values; compute runs fp32 either way (the TPU parity tier),
    only input casting differs."""

    def __init__(self, net: str = "vgg", use_gpu: bool = False,
                 precision: str = "float", params=None,
                 allow_random: bool = False):
        if net != "vgg":
            raise NotImplementedError(
                f"net={net!r}: only the vgg backbone is built (the "
                "reference experiments use net-lin vgg)")
        if precision not in ("half", "float", "double"):
            raise ValueError(f"precision={precision!r}")
        del use_gpu, precision
        from .lpips import LPIPS
        self.model = LPIPS(spatial=True)
        self.params = (params if params is not None
                       else default_lpips_params(allow_random))

    def __call__(self, im0, im1, w=None):
        im0 = np.asarray(im0, np.float32)
        im1 = np.asarray(im1, np.float32)
        if w is None:
            dist = self.model.distance_map(self.params, im0, im1)
            return dist[:, None, :, :]          # (B, 1, H, W), ref NCHW
        return self.model(self.params, im0, im1, w)


def compute_dl(before_imgs: str, before_seg: str, after_imgs: str,
               indices: Iterable[int], src: Sequence[int] = (1708,),
               srcc: int = 2, metric: str = "l1",
               lpips_model=None, lpips_params=None,
               batch_size: int = 100, mask_edits: bool = True,
               allow_random_lpips: bool = False):
    """Total and count of the damage metric over indexed images.

    metric: 'l1' (masked per-pixel L1 sum / pixel count), 'lpips'
    (masked spatial LPIPS per image), or 'lpips_unmasked' (the reference's
    --mask_lpips variant: LPIPS over the whole image).
    Returns (total, count)."""
    indices = list(indices)
    total, count = 0.0, 0
    if metric.startswith("lpips") and lpips_model is None:
        from .lpips import LPIPS
        lpips_model = LPIPS(spatial=True)
        if lpips_params is None:
            lpips_params = default_lpips_params(allow_random_lpips)

    for lo in range(0, len(indices), batch_size):
        chunk = indices[lo:lo + batch_size]
        before = np.stack([_load_image(
            os.path.join(before_imgs, f"{i}.png")) for i in chunk])
        after = np.stack([_load_image(
            os.path.join(after_imgs, f"{i}.png")) for i in chunk])
        masks = np.ones(before.shape[:3], np.float32)
        if mask_edits:
            for j, i in enumerate(chunk):
                seg = _load_seg(os.path.join(before_seg, str(i)))
                ch = seg[srcc] if seg.ndim == 3 else seg
                if ch.shape != masks.shape[1:]:
                    from ..utils.upsample import resize_bilinear
                    ch = (resize_bilinear(ch.astype(np.float32),
                                          masks.shape[1:]) > 0.5) * ch.max()
                keep = np.ones_like(ch, np.float32)
                for label in src:
                    keep = keep * (ch != label)
                masks[j] = keep
        if metric == "l1":
            diff = np.abs(after - before).sum(axis=-1)
            total += float((diff * masks).sum())
            count += int(masks.sum())
        else:
            use_mask = None if metric == "lpips_unmasked" else masks
            d = np.asarray(lpips_model(lpips_params, before, after,
                                       use_mask if use_mask is not None
                                       else np.ones_like(masks)))
            total += float(d.sum())
            count += len(chunk)
    return total, count


def main():  # pragma: no cover - CLI (reference distances.py:139-160)
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp_name", required=True)
    ap.add_argument("--results", default="results/samples")
    ap.add_argument("--metric", default="l1",
                    choices=["l1", "lpips", "lpips_unmasked"])
    ap.add_argument("--num", type=int, default=10000)
    args = ap.parse_args()
    from .load_mask import load_mask_info
    from .load_seg import load_seg_info_from_exp_name
    _, dataset, _ = load_mask_info(args.exp_name)
    _, srcc, _, src, _ = load_seg_info_from_exp_name(args.exp_name)
    total, count = compute_dl(
        os.path.join(args.results, f"{dataset}_clean"),
        os.path.join(args.results, "seg", f"{dataset}_clean"),
        os.path.join(args.results, args.exp_name),
        range(args.num), src=src, srcc=srcc, metric=args.metric)
    print(f"after: {args.exp_name}")
    print(f"total={total} count={count} mean={total / max(count, 1)}")


if __name__ == "__main__":  # pragma: no cover
    main()
