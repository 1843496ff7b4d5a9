"""Smiling-attribute counter over sampled images
(reference metrics/num_smiles.py — which depends on the external,
non-vendored pytorch_slim_cnn SlimNet).

The classifier is pluggable: pass any fn(images_zc_nhwc) -> (B,) bool/int.
Without one: if a SlimNet CelebA checkpoint (celeba_20.pth) is present
under $REWRITING_TPU_WEIGHTS, the real attribute classifier is used
(metrics/slimnet.py — 'Smiling' sigmoid > 0.5, the reference's exact
criterion); otherwise falls back to the face parser's mouth-visibility
heuristic (teeth/inner-mouth class present), which correlates with
open-mouth smiles."""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

from ..utils import pbar


def count_smiles(image_dir: str, n: int = 10000, batch_size: int = 16,
                 classifier: Optional[Callable] = None) -> int:
    import PIL.Image
    from ..utils import renormalize
    if classifier is None:
        classifier = default_classifier()
    total = 0
    batch = []
    from ..native import read_image_rgb
    for i in pbar.pbar(range(n)):
        img = read_image_rgb(
            os.path.join(image_dir, f"{i}.png")).astype(np.float32) / 255.0
        batch.append(renormalize.renormalize(img, "pt", "zc"))
        if len(batch) == batch_size or i == n - 1:
            total += int(np.sum(classifier(np.stack(batch))))
            batch = []
    return total


def default_classifier():
    """The real SlimNet classifier when its checkpoint is available,
    else the mouth-visibility heuristic."""
    from ..models.zoo import weights_dir
    path = os.path.join(weights_dir(), "celeba_20.pth")
    if os.path.isfile(path):
        from .slimnet import slimnet_classifier
        return slimnet_classifier(path)
    return mouth_heuristic_classifier()


def mouth_heuristic_classifier(params=None):
    """Face-parser-based fallback: counts faces whose 'mouth' (inner mouth)
    class is visibly segmented. `params` overrides the released face-parser
    checkpoint (tests pass random weights)."""
    from ..segment.faceparse import FACE_CLASSES, FaceSegmenter
    seg = FaceSegmenter(params=params)
    mouth = FACE_CLASSES.index("mouth")

    def classify(images):
        labels = seg.segment_batch(images)[:, 0]
        frac = (labels == mouth).mean(axis=(1, 2))
        return frac > 0.001
    return classify


def main():  # pragma: no cover - CLI
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("image_dir")
    ap.add_argument("--n", type=int, default=10000)
    args = ap.parse_args()
    print(count_smiles(args.image_dir, n=args.n))


if __name__ == "__main__":  # pragma: no cover
    main()
