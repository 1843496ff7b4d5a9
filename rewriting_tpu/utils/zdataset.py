"""Deterministic latent sampling.

Reproduces the reference's reproducibility contract exactly
(reference: utils/zdataset.py:37-51): z vectors come from
``numpy.random.RandomState(seed).standard_normal(size * depth)`` so that
z_i is *prefix-stable* — independent of how many samples are drawn — and
identical across machines/frameworks.  Saved edit-request JSONs reference
images by number, so this contract is what keeps them valid.
"""

from __future__ import annotations

import numpy as np


def standard_z_sample(size: int, depth: int, seed: int = 1) -> np.ndarray:
    """(size, depth) float32 standard normal, prefix-stable in `size`."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal(size * depth).reshape(size, depth).astype(
        np.float32)


def standard_y_sample(size: int, num_classes: int, seed: int = 1) -> np.ndarray:
    """(size,) int64 uniform categorical (reference: utils/zdataset.py:54-68)."""
    rng = np.random.RandomState(seed)
    return rng.randint(num_classes, size=size).astype(np.int64)


class ZDataset:
    """A fixed, seeded set of z latents (reference TensorDataset equivalent,
    utils/zdataset.py:7-14). Indexing returns a single (depth,) vector;
    ``batches(batch_size)`` yields (B, depth) arrays for scan/tally drivers.
    """

    def __init__(self, zs: np.ndarray):
        self.zs = np.asarray(zs, dtype=np.float32)

    def __len__(self):
        return self.zs.shape[0]

    def __getitem__(self, i) -> np.ndarray:
        return self.zs[i]

    def batches(self, batch_size: int, pad_to_full: bool = False):
        """Yield (batch, valid_count). With pad_to_full, the final short
        batch is zero-padded to `batch_size` so every step has a static
        shape (one XLA program); valid_count masks the padding."""
        n = len(self)
        for i in range(0, n, batch_size):
            b = self.zs[i:i + batch_size]
            valid = b.shape[0]
            if pad_to_full and valid < batch_size:
                b = np.concatenate(
                    [b, np.zeros((batch_size - valid,) + b.shape[1:],
                                 dtype=b.dtype)], axis=0)
            yield b, valid


def z_dataset_for_model(model, size: int = 100, seed: int = 1,
                        indices=None) -> ZDataset:
    """Seeded z dataset sized to a model's latent dim
    (reference: utils/zdataset.py:7-34)."""
    depth = model.z_dim
    if indices is not None:
        indices = np.asarray(indices, dtype=np.int64)
        zs = standard_z_sample(int(indices.max()) + 1, depth, seed)[indices]
    else:
        zs = standard_z_sample(size, depth, seed)
    return ZDataset(zs)


def z_sample_for_model(model, size: int = 100, seed: int = 1) -> np.ndarray:
    return standard_z_sample(size, model.z_dim, seed)


def training_loader(model, batch_size: int, epoch_size: int = 10000):
    """Infinite generator of (B, z_dim) batches, a fresh seeded epoch each
    pass (reference utils/zdataset.py:71-88)."""
    g_epoch = 1
    while True:
        zds = z_dataset_for_model(model, size=epoch_size, seed=g_epoch + 1)
        for batch, valid in zds.batches(batch_size):
            yield batch[:valid]
        g_epoch += 1


def testing_loader(model, batch_size: int, test_size: int = 1000):
    """Finite iterator over the fixed seed-1 test z set
    (reference utils/zdataset.py:91-103)."""
    zds = z_dataset_for_model(model, size=test_size, seed=1)
    return (batch[:valid] for batch, valid in zds.batches(batch_size))


def epoch_grouper(loader, epoch_size: int):
    """Group an infinite batch stream into epochs of epoch_size batches
    (reference utils/zdataset.py:106-118)."""
    import itertools
    it = iter(loader)
    while True:
        chunk = itertools.islice(it, epoch_size)
        try:
            first = next(chunk)
        except StopIteration:
            return
        yield itertools.chain((first,), chunk)
