"""Async bulk image saving.

Behavioral rebuild of reference utils/imgsave.py: a worker-process pool
writes PNGs so the device-driving thread never blocks on disk
(``SaveImagePool``), plus ``save_image_set`` for nested arrays of images
with a %d filename pattern and mtime-based skip.

TPU-native difference: workers use the native C++ PNG encoder
(rewriting_tpu/native/pngenc.cpp) when available — bulk dumps of generated
images are encoder-bound — falling back to PIL."""

from __future__ import annotations

import os

import numpy as np

from . import pbar, renormalize
from .workerpool import WorkerBase, WorkerPool


def _is_image_like(data):
    try:
        import PIL.Image
        if isinstance(data, PIL.Image.Image):
            return True
    except ImportError:
        pass
    return isinstance(data, np.ndarray) and data.ndim == 3


def all_items_and_filenames(img_array, filename_pattern, index=()):
    for i, data in enumerate(img_array):
        inner = index + (i,)
        if _is_image_like(data):
            yield data, (filename_pattern % inner)
        else:
            yield from all_items_and_filenames(data, filename_pattern, inner)


def expand_last_filename(img_array, filename_pattern):
    index, data = (), img_array
    while not _is_image_like(data):
        index += (len(data) - 1,)
        data = data[len(data) - 1]
    return filename_pattern % index


def num_items(img_array):
    num = 1
    while not _is_image_like(img_array):
        num *= len(img_array)
        img_array = img_array[-1]
    return num


class SaveImageWorker(WorkerBase):
    """Writes one image per task. Accepts PIL images, (H,W,3) uint8 arrays,
    or float zc-normalized arrays."""

    def work(self, img, filename):
        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        if isinstance(img, np.ndarray):
            if img.dtype != np.uint8:
                img = renormalize.renormalize(img, "zc", "byte")
            if filename.endswith(".png") and img.shape[-1] == 3:
                from .. import native
                data = native.encode_png(img)
                if data is not None:
                    with open(filename, "wb") as f:
                        f.write(data)
                    return
            import PIL.Image
            PIL.Image.fromarray(img).save(filename)
        else:
            img.save(filename, optimize=True, quality=99)


class SaveImagePool(WorkerPool):
    """Async image writer (reference imgsave.py:64-66).  Worker count
    scales with the host (up to 8) so small CI machines aren't starved
    by encoder threads."""

    def __init__(self, nworkers=None, **kwargs):
        from .workerpool import default_nworkers
        if nworkers is None:
            nworkers = default_nworkers(8)
        super().__init__(worker=SaveImageWorker, nworkers=nworkers, **kwargs)


def save_image_set(img_array, filename_pattern, sourcefile=None):
    """Save a (nested) array of images with a %d-pattern filename; skipped
    entirely if the last file is newer than `sourcefile`
    (reference imgsave.py:37-55)."""
    if sourcefile is not None:
        last = expand_last_filename(img_array, filename_pattern)
        if os.path.isfile(last) and (os.path.getmtime(last)
                                     >= os.path.getmtime(sourcefile)):
            pbar.descnext(None)
            return
    pool = SaveImagePool()
    for img, filename in pbar.pbar(
            all_items_and_filenames(img_array, filename_pattern),
            total=num_items(img_array)):
        pool.add(img, filename)
    pool.join()
