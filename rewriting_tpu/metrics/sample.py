"""Sample clean images from a generator into a results directory.

Behavioral rebuild of reference metrics/sample.py: 10k images, one per
z-seed (image number == seed; FID split uses seed offset 1000007),
truncation 0.5, async image writing, lightbox gallery, pidfile done
markers.

TPU-native: images are generated in jitted batches (the reference loops
batch=1) and written through the native-PNG worker pool."""

from __future__ import annotations

import os
import shutil
from typing import Optional

import numpy as np

from ..utils import pbar
from ..utils.imgsave import SaveImagePool
from ..utils.pidfile import mark_job_done, reserve_dir
from ..utils.zdataset import standard_z_sample

FID_OFFSET = 1000007  # reference sample.py:20


def per_image_z(model, imgnums) -> np.ndarray:
    """The reference's z contract: image i uses the FIRST vector of seed i
    (z_sample_for_model(size=1, seed=imgnum), sample.py:34)."""
    return np.stack([standard_z_sample(1, model.z_dim, seed=int(i))[0]
                     for i in imgnums])


def write_lightbox(outdir: str) -> None:
    """Create outdir and drop the +lightbox.html gallery page next to the
    numbered PNGs (reference sample.py copies lightbox alongside)."""
    os.makedirs(outdir, exist_ok=True)
    lightbox = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "utils", "lightbox.html")
    shutil.copyfile(lightbox, os.path.join(outdir, "+lightbox.html"))


def pad_batch(arr: np.ndarray, batch_size: int) -> np.ndarray:
    """Pad a tail batch to batch_size rows by repeating the last row, so
    every dispatch keeps ONE compiled shape (padded rows are dropped by
    the consumer's zip against the true image numbers)."""
    if arr.shape[0] >= batch_size:
        return arr
    return np.concatenate(
        [arr, np.repeat(arr[-1:], batch_size - arr.shape[0], axis=0)],
        axis=0)


def default_sample_fn(model):
    """The standard jitted (params, z) -> images dispatch the staged and
    fused drivers share."""
    from ..ops.jitopts import tuned_jit
    return tuned_jit(lambda p, z: model(p, z))


_quantize_jit = None


def quantize_uint8(imgs):
    """zc float batch -> uint8 ON DEVICE (4x fewer bytes over the host
    link).  Round-trip-equivalent with renormalize.renormalize(x, "zc",
    "byte"): the same fp32 scale/offset (0.5 / float32(1/255) != 127.5
    exactly) and truncating cast (floor == numpy's astype(uint8) for
    non-negatives).  Byte-exact on backends that round clip(x)*s+s in two
    steps (CPU, current TPU); a backend that emits a fused FMA can differ
    by 1 LSB at integer boundaries."""
    global _quantize_jit
    if _quantize_jit is None:
        import jax
        import jax.numpy as jnp
        scale = np.float32(0.5) / np.float32(1.0 / 255.0)

        @jax.jit
        def q(x):
            y = jnp.clip(x, -1.0, 1.0) * scale + scale
            return jnp.floor(jnp.clip(y, 0.0, 255.0)).astype(jnp.uint8)

        _quantize_jit = q
    return _quantize_jit(imgs)


def sample_clean(model, params, outdir: str, n: int = 10000,
                 batch_size: int = 16, offset: int = 0,
                 sample_fn=None, mesh=None) -> None:
    """Write {outdir}/{imgnum}.png for imgnum in [0, n).  With `mesh`,
    generation is data-parallel over the device mesh (z sharded on the
    batch axis; batch_size should be a multiple of the mesh size)."""
    import jax
    write_lightbox(outdir)
    if sample_fn is None and mesh is not None:
        import jax.numpy as jnp
        from ..parallel import shard_batch, sharded_sampler
        sharded = sharded_sampler(model, mesh)

        def sample_fn(p, z):
            return sharded(p, shard_batch(jnp.asarray(z), mesh))
    elif sample_fn is None:
        sample_fn = default_sample_fn(model)
    # Quantize to uint8 ON DEVICE (quantize_uint8 above) and pipeline the
    # host copy of batch i against device compute of batch i+1 (a
    # blocking np.asarray right after dispatch would serialize the link
    # with the chip).
    quantize = quantize_uint8

    saver = SaveImagePool()

    def write(nums, imgs):
        for num, img in zip(nums, imgs):
            saver.add(img, os.path.join(outdir, f"{num}.png"))

    # Multi-stream overlapped fetch: the uint8 image download dominates
    # this driver through a remote-device transport (~25 MB/batch-128;
    # one stream leaves a third of the measured link capacity unused —
    # utils/fetcher.py).  Device compute of batch i+1 is dispatched
    # before batch i's fetch is consumed, so chip, link, and the PNG
    # encode workers all stay busy.
    from ..utils.fetcher import AsyncFetcher
    try:
        with AsyncFetcher(write, streams=2, window=3) as fetcher:
            for lo in pbar.pbar(range(0, n, batch_size)):
                nums = list(range(lo, min(lo + batch_size, n)))
                zs = pad_batch(per_image_z(model,
                                           [i + offset for i in nums]),
                               batch_size)
                fetcher.submit(
                    nums, quantize(sample_fn(params, zs))[:len(nums)])
    finally:
        saver.close()  # flushes queued writes; idempotent


def main():  # pragma: no cover - CLI (reference sample.py:13-38)
    import argparse
    ap = argparse.ArgumentParser("Sample clean images from a generator")
    ap.add_argument("--dataset", choices=["faces", "church", "horse",
                                          "kitchen", "bedroom", "car",
                                          "cat", "places"], required=True)
    ap.add_argument("--fid_samples", action="store_true")
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--results", default="results/samples")
    ap.add_argument("--mesh", action="store_true",
                    help="data-parallel generation over all devices")
    args = ap.parse_args()
    name = f"{args.dataset}_clean" + ("_fid" if args.fid_samples else "")
    outdir = reserve_dir(os.path.join(args.results, name))
    from ..models.zoo import load_seq_stylegan
    model, params = load_seq_stylegan(args.dataset, truncation=0.5)
    mesh = None
    if args.mesh:
        from ..parallel import make_mesh
        mesh = make_mesh()
    sample_clean(model, params, outdir, n=args.n,
                 batch_size=args.batch_size,
                 offset=FID_OFFSET if args.fid_samples else 0, mesh=mesh)
    mark_job_done(outdir)


if __name__ == "__main__":  # pragma: no cover
    main()
