"""Apply a published edit request to a generator, then sample 10k images
from the edited model (reference metrics/sample_edited.py)."""

from __future__ import annotations

import json
import os

from ..utils.pidfile import mark_job_done, reserve_dir
from .load_mask import load_mask_info
from .sample import sample_clean


def sample_edited(model, params, request: dict, layernum: int,
                  outdir: str, n: int = 10000, batch_size: int = 16,
                  rank: int = 1, cachedir=None, low_rank_insert=True,
                  tight_paste=True, single_key: int = -1,
                  zds_size: int = 1000):
    """Build a rewriter, apply the edit, sample the edited model
    (reference sample_edited.py:38-61)."""
    import jax
    from ..rewrite import SeqStyleGanRewriter
    from ..utils.zdataset import z_dataset_for_model
    zds = z_dataset_for_model(model, size=zds_size)
    gw = SeqStyleGanRewriter(
        model, params, zds, layernum, cachedir=cachedir,
        low_rank_insert=low_rank_insert, key_method="zca",
        tight_paste=tight_paste)
    gw.apply_edit(request, rank=rank, single_key=single_key)
    edited = gw.params
    from ..ops.jitopts import tuned_jit
    sample_fn = tuned_jit(lambda p, z: model(p, z))
    sample_clean(model, edited, outdir, n=n, batch_size=batch_size,
                 sample_fn=sample_fn)
    return gw


def main():  # pragma: no cover - CLI (reference sample_edited.py:19-61)
    import argparse
    ap = argparse.ArgumentParser("sample edited images")
    ap.add_argument("--mask", type=str, required=True)
    ap.add_argument("--full_rank", action="store_true")
    ap.add_argument("--no_tight_paste", action="store_true")
    ap.add_argument("--single_context", type=int, default=-1)
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--results", default="results/samples")
    args = ap.parse_args()
    exp_name = args.mask
    if args.full_rank:
        exp_name += "_full_rank"
    if args.single_context != -1:
        exp_name += f"_context{args.single_context}"
    outdir = reserve_dir(os.path.join(args.results, exp_name))
    mask_path, dataset, layernum = load_mask_info(args.mask)
    from ..models.zoo import load_seq_stylegan
    model, params = load_seq_stylegan(dataset, truncation=0.5)
    with open(mask_path) as f:
        request = json.load(f)
    sample_edited(
        model, params, request, layernum, outdir, n=args.n,
        cachedir=os.path.join("results/rewrite/stylegan", dataset,
                              f"layer{layernum}"),
        low_rank_insert=not args.full_rank,
        tight_paste=not args.no_tight_paste,
        single_key=args.single_context)
    mark_job_done(outdir)


if __name__ == "__main__":  # pragma: no cover
    main()
