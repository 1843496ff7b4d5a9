"""Generate the notebooks/stats/ analysis corpus.

The reference ships 21 ad-hoc notebooks under notebooks/stats/ (plus the
interface/reflection notebooks): a few analysis FAMILIES, each cloned
several times with a different experiment directory, shard index, or
resume state (e.g. Generic_Segmentation-Copy3-0..3 are the same analysis
at shards 0..3 of 4).  Here each family is ONE parameterized notebook
that executes headless on tiny models without weights (and on the real
zoo when $REWRITING_TPU_WEIGHTS is populated); the per-file mapping to
the reference corpus is in PARITY.md.

Run: python scripts/make_stats_notebooks.py   (idempotent; writes only
the generated notebooks, not the hand-written ones.)
"""

import json
import os

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "notebooks", "stats")


def nb(cells):
    return {
        "cells": [
            {"cell_type": kind,
             "metadata": {},
             **({"source": src.splitlines(keepends=True)} if kind == "markdown"
                else {"source": src.splitlines(keepends=True),
                      "outputs": [], "execution_count": None})}
            for kind, src in cells],
        "metadata": {"kernelspec": {"display_name": "Python 3",
                                    "language": "python",
                                    "name": "python3"},
                     "language_info": {"name": "python"}},
        "nbformat": 4, "nbformat_minor": 5,
    }


TINY_SETUP = """\
import jax, numpy as np, jax.numpy as jnp, os, tempfile
from rewriting_tpu.utils.show import show
from rewriting_tpu.utils import renormalize, segviz

# generator: real zoo checkpoint when present, else a tiny random model
try:
    from rewriting_tpu.models.zoo import load_seq_stylegan
    model, params = load_seq_stylegan('church', truncation=0.5)
    n_images, batch = 200, 10
except FileNotFoundError:
    from rewriting_tpu.models import ProgressiveGenerator
    model = ProgressiveGenerator(sizes=[16, 16, 8, 8])
    params = model.init_params(jax.random.PRNGKey(0))
    n_images, batch = 24, 8
"""

TINY_SEG = """\
# segmenter: released unified-parsing model, or a tiny random one
try:
    from rewriting_tpu.segment import load_segmenter
    segmodel, seglabels = load_segmenter('netpqc')
except FileNotFoundError:
    from rewriting_tpu.segment import load_segmenter
    from rewriting_tpu.segment.upernet import UPerNet
    labeldata = {"object": ["-", "dome", "sky", "tree"],
                 "part": ["-", "top"], "material": ["-", "matte"],
                 "scene": ["-", "outdoor"], "object_part": {"dome": ["top"]}}
    net = UPerNet({"object": 4, "part": 1, "material": 2, "scene": 2},
                  [1], {1: [1]})
    segmodel, seglabels = load_segmenter(
        'netq', params=net.init_params(jax.random.PRNGKey(1)),
        labeldata=labeldata)
len(seglabels)
"""

SAMPLE_DIRS = """\
# sample a 'before' directory and an edited 'after' directory (the
# reference analyzes results/samples dirs written by experiments.sh)
from rewriting_tpu.metrics.sample import sample_clean
workdir = tempfile.mkdtemp()
before_dir = os.path.join(workdir, 'before')
sample_clean(model, params, before_dir, n=n_images, batch_size=batch)

# the 'after' condition: a rank-1 weight edit applied via the rewriter
from rewriting_tpu.rewrite import (ProgressiveGanRewriter,
                                   SeqStyleGanRewriter)
from rewriting_tpu.utils.zdataset import z_dataset_for_model
from rewriting_tpu.utils.renormalize import mask_to_url
zds = z_dataset_for_model(model, n_images)
if model.__class__.__name__ == 'SeqStyleGAN2':
    gw = SeqStyleGanRewriter(model, params, zds, layernum=8,
                             stats_batch_size=batch)
else:
    gw = ProgressiveGanRewriter(model, params, zds, layernum=2,
                                stats_batch_size=batch)
m = np.zeros((4, 4), np.float32); m[1:3, 1:3] = 1
url = mask_to_url(m)
gw.apply_edit({"object": [0, url], "paste": [1, url], "key": [[2, url]]},
              rank=1, niter=21, piter=10, lr=0.05)
after_dir = os.path.join(workdir, 'after')
sample_clean(model, gw.params, after_dir, n=n_images, batch_size=batch)
sorted(os.listdir(before_dir))[:3], sorted(os.listdir(after_dir))[:3]
"""

SEG_DIR_FN = """\
# per-label pixel counts of every image in a directory, streamed
from rewriting_tpu.stats import RunningBincount
from rewriting_tpu.native import read_image_rgb

def dir_label_counts(path, n):
    rb = RunningBincount(size=len(seglabels) + 1)
    for lo in range(0, n, batch):
        imgs = np.stack([
            renormalize.renormalize(
                read_image_rgb(os.path.join(path, f"{i}.png")).astype(
                    np.float32) / 255.0, "pt", "zc")
            for i in range(lo, min(lo + batch, n))])
        seg = np.asarray(segmodel.segment_batch(jnp.asarray(imgs)))
        rb.add(seg[:, 0].reshape(len(imgs), -1))
    return np.asarray(rb.result())
"""


def gen_dome2tree():
    cells = [
        ("markdown", """\
# Segmentation change statistics: dome2tree (ours vs baseline)

TPU-native port of the reference's
`notebooks/stats/Generic_Segmentation-stats-Copy1.ipynb` (the dome2tree
instance of the before/after class-area family; `Generic_Segmentation.ipynb`
is the dome2spire instance, ported as `segmentation-stats.ipynb`): compare
per-class pixel areas between a clean sample directory and edited sample
directories, and compute the effectiveness ratio (source pixels that became
the target class)."""),
        ("code", TINY_SETUP),
        ("code", TINY_SEG),
        ("code", SAMPLE_DIRS),
        ("code", SEG_DIR_FN + """\
before_counts = dir_label_counts(before_dir, n_images)
after_counts = dir_label_counts(after_dir, n_images)
total = before_counts.sum()
rows = [("label", "before%", "after%", "delta pp")]
for i in np.argsort(-np.abs(after_counts - before_counts))[:8]:
    if before_counts[i] + after_counts[i] == 0: continue
    name = seglabels[i] if i < len(seglabels) else str(i)
    rows.append((name, round(100 * before_counts[i] / total, 2),
                 round(100 * after_counts[i] / total, 2),
                 round(100 * (after_counts[i] - before_counts[i]) / total,
                       2)))
rows
"""),
        ("code", """\
# effectiveness-style summary: total area moved between classes
moved = float(np.abs(after_counts - before_counts).sum()) / 2 / total
print(f"fraction of pixels whose class area shifted: {moved:.4f}")
assert np.isfinite(moved)
"""),
    ]
    return nb(cells)


def gen_comparison():
    cells = [
        ("markdown", """\
# Multi-condition segmentation comparison

TPU-native port of the reference's
`notebooks/stats/Generic_Segmentation-stats-Copy{2,3,4}.ipynb` (the same
before/after class-area analysis re-run across several experiment
conditions — ours at different ranks vs the all-weights 'overfit'
baseline — and collected into one comparison table)."""),
        ("code", TINY_SETUP),
        ("code", TINY_SEG),
        ("code", """\
# build three conditions: clean, rank-1 edit ('ours'), all-weights
# overfit baseline (reference ganrewrite.py:300-331)
from rewriting_tpu.metrics.sample import sample_clean
from rewriting_tpu.rewrite import ProgressiveGanRewriter
from rewriting_tpu.utils.zdataset import z_dataset_for_model
from rewriting_tpu.utils.renormalize import mask_to_url
workdir = tempfile.mkdtemp()
zds = z_dataset_for_model(model, n_images)
m = np.zeros((4, 4), np.float32); m[1:3, 1:3] = 1
url = mask_to_url(m)
request = {"object": [0, url], "paste": [1, url], "key": [[2, url]]}
conditions = {}
clean_dir = os.path.join(workdir, 'clean')
sample_clean(model, params, clean_dir, n=n_images, batch_size=batch)
conditions['clean'] = clean_dir
for name, kw in [("ours_rank1", dict(rank=1)),
                 ("overfit", dict(overfit=True))]:
    if model.__class__.__name__ == 'SeqStyleGAN2':
        from rewriting_tpu.rewrite import SeqStyleGanRewriter
        gw = SeqStyleGanRewriter(model, params, zds, layernum=8,
                                 stats_batch_size=batch)
    else:
        gw = ProgressiveGanRewriter(model, params, zds, layernum=2,
                                    stats_batch_size=batch)
    if kw.get("overfit"):
        gw.apply_overfit(request, niter=11, lr=0.01)
    else:
        gw.apply_edit(request, rank=kw["rank"], niter=21, piter=10,
                      lr=0.05)
    d = os.path.join(workdir, name)
    sample_clean(model, gw.params, d, n=n_images, batch_size=batch)
    conditions[name] = d
list(conditions)
"""),
        ("code", SEG_DIR_FN + """\
counts = {name: dir_label_counts(d, n_images)
          for name, d in conditions.items()}
total = counts['clean'].sum()
top = np.argsort(-counts['clean'])[:6]
rows = [tuple(["label"] + list(counts))]
for i in top:
    name = seglabels[i] if i < len(seglabels) else str(i)
    rows.append(tuple([name] + [round(100 * c[i] / total, 2)
                                for c in counts.values()]))
rows
"""),
        ("code", """\
# damage proxy: L1 distance of the class-area histograms vs clean
for name, c in counts.items():
    if name == 'clean': continue
    print(name, "histogram L1 vs clean:",
          round(float(np.abs(c - counts['clean']).sum()) / total, 4))
"""),
    ]
    return nb(cells)


def gen_folder_seg():
    cells = [
        ("markdown", """\
# Segment an image folder

TPU-native port of the reference's
`notebooks/stats/Generic_Segmentation-Copy{1,2}.ipynb` (segment every
image in an arbitrary directory — the reference's
`UnsupervisedImageFolder` — and tabulate class areas)."""),
        ("code", TINY_SETUP),
        ("code", TINY_SEG),
        ("code", """\
# make an image folder to analyze (any directory of PNGs works)
from rewriting_tpu.metrics.sample import sample_clean
img_path = os.path.join(tempfile.mkdtemp(), 'imgs')
sample_clean(model, params, img_path, n=n_images, batch_size=batch)
files = sorted(f for f in os.listdir(img_path) if f.endswith('.png'))
len(files)
"""),
        ("code", """\
# stream the folder through the segmenter -> per-class area histogram
from rewriting_tpu.stats import RunningBincount
from rewriting_tpu.native import read_image_rgb
rb = RunningBincount(size=len(seglabels) + 1)
segs = []
for lo in range(0, len(files), batch):
    imgs = np.stack([
        renormalize.renormalize(
            read_image_rgb(os.path.join(img_path, f)).astype(
                np.float32) / 255.0, "pt", "zc")
        for f in files[lo:lo + batch]])
    seg = np.asarray(segmodel.segment_batch(jnp.asarray(imgs)))
    segs.append((imgs, seg))
    rb.add(seg[:, 0].reshape(len(imgs), -1))
counts = np.asarray(rb.result())
[(seglabels[i] if i < len(seglabels) else i, int(counts[i]))
 for i in np.argsort(-counts)[:8] if counts[i] > 0]
"""),
        ("code", """\
# image / segmentation visual check, built incrementally with show.a
# (the reference stats notebooks' row-builder, utils/show.py:122-141)
import PIL.Image
from rewriting_tpu.utils import show as showmod
imgs, seg = segs[0]
showmod.reset()
for i in range(min(3, len(imgs))):
    showmod.a(renormalize.as_image(imgs[i]))
    showmod.a(PIL.Image.fromarray(segviz.segment_visualization(seg[i, 0])),
              cols=2)
showmod.flush()
"""),
        ("code", """\
# color legend for the top labels in the first image
# (segviz.segment_key / swatch_image, reference segviz.py:12-27)
class _Labels:
    def get_label_and_category_names(self):
        return [(l, 'object') for l in seglabels], ['object']
legend = segviz.segment_key(seg[0, 0], _Labels(), max_labels=5)
show([[sw, name] for sw, name in legend])
"""),
    ]
    return nb(cells)


def gen_folder_seg_resumable():
    cells = [
        ("markdown", """\
# Resumable folder segmentation

TPU-native port of the reference's
`notebooks/stats/Generic_Segmentation-Copy{3..8}.ipynb` (the long-running
variant, re-opened across sessions: a sampler that SKIPS images whose
per-image segmentation file already exists, so the notebook is re-runnable
and resumes where it stopped — reference cells build a custom
`torch.utils.data.Sampler` over not-yet-done paths)."""),
        ("code", TINY_SETUP),
        ("code", TINY_SEG),
        ("code", """\
from rewriting_tpu.metrics.sample import sample_clean
from rewriting_tpu.metrics import seg_stats
workdir = tempfile.mkdtemp()
img_path = os.path.join(workdir, 'imgs')
seg_path = os.path.join(workdir, 'segs')
sample_clean(model, params, img_path, n=n_images, batch_size=batch)

# first pass: segment only HALF the images (simulating an interrupted
# session), writing one npz per image like the reference's .pth-per-image
seg_stats.process(segmodel, img_path, seg_path, n=n_images // 2,
                  batch_size=batch)
done0 = len(os.listdir(seg_path))
done0
"""),
        ("code", """\
# resume: enumerate only the images whose seg file does NOT exist yet
# (the reference's custom not-done Sampler), then finish the directory
todo = [i for i in range(n_images)
        if not os.path.isfile(os.path.join(seg_path, f"{i}.npz"))]
print(f"resuming: {len(todo)} of {n_images} remain")
for lo in range(0, len(todo), batch):
    nums = todo[lo:lo + batch]
    imgs = np.stack([
        renormalize.renormalize(
            __import__('rewriting_tpu.native', fromlist=['read_image_rgb']
                       ).read_image_rgb(
                os.path.join(img_path, f"{i}.png")).astype(
                    np.float32) / 255.0, "pt", "zc")
        for i in nums])
    seg = np.asarray(segmodel.segment_batch(jnp.asarray(imgs)))
    for i, s in zip(nums, seg):
        np.savez_compressed(os.path.join(seg_path, f"{i}.npz"), seg=s)
assert len(os.listdir(seg_path)) == n_images
len(os.listdir(seg_path))
"""),
        ("code", """\
# aggregate the per-image files into the class-area histogram
counts = np.zeros(len(seglabels) + 1, np.int64)
for i in range(n_images):
    seg = np.load(os.path.join(seg_path, f"{i}.npz"))["seg"]
    counts += np.bincount(seg[0].reshape(-1), minlength=len(counts))
[(seglabels[i] if i < len(seglabels) else i, int(counts[i]))
 for i in np.argsort(-counts)[:8] if counts[i] > 0]
"""),
    ]
    return nb(cells)


def gen_folder_seg_sharded():
    cells = [
        ("markdown", """\
# Sharded folder segmentation

TPU-native port of the reference's
`notebooks/stats/Generic_Segmentation-Copy3-{0,1,2,3}.ipynb` — four
clones of the same analysis, one per shard, run concurrently on
different machines.  Here the shard is a PARAMETER (`SHARD`/`NSHARDS`
via `utils.hostshard.shard_units`), and one notebook demonstrates a
shard run plus the merge over all shards' outputs."""),
        ("code", TINY_SETUP),
        ("code", TINY_SEG),
        ("code", """\
from rewriting_tpu.metrics.sample import sample_clean
from rewriting_tpu.utils import hostshard
workdir = tempfile.mkdtemp()
img_path = os.path.join(workdir, 'imgs')
seg_path = os.path.join(workdir, 'segs')
os.makedirs(seg_path)
sample_clean(model, params, img_path, n=n_images, batch_size=batch)
NSHARDS = 4
units = list(range(n_images))
for shard in range(NSHARDS):   # the reference ran these as 4 notebooks
    mine = hostshard.shard_units(units, shard, NSHARDS)
    for lo in range(0, len(mine), batch):
        nums = mine[lo:lo + batch]
        from rewriting_tpu.native import read_image_rgb
        imgs = np.stack([
            renormalize.renormalize(
                read_image_rgb(os.path.join(
                    img_path, f"{i}.png")).astype(np.float32) / 255.0,
                "pt", "zc") for i in nums])
        seg = np.asarray(segmodel.segment_batch(jnp.asarray(imgs)))
        for i, s in zip(nums, seg):
            np.savez_compressed(os.path.join(seg_path, f"{i}.npz"),
                                seg=s)
    print(f"shard {shard}/{NSHARDS}: {len(mine)} images")
assert len(os.listdir(seg_path)) == n_images
"""),
        ("code", """\
# merge all shards' outputs into one histogram (disjoint by construction)
counts = np.zeros(len(seglabels) + 1, np.int64)
for i in range(n_images):
    seg = np.load(os.path.join(seg_path, f"{i}.npz"))["seg"]
    counts += np.bincount(seg[0].reshape(-1), minlength=len(counts))
[(seglabels[i] if i < len(seglabels) else i, int(counts[i]))
 for i in np.argsort(-counts)[:8] if counts[i] > 0]
"""),
    ]
    return nb(cells)


def gen_ffhq_label():
    cells = [
        ("markdown", """\
# Attribute statistics over an image folder (FFHQ-style)

TPU-native port of the reference's `notebooks/stats/FFHQ_Label.ipynb`:
run the SlimNet CelebA attribute classifier over a directory of face
images and tabulate per-attribute frequencies, plus a single-image
inspection cell.  Uses the real `celeba_20.pth` checkpoint when
`$REWRITING_TPU_WEIGHTS` provides it, else a randomly initialized
SlimNet (frequencies are then arbitrary but the full pipeline runs)."""),
        ("code", """\
import jax, numpy as np, jax.numpy as jnp, os, tempfile
from rewriting_tpu.metrics import slimnet
from rewriting_tpu.models.zoo import weights_dir

ckpt = os.path.join(weights_dir(), "celeba_20.pth")
if os.path.isfile(ckpt):
    clf = slimnet.SlimNetClassifier(checkpoint=ckpt)
else:
    clf = slimnet.SlimNetClassifier(
        state_dict=slimnet.init_random_state_dict(0))
len(slimnet.CELEBA_ATTRS)
"""),
        ("code", """\
# an image folder to analyze: real faces if a faces model is present,
# else tiny random renders
from rewriting_tpu.metrics.sample import sample_clean
try:
    from rewriting_tpu.models.zoo import load_seq_stylegan
    model, params = load_seq_stylegan('faces', truncation=0.5)
    n_images, batch = 100, 10
except FileNotFoundError:
    from rewriting_tpu.models import ProgressiveGenerator
    model = ProgressiveGenerator(sizes=[16, 16, 8, 8])
    params = model.init_params(jax.random.PRNGKey(0))
    n_images, batch = 24, 8
img_path = os.path.join(tempfile.mkdtemp(), 'faces')
sample_clean(model, params, img_path, n=n_images, batch_size=batch)
len(os.listdir(img_path))
"""),
        ("code", """\
# per-attribute frequency over the folder (sigmoid > 0.5 per attribute,
# the reference's criterion)
from rewriting_tpu.native import read_image_rgb
from rewriting_tpu.utils import renormalize
freq = np.zeros(len(slimnet.CELEBA_ATTRS), np.int64)
for lo in range(0, n_images, batch):
    imgs = np.stack([
        renormalize.renormalize(
            read_image_rgb(os.path.join(img_path, f"{i}.png")).astype(
                np.float32) / 255.0, "pt", "zc")
        for i in range(lo, min(lo + batch, n_images))])
    probs = jax.nn.sigmoid(clf.logits(imgs))
    freq += np.asarray(probs > 0.5).sum(axis=0)
rows = sorted(zip(slimnet.CELEBA_ATTRS, freq), key=lambda t: -t[1])
[(a, int(c), f"{100 * c / n_images:.0f}%") for a, c in rows[:12]]
"""),
        ("code", """\
# single-image inspection (the reference's PATH_TO_IMAGE cell)
img = renormalize.renormalize(
    read_image_rgb(os.path.join(img_path, "0.png")).astype(
        np.float32) / 255.0, "pt", "zc")
probs = np.asarray(jax.nn.sigmoid(clf.logits(img[None])))[0]
pred = [slimnet.CELEBA_ATTRS[i] for i in np.where(probs > 0.5)[0]]
print("image 0 attributes:", pred)
print("smiling prob:", float(probs[slimnet.SMILING]))
"""),
    ]
    return nb(cells)


def gen_area_profile():
    cells = [
        ("markdown", """\
# Per-image region-area profile

TPU-native port of the reference's `notebooks/stats/Untitled.ipynb`
(scratch analysis: glob a sample directory of dome images and profile
the per-image area of the region of interest before/after an edit —
the distributional view behind the aggregate numbers)."""),
        ("code", TINY_SETUP),
        ("code", TINY_SEG),
        ("code", SAMPLE_DIRS),
        ("code", """\
# per-IMAGE area fraction of the most-affected class, before vs after
from rewriting_tpu.native import read_image_rgb

def per_image_areas(path, label):
    fracs = []
    for i in range(n_images):
        img = renormalize.renormalize(
            read_image_rgb(os.path.join(path, f"{i}.png")).astype(
                np.float32) / 255.0, "pt", "zc")
        seg = np.asarray(segmodel.segment_batch(jnp.asarray(img[None])))
        fracs.append(float((seg[0, 0] == label).mean()))
    return np.asarray(fracs)

# pick the class whose total area changed most
from rewriting_tpu.stats import RunningBincount

def totals(path):
    rb = RunningBincount(size=len(seglabels) + 1)
    for lo in range(0, n_images, batch):
        imgs = np.stack([
            renormalize.renormalize(
                read_image_rgb(os.path.join(path, f"{i}.png")).astype(
                    np.float32) / 255.0, "pt", "zc")
            for i in range(lo, min(lo + batch, n_images))])
        seg = np.asarray(segmodel.segment_batch(jnp.asarray(imgs)))
        rb.add(seg[:, 0].reshape(len(imgs), -1))
    return np.asarray(rb.result())

tb, ta = totals(before_dir), totals(after_dir)
label = int(np.argmax(np.abs(ta.astype(np.int64) - tb.astype(np.int64))))
name = seglabels[label] if label < len(seglabels) else str(label)
fb = per_image_areas(before_dir, label)
fa = per_image_areas(after_dir, label)
print(f"class '{name}': mean area before {fb.mean():.4f} "
      f"after {fa.mean():.4f}")
"""),
        ("code", """\
# distribution: histogram of per-image area fractions
bins = np.linspace(0, max(fb.max(), fa.max(), 1e-6), 8)
hb, _ = np.histogram(fb, bins)
ha, _ = np.histogram(fa, bins)
rows = [("bin<=", "before", "after")]
for i in range(len(hb)):
    rows.append((round(float(bins[i + 1]), 4), int(hb[i]), int(ha[i])))
rows
"""),
    ]
    return nb(cells)


GENERATED = {
    "segmentation-stats-dome2tree.ipynb": gen_dome2tree,
    "segmentation-stats-comparison.ipynb": gen_comparison,
    "folder-segmentation.ipynb": gen_folder_seg,
    "folder-segmentation-resumable.ipynb": gen_folder_seg_resumable,
    "folder-segmentation-sharded.ipynb": gen_folder_seg_sharded,
    "ffhq-label-stats.ipynb": gen_ffhq_label,
    "dome-area-profile.ipynb": gen_area_profile,
}


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, gen in GENERATED.items():
        path = os.path.join(OUT, name)
        with open(path, "w") as f:
            json.dump(gen(), f, indent=1)
        print(path)


if __name__ == "__main__":
    main()
