"""Regressions from the round-1 self code review."""

import numpy as np
import jax
import pytest

from rewriting_tpu.models import SeqStyleGAN2
from rewriting_tpu.stats import tally
from rewriting_tpu.utils.renormalize import mask_to_url
from rewriting_tpu.utils.zdataset import ZDataset, z_dataset_for_model
from conftest import blob




def _tiny_stylegan(goldens):
    g = goldens("stylegan2_tiny")
    sd = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
    from rewriting_tpu.models.stylegan2 import params_from_state_dict
    model = SeqStyleGAN2(size=16, style_dim=64, n_mlp=2)
    return model, params_from_state_dict(model, sd)


@pytest.mark.slow
def test_seqpre_svd_uses_style_adjusted_solve(goldens):
    """svd/mean keys must route through the covariance_adjusted_key hook so
    SeqPre's C diag(s) solve actually applies."""
    from rewriting_tpu.rewrite import (SeqPreStyleGanRewriter,
                                       SeqStyleGanRewriter)
    model, params = _tiny_stylegan(goldens)
    zds = z_dataset_for_model(model, 12)
    h = 4
    mask = mask_to_url(blob(h, h, 2, 2, 2))
    pre = SeqPreStyleGanRewriter(model, params, zds, layernum=3,
                                 stats_batch_size=4)
    std = SeqStyleGanRewriter(model, params, zds, layernum=3,
                              stats_batch_size=4)
    d_pre = np.asarray(pre.multi_key_from_selection([(0, mask)], rank=1,
                                                    key_method="mean"))
    # same selection through the plain C^{-1} solve on the SAME key acts:
    # compute manually with pre's context (pre-adain fmaps)
    k_bag = pre.context_of(0)
    k_acts = np.asarray(pre.context_acts(k_bag))
    area = pre._mask_at(mask, pre.k_shape[1:3])
    weighted = k_acts.reshape(-1, k_acts.shape[-1]) * area.reshape(-1, 1)
    nonzero = weighted[np.linalg.norm(weighted, axis=1) > 0]
    from rewriting_tpu.rewrite.solve import solve_spd
    plain = np.asarray(solve_spd(pre.c_matrix, nonzero)).mean(0)
    plain = plain / np.linalg.norm(plain)
    styled = np.asarray(pre.covariance_adjusted_key(nonzero, k_bag)).mean(0)
    styled = styled / np.linalg.norm(styled)
    # the hook result differs from the plain solve, and the rewriter used
    # the hook
    assert not np.allclose(styled, plain, atol=1e-4)
    np.testing.assert_allclose(np.abs(d_pre[0]), np.abs(styled),
                               atol=1e-4)
    # the standard rewriter still matches the plain solve on ITS window
    d_std = np.asarray(std.multi_key_from_selection([(0, mask)], rank=1,
                                                    key_method="mean"))
    assert d_std.shape == (1, std.k_shape[-1])


@pytest.mark.slow
def test_fast_parts_fallbacks(goldens):
    """Tiny window gets the fast path with an identity tail; SeqPre falls
    back to the direct linear insert instead of crashing."""
    from rewriting_tpu.rewrite import (SeqPreStyleGanRewriter,
                                       SeqTinyStyleGanRewriter)
    model, params = _tiny_stylegan(goldens)
    zds = z_dataset_for_model(model, 12)
    tiny = SeqTinyStyleGanRewriter(model, params, zds, layernum=4,
                                   stats_batch_size=4)
    assert tiny.fast_parts_cached() is not None
    pre = SeqPreStyleGanRewriter(model, params, zds, layernum=4,
                                 stats_batch_size=4)
    assert pre.fast_parts_cached() is None
    vh, vw = pre.v_shape[1:3]
    req = {"object": [0, mask_to_url(blob(vh, vw, 2, 2, 2))],
           "paste": [1, mask_to_url(blob(vh, vw, 5, 5, 2))]}
    obj_acts, _, obj_area, _ = pre.object_from_selection(*req["object"])
    goal_in, goal_out, _, _ = pre.paste_from_selection(
        1, req["paste"][1], obj_acts, obj_area)
    d = pre.multi_key_from_selection([req["paste"]], rank=1)
    pre.fast_linear_insert(goal_in, goal_out, d, niter=3)  # falls back
    assert np.isfinite(np.asarray(pre.target_weight())).all()
    # fast parts are memoized (identity-stable for the jit cache)
    assert tiny.fast_parts_cached() is tiny.fast_parts_cached()


def test_conditional_samples_alignment():
    acts = np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
    for seg_res in (4, 8, 12, 3):  # equal, multiple, non-multiple, smaller
        segs = np.zeros((2, 1, seg_res, seg_res), np.int64)
        segs[:, :, :max(seg_res // 2, 1)] = 7
        pairs = dict(tally.conditional_samples(acts, segs))
        assert pairs[0].shape == (32, 3)
        assert pairs[7].shape[1] == 3 and len(pairs[7]) > 0


def test_fid_and_lpips_refuse_random_weights(tmp_path, monkeypatch):
    """Meaningless-metric guards: default extractors must fail loudly
    without trained weights instead of returning uncalibrated numbers."""
    from rewriting_tpu.metrics import distances
    from rewriting_tpu.metrics.fid import FeatureExtractor
    monkeypatch.setenv("REWRITING_TPU_WEIGHTS", str(tmp_path))
    with pytest.raises(FileNotFoundError):
        FeatureExtractor()
    fx = FeatureExtractor(allow_random=True)  # explicit opt-in works
    assert fx(np.zeros((1, 32, 32, 3), np.float32)).shape == (1, 2048)
    with pytest.raises(FileNotFoundError):
        distances.compute_dl("x", "y", "z", [], metric="lpips")


def test_checkpoint_coverage_guard(goldens):
    """A partial checkpoint must be rejected, not silently half-loaded."""
    from rewriting_tpu.models.stylegan2 import params_from_state_dict
    g = goldens("stylegan2_tiny")
    sd = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
    model = SeqStyleGAN2(size=16, style_dim=64, n_mlp=2)
    partial = {k: v for k, v in sd.items() if "dconv" not in k}
    with pytest.raises(ValueError, match="missing"):
        params_from_state_dict(model, partial)
    params_from_state_dict(model, sd)  # complete dict still loads


def test_component_masks_separate_classes():
    """Adjacent regions of different classes must be separate components."""
    from rewriting_tpu.segment.segmenter import _component_masks
    seg = np.zeros((1, 8, 8), np.int64)
    seg[0, :, :4] = 1
    seg[0, :, 4:] = 2  # touching, different class
    comps = list(_component_masks(seg))
    assert len(comps) == 2
    sizes = sorted(int(m.sum()) for _, m in comps)
    assert sizes == [32, 32]


def test_topk_and_quantile_cache(tmp_path):
    rng = np.random.RandomState(0)
    zds = ZDataset(rng.randn(30, 4).astype(np.float32))
    calls = []

    def compute(z):
        calls.append(1)
        s = np.asarray(z) @ np.ones((4, 2), np.float32)
        return s, s

    cf = str(tmp_path / "tq.npz")
    topk1, rq1 = tally.tally_topk_and_quantile(compute, zds, k=3,
                                               batch_size=10, cachefile=cf)
    ncalls = len(calls)
    topk2, rq2 = tally.tally_topk_and_quantile(compute, zds, k=3,
                                               batch_size=10, cachefile=cf)
    assert len(calls) == ncalls  # cache hit
    np.testing.assert_allclose(np.asarray(topk2.result()[0]),
                               np.asarray(topk1.result()[0]))
    np.testing.assert_allclose(np.asarray(rq2.quantiles([0.5])),
                               np.asarray(rq1.quantiles([0.5])))


# ---------------------------------------------------------------------------
# Round-2 advisor findings
# ---------------------------------------------------------------------------

def test_s2d_tail_interrupted_by_wide_layer_degrades_gracefully():
    """A wide (non-qualifying) layer after the fast s2d tail has engaged
    must not fail construction: the tail ends with a d2s bridge and the
    remaining layers run their seq stages, keeping pipeline_fast exact
    (round-2 advisor finding, stylegan2.py)."""
    from conftest import tiny_channel_stylegan

    m = tiny_channel_stylegan(1024, s2d_tail_max_c=8,
                              ch={4: 16, 8: 16, 16: 16, 32: 16, 64: 16,
                                  128: 16, 256: 16, 512: 8, 1024: 24})
    # tail engaged at 512 (8ch), bridged off before the wide 1024 layer
    assert "layer15.sconv.mconv.dconv" in m._fast_overrides
    assert "layer17.sconv.mconv.dconv" not in m._fast_overrides
    assert "layer17.sconv.mconv.adain" in m._fast_overrides  # d2s bridge
    assert not m._s2d_tail
    p = m.init_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
    o_seq = np.asarray(m(p, z, fast=False))
    o_fast = np.asarray(m(p, z, fast=True))
    rel = np.max(np.abs(o_fast - o_seq)) / np.max(np.abs(o_seq))
    assert rel < 1e-4, rel


def test_proggan_s2d_tail_interrupted_degrades_gracefully():
    """Same graceful degradation for the ProgGAN fast tail (round-2
    advisor finding, proggan.py add_block)."""
    from rewriting_tpu.models import ProgressiveGenerator

    # 1024-res model whose last up block widens to 48 channels: the tail
    # engages at 512 (16ch) and must bridge off at the wide block.
    m = ProgressiveGenerator(
        sizes=[32, 16, 16, 16, 16, 16, 16, 16, 16, 48])
    assert m.resolution == 1024 and m._fast_overrides
    assert not m._s2d_tail
    bridges = [k for k, v in m._fast_overrides.items()
               if k.endswith(".norm") and "17" in k]
    assert bridges, sorted(m._fast_overrides)
    p = m.init_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
    o_seq = np.asarray(m(p, z, fast=False))
    o_fast = np.asarray(m(p, z, fast=True))
    rel = np.max(np.abs(o_fast - o_seq)) / max(np.max(np.abs(o_seq)), 1e-6)
    assert rel < 1e-4, rel
