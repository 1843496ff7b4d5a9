"""StyleGAN2 parity vs reference goldens: full forward, window activations,
truncation, and surgery at the rewriting edit window."""

import jax
import jax.numpy as jnp
import numpy as np

from rewriting_tpu.core import DataBag
from rewriting_tpu.models.stylegan2 import SeqStyleGAN2, params_from_state_dict


def nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def _golden_model(goldens, truncation=1.0):
    g = goldens("stylegan2_tiny")
    sd = {k[len("sd."):]: g[k] for k in g.files if k.startswith("sd.")}
    model = SeqStyleGAN2(size=16, style_dim=64, n_mlp=2,
                         truncation=truncation)
    params = params_from_state_dict(model, sd)
    return g, model, params


def test_forward_parity(goldens):
    g, model, params = _golden_model(goldens)
    out = model(params, jnp.asarray(g["z"]))
    np.testing.assert_allclose(nchw(out), g["out"], atol=3e-4, rtol=1e-3)


def test_window_activation_parity(goldens):
    g, model, params = _golden_model(goldens)
    z = jnp.asarray(g["z"])
    # context -> edit window split used by SeqStyleGanRewriter
    # (reference ganrewrite.py:662-665)
    context = model.pipeline.subsequence(
        upto_layer="layer3.sconv.mconv.dconv")
    window = model.pipeline.subsequence(
        first_layer="layer3.sconv.mconv.dconv",
        last_layer="layer3.sconv.activate")
    bag = DataBag(latent=z)
    bag.update(model.prepare_noise(z.shape[0]))
    kbag = context(params, bag)
    np.testing.assert_allclose(nchw(kbag["fmap"]), g["layer3_adain"],
                               atol=3e-4, rtol=1e-3)
    vbag = window(params, kbag)
    np.testing.assert_allclose(nchw(vbag["fmap"]), g["layer3_act"],
                               atol=3e-4, rtol=1e-3)


def test_dconv_only_window_parity(goldens):
    g, model, params = _golden_model(goldens)
    z = jnp.asarray(g["z"])
    context = model.pipeline.subsequence(
        upto_layer="layer3.sconv.mconv.dconv")
    dconv = model.pipeline.subsequence(
        first_layer="layer3.sconv.mconv.dconv",
        last_layer="layer3.sconv.mconv.dconv")
    bag = DataBag(latent=z)
    bag.update(model.prepare_noise(z.shape[0]))
    out = dconv(params, context(params, bag))
    np.testing.assert_allclose(nchw(out["fmap"]), g["layer3_dconv"],
                               atol=3e-4, rtol=1e-3)


def test_truncation_parity(goldens):
    gt = goldens("stylegan2_tiny_trunc")
    g, model, params = _golden_model(goldens, truncation=0.5)
    params["latents"]["latent_avg"] = jnp.asarray(gt["latent_avg"])
    out = model(params, jnp.asarray(gt["z"]))
    np.testing.assert_allclose(nchw(out), gt["out"], atol=3e-4, rtol=1e-3)


def test_fused_pipeline_matches_seq(goldens):
    """The blur-folded sampling fast path must be numerically equivalent
    to the sequential (editable) pipeline and hit the torch golden."""
    g, model, params = _golden_model(goldens)
    z = jnp.asarray(g["z"])
    a = np.asarray(model(params, z))
    b = np.asarray(model(params, z, fused=True))
    np.testing.assert_allclose(a, b, atol=1e-5)
    np.testing.assert_allclose(nchw(b), g["out"], atol=3e-4, rtol=1e-3)


def test_jit_and_random_init():
    model = SeqStyleGAN2(size=16, style_dim=32, n_mlp=2)
    params = model.init_params(jax.random.PRNGKey(1))
    z = jax.random.normal(jax.random.PRNGKey(2), (4, 32))
    fwd = jax.jit(lambda p, z, noise: model(p, z, noise))
    out = fwd(params, z, model.prepare_noise(4))
    assert out.shape == (4, 16, 16, 3)
    out2 = fwd(params, z, model.prepare_noise(4))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_composite_up_dconv_matches_dconv_plus_blur():
    """The blur-folded subpixel up-conv (fast s2d tail) is an exact
    composite of the seq dconv followed by the FIR blur."""
    import rewriting_tpu.models.stylegan2 as sg
    from rewriting_tpu.core import DataBag

    rng = np.random.RandomState(0)
    ci, co, h = 6, 5, 12
    x = jnp.asarray(rng.randn(2, h, h, ci), jnp.float32)
    w5 = jnp.asarray(rng.randn(1, co, ci, 3, 3), jnp.float32)
    style = jnp.asarray(rng.randn(2, ci), jnp.float32)
    d = DataBag(fmap=x, style=style)
    seq_dconv = sg._make_dconv(ci, co, 3, True, True)
    blur = sg._make_blur([1, 3, 3, 1], (1, 1), 2)
    want = blur(None, seq_dconv({"weight": w5}, d))["fmap"]
    fast = sg._make_fast_up_dconv_s2d(ci, co, 3, True, [1, 3, 3, 1])
    got = sg._d2s_of(fast({"weight": w5}, d)["fmap"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fast_s2d_tail_pipeline_matches_seq():
    """pipeline_fast (blur-folded s2d tail) must be e2e-exact vs the seq
    pipeline. Channels are shrunk so the <=32-channel tail gate triggers
    at CPU-testable sizes."""
    import rewriting_tpu.models.stylegan2 as sg
    from conftest import tiny_channel_stylegan

    m = tiny_channel_stylegan(512)
    assert m._s2d_tail, "8-channel 512-res layer must trigger the tail"
    p = m.init_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    o_seq = np.asarray(m(p, z, fast=False))
    o_fast = np.asarray(m(p, z, fast=True))
    rel = np.max(np.abs(o_fast - o_seq)) / np.max(np.abs(o_seq))
    assert rel < 1e-4, rel
    # model with no narrow layers: no s2d-tail overrides; the only fast
    # overrides are the fused-upconv-capable dconv/blur pairs, which
    # reduce to the seq stages at trace time while the fused kernel is
    # off (the default)
    m256 = sg.SeqStyleGAN2(size=32, style_dim=16, n_mlp=1)
    assert all(k.endswith((".mconv.dconv", ".mconv.blur", ".noise",
                           ".activate"))
               for k in m256._fast_overrides), sorted(m256._fast_overrides)


def test_fast_s2d_tail_chained_up_layers():
    """With a wider channel gate, consecutive up layers stay in the s2d
    tail (the second up-conv consumes s2d input); still e2e-exact."""
    from conftest import tiny_channel_stylegan

    m = tiny_channel_stylegan(1024, s2d_tail_max_c=16,
                              ch={4: 24, 8: 24, 16: 24, 32: 24, 64: 24,
                                  128: 24, 256: 24, 512: 16, 1024: 8})
    ups = sorted(k for k in m._fast_overrides if k.endswith(".mconv.dconv"))
    assert "layer15.sconv.mconv.dconv" in ups  # tail entry (NHWC input)
    assert "layer17.sconv.mconv.dconv" in ups  # chained (s2d input)
    p = m.init_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
    o_seq = np.asarray(m(p, z, fast=False))
    o_fast = np.asarray(m(p, z, fast=True))
    rel = np.max(np.abs(o_fast - o_seq)) / np.max(np.abs(o_seq))
    assert rel < 1e-4, rel


def test_bf16_acts_quality_gate(goldens):
    """The 'bf16_acts' throughput mode's output deviation is MEASURED,
    not asserted: on CPU (which computes bfloat16 arithmetic for real)
    the tiny golden model must stay above a loose PSNR floor vs the fp32
    forward (measured ~43 dB; bound 30 dB).  The real-chip quality table
    (PSNR + random-feature Frechet delta for every throughput mode at
    256 scale) is recorded by bench.py as precision_quality_vs_highest."""
    import jax.numpy as jnp
    from rewriting_tpu.ops.precision import cast_pytree
    g, model, params = _golden_model(goldens)
    z = jnp.asarray(g["z"])
    noise = model.prepare_noise(z.shape[0])
    ref = np.asarray(model(params, z, noise), np.float32)
    out = np.asarray(model(cast_pytree(params, jnp.bfloat16),
                           z.astype(jnp.bfloat16),
                           cast_pytree(noise, jnp.bfloat16)), np.float32)
    mse = float(np.mean((out - ref) ** 2))
    psnr = 10.0 * np.log10(4.0 / max(mse, 1e-12))
    assert psnr > 30.0, psnr


def test_mixed_precision_schedule():
    """Per-layer precision: stage_resolution maps every SeqStyleGAN2
    stage name to its output resolution, and an installed schedule
    overrides get_precision only inside matching stage scopes (the
    numeric effect is TPU-only — CPU computes fp32 at every tier — so the
    quality/throughput table lives in bench.py / docs/PERF_NOTES.md)."""
    from jax import lax
    from rewriting_tpu.models.stylegan2 import (mixed_precision_schedule,
                                                stage_resolution)
    from rewriting_tpu.ops import precision

    assert stage_resolution("layer2.conv.mconv.dconv") == 4
    assert stage_resolution("layer3.sconv.mconv.dconv") == 8
    assert stage_resolution("layer4.sconv.activate") == 8
    assert stage_resolution("layer5.sconv.mconv.adain") == 16
    assert stage_resolution("layer12.sconv.mconv.dconv") == 128
    assert stage_resolution("up_rgb1") == 8
    assert stage_resolution("to_rgb1.rgb") == 4
    assert stage_resolution("to_rgb3.rgb") == 16
    assert stage_resolution("style.3") is None
    assert stage_resolution("input") is None

    precision.set_precision("highest")
    precision.set_precision_schedule(
        mixed_precision_schedule(min_res=16, tier="default",
                                 keep_rgb=False))
    try:
        # outside any stage scope: global policy
        assert precision.get_precision() == lax.Precision.HIGHEST
        with precision.stage_scope("layer5.sconv.mconv.dconv"):  # res 16
            assert precision.get_precision() == lax.Precision.DEFAULT
        with precision.stage_scope("layer4.sconv.mconv.dconv"):  # res 8
            assert precision.get_precision() == lax.Precision.HIGHEST
        with precision.stage_scope("style.2"):
            assert precision.get_precision() == lax.Precision.HIGHEST
        with precision.stage_scope("up_rgb7"):  # res 512
            assert precision.get_precision() == lax.Precision.DEFAULT
        # keep_rgb (the measured default): rgb skip chain stays global
        precision.set_precision_schedule(
            mixed_precision_schedule(min_res=16, tier="default"))
        with precision.stage_scope("up_rgb7"):
            assert precision.get_precision() == lax.Precision.HIGHEST
        with precision.stage_scope("to_rgb5.rgb"):
            assert precision.get_precision() == lax.Precision.HIGHEST
        with precision.stage_scope("layer5.sconv.mconv.dconv"):
            assert precision.get_precision() == lax.Precision.DEFAULT
    finally:
        precision.set_precision_schedule(None)
    assert precision.get_precision() == lax.Precision.HIGHEST


def test_recommended_precision_schedule_scale_aware():
    """The scale-aware default (round-5): the recommended schedule picks
    the measured per-scale min_res (256->128, 512->512, 1024->1024;
    docs/PERF_NOTES.md round-4 tables) instead of a global 128, and the
    ProgGAN family recommendation is min_res=16 at any scale."""
    import types
    from jax import lax
    from rewriting_tpu.models import proggan, stylegan2
    from rewriting_tpu.ops import precision

    def decides(sched, stage, tier):
        precision.set_precision("high")
        precision.set_precision_schedule(sched)
        try:
            with precision.stage_scope(stage):
                return precision.get_precision() == tier
        finally:
            precision.set_precision_schedule(None)

    fake = lambda size: types.SimpleNamespace(size=size)
    # 256 model: bf16 from res 128 (layer12 is 128-res)
    s256 = stylegan2.recommended_precision_schedule(fake(256))
    assert decides(s256, "layer12.sconv.mconv.dconv", lax.Precision.DEFAULT)
    assert decides(s256, "layer10.sconv.mconv.dconv", lax.Precision.HIGH)
    # 512 model (round-5 fine-grained optimum): bf16 from res 256 with
    # the 128->256 up-conv (layer13) pinned fp32
    s512 = stylegan2.recommended_precision_schedule(fake(512))
    assert decides(s512, "layer15.sconv.mconv.dconv", lax.Precision.DEFAULT)
    assert decides(s512, "layer14.sconv.mconv.dconv", lax.Precision.DEFAULT)
    assert decides(s512, "layer13.sconv.mconv.dconv", lax.Precision.HIGH)
    assert decides(s512, "layer12.sconv.mconv.dconv", lax.Precision.HIGH)
    # 1024 model (round-5 fine-grained optimum): bf16 from res 512 with
    # the 256->512 up-conv (layer15) pinned fp32
    s1024 = stylegan2.recommended_precision_schedule(fake(1024))
    assert decides(s1024, "layer17.sconv.mconv.dconv",
                   lax.Precision.DEFAULT)
    assert decides(s1024, "layer16.sconv.mconv.dconv",
                   lax.Precision.DEFAULT)
    assert decides(s1024, "layer15.sconv.mconv.dconv", lax.Precision.HIGH)
    assert decides(s1024, "layer14.sconv.mconv.dconv", lax.Precision.HIGH)
    # unlisted scale: conservative min_res=size
    s128 = stylegan2.recommended_precision_schedule(fake(128))
    assert decides(s128, "layer11.sconv.mconv.dconv", lax.Precision.DEFAULT)
    assert decides(s128, "layer9.sconv.mconv.dconv", lax.Precision.HIGH)
    # ProgGAN: min_res=16 everywhere, output conv pinned
    sp = proggan.recommended_precision_schedule(fake(256))
    assert decides(sp, "layer5.conv", lax.Precision.DEFAULT)  # res 16
    assert decides(sp, "layer4.conv", lax.Precision.HIGH)     # res 8
    assert decides(sp, "output_256x256.conv", lax.Precision.HIGH)


def test_precision_schedule_suspension():
    """The editing engine's parity guarantee: schedule_suspended() pins
    the global tier even inside a matching stage scope, and
    suspend_schedule_in keeps the suspension live across a jit trace —
    the mechanism by which the rewriter's solvers/stats/key-extraction
    ignore an installed mixed-precision SAMPLING schedule
    (ops/precision.py; the solver entry points enter it)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from rewriting_tpu.models.stylegan2 import mixed_precision_schedule
    from rewriting_tpu.ops import precision

    precision.set_precision("highest")
    precision.set_precision_schedule(
        mixed_precision_schedule(min_res=16, tier="default",
                                 keep_rgb=False))
    seen = []

    def probe(x):
        seen.append(precision.get_precision())  # read at trace time
        return x * 1.0

    try:
        with precision.stage_scope("layer5.sconv.mconv.dconv"):  # res 16
            probe(jnp.ones(()))
            with precision.schedule_suspended():
                probe(jnp.ones(()))
            jax.jit(precision.suspend_schedule_in(probe))(jnp.ones(()))
    finally:
        precision.set_precision_schedule(None)
    assert seen[0] == lax.Precision.DEFAULT    # schedule applies
    assert seen[1] == lax.Precision.HIGHEST    # suspended: global tier
    assert seen[2] == lax.Precision.HIGHEST    # suspended through jit


def test_fused_upconv_pipeline_matches_seq(goldens):
    """With the fused up-conv+blur kernel forced on, pipeline_fast must
    stay e2e fp32-tolerance-exact vs the seq pipeline (interpret mode on
    CPU; the compiled kernel is validated on hardware by
    scripts/bench_upconv_fused.py).  min_res=0 forces the kernel to
    actually engage on the tiny model's res-8/16 layers (the default 256
    gate would silently compare seq against itself)."""
    from rewriting_tpu.ops.pallas_upconv import (fused_upconv_active,
                                                 set_fused_upconv)
    g, model, params = _golden_model(goldens)
    z = jnp.asarray(g["z"])
    noise = model.prepare_noise(z.shape[0])
    o_seq = np.asarray(model(params, z, noise, fast=False))
    set_fused_upconv("on", min_res=0)
    try:
        # style_dim 64 model: in/out channels 64 >= the lane gate; guard
        # against this test going vacuous again
        assert fused_upconv_active(64, 64, 16)
        o_fast = np.asarray(model(params, z, noise, fast=True))
    finally:
        set_fused_upconv("off", min_res=256)
    rel = np.max(np.abs(o_fast - o_seq)) / np.max(np.abs(o_seq))
    assert 0.0 < rel < 1e-4, rel  # 0.0 would mean the kernel never ran


def test_fused_upconv_asymmetric_blur_kernel(goldens):
    """An asymmetric 4-tap blur_kernel must stay e2e-exact through the
    fused path (regression: the fused derivation passed unflipped taps
    into the flipped-tap kernel body, correct only for symmetric FIRs)."""
    from rewriting_tpu.ops.pallas_upconv import set_fused_upconv
    g = goldens("stylegan2_tiny")
    sd = {k[len("sd."):]: g[k] for k in g.files if k.startswith("sd.")}
    model = SeqStyleGAN2(size=16, style_dim=64, n_mlp=2,
                         blur_kernel=[1, 2, 3, 1])
    params = params_from_state_dict(model, sd)
    z = jnp.asarray(g["z"])
    noise = model.prepare_noise(z.shape[0])
    o_seq = np.asarray(model(params, z, noise, fast=False))
    set_fused_upconv("on", min_res=0)
    try:
        o_fast = np.asarray(model(params, z, noise, fast=True))
    finally:
        set_fused_upconv("off", min_res=256)
    rel = np.max(np.abs(o_fast - o_seq)) / np.max(np.abs(o_seq))
    assert 0.0 < rel < 1e-4, rel


def test_non_4tap_blur_kernel_builds_and_falls_back(goldens):
    """A non-4-tap blur_kernel builds fine and pipeline_fast degrades to
    the exact seq stages (the fused kernel and the s2d composite are both
    4-tap-specialized, so their overrides must not install)."""
    from rewriting_tpu.ops.pallas_upconv import set_fused_upconv
    g = goldens("stylegan2_tiny")
    sd = {k[len("sd."):]: g[k] for k in g.files if k.startswith("sd.")}
    model = SeqStyleGAN2(size=16, style_dim=64, n_mlp=2,
                         blur_kernel=[1, 2, 1])
    params = params_from_state_dict(model, sd)
    z = jnp.asarray(g["z"])
    noise = model.prepare_noise(z.shape[0])
    o_seq = np.asarray(model(params, z, noise, fast=False))
    set_fused_upconv("on", min_res=0)
    try:
        o_fast = np.asarray(model(params, z, noise, fast=True))
    finally:
        set_fused_upconv("off", min_res=256)
    np.testing.assert_array_equal(o_fast, o_seq)


def test_fused_upconv_broadcast_noise(goldens):
    """Fixed noise buffers shaped (1, r, r, 1) with batch > 1 work through
    the fused epilogue exactly like the seq stage's broadcasting
    (regression: the fused path asserted batch-matched noise)."""
    from rewriting_tpu.ops.pallas_upconv import set_fused_upconv
    g, model, params = _golden_model(goldens)
    z = jnp.asarray(g["z"])
    assert z.shape[0] > 1
    noise1 = {k: v[:1] for k, v in model.prepare_noise(1).items()}
    o_seq = np.asarray(model(params, z, noise1, fast=False))
    set_fused_upconv("on", min_res=0)
    try:
        o_fast = np.asarray(model(params, z, noise1, fast=True))
    finally:
        set_fused_upconv("off", min_res=256)
    rel = np.max(np.abs(o_fast - o_seq)) / np.max(np.abs(o_seq))
    assert rel < 1e-4, rel


def test_int8_tier_schedule(goldens):
    """The int8 serving tier (ops/quant.py): a schedule returning "int8"
    routes the dconv stages through the quantized MXU core.  Unlike the
    bf16 tiers, the quantization is numerically active on every backend,
    so quality is assertable on CPU: the quantized forward must track the
    fp32 forward within W8A8 noise, and the rewriter-side suspension
    contract must keep edits bit-exact."""
    from rewriting_tpu.models.stylegan2 import mixed_precision_schedule
    from rewriting_tpu.ops import precision

    # tier resolution plumbing
    precision.set_precision("highest")
    precision.set_precision_schedule(
        mixed_precision_schedule(min_res=8, tier="int8", keep_rgb=True))
    try:
        with precision.stage_scope("layer4.sconv.mconv.dconv"):  # res 8
            assert precision.int8_active()
            # non-conv ops inside an int8 stage run throughput precision
            assert precision.get_precision() == jax.lax.Precision.DEFAULT
        with precision.stage_scope("to_rgb3.rgb"):  # keep_rgb pins global
            assert not precision.int8_active()
        with precision.schedule_suspended():
            with precision.stage_scope("layer4.sconv.mconv.dconv"):
                assert not precision.int8_active()

        g, model, params = _golden_model(goldens)
        z = jnp.asarray(g["z"])
        quant_out = np.asarray(model(params, z))
        precision.set_precision_schedule(None)
        ref_out = np.asarray(model(params, z))
        assert quant_out.shape == ref_out.shape
        err = quant_out - ref_out
        assert np.abs(err).max() > 0, "int8 path did not activate"
        psnr = 10 * np.log10(4.0 / np.mean(np.square(err)))
        assert psnr > 30.0, psnr  # W8A8 noise, not a broken path

        # suspension: the solver-side pinned forward is bit-identical to
        # the no-schedule forward
        precision.set_precision_schedule(
            mixed_precision_schedule(min_res=8, tier="int8"))
        with precision.schedule_suspended():
            pinned = np.asarray(model(params, z))
        np.testing.assert_array_equal(pinned, ref_out)
    finally:
        precision.set_precision_schedule(None)
