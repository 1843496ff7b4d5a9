"""Progressive GAN generator as a functional stage pipeline.

Mirrors the reference architecture (utils/proggan.py:65-193) — a flat
sequence of named blocks ``layer1..layerN, output_DxD`` where each block is
PixelNorm -> (optional 2x nearest upsample) -> Conv (no bias) -> WScale
(runtime weight scaling + bias) -> LeakyReLU(0.2), with a final 1x1 output
conv + hardtanh — but built TPU-first:

- feature maps are NHWC (TPU conv layout); the latent z enters as a 1x1
  feature map (reference: proggan.py:126-129);
- conv weights are stored in OIHW (torch order) so checkpoint conversion and
  the rewriting einsums (`oiyx,di->odyx`, ganrewrite.py:806-813) are
  layout-identical to the reference, while the conv itself runs NHWC via
  dimension_numbers (XLA folds the weight relayout into the compiled program);
- every stage is a pure function, so any slice (context/target/rendering)
  jits into one XLA program.
"""

from __future__ import annotations

import functools
import itertools
import math
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core import DataBag, Stage, StagePipeline
from ..ops.precision import get_precision

RESOLUTION_SIZES = {
    8: [512, 512, 512],
    16: [512, 512, 512, 512],
    32: [512, 512, 512, 512, 256],
    64: [512, 512, 512, 512, 256, 128],
    128: [512, 512, 512, 512, 256, 128, 64],
    256: [512, 512, 512, 512, 256, 128, 64, 32],
    1024: [512, 512, 512, 512, 512, 256, 128, 64, 32, 16],
}


# ---------------------------------------------------------------------------
# Stage functions
# ---------------------------------------------------------------------------

def _input_stage(params, d: DataBag) -> DataBag:
    z = d["latent"]
    # z (B, C) viewed as a 1x1 NHWC feature map (reference proggan.py:126-129)
    return DataBag(d, fmap=z.reshape(z.shape[0], 1, 1, z.shape[1]))


def _pixel_norm(params, d: DataBag) -> DataBag:
    x = d["fmap"]
    return DataBag(d, fmap=x * lax.rsqrt(
        jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-8))


def _upscale2x(params, d: DataBag) -> DataBag:
    x = d["fmap"]
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return DataBag(d, fmap=x.reshape(n, h * 2, w * 2, c))


def conv2d_nhwc_oihw(x, weight, padding: int):
    """Plain conv: NHWC activations, OIHW weights (torch storage order)."""
    return lax.conv_general_dilated(
        x, weight,
        window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        precision=get_precision(),
    )


def _make_conv(padding: int):
    def conv(params, d: DataBag) -> DataBag:
        return DataBag(d, fmap=conv2d_nhwc_oihw(d["fmap"], params["weight"],
                                                padding))
    return conv


def _make_wscale(scale: float):
    def wscale(params, d: DataBag) -> DataBag:
        # x*scale + b, scale = gain/sqrt(fan_in) (reference proggan.py:146-157)
        return DataBag(d, fmap=d["fmap"] * scale + params["bias"])
    return wscale


def _leaky_relu(params, d: DataBag) -> DataBag:
    x = d["fmap"]
    return DataBag(d, fmap=jnp.where(x >= 0, x, 0.2 * x))


def _hardtanh(params, d: DataBag) -> DataBag:
    return DataBag(d, fmap=jnp.clip(d["fmap"], -1.0, 1.0))


def _return_output(params, d: DataBag) -> DataBag:
    return DataBag(d, output=d["fmap"])


# ---------------------------------------------------------------------------
# Fast s2d tail (production sampling): ProgGAN's high-res blocks are
# narrow-channel (32ch at 256 res, down to 16ch at 1024) and lane-starve
# the TPU exactly like the StyleGAN2 tail (docs/PERF_NOTES.md). The fast
# pipeline folds the nearest-neighbor 2x upsample into the conv (per-phase
# taps over the undilated input — no 2x intermediate is ever materialized)
# and carries the fmap in space-to-depth layout. Exact regroupings; the
# seq pipeline remains the instrumentation/editing surface.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=1)
def _nearest_up_placement() -> np.ndarray:
    """(p, t, d) taps: nearest-up2x then 3x3 SAME conv == per-output-phase
    3-tap correlation over the original grid (tap d of the 3x3 kernel
    lands on original row i + t - 1 for output phase p)."""
    B = np.zeros((2, 3, 3), np.float32)
    for p in range(2):
        for dd in range(3):
            r = 2 * 0 + p + dd - 1          # upsampled row offset from 2i
            B[p, r // 2 + 1, dd] += 1.0
    return B


def _fold_up_kernel(w):
    """(O, I, 3, 3) -> (4O, I, 3, 3) phase kernels of conv∘nearest_up2x
    (phase-major channel order, s2d convention)."""
    B = jnp.asarray(_nearest_up_placement())
    o_c, i_c = w.shape[0], w.shape[1]
    k = jnp.einsum("ptd,PTD,oidD->pPoitT", B, B, w)
    return k.reshape(4 * o_c, i_c, 3, 3)


def _pixel_norm_s2d(params, d: DataBag) -> DataBag:
    x = d["fmap"]
    b, h, w, c4 = x.shape
    xp = x.reshape(b, h, w, 4, c4 // 4)
    n = xp * lax.rsqrt(jnp.mean(jnp.square(xp), axis=-1, keepdims=True)
                       + 1e-8)
    return DataBag(d, fmap=n.reshape(b, h, w, c4))


def _pixel_norm_from_s2d(params, d: DataBag) -> DataBag:
    """pixel-norm for a block that ends the fast s2d tail: bridge the
    incoming s2d-layout fmap back to NHWC, then normalize normally (the
    rest of the block runs its seq stages)."""
    from .stylegan2 import _d2s_of
    return _pixel_norm(params, DataBag(d, fmap=_d2s_of(d["fmap"])))


def _make_fold_up_conv(from_s2d: bool):
    def fn(params, d: DataBag) -> DataBag:
        from .stylegan2 import _d2s_of
        x = d["fmap"]
        if from_s2d:
            x = _d2s_of(x)
        k = _fold_up_kernel(params["weight"])
        return DataBag(d, fmap=lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "OIHW", "NHWC"),
            precision=get_precision()))
    return fn


def _conv_s2d_stage(params, d: DataBag) -> DataBag:
    from .stylegan2 import _s2d_kernel_transform
    wt = _s2d_kernel_transform(params["weight"])
    return DataBag(d, fmap=lax.conv_general_dilated(
        d["fmap"], wt, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        precision=get_precision()))


def _make_wscale_s2d(scale: float):
    def fn(params, d: DataBag) -> DataBag:
        return DataBag(d, fmap=d["fmap"] * scale
                       + jnp.tile(params["bias"], 4))
    return fn


def _out_conv1x1_s2d(params, d: DataBag) -> DataBag:
    """1x1 RGB conv consuming an s2d fmap; output returns to NHWC."""
    from .stylegan2 import _d2s_of
    x = d["fmap"]
    b, h, w, c4 = x.shape
    i_c = c4 // 4
    wk = params["weight"][:, :, 0, 0]              # (3, I)
    xp = x.reshape(b, h, w, 4, i_c)
    rgb = jnp.einsum("bhwpi,ri->bhwpr", xp, wk,
                     precision=get_precision())
    return DataBag(d, fmap=_d2s_of(rgb.reshape(b, h, w, 12)))


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

class ProgressiveGenerator:
    """Functional ProgGAN. `sizes` = [z_dim, 4x4_depth, 8x8_depth, ...]
    (reference: utils/proggan.py:66-124). Output res = 2 * 2**len(sizes)."""

    def __init__(self, resolution: Optional[int] = None,
                 sizes: Optional[Sequence[int]] = None,
                 output_tanh: bool = True):
        assert (resolution is None) != (sizes is None)
        if sizes is None:
            sizes = RESOLUTION_SIZES[resolution]
        self.sizes = list(sizes)
        self.z_dim = self.sizes[0]
        self.output_tanh = output_tanh

        stages: List[Stage] = [Stage("input", _input_stage)]
        self._conv_specs = {}  # name -> (in_c, out_c, kernel, padding, gain)
        # fast s2d tail (production sampling, see block comment above)
        self._fast_overrides: Dict[str, object] = {}
        self._s2d_tail = False
        cur_res = [4]

        def add_block(name, in_c, out_c, ksize, padding, gain, upsample):
            stages.append(Stage(f"{name}.norm", _pixel_norm))
            if upsample:
                stages.append(Stage(f"{name}.up", _upscale2x))
                cur_res[0] *= 2
            stages.append(Stage(f"{name}.conv", _make_conv(padding)))
            scale = gain / math.sqrt(in_c)
            stages.append(Stage(f"{name}.wscale", _make_wscale(scale)))
            self._conv_specs[name] = (in_c, out_c, ksize, padding, gain)
            # fast-tail overrides. Measured on v5e (HIGH): at 256res/b64
            # the seq path WINS (50.4 vs 74.4 ms — XLA's batch-64 conv
            # strategy tolerates 32ch at 256^2), so the tail only engages
            # at >=512 res where lane starvation dominates (matching the
            # StyleGAN2 gate; relu is layout-agnostic)
            if upsample and out_c <= 32 and cur_res[0] >= 512 and ksize == 3:
                if self._s2d_tail:
                    self._fast_overrides[f"{name}.norm"] = _pixel_norm_s2d
                self._fast_overrides[f"{name}.up"] = lambda params, d: d
                self._fast_overrides[f"{name}.conv"] = \
                    _make_fold_up_conv(from_s2d=self._s2d_tail)
                self._fast_overrides[f"{name}.wscale"] = \
                    _make_wscale_s2d(scale)
                self._s2d_tail = True
            elif (not upsample and self._s2d_tail and ksize == 3
                    and out_c <= 32):
                self._fast_overrides[f"{name}.norm"] = _pixel_norm_s2d
                self._fast_overrides[f"{name}.conv"] = _conv_s2d_stage
                self._fast_overrides[f"{name}.wscale"] = \
                    _make_wscale_s2d(scale)
            elif self._s2d_tail and ksize == 1:
                # output 1x1 RGB conv: consume s2d, return to NHWC
                self._fast_overrides[f"{name}.norm"] = _pixel_norm_s2d
                self._fast_overrides[f"{name}.conv"] = _out_conv1x1_s2d
            elif self._s2d_tail:
                # A non-qualifying (wide or otherwise unusual) block after
                # the tail engaged: degrade gracefully — end the tail with
                # a d2s bridge at this block's pixel-norm and fall back to
                # the seq stages, so construction always succeeds.
                self._fast_overrides[f"{name}.norm"] = _pixel_norm_from_s2d
                self._s2d_tail = False

        layer_i = 0

        def lname():
            return "layer%d" % (layer_i + 1)

        add_block(lname(), self.sizes[0], self.sizes[1], 4, 3,
                  math.sqrt(2) / 4, upsample=False)
        stages.append(Stage(f"{lname()}.relu", _leaky_relu))
        layer_i += 1
        add_block(lname(), self.sizes[1], self.sizes[1], 3, 1,
                  math.sqrt(2) / 3, upsample=False)
        stages.append(Stage(f"{lname()}.relu", _leaky_relu))
        layer_i += 1
        for si, so in zip(self.sizes[1:-1], self.sizes[2:]):
            add_block(lname(), si, so, 3, 1, math.sqrt(2) / 3, upsample=True)
            stages.append(Stage(f"{lname()}.relu", _leaky_relu))
            layer_i += 1
            add_block(lname(), so, so, 3, 1, math.sqrt(2) / 3, upsample=False)
            stages.append(Stage(f"{lname()}.relu", _leaky_relu))
            layer_i += 1

        dim = 4 * (2 ** (layer_i // 2 - 1))
        self.resolution = dim
        out_name = "output_%dx%d" % (dim, dim)
        add_block(out_name, self.sizes[-1], 3, 1, 0, 1.0, upsample=False)
        if output_tanh:
            stages.append(Stage(f"{out_name}.clamp", _hardtanh))
        stages.append(Stage("output", _return_output))
        self.output_layer = out_name
        self.pipeline = StagePipeline(stages)
        # production sampling pipeline (== pipeline when no layer
        # qualifies); instrumentation/editing always use `pipeline`
        self.pipeline_fast = StagePipeline([
            Stage(s.name, self._fast_overrides.get(s.name, s.fn))
            for s in stages])

    # -- parameters ---------------------------------------------------------
    def init_params(self, key) -> Dict[str, Dict[str, jnp.ndarray]]:
        """Random init: conv weights ~ N(0,1) (runtime wscale carries the
        fan-in scaling, per the original ProgGAN scheme), bias ~ N(0,1)
        matching the reference's WScaleLayer init (proggan.py:150)."""
        params = {}
        for name, (in_c, out_c, k, _, _) in self._conv_specs.items():
            key, k1, k2 = jax.random.split(key, 3)
            params[f"{name}.conv"] = {
                "weight": jax.random.normal(k1, (out_c, in_c, k, k),
                                            jnp.float32)}
            params[f"{name}.wscale"] = {
                "bias": jax.random.normal(k2, (out_c,), jnp.float32)}
        return params

    # -- application --------------------------------------------------------
    def make_bag(self, z) -> DataBag:
        """Input bag for a (B, z_dim) latent batch."""
        return DataBag(latent=jnp.asarray(z))

    def __call__(self, params, z, fast: bool = True) -> jnp.ndarray:
        """z (B, z_dim) -> NHWC image in [-1, 1]. fast=True (default)
        runs the production sampling pipeline (fast s2d tail; e2e-exact,
        == seq stages when no layer qualifies)."""
        pipe = self.pipeline_fast if fast else self.pipeline
        return pipe(params, self.make_bag(z))["output"]

    def apply_bag(self, params, bag: DataBag) -> DataBag:
        return self.pipeline(params, bag)


# ---------------------------------------------------------------------------
# Checkpoint conversion (torch .pth state dicts -> params pytree)
# ---------------------------------------------------------------------------

def sizes_from_state_dict(sd) -> List[int]:
    """Infer [z_dim, depths...] from a reference-format state dict
    (reference: utils/proggan.py:222-239)."""
    sizes = []
    for i in itertools.count():
        name = "layer%d.conv.weight" % (i + 1)
        if name not in sd:
            break
        w = sd[name]
        if i == 0:
            sizes.append(w.shape[1])
        if i % 2 == 0:
            sizes.append(w.shape[0])
    return sizes


def params_from_state_dict(sd) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Convert a reference ProgGAN state dict ('layerN.conv.weight',
    'layerN.wscale.b', 'output_DxD.*') into our params pytree.  Weights stay
    OIHW; only the container format changes."""
    params = {}
    for key, val in sd.items():
        val = np.asarray(val, dtype=np.float32)
        if key.endswith(".conv.weight"):
            params[key[:-len(".weight")]] = {"weight": jnp.asarray(val)}
        elif key.endswith(".wscale.b"):
            params[key[:-len(".b")]] = {"bias": jnp.asarray(val)}
        else:
            raise ValueError(f"unrecognized ProgGAN param {key!r}")
    return params


def from_state_dict(sd) -> "tuple[ProgressiveGenerator, dict]":
    """Build (model, params) from a reference-format state dict."""
    sizes = sizes_from_state_dict(sd)
    model = ProgressiveGenerator(sizes=sizes)
    return model, params_from_state_dict(sd)


def state_dict_from_tf_parameters(params) -> dict:
    """Convert original TF ProgGAN variables ({'4x4/Dense/weight': array,
    ...}) to the reference-format state dict, reproducing the dense->conv
    view, conv-transpose flips, and axis permutes
    (reference proggan.py:242-295). Values must be numpy arrays."""
    params = {k: np.asarray(v) for k, v in params.items()}
    result = {}
    i = 0
    for i in itertools.count():
        res = 4 * (2 ** (i // 2))
        tf_name = "%dx%d/%s" % (res, res,
                                "Dense" if i == 0 else "Conv" if i == 1
                                else "Conv0_up" if i % 2 == 0 else "Conv1")
        pt_name = "layer%d" % (i + 1)
        if f"{tf_name}/weight" not in params:
            break
        w = params[f"{tf_name}/weight"]
        if i == 0:
            # dense -> 4x4 conv: (in, out*16) -> (out, in, 4, 4) flipped
            w = w.reshape(w.shape[0], w.shape[1] // 16, 4, 4)
            w = w.transpose(1, 0, 2, 3)[:, :, ::-1, ::-1]
        elif i % 2 == 0:
            # conv-transpose -> conv: permute + spatial flip
            w = w.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]
        else:
            w = w.transpose(3, 2, 0, 1)
        result[f"{pt_name}.conv.weight"] = np.ascontiguousarray(
            w, dtype=np.float32)
        result[f"{pt_name}.wscale.b"] = np.asarray(
            params[f"{tf_name}/bias"], np.float32)
    i -= 1
    res = 4 * (2 ** (i // 2))
    out_name = "output_%dx%d" % (res, res)
    result[f"{out_name}.conv.weight"] = np.ascontiguousarray(
        np.asarray(params["ToRGB_lod0/weight"]).transpose(3, 2, 0, 1),
        dtype=np.float32)
    result[f"{out_name}.wscale.b"] = np.asarray(params["ToRGB_lod0/bias"],
                                                np.float32)
    return result


def from_tf_parameters(params) -> "tuple[ProgressiveGenerator, dict]":
    """(model, params) from original TF variables (reference
    proggan.py:200-208)."""
    return from_state_dict(state_dict_from_tf_parameters(params))


# ---------------------------------------------------------------------------
# Per-layer mixed precision (ProgGAN naming of the generic schedule in
# ops/precision.py; the StyleGAN2 family's measured policy lives in
# models/stylegan2.py:mixed_precision_schedule)
# ---------------------------------------------------------------------------

def stage_resolution(name: str) -> Optional[int]:
    """Output resolution of a ProgressiveGenerator stage, inferred from
    its reference-mirroring name (layerN.* / output_DxD.*, reference
    proggan.py:110-129); None for resolution-free stages (input,
    output)."""
    import re
    m = re.match(r"layer(\d+)\.", name)
    if m:
        n = int(m.group(1))
        return 4 if n <= 2 else 2 ** ((n - 3) // 2 + 3)
    m = re.match(r"output_(\d+)x", name)
    if m:
        return int(m.group(1))
    return None


def mixed_precision_schedule(min_res: int = 128, tier: str = "default",
                             keep_rgb: bool = True):
    """ProgGAN per-layer mixed-precision policy: stages with output
    resolution >= min_res run their convs at `tier` (bf16 MXU passes),
    the low-res trunk keeps the global policy.  Same structure and
    rationale as the StyleGAN2 schedule (docs/PERF_NOTES.md round 4);
    keep_rgb pins the output_DxD 1x1 RGB conv block at the global tier —
    it writes straight into the image, so its rounding is un-attenuated.
    Install with ops.precision.set_precision_schedule BEFORE the first
    trace; sampling-only (the rewriter's edit/stat paths suspend any
    installed schedule)."""
    def schedule(stage_name: str) -> Optional[str]:
        if keep_rgb and stage_name.startswith("output_"):
            return None
        r = stage_resolution(stage_name)
        if r is not None and r >= min_res:
            return tier
        return None
    return schedule


def recommended_precision_schedule(model):
    """The measured ProgGAN mixed-precision optimum (v5e sweep,
    docs/PERF_NOTES.md round 4): min_res=16 holds a ~61 dB PSNR plateau
    at every scale (PixelNorm re-normalizes after each conv, so trunk
    rounding cannot compound), 1.87x the all-fp32 "high" rate at 256.
    Scale-independent for this family — the plateau is set by the
    keep_rgb fp32 output conv, not the trunk tier."""
    del model  # the measured optimum is scale-independent for ProgGAN
    return mixed_precision_schedule(16)
