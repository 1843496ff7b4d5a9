"""SlimNet CelebA attribute classifier — the real-classifier hook for
num_smiles (reference metrics/num_smiles.py:11-28 loads the external,
non-vendored ``pytorch_slim_cnn.slimnet.SlimNet`` checkpoint
``celeba_20.pth`` and counts images whose 'Smiling' sigmoid > 0.5).

The upstream project is not vendored by the reference either, so this is
a reconstruction of the Slim-CNN architecture (Sharma & Foroosh,
"Slim-CNN: A Light-Weight CNN for Face Attribute Prediction") in JAX:

    conv7x7(3->96, stride 2) + BN + ReLU
    [maxpool3x3/2 -> SlimModule] x 4   (squeeze 16/32/48/64)
    maxpool -> global avg pool -> fc(512 -> 40)

    SlimModule(in, s):
        SSEBlock: squeeze conv1x1(in->s), then two parallel expands —
                  conv1x1(s->4s) and depthwise-separable 3x3 (s->4s) —
                  concatenated to 8s channels (all conv+BN+ReLU)
        followed by a depthwise-separable 3x3 (8s->8s) with a skip
        (projected input) added.

Because the real checkpoint cannot be downloaded in this image, the
converter is strictly *validating*: ``params_from_state_dict`` consumes a
torch state dict by key pattern, checks every tensor is used and every
expected tensor is present, and raises with a full shape table on any
mismatch — so if the real ``celeba_20.pth`` layout differs, the error
says exactly how.  The weight-gated test (tests/test_real_weights.py)
validates against the real file when $REWRITING_TPU_WEIGHTS provides it;
the in-image tests exercise the converter + forward on randomly
initialized state dicts in the documented layout.

Inference only: BN is folded to an affine (scale, bias).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.precision import get_precision

# CelebA attribute order (embedded verbatim in the reference,
# metrics/num_smiles.py:23-32); 'Smiling' is index 31.
CELEBA_ATTRS = [
    "5_o_Clock_Shadow", "Arched_Eyebrows", "Attractive", "Bags_Under_Eyes",
    "Bald", "Bangs", "Big_Lips", "Big_Nose", "Black_Hair", "Blond_Hair",
    "Blurry", "Brown_Hair", "Bushy_Eyebrows", "Chubby", "Double_Chin",
    "Eyeglasses", "Goatee", "Gray_Hair", "Heavy_Makeup", "High_Cheekbones",
    "Male", "Mouth_Slightly_Open", "Mustache", "Narrow_Eyes", "No_Beard",
    "Oval_Face", "Pale_Skin", "Pointy_Nose", "Receding_Hairline",
    "Rosy_Cheeks", "Sideburns", "Smiling", "Straight_Hair", "Wavy_Hair",
    "Wearing_Earrings", "Wearing_Hat", "Wearing_Lipstick",
    "Wearing_Necklace", "Wearing_Necktie", "Young",
]
SMILING = CELEBA_ATTRS.index("Smiling")

# squeeze widths of the four slim modules; module output = 8 * squeeze
SQUEEZES = (16, 32, 48, 64)
STEM_OUT = 96


def _fold_bn(sd, prefix, eps=1e-5):
    """BN(prefix.{weight,bias,running_mean,running_var}) -> (scale, bias)."""
    g = np.asarray(sd.pop(f"{prefix}.weight"), np.float32)
    b = np.asarray(sd.pop(f"{prefix}.bias"), np.float32)
    m = np.asarray(sd.pop(f"{prefix}.running_mean"), np.float32)
    v = np.asarray(sd.pop(f"{prefix}.running_var"), np.float32)
    sd.pop(f"{prefix}.num_batches_tracked", None)
    scale = g / np.sqrt(v + eps)
    return scale, b - m * scale


def _conv_bn(sd, conv_key, bn_key, depthwise=False):
    """(HWIO weight, scale, bias) from torch OIHW conv + BN keys."""
    w = np.asarray(sd.pop(f"{conv_key}.weight"), np.float32)
    cb = sd.pop(f"{conv_key}.bias", None)
    scale, bias = _fold_bn(sd, bn_key)
    if cb is not None:
        bias = bias + scale * np.asarray(cb, np.float32)
    if depthwise:
        # torch depthwise is (O,1,kh,kw); as HWIO with I=1 it drives
        # feature_group_count=O below
        assert w.shape[1] == 1, (conv_key, w.shape)
    wj = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    return {"w": jnp.asarray(wj), "scale": jnp.asarray(scale),
            "bias": jnp.asarray(bias)}


def _apply_conv_bn(p, x, stride=1, padding="SAME"):
    w = p["w"]
    # depthwise iff HWIO in-channels == 1 (no real conv here has a
    # 1-channel input otherwise); shape-derived so it stays static when
    # params are traced jit arguments
    groups = w.shape[3] if w.shape[2] == 1 else 1
    out = lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, precision=get_precision())
    return jax.nn.relu(out * p["scale"] + p["bias"])


def _maxpool(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                             (1, 2, 2, 1), "VALID")


# Expected key layout of the pytorch_slim_cnn checkpoint.  Each entry:
# ours -> (conv key, bn key, depthwise).  {i} = slim module index 1..4.
_STEM = [("stem", "conv_1.conv", "conv_1.bn", False)]
_MODULE = [
    ("squeeze", "slim_module_{i}.sse.squeeze.conv",
     "slim_module_{i}.sse.squeeze.bn", False),
    ("exp1", "slim_module_{i}.sse.expand1.conv",
     "slim_module_{i}.sse.expand1.bn", False),
    ("exp3_dw", "slim_module_{i}.sse.expand3.depthwise",
     "slim_module_{i}.sse.expand3.bn1", True),
    ("exp3_pw", "slim_module_{i}.sse.expand3.pointwise",
     "slim_module_{i}.sse.expand3.bn2", False),
    ("dws_dw", "slim_module_{i}.dws.depthwise",
     "slim_module_{i}.dws.bn1", True),
    ("dws_pw", "slim_module_{i}.dws.pointwise",
     "slim_module_{i}.dws.bn2", False),
    ("skip", "slim_module_{i}.skip.conv", "slim_module_{i}.skip.bn",
     False),
]


def params_from_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """Validating converter: consumes every tensor or raises with a shape
    table of what is present vs expected."""
    sd = dict(sd)
    try:
        params = {}
        for ours, ck, bk, dw in _STEM:
            params[ours] = _conv_bn(sd, ck, bk, dw)
        for i in range(1, 5):
            mod = {}
            for ours, ck, bk, dw in _MODULE:
                mod[ours] = _conv_bn(sd, ck.format(i=i), bk.format(i=i),
                                     dw)
            params[f"module{i}"] = mod
        params["fc"] = {
            "w": jnp.asarray(np.asarray(sd.pop("fc.weight"),
                                        np.float32).T),
            "b": jnp.asarray(np.asarray(sd.pop("fc.bias"), np.float32))}
    except KeyError as e:
        table = "\n".join(f"  {k}: {tuple(np.shape(v))}"
                          for k, v in sorted(sd.items()))
        raise KeyError(
            f"SlimNet checkpoint layout mismatch at {e}; remaining "
            f"checkpoint tensors:\n{table}\nIf the real celeba_20.pth "
            "uses different key names, update _STEM/_MODULE in "
            "rewriting_tpu/metrics/slimnet.py accordingly.") from e
    leftover = [k for k in sd if not k.endswith("num_batches_tracked")]
    if leftover:
        raise ValueError(f"unconsumed SlimNet tensors: {leftover}")
    return params


def init_random_state_dict(seed: int = 0) -> Dict[str, np.ndarray]:
    """Random torch-layout state dict in the documented format (for tests
    and for regenerating a template of the expected layout)."""
    rng = np.random.RandomState(seed)
    sd = {}

    def conv(key, o, i, k, dw=False):
        sd[f"{key}.weight"] = rng.randn(o, 1 if dw else i, k, k).astype(
            np.float32) * 0.1

    def bn(key, c):
        sd[f"{key}.weight"] = np.abs(rng.randn(c)).astype(np.float32) + .5
        sd[f"{key}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{key}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{key}.running_var"] = np.abs(
            rng.randn(c)).astype(np.float32) + 0.5

    conv("conv_1.conv", STEM_OUT, 3, 7)
    bn("conv_1.bn", STEM_OUT)
    in_c = STEM_OUT
    for i, s in enumerate(SQUEEZES, start=1):
        p = f"slim_module_{i}"
        conv(f"{p}.sse.squeeze.conv", s, in_c, 1)
        bn(f"{p}.sse.squeeze.bn", s)
        conv(f"{p}.sse.expand1.conv", 4 * s, s, 1)
        bn(f"{p}.sse.expand1.bn", 4 * s)
        conv(f"{p}.sse.expand3.depthwise", s, s, 3, dw=True)
        bn(f"{p}.sse.expand3.bn1", s)
        conv(f"{p}.sse.expand3.pointwise", 4 * s, s, 1)
        bn(f"{p}.sse.expand3.bn2", 4 * s)
        conv(f"{p}.dws.depthwise", 8 * s, 8 * s, 3, dw=True)
        bn(f"{p}.dws.bn1", 8 * s)
        conv(f"{p}.dws.pointwise", 8 * s, 8 * s, 1)
        bn(f"{p}.dws.bn2", 8 * s)
        conv(f"{p}.skip.conv", 8 * s, in_c, 1)
        bn(f"{p}.skip.bn", 8 * s)
        in_c = 8 * s
    sd["fc.weight"] = rng.randn(len(CELEBA_ATTRS), in_c).astype(
        np.float32) * 0.1
    sd["fc.bias"] = rng.randn(len(CELEBA_ATTRS)).astype(np.float32) * 0.1
    return sd


# one module-level jit shared by all classifier instances: params are a
# traced argument (never baked in as constants), so a second instance —
# another checkpoint, or one classifier per attribute — reuses the same
# compiled executable instead of re-tracing
_forward_jit = None


def _get_forward_jit():
    global _forward_jit
    if _forward_jit is None:
        _forward_jit = jax.jit(_forward)
    return _forward_jit


def _forward(params, x):
    """x: (B, H, W, 3) normalized to [-1, 1] -> (B, 40) logits."""
    x = _apply_conv_bn(params["stem"], x, stride=2)
    for i in range(1, 5):
        x = _maxpool(x)
        m = params[f"module{i}"]
        s = _apply_conv_bn(m["squeeze"], x)
        e1 = _apply_conv_bn(m["exp1"], s)
        e3 = _apply_conv_bn(m["exp3_pw"], _apply_conv_bn(m["exp3_dw"], s))
        sse = jnp.concatenate([e1, e3], axis=-1)
        dws = _apply_conv_bn(m["dws_pw"], _apply_conv_bn(m["dws_dw"], sse))
        x = dws + _apply_conv_bn(m["skip"], x)
    # upstream pools after EVERY module (conv_1 and slim_module_1..4 each
    # feed max_pool); the loop above covers conv_1..module_3, this is
    # module_4's pool before the global average
    x = _maxpool(x)
    x = jnp.mean(x, axis=(1, 2))  # global average pool
    return x @ params["fc"]["w"] + params["fc"]["b"]


class SlimNetClassifier:
    """fn(images_zc_nhwc) -> (B,) bool for one CelebA attribute, matching
    the reference's use (resize to (178, 218), sigmoid > 0.5 on
    'Smiling'; metrics/num_smiles.py:34-48)."""

    def __init__(self, state_dict=None, checkpoint: str = None,
                 attr: int = SMILING):
        if state_dict is None:
            import torch  # CPU torch, used only as the .pth unpickler
            ckpt = torch.load(checkpoint, map_location="cpu",
                              weights_only=False)
            # the upstream celeba_20.pth is a TRAINING checkpoint wrapper
            # (SlimNet.load_pretrained reads model_state_dict from it);
            # accept that, a plain {'state_dict': ...} wrapper, or a flat
            # tensor dict.  Non-tensor entries (epoch, optimizer state)
            # are dropped; the validating converter below still errors on
            # any missing/extra WEIGHT key.
            for key in ("model_state_dict", "state_dict"):
                if isinstance(ckpt, dict) and isinstance(
                        ckpt.get(key), dict):
                    ckpt = ckpt[key]
                    break
            state_dict = {k: v.numpy() for k, v in ckpt.items()
                          if hasattr(v, "numpy")}
        self.params = params_from_state_dict(state_dict)
        self.attr = attr

    def logits(self, images):
        """images (B, H, W, 3) in [-1, 1] -> (B, 40) attribute logits."""
        images = jnp.asarray(images, jnp.float32)
        if images.shape[1:3] != (178, 218):
            # reference transform: Resize((178, 218)) = (h, w), bilinear
            images = jax.image.resize(
                images, (images.shape[0], 178, 218, 3), "bilinear")
        return _get_forward_jit()(self.params, images)

    def __call__(self, images):
        probs = jax.nn.sigmoid(self.logits(images))
        return np.asarray(probs[:, self.attr] > 0.5)


def slimnet_classifier(checkpoint: str, attr: int = SMILING):
    return SlimNetClassifier(checkpoint=checkpoint, attr=attr)
