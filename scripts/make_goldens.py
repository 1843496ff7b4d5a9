"""Generate golden parity fixtures from the reference torch implementation.

Runs the reference models (mounted read-only at /root/reference) on CPU with
tiny configurations and saves inputs / weights / outputs / intermediate
activations as npz files under tests/goldens/.  The reference's CUDA ops are
replaced with their own documented pure-torch fallbacks (the spec at
utils/stylegan2/op/upfirdn2d.py:152-186 and the 2-line fused_act formula) so
everything runs on CPU torch.

This script is run once to (re)create fixtures; tests only read the npz.
"""

import math
import pathlib
import sys
import types
import importlib.util

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

REF = pathlib.Path("/root/reference")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"
OUT.mkdir(parents=True, exist_ok=True)

# torchvision is not installed in this image; the reference segmenter files
# import it at module level without using it on our code paths
if "torchvision" not in sys.modules:
    sys.modules["torchvision"] = types.ModuleType("torchvision")


# ---------------------------------------------------------------------------
# CPU implementations of the reference CUDA ops (from their documented specs)
# ---------------------------------------------------------------------------

def upfirdn2d_native(input, kernel, up_x, up_y, down_x, down_y,
                     pad_x0, pad_x1, pad_y0, pad_y1):
    # Spec: utils/stylegan2/op/upfirdn2d.py:152-186
    _, in_h, in_w, minor = input.shape
    kernel_h, kernel_w = kernel.shape
    out = input.view(-1, in_h, 1, in_w, 1, minor)
    out = F.pad(out, [0, 0, 0, up_x - 1, 0, 0, 0, up_y - 1])
    out = out.view(-1, in_h * up_y, in_w * up_x, minor)
    out = F.pad(out, [0, 0, max(pad_x0, 0), max(pad_x1, 0),
                      max(pad_y0, 0), max(pad_y1, 0)])
    out = out[:, max(-pad_y0, 0): out.shape[1] - max(-pad_y1, 0),
              max(-pad_x0, 0): out.shape[2] - max(-pad_x1, 0), :]
    out = out.permute(0, 3, 1, 2)
    out = out.reshape(
        [-1, 1, in_h * up_y + pad_y0 + pad_y1, in_w * up_x + pad_x0 + pad_x1])
    w = torch.flip(kernel, [0, 1]).view(1, 1, kernel_h, kernel_w)
    out = F.conv2d(out, w)
    out = out.reshape(-1, minor,
                      in_h * up_y + pad_y0 + pad_y1 - kernel_h + 1,
                      in_w * up_x + pad_x0 + pad_x1 - kernel_w + 1)
    out = out.permute(0, 2, 3, 1)
    return out[:, ::down_y, ::down_x, :]


def upfirdn2d(input, kernel, up=1, down=1, pad=(0, 0)):
    b, c, h, w = input.shape
    out = upfirdn2d_native(input.reshape(-1, h, w, 1), kernel,
                           up, up, down, down, pad[0], pad[1], pad[0], pad[1])
    return out.view(b, c, out.shape[1], out.shape[2])


def fused_leaky_relu(input, bias, negative_slope=0.2, scale=2 ** 0.5):
    shape = [1, -1] + [1] * (input.ndim - 2)
    return scale * F.leaky_relu(input + bias.view(*shape), negative_slope)


class FusedLeakyReLU(nn.Module):
    def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
        super().__init__()
        self.bias = nn.Parameter(torch.zeros(channel))
        self.negative_slope = negative_slope
        self.scale = scale

    def forward(self, input):
        return fused_leaky_relu(input, self.bias, self.negative_slope,
                                self.scale)


def _load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def sd_to_np(sd):
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


# ---------------------------------------------------------------------------
# ProgGAN golden
# ---------------------------------------------------------------------------

def make_proggan_golden():
    proggan = _load_module("refpg", REF / "utils" / "proggan.py")
    torch.manual_seed(0)
    sizes = [16, 16, 8, 4]
    model = proggan.ProgressiveGenerator(sizes=sizes)
    model.eval()
    rng = np.random.RandomState(1)
    z = rng.standard_normal(3 * 16).reshape(3, 16).astype(np.float32)

    captured = {}
    model.layer3.conv.register_forward_hook(
        lambda m, i, o: captured.__setitem__("layer3_conv_out", o.detach()))
    model.layer3.norm.register_forward_hook(
        lambda m, i, o: captured.__setitem__("layer3_norm_out", o.detach()))
    with torch.no_grad():
        out = model(torch.from_numpy(z))
    data = {f"sd.{k}": v for k, v in sd_to_np(model.state_dict()).items()}
    data.update(z=z, out=out.numpy(),
                layer3_conv_out=captured["layer3_conv_out"].numpy(),
                layer3_norm_out=captured["layer3_norm_out"].numpy())
    np.savez(OUT / "proggan_tiny.npz", **data)
    print("proggan_tiny:", out.shape)


# ---------------------------------------------------------------------------
# StyleGAN2 golden
# ---------------------------------------------------------------------------

def make_stylegan_golden():
    op_stub = types.ModuleType("refsg2.op")
    op_stub.upfirdn2d = upfirdn2d
    op_stub.fused_leaky_relu = fused_leaky_relu
    op_stub.FusedLeakyReLU = FusedLeakyReLU
    pkg = types.ModuleType("refsg2")
    pkg.__path__ = [str(REF / "utils" / "stylegan2")]
    pkg.op = op_stub
    sys.modules["refsg2"] = pkg
    sys.modules["refsg2.op"] = op_stub
    spec = importlib.util.spec_from_file_location(
        "refsg2.models", REF / "utils" / "stylegan2" / "models.py")
    models = importlib.util.module_from_spec(spec)
    sys.modules["refsg2.models"] = models
    spec.loader.exec_module(models)

    # CPU-safe noise fallback (reference hardcodes .cuda(), models.py:545)
    def noise_forward(self, data):
        image = data.fmap
        batch, _, height, width = image.shape
        noise = np.random.RandomState(0).randn(
            batch, height * width).astype("float32")
        noise = torch.from_numpy(noise).view(batch, 1, height, width)
        return models.DataBag(data, fmap=image + self.weight * noise)
    models.NoiseInjectionF.forward = noise_forward

    torch.manual_seed(0)
    model = models.SeqStyleGAN2(size=16, style_dim=64, n_mlp=2,
                                truncation=1.0, mconv="seq")
    model.eval()
    rng = np.random.RandomState(1)
    z = rng.standard_normal(2 * 64).reshape(2, 64).astype(np.float32)

    captured = {}
    model.layer3.sconv.activate.register_forward_hook(
        lambda m, i, o: captured.__setitem__("layer3_act", o.fmap.detach()))
    model.layer3.sconv.mconv.dconv.register_forward_hook(
        lambda m, i, o: captured.__setitem__("layer3_dconv", o.fmap.detach()))
    model.layer3.sconv.mconv.adain.register_forward_hook(
        lambda m, i, o: captured.__setitem__("layer3_adain", o.fmap.detach()))
    with torch.no_grad():
        out = model(torch.from_numpy(z))
    data = {f"sd.{k}": v for k, v in sd_to_np(model.state_dict()).items()}
    data.update(z=z, out=out.numpy(),
                layer3_act=captured["layer3_act"].numpy(),
                layer3_dconv=captured["layer3_dconv"].numpy(),
                layer3_adain=captured["layer3_adain"].numpy())
    np.savez(OUT / "stylegan2_tiny.npz", **data)
    print("stylegan2_tiny:", out.shape)

    # truncation variant with a real latent_avg
    torch.manual_seed(0)
    model_t = models.SeqStyleGAN2(size=16, style_dim=64, n_mlp=2,
                                  truncation=0.5, mconv="seq")
    avg = torch.from_numpy(
        np.random.RandomState(7).randn(64).astype(np.float32))
    model_t.load_state_dict(model.state_dict(), latent_avg=avg)
    # the early-return path of load_state_dict ignores latent_avg when the
    # dict matches exactly; set the buffer explicitly
    model_t.latents.latent_avg = avg
    model_t.eval()
    with torch.no_grad():
        out_t = model_t(torch.from_numpy(z))
    np.savez(OUT / "stylegan2_tiny_trunc.npz", z=z, out=out_t.numpy(),
             latent_avg=avg.numpy())
    print("stylegan2_tiny_trunc:", out_t.shape)


# ---------------------------------------------------------------------------
# upfirdn2d op goldens (various up/down/pad combos vs the native spec)
# ---------------------------------------------------------------------------

def make_upfirdn_golden():
    rng = np.random.RandomState(0)
    cases = {}
    configs = [
        ("up2_k4", 2, 1, (2, 1)),
        ("down2_k4", 1, 2, (2, 2)),
        ("blur_k4", 1, 1, (2, 1)),
        ("updown_k3", 2, 2, (1, 1)),
        ("negpad", 1, 1, (-1, 2)),
    ]
    x = rng.randn(2, 3, 8, 8).astype(np.float32)
    k4 = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32)
    k4 /= k4.sum()
    k3 = np.outer([1, 2, 1], [1, 2, 1]).astype(np.float32)
    k3 /= k3.sum()
    cases["x"] = x
    cases["k4"] = k4
    cases["k3"] = k3
    for name, up, down, pad in configs:
        k = k3 if "k3" in name else k4
        out = upfirdn2d(torch.from_numpy(x), torch.from_numpy(k),
                        up=up, down=down, pad=pad)
        cases[f"out_{name}"] = out.numpy()
        cases[f"cfg_{name}"] = np.array([up, down, pad[0], pad[1]])
    np.savez(OUT / "upfirdn2d.npz", **cases)
    print("upfirdn2d cases saved")


# ---------------------------------------------------------------------------
# BiSeNet face parser golden (random seeded weights)
# ---------------------------------------------------------------------------

def make_bisenet_golden():
    sys.path.insert(0, str(REF / "metrics" / "face-parsing.PyTorch"))
    import importlib
    resnet_mod = _load_module("fp_resnet",
                              REF / "metrics/face-parsing.PyTorch/resnet.py")
    # model.py does "from resnet import Resnet18"
    sys.modules["resnet"] = resnet_mod
    # avoid downloading imagenet weights in Resnet18.init_weight
    resnet_mod.modelzoo.load_url = lambda url: (_ for _ in ()).throw(
        RuntimeError("no net"))
    resnet_mod.Resnet18.init_weight = lambda self: None
    model_mod = _load_module("fp_model",
                             REF / "metrics/face-parsing.PyTorch/model.py")
    torch.manual_seed(0)
    net = model_mod.BiSeNet(n_classes=19)
    net.eval()
    rng = np.random.RandomState(5)
    x = rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        out = net(torch.from_numpy(x))[0]
    data = {f"sd.{k}": v for k, v in sd_to_np(net.state_dict()).items()}
    data.update(x=x, out=out.numpy())
    np.savez(OUT / "bisenet_tiny.npz", **data)
    print("bisenet:", out.shape)


# ---------------------------------------------------------------------------
# UPerNet unified parsing golden (random seeded weights, toy labeldata)
# ---------------------------------------------------------------------------

LABELDATA = {
    "object": ["-", "sky", "building", "tree"],
    "part": ["-", "roof", "window", "tree"],
    "material": ["-", "brick", "glass"],
    "scene": ["-", "outdoor"],
    "object_part": {"building": ["roof", "window", "tree"]},
}


class _NumericalPrRoIPool2D(nn.Module):
    """Independent dense-integration stand-in for the CUDA PrRoI pool
    (only full-image rois, as UPerNet uses)."""

    def __init__(self, ph, pw, scale):
        super().__init__()
        self.ph, self.pw, self.scale = ph, pw, scale

    def forward(self, feat, rois):
        n, c, h, w = feat.shape
        f = feat.detach().numpy()
        out = np.zeros((len(rois), c, self.ph, self.pw), np.float32)
        steps = 64
        for r, roi in enumerate(rois.numpy()):
            bi = int(roi[0])
            x0, y0, x1, y1 = roi[1:] * self.scale
            for py in range(self.ph):
                ys = np.linspace(y0 + (y1 - y0) * py / self.ph,
                                 y0 + (y1 - y0) * (py + 1) / self.ph, steps)
                wy = np.maximum(0, 1 - np.abs(
                    ys[:, None] - np.arange(h)[None]))  # (steps, h)
                for px in range(self.pw):
                    xs = np.linspace(x0 + (x1 - x0) * px / self.pw,
                                     x0 + (x1 - x0) * (px + 1) / self.pw,
                                     steps)
                    wx = np.maximum(0, 1 - np.abs(
                        xs[:, None] - np.arange(w)[None]))  # (steps, w)
                    out[r, :, py, px] = np.einsum(
                        "sh,chw,tw->c", wy, f[bi], wx) / (steps * steps)
        return torch.from_numpy(out)


def make_upernet_golden():
    import types as _t
    prroi_stub = _t.ModuleType("refup.prroi_pool")
    prroi_stub.PrRoIPool2D = _NumericalPrRoIPool2D
    pkg = _t.ModuleType("refup")
    pkg.__path__ = [str(REF / "utils" / "upsegmodel")]
    sys.modules["refup"] = pkg
    sys.modules["refup.prroi_pool"] = prroi_stub
    for sub in ["resnet", "resnext"]:
        spec = importlib.util.spec_from_file_location(
            f"refup.{sub}", REF / "utils" / "upsegmodel" / f"{sub}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refup.{sub}"] = mod
        spec.loader.exec_module(mod)
    spec = importlib.util.spec_from_file_location(
        "refup.models", REF / "utils" / "upsegmodel" / "models.py")
    models = importlib.util.module_from_spec(spec)
    sys.modules["refup.models"] = models
    spec.loader.exec_module(models)

    torch.manual_seed(0)
    nr_classes = {k: len(LABELDATA[k])
                  for k in ["object", "scene", "material"]}
    nr_classes["part"] = sum(len(p)
                             for p in LABELDATA["object_part"].values())
    orig = sys.modules["refup.resnet"].resnet50(pretrained=False)
    encoder = models.Resnet(orig)
    decoder = models.UPerNet(nr_classes=nr_classes, fc_dim=2048,
                             use_softmax=True, fpn_dim=512)
    decoder.apply(models.ModelBuilder.weights_init)
    segmodule = models.SegmentationModule(encoder, decoder, LABELDATA)
    segmodule.eval()
    rng = np.random.RandomState(6)
    img = rng.uniform(-120, 130, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        feats = encoder(torch.from_numpy(img), return_feature_maps=True)
        pred = segmodule(dict(img=torch.from_numpy(img)),
                         seg_size=(64, 64))
    enc_sd = {f"enc.{k}": v
              for k, v in sd_to_np(encoder.state_dict()).items()}
    dec_sd = {f"dec.{k}": v
              for k, v in sd_to_np(decoder.state_dict()).items()}
    data = {**enc_sd, **dec_sd, "img": img,
            "object": pred["object"].numpy(),
            "material": pred["material"].numpy(),
            "scene": pred["scene"].numpy()}
    for i, f in enumerate(feats):
        data[f"feat_{i}"] = f.numpy()
    for i, p in enumerate(pred["part"]):
        data[f"part_{i}"] = p.numpy()
    np.savez(OUT / "upernet_tiny.npz", **data)
    print("upernet:", pred["object"].shape)


# ---------------------------------------------------------------------------
# VGG16 feature-tap golden (raw torch, torchvision layout, random weights)
# ---------------------------------------------------------------------------

def make_vgg_golden():
    plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512, "M"]
    torch.manual_seed(0)
    layers = []
    in_c = 3
    for item in plan:
        if item == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_c, item, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_c = item
    features = nn.Sequential(*layers)
    features.eval()
    rng = np.random.RandomState(9)
    x = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    taps = {}
    out = torch.from_numpy(x)
    tap_idx = {3: "relu1_2", 8: "relu2_2", 15: "relu3_3", 22: "relu4_3",
               29: "relu5_3"}
    with torch.no_grad():
        for i, layer in enumerate(features):
            out = layer(out)
            if i in tap_idx:
                taps[tap_idx[i]] = out.numpy()
    data = {f"sd.features.{i}.{p}": v.detach().numpy()
            for i, layer in enumerate(features)
            if isinstance(layer, nn.Conv2d)
            for p, v in [("weight", layer.weight), ("bias", layer.bias)]}
    data.update(x=x, **{f"tap.{k}": v for k, v in taps.items()})
    np.savez(OUT / "vgg16_taps.npz", **data)
    print("vgg16 taps:", list(taps))


# ---------------------------------------------------------------------------
# Dilated resnet goldens (the semantic-segmenter encoders)
# ---------------------------------------------------------------------------

def make_dilated_resnet_golden():
    import types as _t
    pkg = _t.ModuleType("refsg")
    pkg.__path__ = [str(REF / "utils" / "segmodel")]
    sys.modules["refsg"] = pkg
    for sub in ["resnet", "resnext", "mobilenet"]:
        path = REF / "utils" / "segmodel" / f"{sub}.py"
        if not path.exists():
            continue
        spec = importlib.util.spec_from_file_location(f"refsg.{sub}", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refsg.{sub}"] = mod
        spec.loader.exec_module(mod)
    spec = importlib.util.spec_from_file_location(
        "refsg.models", REF / "utils" / "segmodel" / "models.py")
    models = importlib.util.module_from_spec(spec)
    sys.modules["refsg.models"] = models
    spec.loader.exec_module(models)

    rng = np.random.RandomState(11)
    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    data = {"x": x}
    for name, builder in [("r18", sys.modules["refsg.resnet"].resnet18),
                          ("r50", sys.modules["refsg.resnet"].resnet50)]:
        torch.manual_seed(0)
        orig = builder(pretrained=False)
        net = models.ResnetDilated(orig, dilate_scale=8)
        net.eval()
        with torch.no_grad():
            feats = net(torch.from_numpy(x), return_feature_maps=True)
        for k, v in sd_to_np(net.state_dict()).items():
            data[f"{name}.sd.{k}"] = v
        for i, f in enumerate(feats):
            data[f"{name}.feat_{i}"] = f.numpy()
    np.savez(OUT / "dilated_resnet.npz", **data)
    print("dilated resnet goldens:", [k for k in data if "feat_3" in k])




# ---------------------------------------------------------------------------
# segmodel zoo goldens: MobileNetV2Dilated + ResNeXt101 encoders and the
# deep-supervision decoders (reference segmodel/models.py:272-498)
# ---------------------------------------------------------------------------

def _load_refsg():
    pkg = types.ModuleType("refsg")
    pkg.__path__ = [str(REF / "utils" / "segmodel")]
    sys.modules["refsg"] = pkg
    for sub in ["resnet", "resnext", "mobilenet"]:
        spec = importlib.util.spec_from_file_location(
            f"refsg.{sub}", REF / "utils" / "segmodel" / f"{sub}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refsg.{sub}"] = mod
        spec.loader.exec_module(mod)
    spec = importlib.util.spec_from_file_location(
        "refsg.models", REF / "utils" / "segmodel" / "models.py")
    models = importlib.util.module_from_spec(spec)
    sys.modules["refsg.models"] = models
    spec.loader.exec_module(models)
    return models


def make_segzoo_golden():
    models = _load_refsg()
    rng = np.random.RandomState(12)
    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    data = {"x": x}

    # MobileNetV2Dilated encoder
    torch.manual_seed(1)
    orig = sys.modules["refsg.mobilenet"].mobilenetv2(pretrained=False)
    mbv2 = models.MobileNetV2Dilated(orig, dilate_scale=8)
    mbv2.eval()
    with torch.no_grad():
        feats = mbv2(torch.from_numpy(x), return_feature_maps=True)
    for k, v in sd_to_np(mbv2.state_dict()).items():
        data[f"mbv2.sd.{k}"] = v
    for i, f in enumerate(feats):
        data[f"mbv2.feat_{i}"] = f.numpy()

    # ResNeXt101 (undilated Resnet wrapper, models.py:1043-1045).  The full
    # 23-block layer3 is slow on CPU but fine at 64x64 once.
    torch.manual_seed(2)
    orig = sys.modules["refsg.resnext"].resnext101(pretrained=False)
    rnx = models.Resnet(orig)
    rnx.eval()
    with torch.no_grad():
        feats = rnx(torch.from_numpy(x), return_feature_maps=True)
    for k, v in sd_to_np(rnx.state_dict()).items():
        data[f"rnx.sd.{k}"] = v
    for i, f in enumerate(feats):
        data[f"rnx.feat_{i}"] = f.numpy()

    # PPMDeepsup + C1DeepSup decoders at inference (use_softmax=True)
    torch.manual_seed(3)
    ppmds = models.PPMDeepsup(num_class=7, fc_dim=64, use_softmax=True)
    ppmds.eval()
    conv5 = rng.randn(1, 64, 8, 8).astype(np.float32)
    conv4 = rng.randn(1, 32, 8, 8).astype(np.float32)
    with torch.no_grad():
        out = ppmds([torch.from_numpy(conv4), torch.from_numpy(conv5)],
                    segSize=(32, 32))
    for k, v in sd_to_np(ppmds.state_dict()).items():
        data[f"ppmds.sd.{k}"] = v
    data["ppmds.conv5"] = conv5
    data["ppmds.conv4"] = conv4
    data["ppmds.out"] = out.numpy()

    torch.manual_seed(4)
    c1ds = models.C1DeepSup(num_class=7, fc_dim=64, use_softmax=True)
    c1ds.eval()
    with torch.no_grad():
        out = c1ds([torch.from_numpy(conv4), torch.from_numpy(conv5)],
                   segSize=(32, 32))
    for k, v in sd_to_np(c1ds.state_dict()).items():
        data[f"c1ds.sd.{k}"] = v
    data["c1ds.out"] = out.numpy()

    np.savez(OUT / "segzoo.npz", **data)
    print("segzoo goldens:",
          [k for k in data if k.endswith("feat_4") or k.endswith(".out")])

# ---------------------------------------------------------------------------
# real-weights forward fixtures: run the reference torch code on the real
# published checkpoints (when present under $REWRITING_TPU_WEIGHTS) and
# save the outputs, so tests/test_real_weights.py can assert output
# fidelity WITHOUT importing the reference mount at test time.
# ---------------------------------------------------------------------------

def _standard_z(n, depth, seed=0):
    # mirror of rewriting_tpu.utils.zdataset.standard_z_sample (the
    # numpy-RandomState prefix-stable contract, reference zdataset.py:37-51)
    rng = np.random.RandomState(seed)
    return rng.standard_normal(n * depth).reshape(n, depth).astype(
        np.float32)


def make_real_weight_goldens():
    import os
    wd = os.environ.get("REWRITING_TPU_WEIGHTS", "")
    if not wd or not os.path.isdir(wd):
        print("real-weight goldens skipped: $REWRITING_TPU_WEIGHTS unset")
        return
    gdir = pathlib.Path(wd) / "goldens"
    gdir.mkdir(exist_ok=True)

    sg_ckpt = os.path.join(wd, "stylegan2_church.pt")
    if os.path.isfile(sg_ckpt):
        op_stub = types.ModuleType("refsg2w.op")
        op_stub.upfirdn2d = upfirdn2d
        op_stub.fused_leaky_relu = fused_leaky_relu
        op_stub.FusedLeakyReLU = FusedLeakyReLU
        pkg = types.ModuleType("refsg2w")
        pkg.__path__ = [str(REF / "utils" / "stylegan2")]
        pkg.op = op_stub
        sys.modules["refsg2w"] = pkg
        sys.modules["refsg2w.op"] = op_stub
        spec = importlib.util.spec_from_file_location(
            "refsg2w.models", REF / "utils" / "stylegan2" / "models.py")
        models = importlib.util.module_from_spec(spec)
        sys.modules["refsg2w.models"] = models
        spec.loader.exec_module(models)

        def noise_forward(self, data):
            image = data.fmap
            batch, _, height, width = image.shape
            noise = np.random.RandomState(0).randn(
                batch, height * width).astype("float32")
            noise = torch.from_numpy(noise).view(batch, 1, height, width)
            return models.DataBag(data, fmap=image + self.weight * noise)
        models.NoiseInjectionF.forward = noise_forward

        sd = torch.load(sg_ckpt, map_location="cpu", weights_only=False)
        latent_avg = sd.get("latent_avg")
        ref = models.SeqStyleGAN2(size=256, style_dim=512, n_mlp=8,
                                  truncation=0.5, mconv="seq")
        ref.load_state_dict(sd["g_ema"], latent_avg=latent_avg)
        if latent_avg is not None:
            ref.latents.latent_avg = torch.as_tensor(latent_avg)
        ref.eval()
        z = _standard_z(1, 512)
        with torch.no_grad():
            out = ref(torch.from_numpy(z)).numpy()
        np.savez(gdir / "stylegan2_church_forward.npz", z=z, out=out)
        print("stylegan2_church_forward:", out.shape)
    else:
        print("stylegan2_church.pt absent; fixture skipped")

    pg_ckpt = os.path.join(wd, "proggan_churchoutdoor-7e701dd5.pth")
    if os.path.isfile(pg_ckpt):
        spec = importlib.util.spec_from_file_location(
            "ref_proggan_w", REF / "utils" / "proggan.py")
        refpg = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(refpg)
        sd = torch.load(pg_ckpt, map_location="cpu", weights_only=False)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        ref = refpg.from_state_dict(sd)
        ref.eval()
        zdim = sd["layer1.conv.weight"].shape[1]  # (O, z_dim, 4, 4)
        z = _standard_z(1, int(zdim))
        with torch.no_grad():
            out = ref(torch.from_numpy(z).view(1, -1, 1, 1)).numpy()
        np.savez(gdir / "proggan_church_forward.npz", z=z, out=out)
        print("proggan_church_forward:", out.shape)
    else:
        print(f"{pg_ckpt} absent; fixture skipped")


def make_fid_parity_golden(n=64, size=128):
    """Reference FID value for the A/B parity gate (BASELINE.md north
    star, reference metrics/fid.py:137-187): run the pytorch-fid package
    (the de-facto reference FID implementation; the reference repo's
    TF-graphdef variant matches it to ~1e-3) on the deterministic
    parity_images set and record the scalar, so
    tests/test_real_weights.py::test_fid_matches_pytorch_fid_reference
    can assert |ours - reference| <= 0.1 with no torch at test time.

    Needs: $REWRITING_TPU_WEIGHTS (for goldens/ placement and the
    pt_inception checkpoint pytorch_fid auto-downloads or reuses) and
    `pip install pytorch-fid` in THIS offline environment — skipped with
    a message otherwise."""
    import json
    import os
    import tempfile
    wd = os.environ.get("REWRITING_TPU_WEIGHTS", "")
    if not wd or not os.path.isdir(wd):
        print("fid parity golden skipped: $REWRITING_TPU_WEIGHTS unset")
        return
    try:
        from pytorch_fid import fid_score
        from pytorch_fid.inception import InceptionV3
    except ImportError:
        print("fid parity golden skipped: pip install pytorch-fid first")
        return
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from rewriting_tpu.metrics.fid import parity_images

    # point pytorch-fid at the mounted checkpoint instead of the network
    ckpt = os.path.join(wd, "pt_inception-2015-12-05.pth")
    if os.path.isfile(ckpt):
        os.environ.setdefault("TORCH_HOME", wd)

    from PIL import Image
    with tempfile.TemporaryDirectory() as td:
        dirs = []
        for tag, seed in (("a", 1), ("b", 2)):
            d = os.path.join(td, tag)
            os.makedirs(d)
            for i, img in enumerate(parity_images(seed, n, size)):
                Image.fromarray(img).save(os.path.join(d, f"{i:03d}.png"))
            dirs.append(d)
        value = fid_score.calculate_fid_given_paths(
            dirs, batch_size=16, device="cpu",
            dims=2048)
    gdir = pathlib.Path(wd) / "goldens"
    gdir.mkdir(exist_ok=True)
    spec = {"n": n, "size": size, "seed_a": 1, "seed_b": 2,
            "fid": float(value),
            "tool": "pytorch-fid", "dims": 2048}
    (gdir / "fid_parity.json").write_text(json.dumps(spec, indent=1))
    print("fid_parity golden:", spec)


# ---------------------------------------------------------------------------
# NBB golden correspondences: run the reference neural-best-buddies
# algorithm (baselines/neural_best_buddies/algorithms/neural_best_buddies.py)
# over a deterministic shared feature pyramid and record the surviving
# correspondences, so tests/test_nbb.py can pin the rebuilt engine's
# mapping search / buddy refinement / response accumulation / tau
# threshold / k-means selection against the reference behavior.
# ---------------------------------------------------------------------------

_NBB_H = 64
_NBB_CHANNELS = (8, 12, 16, 24, 32)


def _nbb_smooth_image(seed):
    """Multi-octave smooth random texture in [-2, 2] — structured enough
    for patch correlation to localize."""
    r = np.random.RandomState(seed)
    img = np.zeros((_NBB_H, _NBB_H, 3), np.float32)
    for octave, res in enumerate((4, 8, 16, 32)):
        base = r.randn(res, res, 3).astype(np.float32)
        rep = _NBB_H // res
        img += base.repeat(rep, 0).repeat(rep, 1) / (octave + 1)
    return img


def _nbb_pyramid(img):
    """Level L in 1..5: block-mean to H/2^(L-1), then a fixed seeded
    projection + ReLU into the level's channel count."""
    out = []
    for lvl in range(1, 6):
        f = 2 ** (lvl - 1)
        h = _NBB_H // f
        block = img.reshape(h, f, h, f, 3).mean((1, 3))
        pr = np.random.RandomState(1000 + lvl)
        proj = pr.randn(3, _NBB_CHANNELS[lvl - 1]).astype(np.float32)
        out.append(np.maximum(block @ proj, 0.0).astype(np.float32))
    return out


def _nbb_reconstruct(feats, src_level, dst_level, out_channels, seed=0):
    """Shared deterministic deconve stand-in; MUST match
    rewriting_tpu.baselines.nbb.default_reconstruct bit for bit (the
    fixture pins both sides to the same operator)."""
    steps = src_level - dst_level
    out = feats.repeat(2 ** steps, axis=0).repeat(2 ** steps, axis=1)
    r = np.random.RandomState(seed + 100 * src_level + dst_level)
    proj = r.randn(feats.shape[-1], out_channels).astype(feats.dtype)
    proj /= math.sqrt(feats.shape[-1])
    return np.maximum(out @ proj, 0.0)


def make_nbb_golden(tau=0.05, k_per_level=10, k_final=8, border=2):
    # NOTE: k_per_level must stay below the number of DISTINCT pairs at
    # every level — the reference's top_k_in_clusters indexes past the end
    # of the list when k-means returns an empty cluster (its :309-321
    # max_response_index initialization), an upstream quirk we avoid
    # rather than replicate.
    nbb_dir = REF / "baselines" / "neural_best_buddies"
    # draw_correspondence imports torchvision.transforms at module level
    # (never used on this path); stub it like the segmenter imports above
    if "torchvision.transforms" not in sys.modules:
        tv = sys.modules["torchvision"]
        tvt = types.ModuleType("torchvision.transforms")
        tv.transforms = tvt
        sys.modules["torchvision.transforms"] = tvt
    sys.path.insert(0, str(nbb_dir))
    pkg = types.ModuleType("nbbref_algorithms")
    pkg.__path__ = [str(nbb_dir / "algorithms")]
    sys.modules["nbbref_algorithms"] = pkg
    for mod in ("feature_metric", "neural_best_buddies"):
        spec = importlib.util.spec_from_file_location(
            f"nbbref_algorithms.{mod}", nbb_dir / "algorithms" / f"{mod}.py")
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"nbbref_algorithms.{mod}"] = m
        spec.loader.exec_module(m)
    NBB = sys.modules["nbbref_algorithms.neural_best_buddies"]

    img_a = _nbb_smooth_image(7)
    img_b = (np.roll(img_a, (6, -4), axis=(0, 1)) * 0.9
             + 0.1 * _nbb_smooth_image(11))
    pyr_a = _nbb_pyramid(img_a)
    pyr_b = _nbb_pyramid(img_b)

    sc = NBB.sparse_semantic_correspondence(
        model=None, gpu_ids=[], tau=tau, border_size=border,
        save_dir="/tmp/nbb_golden_unused", k_per_level=float(k_per_level),
        k_final=k_final, fast=False)

    def t(level_np):  # NHWC numpy -> NCHW torch
        return torch.from_numpy(
            np.ascontiguousarray(level_np.transpose(2, 0, 1))[None])

    # replicate the reference run() loop (neural_best_buddies.py:361-409)
    # with the precomputed pyramid standing in for model.forward and the
    # shared reconstruct standing in for model.deconve; no drawing/saving
    F_A, F_B = t(pyr_a[4]), t(pyr_b[4])
    F_Am, F_Bm = F_A.clone(), F_B.clone()
    init_ab = sc.identity_map(F_B.size())
    init_ba = init_ab.clone()
    corr = []
    for L in range(5, 0, -1):
        patch_size = sc.patch_size_list[L - 1]
        radius = sc.search_box_radius_list[L - 1]
        corr, a2b, b2a = sc.find_neural_best_buddies(
            corr, F_A, F_Am, F_Bm, F_B, patch_size, init_ab, init_ba,
            radius, sc.tau, sc.k_per_level, deepest_level=(L == 5))
        corr = sc.threshold_response_correspondence(corr, F_A, F_B, sc.tau)
        if sc.k_per_level < float("inf"):
            corr = sc.top_k_in_clusters(corr, int(sc.k_per_level))
        if L > 1:
            warped_b = sc.warp(F_A.size(), F_B, patch_size, a2b)
            warped_a = sc.warp(F_B.size(), F_A, patch_size, b2a)
            F_An, F_Bn = t(pyr_a[L - 2]), t(pyr_b[L - 2])

            def rec(warped, cout):
                w_np = warped[0].numpy().transpose(1, 2, 0)
                return t(_nbb_reconstruct(w_np, L, L - 1, cout))
            F_Am = (F_An + rec(warped_b, pyr_a[L - 2].shape[-1])) * 0.5
            F_Bm = (F_Bn + rec(warped_a, pyr_b[L - 2].shape[-1])) * 0.5
            F_A, F_B = F_An, F_Bn
            init_ab = sc.upsample_mapping(a2b)
            init_ba = sc.upsample_mapping(b2a)
    corr = sc.make_correspondence_unique(corr)
    corr = sc.scale_correspondence(corr, 1)
    corr = sc.remove_border_correspondence(corr, border, _NBB_H)
    top = sc.top_k_in_clusters(corr, k_final)

    def pts(lst):
        return np.asarray([[int(p[0]), int(p[1])] for p in lst], np.int64)

    def rsp(lst):
        return np.asarray([float(v) for v in lst], np.float32)

    np.savez(
        OUT / "nbb_correspondence.npz",
        img_a=img_a, img_b=img_b,
        **{f"pyr_a_{i+1}": p for i, p in enumerate(pyr_a)},
        **{f"pyr_b_{i+1}": p for i, p in enumerate(pyr_b)},
        pts_a=pts(corr[0]), pts_b=pts(corr[1]), resp=rsp(corr[2]),
        top_a=pts(top[0]), top_b=pts(top[1]), top_resp=rsp(top[2]),
        tau=tau, k_per_level=k_per_level, k_final=k_final, border=border)
    print("nbb golden:", len(corr[0]), "correspondences,",
          len(top[0]), "top-k")


if __name__ == "__main__":
    make_dilated_resnet_golden()
    make_segzoo_golden()
    make_vgg_golden()
    make_upfirdn_golden()
    make_proggan_golden()
    make_stylegan_golden()
    make_bisenet_golden()
    make_upernet_golden()
    make_nbb_golden()
    make_real_weight_goldens()
    make_fid_parity_golden()
