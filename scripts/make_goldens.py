"""Generate golden parity fixtures from the reference torch implementation.

Runs the reference models (mounted read-only at /root/reference) on CPU with
tiny configurations and saves inputs / weights / outputs / intermediate
activations as npz files under tests/goldens/.  The reference's CUDA ops are
replaced with their own documented pure-torch fallbacks (the spec at
utils/stylegan2/op/upfirdn2d.py:152-186 and the 2-line fused_act formula) so
everything runs on CPU torch.

This script is run once to (re)create fixtures; tests only read the npz.
"""

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


def _load_module(name, path, package_path=None):
    if package_path is not None:
        pkg = types.ModuleType(name.rsplit(".", 1)[0])
        pkg.__path__ = [str(package_path)]
        sys.modules[pkg.__name__] = pkg
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


if __name__ == "__main__":
    make_upfirdn_golden()
    make_proggan_golden()
    make_stylegan_golden()
