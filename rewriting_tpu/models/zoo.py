"""Pretrained model zoo: the published checkpoints of the reference.

The reference auto-downloads 8 StyleGAN2 checkpoints (rewriting.csail.mit.edu,
utils/stylegan2/__init__.py:17-47) and 8 ProgGAN checkpoints
(gandissect.csail.mit.edu, utils/proggan.py:8-30).  This environment has no
network egress, so loaders resolve checkpoints from a local weights
directory (REWRITING_TPU_WEIGHTS env var or ~/.cache/rewriting_tpu),
attempting a download only if the file is absent *and* the network allows.
Torch (CPU) is used purely as a .pth/.pt unpickler; everything becomes
numpy immediately."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from . import proggan as proggan_mod
from . import stylegan2 as stylegan2_mod

# name -> (filename, size) — the reference's table
# (utils/stylegan2/__init__.py:18-29)
STYLEGAN2_ZOO = {
    "bedroom": ("stylegan2_bedroom.pt", 256),
    "car": ("stylegan2_car.pt", 512),
    "cat": ("stylegan2_cat.pt", 256),
    "church": ("stylegan2_church.pt", 256),
    "faces": ("stylegan2_faces.pt", 1024),
    "horse": ("stylegan2_horse.pt", 256),
    "kitchen": ("stylegan2_kitchen.pt", 256),
    "places": ("stylegan2_places.pt", 256),
}
STYLEGAN2_URL = "https://rewriting.csail.mit.edu/models/"

# domain -> filename (utils/proggan.py:12-21)
PROGGAN_ZOO = {
    "bedroom": "proggan_bedroom-d8a89ff1.pth",
    "church": "proggan_churchoutdoor-7e701dd5.pth",
    "conferenceroom": "proggan_conferenceroom-21e85882.pth",
    "diningroom": "proggan_diningroom-3aa0ab80.pth",
    "kitchen": "proggan_kitchen-67f1e16c.pth",
    "livingroom": "proggan_livingroom-5ef336dd.pth",
    "restaurant": "proggan_restaurant-b8578299.pth",
    "celebhq": "proggan_celebhq-620d161c.pth",
}
PROGGAN_URL = "http://gandissect.csail.mit.edu/models/"


def weights_dir() -> str:
    return os.environ.get(
        "REWRITING_TPU_WEIGHTS",
        os.path.join(os.path.expanduser("~"), ".cache", "rewriting_tpu"))


def _resolve(filename: str, url_base: str, path: Optional[str]) -> str:
    if path is not None:
        if os.path.isfile(path):
            return path
        raise FileNotFoundError(path)
    local = os.path.join(weights_dir(), filename)
    if os.path.isfile(local):
        return local
    # last resort: try downloading (works only with network egress)
    try:
        import urllib.request
        os.makedirs(weights_dir(), exist_ok=True)
        tmp = local + ".tmp"
        urllib.request.urlretrieve(url_base + filename, tmp)
        os.replace(tmp, local)
        return local
    except Exception as e:
        raise FileNotFoundError(
            f"checkpoint {filename} not found at {local} and download "
            f"failed ({e}). Place the file from {url_base}{filename} into "
            f"$REWRITING_TPU_WEIGHTS ({weights_dir()}).") from e


def _torch_load_numpy(path: str) -> dict:
    """Load a torch checkpoint into plain numpy (torch used as unpickler)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)

    def conv(obj):
        if isinstance(obj, torch.Tensor):
            return obj.detach().cpu().numpy()
        if isinstance(obj, dict):
            return {k: conv(v) for k, v in obj.items()}
        return obj
    return conv(sd)


def load_seq_stylegan(category: str, path: Optional[str] = None,
                      truncation: float = 1.0, size: Optional[int] = None,
                      mconv: str = "seq"
                      ) -> Tuple[stylegan2_mod.SeqStyleGAN2, dict]:
    """(model, params) for a published StyleGAN2 checkpoint
    (reference utils/stylegan2/__init__.py:39-47; reference loads with
    truncation=0.5 for sampling models)."""
    filename, default_size = STYLEGAN2_ZOO[category]
    path = _resolve(filename, STYLEGAN2_URL, path)
    sd = _torch_load_numpy(path)
    latent_avg = None
    if isinstance(sd, dict) and "g_ema" in sd:
        latent_avg = sd.get("latent_avg")
        sd = sd["g_ema"]
    model = stylegan2_mod.SeqStyleGAN2(size=size or default_size,
                                       style_dim=512, n_mlp=8,
                                       truncation=truncation, mconv=mconv)
    params = stylegan2_mod.params_from_state_dict(model, sd,
                                                  latent_avg=latent_avg)
    return model, params


def load_proggan(domain: str, path: Optional[str] = None
                 ) -> Tuple[proggan_mod.ProgressiveGenerator, dict]:
    """(model, params) for a published ProgGAN checkpoint
    (reference utils/proggan.py:8-30)."""
    path = _resolve(PROGGAN_ZOO[domain], PROGGAN_URL, path)
    sd = _torch_load_numpy(path)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    if "features.0.conv.weight" in sd:
        sd = _proggan_from_old_names(sd)
    return proggan_mod.from_state_dict(sd)


def _proggan_from_old_names(sd: dict) -> dict:
    """Convert the old 'features.N' naming (reference proggan.py:298-325)."""
    out = {}
    i = 0
    while f"features.{i}.conv.weight" in sd:
        out[f"layer{i + 1}.conv.weight"] = sd[f"features.{i}.conv.weight"]
        out[f"layer{i + 1}.wscale.b"] = sd[f"features.{i}.wscale.b"]
        i += 1
    res = 4 * (2 ** ((i - 1) // 2))
    out[f"output_{res}x{res}.conv.weight"] = sd["output.conv.weight"]
    out[f"output_{res}x{res}.wscale.b"] = sd["output.wscale.b"]
    return out


def load_pretrained(domain: str, **kwargs):
    """Reference-named alias (proggan.py:8)."""
    return load_proggan(domain, **kwargs)
