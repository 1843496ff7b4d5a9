"""Edit-request registry: the published paper edits
(reference: metrics/load_mask.py).

Masks are tiny JSON edit-request files (imgnum + painted mask data URLs).
They resolve from, in order: an explicit path, $REWRITING_TPU_MASKS, the
local ./masks directory, or a download from the publication server when
the network allows."""

from __future__ import annotations

import json
import os
from typing import Tuple

MASK_URLS = "http://rewriting.csail.mit.edu/data/masks/"

# name -> [clean dataset, mask filename, layer number]
# (reference load_mask.py:7-12)
name2info = {
    "dome2spire": ["church", "dome2spire.json", 8],
    "dome2tree": ["church", "dome2tree.json", 8],
    "dome2castle": ["church", "dome2castle.json", 6],
    "smile": ["faces", "smile.json", 10],
}


def masks_dir() -> str:
    return os.environ.get("REWRITING_TPU_MASKS", "masks")


def load_mask_info(mask: str) -> Tuple[str, str, int]:
    """(mask_path, dataset, layernum) for a named edit
    (reference load_mask.py:16-24)."""
    dataset, maskname, layernum = name2info[mask]
    basedir = os.path.join(masks_dir(), dataset)
    mask_path = os.path.join(basedir, maskname)
    if not os.path.exists(mask_path):
        os.makedirs(basedir, exist_ok=True)
        try:
            import urllib.request
            with urllib.request.urlopen(MASK_URLS + maskname) as r:
                result = json.load(r)
            with open(mask_path, "w") as f:
                json.dump(result, f, indent=1)
        except Exception as e:
            raise FileNotFoundError(
                f"edit-request JSON {maskname} not found at {mask_path} "
                f"and download failed ({e}); place the published file from "
                f"{MASK_URLS}{maskname} there (or set "
                f"$REWRITING_TPU_MASKS).") from e
    return mask_path, dataset, layernum


def load_mask_request(mask: str) -> dict:
    path, _, _ = load_mask_info(mask)
    with open(path) as f:
        return json.load(f)
