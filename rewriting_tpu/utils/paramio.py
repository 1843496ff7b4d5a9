"""Params checkpoint IO: save/load a (possibly edited) params pytree as a
single npz.

Checkpoint/resume in this framework is layered (mirroring the reference's
design, SURVEY.md §5): the artifact of record for an *edit* is the tiny
JSON request (re-applied deterministically); statistics resume from tally
npz caches; and this module covers the third layer — persisting a whole
params tree (e.g. an edited model for serving) without torch."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

_SEP = "||"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        out[f"{prefix}__seq__"] = np.array(len(tree))
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}{_SEP}"))
    else:
        out[prefix.rstrip(_SEP)] = np.asarray(tree)
    return out


def save_params(path: str, params: Dict):
    import os
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **_flatten(params))


def load_params(path: str) -> Dict:
    data = dict(np.load(path, allow_pickle=False))
    root: Dict = {}
    seqs = {k[:-len("__seq__") - len(_SEP)] for k in data
            if k.endswith(f"{_SEP}__seq__")}
    for key, value in data.items():
        if key.endswith("__seq__"):
            continue
        parts = key.split(_SEP)
        node = root
        for i, part in enumerate(parts[:-1]):
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value)

    def listify(node, prefix=""):
        if not isinstance(node, dict):
            return node
        out = {k: listify(v, f"{prefix}{k}{_SEP}") for k, v in node.items()}
        if prefix.rstrip(_SEP) in seqs or (prefix == "" and "" in seqs):
            return [out[str(i)] for i in range(len(out))]
        return out

    return listify(root)
