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


# ---------------------------------------------------------------------------
# Orbax checkpointing: the TPU-fleet-native persistence path — sharded
# arrays save/restore in parallel per host, directly to shared/remote
# storage (GCS), with the sharding layout preserved.  npz (above) remains
# the dependency-light single-host format.
# ---------------------------------------------------------------------------

def save_params_orbax(path: str, params: Dict) -> None:
    """Save a params pytree (possibly sharded over a mesh) with Orbax."""
    import os
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_params_orbax(path: str, like: Dict = None) -> Dict:
    """Restore a params pytree. With `like` (a pytree of arrays or
    jax.ShapeDtypeStructs, e.g. model.init_params(...) placed on a mesh),
    arrays restore directly into that sharding layout."""
    import os
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(path)
        import jax

        def abstract(x):
            if isinstance(x, jax.ShapeDtypeStruct):
                return x
            if not hasattr(x, "shape"):  # python scalar / list leaf
                x = jnp.asarray(x)
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=getattr(x, "sharding",
                                                         None))
        return ckptr.restore(path, jax.tree_util.tree_map(abstract, like))
