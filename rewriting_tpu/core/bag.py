"""DataBag — a dict of named arrays flowing through a stage pipeline.

The reference threads a ``DataBag`` (dict subclass with attribute access,
utils/stylegan2/models.py:204-230) through its sequential StyleGAN so that
latent / style / fmap / rgb-output data flow in parallel.  Here the bag is a
plain dict (a JAX pytree), so it jits, vmaps and shards transparently; we keep
the attribute-access ergonomics for interactive use.

Conventional keys:
    latent  - z, then W (after the mapping network), then (B, n_latent, D)
    style   - per-layer style vector picked from latent
    fmap    - the current feature map, **NHWC** layout (TPU-native)
    output  - the accumulated RGB skip output, NHWC
"""

from __future__ import annotations

import jax


class DataBag(dict):
    """Dict with attribute access. Registered as a normal dict pytree."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError:
            raise AttributeError(name)

    def copy(self) -> "DataBag":
        return DataBag(self)


jax.tree_util.register_pytree_with_keys(
    DataBag,
    lambda d: (
        tuple((jax.tree_util.DictKey(k), d[k]) for k in sorted(d)),
        tuple(sorted(d)),
    ),
    lambda keys, vals: DataBag(zip(keys, vals)),
)


def bag(**kwargs) -> DataBag:
    return DataBag(**kwargs)
