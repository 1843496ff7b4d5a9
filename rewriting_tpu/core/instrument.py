"""Functional instrumentation: retain and edit intermediate activations.

The reference's InstrumentedModel monkey-patches layer ``forward`` methods
to retain outputs and apply edit rules (reference: utils/nethook.py:16-281).
Here instrumentation is *explicit pipeline rewriting*: retain/edit points
insert synthetic pure stages into a copy of the stage list, so the
instrumented forward is still a single jittable program — retained values
ride through the bag under reserved keys and are collected at the end.

API mirrors the reference: ``retain_layer``, ``retained_layer``,
``edit_layer(rule=...)``, ``edit_layer(ablation=..., replacement=...)``
with the convex ablation/replacement rule (nethook.py:284-293),
``remove_edits``.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp

from .bag import DataBag
from .stages import Stage, StagePipeline

_RETAIN_PREFIX = "_retained:"


def apply_ablation_replacement(x, ablation=None, replacement=None):
    """x' = (1 - a) * x + a * v (reference nethook.py:284-293)."""
    if ablation is not None:
        x = x * (1 - ablation)
        if replacement is not None:
            x = x + ablation * replacement
    return x


class InstrumentedPipeline:
    """Wraps (model, params) with retain/edit instrumentation."""

    def __init__(self, model, params):
        self.model = model
        self.params = params
        self._retained: Dict[str, Optional[DataBag]] = {}
        self._edits: Dict[str, Callable] = {}
        self._compiled: Optional[StagePipeline] = None

    # -- configuration -------------------------------------------------------
    def layer_names(self):
        return self.model.pipeline.stage_names()

    def retain_layer(self, layername: str):
        self.retain_layers([layername])

    def retain_layers(self, layernames):
        for name in layernames:
            self._retained[name] = None
        self._compiled = None

    def stop_retaining_layers(self, layernames):
        for name in layernames:
            self._retained.pop(name, None)
        self._compiled = None

    def edit_layer(self, layername: str, rule: Optional[Callable] = None,
                   ablation=None, replacement=None):
        """Attach a rule applied to the bag after `layername`.  `rule` may
        map fmap -> fmap or bag -> bag; alternatively pass ablation /
        replacement arrays for the standard convex rule."""
        if rule is None:
            a = None if ablation is None else jnp.asarray(ablation)
            r = None if replacement is None else jnp.asarray(replacement)

            def rule(x):
                return apply_ablation_replacement(x, a, r)
        self._edits[layername] = rule
        self._compiled = None

    def remove_edits(self, layername: Optional[str] = None):
        if layername is None:
            self._edits.clear()
        else:
            self._edits.pop(layername, None)
        self._compiled = None

    # -- compiled instrumented pipeline ---------------------------------------
    def _instrumented(self) -> StagePipeline:
        if self._compiled is not None:
            return self._compiled
        base = self.model.pipeline
        hook_after = {}  # index of last stage matched by each hooked name
        for name in dict.fromkeys(list(self._retained) + list(self._edits)):
            lo, hi = base._span(name)
            hook_after.setdefault(hi - 1, []).append(name)
        stages = []
        for i, stage in enumerate(base.stages):
            stages.append(stage)
            for name in hook_after.get(i, []):
                if name in self._edits:
                    stages.append(Stage(f"_edit:{name}",
                                        self._make_edit(name)))
                if name in self._retained:
                    stages.append(Stage(f"{_RETAIN_PREFIX}{name}",
                                        _make_retain(name)))
        self._compiled = StagePipeline(stages)
        return self._compiled

    def _make_edit(self, name):
        def edit_stage(params, bag: DataBag) -> DataBag:
            rule = self._edits[name]  # late-bound: rules can be swapped
            out = rule(bag["fmap"]) if "fmap" in bag else rule(bag)
            if isinstance(out, DataBag):
                return out
            return DataBag(bag, fmap=out)
        return edit_stage

    # -- execution -------------------------------------------------------------
    def __call__(self, z, **kwargs):
        bag = self.model.make_bag(jnp.asarray(z), **kwargs) \
            if hasattr(self.model, "make_bag") else DataBag(latent=z)
        out = self._instrumented()(self.params, bag)
        for key in [k for k in out if k.startswith(_RETAIN_PREFIX)]:
            self._retained[key[len(_RETAIN_PREFIX):]] = out.pop(key)
        return out.get("output", out)

    def retained_layer(self, layername: str, clear: bool = False):
        """The bag snapshot after `layername` from the last call
        (reference nethook.py:103-115 returns the layer output; here you
        get the bag — take ['fmap'] for the activation tensor)."""
        val = self._retained.get(layername)
        if clear:
            self._retained[layername] = None
        return val

    def retained_features(self, clear: bool = False):
        out = {k: self.retained_layer(k, clear=clear)
               for k in self._retained}
        return out


def _make_retain(name):
    key = _RETAIN_PREFIX + name

    def retain_stage(params, bag: DataBag) -> DataBag:
        snapshot = DataBag({k: v for k, v in bag.items()
                            if not k.startswith(_RETAIN_PREFIX)})
        return DataBag(bag, **{key: snapshot})
    return retain_stage
