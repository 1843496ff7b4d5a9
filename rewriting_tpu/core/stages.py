"""Functional stage pipelines — the TPU-native replacement for nn.Sequential
surgery.

The reference builds its generators as (possibly nested) ``nn.Sequential``
modules and performs model surgery with ``nethook.subsequence``
(reference: utils/nethook.py:322-401), which recursively copies slices of the
module tree.  It then instruments layers by monkey-patching ``forward``
(utils/nethook.py:182-201).

Here a model is a :class:`StagePipeline`: an ordered tuple of named *pure*
stage functions ``fn(params_subtree, bag) -> bag`` plus a separate flat params
pytree ``{stage_name: {param_name: array}}``.  This makes the reference's three
mutable mechanisms trivial and jit-friendly:

- ``subsequence`` is tuple slicing (dotted-name prefixes select nested spans);
- "retain a layer's output" is just calling a sub-pipeline and keeping the bag;
- weight editing produces a *new* params dict; sharing weights between the
  context/target/rendering splits is automatic because the splits all read
  from the same params dict.

Because stages are pure, ``jax.jit(lambda p, b: pipe(p, b))`` compiles the
whole model (or any slice) into a single XLA program.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

from .bag import DataBag

StageFn = Callable[[Dict[str, Any], DataBag], DataBag]


class Stage:
    """A named pure function over (params_subtree, bag)."""

    __slots__ = ("name", "fn")

    def __init__(self, name: str, fn: StageFn):
        self.name = name
        self.fn = fn

    def __repr__(self):
        return f"Stage({self.name!r})"


def _matches(stage_name: str, query: str) -> bool:
    """True if `query` names this stage or an enclosing dotted prefix."""
    return stage_name == query or stage_name.startswith(query + ".")


class StagePipeline:
    """An ordered, immutable sequence of named stages.

    Calling a pipeline applies every stage in order::

        out_bag = pipeline(params, in_bag)

    ``params`` is a flat dict keyed by stage name; stages without parameters
    simply receive an empty dict.  Stage names are dotted paths mirroring the
    reference module hierarchy (e.g. ``layer4.sconv.mconv.dconv``) so that
    surgery queries against reference layer names work unchanged.
    """

    def __init__(self, stages: Sequence[Stage]):
        self.stages: Tuple[Stage, ...] = tuple(stages)
        names = [s.name for s in self.stages]
        if len(set(names)) != len(names):
            dupes = sorted({n for n in names if names.count(n) > 1})
            raise ValueError(f"duplicate stage names: {dupes}")
        self._index = {s.name: i for i, s in enumerate(self.stages)}

    # -- application ------------------------------------------------------
    def __call__(self, params: Dict[str, Any], bag: DataBag) -> DataBag:
        from ..ops.precision import stage_scope
        for stage in self.stages:
            # a stage fn may opt into receiving the FULL params dict (set
            # fn._full_params = True) — used by fused fast-pipeline stages
            # that consume several reference stages' parameters in one
            # kernel (e.g. dconv+blur+noise+activate); the seq pipeline
            # never does this, so surgery semantics are unaffected
            with stage_scope(stage.name):
                if getattr(stage.fn, "_full_params", False):
                    bag = stage.fn(params, bag)
                else:
                    bag = stage.fn(params.get(stage.name, {}), bag)
        return bag

    # -- introspection ----------------------------------------------------
    def stage_names(self) -> Tuple[str, ...]:
        return tuple(s.name for s in self.stages)

    def __len__(self):
        return len(self.stages)

    def __repr__(self):
        return f"StagePipeline({list(self.stage_names())})"

    def _span(self, query: str) -> Tuple[int, int]:
        """[start, end) indices of stages matched by a dotted name/prefix."""
        idxs = [i for i, s in enumerate(self.stages) if _matches(s.name, query)]
        if not idxs:
            raise KeyError(f"no stage matches {query!r}; have "
                           f"{list(self.stage_names())}")
        lo, hi = min(idxs), max(idxs) + 1
        if idxs != list(range(lo, hi)):
            raise ValueError(f"stages matching {query!r} are not contiguous")
        return lo, hi

    # -- surgery -----------------------------------------------------------
    def subsequence(
        self,
        first_layer: Optional[str] = None,
        last_layer: Optional[str] = None,
        after_layer: Optional[str] = None,
        upto_layer: Optional[str] = None,
    ) -> "StagePipeline":
        """Slice the pipeline, mirroring nethook.subsequence semantics
        (reference: utils/nethook.py:322-345): first/last are inclusive,
        after/upto are exclusive; names may address any hierarchy level.
        Weights are always shared — params dicts are passed at call time.
        """
        if first_layer is not None and after_layer is not None:
            raise ValueError("give only one of first_layer/after_layer")
        if last_layer is not None and upto_layer is not None:
            raise ValueError("give only one of last_layer/upto_layer")
        start, stop = 0, len(self.stages)
        if first_layer is not None:
            start = self._span(first_layer)[0]
        elif after_layer is not None:
            start = self._span(after_layer)[1]
        if last_layer is not None:
            stop = self._span(last_layer)[1]
        elif upto_layer is not None:
            stop = self._span(upto_layer)[0]
        if start >= stop:
            raise ValueError(
                f"empty or inverted subsequence (first={first_layer!r} "
                f"after={after_layer!r} last={last_layer!r} "
                f"upto={upto_layer!r})")
        return StagePipeline(self.stages[start:stop])

    def param_names(self, params: Dict[str, Any]) -> Tuple[str, ...]:
        """The subset of `params` keys owned by stages in this pipeline."""
        return tuple(s.name for s in self.stages if s.name in params)


def subsequence(pipeline: StagePipeline, **kwargs) -> StagePipeline:
    """Functional alias for :meth:`StagePipeline.subsequence`."""
    return pipeline.subsequence(**kwargs)
