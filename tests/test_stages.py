"""StagePipeline surgery semantics (mirrors nethook.subsequence behavior)."""

import pytest

from rewriting_tpu.core import DataBag, Stage, StagePipeline


def _mk(n):
    def fn(params, d):
        return DataBag(d, trace=d.get("trace", ()) + (n,))
    return Stage(n, fn)


@pytest.fixture
def pipe():
    return StagePipeline([_mk(n) for n in [
        "a", "b.x", "b.y.1", "b.y.2", "b.z", "c"]])


def run(p):
    return p({}, DataBag())["trace"]


def test_full(pipe):
    assert run(pipe) == ("a", "b.x", "b.y.1", "b.y.2", "b.z", "c")


def test_first_last_inclusive(pipe):
    assert run(pipe.subsequence(first_layer="b.x", last_layer="b.z")) == (
        "b.x", "b.y.1", "b.y.2", "b.z")


def test_prefix_spans(pipe):
    assert run(pipe.subsequence(first_layer="b.y", last_layer="b.y")) == (
        "b.y.1", "b.y.2")
    assert run(pipe.subsequence(first_layer="b", last_layer="b")) == (
        "b.x", "b.y.1", "b.y.2", "b.z")


def test_upto_after_exclusive(pipe):
    assert run(pipe.subsequence(upto_layer="b.y")) == ("a", "b.x")
    assert run(pipe.subsequence(after_layer="b.y")) == ("b.z", "c")


def test_three_way_split_covers_everything(pipe):
    ctx = pipe.subsequence(upto_layer="b.y.1")
    tgt = pipe.subsequence(first_layer="b.y.1", last_layer="b.y.2")
    ren = pipe.subsequence(after_layer="b.y.2")
    assert (ctx.stage_names() + tgt.stage_names() + ren.stage_names()
            == pipe.stage_names())


def test_errors(pipe):
    with pytest.raises(KeyError):
        pipe.subsequence(first_layer="nope")
    with pytest.raises(ValueError):
        pipe.subsequence(first_layer="a", after_layer="b")
    with pytest.raises(ValueError):
        StagePipeline([_mk("a"), _mk("a")])
