"""UI layer: widget model semantics and the headless rewrite-app flow."""

import json
import os

import jax
import numpy as np
import pytest

from rewriting_tpu.models import ProgressiveGenerator
from rewriting_tpu.rewrite import ProgressiveGanRewriter
from rewriting_tpu.ui import (Button, Div, GanRewriteApp, Image, Label,
                              Model, PaintWidget, Property, Textbox,
                              Trigger, Widget)
from rewriting_tpu.utils.renormalize import mask_to_url
from rewriting_tpu.utils.zdataset import z_dataset_for_model
from conftest import blob




# ---------------------------------------------------------------------------
# widget model
# ---------------------------------------------------------------------------

def test_property_notification():
    class M(Model):
        x = Property(1)
        fire = Trigger()

    m = M()
    seen = []
    m.on("x", seen.append)
    m.x = 5
    assert m.x == 5 and seen == [5]
    m.off("x", seen.append)
    m.x = 7
    assert seen == [5]
    events = []
    m.on("fire", events.append)
    m.trigger("fire", "boom")
    assert events == ["boom"]
    # triggers hold no state
    assert m.fire is None


def test_property_instances_independent():
    class M(Model):
        x = Property(0)

    a, b = M(), M()
    a.x = 3
    assert b.x == 0


def test_widgets_render():
    b = Button("Go")
    html = b._repr_html_()
    assert "Go" in html and b._view_id in html and "<script>" in html
    t = Textbox("hello")
    assert 'value="hello"' in t._repr_html_()
    lbl = Label("L")
    assert ">L</span>" in lbl.widget_html()
    d = Div()
    d.show("<b>hi</b>")
    assert "<b>hi</b>" in d.widget_html()
    img = Image()
    img.render(np.zeros((4, 4, 3), np.float32))
    assert img.src.startswith("data:image/png")


def test_button_click_handler():
    b = Button("X")
    hits = []
    b.on("click", lambda v: hits.append(v))
    b.set("click", True, _from_view=True)  # simulates the JS event
    assert hits == [True]


def test_paintwidget_mask():
    p = PaintWidget(width=16, height=16)
    p.set_image(np.zeros((16, 16, 3), np.float32))
    assert p.image.startswith("data:image/png")
    url = mask_to_url(blob(16, 16, 8, 8, 4))
    p.set("mask", url, _from_view=True)  # user paints in browser
    assert p.mask == url
    p.clear()
    assert p.mask == ""


# ---------------------------------------------------------------------------
# the app, headless
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def app():
    model = ProgressiveGenerator(sizes=[16, 16, 8, 8])
    params = model.init_params(jax.random.PRNGKey(3))
    zds = z_dataset_for_model(model, 20)
    gw = ProgressiveGanRewriter(model, params, zds, layernum=3,
                                stats_batch_size=10)
    return GanRewriteApp(gw, size=16, num_canvases=4)


def test_app_canvases_render(app):
    assert all(c.image.startswith("data:image/png") for c in app.canvases)
    html = app.widget_html()
    assert "Execute Change" in html


def test_app_full_edit_flow(app, tmp_path):
    h, w = app.gw.v_shape[1:3]
    # user paints object on canvas 0 and paste on canvas 1
    app.canvases[0].set("mask", mask_to_url(blob(h, w, 2, 2, 2)),
                        _from_view=True)
    app.pick_object(0)
    app.canvases[1].set("mask", mask_to_url(blob(h, w, 5, 5, 2)),
                        _from_view=True)
    app.pick_paste(1)
    app.canvases[1].set("mask", mask_to_url(blob(h, w, 5, 5, 3)),
                        _from_view=True)
    app.add_key(1)
    req = app.current_request()
    assert set(req) == {"object", "paste", "key"}
    # save/load round-trip (the artifact of record is the request JSON)
    path = str(tmp_path / "edit.json")
    app.save_request(path)
    app.clear_keys()
    loaded = app.load_request(path)
    assert loaded == json.loads(json.dumps(req))
    # execute with a small solve
    app.niter_box.value = "31"
    before = app.canvases[1].image
    app.exec_request()
    assert app.status == "edited"
    assert app.loss_label.value.startswith("iter")
    after = app.canvases[1].image
    assert before != after  # canvases repainted from edited model
    # toggle original flips back to pristine rendering and back
    app.toggle_original()
    assert app.original_shown
    orig_img = app.canvases[1].image
    app.toggle_original()
    assert not app.original_shown
    assert app.canvases[1].image == after != orig_img
    app.revert()


def test_app_search(app):
    h, w = app.gw.k_shape[1:3]
    app.canvases[0].set("mask", mask_to_url(blob(h, w, h // 2, w // 2, 2)),
                        _from_view=True)
    ranking = app.search(canvas_index=0, k=4)
    assert len(app.canvas_imgnums) == 4
    assert all(0 <= i < 20 for i in app.canvas_imgnums)
