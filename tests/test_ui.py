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


# ---------------------------------------------------------------------------
# round-2 widgets + event semantics (reference labwidget.py:480-963)
# ---------------------------------------------------------------------------

def test_new_widgets_render_and_bind():
    from rewriting_tpu.ui import Textarea, Menu, Datalist, ClickDiv
    ta = Textarea(value="hello\nworld", rows=3, cols=40)
    h = ta._repr_html_()
    assert "<textarea" in h and "hello" in h and 'rows="3"' in h
    got = []
    ta.on("value", got.append)
    ta.set("value", "edited", _from_view=True)  # simulated blur from JS
    assert got == ["edited"] and ta.value == "edited"

    m = Menu(choices=["a", "b<c"], selection="b<c")
    h = m._repr_html_()
    assert "<select" in h and "b&lt;c" in h and "selected" in h
    m.set("selection", "a", _from_view=True)
    assert m.selection == "a"
    m.choices = ["x", "y"]  # live update must not raise
    assert "x" in m._repr_html_()

    dl = Datalist(choices=["one", "two"], value="one")
    h = dl._repr_html_()
    assert "<datalist" in h and dl.datalist_id() in h and "one" in h

    cd = ClickDiv(innerHTML='<span data-click="unit3">u3</span>')
    clicks = []
    cd.on("click", clicks.append)
    cd.set("click", "unit3", _from_view=True)
    assert clicks == ["unit3"]
    assert "data-click" in cd._repr_html_()


def test_block_events_silences_cascade():
    """Reference semantics (labwidget.py:405-412, 484-506): property writes
    made INSIDE a handler update state and the view but do not cascade
    into further Python listeners."""
    from rewriting_tpu.ui import Textbox
    a, b = Textbox(), Textbox()
    cascade = []

    def handler_a(v):
        b.value = f"derived-{v}"  # state updates...

    b.on("value", lambda v: cascade.append(v))  # ...but this must not fire
    a.on("value", handler_a)
    a.value = "top"
    assert b.value == "derived-top"
    assert cascade == []
    # a top-level set still notifies normally
    b.value = "direct"
    assert cascade == ["direct"]


def test_capture_output_routes_to_write():
    from rewriting_tpu.ui import Button
    from rewriting_tpu.ui.labwidget import capture_output
    btn = Button("go")
    writes = []
    btn.on("write", writes.append)
    with capture_output(btn):
        print("hello from handler")
    assert len(writes) == 1 and "hello from handler" in writes[0]
    try:
        with capture_output(btn):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert len(writes) == 2 and "boom" in writes[1]


def test_comm_protocol_roundtrip():
    """Scripted kernel<->view comm round-trip with a fake comm object:
    view-originated messages drive widget.set(_from_view=True); Python
    sets send {name, value} messages to the view."""
    from rewriting_tpu.ui import Textbox
    tb = Textbox(value="init")

    class FakeComm:
        def __init__(self):
            self.sent = []
            self.handler = None

        def send(self, data):
            self.sent.append(data)

        def on_msg(self, fn):
            self.handler = fn
            return fn

    comm = FakeComm()
    # simulate the comm-open path (labwidget._register_comm_target.on_open)
    object.__setattr__(tb, "_comm", comm)
    # python -> view
    tb.value = "from-python"
    assert {"name": "value", "value": "from-python"} in comm.sent
    # view -> python must NOT echo back to the view
    n_sent = len(comm.sent)
    seen = []
    tb.on("value", seen.append)
    tb.set("value", "from-view", _from_view=True)
    assert tb.value == "from-view" and seen == ["from-view"]
    assert len(comm.sent) == n_sent


def test_js_runtime_harness_wellformed():
    """No browser ships in this image, so the JS runtime is validated two
    ways: (a) scripts/make_ui_harness.py emits a self-contained page (mock
    Jupyter comm + DOM-event assertions, document.title == 'UI-OK') for
    real-browser runs; (b) this test structurally lints every widget's
    emitted JS — balanced delimiters outside string literals and resolvable
    element-id references — catching the common f-string bitrot."""
    import re
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import make_ui_harness
    markers = {"classic": "Jupyter.notebook.kernel.comm_manager",
               "colab": "google.colab.kernel.comms",
               "jlab": "jupyterapp"}
    for transport, marker in markers.items():
        page = make_ui_harness.build_page(transport)
        assert 'id="results"' in page and "UI-OK" in page, transport
        assert marker in page, transport
        assert "window.kernelSend" in page, transport

    def lint_js(js, ctx):
        stack = []
        pairs = {")": "(", "]": "[", "}": "{"}
        i, n = 0, len(js)
        in_str = None
        while i < n:
            c = js[i]
            if in_str:
                if c == "\\":
                    i += 2
                    continue
                if c == in_str:
                    in_str = None
            elif c in "'\"":
                in_str = c
            elif c in "([{":
                stack.append(c)
            elif c in ")]}":
                assert stack and stack[-1] == pairs[c], \
                    f"unbalanced {c!r} at {i} in {ctx}: ...{js[max(0,i-40):i+5]!r}"
                stack.pop()
            i += 1
        assert not stack, f"unclosed {stack} in {ctx}"
        assert in_str is None, f"unterminated string in {ctx}"

    from rewriting_tpu.ui import (Button, Checkbox, Choice, ClickDiv,
                                  Datalist, Div, Image, Label, Menu, Range,
                                  Textarea, Textbox)
    from rewriting_tpu.ui.paintwidget import PaintWidget
    for cls in (Button, Checkbox, Choice, ClickDiv, Datalist, Div, Image,
                Label, Menu, Range, Textarea, Textbox, PaintWidget):
        w = cls()
        html_repr = w._repr_html_()
        # every getElementById reference in the widget's own JS must exist
        # in its HTML
        js = w.widget_js()
        lint_js(js, cls.__name__)
        for ref in re.findall(r'getElementById\("([^"]+)"\)', js):
            assert f'id="{ref}"' in html_repr, (cls.__name__, ref)


# ---------------------------------------------------------------------------
# round-2 app affordances (reference rewriteapp.py:100-352, 550-587)
# ---------------------------------------------------------------------------

def test_app_paging_and_imgnum_ranges(app):
    app.imgnum_box.value = "2-5,9"
    assert app.canvas_imgnums == [2, 3, 4, 5]  # clipped to num_canvases
    app.imgnum_box.value = "0-2,9"
    assert app.canvas_imgnums == [0, 1, 2, 9]
    app.next_page()
    assert app.canvas_imgnums == [10, 11, 12, 13]
    assert app.imgnum_box.value == "10,11,12,13"
    app.prev_page()
    assert app.canvas_imgnums == [6, 7, 8, 9]
    # garbage ranges are skipped, out-of-dataset indices dropped
    app.imgnum_box.value = "zz,18-99"
    assert app.canvas_imgnums == [18, 19]
    app.show_images(range(4))


def test_app_brushsize(app):
    app.brushsize_box.value = "25"
    assert all(c.brushsize == 25 for c in app.canvases)


def test_app_keytray_remove(app):
    h, w = app.gw.v_shape[1:3]
    app.clear_keys()
    for i in (0, 1):
        app.canvases[i].set("mask", mask_to_url(blob(h, w, 3, 3, 2)),
                            _from_view=True)
        app.add_key(i)
    assert [i for i, _ in app.key_selections] == [0, 1]
    assert app.keytray_menu.choices == [0, 1]
    # re-adding an imgnum replaces instead of duplicating
    app.canvases[0].set("mask", mask_to_url(blob(h, w, 4, 4, 2)),
                        _from_view=True)
    app.add_key(0)
    assert [i for i, _ in app.key_selections] == [1, 0]
    app.keytray_remove(1)
    assert [i for i, _ in app.key_selections] == [0]
    assert app.keytray_menu.choices == [0]
    assert 'data-click="0"' in app.key_tray.innerHTML
    app.keytray_show()
    assert app.canvas_imgnums[0] == 0
    app.clear_keys()
    assert app.keytray_menu.choices == []


def test_app_snapshot_and_clear(app):
    app.show_images(range(4))
    app.snapshot_images()
    assert all(s.src == c.image
               for s, c in zip(app.snap_images, app.canvases))
    app.clear_images()
    assert all(s.src == "" for s in app.snap_images)


def test_app_search_highlight(app):
    h, w = app.gw.v_shape[1:3]
    app.canvases[0].set("mask", mask_to_url(blob(h, w, 3, 3, 2)),
                        _from_view=True)
    app.search(0)
    assert app.query_key is not None and app.query_rq is not None
    plain = [c.image for c in app.canvases]
    app.toggle_highlight()
    assert app.query_vis
    highlighted = [c.image for c in app.canvases]
    assert highlighted != plain  # heatmap overlay changed the renders
    app.toggle_highlight()
    assert not app.query_vis


def test_app_saved_mask_browsing(app, tmp_path):
    h, w = app.gw.v_shape[1:3]
    app.mask_dir = str(tmp_path / "masks")
    app.canvases[0].set("mask", mask_to_url(blob(h, w, 2, 2, 2)),
                        _from_view=True)
    app.pick_object(0)
    app.canvases[1].set("mask", mask_to_url(blob(h, w, 5, 5, 2)),
                        _from_view=True)
    app.pick_paste(1)
    app.saved_list.value = "myedit"
    app.save_by_name()
    assert app.saved_names() == ["myedit"]
    assert "myedit" in app.saved_list.choices
    app.clear_object()
    app.clear_paste()
    assert app.object_selection is None
    app.load_by_name("myedit")
    assert app.object_selection is not None
    assert app.paste_selection is not None


def test_app_pick_via_current_mask_item(app):
    """Painting tracks the active canvas so Copy/Paste work without an
    explicit index (reference current_mask_item, rewriteapp.py:332-346)."""
    h, w = app.gw.v_shape[1:3]
    app.canvases[2].set("mask", mask_to_url(blob(h, w, 3, 3, 2)),
                        _from_view=True)
    assert app.current_mask_item == 2
    sel = app.pick_object()
    assert sel[0] == app.canvas_imgnums[2]


def test_app_search_after_repaint_uses_key_selections(app):
    """repaint clears every canvas mask; a later search() must not decode
    the stale empty mask (falls back to the key tray)."""
    h, w = app.gw.v_shape[1:3]
    app.clear_keys()
    app.canvases[0].set("mask", mask_to_url(blob(h, w, 3, 3, 2)),
                        _from_view=True)
    app.add_key(0)
    app.search(0)          # repaints -> clears masks
    assert app.current_mask_item is None
    app.search()           # must use key_selections, not the empty mask
    assert app.query_key is not None
