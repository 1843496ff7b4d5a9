"""GanRewriteApp: the interactive rewriting interface.

Behavioral rebuild of reference rewrite/rewriteapp.py: a grid of canvases
rendering samples from the (edited) generator, paint-to-select copy /
paste / context-key trays, key search, solve-parameter textboxes, execute
change / erase / overfit buttons, toggle-original, and save/load of the
edit-request JSON (format verbatim: {"object": [imgnum, mask_url],
"paste": [...], "key": [[imgnum, mask_url], ...]}).

All interaction logic is plain Python on Properties, so the app is fully
drivable headless (tests) and renders as widgets in Jupyter."""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import numpy as np

from ..utils import renormalize
from .labwidget import (Button, Div, Image, Label, Property, Textbox,
                        Trigger, Widget)
from .paintwidget import PaintWidget


class GanRewriteApp(Widget):
    loss = Property(0.0)
    status = Property("ready")
    original_shown = Property(False)

    def __init__(self, gw, size: int = 256, mask_dir: str = "masks",
                 num_canvases: int = 9, **kwargs):
        super().__init__(**kwargs)
        self.gw = gw
        self.size = size
        self.mask_dir = mask_dir
        self.num_canvases = num_canvases

        # selection state (the edit request under construction)
        self.object_selection: Optional[Tuple[int, str]] = None
        self.paste_selection: Optional[Tuple[int, str]] = None
        self.key_selections: List[Tuple[int, str]] = []

        # widgets
        self.canvases = [PaintWidget(width=size, height=size,
                                     oneshot=True)
                         for _ in range(num_canvases)]
        self.canvas_imgnums = list(range(num_canvases))
        self.object_tray = PaintWidget(width=size, height=size,
                                       disabled=True)
        self.paste_tray = PaintWidget(width=size, height=size,
                                      disabled=True)
        self.key_tray = Div()
        self.rank_box = Textbox("1", size=4)
        self.niter_box = Textbox("2001", size=6)
        self.piter_box = Textbox("10", size=4)
        self.lr_box = Textbox("0.05", size=6)
        self.query_box = Textbox("", size=24)
        self.loss_label = Label("")
        self.exec_button = Button("Execute Change")
        self.erase_button = Button("Execute Erase")
        self.overfit_button = Button("Execute Overfit")
        self.toggle_button = Button("Toggle Original")
        self.revert_button = Button("Revert")
        self.exec_button.on("click", lambda _: self.exec_request())
        self.erase_button.on("click", lambda _: self.exec_erase())
        self.overfit_button.on("click", lambda _: self.exec_overfit())
        self.toggle_button.on("click", lambda _: self.toggle_original())
        self.revert_button.on("click", lambda _: self.revert())
        self._snapshot_params = None
        self.repaint_canvas_array()

    # -- canvases ----------------------------------------------------------------
    def repaint_canvas_array(self):
        """Render current model samples into the canvases (reference
        rewriteapp.py:263-282)."""
        imgs = self.gw.render_image_batch(self.canvas_imgnums)
        for canvas, img in zip(self.canvases, imgs):
            canvas.image = renormalize.as_url(img)
            canvas.mask = ""

    def show_images(self, imgnums):
        self.canvas_imgnums = list(imgnums)[:self.num_canvases]
        self.repaint_canvas_array()

    # -- selections -----------------------------------------------------------------
    def pick_object(self, canvas_index: int):
        """'Copy': record (imgnum, mask) painted on a canvas (reference
        exec_object path, rewriteapp.py:406-431)."""
        c = self.canvases[canvas_index]
        assert c.mask, "paint a mask first"
        imgnum = self.canvas_imgnums[canvas_index]
        self.object_selection = (imgnum, c.mask)
        self.object_tray.image = c.image
        self.object_tray.mask = c.mask
        self.status = f"object from image {imgnum}"
        return self.object_selection

    def pick_paste(self, canvas_index: int):
        """'Paste': record the target location (reference exec_paste,
        rewriteapp.py:457-478) and preview the composite."""
        c = self.canvases[canvas_index]
        assert c.mask, "paint a mask first"
        imgnum = self.canvas_imgnums[canvas_index]
        self.paste_selection = (imgnum, c.mask)
        self.paste_tray.image = c.image
        self.paste_tray.mask = c.mask
        self.status = f"paste at image {imgnum}"
        if self.object_selection is not None:
            o_imgnum, o_mask = self.object_selection
            obj_acts, _, obj_area, _ = self.gw.object_from_selection(
                o_imgnum, o_mask)
            _, _, viz_out, _ = self.gw.paste_from_selection(
                imgnum, c.mask, obj_acts, obj_area)
            img = self.gw.render_object(viz_out)
            self.paste_tray.image = renormalize.as_url(img)
        return self.paste_selection

    def add_key(self, canvas_index: int):
        """Add a painted context example (reference keytray handling)."""
        c = self.canvases[canvas_index]
        assert c.mask, "paint a mask first"
        imgnum = self.canvas_imgnums[canvas_index]
        self.key_selections.append((imgnum, c.mask))
        self.status = f"{len(self.key_selections)} context keys"
        return self.key_selections[-1]

    def clear_keys(self):
        self.key_selections = []

    def search(self, canvas_index: Optional[int] = None, k: int = None):
        """'Search': rank images by response to the painted key
        (reference keytray_query, rewriteapp.py:231)."""
        k = k or self.num_canvases
        if canvas_index is not None:
            c = self.canvases[canvas_index]
            imgnum = self.canvas_imgnums[canvas_index]
            key = self.gw.query_key_from_selection(imgnum, c.mask)
        else:
            assert self.key_selections, "no key painted"
            imgnum, mask = self.key_selections[-1]
            key = self.gw.query_key_from_selection(imgnum, mask)
        ranking, _ = self.gw.ranking_for_key(key, k=k)
        self.show_images([int(i) for i in np.asarray(ranking)[:k]])
        return ranking

    # -- the request -------------------------------------------------------------
    def current_request(self) -> dict:
        """UI-format JSON edit request (reference rewriteapp.py:570-574)."""
        assert self.paste_selection is not None, "no paste selection"
        req = {"paste": list(self.paste_selection)}
        if self.object_selection is not None:
            req["object"] = list(self.object_selection)
        if self.key_selections:
            req["key"] = [list(p) for p in self.key_selections]
        return req

    def save_request(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.current_request(), f, indent=1)

    def load_request(self, path: str):
        with open(path) as f:
            req = json.load(f)
        self.paste_selection = tuple(req["paste"])
        self.object_selection = (tuple(req["object"])
                                 if "object" in req else None)
        self.key_selections = [tuple(p) for p in req.get("key", [])]
        return req

    # -- edit execution ------------------------------------------------------------
    def _solve_args(self):
        return dict(rank=int(self.rank_box.value),
                    niter=int(self.niter_box.value),
                    piter=int(self.piter_box.value),
                    lr=float(self.lr_box.value))

    def _loss_cb(self, it, loss):
        if it % 50 == 0:
            self.loss = float(loss)
            self.loss_label.value = f"iter {it} loss {float(loss):.4f}"

    def exec_request(self):
        """'Execute Change' (reference exec_request,
        rewriteapp.py:504-527)."""
        args = self._solve_args()
        self.status = "solving..."
        self.gw.apply_edit(self.current_request(),
                           update_callback=self._loss_cb, **args)
        self.status = "edited"
        self.repaint_canvas_array()

    def exec_erase(self, drank: int = 30):
        """(reference exec_erase, rewriteapp.py:480)"""
        args = self._solve_args()
        self.status = "erasing..."
        self.gw.apply_erase(self.current_request(), drank=drank,
                            update_callback=self._loss_cb, **args)
        self.status = "erased"
        self.repaint_canvas_array()

    def exec_overfit(self, niter: int = 20001, lr: float = 0.01):
        """(reference exec_overfit, rewriteapp.py:529)"""
        self.status = "overfitting..."
        self.gw.apply_overfit(self.current_request(), niter=niter, lr=lr,
                              update_callback=self._loss_cb)
        self.status = "overfit"
        self.repaint_canvas_array()

    # -- original toggling ---------------------------------------------------------
    def toggle_original(self):
        """Swap edited and pristine weights (reference rewriteapp.py:354-360,
        state-dict snapshot semantics 263-282)."""
        if not self.original_shown:
            self._snapshot_params = self.gw.params
            self.gw.params = dict(self.gw.original_params)
            self.original_shown = True
        else:
            self.gw.params = self._snapshot_params
            self.original_shown = False
        self.repaint_canvas_array()

    def revert(self):
        self.gw.revert()
        self.original_shown = False
        self.repaint_canvas_array()

    # -- rendering --------------------------------------------------------------------
    def widget_html(self):
        rows = []
        rows.append("<div>" + "".join(
            c.widget_html() for c in self.canvases) + "</div>")
        rows.append("<div>object:" + self.object_tray.widget_html()
                    + " paste:" + self.paste_tray.widget_html()
                    + self.key_tray.widget_html() + "</div>")
        controls = [("rank", self.rank_box), ("niter", self.niter_box),
                    ("piter", self.piter_box), ("lr", self.lr_box)]
        rows.append("<div>" + "".join(
            f"{name} {w.widget_html()}" for name, w in controls)
            + "</div>")
        rows.append("<div>" + "".join(
            b.widget_html() for b in [self.exec_button, self.erase_button,
                                      self.overfit_button,
                                      self.toggle_button,
                                      self.revert_button])
            + self.loss_label.widget_html() + "</div>")
        return f'<div {self.std_attrs()}>' + "".join(rows) + "</div>"
