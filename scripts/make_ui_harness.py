"""Generate a self-contained browser test page for the labwidget JS runtime.

The page mocks the Jupyter kernel comm (``Jupyter.notebook.kernel.
comm_manager``) so the emitted widget JS connects for real, then drives DOM
events and asserts both directions of the protocol:

- view -> python: DOM events must send {name, value} comm messages;
- python -> view: injected comm messages must update the DOM.

Results land in #results as PASS/FAIL lines and in document.title
("UI-OK" / "UI-FAIL") so any browser driver can assert completion.

Usage: python scripts/make_ui_harness.py [outpath]  (default
build/ui_harness.html); open the file in a browser.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from rewriting_tpu.ui import (Button, Checkbox, ClickDiv, Datalist, Div,
                              Label, Menu, Range, Textarea, Textbox)

MOCK_COMM = r"""
<script>
// Mock of the Jupyter notebook comm layer: records view->kernel messages
// and lets the test inject kernel->view messages.
window.sentMessages = [];   // [{id, name, value}]
window.commsById = {};
window.Jupyter = {
  notebook: {
    kernel: {
      comm_manager: {
        new_comm: function(target, data) {
          var comm = {
            _id: data.id,
            _onmsg: null,
            send: function(msg) {
              window.sentMessages.push({id: this._id, name: msg.name,
                                        value: msg.value});
            },
            on_msg: function(h) { this._onmsg = h; },
          };
          window.commsById[data.id] = comm;
          return comm;
        }
      }
    }
  }
};
window.kernelSend = function(id, name, value) {  // kernel -> view
  var comm = window.commsById[id];
  comm._onmsg({content: {data: {name: name, value: value}}});
};
</script>
"""

TEST_JS = r"""
<script>
var results = [];
function check(name, cond) {
  results.push((cond ? "PASS " : "FAIL ") + name);
}
function sent(id, name) {
  return window.sentMessages.filter(function(m) {
    return m.id === id && m.name === name; });
}
window.addEventListener('load', function() { try {
  // --- Button: click -> comm message
  var btn = document.getElementById(IDS.button);
  btn.click();
  check("button click sends trigger", sent(IDS.button, "click").length === 1);

  // --- Label: kernel -> view text update
  kernelSend(IDS.label, "value", "updated-label");
  check("label updates from kernel",
        document.getElementById(IDS.label).textContent === "updated-label");

  // --- Textbox: change event -> comm; kernel -> view value
  var tb = document.getElementById(IDS.textbox);
  tb.value = "typed";
  tb.dispatchEvent(new Event("change"));
  var m = sent(IDS.textbox, "value");
  check("textbox change sends value",
        m.length === 1 && m[0].value === "typed");
  kernelSend(IDS.textbox, "value", "pushed");
  check("textbox updates from kernel", tb.value === "pushed");

  // --- Textarea: blur -> comm
  var ta = document.getElementById(IDS.textarea);
  ta.value = "multi\nline";
  ta.dispatchEvent(new Event("blur"));
  m = sent(IDS.textarea, "value");
  check("textarea blur sends value",
        m.length === 1 && m[0].value === "multi\nline");

  // --- Range: input -> comm (numeric)
  var rg = document.getElementById(IDS.range);
  rg.value = "77";
  rg.dispatchEvent(new Event("input"));
  m = sent(IDS.range, "value");
  check("range input sends number", m.length === 1 && m[0].value === 77);

  // --- Checkbox
  var cb = document.getElementById(IDS.checkbox);
  cb.checked = true;
  cb.dispatchEvent(new Event("change"));
  m = sent(IDS.checkbox, "value");
  check("checkbox sends bool", m.length === 1 && m[0].value === true);

  // --- Menu: choices update from kernel re-renders options; change sends
  var menu = document.getElementById(IDS.menu);
  kernelSend(IDS.menu, "choices", ["x", "y", "z"]);
  check("menu re-renders choices",
        menu.querySelectorAll("option").length === 3);
  var msel = menu.querySelector("select");
  msel.value = "y";
  msel.dispatchEvent(new Event("change", {bubbles: true}));
  m = sent(IDS.menu, "selection");
  check("menu change sends selection",
        m.length === 1 && m[0].value === "y");

  // --- Datalist: choices re-render; change sends value
  var dlform = document.getElementById(IDS.datalist);
  kernelSend(IDS.datalist, "choices", ["aa", "bb"]);
  check("datalist re-renders choices",
        dlform.querySelectorAll("option").length === 2);
  var inp = dlform.querySelector("input");
  inp.value = "bb";
  inp.dispatchEvent(new Event("change", {bubbles: true}));
  m = sent(IDS.datalist, "value");
  check("datalist change sends value",
        m.length === 1 && m[0].value === "bb");

  // --- Div innerHTML from kernel
  kernelSend(IDS.div, "innerHTML", "<b>bold</b>");
  check("div innerHTML updates",
        document.getElementById(IDS.div).innerHTML === "<b>bold</b>");

  // --- ClickDiv: data-click payload
  kernelSend(IDS.clickdiv, "innerHTML",
             '<span data-click="unit7">seven</span>');
  document.getElementById(IDS.clickdiv).querySelector("span").click();
  m = sent(IDS.clickdiv, "click");
  check("clickdiv sends data-click payload",
        m.length === 1 && m[0].value === "unit7");

  // --- write trigger renders above the widget
  kernelSend(IDS.button, "write", "<pre>captured output</pre>");
  var prev = document.getElementById(IDS.button).previousSibling;
  check("write renders above widget",
        prev && prev.innerHTML === "<pre>captured output</pre>");
} catch (e) {
  results.push("FAIL exception: " + e);
}
  var ok = results.every(function(r) { return r.indexOf("PASS") === 0; });
  document.title = ok ? "UI-OK" : "UI-FAIL";
  document.getElementById("results").textContent =
      results.join("\n") + "\n" + (ok ? "UI-OK" : "UI-FAIL");
});
</script>
"""


def build_page() -> str:
    widgets = {
        "button": Button("press me"),
        "label": Label("label0"),
        "textbox": Textbox("tb0"),
        "textarea": Textarea("ta0"),
        "range": Range(),
        "checkbox": Checkbox(),
        "menu": Menu(choices=["a", "b"], selection="a"),
        "datalist": Datalist(choices=["one"], value="one"),
        "div": Div("start"),
        "clickdiv": ClickDiv("<i>inner</i>"),
    }
    ids = {k: w._view_id for k, w in widgets.items()}
    body = "\n".join(w._repr_html_() for w in widgets.values())
    ids_js = "<script>var IDS = " + repr(ids).replace("'", '"') + ";</script>"
    return ("<!DOCTYPE html><html><head><meta charset='utf-8'>"
            "<title>labwidget harness</title></head><body>"
            + MOCK_COMM + ids_js + body
            + '<pre id="results">running...</pre>'
            + TEST_JS + "</body></html>")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "build/ui_harness.html"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        f.write(build_page())
    print(out)


if __name__ == "__main__":
    main()
