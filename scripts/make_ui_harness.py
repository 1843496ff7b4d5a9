"""Generate self-contained browser test pages for the labwidget JS runtime.

One page per comm transport (the runtime's connect() probes these in
order, mirroring the reference's WIDGET_ENV dispatch,
/root/reference/utils/labwidget.py:1010-1076):

- classic: mocks the classic-notebook global ``Jupyter.notebook.kernel.
  comm_manager``;
- colab:   mocks ``google.colab.kernel.comms`` (promise-based open, async
  message iterator);
- jlab:    mocks ``window.jupyterapp`` -> current session kernel
  ``createComm`` (the --expose-app-in-browser JupyterLab route).

Each page loads the real emitted widget JS, drives DOM events, and asserts
both directions of the protocol:

- view -> python: DOM events must send {name, value} comm messages;
- python -> view: injected kernel messages must update the DOM.

Results land in #results as PASS/FAIL lines and in document.title
("UI-OK" / "UI-FAIL") so any browser driver can assert completion.

Usage: python scripts/make_ui_harness.py [outdir]  (default build/);
writes ui_harness.html, ui_harness_colab.html, ui_harness_jlab.html.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from rewriting_tpu.ui import (Button, Checkbox, ClickDiv, Datalist, Div,
                              Label, Menu, Range, Textarea, Textbox)

MOCK_CLASSIC = r"""
<script>
// Mock of the classic Jupyter notebook comm layer: records view->kernel
// messages and lets the test inject kernel->view messages.
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

MOCK_COLAB = r"""
<script>
// Mock of google.colab.kernel.comms: open() resolves a comm whose
// .messages is a real async iterable (queue + pending-promise), matching
// the promise-based Colab comm API the runtime's colab branch uses.
window.sentMessages = [];
window.commsById = {};
window.google = { colab: { kernel: { comms: {
  open: function(target, data) {
    var queue = [], pending = null;
    var comm = {
      _id: data.id,
      send: function(msg) {
        window.sentMessages.push({id: this._id, name: msg.name,
                                  value: msg.value});
      },
      messages: {},
      _push: function(d) {
        if (pending) {
          var p = pending; pending = null;
          p({value: {data: d}, done: false});
        } else { queue.push(d); }
      },
    };
    comm.messages[Symbol.asyncIterator] = function() {
      return { next: function() {
        if (queue.length) {
          return Promise.resolve({value: {data: queue.shift()},
                                  done: false});
        }
        return new Promise(function(res) { pending = res; });
      }};
    };
    window.commsById[data.id] = comm;
    return Promise.resolve(comm);
  }
}}}};
window.kernelSend = function(id, name, value) {  // async delivery
  window.commsById[id]._push({name: name, value: value});
};
</script>
"""

MOCK_JLAB = r"""
<script>
// Mock of the JupyterLab route: window.jupyterapp (exposed by
// --expose-app-in-browser) -> current widget's session kernel, whose
// createComm returns an IComm with open/send/onMsg.
window.sentMessages = [];
window.commsById = {};
window.jupyterapp = { shell: { currentWidget: { sessionContext: {
  session: { kernel: {
    createComm: function(target) {
      var comm = {
        _id: null,
        onMsg: null,
        open: function(data) {
          this._id = data.id;
          window.commsById[data.id] = this;
        },
        send: function(msg) {
          window.sentMessages.push({id: this._id, name: msg.name,
                                    value: msg.value});
        },
      };
      return comm;
    }
}}}}}};
window.kernelSend = function(id, name, value) {
  var comm = window.commsById[id];
  comm.onMsg({content: {data: {name: name, value: value}}});
};
</script>
"""

MOCKS = {"classic": MOCK_CLASSIC, "colab": MOCK_COLAB, "jlab": MOCK_JLAB}

# The test body is transport-agnostic: every mock provides
# window.sentMessages + window.kernelSend.  Kernel->view delivery is
# asynchronous on the colab transport (async iterator), so each
# kernelSend is followed by a macrotask tick before asserting the DOM.
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
function tick() {
  return new Promise(function(r) { setTimeout(r, 0); });
}
window.addEventListener('load', async function() { try {
  // --- Button: click -> comm message
  var btn = document.getElementById(IDS.button);
  btn.click();
  check("button click sends trigger", sent(IDS.button, "click").length === 1);

  // --- Label: kernel -> view text update
  kernelSend(IDS.label, "value", "updated-label");
  await tick();
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
  await tick();
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
  await tick();
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
  await tick();
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
  await tick();
  check("div innerHTML updates",
        document.getElementById(IDS.div).innerHTML === "<b>bold</b>");

  // --- ClickDiv: data-click payload
  kernelSend(IDS.clickdiv, "innerHTML",
             '<span data-click="unit7">seven</span>');
  await tick();
  document.getElementById(IDS.clickdiv).querySelector("span").click();
  m = sent(IDS.clickdiv, "click");
  check("clickdiv sends data-click payload",
        m.length === 1 && m[0].value === "unit7");

  // --- write trigger renders above the widget
  kernelSend(IDS.button, "write", "<pre>captured output</pre>");
  await tick();
  var prev = document.getElementById(IDS.button).previousSibling;
  check("write renders above widget",
        prev && prev.innerHTML === "<pre>captured output</pre>");

  // --- pending queue: view events fired before the comm opens (Colab's
  // promise-based open resolves asynchronously) queue and flush on
  // attach, never dropped.
  var mdl = window._labwidget_models[IDS.button];
  var saved = mdl.comm;
  mdl.comm = null;
  btn.click();
  check("pre-open click queued not dropped",
        mdl.pending.length === 1 &&
        sent(IDS.button, "click").length === 1);
  mdl.attach(saved);
  check("queued click flushed on attach",
        sent(IDS.button, "click").length === 2 &&
        mdl.pending.length === 0);
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


def build_page(transport: str = "classic") -> str:
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
            f"<title>labwidget harness ({transport})</title></head><body>"
            + MOCKS[transport] + ids_js + body
            + '<pre id="results">running...</pre>'
            + TEST_JS + "</body></html>")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "build"
    os.makedirs(outdir, exist_ok=True)
    for transport, fname in (("classic", "ui_harness.html"),
                             ("colab", "ui_harness_colab.html"),
                             ("jlab", "ui_harness_jlab.html")):
        path = os.path.join(outdir, fname)
        with open(path, "w") as f:
            f.write(build_page(transport))
        print(path)


if __name__ == "__main__":
    main()
