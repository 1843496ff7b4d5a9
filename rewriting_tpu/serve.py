"""Editing server: HTTP API over the rewriting engine.

The production-serving face of the framework (the batched multi-rule
editing configuration): a long-running process holds the generator and a
rewriter, accepts edit-request JSONs over HTTP, solves them (singly or
batched across the device mesh), and serves live previews as PNGs.

Endpoints (JSON unless noted):
  GET  /status                 -> model/layer/edit info
  POST /edit                   -> {"request": <edit json>, "rank": 1,
                                   "niter": 2001} ; solves + commits
  POST /edit_batch             -> {"requests": [<edit json>, ...]} ; solves
                                   all at once (vmapped), returns per-edit
                                   losses; commits nothing
  POST /revert                 -> restore pristine weights
  GET  /preview?imgnum=3       -> PNG of the current model's image #3
  POST /save?path=...          -> persist current params npz

Run: python -m rewriting_tpu.serve --dataset church --layer 8
(needs checkpoints; --toy serves a tiny random ProgGAN for smoke tests).
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class EditingService:
    """Thread-safe wrapper around a rewriter for serving."""

    def __init__(self, gw):
        self.gw = gw
        self.lock = threading.Lock()
        self.edits_applied = 0

    def status(self):
        return {"model": type(self.gw.model).__name__,
                "window": [self.gw.firstlayer, self.gw.lastlayer],
                "edits_applied": self.edits_applied,
                "k_shape": list(self.gw.k_shape),
                "zds_size": len(self.gw.zds)}

    def edit(self, request, rank=1, niter=2001, piter=10, lr=0.05,
             method="insert"):
        with self.lock:
            if method == "fast":
                o_imgnum, o_mask = request["object"]
                keys = request.get("key", [request["paste"]])
                obj_acts, _, obj_area, _ = self.gw.object_from_selection(
                    o_imgnum, o_mask)
                goal_in, goal_out, _, _ = self.gw.paste_from_selection(
                    request["paste"][0], request["paste"][1], obj_acts,
                    obj_area)
                d = self.gw.multi_key_from_selection(keys, rank=rank)
                self.gw.fast_linear_insert(goal_in, goal_out, d,
                                           niter=niter, lr=lr)
            elif method == "erase":
                self.gw.apply_erase(request, rank=rank, niter=niter,
                                    piter=piter, lr=lr)
            else:
                self.gw.apply_edit(request, rank=rank, niter=niter,
                                   piter=piter, lr=lr)
            self.edits_applied += 1
        return {"ok": True, "edits_applied": self.edits_applied}

    def edit_batch(self, requests, rank=1, niter=2001, lr=0.05):
        from .rewrite.multi import batch_apply_edits
        with self.lock:
            weights, losses = batch_apply_edits(
                self.gw, requests, rank=rank, niter=niter, lr=lr,
                mesh=getattr(self.gw, "mesh", None))
            self._batch_weights = weights
        return {"ok": True, "n": len(weights),
                "final_losses": [float(v) for v in losses]}

    def commit_batch_edit(self, index: int):
        with self.lock:
            self.gw.set_target_weight(self._batch_weights[index])
            self.edits_applied += 1
        return {"ok": True}

    def revert(self):
        with self.lock:
            self.gw.revert()
            self.edits_applied = 0
        return {"ok": True}

    def preview_png(self, imgnum: int, batch_index: int = None) -> bytes:
        import io
        with self.lock:
            if batch_index is not None:
                from .rewrite.multi import preview_edits
                img = preview_edits(
                    self.gw, [self._batch_weights[batch_index]],
                    self.gw.zds.zs[imgnum:imgnum + 1])[0, 0]
                from .utils import renormalize
                pil = renormalize.as_image(np.clip(img, -1, 1))
            else:
                pil = self.gw.render_image(imgnum)
        buf = io.BytesIO()
        pil.save(buf, format="png")
        return buf.getvalue()

    def save(self, path: str):
        from .utils.paramio import save_params
        with self.lock:
            save_params(path, self.gw.params)
        return {"ok": True, "path": path}


def make_handler(service: EditingService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self):
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def do_GET(self):
            url = urllib.parse.urlparse(self.path)
            q = dict(urllib.parse.parse_qsl(url.query))
            try:
                if url.path == "/status":
                    self._json(service.status())
                elif url.path == "/preview":
                    data = service.preview_png(
                        int(q.get("imgnum", 0)),
                        int(q["batch_index"]) if "batch_index" in q
                        else None)
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                else:
                    self._json({"error": "not found"}, 404)
            except Exception as e:  # noqa: BLE001 - serve errors as JSON
                self._json({"error": str(e)}, 500)

        def do_POST(self):
            url = urllib.parse.urlparse(self.path)
            q = dict(urllib.parse.parse_qsl(url.query))
            try:
                body = self._body()
                if url.path == "/edit":
                    self._json(service.edit(
                        body["request"], rank=body.get("rank", 1),
                        niter=body.get("niter", 2001),
                        piter=body.get("piter", 10),
                        lr=body.get("lr", 0.05),
                        method=body.get("method", "insert")))
                elif url.path == "/edit_batch":
                    self._json(service.edit_batch(
                        body["requests"], rank=body.get("rank", 1),
                        niter=body.get("niter", 2001),
                        lr=body.get("lr", 0.05)))
                elif url.path == "/commit_batch_edit":
                    self._json(service.commit_batch_edit(
                        int(body["index"])))
                elif url.path == "/revert":
                    self._json(service.revert())
                elif url.path == "/save":
                    self._json(service.save(q.get("path",
                                                  "edited_params.npz")))
                else:
                    self._json({"error": "not found"}, 404)
            except Exception as e:  # noqa: BLE001
                self._json({"error": str(e)}, 500)

    return Handler


def serve(gw, host: str = "127.0.0.1", port: int = 8765):
    """Start the editing server (blocking). Returns the server object if
    you start it in a thread (see tests)."""
    service = EditingService(gw)
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    httpd.service = service
    return httpd


def main():  # pragma: no cover - CLI
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="church")
    ap.add_argument("--layer", type=int, default=8)
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--toy", action="store_true",
                    help="serve a tiny random ProgGAN (no checkpoints)")
    args = ap.parse_args()
    import jax
    from .utils.zdataset import z_dataset_for_model
    if args.toy:
        from .models import ProgressiveGenerator
        from .rewrite import ProgressiveGanRewriter
        model = ProgressiveGenerator(sizes=[32, 32, 16, 16])
        params = model.init_params(jax.random.PRNGKey(0))
        zds = z_dataset_for_model(model, 100)
        gw = ProgressiveGanRewriter(model, params, zds, layernum=3)
    else:
        from .models.zoo import load_seq_stylegan
        from .rewrite import SeqStyleGanRewriter
        model, params = load_seq_stylegan(args.dataset, truncation=0.5)
        zds = z_dataset_for_model(model, 1000)
        gw = SeqStyleGanRewriter(model, params, zds, args.layer)
    httpd = serve(gw, port=args.port)
    print(f"editing server on :{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":  # pragma: no cover
    main()
