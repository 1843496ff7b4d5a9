"""Editing server: drive the HTTP API end-to-end over a real socket."""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from conftest import blob
from rewriting_tpu.models import ProgressiveGenerator
from rewriting_tpu.rewrite import ProgressiveGanRewriter
from rewriting_tpu.serve import serve
from rewriting_tpu.utils.renormalize import mask_to_url
from rewriting_tpu.utils.zdataset import z_dataset_for_model


@pytest.fixture(scope="module")
def server():
    model = ProgressiveGenerator(sizes=[16, 16, 8, 8])
    params = model.init_params(jax.random.PRNGKey(3))
    zds = z_dataset_for_model(model, 20)
    gw = ProgressiveGanRewriter(model, params, zds, layernum=3,
                                stats_batch_size=10)
    httpd = serve(gw, port=0)  # ephemeral port
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", gw
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, r.read(), r.headers.get("Content-Type")


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.status, json.loads(r.read())


def test_server_flow(server):
    base, gw = server
    code, body, _ = _get(base + "/status")
    status = json.loads(body)
    assert code == 200 and status["edits_applied"] == 0
    assert status["window"][0] == "layer3.conv"

    # preview before the edit
    code, png0, ctype = _get(base + "/preview?imgnum=3")
    assert code == 200 and ctype == "image/png"
    assert png0[:8] == b"\x89PNG\r\n\x1a\n"

    vh, vw = gw.v_shape[1:3]
    request = {"object": [0, mask_to_url(blob(vh, vw, 2, 2, 2))],
               "paste": [3, mask_to_url(blob(vh, vw, 5, 5, 2))]}
    code, out = _post(base + "/edit",
                      {"request": request, "rank": 1, "niter": 21})
    assert code == 200 and out["ok"] and out["edits_applied"] == 1

    code, png1, _ = _get(base + "/preview?imgnum=3")
    assert png1 != png0  # the edit changed the render

    # batched solve endpoint (doesn't commit)
    code, out = _post(base + "/edit_batch",
                      {"requests": [request, request], "niter": 5})
    assert code == 200 and out["n"] == 2
    assert all(np.isfinite(v) for v in out["final_losses"])
    code, bpng, _ = _get(base + "/preview?imgnum=3&batch_index=0")
    assert bpng[:8] == b"\x89PNG\r\n\x1a\n"

    code, out = _post(base + "/revert", {})
    assert out["ok"]
    code, png2, _ = _get(base + "/preview?imgnum=3")
    assert png2 == png0  # pristine again

    # fast-method edit path
    code, out = _post(base + "/edit",
                      {"request": request, "niter": 11, "method": "fast"})
    assert out["ok"]
    _post(base + "/revert", {})


def test_server_errors(server):
    base, gw = server
    try:
        _get(base + "/nope")
        assert False, "should 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404
    req = urllib.request.Request(
        base + "/edit", data=b"{}",
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "should have errored"
    except urllib.error.HTTPError as e:
        assert e.code == 500
        assert "error" in json.loads(e.read())