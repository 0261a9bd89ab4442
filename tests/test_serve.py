"""Generation server tests over a tiny in-memory pipeline (offline, CPU)."""

import base64
import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from diffusionkit_tpu.serve import GenerationServer

from test_pipeline import build_sd3_pipeline


@pytest.fixture(scope="module")
def server_url():
    pipe = build_sd3_pipeline()
    srv = GenerationServer(pipe, default_steps=2, default_cfg=5.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv.handler_class())
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req, timeout=300)


def test_healthz(server_url):
    with urllib.request.urlopen(server_url + "/healthz", timeout=60) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert "backend" in body


def test_generate_png(server_url):
    from PIL import Image

    with _post(server_url, {"prompt": "a cat", "seed": 1, "height": 64, "width": 64}) as r:
        assert r.headers["Content-Type"] == "image/png"
        img = Image.open(io.BytesIO(r.read()))
    assert img.size == (64, 64)


def test_generate_batch_json(server_url):
    from PIL import Image

    with _post(
        server_url,
        {"prompt": "a cat", "seed": 1, "height": 64, "width": 64, "num_images": 2},
    ) as r:
        body = json.loads(r.read())
    assert len(body["images"]) == 2
    img = Image.open(io.BytesIO(base64.b64decode(body["images"][0])))
    assert img.size == (64, 64)
    assert body["timings"]["denoising"] is not None


def test_errors(server_url):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server_url, {})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server_url, {"prompt": "x", "height": 65})
    assert e.value.code == 400
