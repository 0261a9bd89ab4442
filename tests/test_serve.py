"""Generation server tests over a tiny in-memory pipeline (offline, CPU)."""

import base64
import io
import json
import threading
import time
import urllib.error
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


def test_concurrent_requests_batched(server_url):
    """Concurrent same-bucket requests merge into one batched denoise and
    each caller gets its own (seed-distinct) image."""
    from PIL import Image

    results = {}

    def fetch(seed):
        with _post(server_url, {"prompt": "a cat", "seed": seed,
                                "height": 64, "width": 64}) as r:
            results[seed] = np.asarray(Image.open(io.BytesIO(r.read())))

    threads = [threading.Thread(target=fetch, args=(s,)) for s in (1, 2, 3, 4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert set(results) == {1, 2, 3, 4}
    assert not np.array_equal(results[1], results[2])
    # seed 1 via the batch == seed 1 single-request (same noise convention)
    with _post(server_url, {"prompt": "a cat", "seed": 1,
                            "height": 64, "width": 64}) as r:
        single = np.asarray(Image.open(io.BytesIO(r.read())))
    np.testing.assert_allclose(
        results[1].astype(int), single.astype(int), atol=2
    )


def test_warmup_endpoint(server_url):
    req = urllib.request.Request(
        server_url + "/warmup",
        data=json.dumps({"batch": 2, "height": 64, "width": 64, "steps": 2}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        body = json.loads(r.read())
    assert body["compiled_buckets"] == [1, 2]


def test_errors(server_url):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server_url, {})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server_url, {"prompt": "x", "height": 65})
    assert e.value.code == 400


def test_malformed_numeric_field_returns_400_and_server_survives(server_url):
    """A request with a non-numeric steps field must 400 on the handler
    thread (round-2 review: it previously raised inside the batching worker,
    killing it and hanging every later client)."""
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server_url, {"prompt": "a cat", "steps": "abc",
                           "height": 64, "width": 64})
    assert e.value.code == 400
    # The worker is still alive: a well-formed request completes.
    with _post(server_url, {"prompt": "a cat", "seed": 2,
                            "height": 64, "width": 64}) as r:
        assert r.status == 200


def test_non_string_prompt_rejected(server_url):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server_url, {"prompt": {"bad": 1}, "height": 64, "width": 64})
    assert e.value.code == 400


# -- round-3 production guards (stub pipeline: no model, controllable delay) --


class _StubPipeline:
    def __init__(self, delay_s=0.0):
        self.delay_s = delay_s
        self.calls = 0

    def generate_images_batched(self, prompts, **kw):
        import time as _t

        from PIL import Image

        self.calls += 1
        _t.sleep(self.delay_s)
        return [Image.new("RGB", (8, 8)) for _ in prompts]

    def generate_image(self, prompt, **kw):
        from PIL import Image

        return Image.new("RGB", (8, 8)), {}


def _serve(srv):
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv.handler_class())
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, f"http://127.0.0.1:{httpd.server_address[1]}"


def test_request_timeout_504():
    srv = GenerationServer(
        _StubPipeline(delay_s=2.0), max_batch=1, request_timeout_s=0.2,
    )
    httpd, url = _serve(srv)
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url, {"prompt": "slow"})
        assert e.value.code == 504
        assert srv.metrics()["timeouts"] == 1
    finally:
        httpd.shutdown()


def test_overload_503_and_retry_after():
    srv = GenerationServer(
        _StubPipeline(delay_s=1.0), max_batch=1, max_queue=1,
        batch_window_s=0.0,
    )
    httpd, url = _serve(srv)
    try:
        results = []

        def fire():
            try:
                with _post(url, {"prompt": "x"}) as r:
                    results.append(r.status)
            except urllib.error.HTTPError as e:
                results.append(e.code)

        # First request occupies the worker; the next fills the queue; the
        # burst beyond that must shed with 503.
        threads = [threading.Thread(target=fire) for _ in range(6)]
        for t in threads:
            t.start()
            time.sleep(0.05)
        for t in threads:
            t.join(timeout=30)
        assert 503 in results, results
        assert 200 in results, results
        assert srv.metrics()["rejected"] >= 1
    finally:
        httpd.shutdown()


def test_metrics_endpoint():
    srv = GenerationServer(_StubPipeline(), max_batch=2, batch_window_s=0.0)
    httpd, url = _serve(srv)
    try:
        with _post(url, {"prompt": "a"}) as r:
            assert r.status == 200
        with urllib.request.urlopen(url + "/metrics", timeout=10) as r:
            m = json.loads(r.read())
        assert m["served"] == 1 and m["batches"] == 1
        assert m["latency_p50_s"] is not None and m["latency_p50_s"] >= 0
        assert m["queue_depth"] == 0 and m["draining"] is False
        assert 0 < m["batch_occupancy"] <= 1
    finally:
        httpd.shutdown()


def test_graceful_drain():
    pipe = _StubPipeline(delay_s=0.3)
    srv = GenerationServer(pipe, max_batch=1, batch_window_s=0.0)
    httpd, url = _serve(srv)
    try:
        codes = []

        def fire():
            try:
                with _post(url, {"prompt": "x"}) as r:
                    codes.append(r.status)
            except urllib.error.HTTPError as e:
                codes.append(e.code)

        t1 = threading.Thread(target=fire)
        t1.start()
        time.sleep(0.1)  # in flight
        status = srv.drain(deadline_s=10.0)
        assert status["drained"] is True
        t1.join(timeout=10)
        assert codes == [200]  # in-flight request completed during drain
        # New work is shed while draining.
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url, {"prompt": "late"})
        assert e.value.code == 503
    finally:
        httpd.shutdown()


def test_mixed_buckets_full_queue_no_deadlock():
    """Different-bucket jobs the worker pops are held locally, never
    re-enqueued: a blocking put back onto the BOUNDED queue could deadlock
    the worker when handler threads refill the freed slots (the worker is
    the queue's only consumer). All jobs must complete."""
    srv = GenerationServer(
        _StubPipeline(delay_s=0.05), max_batch=4, max_queue=4,
        batch_window_s=0.2, request_timeout_s=30.0,
    )
    httpd, url = _serve(srv)
    try:
        results = []

        def fire(size):
            for attempt in range(20):  # 503 = shed, retry
                try:
                    with _post(url, {"prompt": "x", "height": size,
                                     "width": size}) as r:
                        results.append(r.status)
                        return
                except urllib.error.HTTPError as e:
                    if e.code != 503:
                        results.append(e.code)
                        return
                    time.sleep(0.1)
            results.append("gave-up")

        # Alternating shape buckets at 2x queue capacity: every round pops
        # a mix, defers the other bucket, and handler threads keep the
        # queue full underneath.
        threads = [
            threading.Thread(target=fire, args=(64 if i % 2 else 128,))
            for i in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not any(t.is_alive() for t in threads), "worker deadlocked"
        assert results.count(200) == 8, results
        assert srv.metrics()["queue_depth"] == 0
    finally:
        httpd.shutdown()
