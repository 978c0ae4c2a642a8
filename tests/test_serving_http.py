"""HTTP serving front end: API contract, micro-batching, metrics.

The reference has no serving; serving_http.py adds a stdlib HTTP API with
request micro-batching over serving.SamplerService's precompiled
executables. These tests run a real ThreadingHTTPServer on an ephemeral
port against a tiny CPU model.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from rectified_flow_vision_tpu.models import BaseFlowModel
from rectified_flow_vision_tpu.serving import SamplerService
from rectified_flow_vision_tpu.serving_http import Batcher, make_server


def _tiny_service(step_counts=(1,), batch_size=4):
    model = BaseFlowModel(
        image_size=8, model_channels=16, channel_mult=[1], num_res_blocks=1,
        sample_dtype="float32", seed=0,
    )
    return SamplerService(
        model, step_counts=step_counts, batch_size=batch_size, warmup=True
    )


@pytest.fixture(scope="module")
def server():
    svc = _tiny_service(step_counts=(1, 2))
    httpd, batcher = make_server(svc, "127.0.0.1", 0, max_wait_ms=2.0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base
    httpd.shutdown()
    batcher.shutdown()
    httpd.server_close()


def _post(base, payload, timeout=120):
    req = urllib.request.Request(
        base + "/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    return urllib.request.urlopen(req, timeout=timeout)


class TestHTTPAPI:
    def test_healthz(self, server):
        with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
            body = json.loads(r.read())
        assert body["status"] == "ok"
        assert body["step_counts"] == [1, 2]
        assert body["image_size"] == 8

    def test_generate_npy(self, server):
        with _post(server, {"n": 3, "num_steps": 1}) as r:
            assert r.headers["Content-Type"] == "application/octet-stream"
            import io

            arr = np.load(io.BytesIO(r.read()))
        assert arr.shape == (3, 3, 8, 8)
        assert np.isfinite(arr).all()

    def test_generate_png(self, server):
        pytest.importorskip("PIL")
        with _post(server, {"n": 2, "num_steps": 1, "format": "png"}) as r:
            body = json.loads(r.read())
        assert len(body["images_png_b64"]) == 2
        import base64
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(base64.b64decode(body["images_png_b64"][0])))
        assert img.size == (8, 8)

    def test_bad_steps_is_400(self, server):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server, {"n": 1, "num_steps": 7})
        assert ei.value.code == 400

    def test_unknown_path_404(self, server):
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(server + "/nope", timeout=30)
        assert ei.value.code == 404

    def test_metrics_endpoint(self, server):
        _post(server, {"n": 1, "num_steps": 1}).read()
        with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
            text = r.read().decode()
        assert "rfv_requests_total" in text
        assert "rfv_images_total" in text


class TestBatcher:
    def test_concurrent_requests_coalesce(self):
        """Simultaneous requests for the same num_steps share executable
        calls: fewer batches than requests, every caller gets its slice."""
        svc = _tiny_service(step_counts=(1,), batch_size=8)
        batcher = Batcher(svc, max_wait_ms=30.0)
        results = {}
        errs = []

        def worker(i):
            try:
                results[i] = batcher.submit(2, 1)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        batcher.shutdown()
        assert not errs
        assert len(results) == 4
        for arr in results.values():
            assert arr.shape == (2, 3, 8, 8)
        # PRNG stream: different requests got different images
        flat = [arr.tobytes() for arr in results.values()]
        assert len(set(flat)) == len(flat)
        assert batcher.stats["requests"] == 4
        assert batcher.stats["images"] == 8
        assert batcher.stats["batches"] <= 3  # coalesced (not 4)

    def test_unconfigured_steps_raise(self):
        svc = _tiny_service(step_counts=(1,))
        batcher = Batcher(svc)
        with pytest.raises(ValueError):
            batcher.submit(1, 99)
        batcher.shutdown()
