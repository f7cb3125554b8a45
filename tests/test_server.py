"""Micro-batching HTTP inference server tests (new serving capability)."""
import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def served(trained_model):
    from podtpu.infer.server import DetectionServer, make_handler

    runner = DetectionServer(trained_model, batch_size=2, batch_timeout_ms=5)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(runner))
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield runner, port
    httpd.shutdown()
    runner.close()


def synth_image_bytes(seed=0, size=160):
    rng = np.random.default_rng(seed)
    img = rng.integers(10, 40, (size, size, 3)).astype(np.uint8)
    img[40:90, 50:110] = (230, 230, 240)  # a bright particle
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=92)
    return buf.getvalue()


class TestDetectionServer:
    def test_healthz(self, served):
        _, port = served
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as resp:
            payload = json.loads(resp.read())
        assert payload["status"] == "ok"
        assert payload["labels"] == ["particle"]

    def test_detect_endpoint(self, served):
        _, port = served
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect?threshold=0.05",
            data=synth_image_bytes(), method="POST")
        with urllib.request.urlopen(req, timeout=300) as resp:
            payload = json.loads(resp.read())
        assert payload["width"] == 160 and payload["height"] == 160
        for det in payload["detections"]:
            x1, y1, x2, y2 = det["box"]
            assert 0 <= x1 <= x2 <= 160
            assert 0 <= y1 <= y2 <= 160
            assert det["label"] == "particle"
            assert 0 <= det["score"] <= 1

    def test_concurrent_requests_batch(self, served):
        """Several clients in flight at once all get answers (coalesced
        into micro-batches)."""
        runner, port = served
        results = [None] * 4

        def call(i):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/detect",
                data=synth_image_bytes(seed=i), method="POST")
            with urllib.request.urlopen(req, timeout=300) as resp:
                results[i] = json.loads(resp.read())

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert all(r is not None and "detections" in r for r in results)

    def test_bad_payload_is_400(self, served):
        _, port = served
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect", data=b"not an image",
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req, timeout=60)
        assert err.value.code == 400


class TestServerShutdown:
    def test_close_is_prompt_and_detect_after_close_raises(
            self, trained_model):
        """close() must not abandon callers: a request racing shutdown
        gets an error instead of blocking forever, and detect() after
        close raises immediately."""
        from podtpu.infer.server import DetectionServer, _Request

        runner = DetectionServer(trained_model, batch_size=2,
                                 batch_timeout_ms=5)
        # Enqueue a request directly AFTER the stop sentinel, simulating
        # the race where a client slips in during shutdown.
        runner._stop.set()
        ghost = _Request(np.zeros((1, 1, 3), np.uint8), 1.0, (1, 1), 0.5)
        runner._q.put(None)
        runner._q.put(ghost)
        runner.close()
        assert ghost.event.is_set()
        assert ghost.error == "server is shut down"
        with pytest.raises(RuntimeError, match="shut down"):
            runner.detect(synth_image_bytes())



class TestExportedServing:
    def test_serves_aot_artifact(self, trained_model, tmp_path):
        """The server runs a pre-compiled StableHLO artifact end-to-end
        and must agree with the live model on the same request."""
        from podtpu.infer.export import export_model
        from podtpu.infer.server import DetectionServer, make_handler

        path = export_model(trained_model, batch_size=2, platforms=("cpu",),
                            out_path=str(tmp_path / "m.stablehlo"))
        runner = DetectionServer(trained_model, exported=path,
                                 batch_timeout_ms=5)
        assert runner.batch_size == 2  # the artifact's compiled batch wins
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(runner))
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/detect?threshold=0.05",
                data=synth_image_bytes(), method="POST")
            with urllib.request.urlopen(req, timeout=300) as resp:
                payload = json.loads(resp.read())
            live = DetectionServer(trained_model, batch_size=2,
                                   batch_timeout_ms=5)
            try:
                live_payload = live.detect(synth_image_bytes(),
                                           threshold=0.05)
            finally:
                live.close()
            assert payload["width"] == 160
            assert len(payload["detections"]) == \
                len(live_payload["detections"])
            for a, b in zip(payload["detections"],
                            live_payload["detections"]):
                assert a["label"] == b["label"]
                assert a["score"] == pytest.approx(b["score"], abs=1e-4)
                assert np.allclose(a["box"], b["box"], atol=0.1)
        finally:
            httpd.shutdown()
            runner.close()
