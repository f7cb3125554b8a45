"""Micro-batching HTTP inference server.

New capability beyond the reference (which only supports offline batch
auto-annotation): a production serving endpoint over a trained model
directory.  Requests are decoded on worker threads, coalesced into
fixed-shape batches (the same static canvas the model was trained with)
and run through the single jitted eval step — so concurrent clients share
MXU work instead of serialising one-image compiles.

    POST /detect           body: image bytes (jpeg/png/bmp/tiff)
                           query: ?threshold=0.5
    ->  {"detections": [{"box": [x1,y1,x2,y2], "score": s,
                         "label": "name", "polygon": [[x,y], ...]?}],
         "width": W, "height": H}
    GET  /healthz          -> {"status": "ok", "model": ..., "labels": [...]}

Run via ``python -m podtpu.cli serve --model-dir ... --port 8500``.
"""
from __future__ import annotations

import io
import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np
from PIL import Image

from podtpu.data.dataset import fit_resize
from podtpu.infer.inference import load_inference_model
from podtpu.data.imageio import pil_to_rgb
from podtpu.train.step import split_eval_output


class _Request:
    __slots__ = ("canvas", "scale", "size", "threshold", "event", "result",
                 "error")

    def __init__(self, canvas, scale, size, threshold):
        self.canvas = canvas
        self.scale = scale
        self.size = size
        self.threshold = threshold
        self.event = threading.Event()
        self.result = None
        self.error: Optional[str] = None


class DetectionServer:
    """Model runner + micro-batcher; the HTTP layer sits on top.

    ``exported=True`` (or a path) serves a pre-compiled StableHLO artifact
    (`podtpu.infer.export`) instead of tracing the live model: instant
    startup, pinned weights+program version.  The artifact's platform must
    match the serving backend, and its compiled batch size wins.
    """

    def __init__(self, model_dir: str, batch_size: int = 4,
                 batch_timeout_ms: float = 8.0, exported=False):
        self.model_dir = model_dir
        if exported:
            import os

            from podtpu.infer.export import EXPORT_NAME, ExportedModel
            path = (exported if isinstance(exported, str)
                    else os.path.join(model_dir, EXPORT_NAME))
            model = ExportedModel(path)
            if model.labels is not None:
                self.labels = model.labels
            else:
                from podtpu.train.checkpoints import read_labels
                self.labels = read_labels(
                    os.path.join(model_dir, "labels.txt"))
            self.image_size = model.image_size
            batch_size = model.batch_size  # compiled into the artifact
            self._forward = model
        else:
            (eval_step, params, frozen, cfg,
             self.labels) = load_inference_model(model_dir)
            self.image_size = cfg.image_size

            def forward(images):
                out = eval_step(params, frozen, images)
                det, out_masks, _ = split_eval_output(out)
                res = {"boxes": np.asarray(det.boxes),
                       "scores": np.asarray(det.scores),
                       "labels": np.asarray(det.labels),
                       "valid": np.asarray(det.valid)}
                if out_masks is not None:
                    res["masks"] = np.asarray(out_masks)
                return res

            self._forward = forward
        self.batch_size = batch_size
        self.batch_timeout = batch_timeout_ms / 1e3
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- client side ---------------------------------------------------------
    def detect(self, image_bytes: bytes, threshold: float = 0.5) -> dict:
        with Image.open(io.BytesIO(image_bytes)) as im:
            arr = pil_to_rgb(im)
        h, w = arr.shape[:2]
        resized, scale = fit_resize(arr, self.image_size)
        ch, cw = self.image_size
        canvas = np.zeros((ch, cw, 3), np.uint8)
        canvas[: resized.shape[0], : resized.shape[1]] = resized
        req = _Request(canvas, scale, (h, w), threshold)
        if self._stop.is_set():
            raise RuntimeError("server is shut down")
        self._q.put(req)
        # Poll with a stop check: a request that races close() (enqueued
        # after the drain) must not wait forever.
        while not req.event.wait(timeout=1.0):
            if self._stop.is_set() and not req.event.wait(timeout=5.0):
                raise RuntimeError("server is shut down")
        if req.error:
            raise RuntimeError(req.error)
        return req.result

    def close(self):
        self._stop.set()
        self._q.put(None)  # wake the worker
        self._worker.join(timeout=30.0)
        # Fail any request that raced the shutdown (enqueued after the
        # sentinel): leaving its event unset would block that caller's
        # ``detect()`` forever.
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            if req is not None:
                req.error = "server is shut down"
                req.event.set()

    # -- batching worker -----------------------------------------------------
    def _run(self):
        import time

        while not self._stop.is_set():
            first = self._q.get()
            if first is None:
                continue
            batch = [first]
            # Coalesce whatever arrives within ONE shared window (absolute
            # deadline — a per-get timeout would extend the first caller's
            # wait by batch_timeout per straggler), up to batch_size.
            t_end = time.monotonic() + self.batch_timeout
            while len(batch) < self.batch_size:
                remaining = t_end - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    break
                batch.append(nxt)
            try:
                self._process(batch)
            except Exception as exc:  # surface to all waiters
                for req in batch:
                    req.error = f"{type(exc).__name__}: {exc}"
                    req.event.set()

    def _process(self, batch: List[_Request]):
        bs = self.batch_size
        ch, cw = self.image_size
        images = np.zeros((bs, ch, cw, 3), np.uint8)
        for i, req in enumerate(batch):
            images[i] = req.canvas
        out = self._forward(images)
        masks = out.get("masks")
        boxes = out["boxes"]
        scores = out["scores"]
        labels = out["labels"]
        valid = out["valid"]
        for i, req in enumerate(batch):
            keep = np.flatnonzero(valid[i] & (scores[i] > req.threshold))
            dets = []
            for j in keep:
                box = boxes[i, j] / req.scale
                entry = {
                    "box": [float(v) for v in box],
                    "score": float(scores[i, j]),
                    "label": self.labels[int(labels[i, j]) - 1],
                }
                if masks is not None:
                    from podtpu.infer.inference import _mask_to_annotation
                    ann = _mask_to_annotation(masks[i, j], box,
                                              entry["label"], entry["score"])
                    if ann is not None:
                        entry["polygon"] = [[float(x), float(y)] for x, y
                                            in zip(ann.xs, ann.ys)]
                dets.append(entry)
            req.result = {"detections": dets, "width": req.size[1],
                          "height": req.size[0]}
            req.event.set()


def make_handler(server: DetectionServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                self._send(200, {"status": "ok",
                                 "model": server.model_dir,
                                 "labels": server.labels})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path != "/detect":
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                data = self.rfile.read(length)
                qs = parse_qs(parsed.query)
                thr = float(qs.get("threshold", ["0.5"])[0])
                self._send(200, server.detect(data, threshold=thr))
            except Exception as exc:
                self._send(400, {"error": f"{type(exc).__name__}: {exc}"})

    return Handler


def serve(model_dir: str, host: str = "0.0.0.0", port: int = 8500,
          batch_size: int = 4, exported=False) -> None:
    """Blocking entry point for the CLI."""
    runner = DetectionServer(model_dir, batch_size=batch_size,
                             exported=exported)
    httpd = ThreadingHTTPServer((host, port), make_handler(runner))
    print(f"podtpu serving {model_dir} on {host}:{port} "
          f"(batch {batch_size}, labels {runner.labels})")
    try:
        httpd.serve_forever()
    finally:
        runner.close()
