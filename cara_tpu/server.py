"""HTTP inference server with dynamic micro-batching.

The reference has no serving surface at all (its only inference entry is
the ``--evaluate`` flag on the training CLI,
``image_classification/vit_cp.py:109-114,168-173``).  This module is the
online half of the deployment story the TPU build adds on top of
:class:`cara_tpu.serving.Predictor` (the offline half): a daemon that
keeps merged weights device-resident and coalesces concurrent requests
into padded fixed-shape batches, so the one jitted executable serves
every request shape.

Design notes (TPU-first):

* **One consumer thread owns the device.**  HTTP handler threads only
  decode, enqueue and wait on a future; a single batcher thread runs the
  jitted forward.  This keeps JAX dispatch single-threaded (no cross-
  thread tracing) and makes the batch the unit of device work.
* **Fixed shapes.**  The batcher stacks up to ``max_batch`` requests and
  hands them to ``Predictor.logits``, which pads to the compiled batch
  size — no shape-polymorphic recompiles, ever.
* **Latency/throughput knob.**  ``max_wait_ms`` bounds how long the first
  request in a batch waits for co-riders; 0 serves singles immediately.

Run: ``python -m cara_tpu.cli.serve --ckpt vit_cifar_*.npz --port 8000``

    curl -s -X POST --data-binary @cat.jpg localhost:8000/predict
    -> {"class": 3, "classes": [3, 7], "scores": [...], "batched_with": 5}
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

from cara_tpu.data.vtab import normalize


def decode_image_bytes(data: bytes, image_size: int) -> np.ndarray:
    """JPEG/PNG bytes -> normalized float32 (H, W, 3), the eval transform
    of the data pipeline (bicubic resize + ImageNet normalize,
    ``image_classification/vtab.py:79-82``)."""
    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        im = im.convert("RGB").resize((image_size, image_size), Image.BICUBIC)
        return normalize(np.asarray(im, np.uint8).astype(np.float32) / 255.0)


class _Request:
    __slots__ = ("image", "future", "t_enqueue", "batched_with")

    def __init__(self, image: np.ndarray):
        self.image = image
        self.future: Future = Future()
        self.t_enqueue = time.perf_counter()
        self.batched_with = 0


class MicroBatcher:
    """Coalesce concurrent single-image requests into device batches.

    Two-stage pipeline: a collector thread drains the queue (the first
    request opens a batch, then up to ``max_batch - 1`` more are awaited
    for at most ``max_wait_ms``) and DISPATCHES the stacked batch; a
    resolver thread fetches device results and resolves each row's
    future.  With ``dispatch_fn`` (``predictor.logits_async`` — returns a
    zero-arg fetch) batch N's H2D+compute overlaps batch N-1's
    D2H+resolve, since JAX execution is async until the result is read;
    with only a sync ``logits_fn`` the compute simply runs in the
    resolver stage (old serial behavior).  ``pipeline_depth`` bounds the
    number of dispatched-but-unresolved batches (device memory in
    flight).

    ``max_wait_ms`` is ADAPTIVE by default (``max_wait_cap_ms`` > wait):
    each co-rider arrival rolls the collection deadline forward by another
    ``max_wait_ms`` (up to the hard ``max_wait_cap_ms`` bound), so a steady
    request stream whose inter-arrival time is below ``max_wait_ms`` keeps
    the batch open and fills toward a bucket boundary, while an isolated
    request still dispatches after the base wait.  This raises batch
    occupancy exactly in the regime the fixed deadline misses — moderate
    load where arrivals trickle in but the queue never backs up — at a
    worst-case latency cost bounded by the cap.  ``max_wait_cap_ms=None``
    defaults to ``4 * max_wait_ms``; pass ``max_wait_cap_ms == max_wait_ms``
    for the old fixed-deadline behavior.
    """

    def __init__(self, logits_fn, max_batch: int, max_wait_ms: float = 2.0,
                 dispatch_fn=None, pipeline_depth: int = 2,
                 max_wait_cap_ms: Optional[float] = None):
        self._logits_fn = logits_fn
        self._dispatch_fn = dispatch_fn
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        if max_wait_cap_ms is None:
            max_wait_cap_ms = 4.0 * max_wait_ms
        self.max_wait_cap = max(max_wait_cap_ms / 1e3, self.max_wait)
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._fetch_q: "queue.Queue" = queue.Queue(
            maxsize=max(1, pipeline_depth - 1))
        self._lock = threading.Lock()
        self.stats = {"requests": 0, "batches": 0, "rows": 0,
                      "latency_ms_sum": 0.0, "latency_ms_max": 0.0}
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._resolver = threading.Thread(target=self._resolve, daemon=True)
        self._thread.start()
        self._resolver.start()

    def submit(self, image: np.ndarray) -> Future:
        req = _Request(image)
        self._q.put(req)
        return req.future

    def close(self):
        self._q.put(None)
        self._thread.join(timeout=5)
        self._resolver.join(timeout=5)

    def _collect(self) -> Optional[List[_Request]]:
        head = self._q.get()
        if head is None:
            return None
        batch = [head]
        now = time.perf_counter()
        deadline = now + self.max_wait
        hard_deadline = now + self.max_wait_cap
        while len(batch) < self.max_batch:
            remaining = min(deadline, hard_deadline) - time.perf_counter()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-post shutdown for the outer loop
                break
            batch.append(nxt)
            # Adaptive deadline: a co-rider arrival buys the batch another
            # base-wait window (bounded by hard_deadline above).
            deadline = time.perf_counter() + self.max_wait
        return batch

    def _run(self):
        """Collector stage: form a batch, dispatch it, hand off to the
        resolver.  Blocks on the bounded fetch queue for backpressure."""
        while True:
            batch = self._collect()
            if batch is None:
                self._fetch_q.put(None)
                return
            imgs = np.stack([r.image for r in batch])
            try:
                if self._dispatch_fn is not None:
                    fetch = self._dispatch_fn(imgs)
                else:
                    fetch = (lambda fn=self._logits_fn, x=imgs: fn(x))
            except Exception as exc:  # resolve waiters, keep serving
                for r in batch:
                    r.future.set_exception(exc)
                continue
            self._fetch_q.put((batch, fetch))

    def _resolve(self):
        """Resolver stage: block on the device result, resolve futures."""
        while True:
            item = self._fetch_q.get()
            if item is None:
                return
            batch, fetch = item
            try:
                logits = fetch()
            except Exception as exc:
                for r in batch:
                    r.future.set_exception(exc)
                continue
            now = time.perf_counter()
            with self._lock:
                self.stats["batches"] += 1
                self.stats["requests"] += len(batch)
                self.stats["rows"] += len(batch)
            for r, row in zip(batch, logits):
                r.batched_with = len(batch)
                lat = (now - r.t_enqueue) * 1e3
                with self._lock:
                    self.stats["latency_ms_sum"] += lat
                    self.stats["latency_ms_max"] = max(
                        self.stats["latency_ms_max"], lat)
                r.future.set_result((row, r))

    def snapshot(self) -> dict:
        with self._lock:
            s = dict(self.stats)
        n = max(1, s["requests"])
        s["mean_batch_occupancy"] = s["rows"] / max(1, s["batches"])
        s["mean_latency_ms"] = round(s.pop("latency_ms_sum") / n, 3)
        s["max_latency_ms"] = round(s.pop("latency_ms_max"), 3)
        return s


class InferenceServer:
    """ThreadingHTTPServer wrapping a Predictor + MicroBatcher.

    Endpoints:
      ``POST /predict``  image bytes -> ``{"class", "classes", "scores",
                         "batched_with", "latency_ms"}``; with a
                         :class:`~cara_tpu.serving.MultiTaskPredictor`,
                         ``POST /predict?task=<name>`` routes to that
                         task's adapter (batches coalesce per task — one
                         shared backbone, one executable for all tasks)
      ``GET /healthz``   liveness + model info (+ served task names)
      ``GET /stats``     batcher counters (occupancy, latency), per task
    """

    def __init__(self, predictor, *, host: str = "127.0.0.1",
                 port: int = 0, max_wait_ms: float = 2.0, top: int = 5,
                 request_timeout_s: float = 120.0,
                 max_wait_cap_ms: Optional[float] = None):
        self._pred = predictor
        self._top = top
        self._timeout = request_timeout_s
        tasks = list(getattr(predictor, "names", []) or [None])
        # ExportedPredictor carries image_size/max_batch directly (no model
        # config exists for a deserialized artifact); Predictor carries cfg.
        max_batch = (getattr(predictor, "max_batch", None)
                     or predictor.batch_size)
        if max_batch is None:
            raise ValueError(
                "predictor has no batch bound (symbolic-batch artifact "
                "with exact-N calls); construct ExportedPredictor with "
                "max_batch= to serve it")
        self.batchers = {}
        has_async = hasattr(predictor, "logits_async")
        for t in tasks:
            fn = (predictor.logits if t is None
                  else (lambda imgs, _t=t: predictor.logits(imgs, _t)))
            dfn = None
            if has_async:  # dispatch/fetch split -> pipelined batches
                dfn = (predictor.logits_async if t is None
                       else (lambda imgs, _t=t:
                             predictor.logits_async(imgs, _t)))
            self.batchers[t] = MicroBatcher(fn, max_batch, max_wait_ms,
                                            dispatch_fn=dfn,
                                            max_wait_cap_ms=max_wait_cap_ms)
        self.batcher = next(iter(self.batchers.values()))  # default route
        batchers = self.batchers
        image_size = (getattr(predictor, "image_size", None)
                      or predictor.cfg.image_size)

        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet access log
                pass

            def _json(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    info = {
                        "status": "ok",
                        "image_size": image_size,
                        "max_batch": outer.batcher.max_batch}
                    if None not in batchers:
                        info["tasks"] = list(batchers)
                    self._json(200, info)
                elif self.path == "/stats":
                    if None in batchers:
                        self._json(200, outer.batcher.snapshot())
                    else:
                        self._json(200, {t: b.snapshot()
                                         for t, b in batchers.items()})
                else:
                    self._json(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                from urllib.parse import parse_qs, urlparse

                url = urlparse(self.path)
                if url.path != "/predict":
                    self._json(404, {"error": f"no route {url.path}"})
                    return
                task = parse_qs(url.query).get("task", [None])[0]
                if None in batchers:       # single-task predictor
                    batcher = batchers[None]
                elif task is None:
                    self._json(400, {"error": "multi-task server: pass "
                                     "?task=<name>",
                                     "tasks": list(batchers)})
                    return
                elif task not in batchers:
                    self._json(404, {"error": f"unknown task {task!r}",
                                     "tasks": list(batchers)})
                    return
                else:
                    batcher = batchers[task]
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    img = decode_image_bytes(self.rfile.read(n), image_size)
                except Exception as exc:
                    self._json(400, {"error": f"bad image: {exc}"})
                    return
                try:
                    row, req = batcher.submit(img).result(
                        timeout=outer._timeout)
                except TimeoutError:
                    # A bare TimeoutError stringifies to "" — say what
                    # actually happened (typically a cold jit compile
                    # exceeding the wait; start(warmup=True) avoids it).
                    self._json(503, {"error": (
                        f"inference timed out after {outer._timeout:.0f}s "
                        "(cold compile in progress? warm the server or "
                        "raise request_timeout_s)")})
                    return
                except Exception as exc:
                    self._json(500, {"error": str(exc) or repr(exc)})
                    return
                k = min(outer._top, row.shape[-1])
                classes = np.argsort(-row)[:k]
                self._json(200, {
                    "class": int(classes[0]),
                    "classes": classes.tolist(),
                    "scores": [round(float(row[c]), 4) for c in classes],
                    "batched_with": req.batched_with,
                    "latency_ms": round(
                        (time.perf_counter() - req.t_enqueue) * 1e3, 3),
                })

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._serve_thread: Optional[threading.Thread] = None

    def start(self, warmup: bool = True):
        """Serve in a background thread.

        ``warmup=True`` (default) compiles the predictor's executable
        BEFORE accepting traffic — on a cold accelerator the first jit can
        take minutes, which would otherwise burn the first requests'
        timeout budget (k8s readiness sees the port open only once the
        model can actually answer)."""
        if warmup and hasattr(self._pred, "warmup"):
            self._pred.warmup()
        self._serve_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._serve_thread.start()
        return self

    def serve_forever(self):
        self._httpd.serve_forever()

    def close(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._serve_thread is not None:
            self._serve_thread.join(timeout=5)
        for b in self.batchers.values():
            b.close()
