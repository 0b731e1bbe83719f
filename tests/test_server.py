"""HTTP inference server: micro-batching, endpoints, error paths.

Tiny model on CPU; requests go through a real ThreadingHTTPServer on an
ephemeral port, so decode -> batcher -> Predictor -> JSON is exercised
exactly as deployed."""

import concurrent.futures
import io
import json
import urllib.request

import numpy as np
import pytest

from cara_tpu import api
from cara_tpu.serving import Predictor
from cara_tpu.server import InferenceServer, MicroBatcher


@pytest.fixture(scope="module")
def server():
    model = api.build_model("vit_tiny_test", rank=4, scale=1.0,
                            num_classes=10, seed=0)
    pred = Predictor(model.params, model.cfg, cara_params=model.cara_params,
                     cara_cfg=model.cara_cfg, merge=True, batch_size=8,
                     dtype=np.float32)
    srv = InferenceServer(pred, port=0, max_wait_ms=30.0, top=3).start()
    yield srv
    srv.close()


def _png_bytes(seed: int, size: int = 40) -> bytes:
    from PIL import Image

    rng = np.random.RandomState(seed)
    im = Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    return buf.getvalue()


def _post(port: int, body: bytes, path: str = "/predict"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(port: int, path: str):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.status, json.loads(r.read())


def test_healthz_and_404(server):
    status, body = _get(server.port, "/healthz")
    assert status == 200 and body["status"] == "ok"
    assert body["max_batch"] == 8
    req = urllib.request.Request(f"http://127.0.0.1:{server.port}/nope")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 404


def test_predict_single(server):
    status, body = _post(server.port, _png_bytes(0))
    assert status == 200
    assert 0 <= body["class"] < 10
    assert body["classes"][0] == body["class"]
    assert len(body["classes"]) == 3 and len(body["scores"]) == 3
    assert body["scores"] == sorted(body["scores"], reverse=True)
    assert body["batched_with"] >= 1


def test_concurrent_requests_coalesce(server):
    """Fire 6 requests at once: the 30 ms batching window should put at
    least two of them in one device batch."""
    with concurrent.futures.ThreadPoolExecutor(6) as ex:
        results = list(ex.map(
            lambda i: _post(server.port, _png_bytes(i)), range(6)))
    assert all(status == 200 for status, _ in results)
    assert max(body["batched_with"] for _, body in results) >= 2
    status, stats = _get(server.port, "/stats")
    assert status == 200
    assert stats["requests"] >= 7  # the single + these 6
    assert stats["batches"] < stats["requests"]  # coalescing happened
    assert stats["mean_batch_occupancy"] > 1.0


def test_bad_image_400(server):
    status, body = _post(server.port, b"this is not an image")
    assert status == 400 and "bad image" in body["error"]


def test_deterministic_vs_predictor(server):
    """The served class for a fixed image equals a direct Predictor call
    on the same decoded array (padding rows don't leak)."""
    from cara_tpu.server import decode_image_bytes

    png = _png_bytes(123)
    img = decode_image_bytes(png, server._pred.cfg.image_size)
    direct = int(server._pred.predict(img[None])[0])
    for _ in range(2):
        status, body = _post(server.port, png)
        assert status == 200 and body["class"] == direct


def test_multitask_server_routing():
    """Multi-task server: ?task= routes to the right adapter, missing /
    unknown task are 400/404, healthz lists tasks, stats are per-task."""
    from cara_tpu.serving import MultiTaskPredictor

    model = api.build_model("vit_tiny_test", rank=4, scale=1.0,
                            num_classes=6, seed=0)
    import jax

    cara2 = dict(model.cara_params)
    cara2["A2"] = 0.05 * jax.random.normal(
        jax.random.key(9), cara2["A2"].shape)
    head_in = model.params["head"]["kernel"].shape[0]
    head2 = {"kernel": 0.1 * np.random.RandomState(0)
             .randn(head_in, 3).astype(np.float32),
             "bias": np.zeros(3, np.float32)}
    mp = MultiTaskPredictor(
        model.params, model.cfg,
        {"a": {"cara": model.cara_params, "head": model.params["head"],
               "scale": 1.0},
         "b": {"cara": cara2, "head": head2, "scale": 2.0}},
        batch_size=4, dtype=np.float32)
    srv = InferenceServer(mp, port=0, max_wait_ms=1.0, top=2).start()
    try:
        status, body = _get(srv.port, "/healthz")
        assert status == 200 and body["tasks"] == ["a", "b"]
        png = _png_bytes(7)
        status, body = _post(srv.port, png)           # no task
        assert status == 400 and body["tasks"] == ["a", "b"]
        status, body = _post(srv.port, png, "/predict?task=zzz")
        assert status == 404
        status, ba = _post(srv.port, png, "/predict?task=a")
        status2, bb = _post(srv.port, png, "/predict?task=b")
        assert status == 200 and status2 == 200
        assert 0 <= ba["class"] < 6 and 0 <= bb["class"] < 3
        # parity with direct MultiTaskPredictor calls
        from cara_tpu.server import decode_image_bytes

        img = decode_image_bytes(png, model.cfg.image_size)
        assert ba["class"] == int(mp.predict(img[None], "a")[0])
        assert bb["class"] == int(mp.predict(img[None], "b")[0])
        status, stats = _get(srv.port, "/stats")
        assert set(stats) == {"a", "b"}
        assert stats["a"]["requests"] == 1 and stats["b"]["requests"] == 1
    finally:
        srv.close()


def test_batcher_error_resolves_futures():
    def boom(xs):
        raise RuntimeError("device on fire")

    mb = MicroBatcher(boom, max_batch=4, max_wait_ms=1.0)
    try:
        fut = mb.submit(np.zeros((2, 2, 3), np.float32))
        with pytest.raises(RuntimeError, match="device on fire"):
            fut.result(timeout=10)
        # The batcher thread survives an inference error.
        fut2 = mb.submit(np.zeros((2, 2, 3), np.float32))
        with pytest.raises(RuntimeError):
            fut2.result(timeout=10)
    finally:
        mb.close()


def test_serve_exported_artifact(tmp_path):
    """A serialized StableHLO artifact serves over HTTP end-to-end:
    export -> ExportedPredictor(max_batch=, buckets) -> InferenceServer.
    Covers both fixed-batch and symbolic-batch artifacts."""
    from cara_tpu.serving import ExportedPredictor, export_serialized

    model = api.build_model("vit_tiny_test", rank=4, scale=1.0,
                            num_classes=10, seed=0)
    blob = export_serialized(
        model.params, model.cfg, cara_params=model.cara_params,
        cara_cfg=model.cara_cfg, batch_size=0, dtype=np.float32,
        platforms=("cpu",))
    path = str(tmp_path / "m.stablehlo")
    with open(path, "wb") as f:
        f.write(blob)

    # Symbolic artifact + max_batch -> bounded bucket set, servable.
    ep = ExportedPredictor.from_file(path, max_batch=8)
    assert ep.batch_size is None and ep.max_batch == 8
    assert ep._buckets == (1, 4, 8)
    srv = InferenceServer(ep, port=0, max_wait_ms=1.0).start()
    try:
        status, body = _post(srv.port, _png_bytes(0))
        assert status == 200 and 0 <= body["class"] < 10
        status, health = _get(srv.port, "/healthz")
        assert health["max_batch"] == 8
    finally:
        srv.close()

    # Exact-N library default (no max_batch) refuses to serve (no batch
    # bound for the micro-batcher) but still predicts directly.
    ep2 = ExportedPredictor.from_file(path)
    assert ep2.predict(np.zeros((3, 32, 32, 3), np.float32)).shape == (3,)
    with pytest.raises(ValueError, match="batch bound"):
        InferenceServer(ep2, port=0)

    # CLI path: serve --exported builds the same servable predictor.
    from cara_tpu.cli import serve as serve_cli

    with pytest.raises(SystemExit, match="exactly one"):
        serve_cli.main(["--exported", path, "--ckpt", "x.npz"])


def test_microbatcher_adaptive_wait_coalesces_steady_stream():
    """Adaptive deadline: a steady trickle (inter-arrival < max_wait but
    slower than the fixed window could ever fill a batch) coalesces into
    FEWER, fuller batches than the fixed deadline allows, while the hard
    cap still bounds how long the first request can be held."""
    import time

    def logits(xs):
        return np.zeros((len(xs), 2), np.float32)

    n, gap_s = 10, 0.01
    # Fixed deadline (cap == wait): the 30 ms window closes mid-stream.
    fixed = MicroBatcher(logits, max_batch=64, max_wait_ms=30.0,
                         max_wait_cap_ms=30.0)
    # Adaptive (default cap 4x = 120 ms): each 10 ms arrival rolls the
    # 30 ms deadline, so the whole stream rides one batch.
    adaptive = MicroBatcher(logits, max_batch=64, max_wait_ms=30.0)
    assert adaptive.max_wait_cap == pytest.approx(0.120)
    try:
        for mb in (fixed, adaptive):
            futs = []
            for _ in range(n):
                futs.append(mb.submit(np.zeros((2, 2, 3), np.float32)))
                time.sleep(gap_s)
            for f in futs:
                f.result(timeout=10)
        f_snap, a_snap = fixed.snapshot(), adaptive.snapshot()
        assert a_snap["requests"] == f_snap["requests"] == n
        # The adaptive batcher forms strictly fewer, fuller batches.  With
        # 10 ms gaps vs a 30 ms rolling window the expectation is ONE
        # batch; allow 2 for scheduler jitter on a loaded CI host.
        assert a_snap["batches"] <= 2, a_snap
        assert a_snap["batches"] < f_snap["batches"], (a_snap, f_snap)
        assert (a_snap["mean_batch_occupancy"]
                > f_snap["mean_batch_occupancy"])
    finally:
        fixed.close()
        adaptive.close()


def test_microbatcher_adaptive_cap_bounds_latency():
    """The hard cap closes a batch even under a never-ending stream, and
    an isolated request still dispatches after ~the base wait."""
    import time

    def logits(xs):
        return np.zeros((len(xs), 2), np.float32)

    mb = MicroBatcher(logits, max_batch=64, max_wait_ms=20.0,
                      max_wait_cap_ms=60.0)
    try:
        # Isolated request: resolves in ~max_wait, far below the cap.
        t0 = time.perf_counter()
        mb.submit(np.zeros((2, 2, 3), np.float32)).result(timeout=10)
        assert time.perf_counter() - t0 < 1.0
        # Saturating stream (5 ms gaps < 20 ms wait): the 60 ms cap must
        # split it into >= 2 batches instead of holding the head forever.
        futs = [mb.submit(np.zeros((2, 2, 3), np.float32))]
        for _ in range(29):
            time.sleep(0.005)
            futs.append(mb.submit(np.zeros((2, 2, 3), np.float32)))
        for f in futs:
            f.result(timeout=10)
        snap = mb.snapshot()
        assert snap["batches"] >= 3  # 1 isolated + >=2 from the stream
        assert snap["max_latency_ms"] < 5000
    finally:
        mb.close()


def test_microbatcher_pipeline_overlap():
    """With a dispatch/fetch split, the collector dispatches batch N
    while the resolver is still fetching batch N-1 (bounded by
    pipeline_depth) — and every row still resolves to its own result."""
    import threading
    import time

    lock = threading.Lock()
    in_flight, max_in_flight = [], [0]

    def dispatch(imgs):
        ids = imgs[:, 0, 0, 0].copy()
        with lock:
            in_flight.append(1)
            max_in_flight[0] = max(max_in_flight[0], len(in_flight))

        def fetch():
            time.sleep(0.05)  # simulated device latency
            with lock:
                in_flight.pop()
            return np.stack([[i, -i] for i in ids])

        return fetch

    mb = MicroBatcher(lambda imgs: dispatch(imgs)(), max_batch=1,
                      max_wait_ms=0.0, dispatch_fn=dispatch)
    try:
        imgs = [np.full((2, 2, 3), float(i), np.float32) for i in range(6)]
        futs = [mb.submit(im) for im in imgs]
        for i, f in enumerate(futs):
            row, req = f.result(timeout=10)
            np.testing.assert_allclose(row, [i, -i])
        # Overlap happened, and stayed within the pipeline bound
        # (1 fetching + 1 queued + 1 dispatched-awaiting-enqueue).
        assert 2 <= max_in_flight[0] <= 3, max_in_flight[0]
        snap = mb.snapshot()
        assert snap["requests"] == 6 and snap["batches"] == 6
    finally:
        mb.close()
