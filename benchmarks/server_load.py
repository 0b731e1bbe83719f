"""Load test for the HTTP inference server (cara_tpu/server.py).

Spins up an in-process InferenceServer on a fresh merged model, fires C
concurrent closed-loop clients for S seconds with pre-encoded JPEG bodies,
and reports requests/s, latency percentiles and batch occupancy.

Run (TPU):  python benchmarks/server_load.py --model vit_base_patch16_224_in21k \
                --concurrency 1 4 16 64 --seconds 10

Caveat: on this host the TPU rides a remote tunnel, so server throughput
includes tunnel H2D/D2H per batch — on a real TPU VM the device rate
governs (same caveat as the e2e serving latency in RESULTS.md).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_jpegs(n: int, size: int) -> list:
    from PIL import Image

    out = []
    rng = np.random.RandomState(0)
    for i in range(n):
        im = Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8))
        buf = io.BytesIO()
        im.save(buf, format="JPEG", quality=90)
        out.append(buf.getvalue())
    return out


def run_level(port: int, bodies: list, concurrency: int,
              seconds: float, paths=("/predict",)) -> dict:
    stop = time.perf_counter() + seconds
    lats, errors, lock = [], [0], threading.Lock()

    def client(cid: int):
        i = cid
        local, errs = [], 0
        while time.perf_counter() < stop:
            body = bodies[i % len(bodies)]
            path = paths[i % len(paths)]
            i += concurrency
            t0 = time.perf_counter()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}", data=body,
                method="POST")
            try:
                with urllib.request.urlopen(req, timeout=60) as r:
                    json.loads(r.read())
            except Exception:
                # Keep-alive resets under load etc.: count, don't lose the
                # thread (a dead client silently drops its samples).
                errs += 1
                continue
            local.append((time.perf_counter() - t0) * 1e3)
        with lock:
            lats.extend(local)
            errors[0] += errs

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lats.sort()

    def pct(p):
        if not lats:  # zero completions inside the window (e.g. cold compile)
            return None
        return round(lats[min(len(lats) - 1, int(p * len(lats)))], 2)

    return {"concurrency": concurrency, "requests": len(lats),
            "errors": errors[0],
            "req_per_s": round(len(lats) / wall, 1),
            "p50_ms": pct(0.50), "p95_ms": pct(0.95), "p99_ms": pct(0.99)}


def run_open_loop(port: int, bodies: list, rate: float, seconds: float,
                  paths=("/predict",)) -> dict:
    """OPEN-loop load: fire one request every 1/rate seconds regardless of
    completions (each request in its own thread), the arrival pattern that
    exposes the adaptive batch window — closed-loop clients re-arrive only
    on completion, so their queue always backs up during a device batch and
    fixed vs adaptive deadlines converge."""
    n = max(1, int(rate * seconds))
    interval = 1.0 / rate
    lats, errors, lock = [], [0], threading.Lock()

    def one(i: int):
        t0 = time.perf_counter()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{paths[i % len(paths)]}",
            data=bodies[i % len(bodies)], method="POST")
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                json.loads(r.read())
        except Exception:
            with lock:
                errors[0] += 1
            return
        with lock:
            lats.append((time.perf_counter() - t0) * 1e3)

    threads = []
    t_start = time.perf_counter()
    for i in range(n):
        target = t_start + i * interval
        delay = target - time.perf_counter()
        if delay > 0:
            time.sleep(delay)
        t = threading.Thread(target=one, args=(i,))
        t.start()
        threads.append(t)
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    lats.sort()

    def pct(p):
        if not lats:
            return None
        return round(lats[min(len(lats) - 1, int(p * len(lats)))], 2)

    return {"rate": rate, "requests": len(lats), "errors": errors[0],
            "req_per_s": round(len(lats) / wall, 1),
            "p50_ms": pct(0.50), "p95_ms": pct(0.95), "p99_ms": pct(0.99)}


def warm(port: int, bodies: list, paths) -> None:
    """One BLOCKING request per task path before any timed window — the
    first request compiles the batch executable (minutes on a tunneled
    chip), which previously starved the fixed-length warmup of
    completions entirely."""
    for path in paths:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=bodies[0], method="POST")
        try:
            with urllib.request.urlopen(req, timeout=1800) as r:
                json.loads(r.read())
        except urllib.error.HTTPError as e:  # surface the server's error body
            raise RuntimeError(
                f"warmup {path} -> HTTP {e.code}: "
                f"{e.read().decode(errors='replace')[:2000]}") from e


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="vit_base_patch16_224_in21k")
    p.add_argument("--rank", default=8, type=int)
    p.add_argument("--max-batch", default=64, type=int)
    p.add_argument("--max-wait-ms", default=2.0, type=float)
    p.add_argument("--concurrency", nargs="*", type=int,
                   default=[1, 4, 16, 64])
    p.add_argument("--rate", nargs="*", type=float, default=None,
                   help="OPEN-loop levels (requests/s): fire at a fixed "
                        "arrival rate regardless of completions — the "
                        "pattern that exercises the adaptive batch window")
    p.add_argument("--max-wait-cap-ms", default=None, type=float,
                   help="adaptive-wait hard cap (see serve CLI)")
    p.add_argument("--seconds", default=10.0, type=float)
    p.add_argument("--images", default=64, type=int,
                   help="distinct pre-encoded JPEG bodies")
    p.add_argument("--tasks", default=1, type=int,
                   help=">1: serve N adapters over one shared backbone "
                        "(MultiTaskPredictor); clients round-robin "
                        "?task=tI. Measures the per-task batching "
                        "dilution of multi-task serving under load")
    args = p.parse_args()

    import jax

    from cara_tpu.utils.jit_cache import enable_compilation_cache

    enable_compilation_cache()

    from cara_tpu import api
    from cara_tpu.serving import MultiTaskPredictor, Predictor
    from cara_tpu.server import InferenceServer

    model = api.build_model(args.model, rank=args.rank, scale=1.0,
                            num_classes=100, seed=0)
    if args.tasks > 1:
        from cara_tpu.models import cara as cara_lib

        tasks = {}
        for i in range(args.tasks):
            cara_i = (model.cara_params if i == 0 else
                      cara_lib.init_cara_params(
                          jax.random.key(100 + i), model.cfg,
                          model.cara_cfg))
            tasks[f"t{i}"] = {"cara": cara_i, "head": model.params["head"],
                              "scale": 1.0}
        pred = MultiTaskPredictor(model.params, model.cfg, tasks,
                                  batch_size=args.max_batch)
        paths = tuple(f"/predict?task=t{i}" for i in range(args.tasks))
    else:
        pred = Predictor(model.params, model.cfg,
                         cara_params=model.cara_params,
                         cara_cfg=model.cara_cfg, merge=True,
                         batch_size=args.max_batch)
        paths = ("/predict",)
    srv = InferenceServer(pred, port=0, max_wait_ms=args.max_wait_ms,
                          max_wait_cap_ms=args.max_wait_cap_ms).start()
    bodies = make_jpegs(args.images, model.cfg.image_size)

    # Warm the compiled batch path before measuring: first one blocking
    # request per task (absorbs compile), then a short concurrent shakeout.
    warm(srv.port, bodies, paths)
    shake = min(4, args.concurrency[-1]) if args.concurrency else 4
    run_level(srv.port, bodies, shake, 2.0, paths)

    def batcher_delta(before):
        after = (srv.batcher.snapshot() if args.tasks == 1 else None)
        if after is None:
            return {t: b.snapshot() for t, b in srv.batchers.items()}
        d = {k: after[k] - before.get(k, 0)
             for k in ("requests", "batches", "rows")}
        d["occupancy"] = round(d["rows"] / max(1, d["batches"]), 2)
        return d

    try:
        for c in args.concurrency:
            pre = srv.batcher.snapshot() if args.tasks == 1 else {}
            row = run_level(srv.port, bodies, c, args.seconds, paths)
            row["tasks"] = args.tasks
            row["batcher"] = batcher_delta(pre)
            print(json.dumps(row), flush=True)
        for r in (args.rate or []):
            pre = srv.batcher.snapshot() if args.tasks == 1 else {}
            row = run_open_loop(srv.port, bodies, r, args.seconds, paths)
            row["tasks"] = args.tasks
            row["wait_ms"] = args.max_wait_ms
            row["cap_ms"] = args.max_wait_cap_ms
            row["batcher"] = batcher_delta(pre)
            print(json.dumps(row), flush=True)
    finally:
        srv.close()


if __name__ == "__main__":
    main()
