"""Online inference daemon: HTTP serving with dynamic micro-batching.

New deployment surface (the reference's only inference entry is
``--evaluate`` on the training CLI, ``vit_cp.py:109-114,168-173``): load a
checkpoint once, fold the adapter into dense weights, keep them
device-resident, and serve ``POST /predict`` requests coalesced into
fixed-shape padded batches (see :mod:`cara_tpu.server`).

Run: ``python -m cara_tpu.cli.serve --ckpt vit_cifar_*.npz --port 8000``
or serve a self-contained StableHLO artifact (no checkpoint/model code):
``python -m cara_tpu.cli.serve --exported model.stablehlo``.
"""

from __future__ import annotations

import argparse

from cara_tpu.serving import Predictor


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--exported", default=None, type=str,
                   help="Serve a serialized StableHLO artifact (export "
                        "--mode stablehlo) instead of a checkpoint — no "
                        "model code or weights needed beyond the file")
    p.add_argument("--ckpt", action="append", default=None,
                   help="Checkpoint (.npz). Repeatable — with several, "
                        "serves ALL of them over ONE shared frozen "
                        "backbone (stacked ~100KB adapters, one compiled "
                        "executable; route requests with POST "
                        "/predict?task=<name>). 'name=path' names a "
                        "task; default name = checkpoint meta dataset "
                        "or the file stem")
    p.add_argument("--backbone", default=None, type=str,
                   help="Pretrained npz for the shared backbone when all "
                        "--ckpt files are adapter-only")
    p.add_argument("--model", default="vit_base_patch16_224_in21k")
    p.add_argument("--num-classes", default=None, type=int)
    p.add_argument("--scale", default=None, type=float,
                   help="Delta scale (default: from checkpoint meta)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", default=8000, type=int)
    p.add_argument("--max-batch", default=64, type=int,
                   help="Compiled batch size = max requests per device call")
    p.add_argument("--max-wait-ms", default=2.0, type=float,
                   help="How long the first request in a batch waits for "
                        "co-riders (0 = serve singles immediately)")
    p.add_argument("--max-wait-cap-ms", default=None, type=float,
                   help="Hard bound on adaptive batch collection: each "
                        "co-rider arrival extends the wait by another "
                        "--max-wait-ms up to this cap (default 4x "
                        "--max-wait-ms; set equal to --max-wait-ms for a "
                        "fixed deadline)")
    p.add_argument("--top", default=5, type=int)
    p.add_argument("--request-timeout", default=120.0, type=float,
                   help="per-request inference wait cap (seconds)")
    p.add_argument("--buckets", default="auto",
                   help="batch buckets: 'auto' (powers of 4 up to "
                        "--max-batch), 'none' (one full-size executable), "
                        "or CSV sizes e.g. 1,8,64 — short batches run the "
                        "smallest executable that fits instead of padding "
                        "to --max-batch")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip the pre-serve compile of the batch "
                        "executable (first request pays it instead)")
    p.add_argument("--no-merge", action="store_true",
                   help="Keep the adapter path instead of folding weights")
    p.add_argument("--quantize", default=None,
                   choices=[None, "int8", "w8a8"],
                   help="int8 = weight-only (opt-in; ~7%% win at bs4-16 "
                        "only); w8a8 = full int8 with dynamic per-token "
                        "activation quant on the 2x-rate int8 MXU path "
                        "(bounded accuracy cost — models/quant.py)")
    p.add_argument("--tome-r", default=0, type=int,
                   help="ToMe token merging: merge this many token pairs "
                        "per layer (training-free FLOP cut; small paper-"
                        "characterized accuracy cost — models/tome.py). "
                        "Single-task merged serving only")
    return p.parse_args(argv)


def _task_name(spec: str) -> tuple:
    """'name=path' -> (name, path); bare path -> (meta-or-stem, path).

    A bare path that happens to contain '=' (e.g. runs/lr=1e-3/best.npz)
    is recognized by existing on disk and never split."""
    import json
    import os

    import numpy as np

    if "=" in spec and not os.path.exists(spec):
        return tuple(spec.split("=", 1))
    name = None
    try:
        with np.load(spec) as z:
            if "__meta__" in z.files:
                name = json.loads(
                    bytes(z["__meta__"].tolist()).decode()).get("dataset")
    except Exception:
        pass
    return (name or os.path.splitext(os.path.basename(spec))[0], spec)


def _parse_buckets(spec: str):
    if spec == "auto":
        return "auto"
    if spec == "none":
        return None
    return [int(x) for x in spec.split(",")]


def main(argv=None):
    args = parse_args(argv)
    if bool(args.exported) == bool(args.ckpt):
        raise SystemExit("pass exactly one of --ckpt / --exported")
    if args.tome_r and (args.exported or args.no_merge
                        or (args.ckpt and len(args.ckpt) > 1)):
        raise SystemExit("--tome-r serves a single merged checkpoint (not "
                         "--exported / --no-merge / multi-task: token "
                         "merging needs the dense in-process forward)")
    if args.exported:
        from cara_tpu.serving import ExportedPredictor

        pred = ExportedPredictor.from_file(
            args.exported, max_batch=args.max_batch,
            buckets=_parse_buckets(args.buckets))
        if pred.batch_size is not None and pred.batch_size != args.max_batch:
            print(f"note: artifact was exported at batch "
                  f"{pred.batch_size}; --max-batch {args.max_batch} "
                  f"ignored (fixed-shape executable)", flush=True)
    elif len(args.ckpt) > 1:
        if args.no_merge:
            raise SystemExit("--no-merge is a single-task option "
                             "(multi-task serving always runs the "
                             "shared-backbone adapter path)")
        if args.scale is not None or args.num_classes is not None:
            raise SystemExit("--scale/--num-classes are single-task "
                             "options; per-task scale/head come from each "
                             "checkpoint's meta in multi-task mode")
        from cara_tpu.serving import MultiTaskPredictor

        named = [_task_name(c) for c in args.ckpt]
        ckpts = dict(named)
        if len(ckpts) != len(named):
            dupes = sorted({n for n, _ in named
                            if sum(1 for m, _ in named if m == n) > 1})
            raise SystemExit(
                f"duplicate task name(s) {dupes} — disambiguate with "
                "explicit name=path specs")
        pred = MultiTaskPredictor.from_checkpoints(
            ckpts, args.model, backbone=args.backbone,
            batch_size=args.max_batch, quantize=args.quantize,
            buckets=_parse_buckets(args.buckets))
        print(f"multi-task: {len(ckpts)} adapters over one backbone "
              f"({', '.join(ckpts)})", flush=True)
    else:
        pred = Predictor.from_checkpoint_auto(
            args.ckpt[0], args.model, num_classes=args.num_classes,
            scale=args.scale, merge=not args.no_merge,
            batch_size=args.max_batch, quantize=args.quantize,
            buckets=_parse_buckets(args.buckets), tome_r=args.tome_r)

    from cara_tpu.server import InferenceServer

    srv = InferenceServer(pred, host=args.host, port=args.port,
                          max_wait_ms=args.max_wait_ms, top=args.top,
                          request_timeout_s=args.request_timeout,
                          max_wait_cap_ms=args.max_wait_cap_ms)
    if not args.no_warmup and hasattr(pred, "warmup"):
        # Compile BEFORE announcing the port: a readiness probe that sees
        # the address must get an answer within its own timeout, not a
        # multi-minute cold jit.
        print("warming up (compiling the serving executable)...", flush=True)
        pred.warmup()
    print(f"serving on http://{args.host}:{srv.port}  "
          f"(max_batch={args.max_batch}, wait={args.max_wait_ms}ms)",
          flush=True)
    import signal
    import threading

    def _term(signum, frame):  # k8s/systemd stop -> same path as Ctrl-C
        raise KeyboardInterrupt

    if threading.current_thread() is threading.main_thread():
        signal.signal(signal.SIGTERM, _term)  # registration is main-thread-only
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.close()
    return 0


if __name__ == "__main__":
    main()
