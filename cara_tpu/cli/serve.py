"""Online inference daemon: HTTP serving with dynamic micro-batching.

New deployment surface (the reference's only inference entry is
``--evaluate`` on the training CLI, ``vit_cp.py:109-114,168-173``): load a
checkpoint once, fold the adapter into dense weights, keep them
device-resident, and serve ``POST /predict`` requests coalesced into
fixed-shape padded batches (see :mod:`cara_tpu.server`).

Run: ``python -m cara_tpu.cli.serve --ckpt vit_cifar_*.npz --port 8000``
"""

from __future__ import annotations

import argparse

from cara_tpu.serving import Predictor


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--ckpt", required=True, type=str)
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
    p.add_argument("--top", default=5, type=int)
    p.add_argument("--no-merge", action="store_true",
                   help="Keep the adapter path instead of folding weights")
    p.add_argument("--quantize", default=None, choices=[None, "int8"],
                   help="Weight-only int8 (opt-in; ~7%% win at bs4-16 only)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    pred = Predictor.from_checkpoint_auto(
        args.ckpt, args.model, num_classes=args.num_classes,
        scale=args.scale, merge=not args.no_merge,
        batch_size=args.max_batch, quantize=args.quantize)

    from cara_tpu.server import InferenceServer

    srv = InferenceServer(pred, host=args.host, port=args.port,
                          max_wait_ms=args.max_wait_ms, top=args.top)
    print(f"serving on http://{args.host}:{srv.port}  "
          f"(max_batch={args.max_batch}, wait={args.max_wait_ms}ms)",
          flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.close()
    return 0


if __name__ == "__main__":
    main()
