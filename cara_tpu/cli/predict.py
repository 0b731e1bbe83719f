"""Batch prediction CLI: classify image files with a trained checkpoint.

New serving surface (the reference has no inference entry point beyond
``--evaluate`` on the training CLI).  Uses the merged-weight path by default
(adapter folded into dense weights — measured ~25% faster than the adapter
forward on v5e).

Run: ``python -m cara_tpu.cli.predict --ckpt vit_cifar_*.npz \\
        --model vit_base_patch16_224_in21k images/*.jpg``
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from cara_tpu.serving import Predictor

_MODEL_DEFAULT = "vit_base_patch16_224_in21k"


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("images", nargs="+", help="Image files (jpeg/png)")
    p.add_argument("--ckpt", default=None, type=str)
    p.add_argument("--exported", default=None, type=str,
                   help="Serialized StableHLO artifact (export --mode "
                        "stablehlo) instead of --ckpt: weights embedded, "
                        "no model config needed")
    p.add_argument("--model", default=_MODEL_DEFAULT)
    p.add_argument("--num-classes", default=None, type=int,
                   help="Override (default: inferred from the checkpoint)")
    p.add_argument("--batch-size", default=64, type=int)
    p.add_argument("--no-merge", action="store_true",
                   help="Keep the adapter path instead of folding weights")
    p.add_argument("--scale", default=None, type=float,
                   help="Delta scale (default: from checkpoint meta; "
                        "required if the checkpoint records none)")
    p.add_argument("--top", default=1, type=int, help="Top-k to report")
    p.add_argument("--tome-r", default=0, type=int,
                   help="ToMe token merging: merge this many token pairs "
                        "per layer (training-free FLOP cut, small accuracy "
                        "cost — models/tome.py); merged path only")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if (args.ckpt is None) == (args.exported is None):
        raise SystemExit("pass exactly one of --ckpt / --exported")
    if args.exported and (
            args.model != _MODEL_DEFAULT or args.num_classes is not None
            or args.scale is not None or args.no_merge
            or args.batch_size != 64 or args.tome_r):
        raise SystemExit(
            "--model/--num-classes/--scale/--no-merge/--batch-size/--tome-r "
            "have no effect with --exported: the artifact bakes in the "
            "merged weights, head, batch size and any token merging at "
            "export time")
    if args.tome_r and args.no_merge:
        raise SystemExit("--tome-r needs the merged dense forward; drop "
                         "--no-merge")
    if args.exported:
        from cara_tpu.serving import ExportedPredictor

        pred = ExportedPredictor.from_file(args.exported)
        image_size = pred.image_size
    else:
        try:
            pred = Predictor.from_checkpoint_auto(
                args.ckpt, args.model, num_classes=args.num_classes,
                scale=args.scale, merge=not args.no_merge,
                batch_size=args.batch_size, tome_r=args.tome_r)
        except ValueError as exc:  # e.g. missing delta scale
            raise SystemExit(str(exc))
        image_size = pred.cfg.image_size

    # Decode with the data pipeline (native loader if available).
    from cara_tpu.data.vtab import _load_image_pil, normalize

    try:
        from cara_tpu.data.native import NativeBatchDecoder

        dec = NativeBatchDecoder(image_size)
        imgs = dec.decode_batch(list(args.images))
    except Exception:
        imgs = np.stack([
            normalize(_load_image_pil(p, image_size))
            for p in args.images])

    logits = pred.logits(imgs)
    topk = np.argsort(-logits, axis=-1)[:, :args.top]
    results = []
    for path, classes, lg in zip(args.images, topk, logits):
        rec = {"image": path,
               "classes": classes.tolist(),
               "scores": [round(float(lg[c]), 4) for c in classes]}
        results.append(rec)
        print(json.dumps(rec))
    return results


if __name__ == "__main__":
    main()
