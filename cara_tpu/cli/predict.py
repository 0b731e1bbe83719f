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

from cara_tpu.config import get_model_config
from cara_tpu.serving import Predictor


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("images", nargs="+", help="Image files (jpeg/png)")
    p.add_argument("--ckpt", required=True, type=str)
    p.add_argument("--model", default="vit_base_patch16_224_in21k")
    p.add_argument("--num-classes", default=None, type=int,
                   help="Override (default: inferred from the checkpoint)")
    p.add_argument("--batch-size", default=64, type=int)
    p.add_argument("--no-merge", action="store_true",
                   help="Keep the adapter path instead of folding weights")
    p.add_argument("--scale", default=None, type=float,
                   help="Delta scale (default: from checkpoint meta; "
                        "required if the checkpoint records none)")
    p.add_argument("--top", default=1, type=int, help="Top-k to report")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from cara_tpu.train.checkpoint import load_model

    params, cara_params, meta = load_model(args.ckpt)
    num_classes = args.num_classes
    if num_classes is None and "head" in params:
        num_classes = int(params["head"]["kernel"].shape[-1])
    cfg = get_model_config(args.model, num_classes=num_classes)

    from cara_tpu.config import CaraConfig

    cara_cfg = None
    if cara_params is not None:
        if args.scale is not None:
            scale = args.scale
        elif "scale" in meta:
            scale = float(meta["scale"])
        else:
            raise SystemExit(
                "checkpoint records no delta scale and --scale was not "
                "given; refusing to default to 1.0 (per-task scales span "
                "0.1-100 — a wrong scale silently mis-applies the adapter)")
        cara_cfg = CaraConfig(rank=int(cara_params["R1"].shape[0]),
                              scale=scale,
                              cp_order=int(meta.get("cp_order", 4)))
    pred = Predictor(
        params, cfg, cara_params=cara_params, cara_cfg=cara_cfg,
        merge=not args.no_merge, batch_size=args.batch_size)

    # Decode with the data pipeline (native loader if available).
    from cara_tpu.data.vtab import _load_image_pil, normalize

    try:
        from cara_tpu.data.native import NativeBatchDecoder

        dec = NativeBatchDecoder(cfg.image_size)
        imgs = dec.decode_batch(list(args.images))
    except Exception:
        imgs = np.stack([
            normalize(_load_image_pil(p, cfg.image_size))
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
