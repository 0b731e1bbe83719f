"""Checkpoint export CLI: full -> merged / adapter-only artifacts.

New capability vs the reference (whose only artifact is the full state dict,
``vit_cp.py:66``):

* ``--mode merged``  folds the CP adapter into the dense backbone (exact in
  eval mode) — a plain ViT for serving, zero adapter overhead.
* ``--mode adapter`` extracts just the CP factors + head (~100KB vs ~350MB).
* ``--mode full``    re-saves a (backbone, adapter) pair as one artifact.
* ``--mode stablehlo`` serializes the merged eval forward as a portable
  self-contained ``jax.export`` StableHLO module (weights embedded; loads
  anywhere with just jax — no model code or checkpoint needed).
* ``--mode torch``   writes a reference-compatible ``.pt`` state dict
  (timm-0.4.12 keys + root ``CP_*``) that upstream's ``--evaluate`` loads
  unchanged (``vit_cp.py:168-173``) — the inverse of the ``.pt`` import.

Run:  ``python -m cara_tpu.cli.export --ckpt vit_cifar_*.npz --mode merged \\
         --out merged.npz --model vit_base_patch16_224_in21k --dim 32``
"""

from __future__ import annotations

import argparse

from cara_tpu.config import get_model_config
from cara_tpu.train import checkpoint as ckpt_lib


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--ckpt", required=True, type=str,
                   help="Input full-model checkpoint (.npz)")
    p.add_argument("--out", required=True, type=str)
    p.add_argument("--mode", default="merged",
                   choices=["merged", "adapter", "full", "stablehlo",
                            "torch"])
    p.add_argument("--batch-size", default=64, type=int,
                   help="stablehlo only: exported (static) batch size — "
                        "ExportedPredictor pads any request up to it; 0 "
                        "exports a symbolic batch dim (any N, no padding, "
                        "per-size compile at call time)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="stablehlo only: on-device compute dtype (the "
                        "artifact's I/O is always float32)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="stablehlo only: comma-separated lowering targets")
    p.add_argument("--quantize", default=None, choices=[None, "int8", "w8a8"],
                   help="stablehlo only: store block kernels as int8 module "
                        "constants (~4x smaller artifact); w8a8 also runs "
                        "the int8 MXU GEMM path (models/quant.py)")
    p.add_argument("--tome-r", default=0, type=int,
                   help="stablehlo only: bake ToMe token merging (r pairs "
                        "per layer) into the artifact — training-free FLOP "
                        "cut at a small accuracy cost (models/tome.py)")
    p.add_argument("--model", default=None,
                   help="Model name (default: from checkpoint meta)")
    p.add_argument("--dim", default=32, type=int, help="CP rank")
    p.add_argument("--scale", default=None, type=float,
                   help="Delta scale (default: from checkpoint meta; "
                        "REQUIRED if the checkpoint records none — the "
                        "per-task scale spans 0.1-100 and a wrong default "
                        "silently mis-merges)")
    p.add_argument("--cp-order", default=None, type=int,
                   choices=[2, 3, 4, 5],
                   help="CP order (default: from checkpoint meta)")
    return p.parse_args(argv)


def main(argv=None) -> str:
    args = parse_args(argv)
    if args.quantize and args.mode != "stablehlo":
        raise SystemExit(
            "--quantize only applies to --mode stablehlo (npz modes keep "
            "full-precision weights; quantize at serve time instead: "
            "serve --quantize)")
    if args.tome_r and args.mode != "stablehlo":
        raise SystemExit(
            "--tome-r only applies to --mode stablehlo (npz modes keep the "
            "exact forward; merge at serve time instead: serve --tome-r)")
    from cara_tpu.models import torch_import

    if torch_import.is_torch_checkpoint(args.ckpt):
        # Reference-released .pt (full timm state dict + CP_*): convert in
        # memory, then export like any native checkpoint.  Torch artifacts
        # record no scale — --scale (or the task table via vit_cp) is
        # required for merged/adapter modes.
        if args.model is None:
            raise SystemExit(
                ".pt import needs --model (torch checkpoints record no "
                "model name)")
        params, cara_params, info = torch_import.load_torch_checkpoint(
            args.ckpt, get_model_config(args.model))
        meta = {"model": args.model}
        if cara_params is not None:
            meta["cp_order"] = info["cp_order"]
    else:
        params, cara_params, meta = ckpt_lib.load_model(args.ckpt)
    if cara_params is None and args.mode not in ("full", "stablehlo",
                                                 "torch"):
        # torch mode without an adapter is still useful: a merged
        # checkpoint exports as a plain timm state dict.
        raise SystemExit("checkpoint has no adapter subtree")
    if args.scale is not None:
        scale = args.scale
    elif "scale" in meta:
        scale = float(meta["scale"])
    elif args.mode in ("full", "torch") or (args.mode == "stablehlo"
                                            and cara_params is None):
        # full/torch re-save the factors verbatim; the reference's
        # --evaluate flow re-reads scale from its per-task table
        # (vit_cp.py:126,156-163), so no scale travels in a .pt.
        scale = None
    else:
        raise SystemExit(
            "checkpoint records no delta scale and --scale was not given; "
            "refusing to default to 1.0 (vtab_config scales span 0.1-100, "
            "a wrong scale silently mis-merges the adapter)")

    if args.mode == "torch":
        from cara_tpu.models.torch_export import save_torch_checkpoint

        model_name = args.model or meta.get("model")
        if model_name is None:
            raise SystemExit(
                "checkpoint records no model name and --model was not given")
        mo = {k: v for k, v in meta.get("model_overrides", {}).items()
              if k != "num_classes"}
        cfg = get_model_config(model_name, **mo)
        order = args.cp_order or int(meta.get("cp_order", 0)) or (
            4 if cara_params is None else
            max((int(k[1]) for k in cara_params
                 if len(k) == 2 and k[0] == "A" and k[1].isdigit()),
                default=4))
        if cara_params is not None and "scale" in meta:
            # A .pt carries no scale; upstream --evaluate applies its
            # per-task table (vit_cp.py:126,156-163).  Surface the trained
            # scale so a table mismatch is visible, not silent.
            print(f"note: .pt carries no delta scale; upstream --evaluate "
                  f"applies its per-task vtab_config table — this "
                  f"checkpoint was trained with scale={meta['scale']}")
        try:
            save_torch_checkpoint(args.out, params, cara_params, cfg, order)
        except ValueError as e:
            # Non-CP adapter trees (LoRA/VPT/MoE/...) or a bad cp_order:
            # present as a CLI usage error like every other validation
            # failure, not a traceback.
            raise SystemExit(str(e))
    elif args.mode == "adapter":
        ckpt_lib.save_adapter(args.out, cara_params, params.get("head"),
                              {**meta, "scale": scale})
    elif args.mode in ("merged", "stablehlo"):
        num_classes = params["head"]["kernel"].shape[-1] \
            if "head" in params else 0
        model_name = args.model or meta.get("model")
        if model_name is None:
            raise SystemExit(
                "checkpoint records no model name and --model was not given")
        # Geometry overrides recorded at training time (--model-override)
        # travel in meta; the stored head fixes num_classes regardless.
        mo = {k: v for k, v in meta.get("model_overrides", {}).items()
              if k != "num_classes"}
        cfg = get_model_config(model_name, num_classes=num_classes, **mo)
        cara_cfg = None
        if cara_params is not None:
            cara_cfg = ckpt_lib.infer_cara_cfg(
                cara_params, meta, scale=scale, cp_order=args.cp_order)
            if cara_cfg.moe and args.mode == "merged":
                raise SystemExit(
                    "MoE adapters cannot be merged (per-token routing is "
                    "input-dependent); use --mode adapter/full, or "
                    "--mode stablehlo which embeds the unmerged forward")
        if args.mode == "stablehlo":
            import jax.numpy as jnp

            from cara_tpu.serving import export_serialized

            blob = export_serialized(
                params, cfg, cara_params=cara_params, cara_cfg=cara_cfg,
                batch_size=args.batch_size,
                dtype=jnp.bfloat16 if args.dtype == "bfloat16"
                else jnp.float32,
                platforms=tuple(args.platforms.split(",")),
                quantize=args.quantize, tome_r=args.tome_r)
            with open(args.out, "wb") as f:
                f.write(blob)
        else:
            from cara_tpu.models.merge import merge_cara

            merged = merge_cara(params, cara_params, cfg, cara_cfg)
            ckpt_lib.save_model(args.out, merged, None,
                                {**meta, "merged": True, "scale": scale})
    else:
        ckpt_lib.save_model(args.out, params, cara_params, meta)
    print(f"wrote {args.out} ({args.mode})")
    return args.out


if __name__ == "__main__":
    main()
