"""Parallelism planner CLI: pick a mesh before burning a compile.

New surface relative to the reference (which is single-GPU by
construction — SURVEY.md §2.6): given a model geometry, a device count
and per-device HBM, print the cheapest parallelism that fits, the
itemized per-device memory estimate behind the decision, and the exact
training-CLI flags that realize it.

Run:  ``python -m cara_tpu.cli.plan --model vit_huge_patch14_224_in21k \
          --devices 8 --hbm-gb 16 --batch-size 64``
"""

from __future__ import annotations

import argparse
import json


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--model", default="vit_base_patch16_224_in21k")
    p.add_argument("--model-override", action="append", default=None,
                   metavar="K=V", help="ViTConfig field override, repeatable")
    p.add_argument("--dim", default=32, type=int, help="CP rank")
    p.add_argument("--num-classes", default=None, type=int,
                   help="Classifier width (default: the registry head; "
                        "VTAB tasks are 2-397 — pass the real count, the "
                        "in21k 21843-way head dominates the estimate "
                        "otherwise)")
    p.add_argument("--devices", default=None, type=int,
                   help="Device count to plan for (default: visible)")
    p.add_argument("--batch-size", default=64, type=int)
    p.add_argument("--hbm-gb", default=16.0, type=float,
                   help="Per-device HBM budget (v5e: 16, v4: 32, v5p: 95)")
    p.add_argument("--slices", default=1, type=int,
                   help="Multi-slice (DCN) topology: model/stage axes are "
                        "kept intra-slice, dp/tp plans carry the matching "
                        "--dcn-mesh")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--no-adapter", action="store_true",
                   help="Plan for the plain backbone (no CaRA factors)")
    p.add_argument("--verify", action="store_true",
                   help="Compile the planned step on the PRESENT devices "
                        "and print XLA's own memory analysis next to the "
                        "estimate (device count must match --devices)")
    p.add_argument("--json", action="store_true",
                   help="Machine-readable single-line output")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    import jax

    from cara_tpu.cli import common
    from cara_tpu.config import CaraConfig, get_model_config
    from cara_tpu.parallel import planner

    overrides = common.resolve_model_overrides(args)
    if args.num_classes is not None:
        overrides["num_classes"] = args.num_classes
    cfg = get_model_config(args.model, **overrides)
    cara_cfg = None if args.no_adapter else CaraConfig(rank=args.dim)
    n = args.devices if args.devices is not None else len(jax.devices())
    dtype = common.resolve_dtype(args.dtype)

    plan = planner.plan_mesh(cfg, cara_cfg, n, args.batch_size,
                             hbm_gb=args.hbm_gb, compute_dtype=dtype,
                             n_slices=args.slices)
    measured = None
    if args.verify:
        measured = planner.verify_plan(plan, cfg, cara_cfg,
                                       args.batch_size,
                                       compute_dtype=dtype)
    if args.json:
        print(json.dumps({
            "kind": plan.kind, "mesh": plan.mesh_shape,
            "pipeline": plan.pipeline, "flags": plan.cli_flags(),
            "fits": plan.fits, "estimate_gib": plan.memory.as_dict(),
            "measured": measured,
        }))
        return 0 if plan.fits else 1

    print(f"model: {args.model}"
          + (f" {overrides}" if overrides else "")
          + f"  devices: {n}  batch: {args.batch_size}"
          f"  hbm: {args.hbm_gb} GiB/device")
    print(f"\nplan: {plan.kind}  ->  {plan.cli_flags()}"
          + ("" if plan.fits else "  [DOES NOT FIT]"))
    print("\nper-device estimate (GiB):")
    for k, v in plan.memory.as_dict().items():
        print(f"  {k:>16}: {v:8.3f}")
    if measured:
        print("\nXLA memory_analysis of the compiled step (MiB):")
        for k, v in measured.items():
            print(f"  {k:>20}: {v}")
    print("\nladder:")
    for line in plan.rationale:
        print(f"  - {line}")
    return 0 if plan.fits else 1


if __name__ == "__main__":
    raise SystemExit(main())
