"""Main train/eval CLI — the counterpart of
``image_classification/vit_cp.py`` (published order-4 CaRA).

Public surface mirrors the reference (``vit_cp.py:85-116``):
``--dim`` (rank), ``--lr``, ``--dataset`` (19 VTAB tasks), ``--evaluate``
(checkpoint path -> eval only), ``--model`` — plus TPU-native extras
(mesh/dtype/synthetic/profiling, see ``cli/common.py``).

Run:  ``python -m cara_tpu.cli.vit_cp --dataset=cifar --dim=32``
"""

from __future__ import annotations

import argparse

import jax

from cara_tpu import api
from cara_tpu.cli import common
from cara_tpu.data import vtab as vtab_lib
from cara_tpu.data.vtab_config import get_task_hparams
from cara_tpu.train import checkpoint as ckpt_lib
from cara_tpu.train import loop as loop_lib
from cara_tpu.train import steps as steps_lib
from cara_tpu.utils.logging import MetricLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--dim", default=32, type=int,
                   help="Number of trainable ranks (CP rank)")
    p.add_argument("--evaluate", default=None, type=str,
                   help="Checkpoint path: evaluate only, then exit")
    p.add_argument("--merged-eval", action="store_true",
                   help="With --evaluate: fold the adapter into the dense "
                        "weights first (merged-weight inference path)")
    common.add_common_args(p)
    return p.parse_args(argv)


def main(argv=None) -> float:
    args = parse_args(argv)
    common.setup_runtime(args)
    print(args)

    hp = get_task_hparams(args.dataset, paper=args.paper_hparams)
    seed = args.seed if args.seed is not None else hp.seed
    print(f"Seed: {seed}")

    num_classes = vtab_lib.get_classes_num(args.dataset)
    mo = common.resolve_model_overrides(args)
    scale, weight_dropout = common.adapter_scale_wd(
        args, hp.scale, hp.weight_dropout)
    model = api.build_model(
        args.model, rank=args.dim, scale=scale, l_mu=hp.init_mean,
        l_std=hp.init_std, num_classes=num_classes, seed=seed,
        backbone_path=args.backbone, delta_impl=args.delta_impl,
        weight_dropout=weight_dropout, model_overrides=mo,
        **common.adapter_impl_kwargs(args))
    train_loader, eval_loader = vtab_lib.get_data(
        args.dataset, root=args.data_root, evaluate=True,
        batch_size=args.batch_size, eval_batch_size=args.eval_batch_size,
        image_size=model.cfg.image_size, seed=seed, synthetic=args.synthetic,
        synthetic_size=args.synthetic_size)

    common.apply_auto_mesh(args, model.cfg, model.cara_cfg)
    pp = common.resolve_pipeline(args)
    mesh = pp[0] if pp else common.resolve_mesh(args.mesh, args.dcn_mesh)
    dtype = common.resolve_dtype(args.dtype)
    logger = MetricLogger(use_wandb=args.wandb, wandb_kwargs={
        "project": "cara-tpu",
        "name": f"LR__{args.dataset}__{args.lr}-Scale_{hp.scale}"
                f"-Rank_{args.dim}",
    } if args.wandb else None, enabled=True)

    if args.evaluate is not None:
        print("Only evaluation")
        from cara_tpu.models import torch_import

        cara_cfg = model.cara_cfg
        if torch_import.is_torch_checkpoint(args.evaluate):
            # Reference-released .pt checkpoint (timm state dict + CP_*,
            # vit_cp.py:168-173): scale/l_mu/l_std come from the task table
            # (already in model.cara_cfg), rank/cp_order from the artifact.
            params, cara_params, info = torch_import.load_torch_checkpoint(
                args.evaluate, model.cfg)
            if cara_params is not None:
                import dataclasses

                cara_cfg = dataclasses.replace(
                    model.cara_cfg, rank=info["rank"],
                    cp_order=info["cp_order"])
        else:
            params, cara_params, meta = ckpt_lib.load_model(args.evaluate)
            if (cara_params is not None and "A1" not in cara_params
                    and "router" not in cara_params):
                # Non-CaRA family (LoRA / FacT / VPT / SSF / BitFit):
                # rebuild method/rank/scale from the artifact meta + tree
                # structure so --method need not be repeated at eval.
                cara_cfg = ckpt_lib.infer_cara_cfg(cara_params, meta)
            elif cara_params is not None and "router" in cara_params:
                # MoE checkpoint: rebuild the routing config from the
                # artifact meta (fit() records dataclasses.asdict of the
                # CaraConfig) so --moe need not be repeated at eval.
                import dataclasses

                cara_cfg = dataclasses.replace(
                    cara_cfg,
                    moe_experts=int(meta.get(
                        "moe_experts",
                        cara_params["router"]["kernel"].shape[-1])),
                    moe_top_k=int(meta.get("moe_top_k", 2)),
                    weight_dropout_impl=meta.get(
                        "weight_dropout_impl", "rank"))
        if args.merged_eval and cara_params is not None:
            from cara_tpu.models.merge import merge_cara

            params = merge_cara(params, cara_params, model.cfg, cara_cfg)
            cara_params = None
        if pp:
            from cara_tpu.train import pp as pp_lib

            eval_step = jax.jit(pp_lib.make_pp_eval_step(
                model.cfg, cara_cfg if cara_params is not None else None,
                mesh, microbatches=pp[2], repeats=pp[3],
                compute_dtype=dtype,
                attn_impl=args.attn_impl, dense_impl=args.dense_impl))
        else:
            eval_step = jax.jit(steps_lib.make_eval_step(
                model.cfg, cara_cfg if cara_params is not None else None,
                compute_dtype=dtype))
        acc = loop_lib.evaluate(
            eval_step, params, cara_params, eval_loader, mesh)
        print(f"Accuracy: {acc}")
        return acc

    print(f"Total parameters: {model.trainable_count}")

    steps_per_epoch = train_loader.steps_per_epoch()
    tx = steps_lib.make_optimizer(
        args.lr, steps_per_epoch, total_epochs=args.epochs)
    frozen, state = steps_lib.init_train_state(
        tx, model.params, model.cara_params,
        method=model.cara_cfg.method)
    keeper = ckpt_lib.BestCheckpointKeeper(args.out_dir, args.dataset, seed)
    fit_cfg = loop_lib.FitConfig(
        epochs=args.epochs, eval_every=10, eval_start=1,
        log_every=args.log_every, lambda_telemetry=hp.logger or args.wandb,
        profile_dir=args.profile_dir, memory_report=args.memory_report,
        resume_dir=args.resume_dir,
        resume_every_steps=args.resume_every_steps)
    state, fit_cfg = loop_lib.maybe_resume(args.resume_dir, state, fit_cfg)

    # Pipeline-parallel steps replace the standard factories; loop.fit
    # keeps its sharding/replication/preemption machinery unchanged.
    train_step, eval_step = common.build_pp_steps(
        pp, model.cfg, model.cara_cfg, tx, dtype, args)

    result = loop_lib.fit(
        cfg=model.cfg, cara_cfg=model.cara_cfg, frozen=frozen, state=state,
        tx=tx, train_loader=train_loader, eval_loader=eval_loader,
        rng=jax.random.key(seed), fit_cfg=fit_cfg, mesh=mesh, logger=logger,
        keeper=keeper, compute_dtype=dtype, remat=False if args.no_remat else "auto",
        grad_accum=args.grad_accum, train_step=train_step,
        eval_step=eval_step,
        attn_impl=args.attn_impl, dense_impl=args.dense_impl,
        fsdp=args.fsdp,
        ckpt_meta={"model": args.model, "dataset": args.dataset,
                   **({"model_overrides": mo} if mo else {})})

    if result.get("preempted"):
        hint = (f"relaunch with --resume-dir {args.resume_dir} to continue"
                if args.resume_dir else
                "no --resume-dir was set; optimizer state was NOT saved")
        print(f"Preempted (SIGTERM) at step {int(result['state'].step)} — "
              f"{hint}")
    print(f"Accuracy: {result['best_acc']}")
    print(f"Throughput: {result['images_per_sec']:.1f} images/sec")
    logger.finish()
    return result["best_acc"]


if __name__ == "__main__":
    main()
