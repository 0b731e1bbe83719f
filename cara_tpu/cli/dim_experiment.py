"""CP-order / rank ablation CLI — counterpart of
``image_classification/dim_experiment.py``.

Surface mirrors the reference (``dim_experiment.py:348-379``): ``--ranks``
(CP rank) and ``--dims`` (CP order in {2,3,4,5}; 4 = published method), plus
the shared flags.  Differences reproduced from the reference ablation driver:
eval every 5 epochs starting at epoch 50 (``dim_experiment.py:60``).

Run:  ``python -m cara_tpu.cli.dim_experiment --dataset=cifar --ranks=16 --dims=3``
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
    p.add_argument("--ranks", default=32, type=int,
                   help="Number of trainable ranks (CP rank)")
    p.add_argument("--dims", default=4, type=int, choices=[2, 3, 4, 5],
                   help="Number of CP factors (tensorisation order)")
    common.add_common_args(p)
    return p.parse_args(argv)


def main(argv=None) -> float:
    args = parse_args(argv)
    if getattr(args, "method", "cara") != "cara":
        raise SystemExit("--method is fixed to cara here: the CP-order "
                         "ablation (--dims) is CaRA-specific; LoRA has no "
                         "order axis (use cli.vit_cp --method lora)")
    common.setup_runtime(args)
    print(args)

    hp = get_task_hparams(args.dataset, paper=getattr(args, 'paper_hparams', False))
    seed = args.seed if args.seed is not None else hp.seed
    num_classes = vtab_lib.get_classes_num(args.dataset)
    mo = common.resolve_model_overrides(args)
    model = api.build_model(
        args.model, rank=args.ranks, scale=hp.scale, l_mu=hp.init_mean,
        l_std=hp.init_std, num_classes=num_classes, seed=seed,
        backbone_path=args.backbone, cp_order=args.dims,
        delta_impl=args.delta_impl, weight_dropout=hp.weight_dropout,
        model_overrides=mo, **common.adapter_impl_kwargs(args))
    train_loader, eval_loader = vtab_lib.get_data(
        args.dataset, root=args.data_root, evaluate=True,
        batch_size=args.batch_size, eval_batch_size=args.eval_batch_size,
        image_size=model.cfg.image_size, seed=seed, synthetic=args.synthetic,
        synthetic_size=args.synthetic_size)

    print(f"Total parameters: {model.trainable_count}")
    common.apply_auto_mesh(args, model.cfg, model.cara_cfg)
    pp = common.resolve_pipeline(args)
    mesh = pp[0] if pp else common.resolve_mesh(args.mesh, args.dcn_mesh)
    dtype = common.resolve_dtype(args.dtype)
    logger = MetricLogger(use_wandb=args.wandb, enabled=True)

    steps_per_epoch = train_loader.steps_per_epoch()
    tx = steps_lib.make_optimizer(
        args.lr, steps_per_epoch, total_epochs=args.epochs)
    frozen, state = steps_lib.init_train_state(
        tx, model.params, model.cara_params,
        method=model.cara_cfg.method)
    keeper = ckpt_lib.BestCheckpointKeeper(args.out_dir, args.dataset, seed)
    # Ablation cadence: every 5 epochs, only from epoch 50
    # (dim_experiment.py:60).
    fit_cfg = loop_lib.FitConfig(
        epochs=args.epochs, eval_every=5, eval_start=50,
        log_every=args.log_every, lambda_telemetry=hp.logger or args.wandb,
        profile_dir=args.profile_dir, memory_report=args.memory_report,
        resume_dir=args.resume_dir,
        resume_every_steps=args.resume_every_steps)
    state, fit_cfg = loop_lib.maybe_resume(args.resume_dir, state, fit_cfg)
    train_step, eval_step = common.build_pp_steps(
        pp, model.cfg, model.cara_cfg, tx, dtype, args)

    result = loop_lib.fit(
        cfg=model.cfg, cara_cfg=model.cara_cfg, frozen=frozen, state=state,
        tx=tx, train_loader=train_loader, eval_loader=eval_loader,
        rng=jax.random.key(seed), fit_cfg=fit_cfg, mesh=mesh, logger=logger,
        keeper=keeper, compute_dtype=dtype, remat=False if args.no_remat else "auto",
        grad_accum=args.grad_accum,
        train_step=train_step, eval_step=eval_step,
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
    logger.finish()
    return result["best_acc"]


if __name__ == "__main__":
    main()
