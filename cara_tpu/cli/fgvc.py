"""FGVC fine-tuning CLI (CUB-200 / Stanford Cars / Oxford Flowers / ...).

New surface relative to the reference (which names FGVC in its README but
ships no loader — SURVEY.md section 2.3); protocol mirrors the VTAB CLI with
the FGVC data pipeline (full train split, augmentation) from
:mod:`cara_tpu.data.fgvc`.

Run:  ``python -m cara_tpu.cli.fgvc --dataset=cub2011 --dim=32``
"""

from __future__ import annotations

import argparse

import jax

from cara_tpu import api
from cara_tpu.cli import common
from cara_tpu.data import fgvc as fgvc_lib
from cara_tpu.train import checkpoint as ckpt_lib
from cara_tpu.train import loop as loop_lib
from cara_tpu.train import steps as steps_lib
from cara_tpu.utils.logging import MetricLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    # None = take the per-task default from data.fgvc_config (explicit
    # flags always win, mirroring the VTAB CLI's config-dict precedence).
    p.add_argument("--dim", default=None, type=int, help="CP rank")
    p.add_argument("--scale", default=None, type=float, help="Delta scale s")
    p.add_argument("--init-mean", default=None, type=float)
    p.add_argument("--init-std", default=None, type=float)
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--evaluate", default=None, type=str)
    common.add_common_args(p)
    # lr=None -> per-task default from data.fgvc_config.
    p.set_defaults(dataset="cub2011", data_root="./data/fgvc", epochs=100,
                   lr=None)
    # Replace the VTAB dataset choices with the FGVC registry.
    for a in p._actions:
        if a.dest == "dataset":
            a.choices = sorted(fgvc_lib.FGVC_TASKS)
    return p.parse_args(argv)


def main(argv=None) -> float:
    args = parse_args(argv)
    common.setup_runtime(args)
    from cara_tpu.data.fgvc_config import get_fgvc_hparams

    hp = get_fgvc_hparams(args.dataset)
    if args.dim is None:
        args.dim = hp.dim
    if args.scale is None:
        args.scale = hp.scale
    if args.init_mean is None:
        args.init_mean = hp.init_mean
    if args.init_std is None:
        args.init_std = hp.init_std
    if args.seed is None:
        args.seed = hp.seed
    if args.lr is None:
        args.lr = hp.lr
    print(args)
    seed = args.seed
    num_classes = fgvc_lib.get_classes_num(args.dataset)

    mo = common.resolve_model_overrides(args)
    scale, weight_dropout = common.adapter_scale_wd(
        args, args.scale, hp.weight_dropout)
    model = api.build_model(
        args.model, rank=args.dim, scale=scale, l_mu=args.init_mean,
        l_std=args.init_std, num_classes=num_classes, seed=seed,
        backbone_path=args.backbone, delta_impl=args.delta_impl,
        weight_dropout=weight_dropout, model_overrides=mo,
        **common.adapter_impl_kwargs(args))
    train_loader, eval_loader = fgvc_lib.get_data(
        args.dataset, root=args.data_root, batch_size=args.batch_size,
        eval_batch_size=args.eval_batch_size,
        image_size=model.cfg.image_size, seed=seed,
        augment=not args.no_augment, synthetic=args.synthetic,
        synthetic_size=args.synthetic_size)

    common.apply_auto_mesh(args, model.cfg, model.cara_cfg)
    pp = common.resolve_pipeline(args)
    mesh = pp[0] if pp else common.resolve_mesh(args.mesh, args.dcn_mesh)
    dtype = common.resolve_dtype(args.dtype)
    logger = MetricLogger(use_wandb=args.wandb, enabled=True)

    if args.evaluate is not None:
        params, cara_params, _ = ckpt_lib.load_model(args.evaluate)
        if pp:
            from cara_tpu.train import pp as pp_lib

            eval_step = jax.jit(pp_lib.make_pp_eval_step(
                model.cfg,
                model.cara_cfg if cara_params is not None else None,
                mesh, microbatches=pp[2], repeats=pp[3],
                compute_dtype=dtype,
                attn_impl=args.attn_impl, dense_impl=args.dense_impl))
        else:
            eval_step = jax.jit(steps_lib.make_eval_step(
                model.cfg,
                model.cara_cfg if cara_params is not None else None,
                compute_dtype=dtype))
        acc = loop_lib.evaluate(eval_step, params, cara_params, eval_loader,
                                mesh)
        print(f"Accuracy: {acc}")
        return acc

    print(f"Total parameters: {model.trainable_count}")
    tx = steps_lib.make_optimizer(
        args.lr, train_loader.steps_per_epoch(), total_epochs=args.epochs)
    frozen, state = steps_lib.init_train_state(
        tx, model.params, model.cara_params,
        method=model.cara_cfg.method)
    keeper = ckpt_lib.BestCheckpointKeeper(args.out_dir, args.dataset, seed)
    fit_cfg = loop_lib.FitConfig(
        epochs=args.epochs, eval_every=10, eval_start=1,
        log_every=args.log_every, profile_dir=args.profile_dir,
        memory_report=args.memory_report,
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
