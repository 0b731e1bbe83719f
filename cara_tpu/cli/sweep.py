"""19-task VTAB-1k benchmark sweep runner.

The reference has no sweep driver — each task is a separate manual CLI
invocation (``vit_cp.py`` per dataset).  This runner executes the full
VTAB-1k suite (or a subset) in one process, reusing the loaded backbone and
compiled step functions across tasks wherever shapes allow, and writes a
per-task results JSON + mean summary.

Run:  ``python -m cara_tpu.cli.sweep --tasks cifar,svhn --dim 8``
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

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
    p.add_argument("--dim", default=32, type=int, help="CP rank")
    p.add_argument("--tasks", default="all", type=str,
                   help="'all' or comma-separated VTAB task names")
    p.add_argument("--results", default="vtab_results.json", type=str)
    p.add_argument("--pad-classes", default=0, type=int,
                   help="Pad every task's head to this class count so ALL "
                        "tasks share ONE compiled executable (the true "
                        "count rides in the batch and masks the trailing "
                        "logits — exact math, no per-task recompile; "
                        "19-task VTAB needs >= 397, e.g. 512). 0 = off")
    p.add_argument("--seeds", default=None, type=str,
                   help="Comma-separated seed list: run EVERY task at "
                        "EVERY seed (results keyed task@s<seed>, summary "
                        "adds per-task best) — the paper's per-task seed "
                        "tuning as one sweep. Default: each task's "
                        "reference seed (vtab_config)")
    p.add_argument("--lrs", default=None, type=str,
                   help="Comma-separated learning rates: grid axis "
                        "multiplying tasks x seeds (keys gain @lr<v>; "
                        "summary picks per-task best across the whole "
                        "grid). Each lr compiles its own step pair (the "
                        "schedule is baked into the executable). "
                        "Default: --lr")
    p.add_argument("--scales", default=None, type=str,
                   help="Comma-separated delta scales overriding the "
                        "per-task config scale: grid axis like --lrs "
                        "(keys gain @sc<v>). With --pad-classes the scale "
                        "is a traced operand, so this axis adds ZERO "
                        "recompiles")
    p.add_argument("--task-parallel", default=0, type=int,
                   help="Train N tasks SIMULTANEOUSLY on an N-device (task,) "
                        "mesh — one task per device, stacked adapters, "
                        "shared frozen backbone, zero cross-task "
                        "collectives (train/task_parallel.py). Requires "
                        "--pad-classes. 0 = sequential")
    p.add_argument("--task-data", default=1, type=int,
                   help="data-parallel devices PER task under "
                        "--task-parallel: a (task, data) mesh uses "
                        "task*data devices, splitting each task's batch "
                        "over its data column (exact math; use when tasks "
                        "< devices)")
    p.add_argument("--resume-sweep", action="store_true",
                   help="Skip tasks already present in the results file — "
                        "lets a long (per-task-compile-bound) sweep continue "
                        "across interrupted invocations")
    common.add_common_args(p)
    return p.parse_args(argv)


class _TaskOperandLoader:
    """Stamp the per-task scalars into every batch: the true class count
    (for the padded-head logit mask, ``steps.mask_padded_classes``) and the
    delta scale (``vit_forward(scale_override=...)``).  Both become TRACED
    0-d operands instead of jit specializations, so one compiled
    executable serves every task."""

    def __init__(self, inner, num_real: int, scale: float):
        self._inner = inner
        self._nc = np.int32(num_real)
        self._scale = np.float32(scale)

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def __iter__(self):
        for b in self._inner:
            b = dict(b)
            b["num_classes"] = self._nc
            b["delta_scale"] = self._scale
            yield b


def run_task(task: str, args, results: dict,
             step_cache: dict = None, *, seed: int = None,
             key: str = None, lr: float = None,
             scale: float = None) -> float:
    hp = get_task_hparams(task, paper=args.paper_hparams)
    if seed is None:
        seed = args.seed if args.seed is not None else hp.seed
    eff_lr = args.lr if lr is None else lr
    eff_scale = hp.scale if scale is None else scale
    key = key or task
    num_real = vtab_lib.get_classes_num(task)
    num_classes = max(args.pad_classes, num_real) if args.pad_classes \
        else num_real
    mo = common.resolve_model_overrides(args)
    eff_scale, weight_dropout = common.adapter_scale_wd(
        args, eff_scale, hp.weight_dropout)
    model = api.build_model(
        args.model, rank=args.dim, scale=eff_scale, l_mu=hp.init_mean,
        l_std=hp.init_std, num_classes=num_classes, seed=seed,
        backbone_path=args.backbone, delta_impl=args.delta_impl,
        weight_dropout=weight_dropout, model_overrides=mo,
        **common.adapter_impl_kwargs(args))
    train_loader, eval_loader = vtab_lib.get_data(
        task, root=args.data_root, evaluate=True,
        batch_size=args.batch_size, eval_batch_size=args.eval_batch_size,
        image_size=model.cfg.image_size, seed=seed,
        synthetic=args.synthetic, synthetic_size=args.synthetic_size)
    if args.pad_classes:
        train_loader = _TaskOperandLoader(train_loader, num_real, eff_scale)
        eval_loader = _TaskOperandLoader(eval_loader, num_real, eff_scale)
    tx = steps_lib.make_optimizer(
        eff_lr, train_loader.steps_per_epoch(), total_epochs=args.epochs)
    # Compile sharing: with padded heads + batch-operand class count/scale,
    # the only per-task jit specializations left are the weight-dropout
    # rate and the lr (its schedule is baked into the optimizer) — reuse
    # the jitted step functions across tasks keyed on them.
    train_step = eval_step = None
    if args.pad_classes and step_cache is not None:
        cache_key = (weight_dropout, eff_lr)
        if cache_key not in step_cache:
            mesh = common.resolve_mesh(args.mesh, args.dcn_mesh)
            cd = common.resolve_dtype(args.dtype)
            ts = jax.jit(
                steps_lib.make_train_step(
                    model.cfg, model.cara_cfg, tx, compute_dtype=cd,
                    remat=False if args.no_remat else "auto",
                    attn_impl=args.attn_impl, dense_impl=args.dense_impl,
                    mesh=mesh, grad_accum=args.grad_accum,
                    fsdp=args.fsdp),
                donate_argnums=(0,))
            es = jax.jit(
                steps_lib.make_eval_step(
                    model.cfg, model.cara_cfg, compute_dtype=cd, mesh=mesh,
                    attn_impl=args.attn_impl, dense_impl=args.dense_impl,
                    fsdp=args.fsdp))
            step_cache[cache_key] = (ts, es)
        train_step, eval_step = step_cache[cache_key]
    frozen, state = steps_lib.init_train_state(
        tx, model.params, model.cara_params,
        method=model.cara_cfg.method)
    keeper = ckpt_lib.BestCheckpointKeeper(args.out_dir, task, seed)
    fit_cfg = loop_lib.FitConfig(
        epochs=args.epochs, eval_every=10, eval_start=1,
        log_every=args.log_every)
    t0 = time.time()
    out = loop_lib.fit(
        cfg=model.cfg, cara_cfg=model.cara_cfg, frozen=frozen, state=state,
        tx=tx, train_loader=train_loader, eval_loader=eval_loader,
        rng=jax.random.key(seed), fit_cfg=fit_cfg,
        mesh=common.resolve_mesh(args.mesh, args.dcn_mesh),
        logger=MetricLogger(enabled=False), keeper=keeper,
        train_step=train_step, eval_step=eval_step,
        compute_dtype=common.resolve_dtype(args.dtype),
        remat=False if args.no_remat else "auto", attn_impl=args.attn_impl,
        grad_accum=args.grad_accum,
        dense_impl=args.dense_impl, fsdp=args.fsdp,
        ckpt_meta={"model": args.model, "dataset": task,
                   "num_classes_real": num_real,
                   **({"model_overrides": mo} if mo else {})})
    if out.get("preempted"):
        # The interrupted combo must NOT land in results — --resume-sweep
        # keys on results entries, so recording it would skip it forever.
        raise loop_lib.Preempted(key)
    results[key] = {
        "top1": out["best_acc"],
        "seed": seed,
        "lr": eff_lr,
        "scale": eff_scale,
        "images_per_sec": out["images_per_sec"],
        "minutes": round((time.time() - t0) / 60, 2),
        "ckpt": keeper.best_path,
    }
    return out["best_acc"]


def run_task_group(combos, args, results: dict, step_cache: dict) -> None:
    """Train a group of (task, seed, lr, scale, key) combos simultaneously
    on a (task,) mesh — one combo per device (multi-seed and multi-scale
    sweeps parallelize the same way as multi-task ones: seed and scale are
    traced operands; the lr is uniform within a group by construction —
    ``main`` groups combos by (weight-dropout, lr)).

    The frozen backbone is shared across the group (identical by
    construction when ``--backbone`` points at the pretrained npz — the
    reference always fine-tunes from the same ``ViT-B_16.npz``; in
    synthetic smoke runs the first combo's init is used).  Per-combo
    trainables reproduce ``run_task``'s exact init: the same
    ``jax.random.key(seed)`` 3-way split drives the cara factors (with the
    task's l_mu/l_std) and the head."""
    import dataclasses

    from cara_tpu.models import cara as cara_lib
    from cara_tpu.models import vit as vit_lib
    from cara_tpu.train import task_parallel as tp_lib

    t = len(combos)
    group = [c[0] for c in combos]
    keys = [c[4] or c[0] for c in combos]
    mesh = tp_lib.make_task_mesh(t, data=args.task_data)
    hps = [get_task_hparams(task, paper=args.paper_hparams)
           for task in group]
    seeds = [c[1] if c[1] is not None
             else (args.seed if args.seed is not None else hp.seed)
             for c, hp in zip(combos, hps)]
    eff_lr = args.lr if combos[0][2] is None else combos[0][2]
    eff_scales = [c[3] if c[3] is not None else hp.scale
                  for c, hp in zip(combos, hps)]
    # Method-aware scale/dropout (LoRA: alpha/rank, dropout 0 by default).
    wds = []
    for i, hp in enumerate(hps):
        eff_scales[i], wd_i = common.adapter_scale_wd(
            args, eff_scales[i], hp.weight_dropout)
        wds.append(wd_i)
    num_real = [vtab_lib.get_classes_num(task) for task in group]
    if max(num_real) > args.pad_classes:
        raise ValueError(
            f"--pad-classes {args.pad_classes} < max class count "
            f"{max(num_real)} in group {group}")

    mo = common.resolve_model_overrides(args)
    model = api.build_model(
        args.model, rank=args.dim, scale=eff_scales[0],
        l_mu=hps[0].init_mean, l_std=hps[0].init_std,
        num_classes=args.pad_classes, seed=seeds[0],
        backbone_path=args.backbone, delta_impl=args.delta_impl,
        weight_dropout=wds[0], model_overrides=mo,
        **common.adapter_impl_kwargs(args))
    cfg, cara_cfg = model.cfg, model.cara_cfg
    frozen = {k: v for k, v in model.params.items() if k != "head"}

    trainables, metas, train_ls, eval_ls = [], [], [], []
    for i, (task, hp, seed) in enumerate(zip(group, hps, seeds)):
        cara_cfg_i = dataclasses.replace(
            cara_cfg, scale=eff_scales[i], l_mu=hp.init_mean,
            l_std=hp.init_std, weight_dropout=wds[i])
        if i == 0:
            trainable = {"cara": model.cara_params,
                         "head": model.params["head"]}
        else:
            _, k_cara, k_head = jax.random.split(jax.random.key(seed), 3)
            trainable = {
                "cara": cara_lib.init_cara_params(k_cara, cfg, cara_cfg_i),
                "head": vit_lib.reset_classifier(
                    {}, k_head, cfg, args.pad_classes)["head"],
            }
        trainables.append(trainable)
        metas.append({**dataclasses.asdict(cara_cfg_i),
                      "model": args.model, "dataset": task,
                      "num_classes_real": num_real[i],
                      **({"model_overrides": mo} if mo else {})})
        tr, ev = vtab_lib.get_data(
            task, root=args.data_root, evaluate=True,
            batch_size=args.batch_size,
            eval_batch_size=args.eval_batch_size,
            image_size=cfg.image_size, seed=seed,
            synthetic=args.synthetic, synthetic_size=args.synthetic_size)
        train_ls.append(tr)
        eval_ls.append(ev)

    train_loader = tp_lib.StackedLoader(
        train_ls, num_real, eff_scales, pad_tail=False)
    eval_loader = tp_lib.StackedLoader(
        eval_ls, num_real, eff_scales, pad_tail=True)
    tx = steps_lib.make_optimizer(
        eff_lr, train_ls[0].steps_per_epoch(), total_epochs=args.epochs)
    states = [steps_lib.init_train_state(tx, dict(frozen, head=tr["head"]),
                                         tr["cara"])[1]
              for tr in trainables]
    # One compiled pair per (group size, weight-dropout rate, lr) — all
    # VTAB tasks share rate 0.1, so typically one compile per group size
    # per lr value.
    key = ("tp", t, wds[0], eff_lr)
    if key not in step_cache:
        cd = common.resolve_dtype(args.dtype)
        step_cache[key] = (
            jax.jit(tp_lib.make_task_train_step(
                cfg, cara_cfg, tx, mesh, compute_dtype=cd,
                remat=False if args.no_remat else "auto",
                attn_impl=args.attn_impl, dense_impl=args.dense_impl,
                grad_accum=args.grad_accum), donate_argnums=(0,)),
            jax.jit(tp_lib.make_task_eval_step(
                cfg, cara_cfg, mesh, compute_dtype=cd,
                attn_impl=args.attn_impl, dense_impl=args.dense_impl)))
    train_step, eval_step = step_cache[key]
    keepers = [ckpt_lib.BestCheckpointKeeper(args.out_dir, task, seed)
               for task, seed in zip(group, seeds)]
    fit_cfg = loop_lib.FitConfig(
        epochs=args.epochs, eval_every=10, eval_start=1,
        log_every=args.log_every)
    t0 = time.time()
    out = tp_lib.fit_tasks(
        cfg=cfg, cara_cfg=cara_cfg, frozen=frozen, states=states, tx=tx,
        train_loader=train_loader, eval_loader=eval_loader, seeds=seeds,
        names=keys, fit_cfg=fit_cfg, mesh=mesh, keepers=keepers,
        ckpt_metas=metas, compute_dtype=common.resolve_dtype(args.dtype),
        remat=False if args.no_remat else "auto",
        attn_impl=args.attn_impl, dense_impl=args.dense_impl,
        grad_accum=args.grad_accum, train_step=train_step,
        eval_step=eval_step)
    minutes = round((time.time() - t0) / 60, 2)
    for i, key in enumerate(keys):
        results[key] = {
            "top1": out[key]["best_acc"],
            "seed": seeds[i],
            "lr": eff_lr,
            "scale": eff_scales[i],
            "images_per_sec": out[key]["images_per_sec"],
            "minutes": minutes,
            "ckpt": keepers[i].best_path,
        }
        print(f"{key}: top-1 {out[key]['best_acc']:.4f}")


def main(argv=None):
    args = parse_args(argv)
    if getattr(args, "pipeline", None):
        # Sweeps parallelize across TASKS (--task-parallel), not within one
        # model; a silent no-op flag would hide that nothing was pipelined.
        raise SystemExit(
            "--pipeline is not supported by sweep (use --task-parallel to "
            "spread tasks over devices, or vit_cp/fgvc/dim_experiment for "
            "pipeline parallelism within one model)")
    common.setup_runtime(args)
    tasks = (sorted(vtab_lib.VTAB_TASKS) if args.tasks == "all"
             else args.tasks.split(","))
    seeds = ([int(s) for s in args.seeds.split(",")] if args.seeds
             else [None])
    lrs = ([float(v) for v in args.lrs.split(",")] if args.lrs else [None])
    scales = ([float(v) for v in args.scales.split(",")] if args.scales
              else [None])
    multi_seed = len(seeds) > 1 or args.seeds is not None
    multi_axis = multi_seed or len(lrs) > 1 or len(scales) > 1 \
        or args.lrs is not None or args.scales is not None

    def fmt(v: float) -> str:
        return f"{v:g}"

    def combo_key(task, seed, lr, scale):
        key = task
        if multi_seed and seed is not None:
            key += f"@s{seed}"
        if lr is not None and (len(lrs) > 1 or args.lrs is not None):
            key += f"@lr{fmt(lr)}"
        if scale is not None and (len(scales) > 1
                                  or args.scales is not None):
            key += f"@sc{fmt(scale)}"
        return key

    # (task, seed, lr, scale, results-key) work list — the seed/lr/scale
    # axes multiply the task axis (the paper's per-task hyperparameter
    # search as one sweep; per-task best lands in the summary).
    combos = [(t, s, lr, sc, combo_key(t, s, lr, sc))
              for t in tasks for s in seeds for lr in lrs for sc in scales]
    results: dict = {}
    results_path = os.path.join(args.out_dir, args.results)
    if args.resume_sweep and os.path.exists(results_path):
        with open(results_path) as f:
            results = {k: v for k, v in json.load(f).items()
                       if not k.startswith("__")}
        done = [c for c in combos if c[4] in results]
        combos = [c for c in combos if c[4] not in results]
        if done:
            print(f"resume: {len(done)} run(s) already in "
                  f"{results_path}, {len(combos)} to go")
    step_cache: dict = {}
    if args.task_parallel:
        if not args.pad_classes:
            raise SystemExit("--task-parallel requires --pad-classes (one "
                             "stacked head shape across the group)")
        if args.fsdp:
            raise SystemExit("--fsdp is not supported under --task-parallel "
                             "(the task mesh shares ONE replicated backbone "
                             "across tasks by design)")
        if args.moe:
            raise SystemExit("--moe is not supported under --task-parallel "
                             "(the group step stacks plain adapter trees; "
                             "use --mesh d,1,1,x expert parallelism "
                             "instead)")
        if args.method in ("linear", "full"):
            raise SystemExit(
                f"--method {args.method} is not supported under "
                "--task-parallel (the group step stacks adapter trees over "
                "a shared frozen backbone; linear/full have none — run the "
                "sweep sequentially)")
        import collections

        if args.task_data < 1:
            raise SystemExit("--task-data must be >= 1")
        n = min(args.task_parallel,
                len(jax.devices()) // args.task_data)
        if n < 1:
            raise SystemExit(
                f"--task-data {args.task_data} needs at least that many "
                f"devices ({len(jax.devices())} visible)")
        # Group by (weight-dropout rate, lr) — the two remaining jit
        # specializations (rate is uniform 0.1 across VTAB unless
        # --paper-hparams raises 8 tasks to 0.3; the lr schedule is baked
        # into the optimizer) — then chunk to the mesh
        # size; a short tail group compiles once at its own size.  Seeds
        # and scales are traced operands and never split a group.
        by_rate = collections.defaultdict(list)
        for combo in combos:
            by_rate[(get_task_hparams(
                combo[0], paper=args.paper_hparams).weight_dropout,
                     combo[2])].append(combo)
        for rate_combos in by_rate.values():
            for i in range(0, len(rate_combos), n):
                group = rate_combos[i:i + n]
                print(f"=== task-parallel x{len(group)}: "
                      f"{','.join(c[4] for c in group)} ===")
                run_task_group(group, args, results, step_cache)
                with open(os.path.join(args.out_dir, args.results), "w") as f:
                    json.dump(results, f, indent=1)
    else:
        for task, seed, lr, scale, key in combos:
            print(f"=== {key} ===")
            try:
                acc = run_task(task, args, results, step_cache,
                               seed=seed, key=key, lr=lr, scale=scale)
            except loop_lib.Preempted:
                # SIGTERM (spot-VM reclaim): persist completed combos only
                # and stop — the relaunch picks this combo back up.
                with open(os.path.join(args.out_dir, args.results),
                          "w") as f:
                    json.dump(results, f, indent=1)
                print(f"sweep preempted during {key}; {len(results)} "
                      f"completed run(s) saved — relaunch with "
                      f"--resume-sweep to continue")
                return results
            print(f"{key}: top-1 {acc:.4f}")
            with open(os.path.join(args.out_dir, args.results), "w") as f:
                json.dump(results, f, indent=1)
    accs = [r["top1"] for r in results.values()]
    if not accs:
        print("no tasks to run")
        return results
    summary = {"mean_top1": sum(accs) / len(accs), "tasks": len(accs)}
    if multi_axis:
        # Per-task best across every grid axis (the paper's selection rule).
        best: dict = {}
        for key, row in results.items():
            task = key.split("@")[0]
            if task not in best or row["top1"] > best[task]["top1"]:
                best[task] = {k: row[k] for k in
                              ("top1", "seed", "lr", "scale") if k in row}
        summary["best_per_task"] = best
        summary["mean_best_top1"] = (
            sum(v["top1"] for v in best.values()) / len(best))
    results["__summary__"] = summary
    with open(os.path.join(args.out_dir, args.results), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(summary))
    return results


if __name__ == "__main__":
    main()
