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
             step_cache: dict = None) -> float:
    hp = get_task_hparams(task)
    seed = args.seed if args.seed is not None else hp.seed
    num_real = vtab_lib.get_classes_num(task)
    num_classes = max(args.pad_classes, num_real) if args.pad_classes \
        else num_real
    model = api.build_model(
        args.model, rank=args.dim, scale=hp.scale, l_mu=hp.init_mean,
        l_std=hp.init_std, num_classes=num_classes, seed=seed,
        backbone_path=args.backbone, delta_impl=args.delta_impl,
        weight_dropout=hp.weight_dropout)
    train_loader, eval_loader = vtab_lib.get_data(
        task, root=args.data_root, evaluate=True,
        batch_size=args.batch_size, eval_batch_size=args.eval_batch_size,
        image_size=model.cfg.image_size, seed=seed,
        synthetic=args.synthetic, synthetic_size=args.synthetic_size)
    if args.pad_classes:
        train_loader = _TaskOperandLoader(train_loader, num_real, hp.scale)
        eval_loader = _TaskOperandLoader(eval_loader, num_real, hp.scale)
    tx = steps_lib.make_optimizer(
        args.lr, train_loader.steps_per_epoch(), total_epochs=args.epochs)
    # Compile sharing: with padded heads + batch-operand class count/scale,
    # the ONLY per-task jit specialization left is the weight-dropout rate
    # — reuse the jitted step functions across tasks keyed on it.
    train_step = eval_step = None
    if args.pad_classes and step_cache is not None:
        key = (hp.weight_dropout,)
        if key not in step_cache:
            mesh = common.resolve_mesh(args.mesh)
            cd = common.resolve_dtype(args.dtype)
            ts = jax.jit(
                steps_lib.make_train_step(
                    model.cfg, model.cara_cfg, tx, compute_dtype=cd,
                    remat=False if args.no_remat else "auto",
                    attn_impl=args.attn_impl, dense_impl=args.dense_impl,
                    mesh=mesh, grad_accum=args.grad_accum),
                donate_argnums=(0,))
            es = jax.jit(
                steps_lib.make_eval_step(
                    model.cfg, model.cara_cfg, compute_dtype=cd, mesh=mesh,
                    attn_impl=args.attn_impl, dense_impl=args.dense_impl))
            step_cache[key] = (ts, es)
        train_step, eval_step = step_cache[key]
    frozen, state = steps_lib.init_train_state(
        tx, model.params, model.cara_params)
    keeper = ckpt_lib.BestCheckpointKeeper(args.out_dir, task, seed)
    fit_cfg = loop_lib.FitConfig(
        epochs=args.epochs, eval_every=10, eval_start=1,
        log_every=args.log_every)
    t0 = time.time()
    out = loop_lib.fit(
        cfg=model.cfg, cara_cfg=model.cara_cfg, frozen=frozen, state=state,
        tx=tx, train_loader=train_loader, eval_loader=eval_loader,
        rng=jax.random.key(seed), fit_cfg=fit_cfg,
        mesh=common.resolve_mesh(args.mesh),
        logger=MetricLogger(enabled=False), keeper=keeper,
        train_step=train_step, eval_step=eval_step,
        compute_dtype=common.resolve_dtype(args.dtype),
        remat=False if args.no_remat else "auto", attn_impl=args.attn_impl,
        grad_accum=args.grad_accum,
        dense_impl=args.dense_impl,
        ckpt_meta={"model": args.model, "dataset": task,
                   "num_classes_real": num_real})
    results[task] = {
        "top1": out["best_acc"],
        "seed": seed,
        "images_per_sec": out["images_per_sec"],
        "minutes": round((time.time() - t0) / 60, 2),
        "ckpt": keeper.best_path,
    }
    return out["best_acc"]


def main(argv=None):
    args = parse_args(argv)
    common.setup_runtime(args)
    tasks = (sorted(vtab_lib.VTAB_TASKS) if args.tasks == "all"
             else args.tasks.split(","))
    results: dict = {}
    results_path = os.path.join(args.out_dir, args.results)
    if args.resume_sweep and os.path.exists(results_path):
        with open(results_path) as f:
            results = {k: v for k, v in json.load(f).items()
                       if not k.startswith("__")}
        done = [t for t in tasks if t in results]
        tasks = [t for t in tasks if t not in results]
        if done:
            print(f"resume: {len(done)} task(s) already in "
                  f"{results_path}, {len(tasks)} to go")
    step_cache: dict = {}
    for task in tasks:
        print(f"=== {task} ===")
        acc = run_task(task, args, results, step_cache)
        print(f"{task}: top-1 {acc:.4f}")
        with open(os.path.join(args.out_dir, args.results), "w") as f:
            json.dump(results, f, indent=1)
    accs = [r["top1"] for r in results.values()]
    if not accs:
        print("no tasks to run")
        return results
    summary = {"mean_top1": sum(accs) / len(accs), "tasks": len(accs)}
    results["__summary__"] = summary
    with open(os.path.join(args.out_dir, args.results), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(summary))
    return results


if __name__ == "__main__":
    main()
