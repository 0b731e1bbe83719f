"""Task-parallel sweep training: T VTAB tasks trained SIMULTANEOUSLY on a
T-device mesh — one task per device, one compiled executable.

The reference's headline workload is the 19-task VTAB-1k sweep (one manual
``vit_cp.py`` invocation per dataset, ``README.rst:40-55``); each task is an
independent small fine-tune of a tiny adapter on a SHARED frozen backbone.
That makes the sweep embarrassingly parallel across tasks — a far better
match for a TPU pod slice than data-parallelism over a bs-64 batch, and a
capability the single-GPU reference cannot express at all.

TPU-native design (rides the round-3 compile-sharing work):

* padded heads (``sweep --pad-classes``) make every task's trainables the
  SAME pytree shape, so per-task states stack into one leading ``task``
  axis; the true class count / delta scale / rng seed become traced ``(T,)``
  operands (``steps.mask_padded_classes``, ``vit_forward(scale_override)``).
* the stacked step runs the UNMODIFIED single-device train step (megakernels
  included, optimizer included) inside ``shard_map`` over a 1-axis
  ``Mesh((devices,), ("task",))`` — zero cross-task collectives, so each
  shard is bit-identical to the sequential run (asserted by
  ``tests/test_task_parallel.py``), and the frozen backbone is replicated
  (HBM cost: one bf16 backbone copy per device, same as data parallelism).
* the frozen backbone is SHARED across tasks (true by construction with a
  pretrained ``--backbone`` npz — the reference always fine-tunes from the
  same ``ViT-B_16.npz``, ``vit_cp.py:115``).

On T devices the whole sweep runs in ~1/T the wall time of the sequential
sweep at identical math; on one device it degrades to the sequential
compile-shared sweep (groups of size 1).

When fewer tasks than devices remain (or the slice is large), task and
data parallelism COMPOSE on a 2-axis ``(task, data)`` mesh
(``make_task_mesh(data=D)``, ``sweep --task-parallel T --task-data D``):
each task's batch splits over D devices with grads pmean'd over the data
axis only — per-task math is independent of the group size (bit-exact)
and semantically identical to a D-device data-parallel run of that task
alone, and all T*D devices stay busy.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cara_tpu.train import steps as steps_lib
from cara_tpu.utils.logging import MetricLogger

TASK_AXIS = "task"
DATA_AXIS = "data"  # matches parallel.mesh.DATA_AXIS (same rng-fold name)


def make_task_mesh(n: Optional[int] = None, devices=None, *,
                   data: int = 1) -> Mesh:
    """(task,) mesh over the first ``n`` devices (default: all).

    ``data > 1`` composes data parallelism INSIDE each task: a 2-axis
    ``(task, data)`` mesh over ``n * data`` devices where every task's
    batch is additionally split over ``data`` devices — so a sweep of T
    tasks on an N-device slice uses all N devices instead of T (e.g. 4
    VTAB tasks on a v5e-8: ``data=2`` halves each task's step time)."""
    devices = list(devices if devices is not None else jax.devices())
    n = n or (len(devices) // data)
    if n * data > len(devices):
        raise ValueError(f"task-parallel {n} x data {data} > "
                         f"{len(devices)} devices")
    if data == 1:
        return Mesh(np.asarray(devices[:n]), (TASK_AXIS,))
    return Mesh(np.asarray(devices[:n * data]).reshape(n, data),
                (TASK_AXIS, DATA_AXIS))


def mesh_data_degree(mesh: Mesh) -> int:
    """Per-task data-parallel degree of a task mesh (1 on a 1-axis mesh)."""
    return mesh.shape.get(DATA_AXIS, 1)


def stack_trees(trees: Sequence[Any]):
    """[per-task pytree] -> one pytree with a leading task axis per leaf."""
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *trees)


def index_tree(tree, i: int):
    """Slice task ``i`` out of a stacked pytree."""
    return jax.tree_util.tree_map(lambda x: x[i], tree)


def put_stacked(mesh: Mesh, tree, *, shard_batch: bool = False):
    """Stacked pytree -> device, leading axis sharded over the task axis.

    ``shard_batch=True`` (batches on a 2-axis task x data mesh): leaves
    with a per-task batch dim — ndim >= 2, i.e. image/label/valid but not
    the (T,) traced operands — are additionally sharded over the data
    axis on dim 1."""
    task_sh = NamedSharding(mesh, P(TASK_AXIS))
    if not (shard_batch and DATA_AXIS in mesh.axis_names):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, task_sh), tree)
    batch_sh = NamedSharding(mesh, P(TASK_AXIS, DATA_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, batch_sh if np.ndim(x) >= 2 else task_sh), tree)


def _squeeze0(tree):
    return jax.tree_util.tree_map(lambda x: x[0], tree)


def _expand0(tree):
    return jax.tree_util.tree_map(lambda x: x[None], tree)


def make_task_train_step(
    cfg,
    cara_cfg,
    tx,
    mesh: Mesh,
    *,
    compute_dtype=None,
    remat="auto",
    attn_impl: str = "auto",
    dense_impl: str = "auto",
    grad_accum: int = 1,
) -> Callable:
    """Stacked train step: (state_T, frozen, batch_T, seeds_T) -> (state_T, metrics_T).

    Every task-stacked input has a leading ``T == mesh task-axis size`` dim;
    ``seeds`` is the per-task ``(T,)`` int32 base-rng seed (the sequential
    run's ``jax.random.key(seed)`` is constructed per shard, so per-task
    randomness — weight-dropout masks, drop-path gates — matches the
    sequential run bit-for-bit).  The body is the unmodified single-device
    ``steps.make_train_step`` including the AdamW update; no collectives
    cross shards.

    On a 2-axis ``(task, data)`` mesh (``make_task_mesh(data=...)``) each
    task's batch is additionally split over the data axis; the inner step
    pmeans grads over ``data`` only (``steps.make_train_step(data_axis=)``)
    with the same rng-folding/reduction semantics as the production
    data-parallel path.  Per-task math is bit-identical across group
    sizes (no cross-task leakage) and matches a standalone DP run to
    compiler-reassociation tolerance (``tests/test_task_parallel.py``).
    """
    dp = mesh_data_degree(mesh)
    inner = steps_lib.make_train_step(
        cfg, cara_cfg, tx, compute_dtype=compute_dtype, remat=remat,
        attn_impl=attn_impl, dense_impl=dense_impl, mesh=None,
        grad_accum=grad_accum, data_axis=DATA_AXIS if dp > 1 else None)

    def body(state, frozen, batch, seeds):
        rng = jax.random.key(seeds[0])
        new_state, metrics = inner(
            _squeeze0(state), frozen, _squeeze0(batch), rng)
        return _expand0(new_state), _expand0(metrics)

    if dp == 1:
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(TASK_AXIS), P(), P(TASK_AXIS), P(TASK_AXIS)),
            out_specs=(P(TASK_AXIS), P(TASK_AXIS)), check_vma=False)

    def run(state, frozen, batch, seeds):
        # Per-leaf batch specs (built per call — the (T,) traced operands
        # ride task-only; leaves with a batch dim split over data too).
        bspecs = jax.tree_util.tree_map(_batch_leaf_spec, batch)
        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(TASK_AXIS), P(), bspecs, P(TASK_AXIS)),
            out_specs=(P(TASK_AXIS), P(TASK_AXIS)), check_vma=False)
        return fn(state, frozen, batch, seeds)

    return run


def _batch_leaf_spec(x):
    return P(TASK_AXIS, DATA_AXIS) if np.ndim(x) >= 2 else P(TASK_AXIS)


def make_task_eval_step(
    cfg,
    cara_cfg,
    mesh: Mesh,
    *,
    compute_dtype=None,
    attn_impl: str = "auto",
    dense_impl: str = "auto",
) -> Callable:
    """Stacked eval step: (frozen, trainable_T, batch_T) -> (correct_T, total_T).

    On a ``(task, data)`` mesh the per-task (correct, total) sums are
    psum'd over the data axis inside the shard (``make_eval_step(data_axis=)``),
    so the returned per-task sums are exact regardless of ``data``.
    """
    dp = mesh_data_degree(mesh)
    inner = steps_lib.make_eval_step(
        cfg, cara_cfg, compute_dtype=compute_dtype, mesh=None,
        attn_impl=attn_impl, dense_impl=dense_impl,
        data_axis=DATA_AXIS if dp > 1 else None)

    def body(frozen, trainable, batch):
        t1 = _squeeze0(trainable)
        params = steps_lib.merge_params(frozen, t1)
        c, t = inner(params, t1["cara"], _squeeze0(batch))
        return c[None], t[None]

    if dp == 1:
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(TASK_AXIS), P(TASK_AXIS)),
            out_specs=(P(TASK_AXIS), P(TASK_AXIS)), check_vma=False)

    def run(frozen, trainable, batch):
        bspecs = jax.tree_util.tree_map(_batch_leaf_spec, batch)
        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(TASK_AXIS), bspecs),
            out_specs=(P(TASK_AXIS), P(TASK_AXIS)), check_vma=False)
        return fn(frozen, trainable, batch)

    return run


class StackedLoader:
    """Zip T per-task loaders into one loader of task-stacked batches.

    Adds the per-task traced operands to every stacked batch:
    ``num_classes`` (T,) int32 true class counts (padded-head logit mask)
    and ``delta_scale`` (T,) float32.  Train loaders must agree on
    steps_per_epoch (VTAB-1k always does: 800 train images, drop_last);
    eval loaders may differ in length — exhausted tasks are padded with
    zero-``valid`` copies of their last batch so accuracy sums are exact.
    """

    def __init__(self, loaders: Sequence[Any], num_classes: Sequence[int],
                 delta_scales: Sequence[float], *, pad_tail: bool):
        assert len(loaders) == len(num_classes) == len(delta_scales)
        self.loaders = list(loaders)
        self._nc = np.asarray(num_classes, np.int32)
        self._scale = np.asarray(delta_scales, np.float32)
        self._pad_tail = pad_tail
        self.batch_size = loaders[0].batch_size
        if not pad_tail:
            spe = {ld.steps_per_epoch() for ld in loaders}
            if len(spe) != 1:
                raise ValueError(
                    f"train loaders disagree on steps_per_epoch: {spe}")

    def steps_per_epoch(self) -> int:
        return max(ld.steps_per_epoch() for ld in self.loaders)

    def __iter__(self):
        its = [iter(ld) for ld in self.loaders]
        lasts: List[Optional[Dict[str, np.ndarray]]] = [None] * len(its)
        while True:
            parts, live = [], 0
            for i, it in enumerate(its):
                b = next(it, None)
                if b is None:
                    if not self._pad_tail or lasts[i] is None:
                        return  # train mode: equal lengths, all end together
                    b = dict(lasts[i])
                    b["valid"] = np.zeros_like(b["valid"])
                else:
                    live += 1
                lasts[i] = b
                parts.append(b)
            if not live:
                return
            out = {k: np.stack([p[k] for p in parts])
                   for k in parts[0].keys()}
            out["num_classes"] = self._nc
            out["delta_scale"] = self._scale
            yield out


def evaluate_tasks(eval_step, frozen_compute, trainable_dev,
                   eval_loader: StackedLoader, mesh: Mesh) -> np.ndarray:
    """Per-task accuracy vector over a stacked eval loader."""
    from cara_tpu.data.vtab import prefetch

    t = len(eval_loader.loaders)
    correct, total = np.zeros(t), np.zeros(t)
    for batch in prefetch(eval_loader,
                          lambda b: put_stacked(mesh, b, shard_batch=True)):
        c, n = eval_step(frozen_compute, trainable_dev, batch)
        correct += np.asarray(jax.device_get(c))
        total += np.asarray(jax.device_get(n))
    return correct / np.maximum(total, 1.0)


def fit_tasks(
    *,
    cfg,
    cara_cfg,
    frozen,
    states: Sequence[steps_lib.TrainState],
    tx,
    train_loader: StackedLoader,
    eval_loader: StackedLoader,
    seeds: Sequence[int],
    names: Sequence[str],
    fit_cfg,
    mesh: Mesh,
    keepers: Optional[Sequence[Any]] = None,
    ckpt_metas: Optional[Sequence[Dict[str, Any]]] = None,
    logger: Optional[MetricLogger] = None,
    compute_dtype=None,
    remat="auto",
    attn_impl: str = "auto",
    dense_impl: str = "auto",
    grad_accum: int = 1,
    train_step: Optional[Callable] = None,
    eval_step: Optional[Callable] = None,
) -> Dict[str, Dict[str, Any]]:
    """Run the reference fine-tuning protocol for T tasks at once.

    Mirrors ``loop.fit`` (eval every ``eval_every`` epochs skipping epoch 0,
    per-task best-checkpoint rotation, final re-eval) with every quantity
    vectorized over the task axis.  Returns {task: {"best_acc", ...}}.
    Unlike ``loop.fit`` there is no SIGTERM watcher here: a preempted
    task-parallel sweep dies with the default handler and recovers at
    GROUP granularity via ``sweep --resume-sweep`` (the whole group is
    one training run — there is no per-task partial state to save).
    ``train_step``/``eval_step`` may be passed in to share one compiled
    executable across task groups (only the weight-dropout rate
    specializes).
    """
    t = len(names)
    logger = logger or MetricLogger(enabled=False)
    dp = mesh_data_degree(mesh)
    for what, b in (("train", train_loader.batch_size),
                    ("eval", eval_loader.batch_size)):
        if b % dp:
            raise ValueError(
                f"{what} batch size {b} not divisible by the task mesh's "
                f"data degree {dp}")
    if train_step is None:
        train_step = jax.jit(make_task_train_step(
            cfg, cara_cfg, tx, mesh, compute_dtype=compute_dtype,
            remat=remat, attn_impl=attn_impl, dense_impl=dense_impl,
            grad_accum=grad_accum), donate_argnums=(0,))
    if eval_step is None:
        eval_step = jax.jit(make_task_eval_step(
            cfg, cara_cfg, mesh, compute_dtype=compute_dtype,
            attn_impl=attn_impl, dense_impl=dense_impl))

    state = put_stacked(mesh, stack_trees(list(states)))
    seeds_dev = jax.device_put(
        np.asarray(seeds, np.int32), NamedSharding(mesh, P(TASK_AXIS)))
    frozen_rep = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), frozen)
    frozen_compute = (steps_lib.cast_floating(frozen_rep, compute_dtype)
                      if compute_dtype is not None else frozen_rep)

    from cara_tpu.data.vtab import prefetch

    best = np.zeros(t)
    bs = train_loader.batch_size
    t0 = time.perf_counter()
    last_metrics = None

    def _maybe_checkpoint(accs: np.ndarray):
        nonlocal best
        improved = [i for i in range(t) if accs[i] > best[i]]
        best = np.maximum(best, accs)
        if keepers is None or not improved:
            return
        host_tr = jax.device_get(state.trainable)
        host_frozen = jax.device_get(frozen_rep)
        for i in improved:
            if keepers[i] is None:
                continue
            tr_i = index_tree(host_tr, i)
            keepers[i].update(
                float(accs[i]),
                steps_lib.merge_params(host_frozen, tr_i), tr_i["cara"],
                meta=(ckpt_metas[i] if ckpt_metas else None))

    for epoch in range(fit_cfg.start_epoch, fit_cfg.epochs):
        for batch in prefetch(train_loader,
                              lambda b: put_stacked(mesh, b,
                                                    shard_batch=True),
                              fit_cfg.prefetch_depth):
            state, metrics = train_step(state, frozen_compute, batch,
                                        seeds_dev)
            last_metrics = metrics
        step = int(jax.device_get(state.step)[0])
        if epoch % fit_cfg.log_every == 0 and last_metrics is not None:
            loss = np.asarray(jax.device_get(last_metrics["loss"]))
            logger.log({"epoch": epoch, "loss": float(loss.mean()),
                        "loss_per_task": [round(float(x), 4) for x in loss]},
                       step=step)
        if (epoch % fit_cfg.eval_every == 0 and epoch != 0
                and epoch >= fit_cfg.eval_start):
            accs = evaluate_tasks(eval_step, frozen_compute,
                                  state.trainable, eval_loader, mesh)
            logger.log({"epoch": epoch,
                        "val_acc_per_task":
                            [round(float(a), 4) for a in accs]}, step=step)
            _maybe_checkpoint(accs)

    steps_total = int(jax.device_get(state.step)[0])
    wall = time.perf_counter() - t0
    accs = evaluate_tasks(eval_step, frozen_compute, state.trainable,
                          eval_loader, mesh)
    _maybe_checkpoint(accs)
    for k in keepers or []:
        if k is not None:
            k.wait()  # join async best-checkpoint writes before return
    imgs_per_sec = steps_total * bs * t / max(wall, 1e-9)
    return {
        names[i]: {
            "best_acc": float(best[i]),
            "final_acc": float(accs[i]),
            "images_per_sec": imgs_per_sec / t,
            "seed": int(seeds[i]),
        }
        for i in range(t)
    }
