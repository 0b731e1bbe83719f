"""High-level fit/evaluate loops.

Mirrors the reference protocol (``image_classification/vit_cp.py:19-70``):
N epochs over the train loader, eval every ``eval_every`` epochs (skipping
epoch 0), best-checkpoint rotation, and a final re-eval — with TPU-native
mechanics: one jitted train step, sharded batches prefetched to device,
metrics fetched asynchronously, optional profiler tracing, and periodic
orbax resume checkpoints (a capability the reference lacks).

Eval cadence flavors (SURVEY.md section 2.2):
* ``vit_cp.py:57``      — every 10 epochs, epoch != 0      (main CLI)
* ``dim_experiment.py:60`` — every 5 epochs, epoch >= 50   (ablation CLI)
"""

from __future__ import annotations

import contextlib
import dataclasses
import signal
import threading
from typing import Any, Callable, Dict, Optional

import jax

from cara_tpu.data.vtab import BatchLoader, prefetch
from cara_tpu.parallel import mesh as mesh_lib
from cara_tpu.train import checkpoint as ckpt_lib
from cara_tpu.train import steps as steps_lib
from cara_tpu.utils.logging import MetricLogger
from cara_tpu.utils.profiling import trace


@dataclasses.dataclass
class FitConfig:
    epochs: int = 100
    eval_every: int = 10
    eval_start: int = 1          # vit_cp: any epoch != 0; dim_experiment: >= 50
    log_every: int = 10          # steps between metric log lines
    lambda_telemetry: bool = False
    profile_dir: Optional[str] = None
    memory_report: bool = False  # log compiled-step HBM breakdown once
    resume_dir: Optional[str] = None
    resume_every_steps: int = 0  # 0 = disabled
    prefetch_depth: int = 2
    start_epoch: int = 0         # set by auto-resume


class Preempted(RuntimeError):
    """Raised by multi-run drivers (sweep) when ``fit`` returned early on
    SIGTERM — the interrupted run must NOT be recorded as complete, and no
    further runs may start inside the reclaim grace window."""


class _PreemptFlag:
    """Set asynchronously by the signal handler, read at step boundaries."""

    def __init__(self):
        self.fired = False
        self.signum: Optional[int] = None


@contextlib.contextmanager
def preemption_watcher(enabled: bool = True):
    """Catch SIGTERM and flip a flag instead of dying mid-step.

    Spot/preemptible TPU VMs deliver SIGTERM ~30 s before reclaim; ``fit``
    polls the flag at every step boundary, saves a resume checkpoint (when
    ``FitConfig.resume_dir`` is set), and returns cleanly so the relaunched
    job continues via ``maybe_resume``.  The reference has no analog — its
    only resilience artifact is best-checkpoint rotation
    (``vit_cp.py:63-66``); a preempted reference run loses all optimizer
    state.  Handlers are restored on exit; outside the main thread (e.g.
    ``fit`` driven from a server worker) the watcher degrades to a no-op
    because CPython only allows signal registration on the main thread.
    """
    flag = _PreemptFlag()
    if not enabled or threading.current_thread() is not threading.main_thread():
        yield flag
        return

    def _handler(signum, frame):
        flag.fired, flag.signum = True, signum

    prev = signal.signal(signal.SIGTERM, _handler)
    try:
        yield flag
    finally:
        signal.signal(signal.SIGTERM, prev)


def maybe_resume(resume_dir: Optional[str], state, fit_cfg: FitConfig):
    """Restore the newest orbax train-state snapshot (mid-training restart
    for preemptible TPU VMs — a capability the reference lacks entirely,
    SURVEY.md section 5).  Returns (state, fit_cfg) updated in place."""
    if not resume_dir:
        return state, fit_cfg
    last = ckpt_lib.latest_step(resume_dir)
    if last is None:
        return state, fit_cfg
    restored, extra = ckpt_lib.restore_train_state(resume_dir, last, state)
    state = steps_lib.TrainState(
        jax.numpy.asarray(restored.step), restored.trainable,
        restored.opt_state)
    start_epoch = int((extra or {}).get("epoch", 0))
    print(f"[cara_tpu] resumed from {resume_dir} step {last} "
          f"(epoch {start_epoch})")
    return state, dataclasses.replace(fit_cfg, start_epoch=start_epoch)


def evaluate(
    eval_step: Callable,
    params,
    cara_params,
    loader: BatchLoader,
    mesh=None,
) -> float:
    """Accuracy over a loader: sum(correct)/sum(valid) — the plain-mean
    equivalent of the reference's avalanche Accuracy (``vit_cp.py:73-82``)."""
    put = (lambda b: mesh_lib.put_batch(mesh, b)) if mesh is not None else (
        lambda b: b)
    correct = total = 0.0
    for batch in prefetch(loader, put):
        c, t = eval_step(params, cara_params, batch)
        correct += float(c)
        total += float(t)
    return correct / max(total, 1.0)


def fit(
    *,
    cfg,
    cara_cfg,
    frozen,
    state: steps_lib.TrainState,
    tx,
    train_loader: BatchLoader,
    eval_loader: BatchLoader,
    rng: jax.Array,
    fit_cfg: FitConfig = FitConfig(),
    mesh=None,
    logger: Optional[MetricLogger] = None,
    keeper: Optional[ckpt_lib.BestCheckpointKeeper] = None,
    train_step: Optional[Callable] = None,
    eval_step: Optional[Callable] = None,
    compute_dtype=None,
    remat="auto",
    attn_impl: str = "auto",
    dense_impl: str = "auto",
    grad_accum: int = 1,
    fsdp: bool = False,
    ckpt_meta: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Run the fine-tuning protocol; returns summary dict with best accuracy."""
    logger = logger or MetricLogger(enabled=False)
    # Checkpoint metadata: everything export/serving need to rebuild the
    # adapter config (the per-task delta scale spans 0.1-100, so a checkpoint
    # without it cannot be merged correctly — cli/export.py refuses).
    meta = {**dataclasses.asdict(cara_cfg), **(ckpt_meta or {})} \
        if cara_cfg is not None else dict(ckpt_meta or {})
    custom_steps = train_step is not None
    train_step = train_step or jax.jit(
        steps_lib.make_train_step(
            cfg, cara_cfg, tx, compute_dtype=compute_dtype, remat=remat,
            attn_impl=attn_impl, dense_impl=dense_impl, mesh=mesh,
            grad_accum=grad_accum, fsdp=fsdp),
        donate_argnums=(0,))
    eval_step = eval_step or jax.jit(
        steps_lib.make_eval_step(cfg, cara_cfg, compute_dtype=compute_dtype,
                                 mesh=mesh, attn_impl=attn_impl,
                                 dense_impl=dense_impl, fsdp=fsdp))

    put = (lambda b: mesh_lib.put_batch(mesh, b)) if mesh is not None else (
        lambda b: b)
    _tp_fused = _fsdp = False
    _tp = mesh is not None and mesh.shape.get(mesh_lib.MODEL_AXIS, 1) > 1
    _ep = mesh_lib.expert_size(mesh) > 1
    if not custom_steps:
        _, _, _, _tp_fused, _, _fsdp, _ep = steps_lib._resolve_impls(
            attn_impl, dense_impl, cara_cfg, mesh,
            has_cara=cara_cfg is not None, cfg=cfg, fsdp=fsdp)
    elif fsdp:
        # Caller-supplied steps + fsdp=True: the caller promises its steps
        # were built fsdp-aware (e.g. sweep's shared executables); fit only
        # owns the frozen placement.
        _fsdp = mesh is not None and mesh.shape.get(mesh_lib.DATA_AXIS, 1) > 1
    _full = cara_cfg is not None and cara_cfg.method == "full"
    if mesh is not None:
        if _full and (_fsdp or (_tp and not custom_steps)):
            # Full fine-tuning at scale: the memory is the TRAINABLE
            # backbone + its AdamW moments (nothing is frozen) — shard
            # all of it: ZeRO over the data axis (--fsdp) and/or Megatron
            # weight shards over the model axis (steps_lib docs).
            state = steps_lib.prepare_fsdp_trainable_state(
                state, mesh, tensor_parallel=_tp, fsdp=_fsdp)
        else:
            state = mesh_lib.put_replicated(mesh, state)
        if _ep:
            # Expert parallelism: re-place the expert-stacked adapter
            # factors sharded over the expert axis (opt state stays
            # replicated — O(adapter); steps_lib.prepare_moe_trainable).
            state = state._replace(trainable=steps_lib.prepare_moe_trainable(
                state.trainable, mesh))
        # Frozen-backbone placement by strategy.  FSDP: BOTH the fp32
        # original and the compute copy carry the data-axis (ZeRO-3)
        # shardings — a replicated fp32 copy would defeat the memory win
        # (checkpoint paths jax.device_get the global array, which
        # gathers on demand).  XLA TP: Megatron specs on the compute copy
        # (without this the model axis would sit idle — GSPMD only
        # shards what the argument shardings tell it to).  Fused TP keeps
        # replicated-frozen here and reshards via prepare_tp_frozen.
        if _fsdp:
            frozen = steps_lib.prepare_fsdp_frozen(
                frozen, mesh, tensor_parallel=_tp)
        else:
            frozen = mesh_lib.put_replicated(mesh, frozen)
    # Pre-cast the static backbone once; keep the fp32 original for
    # checkpoint artifacts.  The elementwise cast preserves shardings.
    frozen_compute = (steps_lib.cast_floating(frozen, compute_dtype)
                      if compute_dtype is not None else frozen)
    # Fused tensor parallelism: the COMPUTE copy of the backbone gets the
    # head-sharded layout + TP shardings (prepare_tp_frozen); ``frozen``
    # stays in the canonical layout for checkpoint/merge artifacts.
    # Caller-supplied steps own their frozen layout — the pipeline x TP
    # step (train/pp.py) permutes qkv IN-GRAPH from the canonical layout,
    # so preparing here would double-permute.
    if not custom_steps:
        if _tp_fused:
            frozen_compute = steps_lib.prepare_tp_frozen(
                frozen_compute, cfg, mesh)
        elif _tp and not _fsdp and not _full:
            # XLA TP fallback: apply the Megatron weight shardings to the
            # compute copy so the model axis actually participates.
            # (method='full' has an empty frozen tree — its Megatron
            # shardings went onto the TRAINABLE above.)
            from jax.sharding import NamedSharding, PartitionSpec as P

            specs = mesh_lib.vit_param_specs(
                frozen_compute, tensor_parallel=True)
            frozen_compute = jax.tree_util.tree_map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                frozen_compute, specs,
                is_leaf=lambda x: isinstance(x, P))

    best_acc = 0.0
    last_metrics: Dict[str, Any] = {}
    # Throughput from wall time between metric syncs (the float() fetches
    # below force device sync — per-step dispatch timing would be inflated
    # by async execution).
    import time as _time

    sync_t = _time.perf_counter()
    # Start from the restored step so an auto-resumed run never counts
    # pre-resume steps as this run's work.
    sync_step = int(state.step)
    imgs_per_sec = 0.0
    bs = train_loader.batch_size

    mem_reported = not fit_cfg.memory_report
    with trace(fit_cfg.profile_dir), preemption_watcher() as preempt:
        for epoch in range(fit_cfg.start_epoch, fit_cfg.epochs):
            for batch in prefetch(train_loader, put, fit_cfg.prefetch_depth):
                if not mem_reported:
                    # Lower/compile with the loop's own arguments (jit-cache
                    # hit for the real step) and log the HBM breakdown once.
                    from cara_tpu.utils.profiling import memory_report
                    rec = memory_report(
                        train_step, state, frozen_compute, batch, rng)
                    import json as _json
                    print(_json.dumps({"train_step_memory": rec}), flush=True)
                    mem_reported = True
                state, metrics = train_step(state, frozen_compute, batch, rng)
                step = int(state.step)
                if step % fit_cfg.log_every == 0:
                    loss_val = float(metrics["loss"])  # device sync
                    now = _time.perf_counter()
                    if step > sync_step:
                        imgs_per_sec = (step - sync_step) * bs / (now - sync_t)
                    sync_t, sync_step = now, step
                    rec = {"epoch": epoch,
                           "loss": loss_val,
                           "accuracy": float(metrics["accuracy"]),
                           "images_per_sec": imgs_per_sec}
                    if fit_cfg.lambda_telemetry:
                        rec.update(logger.lambda_stats(
                            jax.device_get(state.trainable["cara"])))
                    logger.log(rec, step=step)
                if (fit_cfg.resume_dir and fit_cfg.resume_every_steps
                        and step % fit_cfg.resume_every_steps == 0):
                    ckpt_lib.save_train_state(
                        fit_cfg.resume_dir, step, state, {"epoch": epoch})
                last_metrics = metrics
                if preempt.fired:
                    # SIGTERM mid-epoch: persist the resumable state NOW
                    # (the periodic cadence may be far away or disabled) and
                    # unwind within the spot-VM grace window.
                    if fit_cfg.resume_dir:
                        ckpt_lib.save_train_state(
                            fit_cfg.resume_dir, step, state, {"epoch": epoch})
                    logger.log(
                        {"preempted": True, "epoch": epoch,
                         "resume_saved": bool(fit_cfg.resume_dir)},
                        step=step)
                    break
            if preempt.fired:
                break

            if (epoch % fit_cfg.eval_every == 0 and epoch != 0
                    and epoch >= fit_cfg.eval_start):
                params_now = steps_lib.merge_params(
                    frozen_compute, state.trainable)
                acc = evaluate(
                    eval_step, params_now,
                    state.trainable["cara"] or None,  # {} = linear/full
                    eval_loader, mesh)
                logger.log({"epoch": epoch, "val_acc": acc}, step=int(state.step))
                if acc > best_acc:
                    best_acc = acc
                    if keeper is not None:
                        host_params = jax.device_get(
                            steps_lib.merge_params(frozen, state.trainable))
                        host_cara = (jax.device_get(state.trainable["cara"])
                                     or None)
                        keeper.update(acc, host_params, host_cara, meta=meta)

    # If the log cadence never fired (log_every > total steps), still report
    # an overall wall throughput: sync once and divide by total train time.
    # Only when NO cadence measurement exists — a partial tail window would
    # otherwise overwrite a clean measurement with one polluted by eval
    # passes and checkpoint host transfers.
    step = int(state.step)
    if imgs_per_sec == 0.0 and step > sync_step and last_metrics:
        float(last_metrics["loss"])  # device sync
        now = _time.perf_counter()
        imgs_per_sec = (step - sync_step) * bs / (now - sync_t)

    # Final evaluation on a fresh pass (vit_cp.py:189-196) — skipped when
    # preempted: the SIGTERM grace window is for the state save, not an
    # eval epoch; the relaunched run re-evaluates on its own cadence.
    final_acc = None
    if not preempt.fired:
        params_now = steps_lib.merge_params(frozen_compute, state.trainable)
        final_acc = evaluate(
            eval_step, params_now, state.trainable["cara"] or None,
            eval_loader, mesh)
        if final_acc > best_acc:
            best_acc = final_acc
            if keeper is not None:
                keeper.update(
                    final_acc,
                    jax.device_get(
                        steps_lib.merge_params(frozen, state.trainable)),
                    jax.device_get(state.trainable["cara"]) or None,
                    meta=meta)
    if keeper is not None:
        keeper.wait()  # join the async best-checkpoint write before return
    return {
        "best_acc": best_acc,
        "final_acc": final_acc,
        "state": state,
        "frozen": frozen,
        "images_per_sec": imgs_per_sec,
        "preempted": preempt.fired,
        "last_loss": float(last_metrics["loss"]) if last_metrics else None,
    }
