"""Jitted train / eval steps.

Replaces the reference's eager loop (``vit_cp.py:19-70``: forward,
cross-entropy, backward, AdamW step, per-batch scheduler poke) with a single
compiled function: loss + grads over **only** the trainable leaves (CaRA
factors + classifier head — the functional equivalent of the
``requires_grad=False`` freeze at ``vit_cp.py:176-182``), optax AdamW
(lr 1e-3, wd 1e-4 — ``vit_cp.py:185``), schedule baked into the optimizer,
metrics computed on-device.

The trainable/frozen split also means the optimizer state is O(adapter), not
O(backbone): AdamW moments exist only for ~85K CaRA params + head.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models.vit import vit_forward
from cara_tpu.train.schedule import cara_cosine_schedule

Params = Dict[str, Any]

# ImageNet statistics for on-device normalization of uint8 batches
# (host sends raw resized RGB bytes — 4x less H2D traffic, zero host math).
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def prep_images(x: jax.Array, dtype=None) -> jax.Array:
    """uint8 RGB -> normalized float on device; float inputs pass through
    (already normalized by the host pipeline)."""
    if x.dtype == jnp.uint8:
        dt = dtype or jnp.float32
        mean = jnp.asarray(_IMAGENET_MEAN, dt)
        std = jnp.asarray(_IMAGENET_STD, dt)
        return (x.astype(dt) / 255.0 - mean) / std
    return x if dtype is None else x.astype(dtype)


class TrainState(NamedTuple):
    step: jax.Array                 # scalar int32
    trainable: Params               # {"cara": ..., "head": {...}}
    opt_state: Any


def split_trainable(
    params: Params, cara_params: Params, method: str = "cara"
) -> Tuple[Params, Params]:
    """(frozen_backbone, trainable) — trainable = CP adapter + head, matching
    the reference's name-based freeze ("CP" or "head" in name,
    ``vit_cp.py:176-182``).

    ``method="full"`` (full fine-tuning, the non-adapter control row):
    nothing is frozen — the backbone moves into ``trainable["backbone"]``
    and the frozen tree is empty.  ``method="linear"`` (linear probe) is
    the default split with an empty adapter tree: head-only training.
    """
    frozen = {k: v for k, v in params.items() if k != "head"}
    trainable = {"cara": cara_params, "head": params["head"]}
    if method == "full":
        trainable["backbone"] = frozen
        frozen = {}
    return frozen, trainable


def merge_params(frozen: Params, trainable: Params) -> Params:
    full = dict(frozen)
    full.update(trainable.get("backbone") or {})  # full fine-tuning
    full["head"] = trainable["head"]
    return full


def make_optimizer(
    base_lr: float,
    steps_per_epoch: int,
    total_epochs: int = 100,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    """AdamW with the reference's effective cosine schedule.

    torch AdamW applies weight decay to every param in the group (lambdas and
    biases included) — optax.adamw without a mask matches that.
    """
    sched = cara_cosine_schedule(base_lr, steps_per_epoch, total_epochs)
    return optax.adamw(learning_rate=sched, weight_decay=weight_decay)


def init_train_state(
    tx: optax.GradientTransformation, params: Params, cara_params: Params,
    method: str = "cara",
) -> Tuple[Params, TrainState]:
    frozen, trainable = split_trainable(params, cara_params, method)
    opt_state = tx.init(trainable)
    return frozen, TrainState(jnp.zeros((), jnp.int32), trainable, opt_state)


def cast_floating(tree, dtype):
    """Cast floating leaves (e.g. pre-cast the frozen backbone to bf16 once,
    instead of paying the fp32->bf16 HBM traffic every step)."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)


def _resolve_impls(attn_impl: str, dense_impl: str, cara_cfg, mesh,
                   has_cara: bool = True, cfg: Optional[ViTConfig] = None,
                   fsdp: bool = False):
    """Resolve auto impls and decide the multi-device strategy.

    Pallas kernels are opaque custom calls to GSPMD: with a sharded batch
    the partitioner ALL-GATHERS the batch and replicates the kernel on every
    device (measured: 10 all-gathers in the compiled HLO of one fused
    forward on an 8-device data mesh).  So on a >1-device data mesh the
    fused path runs under ``shard_map`` (per-shard kernels + explicit
    pmean/psum).

    Tensor parallelism (model axis > 1) has two modes (round-3 closes the
    round-2 "TP runs unfused" gap):

    * **fused TP** (default when eligible): the megakernels run on
      head-/hidden-sharded weight slices under ``shard_map``
      (``models.vit._block`` ``tp_axis`` docs for the math).  The caller
      must pass the frozen tree through :func:`prepare_tp_frozen` (fused-qkv
      layout permutation + TP shardings).  Eligibility: both impls resolve
      fused, megakernel geometry (NP <= 512 after padding, zero activation
      dropout), and head/hidden counts divisible by the model-axis size.
    * **XLA TP fallback** otherwise: GSPMD splits the weight GEMMs from
      the ``vit_param_specs`` annotations (correct for every path incl.
      materialized deltas).

    FSDP (``fsdp=True`` on a >1-device data mesh) shards the frozen
    backbone over the data axis (``mesh.fsdp_param_specs``); the Pallas
    kernels are opaque to GSPMD's weight-gathering strategy (and the
    shard_map DP path replicates frozen weights by construction), so FSDP
    forces the XLA impls and stays in GSPMD-land, like sequence
    parallelism.  Memory-for-speed tradeoff: per-device frozen bytes / dp,
    megakernel wins forfeited.

    MoE adapters (``cara_cfg.moe``) force ``dense_impl="xla"`` — the fused
    factor kernels have no expert axis.  On a mesh with an ``expert`` axis
    (expert parallelism, ``models.moe``) everything stays in GSPMD-land:
    XLA impls, no shard_map — the expert-stacked factors shard over that
    axis (``mesh.moe_param_specs``), the batch over (data, expert) jointly.

    Returns (attn_impl, dense_impl, use_shard_map, tp_fused, sp, fsdp, ep).
    """
    from cara_tpu.models.vit import resolve_dense_impl
    from cara_tpu.parallel.mesh import (
        DATA_AXIS, MODEL_AXIS, expert_size as mesh_lib_expert_size,
        seq_size as mesh_lib_seq_size)

    if attn_impl == "auto":
        attn_impl = "fused" if jax.default_backend() == "tpu" else "xla"
    if dense_impl == "auto":
        dense_impl = resolve_dense_impl(has_cara, cara_cfg, cfg, train=True)
    if cara_cfg is not None and cara_cfg.method == "full":
        # Full fine-tuning: gradients must flow to every dense weight.
        # The megakernels' custom VJPs emit NO backbone-weight cotangents
        # (they treat wq/wp/fc* as frozen constants) — a fused train step
        # would silently zero the backbone gradients.
        if dense_impl == "fused":
            raise ValueError(
                "method='full' trains the dense weights; the fused "
                "megakernels' custom VJPs emit no backbone-weight "
                "cotangents — use dense_impl='auto' or 'xla'")
        if attn_impl == "fused":
            # flash differentiates q/k/v (grad-tested); the weight grads
            # flow through the surrounding XLA GEMMs.
            attn_impl = "flash"
    moe = has_cara and cara_cfg is not None and cara_cfg.moe
    if moe:
        dense_impl = "xla"
    ep = mesh_lib_expert_size(mesh) > 1
    if ep:
        if not moe:
            raise ValueError(
                "mesh has an expert axis but the adapter config is not MoE "
                "(cara_cfg.moe_experts <= 1) — drop the axis or pass --moe")
        attn_impl = "xla"
        dense_impl = "xla"
    fsdp = bool(fsdp and mesh is not None
                and mesh.shape.get(DATA_AXIS, 1) > 1)
    if fsdp:
        attn_impl = "xla"
        dense_impl = "xla"
    sp = mesh_lib_seq_size(mesh) > 1
    if sp:
        # Sequence parallelism shards the token axis via GSPMD constraints
        # (vit_forward token_sharding) — the Pallas kernels are opaque to
        # the partitioner, so the whole stack runs on XLA impls, and the
        # step stays in GSPMD-land (no shard_map).
        attn_impl = "xla"
        dense_impl = "xla"
    tp = mesh is not None and mesh.shape.get(MODEL_AXIS, 1) > 1
    tp_fused = False
    if tp and not sp:
        tpn = mesh.shape[MODEL_AXIS]
        geom_ok = (
            cfg is not None
            and cfg.dropout_rate == 0.0 and cfg.attn_dropout_rate == 0.0
            and -(-cfg.seq_len // 128) * 128 <= 512
            and cfg.num_heads % tpn == 0 and cfg.hidden_dim % tpn == 0)
        if attn_impl == "fused" and dense_impl == "fused" and geom_ok:
            tp_fused = True
        else:
            attn_impl = "xla"
            dense_impl = "xla"
    use_shard_map = tp_fused or (
        mesh is not None and not tp and not sp and not fsdp and not ep
        and mesh.shape[DATA_AXIS] > 1
        and (attn_impl != "xla" or dense_impl == "fused"))
    return attn_impl, dense_impl, use_shard_map, tp_fused, sp, fsdp, ep


def mask_padded_classes(logits: jax.Array, batch) -> jax.Array:
    """Mask trailing logit columns when the head is padded past the task's
    true class count.

    Sweep mode pads every task's head to one static ``num_classes`` so ALL
    tasks share one compiled executable (per-task head shapes otherwise
    force a full recompile each — minutes on a cold cache).  The true count
    rides in the batch as a scalar ``batch["num_classes"]`` (a traced
    operand, NOT a Python constant, so it doesn't re-specialize the jit);
    columns past it get dtype-min, which zeroes them out of both the
    softmax cross-entropy and the argmax — exactly the unpadded math.
    """
    nc = batch.get("num_classes")
    if nc is None:
        return logits
    keep = jnp.arange(logits.shape[-1]) < nc
    return jnp.where(keep, logits, jnp.finfo(logits.dtype).min)


def batch_pspecs(batch, data_axis):
    """Per-leaf shard_map/put specs: batch-dim leaves shard on the data
    axis; 0-d leaves (e.g. the padded-class count) replicate."""
    from jax.sharding import PartitionSpec as P

    return jax.tree_util.tree_map(
        lambda x: P(data_axis) if getattr(x, "ndim", 0) else P(), batch)


def prepare_tp_frozen(frozen: Params, cfg: ViTConfig, mesh):
    """Frozen backbone -> fused-TP form: fused-qkv layout permuted for head
    sharding (``mesh.tp_permute_qkv``) and every leaf device_put with its
    Megatron-style ``vit_param_specs`` sharding.  REQUIRED before calling a
    fused-TP train/eval step — the shard_map would otherwise hand the
    kernels mis-laid-out qkv column chunks."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cara_tpu.parallel import mesh as mesh_lib

    frozen = mesh_lib.tp_permute_qkv(frozen, cfg,
                                     mesh.shape[mesh_lib.MODEL_AXIS])
    specs = mesh_lib.vit_param_specs(frozen, tensor_parallel=True)
    return jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
        frozen, specs, is_leaf=lambda x: isinstance(x, P))


def prepare_fsdp_frozen(frozen: Params, mesh, tensor_parallel: bool = False):
    """Frozen backbone -> FSDP form: each large kernel device_put with its
    data-axis (ZeRO-3-style) sharding from ``mesh.fsdp_param_specs``; XLA
    all-gathers one layer's weights per scan iteration inside the step.
    ``tensor_parallel`` composes the Megatron specs on the disjoint axes
    (XLA TP path only — fused TP keeps its own replicated-frozen shard_map)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cara_tpu.parallel import mesh as mesh_lib

    specs = mesh_lib.fsdp_param_specs(
        frozen, mesh.shape[mesh_lib.DATA_AXIS], tensor_parallel)
    return jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
        frozen, specs, is_leaf=lambda x: isinstance(x, P))


def prepare_fsdp_trainable_state(state: "TrainState", mesh,
                                 tensor_parallel: bool = False,
                                 fsdp: bool = True):
    """Full fine-tuning at scale: shard the TRAINABLE backbone and its
    AdamW moments over the mesh.

    For adapter methods FSDP shards the frozen tree (ZeRO-3 weight
    streaming, :func:`prepare_fsdp_frozen`); ``method="full"`` has no
    frozen tree — the memory lives in ``trainable["backbone"]`` plus its
    fp32 optimizer moments (3x model bytes with AdamW).  This places all
    three with the same ``mesh.fsdp_param_specs`` layout:

    * ``fsdp=True``: data-axis (ZeRO) shards — per-device bytes / dp for
      params AND moments, one weight all-gather per layer per step,
      gradients reduce-scattered by GSPMD from the sharded-output layout.
    * ``tensor_parallel=True``: Megatron weight shards on the model axis
      (the production TP recipe for backbones past one chip's HBM) —
      composes with ``fsdp`` on the disjoint axes exactly like the
      frozen-tree case.

    No step-code changes either way — the jit propagates the input
    shardings through the gradients and the elementwise optimizer update.

    The optimizer-state specs are derived structurally: any ``opt_state``
    subtree whose treedef equals the trainable's (optax's mu/nu moment
    trees) gets the trainable specs; every other leaf (step counts etc.)
    replicates.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cara_tpu.parallel import mesh as mesh_lib

    trainable = state.trainable
    backbone = trainable.get("backbone")
    if not backbone:
        raise ValueError(
            "prepare_fsdp_trainable_state expects a full-fine-tuning "
            "trainable tree (method='full', split_trainable's 'backbone' "
            "key); adapter methods shard the frozen tree instead "
            "(prepare_fsdp_frozen)")
    fsdp_size = mesh.shape[mesh_lib.DATA_AXIS] if fsdp else 1
    tr_specs = {
        "backbone": mesh_lib.fsdp_param_specs(
            backbone, fsdp_size, tensor_parallel),
        "cara": jax.tree_util.tree_map(lambda _: P(), trainable["cara"]),
        "head": jax.tree_util.tree_map(lambda _: P(), trainable["head"]),
    }
    tr_treedef = jax.tree_util.tree_structure(trainable)

    def is_tr(x):
        try:
            return jax.tree_util.tree_structure(x) == tr_treedef
        except Exception:
            return False

    opt_specs = jax.tree_util.tree_map(
        lambda sub: tr_specs if is_tr(sub)
        else jax.tree_util.tree_map(lambda _: P(), sub),
        state.opt_state, is_leaf=is_tr)

    def put(tree, specs):
        return jax.tree_util.tree_map(
            lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
            tree, specs, is_leaf=lambda x: isinstance(x, P))

    return TrainState(
        jax.device_put(state.step, NamedSharding(mesh, P())),
        put(trainable, tr_specs), put(state.opt_state, opt_specs))


def prepare_moe_trainable(trainable: Params, mesh):
    """Trainable tree -> expert-parallel placement: the expert-stacked CaRA
    factors shard their leading (X) axis over the mesh's ``expert`` axis
    (``mesh.moe_param_specs``); router and head stay replicated.  XLA
    all-gathers the ~100 KB/expert factors at use and reduce-scatters
    their grads home (``models.moe`` module docs for the roofline
    argument).  Optimizer state stays replicated — it is O(adapter), and
    GSPMD would otherwise re-gather it every update."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cara_tpu.parallel import mesh as mesh_lib

    specs = {"cara": mesh_lib.moe_param_specs(trainable["cara"]),
             "head": jax.tree_util.tree_map(lambda _: P(),
                                            trainable["head"])}
    return jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
        trainable, specs, is_leaf=lambda x: isinstance(x, P))


def make_train_step(
    cfg: ViTConfig,
    cara_cfg: CaraConfig,
    tx: optax.GradientTransformation,
    *,
    remat="auto",
    compute_dtype=None,
    attn_impl: str = "auto",
    dense_impl: str = "auto",
    mesh=None,
    grad_accum: int = 1,
    data_axis=None,
    fsdp: bool = False,
):
    """Build the jittable train step: (state, frozen, batch, rng) -> (state, metrics).

    ``rng`` is a base key; the per-step key is derived by folding in the step
    counter, so a single key drives the whole run deterministically.
    ``compute_dtype`` (e.g. bfloat16) casts the (tiny) trainable leaves and
    the batch for forward/backward while params and optimizer state stay
    fp32; pass ``frozen`` already cast via :func:`cast_floating` — it is
    static across training, so the cast should happen once, not per step.

    ``remat="auto"``: block-level remat is enabled for the XLA dense path
    (measured faster: residual HBM traffic > recompute) but disabled for the
    fused-kernel path, whose custom VJPs already hold the minimal residuals.

    ``grad_accum > 1`` splits the (per-shard) batch into that many
    microbatches scanned sequentially with fp32 gradient averaging —
    large effective batches without the activation HBM of a single pass.
    The weight-dropout masks stay constant across the whole step (one step
    = one mask, reference semantics); per-sample randomness differs per
    microbatch.

    ``data_axis``: name of an ALREADY-ENTERED shard_map mesh axis the step
    body runs under (mutually exclusive with ``mesh`` — that path builds
    its own shard_map).  The step then treats its batch as the per-shard
    slice, pmeans (loss, acc, grads) over the axis before the optimizer
    update, and decorrelates per-sample randomness via the axis index —
    the same reduction/rng semantics as the ``mesh`` data-parallel path,
    but composable inside an outer shard_map (task x data sweeps,
    ``train/task_parallel.py``).
    """
    if data_axis is not None and mesh is not None:
        raise ValueError("data_axis composes inside an outer shard_map; "
                         "pass either mesh or data_axis, not both")
    # fsdp + method='full': the caller (loop.fit) places the TRAINABLE
    # backbone + optimizer moments with the data-axis shardings via
    # prepare_fsdp_trainable_state; the step body is unchanged (GSPMD
    # propagates the shardings through grads and the optimizer update).
    (attn_impl, dense_impl, use_shard_map, tp_fused, sp, _,
     _ep) = _resolve_impls(
        attn_impl, dense_impl, cara_cfg, mesh, cfg=cfg, fsdp=fsdp)
    moe = cara_cfg is not None and cara_cfg.moe
    if remat == "auto":
        remat = dense_impl != "fused"
    tp_axis = None
    if tp_fused:
        from cara_tpu.parallel.mesh import MODEL_AXIS as tp_axis  # noqa: F811
    token_sharding = None
    if sp:
        from jax.sharding import NamedSharding

        from cara_tpu.parallel import mesh as mesh_lib_sp
        token_sharding = NamedSharding(mesh, mesh_lib_sp.token_spec())

    def compute(trainable, frozen, batch, wd_rng, sample_rng):
        """(loss, acc, grads) for one (possibly per-shard) batch."""

        def loss_fn(trainable, mb, srng):
            if compute_dtype is not None:
                trainable = cast_floating(trainable, compute_dtype)
            x = prep_images(mb["image"], compute_dtype)
            p = merge_params(frozen, trainable)
            # Empty adapter tree (methods linear/full) -> the plain
            # backbone forward (vit_forward requires cara/cfg together).
            cara = trainable["cara"] or None
            logits = vit_forward(
                p, x, cfg, cara_params=cara,
                cara_cfg=cara_cfg if cara is not None else None,
                train=True, rng=wd_rng, sample_rng=srng, remat=remat,
                attn_impl=attn_impl, dense_impl=dense_impl,
                tp_axis=tp_axis, scale_override=mb.get("delta_scale"),
                token_sharding=token_sharding,
                return_moe_aux=moe,
            )
            maux = jnp.float32(0.0)
            if moe:
                logits, maux = logits
            # Promote (never downcast): bf16/f16 logits go up to f32 for a
            # stable softmax-CE as before, but an x64 run keeps f64 — the
            # silent f64->f32 downcast was the chaos seed that defeated
            # long-horizon cross-framework trajectory parity
            # (tests/test_torch_grad_parity.py full-protocol test).
            logits = mask_padded_classes(
                logits.astype(jnp.promote_types(logits.dtype,
                                                jnp.float32)), mb)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, mb["label"]).mean()
            if moe:
                # Switch-style load-balance term keeps the router from
                # collapsing onto one expert (models.moe.route docs).
                loss = loss + cara_cfg.moe_aux_coef * maux
            acc = jnp.mean((jnp.argmax(logits, axis=-1)
                            == mb["label"]).astype(jnp.float32))
            return loss, acc

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if grad_accum == 1:
            (loss, acc), grads = grad_fn(trainable, batch, sample_rng)
            return loss, acc, grads

        b = batch["label"].shape[0]
        if b % grad_accum:
            raise ValueError(
                f"per-device batch {b} not divisible by grad_accum="
                f"{grad_accum}")
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape(grad_accum, b // grad_accum, *x.shape[1:]),
            batch)

        def body(acc_carry, xs):
            mb, i = xs
            (loss, a), grads = grad_fn(
                trainable, mb, jax.random.fold_in(sample_rng, i))
            grads = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32), grads)
            l_c, a_c, g_c = acc_carry
            g_c = jax.tree_util.tree_map(jnp.add, g_c, grads)
            return (l_c + loss, a_c + a, g_c), None

        zeros = jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, jnp.float32), trainable)
        (loss, acc, grads), _ = jax.lax.scan(
            body, (jnp.float32(0), jnp.float32(0), zeros),
            (micro, jnp.arange(grad_accum)))
        inv = 1.0 / grad_accum
        grads = jax.tree_util.tree_map(lambda x: x * inv, grads)
        return loss * inv, acc * inv, grads

    if use_shard_map:
        from jax.sharding import PartitionSpec as P

        from cara_tpu.parallel import mesh as mesh_lib
        from cara_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        tpn = mesh.shape[MODEL_AXIS]

        def sharded_compute(trainable, frozen, batch, rng):
            # Weight-dropout masks stay shard-invariant (shared across the
            # global batch, cara.py:35); per-sample randomness decorrelates
            # across shards via the axis index.  Model-axis shards share
            # the sample rng (the drop-path gate must agree across the
            # weight shards whose partial outputs get psum'd).
            srng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
            loss, acc, grads = compute(trainable, frozen, batch, rng, srng)
            if tp_fused:
                # Trainable grads from sliced-factor use sum correctly over
                # the model axis; the head (computed identically on every
                # model shard) would be counted tpn times — rescale.
                grads = jax.lax.psum(grads, MODEL_AXIS)
                grads = dict(grads)
                grads["head"] = jax.tree_util.tree_map(
                    lambda a: a / tpn, grads["head"])
            return jax.lax.pmean((loss, acc, grads), DATA_AXIS)

        def run_sharded(trainable, frozen, batch, rng):
            frozen_specs = (mesh_lib.vit_param_specs(frozen, True)
                            if tp_fused else P())
            fn = jax.shard_map(
                sharded_compute, mesh=mesh,
                in_specs=(P(), frozen_specs,
                          batch_pspecs(batch, DATA_AXIS), P()),
                out_specs=P(), check_vma=False)
            return fn(trainable, frozen, batch, rng)

    def train_step(state: TrainState, frozen: Params, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        if use_shard_map:
            loss, acc, grads = run_sharded(
                state.trainable, frozen, batch, step_rng)
        elif data_axis is not None:
            # Inside an outer shard_map: mirror sharded_compute exactly —
            # shard-invariant weight-dropout rng, per-sample rng folded by
            # the data-axis index, pmean'd grads (bit-identical to the
            # mesh data-parallel path at equal axis size).
            srng = jax.random.fold_in(
                step_rng, jax.lax.axis_index(data_axis))
            loss, acc, grads = compute(
                state.trainable, frozen, batch, step_rng, srng)
            loss, acc, grads = jax.lax.pmean((loss, acc, grads), data_axis)
        else:
            loss, acc, grads = compute(
                state.trainable, frozen, batch, step_rng, step_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        gnorm = optax.global_norm(grads)
        new_state = TrainState(state.step + 1, trainable, opt_state)
        return new_state, {"loss": loss, "accuracy": acc, "grad_norm": gnorm}

    return train_step


def make_eval_step(cfg: ViTConfig, cara_cfg: Optional[CaraConfig] = None,
                   compute_dtype=None, mesh=None, attn_impl: str = "auto",
                   dense_impl: str = "auto", data_axis=None,
                   fsdp: bool = False):
    """(params, cara, batch) -> per-batch (num_correct, num_total).

    Equivalent of the reference eval loop's avalanche ``Accuracy.update``
    (``vit_cp.py:73-82``); accuracy = correct/total accumulated by the caller
    (plain mean(argmax==y), SURVEY.md section 7 "avalanche semantics").
    Supports a ``valid`` mask so padded final batches don't skew accuracy.
    On a >1-device data mesh the fused-kernel forward runs under
    ``shard_map`` (Pallas kernels are opaque to GSPMD — see
    ``_resolve_impls``) and the (correct, total) sums are psum'd.

    ``data_axis``: as in :func:`make_train_step` — the body runs inside an
    ALREADY-ENTERED shard_map and psums (correct, total) over that axis.
    """
    if data_axis is not None and mesh is not None:
        raise ValueError("data_axis composes inside an outer shard_map; "
                         "pass either mesh or data_axis, not both")
    auto_dense = dense_impl == "auto"
    (attn_impl, dense_impl, use_shard_map, tp_fused, sp, _,
     _ep) = _resolve_impls(
        attn_impl, dense_impl, cara_cfg, mesh,
        has_cara=cara_cfg is not None, cfg=cfg, fsdp=fsdp)
    tp_axis = None
    if tp_fused:
        from cara_tpu.parallel.mesh import MODEL_AXIS as tp_axis  # noqa: F811
    token_sharding = None
    if sp:
        from jax.sharding import NamedSharding

        from cara_tpu.parallel import mesh as mesh_lib_sp
        token_sharding = NamedSharding(mesh, mesh_lib_sp.token_spec())

    def eval_step(params: Params, cara_params, batch):
        p, cara = params, cara_params
        # cara_cfg being set doesn't mean THIS call carries an adapter
        # (e.g. merged-weight eval passes cara_params=None): re-resolve an
        # auto dense impl for the plain backbone, which measures faster on
        # XLA dense (resolve_dense_impl).
        from cara_tpu.models.vit import resolve_dense_impl

        di = dense_impl
        if auto_dense and cara is None and not tp_fused:
            # (under fused TP the megakernels must stay engaged — the
            # adapter-less fused_plain path handles cara=None)
            di = resolve_dense_impl(False, None)
        x = prep_images(batch["image"], compute_dtype)
        if compute_dtype is not None:
            p = cast_floating(p, compute_dtype)
            if cara is not None:
                cara = cast_floating(cara, compute_dtype)
        logits = vit_forward(
            p, x, cfg, cara_params=cara,
            cara_cfg=cara_cfg if cara is not None else None, train=False,
            attn_impl=attn_impl, dense_impl=di, tp_axis=tp_axis,
            scale_override=batch.get("delta_scale"),
            token_sharding=token_sharding)
        pred = jnp.argmax(mask_padded_classes(logits, batch), axis=-1)
        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones_like(batch["label"], jnp.float32)
        correct = jnp.sum((pred == batch["label"]).astype(jnp.float32) * valid)
        return correct, jnp.sum(valid)

    if data_axis is not None:
        def axis_eval(params, cara_params, batch):
            c, t = eval_step(params, cara_params, batch)
            return jax.lax.psum((c, t), data_axis)
        return axis_eval

    if not use_shard_map:
        return eval_step

    from jax.sharding import PartitionSpec as P

    from cara_tpu.parallel import mesh as mesh_lib
    from cara_tpu.parallel.mesh import DATA_AXIS

    def sharded_eval(params, cara_params, batch):
        # correct/total agree across model shards (logits are reassembled
        # per layer by the in-forward psum) — reduce over data only.
        c, t = eval_step(params, cara_params, batch)
        return jax.lax.psum((c, t), DATA_AXIS)

    def run(params, cara_params, batch):
        param_specs = (mesh_lib.vit_param_specs(params, True)
                       if tp_fused else P())
        fn = jax.shard_map(
            sharded_eval, mesh=mesh,
            in_specs=(param_specs, P(), batch_pspecs(batch, DATA_AXIS)),
            out_specs=P(), check_vma=False)
        return fn(params, cara_params, batch)

    return run
