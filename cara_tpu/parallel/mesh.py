"""Device mesh + sharding rules (the distributed layer the reference lacks).

Reference accounting (SURVEY.md section 2.6): the reference has **no**
parallelism — one commented-out ``DataParallel`` line
(``image_classification/dim_experiment.py:419``) is its only multi-device
artifact.  The TPU-native equivalent is GSPMD: a ``Mesh`` with a ``data`` axis
(batch sharding — the primary parallelism for this workload) and an optional
``model`` axis (Megatron-style tensor parallelism for ViT-L-class backbones),
with every collective (gradient psum, activation all-reduce) inserted by XLA
from ``NamedSharding`` annotations — no hand-written NCCL analog.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"
EXPERT_AXIS = "expert"

_AXIS_NAMES = (DATA_AXIS, MODEL_AXIS, SEQ_AXIS, EXPERT_AXIS)


def make_mesh(shape=None, devices=None) -> Mesh:
    """Create a (data, model[, seq[, expert]]) mesh.

    Default: all devices on the data axis.  A 3-element shape adds a
    ``seq`` axis for sequence parallelism (token-axis activation sharding —
    high-resolution geometries where the (B, H, NP, NP) score tensor, not
    the batch, is the memory axis; see ``train.steps`` ``seq`` handling).
    A 4-element shape adds an ``expert`` axis for MoE adapters
    (``models.moe``): the expert-stacked factors shard over it, and the
    batch shards over (data, expert) jointly so backbone compute stays
    pure data parallelism (``batch_spec``).
    A 2-element shape builds the classic 2-axis mesh unchanged.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if len(shape) not in (2, 3, 4):
        raise ValueError(f"mesh shape wants 2-4 axes, got {shape}")
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, _AXIS_NAMES[:len(shape)])


def make_hybrid_mesh(shape, dcn_shape, devices=None, slice_of=None) -> Mesh:
    """Multi-slice (ICI x DCN) mesh: same axis names, slice-aware layout.

    ``shape`` gives the TOTAL per-axis sizes exactly like :func:`make_mesh`
    ((data, model) or (data, model, seq)); ``dcn_shape`` (same rank) says
    how much of each axis crosses the slice boundary.  Typically
    ``dcn_shape = (n_slices, 1[, 1])``: the data axis spans slices, so the
    only inter-slice traffic is the once-per-step gradient all-reduce
    (tiny for CaRA — O(E*r) adapter grads), while model/seq collectives
    (per-layer activation psums, k/v gathers) stay on ICI.  Within each
    axis the DCN factor is the OUTER (slower) part, so any (model, seq)
    subgroup lives entirely inside one slice.

    Devices are grouped by their ``slice_index`` attribute (set by the TPU
    runtime on multi-slice deployments); ``slice_of`` overrides the
    grouping key (tests fake slices out of CPU devices with it).  All
    sharding rules in this module apply unchanged — axis names are
    identical, XLA lowers the collectives onto whatever link each subgroup
    actually spans.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if len(shape) != len(dcn_shape):
        raise ValueError(
            f"dcn_shape {dcn_shape} must have the same rank as {shape}")
    if any(s % d for s, d in zip(shape, dcn_shape)):
        raise ValueError(f"dcn_shape {dcn_shape} must divide shape {shape}")
    n = int(np.prod(shape))
    if n != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    if slice_of is None:
        def slice_of(d):
            return getattr(d, "slice_index", None) or 0
    groups: Dict[Any, list] = {}
    for d in devices:
        groups.setdefault(slice_of(d), []).append(d)
    n_slices = int(np.prod(dcn_shape))
    if len(groups) != n_slices:
        raise ValueError(
            f"dcn_shape {dcn_shape} wants {n_slices} slices; devices form "
            f"{len(groups)} (slice ids {sorted(groups)})")
    per = [len(g) for g in groups.values()]
    if len(set(per)) != 1 or per[0] * n_slices != n:
        raise ValueError(f"uneven slices: {per}")
    ici_shape = tuple(s // d for s, d in zip(shape, dcn_shape))
    # (dcn_0.., ici_0..) block array, then interleave (dcn_i, ici_i) pairs
    # so each combined axis i has its DCN factor outermost.
    arr = np.empty(dcn_shape + ici_shape, dtype=object)
    arr = arr.reshape(n_slices, per[0])
    for i, key in enumerate(sorted(groups)):
        arr[i] = groups[key]
    arr = arr.reshape(dcn_shape + ici_shape)
    k = len(shape)
    arr = arr.transpose(*[ax for i in range(k) for ax in (i, k + i)])
    arr = arr.reshape(tuple(shape))
    names = _AXIS_NAMES[:k]
    return Mesh(arr, names)


def seq_size(mesh) -> int:
    """Size of the seq axis (1 when the mesh doesn't carry one)."""
    return mesh.shape.get(SEQ_AXIS, 1) if mesh is not None else 1


def expert_size(mesh) -> int:
    """Size of the expert axis (1 when the mesh doesn't carry one)."""
    return mesh.shape.get(EXPERT_AXIS, 1) if mesh is not None else 1


def token_spec() -> P:
    """Sharding for (B, NP, E) token activations under sequence parallelism:
    batch over data, tokens over seq, features replicated."""
    return P(DATA_AXIS, SEQ_AXIS, None)


def batch_spec(mesh=None) -> P:
    """Leading-axis batch sharding.  On a mesh with an ``expert`` axis the
    batch shards over (data, expert) jointly — the expert axis would
    otherwise replicate backbone compute (the backbone has no expert
    dimension; only the tiny adapter contraction does)."""
    if mesh is not None and expert_size(mesh) > 1:
        return P((DATA_AXIS, EXPERT_AXIS))
    return P(DATA_AXIS)


def moe_param_specs(trainable_cara: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpecs for a ``models.moe`` param tree: every expert-stacked
    factor shards its leading (X) axis over the ``expert`` mesh axis; the
    router (and anything else) stays replicated.  XLA all-gathers the
    ~100 KB/expert factors at use and reduce-scatters their grads home —
    the storage/update form of expert parallelism that is roofline-correct
    at this expert size (``models.moe`` module docs)."""
    specs = {
        "experts": jax.tree_util.tree_map(
            lambda a: P(*((EXPERT_AXIS,) + (None,) * (a.ndim - 1))),
            trainable_cara["experts"]),
        "router": jax.tree_util.tree_map(lambda _: P(),
                                         trainable_cara["router"]),
    }
    return specs


def replicated_spec() -> P:
    return P()


def vit_param_specs(params: Dict[str, Any], tensor_parallel: bool) -> Dict[str, Any]:
    """PartitionSpec pytree matching a ViT param pytree.

    With ``tensor_parallel`` the attention and MLP weights are sharded
    Megatron-style over the ``model`` axis (column-parallel qkv/fc1,
    row-parallel proj/fc2), everything else replicated.  CaRA factors are
    tiny (O(E*r)) and always replicated.
    """

    def rep(tree):
        return jax.tree_util.tree_map(lambda _: P(), tree)

    if not tensor_parallel:
        return rep(params)

    specs = rep(params)
    blocks = {
        "ln1_scale": P(), "ln1_bias": P(),
        # stacked (L, in, out) kernels
        "qkv": {"kernel": P(None, None, MODEL_AXIS), "bias": P(None, MODEL_AXIS)},
        "proj": {"kernel": P(None, MODEL_AXIS, None), "bias": P()},
        "ln2_scale": P(), "ln2_bias": P(),
        "fc1": {"kernel": P(None, None, MODEL_AXIS), "bias": P(None, MODEL_AXIS)},
        "fc2": {"kernel": P(None, MODEL_AXIS, None), "bias": P()},
    }
    specs["blocks"] = blocks
    return specs


def fsdp_param_specs(frozen: Dict[str, Any], fsdp_size: int,
                     tensor_parallel: bool = False) -> Dict[str, Any]:
    """ZeRO-3-style specs for the FROZEN backbone: shard weights over ``data``.

    Plain data parallelism replicates the frozen backbone on every data
    shard — fine for ViT-B (~330 MB), wasteful for ViT-H/g-class backbones.
    FSDP shards each large kernel's *feature* axis over the DATA axis; XLA's
    SPMD partitioner then all-gathers one layer's weights per ``lax.scan``
    iteration (weight streaming) instead of holding ``dp`` full replicas.
    The gathered copy is transient, so per-device frozen bytes drop by the
    data-axis size at the cost of one bf16 weight all-gather per layer per
    step — ICI-cheap relative to the layer's GEMMs.

    The sharded axis is chosen DISJOINT from the tensor-parallel one, so
    FSDP composes with (XLA-path) TP: e.g. the stacked qkv kernel
    ``(L, E, 3E)`` puts ``model`` on the output axis and ``data`` on the
    input axis.  Leaves whose target axis does not divide by ``fsdp_size``
    stay replicated (correctness first — the guard, not the caller, decides
    per-leaf).  The reference has no analog (single GPU, SURVEY.md §2.6);
    this is the jax-native equivalent of torch FSDP / ZeRO-3 applied to the
    frozen-weight streaming case.
    """
    specs = vit_param_specs(frozen, tensor_parallel)
    if fsdp_size <= 1:
        return specs
    # leaf path -> axis to shard over `data` (disjoint from the TP axis).
    plan = {
        ("blocks", "qkv", "kernel"): 1,    # (L, E, 3E): TP on axis 2
        ("blocks", "proj", "kernel"): 2,   # (L, E, E):  TP on axis 1
        ("blocks", "fc1", "kernel"): 1,    # (L, E, H):  TP on axis 2
        ("blocks", "fc2", "kernel"): 2,    # (L, H, E):  TP on axis 1
        ("embed", "kernel"): 0,            # (P*P*C, E)
        ("pre_logits", "kernel"): 0,       # (E, R)
        ("proj_out", "kernel"): 0,         # (E, P)
    }
    for path, axis in plan.items():
        node, spec_node = frozen, specs
        for key in path[:-1]:
            if not isinstance(node, dict) or key not in node:
                node = None
                break
            node, spec_node = node[key], spec_node[key]
        leaf = node.get(path[-1]) if isinstance(node, dict) else None
        if leaf is None or leaf.shape[axis] % fsdp_size:
            continue
        base = spec_node[path[-1]]
        parts = list(base) + [None] * (leaf.ndim - len(base))
        parts[axis] = DATA_AXIS
        spec_node[path[-1]] = P(*parts)
    return specs


def tp_permute_qkv(frozen: Dict[str, Any], cfg, tp: int) -> Dict[str, Any]:
    """Reorder the fused qkv kernel/bias for head-sharded tensor parallelism.

    The stacked qkv kernel's output axis is flattened ``(3, H, Dh)``; a
    contiguous 1/tp chunk of that axis mixes q/k/v segments.  This permutes
    it to ``(tp, 3, H/tp, Dh)`` so that sharding the last axis over the
    ``model`` axis hands each shard a well-formed ``(3, H_local, Dh)``
    fused-qkv layout — the layout ``cara.qkv_uv``'s head-sliced ``v1``
    (``models.vit._tp_slice_qkv_cols``) and the attention megakernel expect.
    proj/fc1/fc2 shard contiguously and need no permutation.
    """
    h, d = cfg.num_heads, cfg.head_dim
    if h % tp:
        raise ValueError(f"num_heads {h} not divisible by tp={tp}")
    hl = h // tp
    qkv = frozen["blocks"]["qkv"]
    k, b = qkv["kernel"], qkv["bias"]
    L, e, e3 = k.shape
    k = k.reshape(L, e, 3, tp, hl, d).transpose(0, 1, 3, 2, 4, 5)
    b = b.reshape(L, 3, tp, hl, d).transpose(0, 2, 1, 3, 4)
    out = dict(frozen)
    out["blocks"] = dict(frozen["blocks"])
    out["blocks"]["qkv"] = {"kernel": k.reshape(L, e, e3),
                            "bias": b.reshape(L, e3)}
    return out


def shardings_for(mesh: Mesh, spec_tree):
    """PartitionSpec pytree -> NamedSharding pytree."""
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def put_batch(mesh: Mesh, batch):
    """Host numpy batch -> device arrays sharded along the data axis.

    Single-process: ``batch`` is the full global batch.  Multi-process
    (``jax.distributed``): ``batch`` is this host's contiguous row chunk
    (``BatchLoader`` yields exactly that) and the global array is assembled
    from per-process shards — no host ever touches another host's rows.
    """
    sh = NamedSharding(mesh, batch_spec(mesh))
    rep = NamedSharding(mesh, P())  # 0-d leaves (e.g. padded-class count)

    def _sh(x):
        return sh if getattr(x, "ndim", 0) else rep

    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(_sh(x), x),
            batch)
    ndata = mesh.shape[DATA_AXIS] * expert_size(mesh)
    leaves = [x for x in jax.tree_util.tree_leaves(batch)
              if getattr(x, "ndim", 0)]
    if leaves and leaves[0].shape[0] % ndata:
        raise ValueError(
            f"batch size {leaves[0].shape[0]} not divisible by the data-axis "
            f"size {ndata}; pick --batch-size/--eval-batch-size as multiples "
            "of the data-parallel degree")
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, _sh(x)), batch)


def put_replicated(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
