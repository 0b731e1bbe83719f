"""Analytic parallelism planner: pick a mesh before burning a compile.

The reference never needs this (one GPU, one 86M-param model —
SURVEY.md §2.6); a TPU framework does: the same training step runs as
pure DP, DPxTP, pipeline (optionally circular), or pipeline x tensor,
and the right choice is a function of model geometry, device count and
per-device HBM.  ``plan_mesh`` walks the strategy ladder cheapest-first
(DP -> smallest TP -> pipeline -> pipeline x tensor) and returns the
first candidate whose estimated per-device footprint fits, with the
estimate itemized so the answer is auditable.

The memory model is ANALYTIC (exact param bytes via ``jax.eval_shape``,
coarse activation coefficients documented inline, no compile).  It aims
at the right *ordering* and ~1.5x absolute accuracy — enough to pick a
mesh; ``verify_plan`` re-checks any candidate against XLA's own
``memory_analysis`` when the current process actually has the devices.

Preference order rationale (why cheapest-first):
- DP's only collective is the once-per-step gradient all-reduce of the
  O(E*r) adapter (~100 KB) — essentially free on ICI.
- TP psums every layer's residual (2 x B*N*E per layer) — fine on ICI,
  but it also shrinks the per-shard GEMMs, so it is only worth paying
  for when weights don't fit.
- Pipeline adds the fill/drain bubble (mitigated by the circular
  schedule, ``parallel/pipeline.py``) and per-tick ppermute traffic;
  it divides *depth*, so it is the lever for backbones whose stacked
  blocks outgrow one chip.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cara_tpu.config import CaraConfig, ViTConfig

_GiB = 2.0**30

# Activation-side calibration: XLA buffer assignment (cotangent liveness,
# fusion workspaces, padding) measured ~3x the itemized activation terms on
# the real chip (v5e, default fused step — estimate_memory docstring).
XLA_TEMP_FACTOR = 3.0


@dataclasses.dataclass(frozen=True)
class MemEstimate:
    """Per-device train-step footprint, bytes (see ``estimate_memory``)."""

    frozen_params: int
    trainable_state: int
    activations: int
    working_set: int
    scores: int

    @property
    def total(self) -> int:
        return (self.frozen_params + self.trainable_state
                + self.activations + self.working_set + self.scores)

    def as_dict(self) -> Dict[str, float]:
        d = dataclasses.asdict(self)
        d["total"] = self.total
        return {k: round(v / _GiB, 3) for k, v in d.items()}


@dataclasses.dataclass(frozen=True)
class Plan:
    kind: str                      # "dp" | "tp" | "pp" | "pp_tp"
    mesh_shape: Tuple[int, ...]    # (data, model) for dp/tp
    pipeline: Optional[Tuple[int, int, int, int]]  # (S, M, T, V)
    memory: MemEstimate
    hbm_bytes: int
    rationale: Tuple[str, ...]
    n_slices: int = 1              # multi-slice (DCN) topology planned for

    @property
    def fits(self) -> bool:
        return self.memory.total <= self.hbm_bytes

    def cli_flags(self) -> str:
        """The training-CLI flags that realize this plan."""
        if self.pipeline is not None:
            s, m, t, v = self.pipeline
            spec = f"{s},{m}" + (f",{t}" if (t > 1 or v > 1) else "") \
                + (f",{v}" if v > 1 else "")
            return f"--pipeline {spec}"
        d, t = self.mesh_shape
        flags = f"--mesh {d},{t}"
        if self.kind in ("fsdp", "fsdp_tp"):
            flags += " --fsdp"
        if self.n_slices > 1:
            flags += f" --dcn-mesh {self.n_slices},1"
        return flags


def _tree_bytes(shapes, per_leaf=None) -> int:
    leaves = jax.tree_util.tree_leaves(shapes)
    if per_leaf is None:
        return sum(int(np.prod(x.shape)) * x.dtype.itemsize for x in leaves)
    return sum(per_leaf(x) for x in leaves)


def _param_shapes(cfg: ViTConfig, cara_cfg: Optional[CaraConfig]):
    """Exact parameter ShapeDtypeStructs without materializing anything."""
    from cara_tpu.models import cara as cara_lib
    from cara_tpu.models import vit as vit_lib

    params = jax.eval_shape(
        lambda: vit_lib.init_vit_params(jax.random.key(0), cfg))
    cara = None
    if cara_cfg is not None:
        cara = jax.eval_shape(
            lambda: cara_lib.init_cara_params(jax.random.key(0), cfg,
                                              cara_cfg))
    return params, cara


def _pad_seq(n: int) -> int:
    """Padded token count (kernels pad N to the 8-sublane boundary; keep a
    single coarse rule here)."""
    return int(np.ceil(n / 8) * 8)


def estimate_memory(
    cfg: ViTConfig,
    cara_cfg: Optional[CaraConfig],
    batch_size: int,
    *,
    dp: int = 1,
    tp: int = 1,
    stages: int = 1,
    microbatches: int = 1,
    fsdp: int = 1,
    compute_dtype=jnp.bfloat16,
    remat: bool = True,
) -> MemEstimate:
    """Per-device peak-HBM estimate for one training step.

    Itemized model (coefficients marked [coarse]):
    - frozen_params: exact fp32 bytes from ``jax.eval_shape``; stacked
      block leaves divide by ``stages`` and (qkv/proj/fc1/fc2 only) by
      ``tp``; non-block leaves (embeddings/head/final-LN) replicate.
      +1 compute-dtype cast copy of the device's shard (the step casts
      frozen weights once per step).
    - trainable_state: adapter + head at fp32 x4 (param, grad, Adam m/v),
      replicated (O(100 KB) for CaRA — never worth sharding).
    - activations: saved residual checkpoints, ``L_local * B_loc * N * E``
      in compute dtype (remat=True saves one boundary per layer; GPipe
      stores the same total across its M microbatches).  remat=False
      multiplies by ~6 [coarse: qkv+scores-softmax+proj+fc1+gelu+fc2].
    - working_set: ONE layer's backward recompute footprint,
      ``~8 * B_micro * N * E`` in compute dtype [coarse].
    - scores: the (B_micro, H, N, N) attention score tensor when the
      full-score path is active; the blockwise online-softmax kernel
      auto-engages past the VMEM cap and removes it (we model the
      switch at N > 512, matching ``models/vit.py``'s auto policy).
    - the three activation-side terms are scaled by ``XLA_TEMP_FACTOR``,
      calibrated against the real-chip ``memory_analysis`` of the default
      fused train step (ViT-B bs64 rank 8 on v5e: raw analytic 0.42 GiB
      of activation terms vs 1.66 GiB measured temps — XLA's buffer
      assignment keeps cotangents and fusion workspaces this model
      doesn't itemize; see benchmarks/RESULTS.md planner section).
    """
    params, cara = _param_shapes(cfg, cara_cfg)
    bc = jnp.dtype(compute_dtype).itemsize
    n_pad = _pad_seq(cfg.seq_len)
    e = cfg.embed_dim

    block_split = {"qkv", "proj", "fc1", "fc2"}

    def frozen_leaf_bytes(path, x) -> int:
        nbytes = int(np.prod(x.shape)) * x.dtype.itemsize
        keys = [getattr(p, "key", None) for p in path]
        if "blocks" in keys:
            nbytes = int(np.ceil(nbytes / stages))
            if any(k in block_split for k in keys):
                # TP and FSDP shard DISJOINT kernel axes (mesh.
                # fsdp_param_specs) so both divisors apply.
                nbytes = int(np.ceil(nbytes / (tp * max(fsdp, 1))))
        return nbytes

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    frozen_fp32 = sum(frozen_leaf_bytes(p, x) for p, x in flat
                     if not (p and getattr(p[0], "key", None) == "head"))
    frozen = frozen_fp32 + int(frozen_fp32 * bc / 4)  # + compute-dtype cast

    head = [x for p, x in flat if p and getattr(p[0], "key", None) == "head"]
    trainable = sum(int(np.prod(x.shape)) * 4 for x in head)
    if cara is not None:
        trainable += _tree_bytes(
            cara, lambda x: int(np.prod(x.shape)) * 4)
    trainable *= 4  # param + grad + adam m + v (all fp32, replicated)

    b_loc = max(1, batch_size // max(dp, 1))
    b_micro = max(1, b_loc // max(microbatches, 1))
    l_local = int(np.ceil(cfg.depth / stages))
    act = l_local * b_loc * n_pad * e * bc * (1 if remat else 6)
    work = 8 * b_micro * n_pad * e * bc
    if fsdp > 1:
        # FSDP's transient all-gathered layer weights (one layer live +
        # one prefetching): qkv+proj+fc1+fc2 of ONE layer in compute dtype.
        layer_w = (4 * e * e + 2 * e * cfg.hidden_dim) // max(tp, 1)
        work += 2 * layer_w * bc
    scores = 0
    if n_pad <= 512:  # full-score path (blockwise kernel past this)
        scores = b_micro * cfg.num_heads * n_pad * n_pad * bc
        if not remat:
            scores *= l_local
    f = XLA_TEMP_FACTOR
    return MemEstimate(int(frozen), int(trainable), int(act * f),
                       int(work * f), int(scores * f))


def _divisors_leq(n: int, cap: int) -> List[int]:
    return [d for d in range(2, cap + 1) if n % d == 0]


def plan_mesh(
    cfg: ViTConfig,
    cara_cfg: Optional[CaraConfig],
    n_devices: int,
    batch_size: int,
    *,
    hbm_gb: float = 16.0,
    compute_dtype=jnp.bfloat16,
    margin: float = 0.85,
    n_slices: int = 1,
) -> Plan:
    """Pick the cheapest parallelism that fits ``margin * hbm_gb`` HBM.

    Ladder: pure DP -> DP x TP (smallest T dividing heads, hidden and the
    device count) -> pipeline (smallest S dividing depth; M maximizing
    microbatch count within the local batch; circular V maximal with
    depth % (S*V) == 0 and V <= 4) -> pipeline x tensor.  Returns the
    last (largest) candidate even when nothing fits, with ``fits=False``
    — callers print the itemized estimate and let the user decide.

    ``n_slices`` > 1 plans for a multi-slice (DCN) topology: the data
    axis crosses the slice boundary (dp/tp plans carry the matching
    ``--dcn-mesh``), TP must divide the PER-SLICE device count so its
    per-layer psums never ride DCN, and pipeline rings are likewise
    constrained to live inside one slice (the per-tick ppermute is an
    ICI-class transfer).
    """
    if n_slices < 1 or n_devices % n_slices:
        raise ValueError(
            f"{n_devices} devices do not split into {n_slices} slices")
    per_slice = n_devices // n_slices
    budget = int(hbm_gb * _GiB * margin)
    hbm = int(hbm_gb * _GiB)
    tried: List[str] = []
    if n_slices > 1:
        tried.append(f"topology: {n_slices} slices x {per_slice} "
                     "devices — model/stage axes kept intra-slice")

    def mem(dp, tp, s, m, fsdp=1):
        return estimate_memory(cfg, cara_cfg, batch_size, dp=dp, tp=tp,
                               stages=s, microbatches=m, fsdp=fsdp,
                               compute_dtype=compute_dtype)

    # Every mesh must cover ALL devices (make_mesh requires it) and the
    # batch must divide over the data axis (put_batch requires it).
    def dp_ok(dp):
        return dp >= 1 and batch_size % dp == 0

    # 1. Pure DP.
    dp = n_devices
    if dp_ok(dp):
        est = mem(dp, 1, 1, 1)
        tried.append(f"dp={dp}: {est.total / _GiB:.2f} GiB")
        if est.total <= budget:
            return Plan("dp", (dp, 1), None, est, hbm, tuple(tried + [
                "pure data parallelism fits: only collective is the "
                "~100KB adapter grad all-reduce"]), n_slices)
    else:
        tried.append(f"dp={dp}: batch {batch_size} does not divide")

    # 2. DP x TP (fused TP needs heads % T == 0 and hidden % T == 0; on a
    # multi-slice topology T must also divide the per-slice count).
    for t in _divisors_leq(n_devices, min(n_devices, 8)):
        if cfg.num_heads % t or cfg.hidden_dim % t or per_slice % t:
            continue
        dp = n_devices // t
        if not dp_ok(dp):
            continue
        est = mem(dp, t, 1, 1)
        tried.append(f"dp={dp},tp={t}: {est.total / _GiB:.2f} GiB")
        if est.total <= budget:
            return Plan("tp", (dp, t), None, est, hbm, tuple(tried + [
                f"tensor parallelism T={t}: per-layer residual psums "
                "stay on ICI; megakernels run per-shard"]), n_slices)

    # 2.5. DP + FSDP: frozen weights sharded over the data axis (ZeRO-3
    # weight streaming, mesh.fsdp_param_specs).  After TP in the ladder:
    # it forfeits the megakernels (XLA impls only — Pallas calls are
    # opaque to GSPMD's weight-gathering strategy) and divides only the
    # frozen bytes, while TP also divides activations.  Before pipeline:
    # no fill/drain bubble.  Optionally composed with TP on the disjoint
    # weight axes.
    for t in [1] + _divisors_leq(n_devices, min(n_devices, 8)):
        if t > 1 and (cfg.num_heads % t or cfg.hidden_dim % t
                      or per_slice % t):
            continue
        dp = n_devices // t
        if dp <= 1 or not dp_ok(dp):
            continue
        # The sharded feature axis is embed_dim on all four block kernels
        # (mesh.fsdp_param_specs); if it doesn't divide, the per-leaf
        # guard leaves them replicated and the estimate would be fiction.
        if cfg.embed_dim % dp:
            continue
        est = mem(dp, t, 1, 1, fsdp=dp)
        kind = "fsdp" if t == 1 else "fsdp_tp"
        tried.append(f"{kind} dp={dp},tp={t}: {est.total / _GiB:.2f} GiB")
        if est.total <= budget:
            return Plan(kind, (dp, t), None, est, hbm, tuple(tried + [
                f"FSDP over dp={dp}: frozen bytes /{dp}, one bf16 weight "
                "all-gather per layer per step (XLA impls)"
                + (f"; XLA TP T={t} on the disjoint axes" if t > 1
                   else "")]), n_slices)

    # 3. Pipeline (optionally circular), then pipeline x tensor.
    best = None
    for t in [1] + _divisors_leq(n_devices, min(n_devices, 8)):
        if t > 1 and (cfg.num_heads % t or cfg.hidden_dim % t):
            continue
        for s in _divisors_leq(cfg.depth, min(cfg.depth, n_devices)):
            # Each S*T stage ring must live inside ONE slice (the per-tick
            # ppermute is an ICI-class transfer); with the slice-major
            # device order this reduces to S*T dividing the per-slice
            # count, since (data-outer) reshape tiles contiguous blocks.
            if n_devices % (s * t) or per_slice % (s * t):
                continue
            dp = n_devices // (s * t)
            if not dp_ok(dp):
                continue
            b_loc = batch_size // dp
            # Most microbatches (smallest bubble) with >= 1 row each.
            m = next((mm for mm in (8, 4, 2, 1)
                      if mm <= b_loc and b_loc % mm == 0), 1)
            v = next((vv for vv in (4, 3, 2)
                      if cfg.depth % (s * vv) == 0 and m >= s), 1)
            est = mem(dp, t, s, m)
            kind = "pp_tp" if t > 1 else "pp"
            tried.append(
                f"{kind} S={s},M={m},T={t},V={v}: "
                f"{est.total / _GiB:.2f} GiB")
            cand = Plan(kind, (dp, t), (s, m, t, v), est, hbm,
                        tuple(tried), n_slices)
            if est.total <= budget:
                bubble = (s - 1) / (m * v + s - 1)
                return dataclasses.replace(cand, rationale=tuple(
                    tried + [f"pipeline S={s} x V={v} laps: fill/drain "
                             f"bubble {bubble:.1%}"
                             + (f"; fused TP T={t} inside each stage"
                                if t > 1 else "")]))
            if best is None or est.total < best.memory.total:
                best = cand
    if best is None:
        best = Plan("dp", (n_devices, 1), None,
                    mem(n_devices, 1, 1, 1), hbm, tuple(tried), n_slices)
    return dataclasses.replace(best, rationale=tuple(
        list(best.rationale)
        + ["NOTHING fits the budget — largest-sharding candidate "
           "returned; lower the batch size or add devices"]))


def verify_plan(plan: Plan, cfg: ViTConfig, cara_cfg: Optional[CaraConfig],
                batch_size: int, compute_dtype=jnp.bfloat16
                ) -> Optional[Dict[str, Any]]:
    """Compile the planned step on the PRESENT devices and return XLA's own
    memory analysis (None when the topology doesn't match or the backend
    lacks the analysis).  Costs one compile."""
    n = int(np.prod(plan.mesh_shape)) * (
        plan.pipeline[0] if plan.pipeline else 1)
    if n != len(jax.devices()):
        return None
    from cara_tpu.parallel import mesh as mesh_lib
    from cara_tpu.train import steps as steps_lib
    from cara_tpu.utils.profiling import memory_report

    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    from cara_tpu.models import cara as cara_lib
    from cara_tpu.models import vit as vit_lib

    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara = (cara_lib.init_cara_params(jax.random.key(1), cfg, cara_cfg)
            if cara_cfg is not None else None)
    frozen, state = steps_lib.init_train_state(tx, params, cara)
    batch = {
        "image": jnp.zeros(
            (batch_size, cfg.image_size, cfg.image_size, 3), jnp.float32),
        "label": jnp.zeros((batch_size,), jnp.int32),
    }
    if plan.pipeline is not None:
        from cara_tpu.parallel.pipeline import make_pp_mesh
        from cara_tpu.train import pp as pp_lib

        s, m, t, v = plan.pipeline
        shape = ((plan.mesh_shape[0], s, t) if t > 1
                 else (plan.mesh_shape[0], s))
        mesh = make_pp_mesh(shape)
        step = jax.jit(pp_lib.make_pp_train_step(
            cfg, cara_cfg, tx, mesh, microbatches=m, repeats=v,
            compute_dtype=compute_dtype))
    else:
        mesh = mesh_lib.make_mesh(plan.mesh_shape)
        fsdp = plan.kind in ("fsdp", "fsdp_tp")
        step = jax.jit(steps_lib.make_train_step(
            cfg, cara_cfg, tx, compute_dtype=compute_dtype, fsdp=fsdp,
            mesh=mesh if (plan.mesh_shape[1] > 1 or fsdp) else None))
        if fsdp:
            frozen = steps_lib.prepare_fsdp_frozen(
                frozen, mesh, tensor_parallel=plan.mesh_shape[1] > 1)
    if plan.pipeline is not None or plan.kind not in ("fsdp", "fsdp_tp"):
        frozen = mesh_lib.put_replicated(mesh, frozen)
    state = mesh_lib.put_replicated(mesh, state)
    batch = mesh_lib.put_batch(mesh, batch)
    return memory_report(step, state, frozen, batch, jax.random.key(0))
