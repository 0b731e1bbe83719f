"""Inference / serving path.

The reference's only inference surface is the ``--evaluate`` flag on the
training CLI (``image_classification/vit_cp.py:109-114,168-173``), which
still reconstructs every CP delta per batch.  This module is the deployment
story the TPU build adds (SURVEY.md section 0): load a checkpoint once, fold
the adapter into dense weights (exact in eval mode), jit a fixed-batch
predict function, and serve padded batches of any size — optionally sharded
over a device mesh.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models.merge import merge_cara
from cara_tpu.models.vit import vit_forward
from cara_tpu.train.steps import cast_floating


def _dispatch_batched(call, images, batch_size: int,
                      buckets: Optional[Sequence[int]] = None):
    """Async core of :func:`_batched_apply`: dispatch every chunk through
    ``call`` WITHOUT materializing, and return a zero-arg ``fetch`` that
    blocks on the device and concatenates.  Dispatch-now/fetch-later lets
    a serving pipeline overlap batch N's H2D+compute with batch N-1's
    D2H+resolve (JAX execution is async until the result is read)."""
    n = len(images)
    if n == 0:
        raise ValueError("no images given")
    sizes = sorted(set(buckets or ())) or [batch_size]
    pending = []
    for start in range(0, n, batch_size):
        chunk = np.asarray(images[start:start + batch_size])
        rows = len(chunk)
        size = next((b for b in sizes if b >= rows), batch_size)
        pad = size - rows
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        pending.append((call(chunk), rows, pad))

    def fetch() -> np.ndarray:
        return np.concatenate([
            np.asarray(out[:rows] if pad else out, np.float32)
            for out, rows, pad in pending])

    return fetch


def _batched_apply(call, images, batch_size: int,
                   buckets: Optional[Sequence[int]] = None) -> np.ndarray:
    """Shared any-N inference loop: chunk to ``batch_size``, zero-pad the
    tail, run ``call`` on each chunk, strip pad rows, concatenate.
    Every predictor's ``logits`` routes through here.

    ``buckets`` (sorted, all <= batch_size) pads a short tail to the
    SMALLEST bucket that fits instead of always the full ``batch_size``:
    a 1-image request on a 64-bucket executable pays 64x the H2D bytes
    and ~30x the device time it needs (measured: 0.77 ms at bs1 vs
    24.75 ms at bs64) — serving loads are mostly short batches, so the
    micro-batcher's occupancy, not the configured maximum, should pick
    the executable.  One executable compiles per distinct bucket."""
    return _dispatch_batched(call, images, batch_size, buckets)()


def _resolve_buckets(buckets, batch_size: int, mesh) -> tuple:
    """'auto' -> powers of 4 up to batch_size (1, 4, 16, ..., batch_size):
    at most ~4x padding waste, log4(bs) executables.  None -> the single
    full-size bucket (old behavior).  A mesh forces single-bucket: short
    buckets need not divide the data axis."""
    if mesh is not None or buckets is None:
        return (batch_size,)
    if buckets == "auto":
        out = []
        b = 1
        while b < batch_size:
            out.append(b)
            b *= 4
        return tuple(out) + (batch_size,)
    out = tuple(sorted(set(int(b) for b in buckets)))
    if not out or out[-1] > batch_size or out[0] < 1:
        raise ValueError(
            f"buckets {buckets!r} must be within [1, batch_size="
            f"{batch_size}]")
    return out if out[-1] == batch_size else out + (batch_size,)


class Predictor:
    """Batched image classifier over a merged (or adapter) CaRA model."""

    def __init__(
        self,
        params: Dict[str, Any],
        cfg: ViTConfig,
        *,
        cara_params: Optional[Dict[str, Any]] = None,
        cara_cfg: Optional[CaraConfig] = None,
        merge: bool = True,
        batch_size: int = 64,
        dtype=jnp.bfloat16,
        mesh=None,
        quantize: Optional[str] = None,
        buckets="auto",
        tome_r: int = 0,
    ):
        if merge and cara_params is not None:
            if ("router" in cara_params or "prompts" in cara_params
                    or "mlp_down" in cara_params):
                # MoE adapters are input-dependent (per-token routing),
                # VPT is architectural (learnable prompt tokens), and
                # bottleneck adapters are nonlinear — none fold into dense
                # weights; serve unmerged.
                merge = False
            else:
                params = merge_cara(params, cara_params, cfg, cara_cfg)
                cara_params = cara_cfg = None
        if quantize is not None:
            if quantize not in ("int8", "w8a8"):
                raise ValueError(f"unknown quantize mode {quantize!r}")
            from cara_tpu.models.quant import quantize_block_weights

            # "int8" = weight-only (w8, the legacy name); "w8a8" also
            # quantizes activations per-token and runs the 2x-rate int8
            # MXU path (models/quant.py module docs).  Composes with the
            # unmerged adapter path too: on the XLA dense path the delta
            # adds ON TOP of the frozen matk GEMM (`qkv + delta`,
            # models/vit.py), so only the frozen backbone quantizes and
            # vit_forward's auto resolution drops the fused Pallas
            # kernels (they consume dense arrays).
            params = quantize_block_weights(
                params, mode="w8a8" if quantize == "w8a8" else "w8")
        self.cfg = cfg
        self.batch_size = batch_size
        self.buckets = _resolve_buckets(buckets, batch_size, mesh)
        self._dtype = dtype
        self._mesh = mesh
        params = cast_floating(params, dtype)
        if cara_params is not None:
            cara_params = cast_floating(cara_params, dtype)
        if mesh is not None:
            from cara_tpu.parallel import mesh as mesh_lib

            params = mesh_lib.put_replicated(mesh, params)
            if cara_params is not None:
                cara_params = mesh_lib.put_replicated(mesh, cara_params)
        self._params = params
        self._cara = cara_params
        self._cara_cfg = cara_cfg
        self.tome_r = int(tome_r)

        if self.tome_r > 0:
            # ToMe (models/tome.py): training-free token merging — fewer
            # tokens per layer, ~proportionally fewer eval FLOPs, at the
            # paper's small off-the-shelf accuracy cost.  Dense math only:
            # unmerged adapters (merge=False / MoE) would need the CP delta
            # re-derived per shrinking token set.
            if cara_params is not None:
                raise ValueError(
                    "tome_r requires a dense forward — merge the adapter "
                    "first (merge=True; MoE adapters cannot merge and do "
                    "not compose with ToMe)")
            if mesh is not None:
                raise ValueError(
                    "tome_r does not compose with a serving mesh: the "
                    "argsort/gather merge indices are per-example — shard "
                    "the batch outside the Predictor instead")
            from cara_tpu.models.tome import tome_forward

            tr = self.tome_r

            def fwd(params, cara, x):
                return tome_forward(params, x, cfg, tr)
        else:
            def fwd(params, cara, x):
                return vit_forward(
                    params, x, cfg, cara_params=cara,
                    cara_cfg=cara_cfg if cara is not None else None,
                    train=False)

        self._fwd = jax.jit(fwd)

    @classmethod
    def from_checkpoint(cls, path: str, cfg: ViTConfig,
                        cara_cfg: Optional[CaraConfig] = None, **kw):
        from cara_tpu.train.checkpoint import load_model

        params, cara_params, meta = load_model(path)
        if cara_params is not None and cara_cfg is None:
            from cara_tpu.train.checkpoint import infer_cara_cfg

            cara_cfg = infer_cara_cfg(cara_params, meta)
        return cls(params, cfg, cara_params=cara_params, cara_cfg=cara_cfg,
                   **kw)

    @classmethod
    def from_checkpoint_auto(cls, ckpt: str, model: str,
                             num_classes: Optional[int] = None,
                             scale: Optional[float] = None, **kw):
        """Build from a checkpoint inferring num_classes from the stored
        head and the delta scale/rank/order from checkpoint meta — the
        shared CLI path (predict + serve).  Refuses to default a missing
        scale (per-task scales span 0.1-100, ``vtab_config.py``).

        Accepts the reference's ``.pt`` state dicts too (auto-detected,
        converted in memory like ``vit_cp --evaluate``); those record no
        scale, so ``scale=`` (CLI ``--scale``) is required when one
        carries an adapter."""
        from cara_tpu.config import CaraConfig, get_model_config
        from cara_tpu.models import torch_import
        from cara_tpu.train.checkpoint import load_model

        if torch_import.is_torch_checkpoint(ckpt):
            params, cara_params, info = torch_import.load_torch_checkpoint(
                ckpt, get_model_config(model))
            meta = ({"cp_order": info["cp_order"]}
                    if cara_params is not None else {})
        else:
            params, cara_params, meta = load_model(ckpt)
        if num_classes is None and "head" in params:
            num_classes = int(params["head"]["kernel"].shape[-1])
        # Geometry overrides recorded at training time (--model-override);
        # the stored head fixes num_classes regardless.
        mo = {k: v for k, v in meta.get("model_overrides", {}).items()
              if k != "num_classes"}
        cfg = get_model_config(model, num_classes=num_classes, **mo)
        cara_cfg = None
        if cara_params is not None:
            from cara_tpu.train.checkpoint import infer_cara_cfg

            cara_cfg = infer_cara_cfg(cara_params, meta, scale=scale)
        return cls(params, cfg, cara_params=cara_params, cara_cfg=cara_cfg,
                   **kw)

    def logits(self, images: np.ndarray) -> np.ndarray:
        """(N, H, W, C) -> (N, num_classes); any N (internally padded)."""
        def call(chunk):
            x = jnp.asarray(chunk, self._dtype)
            if self._mesh is not None:
                from cara_tpu.parallel import mesh as mesh_lib

                x = mesh_lib.put_batch(self._mesh, x)
            return self._fwd(self._params, self._cara, x)

        return _batched_apply(call, images, self.batch_size, self.buckets)

    def logits_async(self, images: np.ndarray):
        """Dispatch only; returns a zero-arg fetch() that materializes.
        Lets the server's micro-batcher pipeline device work."""
        def call(chunk):
            x = jnp.asarray(chunk, self._dtype)
            if self._mesh is not None:
                from cara_tpu.parallel import mesh as mesh_lib

                x = mesh_lib.put_batch(self._mesh, x)
            return self._fwd(self._params, self._cara, x)

        return _dispatch_batched(call, images, self.batch_size, self.buckets)

    def warmup(self) -> None:
        """Compile-and-run EVERY bucket executable on zero images so no
        real request ever pays jit compile (minutes on a cold tunneled
        chip — long enough to blow client/server timeouts)."""
        s = self.cfg.image_size
        for b in self.buckets:
            self.logits(np.zeros((b, s, s, 3), np.float32))

    def predict(self, images: np.ndarray) -> np.ndarray:
        return np.argmax(self.logits(images), axis=-1)

    def predict_iter(self, batches: Iterable[Dict[str, np.ndarray]]):
        """Stream over a BatchLoader-style iterator; yields (pred, label,
        valid) numpy triples."""
        for b in batches:
            lg = self.logits(b["image"])
            yield np.argmax(lg, -1), b["label"], b.get(
                "valid", np.ones(len(lg), np.float32))


# ---------------------------------------------------------------------------
# Multi-task serving: one backbone, N adapters, one executable.


class MultiTaskPredictor:
    """Serve N task adapters over ONE shared frozen backbone.

    TPU-native economics: the ViT-B backbone is ~330 MB in HBM while a
    CaRA adapter + head is ~100 KB-3 MB, so serving all 19 VTAB tasks as
    merged models would cost 19x the backbone; this class keeps ONE
    backbone resident plus T stacked adapters and selects the task with a
    **traced** index operand — a single compiled executable serves every
    task (same trick as the padded-head sweep: nothing re-specializes the
    jit).  The reference has no serving surface at all (``--evaluate``
    only, vit_cp.py:109-114); this is the deployment analog of
    ``train/task_parallel.py``'s stacked-adapter training.

    Constraints: all adapters must share the backbone geometry, CP rank
    and CP order (they may differ in delta scale, head width and class
    count — heads are zero-padded to the widest and logits sliced back).
    """

    def __init__(
        self,
        params: Dict[str, Any],
        cfg: ViTConfig,
        tasks: "Dict[str, Dict[str, Any]]",
        *,
        batch_size: int = 64,
        dtype=jnp.bfloat16,
        mesh=None,
        quantize: Optional[str] = None,
        buckets="auto",
    ):
        """``tasks``: ordered ``{name: {"cara": pytree, "head": {kernel,
        bias}, "scale": float, "cp_order": int}}``.  ``mesh``: optional
        device mesh — backbone + stacked adapters replicate, request
        batches shard over the ``data`` axis (same as ``Predictor``).
        ``quantize``: "int8" (weight-only) or "w8a8" (full int8) on the
        SHARED frozen backbone's block kernels — the per-task adapter
        deltas and heads stay full precision and add on top of the
        quantized GEMMs (models/vit.py matk), so one int8 backbone
        serves every task."""
        import dataclasses

        if not tasks:
            raise ValueError("no tasks given")
        if any("router" in t["cara"] for t in tasks.values()):
            raise ValueError(
                "MoE adapter checkpoints cannot join a multi-task group "
                "(the group step stacks plain factor trees); serve them "
                "with their own Predictor")
        names = list(tasks)
        from cara_tpu.models.adapter import is_adapter_params
        from cara_tpu.models.bitfit import is_bitfit_params
        from cara_tpu.models.fact import detect_method
        from cara_tpu.models.lora import is_lora_params
        from cara_tpu.models.ssf import is_ssf_params
        from cara_tpu.models.vpt import is_vpt_params

        def family(tree):
            if is_lora_params(tree):
                return "lora"
            if is_vpt_params(tree) or is_ssf_params(tree) \
                    or is_bitfit_params(tree) or is_adapter_params(tree):
                raise ValueError(
                    "multi-task groups stack low-rank factor trees "
                    "(cara/lora/fact); serve VPT/SSF/BitFit/bottleneck-"
                    "adapter checkpoints with their own Predictor each")
            return detect_method(tree) or "cara"

        families = {family(t["cara"]) for t in tasks.values()}
        if len(families) > 1:
            raise ValueError(
                "cannot stack adapters of different families "
                f"({sorted(families)}) in one multi-task group (the trees "
                "differ in structure); serve each family in its own group")
        method = families.pop()
        lora = method == "lora"
        if lora:
            ranks = {int(t["cara"]["qkv"]["a"].shape[-1])
                     for t in tasks.values()}
            orders = {4}  # unused for LoRA
        elif method.startswith("fact"):
            ranks = {int(t["cara"]["U"].shape[-1]) for t in tasks.values()}
            orders = {4}  # unused for FacT
        else:
            ranks = {int(t["cara"]["R1"].shape[0]) for t in tasks.values()}
            orders = {int(t.get("cp_order", 4)) for t in tasks.values()}
        if len(ranks) != 1 or len(orders) != 1:
            raise ValueError(
                f"adapters must share CP rank/order to stack; got ranks="
                f"{sorted(ranks)} orders={sorted(orders)}")
        self._num_classes = {
            n: int(t["head"]["kernel"].shape[-1]) for n, t in tasks.items()}
        cmax = max(self._num_classes.values())

        def pad_head(h):
            k, b = np.asarray(h["kernel"]), np.asarray(h["bias"])
            pk = np.zeros((k.shape[0], cmax), k.dtype)
            pk[:, :k.shape[1]] = k
            pb = np.zeros((cmax,), b.dtype)
            pb[:b.shape[0]] = b
            return pk, pb

        heads = [pad_head(t["head"]) for t in tasks.values()]
        hk = jnp.asarray(np.stack([h[0] for h in heads]), dtype)
        hb = jnp.asarray(np.stack([h[1] for h in heads]), dtype)
        stacked_cara = jax.tree_util.tree_map(
            lambda *ls: jnp.stack([jnp.asarray(x, dtype) for x in ls]),
            *[t["cara"] for t in tasks.values()])
        scales = jnp.asarray([float(t["scale"]) for t in tasks.values()],
                             jnp.float32)
        base = {k: v for k, v in params.items() if k != "head"}
        if quantize is not None:
            if quantize not in ("int8", "w8a8"):
                raise ValueError(f"unknown quantize mode {quantize!r}")
            from cara_tpu.models.quant import quantize_block_weights

            base = quantize_block_weights(
                base, mode="w8a8" if quantize == "w8a8" else "w8")
        base = cast_floating(base, dtype)
        cfg = dataclasses.replace(cfg, num_classes=cmax)
        fact_rl = (int(next(iter(tasks.values()))["cara"]["C"].shape[0])
                   if method == "fact_tk" else 0)
        cara_cfg = CaraConfig(method=method,
                              rank=ranks.pop(), scale=1.0,
                              cp_order=orders.pop(),
                              fact_core_rank=fact_rl,
                              weight_dropout=0.1 if method == "cara"
                              else 0.0)
        self.cfg = cfg
        self.batch_size = batch_size
        self.buckets = _resolve_buckets(buckets, batch_size, mesh)
        self.names = names
        self._tid = {n: i for i, n in enumerate(names)}
        self._dtype = dtype
        self._mesh = mesh
        if mesh is not None:
            from cara_tpu.parallel import mesh as mesh_lib

            base, stacked_cara, hk, hb, scales = (
                mesh_lib.put_replicated(mesh, t)
                for t in (base, stacked_cara, hk, hb, scales))

        def fwd(x, tid):
            cara = jax.tree_util.tree_map(lambda a: a[tid], stacked_cara)
            p = dict(base, head={"kernel": hk[tid], "bias": hb[tid]})
            return vit_forward(
                p, x.astype(dtype), cfg, cara_params=cara,
                cara_cfg=cara_cfg, train=False,
                scale_override=scales[tid]).astype(jnp.float32)

        self._fwd = jax.jit(fwd)

    @classmethod
    def from_checkpoints(cls, ckpts: "Dict[str, str]", model,
                         backbone: Optional[str] = None, **kw):
        """``ckpts``: {task_name: path} of full and/or adapter-only
        ``.npz`` checkpoints.  ``model``: registry name or a ViTConfig.
        The shared backbone comes from ``backbone`` (npz) or the first
        full checkpoint; every checkpoint must record its delta scale
        (per-task scales span 0.1-100)."""
        from cara_tpu.config import get_model_config
        from cara_tpu.models import npz as npz_lib
        from cara_tpu.train.checkpoint import (
            is_adapter_checkpoint, load_adapter, load_model)

        params = None
        model_names = {}
        tasks: Dict[str, Dict[str, Any]] = {}
        for name, path in ckpts.items():
            if is_adapter_checkpoint(path):
                cara, head, meta = load_adapter(path)
            else:
                full, cara, meta = load_model(path)
                head = full.get("head")
                if params is None:
                    params = full
            if meta.get("model"):
                model_names[name] = meta["model"]
            if cara is None or head is None:
                raise ValueError(f"{path}: need an adapter + head for "
                                 f"task {name!r}")
            if "scale" not in meta:
                raise ValueError(f"{path}: checkpoint records no delta "
                                 "scale — re-export with meta or use "
                                 "single-task Predictor(scale=...)")
            tasks[name] = {"cara": cara, "head": head,
                           "scale": float(meta["scale"]),
                           "cp_order": int(meta.get("cp_order", 4))}
        # All tasks ride ONE backbone (taken from the first full
        # checkpoint / the npz) — a mismatched-backbone checkpoint would
        # serve shape-compatible but silently wrong logits, so any
        # recorded model name must agree with the requested one.
        want = model if isinstance(model, str) else None
        distinct = set(model_names.values()) | ({want} if want else set())
        if len(distinct) > 1:
            raise ValueError(
                f"checkpoints disagree on the backbone model: {model_names}"
                + (f" vs requested {want!r}" if want else "")
                + " — multi-task serving shares ONE backbone")
        cfg = (model if isinstance(model, ViTConfig)
               else get_model_config(model, num_classes=0))
        if params is None:
            if backbone is None:
                raise ValueError(
                    "all checkpoints are adapter-only; pass backbone= "
                    "(the pretrained npz) for the shared frozen weights")
            params = npz_lib.load_npz_backbone(backbone, cfg, jnp.float32)
            params = npz_lib.maybe_resize_pos_embed(params, cfg)
        return cls(params, cfg, tasks, **kw)

    def logits(self, images: np.ndarray, task: str) -> np.ndarray:
        """(N, S, S, C) -> (N, num_classes[task]); any N."""
        tid = jnp.int32(self._tid[task])

        def call(chunk):
            x = jnp.asarray(chunk, self._dtype)
            if self._mesh is not None:
                from cara_tpu.parallel import mesh as mesh_lib

                x = mesh_lib.put_batch(self._mesh, x)
            return self._fwd(x, tid)

        out = _batched_apply(call, images, self.batch_size, self.buckets)
        return out[:, :self._num_classes[task]]

    def logits_async(self, images: np.ndarray, task: str):
        """Dispatch only; returns fetch() (see ``Predictor.logits_async``)."""
        tid = jnp.int32(self._tid[task])

        def call(chunk):
            x = jnp.asarray(chunk, self._dtype)
            if self._mesh is not None:
                from cara_tpu.parallel import mesh as mesh_lib

                x = mesh_lib.put_batch(self._mesh, x)
            return self._fwd(x, tid)

        fetch = _dispatch_batched(call, images, self.batch_size, self.buckets)
        nc = self._num_classes[task]
        return lambda: fetch()[:, :nc]

    def warmup(self) -> None:
        """Compile every bucket through the shared executable (the task id
        is a traced operand, so warming ANY task warms ALL of them)."""
        s = self.cfg.image_size
        for b in self.buckets:
            self.logits(np.zeros((b, s, s, 3), np.float32), self.names[0])

    def predict(self, images: np.ndarray, task: str) -> np.ndarray:
        return np.argmax(self.logits(images, task), axis=-1)


# ---------------------------------------------------------------------------
# Portable serialized artifacts (jax.export / StableHLO).
#
# Deployment story beyond the in-process ``Predictor``: bake the (merged)
# weights into a single serialized StableHLO module that any JAX process can
# load WITHOUT this package, the model code, or the checkpoint — e.g. a
# serving fleet that only ships ``jax`` and the artifact file.  The export
# forces the pure-XLA op set (no Pallas custom calls), so one artifact
# lowers on every platform it was exported for (default: cpu + tpu).
# The reference has no serving/export surface at all (its only inference
# entry is ``--evaluate`` on the training CLI, vit_cp.py:109-114,168-173).

def export_serialized(
    params: Dict[str, Any],
    cfg: ViTConfig,
    *,
    cara_params: Optional[Dict[str, Any]] = None,
    cara_cfg: Optional[CaraConfig] = None,
    merge: bool = True,
    batch_size: int = 64,
    dtype=jnp.bfloat16,
    platforms=("cpu", "tpu"),
    quantize: Optional[str] = None,
    tome_r: int = 0,
) -> bytes:
    """Serialize the eval forward as a self-contained StableHLO artifact.

    The returned bytes deserialize with ``jax.export.deserialize`` (or
    ``ExportedPredictor.from_file``) and call as
    ``f(float32 images (batch_size, S, S, C)) -> float32 logits``.
    Weights are embedded as module constants; compute runs in ``dtype``.
    ``batch_size=0`` exports a SYMBOLIC batch dimension — one artifact
    serves any request size with no padding (each distinct size still
    compiles once at call time; fixed-size padding remains the right
    choice for latency-critical TPU serving).
    ``quantize``: "int8"/"w8a8" stores the block kernels as int8 module
    constants (models/quant.py) — the artifact shrinks ~4x at the
    weight bulk and w8a8 runs the int8 MXU path wherever it lowers.
    ``tome_r``: bake ToMe token merging into the artifact (models/tome.py)
    — the unrolled shrinking-token graph is static, so it serializes and
    lowers like any other; requires a merged (dense) forward.
    """
    from jax import export as jexport

    if merge and cara_params is not None:
        if "router" in cara_params:
            merge = False  # MoE is input-dependent — export unmerged
        else:
            params = merge_cara(params, cara_params, cfg, cara_cfg)
            cara_params = cara_cfg = None
    if quantize is not None:
        if quantize not in ("int8", "w8a8"):
            raise ValueError(f"unknown quantize mode {quantize!r}")
        from cara_tpu.models.quant import quantize_block_weights

        params = quantize_block_weights(
            params, mode="w8a8" if quantize == "w8a8" else "w8")
    params = cast_floating(params, dtype)
    if cara_params is not None:
        cara_params = cast_floating(cara_params, dtype)

    if tome_r > 0:
        if cara_params is not None:
            raise ValueError(
                "tome_r requires a dense export — merge the adapter first "
                "(MoE adapters cannot merge and do not compose with ToMe)")
        from cara_tpu.models.tome import tome_forward

        def fwd(x):
            return tome_forward(
                params, x.astype(dtype), cfg, tome_r).astype(jnp.float32)
    else:
        def fwd(x):
            out = vit_forward(
                params, x.astype(dtype), cfg, cara_params=cara_params,
                cara_cfg=cara_cfg, train=False,
                attn_impl="xla", dense_impl="xla")
            return out.astype(jnp.float32)

    bdim = (jexport.symbolic_shape("b")[0] if batch_size == 0
            else batch_size)
    spec = jax.ShapeDtypeStruct(
        (bdim, cfg.image_size, cfg.image_size, cfg.in_chans), jnp.float32)
    exp = jexport.export(jax.jit(fwd), platforms=list(platforms))(spec)
    return exp.serialize()


class ExportedPredictor:
    """Batched classifier over a serialized StableHLO artifact.

    Mirrors ``Predictor.logits/predict`` (any N, internal padding to the
    exported batch size) but needs only the artifact — no checkpoint, no
    model config, no adapter math."""

    def __init__(self, exported, *, max_batch: Optional[int] = None,
                 buckets="auto"):
        """``max_batch``: for SYMBOLIC-batch artifacts only — chunk/pad
        incoming batches to power-of-4 buckets up to ``max_batch`` so a
        server's ragged micro-batches compile a bounded executable set
        (each distinct concrete N still jit-compiles the deserialized
        module once).  ``None`` (library default) calls with the exact N
        given — no padding, one compile per distinct N."""
        self._exp = exported
        self._call = jax.jit(exported.call)
        dim0 = exported.in_avals[0].shape[0]
        # None = symbolic batch (batch_size=0 export): any N, no padding.
        self.batch_size = int(dim0) if isinstance(dim0, int) else None
        self.image_size = int(exported.in_avals[0].shape[1])
        if self.batch_size is not None:
            self.max_batch = self.batch_size
            self._buckets: Optional[tuple] = (self.batch_size,)
        elif max_batch:
            self.max_batch = int(max_batch)
            self._buckets = _resolve_buckets(buckets, self.max_batch, None)
        else:
            self.max_batch = None
            self._buckets = None

    @classmethod
    def from_file(cls, path: str, **kw) -> "ExportedPredictor":
        from jax import export as jexport

        with open(path, "rb") as f:
            return cls(jexport.deserialize(bytearray(f.read())), **kw)

    @classmethod
    def from_bytes(cls, blob: bytes, **kw) -> "ExportedPredictor":
        from jax import export as jexport

        return cls(jexport.deserialize(bytearray(blob)), **kw)

    def warmup(self) -> None:
        s = self.image_size
        for b in self._buckets or (1,):
            self.logits(np.zeros((b, s, s, 3), np.float32))

    def logits(self, images: np.ndarray) -> np.ndarray:
        if self.batch_size is None and self._buckets is None:
            # symbolic batch, exact N: one direct call
            return np.asarray(
                self._call(np.asarray(images, np.float32)), np.float32)
        return _batched_apply(
            lambda chunk: self._call(chunk.astype(np.float32)),
            images, self.batch_size or self.max_batch, self._buckets)

    def logits_async(self, images: np.ndarray):
        """Dispatch only; returns fetch() (see ``Predictor.logits_async``)."""
        if self.batch_size is None and self._buckets is None:
            out = self._call(np.asarray(images, np.float32))
            return lambda: np.asarray(out, np.float32)
        return _dispatch_batched(
            lambda chunk: self._call(chunk.astype(np.float32)),
            images, self.batch_size or self.max_batch, self._buckets)

    def predict(self, images: np.ndarray) -> np.ndarray:
        return np.argmax(self.logits(images), axis=-1)
