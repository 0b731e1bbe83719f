"""Shared CLI plumbing for the two training entry points."""

from __future__ import annotations

import argparse
from typing import Optional

import jax
import jax.numpy as jnp

from cara_tpu.data.vtab import VTAB_TASKS

DATASET_CHOICES = sorted(VTAB_TASKS)


def add_common_args(p: argparse.ArgumentParser) -> None:
    """Flags shared with the reference CLIs (``vit_cp.py:85-116``) plus the
    TPU-native extras (mesh, dtype, synthetic data, profiling...)."""
    p.add_argument("--lr", default=1e-3, type=float, help="Learning rate")
    p.add_argument("--dataset", default="svhn", type=str,
                   choices=DATASET_CHOICES, help="VTAB-1k task to train")
    p.add_argument("--model", type=str, default="vit_base_patch16_224_in21k")
    p.add_argument("--model-override", action="append", default=None,
                   metavar="K=V",
                   help="Override a ViTConfig field of --model (repeatable), "
                        "e.g. --model-override depth=24 --model-override "
                        "image_size=384. Values are parsed to the field's "
                        "declared type ('none' -> None for optional fields)")
    # --- extensions over the reference surface ---
    p.add_argument("--data-root", default="./data/vtab-1k", type=str)
    p.add_argument("--backbone", default="./ViT-B_16.npz", type=str,
                   help="Pretrained JAX-format npz (same file the reference "
                        "uses, vit_cp.py:155). Random init if missing.")
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--batch-size", default=64, type=int)
    p.add_argument("--eval-batch-size", default=256, type=int)
    p.add_argument("--seed", default=None, type=int,
                   help="Override the per-dataset seed from the config table")
    p.add_argument("--synthetic", action="store_true",
                   help="Generated data (no VTAB files needed)")
    p.add_argument("--synthetic-size", default=1000, type=int)
    p.add_argument("--method", default="cara",
                   choices=["cara", "lora", "fact_tt", "fact_tk",
                            "vpt_deep", "vpt_shallow", "ssf", "bitfit",
                            "adapter", "adaptformer", "linear", "full"],
                   help="Adapter family: cara = the reference CP "
                        "tensorisation; lora = per-matrix low-rank "
                        "baseline at the same four sites; fact_tt / "
                        "fact_tk = FacT tensor-train / Tucker factor "
                        "tuning (shared cross-layer factors, the family "
                        "CaRA generalizes); vpt_deep / vpt_shallow = "
                        "Visual Prompt Tuning (learnable prompt tokens); "
                        "ssf = scale-and-shift feature adaptation; "
                        "bitfit = bias-only tuning; adapter / adaptformer "
                        "= Houlsby sequential / AdaptFormer parallel "
                        "bottleneck modules (width = --dim); linear / "
                        "full = the non-adapter control rows (linear "
                        "probe: head only; full fine-tuning: every "
                        "weight).  All ride the same training loop / "
                        "checkpoint / serving stack (low-rank families "
                        "also the fused kernels and merged export; "
                        "ssf/bitfit fold exactly into the frozen weights)")
    p.add_argument("--lora-alpha", default=None, type=float,
                   help="LoRA scaling alpha; the delta scale becomes "
                        "alpha/rank (default alpha = rank, i.e. scale 1)")
    p.add_argument("--fact-scale", default=None, type=float,
                   help="FacT delta scale s (default 1.0; the paper tunes "
                        "it per task like CaRA's per-dataset scale)")
    p.add_argument("--fact-core-rank", default=0, type=int,
                   help="FacT-TK Tucker block-mode rank rl (0 = same as "
                        "--dim)")
    p.add_argument("--vpt-tokens", default=8, type=int,
                   help="VPT prompt-token count P per insertion point "
                        "(methods vpt_deep / vpt_shallow)")
    p.add_argument("--adapter-scale", default=None, type=float,
                   help="Bottleneck-adapter output scale s (methods "
                        "adapter / adaptformer; default 1.0 for the "
                        "sequential Houlsby form, 0.1 for AdaptFormer's "
                        "parallel branch — the official release value)")
    p.add_argument("--adapter-dropout", default=None, type=float,
                   help="Bottleneck-adapter internal activation dropout "
                        "(between the nonlinearity and the up projection; "
                        "default 0.0 for adapter, 0.1 for adaptformer — "
                        "the official release value)")
    p.add_argument("--weight-dropout", default=None, type=float,
                   help="Override the adapter weight-dropout rate "
                        "(default: the per-task table value for CaRA, "
                        "0.0 for LoRA)")
    p.add_argument("--paper-hparams", action="store_true",
                   help="Use the PAPER-run per-task values where the "
                        "reference code and its annotations diverge: the "
                        "8 tasks annotated '# Dropout: 0.3' in the "
                        "reference vtab_config train with weight-dropout "
                        "0.3 instead of the code's hard-coded 0.1 "
                        "(explicit --weight-dropout still wins)")
    p.add_argument("--delta-impl", default="factorized",
                   choices=["factorized", "materialized"],
                   help="CP delta path: factorized = rank-space chain "
                        "(fast); materialized = exact reference semantics "
                        "incl. element-wise weight dropout")
    p.add_argument("--weight-dropout-impl", default="element",
                   choices=["element", "rank", "row"],
                   help="Training weight-dropout semantics on the "
                        "factorized path: element = exact reference "
                        "(element-wise mask on the dense delta, fused "
                        "in-kernel via a coordinate hash); rank = "
                        "structured rank-component dropout (cheaper, "
                        "different regularizer); row = structured "
                        "input-row dropout — same mean AND per-entry "
                        "variance as element, runs at the rank impl's "
                        "speed (config.CaraConfig docs)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="Compute dtype (params/optimizer stay fp32)")
    p.add_argument("--mesh", default=None, type=str,
                   help="data,model[,seq[,expert]] mesh shape, e.g. '8,1', "
                        "'2,1,4' (seq = sequence parallelism for "
                        "high-resolution geometries) or '2,1,1,4' (expert "
                        "= expert parallelism for --moe adapters; default: "
                        "all devices on the data axis), or 'auto' — run "
                        "the parallelism planner (parallel/planner.py) and "
                        "adopt whatever mesh/pipeline it picks for the "
                        "visible devices (HBM budget via --hbm-gb)")
    p.add_argument("--moe", default=None, type=str, metavar="X[,K]",
                   help="Mixture-of-expert adapters (models/moe.py): train "
                        "X independent CaRA adapters with a per-token "
                        "top-K router (default K=2); each token's delta is "
                        "the gate-weighted sum of its selected experts'. "
                        "Implies weight-dropout-impl=rank and the XLA "
                        "dense impl; shard the expert axis with --mesh "
                        "d,1,1,x (expert parallelism)")
    p.add_argument("--hbm-gb", default=None, type=float,
                   help="Per-device HBM budget for --mesh auto (default: "
                        "detected from the device, else 16)")
    p.add_argument("--dcn-mesh", default=None, type=str,
                   help="Multi-slice layout: same rank as --mesh, how much "
                        "of each axis crosses the DCN (slice) boundary, "
                        "e.g. --mesh 16,1 --dcn-mesh 2,1 on 2 v5e-8 "
                        "slices — data-parallel gradient all-reduce rides "
                        "DCN once per step, everything else stays on ICI. "
                        "Devices are grouped by their slice_index")
    p.add_argument("--pipeline", default=None, type=str,
                   help="'S[,M[,T[,V]]]': pipeline parallelism with S "
                        "stages and M microbatches (default 4) on a "
                        "(data, stage) mesh built from all visible devices "
                        "— for backbones past one chip. T > 1 adds fused "
                        "tensor parallelism inside each stage ((data, "
                        "stage, model) mesh); V > 1 selects the circular "
                        "(interleaved) schedule — V layer groups per "
                        "stage, fill/drain bubble shrinks by V. Batch "
                        "sizes must split into M microbatches x the data "
                        "shards. Mutually exclusive with --mesh")
    p.add_argument("--fsdp", action="store_true",
                   help="Shard the FROZEN backbone over the data axis "
                        "(ZeRO-3-style weight streaming: per-device frozen "
                        "bytes / data-parallel degree, one bf16 weight "
                        "all-gather per layer per step). Forces the XLA "
                        "impls; composes with --mesh d,m tensor "
                        "parallelism on disjoint weight axes")
    p.add_argument("--no-remat", action="store_true",
                   help="Disable per-layer rematerialization")
    p.add_argument("--grad-accum", default=1, type=int,
                   help="Gradient-accumulation microbatches per step "
                        "(large effective batches without the activation "
                        "memory of one pass)")
    p.add_argument("--attn-impl", default="auto",
                   choices=["auto", "fused", "flash", "xla"],
                   help="Attention implementation (auto = fused Pallas "
                        "kernel on TPU)")
    p.add_argument("--dense-impl", default="auto",
                   choices=["auto", "fused", "xla"],
                   help="Dense+CP-delta implementation (auto = xla; fused = "
                        "Pallas cp_dense kernel)")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--memory-report", action="store_true",
                   help="print the compiled train step's HBM breakdown "
                        "(arguments/outputs/temps, MiB) once at startup")
    p.add_argument("--profile-dir", default=None, type=str,
                   help="Write a jax.profiler trace here")
    p.add_argument("--out-dir", default=".", type=str)
    p.add_argument("--resume-dir", default=None, type=str,
                   help="Orbax resume checkpoints (mid-training restart)")
    p.add_argument("--resume-every-steps", default=0, type=int)
    p.add_argument("--log-every", default=10, type=int)
    p.add_argument("--nan-check", action="store_true",
                   help="Enable jax_debug_nans (numerics sanitizer)")
    p.add_argument("--distributed", action="store_true",
                   help="Multi-host: call jax.distributed.initialize() "
                        "(TPU pod slices; single-host runs don't need it)")
    p.add_argument("--compilation-cache", default=None, type=str,
                   help="Persistent XLA compilation cache directory")


def resolve_dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def adapter_impl_kwargs(args) -> dict:
    """``--weight-dropout-impl`` / ``--moe X[,K]`` -> build_model kwargs.

    MoE requires rank weight-dropout semantics (``models.moe`` docs);
    ``--moe`` upgrades the (default) element impl with a printed note.
    Rejected combinations exit with a usage error: the pipeline schedule
    and task-parallel sweeps build their own steps with no MoE routing.
    """
    kw = {"weight_dropout_impl": args.weight_dropout_impl}
    method = getattr(args, "method", "cara")
    if method != "cara":
        kw["method"] = method
    if method == "fact_tk" and getattr(args, "fact_core_rank", 0):
        kw["fact_core_rank"] = args.fact_core_rank
    if method.startswith("vpt"):
        kw["vpt_tokens"] = getattr(args, "vpt_tokens", 8)
    if method in ("adapter", "adaptformer"):
        rate = getattr(args, "adapter_dropout", None)
        if rate is None:
            rate = 0.1 if method == "adaptformer" else 0.0
        kw["adapter_dropout"] = float(rate)
    spec = getattr(args, "moe", None)
    if not spec:
        return kw
    if method != "cara":
        raise SystemExit("--moe is CaRA-only (models.moe stacks CP factor "
                         f"trees); drop --method {method} or --moe")
    try:
        parts = [int(v) for v in spec.split(",")]
    except ValueError:
        raise SystemExit(f"--moe wants 'X[,K]' integers, got {spec!r}")
    if len(parts) not in (1, 2):
        raise SystemExit(f"--moe wants 'X[,K]', got {spec!r}")
    x = parts[0]
    k = parts[1] if len(parts) > 1 else min(2, x)
    if x < 2 or k < 1 or k > x:
        raise SystemExit(
            f"--moe wants X >= 2 experts and 1 <= K <= X, got {spec!r}")
    if getattr(args, "pipeline", None):
        raise SystemExit("--moe is not supported with --pipeline (the "
                         "stage-scan step has no router); use --mesh "
                         "d,1,1,x expert parallelism instead")
    kw.update(moe_experts=x, moe_top_k=k)
    if kw["weight_dropout_impl"] == "element":
        print("--moe: weight-dropout-impl element -> rank "
              "(MoE semantics, models/moe.py)")
        kw["weight_dropout_impl"] = "rank"
    return kw


def adapter_scale_wd(args, hp_scale: float, hp_wd: float):
    """Resolve (delta scale, weight-dropout rate) for the chosen method.

    CaRA keeps the per-task table values (``vtab_config.py`` scales span
    0.1-100 and the comment-documented dropout column); LoRA uses the
    conventional ``alpha/rank`` scale (``--lora-alpha``, default
    ``alpha = rank``); FacT uses ``--fact-scale`` (default 1.0 — the
    per-task table was tuned for CaRA's CP deltas, not FacT's).  Both
    default to dropout 0 unless ``--weight-dropout`` overrides.
    VPT/SSF/BitFit have no delta weight at all: scale is 1.0 and
    ``--weight-dropout`` is rejected.  Bottleneck adapters use
    ``--adapter-scale`` (default 1.0 sequential / 0.1 AdaptFormer) and
    reject ``--weight-dropout`` too (``--adapter-dropout`` instead).
    """
    wd_flag = getattr(args, "weight_dropout", None)
    method = getattr(args, "method", "cara")
    if method == "lora":
        alpha = getattr(args, "lora_alpha", None)
        alpha = float(args.dim) if alpha is None else float(alpha)
        return alpha / args.dim, (0.0 if wd_flag is None else wd_flag)
    if method.startswith("fact"):
        s = getattr(args, "fact_scale", None)
        return (1.0 if s is None else float(s)), (
            0.0 if wd_flag is None else wd_flag)
    if method.startswith("vpt") or method in ("ssf", "bitfit"):
        if wd_flag:
            raise SystemExit(
                f"--weight-dropout does not apply to --method {method} "
                "(no delta weight to drop)")
        return 1.0, 0.0
    if method in ("adapter", "adaptformer"):
        if wd_flag:
            raise SystemExit(
                f"--weight-dropout does not apply to --method {method} "
                "(bottleneck adapters regularize via --adapter-dropout)")
        s = getattr(args, "adapter_scale", None)
        if s is None:
            s = 0.1 if method == "adaptformer" else 1.0
        return float(s), 0.0
    if method in ("linear", "full"):
        if wd_flag:
            raise SystemExit(
                f"--weight-dropout does not apply to --method {method} "
                "(no adapter at all)")
        return 1.0, 0.0
    return hp_scale, (hp_wd if wd_flag is None else wd_flag)


def resolve_model_overrides(args) -> dict:
    """``--model-override k=v`` pairs -> a typed ``model_overrides`` dict.

    Values are converted using the declared type of the :class:`ViTConfig`
    field (bool accepts true/false/1/0; ``none`` means ``None`` for the
    optional fields; int/float/str by the field type).  Unknown field names
    and unparseable values exit with a usage error rather than a traceback.
    """
    pairs = getattr(args, "model_override", None)
    if not pairs:
        return {}
    import dataclasses

    from cara_tpu.config import ViTConfig

    fields = {f.name: f for f in dataclasses.fields(ViTConfig)}
    out = {}
    for pair in pairs:
        key, sep, raw = pair.partition("=")
        if not sep:
            raise SystemExit(f"--model-override wants K=V, got {pair!r}")
        if key not in fields:
            raise SystemExit(
                f"--model-override: ViTConfig has no field {key!r} "
                f"(known: {', '.join(sorted(fields))})")
        default = fields[key].default
        low = raw.strip().lower()
        try:
            if low in ("none", "null"):
                out[key] = None
            elif isinstance(default, bool):
                if low not in ("true", "false", "1", "0"):
                    raise ValueError(raw)
                out[key] = low in ("true", "1")
            elif isinstance(default, int):
                out[key] = int(raw)
            elif isinstance(default, float):
                out[key] = float(raw)
            elif default is None:  # Optional[int] fields (repr_size/proj_dim)
                out[key] = int(raw)
            else:
                out[key] = raw
        except ValueError:
            raise SystemExit(
                f"--model-override {key}: can't parse {raw!r} as "
                f"{type(default).__name__ if default is not None else 'int'}")
    return out


def _fake_slice_of():
    """CARA_FAKE_SLICES=N -> group devices into N contiguous fake slices
    (testing / demoing --dcn-mesh without multi-slice hardware)."""
    import os

    fake = os.environ.get("CARA_FAKE_SLICES")
    if not fake:
        return None
    import jax

    per = max(1, len(jax.devices()) // int(fake))
    return lambda d: d.id // per


def apply_auto_mesh(args, cfg, cara_cfg) -> None:
    """``--mesh auto``: run the planner and adopt its choice in-place.

    Rewrites ``args.mesh`` (and ``args.pipeline`` when the plan is a
    pipeline) BEFORE ``resolve_pipeline``/``resolve_mesh`` run, so the
    rest of the CLI flow is oblivious to how the shape was chosen.  The
    HBM budget comes from ``--hbm-gb``, the device's ``memory_stats``
    when it exposes one, else 16 GiB (v5e).
    """
    if getattr(args, "mesh", None) != "auto":
        return
    if getattr(args, "pipeline", None):
        raise SystemExit("--mesh auto picks the pipeline itself; drop "
                         "--pipeline or pass an explicit --mesh")
    import jax

    from cara_tpu.parallel import planner

    hbm_gb = args.hbm_gb
    if hbm_gb is None:
        try:
            stats = jax.devices()[0].memory_stats() or {}
            hbm_gb = stats.get("bytes_limit", 0) / 2**30 or None
        except Exception:
            hbm_gb = None
    if not hbm_gb:
        hbm_gb = 16.0
    plan = planner.plan_mesh(
        cfg, cara_cfg, len(jax.devices()), args.batch_size,
        hbm_gb=hbm_gb, compute_dtype=resolve_dtype(args.dtype))
    if not plan.fits:
        raise SystemExit(
            "--mesh auto: nothing fits "
            f"{hbm_gb:.1f} GiB/device x {len(jax.devices())} devices "
            f"(best candidate {plan.cli_flags()} needs "
            f"{plan.memory.total / 2**30:.2f} GiB). Ladder:\n  "
            + "\n  ".join(plan.rationale))
    tokens = plan.cli_flags().split()
    flag, spec = tokens[0], tokens[1]
    print(f"auto mesh: {plan.kind} -> {' '.join(tokens)} "
          f"(est {plan.memory.total / 2**30:.2f} / {hbm_gb:.1f} "
          f"GiB/device)")
    if flag == "--pipeline":
        args.pipeline, args.mesh = spec, None
    else:
        args.mesh = spec
    if "--fsdp" in tokens:
        args.fsdp = True


def resolve_mesh(spec: Optional[str], dcn_spec: Optional[str] = None):
    from cara_tpu.parallel.mesh import make_hybrid_mesh, make_mesh

    if spec == "auto":
        raise SystemExit(
            "--mesh auto is resolved by the training CLIs "
            "(common.apply_auto_mesh); this entry point wants an "
            "explicit 'data,model[,seq]' shape")
    if spec is None:
        if dcn_spec:
            import jax

            # Default mesh is all-data; the DCN factor splits that axis.
            return make_hybrid_mesh(
                (len(jax.devices()), 1),
                tuple(int(v) for v in dcn_spec.split(",")),
                slice_of=_fake_slice_of())
        return make_mesh()
    dims = tuple(int(v) for v in spec.split(","))
    if len(dims) not in (2, 3, 4):
        raise ValueError(
            f"--mesh wants 'data,model[,seq[,expert]]', got {spec!r}")
    if dcn_spec:
        return make_hybrid_mesh(
            dims, tuple(int(v) for v in dcn_spec.split(",")),
            slice_of=_fake_slice_of())
    return make_mesh(dims)


def resolve_pipeline(args):
    """--pipeline 'S[,M[,T[,V]]]' -> (mesh, stages, microbatches, repeats)
    or None.

    Builds the (data, stage) mesh over all visible devices (data =
    n_devices // S) — or (data, stage, model) with a third element T,
    composing fused tensor parallelism inside each stage (data =
    n_devices // (S*T)).  A fourth element V > 1 selects the circular
    (interleaved) schedule: each stage holds V non-contiguous layer
    groups and the fill/drain bubble shrinks by V (needs depth % (S*V)
    == 0 and M >= S).  Rejects a simultaneous --mesh — the pipeline owns
    its mesh geometry.
    """
    spec = getattr(args, "pipeline", None)
    if not spec:
        return None
    if getattr(args, "mesh", None):
        raise SystemExit("--pipeline builds its own (data, stage[, model]) "
                         "mesh; drop --mesh")
    if getattr(args, "fsdp", False):
        raise SystemExit("--fsdp shards frozen weights over the data axis "
                         "of the plain (data, model) mesh; the pipeline "
                         "schedule already shards them over its stage axis "
                         "— drop one of --fsdp/--pipeline")
    try:
        parts = [int(v) for v in spec.split(",")]
    except ValueError:
        raise SystemExit(f"--pipeline wants 'S[,M[,T[,V]]]', got {spec!r}")
    if len(parts) not in (1, 2, 3, 4):
        raise SystemExit(f"--pipeline wants 'S[,M[,T[,V]]]' (stages[,micro"
                         f"batches[,tensor-parallel[,repeats]]]), got "
                         f"{spec!r}")
    stages = parts[0]
    micro = parts[1] if len(parts) > 1 else 4
    tp = parts[2] if len(parts) > 2 else 1
    repeats = parts[3] if len(parts) > 3 else 1
    if stages < 1 or micro < 1 or tp < 1 or repeats < 1:
        raise SystemExit(f"--pipeline stages/microbatches/tensor-parallel/"
                         f"repeats must be >= 1, got {spec!r}")
    import jax

    from cara_tpu.parallel.pipeline import make_pp_mesh

    n = len(jax.devices())
    if n % (stages * tp):
        raise SystemExit(
            f"--pipeline {stages} stages x {tp} tensor-parallel over "
            f"{n} devices")
    if tp > 1:
        return (make_pp_mesh((n // (stages * tp), stages, tp)),
                stages, micro, repeats)
    return make_pp_mesh((n // stages, stages)), stages, micro, repeats


def build_pp_steps(pp, cfg, cara_cfg, tx, dtype, args):
    """Jitted (train_step, eval_step) for a ``--pipeline`` run.

    Threads every relevant CLI knob (--attn-impl/--dense-impl/--grad-accum/
    --no-remat) into the pipeline step factories so the flags mean the same
    thing they do on the plain path.  ``pp is None`` -> (None, None) and the
    caller falls through to ``loop.fit``'s default factories.
    """
    if pp is None:
        return None, None
    import jax

    from cara_tpu.models.vit import resolve_dense_impl
    from cara_tpu.train import pp as pp_lib

    mesh, _, micro, repeats = pp
    # Same remat="auto" policy as steps.make_train_step: the fused
    # megakernels hold their working set in VMEM, so remat only costs.
    dense = args.dense_impl
    if dense == "auto":
        from cara_tpu.parallel.mesh import MODEL_AXIS

        # pp x TP is megakernel-only: pp_vit_forward resolves auto->fused.
        dense = ("fused" if mesh.shape.get(MODEL_AXIS, 1) > 1
                 else resolve_dense_impl(cara_cfg is not None, cara_cfg))
    remat = False if args.no_remat else dense != "fused"
    train_step = jax.jit(
        pp_lib.make_pp_train_step(
            cfg, cara_cfg, tx, mesh, microbatches=micro, repeats=repeats,
            compute_dtype=dtype, remat=remat,
            attn_impl=args.attn_impl, dense_impl=args.dense_impl,
            grad_accum=args.grad_accum),
        donate_argnums=(0,))
    eval_step = jax.jit(pp_lib.make_pp_eval_step(
        cfg, cara_cfg, mesh, microbatches=micro, repeats=repeats,
        compute_dtype=dtype,
        attn_impl=args.attn_impl, dense_impl=args.dense_impl))
    return train_step, eval_step


def setup_runtime(args) -> None:
    if getattr(args, "distributed", False):
        import os

        # TPU pods / SLURM / MPI auto-detect with no arguments; for other
        # setups (e.g. the 2-process CPU smoke test) the coordinator is
        # passed via environment variables.
        addr = os.environ.get("CARA_DIST_COORDINATOR")
        if addr:
            jax.distributed.initialize(
                coordinator_address=addr,
                num_processes=int(os.environ["CARA_DIST_NPROCS"]),
                process_id=int(os.environ["CARA_DIST_PROCID"]))
        else:
            jax.distributed.initialize()
    if args.nan_check:
        jax.config.update("jax_debug_nans", True)
    # Persistent compilation cache, ON by default (CARA_JIT_CACHE=0 or
    # --compilation-cache to override) — see utils/jit_cache.py for why the
    # persistence thresholds must be zeroed on the tunneled backend.
    from cara_tpu.utils.jit_cache import enable_compilation_cache

    enable_compilation_cache(getattr(args, "compilation_cache", None))
