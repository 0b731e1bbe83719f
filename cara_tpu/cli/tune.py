"""Autotune the megakernel tile knobs on the live device.

Sweeps the two megakernel tile knobs (``mlp_bm`` m-rows per MLP program,
``attn_bb`` images per attention program — ``models/vit.py``) by building
the PRODUCTION train/eval step per candidate, timing it on the attached
accelerator, and persisting the winners to the autotune cache
(``cara_tpu.tune``), which the in-model heuristics consult whenever the
``CARA_MLP_BM``/``CARA_ATTN_BB`` env overrides are ``auto``.

The knobs drive independent kernels, so the sweep is two 1-D passes
(mlp_bms at the default bb, then attn_bbs at the winning bm) rather than
a full grid — each candidate costs one cold jit compile.

Usage::

    python -m cara_tpu.cli.tune --model vit_base_patch16_224_in21k \
        --mode train-element --batch-size 64

No reference counterpart (the reference's kernels are cuBLAS calls with
no exposed tiling, SURVEY.md section 2) — this is TPU-framework
infrastructure for performance portability across TPU generations.
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Optional

import jax
import jax.numpy as jnp
import optax


def _parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", default="vit_base_patch16_224_in21k")
    p.add_argument("--dim", default=8, type=int, help="CP rank")
    p.add_argument("--batch-size", default=64, type=int)
    p.add_argument("--num-classes", default=100, type=int)
    p.add_argument("--mode", default="train-element",
                   choices=["train-element", "train-rank", "eval"])
    p.add_argument("--mlp-bms", default="256,512,1024",
                   help="CSV of mlp_bm candidates (m-rows per MLP program)")
    p.add_argument("--attn-bbs", default="2,4,8",
                   help="CSV of attn_bb candidates (images per attention "
                        "program); candidates that exceed VMEM are "
                        "recorded as failed and skipped")
    p.add_argument("--reps", default=30, type=int,
                   help="timed steps per candidate (after warmup)")
    p.add_argument("--no-write", action="store_true",
                   help="measure and report only; do not persist winners")
    p.add_argument("--out", default=".tune_results.jsonl",
                   help="append per-candidate measurements here")
    p.add_argument("--freeze-defaults", action="store_true",
                   help="snapshot the merged cache into the package's "
                        "shipped tune_defaults.json and exit (no sweep)")
    return p.parse_args(argv)


def _bench_async(step, state0, reps: int):
    """Serialized async timing (probe protocol, benchmarks/probe.py:49):
    enqueue reps dependent steps, sync once with a scalar fetch."""
    t0 = time.perf_counter()
    s = step(state0)
    jax.device_get(jax.tree_util.tree_leaves(s)[0]).ravel()[:1]
    compile_s = time.perf_counter() - t0
    for _ in range(3):
        s = step(s)
    jax.device_get(jax.tree_util.tree_leaves(s)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        s = step(s)
    jax.device_get(jax.tree_util.tree_leaves(s)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / reps, compile_s


def _build_step(args):
    """model bundle + a state -> state closure of the production step for
    the requested mode (fresh per knob config so the new globals trace)."""
    from cara_tpu import api
    from cara_tpu.models.vit import vit_forward
    from cara_tpu.train import steps as steps_lib

    wd_impl = "rank" if args.mode == "train-rank" else "element"
    model = api.build_model(
        args.model, rank=args.dim, num_classes=args.num_classes, seed=0,
        weight_dropout_impl=wd_impl)
    s = model.cfg.image_size
    x = jax.random.normal(jax.random.key(1), (args.batch_size, s, s, 3),
                          jnp.bfloat16)
    y = jax.random.randint(jax.random.key(2), (args.batch_size,), 0,
                           args.num_classes)
    if args.mode == "eval":
        p = jax.device_put(
            steps_lib.cast_floating(model.params, jnp.bfloat16))
        c = steps_lib.cast_floating(model.cara_params, jnp.bfloat16)
        # Backbone rides as an ARGUMENT, not a closure: closed-over params
        # become HLO constants, and a ViT-L-sized constant blob overflows
        # the remote-compile transport on tunneled backends (HTTP 413).
        f = jax.jit(
            lambda pp, cc, xx:
            optax.softmax_cross_entropy_with_integer_labels(
                vit_forward(pp, xx, model.cfg, cara_params=cc,
                            cara_cfg=model.cara_cfg,
                            train=False).astype(jnp.float32), y).mean())

        def step(carry):
            (loss,) = carry
            return (f(p, c, x + (loss * 1e-24).astype(x.dtype)),)

        return step, (jnp.float32(0),), model
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=15)
    frozen, state = steps_lib.init_train_state(tx, model.params,
                                               model.cara_params)
    frozen = steps_lib.cast_floating(frozen, jnp.bfloat16)
    batch = {"image": x, "label": y}
    step_fn = jax.jit(
        steps_lib.make_train_step(model.cfg, model.cara_cfg, tx,
                                  compute_dtype=jnp.bfloat16),
        donate_argnums=(0,))
    return (lambda st: step_fn(st, frozen, batch, jax.random.key(0))[0],
            state, model)


def _measure(args, mlp_bm: Optional[int], attn_bb: Optional[int]):
    """Time one knob configuration; restores the globals afterward."""
    from cara_tpu.models import vit as vit_lib

    old_bm, old_bb = vit_lib._MLP_BM, vit_lib._ATTN_BB
    try:
        if mlp_bm is not None:
            vit_lib._MLP_BM = str(mlp_bm)
        if attn_bb is not None:
            vit_lib._ATTN_BB = str(attn_bb)
        step, state0, _ = _build_step(args)
        dt, compile_s = _bench_async(step, state0, args.reps)
        return {"ms": round(dt * 1e3, 3), "compile_s": round(compile_s, 1)}
    finally:
        vit_lib._MLP_BM, vit_lib._ATTN_BB = old_bm, old_bb


def main(argv=None) -> dict:
    from cara_tpu import tune
    from cara_tpu.config import get_model_config
    from cara_tpu.utils.jit_cache import enable_compilation_cache

    args = _parse_args(argv)
    if args.freeze_defaults:
        out = tune.freeze_defaults()
        print({"frozen": out}, flush=True)
        return {"frozen": out}
    enable_compilation_cache()
    cfg = get_model_config(args.model, num_classes=args.num_classes)
    n, e, hidden = cfg.seq_len, cfg.embed_dim, cfg.hidden_dim
    npad = -(-n // 128) * 128
    use_elem = args.mode == "train-element"
    dev = tune.device_kind()
    log = open(args.out, "a")

    def emit(rec):
        rec = {"model": args.model, "bs": args.batch_size,
               "mode": args.mode, "dev": dev, **rec}
        log.write(json.dumps(rec) + "\n")
        log.flush()
        print(rec, flush=True)

    results = {}

    def sweep(knob, candidates, fixed):
        best_v, best_ms = None, float("inf")
        for v in candidates:
            kw = ({"mlp_bm": v, "attn_bb": fixed} if knob == "mlp_bm"
                  else {"mlp_bm": fixed, "attn_bb": v})
            try:
                m = _measure(args, **kw)
            except Exception as exc:  # VMEM overflow etc. — skip candidate
                emit({knob: v, "error": repr(exc)[:160]})
                continue
            emit({knob: v, **({} if fixed is None else {"fixed": fixed}),
                  **m})
            results[(knob, v)] = m["ms"]
            if m["ms"] < best_ms:
                best_v, best_ms = v, m["ms"]
        return best_v, best_ms

    mlp_cands = [int(v) for v in args.mlp_bms.split(",") if v]
    bb_cands = [int(v) for v in args.attn_bbs.split(",") if v]
    if args.mode == "train-rank":
        # The attention megakernel is OFF on the rank-dropout train path
        # (_attn_mega_on) — sweeping attn_bb there would record a
        # noise-selected winner for a knob that never engages.
        bb_cands = []
    # Pass 1: mlp_bm at the default attn_bb.  Pass 2: attn_bb at the
    # winning mlp_bm (the kernels are independent; see module docstring).
    best_bm, bm_ms = sweep("mlp_bm", mlp_cands, None)
    best_bb, bb_ms = sweep("attn_bb", bb_cands, best_bm)
    summary = {"best_mlp_bm": best_bm, "best_attn_bb": best_bb,
               "best_ms": bb_ms if bb_ms < float("inf") else bm_ms}
    is_train = args.mode != "eval"
    if best_bm is not None and not args.no_write:
        tune.record("mlp_bm",
                    tune.mlp_key(use_elem, n, e, hidden, train=is_train,
                                 b=args.batch_size),
                    best_bm,
                    {"ms": bm_ms, "mode": args.mode, "model": args.model})
    if best_bb is not None and not args.no_write:
        tune.record("attn_bb",
                    tune.attn_key(npad, e, train=is_train,
                                  b=args.batch_size, elem=use_elem),
                    best_bb,
                    {"ms": bb_ms, "mode": args.mode, "model": args.model})
    if not args.no_write:
        summary["cache"] = tune.cache_path()
    emit({"summary": summary})
    log.close()
    return summary


if __name__ == "__main__":
    main()
