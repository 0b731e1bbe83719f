"""Minimal repro of the Mosaic per-head attention ceiling (VERDICT r3 #7).

The claim being made reproducible (benchmarks/RESULTS.md round-3
"Head-batched attention"): ViT attention with Dh=64 heads is pinned well
below MXU peak inside Pallas because
  (a) per-head q/k/v extraction from the fused (NP, 3E) layout is
      misaligned 64-lane slicing, and the per-head GEMMs contract over
      K=Dh=64 — half the 128-wide MXU;
  (b) the obvious fix — relayout to (H, NP, Dh) in-kernel and run ONE
      batched dot_general — does NOT lower in current Mosaic
      ("infer-vector-layout: unsupported shape cast"), so the per-head
      loop is forced.

This script is the one-command re-test for any jax/libtpu upgrade:

    python benchmarks/attn_ceiling_repro.py

It runs three probes of IDENTICAL total FLOPs:
  real_dh64   — the PRODUCTION kernel (ops/pallas/fused_qkv_attention) at
                ViT-B geometry, 12 heads x Dh=64: the ceiling.
  real_dh128  — the same production kernel told the same (B, NP, 2304)
                buffer holds 6 heads x Dh=128: aligned 128-lane slices and
                K=128 contractions, same FLOPs, same softmax work.
                MEASURED 2026-08-20 (jax 0.9.0, v5e): 1.634 vs 1.640 ms —
                EQUAL.  The standalone kernel is therefore NOT K-width
                bound: the ceiling is per-head small-GEMM scheduling + the
                VPU softmax between the two GEMMs, which is precisely what
                one head-batched MXU-filling dot_general would remove.
  head_batched — a minimal kernel doing the rejected relayout
                (NP, H*Dh) -> (H, NP, Dh) + ONE batched dot_general;
                EXPECTED to fail lowering.  If a toolchain upgrade makes
                it lower, the script times it and prints CEILING_LIFTED
                so the megakernels can be rewritten to use it (worth
                ~3-4 ms/step at ViT-B bs64, docs/NEXT_ROUND.md item 5).

Prints one JSON line per probe with achieved TFLOP/s and %-of-peak
(197 TF bf16 nominal).  Only meaningful on a real TPU; on CPU it runs
interpret-mode and reports lowering status only.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, NP, E = 8, 256, 768
PEAK = 197e12


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _head_batched_kernel(qkv_ref, o_ref, *, heads, dh):
    """The rejected fix: relayout (NP, H*Dh) -> (H, NP, Dh) in-kernel,
    ONE batched dot_general filling the MXU.  Expected: Mosaic lowering
    error on the shape cast."""
    x = qkv_ref[0]
    e = heads * dh
    scale = dh ** -0.5
    f32 = jnp.float32
    q = x[:, :e].reshape(NP, heads, dh).transpose(1, 0, 2)
    k = x[:, e:2 * e].reshape(NP, heads, dh).transpose(1, 0, 2)
    v = x[:, 2 * e:].reshape(NP, heads, dh).transpose(1, 0, 2)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=f32)
    p = _softmax_rows(s * scale).astype(x.dtype)
    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=f32)
    o_ref[0] = o.transpose(1, 0, 2).reshape(NP, e).astype(x.dtype)


def _call(kernel, heads, dh, interpret):
    spec = pl.BlockSpec((1, NP, 3 * E), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, NP, E), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kernel, heads=heads, dh=dh),
        grid=(B,),
        in_specs=[spec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, NP, E), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )


def bench(fn, x, reps=20):
    """Scan-in-jit timing (per-call dispatch on the tunnel is 2-40 ms)."""
    @jax.jit
    def rep(x):
        def body(acc, _):
            out = fn(x + (acc * 1e-24).astype(x.dtype))
            return out.astype(jnp.float32).ravel()[0], None
        o, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return o

    float(rep(x))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(rep(x))
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps


def main():
    from cara_tpu.ops.pallas.fused_qkv_attention import fused_qkv_attention

    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    bb = 64  # ViT-B bench batch; NP=256 covers the padded 197 tokens
    xb = jax.random.normal(jax.random.key(0), (bb, NP, 3 * E), jnp.bfloat16)
    flops_b = 2 * 2 * bb * NP * NP * E  # scores + p@v, all heads

    for name, heads in (("real_dh64", 12), ("real_dh128", 6)):
        dh = E // heads
        fn = lambda t: fused_qkv_attention(  # noqa: E731
            t, heads, dh ** -0.5, NP, 2, interpret)
        try:
            if on_tpu:
                dt = bench(fn, xb)
                rec = {"probe": name, "heads": heads, "dh": dh,
                       "ms": round(dt * 1e3, 3),
                       "tflops": round(flops_b / dt / 1e12, 1),
                       "pct_peak": round(100 * flops_b / dt / PEAK, 1)}
            else:
                jax.block_until_ready(jax.jit(fn)(xb))
                rec = {"probe": name, "lowering": "ok (interpret mode; "
                       "timing needs a TPU)"}
        except Exception as e:  # noqa: BLE001 - report, don't crash
            rec = {"probe": name, "lowering": "FAILED",
                   "error": str(e).splitlines()[0][:200]}
        print(json.dumps(rec), flush=True)

    x = jax.random.normal(jax.random.key(1), (B, NP, 3 * E), jnp.bfloat16)
    flops = 2 * 2 * B * NP * NP * E

    fn = _call(_head_batched_kernel, 12, 64, interpret)
    try:
        jax.block_until_ready(jax.jit(fn)(x))
        if on_tpu:
            dt = bench(fn, x)
            print(json.dumps({
                "probe": "head_batched", "ms": round(dt * 1e3, 3),
                "tflops": round(flops / dt / 1e12, 1),
                "pct_peak": round(100 * flops / dt / PEAK, 1),
                "CEILING_LIFTED": True,
                "action": "Mosaic now lowers the (NP,H*Dh)->(H,NP,Dh) "
                          "relayout + batched dot_general — rewrite the "
                          "attention megakernels to head-batched form "
                          "(docs/NEXT_ROUND.md item 5, ~3-4 ms/step)"}),
                flush=True)
        else:
            print(json.dumps({"probe": "head_batched",
                              "lowering": "ok (interpret mode)"}),
                  flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        # The tunneled backend wraps the Mosaic error in an HTTP 500; keep
        # whatever detail survives (on a local TPU the message contains
        # "infer-vector-layout: unsupported shape cast").
        interesting = [ln for ln in msg.splitlines()
                       if "layout" in ln or "cast" in ln or "Mosaic" in ln]
        line = interesting[0] if interesting else \
            next((ln for ln in msg.splitlines() if ln.strip()), msg)
        print(json.dumps({
            "probe": "head_batched", "lowering": "FAILED (expected on "
            "current Mosaic — the documented ceiling)",
            "error": line[:300]}), flush=True)


if __name__ == "__main__":
    main()
