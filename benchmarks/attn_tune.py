"""Tune fused_qkv_attention block_b (scan-in-jit timing)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cara_tpu.ops.pallas.fused_qkv_attention import fused_qkv_attention


def bench_scan(fn, x, K=20):
    @jax.jit
    def rep(x):
        def body(acc, _):
            out = fn(x + (acc * 1e-24).astype(x.dtype))
            return out.astype(jnp.float32).ravel()[0], None
        o, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return o
    t0 = time.perf_counter()
    jax.device_get(rep(x))
    cs = time.perf_counter() - t0
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        jax.device_get(rep(x))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K, cs


def main():
    b, np_, heads, dh = 64, 256, 12, 64
    e = heads * dh
    qkv = jax.random.normal(jax.random.key(0), (b, np_, 3 * e), jnp.bfloat16)
    for bg in (1, 2, 4):
        dt, cs = bench_scan(
            lambda q: fused_qkv_attention(q, heads, dh ** -0.5, 197, bg,
                                          False), qkv)
        print(json.dumps({"cfg": f"fwd_bg{bg}", "ms": round(dt * 1e3, 3),
                          "compile_s": round(cs, 1)}), flush=True)

    def make_grad(bg):
        def loss(q):
            return fused_qkv_attention(
                q, heads, dh ** -0.5, 197, bg, False).astype(
                    jnp.float32).sum()
        return jax.grad(loss)

    for bg in (1, 2, 4):
        g = make_grad(bg)
        dt, cs = bench_scan(lambda q: g(q), qkv)
        print(json.dumps({"cfg": f"bwd_bg{bg}", "ms": round(dt * 1e3, 3),
                          "compile_s": round(cs, 1)}), flush=True)


if __name__ == "__main__":
    main()
