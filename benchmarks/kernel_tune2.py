"""Reliable cp_dense tuning: scan-in-jit timing (immune to dispatch noise).

Usage: python benchmarks/kernel_tune2.py fc1 "256,1536,768" "256,3072,768" ...
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cara_tpu.ops.pallas.cp_dense import cp_dense
from benchmarks.kernel_tune import SITES


def bench_scan(make_fn, x, K=20):
    @jax.jit
    def rep(x):
        def body(acc, _):
            out = make_fn(x + (acc * 1e-24).astype(x.dtype))
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
    site = sys.argv[1]
    cfgs = sys.argv[2:]
    m, k, n, act = SITES[site]
    r = 8
    ks = jax.random.split(jax.random.key(0), 6)
    x = jax.random.normal(ks[0], (m, k), jnp.bfloat16)
    w = jax.random.normal(ks[1], (k, n), jnp.bfloat16) * 0.05
    b = jnp.zeros((n,), jnp.bfloat16)
    u = jax.random.normal(ks[3], (k, r), jnp.bfloat16) * 0.1
    v = jax.random.normal(ks[4], (r, n), jnp.bfloat16) * 0.1
    cb = jnp.zeros((n,), jnp.bfloat16)

    def xla_ref(x):
        y = x @ w + b + 1.0 * ((x @ u) @ v + cb)
        if act == "gelu":
            y = jax.nn.gelu(y, approximate=False)
        return y

    dt, cs = bench_scan(xla_ref, x)
    print(json.dumps({"site": site, "cfg": "xla", "ms": round(dt * 1e3, 3),
                      "compile_s": round(cs, 1)}), flush=True)
    for cfg in cfgs:
        bm, bn, bk = (int(t) for t in cfg.split(","))
        try:
            dt, cs = bench_scan(
                lambda x: cp_dense(x, w, b, u, v, cb, 1.0, bm, bn, bk,
                                   False, act), x)
            rec = {"site": site, "cfg": cfg, "ms": round(dt * 1e3, 3),
                   "compile_s": round(cs, 1)}
        except Exception as exc:
            rec = {"site": site, "cfg": cfg, "error": repr(exc)[:150]}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
