"""Block-size tuning sweep for the cp_dense kernel at model shapes.

Usage: python benchmarks/kernel_tune.py [site]
site in {fc1, fc2, qkv, proj}; appends results to .kernel_tune.jsonl.
"""

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cara_tpu.ops.pallas.cp_dense import cp_dense

SITES = {
    "qkv": (16384, 768, 2304, None),
    "proj": (12608, 768, 768, None),
    "fc1": (12608, 768, 3072, "gelu"),
    "fc2": (12608, 3072, 768, None),
}


def bench(fn, x, n=30):
    out = fn(x)
    jax.device_get(out.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        x2 = x + out.ravel()[0].astype(x.dtype) * 1e-24
        out = fn(x2)
    jax.device_get(out.ravel()[:1])
    return (time.perf_counter() - t0) / n


def main():
    site = sys.argv[1] if len(sys.argv) > 1 else "fc1"
    m, k, n, act = SITES[site]
    r = 8
    ks = jax.random.split(jax.random.key(0), 6)
    x = jax.random.normal(ks[0], (m, k), jnp.bfloat16)
    w = jax.random.normal(ks[1], (k, n), jnp.bfloat16) * 0.05
    b = jnp.zeros((n,), jnp.bfloat16)
    u = jax.random.normal(ks[3], (k, r), jnp.bfloat16) * 0.1
    v = jax.random.normal(ks[4], (r, n), jnp.bfloat16) * 0.1
    cb = jnp.zeros((n,), jnp.bfloat16)

    results = []
    # XLA reference: gemm + factorized delta (+ act)
    def xla_ref(x):
        y = x @ w + b + 1.0 * ((x @ u) @ v + cb)
        if act == "gelu":
            y = jax.nn.gelu(y, approximate=False)
        return y
    f = jax.jit(xla_ref)
    dt = bench(f, x)
    results.append({"site": site, "cfg": "xla", "ms": round(dt * 1e3, 3)})
    print(results[-1], flush=True)

    for bm, bn, bk in itertools.product(
            (256, 512, 1024), (256, 512, 768), (256, 768)):
        if bk > k or bn > n:
            continue
        try:
            f = jax.jit(lambda x, bm=bm, bn=bn, bk=bk: cp_dense(
                x, w, b, u, v, cb, 1.0, bm, bn, bk, False, act))
            dt = bench(f, x)
            rec = {"site": site, "cfg": f"bm{bm}_bn{bn}_bk{bk}",
                   "ms": round(dt * 1e3, 3)}
        except Exception as exc:
            rec = {"site": site, "cfg": f"bm{bm}_bn{bn}_bk{bk}",
                   "error": repr(exc)[:120]}
        results.append(rec)
        print(rec, flush=True)
        with open("/root/repo/.kernel_tune.jsonl", "a") as fh:
            fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
