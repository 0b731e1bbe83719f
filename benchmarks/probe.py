"""Perf probe battery: times model variants, appends JSON lines to a file.

Usage: python benchmarks/probe.py <variant> [out_file]

Each invocation measures one variant (so a crash/timeout doesn't lose the
rest); the persistent compilation cache makes repeat invocations cheap.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from cara_tpu import api  # noqa: E402
from cara_tpu.models.vit import vit_forward  # noqa: E402
from cara_tpu.train import steps as steps_lib  # noqa: E402


def build(delta_impl="factorized"):
    model = api.build_model(
        "vit_base_patch16_224_in21k", rank=8, num_classes=100, seed=0,
        delta_impl=delta_impl)
    p = steps_lib.cast_floating(model.params, jnp.bfloat16)
    c = steps_lib.cast_floating(model.cara_params, jnp.bfloat16)
    x = jax.random.normal(jax.random.key(1), (64, 224, 224, 3), jnp.bfloat16)
    y = jax.random.randint(jax.random.key(2), (64,), 0, 100)
    return model, p, c, x, y


def bench_scan(fn, x64, K=20, reps=3):
    """fn: x -> scalar; serialized K times inside one jit (CSE-proof)."""
    @jax.jit
    def rep():
        def body(acc, _):
            out = fn(x64 + acc * 1e-24)
            return out.astype(jnp.float32), None
        o, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return o

    t0 = time.perf_counter()
    jax.device_get(rep())
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(rep())
        ts.append(time.perf_counter() - t0)
    return min(ts) / K, compile_s


def loss_make(model, p, y, train, impl):
    rngk = jax.random.key(5)

    def loss_fn(c, x):
        lg = vit_forward(
            p, x, model.cfg, cara_params=c, cara_cfg=model.cara_cfg,
            train=train, rng=rngk if train else None,
            attn_impl=impl).astype(jnp.float32)
        return optax.softmax_cross_entropy_with_integer_labels(lg, y).mean()
    return loss_fn


def train_step_time(model, delta_impl, remat, impl_note="", K=20):
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=15)
    frozen, state = steps_lib.init_train_state(
        tx, model.params, model.cara_params)
    frozen = steps_lib.cast_floating(frozen, jnp.bfloat16)
    x = jax.random.normal(jax.random.key(1), (64, 224, 224, 3), jnp.bfloat16)
    batch = {"image": x,
             "label": jax.random.randint(jax.random.key(2), (64,), 0, 100)}
    step_fn = steps_lib.make_train_step(
        model.cfg, model.cara_cfg, tx, compute_dtype=jnp.bfloat16, remat=remat)

    @jax.jit
    def multi(state):
        def body(s, _):
            s2, m = step_fn(s, frozen, batch, jax.random.key(0))
            return s2, m["loss"]
        s, losses = jax.lax.scan(body, state, None, length=K)
        return losses[-1]

    t0 = time.perf_counter()
    jax.device_get(multi(state))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(multi(state))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K, compile_s


def main():
    variant = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.bench_probe.jsonl"

    if variant.startswith("step"):
        # step:<delta_impl>:<remat>
        _, delta_impl, remat = variant.split(":")
        model, p, c, x, y = build(delta_impl)
        dt, cs = train_step_time(model, delta_impl, remat == "remat")
        rec = {"variant": variant, "ms": dt * 1e3, "imgs": 64 / dt,
               "compile_s": cs}
    else:
        # fwd/grad:<train|eval>:<impl>
        kind, mode, impl = variant.split(":")
        model, p, c, x, y = build()
        loss_fn = loss_make(model, p, y, mode == "train", impl)
        if kind == "fwd":
            fn = lambda xx: loss_fn(c, xx)
        else:
            fn = lambda xx: jax.value_and_grad(loss_fn)(c, xx)[0]
        dt, cs = bench_scan(fn, x)
        rec = {"variant": variant, "ms": dt * 1e3, "imgs": 64 / dt,
               "compile_s": cs}
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec)


if __name__ == "__main__":
    main()
