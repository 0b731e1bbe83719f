"""Perf probe battery: async-dispatch timing of model variants.

Usage: python benchmarks/probe.py <variant>[,<variant>...] [out_file]

Timing protocol for the tunneled TPU backend: per-call roundtrip latency is
high and variable, but dispatch is asynchronous — so we enqueue N calls
back-to-back (serialized through a data dependency where needed) and sync
once at the end with a scalar fetch.  Device execution time dominates for
ops >~2ms.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from cara_tpu.utils.jit_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from cara_tpu import api  # noqa: E402
from cara_tpu.models.vit import vit_forward  # noqa: E402
from cara_tpu.train import steps as steps_lib  # noqa: E402


BS = int(os.environ.get("CARA_PROBE_BS", "64"))
WD_IMPL = os.environ.get("CARA_PROBE_WD", "element")
MODEL = os.environ.get("CARA_PROBE_MODEL", "vit_base_patch16_224_in21k")


def build(delta_impl="factorized"):
    model = api.build_model(
        MODEL, rank=8, num_classes=100, seed=0,
        delta_impl=delta_impl, weight_dropout_impl=WD_IMPL)
    s = model.cfg.image_size
    p = steps_lib.cast_floating(model.params, jnp.bfloat16)
    c = steps_lib.cast_floating(model.cara_params, jnp.bfloat16)
    x = jax.random.normal(jax.random.key(1), (BS, s, s, 3), jnp.bfloat16)
    y = jax.random.randint(jax.random.key(2), (BS,), 0, 100)
    return model, p, c, x, y


def bench_async(step, state0, N=30):
    """step: state -> state (device arrays); serialized via the state dep."""
    t0 = time.perf_counter()
    s = step(state0)
    jax.device_get(jax.tree_util.tree_leaves(s)[0]).ravel()[:1]
    compile_s = time.perf_counter() - t0
    # One pass to warm, then timed run.
    for _ in range(3):
        s = step(s)
    jax.device_get(jax.tree_util.tree_leaves(s)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(N):
        s = step(s)
    jax.device_get(jax.tree_util.tree_leaves(s)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / N, compile_s


def loss_make(model, y, train, impl):
    """Backbone params ride as an ARGUMENT (closed-over params lower to
    HLO constants; a ViT-L-sized blob overflows the tunneled
    remote-compile transport with HTTP 413)."""
    rngk = jax.random.key(5)
    attn_impl, _, dense_impl = impl.partition("+")

    def loss_fn(p, c, x):
        lg = vit_forward(
            p, x, model.cfg, cara_params=c, cara_cfg=model.cara_cfg,
            train=train, rng=rngk if train else None,
            attn_impl=attn_impl,
            dense_impl=dense_impl or "xla").astype(jnp.float32)
        return optax.softmax_cross_entropy_with_integer_labels(lg, y).mean()
    return loss_fn


def run_variant(variant):
    if variant.startswith("step"):
        parts = variant.split(":")
        _, delta_impl, remat = parts[:3]
        dense_impl = parts[3] if len(parts) > 3 else "auto"
        model, p, c, x, y = build(delta_impl)
        tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=15)
        frozen, state = steps_lib.init_train_state(
            tx, model.params, model.cara_params)
        frozen = steps_lib.cast_floating(frozen, jnp.bfloat16)
        batch = {"image": x, "label": y}
        remat_arg = {"remat": True, "noremat": False, "dots": "dots"}[remat]
        step_fn = jax.jit(steps_lib.make_train_step(
            model.cfg, model.cara_cfg, tx, compute_dtype=jnp.bfloat16,
            remat=remat_arg, dense_impl=dense_impl),
            donate_argnums=(0,))
        dt, cs = bench_async(
            lambda s: step_fn(s, frozen, batch, jax.random.key(0))[0], state)
    elif variant.startswith("method"):
        # Full train step for any PEFT method: method:<name> — the
        # per-method cost table (default impls, exactly what the CLI
        # --method flag runs).  Records the trainable-param count too.
        _, method = variant.split(":")
        model = api.build_model(
            MODEL, method=method, rank=8, num_classes=100, seed=0,
            weight_dropout_impl=WD_IMPL)
        s = model.cfg.image_size
        x = jax.random.normal(jax.random.key(1), (BS, s, s, 3), jnp.bfloat16)
        y = jax.random.randint(jax.random.key(2), (BS,), 0, 100)
        tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=15)
        frozen, state = steps_lib.init_train_state(
            tx, model.params, model.cara_params, method=method)
        frozen = steps_lib.cast_floating(frozen, jnp.bfloat16)
        n_train = sum(a.size
                      for a in jax.tree_util.tree_leaves(state.trainable)
                      if hasattr(a, "size"))
        step_fn = jax.jit(steps_lib.make_train_step(
            model.cfg, model.cara_cfg, tx, compute_dtype=jnp.bfloat16),
            donate_argnums=(0,))
        dt, cs = bench_async(
            lambda st: step_fn(st, frozen, {"image": x, "label": y},
                               jax.random.key(0))[0], state)
        return {"variant": variant, "bs": BS, "wd": WD_IMPL,
                "trainable_params": int(n_train),
                "ms": round(dt * 1e3, 2),
                "imgs_per_s": round(BS / dt, 1), "compile_s": round(cs, 1)}
    elif variant.startswith("tome"):
        # Merged-serving forward with ToMe token merging: tome:<r>, where
        # r=-1 is the baseline (standard merged vit_forward, default
        # impls — the serving configuration ToMe competes against).
        _, r = variant.split(":")
        r = int(r)
        model, p, c, x, y = build()
        merged = jax.device_put(
            steps_lib.cast_floating(model.merged(), jnp.bfloat16))
        if r < 0:
            f = jax.jit(lambda p_, x_: vit_forward(
                p_, x_, model.cfg, train=False).astype(jnp.float32).sum())
        else:
            from cara_tpu.models.tome import tome_forward

            f = jax.jit(lambda p_, x_: tome_forward(
                p_, x_, model.cfg, r).astype(jnp.float32).sum())

        def step(carry):
            l, = carry
            return (f(merged, x + (l * 1e-24).astype(x.dtype)),)
        dt, cs = bench_async(step, (jnp.float32(0),))
    else:
        kind, mode, impl = variant.split(":")
        model, p, c, x, y = build()
        p = jax.device_put(p)
        loss_fn = loss_make(model, y, mode == "train", impl)
        if kind == "fwd":
            f = jax.jit(loss_fn)
            # serialize via x perturbation from previous loss
            def step(carry):
                l, = carry
                return (f(p, c, x + (l * 1e-24).astype(x.dtype)),)
            dt, cs = bench_async(step, (jnp.float32(0),))
        else:
            g = jax.jit(lambda p_, c_, x_: jax.grad(loss_fn, argnums=1)(
                p_, c_, x_))
            def step(carry):
                grads = g(p, carry, x)
                return jax.tree_util.tree_map(
                    lambda a, b: a + (b * 1e-24).astype(a.dtype), c, grads)
            dt, cs = bench_async(step, c)
    return {"variant": variant, "bs": BS, "wd": WD_IMPL,
            "ms": round(dt * 1e3, 2),
            "imgs_per_s": round(BS / dt, 1), "compile_s": round(cs, 1)}


def main():
    variants = sys.argv[1].split(",")
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.bench_probe.jsonl"
    for v in variants:
        try:
            rec = run_variant(v)
        except Exception as exc:
            rec = {"variant": v, "error": repr(exc)[:200]}
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)


if __name__ == "__main__":
    main()
