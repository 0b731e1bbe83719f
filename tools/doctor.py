"""Environment health check: backend, devices, cache, kernels, data path.

Production triage entry point (the reference needs none — one GPU, eager
torch; here a run involves a PJRT backend that may be remote-tunneled, a
persistent compilation cache, Pallas kernels that need Mosaic lowering,
and an optional native C++ decoder).  Prints one human-readable line per
check plus a final JSON summary; exit code 1 if any REQUIRED check fails.

Run:  ``python tools/doctor.py [--kernels] [--json]``
(``--kernels`` compiles a tiny fused megakernel on the active backend —
worth a one-time ~20-40 s compile on a tunneled TPU.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Runnable as a plain script: `python tools/doctor.py` puts tools/ on
# sys.path, not the repo root that holds the cara_tpu package.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def _check(results, name, fn, required=True):
    t0 = time.perf_counter()
    try:
        detail = fn()
        ok = True
    except Exception as e:  # noqa: BLE001 - diagnostic tool reports, never raises
        detail = f"{type(e).__name__}: {e}"
        ok = False
    dt = time.perf_counter() - t0
    results.append({"check": name, "ok": ok, "required": required,
                    "detail": detail, "seconds": round(dt, 3)})
    return ok


def _arm_watchdog(seconds: float) -> None:
    """Hard-exit UNHEALTHY if a check wedges (same rationale as bench.py:
    the tunneled PJRT backend can block ``jax.devices()`` in C++ forever,
    below any Python-level exception).  Tune via CARA_DOCTOR_TIMEOUT
    (seconds; 0 disables)."""
    import threading

    def fire():
        print(json.dumps({
            "ok": False,
            "checks": [{"check": "watchdog", "ok": False, "required": True,
                        "detail": f"doctor did not complete within "
                                  f"{seconds:.0f}s — accelerator/tunnel "
                                  "unresponsive", "seconds": seconds}]}),
            flush=True)
        os._exit(1)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernels", action="store_true",
                    help="Also compile+run a tiny fused Pallas block on "
                         "the active backend (Mosaic lowering check)")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--timeout", type=float, default=float(
        os.environ.get("CARA_DOCTOR_TIMEOUT", "300")),
        help="Hard wall-clock cap for the whole doctor run (s; 0 off)")
    args = ap.parse_args(argv)
    if args.timeout > 0:
        _arm_watchdog(args.timeout)
    results = []

    def backend():
        import jax

        devs = jax.devices()
        kinds = sorted({d.device_kind for d in devs})
        return (f"{jax.default_backend()} x{len(devs)} ({', '.join(kinds)}); "
                f"process {jax.process_index()}/{jax.process_count()}")

    _check(results, "backend", backend)

    def memory():
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        if not stats:
            return "device exposes no memory_stats"
        lim = stats.get("bytes_limit", 0)
        use = stats.get("bytes_in_use", 0)
        return (f"{use / 2**30:.2f} / {lim / 2**30:.2f} GiB in use on "
                "device 0")

    _check(results, "hbm", memory, required=False)

    def dispatch():
        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda x: (x @ x).sum())
        x = jnp.ones((256, 256), jnp.float32)
        float(f(x))  # compile + first run
        t0 = time.perf_counter()
        for _ in range(5):
            float(f(x))
        dt = (time.perf_counter() - t0) / 5 * 1e3
        return f"jit dispatch+sync {dt:.2f} ms (tunnel health; <5 local)"

    _check(results, "dispatch", dispatch)

    def cache():
        from cara_tpu.utils.jit_cache import DEFAULT_DIR

        d = os.environ.get("CARA_JIT_CACHE") or DEFAULT_DIR
        if d == "0":
            return "disabled via CARA_JIT_CACHE=0"
        if not os.path.isdir(d):
            return f"{d} (not created yet)"
        n, size = 0, 0
        for root, _, files in os.walk(d):
            for fn in files:
                n += 1
                size += os.path.getsize(os.path.join(root, fn))
        return f"{d}: {n} entries, {size / 2**20:.0f} MiB"

    _check(results, "compilation-cache", cache, required=False)

    def native():
        from cara_tpu.data.native import native_available

        if not native_available():
            return "csrc/dataloader.so not built (PIL fallback active)"
        return "native C++ decoder available"

    _check(results, "native-loader", native, required=False)

    def model_forward():
        import jax.numpy as jnp

        from cara_tpu import api

        model = api.build_model("vit_tiny_test", rank=4, scale=1.0,
                                num_classes=10, seed=0)
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        out = model.forward(x)
        assert out.shape == (2, 10), out.shape
        return "tiny model end-to-end forward ok"

    _check(results, "model-forward", model_forward)

    if args.kernels:
        def kernels():
            import jax
            import jax.numpy as jnp

            from cara_tpu import api
            from cara_tpu.models.vit import vit_forward

            model = api.build_model("vit_tiny_test", rank=4, scale=1.0,
                                    num_classes=10, seed=0)
            x = jnp.zeros((2, 32, 32, 3), jnp.float32)
            out = jax.jit(lambda p, c, xx: vit_forward(
                p, xx, model.cfg, cara_params=c, cara_cfg=model.cara_cfg,
                train=False, attn_impl="fused", dense_impl="fused"))(
                    model.params, model.cara_params, x)
            assert out.shape == (2, 10)
            return "fused Pallas megakernels compile + run"

        _check(results, "pallas-kernels", kernels)

    failed = [r for r in results if r["required"] and not r["ok"]]
    if args.json:
        print(json.dumps({"ok": not failed, "checks": results}))
    else:
        for r in results:
            mark = "ok " if r["ok"] else ("FAIL" if r["required"] else
                                          "warn")
            print(f"[{mark}] {r['check']:>18}: {r['detail']} "
                  f"({r['seconds']}s)")
        print("healthy" if not failed else
              f"UNHEALTHY: {[r['check'] for r in failed]}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
