"""Serving latency/throughput sweep: merged-weight Predictor at several
batch sizes (the deployment question bench.py's single bs-64 number
doesn't answer: what does a small-batch request cost?).

Usage: python benchmarks/serving_latency.py [out_file]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from cara_tpu.utils.jit_cache import enable_compilation_cache

enable_compilation_cache()

from cara_tpu import api  # noqa: E402
from cara_tpu.serving import Predictor  # noqa: E402


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_latency.jsonl"
    model = api.build_model(
        "vit_base_patch16_224_in21k", rank=8, scale=1.0, num_classes=100,
        seed=0)
    rng = np.random.RandomState(0)
    quant = os.environ.get("CARA_SERVE_QUANT")  # "int8" to quantize
    for bs in (1, 4, 16, 64):
        pred = Predictor(model.params, model.cfg,
                         cara_params=model.cara_params,
                         cara_cfg=model.cara_cfg, merge=True, batch_size=bs,
                         quantize=quant)
        x = rng.randn(bs, 224, 224, 3).astype(np.float32)
        # End-to-end predict() latency includes the host->device image
        # transfer — on THIS host that is a network tunnel (~75 MB/s), so
        # it measures the deployment link, not the TPU.  Device-resident
        # latency below is the chip-side number.
        for _ in range(3):
            pred.predict(x)
        steps = max(10, 256 // bs)
        t0 = time.perf_counter()
        for _ in range(steps):
            y = pred.predict(x)
        e2e = (time.perf_counter() - t0) / steps

        import jax.numpy as jnp
        xd = jax.device_put(jnp.asarray(x, jnp.bfloat16))
        for _ in range(3):
            o = pred._fwd(pred._params, pred._cara, xd)
        float(o.sum())
        t0 = time.perf_counter()
        for _ in range(steps):
            o = pred._fwd(pred._params, pred._cara, xd)
        float(o.sum())
        dev = (time.perf_counter() - t0) / steps
        rec = {"mode": f"merged-serving{'-' + quant if quant else ''}",
               "batch_size": bs,
               "device_latency_ms": round(dev * 1e3, 2),
               "device_imgs_per_s": round(bs / dev, 1),
               "e2e_tunnel_latency_ms": round(e2e * 1e3, 2),
               "device": str(jax.devices()[0])}
        print(json.dumps(rec), flush=True)
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        del y


if __name__ == "__main__":
    main()
