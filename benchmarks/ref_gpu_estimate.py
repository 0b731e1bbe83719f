"""Analytic throughput estimate of the torch reference on a real GPU.

VERDICT round-3 item 2: `BASELINE.md` sets the north-star bar as ">5x
reference GPU images/sec/chip", but no GPU exists on this host — the only
measured baseline is the torch replica on one idle CPU core
(`BASELINE_LOCAL.json`).  This module makes the denominator checkable
arithmetic: an explicit per-step FLOP model of the reference training step
(`/root/reference/image_classification/vit_cp.py` protocol: ViT-B/16,
batch 64, rank-8 CaRA), an achievable-efficiency band, and — the anchor —
a prediction of the measured CPU-replica number from the SAME model, so
the model is falsified if it can't reproduce the one number we did measure.

FLOP accounting (reference math, ``src/cara/cara.py``):

* Every frozen GEMM (qkv/proj/fc1/fc2) costs its dense forward; in backward
  autograd computes only dx (weights frozen, ``vit_cp.py:176-182``) -> 1x
  forward.
* Every CP-delta einsum (``cara.py:35,57,81,92``) costs the SAME as its
  dense sibling — the reference materialises the full delta tensor and runs
  a second full-size contraction (``cara.py:27-32`` then ``:35``); backward
  needs dx AND dT = x^T g -> 2x forward.
* ``cp_to_tensor`` materialisation: 2*r*(elements of the delta tensor) per
  call, counted, but negligible at r<=32.
* Attention proper (scores + p@v): forward once, backward 2x.
* Patch embed: forward only — no trainable param below block 0, so autograd
  never reaches it backward.
* Softmax/LN/GELU/dropout FLOPs ignored (counted as efficiency loss, not
  work — consistent with bench.py's matmul-only analytic MFU).

Run: ``python benchmarks/ref_gpu_estimate.py`` prints the JSON block that
BASELINE.md quotes.
"""

from __future__ import annotations

import json

# ViT-B/16 at 224px (reference geometry, no token padding on GPU).
B = 64          # train batch, vit_cp.py:185 protocol / vtab.py:84
N = 197         # 14*14 patches + cls
E = 768
H = 3072
HEADS = 12
DH = E // HEADS
L = 12
R = 8           # BASELINE.json north-star rank
C = 100         # classifier head (task-dependent; negligible either way)


def gemm(m: int, k: int, n: int) -> float:
    return 2.0 * m * k * n


def reference_step_flops(rank: int = R, batch: int = B) -> dict:
    """Per-train-step FLOPs of the reference implementation."""
    bn = batch * N
    qkv = gemm(bn, E, 3 * E)
    proj = gemm(bn, E, E)
    fc1 = gemm(bn, E, H)
    fc2 = gemm(bn, H, E)
    attn = 2 * gemm(batch * HEADS * N, N, DH)  # scores + p@v
    # cp_to_tensor materialisations per layer (cara.py:27-32,52-54,76,88):
    # qkv slice (3,E,heads,dh) + proj (E,E) + up (H,E) + down (H,E).
    cp_mat = 2.0 * rank * (3 * E * E + E * E + H * E + H * E)

    fwd_dense = qkv + proj + fc1 + fc2 + attn
    fwd_delta = qkv + proj + fc1 + fc2 + cp_mat
    fwd_layer = fwd_dense + fwd_delta
    # backward: dense GEMMs dx only (1x), deltas dx+dT (2x), attention 2x.
    bwd_layer = (qkv + proj + fc1 + fc2) + 2 * (qkv + proj + fc1 + fc2) \
        + 2 * attn + 2 * cp_mat

    patch = gemm(batch * N, 16 * 16 * 3, E)            # forward only
    head = 3 * gemm(batch, E, C)                       # fwd + dx + dW
    total = L * (fwd_layer + bwd_layer) + patch + head
    return {
        "fwd_per_layer": fwd_layer,
        "bwd_per_layer": bwd_layer,
        "total_per_step": total,
        "total_per_image": total / batch,
        "dense_only_per_step": 3 * (L * fwd_dense + patch),  # fwd+2x bwd
    }


# Scenario table.  KEY FACT: the reference trains in pure fp32 — no
# autocast/amp anywhere in vit_cp.py, and torch >= 1.12 defaults
# ``torch.backends.cuda.matmul.allow_tf32 = False`` — so the AS-SHIPPED
# code on an A100 runs its matmuls at the 19.5 TF fp32 peak, not the
# 312 TF bf16 peak.  We also publish the two stronger hypothetical
# baselines (a one-line tf32 enable; a full amp/bf16 port) so the claim
# can't hide behind the weakest denominator.  Efficiency bands are for
# torch EAGER on a GEMM-dominated ViT step: cuBLAS GEMMs run near peak,
# but per-op launches, the memory-bound delta materialisation and the
# full-weight-tensor dropout passes (cara.py:27-35) drag the average.
GPU_SCENARIOS = {
    "A100 as-shipped (fp32, tf32 off, 19.5 TF)": (19.5e12, (0.50, 0.80)),
    "A100 tf32 enabled (one-line change, 156 TF)": (156e12, (0.25, 0.45)),
    "A100 hypothetical bf16/amp port (312 TF)": (312e12, (0.20, 0.40)),
    "V100 as-shipped (fp32, 15.7 TF)": (15.7e12, (0.50, 0.80)),
}

# CPU anchor: one idle "Intel Xeon @ 2.10GHz" vCPU.  Effective peak is
# uncertain — AVX-512 with 2 FMA ports at the 2.1 GHz base clock gives
# 67.2 GFLOP/s fp32 on paper, and sustained turbo can double that — so
# the anchor uses a peak RANGE x an efficiency range for oneDNN-backed
# eager fp32 (GEMM-dominated: high).  The model is falsified if the one
# number we DID measure falls outside the band.
CPU_PEAK_RANGE = (67.2e9, 134.4e9)
CPU_EFF = (0.40, 0.70)


def bands() -> dict:
    fl = reference_step_flops()
    step = fl["total_per_step"]
    cpu_lo = CPU_PEAK_RANGE[0] * CPU_EFF[0] / step * B
    cpu_hi = CPU_PEAK_RANGE[1] * CPU_EFF[1] / step * B
    out = {
        "flops_per_step": step,
        "flops_per_image": fl["total_per_image"],
        "cp_overhead_vs_dense": round(step / fl["dense_only_per_step"], 3),
        "cpu_anchor": {
            "predicted_images_per_sec": [round(cpu_lo, 3),
                                         round(cpu_hi, 3)],
            "assumed_core_peak_flops_range": list(CPU_PEAK_RANGE),
            "efficiency_band": list(CPU_EFF),
        },
        "gpu_estimates": {},
    }
    for name, (peak, eff) in GPU_SCENARIOS.items():
        lo, hi = (peak * e / step * B for e in eff)
        out["gpu_estimates"][name] = {
            "images_per_sec_band": [round(lo, 1), round(hi, 1)],
            "efficiency_band": list(eff),
        }
    shipped = out["gpu_estimates"][
        "A100 as-shipped (fp32, tf32 off, 19.5 TF)"]
    lo, hi = shipped["images_per_sec_band"]
    out["ref_gpu_denominator_images_per_sec"] = round((lo + hi) / 2, 1)
    out["denominator_note"] = (
        "denominator = A100 running the reference AS SHIPPED (fp32 "
        "matmuls; vit_cp.py has no amp and torch>=1.12 disables tf32 "
        "matmul by default); the tf32/bf16 scenarios are reported so the "
        "5x claim is also checkable against stronger baselines")
    return out


def main():
    try:
        with open("BASELINE_LOCAL.json") as f:
            measured = json.load(f)["reference_images_per_sec"]
    except Exception:
        measured = None
    out = bands()
    if measured:
        out["cpu_anchor"]["measured_images_per_sec"] = round(measured, 4)
        lo, hi = out["cpu_anchor"]["predicted_images_per_sec"]
        out["cpu_anchor"]["anchor_ok"] = bool(lo <= measured <= hi)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
