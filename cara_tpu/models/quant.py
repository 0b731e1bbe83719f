"""int8 quantization for serving: weight-only (w8) and full int8 (w8a8).

Two modes, both per-output-channel symmetric on the stacked block
kernels (qkv/proj/fc1/fc2 — the ~85M-param bulk); embed, head, LN and
positional parameters stay full precision either way:

* ``mode="w8"`` (weight-only): int8 codes dequantize to the activation
  dtype inside the per-layer GEMM, the MXU still runs bf16.  Measured
  scope (benchmarks/RESULTS.md round 3): ViT serving is NOT weight-bound
  even at batch 1 — each image carries 197 tokens (arithmetic intensity
  ~197, far above the MXU byte/FLOP breakeven), the weight stream is only
  ~25-30% of bs1 latency, so the win caps at ~13% and measures ~7-8% at
  bs4-16 (losing at bs1 to convert overhead).  OPT-IN.  (The
  "weight-bound small-batch" framing applies to M=1 decode workloads
  like LLMs, not 197-token ViT images.)

* ``mode="w8a8"`` (full int8): activations additionally quantize
  per-token symmetric int8 at runtime (dynamic scales — exact row
  maxima, no calibration set needed) and the GEMM runs int8 x int8 ->
  int32 on the MXU, which on v5e executes at 2x the bf16 rate
  (measured 284 TOPS vs 161 TF on this chip, benchmarks/RESULTS.md).
  This attacks the COMPUTE bound that makes w8 pointless: the dense
  sites carry most of the forward FLOPs, so serving throughput improves
  even where weight streaming never mattered.  Dequant is exact-form
  ``y = y_int32 * (ax_row x scale_col)``; the attention score/value
  GEMMs and everything nonlinear stay bf16/f32.

Quality: per-channel symmetric weight int8 is a well-characterized
<=0.5 top-1 technique on ViT classifiers; dynamic per-token activation
int8 adds bounded error (exact row maxima, so |x - q*ax| <= ax/2
elementwise).  ``tests/test_quant.py`` bounds logit deviation for both
modes.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

QUANT_NAMES = ("qkv", "proj", "fc1", "fc2")


def quantize_kernel(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(..., in, out) float kernel -> {"q": int8, "scale": (..., 1, out)}.

    Symmetric per-output-channel: ``w ~= q * scale``.
    """
    # Quantize in float32 regardless of input dtype: doing the
    # scale/divide/round in bf16 (8-bit mantissa) perturbs codes and
    # breaks the |w - q*scale| <= scale/2 guarantee.
    w32 = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w32), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(w.dtype)}


def dequantize_kernel(k: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    q = k["qa"] if "qa" in k else k["q"]
    return q.astype(k["scale"].dtype) * k["scale"]


def quantize_block_weights(params: Dict[str, Any],
                           mode: str = "w8") -> Dict[str, Any]:
    """Quantize the stacked block kernels (qkv/proj/fc1/fc2) to int8 quant
    dicts consumed by ``vit.matk``; biases, LayerNorms, embed, head and
    positional parameters stay in full precision.

    ``mode="w8"`` stores the codes under key ``"q"`` (weight-only dequant
    GEMM); ``"w8a8"`` stores them under ``"qa"``, which ``matk`` reads as
    "also quantize the activations and run the int8 MXU path".  The key
    name carries the mode because the dict rides the ``lax.scan`` over
    layers, where every leaf must be a sliceable array — a bool marker
    leaf would break the scan.
    """
    if mode not in ("w8", "w8a8"):
        raise ValueError(f"quantize mode must be 'w8' or 'w8a8', got "
                         f"{mode!r}")
    blocks = dict(params["blocks"])
    for name in QUANT_NAMES:
        lin = blocks[name]
        k = quantize_kernel(lin["kernel"])
        if mode == "w8a8":
            k = {"qa": k["q"], "scale": k["scale"]}
        blocks[name] = {"kernel": k, "bias": lin["bias"]}
    out = dict(params)
    out["blocks"] = blocks
    return out
