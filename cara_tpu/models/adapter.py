"""Bottleneck adapters (Houlsby sequential / AdaptFormer parallel).

The two classic bottleneck-module PEFT baselines from the CaRA paper's
comparison set (the reference repo implements only CaRA,
``src/cara/cara.py``), each a first-class ``--method`` with the
framework's uniform contract — same training loop / freeze semantics
(``image_classification/vit_cp.py:176-182``), same checkpoint / serving
stack:

* ``"adapter"`` — Houlsby-style SEQUENTIAL adapters ("Parameter-Efficient
  Transfer Learning for NLP", Houlsby et al., ICML 2019, as adapted to
  pre-LN ViTs by the VPT/NOAH baseline suites): an internal-skip
  bottleneck module ``z + up(gelu(down(z)))`` applied to BOTH sublayer
  outputs (after the attention projection and after fc2), inside the
  block's dropout / drop-path / residual.
* ``"adaptformer"`` — AdaptFormer PARALLEL adapters ("AdaptFormer:
  Adapting Vision Transformers for Scalable Visual Recognition", Chen et
  al., NeurIPS 2022): one bottleneck ``up(dropout(relu(down(x))))`` per
  block reading the PRE-LN2 residual stream, scaled by ``s``
  (``CaraConfig.scale``; official default 0.1) and added next to the
  drop-pathed MLP branch — the adapter output itself is neither
  drop-pathed nor output-dropped (it carries its own internal dropout,
  ``CaraConfig.adapter_dropout``; official default 0.1).

Parameter tree — every leaf layer-stacked (leading ``L`` axis) so it
rides the block ``lax.scan``'s per-layer operand slot exactly like the
LoRA site stacks (``models/lora.py``)::

    {"attn_down": {"kernel": (L, E, r), "bias": (L, r)},   # "adapter" only
     "attn_up":   {"kernel": (L, r, E), "bias": (L, E)},   # "adapter" only
     "mlp_down":  {"kernel": (L, E, r), "bias": (L, r)},
     "mlp_up":    {"kernel": (L, r, E), "bias": (L, E)}}

``r`` is the bottleneck width (``--dim``; AdaptFormer's official default
is 64, Houlsby-on-ViT baselines typically use 8-64).

Init follows AdaptFormer's official "lora" option for both methods:
down kernel kaiming-uniform (``U(-1/sqrt(E), 1/sqrt(E))``), up kernel and
both biases ZERO — the adapter is exactly the identity at step 0, the
framework's zero-delta-at-init convention (``cara.py:128,132``).  (The
original Houlsby init uses near-zero ``N(0, 1e-2)`` on both; the zero up
projection is the same near-identity intent made exact.)

TPU-native integration: the nonlinearity makes these adapters
UN-MERGEABLE (``merge_cara`` raises; serving always runs the adapter
path) and keeps them off the fused low-rank megakernels — they run the
XLA dense block path (``vit.resolve_dense_impl`` pins ``"xla"``), where
XLA fuses the two rank-r GEMMs + activation into the surrounding block.
The per-layer dicts ride the ``lax.scan`` / pipeline stage sharding
tree-generically, and the batch/data sharding story is unchanged (the
adapter params are replicated like every other adapter tree).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cara_tpu.config import CaraConfig, ViTConfig

SEQ_SITES = ("attn_down", "attn_up", "mlp_down", "mlp_up")
PAR_SITES = ("mlp_down", "mlp_up")


def adapter_param_shapes(
    model: ViTConfig, cara: CaraConfig
) -> Dict[str, Dict[str, Tuple[int, ...]]]:
    """Per-site {kernel, bias} shapes, every leaf layer-stacked."""
    L, e, r = model.depth, model.embed_dim, cara.rank
    down = {"kernel": (L, e, r), "bias": (L, r)}
    up = {"kernel": (L, r, e), "bias": (L, e)}
    shapes = {"mlp_down": down, "mlp_up": up}
    if cara.method == "adapter":
        shapes["attn_down"] = down
        shapes["attn_up"] = up
    return shapes


def init_adapter_params(
    rng: jax.Array, model: ViTConfig, cara: CaraConfig, dtype=jnp.float32
) -> Dict[str, Dict[str, jax.Array]]:
    """Down kaiming-uniform / up zero — exact identity at step 0."""
    shapes = adapter_param_shapes(model, cara)
    downs = sorted(s for s in shapes if s.endswith("_down"))
    keys = jax.random.split(rng, len(downs))
    bound = 1.0 / math.sqrt(model.embed_dim)
    out: Dict[str, Dict[str, jax.Array]] = {}
    for key, site in zip(keys, downs):
        out[site] = {
            "kernel": jax.random.uniform(
                key, shapes[site]["kernel"], dtype, -bound, bound),
            "bias": jnp.zeros(shapes[site]["bias"], dtype),
        }
        up = site.replace("_down", "_up")
        out[up] = {
            "kernel": jnp.zeros(shapes[up]["kernel"], dtype),
            "bias": jnp.zeros(shapes[up]["bias"], dtype),
        }
    return out


def is_adapter_params(tree) -> bool:
    """True for the layer-stacked bottleneck tree above (either method)."""
    return (
        isinstance(tree, dict)
        and set(tree) in (set(SEQ_SITES), set(PAR_SITES))
        and all(isinstance(tree[s], dict) and set(tree[s]) == {
            "kernel", "bias"} for s in tree)
    )


def detect_method(tree) -> str:
    """"adapter" (sequential) vs "adaptformer" (parallel) from the tree."""
    return "adapter" if "attn_down" in tree else "adaptformer"


def check_geometry(tree, model: ViTConfig, cara: CaraConfig) -> None:
    """Fail fast on a tree trained with a different model/config."""
    want = adapter_param_shapes(model, cara)
    if set(tree) != set(want):
        raise ValueError(
            f"adapter tree sites {sorted(tree)} do not match "
            f"method={cara.method!r} (wants {sorted(want)}) — was it "
            "trained as the other adapter variant?")
    for site, pair in want.items():
        for leaf, shape in pair.items():
            got = tuple(tree[site][leaf].shape)
            if got != shape:
                raise ValueError(
                    f"adapter {site}/{leaf} has shape {got}; rank="
                    f"{cara.rank} on this model geometry wants {shape}")


def bottleneck(
    x: jax.Array,
    down: Dict[str, jax.Array],
    up: Dict[str, jax.Array],
    act: str,
    rng: Optional[jax.Array] = None,
    rate: float = 0.0,
) -> jax.Array:
    """``up(act_dropout(act(down(x))))`` for ONE layer's (non-stacked)
    {kernel, bias} pair — the caller adds the skip / scale per method.

    The two rank-r GEMMs stay in the activation dtype; XLA fuses the
    activation + dropout mask between them (nothing round-trips HBM at
    r <= 64).
    """
    h = x @ down["kernel"].astype(x.dtype) + down["bias"].astype(x.dtype)
    h = jax.nn.relu(h) if act == "relu" else jax.nn.gelu(
        h, approximate=False)
    if rate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - rate, h.shape)
        h = jnp.where(keep, h / (1.0 - rate), 0.0).astype(x.dtype)
    return h @ up["kernel"].astype(x.dtype) + up["bias"].astype(x.dtype)
