"""VPT: Visual Prompt Tuning (deep and shallow) as a first-class method.

VPT ("Visual Prompt Tuning", Jia et al., ECCV 2022) freezes the whole
backbone and trains only P learnable prompt tokens prepended to the
sequence — per layer (VPT-Deep: each layer's prompt slots are REPLACED
with fresh learnable tokens before the block runs) or only at the input
(VPT-Shallow: the prompts flow through the stack like ordinary tokens).
It is one of the published PEFT baselines the CaRA paper compares
against (the reference implements only CaRA, ``src/cara/cara.py``); this
module adds it with the framework's uniform method contract — same
training loop / freeze semantics (``vit_cp.py:176-182``), same
checkpoint / serving stack.

Parameter tree: ``{"prompts": (L, P, E)}`` for deep, ``(1, P, E)`` for
shallow.  Prompts sit between the cls token and the patch tokens
(positions ``1..P`` with a cls token, ``0..P-1`` without), receive NO
positional embedding (the paper's placement: inserted after pos-embed),
and are stripped before the classification feature is read (cls models
read position 0, which prompts never occupy; mean-pool models average
the patch tokens only).

Init follows the official release: xavier-uniform with the patch-embed
fan — ``U(-v, v), v = sqrt(6 / (3 * patch**2 + E))``.

TPU-native integration: the deep prompts ride the SAME ``lax.scan`` over
stacked blocks as every other per-layer operand (the CaRA row slices,
LoRA stacks, per-layer rng keys) — one traced program regardless of
depth, and the per-layer "replace the prompt slots" is a static-index
``dynamic_update_slice`` XLA fuses into the block.  The sequence simply
becomes N + P tokens, so both attention paths (full-score and blockwise
Pallas kernels, which tile/pad the token axis anyway) and sequence
parallelism apply unchanged.  VPT is ARCHITECTURAL — extra tokens, not a
weight delta — so there is no merged-weight export (``merge_cara``
raises); serving always runs the adapter path.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from cara_tpu.config import CaraConfig, ViTConfig


def vpt_param_shapes(
    model: ViTConfig, cara: CaraConfig
) -> Dict[str, Tuple[int, ...]]:
    stacks = model.depth if cara.method == "vpt_deep" else 1
    return {"prompts": (stacks, cara.vpt_tokens, model.embed_dim)}


def init_vpt_params(
    rng: jax.Array, model: ViTConfig, cara: CaraConfig, dtype=jnp.float32
) -> Dict[str, jax.Array]:
    """Official-release init: xavier-uniform over the patch-embed fan."""
    shape = vpt_param_shapes(model, cara)["prompts"]
    val = math.sqrt(
        6.0 / float(3 * model.patch_size * model.patch_size
                    + model.embed_dim))
    return {"prompts": jax.random.uniform(rng, shape, dtype, -val, val)}


def is_vpt_params(tree) -> bool:
    return (isinstance(tree, dict) and set(tree) == {"prompts"}
            and getattr(tree["prompts"], "ndim", 0) == 3)


def detect_method(tree) -> str:
    """"vpt_deep" / "vpt_shallow" from the prompt stack's leading axis."""
    return "vpt_deep" if tree["prompts"].shape[0] > 1 else "vpt_shallow"


def check_geometry(tree, model: ViTConfig, cara: CaraConfig) -> None:
    want = vpt_param_shapes(model, cara)["prompts"]
    got = tuple(tree["prompts"].shape)
    if got != want:
        raise ValueError(
            f"VPT prompt stack has shape {got}; method={cara.method!r} "
            f"with vpt_tokens={cara.vpt_tokens} on this model geometry "
            f"wants {want} — was the tree trained with a different "
            "model/config?")


def insert_prompts(
    tokens: jax.Array, prompts: jax.Array, pos0: int
) -> jax.Array:
    """Concatenate the (broadcast) first prompt slice into the sequence at
    ``pos0`` (1 with a cls token, 0 without)."""
    b = tokens.shape[0]
    p = jnp.broadcast_to(prompts, (b,) + prompts.shape[-2:]).astype(
        tokens.dtype)
    return jnp.concatenate([tokens[:, :pos0], p, tokens[:, pos0:]], axis=1)


def set_prompts(
    tokens: jax.Array, prompts_l: jax.Array, pos0: int
) -> jax.Array:
    """VPT-Deep per-layer replacement of the prompt slots (static-index
    dynamic_update_slice; (B, P, E) broadcast of this layer's prompts)."""
    b = tokens.shape[0]
    p = jnp.broadcast_to(
        prompts_l, (b,) + prompts_l.shape[-2:]).astype(tokens.dtype)
    return jax.lax.dynamic_update_slice(tokens, p, (0, pos0, 0))


def strip_prompts(
    tokens: jax.Array, n_prompts: int, pos0: int
) -> jax.Array:
    """Remove the prompt slots before the classification feature read."""
    return jnp.concatenate(
        [tokens[:, :pos0], tokens[:, pos0 + n_prompts:]], axis=1)
