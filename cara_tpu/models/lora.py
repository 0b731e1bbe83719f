"""LoRA adapters: per-matrix low-rank factor pairs at the CaRA sites.

The reference repo implements only CaRA (the CP tensorisation,
``src/cara/cara.py``); LoRA is the per-matrix baseline the CaRA paper
compares against (``README.rst:19`` "outperforms existing PEFT methods").
This module adds it as a first-class method of the same framework: the
SAME four injection sites as the reference hot loop (qkv ``cara.py:25-42``,
attention projection ``cara.py:50-58``, MLP up ``cara.py:75-82``, MLP down
``cara.py:87-93``), the same training loop / freeze semantics
(``vit_cp.py:176-182``), the same merge/export/serving stack.

TPU-native free lunch: the fused Pallas kernels (``ops/pallas/cp_dense``,
``cp_attn_block``, ``cp_mlp``) consume the CaRA delta as a collapsed
``(U, V)`` pair per site — ``delta = (x @ U) @ V`` — which is exactly
LoRA's native parameterization (``U = A``, ``V = B``).  LoRA therefore
rides every megakernel, the fused-TP shard_map path, and the merged-weight
inference path with **zero kernel changes**; only the factor plumbing
differs (per-layer independent A/B instead of shared CP factors).

Parameter tree (every leaf stacked along the leading layer axis so it rides
the ``lax.scan`` over blocks exactly like the CaRA slices):

    {"qkv":  {"a": (L, E, r),   "b": (L, r, 3E)},
     "proj": {"a": (L, E, r),   "b": (L, r, E)},
     "fc1":  {"a": (L, E, r),   "b": (L, r, hid)},
     "fc2":  {"a": (L, hid, r), "b": (L, r, E)}}

``b`` columns at the qkv site use the fused-qkv output layout
``(3, heads, head_dim)``-flattened — the same column space the qkv kernel
and the CaRA ``qkv_uv`` collapse produce, so TP head-slicing
(``vit._tp_slice_qkv_cols``) applies unchanged.

Init follows the LoRA convention (and torch's ``nn.Linear`` kaiming):
``A ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))``, ``B = 0`` — the delta is
exactly zero at step 0 (the analog of CaRA's zero-initialized contract
mode, ``cara.py:128,132``).  The LoRA ``alpha/r`` scaling is carried by
``CaraConfig.scale`` (the CLI exposes ``--lora-alpha`` as sugar for
``scale = alpha / rank``).

Weight dropout: ``CaraConfig.weight_dropout`` applies to the delta
*weight* ``A @ B`` (the framework's reference-faithful semantics,
``cara.py:35``): ``weight_dropout_impl="element"`` masks individual
elements of the dense ``A @ B`` (tile-wise in-VMEM on the fused path via
the ``*_wd`` kernels), ``"rank"`` masks rank components (native to the
factorized form).  Eval is deterministic either way.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cara_tpu.config import CaraConfig, ViTConfig

SITES = ("qkv", "proj", "fc1", "fc2")


def lora_param_shapes(
    model: ViTConfig, cara: CaraConfig
) -> Dict[str, Dict[str, Tuple[int, ...]]]:
    """Per-site factor shapes, every leaf layer-stacked (leading L axis)."""
    L, e, hid, r = model.depth, model.embed_dim, model.hidden_dim, cara.rank
    return {
        "qkv": {"a": (L, e, r), "b": (L, r, 3 * e)},
        "proj": {"a": (L, e, r), "b": (L, r, e)},
        "fc1": {"a": (L, e, r), "b": (L, r, hid)},
        "fc2": {"a": (L, hid, r), "b": (L, r, e)},
    }


def init_lora_params(
    rng: jax.Array, model: ViTConfig, cara: CaraConfig, dtype=jnp.float32
) -> Dict[str, Dict[str, jax.Array]]:
    """A ~ kaiming-uniform over fan_in, B = 0 (delta == 0 at init)."""
    shapes = lora_param_shapes(model, cara)
    keys = jax.random.split(rng, len(SITES))
    params: Dict[str, Dict[str, jax.Array]] = {}
    for key, site in zip(keys, SITES):
        a_shape = shapes[site]["a"]
        fan_in = a_shape[1]  # x @ A contracts the input dim
        bound = 1.0 / math.sqrt(fan_in)
        params[site] = {
            "a": jax.random.uniform(key, a_shape, dtype, -bound, bound),
            "b": jnp.zeros(shapes[site]["b"], dtype),
        }
    return params


def is_lora_params(tree) -> bool:
    """True for the per-site {a, b} layer-stacked tree above."""
    return (
        isinstance(tree, dict)
        and set(tree) == set(SITES)
        and all(
            isinstance(tree[s], dict) and set(tree[s]) == {"a", "b"}
            for s in SITES
        )
    )


def layer_stacks(params):
    """Split the tree into the two scan operands ``vit_forward`` threads
    through ``lax.scan`` (the slots CaRA uses for its A1/P1 row slices):
    ``(qkv_stack, {"proj", "fc1", "fc2"})`` — every leaf (L, ...)."""
    return params["qkv"], {s: params[s] for s in ("proj", "fc1", "fc2")}


def site_uv(
    site_params: Dict[str, jax.Array], comp: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array]:
    """This layer's collapsed ``(U, V)`` pair for one site — the form every
    fused kernel consumes.  ``comp``: optional (r,) rank-dropout mask
    (``weight_dropout_impl="rank"``), folded into V."""
    a, b = site_params["a"], site_params["b"]
    if comp is not None:
        b = b * comp[:, None]
    return a, b


def delta(
    x: jax.Array,
    site_params: Dict[str, jax.Array],
    *,
    rate: float = 0.0,
    drop_rng: Optional[jax.Array] = None,
    element: bool = False,
) -> jax.Array:
    """XLA-path delta ``x @ dropout(A @ B)`` (unscaled — caller applies
    ``s``).  ``element=True`` materializes the dense ``A @ B`` and masks
    its elements (reference weight-dropout semantics on the delta weight);
    otherwise rank-component dropout stays in the factorized form.  All
    four sites share this math — LoRA has no transpose asymmetry (unlike
    ``cara.py:81`` vs ``:92``)."""
    from cara_tpu.ops import cp as cp_ops

    a, b = site_params["a"], site_params["b"]
    if element:
        t = a @ b
        mask = cp_ops.weight_dropout_mask(drop_rng, t.shape, rate, x.dtype)
        if mask is not None:
            t = t * mask
        return x @ t.astype(x.dtype)
    comp = cp_ops.weight_dropout_mask(
        drop_rng, (a.shape[-1],), rate, x.dtype)
    if comp is not None:
        b = b * comp[:, None]
    return (x @ a.astype(x.dtype)) @ b.astype(x.dtype)


def merge_lora(
    params: Dict,
    lora_params: Dict,
    model: ViTConfig,
    cara: CaraConfig,
) -> Dict:
    """Fold the (eval-mode, exactly linear) LoRA deltas into the dense
    backbone: ``W_site += s * A @ B`` per layer — the LoRA counterpart of
    :func:`cara_tpu.models.merge.merge_cara`.  LoRA adds no bias terms."""
    s = cara.scale
    blocks = dict(params["blocks"])
    for site in SITES:
        a, b = lora_params[site]["a"], lora_params[site]["b"]
        dt = blocks[site]["kernel"].dtype
        d = jnp.einsum("lir,lro->lio", a.astype(jnp.float32),
                       b.astype(jnp.float32))
        blocks[site] = {
            "kernel": blocks[site]["kernel"] + (s * d).astype(dt),
            "bias": blocks[site]["bias"],
        }
    out = dict(params)
    out["blocks"] = blocks
    return out
