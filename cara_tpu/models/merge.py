"""Merged-weight export: fold the CP deltas into the dense backbone.

In eval mode the CaRA delta is exactly linear (the weight dropout at
``src/cara/cara.py:35,57,81,92`` is the identity), so the adapter can be
folded into the frozen weights once:

* ``qkv_kernel  += s * T_qkv``   (delta applied at ``cara.py:42``)
* ``proj_kernel += s * T_proj.T``, ``proj_bias += s * bias1`` (``cara.py:57-58``)
* ``fc1_kernel  += s * T_up.T``,  ``fc1_bias  += s * bias2`` (``cara.py:81-82``)
* ``fc2_kernel  += s * T_down``,  ``fc2_bias  += s * bias3`` (``cara.py:92-93``)

The result is a plain dense ViT — zero adapter overhead at serving time, a
capability the reference does not have (its eval path still reconstructs every
delta per batch, SURVEY.md section 3.3).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.ops import cp as cp_ops


def _qkv_tensor(params, f1, model: ViTConfig, cara: CaraConfig):
    """Dense per-layer qkv delta tensor (3, E, E_out) with out flat (H, Dh)."""
    e, h, d = model.embed_dim, model.num_heads, model.head_dim
    order = cara.cp_order
    if order == 5:
        t = cp_ops.cp_to_tensor(
            params["R1"],
            (f1, params["A2"], params["A3"], params["A4"], params["A5"]))[0]
        return t.reshape(3, e, e)
    if order == 4:
        t = cp_ops.cp_to_tensor(
            params["R1"], (f1, params["A2"], params["A3"], params["A4"]))
        return t.reshape(3, e, e)
    if order == 3:
        return cp_ops.cp_to_tensor(
            params["R1"], (f1, params["A2"], params["A3"]))
    t = cp_ops.cp_to_tensor(params["R1"], (f1, params["A2"]))  # order 2
    return t.reshape(3, e, e)


def merge_cara(
    params: Dict[str, Any],
    cara_params: Dict[str, Any],
    model: ViTConfig,
    cara: CaraConfig,
) -> Dict[str, Any]:
    """Return a new backbone pytree with the adapter folded in.

    Dispatches on the adapter family: LoRA trees (``cara.method == "lora"``
    or the per-site {a, b} shape) fold via ``lora.merge_lora``; FacT trees
    (``method.startswith("fact")`` or the shared U/V factor shape) expand
    then fold via ``fact.merge_fact``; SSF folds into the adjacent
    linear/LN weights (``ssf.merge_ssf``); BitFit adds its bias deltas
    (``bitfit.merge_bitfit``).  VPT cannot merge (prompt tokens are
    architectural) and raises.
    """
    from cara_tpu.models import adapter as adapter_lib
    from cara_tpu.models import bitfit as bitfit_lib
    from cara_tpu.models import fact as fact_lib
    from cara_tpu.models import lora as lora_lib
    from cara_tpu.models import ssf as ssf_lib
    from cara_tpu.models import vpt as vpt_lib

    if cara.method.startswith("vpt") or vpt_lib.is_vpt_params(cara_params):
        raise ValueError(
            "VPT is architectural (learnable prompt tokens, not a weight "
            "delta) and cannot fold into dense weights — serve the "
            "adapter path (Predictor(merge=False) does this automatically "
            "for prompt trees)")
    if cara.method in ("adapter", "adaptformer") \
            or adapter_lib.is_adapter_params(cara_params):
        raise ValueError(
            "bottleneck adapters are nonlinear (gelu/relu between the "
            "down/up projections) and cannot fold into dense weights — "
            "serve the adapter path (Predictor(merge=False) does this "
            "automatically for bottleneck trees)")
    if cara.method == "ssf" or ssf_lib.is_ssf_params(cara_params):
        return ssf_lib.merge_ssf(params, cara_params, model, cara)
    if cara.method == "bitfit" or bitfit_lib.is_bitfit_params(cara_params):
        return bitfit_lib.merge_bitfit(params, cara_params, model, cara)
    if cara.method.startswith("fact") or fact_lib.is_fact_params(
            cara_params):
        return fact_lib.merge_fact(params, cara_params, model, cara)
    if cara.method == "lora" or lora_lib.is_lora_params(cara_params):
        return lora_lib.merge_lora(params, cara_params, model, cara)
    if cara.moe or ("experts" in cara_params and "router" in cara_params):
        raise ValueError(
            "MoE adapters cannot be merged into the dense backbone — the "
            "delta is input-dependent (per-token routing); serve them "
            "unmerged (adapter checkpoints work in eval/serving as-is)")
    e, mr, L = model.embed_dim, model.mlp_ratio, model.depth
    s = cara.scale
    a1, p1 = cara_lib.stacked_layer_slices(cara_params, model, cara)
    p2, p3, r2 = cara_params["P2"], cara_params["P3"], cara_params["R2"]

    qkv_delta = []
    proj_delta = []
    fc1_delta = []
    fc2_delta = []
    for layer in range(L):
        t_qkv = _qkv_tensor(cara_params, a1[layer], model, cara)  # (3, E, E)
        # forward adds delta[b,n,(k,h,d)] = sum_e x[e] t[k,e,(h,d)]
        # -> fused kernel layout (E_in, (3,H,Dh)) = transpose to (E, 3, E_out)
        qkv_delta.append(jnp.transpose(t_qkv, (1, 0, 2)).reshape(e, 3 * e))

        t_proj = cp_ops.cp_to_tensor(r2, (p1[layer, 0:1], p2, p3))  # (1,E,E)
        proj_delta.append(t_proj.reshape(e, e).T)  # x @ T.T -> W += T.T

        t_up = cp_ops.cp_to_tensor(r2, (p1[layer, 1:1 + mr], p2, p3))
        fc1_delta.append(t_up.reshape(mr * e, e).T)  # (E, mr*E)

        t_down = cp_ops.cp_to_tensor(r2, (p1[layer, 1 + mr:1 + 2 * mr], p2, p3))
        fc2_delta.append(t_down.reshape(mr * e, e))  # x @ T (untransposed)

    blocks = dict(params["blocks"])
    dt = blocks["qkv"]["kernel"].dtype
    blocks["qkv"] = {
        "kernel": blocks["qkv"]["kernel"] + s * jnp.stack(qkv_delta).astype(dt),
        "bias": blocks["qkv"]["bias"],
    }
    blocks["proj"] = {
        "kernel": blocks["proj"]["kernel"] + s * jnp.stack(proj_delta).astype(dt),
        "bias": blocks["proj"]["bias"]
        + s * jnp.broadcast_to(cara_params["bias1"], (L, e)).astype(dt),
    }
    blocks["fc1"] = {
        "kernel": blocks["fc1"]["kernel"] + s * jnp.stack(fc1_delta).astype(dt),
        "bias": blocks["fc1"]["bias"]
        + s * jnp.broadcast_to(cara_params["bias2"], (L, mr * e)).astype(dt),
    }
    blocks["fc2"] = {
        "kernel": blocks["fc2"]["kernel"] + s * jnp.stack(fc2_delta).astype(dt),
        "bias": blocks["fc2"]["bias"]
        + s * jnp.broadcast_to(cara_params["bias3"], (L, e)).astype(dt),
    }
    out = dict(params)
    out["blocks"] = blocks
    return out
