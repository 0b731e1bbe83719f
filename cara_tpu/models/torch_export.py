"""Exporter to the reference's torch ``.pt`` checkpoint format.

The inverse of :mod:`cara_tpu.models.torch_import`: our stacked JAX
pytree -> a timm-0.4.12 ViT ``state_dict`` with the CaRA ``CP_*``
parameters attached at the root, exactly the artifact the reference
trains and consumes (``src/cara/cara.py:112-125``,
``image_classification/vit_cp.py:66,168-173``).  With it, an adapter
trained on TPU in this framework can be evaluated — unchanged — by the
upstream codebase's ``--evaluate`` flow (``vit_cp.py:170`` does a strict
``load_state_dict``), closing the interop loop in both directions:

* import:  released reference ``.pt``  -> our eval/serving stack
  (:mod:`torch_import`), and
* export:  our trained checkpoint      -> reference ``--evaluate``
  (this module).

Layout conversions are the exact inverses documented in
``torch_import.py``: linear kernels (in, out) -> torch (out, in); the
patch-embed GEMM kernel (P*P*C, E) -> OIHW conv weight (E, C, P, P);
the stacked per-layer arrays unstack into ``blocks.{i}.*`` keys; CP
factors gain their ``CP_`` prefix verbatim (the A1/P1 row bookkeeping is
shared, ``cara.py:143-164``).

Only CP adapters (orders 2-5) are representable — the reference has no
LoRA/VPT/SSF/BitFit/adapter/MoE variants, so those methods refuse to
export rather than producing a state dict upstream cannot load.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np

from cara_tpu.config import ViTConfig

# Per-order QKV factor sets, matching set_cara/set_CP
# (cara.py:112-125, dim_experiment.py:264-295) and torch_import.
_FACTOR_NAMES = {5: ("A1", "A2", "A3", "A4", "A5"),
                 4: ("A1", "A2", "A3", "A4"),
                 3: ("A1", "A2", "A3"),
                 2: ("A1", "A2")}


def _np32(v) -> np.ndarray:
    """Any array-like (jnp, possibly bf16) -> float32 numpy.

    Reference checkpoints are fp32 (eager torch training); bf16 has no
    numpy dtype, so everything is upcast on the way out.
    """
    a = np.asarray(v, dtype=np.float32)
    return np.ascontiguousarray(a)


def to_torch_state_dict(
    params: Dict[str, Any],
    cara_params: Optional[Dict[str, Any]],
    cfg: ViTConfig,
    cp_order: int = 4,
) -> Dict[str, np.ndarray]:
    """(params, cara_params) -> flat timm-0.4.12 ``state_dict`` mapping
    (values are float32 numpy arrays; callers wrap in torch tensors).

    Raises ``ValueError`` for adapter trees that are not plain CP factor
    sets (LoRA/VPT/MoE/... have no reference-side counterpart).
    """
    e, L, p = cfg.embed_dim, cfg.depth, cfg.patch_size
    sd: Dict[str, np.ndarray] = {}

    emb_k = _np32(params["embed"]["kernel"])  # (P*P*C, E)
    if emb_k.shape != (p * p * cfg.in_chans, e):
        raise ValueError(
            f"embed kernel shape {emb_k.shape} does not match config "
            f"(want ({p * p * cfg.in_chans}, {e}))")
    sd["cls_token"] = _np32(params["cls"])
    sd["pos_embed"] = _np32(params["pos_embed"])
    # (P*P*C, E) -> (P, P, C, E) -> OIHW (E, C, P, P), inverting
    # torch_import.convert_torch_state_dict's transpose(2,3,1,0).
    sd["patch_embed.proj.weight"] = np.ascontiguousarray(
        emb_k.reshape(p, p, cfg.in_chans, e).transpose(3, 2, 0, 1))
    sd["patch_embed.proj.bias"] = _np32(params["embed"]["bias"])

    blocks = params["blocks"]
    # One float32 conversion per stacked array (NOT per layer — converting
    # inside the loop would copy each ~GB-scale stacked kernel L times).
    blocks32 = jax.tree_util.tree_map(_np32, blocks)

    def unstack(arr32, i):
        return arr32[i]

    for i in range(L):
        pre = f"blocks.{i}."
        sd[pre + "norm1.weight"] = unstack(blocks32["ln1_scale"], i)
        sd[pre + "norm1.bias"] = unstack(blocks32["ln1_bias"], i)
        sd[pre + "attn.qkv.weight"] = np.ascontiguousarray(
            unstack(blocks32["qkv"]["kernel"], i).T)  # (E,3E) -> (3E,E)
        sd[pre + "attn.qkv.bias"] = unstack(blocks32["qkv"]["bias"], i)
        sd[pre + "attn.proj.weight"] = np.ascontiguousarray(
            unstack(blocks32["proj"]["kernel"], i).T)
        sd[pre + "attn.proj.bias"] = unstack(blocks32["proj"]["bias"], i)
        sd[pre + "norm2.weight"] = unstack(blocks32["ln2_scale"], i)
        sd[pre + "norm2.bias"] = unstack(blocks32["ln2_bias"], i)
        sd[pre + "mlp.fc1.weight"] = np.ascontiguousarray(
            unstack(blocks32["fc1"]["kernel"], i).T)
        sd[pre + "mlp.fc1.bias"] = unstack(blocks32["fc1"]["bias"], i)
        sd[pre + "mlp.fc2.weight"] = np.ascontiguousarray(
            unstack(blocks32["fc2"]["kernel"], i).T)
        sd[pre + "mlp.fc2.bias"] = unstack(blocks32["fc2"]["bias"], i)

    sd["norm.weight"] = _np32(params["norm"]["scale"])
    sd["norm.bias"] = _np32(params["norm"]["bias"])
    if "pre_logits" in params:
        sd["pre_logits.fc.weight"] = np.ascontiguousarray(
            _np32(params["pre_logits"]["kernel"]).T)
        sd["pre_logits.fc.bias"] = _np32(params["pre_logits"]["bias"])
    if "head" in params:
        sd["head.weight"] = np.ascontiguousarray(
            _np32(params["head"]["kernel"]).T)
        sd["head.bias"] = _np32(params["head"]["bias"])

    if cara_params is not None:
        if cp_order not in _FACTOR_NAMES:
            raise ValueError(f"unsupported cp_order {cp_order}")
        names = _FACTOR_NAMES[cp_order] + (
            "P1", "P2", "P3", "R1", "R2", "bias1", "bias2", "bias3")
        missing = [n for n in names if n not in cara_params]
        extra = [n for n in cara_params if n not in names]
        if missing or extra:
            raise ValueError(
                "adapter tree is not a plain CP factor set (only CP "
                "adapters exist in the reference; LoRA/VPT/SSF/BitFit/"
                f"adapter/MoE trees cannot export) — missing={missing} "
                f"unexpected={extra}")
        for n in names:
            sd["CP_" + n] = _np32(cara_params[n])
    return sd


def save_torch_checkpoint(
    path: str,
    params: Dict[str, Any],
    cara_params: Optional[Dict[str, Any]],
    cfg: ViTConfig,
    cp_order: int = 4,
) -> None:
    """Write a reference-consumable ``.pt`` (``torch.save`` of a flat
    tensor ``state_dict``, the format of ``vit_cp.py:66``)."""
    import torch

    sd = to_torch_state_dict(params, cara_params, cfg, cp_order)
    # .copy(): jnp->np views can be non-writable, which torch.from_numpy
    # warns about; checkpoints are small enough that a copy is free.
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, path)
