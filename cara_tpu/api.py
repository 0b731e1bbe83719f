"""High-level model construction API.

The reference's public surface is a single function ``cara(config)`` taking
``{model, rank, scale, l_mu, l_std}`` and returning the patched module
(``src/cara/cara.py:169-188``).  The functional equivalent here returns a
:class:`CaraModel` bundle: backbone params (frozen), adapter params
(trainable), and both configs — everything the train/eval/merge entry points
consume.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from cara_tpu.config import CaraConfig, ViTConfig, get_model_config
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import npz as npz_lib
from cara_tpu.models import vit as vit_lib


@dataclasses.dataclass
class CaraModel:
    cfg: ViTConfig
    cara_cfg: CaraConfig
    params: Dict[str, Any]        # backbone + head (head is trainable)
    cara_params: Dict[str, Any]   # CP adapter (trainable)

    def forward(self, x, *, train=False, rng=None, remat=False):
        return vit_lib.vit_forward(
            self.params, x, self.cfg, cara_params=self.cara_params,
            cara_cfg=self.cara_cfg, train=train, rng=rng, remat=remat)

    def merged(self) -> Dict[str, Any]:
        from cara_tpu.models.merge import merge_cara

        return merge_cara(self.params, self.cara_params, self.cfg, self.cara_cfg)

    @property
    def trainable_count(self) -> int:
        """CP params only, head excluded — matches the reference's printed
        "Total parameters" (``vit_cp.py:175-183``).  The non-adapter
        control rows have no adapter tree: ``linear`` reports the head
        (what actually trains), ``full`` the whole model."""
        if self.cara_cfg.method in ("linear", "full"):
            return self.cara_cfg.trainable_param_count(self.cfg)
        return cara_lib.count_params(self.cara_params)


def build_model(
    model_name: str = "vit_base_patch16_224_in21k",
    *,
    method: str = "cara",
    rank: int = 32,
    scale: float = 1.0,
    l_mu: float = 1.0,
    l_std: float = 0.0,
    num_classes: Optional[int] = None,
    seed: int = 0,
    backbone_path: Optional[str] = None,
    cp_order: int = 4,
    delta_impl: str = "factorized",
    weight_dropout: Optional[float] = None,
    weight_dropout_impl: str = "element",
    moe_experts: int = 0,
    moe_top_k: int = 2,
    moe_aux_coef: float = 0.01,
    fact_core_rank: int = 0,
    vpt_tokens: int = 8,
    adapter_dropout: Optional[float] = None,
    dtype=jnp.float32,
    model_overrides: Optional[Dict[str, Any]] = None,
) -> CaraModel:
    """Build backbone + adapter, mirroring the reference driver's sequence
    (``vit_cp.py:155-166``): create model (npz checkpoint if available),
    apply CaRA, reset classifier.

    ``weight_dropout=None`` resolves to the method default: the
    reference's 0.1 for CaRA (``cara.py:148,158``), 0.0 for every other
    family (LoRA/FacT conventionally train undropped; VPT/SSF/BitFit have
    no delta weight and reject a nonzero rate).

    ``moe_experts > 1`` builds the mixture-of-expert-adapters variant
    (``models.moe``): ``cara_params`` becomes the ``{"experts", "router"}``
    tree and training adds the load-balance auxiliary loss."""
    cfg = get_model_config(model_name, **(model_overrides or {}))
    if weight_dropout_impl not in ("element", "rank", "row"):
        raise ValueError(
            f"unknown weight_dropout_impl {weight_dropout_impl!r} "
            "(element = exact reference semantics, rank / row = "
            "structured alternatives — config.CaraConfig docs)")
    if weight_dropout is None:
        weight_dropout = 0.1 if method == "cara" else 0.0
    if adapter_dropout is None:
        # AdaptFormer's official release trains with 0.1 internal dropout;
        # Houlsby-style sequential adapters conventionally use none.
        adapter_dropout = 0.1 if method == "adaptformer" else 0.0
    cara_cfg = CaraConfig(
        method=method,
        rank=rank, scale=scale, l_mu=l_mu, l_std=l_std,
        cp_order=cp_order, delta_impl=delta_impl,
        weight_dropout=weight_dropout,
        weight_dropout_impl=weight_dropout_impl,
        moe_experts=moe_experts, moe_top_k=moe_top_k,
        moe_aux_coef=moe_aux_coef, fact_core_rank=fact_core_rank,
        vpt_tokens=vpt_tokens, adapter_dropout=adapter_dropout,
    )
    root = jax.random.key(seed)
    k_backbone, k_cara, k_head = jax.random.split(root, 3)

    if backbone_path and os.path.exists(backbone_path):
        if backbone_path.endswith((".pt", ".pth", ".bin")):
            # torch-serialized backbone: HF CLIP vision towers
            # (models/clip_import.py key map).
            from cara_tpu.models import clip_import

            params = clip_import.load_clip_backbone(
                backbone_path, cfg, dtype)
        else:
            params = npz_lib.load_npz_backbone(backbone_path, cfg, dtype)
        params = npz_lib.maybe_resize_pos_embed(params, cfg)
        if "head" not in params and cfg.num_classes > 0:
            # _head_in_dim: the head consumes proj_out's output on CLIP
            # towers (proj_dim), not repr_size/embed_dim.
            params["head"] = vit_lib._torch_linear_init(
                k_head, vit_lib._head_in_dim(cfg), cfg.num_classes, dtype)
    else:
        params = vit_lib.init_vit_params(k_backbone, cfg, dtype)

    if cara_cfg.moe:
        from cara_tpu.models import moe as moe_lib

        cara_params = moe_lib.init_moe_params(k_cara, cfg, cara_cfg, dtype)
    else:
        cara_params = cara_lib.init_cara_params(k_cara, cfg, cara_cfg, dtype)

    if num_classes is not None:
        params = vit_lib.reset_classifier(params, k_head, cfg, num_classes, dtype)
        cfg = dataclasses.replace(cfg, num_classes=num_classes)
    return CaraModel(cfg, cara_cfg, params, cara_params)
