"""Import CLIP vision towers from HuggingFace ``transformers`` checkpoints.

The CLIP ViT-L/14 model family exists in the registry
(``vit_large_patch14_224_clip``: ln_pre, quickGELU, visual projection) and
trains/serves through every path, but until round 3 its weights could only
be random-init — the npz loader covers the google-research ViT releases
only.  This module maps the HF ``CLIPVisionModelWithProjection`` state
dict (the format ``openai/clip-vit-large-patch14`` et al. ship in) onto
our stacked-blocks pytree, so a real CLIP backbone is one
``--backbone clip.{pt,bin}`` away.  It is also the basis of the
independent-implementation parity test (``tests/test_clip_hf_parity.py``):
a randomly-initialized HF tower is converted and must produce identical
embeddings — validating ln_pre / fused-qkv layout / quickGELU / cls
pooling / projection against code we didn't write.

Key map (HF -> ours)::

    vision_model.embeddings.class_embedding        (E,)        cls (1,1,E)
    vision_model.embeddings.patch_embedding.weight (E,C,P,P)   embed.kernel
        -> transpose (2,3,1,0) reshape (P*P*C, E)   [(ph,pw,c) flatten —
           the order patch_embed's reshape produces; bias: zeros (none in HF)]
    vision_model.embeddings.position_embedding.weight (N+1,E)  pos_embed
    vision_model.pre_layrnorm.{weight,bias}                    ln_pre [sic —
        upstream attribute name has the typo; both spellings accepted]
    ...layers.{i}.self_attn.{q,k,v}_proj           3x(E,E)     blocks.qkv
        -> concat rows then transpose: (E, 3E) with (3,H,Dh) column order
    ...layers.{i}.self_attn.out_proj               blocks.proj
    ...layers.{i}.layer_norm{1,2}                  blocks.ln{1,2}_{scale,bias}
    ...layers.{i}.mlp.fc{1,2}                      blocks.fc{1,2}
    vision_model.post_layernorm                    norm
    visual_projection.weight (proj,E)              proj_out.kernel (E,proj)
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax.numpy as jnp

from cara_tpu.config import ViTConfig


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _get(sd: Dict[str, Any], *keys: str) -> np.ndarray:
    for k in keys:
        if k in sd:
            return _np(sd[k])
    raise KeyError(
        f"CLIP state dict missing {keys[0]!r} — sample keys: "
        f"{sorted(sd.keys())[:6]}...")


def is_clip_state_dict(sd: Dict[str, Any]) -> bool:
    return any(k.startswith("vision_model.") for k in sd)


def convert_hf_clip_vision(
    sd: Dict[str, Any], cfg: ViTConfig, dtype=jnp.float32
) -> Dict[str, Any]:
    """HF CLIP vision state dict -> our param pytree (backbone only)."""
    e, L, p, c = cfg.embed_dim, cfg.depth, cfg.patch_size, cfg.in_chans
    vm = "vision_model."

    conv = _get(sd, vm + "embeddings.patch_embedding.weight")
    if conv.shape != (e, c, p, p):
        raise ValueError(
            f"patch embedding {conv.shape} != {(e, c, p, p)} — wrong "
            f"--model geometry for this checkpoint?")
    embed_kernel = conv.transpose(2, 3, 1, 0).reshape(p * p * c, e)

    def stack(fmt, transpose=False):
        arrs = [_get(sd, vm + fmt.format(i)) for i in range(L)]
        out = np.stack([a.T if transpose else a for a in arrs])
        return jnp.asarray(out, dtype)

    def qkv_kernel(i):
        ws = [_get(sd, vm + f"encoder.layers.{i}.self_attn.{n}_proj.weight")
              for n in ("q", "k", "v")]
        return np.concatenate(ws, axis=0).T  # (E, 3E), (3,H,Dh) columns

    def qkv_bias(i):
        bs = [_get(sd, vm + f"encoder.layers.{i}.self_attn.{n}_proj.bias")
              for n in ("q", "k", "v")]
        return np.concatenate(bs, axis=0)

    params: Dict[str, Any] = {
        "embed": {"kernel": jnp.asarray(embed_kernel, dtype),
                  "bias": jnp.zeros((e,), dtype)},
        "cls": jnp.asarray(
            _get(sd, vm + "embeddings.class_embedding").reshape(1, 1, e),
            dtype),
        "pos_embed": jnp.asarray(
            _get(sd, vm + "embeddings.position_embedding.weight")[None],
            dtype),
        "ln_pre": {
            "scale": jnp.asarray(_get(
                sd, vm + "pre_layrnorm.weight",
                vm + "pre_layernorm.weight"), dtype),
            "bias": jnp.asarray(_get(
                sd, vm + "pre_layrnorm.bias",
                vm + "pre_layernorm.bias"), dtype),
        },
        "blocks": {
            "ln1_scale": stack("encoder.layers.{}.layer_norm1.weight"),
            "ln1_bias": stack("encoder.layers.{}.layer_norm1.bias"),
            "qkv": {
                "kernel": jnp.asarray(
                    np.stack([qkv_kernel(i) for i in range(L)]), dtype),
                "bias": jnp.asarray(
                    np.stack([qkv_bias(i) for i in range(L)]), dtype),
            },
            "proj": {
                "kernel": stack("encoder.layers.{}.self_attn.out_proj.weight",
                                transpose=True),
                "bias": stack("encoder.layers.{}.self_attn.out_proj.bias"),
            },
            "ln2_scale": stack("encoder.layers.{}.layer_norm2.weight"),
            "ln2_bias": stack("encoder.layers.{}.layer_norm2.bias"),
            "fc1": {
                "kernel": stack("encoder.layers.{}.mlp.fc1.weight",
                                transpose=True),
                "bias": stack("encoder.layers.{}.mlp.fc1.bias"),
            },
            "fc2": {
                "kernel": stack("encoder.layers.{}.mlp.fc2.weight",
                                transpose=True),
                "bias": stack("encoder.layers.{}.mlp.fc2.bias"),
            },
        },
        "norm": {
            "scale": jnp.asarray(_get(sd, vm + "post_layernorm.weight"),
                                 dtype),
            "bias": jnp.asarray(_get(sd, vm + "post_layernorm.bias"), dtype),
        },
    }
    if cfg.proj_dim is not None:
        params["proj_out"] = {
            "kernel": jnp.asarray(
                _get(sd, "visual_projection.weight").T, dtype)}
    return params


def load_clip_backbone(path: str, cfg: ViTConfig, dtype=jnp.float32):
    """torch-serialized HF CLIP checkpoint (.pt/.bin) -> our backbone."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    if not is_clip_state_dict(sd):
        raise ValueError(
            f"{path} does not look like an HF CLIP vision checkpoint "
            "(no 'vision_model.*' keys)")
    return convert_hf_clip_vision(sd, cfg, dtype)
