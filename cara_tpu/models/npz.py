"""Loader for the original JAX ViT ``.npz`` checkpoints (``ViT-B_16.npz``).

The reference feeds this very file to timm
(``create_model(..., checkpoint_path="./ViT-B_16.npz")``,
``image_classification/vit_cp.py:155``) — it is the google-research
``vision_transformer`` release format, so a TPU/JAX framework loads it
natively with no torch in the loop (SURVEY.md section 7 design stance 5).

Expected key layout (AugReg / original releases)::

    embedding/kernel (P,P,3,D)            embedding/bias (D,)
    cls (1,1,D)
    Transformer/posembed_input/pos_embedding (1,N+1,D)
    Transformer/encoderblock_{i}/LayerNorm_0/{scale,bias}
    Transformer/encoderblock_{i}/MultiHeadDotProductAttention_1/
        {query,key,value}/kernel (D,H,Dh)  .../bias (H,Dh)
        out/kernel (H,Dh,D)                out/bias (D,)
    Transformer/encoderblock_{i}/LayerNorm_2/{scale,bias}
    Transformer/encoderblock_{i}/MlpBlock_3/Dense_{0,1}/{kernel,bias}
    Transformer/encoder_norm/{scale,bias}
    pre_logits/{kernel,bias}              (absent in some releases)
    head/{kernel,bias}                    (absent / num_classes varies)

The separate q/k/v kernels are fused into our (D, 3*D) qkv kernel with output
order (3, heads, head_dim) — the same flattening the forward pass unpacks.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax.numpy as jnp

from cara_tpu.config import ViTConfig


def _get(z, key):
    if key not in z:
        raise KeyError(
            f"npz checkpoint missing '{key}' — keys present: "
            f"{sorted(z.keys())[:8]}..."
        )
    return np.asarray(z[key])


def load_npz_backbone(
    path: str, cfg: ViTConfig, dtype=jnp.float32
) -> Dict[str, Any]:
    """Read the npz and return our stacked-blocks param pytree."""
    z = np.load(path)
    return convert_npz_dict(dict(z), cfg, dtype)


def convert_npz_dict(
    z: Dict[str, np.ndarray], cfg: ViTConfig, dtype=jnp.float32
) -> Dict[str, Any]:
    e, h, dh, L = cfg.embed_dim, cfg.num_heads, cfg.head_dim, cfg.depth
    p = cfg.patch_size

    emb_k = _get(z, "embedding/kernel")  # (P, P, C, D) HWIO
    assert emb_k.shape == (p, p, cfg.in_chans, e), emb_k.shape
    params: Dict[str, Any] = {
        "embed": {
            "kernel": jnp.asarray(
                emb_k.reshape(p * p * cfg.in_chans, e), dtype),
            "bias": jnp.asarray(_get(z, "embedding/bias"), dtype),
        },
        "cls": jnp.asarray(_get(z, "cls"), dtype),
        "pos_embed": jnp.asarray(
            _get(z, "Transformer/posembed_input/pos_embedding"), dtype),
        "norm": {
            "scale": jnp.asarray(_get(z, "Transformer/encoder_norm/scale"), dtype),
            "bias": jnp.asarray(_get(z, "Transformer/encoder_norm/bias"), dtype),
        },
    }

    def blk(i, suffix):
        return _get(z, f"Transformer/encoderblock_{i}/{suffix}")

    ln1_s, ln1_b, ln2_s, ln2_b = [], [], [], []
    qkv_k, qkv_b, out_k, out_b = [], [], [], []
    fc1_k, fc1_b, fc2_k, fc2_b = [], [], [], []
    attn = "MultiHeadDotProductAttention_1"
    for i in range(L):
        ln1_s.append(blk(i, "LayerNorm_0/scale"))
        ln1_b.append(blk(i, "LayerNorm_0/bias"))
        ln2_s.append(blk(i, "LayerNorm_2/scale"))
        ln2_b.append(blk(i, "LayerNorm_2/bias"))
        qs = [blk(i, f"{attn}/{n}/kernel") for n in ("query", "key", "value")]
        bs = [blk(i, f"{attn}/{n}/bias") for n in ("query", "key", "value")]
        # (D,H,Dh) x3 -> (D, 3, H, Dh) -> (D, 3D); bias (H,Dh) x3 -> (3D,)
        qkv_k.append(np.stack(qs, axis=1).reshape(e, 3 * e))
        qkv_b.append(np.stack(bs, axis=0).reshape(3 * e))
        out_k.append(blk(i, f"{attn}/out/kernel").reshape(e, e))  # (H,Dh,D)
        out_b.append(blk(i, f"{attn}/out/bias"))
        fc1_k.append(blk(i, "MlpBlock_3/Dense_0/kernel"))
        fc1_b.append(blk(i, "MlpBlock_3/Dense_0/bias"))
        fc2_k.append(blk(i, "MlpBlock_3/Dense_1/kernel"))
        fc2_b.append(blk(i, "MlpBlock_3/Dense_1/bias"))

    st = lambda xs: jnp.asarray(np.stack(xs), dtype)
    params["blocks"] = {
        "ln1_scale": st(ln1_s), "ln1_bias": st(ln1_b),
        "qkv": {"kernel": st(qkv_k), "bias": st(qkv_b)},
        "proj": {"kernel": st(out_k), "bias": st(out_b)},
        "ln2_scale": st(ln2_s), "ln2_bias": st(ln2_b),
        "fc1": {"kernel": st(fc1_k), "bias": st(fc1_b)},
        "fc2": {"kernel": st(fc2_k), "bias": st(fc2_b)},
    }

    if "pre_logits/kernel" in z and cfg.repr_size is not None:
        params["pre_logits"] = {
            "kernel": jnp.asarray(_get(z, "pre_logits/kernel"), dtype),
            "bias": jnp.asarray(_get(z, "pre_logits/bias"), dtype),
        }
    if "head/kernel" in z and cfg.num_classes > 0:
        hk = _get(z, "head/kernel")
        if hk.shape[-1] == cfg.num_classes:
            params["head"] = {
                "kernel": jnp.asarray(hk, dtype),
                "bias": jnp.asarray(_get(z, "head/bias"), dtype),
            }
    return params


def maybe_resize_pos_embed(params, cfg: ViTConfig):
    """Bicubic-interpolate a checkpoint pos-embed to the configured grid
    (needed e.g. when fine-tuning at a different resolution)."""
    pos = params["pos_embed"]
    want = cfg.seq_len
    if pos.shape[1] == want:
        return params
    import jax

    ntok = pos.shape[1]
    has_cls = cfg.use_cls_token
    cls_tok = pos[:, :1] if has_cls else None
    grid_old = int(round((ntok - (1 if has_cls else 0)) ** 0.5))
    body = pos[:, 1:] if has_cls else pos
    body = body.reshape(1, grid_old, grid_old, -1)
    body = jax.image.resize(
        body, (1, cfg.grid_size, cfg.grid_size, body.shape[-1]), "bicubic")
    body = body.reshape(1, cfg.grid_size * cfg.grid_size, -1)
    new = jnp.concatenate([cls_tok, body], axis=1) if has_cls else body
    out = dict(params)
    out["pos_embed"] = new
    return out
