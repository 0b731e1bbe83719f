"""Importer for the reference's torch ``.pt`` checkpoints.

The reference's only reproducible accuracy artifact is its released
per-task checkpoints, consumed via ``--evaluate``
(``/root/reference/README.rst:70``, ``image_classification/vit_cp.py:168-173``).
Those are full torch ``state_dict``s of a timm-0.4.12 ViT with the CaRA
``CP_*`` parameters attached to the root module
(``src/cara/cara.py:112-125``) and the classifier head reset
(``vit_cp.py:166``).  This module maps that state dict onto our stacked
JAX pytree so released checkpoints can be evaluated the day the data
appears — and so top-1 parity (BASELINE north star: within 0.2%) is
testable at all.

Layout conversions (timm/torch -> cara_tpu):

* torch ``nn.Linear`` stores ``weight`` as (out, in) and computes
  ``x @ W.T + b``; our kernels are (in, out) -> transpose.
* ``patch_embed.proj.weight`` is an OIHW conv kernel (E, C, P, P); our
  patch embed is a GEMM over (ph, pw, c)-flattened patches -> permute to
  HWIO and flatten, exactly like the npz loader
  (:mod:`cara_tpu.models.npz`).
* ``blocks.{i}.attn.qkv.weight`` is (3E, E) with rows ordered
  (3, heads, head_dim) — transposing gives our (E, 3E) kernel whose output
  axis is flattened (3, heads, head_dim), the same unpacking timm's
  ``qkv(x).reshape(B, N, 3, H, Dh)`` performs.
* ``CP_A*/CP_P*/CP_R*/CP_bias*`` copy over verbatim (drop the ``CP_``
  prefix): the row bookkeeping of ``A1`` (row ``3l+k``) and ``P1``
  (per layer: 1 proj + mlp_ratio up + mlp_ratio down) is identical to the
  reference's ``attn_idx``/``idx`` bookkeeping (``cara.py:143-164``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from cara_tpu.config import ViTConfig


def _np(v) -> np.ndarray:
    """torch.Tensor | np.ndarray -> np.ndarray (no torch import needed for
    arrays)."""
    if isinstance(v, np.ndarray):
        return v
    if hasattr(v, "detach"):  # torch.Tensor
        return v.detach().cpu().numpy()
    return np.asarray(v)


def _get(sd: Dict[str, Any], key: str) -> np.ndarray:
    if key not in sd:
        present = sorted(sd)[:10]
        raise KeyError(
            f"torch state dict missing '{key}' — first keys present: "
            f"{present}...")
    return _np(sd[key])


def infer_cara_layout(sd: Dict[str, Any]) -> Optional[Tuple[int, int]]:
    """Return (cp_order, rank) from the ``CP_*`` keys, or None if the
    checkpoint carries no adapter.  Order detection follows the parameter
    sets of ``set_cara``/``set_CP`` (cara.py:112-125,
    dim_experiment.py:264-295)."""
    if "CP_R1" not in sd:
        return None
    rank = int(_np(sd["CP_R1"]).shape[0])
    if "CP_A5" in sd:
        return 5, rank
    if "CP_A4" in sd:
        return 4, rank
    if "CP_A3" in sd:
        return 3, rank
    return 2, rank


def convert_torch_state_dict(
    sd: Dict[str, Any], cfg: ViTConfig, dtype=jnp.float32
) -> Tuple[Dict[str, Any], Optional[Dict[str, jnp.ndarray]], Dict[str, Any]]:
    """timm-0.4.12 ViT state dict (+ optional ``CP_*``) -> (params,
    cara_params_or_None, info).

    ``info`` carries ``{"cp_order", "rank"}`` when an adapter is present so
    callers can rebuild the :class:`CaraConfig` (scale/l_mu/l_std are NOT in
    a torch checkpoint — they come from the per-task table, exactly as in
    the reference's ``--evaluate`` flow, ``vit_cp.py:126,168-173``).
    """
    # Strip a DataParallel-style prefix if present.
    if sd and all(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()}

    e, L, p = cfg.embed_dim, cfg.depth, cfg.patch_size

    emb_w = _get(sd, "patch_embed.proj.weight")  # OIHW (E, C, P, P)
    if emb_w.shape != (e, cfg.in_chans, p, p):
        raise ValueError(
            f"patch_embed.proj.weight shape {emb_w.shape} does not match "
            f"config (want ({e}, {cfg.in_chans}, {p}, {p}))")
    params: Dict[str, Any] = {
        "embed": {
            "kernel": jnp.asarray(
                emb_w.transpose(2, 3, 1, 0).reshape(p * p * cfg.in_chans, e),
                dtype),
            "bias": jnp.asarray(_get(sd, "patch_embed.proj.bias"), dtype),
        },
        "cls": jnp.asarray(_get(sd, "cls_token"), dtype),
        "pos_embed": jnp.asarray(_get(sd, "pos_embed"), dtype),
        "norm": {
            "scale": jnp.asarray(_get(sd, "norm.weight"), dtype),
            "bias": jnp.asarray(_get(sd, "norm.bias"), dtype),
        },
    }

    def lin_t(key):  # torch (out, in) -> ours (in, out)
        return _get(sd, key).T

    ln1_s, ln1_b, ln2_s, ln2_b = [], [], [], []
    qkv_k, qkv_b, out_k, out_b = [], [], [], []
    fc1_k, fc1_b, fc2_k, fc2_b = [], [], [], []
    for i in range(L):
        pre = f"blocks.{i}."
        ln1_s.append(_get(sd, pre + "norm1.weight"))
        ln1_b.append(_get(sd, pre + "norm1.bias"))
        ln2_s.append(_get(sd, pre + "norm2.weight"))
        ln2_b.append(_get(sd, pre + "norm2.bias"))
        qw = lin_t(pre + "attn.qkv.weight")  # (E, 3E), cols (3, H, Dh)
        if qw.shape != (e, 3 * e):
            raise ValueError(
                f"{pre}attn.qkv.weight.T shape {qw.shape}, want ({e},{3*e})")
        qkv_k.append(qw)
        qkv_b.append(_get(sd, pre + "attn.qkv.bias"))
        out_k.append(lin_t(pre + "attn.proj.weight"))
        out_b.append(_get(sd, pre + "attn.proj.bias"))
        fc1_k.append(lin_t(pre + "mlp.fc1.weight"))
        fc1_b.append(_get(sd, pre + "mlp.fc1.bias"))
        fc2_k.append(lin_t(pre + "mlp.fc2.weight"))
        fc2_b.append(_get(sd, pre + "mlp.fc2.bias"))

    st = lambda xs: jnp.asarray(np.stack(xs), dtype)
    params["blocks"] = {
        "ln1_scale": st(ln1_s), "ln1_bias": st(ln1_b),
        "qkv": {"kernel": st(qkv_k), "bias": st(qkv_b)},
        "proj": {"kernel": st(out_k), "bias": st(out_b)},
        "ln2_scale": st(ln2_s), "ln2_bias": st(ln2_b),
        "fc1": {"kernel": st(fc1_k), "bias": st(fc1_b)},
        "fc2": {"kernel": st(fc2_k), "bias": st(fc2_b)},
    }

    if "pre_logits.fc.weight" in sd and cfg.repr_size is not None:
        params["pre_logits"] = {
            "kernel": jnp.asarray(lin_t("pre_logits.fc.weight"), dtype),
            "bias": jnp.asarray(_get(sd, "pre_logits.fc.bias"), dtype),
        }
    if "head.weight" in sd:
        params["head"] = {
            "kernel": jnp.asarray(lin_t("head.weight"), dtype),
            "bias": jnp.asarray(_get(sd, "head.bias"), dtype),
        }

    layout = infer_cara_layout(sd)
    cara_params = None
    info: Dict[str, Any] = {}
    if layout is not None:
        order, rank = layout
        info = {"cp_order": order, "rank": rank}
        factor_names = {5: ("A1", "A2", "A3", "A4", "A5"),
                        4: ("A1", "A2", "A3", "A4"),
                        3: ("A1", "A2", "A3"),
                        2: ("A1", "A2")}[order]
        cara_params = {}
        for name in factor_names + ("P1", "P2", "P3", "R1", "R2",
                                    "bias1", "bias2", "bias3"):
            cara_params[name] = jnp.asarray(_get(sd, "CP_" + name), dtype)
    return params, cara_params, info


def load_torch_checkpoint(
    path: str, cfg: ViTConfig, dtype=jnp.float32
) -> Tuple[Dict[str, Any], Optional[Dict[str, jnp.ndarray]], Dict[str, Any]]:
    """Load a reference ``.pt`` checkpoint (full ``state_dict``,
    ``vit_cp.py:66``) into (params, cara_params, info)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and isinstance(sd.get("state_dict"), dict):
        sd = sd["state_dict"]  # trainer-style wrapper
    return convert_torch_state_dict(sd, cfg, dtype)


def is_torch_checkpoint(path: str) -> bool:
    return path.endswith((".pt", ".pth", ".bin"))
