"""BitFit: bias-only fine-tuning as a first-class adapter method.

BitFit ("BitFit: Simple Parameter-efficient Fine-tuning for
Transformer-based Masked Language-models", Ben Zaken et al., ACL 2022)
trains ONLY the model's bias terms.  It is the simplest PEFT baseline in
the comparison set of the CaRA paper (the reference repo implements only
CaRA, ``src/cara/cara.py``); this module adds it with the framework's
uniform method contract: same training loop / freeze semantics
(``image_classification/vit_cp.py:176-182`` — grads flow only to the
adapter tree + head), same checkpoint / merge / export / serving stack.

Parameterization.  Instead of marking the backbone's bias leaves
trainable (a torch-style mutation that would break the frozen/trainable
pytree split every consumer relies on), the adapter tree holds **additive
bias deltas**, all zero-initialized — the framework's zero-delta-at-init
convention (``cara.py:128,132``):

    {"blocks": {"qkv_bias": (L, 3E), "proj_bias": (L, E),
                "fc1_bias": (L, hid), "fc2_bias": (L, E),
                "ln1_bias": (L, E),  "ln2_bias": (L, E)},
     "embed_bias": (E,), "norm_bias": (E,)}           [+ "ln_pre_bias"]

``bias_pretrained + delta`` is exactly the BitFit trainable set over the
transformer stack (qkv covers the q/k/v biases; both LayerNorms per
block; the patch-embed projection and final-norm biases).  The classifier
head is trained separately like every other method here, mirroring the
reference protocol.  ``pre_logits`` (in21k models) stays frozen — it is
not part of the encoder stack.

TPU-native application: :func:`apply_bitfit` adds the deltas onto the
frozen param pytree IN-TRACE (a few O(E) adds — no weight copies), then
the forward runs the PLAIN path: every downstream consumer (fused Pallas
megakernels, GSPMD/TP sharding, pipeline stages, int8-quantized
backbones — only kernels quantize, biases stay dense) works unchanged,
and gradients flow through the adds to the delta tree.
:func:`merge_bitfit` is the same fold, used by merged export/serving.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from cara_tpu.config import ViTConfig

BLOCK_SITES = ("qkv_bias", "proj_bias", "fc1_bias", "fc2_bias",
               "ln1_bias", "ln2_bias")


def bitfit_param_shapes(model: ViTConfig) -> Dict:
    """Nested dict of delta shapes (mirrors the frozen tree's bias slots)."""
    L, e, hid = model.depth, model.embed_dim, model.hidden_dim
    shapes = {
        "blocks": {
            "qkv_bias": (L, 3 * e),
            "proj_bias": (L, e),
            "fc1_bias": (L, hid),
            "fc2_bias": (L, e),
            "ln1_bias": (L, e),
            "ln2_bias": (L, e),
        },
        "embed_bias": (e,),
        "norm_bias": (e,),
    }
    if model.ln_pre:
        shapes["ln_pre_bias"] = (e,)
    return shapes


def init_bitfit_params(
    rng: jax.Array, model: ViTConfig, cara, dtype=jnp.float32
) -> Dict:
    """All deltas zero: step 0 forward == the frozen backbone exactly."""
    del rng, cara  # deterministic init; uniform signature with the others

    def zeros(tree):
        if isinstance(tree, dict):
            return {k: zeros(v) for k, v in tree.items()}
        return jnp.zeros(tree, dtype)

    return zeros(bitfit_param_shapes(model))


def is_bitfit_params(tree) -> bool:
    return (isinstance(tree, dict)
            and "blocks" in tree and "norm_bias" in tree
            and isinstance(tree["blocks"], dict)
            and set(BLOCK_SITES) <= set(tree["blocks"]))


def apply_bitfit(params: Dict, deltas: Dict) -> Dict:
    """Frozen pytree + bias deltas -> modified pytree (in-trace; O(E) adds).

    Shared by the differentiated forward (gradients flow to ``deltas``
    through these adds) and merged export (:func:`merge_bitfit`).
    """
    bp = dict(params["blocks"])
    d = deltas["blocks"]
    for site in ("qkv", "proj", "fc1", "fc2"):
        sp = dict(bp[site])
        sp["bias"] = sp["bias"] + d[f"{site}_bias"].astype(sp["bias"].dtype)
        bp[site] = sp
    for ln in ("ln1", "ln2"):
        bp[f"{ln}_bias"] = (bp[f"{ln}_bias"]
                            + d[f"{ln}_bias"].astype(bp[f"{ln}_bias"].dtype))
    out = dict(params)
    out["blocks"] = bp
    emb = dict(out["embed"])
    emb["bias"] = emb["bias"] + deltas["embed_bias"].astype(emb["bias"].dtype)
    out["embed"] = emb
    nrm = dict(out["norm"])
    nrm["bias"] = nrm["bias"] + deltas["norm_bias"].astype(nrm["bias"].dtype)
    out["norm"] = nrm
    if "ln_pre_bias" in deltas:
        if "ln_pre" not in out:
            raise ValueError(
                "BitFit tree carries ln_pre_bias but the model has no "
                "ln_pre — was it trained with a different model config?")
        lp = dict(out["ln_pre"])
        lp["bias"] = lp["bias"] + deltas["ln_pre_bias"].astype(
            lp["bias"].dtype)
        out["ln_pre"] = lp
    return out


def merge_bitfit(params: Dict, deltas: Dict, model: ViTConfig, cara) -> Dict:
    """Exact merged export: BitFit IS a bias fold (no approximation)."""
    del model, cara
    return apply_bitfit(params, deltas)


def check_geometry(deltas: Dict, model: ViTConfig) -> None:
    """Fail fast on a tree trained with a different model geometry."""
    want = bitfit_param_shapes(model)

    def walk(w, d, path):
        if isinstance(w, dict):
            if not isinstance(d, dict) or set(w) != set(d):
                raise ValueError(
                    f"BitFit tree keys at {path or 'root'} "
                    f"({sorted(d) if isinstance(d, dict) else type(d)}) do "
                    f"not match the model geometry ({sorted(w)})")
            for k in w:
                walk(w[k], d[k], f"{path}/{k}")
        elif tuple(d.shape) != w:
            raise ValueError(
                f"BitFit delta {path} has shape {tuple(d.shape)}; model "
                f"geometry wants {w}")

    walk(want, deltas, "")
