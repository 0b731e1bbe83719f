"""FacT adapters: tensor-train / Tucker factor-tuning at the CaRA sites.

FacT ("FacT: Factor-Tuning for Lightweight Adaptation on Vision
Transformer", Jie & Deng, AAAI 2023) is the tensorisation method family
CaRA directly generalizes: like CaRA (and unlike LoRA) the adapter
factors are SHARED across every layer and projection of the ViT, but the
stacked weight-increment tensor is decomposed with tensor-train (FacT-TT)
or Tucker (FacT-TK) structure instead of CaRA's CP decomposition.  The
reference repo implements only CaRA (``src/cara/cara.py``); this module
adds the closest published relative as a first-class method of the same
framework — same four injection sites as the reference hot loop (qkv
``cara.py:25-42``, attention projection ``cara.py:50-58``, MLP up
``cara.py:75-82``, MLP down ``cara.py:87-93``), same training loop /
freeze semantics (``vit_cp.py:176-182``), same merge/export/serving
stack.

Math.  Every adapted weight increment is viewed as a stack of
``(E, E)`` blocks (E = embed dim): q, k, v are one block each, the
attention projection one, fc1 ``hidden/E`` blocks along its output axis,
fc2 ``hidden/E`` blocks along its input axis — ``S = 4 + 2*hidden/E``
blocks per layer (12 for mlp_ratio-4 ViTs, so the stacked tensor is the
paper's ``12L x E x E``).  With shared ``U, V in R^{E x r}``:

    FacT-TT:  dW_m = s * U @ G_m @ V^T          G_m in R^{r x r} per block
    FacT-TK:  dW_m = s * U @ (sum_p P_{m,p} C_p) @ V^T
                                                 C in R^{rl x r x r},
                                                 P in R^{S*L x rl}

Trainable parameters: TT ``2*E*r + S*L*r^2``; TK ``2*E*r + S*L*rl +
rl*r^2`` (ViT-B/16, r=8: TT 21,504 — the paper's ~0.02M scale).

TPU-native free lunch (same as :mod:`cara_tpu.models.lora`): each block's
delta collapses to a rank-r ``(U', V')`` pair, so the whole FacT tree
expands — in rank space, a few tiny einsums per forward — to exactly the
per-site layer-stacked LoRA tree the fused Pallas megakernels, fused-TP
shard_map path, merged-weight inference and multi-task serving already
consume.  :func:`expand_to_lora` runs inside the differentiated forward,
so gradients flow to the native (shared) factors; no kernel changes.

Init mirrors the LoRA/CaRA zero-delta convention (``cara.py:128,132``):
``U, V ~ kaiming-uniform(fan_in=E)`` and the middle factor zero
(TT: ``G = 0``; TK: ``C = 0`` with ``P ~ xavier-normal``) — the delta is
exactly zero at step 0 while the first backward already populates the
middle factor (``dG = U^T dW V != 0`` for random U, V).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cara_tpu.config import CaraConfig, ViTConfig

TT_KEYS = frozenset({"U", "V", "G"})
TK_KEYS = frozenset({"U", "V", "P", "C"})


def _geometry(model: ViTConfig) -> Tuple[int, int, int]:
    """(n_fc blocks per MLP matrix, blocks per layer S, embed dim E)."""
    e, hid = model.embed_dim, model.hidden_dim
    if hid % e != 0:
        raise ValueError(
            f"FacT tensorises weights as (E, E) blocks; hidden_dim={hid} "
            f"is not a multiple of embed_dim={e}")
    n_fc = hid // e
    return n_fc, 4 + 2 * n_fc, e


def core_rank(cara: CaraConfig) -> int:
    """Tucker block-mode rank ``rl`` (0 in the config means ``rank``)."""
    return cara.fact_core_rank or cara.rank


def fact_param_shapes(
    model: ViTConfig, cara: CaraConfig
) -> Dict[str, Tuple[int, ...]]:
    """Factor shapes for ``cara.method`` in {"fact_tt", "fact_tk"}."""
    n_fc, s, e = _geometry(model)
    del n_fc
    L, r = model.depth, cara.rank
    shapes: Dict[str, Tuple[int, ...]] = {"U": (e, r), "V": (e, r)}
    if cara.method == "fact_tt":
        shapes["G"] = (L, s, r, r)
    else:
        rl = core_rank(cara)
        shapes["P"] = (L, s, rl)
        shapes["C"] = (rl, r, r)
    return shapes


def init_fact_params(
    rng: jax.Array, model: ViTConfig, cara: CaraConfig, dtype=jnp.float32
) -> Dict[str, jax.Array]:
    """U, V kaiming-uniform; middle factor zero (delta == 0 at step 0)."""
    shapes = fact_param_shapes(model, cara)
    ku, kv, kp = jax.random.split(rng, 3)
    e = model.embed_dim
    bound = 1.0 / math.sqrt(e)
    params = {
        "U": jax.random.uniform(ku, shapes["U"], dtype, -bound, bound),
        "V": jax.random.uniform(kv, shapes["V"], dtype, -bound, bound),
    }
    if "G" in shapes:
        params["G"] = jnp.zeros(shapes["G"], dtype)
    else:
        # Xavier-normal over the (S*L, rl) routing matrix; C = 0 keeps the
        # delta zero while dC = sum_m P_m (U^T dW_m V) is already nonzero.
        p_shape = shapes["P"]
        fan = p_shape[1] * p_shape[2] + p_shape[0] * p_shape[2]
        std = math.sqrt(2.0 / float(fan))
        params["P"] = std * jax.random.normal(kp, p_shape, dtype)
        params["C"] = jnp.zeros(shapes["C"], dtype)
    return params


def is_fact_params(tree) -> bool:
    return isinstance(tree, dict) and set(tree) in (TT_KEYS, TK_KEYS)


def detect_method(tree) -> Optional[str]:
    """"fact_tt" / "fact_tk" for a FacT factor tree, else None."""
    if not isinstance(tree, dict):
        return None
    keys = set(tree)
    if keys == TT_KEYS:
        return "fact_tt"
    if keys == TK_KEYS:
        return "fact_tk"
    return None


def block_cores(fact_params: Dict[str, jax.Array]) -> jax.Array:
    """The effective per-block middle factor ``G`` with shape
    ``(L, S, r, r)`` — TT stores it directly, Tucker contracts the
    routing matrix with the shared core stack."""
    if "G" in fact_params:
        return fact_params["G"]
    return jnp.einsum("lsp,pab->lsab", fact_params["P"], fact_params["C"])


def expand_to_lora(
    fact_params: Dict[str, jax.Array],
    model: ViTConfig,
    cara: CaraConfig,
) -> Dict[str, Dict[str, jax.Array]]:
    """Collapse the shared factors into the per-site layer-stacked LoRA
    tree (:mod:`cara_tpu.models.lora` layout) every downstream consumer
    understands.

    Per block ``dW = U G V^T`` so the site-level collapsed pairs are:

    - qkv / proj / fc1 (blocks along the OUTPUT axis): ``a = U``
      broadcast over layers, ``b = concat_m(G_m @ V^T)`` — qkv's three
      blocks land in the fused-qkv column layout (q cols, then k, then v),
      the same column space the CaRA ``qkv_uv`` collapse produces, so TP
      head-slicing applies unchanged.
    - fc2 (blocks along the INPUT axis): ``a = vstack_m(U @ G_m)``,
      ``b = V^T`` broadcast over layers.

    Runs inside the differentiated forward — a few rank-space einsums
    (O(L*S*r^2*E) FLOPs, ~1e-4 of one dense layer GEMM) — so gradients
    reach the native shared factors and the expansion is re-taken per
    step like any other traced op.
    """
    n_fc, s, e = _geometry(model)
    L, r = model.depth, cara.rank
    u, v = fact_params["U"], fact_params["V"]
    g = block_cores(fact_params)
    if g.shape != (L, s, r, r):
        raise ValueError(
            f"FacT core stack has shape {g.shape}; model/config geometry "
            f"wants {(L, s, r, r)} — was the tree trained with a "
            "different model or rank?")
    # Block order within a layer: [q, k, v, proj, fc1 x n_fc, fc2 x n_fc].
    g_qkv = g[:, 0:3]
    g_proj = g[:, 3]
    g_fc1 = g[:, 4:4 + n_fc]
    g_fc2 = g[:, 4 + n_fc:]
    a_bcast = jnp.broadcast_to(u, (L, e, r))
    vt = v.T  # (r, e)
    b_qkv = jnp.einsum("lkab,jb->lakj", g_qkv, v).reshape(L, r, 3 * e)
    b_proj = jnp.einsum("lab,jb->laj", g_proj, v)
    b_fc1 = jnp.einsum("lnab,jb->lanj", g_fc1, v).reshape(L, r, n_fc * e)
    a_fc2 = jnp.einsum("ia,lnab->lnib", u, g_fc2).reshape(L, n_fc * e, r)
    b_fc2 = jnp.broadcast_to(vt, (L, r, e))
    return {
        "qkv": {"a": a_bcast, "b": b_qkv},
        "proj": {"a": a_bcast, "b": b_proj},
        "fc1": {"a": a_bcast, "b": b_fc1},
        "fc2": {"a": a_fc2, "b": b_fc2},
    }


def merge_fact(
    params: Dict,
    fact_params: Dict,
    model: ViTConfig,
    cara: CaraConfig,
) -> Dict:
    """Fold the (eval-mode, exactly linear) FacT deltas into the dense
    backbone — expansion + :func:`cara_tpu.models.lora.merge_lora`."""
    from cara_tpu.models.lora import merge_lora

    return merge_lora(params, expand_to_lora(fact_params, model, cara),
                      model, cara)
