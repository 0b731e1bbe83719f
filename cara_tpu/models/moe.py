"""Mixture-of-expert CaRA adapters + per-token routing (expert parallelism).

Framework extension — the reference (BonnBytes/CaRA) is a single-adapter
method with no MoE or multi-device analog (SURVEY.md §2.6).  This is the
MoE-LoRA-style generalization: ``X = cara_cfg.moe_experts`` independent CaRA
adapters (every factor of ``models.cara`` gains a leading expert axis) plus
one linear router on the post-stem tokens.  Each token's delta at all four
adapter sites (qkv / attention projection / MLP up / MLP down) is the
gate-weighted sum of its top-k experts' deltas:

    delta(x_t) = sum_x  g_x(t) * delta_x(x_t),     g sparse over top-k

**Compute shape (TPU-first).**  The deltas are evaluated DENSELY over the
expert axis and masked by the (renormalized top-k) gates — two einsums per
site with a rank-r inner mode — instead of gather/scatter token dispatch.
CaRA experts are O(E*r) ~ 100 KB each, so the dense-masked form costs
``X x`` the (tiny, ~1-2% of the backbone) delta FLOPs while keeping every
shape static and every op a batched GEMM; a Switch-style ``all_to_all``
token dispatch would move megabytes of activations to save kilobytes of
factor reads — the wrong side of the roofline at this expert size (see
docs/DESIGN.md).  Under a mesh with an ``expert`` axis the stacked factors
shard over it (storage + gradient reduce-scatter ride that axis; the batch
additionally shards over it so backbone compute is pure data parallelism —
``parallel.mesh.batch_spec``).

**Restrictions** (validated in ``models.vit.vit_forward``): factorized delta
path, ``cp_order`` in {3,4,5} (order 2 has no rank-space contraction), and
``weight_dropout_impl="rank"`` (or rate 0) — the element-wise hash-mask
semantics belong to the single-adapter Pallas kernels, which are opaque to
GSPMD and therefore excluded under MoE anyway.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.ops import cp as cp_ops


def validate_moe(cara_cfg: CaraConfig, train: bool = False) -> None:
    """Reject configurations the MoE path does not define."""
    if cara_cfg.moe_top_k < 1 or cara_cfg.moe_top_k > cara_cfg.moe_experts:
        raise ValueError(
            f"moe_top_k={cara_cfg.moe_top_k} must be in "
            f"[1, moe_experts={cara_cfg.moe_experts}]")
    if cara_cfg.delta_impl != "factorized":
        raise ValueError("MoE adapters require delta_impl='factorized' "
                         "(the dense-materialized path has no expert axis)")
    if cara_cfg.cp_order == 2:
        raise ValueError("MoE adapters require cp_order in {3,4,5} — order "
                         "2 has no rank-space contraction to gate")
    if (train and cara_cfg.weight_dropout > 0.0
            and cara_cfg.weight_dropout_impl != "rank"):
        raise ValueError(
            "MoE training with weight_dropout > 0 requires "
            "weight_dropout_impl='rank' — element-wise masks are a "
            "single-adapter Pallas-kernel semantics")


def init_moe_params(
    rng: jax.Array, model: ViTConfig, cara: CaraConfig, dtype=jnp.float32
) -> Dict[str, Any]:
    """{"experts": stacked cara tree (leading axis X), "router": linear}.

    Each expert is an independent draw of the reference init scheme
    (``cara.init_cara_params``) — zero-initialized contract modes keep every
    expert's delta exactly 0 at step 0, so the MoE forward equals the plain
    backbone at init regardless of routing.  The router follows the
    backbone's trunc-normal(0.02) convention with a zero bias.
    """
    validate_moe(cara)
    x = cara.moe_experts
    k_r, *keys = jax.random.split(rng, x + 1)
    experts = [cara_lib.init_cara_params(k, model, cara, dtype) for k in keys]
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *experts)
    router = {
        "kernel": 0.02 * jax.random.truncated_normal(
            k_r, -2.0, 2.0, (model.embed_dim, x), dtype),
        "bias": jnp.zeros((x,), dtype),
    }
    return {"experts": stacked, "router": router}


def is_moe_params(cara_params) -> bool:
    return (isinstance(cara_params, dict) and "experts" in cara_params
            and "router" in cara_params)


def route(
    tokens: jax.Array, router: Dict[str, jax.Array], top_k: int
) -> Tuple[jax.Array, jax.Array]:
    """Per-token top-k routing -> (gates (B, N, X), aux scalar).

    Router math runs in fp32 (softmax stability under bf16 activations).
    Gates are the softmax probabilities of the selected experts,
    renormalized over the top-k set (Mixtral-style), zero elsewhere.

    ``aux`` is the Switch-Transformer load-balance loss
    ``X * sum_x f_x * P_x`` where ``f_x`` is the fraction of top-k
    assignment slots routed to expert x and ``P_x`` the mean router
    probability; perfectly uniform routing gives exactly 1.0.
    """
    x = router["kernel"].shape[-1]
    logits = (tokens.astype(jnp.float32) @ router["kernel"].astype(jnp.float32)
              + router["bias"].astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)                    # (B, N, X)
    top_v, top_i = jax.lax.top_k(probs, top_k)                 # (B, N, k)
    top_v = top_v / jnp.sum(top_v, axis=-1, keepdims=True)
    onehot = jax.nn.one_hot(top_i, x, dtype=jnp.float32)       # (B, N, k, X)
    gates = jnp.sum(top_v[..., None] * onehot, axis=-2)        # (B, N, X)
    # Load balance: fraction of assignment slots per expert x mean prob.
    f = jnp.mean(jnp.sum(onehot, axis=-2), axis=(0, 1)) / top_k   # (X,)
    p = jnp.mean(probs, axis=(0, 1))                              # (X,)
    aux = x * jnp.sum(f * p)
    return gates.astype(tokens.dtype), aux


def _comp_masks(drop_rng, x: int, rank: int, rate: float, dtype):
    """Independent rank-component dropout masks per expert ((X, r) or None)."""
    return cp_ops.weight_dropout_mask(drop_rng, (x, rank), rate, dtype)


def moe_stacked_layer_slices(
    experts: Dict[str, jax.Array], model: ViTConfig, cara: CaraConfig
) -> Tuple[jax.Array, jax.Array]:
    """Expert-stacked per-layer factor slices for the ``lax.scan``:
    a1 (L, X, qkv_rows, r), p1 (L, X, 1+2*mlp_ratio, r) — the layer axis
    leads (scan slices it), the expert axis rides inside."""
    a1, p1 = jax.vmap(
        lambda e: cara_lib.stacked_layer_slices(e, model, cara))(experts)
    return a1.swapaxes(0, 1), p1.swapaxes(0, 1)


def moe_qkv_delta(
    x: jax.Array,
    experts: Dict[str, jax.Array],
    f1x: jax.Array,
    gates: jax.Array,
    model: ViTConfig,
    cara: CaraConfig,
    drop_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Gate-weighted qkv delta: (B, N, E) -> (B, N, 3, H, Dh), unscaled.

    ``f1x``: this layer's expert-stacked A1 slice (X, qkv_rows, r).
    Collapses each expert to its (U, V) pair (``cara.qkv_uv``) then contracts
    the rank and expert modes in two einsums; the ``x`` (expert) contraction
    carries the gates, so unselected experts contribute exactly zero.
    """
    b, n = x.shape[:2]
    e, h, d, r = model.embed_dim, model.num_heads, model.head_dim, cara.rank
    xn = experts["R1"].shape[0]
    comp = _comp_masks(drop_rng, xn, r, cara.weight_dropout, x.dtype)
    uv = jax.vmap(
        lambda p, f, c: cara_lib.qkv_uv(p, f, model, cara, c),
        in_axes=(0, 0, 0 if comp is not None else None))(
            experts, f1x, comp)
    u, v = uv                                      # (X, E, r), (X, r, 3E)
    z = jnp.einsum("bne,xer->bnxr", x, u.astype(x.dtype))
    delta = jnp.einsum("bnxr,xro->bno",
                       z * gates[..., None], v.astype(x.dtype))
    return delta.reshape(b, n, 3, h, d)


def moe_rows_delta_out(
    x: jax.Array,
    p1x: jax.Array,
    experts: Dict[str, jax.Array],
    gates: jax.Array,
    drop_rng: Optional[jax.Array] = None,
    rate: float = 0.0,
) -> jax.Array:
    """Gate-weighted ``x @ T.T`` delta (attention projection / MLP up).

    ``p1x``: this layer's expert-stacked P1 rows (X, rows, r).  Returns
    (B, N, rows*E) like ``cp_ops.rows_delta_out_factorized``.
    """
    xn, _, r = p1x.shape
    comp = _comp_masks(drop_rng, xn, r, rate, x.dtype)
    uv = jax.vmap(
        cara_lib.rows_out_uv,
        in_axes=(0, 0, 0, 0, 0 if comp is not None else None))(
            p1x, experts["P2"], experts["P3"], experts["R2"], comp)
    u, v = uv                                # (X, E, r), (X, r, rows*E)
    z = jnp.einsum("bne,xer->bnxr", x, u.astype(x.dtype))
    return jnp.einsum("bnxr,xro->bno", z * gates[..., None], v.astype(x.dtype))


def moe_rows_delta_in(
    x: jax.Array,
    p1x: jax.Array,
    experts: Dict[str, jax.Array],
    gates: jax.Array,
    drop_rng: Optional[jax.Array] = None,
    rate: float = 0.0,
) -> jax.Array:
    """Gate-weighted ``x @ T`` delta (MLP down): (B, N, rows*E) -> (B, N, E)."""
    xn, _, r = p1x.shape
    comp = _comp_masks(drop_rng, xn, r, rate, x.dtype)
    uv = jax.vmap(
        cara_lib.rows_in_uv,
        in_axes=(0, 0, 0, 0, 0 if comp is not None else None))(
            p1x, experts["P2"], experts["P3"], experts["R2"], comp)
    u, v = uv                                # (X, rows*E, r), (X, r, E)
    z = jnp.einsum("bnh,xhr->bnxr", x, u.astype(x.dtype))
    return jnp.einsum("bnxr,xre->bne", z * gates[..., None], v.astype(x.dtype))


def moe_bias(gates: jax.Array, bias: jax.Array) -> jax.Array:
    """Gate-weighted additive expert bias: (B, N, X) x (X, D) -> (B, N, D)."""
    return jnp.einsum("bnx,xd->bnd", gates, bias.astype(gates.dtype))
