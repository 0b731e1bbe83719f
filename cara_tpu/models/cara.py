"""CaRA adapter parameters: shapes, initialization, per-layer slicing.

Reproduces the parameter surface of ``set_cara`` (``src/cara/cara.py:110-145``)
and the CP-order ablations of ``set_CP``
(``image_classification/dim_experiment.py:262-325``), with every shape derived
from the model geometry instead of the reference's hard-coded ViT-B/16 numbers
(36/768/12/64/108).

Parameter naming keeps the reference's ``CP_*`` prefixes (minus the prefix —
the pytree lives under its own ``"cara"`` subtree): ``A1..A5`` qkv factors,
``P1..P3`` projection/MLP factors, ``R1``/``R2`` CP weights (lambda),
``bias1..3`` additive output biases.

Layout of the shared factor matrices (order 4, the published method):

* ``A1`` has ``3*depth`` rows: row ``3l+k`` is the (layer l, k in {q,k,v})
  coordinate of the 4-way tensor — the reference's ``attn_idx`` bookkeeping
  (``cara.py:26,152-154``).
* ``P1`` has ``(1+2*mlp_ratio)*depth`` rows per the reference's ``idx``
  bookkeeping (``cara.py:51,72-73,151-162``): per layer, 1 attention-projection
  row, then ``mlp_ratio`` MLP-up rows, then ``mlp_ratio`` MLP-down rows.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cara_tpu.config import CaraConfig, ViTConfig


def _xavier_normal(rng, shape, dtype):
    """torch ``nn.init.xavier_normal_`` for a 2-D (fan_out, fan_in) tensor."""
    fan_out, fan_in = shape
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(rng, shape, dtype)


def _orthogonal(rng, shape, dtype):
    """torch ``nn.init.orthogonal_`` (semi-orthogonal via QR)."""
    return jax.nn.initializers.orthogonal()(rng, shape, dtype)


def _lambda_init(rng, rank, l_mu, l_std, dtype):
    """CP-weight (lambda) init, ``cara.py:134-139``.

    Reference quirk: ``l_std == 0`` with ``l_mu != 1`` leaves *uninitialized
    memory* in the reference (SURVEY.md section 2.1).  We instead fill with the
    constant ``l_mu`` — identical for every config the reference ships, and
    sane for the rest.
    """
    if l_std != 0.0:
        return l_mu + l_std * jax.random.normal(rng, (rank,), dtype)
    return jnp.full((rank,), l_mu, dtype)


def qkv_factor_shapes(model: ViTConfig, cara: CaraConfig) -> Dict[str, Tuple[int, ...]]:
    """QKV-tensorisation factor shapes per CP order.

    Order 4 = published method (``cara.py:112-117``); orders 5/3/2 follow
    ``dim_experiment.py:264-295``.
    """
    l, e, h, d, r = (
        model.depth, model.embed_dim, model.num_heads, model.head_dim, cara.rank,
    )
    if cara.cp_order == 5:
        return {"A1": (l, r), "A2": (3, r), "A3": (e, r), "A4": (h, r), "A5": (d, r)}
    if cara.cp_order == 4:
        return {"A1": (3 * l, r), "A2": (e, r), "A3": (h, r), "A4": (d, r)}
    if cara.cp_order == 3:
        return {"A1": (3 * l, r), "A2": (e, r), "A3": (e, r)}
    if cara.cp_order == 2:
        return {"A1": (3 * l, r), "A2": (e * e, r)}
    raise ValueError(f"cp_order must be in {{2,3,4,5}}, got {cara.cp_order}")


def cara_param_shapes(model: ViTConfig, cara: CaraConfig) -> Dict[str, Tuple[int, ...]]:
    """All trainable adapter shapes (generalized ``cara.py:112-125``)."""
    e, r = model.embed_dim, cara.rank
    rows = (1 + 2 * model.mlp_ratio) * model.depth
    shapes = dict(qkv_factor_shapes(model, cara))
    shapes.update(
        P1=(rows, r), P2=(e, r), P3=(e, r),
        R1=(r,), R2=(r,),
        bias1=(e,), bias2=(model.hidden_dim,), bias3=(e,),
    )
    return shapes


# Which factor gets which init, per the reference tables
# (cara.py:127-133, dim_experiment.py:270-310).  The "embed"/contract mode is
# zero-initialized so the delta is exactly 0 at step 0.
_QKV_INITS = {
    5: {"A1": "xavier", "A2": "orthogonal", "A3": "zeros", "A4": "orthogonal",
        "A5": "orthogonal"},
    4: {"A1": "xavier", "A2": "zeros", "A3": "orthogonal", "A4": "orthogonal"},
    3: {"A1": "xavier", "A2": "zeros", "A3": "orthogonal"},
    2: {"A1": "xavier", "A2": "zeros"},
}


def init_cara_params(
    rng: jax.Array, model: ViTConfig, cara: CaraConfig, dtype=jnp.float32
) -> Dict[str, jax.Array]:
    """Initialize the adapter pytree with the reference's exact scheme.

    Dispatches on ``cara.method``: ``"lora"`` builds the per-site A/B tree
    (:mod:`cara_tpu.models.lora`), ``"fact_tt"``/``"fact_tk"`` the shared
    FacT factor tree (:mod:`cara_tpu.models.fact`), ``"vpt_deep"``/
    ``"vpt_shallow"`` the prompt stack (:mod:`cara_tpu.models.vpt`),
    ``"ssf"`` the scale/shift pairs (:mod:`cara_tpu.models.ssf`),
    ``"bitfit"`` the bias deltas (:mod:`cara_tpu.models.bitfit`),
    ``"adapter"``/``"adaptformer"`` the bottleneck stacks
    (:mod:`cara_tpu.models.adapter`) — so every caller (CLI, api, sweep,
    planner) gains the method switch for free.
    """
    if cara.method == "lora":
        from cara_tpu.models.lora import init_lora_params

        return init_lora_params(rng, model, cara, dtype)
    if cara.method.startswith("fact"):
        from cara_tpu.models.fact import init_fact_params

        return init_fact_params(rng, model, cara, dtype)
    if cara.method.startswith("vpt"):
        from cara_tpu.models.vpt import init_vpt_params

        return init_vpt_params(rng, model, cara, dtype)
    if cara.method == "ssf":
        from cara_tpu.models.ssf import init_ssf_params

        return init_ssf_params(rng, model, cara, dtype)
    if cara.method == "bitfit":
        from cara_tpu.models.bitfit import init_bitfit_params

        return init_bitfit_params(rng, model, cara, dtype)
    if cara.method in ("adapter", "adaptformer"):
        from cara_tpu.models.adapter import init_adapter_params

        return init_adapter_params(rng, model, cara, dtype)
    if cara.method in ("linear", "full"):
        # Non-adapter control rows (linear probe / full fine-tuning): no
        # adapter params at all — the trainable/frozen split happens in
        # train.steps.split_trainable, and the forward runs the plain
        # backbone (vit_forward(cara_params=None)).
        return {}
    shapes = cara_param_shapes(model, cara)
    inits = dict(_QKV_INITS[cara.cp_order])
    inits.update(P1="xavier", P2="zeros", P3="orthogonal")
    keys = jax.random.split(rng, len(shapes) + 2)
    params: Dict[str, jax.Array] = {}
    for i, (name, shape) in enumerate(shapes.items()):
        k = keys[i]
        if name in ("R1", "R2"):
            params[name] = _lambda_init(k, cara.rank, cara.l_mu, cara.l_std, dtype)
        elif name.startswith("bias"):
            params[name] = jnp.zeros(shape, dtype)
        elif inits[name] == "xavier":
            params[name] = _xavier_normal(k, shape, dtype)
        elif inits[name] == "zeros":
            params[name] = jnp.zeros(shape, dtype)
        elif inits[name] == "orthogonal":
            params[name] = _orthogonal(k, shape, dtype)
        else:  # pragma: no cover
            raise AssertionError(name)
    return params


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def qkv_rows_per_layer(cp_order: int) -> int:
    """``attn_idx`` stride: 1 for order 5, else 3 (``dim_experiment.py:334``)."""
    return 1 if cp_order == 5 else 3


def stacked_layer_slices(
    params: Dict[str, jax.Array], model: ViTConfig, cara: CaraConfig
) -> Tuple[jax.Array, jax.Array]:
    """Reshape the row-sliced factors into per-layer stacks for ``lax.scan``.

    Returns ``(a1, p1)`` where ``a1`` is (depth, qkv_rows, r) — the per-layer
    ``CP_A1[attn_idx:attn_idx+rows]`` slices (``cara.py:26``) — and ``p1`` is
    (depth, 1+2*mlp_ratio, r) — the per-layer ``CP_P1[idx:idx+...]`` slices
    (``cara.py:51,72-73``).
    """
    qrows = qkv_rows_per_layer(cara.cp_order)
    a1 = params["A1"].reshape(model.depth, qrows, cara.rank)
    prow = 1 + 2 * model.mlp_ratio
    p1 = params["P1"].reshape(model.depth, prow, cara.rank)
    return a1, p1


def qkv_uv(
    params: Dict[str, jax.Array],
    f1: jax.Array,
    model: ViTConfig,
    cara: CaraConfig,
    comp_mask: Optional[jax.Array] = None,
):
    """Collapse the qkv CP factors into the (U, V) pair consumed by the fused
    ``cp_dense`` kernel: ``delta = (x @ U) @ V`` with U (E, r), V (r, 3E).

    Supported for orders 3/4/5 (order 2 has no rank-space contraction —
    callers fall back to the materialized path).
    """
    e, h, d, r = model.embed_dim, model.num_heads, model.head_dim, cara.rank
    order = cara.cp_order
    if order == 4:
        lam = params["R1"] if comp_mask is None else params["R1"] * comp_mask
        u = params["A2"]
        m = ((f1 * lam[None, :])[:, None, None, :]
             * params["A3"][None, :, None, :]
             * params["A4"][None, None, :, :])
        v = m.reshape(3 * e, r).T
        return u, v
    if order == 5:
        lam = params["R1"] * f1[0]
        if comp_mask is not None:
            lam = lam * comp_mask
        u = params["A3"]
        m = ((params["A2"] * lam[None, :])[:, None, None, :]
             * params["A4"][None, :, None, :]
             * params["A5"][None, None, :, :])
        v = m.reshape(3 * e, r).T
        return u, v
    if order == 3:
        lam = params["R1"] if comp_mask is None else params["R1"] * comp_mask
        u = params["A2"]
        m = (f1 * lam[None, :])[:, None, :] * params["A3"][None, :, :]
        v = m.reshape(3 * e, r).T
        return u, v
    raise ValueError(f"qkv_uv unsupported for cp_order={order}")


def rows_out_uv(p1, p2, p3, r2, comp_mask=None):
    """(U, V) for the ``x @ T.T`` sites (attention projection, MLP up):
    U = p3 (E, r), V (r, rows*E)."""
    lam = r2 if comp_mask is None else r2 * comp_mask
    rows, r = p1.shape
    e = p2.shape[0]
    v = ((p1 * lam[None, :])[:, None, :] * p2[None, :, :]).reshape(
        rows * e, r).T
    return p3, v


def rows_in_uv(p1, p2, p3, r2, comp_mask=None):
    """(U, V) for the ``x @ T`` site (MLP down): U (rows*E, r), V (r, E)."""
    lam = r2 if comp_mask is None else r2 * comp_mask
    rows, r = p1.shape
    e = p2.shape[0]
    u = (p1[:, None, :] * p2[None, :, :]).reshape(rows * e, r)
    v = lam[:, None] * p3.T
    return u, v


def qkv_delta(
    x: jax.Array,
    params: Dict[str, jax.Array],
    f1: jax.Array,
    model: ViTConfig,
    cara: CaraConfig,
    *,
    materialized: bool,
    drop_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-layer QKV delta, dispatching on CP order / implementation.

    ``x``: (B, N, E) attention input (post-LN).  ``f1``: this layer's A1 slice
    (qkv_rows, r).  Returns (B, N, 3, H, Dh), unscaled (caller applies ``s``).
    """
    from cara_tpu.ops import cp as cp_ops

    e, h, d = model.embed_dim, model.num_heads, model.head_dim
    b, n = x.shape[:2]
    rate = cara.weight_dropout
    order = cara.cp_order

    if order == 2:
        # No token-compute saving from factorizing (contract mode is E*E);
        # always materialize (dim_experiment.py:203-207).
        t = cp_ops.cp_to_tensor(params["R1"], (f1, params["A2"]))  # (3, E*E)
        t = t.reshape(3, e, e)
        mask = cp_ops.weight_dropout_mask(drop_rng, t.shape, rate, x.dtype)
        if mask is not None:
            t = t * mask
        delta = jnp.einsum("bne,keo->bnko", x, t)
        return delta.reshape(b, n, 3, h, d)

    if materialized:
        if order == 5:
            t = cp_ops.cp_to_tensor(
                params["R1"],
                (f1, params["A2"], params["A3"], params["A4"], params["A5"]),
            )[0]  # (3, E, H, Dh) after dropping the singleton layer mode
            t = t.reshape(3, e, h * d)
        elif order == 4:
            t = cp_ops.cp_to_tensor(
                params["R1"], (f1, params["A2"], params["A3"], params["A4"])
            ).reshape(3, e, h * d)
        else:  # order == 3: (3, E, E), contract the A2 mode (dim_exp.py:200-202)
            t = cp_ops.cp_to_tensor(
                params["R1"], (f1, params["A2"], params["A3"])
            )
        mask = cp_ops.weight_dropout_mask(drop_rng, t.shape, rate, x.dtype)
        if mask is not None:
            t = t * mask
        delta = jnp.einsum("bne,keo->bnko", x, t)
        return delta.reshape(b, n, 3, h, d)

    # Factorized path; weight dropout becomes rank-component dropout.
    comp = cp_ops.weight_dropout_mask(drop_rng, (cara.rank,), rate, x.dtype)
    if order == 4:
        return cp_ops.qkv_delta_factorized(
            x, f1, params["A2"], params["A3"], params["A4"], params["R1"], comp
        )
    if order == 5:
        lam = params["R1"] * f1[0] if comp is None else params["R1"] * f1[0] * comp
        z = x @ params["A3"]  # A3 is the zero/embed mode
        m = ((params["A2"] * lam[None, :])[:, None, None, :]
             * params["A4"][None, :, None, :]
             * params["A5"][None, None, :, :])              # (3, H, Dh, r)
        m = m.reshape(3 * e, cara.rank).T
        return (z @ m).reshape(b, n, 3, h, d)
    # order == 3
    lam = params["R1"] if comp is None else params["R1"] * comp
    z = x @ params["A2"]
    m = ((f1 * lam[None, :])[:, None, :] * params["A3"][None, :, :])  # (3,E,r)
    m = m.reshape(3 * e, cara.rank).T
    return (z @ m).reshape(b, n, 3, h, d)
