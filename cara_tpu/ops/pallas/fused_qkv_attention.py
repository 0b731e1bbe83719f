"""Layout-native fused attention: consumes the fused-qkv GEMM output directly.

Motivation (measured): a conventional flash kernel over (B, H, N, Dh) forces
three 5-D transposes + per-tensor padding between the qkv GEMM and the
kernel, and one transpose after — on TPU that relayout traffic costs more
than the fused softmax saves.  This kernel instead takes the qkv activation
in its natural GEMM layout (B, NP, 3*E) — output-flattened (3, heads, Dh)
exactly as produced by ``x @ W_qkv`` — slices per-head q/k/v tiles on the
lane axis inside VMEM, and writes the attention output directly in the
(B, NP, E) layout the projection GEMM consumes.  Zero relayouts end-to-end.

The caller pads the *token* axis once (197 -> 256) before the qkv GEMM and
slices once after the projection; padded key columns are masked to -1e30 so
their softmax weight underflows to 0, padded query rows are garbage that the
caller discards (and receive zero cotangents in the backward, so nothing
leaks into dk/dv — see tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# The full-score kernel holds a per-head (bb, NP, NP) fp32 score tile (plus
# exp/sum temporaries) in VMEM — O(NP^2).  Fastest at ViT scale (256-384
# tokens: no inter-block bookkeeping, measured faster than both XLA and a
# (B,H,N,Dh) flash kernel), but it is NOT a long-context kernel.  Above this
# limit use blockwise_qkv_attention (same layout-native interface, online
# softmax, O(bq*bk) VMEM).
MAX_NP_FULL_SCORES = 512


def _check_np(np_):
    if np_ > MAX_NP_FULL_SCORES:
        raise ValueError(
            f"fused_qkv_attention holds full (NP, NP) score tiles in VMEM "
            f"and is capped at NP={MAX_NP_FULL_SCORES} (got NP={np_}). Use "
            f"cara_tpu.ops.pallas.blockwise_attention.blockwise_qkv_attention"
            f" — same (B, NP, 3E) interface, key-axis-tiled online softmax.")


def _mask_bias(n_real, np_, bb):
    """(bb, NP, NP) bool key-validity mask, built ONCE per program and
    reused by every head's ``where(valid, s, NEG_INF)`` — the round-1 code
    re-made the iota + compare per head.  Kept full-shape with the score
    tile as the select operand: both a (1, 1, NP) additive-bias broadcast
    and a scalar-operand ``where`` crash Mosaic on v5e ("limits[i] <=
    dim(i)" in array.h — reproduced via the standalone-kernel recipe)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (bb, np_, np_), dimension=2)
    return col < n_real


def _attn_heads(qkv, scale, n_real, heads, dh, out_dtype):
    """Per-head softmax attention on a resident (bb, NP, 3E) tile; returns
    the (bb, NP, E) attention output (shared by the plain and proj-fused
    forward kernels).

    VPU-lean formulation (round-3 forward push): the softmax scale rides on
    q (a (NP, Dh) multiply instead of (NP, NP)), the key mask is a
    broadcast-added bias row, and normalization is DEFERRED past the p@v
    GEMM — ``o = (exp(s-m) @ v) * 1/l`` touches (NP, Dh) elements instead
    of dividing the full (NP, NP) probability tile.  fp32 normalization
    after the fp32 GEMM accumulator is also numerically tighter than the
    old normalize-then-cast-to-bf16 ordering."""
    e = heads * dh
    np_ = qkv.shape[1]
    valid = _mask_bias(n_real, np_, qkv.shape[0]) if n_real < np_ else None
    outs = []
    for h in range(heads):
        q = qkv[:, :, h * dh:(h + 1) * dh] * scale
        k = qkv[:, :, e + h * dh:e + (h + 1) * dh]
        v = qkv[:, :, 2 * e + h * dh:2 * e + (h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if valid is not None:
            s = jnp.where(valid, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        ex = jnp.exp(s - m)
        l = jnp.sum(ex, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            ex.astype(qkv.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        outs.append((o * (1.0 / l)).astype(out_dtype))
    return jnp.concatenate(outs, axis=-1)


def _fwd_kernel(qkv_ref, o_ref, *, scale, n_real, heads, dh):
    o_ref[...] = _attn_heads(qkv_ref[...], scale, n_real, heads, dh,
                             o_ref.dtype)


def _fwd_proj_kernel(qkv_ref, w_ref, b_ref, u_ref, v_ref, cb_ref, y_ref,
                     *, scale, n_real, heads, dh, s):
    """Attention + projection epilogue: the (bb, NP, E) attention output is
    multiplied by W_proj (+ CP delta + biases) while still in VMEM — it
    never round-trips HBM (the reference pays write+read of attn_out per
    layer, ``cara.py:50-58``)."""
    o = _attn_heads(qkv_ref[...], scale, n_real, heads, dh, qkv_ref.dtype)
    dn = (((2,), (0,)), ((), ()))  # (bb, NP, E) x (E, X) -> (bb, NP, X)
    acc = jax.lax.dot_general(o, w_ref[...], dn,
                              preferred_element_type=jnp.float32)
    z = jax.lax.dot_general(o, u_ref[...], dn,
                            preferred_element_type=jnp.float32)
    delta = jax.lax.dot_general(z.astype(o.dtype), v_ref[...], dn,
                                preferred_element_type=jnp.float32)
    y = acc + b_ref[...].astype(jnp.float32) \
        + s * (delta + cb_ref[...].astype(jnp.float32))
    y_ref[...] = y.astype(y_ref.dtype)


def attn_bwd_tile(qkv, do_full, scale, n_real, heads, dh, dqkv_ref):
    """Per-head softmax-attention backward on resident VMEM tiles -> dqkv_ref.

    The single source of this math — shared by the plain fused-attention
    backward, the attnproj backward and the attention-block megakernels
    (cp_attn_block), so the masking/max-shift/p*(dp-row) subtleties cannot
    diverge between the split and fused paths.
    """
    e = heads * dh
    np_ = qkv.shape[1]
    valid = _mask_bias(n_real, np_, qkv.shape[0]) if n_real < np_ else None
    for h in range(heads):
        # scale folded into q (qs): s = qs@k^T, and dk = ds^T@qs directly
        # (the chain rule's dk = ds^T@q*scale) — (NP, Dh) multiplies
        # instead of two (NP, NP) passes; divides by l become one cheap
        # (NP, 1) reciprocal + broadcast multiplies.
        qs = qkv[:, :, h * dh:(h + 1) * dh] * scale
        k = qkv[:, :, e + h * dh:e + (h + 1) * dh]
        v = qkv[:, :, 2 * e + h * dh:2 * e + (h + 1) * dh]
        do = do_full[:, :, h * dh:(h + 1) * dh]
        s = jax.lax.dot_general(
            qs, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if valid is not None:
            s = jnp.where(valid, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        ex = jnp.exp(s - m)
        inv_l = 1.0 / jnp.sum(ex, axis=-1, keepdims=True)
        p = ex * inv_l
        pb = p.astype(qkv.dtype)
        dv = jax.lax.dot_general(
            pb, do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - row)).astype(qkv.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            ds, qs, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dqkv_ref[:, :, h * dh:(h + 1) * dh] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, e + h * dh:e + (h + 1) * dh] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * e + h * dh:2 * e + (h + 1) * dh] = \
            dv.astype(dqkv_ref.dtype)


def _bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, scale, n_real, heads, dh):
    attn_bwd_tile(qkv_ref[...], do_ref[...], scale, n_real, heads, dh,
                  dqkv_ref)


def _resolve_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def fused_qkv_attention(qkv, heads: int, scale: float, n_real: int,
                        block_b: int = 2, interpret=None):
    """qkv (B, NP, 3E) with NP a multiple of 128, out-flat order (3, H, Dh)
    -> attention output (B, NP, E).  ``n_real`` = number of valid tokens."""
    out, _ = _fwd(qkv, heads, scale, n_real, block_b, interpret)
    return out


def _fwd(qkv, heads, scale, n_real, block_b, interpret):
    b, np_, e3 = qkv.shape
    _check_np(np_)
    e = e3 // 3
    dh = e // heads
    bb = min(block_b, b)
    while b % bb:
        bb -= 1
    in_spec = pl.BlockSpec((bb, np_, e3), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bb, np_, e), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_real=n_real,
                          heads=heads, dh=dh),
        grid=(b // bb,),
        in_specs=[in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, np_, e), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_resolve_interpret(interpret),
    )(qkv)
    return out, (qkv,)


def _fwd_rule(qkv, heads, scale, n_real, block_b, interpret):
    return _fwd(qkv, heads, scale, n_real, block_b, interpret)


def _bwd_rule(heads, scale, n_real, block_b, interpret, res, g):
    (qkv,) = res
    b, np_, e3 = qkv.shape
    e = e3 // 3
    dh = e // heads
    bb = min(block_b, b)
    while b % bb:
        bb -= 1
    in_spec = pl.BlockSpec((bb, np_, e3), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((bb, np_, e), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_real=n_real,
                          heads=heads, dh=dh),
        grid=(b // bb,),
        in_specs=[in_spec, g_spec],
        out_specs=in_spec,
        out_shape=jax.ShapeDtypeStruct((b, np_, e3), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_resolve_interpret(interpret),
    )(qkv, g)
    return (dqkv,)


fused_qkv_attention.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Attention + projection epilogue fusion:
#   y = attn(qkv) @ W + b + s*((attn(qkv) @ U) @ V + cb)
# in one kernel — attn_out never round-trips HBM in the forward
# (NEXT_ROUND item 2: ~50 MB/layer of write+read traffic at bs64).
# Backward recomputes the attention output in VMEM (residual = qkv only)
# and reuses the transpose-free cp_dense dx kernel for the projection part.
# ---------------------------------------------------------------------------


def _attn_raw(qkv, heads, scale, n_real, block_b, interpret):
    """The plain attention pallas_call (shared by fwd and bwd recompute)."""
    b, np_, e3 = qkv.shape
    e = e3 // 3
    dh = e // heads
    bb = min(block_b, b)
    while b % bb:
        bb -= 1
    in_spec = pl.BlockSpec((bb, np_, e3), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bb, np_, e), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_real=n_real,
                          heads=heads, dh=dh),
        grid=(b // bb,),
        in_specs=[in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, np_, e), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_resolve_interpret(interpret),
    )(qkv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def fused_qkv_attention_proj(qkv, w, b, u, v, cb, heads: int, scale: float,
                             n_real: int, s: float, block_b: int = 2,
                             interpret=None):
    """qkv (B, NP, 3E) -> attention -> fused projection + CP delta, (B, NP, E).

    ``w`` (E, E) frozen projection kernel, ``b`` (E,) its bias, ``u`` (E, r) /
    ``v`` (r, E) the collapsed CP factors (``cara.rows_out_uv``), ``cb`` (E,)
    the CP bias, ``s`` the delta scale (``cara.py:57-58``).
    """
    out, _ = _fwd_proj(qkv, w, b, u, v, cb, heads, scale, n_real, s,
                       block_b, interpret)
    return out


def _fwd_proj(qkv, w, b, u, v, cb, heads, scale, n_real, s, block_b,
              interpret):
    from cara_tpu.ops.pallas.cp_dense import _pad_rank

    bsz, np_, e3 = qkv.shape
    _check_np(np_)
    e = e3 // 3
    dh = e // heads
    bb = min(block_b, bsz)
    while bsz % bb:
        bb -= 1
    up, vp = _pad_rank(u, v)
    rp = up.shape[1]
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_proj_kernel, scale=scale, n_real=n_real,
                          heads=heads, dh=dh, s=s),
        grid=(bsz // bb,),
        in_specs=[
            pl.BlockSpec((bb, np_, e3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((e, e)), const((1, e)), const((e, rp)), const((rp, e)),
            const((1, e)),
        ],
        out_specs=pl.BlockSpec((bb, np_, e), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, np_, e), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_resolve_interpret(interpret),
    )(qkv, w, b.reshape(1, e), up, vp, cb.reshape(1, e))
    return out, (qkv, w, u, v)


def _fwd_proj_rule(qkv, w, b, u, v, cb, heads, scale, n_real, s, block_b,
                   interpret):
    return _fwd_proj(qkv, w, b, u, v, cb, heads, scale, n_real, s, block_b,
                     interpret)


def _bwd_proj_rule(heads, scale, n_real, s, block_b, interpret, res, g):
    from cara_tpu.ops.pallas.cp_dense import _cp_dense_dx_raw, _fit_block

    qkv, w, u, v = res
    bsz, np_, e3 = qkv.shape
    e = e3 // 3
    g2 = g.reshape(-1, e)
    # d(attn_out) = g W^T + s (g V^T) U^T — transpose-free dx kernel; gv
    # falls out as a by-product for the factor grads.
    dattn, gv = _cp_dense_dx_raw(
        g2, w, u, v, s, 256, _fit_block(e, 1536), _fit_block(e, 768),
        interpret)
    gv = gv[:, :u.shape[1]]
    # Recompute the attention output (VMEM residuals only cover qkv) for
    # the factor-grad contractions; then standard attention backward.
    o = _attn_raw(qkv, heads, scale, n_real, block_b, interpret)
    o2 = o.reshape(-1, e)
    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32)
    du = s * dot(o2, gv, (((0,), (0,)), ((), ())))          # (E, r)
    z = o2 @ u                                              # (M, r)
    dv = s * dot(z, g2, (((0,), (0,)), ((), ())))           # (r, E)
    db = jnp.sum(g2.astype(jnp.float32), axis=0)
    dcb = s * db
    dqkv = _attn_bwd_raw(qkv, dattn.reshape(bsz, np_, e), heads, scale,
                         n_real, block_b, interpret)
    dt = g.dtype
    return (dqkv, jnp.zeros_like(w), db.astype(dt), du.astype(dt),
            dv.astype(dt), dcb.astype(dt))


def _attn_bwd_raw(qkv, do, heads, scale, n_real, block_b, interpret):
    b, np_, e3 = qkv.shape
    e = e3 // 3
    dh = e // heads
    bb = min(block_b, b)
    while b % bb:
        bb -= 1
    in_spec = pl.BlockSpec((bb, np_, e3), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((bb, np_, e), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_real=n_real,
                          heads=heads, dh=dh),
        grid=(b // bb,),
        in_specs=[in_spec, g_spec],
        out_specs=in_spec,
        out_shape=jax.ShapeDtypeStruct((b, np_, e3), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_resolve_interpret(interpret),
    )(qkv, do)


fused_qkv_attention_proj.defvjp(_fwd_proj_rule, _bwd_proj_rule)
