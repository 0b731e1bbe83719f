"""Attention block megakernel: ``LN1 -> qkv+CP-delta -> softmax attention
-> projection+CP-delta`` in ONE ``pallas_call``.

Counterpart of :mod:`cp_mlp` for the attention half of the block (reference
hot loop ``src/cara/cara.py:25-58``).  Per bb-image program the kernel
normalizes the raw residual rows, runs the fused-qkv GEMM plus the rank-r
CP delta chain (``cara.py:42``), does per-head full-score attention on the
resident (bb, NP, 3E) tile (layout-native, no 5-D transposes — see
``fused_qkv_attention``), and multiplies the attention output by W_proj
(+ 3-way CP delta + biases, ``cara.py:50-58``) before anything leaves VMEM.
The qkv activation (75 MB/layer at ViT-B bs64) and attn_out (25 MB/layer)
never exist in HBM in either direction.

Backward keeps only the raw ``x`` residual and recomputes LN/qkv/attention
per tile (the earlier attention+projection-only fusion measured NEGATIVE
because its backward re-read the 75 MB qkv residual — benchmarks/RESULTS.md;
recomputing qkv from the 25 MB ``x`` instead turns that re-read into
MXU-cheap FLOPs).  Factor grads for both sites accumulate in VMEM across
the sequential grid; ``x`` and ``g`` are each read from HBM exactly once.

Like ``fused_qkv_attention`` this holds full (bb, NP, NP) score tiles —
ViT-scale only (NP <= MAX_NP_FULL_SCORES); the caller falls back to the
split kernels past that.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Save-qkv mode (CARA_ATTN_SAVE_QKV=1/0/auto): the forward also writes
# the (B, NP, 3E) qkv activation and the backward consumes it instead of
# recomputing LN -> qkv GEMM (+ delta chain) — the cp_mlp save-pre trade
# applied to the attention site (round-3's negative measurement predates
# the aligned stream; re-measured in round 5, RESULTS.md).  The
# attention-proper recompute (scores/softmax from qkv) stays — saving
# the (B, H, NP, NP) probabilities is never affordable.
_SAVE_QKV = os.environ.get("CARA_ATTN_SAVE_QKV", "auto")


def _save_qkv_on() -> bool:
    if _SAVE_QKV in ("0", "1"):
        return _SAVE_QKV == "1"
    return jax.default_backend() == "tpu"

from cara_tpu.ops.pallas.cp_dense import (
    _build_wd_weight, _f0, _fit_block, _ln_rows, _pad_rank,
    _resolve_interpret, _zero_uv, masked_site_grads)
from cara_tpu.ops.pallas.cp_mlp import _ln_input_bwd
from cara_tpu.ops.pallas.fused_qkv_attention import (
    _attn_heads, _check_np, attn_bwd_tile)

# (bb, NP, E) x (E, X) -> (bb, NP, X)
_DN_W = (((2,), (0,)), ((), ()))


def _round_np(n):
    """Token-axis block size: next multiple of 128 (MXU/lane alignment)."""
    return -(-n // 128) * 128


def _mask_tail_rows(t, n_real):
    """Zero token rows >= ``n_real`` of a (bb, NP, E) tile.

    The caller passes the UNPADDED residual; the token-axis BlockSpec is
    rounded up to a 128 multiple, so the block's tail rows are DMA-clipped
    (undefined VMEM contents).  Zeroing them in-register reproduces the
    zero-pad semantics the graph-level ``jnp.pad`` used to provide —
    without the pad's HBM write or the post-kernel slice's HBM read
    (VERDICT r4 next 2 / docs/NEXT_ROUND.md:21-29)."""
    bb, np_, _ = t.shape
    if n_real >= np_:
        return t
    row = jax.lax.broadcasted_iota(jnp.int32, (bb, np_, 1), 1)
    return jnp.where(row < n_real, t, jnp.zeros_like(t))


def _ln3(x, ls, lb, eps):
    """Row LayerNorm on a (bb, NP, E) tile (fp32 math, input dtype out)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (xn * ls.astype(jnp.float32).reshape(1, 1, -1)
            + lb.astype(jnp.float32).reshape(1, 1, -1)).astype(x.dtype)


def _site_fwd(xa, w_ref, b_ref, u_ref, v_ref, cb_ref, s):
    """``xa @ W + b + s*((xa@U)@V [+ cb])`` on a resident 3-D tile (fp32)."""
    acc = jax.lax.dot_general(xa, w_ref[...], _DN_W,
                              preferred_element_type=jnp.float32)
    z = jax.lax.dot_general(xa, u_ref[...], _DN_W,
                            preferred_element_type=jnp.float32)
    d = jax.lax.dot_general(z.astype(xa.dtype), v_ref[...], _DN_W,
                            preferred_element_type=jnp.float32)
    y = acc + b_ref[...].astype(jnp.float32).reshape(1, 1, -1) + s * d
    if cb_ref is not None:
        y = y + s * cb_ref[...].astype(jnp.float32).reshape(1, 1, -1)
    return y, z.astype(xa.dtype)


def _attn_block_fwd_kernel(x_ref, wq_ref, bq_ref, u1_ref, v1_ref,
                           wp_ref, bp_ref, u2_ref, v2_ref, cb2_ref,
                           ls_ref, lb_ref, dpm_ref, y_ref,
                           *, heads, dh, sm_scale, n_real, s, ln_eps):
    x = _mask_tail_rows(x_ref[...], n_real)
    xa = _ln3(x, ls_ref[...], lb_ref[...], ln_eps)
    qkv, _ = _site_fwd(xa, wq_ref, bq_ref, u1_ref, v1_ref, None, s)
    qkv = qkv.astype(xa.dtype)
    o = _attn_heads(qkv, sm_scale, n_real, heads, dh, xa.dtype)
    y, _ = _site_fwd(o, wp_ref, bp_ref, u2_ref, v2_ref, cb2_ref, s)
    # Fused residual + drop-path gate (1.0 in eval).  The gate arrives
    # pre-expanded to per-token rows (bb*NP, 1) — a (bb, 1) block violates
    # the (8, 128) tiling rule at bb=2, and a dynamic sublane slice of a
    # resident (B, 1) can't be proven aligned.
    bb, np_, _ = x.shape
    dpm3 = dpm_ref[...].astype(jnp.float32).reshape(bb, np_, 1)
    y_ref[...] = (x.astype(jnp.float32) + dpm3 * y).astype(y_ref.dtype)


def _attn_block_fwd_save_kernel(x_ref, wq_ref, bq_ref, u1_ref, v1_ref,
                                wp_ref, bp_ref, u2_ref, v2_ref, cb2_ref,
                                ls_ref, lb_ref, dpm_ref, y_ref, qkv_ref,
                                *, heads, dh, sm_scale, n_real, s, ln_eps):
    """_attn_block_fwd_kernel that ALSO writes the qkv activation (full
    np_ block rows, exact reload in the backward — save-qkv mode)."""
    x = _mask_tail_rows(x_ref[...], n_real)
    xa = _ln3(x, ls_ref[...], lb_ref[...], ln_eps)
    qkv, _ = _site_fwd(xa, wq_ref, bq_ref, u1_ref, v1_ref, None, s)
    qkv = qkv.astype(xa.dtype)
    qkv_ref[...] = qkv
    o = _attn_heads(qkv, sm_scale, n_real, heads, dh, xa.dtype)
    y, _ = _site_fwd(o, wp_ref, bp_ref, u2_ref, v2_ref, cb2_ref, s)
    bb, np_, _ = x.shape
    dpm3 = dpm_ref[...].astype(jnp.float32).reshape(bb, np_, 1)
    y_ref[...] = (x.astype(jnp.float32) + dpm3 * y).astype(y_ref.dtype)


def _site_bwd_dx2(g2, w_ref, u_ref, v_ref, s):
    """2-D ``dx = g W^T + s (g V^T) U^T`` (Mosaic-native lane contraction);
    also returns gv.  The batch/token axes are pre-flattened — tpu.matmul
    does not lower multi-dim (0,1)x(0,1) contractions on 3-D tiles."""
    dn = (((1,), (1,)), ((), ()))
    gv = jax.lax.dot_general(g2, v_ref[...], dn,
                             preferred_element_type=jnp.float32)
    gvc = gv.astype(g2.dtype)
    dx = (jax.lax.dot_general(g2, w_ref[...], dn,
                              preferred_element_type=jnp.float32)
          + s * jax.lax.dot_general(gvc, u_ref[...], dn,
                                    preferred_element_type=jnp.float32))
    return dx, gvc


_DN_T = (((0,), (0,)), ((), ()))  # (M, A)^T @ (M, B_) -> (A, B_)


def _attn_block_bwd_kernel(x_ref, g_ref, wq_ref, bq_ref, u1_ref, v1_ref,
                           wp_ref, u2_ref, v2_ref, ls_ref, lb_ref, dpm_ref,
                           *refs, heads, dh, sm_scale, n_real, s, ln_eps,
                           saved_qkv=False):
    if saved_qkv:
        (qkv_ref, dx_ref, du1_ref, dv1_ref, du2_ref, dv2_ref,
         dsq_ref, dsp_ref, dqkv_ref) = refs
    else:
        (dx_ref, du1_ref, dv1_ref, du2_ref, dv2_ref,
         dsq_ref, dsp_ref, dqkv_ref) = refs
    mm = pl.program_id(0)

    @pl.when(mm == 0)
    def _init():
        for ref in (du1_ref, dv1_ref, du2_ref, dv2_ref, dsq_ref, dsp_ref):
            ref[...] = jnp.zeros_like(ref)

    bb, np_, e = x_ref.shape
    m = bb * np_
    x2 = _mask_tail_rows(x_ref[...], n_real).reshape(m, e)
    g2_res = _mask_tail_rows(g_ref[...], n_real).reshape(m, e)
    # out = x + dpm*y: branch sees g*dpm, residual passes g through.
    g2 = (g2_res.astype(jnp.float32)
          * dpm_ref[...].astype(jnp.float32)).astype(g2_res.dtype)
    # Forward recompute (x -> xa -> qkv -> attention output); GEMMs run on
    # the flattened (M, E) view, only the attention math is per-image 3-D.
    # In save-qkv mode the LN + rank-r z1 GEMM stay (both feed the factor
    # grads) but the full-width qkv GEMM is replaced by the saved tile.
    xa = _ln_rows(x2, ls_ref[...], lb_ref[...], ln_eps)
    z1 = jax.lax.dot(xa, u1_ref[...], preferred_element_type=jnp.float32)
    z1c = z1.astype(xa.dtype)
    if saved_qkv:
        qkv = qkv_ref[...]
    else:
        qkv2 = (jax.lax.dot(xa, wq_ref[...],
                            preferred_element_type=jnp.float32)
                + bq_ref[...].astype(jnp.float32)
                + s * jax.lax.dot(z1c, v1_ref[...],
                                  preferred_element_type=jnp.float32))
        qkv = qkv2.astype(xa.dtype).reshape(bb, np_, -1)
    o = _attn_heads(qkv, sm_scale, n_real, heads, dh, xa.dtype)
    o2 = o.reshape(m, heads * dh)

    # Projection-site backward.
    do, gv2c = _site_bwd_dx2(g2, wp_ref, u2_ref, v2_ref, s)
    du2_ref[...] += jax.lax.dot_general(o2, gv2c, _DN_T,
                                        preferred_element_type=jnp.float32)
    z2 = jax.lax.dot(o2, u2_ref[...], preferred_element_type=jnp.float32)
    dv2_ref[...] += jax.lax.dot_general(z2.astype(o2.dtype), g2, _DN_T,
                                        preferred_element_type=jnp.float32)
    dsp_ref[...] += jnp.sum(g2.astype(jnp.float32), axis=0, keepdims=True)

    # Attention backward into the dqkv VMEM scratch.
    attn_bwd_tile(qkv, do.astype(qkv.dtype).reshape(bb, np_, -1), sm_scale,
                   n_real, heads, dh, dqkv_ref)
    dqkv = dqkv_ref[...].reshape(m, 3 * heads * dh)

    # QKV-site backward + fused LayerNorm input-backward + residual g.
    dxa, gv1c = _site_bwd_dx2(dqkv, wq_ref, u1_ref, v1_ref, s)
    dx_ref[...] = (g2_res.astype(jnp.float32)
                   + _ln_input_bwd(x2, dxa, ls_ref[...], ln_eps)).astype(
        dx_ref.dtype).reshape(bb, np_, e)
    du1_ref[...] += jax.lax.dot_general(xa, gv1c, _DN_T,
                                        preferred_element_type=jnp.float32)
    dv1_ref[...] += jax.lax.dot_general(z1c, dqkv, _DN_T,
                                        preferred_element_type=jnp.float32)
    dsq_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)


def _block_b(bsz, block_b):
    bb = min(block_b, bsz)
    while bsz % bb:
        bb -= 1
    return bb


def _tile(bb, np_, width):
    return pl.BlockSpec((bb, np_, width), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _const(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(13, 14, 15, 16, 17, 18, 19))
def cp_attn_block(x, wq, bq, u1, v1, wp, bp, u2, v2, cb2, ln_scale, ln_bias,
                  dpm, heads: int, sm_scale: float, n_real: int, s: float,
                  block_b: int = 2, interpret: Optional[bool] = None,
                  ln_eps: float = 1e-6):
    """x (B, N, E) raw UNPADDED residual -> LN1 -> qkv+delta
    (``cara.py:42``) -> attention -> proj+delta (``cara.py:57-58``) ->
    ``x + dpm*y`` (residual + drop-path gate), all in one kernel.
    Returns (B, N, E) — no token padding before or slicing after: the
    token-axis BlockSpec is rounded up to a 128 multiple internally
    (boundary DMAs clip, tail rows are re-zeroed in-register, tail writes
    are dropped), so neither the pad-for-attention nor the slice-for-MLP
    HBM round-trip exists in the graph.  A pre-padded (B, NP, E) input
    with ``n_real < NP`` still works identically (NP must then be the
    128 multiple itself).

    ``u1`` (E, r) / ``v1`` (r, 3E) from ``cara.qkv_uv``; ``u2`` (E, r) /
    ``v2`` (r, E) from ``cara.rows_out_uv``; ``cb2`` = CP_bias1; ``dpm``
    (B, 1) per-sample drop-path ``mask/keep`` (ones in eval), cotangent an
    explicit zero.
    """
    out, _ = _ab_fwd(x, wq, bq, u1, v1, wp, bp, u2, v2, cb2, ln_scale,
                     ln_bias, dpm, heads, sm_scale, n_real, s, block_b,
                     interpret, ln_eps)
    return out


def _ab_fwd(x, wq, bq, u1, v1, wp, bp, u2, v2, cb2, ls, lb, dpm, heads,
            sm_scale, n_real, s, block_b, interpret, ln_eps):
    bsz, n_tok, e = x.shape
    np_ = _round_np(n_tok)
    _check_np(np_)
    # Attention geometry derives from the qkv WEIGHT width, not from the
    # residual width: under head-sharded tensor parallelism ``wq`` is the
    # local (E, 3*E/tp) slice and ``heads`` the local head count, while the
    # residual/out stay full-width E.
    e3l = wq.shape[1]
    eol = wp.shape[0]          # attention-output width (E/tp under TP)
    dh = (e3l // 3) // heads
    bb = _block_b(bsz, block_b)
    u1p, v1p = _pad_rank(u1, v1)
    u2p, v2p = _pad_rank(u2, v2)
    rp1, rp2 = u1p.shape[1], u2p.shape[1]
    dpm2 = jnp.broadcast_to(dpm.reshape(bsz, 1, 1), (bsz, np_, 1)
                            ).reshape(bsz * np_, 1).astype(x.dtype)
    save = _save_qkv_on()
    kern = _attn_block_fwd_save_kernel if save else _attn_block_fwd_kernel
    out_specs = _tile(bb, np_, e)
    out_shape = jax.ShapeDtypeStruct((bsz, n_tok, e), x.dtype)
    if save:
        # qkv saved at FULL block rows (bsz, np_, 3E): exact reload in
        # the backward, no tail-clipping subtleties.
        out_specs = (out_specs, _tile(bb, np_, e3l))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((bsz, np_, e3l), x.dtype))
    out = pl.pallas_call(
        functools.partial(kern, heads=heads, dh=dh,
                          sm_scale=sm_scale, n_real=n_real, s=s,
                          ln_eps=ln_eps),
        grid=(bsz // bb,),
        in_specs=[
            _tile(bb, np_, e),
            _const((e, e3l)), _const((1, e3l)), _const((e, rp1)),
            _const((rp1, e3l)),
            _const((eol, e)), _const((1, e)), _const((eol, rp2)),
            _const((rp2, e)), _const((1, e)),
            _const((1, e)), _const((1, e)),
            pl.BlockSpec((bb * np_, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=_resolve_interpret(interpret),
    )(x, wq, bq.reshape(1, -1), u1p, v1p, wp, bp.reshape(1, -1), u2p, v2p,
      cb2.reshape(1, -1), ls.reshape(1, -1), lb.reshape(1, -1), dpm2)
    out, qkv_saved = out if save else (out, None)
    return out, (x, wq, bq, u1, v1, wp, u2, v2, ls, lb, dpm2, dpm,
                 qkv_saved)


def _ab_fwd_rule(x, wq, bq, u1, v1, wp, bp, u2, v2, cb2, ls, lb, dpm, heads,
                 sm_scale, n_real, s, block_b, interpret, ln_eps):
    return _ab_fwd(x, wq, bq, u1, v1, wp, bp, u2, v2, cb2, ls, lb, dpm,
                   heads, sm_scale, n_real, s, block_b, interpret, ln_eps)


def _ab_bwd_rule(heads, sm_scale, n_real, s, block_b, interpret, ln_eps,
                 res, g):
    x, wq, bq, u1, v1, wp, u2, v2, ls, lb, dpm2, dpm, qkv_saved = res
    bsz, n_tok, e = x.shape
    np_ = _round_np(n_tok)
    e3l = wq.shape[1]
    eol = wp.shape[0]
    dh = (e3l // 3) // heads
    bb = _block_b(bsz, block_b)
    r1, r2 = u1.shape[1], u2.shape[1]
    u1p, v1p = _pad_rank(u1, v1)
    u2p, v2p = _pad_rank(u2, v2)
    rp1, rp2 = u1p.shape[1], u2p.shape[1]
    nm = bsz // bb
    extra_specs, extra_args = [], ()
    if qkv_saved is not None:
        extra_specs, extra_args = [_tile(bb, np_, e3l)], (qkv_saved,)
    dx, du1, dv1, du2, dv2, dsq, dsp = pl.pallas_call(
        functools.partial(_attn_block_bwd_kernel, heads=heads, dh=dh,
                          sm_scale=sm_scale, n_real=n_real, s=s,
                          ln_eps=ln_eps, saved_qkv=qkv_saved is not None),
        grid=(nm,),
        in_specs=[
            _tile(bb, np_, e), _tile(bb, np_, e),
            _const((e, e3l)), _const((1, e3l)), _const((e, rp1)),
            _const((rp1, e3l)),
            _const((eol, e)), _const((eol, rp2)), _const((rp2, e)),
            _const((1, e)), _const((1, e)),
            pl.BlockSpec((bb * np_, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=(
            _tile(bb, np_, e),
            _const((e, rp1)), _const((rp1, e3l)),
            _const((eol, rp2)), _const((rp2, e)),
            _const((1, e3l)), _const((1, e)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, n_tok, e), g.dtype),
            jax.ShapeDtypeStruct((e, rp1), jnp.float32),
            jax.ShapeDtypeStruct((rp1, e3l), jnp.float32),
            jax.ShapeDtypeStruct((eol, rp2), jnp.float32),
            jax.ShapeDtypeStruct((rp2, e), jnp.float32),
            jax.ShapeDtypeStruct((1, e3l), jnp.float32),
            jax.ShapeDtypeStruct((1, e), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((bb, np_, e3l), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=_resolve_interpret(interpret),
    )(x, g, wq, bq.reshape(1, -1), u1p, v1p, wp, u2p, v2p,
      ls.reshape(1, -1), lb.reshape(1, -1), dpm2, *extra_args)
    dt = g.dtype
    return (dx.astype(dt), jnp.zeros_like(wq), dsq[0].astype(dt),
            (s * du1[:, :r1]).astype(dt), (s * dv1[:r1]).astype(dt),
            jnp.zeros_like(wp), dsp[0].astype(dt),
            (s * du2[:, :r2]).astype(dt), (s * dv2[:r2]).astype(dt),
            (s * dsp[0]).astype(dt), jnp.zeros_like(ls), jnp.zeros_like(lb),
            jnp.zeros_like(dpm))


cp_attn_block.defvjp(_ab_fwd_rule, _ab_bwd_rule)


# ---------------------------------------------------------------------------
# Element-wise weight-dropout variant (exact cara.py:35,57 semantics).
# ---------------------------------------------------------------------------


def _attn_block_bwd_wd_kernel(x_ref, g_ref, wqp_ref, bq_ref, wpp_ref,
                              u1_ref, v1_ref, u2_ref, v2_ref,
                              ls_ref, lb_ref, dpm_ref, *refs,
                              heads, dh, sm_scale, n_real, s, drop_rate,
                              ln_eps, nm, chunk1, chunk2, saved_qkv=False):
    """Backward with folded masked weights; the dense site cotangents
    ``dT1 = xa^T dqkv`` (E, 3E) and ``dT2 = o^T g`` (E, E) accumulate in
    VMEM scratch, masked chunk-wise at the last grid step."""
    if saved_qkv:
        (qkv_ref, seed1_ref, seed2_ref,
         dx_ref, du1_ref, dv1_ref, du2_ref, dv2_ref, dsq_ref, dsp_ref,
         dqkv_ref, dt1_ref, dt2_ref) = refs
    else:
        (seed1_ref, seed2_ref,
         dx_ref, du1_ref, dv1_ref, du2_ref, dv2_ref, dsq_ref, dsp_ref,
         dqkv_ref, dt1_ref, dt2_ref) = refs
    mm = pl.program_id(0)

    @pl.when(mm == 0)
    def _init():
        for ref in (du1_ref, dv1_ref, du2_ref, dv2_ref, dsq_ref, dsp_ref,
                    dt1_ref, dt2_ref):
            ref[...] = jnp.zeros_like(ref)

    bb, np_, e = x_ref.shape
    m = bb * np_
    dn = (((1,), (1,)), ((), ()))
    x2 = _mask_tail_rows(x_ref[...], n_real).reshape(m, e)
    g2_res = _mask_tail_rows(g_ref[...], n_real).reshape(m, e)
    g2 = (g2_res.astype(jnp.float32)
          * dpm_ref[...].astype(jnp.float32)).astype(g2_res.dtype)
    # xa stays in save-qkv mode too (dT1 = xa^T dqkv); only the
    # full-width qkv GEMM is replaced by the saved tile.
    xa = _ln_rows(x2, ls_ref[...], lb_ref[...], ln_eps)
    if saved_qkv:
        qkv = qkv_ref[...]
    else:
        qkv2 = (jax.lax.dot(xa, wqp_ref[...],
                            preferred_element_type=jnp.float32)
                + bq_ref[...].astype(jnp.float32)).astype(xa.dtype)
        qkv = qkv2.reshape(bb, np_, -1)
    o = _attn_heads(qkv, sm_scale, n_real, heads, dh, xa.dtype)
    o2 = o.reshape(m, heads * dh)

    do = jax.lax.dot_general(g2, wpp_ref[...], dn,
                             preferred_element_type=jnp.float32)
    dt2_ref[...] += jax.lax.dot_general(o2, g2, _DN_T,
                                        preferred_element_type=jnp.float32)
    dsp_ref[...] += jnp.sum(g2.astype(jnp.float32), axis=0, keepdims=True)

    attn_bwd_tile(qkv, do.astype(qkv.dtype).reshape(bb, np_, -1), sm_scale,
                   n_real, heads, dh, dqkv_ref)
    dqkv = dqkv_ref[...].reshape(m, 3 * heads * dh)

    dxa = jax.lax.dot_general(dqkv, wqp_ref[...], dn,
                              preferred_element_type=jnp.float32)
    dx_ref[...] = (g2_res.astype(jnp.float32)
                   + _ln_input_bwd(x2, dxa, ls_ref[...], ln_eps)).astype(
        dx_ref.dtype).reshape(bb, np_, e)
    dt1_ref[...] += jax.lax.dot_general(xa, dqkv, _DN_T,
                                        preferred_element_type=jnp.float32)
    dsq_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(mm == nm - 1)
    def _finish():
        masked_site_grads(dt1_ref, u1_ref, v1_ref, seed1_ref[0, 0],
                          du1_ref, dv1_ref, chunk1, s, drop_rate,
                          x_ref.dtype)
        masked_site_grads(dt2_ref, u2_ref, v2_ref, seed2_ref[0, 0],
                          du2_ref, dv2_ref, chunk2, s, drop_rate,
                          x_ref.dtype)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(15, 16, 17, 18, 19, 20, 21, 22))
def cp_attn_block_wd(x, wq, bq, u1, v1, wp, bp, u2, v2, cb2, ln_scale,
                     ln_bias, dpm, seed1, seed2, heads: int,
                     sm_scale: float, n_real: int, s: float,
                     drop_rate: float, block_b: int = 2,
                     interpret: Optional[bool] = None, ln_eps: float = 1e-6):
    """cp_attn_block with EXACT element-wise weight dropout on both dense
    deltas (``cara.py:35,57``); per-site masks from ``seed1``/``seed2``."""
    out, _ = _ab_fwd_wd(x, wq, bq, u1, v1, wp, bp, u2, v2, cb2, ln_scale,
                        ln_bias, dpm, seed1, seed2, heads, sm_scale, n_real,
                        s, drop_rate, block_b, interpret, ln_eps)
    return out


def _ab_fwd_wd(x, wq, bq, u1, v1, wp, bp, u2, v2, cb2, ls, lb, dpm, seed1,
               seed2, heads, sm_scale, n_real, s, drop_rate, block_b,
               interpret, ln_eps):
    bsz, n_tok, e = x.shape
    np_ = _round_np(n_tok)
    _check_np(np_)
    e3l = wq.shape[1]          # 3*E/tp under head-sharded TP
    eol = wp.shape[0]          # E/tp under TP
    dh = (e3l // 3) // heads
    bb = _block_b(bsz, block_b)
    wqp = _build_wd_weight(wq, u1, v1, seed1, s, drop_rate, interpret)
    wpp = _build_wd_weight(wp, u2, v2, seed2, s, drop_rate, interpret)
    u0ap, v0ap = _pad_rank(*_zero_uv(e, e3l, x.dtype))
    u0bp, v0bp = _pad_rank(*_zero_uv(eol, e, x.dtype))
    dpm2 = jnp.broadcast_to(dpm.reshape(bsz, 1, 1), (bsz, np_, 1)
                            ).reshape(bsz * np_, 1).astype(x.dtype)
    save = _save_qkv_on()
    kern = _attn_block_fwd_save_kernel if save else _attn_block_fwd_kernel
    out_specs = _tile(bb, np_, e)
    out_shape = jax.ShapeDtypeStruct((bsz, n_tok, e), x.dtype)
    if save:
        out_specs = (out_specs, _tile(bb, np_, e3l))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((bsz, np_, e3l), x.dtype))
    out = pl.pallas_call(
        functools.partial(kern, heads=heads, dh=dh,
                          sm_scale=sm_scale, n_real=n_real, s=s,
                          ln_eps=ln_eps),
        grid=(bsz // bb,),
        in_specs=[
            _tile(bb, np_, e),
            _const((e, e3l)), _const((1, e3l)),
            _const((e, u0ap.shape[1])), _const((u0ap.shape[1], e3l)),
            _const((eol, e)), _const((1, e)),
            _const((eol, u0bp.shape[1])), _const((u0bp.shape[1], e)),
            _const((1, e)),
            _const((1, e)), _const((1, e)),
            pl.BlockSpec((bb * np_, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=_resolve_interpret(interpret),
    )(x, wqp, bq.reshape(1, -1), u0ap, v0ap, wpp, bp.reshape(1, -1),
      u0bp, v0bp, cb2.reshape(1, -1), ls.reshape(1, -1), lb.reshape(1, -1),
      dpm2)
    out, qkv_saved = out if save else (out, None)
    return out, (x, wqp, bq, u1, v1, wpp, u2, v2, ls, lb, dpm2, dpm,
                 seed1, seed2, qkv_saved)


def _ab_fwd_wd_rule(x, wq, bq, u1, v1, wp, bp, u2, v2, cb2, ls, lb, dpm,
                    seed1, seed2, heads, sm_scale, n_real, s, drop_rate,
                    block_b, interpret, ln_eps):
    return _ab_fwd_wd(x, wq, bq, u1, v1, wp, bp, u2, v2, cb2, ls, lb, dpm,
                      seed1, seed2, heads, sm_scale, n_real, s, drop_rate,
                      block_b, interpret, ln_eps)


def _ab_bwd_wd_rule(heads, sm_scale, n_real, s, drop_rate, block_b,
                    interpret, ln_eps, res, g):
    (x, wqp, bq, u1, v1, wpp, u2, v2, ls, lb, dpm2, dpm, seed1,
     seed2, qkv_saved) = res
    bsz, n_tok, e = x.shape
    np_ = _round_np(n_tok)
    e3l = wqp.shape[1]
    eol = wpp.shape[0]
    dh = (e3l // 3) // heads
    bb = _block_b(bsz, block_b)
    r1, r2 = u1.shape[1], u2.shape[1]
    u1p, v1p = _pad_rank(u1, v1)
    u2p, v2p = _pad_rank(u2, v2)
    rp1, rp2 = u1p.shape[1], u2p.shape[1]
    nm = bsz // bb
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    extra_specs, extra_args = [], ()
    if qkv_saved is not None:
        extra_specs, extra_args = [_tile(bb, np_, e3l)], (qkv_saved,)
    dx, du1, dv1, du2, dv2, dsq, dsp = pl.pallas_call(
        functools.partial(
            _attn_block_bwd_wd_kernel, heads=heads, dh=dh,
            sm_scale=sm_scale, n_real=n_real, s=s, drop_rate=drop_rate,
            ln_eps=ln_eps, nm=nm, chunk1=_fit_block(e3l, 512),
            chunk2=_fit_block(e, 512), saved_qkv=qkv_saved is not None),
        grid=(nm,),
        in_specs=[
            _tile(bb, np_, e), _tile(bb, np_, e),
            _const((e, e3l)), _const((1, e3l)), _const((eol, e)),
            _const((e, rp1)), _const((rp1, e3l)),
            _const((eol, rp2)), _const((rp2, e)),
            _const((1, e)), _const((1, e)),
            pl.BlockSpec((bb * np_, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + extra_specs + [smem, smem],
        out_specs=(
            _tile(bb, np_, e),
            _const((e, rp1)), _const((rp1, e3l)),
            _const((eol, rp2)), _const((rp2, e)),
            _const((1, e3l)), _const((1, e)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, n_tok, e), g.dtype),
            jax.ShapeDtypeStruct((e, rp1), jnp.float32),
            jax.ShapeDtypeStruct((rp1, e3l), jnp.float32),
            jax.ShapeDtypeStruct((eol, rp2), jnp.float32),
            jax.ShapeDtypeStruct((rp2, e), jnp.float32),
            jax.ShapeDtypeStruct((1, e3l), jnp.float32),
            jax.ShapeDtypeStruct((1, e), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bb, np_, e3l), x.dtype),
            pltpu.VMEM((e, e3l), jnp.float32),
            pltpu.VMEM((eol, e), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=_resolve_interpret(interpret),
    )(x, g, wqp, bq.reshape(1, -1), wpp, u1p, v1p, u2p, v2p,
      ls.reshape(1, -1), lb.reshape(1, -1), dpm2, *extra_args,
      seed1.reshape(1, 1), seed2.reshape(1, 1))
    dt = g.dtype
    return (dx.astype(dt), jnp.zeros_like(wqp), dsq[0].astype(dt),
            du1[:, :r1].astype(dt), dv1[:r1].astype(dt),
            jnp.zeros_like(wpp), dsp[0].astype(dt),
            du2[:, :r2].astype(dt), dv2[:r2].astype(dt),
            (s * dsp[0]).astype(dt), jnp.zeros_like(ls), jnp.zeros_like(lb),
            jnp.zeros_like(dpm), _f0(seed1), _f0(seed2))


cp_attn_block_wd.defvjp(_ab_fwd_wd_rule, _ab_bwd_wd_rule)
