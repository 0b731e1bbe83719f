"""MLP block megakernel: ``LN -> fc1+CP-delta -> GELU -> fc2+CP-delta``
in ONE ``pallas_call``.

Why this kernel exists (docs/DESIGN.md section 8): the v5e forward is
activation-traffic bound.  In the two-kernel fused stack the post-GELU
activation ``h`` (B, N, 4E) round-trips HBM between the fc1 and fc2 kernels
— 200 MB/layer at ViT-B bs64 — and the backward streams it twice more.
Here ``h`` lives and dies in VMEM: per m-tile the kernel normalizes the
raw residual rows, runs both GEMMs plus both rank-r CP delta chains
(reference math ``src/cara/cara.py:72-93`` — up-delta transposed, down-delta
untransposed, both biased and scaled), and writes only the (bm, E) output.
Per layer the forward touches ``x`` (25 MB), the weights (9.4 MB) and the
output (25 MB) — nothing else.

Backward (custom VJP, backbone frozen): one kernel recomputes
LN/pre-activation/``h`` per m-tile from the kept ``x`` (flash-attention-style
rematerialization — recompute is MXU-cheap, HBM is not), then produces dx
(with the LayerNorm input-backward fused, frozen-LN zero cotangents) AND all
four CP factor gradients by accumulating their rank-space contractions in
VMEM across the sequential TPU grid.  ``x`` and ``g`` are each read from HBM
exactly once; no (M, 4E) cotangent ever exists in HBM.

The ``_wd`` variant carries exact element-wise weight dropout on the dense
deltas (``cara.py:81,92`` semantics): the forward consumes per-site folded
masked weights (see ``cp_dense._build_wd_weight``), and the backward
accumulates the FULL per-site dense cotangents ``dT1 = LN(x)^T dpre`` and
``dT2 = h^T g`` in VMEM scratch, applying the blocking-independent
``hash_keep`` mask chunk-wise at the final grid step.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Save-pre mode for the element-wd block (CARA_MLP_SAVE_PRE=1/0/auto):
# the forward additionally writes the (M, 4E) pre-activation and the
# backward consumes it instead of recomputing the fc1 GEMM — trading
# ~60 GFLOP/layer of MXU recompute for a 75 MB/layer HBM round-trip
# that overlaps compute where the recompute cannot.  A/B on the v5e
# (ViT-B rank-8 bs64, RESULTS.md round-5): device 69.6 -> 68.0 ms/step,
# 902 -> 916 img/s (+1.5%); "auto" = on for TPU, off on CPU (interpret
# mode only pays the extra residual memory).
_SAVE_PRE = os.environ.get("CARA_MLP_SAVE_PRE", "auto")


def _save_pre_on() -> bool:
    if _SAVE_PRE in ("0", "1"):
        return _SAVE_PRE == "1"
    return jax.default_backend() == "tpu"

from cara_tpu.ops.pallas.cp_dense import (
    _act_grad, _apply_act, _build_wd_weight, _f0, _fit_block, _ln_rows,
    _pad_rank, _resolve_interpret, _zero_uv, masked_site_grads)


def _full(shape):
    """BlockSpec for a grid-invariant operand (fetched once, stays in VMEM)."""
    return pl.BlockSpec(shape, lambda mm: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _row(bm, width):
    """BlockSpec streaming (bm, width) m-tiles down the grid."""
    return pl.BlockSpec((bm, width), lambda mm: (mm, 0),
                        memory_space=pltpu.VMEM)


def _ln_input_bwd(x, dxa, ls, ln_eps):
    """d(x) of LayerNorm given d(LN(x)) — frozen scale/bias (fp32 in/out)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + ln_eps)
    xn = (xf - mu) * rstd
    dyg = dxa * ls.astype(jnp.float32)
    return rstd * (dyg - jnp.mean(dyg, axis=-1, keepdims=True)
                   - xn * jnp.mean(dyg * xn, axis=-1, keepdims=True))


def _recompute_h(x, w1_ref, b1_ref, u1_ref, v1_ref, cb1_ref, ls_ref, lb_ref,
                 s, act, ln_eps):
    """(xa, z1c, pre, h): the forward's VMEM intermediates for one m-tile."""
    xa = _ln_rows(x, ls_ref[...], lb_ref[...], ln_eps)
    z1 = jax.lax.dot(xa, u1_ref[...], preferred_element_type=jnp.float32)
    z1c = z1.astype(xa.dtype)
    d1 = jax.lax.dot(z1c, v1_ref[...], preferred_element_type=jnp.float32)
    pre = (jax.lax.dot(xa, w1_ref[...], preferred_element_type=jnp.float32)
           + b1_ref[...].astype(jnp.float32)
           + s * (d1 + cb1_ref[...].astype(jnp.float32)))
    h = _apply_act(pre, act).astype(xa.dtype)
    return xa, z1c, pre, h


def _mlp_fwd_kernel(x_ref, w1_ref, b1_ref, u1_ref, v1_ref, cb1_ref,
                    w2_ref, b2_ref, u2_ref, v2_ref, cb2_ref,
                    ls_ref, lb_ref, dpm_ref, o_ref, *, s, act, ln_eps):
    x = x_ref[...]
    _, _, _, h = _recompute_h(
        x, w1_ref, b1_ref, u1_ref, v1_ref, cb1_ref, ls_ref, lb_ref,
        s, act, ln_eps)
    z2 = jax.lax.dot(h, u2_ref[...], preferred_element_type=jnp.float32)
    d2 = jax.lax.dot(z2.astype(h.dtype), v2_ref[...],
                     preferred_element_type=jnp.float32)
    y = (jax.lax.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
         + b2_ref[...].astype(jnp.float32)
         + s * (d2 + cb2_ref[...].astype(jnp.float32)))
    # Fused residual + drop-path gate: out = x + dpm * y (dpm = per-row
    # mask/keep, 1.0 in eval) — the residual stream never leaves VMEM.
    o_ref[...] = (x.astype(jnp.float32)
                  + dpm_ref[...].astype(jnp.float32) * y).astype(o_ref.dtype)


def _mlp_fwd_save_pre_kernel(x_ref, w1_ref, b1_ref, u1_ref, v1_ref, cb1_ref,
                             w2_ref, b2_ref, u2_ref, v2_ref, cb2_ref,
                             ls_ref, lb_ref, dpm_ref, o_ref, pre_ref,
                             *, s, act, ln_eps):
    """_mlp_fwd_kernel that ALSO writes the pre-activation (see
    cp_mlp_block_wd save_pre: the backward then skips the fc1-recompute
    GEMM at the cost of one (M, 4E) HBM round-trip, which overlaps the
    MXU where the recompute cannot)."""
    x = x_ref[...]
    _, _, pre, h = _recompute_h(
        x, w1_ref, b1_ref, u1_ref, v1_ref, cb1_ref, ls_ref, lb_ref,
        s, act, ln_eps)
    pre_ref[...] = pre.astype(pre_ref.dtype)
    z2 = jax.lax.dot(h, u2_ref[...], preferred_element_type=jnp.float32)
    d2 = jax.lax.dot(z2.astype(h.dtype), v2_ref[...],
                     preferred_element_type=jnp.float32)
    y = (jax.lax.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
         + b2_ref[...].astype(jnp.float32)
         + s * (d2 + cb2_ref[...].astype(jnp.float32)))
    o_ref[...] = (x.astype(jnp.float32)
                  + dpm_ref[...].astype(jnp.float32) * y).astype(o_ref.dtype)


def _mlp_bwd_kernel(x_ref, g_ref, w1_ref, b1_ref, u1_ref, v1_ref, cb1_ref,
                    w2_ref, u2_ref, v2_ref, ls_ref, lb_ref, dpm_ref,
                    *refs, s, act, ln_eps, saved_pre=False):
    if saved_pre:
        (pre_ref, dx_ref, du1_ref, dv1_ref, du2_ref, dv2_ref,
         ds1_ref, ds2_ref) = refs
    else:
        (dx_ref, du1_ref, dv1_ref, du2_ref, dv2_ref,
         ds1_ref, ds2_ref) = refs
    mm = pl.program_id(0)

    @pl.when(mm == 0)
    def _init():
        for ref in (du1_ref, dv1_ref, du2_ref, dv2_ref, ds1_ref, ds2_ref):
            ref[...] = jnp.zeros_like(ref)

    x = x_ref[...]
    g_res = g_ref[...]
    # out = x + dpm*y: the branch sees g*dpm, the residual passes g through.
    g = (g_res.astype(jnp.float32)
         * dpm_ref[...].astype(jnp.float32)).astype(g_res.dtype)
    if saved_pre:
        # Saved pre-activation: skip the fc1 + delta recompute GEMMs
        # (save-pre mode, see module docs); xa/z1 stay (LN is VPU-cheap,
        # z1 is a rank-r GEMM) — both feed the factor grads below.
        xa = _ln_rows(x, ls_ref[...], lb_ref[...], ln_eps)
        z1 = jax.lax.dot(xa, u1_ref[...],
                         preferred_element_type=jnp.float32)
        z1c = z1.astype(xa.dtype)
        pre = pre_ref[...].astype(jnp.float32)
        h = _apply_act(pre, act).astype(xa.dtype)
    else:
        xa, z1c, pre, h = _recompute_h(
            x, w1_ref, b1_ref, u1_ref, v1_ref, cb1_ref, ls_ref, lb_ref,
            s, act, ln_eps)

    # fc2 backward: dh = g W2^T + s (g V2^T) U2^T, N-axis contracted in place.
    gv2 = jax.lax.dot_general(g, v2_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    gv2c = gv2.astype(g.dtype)
    dh = (jax.lax.dot_general(g, w2_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
          + s * jax.lax.dot_general(gv2c, u2_ref[...],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32))
    dpre = dh if act is None else dh * _act_grad(pre, act)
    dprec = dpre.astype(g.dtype)

    # fc1 backward + fused LayerNorm input-backward.
    gv1 = jax.lax.dot_general(dprec, v1_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    gv1c = gv1.astype(g.dtype)
    dxa = (jax.lax.dot_general(dprec, w1_ref[...], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
           + s * jax.lax.dot_general(gv1c, u1_ref[...],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32))
    dx_ref[...] = (g_res.astype(jnp.float32)
                   + _ln_input_bwd(x, dxa, ls_ref[...], ln_eps)).astype(
        dx_ref.dtype)

    # Factor gradients: rank-space contractions accumulated across the
    # sequential grid directly in the (grid-invariant) fp32 output blocks.
    # The caller applies the trailing *s.
    du1_ref[...] += jax.lax.dot_general(xa, gv1c, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    dv1_ref[...] += jax.lax.dot_general(z1c, dprec, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    du2_ref[...] += jax.lax.dot_general(h, gv2c, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    z2 = jax.lax.dot(h, u2_ref[...], preferred_element_type=jnp.float32)
    dv2_ref[...] += jax.lax.dot_general(z2.astype(h.dtype), g,
                                        (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    ds1_ref[...] += jnp.sum(dpre, axis=0, keepdims=True)
    ds2_ref[...] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)


def _pad_m(arrs, bm):
    """Zero-pad the leading (row) axis to a multiple of ``bm``.

    Zero g rows zero every gradient contribution (dpre = 0 rows), so the
    grid-accumulated factor grads stay exact on ragged M; padded dx/out rows
    are sliced off by the caller.
    """
    m = arrs[0].shape[0]
    mp = pl.cdiv(m, bm) * bm
    if mp == m:
        return arrs, m
    return [jnp.pad(a, ((0, mp - m), (0, 0))) for a in arrs], m


def _mlp_fwd_raw(x2, w1, b1, u1, v1, cb1, w2, b2, u2, v2, cb2, ls, lb, dpm2,
                 s, bm, interpret, act, ln_eps, save_pre=False):
    k, n1 = w1.shape
    e = w2.shape[1]
    if e != k:
        raise ValueError(f"residual-fused MLP needs W2 out == K ({e} vs {k})")
    u1, v1 = _pad_rank(u1, v1)
    u2, v2 = _pad_rank(u2, v2)
    rp1, rp2 = u1.shape[1], u2.shape[1]
    (x2, dpm2), m = _pad_m([x2, dpm2], bm)
    nm = x2.shape[0] // bm
    kern = _mlp_fwd_save_pre_kernel if save_pre else _mlp_fwd_kernel
    out_specs = _row(bm, e)
    out_shape = jax.ShapeDtypeStruct((x2.shape[0], e), x2.dtype)
    if save_pre:
        out_specs = (out_specs, _row(bm, n1))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((x2.shape[0], n1), x2.dtype))
    out = pl.pallas_call(
        functools.partial(kern, s=s, act=act, ln_eps=ln_eps),
        grid=(nm,),
        in_specs=[
            _row(bm, k),
            _full((k, n1)), _full((1, n1)), _full((k, rp1)),
            _full((rp1, n1)), _full((1, n1)),
            _full((n1, e)), _full((1, e)), _full((n1, rp2)),
            _full((rp2, e)), _full((1, e)),
            _full((1, k)), _full((1, k)), _row(bm, 1),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),  # fwd has no cross-m deps
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=_resolve_interpret(interpret),
    )(x2, w1, b1.reshape(1, n1), u1, v1, cb1.reshape(1, n1),
      w2, b2.reshape(1, e), u2, v2, cb2.reshape(1, e),
      ls.reshape(1, k), lb.reshape(1, k), dpm2)
    if save_pre:
        return out[0][:m], out[1]  # pre stays bm-padded for the backward
    return out[:m]


def _mlp_bwd_raw(x2, g2, w1, b1, u1, v1, cb1, w2, u2, v2, ls, lb, dpm2,
                 s, bm, interpret, act, ln_eps, pre2p=None):
    k, n1 = w1.shape
    e = w2.shape[1]
    r1, r2 = u1.shape[1], v2.shape[0]
    u1, v1 = _pad_rank(u1, v1)
    u2, v2 = _pad_rank(u2, v2)
    rp1, rp2 = u1.shape[1], u2.shape[1]
    (x2, g2, dpm2), m = _pad_m([x2, g2, dpm2], bm)
    nm = x2.shape[0] // bm
    extra_specs, extra_args = [], ()
    if pre2p is not None:
        assert pre2p.shape[0] == x2.shape[0], (pre2p.shape, x2.shape)
        extra_specs, extra_args = [_row(bm, n1)], (pre2p,)
    dx, du1, dv1, du2, dv2, ds1, ds2 = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, s=s, act=act, ln_eps=ln_eps,
                          saved_pre=pre2p is not None),
        grid=(nm,),
        in_specs=[
            _row(bm, k), _row(bm, e),
            _full((k, n1)), _full((1, n1)), _full((k, rp1)),
            _full((rp1, n1)), _full((1, n1)),
            _full((n1, e)), _full((n1, rp2)), _full((rp2, e)),
            _full((1, k)), _full((1, k)), _row(bm, 1),
        ] + extra_specs,
        out_specs=(
            _row(bm, k),
            _full((k, rp1)), _full((rp1, n1)),
            _full((n1, rp2)), _full((rp2, e)),
            _full((1, n1)), _full((1, e)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x2.shape[0], k), g2.dtype),
            jax.ShapeDtypeStruct((k, rp1), jnp.float32),
            jax.ShapeDtypeStruct((rp1, n1), jnp.float32),
            jax.ShapeDtypeStruct((n1, rp2), jnp.float32),
            jax.ShapeDtypeStruct((rp2, e), jnp.float32),
            jax.ShapeDtypeStruct((1, n1), jnp.float32),
            jax.ShapeDtypeStruct((1, e), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=_resolve_interpret(interpret),
    )(x2, g2, w1, b1.reshape(1, n1), u1, v1, cb1.reshape(1, n1),
      w2, u2, v2, ls.reshape(1, k), lb.reshape(1, k), dpm2, *extra_args)
    return (dx[:m], s * du1[:, :r1], s * dv1[:r1],
            s * du2[:, :r2], s * dv2[:r2], ds1[0], ds2[0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17, 18))
def cp_mlp_block(x, w1, b1, u1, v1, cb1, w2, b2, u2, v2, cb2,
                 ln_scale, ln_bias, dpm, s: float, bm: int = 256,
                 interpret: Optional[bool] = None, act: str = "gelu",
                 ln_eps: float = 1e-6):
    """``x + dpm * (act(LN(x)@W1 + b1 + s*((LN(x)@U1)@V1 + cb1)) @ W2 + b2
    + s*((h@U2)@V2 + cb2))`` — the full CaRA MLP block incl. residual and
    drop-path gate (``src/cara/cara.py:72-93`` + the Block residual) in one
    kernel; neither the (M, 4E) hidden activation nor the residual stream
    round-trips HBM, forward or backward.

    ``dpm``: per-row drop-path gate ``mask/keep`` with shape
    ``lead + (1,)`` — pass ones for eval.  Its cotangent is an explicit
    zero (it is sampled noise, never trained).  Requires zero activation
    dropout between the GEMMs (the ViT default).
    """
    out, _ = _mlp_fwd(x, w1, b1, u1, v1, cb1, w2, b2, u2, v2, cb2,
                      ln_scale, ln_bias, dpm, s, bm, interpret, act, ln_eps)
    return out


def _mlp_fwd(x, w1, b1, u1, v1, cb1, w2, b2, u2, v2, cb2, ls, lb, dpm,
             s, bm, interpret, act, ln_eps):
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    dpm2 = jnp.broadcast_to(dpm, lead + (1,)).reshape(-1, 1).astype(x.dtype)
    pre2p = None
    if _save_pre_on():
        out, pre2p = _mlp_fwd_raw(
            x2, w1, b1, u1, v1, cb1, w2, b2, u2, v2, cb2, ls, lb,
            dpm2, s, bm, interpret, act, ln_eps, save_pre=True)
    else:
        out = _mlp_fwd_raw(x2, w1, b1, u1, v1, cb1, w2, b2, u2, v2, cb2,
                           ls, lb, dpm2, s, bm, interpret, act, ln_eps)
    return (out.reshape(*lead, w2.shape[1]),
            (x2, w1, b1, u1, v1, cb1, w2, u2, v2, ls, lb, dpm2, dpm, lead,
             pre2p))


def _mlp_fwd_rule(x, w1, b1, u1, v1, cb1, w2, b2, u2, v2, cb2, ls, lb, dpm,
                  s, bm, interpret, act, ln_eps):
    return _mlp_fwd(x, w1, b1, u1, v1, cb1, w2, b2, u2, v2, cb2, ls, lb,
                    dpm, s, bm, interpret, act, ln_eps)


def _mlp_bwd_rule(s, bm, interpret, act, ln_eps, res, g):
    (x2, w1, b1, u1, v1, cb1, w2, u2, v2, ls, lb, dpm2, dpm, lead,
     pre2p) = res
    k = w1.shape[0]
    e = w2.shape[1]
    g2 = g.reshape(-1, e)
    dx, du1, dv1, du2, dv2, ds1, ds2 = _mlp_bwd_raw(
        x2, g2, w1, b1, u1, v1, cb1, w2, u2, v2, ls, lb, dpm2,
        s, bm, interpret, act, ln_eps, pre2p=pre2p)
    dt = g.dtype
    # Backbone W1/W2/LN are frozen by construction (CaRA trains factors +
    # biases only); their cotangents are explicit zeros, as in cp_dense_ln.
    return (dx.reshape(*lead, k).astype(dt),
            jnp.zeros_like(w1), ds1.astype(dt),
            du1.astype(dt), dv1.astype(dt), (s * ds1).astype(dt),
            jnp.zeros_like(w2), ds2.astype(dt),
            du2.astype(dt), dv2.astype(dt), (s * ds2).astype(dt),
            jnp.zeros_like(ls), jnp.zeros_like(lb), jnp.zeros_like(dpm))


cp_mlp_block.defvjp(_mlp_fwd_rule, _mlp_bwd_rule)


# ---------------------------------------------------------------------------
# Element-wise weight-dropout variant (exact cara.py:81,92 semantics).
# ---------------------------------------------------------------------------


def _mlp_bwd_wd_kernel(x_ref, g_ref, w1p_ref, b1_ref, cb1_ref, w2p_ref,
                       u1_ref, v1_ref, u2_ref, v2_ref, ls_ref, lb_ref,
                       dpm_ref, seed1_ref, seed2_ref,
                       dx_ref, du1_ref, dv1_ref, du2_ref, dv2_ref,
                       ds1_ref, ds2_ref, dt1_ref, dt2_ref,
                       *, s, drop_rate, act, ln_eps, nm, chunk1, chunk2):
    """Backward with folded masked weights: the dense per-site cotangents
    ``dT1 = xa^T dpre`` (K, 4E) and ``dT2 = h^T g`` (4E, E) accumulate in
    VMEM scratch across the grid; the mask is applied chunk-wise at the last
    step (the (K, N) planes and the hash are touched once per step)."""
    mm = pl.program_id(0)

    @pl.when(mm == 0)
    def _init():
        for ref in (du1_ref, dv1_ref, du2_ref, dv2_ref, ds1_ref, ds2_ref,
                    dt1_ref, dt2_ref):
            ref[...] = jnp.zeros_like(ref)

    x = x_ref[...]
    g_res = g_ref[...]
    g = (g_res.astype(jnp.float32)
         * dpm_ref[...].astype(jnp.float32)).astype(g_res.dtype)
    # Forward recompute against the folded weights (delta already inside
    # w1p/w2p; the s*cb bias terms remain explicit).
    xa = _ln_rows(x, ls_ref[...], lb_ref[...], ln_eps)
    pre = (jax.lax.dot(xa, w1p_ref[...], preferred_element_type=jnp.float32)
           + b1_ref[...].astype(jnp.float32)
           + s * cb1_ref[...].astype(jnp.float32))
    h = _apply_act(pre, act).astype(xa.dtype)

    dh = jax.lax.dot_general(g, w2p_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dpre = dh if act is None else dh * _act_grad(pre, act)
    dprec = dpre.astype(g.dtype)
    dxa = jax.lax.dot_general(dprec, w1p_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dx_ref[...] = (g_res.astype(jnp.float32)
                   + _ln_input_bwd(x, dxa, ls_ref[...], ln_eps)).astype(
        dx_ref.dtype)

    dt1_ref[...] += jax.lax.dot_general(xa, dprec, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    dt2_ref[...] += jax.lax.dot_general(h, g, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    ds1_ref[...] += jnp.sum(dpre, axis=0, keepdims=True)
    ds2_ref[...] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(mm == nm - 1)
    def _finish():
        masked_site_grads(dt1_ref, u1_ref, v1_ref, seed1_ref[0, 0],
                          du1_ref, dv1_ref, chunk1, s, drop_rate,
                          x_ref.dtype)
        masked_site_grads(dt2_ref, u2_ref, v2_ref, seed2_ref[0, 0],
                          du2_ref, dv2_ref, chunk2, s, drop_rate,
                          x_ref.dtype)


def _mlp_bwd_wd_pre_kernel(x_ref, g_ref, w1p_ref, b1_ref, cb1_ref, w2p_ref,
                           u1_ref, v1_ref, u2_ref, v2_ref, ls_ref, lb_ref,
                           dpm_ref, pre_ref, seed1_ref, seed2_ref,
                           dx_ref, du1_ref, dv1_ref, du2_ref, dv2_ref,
                           ds1_ref, ds2_ref, dt1_ref, dt2_ref,
                           *, s, drop_rate, act, ln_eps, nm, chunk1, chunk2):
    """_mlp_bwd_wd_kernel consuming the SAVED pre-activation: the fc1
    recompute GEMM disappears (LN stays — xa feeds dT1)."""
    mm = pl.program_id(0)

    @pl.when(mm == 0)
    def _init():
        for ref in (du1_ref, dv1_ref, du2_ref, dv2_ref, ds1_ref, ds2_ref,
                    dt1_ref, dt2_ref):
            ref[...] = jnp.zeros_like(ref)

    x = x_ref[...]
    g_res = g_ref[...]
    g = (g_res.astype(jnp.float32)
         * dpm_ref[...].astype(jnp.float32)).astype(g_res.dtype)
    xa = _ln_rows(x, ls_ref[...], lb_ref[...], ln_eps)
    pre = pre_ref[...].astype(jnp.float32)
    h = _apply_act(pre, act).astype(xa.dtype)

    dh = jax.lax.dot_general(g, w2p_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dpre = dh if act is None else dh * _act_grad(pre, act)
    dprec = dpre.astype(g.dtype)
    dxa = jax.lax.dot_general(dprec, w1p_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dx_ref[...] = (g_res.astype(jnp.float32)
                   + _ln_input_bwd(x, dxa, ls_ref[...], ln_eps)).astype(
        dx_ref.dtype)

    dt1_ref[...] += jax.lax.dot_general(xa, dprec, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    dt2_ref[...] += jax.lax.dot_general(h, g, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    ds1_ref[...] += jnp.sum(dpre, axis=0, keepdims=True)
    ds2_ref[...] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(mm == nm - 1)
    def _finish():
        masked_site_grads(dt1_ref, u1_ref, v1_ref, seed1_ref[0, 0],
                          du1_ref, dv1_ref, chunk1, s, drop_rate,
                          x_ref.dtype)
        masked_site_grads(dt2_ref, u2_ref, v2_ref, seed2_ref[0, 0],
                          du2_ref, dv2_ref, chunk2, s, drop_rate,
                          x_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17, 18, 19, 20, 21))
def cp_mlp_block_wd(x, w1, b1, u1, v1, cb1, w2, b2, u2, v2, cb2,
                    ln_scale, ln_bias, dpm, seed1, seed2, s: float,
                    drop_rate: float, bm: int = 256,
                    interpret: Optional[bool] = None, act: str = "gelu",
                    ln_eps: float = 1e-6):
    """cp_mlp_block with EXACT element-wise weight dropout on both dense
    deltas (reference semantics ``cara.py:81,92``); per-site masks derive
    from ``seed1``/``seed2`` (int32 scalar arrays) via ``hash_keep``."""
    out, _ = _mlp_fwd_wd(x, w1, b1, u1, v1, cb1, w2, b2, u2, v2, cb2,
                         ln_scale, ln_bias, dpm, seed1, seed2, s, drop_rate,
                         bm, interpret, act, ln_eps)
    return out


def _mlp_fwd_wd(x, w1, b1, u1, v1, cb1, w2, b2, u2, v2, cb2, ls, lb, dpm,
                seed1, seed2, s, drop_rate, bm, interpret, act, ln_eps):
    lead = x.shape[:-1]
    k = x.shape[-1]
    n1, e = w1.shape[1], w2.shape[1]
    x2 = x.reshape(-1, k)
    dpm2 = jnp.broadcast_to(dpm, lead + (1,)).reshape(-1, 1).astype(x.dtype)
    w1p = _build_wd_weight(w1, u1, v1, seed1, s, drop_rate, interpret)
    w2p = _build_wd_weight(w2, u2, v2, seed2, s, drop_rate, interpret)
    u0a, v0a = _zero_uv(k, n1, x.dtype)
    u0b, v0b = _zero_uv(n1, e, x.dtype)
    pre2p = None
    if _save_pre_on():
        out, pre2p = _mlp_fwd_raw(
            x2, w1p, b1, u0a, v0a, cb1, w2p, b2, u0b, v0b, cb2,
            ls, lb, dpm2, s, bm, interpret, act, ln_eps, save_pre=True)
    else:
        out = _mlp_fwd_raw(x2, w1p, b1, u0a, v0a, cb1, w2p, b2, u0b, v0b,
                           cb2, ls, lb, dpm2, s, bm, interpret, act, ln_eps)
    return (out.reshape(*lead, e),
            (x2, w1p, b1, u1, v1, cb1, w2p, u2, v2, ls, lb, dpm2, dpm,
             seed1, seed2, lead, pre2p))


def _mlp_fwd_wd_rule(x, w1, b1, u1, v1, cb1, w2, b2, u2, v2, cb2, ls, lb,
                     dpm, seed1, seed2, s, drop_rate, bm, interpret, act,
                     ln_eps):
    return _mlp_fwd_wd(x, w1, b1, u1, v1, cb1, w2, b2, u2, v2, cb2, ls, lb,
                       dpm, seed1, seed2, s, drop_rate, bm, interpret, act,
                       ln_eps)


def _mlp_bwd_wd_rule(s, drop_rate, bm, interpret, act, ln_eps, res, g):
    (x2, w1p, b1, u1, v1, cb1, w2p, u2, v2, ls, lb, dpm2, dpm, seed1,
     seed2, lead, pre2p) = res
    k, n1 = w1p.shape
    e = w2p.shape[1]
    r1, r2 = u1.shape[1], v2.shape[0]
    u1p, v1p = _pad_rank(u1, v1)
    u2p, v2p = _pad_rank(u2, v2)
    rp1, rp2 = u1p.shape[1], u2p.shape[1]
    g2 = g.reshape(-1, e)
    (x2p, g2p, dpm2p), m = _pad_m([x2, g2, dpm2], bm)
    nm = x2p.shape[0] // bm
    smem = pl.BlockSpec((1, 1), lambda mm: (0, 0), memory_space=pltpu.SMEM)
    if pre2p is not None:
        assert pre2p.shape[0] == x2p.shape[0], (pre2p.shape, x2p.shape)
        kern = _mlp_bwd_wd_pre_kernel
        extra_specs = [_row(bm, n1), smem, smem]
        extra_args = (pre2p, seed1.reshape(1, 1), seed2.reshape(1, 1))
    else:
        kern = _mlp_bwd_wd_kernel
        extra_specs = [smem, smem]
        extra_args = (seed1.reshape(1, 1), seed2.reshape(1, 1))
    dx, du1, dv1, du2, dv2, ds1, ds2 = pl.pallas_call(
        functools.partial(
            kern, s=s, drop_rate=drop_rate, act=act,
            ln_eps=ln_eps, nm=nm, chunk1=_fit_block(n1, 512),
            chunk2=_fit_block(e, 512)),
        grid=(nm,),
        in_specs=[
            _row(bm, k), _row(bm, e),
            _full((k, n1)), _full((1, n1)), _full((1, n1)),
            _full((n1, e)),
            _full((k, rp1)), _full((rp1, n1)),
            _full((n1, rp2)), _full((rp2, e)),
            _full((1, k)), _full((1, k)), _row(bm, 1),
        ] + extra_specs,
        out_specs=(
            _row(bm, k),
            _full((k, rp1)), _full((rp1, n1)),
            _full((n1, rp2)), _full((rp2, e)),
            _full((1, n1)), _full((1, e)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x2p.shape[0], k), g2.dtype),
            jax.ShapeDtypeStruct((k, rp1), jnp.float32),
            jax.ShapeDtypeStruct((rp1, n1), jnp.float32),
            jax.ShapeDtypeStruct((n1, rp2), jnp.float32),
            jax.ShapeDtypeStruct((rp2, e), jnp.float32),
            jax.ShapeDtypeStruct((1, n1), jnp.float32),
            jax.ShapeDtypeStruct((1, e), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((k, n1), jnp.float32),
            pltpu.VMEM((n1, e), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 2 ** 20),
        interpret=_resolve_interpret(interpret),
    )(x2p, g2p, w1p, b1.reshape(1, n1), cb1.reshape(1, n1), w2p,
      u1p, v1p, u2p, v2p, ls.reshape(1, k), lb.reshape(1, k), dpm2p,
      *extra_args)
    dt = g.dtype
    return (dx[:m].reshape(*lead, k).astype(dt),
            jnp.zeros_like(w1p), ds1[0].astype(dt),
            du1[:, :r1].astype(dt), dv1[:r1].astype(dt),
            (s * ds1[0]).astype(dt),
            jnp.zeros_like(w2p), ds2[0].astype(dt),
            du2[:, :r2].astype(dt), dv2[:r2].astype(dt),
            (s * ds2[0]).astype(dt),
            jnp.zeros_like(ls), jnp.zeros_like(lb), jnp.zeros_like(dpm),
            _f0(seed1), _f0(seed2))


cp_mlp_block_wd.defvjp(_mlp_fwd_wd_rule, _mlp_bwd_wd_rule)
