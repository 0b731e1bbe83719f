"""Fused dense + CP-delta Pallas kernel: ``y = x @ W + b + s*((x @ U) @ V + cb)``.

This is the "base matmul + CP contraction in one kernel" design from the
build plan (SURVEY.md section 7 stage 4): the reference pays a second full
GEMM against a freshly materialized dense delta every forward
(``src/cara/cara.py:27-35``); the factorized XLA path already cuts that to
two rank-r GEMMs, and this kernel goes one step further by fusing the frozen
GEMM, the rank-r delta chain, both biases, and the scale into a single pass
over ``x`` — one HBM read of the activation, one HBM write of the result,
no delta intermediate in HBM.

Shapes: x (M, K), W (K, N), b (N,), U (K, r), V (r, N), cb (N,) — where
(U, V) collapse the token-independent CP factor products (see
``cara_tpu/ops/cp.py``).  ``r`` is zero-padded to a lane-friendly 128 by the
wrapper; the extra columns multiply by zero.

Backward (custom VJP, W frozen — CaRA trains only the factors):
``dx = g @ W.T + s * (g @ V.T) @ U.T`` reuses the same kernel with
transposed operands; ``dU = s * x.T (g V.T)``, ``dV = s * (xU).T g`` and the
bias grads are small rank-r GEMMs left to XLA.  The cotangent for W is an
explicit zero (frozen by construction; XLA removes it).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7, fp32) — Mosaic
    has no erf/erfc lowering, but exp is native VPU."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _apply_act(y, act):
    """Activation epilogue in fp32 (fused into the GEMM output tile)."""
    if act is None:
        return y
    if act == "gelu":
        return 0.5 * y * (1.0 + _erf(y * 0.7071067811865476))
    if act == "quick_gelu":
        return y * jax.nn.sigmoid(1.702 * y)
    raise ValueError(act)


def _act_grad(y, act):
    """d(act)/dy at pre-activation y (fp32)."""
    if act == "gelu":
        cdf = 0.5 * (1.0 + _erf(y * 0.7071067811865476))
        pdf = jnp.exp(-0.5 * y * y) * 0.3989422804014327
        return cdf + y * pdf
    if act == "quick_gelu":
        sig = jax.nn.sigmoid(1.702 * y)
        return sig + 1.702 * y * sig * (1.0 - sig)
    raise ValueError(act)


def hash_keep(k0, n0, bk, bn, seed, rate: float):
    """Blocking-independent Bernoulli keep mask over ABSOLUTE weight-element
    coordinates: element (k, n) of the dense (K, N) delta is kept iff
    ``mix(k, n, seed) >= rate * 2^32``.

    A stateless integer hash (xorshift-multiply finalizer) rather than a
    counter-based PRNG: it evaluates identically for any tile shape, so the
    forward GEMM kernel, the transpose-free dx kernel and the factor-grad
    kernel all see the SAME mask for a given seed no matter how each one
    blocks the (K, N) plane.  This is what makes exact element-wise weight
    dropout (``src/cara/cara.py:35,57,81,92`` — mask on the dense delta,
    shared across the batch) fusable: the mask is never materialized in HBM,
    each kernel regenerates its tile from (k0, n0, seed).
    """
    ki = (jax.lax.broadcasted_iota(jnp.uint32, (bk, bn), 0)
          + jnp.uint32(k0))
    ni = (jax.lax.broadcasted_iota(jnp.uint32, (bk, bn), 1)
          + jnp.uint32(n0))
    h = ki * jnp.uint32(0x9E3779B1) + ni * jnp.uint32(0x85EBCA77)
    h = h ^ seed.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return h >= jnp.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1))


def _masked_delta(u_tile, v_tile, k0, n0, seed, rate, s, dtype):
    """(bk, bn) tile of ``s/keep * (U V  (elementwise) M)`` in ``dtype``."""
    d = jax.lax.dot(u_tile, v_tile, preferred_element_type=jnp.float32)
    keep = hash_keep(k0, n0, d.shape[0], d.shape[1], seed, rate)
    inv = s / (1.0 - rate)
    return jnp.where(keep, d * inv, 0.0).astype(dtype)


def _ln_rows(x, ls, lb, eps):
    """Row LayerNorm in fp32 on a (bm, K) VMEM tile (full K per block)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (xn * ls.astype(jnp.float32)
            + lb.astype(jnp.float32)).astype(x.dtype)


def _cp_dense_kernel(x_ref, w_ref, b_ref, u_ref, v_ref, cb_ref, *rest,
                     s, nk, act=None, ln_eps=None):
    if ln_eps is not None:
        ls_ref, lb_ref, o_ref, acc_ref, z_ref = rest
    else:
        o_ref, acc_ref, z_ref = rest
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        z_ref[...] = jnp.zeros_like(z_ref)

    x = x_ref[...]
    if ln_eps is not None:  # fused LN prologue: normalized x never hits HBM
        x = _ln_rows(x, ls_ref[...], lb_ref[...], ln_eps)
    acc_ref[...] += jax.lax.dot(
        x, w_ref[...], preferred_element_type=jnp.float32)
    z_ref[...] += jax.lax.dot(
        x, u_ref[...], preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == nk - 1)
    def _finish():
        z = z_ref[...].astype(x_ref.dtype)
        delta = jax.lax.dot(
            z, v_ref[...], preferred_element_type=jnp.float32)
        y = acc_ref[...] + b_ref[...].astype(jnp.float32) \
            + s * (delta + cb_ref[...].astype(jnp.float32))
        o_ref[...] = _apply_act(y, act).astype(o_ref.dtype)


def _cp_dense_dact_kernel(x_ref, w_ref, b_ref, u_ref, v_ref, cb_ref, *rest,
                          s, nk, act, ln_eps=None):
    """Backward helper: recompute the pre-activation tile and emit
    ``dpre = g * act'(pre)`` — one pass, the pre-activation never hits HBM."""
    if ln_eps is not None:
        ls_ref, lb_ref, g_ref, o_ref, acc_ref, z_ref = rest
    else:
        g_ref, o_ref, acc_ref, z_ref = rest
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        z_ref[...] = jnp.zeros_like(z_ref)

    x = x_ref[...]
    if ln_eps is not None:
        x = _ln_rows(x, ls_ref[...], lb_ref[...], ln_eps)
    acc_ref[...] += jax.lax.dot(
        x, w_ref[...], preferred_element_type=jnp.float32)
    z_ref[...] += jax.lax.dot(
        x, u_ref[...], preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == nk - 1)
    def _finish():
        z = z_ref[...].astype(x_ref.dtype)
        delta = jax.lax.dot(
            z, v_ref[...], preferred_element_type=jnp.float32)
        pre = acc_ref[...] + b_ref[...].astype(jnp.float32) \
            + s * (delta + cb_ref[...].astype(jnp.float32))
        dpre = g_ref[...].astype(jnp.float32) * _act_grad(pre, act)
        o_ref[...] = dpre.astype(o_ref.dtype)


def _cp_dense_dx_kernel(g_ref, w_ref, v_ref, u_ref, *rest, s, nn,
                        ln_eps=None):
    """dx = g @ W^T + s * (g @ V^T) @ U^T without materializing any
    transpose: the MXU contracts the shared N axis directly via
    dot_general dimension numbers.

    Blocks: g (bm, bn) over N; w (bko, bn); v (rp, bn); u (bko, rp);
    out (bm, bko).  Grid (M/bm, K/bko, N/bn), N innermost (reduction).

    With ``ln_eps`` the full LayerNorm input-backward is fused into the
    epilogue (requires bko == K so the whole row is resident): extra inputs
    x (bm, K) raw and ln_scale (1, K); output becomes d(x_raw).
    """
    if ln_eps is not None:
        x_ref, ls_ref, o_ref, gv_ref, acc_ref, z_ref = rest
    else:
        o_ref, gv_ref, acc_ref, z_ref = rest
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        z_ref[...] = jnp.zeros_like(z_ref)

    g = g_ref[...]
    # acc[m, k] += sum_n g[m, n] * w[k, n]
    acc_ref[...] += jax.lax.dot_general(
        g, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # z[m, r] += sum_n g[m, n] * v[r, n]
    z_ref[...] += jax.lax.dot_general(
        g, v_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == nn - 1)
    def _finish():
        z = z_ref[...].astype(g_ref.dtype)
        # g @ V^T falls out of the delta accumulation — emit it so the
        # factor-gradient GEMMs don't re-read g from HBM.
        gv_ref[...] = z
        # delta[m, k] = sum_r z[m, r] * u[k, r]
        delta = jax.lax.dot_general(
            z, u_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dxl = acc_ref[...] + s * delta           # d(LN output), fp32
        if ln_eps is None:
            o_ref[...] = dxl.astype(o_ref.dtype)
            return
        # Fused LayerNorm input-backward on the resident full-K row.
        xf = x_ref[...].astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + ln_eps)
        xn = (xf - mu) * rstd
        dyg = dxl * ls_ref[...].astype(jnp.float32)
        dx = rstd * (dyg - jnp.mean(dyg, axis=-1, keepdims=True)
                     - xn * jnp.mean(dyg * xn, axis=-1, keepdims=True))
        o_ref[...] = dx.astype(o_ref.dtype)


def _cp_dense_dx_raw(g, w, u, v, s, bm, bko, bn, interpret, ln=None,
                     x=None):
    """dx (M, K) from g (M, N) against the ORIGINAL (K, N) kernel and (r, N)
    V — contraction over N happens inside the kernel (no transposes).
    ``ln=(ls, eps)`` with ``x`` fuses the LayerNorm input-backward (needs
    bko == K)."""
    m, n = g.shape
    k = w.shape[0]
    u, v = _pad_rank(u, v)
    rp = u.shape[1]
    nn = n // bn
    ln_eps = None
    if ln is not None:
        # The LN input-backward needs the whole K row resident; override the
        # block size BEFORE building in_specs so the w/u block shapes agree
        # with the grid and accumulator (they silently diverged for K > 1536
        # when this was applied afterwards).
        bko = k
    in_specs = [
        pl.BlockSpec((bm, bn), lambda i, j, kk: (i, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bko, bn), lambda i, j, kk: (j, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rp, bn), lambda i, j, kk: (0, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bko, rp), lambda i, j, kk: (j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [g, w, v, u]
    if ln is not None:
        ls, ln_eps = ln
        in_specs.append(pl.BlockSpec((bm, k), lambda i, j, kk: (i, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, k), lambda i, j, kk: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(x)
        args.append(ls.reshape(1, k))
    grid = (pl.cdiv(m, bm), k // bko, nn)
    out, gv = pl.pallas_call(
        functools.partial(_cp_dense_dx_kernel, s=s, nn=nn, ln_eps=ln_eps),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((bm, bko), lambda i, j, kk: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, rp), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, k), g.dtype),
            jax.ShapeDtypeStruct((m, rp), g.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bm, bko), jnp.float32),
            pltpu.VMEM((bm, rp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=96 * 2 ** 20),
        interpret=_resolve_interpret(interpret),
    )(*args)
    return out, gv


def _resolve_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _pad_rank(u, v, rp=128):
    r = u.shape[1]
    if r >= rp:
        return u, v
    return (jnp.pad(u, ((0, 0), (0, rp - r))),
            jnp.pad(v, ((0, rp - r), (0, 0))))


def _cp_dense_raw(x, w, b, u, v, cb, s, bm, bn, bk, interpret, act=None,
                  g=None, ln=None):
    m, k = x.shape
    n = w.shape[1]
    u, v = _pad_rank(u, v)
    rp = u.shape[1]
    if ln is not None:
        bk = k  # LN needs the whole row resident in VMEM
    nk = k // bk
    grid = (pl.cdiv(m, bm), n // bn, nk)
    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, rp), lambda i, j, kk: (kk, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rp, bn), lambda i, j, kk: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, w, b.reshape(1, n), u, v, cb.reshape(1, n)]
    ln_eps = None
    if ln is not None:
        ls, lb, ln_eps = ln
        in_specs.append(pl.BlockSpec((1, k), lambda i, j, kk: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, k), lambda i, j, kk: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(ls.reshape(1, k))
        args.append(lb.reshape(1, k))
    if g is None:
        kernel = functools.partial(_cp_dense_kernel, s=s, nk=nk, act=act,
                                   ln_eps=ln_eps)
    else:
        kernel = functools.partial(
            _cp_dense_dact_kernel, s=s, nk=nk, act=act, ln_eps=ln_eps)
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                                     memory_space=pltpu.VMEM))
        args.append(g)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((bm, rp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=96 * 2 ** 20),
        interpret=_resolve_interpret(interpret),
    )(*args)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def cp_dense(x, w, b, u, v, cb, s: float, bm: int = 256, bn: int = 1536,
             bk: int = 768, interpret: Optional[bool] = None,
             act: Optional[str] = None):
    """Fused ``act(x@W + b + s*((x@U)@V + cb))``; x (..., K) any leading dims.

    ``act`` in {None, "gelu", "quick_gelu"} fuses the activation into the
    output tile — the pre-activation never touches HBM (fwd or bwd; the
    backward recomputes it in VMEM via ``_cp_dense_dact_kernel``).
    """
    out, _ = _fwd(x, w, b, u, v, cb, s, bm, bn, bk, interpret, act)
    return out


def _fit_block(dim: int, want: int) -> int:
    """Largest lane-friendly (multiple of 128) divisor of ``dim`` <= want."""
    want = min(want, dim)
    for cand in range(want - want % 128, 127, -128):
        if dim % cand == 0:
            return cand
    return dim  # dim < 128: single block


def _dims(x, w, bm, bn, bk):
    k = x.shape[-1]
    n = w.shape[1]
    return bm, _fit_block(n, bn), _fit_block(k, bk)


def _fwd(x, w, b, u, v, cb, s, bm, bn, bk, interpret, act=None):
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    bm_, bn_, bk_ = _dims(x2, w, bm, bn, bk)
    out = _cp_dense_raw(x2, w, b, u, v, cb, s, bm_, bn_, bk_, interpret, act)
    return out.reshape(*lead, w.shape[1]), (x2, w, b, u, v, cb, lead)


def _fwd_rule(x, w, b, u, v, cb, s, bm, bn, bk, interpret, act=None):
    return _fwd(x, w, b, u, v, cb, s, bm, bn, bk, interpret, act)


def _bwd_rule(s, bm, bn, bk, interpret, act, res, g):
    x2, w, b, u, v, cb, lead = res
    n = w.shape[1]
    k = w.shape[0]
    g2 = g.reshape(-1, n)
    if act is not None:
        # Recompute the pre-activation in VMEM and fold in act' — one fused
        # pass, pre-activation never written to HBM.
        bm_, bn_, bk_ = _dims(x2, w, bm, bn, bk)
        g2 = _cp_dense_raw(x2, w, b, u, v, cb, s, bm_, bn_, bk_, interpret,
                           act, g=g2)
    # dx = g W^T + s (g V^T) U^T — one fused kernel contracting the shared N
    # axis in place (no materialized transposes of the stacked weights);
    # gv = g V^T is emitted by the same kernel.  512-row blocks + single-
    # pass N measured fastest across all four sites (kernel_tune round 2).
    dx, gv = _cp_dense_dx_raw(
        g2, w, u, v, s, max(bm, 512), _fit_block(k, 1536),
        _fit_block(n, 3072), interpret)
    gv = gv[:, :u.shape[1]]
    # Factor/bias grads: small rank-r contractions, transpose-free
    # dot_generals left to XLA.
    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32)
    du = s * dot(x2, gv, (((0,), (0,)), ((), ()))) # (K, r)
    z = x2 @ u                                     # (M, r)
    dv = s * dot(z, g2, (((0,), (0,)), ((), ()))) # (r, N)
    db = jnp.sum(g2.astype(jnp.float32), axis=0)
    dcb = s * db
    dw = jnp.zeros_like(w)  # frozen by construction (CaRA trains factors)
    return (dx.reshape(*lead, k), dw, db.astype(g.dtype),
            du.astype(g.dtype), dv.astype(g.dtype), dcb.astype(g.dtype))


cp_dense.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# LN-prologue variant: act(cp_dense(LayerNorm(x))) in one kernel pass.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))
def cp_dense_ln(x, w, b, u, v, cb, ln_scale, ln_bias, s: float,
                bm: int = 256, bn: int = 1536, bk: int = 768,
                interpret: Optional[bool] = None, act: Optional[str] = None,
                ln_eps: float = 1e-6):
    """``act(LN(x) @ W + b + s*((LN(x) @ U) @ V + cb))`` fully fused.

    The LayerNorm runs on the x tile in VMEM (requires K to fit one block —
    true for the E-wide sites), so neither the normalized activation nor the
    pre-activation ever round-trips HBM.  Backward recomputes LN/pre-act in
    VMEM; the LN input-gradient is one fused XLA elementwise pass.
    """
    out, _ = _fwd_ln(x, w, b, u, v, cb, ln_scale, ln_bias, s, bm, bn, bk,
                     interpret, act, ln_eps)
    return out


def _fwd_ln(x, w, b, u, v, cb, ls, lb, s, bm, bn, bk, interpret, act, ln_eps):
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    bm_, bn_, _ = _dims(x2, w, bm, bn, bk)
    out = _cp_dense_raw(x2, w, b, u, v, cb, s, bm_, bn_, k, interpret, act,
                        ln=(ls, lb, ln_eps))
    return (out.reshape(*lead, w.shape[1]),
            (x2, w, b, u, v, cb, ls, lb, lead))


def _fwd_ln_rule(x, w, b, u, v, cb, ls, lb, s, bm, bn, bk, interpret, act,
                 ln_eps):
    return _fwd_ln(x, w, b, u, v, cb, ls, lb, s, bm, bn, bk, interpret, act,
                   ln_eps)


def _bwd_ln_rule(s, bm, bn, bk, interpret, act, ln_eps, res, g):
    x2, w, b, u, v, cb, ls, lb, lead = res
    n = w.shape[1]
    k = w.shape[0]
    g2 = g.reshape(-1, n)
    if act is not None:
        bm_, bn_, _ = _dims(x2, w, bm, bn, bk)
        g2 = _cp_dense_raw(x2, w, b, u, v, cb, s, bm_, bn_, k, interpret,
                           act, g=g2, ln=(ls, lb, ln_eps))
    # dx with the full LayerNorm input-backward fused into the kernel
    # epilogue (the backbone LN params are frozen in CaRA, so their
    # cotangents are explicit zeros — no dls/dlb passes); gv = g V^T is
    # emitted by the same kernel.
    dx, gv = _cp_dense_dx_raw(
        g2, w, u, v, s, max(bm, 512), _fit_block(k, 1536),
        _fit_block(n, 3072), interpret, ln=(ls, ln_eps), x=x2)
    gv = gv[:, :u.shape[1]]
    # Factor grads contract against the LN'd activation (recomputed once).
    xf = x2.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + ln_eps)
    lnx = (xn * ls.astype(jnp.float32)
           + lb.astype(jnp.float32)).astype(g2.dtype)
    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32)
    du = s * dot(lnx, gv, (((0,), (0,)), ((), ())))
    z = lnx @ u
    dv = s * dot(z, g2, (((0,), (0,)), ((), ())))
    db = jnp.sum(g2.astype(jnp.float32), axis=0)
    dcb = s * db
    dw = jnp.zeros_like(w)
    dt = g.dtype
    return (dx.reshape(*lead, k).astype(dt), dw, db.astype(dt),
            du.astype(dt), dv.astype(dt), dcb.astype(dt),
            jnp.zeros_like(ls), jnp.zeros_like(lb))


cp_dense_ln.defvjp(_fwd_ln_rule, _bwd_ln_rule)


# ---------------------------------------------------------------------------
# Element-wise weight dropout (exact reference semantics, cara.py:35,57,81,92)
# in the fused path: the dense (K, N) delta tile is rebuilt in VMEM, masked
# by the blocking-independent hash_keep mask, and consumed as a second GEMM —
# the mask/delta never exist in HBM.  Factor grads need the masked dense
# cotangent dT = (x^T g).M, produced tile-wise by the kernel below.
# ---------------------------------------------------------------------------


def _build_wd_kernel(w_ref, u_ref, v_ref, seed_ref, o_ref, *, s,
                     drop_rate):
    """One (bk, bn) tile of the FOLDED weight ``W' = W + s/keep*(UV . M)``.

    Runs ONCE per tile per step (not once per m-tile like an in-GEMM mask
    would — measured 151 ms/step that way vs 88 folded): the hash + rank
    GEMM cost is O(K*N), and downstream the masked site is a plain dense
    GEMM with zero extra weight traffic.
    """
    d = _masked_delta(u_ref[...], v_ref[...],
                      pl.program_id(0) * w_ref.shape[0],
                      pl.program_id(1) * w_ref.shape[1],
                      seed_ref[0, 0], drop_rate, s, jnp.float32)
    o_ref[...] = (w_ref[...].astype(jnp.float32) + d).astype(o_ref.dtype)


def _build_wd_weight(w, u, v, seed, s, drop_rate, interpret):
    """Folded masked weight W' (K, N), same dtype as w."""
    k, n = w.shape
    up, vp = _pad_rank(u, v)
    rp = up.shape[1]
    bko = _fit_block(k, 512)
    bn = _fit_block(n, 1024)
    return pl.pallas_call(
        functools.partial(_build_wd_kernel, s=s, drop_rate=drop_rate),
        grid=(k // bko, n // bn),
        in_specs=[
            pl.BlockSpec((bko, bn), lambda j, kk: (j, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bko, rp), lambda j, kk: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, bn), lambda j, kk: (0, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j, kk: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bko, bn), lambda j, kk: (j, kk),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n), w.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_resolve_interpret(interpret),
    )(w, up, vp, seed.reshape(1, 1))


def _zero_uv(k, n, dtype):
    """Zero (U, V) placeholders: the masked delta is already folded into
    W', so the rank path contributes nothing (and costs one near-free
    (bm, K) x (K, 128) GEMM)."""
    return jnp.zeros((k, 1), dtype), jnp.zeros((1, n), dtype)


def masked_site_grads(dt_ref, u_ref, v_ref, seed, du_ref, dv_ref, chunk,
                      s, drop_rate, work_dtype):
    """Chunk-wise masked factor grads from an accumulated dense cotangent:
    ``dU += ((dT (el-mul) M) * s/keep) @ V^T``, ``dV = U^T @ (...)`` — the
    shared finish step of every element-dropout backward (cp_dense,
    cp_mlp, cp_attn_block), regenerating the hash mask per chunk so the
    (K, N) plane is touched exactly once."""
    kk, nn = dt_ref.shape
    inv = s / (1.0 - drop_rate)
    for c in range(0, nn, chunk):
        keep = hash_keep(0, c, kk, chunk, seed, drop_rate)
        dtc = jnp.where(keep, dt_ref[:, c:c + chunk] * inv,
                        0.0).astype(work_dtype)
        du_ref[...] += jax.lax.dot_general(
            dtc, v_ref[:, c:c + chunk], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dv_ref[:, c:c + chunk] = jax.lax.dot_general(
            u_ref[...], dtc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)


def _cp_wd_grads_kernel(x_ref, g_ref, u_ref, v_ref, seed_ref,
                        du_ref, dv_ref, dt_ref, du_acc, *, nm, s,
                        drop_rate, chunk):
    """Single-pass masked factor grads: the FULL (K, N) cotangent
    ``dT = x^T g`` accumulates in a VMEM scratch over all m-tiles (x and g
    are each read from HBM exactly once), then the mask is applied
    chunk-wise and contracted into dU / dV — the hash and the (K, N)
    plane are touched once per step, not once per tile pair."""
    mm = pl.program_id(0)

    @pl.when(mm == 0)
    def _init():
        dt_ref[...] = jnp.zeros_like(dt_ref)
        du_acc[...] = jnp.zeros_like(du_acc)

    dt_ref[...] += jax.lax.dot_general(
        x_ref[...], g_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(mm == nm - 1)
    def _finish():
        masked_site_grads(dt_ref, u_ref, v_ref, seed_ref[0, 0], du_acc,
                          dv_ref, chunk, s, drop_rate, x_ref.dtype)
        du_ref[...] = du_acc[...].astype(du_ref.dtype)


def _cp_wd_factor_grads(x2, g2, u, v, seed, s, drop_rate, bm, bko, bn,
                        interpret):
    """(dU (K, r), dV (r, N)) under the element mask.  x2 (M, K), g2 (M, N).

    ``bko``/``bn`` are accepted for call-site compatibility but the kernel
    holds the full (K, N) dT scratch (<= 9.4 MB f32 at the ViT-B fc sites;
    vmem_limit raised accordingly)."""
    m, k = x2.shape
    n = g2.shape[1]
    r = u.shape[1]
    up, vp = _pad_rank(u, v)
    rp = up.shape[1]
    # dt = x^T g contracts over M: a ragged last tile would mix undefined
    # padding rows into every dt element — zero-pad M up front (zero rows
    # contribute nothing).
    m_pad = pl.cdiv(m, bm) * bm
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
        g2 = jnp.pad(g2, ((0, m_pad - m), (0, 0)))
        m = m_pad
    nm = m // bm
    chunk = _fit_block(n, 512)
    du, dv = pl.pallas_call(
        functools.partial(_cp_wd_grads_kernel, nm=nm, s=s,
                          drop_rate=drop_rate, chunk=chunk),
        grid=(nm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda mm: (mm, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, n), lambda mm: (mm, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, rp), lambda mm: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, n), lambda mm: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda mm: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((k, rp), lambda mm: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, n), lambda mm: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, rp), jnp.float32),
            jax.ShapeDtypeStruct((rp, n), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((k, n), jnp.float32),
            pltpu.VMEM((k, rp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=_resolve_interpret(interpret),
    )(x2, g2, up, vp, seed.reshape(1, 1))
    return du[:, :r], dv[:r]


def _f0(x):
    """float0 zero cotangent for an integer primal (the dropout seed)."""
    import numpy as np

    return np.zeros(x.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def cp_dense_wd(x, w, b, u, v, cb, seed, s: float, drop_rate: float,
                bm: int = 256, bn: int = 1024, bk: int = 768,
                interpret: Optional[bool] = None,
                act: Optional[str] = None):
    """``act(x@W + b + s*((x @ (UV . M)) / keep + cb))`` — cp_dense with
    EXACT element-wise weight dropout on the dense delta (reference
    semantics, ``cara.py:35``), mask derived from ``seed`` (int32 scalar
    array) via :func:`hash_keep`.  Train-time only; use :func:`cp_dense`
    for eval (identical at rate 0)."""
    out, _ = _fwd_wd(x, w, b, u, v, cb, seed, s, drop_rate, bm, bn, bk,
                     interpret, act)
    return out


def _fwd_wd(x, w, b, u, v, cb, seed, s, drop_rate, bm, bn, bk, interpret,
            act):
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    wp = _build_wd_weight(w, u, v, seed, s, drop_rate, interpret)
    u0, v0 = _zero_uv(k, w.shape[1], x.dtype)
    bm_, bn_, bk_ = _dims(x2, w, bm, bn, bk)
    out = _cp_dense_raw(x2, wp, b, u0, v0, cb, s, bm_, bn_, bk_, interpret,
                        act)
    return (out.reshape(*lead, w.shape[1]),
            (x2, w, wp, b, u, v, cb, seed, lead))


def _fwd_wd_rule(x, w, b, u, v, cb, seed, s, drop_rate, bm, bn, bk,
                 interpret, act):
    return _fwd_wd(x, w, b, u, v, cb, seed, s, drop_rate, bm, bn, bk,
                   interpret, act)


def _bwd_wd_rule(s, drop_rate, bm, bn, bk, interpret, act, res, g):
    # wp rides along as a residual: rebuilding it would cost a redundant
    # read of (w, u, v) + write of (K, N) per site in the backward.
    x2, w, wp, b, u, v, cb, seed, lead = res
    n = w.shape[1]
    k = w.shape[0]
    g2 = g.reshape(-1, n)
    u0, v0 = _zero_uv(k, n, g2.dtype)
    if act is not None:
        bm_, bn_, bk_ = _dims(x2, w, bm, bn, bk)
        g2 = _cp_dense_raw(x2, wp, b, u0, v0, cb, s, bm_, bn_, bk_,
                           interpret, act, g=g2)
    dx, _ = _cp_dense_dx_raw(
        g2, wp, u0, v0, 0.0, max(bm, 512), _fit_block(k, 1536),
        _fit_block(n, 3072), interpret)
    du, dv = _cp_wd_factor_grads(
        x2, g2, u, v, seed, s, drop_rate, bm,
        _fit_block(k, 768), _fit_block(n, 768), interpret)
    db = jnp.sum(g2.astype(jnp.float32), axis=0)
    dcb = s * db
    dt = g.dtype
    return (dx.reshape(*lead, k), jnp.zeros_like(w), db.astype(dt),
            du.astype(dt), dv.astype(dt), dcb.astype(dt), _f0(seed))


cp_dense_wd.defvjp(_fwd_wd_rule, _bwd_wd_rule)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(9, 10, 11, 12, 13, 14, 15, 16))
def cp_dense_ln_wd(x, w, b, u, v, cb, ln_scale, ln_bias, seed, s: float,
                   drop_rate: float, bm: int = 256, bn: int = 1024,
                   bk: int = 768, interpret: Optional[bool] = None,
                   act: Optional[str] = None, ln_eps: float = 1e-6):
    """cp_dense_ln + exact element-wise weight dropout (see cp_dense_wd)."""
    out, _ = _fwd_ln_wd(x, w, b, u, v, cb, ln_scale, ln_bias, seed, s,
                        drop_rate, bm, bn, bk, interpret, act, ln_eps)
    return out


def _fwd_ln_wd(x, w, b, u, v, cb, ls, lb, seed, s, drop_rate, bm, bn, bk,
               interpret, act, ln_eps):
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    wp = _build_wd_weight(w, u, v, seed, s, drop_rate, interpret)
    u0, v0 = _zero_uv(k, w.shape[1], x.dtype)
    bm_, bn_, _ = _dims(x2, w, bm, bn, bk)
    out = _cp_dense_raw(x2, wp, b, u0, v0, cb, s, bm_, bn_, k, interpret,
                        act, ln=(ls, lb, ln_eps))
    return (out.reshape(*lead, w.shape[1]),
            (x2, w, wp, b, u, v, cb, ls, lb, seed, lead))


def _fwd_ln_wd_rule(x, w, b, u, v, cb, ls, lb, seed, s, drop_rate, bm, bn,
                    bk, interpret, act, ln_eps):
    return _fwd_ln_wd(x, w, b, u, v, cb, ls, lb, seed, s, drop_rate, bm, bn,
                      bk, interpret, act, ln_eps)


def _bwd_ln_wd_rule(s, drop_rate, bm, bn, bk, interpret, act, ln_eps, res,
                    g):
    x2, w, wp, b, u, v, cb, ls, lb, seed, lead = res
    n = w.shape[1]
    k = w.shape[0]
    g2 = g.reshape(-1, n)
    u0, v0 = _zero_uv(k, n, g2.dtype)
    if act is not None:
        bm_, bn_, _ = _dims(x2, w, bm, bn, bk)
        g2 = _cp_dense_raw(x2, wp, b, u0, v0, cb, s, bm_, bn_, k, interpret,
                           act, g=g2, ln=(ls, lb, ln_eps))
    dx, _ = _cp_dense_dx_raw(
        g2, wp, u0, v0, 0.0, max(bm, 512), _fit_block(k, 1536),
        _fit_block(n, 3072), interpret, ln=(ls, ln_eps), x=x2)
    # Factor grads contract against LN(x) (recomputed once in XLA).
    xf = x2.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + ln_eps)
    lnx = (xn * ls.astype(jnp.float32)
           + lb.astype(jnp.float32)).astype(g2.dtype)
    du, dv = _cp_wd_factor_grads(
        lnx, g2, u, v, seed, s, drop_rate, bm,
        _fit_block(k, 768), _fit_block(n, 768), interpret)
    db = jnp.sum(g2.astype(jnp.float32), axis=0)
    dcb = s * db
    dt = g.dtype
    return (dx.reshape(*lead, k).astype(dt), jnp.zeros_like(w),
            db.astype(dt), du.astype(dt), dv.astype(dt), dcb.astype(dt),
            jnp.zeros_like(ls), jnp.zeros_like(lb), _f0(seed))


cp_dense_ln_wd.defvjp(_fwd_ln_wd_rule, _bwd_ln_wd_rule)
