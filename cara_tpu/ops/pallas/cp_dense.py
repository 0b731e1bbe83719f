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


def _cp_dense_kernel(x_ref, w_ref, b_ref, u_ref, v_ref, cb_ref, o_ref,
                     acc_ref, z_ref, *, s, nk):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        z_ref[...] = jnp.zeros_like(z_ref)

    x = x_ref[...]
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
        o_ref[...] = y.astype(o_ref.dtype)


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


def _cp_dense_raw(x, w, b, u, v, cb, s, bm, bn, bk, interpret):
    m, k = x.shape
    n = w.shape[1]
    u, v = _pad_rank(u, v)
    rp = u.shape[1]
    nk = k // bk
    grid = (pl.cdiv(m, bm), n // bn, nk)
    out = pl.pallas_call(
        functools.partial(_cp_dense_kernel, s=s, nk=nk),
        grid=grid,
        in_specs=[
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
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((bm, rp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_resolve_interpret(interpret),
    )(x, w, b.reshape(1, n), u, v, cb.reshape(1, n))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def cp_dense(x, w, b, u, v, cb, s: float, bm: int = 256, bn: int = 768,
             bk: int = 256, interpret: Optional[bool] = None):
    """Fused ``x@W + b + s*((x@U)@V + cb)``; x (..., K) any leading dims."""
    out, _ = _fwd(x, w, b, u, v, cb, s, bm, bn, bk, interpret)
    return out


def _dims(x, w, bm, bn, bk):
    k = x.shape[-1]
    n = w.shape[1]
    bn = min(bn, n)
    while n % bn:
        bn //= 2
    bk = min(bk, k)
    while k % bk:
        bk //= 2
    return bm, bn, bk


def _fwd(x, w, b, u, v, cb, s, bm, bn, bk, interpret):
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    bm_, bn_, bk_ = _dims(x2, w, bm, bn, bk)
    out = _cp_dense_raw(x2, w, b, u, v, cb, s, bm_, bn_, bk_, interpret)
    return out.reshape(*lead, w.shape[1]), (x2, w, u, v, lead)


def _fwd_rule(x, w, b, u, v, cb, s, bm, bn, bk, interpret):
    return _fwd(x, w, b, u, v, cb, s, bm, bn, bk, interpret)


def _bwd_rule(s, bm, bn, bk, interpret, res, g):
    x2, w, u, v, lead = res
    n = w.shape[1]
    k = w.shape[0]
    g2 = g.reshape(-1, n)
    # dx = g W^T + s (g V^T) U^T — same fused structure, transposed operands.
    zerok = jnp.zeros((k,), g2.dtype)
    bm_, bn_, bk_ = _dims(g2, w.T, bm, bn, bk)
    dx = _cp_dense_raw(
        g2, w.T, zerok, v.T, u.T, zerok, s, bm_, bn_, bk_, interpret)
    # Factor/bias grads: small rank-r GEMMs, fine in XLA.
    gv = g2 @ v.T                       # (M, r)
    du = s * (x2.T @ gv)                # (K, r)
    z = x2 @ u                          # (M, r)
    dv = s * (z.T @ g2)                 # (r, N)
    db = jnp.sum(g2, axis=0)
    dcb = s * db
    dw = jnp.zeros_like(w)  # frozen by construction (CaRA trains factors)
    return (dx.reshape(*lead, k), dw, db.astype(g.dtype),
            du.astype(g.dtype), dv.astype(g.dtype), dcb.astype(g.dtype))


cp_dense.defvjp(_fwd_rule, _bwd_rule)
