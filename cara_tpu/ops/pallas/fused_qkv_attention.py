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


def _fwd_kernel(qkv_ref, o_ref, *, scale, n_real, heads, dh):
    qkv = qkv_ref[...]  # (bb, NP, 3E)
    e = heads * dh
    np_ = qkv.shape[1]
    col = None
    if n_real < np_:
        col = jax.lax.broadcasted_iota(
            jnp.int32, (qkv.shape[0], np_, np_), dimension=2)
    for h in range(heads):
        q = qkv[:, :, h * dh:(h + 1) * dh]
        k = qkv[:, :, e + h * dh:e + (h + 1) * dh]
        v = qkv[:, :, 2 * e + h * dh:2 * e + (h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if col is not None:
            s = jnp.where(col < n_real, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(qkv.dtype)
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, :, h * dh:(h + 1) * dh] = o.astype(o_ref.dtype)


def _bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, scale, n_real, heads, dh):
    qkv = qkv_ref[...]
    do_full = do_ref[...]  # (bb, NP, E)
    e = heads * dh
    np_ = qkv.shape[1]
    col = None
    if n_real < np_:
        col = jax.lax.broadcasted_iota(
            jnp.int32, (qkv.shape[0], np_, np_), dimension=2)
    for h in range(heads):
        q = qkv[:, :, h * dh:(h + 1) * dh]
        k = qkv[:, :, e + h * dh:e + (h + 1) * dh]
        v = qkv[:, :, 2 * e + h * dh:2 * e + (h + 1) * dh]
        do = do_full[:, :, h * dh:(h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if col is not None:
            s = jnp.where(col < n_real, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        ex = jnp.exp(s - m)
        l = jnp.sum(ex, axis=-1, keepdims=True)
        p = ex / l
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
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dqkv_ref[:, :, h * dh:(h + 1) * dh] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, e + h * dh:e + (h + 1) * dh] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * e + h * dh:2 * e + (h + 1) * dh] = \
            dv.astype(dqkv_ref.dtype)


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
