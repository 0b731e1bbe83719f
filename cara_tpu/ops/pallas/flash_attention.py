"""Fused multi-head attention (flash-style) Pallas TPU kernel, fwd + bwd.

Why: the XLA attention path materializes the (B, H, N, N) score tensor in
fp32 to HBM three-plus times per layer (scores, softmax, weighted sum) —
~120MB/layer at B=64, N=197 — and that HBM traffic, not FLOPs, dominates the
ViT block on TPU.  This kernel keeps the whole (N, N) score tile in VMEM:
one HBM read of q/k/v, one HBM write of the output, softmax statistics in
fp32 on-chip.

Design (ViT regime: N is a few hundred, head_dim 64):

* Sequences are padded to a multiple of 128 (N=197 -> 256); padded *columns*
  are masked with a large negative constant before the row-max, so their
  softmax weight underflows to exactly 0.  Padded *rows* compute garbage that
  the caller slices away (their upstream cosine gradient is zero-padded, so
  nothing leaks into dk/dv in the backward).
* The grid batches G (batch*head) pairs per program so MXU work per program
  amortizes grid overhead; all matmuls run batched via dot_general.
* Backward recomputes the score tile (flash-style) instead of saving it:
  residuals are just q, k, v.

The blockwise structure means longer sequences are a tile-count change, not a
new algorithm (SURVEY.md section 5 "long-context" note).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_real):
    q = q_ref[...]  # (G, NP, D)
    k = k_ref[...]
    v = v_ref[...]
    np_ = q.shape[1]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (G, NP, NP)
    if n_real < np_:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
        s = jnp.where(col < n_real, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(q.dtype)
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = o.astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     *, scale, n_real):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]
    np_ = q.shape[1]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    if n_real < np_:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
        s = jnp.where(col < n_real, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / l  # fp32 softmax probabilities, masked cols exactly 0

    pb = p.astype(q.dtype)
    # dV = P^T dO   (batched over G)
    dv = jax.lax.dot_general(
        pb, do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dP = dO V^T
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dS = P * (dP - rowsum(dP * P))
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = (p * (dp - row)).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _pad_seq(x, np_):
    n = x.shape[2]
    if n == np_:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, np_ - n), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, scale: float, block_g: int = 8,
                    interpret: Optional[bool] = None):
    """(B, H, N, Dh) q/k/v -> (B, H, N, Dh) attention output.

    ``interpret=None`` auto-selects interpreter mode off-TPU (CPU tests).
    """
    out, _ = _fwd(q, k, v, scale, block_g, interpret)
    return out


def _resolve_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _fwd(q, k, v, scale, block_g, interpret):
    b, h, n, d = q.shape
    np_ = _ceil_to(n, 128)
    qp, kp, vp = (_pad_seq(t, np_).reshape(b * h, np_, d) for t in (q, k, v))
    g = b * h
    bg = min(block_g, g)
    while g % bg:
        bg -= 1
    spec = pl.BlockSpec((bg, np_, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, scale=scale, n_real=n),
        grid=(g // bg,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((g, np_, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_resolve_interpret(interpret),
    )(qp, kp, vp)
    out = out.reshape(b, h, np_, d)[:, :, :n]
    return out, (q, k, v)


def _fwd_rule(q, k, v, scale, block_g, interpret):
    return _fwd(q, k, v, scale, block_g, interpret)


def _bwd_rule(scale, block_g, interpret, res, g_out):
    q, k, v = res
    b, h, n, d = q.shape
    np_ = _ceil_to(n, 128)
    qp, kp, vp = (_pad_seq(t, np_).reshape(b * h, np_, d) for t in (q, k, v))
    dop = _pad_seq(g_out, np_).reshape(b * h, np_, d)
    g = b * h
    bg = min(block_g, g)
    while g % bg:
        bg -= 1
    spec = pl.BlockSpec((bg, np_, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, n_real=n),
        grid=(g // bg,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((g, np_, d), q.dtype) for _ in range(3)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_resolve_interpret(interpret),
    )(qp, kp, vp, dop)
    unpad = lambda t: t.reshape(b, h, np_, d)[:, :, :n]
    return unpad(dq), unpad(dk), unpad(dv)


flash_attention.defvjp(_fwd_rule, _bwd_rule)
