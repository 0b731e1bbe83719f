"""Key-axis-tiled (flash-style) attention in the layout-native interface.

Same contract as :mod:`fused_qkv_attention` — consumes the fused-qkv GEMM
output (B, NP, 3E) with the (3, heads, head_dim) lane flattening, returns
(B, NP, E) — but tiles the KEY axis with an online softmax, so VMEM usage is
O(bq*bk) per head instead of O(NP^2): long context becomes a tile-count
property (SURVEY.md section 5 design intent), not a VMEM ceiling.

The non-tiled kernel stays the default at ViT scale (N=256/384 — measured
faster, no inter-block bookkeeping); this variant engages automatically when
the full-score kernel would blow VMEM (``fused_qkv_attention`` asserts and
points here).

Blocking: three views of the SAME qkv array via lane-axis BlockSpec offsets
(block index 0/1/2 of an E-wide lane block = the q/k/v thirds) — no gather,
no relayout.  Backward is the standard two-kernel flash split (dq by query
tiles, dk/dv by key tiles) against the forward's saved per-row LSE plus the
delta ``D = rowsum(do * o)`` computed in XLA from the saved output.

Reference being replaced: torch softmax attention ``src/cara/cara.py:44-48``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128  # per-head row stats are lane-padded to this


def _resolve_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                acc_ref, m_ref, l_ref, *, scale, n_real, heads, dh, bk, nk):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[...]            # (bb, bq, E)
    k = k_ref[...]            # (bb, bk, E)
    v = v_ref[...]
    bb, bq = q.shape[0], q.shape[1]
    col = kk * bk + jax.lax.broadcasted_iota(
        jnp.int32, (bb, bq, bk), dimension=2)
    for h in range(heads):
        qh = q[:, :, h * dh:(h + 1) * dh]
        kh = k[:, :, h * dh:(h + 1) * dh]
        vh = v[:, :, h * dh:(h + 1) * dh]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        s = jnp.where(col < n_real, s, NEG_INF)
        m_prev = m_ref[:, :, h][..., None]                    # (bb, bq, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)                        # (bb, bq, 1)
        l_ref[:, :, h] = (l_ref[:, :, h] * corr[..., 0]
                          + jnp.sum(p, axis=-1))
        m_ref[:, :, h] = m_new[..., 0]
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        acc_ref[:, :, h * dh:(h + 1) * dh] = (
            acc_ref[:, :, h * dh:(h + 1) * dh] * corr + pv)

    @pl.when(kk == nk - 1)
    def _finish():
        for h in range(heads):
            l = l_ref[:, :, h][..., None]
            l = jnp.where(l == 0.0, 1.0, l)  # fully-masked (padded q) rows
            o_ref[:, :, h * dh:(h + 1) * dh] = (
                acc_ref[:, :, h * dh:(h + 1) * dh] / l).astype(o_ref.dtype)
        lse_ref[...] = (m_ref[...]
                        + jnp.log(jnp.maximum(l_ref[...], 1e-30))).astype(
                            lse_ref.dtype)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, dq_ref,
               acc_ref, *, scale, n_real, heads, dh, bk, nk):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]
    bb, bq = q.shape[0], q.shape[1]
    col = kk * bk + jax.lax.broadcasted_iota(
        jnp.int32, (bb, bq, bk), dimension=2)
    for h in range(heads):
        qh = q[:, :, h * dh:(h + 1) * dh]
        kh = k[:, :, h * dh:(h + 1) * dh]
        vh = v[:, :, h * dh:(h + 1) * dh]
        doh = do[:, :, h * dh:(h + 1) * dh]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        s = jnp.where(col < n_real, s, NEG_INF)
        p = jnp.exp(s - lse_ref[:, :, h][..., None])
        dp = jax.lax.dot_general(
            doh, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - dd_ref[:, :, h][..., None])).astype(q_ref.dtype)
        dq = jax.lax.dot_general(
            ds, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        acc_ref[:, :, h * dh:(h + 1) * dh] += dq

    @pl.when(kk == nk - 1)
    def _finish():
        dq_ref[...] = acc_ref[...].astype(dq_ref.dtype)


def _dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, dd_ref,
                dk_ref, dv_ref, dk_acc, dv_acc,
                *, scale, n_real, heads, dh, bk, nq):
    jj = pl.program_id(2)  # query-block index (inner)

    @pl.when(jj == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    k = k_ref[...]            # (bb, bk, E) — this key block
    v = v_ref[...]
    q = q_ref[...]            # (bb, bq, E) — streaming query block
    do = do_ref[...]
    bb, bq = q.shape[0], q.shape[1]
    kk = pl.program_id(1)     # key-block index (parallel)
    col = kk * bk + jax.lax.broadcasted_iota(
        jnp.int32, (bb, bq, bk), dimension=2)
    for h in range(heads):
        qh = q[:, :, h * dh:(h + 1) * dh]
        kh = k[:, :, h * dh:(h + 1) * dh]
        vh = v[:, :, h * dh:(h + 1) * dh]
        doh = do[:, :, h * dh:(h + 1) * dh]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        s = jnp.where(col < n_real, s, NEG_INF)
        p = jnp.exp(s - lse_ref[:, :, h][..., None])     # (bb, bq, bk)
        pb = p.astype(k_ref.dtype)
        # dv[k, :] += p^T @ do
        dv_acc[:, :, h * dh:(h + 1) * dh] += jax.lax.dot_general(
            pb, doh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            doh, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - dd_ref[:, :, h][..., None])).astype(k_ref.dtype)
        # dk[k, :] += ds^T @ q * scale
        dk_acc[:, :, h * dh:(h + 1) * dh] += jax.lax.dot_general(
            ds, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale

    @pl.when(jj == nq - 1)
    def _finish():
        dk_ref[...] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_acc[...].astype(dv_ref.dtype)


def _qkv_views(np_, e, bb, bq, bk):
    """Three lane-offset views of one (B, NP, 3E) array: q rows by query
    block, k/v rows by key block."""
    q_spec = pl.BlockSpec((bb, bq, e), lambda i, j, kk: (i, j, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((bb, bk, e), lambda i, j, kk: (i, kk, 1),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((bb, bk, e), lambda i, j, kk: (i, kk, 2),
                          memory_space=pltpu.VMEM)
    return q_spec, k_spec, v_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7))
def blockwise_qkv_attention(qkv, heads: int, scale: float, n_real: int,
                            block_b: int = 1, block_q: int = 512,
                            block_k: int = 512, interpret=None):
    """Flash-style attention on the (B, NP, 3E) fused-qkv layout.

    NP must be a multiple of 128 (pad tokens once before the qkv GEMM, as
    with ``fused_qkv_attention``); ``n_real`` masks padded keys.
    """
    out, _ = _fwd(qkv, heads, scale, n_real, block_b, block_q, block_k,
                  interpret)
    return out


def _blocks(np_, b, block_b, block_q, block_k):
    bb = max(1, min(block_b, b))
    while b % bb:
        bb -= 1
    bq = min(block_q, np_)
    while np_ % bq:
        bq -= 128
    bk = min(block_k, np_)
    while np_ % bk:
        bk -= 128
    return bb, bq, bk


def _fwd(qkv, heads, scale, n_real, block_b, block_q, block_k, interpret):
    b, np_, e3 = qkv.shape
    e = e3 // 3
    dh = e // heads
    if np_ % 128:
        raise ValueError(f"NP must be a multiple of 128, got {np_}")
    if heads > LANES:
        raise ValueError(f"heads={heads} > {LANES} not supported")
    bb, bq, bk = _blocks(np_, b, block_b, block_q, block_k)
    nk = np_ // bk
    q_spec, k_spec, v_spec = _qkv_views(np_, e, bb, bq, bk)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_real=n_real,
                          heads=heads, dh=dh, bk=bk, nk=nk),
        grid=(b // bb, np_ // bq, nk),
        in_specs=[q_spec, k_spec, v_spec],
        out_specs=(
            pl.BlockSpec((bb, bq, e), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, bq, LANES), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, np_, e), qkv.dtype),
            jax.ShapeDtypeStruct((b, np_, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bb, bq, e), jnp.float32),
            pltpu.VMEM((bb, bq, LANES), jnp.float32),
            pltpu.VMEM((bb, bq, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_resolve_interpret(interpret),
    )(qkv, qkv, qkv)
    return out, (qkv, out, lse)


def _fwd_rule(qkv, heads, scale, n_real, block_b, block_q, block_k,
              interpret):
    return _fwd(qkv, heads, scale, n_real, block_b, block_q, block_k,
                interpret)


def _bwd_rule(heads, scale, n_real, block_b, block_q, block_k, interpret,
              res, g):
    qkv, out, lse = res
    b, np_, e3 = qkv.shape
    e = e3 // 3
    dh = e // heads
    bb, bq, bk = _blocks(np_, b, block_b, block_q, block_k)
    nk, nq = np_ // bk, np_ // bq
    # D = per-head rowsum(do * o), lane-padded to LANES.
    dd = jnp.sum(
        (g.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
            b, np_, heads, dh), axis=-1)
    dd = jnp.pad(dd, ((0, 0), (0, 0), (0, LANES - heads)))
    q_spec, k_spec, v_spec = _qkv_views(np_, e, bb, bq, bk)
    do_q = pl.BlockSpec((bb, bq, e), lambda i, j, kk: (i, j, 0),
                        memory_space=pltpu.VMEM)
    stat_q = pl.BlockSpec((bb, bq, LANES), lambda i, j, kk: (i, j, 0),
                          memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, n_real=n_real,
                          heads=heads, dh=dh, bk=bk, nk=nk),
        grid=(b // bb, nq, nk),
        in_specs=[q_spec, k_spec, v_spec, do_q, stat_q, stat_q],
        out_specs=pl.BlockSpec((bb, bq, e), lambda i, j, kk: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, np_, e), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((bb, bq, e), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_resolve_interpret(interpret),
    )(qkv, qkv, qkv, g, lse, dd)

    # dk/dv: key blocks parallel, query blocks streamed.
    k_spec2 = pl.BlockSpec((bb, bk, e), lambda i, kk, j: (i, kk, 1),
                           memory_space=pltpu.VMEM)
    v_spec2 = pl.BlockSpec((bb, bk, e), lambda i, kk, j: (i, kk, 2),
                           memory_space=pltpu.VMEM)
    q_spec2 = pl.BlockSpec((bb, bq, e), lambda i, kk, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    do_q2 = pl.BlockSpec((bb, bq, e), lambda i, kk, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    stat_q2 = pl.BlockSpec((bb, bq, LANES), lambda i, kk, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, n_real=n_real,
                          heads=heads, dh=dh, bk=bk, nq=nq),
        grid=(b // bb, nk, nq),
        in_specs=[k_spec2, v_spec2, q_spec2, do_q2, stat_q2, stat_q2],
        out_specs=(
            pl.BlockSpec((bb, bk, e), lambda i, kk, j: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, bk, e), lambda i, kk, j: (i, kk, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, np_, e), qkv.dtype),
            jax.ShapeDtypeStruct((b, np_, e), qkv.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bb, bk, e), jnp.float32),
            pltpu.VMEM((bb, bk, e), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_resolve_interpret(interpret),
    )(qkv, qkv, qkv, g, lse, dd)
    return (jnp.concatenate([dq, dk, dv], axis=-1),)


blockwise_qkv_attention.defvjp(_fwd_rule, _bwd_rule)
