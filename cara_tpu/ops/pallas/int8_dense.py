"""Dequant-fused int8 GEMM: ``y = (x @ Wq) * scale + b`` in one kernel.

The XLA weight-only path (``vit.matk``) lowers the int8->bf16 convert as a
separate pass at matvec-like shapes, losing the point of quantization
(measured: batch-1 serving 0.76 ms int8 vs 0.67 bf16).  Here the int8
weight tile is converted in VMEM registers right before the MXU dot, so
the weight stream from HBM is genuinely half the bytes — the win for
weight-bound (small-batch serving) shapes.

Inference-only: no VJP (serving path; training never sees quant weights).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cara_tpu.ops.pallas.cp_dense import _fit_block, _resolve_interpret


def _int8_dense_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, acc_ref, *, nk):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # int8 tile -> compute dtype in VMEM; HBM only ever carried int8.
    acc_ref[...] += jax.lax.dot(
        x_ref[...], w_ref[...].astype(x_ref.dtype),
        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == nk - 1)
    def _finish():
        y = (acc_ref[...] * s_ref[...].astype(jnp.float32)
             + b_ref[...].astype(jnp.float32))
        o_ref[...] = y.astype(o_ref.dtype)


def int8_dense(x, wq, scale, b, bm: Optional[int] = None,
               bn: Optional[int] = None, bk: Optional[int] = None,
               interpret: Optional[bool] = None):
    """``(x @ wq) * scale + b``; x (..., K) float, wq (K, N) int8,
    scale (1, N) or (N,), b (N,).

    Block sizes default from ``CARA_INT8_BM/BN/BK`` (tuning knobs for the
    serving sweep) falling back to 256/1536/768."""
    import os

    bm = bm or int(os.environ.get("CARA_INT8_BM", "256"))
    bn = bn or int(os.environ.get("CARA_INT8_BN", "1536"))
    bk = bk or int(os.environ.get("CARA_INT8_BK", "768"))
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = wq.shape[1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    bn = _fit_block(n, bn)
    bk = _fit_block(k, bk)
    nk = k // bk
    out = pl.pallas_call(
        functools.partial(_int8_dense_kernel, nk=nk),
        grid=(pl.cdiv(m, bm), n // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=96 * 2 ** 20),
        interpret=_resolve_interpret(interpret),
    )(x2, wq, scale.reshape(1, n), b.reshape(1, n))
    return out.reshape(*lead, n)
