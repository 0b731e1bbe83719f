"""Whole-transformer-block megakernel (attention half + MLP half in ONE
pallas_call) — the round-3 experiment from docs/NEXT_ROUND.md item 3.

Deletes the inter-half residual round-trip (~25 MB write + 25 MB read per
layer at ViT-B bs64): the post-attention residual ``x_mid`` lives only in
VMEM between the two halves.  EVAL-FORWARD ONLY and opt-in
(``CARA_BLOCK_PAIR=1``): a fused backward would need both halves'
recompute + factor-grad accumulators resident simultaneously, which blows
the VMEM budget that made the per-half megakernels win (docs/KERNELS.md
pitfall 7); training keeps the two-kernel path.

Reference math being fused: the full Block hot loop
``src/cara/cara.py:25-93`` (qkv+delta -> attention -> proj+delta ->
residual -> LN2 -> fc1+delta -> GELU -> fc2+delta -> residual).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cara_tpu.ops.pallas.cp_attn_block import (
    _block_b, _const, _ln3, _site_fwd, _tile)
from cara_tpu.ops.pallas.cp_dense import (
    _apply_act, _ln_rows, _pad_rank, _resolve_interpret)
from cara_tpu.ops.pallas.fused_qkv_attention import _attn_heads, _check_np


def _pair_kernel(x_ref, wq_ref, bq_ref, u1_ref, v1_ref,
                 wp_ref, bp_ref, u2_ref, v2_ref, cb2_ref, ls1_ref, lb1_ref,
                 w1_ref, b1_ref, mu1_ref, mv1_ref, mcb1_ref,
                 w2_ref, b2_ref, mu2_ref, mv2_ref, mcb2_ref,
                 ls2_ref, lb2_ref, y_ref,
                 *, heads, dh, sm_scale, n_real, s, act, ln_eps):
    x = x_ref[...]
    bb, np_, e = x.shape
    # --- attention half (cara.py:25-58 + residual) ---
    xa = _ln3(x, ls1_ref[...], lb1_ref[...], ln_eps)
    qkv, _ = _site_fwd(xa, wq_ref, bq_ref, u1_ref, v1_ref, None, s)
    o = _attn_heads(qkv.astype(xa.dtype), sm_scale, n_real, heads, dh,
                    xa.dtype)
    y1, _ = _site_fwd(o, wp_ref, bp_ref, u2_ref, v2_ref, cb2_ref, s)
    xm = (x.astype(jnp.float32) + y1).astype(x.dtype)
    # --- MLP half (cara.py:72-93 + residual) on flattened rows ---
    m = bb * np_
    x2 = xm.reshape(m, e)
    xa2 = _ln_rows(x2, ls2_ref[...], lb2_ref[...], ln_eps)
    z1 = jax.lax.dot(xa2, mu1_ref[...], preferred_element_type=jnp.float32)
    d1 = jax.lax.dot(z1.astype(xa2.dtype), mv1_ref[...],
                     preferred_element_type=jnp.float32)
    pre = (jax.lax.dot(xa2, w1_ref[...], preferred_element_type=jnp.float32)
           + b1_ref[...].astype(jnp.float32)
           + s * (d1 + mcb1_ref[...].astype(jnp.float32)))
    h = _apply_act(pre, act).astype(xa2.dtype)
    z2 = jax.lax.dot(h, mu2_ref[...], preferred_element_type=jnp.float32)
    d2 = jax.lax.dot(z2.astype(h.dtype), mv2_ref[...],
                     preferred_element_type=jnp.float32)
    y2 = (jax.lax.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
          + b2_ref[...].astype(jnp.float32)
          + s * (d2 + mcb2_ref[...].astype(jnp.float32)))
    y_ref[...] = (x2.astype(jnp.float32) + y2).astype(y_ref.dtype).reshape(
        bb, np_, e)


def block_pair_fwd(x, wq, bq, u1, v1, wp, bp, u2, v2, cb2, ls1, lb1,
                   w1, b1, mu1, mv1, mcb1, w2, b2, mu2, mv2, mcb2,
                   ls2, lb2, heads: int, sm_scale: float, n_real: int,
                   s: float, block_b: int = 2, act: str = "gelu",
                   ln_eps: float = 1e-6,
                   interpret: Optional[bool] = None):
    """Eval forward of one FULL transformer block; x (B, NP, E) with the
    token axis pre-padded to a multiple of 128.  No VJP — eval only."""
    bsz, np_, e = x.shape
    _check_np(np_)
    dh = (wq.shape[1] // 3) // heads
    hid = w1.shape[1]
    bb = _block_b(bsz, block_b)
    u1p, v1p = _pad_rank(u1, v1)
    u2p, v2p = _pad_rank(u2, v2)
    mu1p, mv1p = _pad_rank(mu1, mv1)
    mu2p, mv2p = _pad_rank(mu2, mv2)
    row = lambda a: a.reshape(1, -1)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_pair_kernel, heads=heads, dh=dh,
                          sm_scale=sm_scale, n_real=n_real, s=s, act=act,
                          ln_eps=ln_eps),
        grid=(bsz // bb,),
        in_specs=[
            _tile(bb, np_, e),
            _const((e, wq.shape[1])), _const((1, wq.shape[1])),
            _const((e, u1p.shape[1])), _const((u1p.shape[1], wq.shape[1])),
            _const((wp.shape[0], e)), _const((1, e)),
            _const((wp.shape[0], u2p.shape[1])),
            _const((u2p.shape[1], e)), _const((1, e)),
            _const((1, e)), _const((1, e)),
            _const((e, hid)), _const((1, hid)),
            _const((e, mu1p.shape[1])), _const((mu1p.shape[1], hid)),
            _const((1, hid)),
            _const((hid, e)), _const((1, e)),
            _const((hid, mu2p.shape[1])), _const((mu2p.shape[1], e)),
            _const((1, e)),
            _const((1, e)), _const((1, e)),
        ],
        out_specs=_tile(bb, np_, e),
        out_shape=jax.ShapeDtypeStruct((bsz, np_, e), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=_resolve_interpret(interpret),
    )(x, wq, row(bq), u1p, v1p, wp, row(bp), u2p, v2p, row(cb2),
      row(ls1), row(lb1), w1, row(b1), mu1p, mv1p, row(mcb1),
      w2, row(b2), mu2p, mv2p, row(mcb2), row(ls2), row(lb2))
