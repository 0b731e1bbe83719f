"""CP (Canonical-Polyadic) delta contractions — the algorithmic core of CaRA.

Reference semantics being reproduced (all citations into /root/reference):

* QKV delta: per layer, slice ``f1 = CP_A1[3l:3l+3]`` and reconstruct the 4-way
  tensor ``T[k,e,h,d] = sum_r R1[r] f1[k,r] A2[e,r] A3[h,r] A4[d,r]`` with
  ``tensorly.cp_to_tensor`` (``src/cara/cara.py:26-32``), reshape to
  ``(3, E, H*D)``, weight-dropout it, then ``einsum("bnd,kde->kbne", x, T)``
  (``cara.py:35``).
* Projection / MLP-up delta: 3-way tensor over ``CP_P1`` rows, reshaped to
  ``(rows*E, E)`` and applied as ``x @ T.T`` (``cara.py:50-57`` proj with 1 row,
  ``cara.py:72-82`` up with 4 rows).
* MLP-down delta: same 3-way tensor but applied **untransposed** as ``x @ T``
  (``cara.py:87-93`` — the transpose asymmetry noted in SURVEY.md section 7).

The reference *materializes* each dense delta every forward and pays a second
full GEMM.  The TPU-native default here is the **factorized** path: a chain of
rank-r contractions that never builds the dense tensor (the approach sketched in
the reference's dead code ``image_classification/dim_experiment.py:107-183``),
cutting the delta cost from O(E^2) to O(E*r) per token.  The materialized path
is kept for (a) exact element-wise weight-dropout semantics and (b) golden
tests.

Weight dropout:

* materialized: element-wise Bernoulli mask on the dense delta (exact reference
  semantics — mask shared across the batch, scaled 1/keep, ``cara.py:35``).
* factorized: the dense mask is not representable without materializing, so we
  drop whole rank-one CP components instead (mask over the ``r`` axis, shared
  across the batch, scaled 1/keep) — a structured weight dropout native to the
  factorized form.  Eval mode is identical for both (dropout is the identity).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def cp_to_tensor(weights: jax.Array, factors: Sequence[jax.Array]) -> jax.Array:
    """Reconstruct a dense tensor from a CP decomposition.

    Equivalent of ``tensorly.cp_to_tensor((weights, factors))`` as used at
    ``src/cara/cara.py:27,52,76,88``: ``T[i0,...,ik] = sum_r w[r] *
    prod_m factors[m][i_m, r]``.
    """
    r = weights.shape[-1]
    out = weights.reshape((1, r))  # (1, r) running Khatri-Rao product
    for f in factors:
        # out: (prod_prev, r), f: (d, r) -> (prod_prev * d, r)
        out = (out[:, None, :] * f[None, :, :]).reshape((-1, r))
    shape = tuple(f.shape[0] for f in factors)
    return jnp.sum(out, axis=-1).reshape(shape)


def weight_dropout_mask(
    rng: Optional[jax.Array], shape, rate: float, dtype=jnp.float32
) -> Optional[jax.Array]:
    """Inverted-dropout mask (scaled by 1/keep), or None when inactive."""
    if rng is None or rate <= 0.0:
        return None
    keep = 1.0 - rate
    return jax.random.bernoulli(rng, keep, shape).astype(dtype) / keep


# ---------------------------------------------------------------------------
# QKV delta (order-4 CP over [qkv-mode, embed, heads, head_dim])
# ---------------------------------------------------------------------------


def qkv_delta_materialized(
    x: jax.Array,           # (B, N, E)
    f1: jax.Array,          # (3, r)  = CP_A1[3l:3l+3]
    a2: jax.Array,          # (E, r)
    a3: jax.Array,          # (H, r)
    a4: jax.Array,          # (Dh, r)
    r1: jax.Array,          # (r,)
    drop_mask: Optional[jax.Array] = None,  # (3, E, H*Dh) element mask
) -> jax.Array:
    """Exact reference math (``cara.py:26-38``): returns (B, N, 3, H, Dh)."""
    t = cp_to_tensor(r1, (f1, a2, a3, a4))      # (3, E, H, Dh)
    k, e, h, d = t.shape
    t = t.reshape(k, e, h * d)
    if drop_mask is not None:
        t = t * drop_mask
    delta = jnp.einsum("bne,keo->bnko", x, t)    # (B, N, 3, H*Dh)
    b, n = x.shape[:2]
    return delta.reshape(b, n, k, h, d)


def qkv_delta_factorized(
    x: jax.Array,           # (B, N, E)
    f1: jax.Array,          # (3, r)
    a2: jax.Array,          # (E, r)
    a3: jax.Array,          # (H, r)
    a4: jax.Array,          # (Dh, r)
    r1: jax.Array,          # (r,)
    comp_mask: Optional[jax.Array] = None,  # (r,) rank-component mask
) -> jax.Array:
    """Rank-space chain, never materializes (3,E,E): returns (B, N, 3, H, Dh).

    ``y[b,n,k,h,d] = sum_r (x @ a2)[b,n,r] * (r1*f1)[k,r] * a3[h,r] * a4[d,r]``

    Structured as two MXU GEMMs: the token-independent factor product is
    collapsed into one (r, 3*E) matrix (O(E*r) work) so the per-token cost is
    ``x @ a2`` then ``z @ M`` — clean large matmuls, no 5-D intermediates.
    """
    lam = r1 if comp_mask is None else r1 * comp_mask
    b, n, e = x.shape
    k, r = f1.shape
    h, d = a3.shape[0], a4.shape[0]
    z = x @ a2                                             # (B, N, r)
    # M[r, (k,h,d)] = lam*f1[k,r] * a3[h,r] * a4[d,r]
    m = ((f1 * lam[None, :])[:, None, None, :]
         * a3[None, :, None, :] * a4[None, None, :, :])    # (3, H, Dh, r)
    m = m.reshape(k * h * d, r).T                          # (r, 3E)
    return (z @ m).reshape(b, n, k, h, d)


# ---------------------------------------------------------------------------
# 3-way deltas over CP_P* (attention projection, MLP up, MLP down)
# ---------------------------------------------------------------------------


def rows_delta_out_materialized(
    x: jax.Array,           # (B, N, E)
    p1: jax.Array,          # (rows, r) slice of CP_P1
    p2: jax.Array,          # (E, r)
    p3: jax.Array,          # (E, r)
    r2: jax.Array,          # (r,)
    drop_mask: Optional[jax.Array] = None,  # (rows*E, E)
) -> jax.Array:
    """``x @ dropout(T).T`` with ``T = cp(r2,(p1,p2,p3)).reshape(rows*E, E)``.

    Reference: proj delta rows=1 (``cara.py:51-57``), MLP-up rows=4
    (``cara.py:72-81``).  Output (B, N, rows*E).
    """
    t = cp_to_tensor(r2, (p1, p2, p3))          # (rows, E, E)
    rows, e2, e3 = t.shape
    t = t.reshape(rows * e2, e3)
    if drop_mask is not None:
        t = t * drop_mask
    return jnp.einsum("bne,oe->bno", x, t)


def rows_delta_out_factorized(
    x: jax.Array,           # (B, N, E)
    p1: jax.Array,          # (rows, r)
    p2: jax.Array,          # (E, r)
    p3: jax.Array,          # (E, r)
    r2: jax.Array,          # (r,)
    comp_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Factorized ``x @ T.T``: contract x with the p3 mode. (B, N, rows*E).

    Two GEMMs: ``z = x @ p3`` then ``z @ M`` with the (rows, E) output modes
    collapsed into one token-independent (r, rows*E) matrix.
    """
    lam = r2 if comp_mask is None else r2 * comp_mask
    b, n = x.shape[:2]
    rows, r = p1.shape
    e = p2.shape[0]
    z = x @ p3                                             # contract p3 mode
    m = ((p1 * lam[None, :])[:, None, :] * p2[None, :, :])  # (rows, E, r)
    m = m.reshape(rows * e, r).T                            # (r, rows*E)
    return (z @ m).reshape(b, n, rows * e)


def rows_delta_in_materialized(
    x: jax.Array,           # (B, N, rows*E)
    p1: jax.Array,          # (rows, r)
    p2: jax.Array,          # (E, r)
    p3: jax.Array,          # (E, r)
    r2: jax.Array,          # (r,)
    drop_mask: Optional[jax.Array] = None,  # (rows*E, E)
) -> jax.Array:
    """``x @ dropout(T)`` (untransposed) — the MLP-down path (``cara.py:87-93``).

    Output (B, N, E).
    """
    t = cp_to_tensor(r2, (p1, p2, p3))
    rows, e2, e3 = t.shape
    t = t.reshape(rows * e2, e3)
    if drop_mask is not None:
        t = t * drop_mask
    return jnp.einsum("bni,ie->bne", x, t)


def rows_delta_in_factorized(
    x: jax.Array,           # (B, N, rows*E)
    p1: jax.Array,          # (rows, r)
    p2: jax.Array,          # (E, r)
    p3: jax.Array,          # (E, r)
    r2: jax.Array,          # (r,)
    comp_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Factorized ``x @ T``: contract x's (rows, p2) modes, emit p3 mode.

    Two GEMMs: the (rows, E) input modes collapse into one (rows*E, r)
    matrix, then ``(x @ M * lam) @ p3.T``.
    """
    lam = r2 if comp_mask is None else r2 * comp_mask
    b, n = x.shape[:2]
    rows, r = p1.shape
    e2 = p2.shape[0]
    m = (p1[:, None, :] * p2[None, :, :]).reshape(rows * e2, r)
    z = x @ m                                               # (B, N, r)
    return (z * lam[None, None, :]) @ p3.T
