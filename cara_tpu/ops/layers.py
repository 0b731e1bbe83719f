"""Basic functional NN layers (LayerNorm, dropout, drop-path, attention).

These replace the torch/timm L0 substrate of the reference (SURVEY.md section
1) with pure-JAX primitives that XLA fuses into surrounding matmuls.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-6):
    """LayerNorm over the last axis (timm ViT uses eps=1e-6).

    Statistics in fp32 for bf16 inputs; f64 inputs stay f64 (the torch
    gradient-parity tests run the whole forward in double precision)."""
    x32 = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def dropout(x: jax.Array, rate: float, rng: Optional[jax.Array]):
    """Inverted dropout; identity when rate==0 or rng is None (eval)."""
    if rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def drop_path(x: jax.Array, rate, rng: Optional[jax.Array]):
    """Stochastic depth (timm DropPath): per-sample binary gate, scaled 1/keep.

    The reference trains with ``drop_path_rate=0.1`` (``vit_cp.py:155``), which
    timm spreads linearly over depth.  ``rate`` may be a traced scalar (it is a
    per-layer ``lax.scan`` input), so gating is arithmetic, not a python if.
    """
    if rng is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    # When rate==0 this is exactly x (mask==1, keep==1).  Cast keep to x's
    # dtype so a traced f32 rate cannot promote a bf16 residual stream.
    return x * mask / jnp.asarray(keep, x.dtype)


def mha(
    q: jax.Array,  # (B, H, N, Dh)
    k: jax.Array,
    v: jax.Array,
    scale: float,
    attn_drop_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    key_bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference attention math (``src/cara/cara.py:44-48``): returns (B, N, E).

    Softmax statistics in fp32 for TPU numerical safety even under bf16 inputs.
    ``key_bias``: optional additive pre-softmax bias broadcastable to
    (B, H, N, N), applied in fp32 — e.g. ToMe's proportional-attention
    ``log(token_size)`` term (models/tome.py).  ``None`` leaves the math
    bit-identical to the unbiased path.
    """
    b, h, n, d = q.shape
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    attn = attn.astype(jnp.promote_types(q.dtype, jnp.float32))
    if key_bias is not None:
        attn = attn + key_bias.astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    attn = dropout(attn, attn_drop_rate, rng)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    return out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
