"""Pallas flash-attention kernel vs the XLA reference path (interpret mode on
CPU — the kernel-testing strategy from SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cara_tpu.ops.layers import mha
from cara_tpu.ops.pallas.flash_attention import flash_attention


def _qkv(key, b, h, n, d, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (b, h, n, d), dtype) for k in ks)


@pytest.mark.parametrize("n", [128, 197, 64])
def test_forward_matches_xla(n):
    b, h, d = 2, 4, 32
    q, k, v = _qkv(jax.random.key(0), b, h, n, d)
    scale = d ** -0.5
    ref = mha(q, k, v, scale)  # (B, N, H*D)
    out = flash_attention(q, k, v, scale, 4, True)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_grads_match_xla():
    b, h, n, d = 2, 3, 70, 16
    q, k, v = _qkv(jax.random.key(1), b, h, n, d)
    scale = d ** -0.5

    def loss_ref(q, k, v):
        o = mha(q, k, v, scale)
        return jnp.sum(jnp.sin(o))

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, scale, 2, True)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return jnp.sum(jnp.sin(o))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_fl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)


def test_padding_does_not_leak():
    """Keys beyond n must get exactly zero attention weight: growing n by
    padding inputs changes nothing."""
    b, h, n, d = 1, 2, 100, 16
    q, k, v = _qkv(jax.random.key(2), b, h, n, d)
    scale = d ** -0.5
    out = flash_attention(q, k, v, scale, 2, True)
    # Same computation with poisoned memory beyond n (huge values) — the mask
    # must hide it.
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, 28), (0, 0)), constant_values=7e4)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 28), (0, 0)), constant_values=7e4)
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 28), (0, 0)), constant_values=7e4)
    out2 = flash_attention(qp[:, :, :n], kp[:, :, :n], vp[:, :, :n],
                           scale, 2, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_bf16_close_to_f32():
    b, h, n, d = 2, 2, 197, 64
    q, k, v = _qkv(jax.random.key(3), b, h, n, d)
    scale = d ** -0.5
    ref = np.asarray(flash_attention(q, k, v, scale, 4, True))
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    out = np.asarray(
        flash_attention(qb, kb, vb, scale, 4, True)).astype(np.float32)
    assert np.max(np.abs(out - ref)) < 0.05
