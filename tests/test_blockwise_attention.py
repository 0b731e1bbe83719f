"""Blockwise (flash-style) layout-native attention vs the reference mha,
interpret mode — N=1024 with key-axis tiling, padded-token masking, grads."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cara_tpu.ops.layers import mha
from cara_tpu.ops.pallas.blockwise_attention import blockwise_qkv_attention
from cara_tpu.ops.pallas.fused_qkv_attention import (
    MAX_NP_FULL_SCORES, fused_qkv_attention)


def _ref_from_qkv(qkv, heads, scale, n_real):
    """mha on the valid tokens of a (B, NP, 3E) fused-qkv activation."""
    b, np_, e3 = qkv.shape
    e = e3 // 3
    dh = e // heads
    x = qkv[:, :n_real, :].reshape(b, n_real, 3, heads, dh)
    q, k, v = (x[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    return mha(q, k, v, scale)


@pytest.mark.parametrize("np_,n_real,bq,bk", [
    (1024, 1024, 512, 512),   # the VERDICT-prescribed long-context case
    (1024, 1000, 256, 512),   # padded keys masked across blocks
    (256, 197, 128, 128),     # ViT-sized, ragged
])
def test_forward_matches_mha(np_, n_real, bq, bk):
    heads, dh = 4, 32
    e = heads * dh
    qkv = jax.random.normal(jax.random.key(0), (2, np_, 3 * e),
                            jnp.float32)
    out = blockwise_qkv_attention(qkv, heads, dh ** -0.5, n_real, 1,
                                  bq, bk, True)
    ref = _ref_from_qkv(qkv, heads, dh ** -0.5, n_real)
    np.testing.assert_allclose(np.asarray(out[:, :n_real]), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_matches_full_score_kernel():
    """Same interface, same numbers as the default kernel at ViT scale."""
    heads, dh, np_, n_real = 4, 32, 256, 197
    e = heads * dh
    qkv = jax.random.normal(jax.random.key(1), (2, np_, 3 * e))
    a = blockwise_qkv_attention(qkv, heads, dh ** -0.5, n_real,
                                1, 128, 128, True)
    b = fused_qkv_attention(qkv, heads, dh ** -0.5, n_real, 2, True)
    np.testing.assert_allclose(np.asarray(a[:, :n_real]),
                               np.asarray(b[:, :n_real]),
                               atol=2e-4, rtol=1e-3)


def test_grads_match_mha():
    heads, dh, np_, n_real = 4, 32, 512, 450
    e = heads * dh
    qkv = jax.random.normal(jax.random.key(2), (2, np_, 3 * e))

    def loss_blk(qkv):
        o = blockwise_qkv_attention(qkv, heads, dh ** -0.5, n_real,
                                    1, 256, 256, True)
        return jnp.sum(jnp.sin(o[:, :n_real]))

    def loss_ref(qkv):
        return jnp.sum(jnp.sin(_ref_from_qkv(qkv, heads, dh ** -0.5,
                                             n_real)))

    ga = jax.grad(loss_blk)(qkv)
    gr = jax.grad(loss_ref)(qkv)
    # Padded-token rows must receive zero cotangent (nothing leaks).
    np.testing.assert_array_equal(np.asarray(ga[:, n_real:]), 0.0)
    np.testing.assert_allclose(np.asarray(ga[:, :n_real]),
                               np.asarray(gr[:, :n_real]),
                               atol=5e-4, rtol=2e-3)


def test_full_score_kernel_refuses_long_context():
    heads, dh = 4, 32
    e = heads * dh
    np_ = MAX_NP_FULL_SCORES + 128
    qkv = jnp.zeros((1, np_, 3 * e))
    with pytest.raises(ValueError, match="blockwise_qkv_attention"):
        fused_qkv_attention(qkv, heads, dh ** -0.5, np_, 1, True)


def test_model_long_sequence_dispatches_blockwise():
    """A >512-token model runs through the fused path end-to-end (the
    full-score kernel alone would refuse) and matches the xla path."""
    from cara_tpu.config import ViTConfig
    from cara_tpu.models import vit as vit_lib

    cfg = ViTConfig(image_size=192, patch_size=8, embed_dim=64, depth=1,
                    num_heads=4, repr_size=None, num_classes=5,
                    drop_path_rate=0.0)
    assert cfg.seq_len == 577  # pads to 640 > MAX_NP_FULL_SCORES
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (1, 192, 192, 3))
    a = vit_lib.vit_forward(params, x, cfg, attn_impl="fused")
    b = vit_lib.vit_forward(params, x, cfg, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-3, rtol=1e-2)
