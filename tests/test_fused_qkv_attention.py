"""Layout-native fused qkv attention kernel vs the XLA path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.ops.layers import mha
from cara_tpu.ops.pallas.fused_qkv_attention import fused_qkv_attention


def _ref_from_qkv(qkv, heads, scale, n_real):
    b, np_, e3 = qkv.shape
    e = e3 // 3
    dh = e // heads
    t = qkv[:, :n_real].reshape(b, n_real, 3, heads, dh)
    q, k, v = (t[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    return mha(q, k, v, scale)  # (B, n_real, E)


@pytest.mark.parametrize("n_real", [256, 197])
def test_forward_matches(n_real):
    b, heads, np_, dh = 3, 4, 256, 16
    e = heads * dh
    qkv = jax.random.normal(jax.random.key(0), (b, np_, 3 * e))
    if n_real < np_:
        qkv = qkv.at[:, n_real:].set(1e3)  # poison the padding
    out = fused_qkv_attention(qkv, heads, dh ** -0.5, n_real, 2, True)
    ref = _ref_from_qkv(qkv, heads, dh ** -0.5, n_real)
    np.testing.assert_allclose(
        np.asarray(out[:, :n_real]), np.asarray(ref), atol=2e-5)


def test_grads_match():
    b, heads, np_, dh = 2, 3, 128, 8
    n_real = 100
    e = heads * dh
    qkv = jax.random.normal(jax.random.key(1), (b, np_, 3 * e))

    def loss_fused(qkv):
        o = fused_qkv_attention(qkv, heads, dh ** -0.5, n_real, 2, True)
        return jnp.sum(jnp.sin(o[:, :n_real]))

    def loss_ref(qkv):
        return jnp.sum(jnp.sin(_ref_from_qkv(qkv, heads, dh ** -0.5, n_real)))

    g_f = jax.grad(loss_fused)(qkv)
    g_r = jax.grad(loss_ref)(qkv)
    # Padded-row gradients must be exactly zero in the reference (those rows
    # aren't read); the kernel must agree on the real region.
    np.testing.assert_allclose(
        np.asarray(g_f[:, :n_real]), np.asarray(g_r[:, :n_real]), atol=3e-5)
    # Gradients w.r.t. padded kv rows must be zero (no leakage).
    np.testing.assert_allclose(np.asarray(g_f[:, n_real:]), 0.0, atol=1e-6)


def test_model_fused_matches_xla():
    """End-to-end: vit_forward(attn_impl='fused') == 'xla' (interpret)."""
    cfg = ViTConfig(
        image_size=16, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        repr_size=None, num_classes=5, drop_path_rate=0.0)
    cara_cfg = CaraConfig(rank=4, l_mu=1.1, l_std=0.05)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara_params = cara_lib.init_cara_params(jax.random.key(1), cfg, cara_cfg)
    cara_params["A2"] = 0.05 * jax.random.normal(
        jax.random.key(2), cara_params["A2"].shape)
    x = jax.random.normal(jax.random.key(3), (2, 16, 16, 3))
    a = vit_lib.vit_forward(params, x, cfg, cara_params=cara_params,
                            cara_cfg=cara_cfg, attn_impl="xla")
    f = vit_lib.vit_forward(params, x, cfg, cara_params=cara_params,
                            cara_cfg=cara_cfg, attn_impl="fused")
    np.testing.assert_allclose(np.asarray(a), np.asarray(f), atol=2e-4)


def test_attention_proj_fusion_matches_composition():
    """fused_qkv_attention_proj == attention -> x@W+b + s((x@U)V + cb),
    values AND grads (u, v, biases, qkv) — interpret mode."""
    from cara_tpu.ops.pallas.fused_qkv_attention import (
        fused_qkv_attention, fused_qkv_attention_proj)

    heads, dh, np_, n_real = 4, 32, 256, 197
    e = heads * dh
    r = 5
    ks = jax.random.split(jax.random.key(11), 7)
    qkv = jax.random.normal(ks[0], (2, np_, 3 * e)) * 0.5
    w = jax.random.normal(ks[1], (e, e)) * 0.05
    b = jax.random.normal(ks[2], (e,)) * 0.1
    u = jax.random.normal(ks[3], (e, r)) * 0.1
    v = jax.random.normal(ks[4], (r, e)) * 0.1
    cb = jax.random.normal(ks[5], (e,)) * 0.1
    s = 1.7
    scale = dh ** -0.5

    def ref(qkv, w, b, u, v, cb):
        o = fused_qkv_attention(qkv, heads, scale, n_real, 2, True)
        return o @ w + b + s * ((o @ u) @ v + cb)

    def fused(qkv, w, b, u, v, cb):
        return fused_qkv_attention_proj(qkv, w, b, u, v, cb, heads, scale,
                                        n_real, s, 2, True)

    got = fused(qkv, w, b, u, v, cb)
    want = ref(qkv, w, b, u, v, cb)
    np.testing.assert_allclose(np.asarray(got[:, :n_real]),
                               np.asarray(want[:, :n_real]),
                               atol=3e-4, rtol=1e-3)

    def loss(f):
        return lambda *a: jnp.sum(jnp.sin(f(*a)[:, :n_real]))

    gf = jax.grad(loss(fused), argnums=(0, 1, 2, 3, 4, 5))(
        qkv, w, b, u, v, cb)
    gr = jax.grad(loss(ref), argnums=(0, 1, 2, 3, 4, 5))(
        qkv, w, b, u, v, cb)
    names = ["qkv", "w", "b", "u", "v", "cb"]
    for name, a, bb in zip(names, gf, gr):
        if name == "w":
            # frozen by construction in the fused kernel
            np.testing.assert_array_equal(np.asarray(a), 0.0)
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-3, rtol=5e-3, err_msg=name)


def test_model_attnproj_on_off_same_logits(monkeypatch):
    """The CARA_ATTNPROJ fusion flag must not change model outputs."""
    import cara_tpu.models.vit as vit_mod

    cfg = ViTConfig(
        image_size=16, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        repr_size=None, num_classes=5, drop_path_rate=0.0)
    cara_cfg = CaraConfig(rank=4, l_mu=1.1, l_std=0.05)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara_params = cara_lib.init_cara_params(jax.random.key(1), cfg, cara_cfg)
    for nm in ("A2", "P2", "bias1"):
        cara_params[nm] = 0.05 * jax.random.normal(
            jax.random.key(7), cara_params[nm].shape)
    x = jax.random.normal(jax.random.key(3), (2, 16, 16, 3))

    monkeypatch.setattr(vit_mod, "_ATTNPROJ", True)
    on = vit_lib.vit_forward(params, x, cfg, cara_params=cara_params,
                             cara_cfg=cara_cfg, attn_impl="fused",
                             dense_impl="fused")
    monkeypatch.setattr(vit_mod, "_ATTNPROJ", False)
    off = vit_lib.vit_forward(params, x, cfg, cara_params=cara_params,
                              cara_cfg=cara_cfg, attn_impl="fused",
                              dense_impl="fused")
    np.testing.assert_allclose(np.asarray(on), np.asarray(off), atol=3e-4)
