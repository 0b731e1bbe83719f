"""Fused CP-dense kernel: forward/backward vs the XLA factorized path
(interpret mode), ragged M, and the end-to-end fused-dense model path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.ops.pallas.cp_dense import cp_dense


def _ref(x, w, b, u, v, cb, s):
    return x @ w + b + s * ((x @ u) @ v + cb)


@pytest.mark.parametrize("m", [256, 200])  # 200: ragged last tile
def test_forward_matches(m):
    k, n, r = 128, 256, 5
    ks = jax.random.split(jax.random.key(0), 6)
    x = jax.random.normal(ks[0], (m, k))
    w = jax.random.normal(ks[1], (k, n)) * 0.05
    b = jax.random.normal(ks[2], (n,))
    u = jax.random.normal(ks[3], (k, r)) * 0.1
    v = jax.random.normal(ks[4], (r, n)) * 0.1
    cb = jax.random.normal(ks[5], (n,))
    out = cp_dense(x, w, b, u, v, cb, 1.7, 128, 128, 128, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(x, w, b, u, v, cb, 1.7)),
        atol=2e-4, rtol=1e-4)


def test_leading_dims():
    b_, n_, k, n, r = 2, 100, 128, 128, 3
    ks = jax.random.split(jax.random.key(1), 6)
    x = jax.random.normal(ks[0], (b_, n_, k))
    w = jax.random.normal(ks[1], (k, n)) * 0.05
    bias = jnp.zeros((n,))
    u = jax.random.normal(ks[3], (k, r)) * 0.1
    v = jax.random.normal(ks[4], (r, n)) * 0.1
    cb = jnp.zeros((n,))
    out = cp_dense(x, w, bias, u, v, cb, 2.0, 64, 128, 128, True)
    assert out.shape == (b_, n_, n)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(x, w, bias, u, v, cb, 2.0)),
        atol=2e-4, rtol=1e-4)


def test_grads_match():
    m, k, n, r = 128, 128, 256, 4
    ks = jax.random.split(jax.random.key(2), 6)
    x = jax.random.normal(ks[0], (m, k))
    w = jax.random.normal(ks[1], (k, n)) * 0.05
    b = jax.random.normal(ks[2], (n,)) * 0.1
    u = jax.random.normal(ks[3], (k, r)) * 0.1
    v = jax.random.normal(ks[4], (r, n)) * 0.1
    cb = jax.random.normal(ks[5], (n,)) * 0.1
    s = 1.3

    def loss_fused(x, u, v, cb):
        return jnp.sum(jnp.sin(cp_dense(x, w, b, u, v, cb, s,
                                        64, 128, 64, True)))

    def loss_ref(x, u, v, cb):
        return jnp.sum(jnp.sin(_ref(x, w, b, u, v, cb, s)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, u, v, cb)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, u, v, cb)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-4, rtol=1e-3)


def test_model_fused_dense_matches_xla():
    cfg = ViTConfig(
        image_size=16, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        repr_size=None, num_classes=5, drop_path_rate=0.0)
    cara_cfg = CaraConfig(rank=4, scale=1.5, l_mu=1.1, l_std=0.05)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara_params = cara_lib.init_cara_params(jax.random.key(1), cfg, cara_cfg)
    for name in ("A2", "P2", "bias1", "bias2", "bias3"):
        cara_params[name] = 0.05 * jax.random.normal(
            jax.random.key(hash(name) % 100), cara_params[name].shape)
    x = jax.random.normal(jax.random.key(3), (2, 16, 16, 3))
    ref = vit_lib.vit_forward(params, x, cfg, cara_params=cara_params,
                              cara_cfg=cara_cfg, attn_impl="xla",
                              dense_impl="xla")
    fused = vit_lib.vit_forward(params, x, cfg, cara_params=cara_params,
                                cara_cfg=cara_cfg, attn_impl="fused",
                                dense_impl="fused")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused), atol=3e-4)


def test_uv_helpers_match_delta():
    """qkv_uv / rows_*_uv collapse must reproduce the factorized deltas."""
    model = ViTConfig(image_size=16, patch_size=8, embed_dim=48, depth=2,
                      num_heads=4, repr_size=None, num_classes=5)
    for order in (3, 4, 5):
        cara_cfg = CaraConfig(rank=5, cp_order=order, l_mu=1.2, l_std=0.1)
        p = cara_lib.init_cara_params(jax.random.key(0), model, cara_cfg)
        zero = {5: "A3", 4: "A2", 3: "A2"}[order]
        p[zero] = jax.random.normal(jax.random.key(9), p[zero].shape)
        rows = cara_lib.qkv_rows_per_layer(order)
        f1 = p["A1"][:rows]
        x = jax.random.normal(jax.random.key(1), (2, 4, 48))
        ref = cara_lib.qkv_delta(x, p, f1, model, cara_cfg,
                                 materialized=True)
        u, v = cara_lib.qkv_uv(p, f1, model, cara_cfg)
        got = ((x @ u) @ v).reshape(2, 4, 3, 4, 12)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=1e-5)


def test_act_epilogue_matches():
    m, k, n, r = 128, 128, 256, 4
    ks = jax.random.split(jax.random.key(4), 6)
    x = jax.random.normal(ks[0], (m, k))
    w = jax.random.normal(ks[1], (k, n)) * 0.05
    b = jax.random.normal(ks[2], (n,)) * 0.1
    u = jax.random.normal(ks[3], (k, r)) * 0.1
    v = jax.random.normal(ks[4], (r, n)) * 0.1
    cb = jax.random.normal(ks[5], (n,)) * 0.1
    s = 1.3
    for act_name, act_fn in (
            ("gelu", lambda y: jax.nn.gelu(y, approximate=False)),
            ("quick_gelu", lambda y: y * jax.nn.sigmoid(1.702 * y))):
        out = cp_dense(x, w, b, u, v, cb, s, 64, 128, 64, True, act_name)
        ref = act_fn(_ref(x, w, b, u, v, cb, s))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-4, rtol=1e-3)

        def loss_fused(x, u, v, cb):
            return jnp.sum(jnp.sin(cp_dense(
                x, w, b, u, v, cb, s, 64, 128, 64, True, act_name)))

        def loss_ref(x, u, v, cb):
            return jnp.sum(jnp.sin(act_fn(_ref(x, w, b, u, v, cb, s))))

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, u, v, cb)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, u, v, cb)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=5e-4, rtol=2e-3)


def test_ln_prologue_matches():
    """cp_dense_ln == LayerNorm -> cp_dense -> act reference, fwd + grads."""
    from cara_tpu.ops.pallas.cp_dense import cp_dense_ln

    m, k, n, r = 128, 128, 256, 4
    ks = jax.random.split(jax.random.key(6), 8)
    x = jax.random.normal(ks[0], (m, k)) * 2.0 + 0.3
    w = jax.random.normal(ks[1], (k, n)) * 0.05
    b = jax.random.normal(ks[2], (n,)) * 0.1
    u = jax.random.normal(ks[3], (k, r)) * 0.1
    v = jax.random.normal(ks[4], (r, n)) * 0.1
    cb = jax.random.normal(ks[5], (n,)) * 0.1
    ls = 1.0 + 0.1 * jax.random.normal(ks[6], (k,))
    lb = 0.1 * jax.random.normal(ks[7], (k,))
    s, eps = 1.3, 1e-6

    def ln_ref(x):
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.var(x, -1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * ls + lb

    for act_name, act_fn in (
            (None, lambda y: y),
            ("gelu", lambda y: jax.nn.gelu(y, approximate=False))):
        out = cp_dense_ln(x, w, b, u, v, cb, ls, lb, s,
                          64, 128, 128, True, act_name, eps)
        ref = act_fn(_ref(ln_ref(x), w, b, u, v, cb, s))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-4, rtol=2e-3)

        def loss_fused(x, u, v, cb, ls, lb):
            return jnp.sum(jnp.sin(cp_dense_ln(
                x, w, b, u, v, cb, ls, lb, s, 64, 128, 128, True,
                act_name, eps)))

        def loss_ref(x, u, v, cb, ls, lb):
            mu = jnp.mean(x, -1, keepdims=True)
            var = jnp.var(x, -1, keepdims=True)
            xn = (x - mu) * jax.lax.rsqrt(var + eps) * ls + lb
            return jnp.sum(jnp.sin(act_fn(_ref(xn, w, b, u, v, cb, s))))

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
            x, u, v, cb, ls, lb)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
            x, u, v, cb, ls, lb)
        for name, a, b_ in zip("x u v cb".split(), gf[:4], gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-3, rtol=5e-3,
                err_msg=f"{act_name}:{name}")
        # LN params are frozen in CaRA: the kernel returns explicit zero
        # cotangents instead of paying the dls/dlb reduction passes.
        np.testing.assert_array_equal(np.asarray(gf[4]), 0.0)
        np.testing.assert_array_equal(np.asarray(gf[5]), 0.0)


def test_ln_prologue_wide_k():
    """K=2048 > the 1536 default block: the LN-fused backward must override
    the dx block size BEFORE building specs (round-2 ADVICE fix — shapes
    silently diverged for K > 1536)."""
    from cara_tpu.ops.pallas.cp_dense import cp_dense_ln

    m, k, n, r = 64, 2048, 128, 3
    ks = jax.random.split(jax.random.key(9), 8)
    x = jax.random.normal(ks[0], (m, k))
    w = jax.random.normal(ks[1], (k, n)) * 0.02
    b = jnp.zeros((n,))
    u = jax.random.normal(ks[3], (k, r)) * 0.05
    v = jax.random.normal(ks[4], (r, n)) * 0.05
    cb = jnp.zeros((n,))
    ls = jnp.ones((k,))
    lb = jnp.zeros((k,))
    s, eps = 1.1, 1e-6

    def ln_ref(x):
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.var(x, -1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * ls + lb

    def loss_fused(x, u, v):
        return jnp.sum(jnp.sin(cp_dense_ln(
            x, w, b, u, v, cb, ls, lb, s, 64, 128, 768, True, None, eps)))

    def loss_ref(x, u, v):
        return jnp.sum(jnp.sin(_ref(ln_ref(x), w, b, u, v, cb, s)))

    out = cp_dense_ln(x, w, b, u, v, cb, ls, lb, s, 64, 128, 768, True,
                      None, eps)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(ln_ref(x), w, b, u, v, cb, s)),
        atol=5e-4, rtol=2e-3)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, u, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, u, v)
    for name, a, b_ in zip("x u v".split(), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-3, rtol=5e-3, err_msg=name)
