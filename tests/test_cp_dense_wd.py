"""Element-wise weight dropout in the fused cp_dense path.

The kernels regenerate the dense-delta mask tile-wise from absolute (k, n)
coordinates (``hash_keep``); the reference here materializes the SAME mask
in plain jnp and applies exact reference semantics
(``src/cara/cara.py:35,57,81,92``: mask on the dense delta, shared across
the batch, scaled 1/keep) — so any fwd/bwd mask misalignment across the
three kernels (GEMM fwd, dx, factor grads) fails these tests.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cara_tpu.ops.pallas.cp_dense import (
    cp_dense_ln_wd, cp_dense_wd, hash_keep)

RATE = 0.3


def _mask(k, n, seed):
    return hash_keep(0, 0, k, n, jnp.asarray(seed, jnp.int32), RATE)


def _ref(x, w, b, u, v, cb, s, seed):
    keep = _mask(u.shape[0], v.shape[1], seed)
    d = jnp.where(keep, (u @ v) / (1.0 - RATE), 0.0)
    return x @ w + b + s * (x @ d + cb)


def _setup(m, k, n, r, key=0):
    ks = jax.random.split(jax.random.key(key), 6)
    return (jax.random.normal(ks[0], (m, k)),
            jax.random.normal(ks[1], (k, n)) * 0.05,
            jax.random.normal(ks[2], (n,)) * 0.1,
            jax.random.normal(ks[3], (k, r)) * 0.1,
            jax.random.normal(ks[4], (r, n)) * 0.1,
            jax.random.normal(ks[5], (n,)) * 0.1)


def test_mask_properties():
    seed = jnp.asarray(7, jnp.int32)
    m1 = hash_keep(0, 0, 256, 256, seed, RATE)
    # blocking-independence: the same elements from offset tiles
    m2a = hash_keep(0, 0, 128, 256, seed, RATE)
    m2b = hash_keep(128, 0, 128, 256, seed, RATE)
    np.testing.assert_array_equal(np.asarray(m1),
                                  np.concatenate([m2a, m2b], 0))
    m3a = hash_keep(0, 0, 256, 128, seed, RATE)
    m3b = hash_keep(0, 128, 256, 128, seed, RATE)
    np.testing.assert_array_equal(np.asarray(m1),
                                  np.concatenate([m3a, m3b], 1))
    # keep fraction ~ 1-rate
    frac = float(np.asarray(m1).mean())
    assert abs(frac - (1 - RATE)) < 0.01, frac
    # different seeds -> different masks
    m4 = hash_keep(0, 0, 256, 256, jnp.asarray(8, jnp.int32), RATE)
    assert np.asarray(m1 != m4).mean() > 0.2


@pytest.mark.parametrize("m,k,n", [(256, 128, 256), (200, 128, 128)])
def test_forward_matches_masked_reference(m, k, n):
    x, w, b, u, v, cb = _setup(m, k, n, 4)
    seed = jnp.asarray(12345, jnp.int32)
    out = cp_dense_wd(x, w, b, u, v, cb, seed, 1.3, RATE,
                      128, 128, 128, True)
    ref = _ref(x, w, b, u, v, cb, 1.3, 12345)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-4, rtol=1e-3)


def test_grads_match_masked_reference():
    m, k, n, r = 256, 128, 256, 4
    x, w, b, u, v, cb = _setup(m, k, n, r, key=1)
    seed = jnp.asarray(99, jnp.int32)
    s = 1.3

    def loss_fused(x, u, v, cb):
        return jnp.sum(jnp.sin(cp_dense_wd(
            x, w, b, u, v, cb, seed, s, RATE, 128, 128, 128, True)))

    def loss_ref(x, u, v, cb):
        return jnp.sum(jnp.sin(_ref(x, w, b, u, v, cb, s, 99)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, u, v, cb)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, u, v, cb)
    for name, a, b_ in zip("x u v cb".split(), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=2e-3, err_msg=name)


def test_grads_ragged_m():
    """M not a multiple of the block: zero-row padding keeps dT exact."""
    m, k, n, r = 200, 128, 128, 3
    x, w, b, u, v, cb = _setup(m, k, n, r, key=2)
    seed = jnp.asarray(5, jnp.int32)

    def loss_fused(x, u, v):
        return jnp.sum(cp_dense_wd(
            x, w, b, u, v, cb, seed, 2.0, RATE, 128, 128, 128, True))

    def loss_ref(x, u, v):
        return jnp.sum(_ref(x, w, b, u, v, cb, 2.0, 5))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, u, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, u, v)
    for name, a, b_ in zip("x u v".split(), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=2e-3, err_msg=name)


def test_ln_wd_matches_masked_reference():
    m, k, n, r = 128, 128, 256, 4
    x, w, b, u, v, cb = _setup(m, k, n, r, key=3)
    x = x * 2.0 + 0.3
    ls = 1.0 + 0.1 * jax.random.normal(jax.random.key(30), (k,))
    lb = 0.1 * jax.random.normal(jax.random.key(31), (k,))
    seed = jnp.asarray(77, jnp.int32)
    s, eps = 1.3, 1e-6

    def ln_ref(x):
        mu = jnp.mean(x, -1, keepdims=True)
        vv = jnp.var(x, -1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(vv + eps) * ls + lb

    for act_name, act_fn in (
            (None, lambda y: y),
            ("gelu", lambda y: jax.nn.gelu(y, approximate=False))):
        out = cp_dense_ln_wd(x, w, b, u, v, cb, ls, lb, seed, s, RATE,
                             64, 128, 128, True, act_name, eps)
        ref = act_fn(_ref(ln_ref(x), w, b, u, v, cb, s, 77))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-4, rtol=2e-3, err_msg=str(act_name))

        def loss_fused(x, u, v, cb):
            return jnp.sum(jnp.sin(cp_dense_ln_wd(
                x, w, b, u, v, cb, ls, lb, seed, s, RATE, 64, 128, 128,
                True, act_name, eps)))

        def loss_ref(x, u, v, cb):
            return jnp.sum(jnp.sin(act_fn(
                _ref(ln_ref(x), w, b, u, v, cb, s, 77))))

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, u, v, cb)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, u, v, cb)
        for name, a, b_ in zip("x u v cb".split(), gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1.5e-3, rtol=5e-3,
                err_msg=f"{act_name}:{name}")


def test_model_element_dropout_paths():
    """Model level: fused element-dropout path is deterministic per key,
    stochastic across keys, eval-identical to xla, and grads flow."""
    from cara_tpu.config import CaraConfig, ViTConfig
    from cara_tpu.models import cara as cara_lib, vit as vit_lib

    cfg = ViTConfig(image_size=16, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, repr_size=None, num_classes=5,
                    drop_path_rate=0.0)
    cc = CaraConfig(rank=4, scale=1.5, l_mu=1.1, l_std=0.05,
                    weight_dropout=0.3)
    assert cc.weight_dropout_impl == "element"  # the default
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara = cara_lib.init_cara_params(jax.random.key(1), cfg, cc)
    for nm in ("A2", "P2"):
        cara[nm] = 0.3 * jax.random.normal(jax.random.key(2), cara[nm].shape)
    x = jax.random.normal(jax.random.key(3), (2, 16, 16, 3))

    def f(k):
        return vit_lib.vit_forward(
            params, x, cfg, cara_params=cara, cara_cfg=cc, train=True,
            rng=jax.random.key(k), attn_impl="fused", dense_impl="fused")

    o1, o1b, o2 = f(5), f(5), f(6)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o1b))
    assert float(jnp.abs(o1 - o2).max()) > 1e-4

    ef = vit_lib.vit_forward(params, x, cfg, cara_params=cara, cara_cfg=cc,
                             attn_impl="fused", dense_impl="fused")
    ex = vit_lib.vit_forward(params, x, cfg, cara_params=cara, cara_cfg=cc,
                             attn_impl="xla", dense_impl="xla")
    np.testing.assert_allclose(np.asarray(ef), np.asarray(ex), atol=3e-4)

    def loss(c):
        o = vit_lib.vit_forward(
            params, x, cfg, cara_params=c, cara_cfg=cc, train=True,
            rng=jax.random.key(7), attn_impl="fused", dense_impl="fused")
        return (o.astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss)(cara)
    for nm in ("A2", "P2", "P3", "R1", "R2", "bias1"):
        assert float(jnp.abs(g[nm]).max()) > 0, nm


def test_element_dropout_mean_preserving():
    """Inverted-dropout scaling: averaging the fused train output over many
    seeds converges to the no-dropout output (E[mask/keep] = 1)."""
    m, k, n, r = 128, 128, 128, 4
    x, w, b, u, v, cb = _setup(m, k, n, r, key=9)
    clean = x @ w + b + 2.0 * (x @ (u @ v) + cb)
    acc = np.zeros((m, n), np.float64)
    runs = 24
    for i in range(runs):
        out = cp_dense_wd(x, w, b, u, v, cb,
                          jnp.asarray(1000 + i, jnp.int32), 2.0, RATE,
                          128, 128, 128, True)
        acc += np.asarray(out, np.float64)
    diff = np.abs(acc / runs - np.asarray(clean))
    denom = np.abs(np.asarray(clean)).mean() + 1e-6
    assert diff.mean() / denom < 0.15, diff.mean() / denom
