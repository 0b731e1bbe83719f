"""MLP block megakernel (LN -> fc1+delta -> GELU -> fc2+delta in one
pallas_call): fwd/bwd vs the composed XLA reference, ragged M, element-wise
weight dropout, and model-level equivalence with the two-kernel fused path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cara_tpu.ops.pallas.cp_dense import hash_keep
from cara_tpu.ops.pallas.cp_mlp import cp_mlp_block, cp_mlp_block_wd

EPS = 1e-6


def _ln(x, ls, lb):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + EPS) * ls + lb


def _site(x, w, b, u, v, cb, s):
    return x @ w + b + s * ((x @ u) @ v + cb)


def _ref(x, p, s, act="gelu"):
    xa = _ln(x, p["ls"], p["lb"])
    pre = _site(xa, p["w1"], p["b1"], p["u1"], p["v1"], p["cb1"], s)
    if act == "gelu":
        h = jax.nn.gelu(pre, approximate=False)
    elif act == "quick_gelu":
        h = pre * jax.nn.sigmoid(1.702 * pre)
    else:
        h = pre
    y = _site(h, p["w2"], p["b2"], p["u2"], p["v2"], p["cb2"], s)
    return x + p["dpm"] * y  # fused residual + drop-path gate


def _setup(m, k, n1, r, key=0):
    ks = jax.random.split(jax.random.key(key), 12)
    return dict(
        x=jax.random.normal(ks[0], (m, k)) * 1.5 + 0.2,
        w1=jax.random.normal(ks[1], (k, n1)) * 0.05,
        b1=jax.random.normal(ks[2], (n1,)) * 0.1,
        u1=jax.random.normal(ks[3], (k, r)) * 0.1,
        v1=jax.random.normal(ks[4], (r, n1)) * 0.1,
        cb1=jax.random.normal(ks[5], (n1,)) * 0.1,
        w2=jax.random.normal(ks[6], (n1, k)) * 0.05,
        b2=jax.random.normal(ks[7], (k,)) * 0.1,
        u2=jax.random.normal(ks[8], (n1, r)) * 0.1,
        v2=jax.random.normal(ks[9], (r, k)) * 0.1,
        cb2=jax.random.normal(ks[10], (k,)) * 0.1,
        ls=1.0 + 0.1 * jax.random.normal(ks[11], (k,)),
        lb=jnp.zeros((k,)) + 0.05,
        # Nontrivial per-row drop-path gate (0 or 1/keep) exercises the
        # fused residual in every test.
        dpm=jax.random.bernoulli(
            jax.random.key(key + 100), 0.8, (m, 1)).astype(jnp.float32)
        / 0.8,
    )


def _call(p, s, act="gelu", bm=64):
    return cp_mlp_block(
        p["x"], p["w1"], p["b1"], p["u1"], p["v1"], p["cb1"],
        p["w2"], p["b2"], p["u2"], p["v2"], p["cb2"], p["ls"], p["lb"],
        p["dpm"], s, bm, True, act, EPS)


@pytest.mark.parametrize("m", [128, 200])  # 200: ragged, padded M
@pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
def test_forward_matches(m, act):
    p = _setup(m, 128, 256, 5)
    out = _call(p, 1.3, act)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(p["x"], p, 1.3, act)),
        atol=5e-4, rtol=2e-3)


def test_leading_dims():
    p = _setup(6 * 32, 128, 256, 4, key=1)
    x3 = p["x"].reshape(6, 32, 128)
    out = cp_mlp_block(
        x3, p["w1"], p["b1"], p["u1"], p["v1"], p["cb1"],
        p["w2"], p["b2"], p["u2"], p["v2"], p["cb2"], p["ls"], p["lb"],
        p["dpm"].reshape(6, 32, 1), 2.0, 64, True)
    assert out.shape == (6, 32, 128)
    np.testing.assert_allclose(
        np.asarray(out.reshape(-1, 128)),
        np.asarray(_ref(p["x"], p, 2.0)), atol=5e-4, rtol=2e-3)


GRAD_ARGS = ("x", "u1", "v1", "cb1", "u2", "v2", "cb2", "b1", "b2")


@pytest.mark.parametrize("m", [128, 200])
def test_grads_match(m):
    p = _setup(m, 128, 256, 4, key=2)
    s = 1.3

    def loss_fused(*args):
        q = dict(p, **dict(zip(GRAD_ARGS, args)))
        return jnp.sum(jnp.sin(_call(q, s)))

    def loss_ref(*args):
        q = dict(p, **dict(zip(GRAD_ARGS, args)))
        return jnp.sum(jnp.sin(_ref(q["x"], q, s)))

    args = tuple(p[k] for k in GRAD_ARGS)
    idx = tuple(range(len(GRAD_ARGS)))
    gf = jax.grad(loss_fused, argnums=idx)(*args)
    gr = jax.grad(loss_ref, argnums=idx)(*args)
    for name, a, b in zip(GRAD_ARGS, gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=5e-3, err_msg=name)


def test_frozen_cotangents_zero():
    p = _setup(64, 128, 128, 3, key=3)

    def loss(w1, w2, ls, lb):
        q = dict(p, w1=w1, w2=w2, ls=ls, lb=lb)
        return jnp.sum(_call(q, 1.1))

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(
        p["w1"], p["w2"], p["ls"], p["lb"])
    for name, a in zip("w1 w2 ls lb".split(), g):
        np.testing.assert_array_equal(np.asarray(a), 0.0, err_msg=name)


RATE = 0.3


def _masked(w, u, v, s, seed):
    keep = hash_keep(0, 0, u.shape[0], v.shape[1],
                     jnp.asarray(seed, jnp.int32), RATE)
    return w + s * jnp.where(keep, (u @ v) / (1.0 - RATE), 0.0)


def _ref_wd(x, p, s, seed1, seed2, act="gelu"):
    xa = _ln(x, p["ls"], p["lb"])
    w1p = _masked(p["w1"], p["u1"], p["v1"], s, seed1)
    pre = xa @ w1p + p["b1"] + s * p["cb1"]
    h = jax.nn.gelu(pre, approximate=False) if act == "gelu" else pre
    w2p = _masked(p["w2"], p["u2"], p["v2"], s, seed2)
    return x + p["dpm"] * (h @ w2p + p["b2"] + s * p["cb2"])


def _call_wd(p, s, seed1, seed2, bm=64):
    return cp_mlp_block_wd(
        p["x"], p["w1"], p["b1"], p["u1"], p["v1"], p["cb1"],
        p["w2"], p["b2"], p["u2"], p["v2"], p["cb2"], p["ls"], p["lb"],
        p["dpm"], jnp.asarray(seed1, jnp.int32),
        jnp.asarray(seed2, jnp.int32), s, RATE, bm, True, "gelu", EPS)


@pytest.mark.parametrize("m", [128, 200])
def test_wd_forward_matches(m):
    p = _setup(m, 128, 256, 4, key=4)
    out = _call_wd(p, 1.3, 11, 22)
    ref = _ref_wd(p["x"], p, 1.3, 11, 22)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=2e-3)


@pytest.mark.parametrize("m", [128, 200])
def test_wd_grads_match(m):
    p = _setup(m, 128, 256, 4, key=5)
    s = 1.3

    def loss_fused(*args):
        q = dict(p, **dict(zip(GRAD_ARGS, args)))
        return jnp.sum(jnp.sin(_call_wd(q, s, 7, 8)))

    def loss_ref(*args):
        q = dict(p, **dict(zip(GRAD_ARGS, args)))
        return jnp.sum(jnp.sin(_ref_wd(q["x"], q, s, 7, 8)))

    args = tuple(p[k] for k in GRAD_ARGS)
    idx = tuple(range(len(GRAD_ARGS)))
    gf = jax.grad(loss_fused, argnums=idx)(*args)
    gr = jax.grad(loss_ref, argnums=idx)(*args)
    for name, a, b in zip(GRAD_ARGS, gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1.5e-3, rtol=5e-3, err_msg=name)


def test_model_megakernel_matches_two_kernel():
    """vit_forward with the megakernel == the two-kernel fused path ==
    the XLA path, eval and train (rank + element dropout), fwd + grads."""
    from cara_tpu.config import CaraConfig, ViTConfig
    from cara_tpu.models import cara as cara_lib, vit as vit_lib

    cfg = ViTConfig(image_size=16, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, repr_size=None, num_classes=5,
                    drop_path_rate=0.0)
    x = jax.random.normal(jax.random.key(3), (2, 16, 16, 3))
    for impl in ("element", "rank"):
        cc = CaraConfig(rank=4, scale=1.5, l_mu=1.1, l_std=0.05,
                        weight_dropout=0.3, weight_dropout_impl=impl)
        params = vit_lib.init_vit_params(jax.random.key(0), cfg)
        cara = cara_lib.init_cara_params(jax.random.key(1), cfg, cc)
        for nm in ("A2", "P2"):
            cara[nm] = 0.3 * jax.random.normal(jax.random.key(2),
                                               cara[nm].shape)

        def fwd(mega, train=False, c=cara, cc=cc):
            old = vit_lib._MLP_MEGA
            vit_lib._MLP_MEGA = mega
            try:
                return vit_lib.vit_forward(
                    params, x, cfg, cara_params=c, cara_cfg=cc,
                    train=train, rng=jax.random.key(7) if train else None,
                    attn_impl="fused", dense_impl="fused")
            finally:
                vit_lib._MLP_MEGA = old

        np.testing.assert_allclose(np.asarray(fwd(True)),
                                   np.asarray(fwd(False)), atol=3e-4,
                                   err_msg=f"eval:{impl}")
        # train: same rng => same masks => same output either path
        np.testing.assert_allclose(
            np.asarray(fwd(True, train=True)),
            np.asarray(fwd(False, train=True)), atol=3e-4,
            err_msg=f"train:{impl}")

        def loss(c, mega):
            return (fwd(mega, train=True, c=c).astype(jnp.float32)
                    ** 2).mean()

        gm = jax.grad(loss)(cara, True)
        gt = jax.grad(loss)(cara, False)
        for nm in ("P2", "P3", "R2", "bias2", "bias3"):
            np.testing.assert_allclose(
                np.asarray(gm[nm]), np.asarray(gt[nm]), atol=2e-4,
                rtol=5e-3, err_msg=f"grad:{impl}:{nm}")
