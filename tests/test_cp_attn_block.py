"""Attention block megakernel (LN1 -> qkv+delta -> attention -> proj+delta
in one pallas_call): fwd/bwd vs the composed reference, token padding, and
element-wise weight dropout."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cara_tpu.ops.pallas.cp_attn_block import cp_attn_block, cp_attn_block_wd
from cara_tpu.ops.pallas.cp_dense import hash_keep

EPS = 1e-6
HEADS = 4
E = 128
DH = E // HEADS
NP_ = 128
SM = DH ** -0.5


def _ln(x, ls, lb):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + EPS) * ls + lb


def _attn_ref(qkv, n_real):
    b, np_, _ = qkv.shape
    q, k, v = (qkv[..., i * E:(i + 1) * E].reshape(b, np_, HEADS, DH)
               .transpose(0, 2, 1, 3) for i in range(3))
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * SM
    mask = jnp.arange(np_)[None, None, None, :] < n_real
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    return o.transpose(0, 2, 1, 3).reshape(b, np_, E)


def _ref(p, s, n_real):
    xa = _ln(p["x"], p["ls"], p["lb"])
    qkv = xa @ p["wq"] + p["bq"] + s * ((xa @ p["u1"]) @ p["v1"])
    o = _attn_ref(qkv, n_real)
    y = o @ p["wp"] + p["bp"] + s * ((o @ p["u2"]) @ p["v2"] + p["cb2"])
    return p["x"] + p["dpm"][:, :, None] * y  # fused residual + drop-path


def _setup(b, r, key=0):
    ks = jax.random.split(jax.random.key(key), 12)
    return dict(
        x=jax.random.normal(ks[0], (b, NP_, E)) * 1.2 + 0.1,
        wq=jax.random.normal(ks[1], (E, 3 * E)) * 0.08,
        bq=jax.random.normal(ks[2], (3 * E,)) * 0.05,
        u1=jax.random.normal(ks[3], (E, r)) * 0.1,
        v1=jax.random.normal(ks[4], (r, 3 * E)) * 0.1,
        wp=jax.random.normal(ks[5], (E, E)) * 0.08,
        bp=jax.random.normal(ks[6], (E,)) * 0.05,
        u2=jax.random.normal(ks[7], (E, r)) * 0.1,
        v2=jax.random.normal(ks[8], (r, E)) * 0.1,
        cb2=jax.random.normal(ks[9], (E,)) * 0.1,
        ls=1.0 + 0.1 * jax.random.normal(ks[10], (E,)),
        lb=0.05 + 0.0 * jax.random.normal(ks[11], (E,)),
        # Nontrivial per-sample drop-path gate (0 or 1/keep).
        dpm=jax.random.bernoulli(
            jax.random.key(key + 100), 0.75, (b, 1)).astype(jnp.float32)
        / 0.75,
    )


def _call(p, s, n_real, block_b=2):
    return cp_attn_block(
        p["x"], p["wq"], p["bq"], p["u1"], p["v1"], p["wp"], p["bp"],
        p["u2"], p["v2"], p["cb2"], p["ls"], p["lb"], p["dpm"],
        HEADS, SM, n_real, s, block_b, True, EPS)


@pytest.mark.parametrize("n_real", [NP_, 100])  # 100: padded key masking
def test_forward_matches(n_real):
    p = _setup(4, 5)
    out = _call(p, 1.3, n_real)
    ref = _ref(p, 1.3, n_real)
    np.testing.assert_allclose(np.asarray(out[:, :n_real]),
                               np.asarray(ref[:, :n_real]),
                               atol=1e-3, rtol=5e-3)


GRAD_ARGS = ("x", "u1", "v1", "u2", "v2", "cb2", "bq", "bp")


@pytest.mark.parametrize("n_real", [NP_, 100])
def test_grads_match(n_real):
    p = _setup(4, 4, key=2)
    s = 1.3

    def loss_fused(*args):
        q = dict(p, **dict(zip(GRAD_ARGS, args)))
        return jnp.sum(jnp.sin(_call(q, s, n_real)[:, :n_real]))

    def loss_ref(*args):
        q = dict(p, **dict(zip(GRAD_ARGS, args)))
        return jnp.sum(jnp.sin(_ref(q, s, n_real)[:, :n_real]))

    args = tuple(p[k] for k in GRAD_ARGS)
    idx = tuple(range(len(GRAD_ARGS)))
    gf = jax.grad(loss_fused, argnums=idx)(*args)
    gr = jax.grad(loss_ref, argnums=idx)(*args)
    for name, a, b in zip(GRAD_ARGS, gf, gr):
        if name == "x" and n_real < NP_:
            a = a[:, :n_real]
            b = b[:, :n_real]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-2, err_msg=name)


@pytest.mark.parametrize("n", [100, 120])
def test_unpadded_input_matches_ref(n):
    """Raw UNPADDED x (B, n, E), n not a lane multiple: the kernel rounds
    the token BlockSpec up internally (clipped DMA + in-register tail
    zeroing), so the result must equal the dense reference computed
    directly on the n-token input — fwd and grads (VERDICT r4 next 2)."""
    p = _setup(4, 5, key=6)
    p = dict(p, x=p["x"][:, :n])
    s = 1.3
    out = _call(p, s, n)
    assert out.shape == p["x"].shape
    ref = _ref(p, s, n)  # np_ == n -> mask is a no-op; pure dense math
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=5e-3)

    def loss_fused(*args):
        q = dict(p, **dict(zip(GRAD_ARGS, args)))
        return jnp.sum(jnp.sin(_call(q, s, n)))

    def loss_ref(*args):
        q = dict(p, **dict(zip(GRAD_ARGS, args)))
        return jnp.sum(jnp.sin(_ref(q, s, n)))

    args = tuple(p[k] for k in GRAD_ARGS)
    idx = tuple(range(len(GRAD_ARGS)))
    gf = jax.grad(loss_fused, argnums=idx)(*args)
    gr = jax.grad(loss_ref, argnums=idx)(*args)
    for name, a, b in zip(GRAD_ARGS, gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-2, err_msg=name)


def test_unpadded_input_matches_ref_wd():
    """Unpadded input through the element-weight-dropout variant."""
    n = 100
    p = _setup(2, 4, key=7)
    p = dict(p, x=p["x"][:, :n])
    out = _call_wd(p, 1.3, n, 11, 22)
    assert out.shape == p["x"].shape
    ref = _ref_wd(p, 1.3, n, 11, 22)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=5e-3)


def test_frozen_cotangents_zero():
    p = _setup(2, 3, key=3)

    def loss(wq, wp, ls, lb):
        q = dict(p, wq=wq, wp=wp, ls=ls, lb=lb)
        return jnp.sum(_call(q, 1.1, NP_))

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(
        p["wq"], p["wp"], p["ls"], p["lb"])
    for name, a in zip("wq wp ls lb".split(), g):
        np.testing.assert_array_equal(np.asarray(a), 0.0, err_msg=name)


RATE = 0.3


def _masked(w, u, v, s, seed):
    keep = hash_keep(0, 0, u.shape[0], v.shape[1],
                     jnp.asarray(seed, jnp.int32), RATE)
    return w + s * jnp.where(keep, (u @ v) / (1.0 - RATE), 0.0)


def _ref_wd(p, s, n_real, seed1, seed2):
    xa = _ln(p["x"], p["ls"], p["lb"])
    qkv = xa @ _masked(p["wq"], p["u1"], p["v1"], s, seed1) + p["bq"]
    o = _attn_ref(qkv, n_real)
    y = (o @ _masked(p["wp"], p["u2"], p["v2"], s, seed2)
         + p["bp"] + s * p["cb2"])
    return p["x"] + p["dpm"][:, :, None] * y


def _call_wd(p, s, n_real, seed1, seed2):
    return cp_attn_block_wd(
        p["x"], p["wq"], p["bq"], p["u1"], p["v1"], p["wp"], p["bp"],
        p["u2"], p["v2"], p["cb2"], p["ls"], p["lb"], p["dpm"],
        jnp.asarray(seed1, jnp.int32), jnp.asarray(seed2, jnp.int32),
        HEADS, SM, n_real, s, RATE, 2, True, EPS)


@pytest.mark.parametrize("n_real", [NP_, 100])
def test_wd_forward_matches(n_real):
    p = _setup(2, 4, key=4)
    out = _call_wd(p, 1.3, n_real, 11, 22)
    ref = _ref_wd(p, 1.3, n_real, 11, 22)
    np.testing.assert_allclose(np.asarray(out[:, :n_real]),
                               np.asarray(ref[:, :n_real]),
                               atol=1e-3, rtol=5e-3)


def test_wd_grads_match():
    p = _setup(2, 4, key=5)
    s, n_real = 1.3, 100

    def loss_fused(*args):
        q = dict(p, **dict(zip(GRAD_ARGS, args)))
        return jnp.sum(jnp.sin(_call_wd(q, s, n_real, 7, 8)[:, :n_real]))

    def loss_ref(*args):
        q = dict(p, **dict(zip(GRAD_ARGS, args)))
        return jnp.sum(jnp.sin(_ref_wd(q, s, n_real, 7, 8)[:, :n_real]))

    args = tuple(p[k] for k in GRAD_ARGS)
    idx = tuple(range(len(GRAD_ARGS)))
    gf = jax.grad(loss_fused, argnums=idx)(*args)
    gr = jax.grad(loss_ref, argnums=idx)(*args)
    for name, a, b in zip(GRAD_ARGS, gf, gr):
        if name == "x":
            a, b = a[:, :n_real], b[:, :n_real]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-2, err_msg=name)


def test_model_attn_megakernel_matches_split():
    """vit_forward with the attention megakernel == the split fused path,
    eval + train (rank and element dropout), fwd + grads."""
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
            old = vit_lib._ATTN_MEGA
            vit_lib._ATTN_MEGA = mega
            try:
                return vit_lib.vit_forward(
                    params, x, cfg, cara_params=c, cara_cfg=cc,
                    train=train, rng=jax.random.key(7) if train else None,
                    attn_impl="fused", dense_impl="fused")
            finally:
                vit_lib._ATTN_MEGA = old

        np.testing.assert_allclose(np.asarray(fwd(True)),
                                   np.asarray(fwd(False)), atol=3e-4,
                                   err_msg=f"eval:{impl}")
        np.testing.assert_allclose(
            np.asarray(fwd(True, train=True)),
            np.asarray(fwd(False, train=True)), atol=3e-4,
            err_msg=f"train:{impl}")

        def loss(c, mega):
            return (fwd(mega, train=True, c=c).astype(jnp.float32)
                    ** 2).mean()

        gm = jax.grad(loss)(cara, True)
        gt = jax.grad(loss)(cara, False)
        for nm in ("A2", "A3", "R1", "P2", "P3", "R2", "bias1"):
            np.testing.assert_allclose(
                np.asarray(gm[nm]), np.asarray(gt[nm]), atol=3e-4,
                rtol=5e-3, err_msg=f"grad:{impl}:{nm}")


def test_model_droppath_fused_matches_split():
    """Nonzero drop_path_rate: the megakernels' fused per-sample gate draws
    the same bernoulli mask as ops.layers.drop_path, so train outputs match
    the split path exactly."""
    from cara_tpu.config import CaraConfig, ViTConfig
    from cara_tpu.models import cara as cara_lib, vit as vit_lib

    cfg = ViTConfig(image_size=16, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, repr_size=None, num_classes=5,
                    drop_path_rate=0.5)
    cc = CaraConfig(rank=4, scale=1.5, l_mu=1.1, l_std=0.05,
                    weight_dropout=0.0)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara = cara_lib.init_cara_params(jax.random.key(1), cfg, cc)
    for nm in ("A2", "P2"):
        cara[nm] = 0.3 * jax.random.normal(jax.random.key(2), cara[nm].shape)
    x = jax.random.normal(jax.random.key(3), (4, 16, 16, 3))

    def fwd(attn_mega, mlp_mega):
        old = vit_lib._ATTN_MEGA, vit_lib._MLP_MEGA
        vit_lib._ATTN_MEGA, vit_lib._MLP_MEGA = attn_mega, mlp_mega
        try:
            return vit_lib.vit_forward(
                params, x, cfg, cara_params=cara, cara_cfg=cc, train=True,
                rng=jax.random.key(11), attn_impl="fused",
                dense_impl="fused")
        finally:
            vit_lib._ATTN_MEGA, vit_lib._MLP_MEGA = old

    both = fwd(True, True)
    split = fwd(False, False)
    np.testing.assert_allclose(np.asarray(both), np.asarray(split),
                               atol=3e-4)
    # The gate actually fires at rate 0.5 on some layer/sample: train
    # differs from eval.
    ev = vit_lib.vit_forward(params, x, cfg, cara_params=cara, cara_cfg=cc,
                             attn_impl="fused", dense_impl="fused")
    assert float(jnp.abs(both - ev).max()) > 1e-4


def test_plain_backbone_megakernels_match_xla():
    """No-adapter (plain / merged-weight) forward through the megakernels
    (zero CP factors) == the XLA path — the serving configuration."""
    from cara_tpu.config import ViTConfig
    from cara_tpu.models import vit as vit_lib

    cfg = ViTConfig(image_size=16, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, repr_size=None, num_classes=5,
                    drop_path_rate=0.0)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(3), (2, 16, 16, 3))
    ref = vit_lib.vit_forward(params, x, cfg, attn_impl="xla",
                              dense_impl="xla")
    fused = vit_lib.vit_forward(params, x, cfg, attn_impl="fused",
                                dense_impl="fused")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused),
                               atol=3e-4)
