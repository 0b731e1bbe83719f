"""Row-structured weight dropout (``--weight-dropout-impl row``).

The claim (config.CaraConfig docs; VERDICT r3 item 4b): dropping whole
input-rows of each site's effective (in, out) dense delta is
expectation-equivalent to the reference's element-wise regularizer —
identical mean and identical per-entry marginal variance, only the
within-row covariance differs — and it runs on the fast non-wd kernels
via the identity ``(m 1^T) o (U V^T) == (diag(m) U) V^T`` (no dense
cotangent dT in the backward).

Wiring claim tested here: the fused path masks U's rows while the XLA
path masks the delta input's features, from the SAME key — the two are
the same Bernoulli draw, so fused and XLA training must realize the
IDENTICAL regularized step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cara_tpu import api
from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.ops import cp as cp_ops
from cara_tpu.train import steps as steps_lib


@pytest.fixture(scope="module")
def setup():
    cfg = ViTConfig(
        image_size=16, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        repr_size=None, num_classes=4, drop_path_rate=0.0)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara = None

    def make_cara(impl):
        cc = CaraConfig(rank=4, scale=1.5, l_mu=1.0, l_std=0.0,
                        weight_dropout=0.3, weight_dropout_impl=impl)
        cara = cara_lib.init_cara_params(jax.random.key(1), cfg, cc)
        for name in ("A2", "P2", "bias1", "bias2", "bias3"):
            cara[name] = 0.1 * jax.random.normal(
                jax.random.fold_in(jax.random.key(2), hash(name) % 1000),
                cara[name].shape)
        return cc, cara

    return cfg, params, make_cara


def _batch(cfg, n=8):
    kx, ky = jax.random.split(jax.random.key(5))
    return {"image": jax.random.normal(
                kx, (n, cfg.image_size, cfg.image_size, 3)),
            "label": jax.random.randint(ky, (n,), 0, cfg.num_classes)}


def test_row_mask_moments():
    """Inverted row mask: E[m]=1 and per-entry delta variance matches the
    element regularizer's p/(1-p) * (UV^T)^2 marginal (p = drop rate)."""
    rate, n_draws = 0.3, 4000
    keys = jax.random.split(jax.random.key(0), n_draws)
    masks = jax.vmap(lambda k: cp_ops.weight_dropout_mask(
        k, (16,), rate))(keys)  # (n_draws, 16)
    m = np.asarray(masks)
    np.testing.assert_allclose(m.mean(axis=0), 1.0, atol=0.06)
    # Per-entry variance of m is p/(1-p) for inverted Bernoulli(1-p)/(1-p)
    # — identical to the element mask's, so var[(m_k u_k v_n)] matches
    # element dropout entry-wise.
    want = rate / (1 - rate)
    np.testing.assert_allclose(m.var(axis=0), want, rtol=0.15)


def test_row_fused_equals_xla(setup):
    """Fused (diag(m) U) V^T == XLA (x o m) @ UV^T — same key, same draw:
    the two paths realize the identical regularized train step."""
    cfg, params, make_cara = setup
    cc, cara = make_cara("row")
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    frozen, state = steps_lib.init_train_state(tx, params, cara)
    batch, rng = _batch(cfg), jax.random.key(7)

    outs = {}
    for impl in ("xla", "fused"):
        st, m = jax.jit(steps_lib.make_train_step(
            cfg, cc, tx, attn_impl=impl, dense_impl=impl))(
                state, frozen, batch, rng)
        outs[impl] = (st, float(m["loss"]))
    np.testing.assert_allclose(outs["fused"][1], outs["xla"][1], rtol=2e-4)
    ref = jax.tree_util.tree_leaves(outs["xla"][0].trainable)
    got = jax.tree_util.tree_leaves(outs["fused"][0].trainable)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=3e-4, rtol=3e-3)


def test_row_mixed_attn_fused_dense_xla(setup):
    """attn_impl='fused' + dense_impl='xla' must thread the ROW mask
    through the qkv delta (vit.py fused-attn/XLA-dense branch), not fall
    back to rank-component dropout: same key -> same Bernoulli draw as the
    pure-XLA path, so the mixed step matches within kernel fp drift.
    (Advisor round-4 medium finding: that branch passed the unmasked
    activation with rate=weight_dropout, silently changing semantics.)"""
    cfg, params, make_cara = setup
    cc, cara = make_cara("row")
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    frozen, state = steps_lib.init_train_state(tx, params, cara)
    batch, rng = _batch(cfg), jax.random.key(7)

    outs = {}
    for ai, di in (("xla", "xla"), ("fused", "xla")):
        st, m = jax.jit(steps_lib.make_train_step(
            cfg, cc, tx, attn_impl=ai, dense_impl=di))(
                state, frozen, batch, rng)
        outs[ai] = (st, float(m["loss"]))
    np.testing.assert_allclose(outs["fused"][1], outs["xla"][1], rtol=2e-4)
    ref = jax.tree_util.tree_leaves(outs["xla"][0].trainable)
    got = jax.tree_util.tree_leaves(outs["fused"][0].trainable)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=3e-4, rtol=3e-3)


def test_row_actually_regularizes(setup):
    """The row step differs from the undropped step (the mask is live) and
    factor grads flow (training moves every CP leaf)."""
    cfg, params, make_cara = setup
    cc_row, cara = make_cara("row")
    cc_off = CaraConfig(rank=4, scale=1.5, l_mu=1.0, l_std=0.0,
                        weight_dropout=0.0)
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    frozen, state = steps_lib.init_train_state(tx, params, cara)
    batch, rng = _batch(cfg), jax.random.key(7)

    st_row, m_row = jax.jit(steps_lib.make_train_step(cfg, cc_row, tx))(
        state, frozen, batch, rng)
    _, m_off = jax.jit(steps_lib.make_train_step(cfg, cc_off, tx))(
        state, frozen, batch, rng)
    assert float(m_row["loss"]) != float(m_off["loss"])
    for name in ("A1", "A2", "P1", "P2", "R1", "R2"):
        new = np.asarray(st_row.trainable["cara"][name])
        old = np.asarray(state.trainable["cara"][name])
        assert np.all(np.isfinite(new)), name
        assert np.any(new != old), f"dead gradient for {name}"


def test_row_eval_identical(setup):
    """Eval (dropout off) is impl-independent."""
    cfg, params, make_cara = setup
    x = _batch(cfg)["image"]
    outs = []
    for impl in ("element", "rank", "row"):
        cc, cara = make_cara(impl)
        outs.append(np.asarray(jax.jit(
            lambda p, c, xx, cc=cc: vit_lib.vit_forward(
                p, xx, cfg, cara_params=c, cara_cfg=cc, train=False))(
                    params, cara, x)))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_row_validation():
    with pytest.raises(ValueError, match="weight_dropout_impl"):
        api.build_model("vit_tiny_test", rank=4, num_classes=10, seed=0,
                        weight_dropout_impl="typo")
    with pytest.raises(ValueError, match="rank"):
        # MoE requires the rank impl (models/moe.py guard).
        model = api.build_model(
            "vit_tiny_test", rank=4, num_classes=10, seed=0,
            moe_experts=2, weight_dropout_impl="row")
        vit_lib.vit_forward(
            model.params, jnp.ones((1, 32, 32, 3)), model.cfg,
            cara_params=model.cara_params, cara_cfg=model.cara_cfg,
            train=True, rng=jax.random.key(0))
