"""Golden-value tests for the CP delta math.

The reference validates nothing numerically (SURVEY.md section 4); here every
contraction is checked three ways: against a naive numpy CP reconstruction,
factorized vs materialized agreement, and zero-at-init.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.ops import cp as cp_ops


def naive_cp(weights, factors):
    """O(prod(dims)*r) loop reconstruction — the definition."""
    w = np.asarray(weights)
    fs = [np.asarray(f) for f in factors]
    shape = tuple(f.shape[0] for f in fs)
    out = np.zeros(shape)
    for r in range(w.shape[0]):
        t = w[r]
        for f in fs:
            t = np.multiply.outer(t, f[:, r])
        out += t
    return out


def test_cp_to_tensor_matches_naive():
    rng = np.random.RandomState(0)
    w = rng.randn(5)
    fs = [rng.randn(3, 5), rng.randn(4, 5), rng.randn(6, 5), rng.randn(2, 5)]
    got = cp_ops.cp_to_tensor(jnp.array(w), [jnp.array(f) for f in fs])
    np.testing.assert_allclose(np.asarray(got), naive_cp(w, fs), rtol=1e-5)


@pytest.fixture(scope="module")
def small():
    """Small geometry keeps CPU tests fast but preserves all the index math."""
    model = ViTConfig(
        image_size=32, patch_size=8, embed_dim=64, depth=3, num_heads=4,
        repr_size=None, num_classes=10, drop_path_rate=0.1,
    )
    cara = CaraConfig(rank=7, scale=2.0, l_mu=1.1, l_std=0.05)
    params = cara_lib.init_cara_params(jax.random.key(0), model, cara)
    return model, cara, params


def test_qkv_delta_factorized_matches_materialized(small):
    model, cara, params = small
    x = jax.random.normal(jax.random.key(1), (2, 5, model.embed_dim))
    f1 = params["A1"][:3]
    m = cara_lib.qkv_delta(x, params, f1, model, cara, materialized=True)
    f = cara_lib.qkv_delta(x, params, f1, model, cara, materialized=False)
    np.testing.assert_allclose(np.asarray(m), np.asarray(f), atol=1e-5)


def test_rows_delta_out_matches(small):
    model, cara, params = small
    x = jax.random.normal(jax.random.key(2), (2, 5, model.embed_dim))
    p1 = params["P1"][1:5]  # 4 MLP-up rows
    m = cp_ops.rows_delta_out_materialized(
        x, p1, params["P2"], params["P3"], params["R2"])
    f = cp_ops.rows_delta_out_factorized(
        x, p1, params["P2"], params["P3"], params["R2"])
    np.testing.assert_allclose(np.asarray(m), np.asarray(f), atol=1e-5)


def test_rows_delta_in_matches(small):
    model, cara, params = small
    x = jax.random.normal(
        jax.random.key(3), (2, 5, model.mlp_ratio * model.embed_dim))
    p1 = params["P1"][5:9]  # 4 MLP-down rows
    m = cp_ops.rows_delta_in_materialized(
        x, p1, params["P2"], params["P3"], params["R2"])
    f = cp_ops.rows_delta_in_factorized(
        x, p1, params["P2"], params["P3"], params["R2"])
    np.testing.assert_allclose(np.asarray(m), np.asarray(f), atol=1e-5)


def test_transpose_asymmetry(small):
    """MLP-down applies T untransposed while up/proj apply T.T
    (cara.py:81 vs :92)."""
    model, cara, params = small
    e = model.embed_dim
    p1 = params["P1"][5:9]
    t = cp_ops.cp_to_tensor(params["R2"], (p1, params["P2"], params["P3"]))
    t2 = np.asarray(t).reshape(4 * e, e)
    x_up = jax.random.normal(jax.random.key(4), (1, 3, e))
    x_down = jax.random.normal(jax.random.key(5), (1, 3, 4 * e))
    up = cp_ops.rows_delta_out_materialized(
        x_up, p1, params["P2"], params["P3"], params["R2"])
    down = cp_ops.rows_delta_in_materialized(
        x_down, p1, params["P2"], params["P3"], params["R2"])
    np.testing.assert_allclose(np.asarray(up), np.asarray(x_up) @ t2.T, atol=1e-5)
    np.testing.assert_allclose(np.asarray(down), np.asarray(x_down) @ t2, atol=1e-5)


@pytest.mark.parametrize("order", [2, 3, 4, 5])
def test_qkv_delta_orders(order):
    """All four CP orders (dim_experiment.py:264-295) agree factorized vs
    materialized and produce the right shape."""
    model = ViTConfig(
        image_size=32, patch_size=8, embed_dim=48, depth=2, num_heads=4,
        repr_size=None, num_classes=5,
    )
    cara = CaraConfig(rank=5, cp_order=order, l_mu=1.2, l_std=0.1)
    params = cara_lib.init_cara_params(jax.random.key(0), model, cara)
    # Perturb the zero-initialized factor so the delta is non-trivial.
    zero_name = {5: "A3", 4: "A2", 3: "A2", 2: "A2"}[order]
    params[zero_name] = jax.random.normal(
        jax.random.key(9), params[zero_name].shape)
    rows = cara_lib.qkv_rows_per_layer(order)
    f1 = params["A1"][:rows]
    x = jax.random.normal(jax.random.key(1), (2, 4, model.embed_dim))
    m = cara_lib.qkv_delta(x, params, f1, model, cara, materialized=True)
    f = cara_lib.qkv_delta(x, params, f1, model, cara, materialized=False)
    assert m.shape == (2, 4, 3, model.num_heads, model.head_dim)
    np.testing.assert_allclose(np.asarray(m), np.asarray(f), atol=1e-5)


def test_zero_init_deltas(small):
    """A2/P2 zero-init => all deltas identically 0 at step 0
    (cara.py:128,132; reference test test_cara_zero_init)."""
    model, _, _ = small
    cara = CaraConfig(rank=7, l_mu=1.0, l_std=0.0)
    params = cara_lib.init_cara_params(jax.random.key(0), model, cara)
    assert np.all(np.asarray(params["A2"]) == 0)
    assert np.all(np.asarray(params["P2"]) == 0)
    assert np.all(np.asarray(params["R1"]) == 1.0)
    assert np.all(np.asarray(params["R2"]) == 1.0)
    x = jax.random.normal(jax.random.key(1), (2, 5, model.embed_dim))
    d = cara_lib.qkv_delta(
        x, params, params["A1"][:3], model, cara, materialized=False)
    np.testing.assert_allclose(np.asarray(d), 0.0)


def test_param_count_matches_reference_formula():
    """ViT-B/16 order 4: 2526*rank + 4608 trainable CP params
    (shapes cara.py:112-125, count printed vit_cp.py:175-183)."""
    model = ViTConfig()
    for rank, want in [(8, 24816), (32, 85440)]:
        cara = CaraConfig(rank=rank)
        assert cara.trainable_param_count(model) == want


def test_weight_dropout_mask_stats():
    mask = cp_ops.weight_dropout_mask(jax.random.key(0), (4000,), 0.1)
    arr = np.asarray(mask)
    # Inverted dropout: zeros with prob 0.1, survivors scaled by 1/0.9.
    assert np.all((arr == 0) | np.isclose(arr, 1 / 0.9, atol=1e-5))
    assert abs(float(arr.mean()) - 1.0) < 0.05
    assert cp_ops.weight_dropout_mask(None, (4,), 0.1) is None
    assert cp_ops.weight_dropout_mask(jax.random.key(0), (4,), 0.0) is None


def test_random_geometries_factorized_matches_materialized():
    """Geometry-robustness sweep: the delta math must agree across
    arbitrary (depth, heads, head_dim, mlp_ratio) combos — the factor
    shapes are derived from geometry (models/cara.py), never hard-coded
    to ViT-B (the reference hard-codes 768/12/36/108, cara.py:112-125)."""
    rng = np.random.RandomState(7)
    for trial in range(4):
        heads = int(rng.choice([2, 3, 5, 8]))
        head_dim = int(rng.choice([4, 8, 16]))
        depth = int(rng.randint(1, 4))
        mlp_ratio = int(rng.choice([2, 3, 4]))
        order = int(rng.choice([3, 4, 5]))
        model = ViTConfig(
            image_size=16, patch_size=8, embed_dim=heads * head_dim,
            depth=depth, num_heads=heads, mlp_ratio=mlp_ratio,
            repr_size=None, num_classes=3)
        cara = CaraConfig(rank=int(rng.randint(2, 7)), cp_order=order,
                          l_mu=1.1, l_std=0.2)
        params = cara_lib.init_cara_params(
            jax.random.key(trial), model, cara)
        zero_name = {5: "A3", 4: "A2", 3: "A2"}[order]
        params[zero_name] = jax.random.normal(
            jax.random.key(100 + trial), params[zero_name].shape)
        params["P2"] = jax.random.normal(
            jax.random.key(200 + trial), params["P2"].shape)
        rows = cara_lib.qkv_rows_per_layer(order)
        for li in range(depth):
            f1 = params["A1"][li * rows:(li + 1) * rows]
            x = jax.random.normal(
                jax.random.key(300 + li), (2, 5, model.embed_dim))
            m = cara_lib.qkv_delta(x, params, f1, model, cara,
                                   materialized=True)
            f = cara_lib.qkv_delta(x, params, f1, model, cara,
                                   materialized=False)
            np.testing.assert_allclose(
                np.asarray(m), np.asarray(f), atol=1e-5,
                err_msg=f"trial {trial} layer {li} order {order} "
                        f"h{heads} d{head_dim} mr{mlp_ratio}")
