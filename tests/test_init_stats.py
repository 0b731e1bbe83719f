"""Statistical parity of the initialization scheme with the reference's
torch initializers (SURVEY.md section 7 "hard parts": exact init-scheme
parity — validated distributionally, since RNG streams can't match bitwise)."""

import numpy as np
import jax

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib


def _params(rank=32, l_mu=1.3, l_std=0.07, seed=0):
    cfg = ViTConfig()
    cara_cfg = CaraConfig(rank=rank, l_mu=l_mu, l_std=l_std)
    return cara_lib.init_cara_params(jax.random.key(seed), cfg, cara_cfg)


def test_xavier_normal_std():
    """A1 (36, r): torch xavier_normal_ std = sqrt(2/(fan_in+fan_out))
    (cara.py:127)."""
    samples = np.concatenate([
        np.asarray(_params(seed=s)["A1"]).ravel() for s in range(8)])
    want = np.sqrt(2.0 / (36 + 32))
    assert abs(samples.std() - want) / want < 0.05
    assert abs(samples.mean()) < 0.01


def test_orthogonal_semantics():
    """A3 (12, r=32): torch orthogonal_ gives orthonormal ROWS when
    rows < cols; A4 (64, 32): orthonormal COLUMNS (cara.py:129-130)."""
    p = _params()
    a3 = np.asarray(p["A3"])          # (12, 32) -> rows orthonormal
    np.testing.assert_allclose(a3 @ a3.T, np.eye(12), atol=1e-5)
    a4 = np.asarray(p["A4"])          # (64, 32) -> columns orthonormal
    np.testing.assert_allclose(a4.T @ a4, np.eye(32), atol=1e-5)
    p3 = np.asarray(p["P3"])          # (768, 32) -> columns orthonormal
    np.testing.assert_allclose(p3.T @ p3, np.eye(32), atol=1e-5)


def test_lambda_distribution():
    """R1/R2 ~ N(l_mu, l_std) when l_std != 0 (cara.py:134-136)."""
    vals = np.concatenate([
        np.asarray(_params(rank=128, seed=s)["R1"]) for s in range(8)])
    assert abs(vals.mean() - 1.3) < 0.02
    assert abs(vals.std() - 0.07) < 0.01


def test_lambda_constant_fallback():
    """l_std == 0: constant l_mu (reference leaves uninitialized memory for
    l_mu != 1 — we fix the landmine, SURVEY.md section 2.1)."""
    p = cara_lib.init_cara_params(
        jax.random.key(0), ViTConfig(), CaraConfig(rank=8, l_mu=1.5, l_std=0.0))
    np.testing.assert_array_equal(np.asarray(p["R1"]), 1.5)


def test_split_weight_parity():
    """Fused-qkv splitter (reference helper dim_experiment.py:98-104)."""
    from cara_tpu.models.vit import split_qkv_kernel

    cfg = ViTConfig(embed_dim=64, num_heads=4)
    k = jax.random.normal(jax.random.key(0), (64, 192))
    q, kk, v = split_qkv_kernel(k, cfg)
    assert q.shape == kk.shape == v.shape == (64, 64)
    x = jax.random.normal(jax.random.key(1), (5, 64))
    full = (x @ k).reshape(5, 3, 4, 16)
    np.testing.assert_allclose(
        np.asarray(x @ q), np.asarray(full[:, 0].reshape(5, 64)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(x @ v), np.asarray(full[:, 2].reshape(5, 64)), rtol=1e-5)
