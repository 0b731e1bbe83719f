"""Geometry-aware dense-impl auto-resolution (VERDICT r4 weak 5 / next 5).

Adapter EVAL flips to XLA dense at ViT-H scale (50.6 vs 55.1 ms,
benchmarks/RESULTS.md "ViT-H/14") while ViT-L stays fused-favorable and
every measured TRAIN geometry prefers the fused VJPs.  The auto default
must land on the measured winner without a manual ``--dense-impl`` flag:
tune-cache ``dense_impl`` knob first (shipped ViT-H/ViT-L eval winners in
``tune_defaults.json``), then the E*hidden working-set threshold.
"""

import pytest

from cara_tpu import tune
from cara_tpu.config import CaraConfig, get_model_config
from cara_tpu.models import vit as vit_lib


@pytest.fixture
def on_tpu(monkeypatch, tmp_path):
    # resolve_dense_impl short-circuits to "xla" off-TPU; pretend we're on
    # the measured device and isolate the local cache so only the shipped
    # defaults answer lookups.
    monkeypatch.setattr(vit_lib.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(tune, "device_kind", lambda: "TPU v5 lite")
    monkeypatch.setenv("CARA_TUNE_CACHE", str(tmp_path / "tune.json"))
    tune.reset()
    yield
    tune.reset()


CC = CaraConfig(rank=8, scale=1.0, l_mu=1.0, l_std=0.0)


def _resolve(model, train):
    return vit_lib.resolve_dense_impl(
        True, CC, get_model_config(model, num_classes=10), train=train)


def test_eval_winners_from_shipped_cache(on_tpu):
    assert _resolve("vit_huge_patch14_224_in21k", train=False) == "xla"
    assert _resolve("vit_large_patch16_224_in21k", train=False) == "fused"
    assert _resolve("vit_base_patch16_224_in21k", train=False) == "fused"


def test_train_stays_fused_at_every_scale(on_tpu):
    for m in ("vit_base_patch16_224_in21k", "vit_large_patch16_224_in21k",
              "vit_huge_patch14_224_in21k"):
        assert _resolve(m, train=True) == "fused", m


def test_threshold_fallback_without_cache(on_tpu, monkeypatch):
    # No cache entry for an unmeasured device: the E*hidden working-set
    # threshold sits between the measured ViT-L (4.2M, fused) and ViT-H
    # (6.6M, xla) geometries.
    monkeypatch.setattr(tune, "device_kind", lambda: "TPU imaginary v9")
    assert _resolve("vit_huge_patch14_224_in21k", train=False) == "xla"
    assert _resolve("vit_large_patch16_224_in21k", train=False) == "fused"


def test_local_cache_overrides_shipped(on_tpu, tmp_path):
    # A locally measured winner beats the shipped default.
    cfg = get_model_config("vit_huge_patch14_224_in21k", num_classes=10)
    tune.record("dense_impl",
                tune.dense_impl_key(cfg.embed_dim,
                                    cfg.mlp_ratio * cfg.embed_dim,
                                    train=False),
                1, {"ms": 1.0})
    assert _resolve("vit_huge_patch14_224_in21k", train=False) == "fused"


def test_no_geometry_keeps_fused(on_tpu):
    # Legacy call shape (no cfg): unchanged behavior.
    assert vit_lib.resolve_dense_impl(True, CC) == "fused"
