"""Serving Predictor: merge-on-load, ragged batch padding, checkpoint load."""

import numpy as np
import jax
import pytest

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.serving import Predictor
from cara_tpu.train import checkpoint as ckpt_lib


@pytest.fixture(scope="module")
def setup():
    cfg = ViTConfig(
        image_size=16, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        repr_size=None, num_classes=6, drop_path_rate=0.0)
    cara_cfg = CaraConfig(rank=4, scale=1.5, l_mu=1.0, l_std=0.0)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara_params = cara_lib.init_cara_params(jax.random.key(1), cfg, cara_cfg)
    cara_params["A2"] = 0.05 * jax.random.normal(
        jax.random.key(2), cara_params["A2"].shape)
    return cfg, cara_cfg, params, cara_params


def test_merged_matches_adapter(setup):
    cfg, cara_cfg, params, cara_params = setup
    imgs = np.random.RandomState(0).randn(10, 16, 16, 3).astype(np.float32)
    merged = Predictor(params, cfg, cara_params=cara_params,
                       cara_cfg=cara_cfg, merge=True, batch_size=4,
                       dtype=np.float32)
    adapter = Predictor(params, cfg, cara_params=cara_params,
                        cara_cfg=cara_cfg, merge=False, batch_size=4,
                        dtype=np.float32)
    np.testing.assert_allclose(
        merged.logits(imgs), adapter.logits(imgs), atol=2e-4)
    # Ragged input (10 images, batch 4) handled via padding.
    assert merged.predict(imgs).shape == (10,)


def test_from_checkpoint(setup, tmp_path):
    cfg, cara_cfg, params, cara_params = setup
    path = str(tmp_path / "m.npz")
    ckpt_lib.save_model(path, params, cara_params, {"scale": cara_cfg.scale})
    pred = Predictor.from_checkpoint(path, cfg, batch_size=4,
                                     dtype=np.float32)
    imgs = np.random.RandomState(1).randn(3, 16, 16, 3).astype(np.float32)
    ref = Predictor(params, cfg, cara_params=cara_params, cara_cfg=cara_cfg,
                    batch_size=4, dtype=np.float32)
    np.testing.assert_allclose(pred.logits(imgs), ref.logits(imgs), atol=2e-4)


def test_multitask_matches_single(setup, tmp_path):
    """One backbone + stacked adapters with a traced task id reproduces
    each per-task Predictor exactly (incl. per-task scale + ragged class
    counts via head padding)."""
    import dataclasses

    from cara_tpu.serving import MultiTaskPredictor

    cfg, cara_cfg, params, cara_params = setup
    cara2 = cara_lib.init_cara_params(jax.random.key(5), cfg, cara_cfg)
    cara2["A2"] = 0.03 * jax.random.normal(
        jax.random.key(6), cara2["A2"].shape)
    head2 = {"kernel": 0.1 * jax.random.normal(jax.random.key(7), (64, 4)),
             "bias": 0.1 * jax.random.normal(jax.random.key(8), (4,))}
    scale2 = 0.25
    tasks = {
        "a": {"cara": cara_params, "head": params["head"],
              "scale": cara_cfg.scale, "cp_order": 4},
        "b": {"cara": cara2, "head": head2, "scale": scale2, "cp_order": 4},
    }
    mp = MultiTaskPredictor(params, cfg, tasks, batch_size=4,
                            dtype=np.float32)
    imgs = np.random.RandomState(2).randn(6, 16, 16, 3).astype(np.float32)

    ref_a = Predictor(params, cfg, cara_params=cara_params,
                      cara_cfg=cara_cfg, merge=False, batch_size=4,
                      dtype=np.float32)
    cfg_b = dataclasses.replace(cfg, num_classes=4)
    ref_b = Predictor({**params, "head": head2}, cfg_b, cara_params=cara2,
                      cara_cfg=dataclasses.replace(cara_cfg, scale=scale2),
                      merge=False, batch_size=4, dtype=np.float32)
    la, lb = mp.logits(imgs, "a"), mp.logits(imgs, "b")
    assert la.shape == (6, 6) and lb.shape == (6, 4)
    np.testing.assert_allclose(la, ref_a.logits(imgs), atol=2e-4)
    np.testing.assert_allclose(lb, ref_b.logits(imgs), atol=2e-4)

    # from_checkpoints: full ckpt for "a", adapter-only for "b".
    pa = str(tmp_path / "a.npz")
    pb = str(tmp_path / "b_adapter.npz")
    ckpt_lib.save_model(pa, params, cara_params,
                        {"scale": cara_cfg.scale, "cp_order": 4})
    ckpt_lib.save_adapter(pb, cara2, head2,
                          {"scale": scale2, "cp_order": 4})
    mp2 = MultiTaskPredictor.from_checkpoints(
        {"a": pa, "b": pb}, cfg, batch_size=4, dtype=np.float32)
    np.testing.assert_allclose(mp2.logits(imgs, "b"), lb, atol=1e-5)
    assert mp2.predict(imgs, "a").shape == (6,)

    # Data-sharded over an 8-virtual-device mesh: identical logits.
    from cara_tpu.parallel.mesh import make_mesh

    mp3 = MultiTaskPredictor(params, cfg, tasks, batch_size=8,
                             dtype=np.float32, mesh=make_mesh())
    np.testing.assert_allclose(mp3.logits(imgs, "a"), la, atol=1e-5)
    np.testing.assert_allclose(mp3.logits(imgs, "b"), lb, atol=1e-5)


def test_predict_iter(setup):
    import jax.numpy as jnp
    from cara_tpu.data.vtab import synthetic_source, BatchLoader

    cfg, cara_cfg, params, cara_params = setup
    pred = Predictor(params, cfg, cara_params=cara_params, cara_cfg=cara_cfg,
                     batch_size=4, dtype=np.float32)
    src = synthetic_source(10, 6, cfg.image_size, seed=3)
    loader = BatchLoader(src, 4, train=False)
    total = correct = 0.0
    for yhat, y, valid in pred.predict_iter(iter(loader)):
        correct += float(((yhat == y) * valid).sum())
        total += float(valid.sum())
    assert total == 10.0
    assert 0.0 <= correct <= 10.0


def test_bucketed_logits_match_full_bucket(setup):
    """'auto' buckets (powers of 4 up to batch_size) give the SAME logits
    as the single full-size bucket for every ragged N — the executable
    size is a performance choice, never a math choice."""
    cfg, cara_cfg, params, cara_params = setup
    full = Predictor(params, cfg, cara_params=cara_params, cara_cfg=cara_cfg,
                     batch_size=16, dtype=np.float32, buckets=None)
    auto = Predictor(params, cfg, cara_params=cara_params, cara_cfg=cara_cfg,
                     batch_size=16, dtype=np.float32)
    assert full.buckets == (16,)
    assert auto.buckets == (1, 4, 16)
    for n in (1, 2, 4, 5, 16, 17, 35):
        imgs = np.random.RandomState(n).randn(
            n, 16, 16, 3).astype(np.float32)
        np.testing.assert_allclose(
            auto.logits(imgs), full.logits(imgs), atol=1e-5, err_msg=str(n))
    # Explicit CSV buckets; batch_size is always appended.
    csv = Predictor(params, cfg, cara_params=cara_params, cara_cfg=cara_cfg,
                    batch_size=16, dtype=np.float32, buckets=[1, 8])
    assert csv.buckets == (1, 8, 16)
    imgs = np.random.RandomState(9).randn(6, 16, 16, 3).astype(np.float32)
    np.testing.assert_allclose(csv.logits(imgs), full.logits(imgs), atol=1e-5)
    with pytest.raises(ValueError, match="buckets"):
        Predictor(params, cfg, batch_size=16, dtype=np.float32,
                  buckets=[32])
    # A mesh forces single-bucket (short buckets need not divide the
    # data axis).
    from cara_tpu.parallel.mesh import make_mesh

    meshed = Predictor(params, cfg, cara_params=cara_params,
                       cara_cfg=cara_cfg, batch_size=16, dtype=np.float32,
                       mesh=make_mesh())
    assert meshed.buckets == (16,)


def test_multitask_bucketed(setup):
    from cara_tpu.serving import MultiTaskPredictor

    cfg, cara_cfg, params, cara_params = setup
    tasks = {"a": {"cara": cara_params, "head": params["head"],
                   "scale": cara_cfg.scale, "cp_order": 4}}
    full = MultiTaskPredictor(params, cfg, tasks, batch_size=16,
                              dtype=np.float32, buckets=None)
    auto = MultiTaskPredictor(params, cfg, tasks, batch_size=16,
                              dtype=np.float32)
    assert auto.buckets == (1, 4, 16)
    auto.warmup()  # compiles every bucket without error
    for n in (1, 3, 17):
        imgs = np.random.RandomState(n).randn(
            n, 16, 16, 3).astype(np.float32)
        np.testing.assert_allclose(
            auto.logits(imgs, "a"), full.logits(imgs, "a"), atol=1e-5)
