"""CLIP-style ViT-L/14 generalization: CaRA shapes derive from geometry
(de-hardcoding the reference's 768/12/36/108 — SURVEY.md section 7 stage 6),
CLIP architectural options (ln_pre / quickGELU / projection), and the merged
inference path on the larger geometry."""

import dataclasses

import numpy as np
import jax

from cara_tpu.config import CaraConfig, get_model_config
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import merge as merge_lib
from cara_tpu.models import vit as vit_lib


def _small_clip():
    """The CLIP ViT-L config scaled down for CPU tests, keeping every
    architectural switch (ln_pre, quick_gelu, proj_dim, eps 1e-5)."""
    cfg = get_model_config("vit_large_patch14_224_clip")
    return dataclasses.replace(
        cfg, image_size=28, patch_size=14, embed_dim=64, depth=2,
        num_heads=8, proj_dim=48)


def test_cara_shapes_scale_with_geometry():
    cfg = get_model_config("vit_large_patch14_224_clip")
    cara_cfg = CaraConfig(rank=16)
    shapes = cara_lib.cara_param_shapes(cfg, cara_cfg)
    assert shapes["A1"] == (3 * 24, 16)       # 24 layers
    assert shapes["A2"] == (1024, 16)
    assert shapes["A3"] == (16, 16)           # 16 heads
    assert shapes["A4"] == (64, 16)           # head_dim 64
    assert shapes["P1"] == ((1 + 8) * 24, 16)  # 9 rows/layer
    assert shapes["bias2"] == (4096,)


def test_clip_forward_and_cara_identity():
    cfg = _small_clip()
    cfg = dataclasses.replace(cfg, num_classes=5)
    cara_cfg = CaraConfig(rank=4, l_mu=1.0, l_std=0.0)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    assert "ln_pre" in params and "proj_out" in params
    cara_params = cara_lib.init_cara_params(jax.random.key(1), cfg, cara_cfg)
    x = jax.random.normal(jax.random.key(2), (2, 28, 28, 3))
    plain = vit_lib.vit_forward(params, x, cfg)
    assert plain.shape == (2, 5)
    adapted = vit_lib.vit_forward(
        params, x, cfg, cara_params=cara_params, cara_cfg=cara_cfg)
    np.testing.assert_allclose(
        np.asarray(plain), np.asarray(adapted), atol=1e-5)


def test_clip_feature_mode():
    cfg = _small_clip()  # num_classes=0 -> features
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(2), (2, 28, 28, 3))
    feats = vit_lib.vit_forward(params, x, cfg)
    assert feats.shape == (2, 48)


def test_clip_merge_parity():
    cfg = dataclasses.replace(_small_clip(), num_classes=7)
    cara_cfg = CaraConfig(rank=4, scale=2.0, l_mu=1.1, l_std=0.03)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara_params = cara_lib.init_cara_params(jax.random.key(1), cfg, cara_cfg)
    k = jax.random.key(3)
    for name in ("A2", "P2", "bias1", "bias2", "bias3"):
        k, sub = jax.random.split(k)
        cara_params[name] = 0.05 * jax.random.normal(
            sub, cara_params[name].shape)
    x = jax.random.normal(jax.random.key(4), (2, 28, 28, 3))
    adapted = vit_lib.vit_forward(
        params, x, cfg, cara_params=cara_params, cara_cfg=cara_cfg)
    merged = vit_lib.vit_forward(
        merge_lib.merge_cara(params, cara_params, cfg, cara_cfg), x, cfg)
    np.testing.assert_allclose(
        np.asarray(adapted), np.asarray(merged), atol=2e-4)


def test_clip_megakernel_matches_xla():
    """The CLIP architectural switches (ln_pre, quickGELU, projection head)
    through the fused megakernel path == the XLA path, eval + train."""
    import jax.numpy as jnp

    cfg = _small_clip()
    cfg = dataclasses.replace(cfg, num_classes=5)
    cc = CaraConfig(rank=4, scale=2.0, l_mu=1.1, l_std=0.05,
                    weight_dropout=0.3)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara = cara_lib.init_cara_params(jax.random.key(1), cfg, cc)
    for nm in ("A2", "P2"):
        cara[nm] = 0.2 * jax.random.normal(jax.random.key(2), cara[nm].shape)
    x = jax.random.normal(jax.random.key(3),
                          (2, cfg.image_size, cfg.image_size, 3))

    def fwd(dense, attn, train=False, c=cc):
        return vit_lib.vit_forward(
            params, x, cfg, cara_params=cara, cara_cfg=c, train=train,
            rng=jax.random.key(7) if train else None,
            attn_impl=attn, dense_impl=dense)

    np.testing.assert_allclose(
        np.asarray(fwd("fused", "fused")), np.asarray(fwd("xla", "xla")),
        atol=5e-4)
    # Train mode: the fused hash-mask weight dropout is a DIFFERENT draw
    # than the XLA bernoulli mask (same distribution, different stream), so
    # exact train equality only holds at weight_dropout=0.
    cc0 = dataclasses.replace(cc, weight_dropout=0.0)
    np.testing.assert_allclose(
        np.asarray(fwd("fused", "fused", train=True, c=cc0)),
        np.asarray(fwd("xla", "xla", train=True, c=cc0)), atol=5e-4)
    assert bool(jnp.all(jnp.isfinite(fwd("fused", "fused", train=True))))


def test_huge_geometry_cara_shapes():
    """ViT-H/14 (1280/32/16, head_dim 80): the factor shapes keep deriving
    from geometry at the next model size up — incl. a non-64 head_dim."""
    from cara_tpu.config import CaraConfig as CC

    cfg = get_model_config("vit_huge_patch14_224_in21k")
    assert cfg.head_dim == 80 and cfg.seq_len == 257
    shapes = cara_lib.cara_param_shapes(cfg, CC(rank=8))
    assert shapes["A1"] == (3 * 32, 8)
    assert shapes["A3"] == (16, 8)
    assert shapes["A4"] == (80, 8)
    assert shapes["P1"] == ((1 + 8) * 32, 8)
    assert shapes["bias2"] == (5120,)
