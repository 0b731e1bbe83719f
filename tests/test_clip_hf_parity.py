"""Independent-implementation golden test for the CLIP model family.

A randomly-initialized HuggingFace ``CLIPVisionModelWithProjection`` (code
we didn't write) is converted via ``models/clip_import.py`` and must
produce the same image embeddings as our ``vit_forward`` — validating the
ln_pre placement, fused-qkv column layout, attention scaling, quickGELU,
cls pooling and visual projection against upstream CLIP semantics in fp64.

This closes the CLIP-path parity gap: the ViT-B path has its fp64 torch
golden (test_torch_parity.py); until round 3 the CLIP variant was only
internally consistent.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from cara_tpu.config import ViTConfig
from cara_tpu.models import clip_import, vit as vit_lib


def _tiny_hf_clip():
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    hf_cfg = CLIPVisionConfig(
        hidden_size=64, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        projection_dim=48, layer_norm_eps=1e-5, hidden_act="quick_gelu",
        attention_dropout=0.0)
    torch.manual_seed(0)
    model = CLIPVisionModelWithProjection(hf_cfg).double().eval()
    cfg = ViTConfig(
        image_size=28, patch_size=14, embed_dim=64, depth=2, num_heads=4,
        mlp_ratio=4, repr_size=None, num_classes=0, ln_pre=True,
        activation="quick_gelu", proj_dim=48, layernorm_eps=1e-5,
        drop_path_rate=0.0)
    return model, cfg


def test_clip_embeddings_match_hf():
    model, cfg = _tiny_hf_clip()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 28, 28, 3)).astype(np.float64)
    with torch.no_grad():
        ref = model(
            pixel_values=torch.tensor(x.transpose(0, 3, 1, 2))
        ).image_embeds.numpy()
    with jax.enable_x64():
        params = clip_import.convert_hf_clip_vision(
            model.state_dict(), cfg, dtype=jnp.float64)
        ours = vit_lib.vit_forward(
            params, jnp.asarray(x), cfg, train=False,
            attn_impl="xla", dense_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-10,
                               atol=1e-12)


def test_clip_hidden_states_match_hf_per_layer():
    """Layerwise: HF's per-layer hidden states vs our scan carries — a
    mis-mapped factor in any single block cannot cancel out."""
    model, cfg = _tiny_hf_clip()
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 28, 28, 3)).astype(np.float64)
    with torch.no_grad():
        hs = model(pixel_values=torch.tensor(x.transpose(0, 3, 1, 2)),
                   output_hidden_states=True).hidden_states
    with jax.enable_x64():
        from cara_tpu.models.vit import _block, patch_embed
        from cara_tpu.ops.layers import layer_norm

        p = clip_import.convert_hf_clip_vision(
            model.state_dict(), cfg, dtype=jnp.float64)
        tokens = patch_embed(p, jnp.asarray(x), cfg)
        cls = jnp.broadcast_to(p["cls"], (2, 1, cfg.embed_dim))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens = tokens + p["pos_embed"]
        tokens = layer_norm(tokens, p["ln_pre"]["scale"],
                            p["ln_pre"]["bias"], cfg.layernorm_eps)
        np.testing.assert_allclose(
            np.asarray(tokens), hs[0].numpy(), rtol=1e-10, atol=1e-12)
        for i in range(cfg.depth):
            bp = jax.tree_util.tree_map(lambda a, i=i: a[i], p["blocks"])
            tokens = _block(tokens, bp, None, None, jnp.float64(0.0),
                            None, None, cfg, None, None, "xla", "xla")
            np.testing.assert_allclose(
                np.asarray(tokens), hs[i + 1].numpy(), rtol=1e-9,
                atol=1e-11, err_msg=f"layer {i}")


def test_load_clip_backbone_roundtrip(tmp_path):
    """torch.save -> load_clip_backbone -> same params as direct convert;
    api.build_model routes .pt backbones through the CLIP importer."""
    model, cfg = _tiny_hf_clip()
    path = str(tmp_path / "clip_vision.pt")
    torch.save(model.state_dict(), path)
    direct = clip_import.convert_hf_clip_vision(model.state_dict(), cfg)
    loaded = clip_import.load_clip_backbone(path, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(direct),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    from cara_tpu import api

    model_b = api.build_model(
        "vit_tiny_test", rank=4, scale=1.0, num_classes=5, seed=0,
        backbone_path=path,
        model_overrides=dict(
            image_size=28, patch_size=14, embed_dim=64, depth=2,
            num_heads=4, repr_size=None, ln_pre=True,
            activation="quick_gelu", proj_dim=48, layernorm_eps=1e-5,
            drop_path_rate=0.0))
    np.testing.assert_array_equal(
        np.asarray(model_b.params["blocks"]["qkv"]["kernel"]),
        np.asarray(direct["blocks"]["qkv"]["kernel"]))
    assert model_b.params["head"]["kernel"].shape == (48, 5)


def test_build_model_clip_fallback_head_dim(tmp_path):
    """The no-reset head fallback (num_classes=None with a configured
    class count) must size the head from _head_in_dim — on a CLIP tower
    the head consumes proj_out's output (proj_dim), not embed_dim."""
    model, _ = _tiny_hf_clip()
    path = str(tmp_path / "clip_vision.bin")
    torch.save(model.state_dict(), path)

    from cara_tpu import api
    from cara_tpu.models.vit import vit_forward

    m = api.build_model(
        "vit_tiny_test", rank=4, scale=1.0, num_classes=None, seed=0,
        backbone_path=path,
        model_overrides=dict(
            image_size=28, patch_size=14, embed_dim=64, depth=2,
            num_heads=4, repr_size=None, num_classes=10, ln_pre=True,
            activation="quick_gelu", proj_dim=48, layernorm_eps=1e-5,
            drop_path_rate=0.0))
    assert m.params["head"]["kernel"].shape == (48, 10)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 28, 28, 3)).astype(np.float32))
    logits = vit_forward(m.params, x, m.cfg, train=False,
                         attn_impl="xla", dense_impl="xla")
    assert logits.shape == (2, 10)


def test_clip_import_rejects_wrong_geometry():
    model, cfg = _tiny_hf_clip()
    import dataclasses

    bad = dataclasses.replace(cfg, patch_size=7)
    with pytest.raises(ValueError, match="patch embedding"):
        clip_import.convert_hf_clip_vision(model.state_dict(), bad)
