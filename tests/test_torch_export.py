"""Reverse interop: export our checkpoints to the reference's ``.pt``
format (``--mode torch``) and prove the round trip is exact.

The reference's ``--evaluate`` does a STRICT ``load_state_dict``
(``vit_cp.py:170``), so the exported key set must match the
cara-adapted timm model exactly; the values must survive
ours -> torch -> ours bit-for-bit (everything is fp32 on both sides).
"""

import dataclasses

import numpy as np
import jax
import pytest

from cara_tpu.cli import export as export_cli
from cara_tpu.config import CaraConfig, MODEL_REGISTRY
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import torch_export, torch_import
from cara_tpu.models import vit as vit_lib
from cara_tpu.train import checkpoint as ckpt_lib


def _tiny(num_classes=7, **over):
    cfg = MODEL_REGISTRY["vit_tiny_test"]
    return dataclasses.replace(cfg, num_classes=num_classes,
                               drop_path_rate=0.0, **over)


def _make(cfg, rank=4, cp_order=4, scale=2.0):
    cara_cfg = CaraConfig(rank=rank, scale=scale, cp_order=cp_order)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara_params = cara_lib.init_cara_params(jax.random.key(1), cfg, cara_cfg)
    # Perturb the zero-init factors so the adapter contributes and any
    # transpose/stacking mistake shows up in the forward comparison.
    for k in ("A2", "P2", "bias1"):
        cara_params[k] = 0.05 * jax.random.normal(
            jax.random.key(hash(k) % 1000), cara_params[k].shape)
    return params, cara_params, cara_cfg


def _assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = {jax.tree_util.keystr(p): v
          for p, v in jax.tree_util.tree_leaves_with_path(b)}
    assert {jax.tree_util.keystr(p) for p, _ in la} == set(lb)
    for p, v in la:
        np.testing.assert_array_equal(
            np.asarray(v, np.float32), np.asarray(lb[jax.tree_util.keystr(p)],
                                                  np.float32),
            err_msg=jax.tree_util.keystr(p))


def test_torch_export_roundtrip_bitexact(tmp_path):
    cfg = _tiny()
    params, cara_params, cara_cfg = _make(cfg)
    src = str(tmp_path / "full.npz")
    ckpt_lib.save_model(src, params, cara_params,
                        {"scale": 2.0, "model": "vit_tiny_test",
                         "model_overrides": {"num_classes": 7}})

    out = str(tmp_path / "reference.pt")
    export_cli.main(["--ckpt", src, "--out", out, "--mode", "torch",
                     "--model", "vit_tiny_test"])

    p2, c2, info = torch_import.load_torch_checkpoint(out, cfg)
    assert info == {"cp_order": 4, "rank": 4}
    _assert_trees_equal(params, p2)
    _assert_trees_equal(cara_params, c2)

    # And the forward through the re-imported weights is identical.
    x = jax.random.normal(jax.random.key(3), (2, cfg.image_size,
                                              cfg.image_size, 3))
    ref = vit_lib.vit_forward(params, x, cfg, cara_params=cara_params,
                              cara_cfg=cara_cfg)
    got = vit_lib.vit_forward(p2, x, cfg, cara_params=c2, cara_cfg=cara_cfg)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-6)


def test_torch_export_key_set_matches_reference_model():
    """Exact key inventory of a timm-0.4.12 cara-adapted ViT
    (cara.py:112-125 roots + per-block keys), so upstream's strict
    ``load_state_dict`` accepts the artifact."""
    cfg = _tiny()
    params, cara_params, _ = _make(cfg)
    sd = torch_export.to_torch_state_dict(params, cara_params, cfg, 4)

    expect = {"cls_token", "pos_embed", "patch_embed.proj.weight",
              "patch_embed.proj.bias", "norm.weight", "norm.bias",
              "head.weight", "head.bias"}
    for i in range(cfg.depth):
        for k in ("norm1.weight", "norm1.bias", "attn.qkv.weight",
                  "attn.qkv.bias", "attn.proj.weight", "attn.proj.bias",
                  "norm2.weight", "norm2.bias", "mlp.fc1.weight",
                  "mlp.fc1.bias", "mlp.fc2.weight", "mlp.fc2.bias"):
            expect.add(f"blocks.{i}.{k}")
    for n in ("A1", "A2", "A3", "A4", "P1", "P2", "P3", "R1", "R2",
              "bias1", "bias2", "bias3"):
        expect.add("CP_" + n)
    assert set(sd) == expect
    # torch linear orientation: (out, in).
    e = cfg.embed_dim
    assert sd["blocks.0.attn.qkv.weight"].shape == (3 * e, e)
    assert sd["blocks.0.mlp.fc1.weight"].shape == (cfg.hidden_dim, e)
    assert sd["head.weight"].shape == (7, e)
    assert sd["patch_embed.proj.weight"].shape == (
        e, 3, cfg.patch_size, cfg.patch_size)
    assert all(v.dtype == np.float32 for v in sd.values())


@pytest.mark.parametrize("order", [2, 3, 5])
def test_torch_export_other_cp_orders(tmp_path, order):
    cfg = _tiny()
    params, cara_params, _ = _make(cfg, cp_order=order)
    src = str(tmp_path / "full.npz")
    ckpt_lib.save_model(src, params, cara_params,
                        {"scale": 2.0, "model": "vit_tiny_test",
                         "cp_order": order})
    out = str(tmp_path / "ref.pt")
    export_cli.main(["--ckpt", src, "--out", out, "--mode", "torch",
                     "--model", "vit_tiny_test"])
    p2, c2, info = torch_import.load_torch_checkpoint(out, cfg)
    assert info["cp_order"] == order
    _assert_trees_equal(cara_params, c2)


def test_torch_export_pre_logits(tmp_path):
    """A repr_size geometry (in21k-style pre_logits.fc) round-trips."""
    cfg = _tiny(repr_size=MODEL_REGISTRY["vit_tiny_test"].embed_dim)
    params, cara_params, _ = _make(cfg)
    assert "pre_logits" in params
    sd = torch_export.to_torch_state_dict(params, cara_params, cfg, 4)
    assert "pre_logits.fc.weight" in sd
    p2, c2, _ = torch_import.convert_torch_state_dict(sd, cfg)
    _assert_trees_equal(params, p2)


def test_torch_export_refuses_non_cp_adapters():
    cfg = _tiny()
    params, _, _ = _make(cfg)
    lora_tree = {"q_a": np.zeros((12, 4)), "q_b": np.zeros((4, 12))}
    with pytest.raises(ValueError, match="plain CP factor set"):
        torch_export.to_torch_state_dict(params, lora_tree, cfg, 4)


def test_torch_export_merged_plain_backbone(tmp_path):
    """A merged checkpoint (no adapter) exports as a vanilla timm state
    dict — loadable into an unadapted ViT."""
    cfg = _tiny()
    params, cara_params, cara_cfg = _make(cfg)
    from cara_tpu.models.merge import merge_cara

    merged = merge_cara(params, cara_params, cfg, cara_cfg)
    src = str(tmp_path / "merged.npz")
    ckpt_lib.save_model(src, merged, None,
                        {"scale": 2.0, "model": "vit_tiny_test",
                         "merged": True})
    out = str(tmp_path / "plain.pt")
    export_cli.main(["--ckpt", src, "--out", out, "--mode", "torch",
                     "--model", "vit_tiny_test"])
    p2, c2, info = torch_import.load_torch_checkpoint(out, cfg)
    assert c2 is None and info == {}
    x = jax.random.normal(jax.random.key(5), (2, cfg.image_size,
                                              cfg.image_size, 3))
    ref = vit_lib.vit_forward(params, x, cfg, cara_params=cara_params,
                              cara_cfg=cara_cfg)
    got = vit_lib.vit_forward(p2, x, cfg)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-4)


def test_predictor_accepts_torch_checkpoint(tmp_path):
    """Serving surface interop: Predictor.from_checkpoint_auto consumes a
    reference-format .pt (auto-detected) — scale comes from the caller,
    exactly like the reference's per-task table flow."""
    from cara_tpu.serving import Predictor

    cfg = _tiny()
    params, cara_params, cara_cfg = _make(cfg)
    sd = torch_export.to_torch_state_dict(params, cara_params, cfg, 4)
    import torch

    pt = str(tmp_path / "ref.pt")
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, pt)

    pred = Predictor.from_checkpoint_auto(
        pt, "vit_tiny_test", scale=2.0, batch_size=4,
        dtype=np.float32)
    x = np.asarray(jax.random.normal(
        jax.random.key(7), (3, cfg.image_size, cfg.image_size, 3)),
        np.float32)
    ref = vit_lib.vit_forward(params, x, cfg, cara_params=cara_params,
                              cara_cfg=cara_cfg)
    np.testing.assert_allclose(pred.logits(x), np.asarray(ref), atol=2e-4)

    # Missing scale on an adapter-carrying .pt is refused, not defaulted.
    with pytest.raises((ValueError, SystemExit)):
        Predictor.from_checkpoint_auto(pt, "vit_tiny_test")
