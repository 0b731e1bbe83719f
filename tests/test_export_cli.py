"""Export CLI: merged / adapter artifacts from a training checkpoint."""

import numpy as np
import jax

from cara_tpu.cli import export as export_cli
from cara_tpu.config import CaraConfig, MODEL_REGISTRY
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.train import checkpoint as ckpt_lib


def test_export_modes(tmp_path, monkeypatch):
    cfg = MODEL_REGISTRY["vit_tiny_test"]
    import dataclasses
    cfg = dataclasses.replace(cfg, num_classes=7, drop_path_rate=0.0)
    cara_cfg = CaraConfig(rank=4, scale=2.0)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara_params = cara_lib.init_cara_params(jax.random.key(1), cfg, cara_cfg)
    cara_params["A2"] = 0.05 * jax.random.normal(
        jax.random.key(2), cara_params["A2"].shape)
    src = str(tmp_path / "full.npz")
    ckpt_lib.save_model(src, params, cara_params, {"scale": 2.0})

    # adapter export
    out_a = str(tmp_path / "adapter.npz")
    export_cli.main(["--ckpt", src, "--out", out_a, "--mode", "adapter",
                     "--model", "vit_tiny_test", "--dim", "4"])
    c2, head, meta = ckpt_lib.load_adapter(out_a)
    assert meta["scale"] == 2.0 and head is not None
    assert set(c2) == set(cara_params)

    # merged export == adapter forward
    out_m = str(tmp_path / "merged.npz")
    export_cli.main(["--ckpt", src, "--out", out_m, "--mode", "merged",
                     "--model", "vit_tiny_test", "--dim", "4"])
    merged_params, none_cara, meta = ckpt_lib.load_model(out_m)
    assert none_cara is None and meta["merged"]
    x = jax.random.normal(jax.random.key(3), (2, 32, 32, 3))
    ref = vit_lib.vit_forward(params, x, cfg, cara_params=cara_params,
                              cara_cfg=cara_cfg)
    got = vit_lib.vit_forward(merged_params, x, cfg)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-4)

    # stablehlo export: self-contained artifact, padding path, logits parity
    from cara_tpu.serving import ExportedPredictor

    out_s = str(tmp_path / "model.stablehlo")
    export_cli.main(["--ckpt", src, "--out", out_s, "--mode", "stablehlo",
                     "--model", "vit_tiny_test", "--batch-size", "4",
                     "--dtype", "float32", "--platforms", "cpu"])
    ep = ExportedPredictor.from_file(out_s)
    assert ep.batch_size == 4 and ep.image_size == cfg.image_size
    imgs = np.asarray(jax.random.normal(jax.random.key(4), (6, 32, 32, 3)),
                      np.float32)  # 6 = one full batch + a padded tail
    ref = vit_lib.vit_forward(params, imgs, cfg, cara_params=cara_params,
                              cara_cfg=cara_cfg)
    np.testing.assert_allclose(ep.logits(imgs), np.asarray(ref), atol=2e-4)
    assert ep.predict(imgs).shape == (6,)

    # symbolic-batch export (--batch-size 0): any N, no padding
    out_p = str(tmp_path / "model_poly.stablehlo")
    export_cli.main(["--ckpt", src, "--out", out_p, "--mode", "stablehlo",
                     "--model", "vit_tiny_test", "--batch-size", "0",
                     "--dtype", "float32", "--platforms", "cpu"])
    epp = ExportedPredictor.from_file(out_p)
    assert epp.batch_size is None
    np.testing.assert_allclose(epp.logits(imgs), np.asarray(ref), atol=2e-4)
    np.testing.assert_allclose(epp.logits(imgs[:1]), np.asarray(ref)[:1],
                               atol=2e-4)


def test_export_stablehlo_quantized(tmp_path):
    """--quantize int8/w8a8 on stablehlo export: the artifact stores the
    block kernels as int8 module constants — it loads with only jax, its
    logits stay within quantization error of the float artifact, and the
    flag is rejected for npz modes (quantize at serve time instead)."""
    import dataclasses

    import pytest

    from cara_tpu.serving import ExportedPredictor

    cfg = dataclasses.replace(
        MODEL_REGISTRY["vit_tiny_test"], num_classes=7, drop_path_rate=0.0)
    cara_cfg = CaraConfig(rank=4, scale=2.0)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara_params = cara_lib.init_cara_params(jax.random.key(1), cfg, cara_cfg)
    cara_params["A2"] = 0.05 * jax.random.normal(
        jax.random.key(2), cara_params["A2"].shape)
    src = str(tmp_path / "full.npz")
    ckpt_lib.save_model(src, params, cara_params, {"scale": 2.0})

    base_args = ["--ckpt", src, "--mode", "stablehlo",
                 "--model", "vit_tiny_test", "--dim", "4",
                 "--batch-size", "4", "--dtype", "float32",
                 "--platforms", "cpu"]
    out_f = str(tmp_path / "f32.stablehlo")
    export_cli.main(base_args + ["--out", out_f])
    imgs = np.asarray(jax.random.normal(jax.random.key(4), (4, 32, 32, 3)),
                      np.float32)
    ref = ExportedPredictor.from_file(out_f).logits(imgs)

    for mode in ("int8", "w8a8"):
        out_q = str(tmp_path / f"{mode}.stablehlo")
        export_cli.main(base_args + ["--out", out_q, "--quantize", mode])
        got = ExportedPredictor.from_file(out_q).logits(imgs)
        # per-channel int8 on a tiny random model: loose but meaningful
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 0.12, (mode, err)
        # the int8 artifact must actually be smaller than the f32 one
        import os
        assert os.path.getsize(out_q) < 0.55 * os.path.getsize(out_f), mode

    with pytest.raises(SystemExit):
        export_cli.main(["--ckpt", src, "--out", str(tmp_path / "m.npz"),
                         "--mode", "merged", "--model", "vit_tiny_test",
                         "--dim", "4", "--quantize", "int8"])


def test_export_honors_model_overrides_meta(tmp_path):
    """A checkpoint trained with --model-override records the geometry in
    meta; merged export and Predictor.from_checkpoint_auto rebuild the
    overridden ViTConfig without the flag being repeated."""
    import dataclasses

    cfg = dataclasses.replace(
        MODEL_REGISTRY["vit_tiny_test"], depth=1, num_classes=5,
        drop_path_rate=0.0)
    cara_cfg = CaraConfig(rank=4, scale=2.0)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara_params = cara_lib.init_cara_params(jax.random.key(1), cfg, cara_cfg)
    cara_params["A2"] = 0.05 * jax.random.normal(
        jax.random.key(2), cara_params["A2"].shape)
    src = str(tmp_path / "full.npz")
    ckpt_lib.save_model(
        src, params, cara_params,
        {"scale": 2.0, "model": "vit_tiny_test",
         "model_overrides": {"depth": 1, "drop_path_rate": 0.0}})

    out_m = str(tmp_path / "merged.npz")
    export_cli.main(["--ckpt", src, "--out", out_m, "--mode", "merged"])
    merged_params, _, _ = ckpt_lib.load_model(out_m)
    x = jax.random.normal(jax.random.key(3), (2, 32, 32, 3))
    ref = vit_lib.vit_forward(params, x, cfg, cara_params=cara_params,
                              cara_cfg=cara_cfg)
    got = vit_lib.vit_forward(merged_params, x, cfg)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-4)

    from cara_tpu.serving import Predictor

    pred = Predictor.from_checkpoint_auto(
        src, "vit_tiny_test", merge=False, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(pred.logits(np.asarray(x, np.float32))),
        np.asarray(ref), atol=2e-4)
