"""End-to-end CLI smoke tests on synthetic data (tiny model, CPU mesh).

Covers the full reference workflow (SURVEY.md section 3.1): config lookup ->
loaders -> model build -> adapter injection -> train loop with eval cadence ->
best-checkpoint save -> eval-only mode restoring the single artifact."""

import glob

import pytest

pytestmark = pytest.mark.slow  # >5 min; deselect with -m 'not slow'

from cara_tpu.cli import dim_experiment as dim_cli
from cara_tpu.cli import vit_cp as cli


def _common(tmp_path, extra):
    return [
        "--synthetic", "--dataset", "patch_camelyon", "--model", "vit_tiny_test",
        "--batch-size", "8", "--eval-batch-size", "8",
        "--synthetic-size", "64", "--dtype", "float32",
        "--backbone", str(tmp_path / "missing.npz"),
        "--out-dir", str(tmp_path), "--log-every", "1000",
    ] + extra


def test_vit_cp_train_and_eval_roundtrip(tmp_path):
    acc = cli.main(_common(tmp_path, ["--dim", "4", "--epochs", "12"]))
    assert 0.0 <= acc <= 1.0
    ckpts = glob.glob(str(tmp_path / "vit_patch_camelyon_*_seed_89.npz"))
    assert len(ckpts) == 1, ckpts

    # Eval-only mode restores the single artifact (vit_cp.py:168-173).
    acc2 = cli.main(_common(tmp_path, [
        "--dim", "4", "--evaluate", ckpts[0]]))
    assert acc2 == pytest.approx(acc, abs=1e-6)

    # Merged-weight inference gives the same accuracy.
    acc3 = cli.main(_common(tmp_path, [
        "--dim", "4", "--evaluate", ckpts[0], "--merged-eval"]))
    assert acc3 == pytest.approx(acc, abs=1e-6)


def test_vit_cp_pipeline_flag(tmp_path):
    """--pipeline S,M trains + evals end-to-end (incl. --grad-accum, which
    must be honored by the pp step, not silently dropped), and bad specs
    die with a usage error rather than a traceback."""
    # 8 devices / 2 stages -> data=4; grad-accum 2 halves the chunk, so
    # batch 16 keeps each chunk splitting into 2 microbatches x 4 shards.
    acc = cli.main(_common(tmp_path, [
        "--dim", "4", "--epochs", "11", "--pipeline", "2,2",
        "--grad-accum", "2", "--batch-size", "16"]))
    assert 0.0 <= acc <= 1.0
    ckpts = glob.glob(str(tmp_path / "vit_patch_camelyon_*_seed_89.npz"))
    assert len(ckpts) == 1, ckpts
    acc2 = cli.main(_common(tmp_path, [
        "--dim", "4", "--evaluate", ckpts[0], "--pipeline", "2,2"]))
    assert acc2 == pytest.approx(acc, abs=1e-6)

    # Bad specs: format errors ("0", "2,0", "2,4,2,0", 5 parts), S*T not
    # dividing the device count ("2,4,8" -> 16 over 8), and --mesh conflict.
    for bad in ("0", "2,0", "2,4,8", "2,4,2,0", "2,4,2,1,1", "--mesh"):
        with pytest.raises(SystemExit):
            if bad == "--mesh":
                cli.main(_common(tmp_path, [
                    "--dim", "4", "--pipeline", "2", "--mesh", "2,1"]))
            else:
                cli.main(_common(tmp_path, [
                    "--dim", "4", "--pipeline", bad]))


def test_vit_cp_pipeline_tensor_flag(tmp_path):
    """--pipeline S,M,T composes fused tensor parallelism inside each
    pipeline stage on a (data, stage, model) mesh; megakernels run in
    interpret mode on CPU, so keep this to a 2-epoch smoke."""
    acc = cli.main(_common(tmp_path, [
        "--dim", "4", "--epochs", "2", "--pipeline", "2,2,2",
        "--batch-size", "16", "--synthetic-size", "32"]))
    assert 0.0 <= acc <= 1.0


def test_vit_cp_circular_pipeline_flag(tmp_path):
    """--pipeline S,M,T,V (circular schedule) through the CLI, on a depth-4
    geometry supplied via --model-override (depth % (S*V) == 0)."""
    acc = cli.main(_common(tmp_path, [
        "--dim", "4", "--epochs", "2", "--pipeline", "2,4,1,2",
        "--model-override", "depth=4",
        "--batch-size", "16", "--eval-batch-size", "16",
        "--synthetic-size", "32"]))
    assert 0.0 <= acc <= 1.0


def test_model_override_flag(tmp_path):
    """--model-override: typed parsing into ViTConfig replacements, and
    usage errors (not tracebacks) for unknown fields / unparseable values."""
    import argparse

    from cara_tpu.cli import common as common_lib

    ns = argparse.Namespace(model_override=[
        "depth=4", "drop_path_rate=0.0", "use_cls_token=false",
        "repr_size=none", "proj_dim=128", "activation=quick_gelu"])
    got = common_lib.resolve_model_overrides(ns)
    assert got == {"depth": 4, "drop_path_rate": 0.0, "use_cls_token": False,
                   "repr_size": None, "proj_dim": 128,
                   "activation": "quick_gelu"}
    assert isinstance(got["depth"], int) and isinstance(
        got["drop_path_rate"], float)
    assert common_lib.resolve_model_overrides(
        argparse.Namespace(model_override=None)) == {}
    for bad in ("nosuchfield=1", "depth", "depth=abc", "mlp_ratio=1.5"):
        with pytest.raises(SystemExit):
            common_lib.resolve_model_overrides(
                argparse.Namespace(model_override=[bad]))


def test_train_checkpoint_records_meta_and_merged_export(tmp_path):
    """Training checkpoints carry {scale, cp_order, rank, model, ...} so a
    merged export with NO --scale/--model flags is exact — regression test
    for the round-1 bug where meta=None made export default to scale=1.0
    (svhn trains with scale=100, vtab_config.py)."""
    import numpy as np
    import jax
    from cara_tpu.cli import export as export_cli
    from cara_tpu.config import CaraConfig, get_model_config
    from cara_tpu.data.vtab_config import get_task_hparams
    from cara_tpu.models import vit as vit_lib
    from cara_tpu.train import checkpoint as ckpt_lib

    assert get_task_hparams("svhn").scale == 100.0
    args = [a if a != "patch_camelyon" else "svhn"
            for a in _common(tmp_path, ["--dim", "4", "--epochs", "11"])]
    cli.main(args)
    seed = get_task_hparams("svhn").seed
    ckpts = glob.glob(str(tmp_path / f"vit_svhn_*_seed_{seed}.npz"))
    assert len(ckpts) == 1, ckpts

    params, cara_params, meta = ckpt_lib.load_model(ckpts[0])
    assert meta["scale"] == 100.0
    assert meta["model"] == "vit_tiny_test"
    assert meta["cp_order"] == 4 and meta["rank"] == 4

    # Merged export with no --scale / --model: everything from meta.
    out_m = str(tmp_path / "merged.npz")
    export_cli.main(["--ckpt", ckpts[0], "--out", out_m, "--mode", "merged"])
    merged_params, none_cara, mmeta = ckpt_lib.load_model(out_m)
    assert none_cara is None and mmeta["scale"] == 100.0

    cfg = get_model_config("vit_tiny_test", num_classes=10)
    cara_cfg = CaraConfig(rank=4, scale=100.0)
    x = jax.random.normal(jax.random.key(0), (2,) + (cfg.image_size,) * 2 + (3,))
    ref = vit_lib.vit_forward(params, x, cfg, cara_params=cara_params,
                              cara_cfg=cara_cfg)
    got = vit_lib.vit_forward(merged_params, x, cfg)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-4, atol=5e-4)

    # A meta-less checkpoint must be REFUSED, not silently defaulted.
    bare = str(tmp_path / "bare.npz")
    ckpt_lib.save_model(bare, params, cara_params, None)
    import pytest as _pytest
    with _pytest.raises(SystemExit, match="no delta scale"):
        export_cli.main(["--ckpt", bare, "--out",
                         str(tmp_path / "x.npz"), "--mode", "merged",
                         "--model", "vit_tiny_test"])


def test_dim_experiment_order3(tmp_path):
    acc = dim_cli.main(_common(tmp_path, [
        "--ranks", "4", "--dims", "3", "--epochs", "2"]))
    assert 0.0 <= acc <= 1.0


def test_vit_cp_auto_resume(tmp_path):
    """Kill-and-restart: second invocation resumes from the orbax snapshot."""
    args = _common(tmp_path, [
        "--dim", "4", "--epochs", "3",
        "--resume-dir", str(tmp_path / "resume"),
        "--resume-every-steps", "4"])
    cli.main(args)
    import cara_tpu.train.checkpoint as ck
    last = ck.latest_step(str(tmp_path / "resume"))
    assert last and last >= 4
    # Re-run with more epochs: must resume, not restart (prints resume line).
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(_common(tmp_path, [
            "--dim", "4", "--epochs", "4",
            "--resume-dir", str(tmp_path / "resume"),
            "--resume-every-steps", "4"]))
    assert "resumed from" in buf.getvalue()


def test_impl_flag_combinations(tmp_path):
    """Kernel-selection flags work end-to-end (interpret-mode Pallas on CPU)."""
    for attn, dense in (("fused", "xla"), ("xla", "fused"),
                        ("flash", "xla")):
        acc = cli.main(_common(tmp_path, [
            "--dim", "4", "--epochs", "1",
            "--attn-impl", attn, "--dense-impl", dense]))
        assert 0.0 <= acc <= 1.0, (attn, dense)


def test_predict_cli(tmp_path):
    """Train -> checkpoint -> predict on image files."""
    import numpy as np
    from PIL import Image
    import glob as _glob
    from cara_tpu.cli import predict as predict_cli

    cli.main(_common(tmp_path, ["--dim", "4", "--epochs", "11"]))
    ckpts = _glob.glob(str(tmp_path / "vit_patch_camelyon_*_seed_89.npz"))
    assert ckpts
    rng = np.random.RandomState(0)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"q{i}.png")
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(p)
        paths.append(p)
    results = predict_cli.main(
        paths + ["--ckpt", ckpts[0], "--model", "vit_tiny_test",
                 "--batch-size", "2", "--top", "2"])
    assert len(results) == 3
    assert all(len(r["classes"]) == 2 for r in results)

    # Same images through a serialized StableHLO artifact: identical top-1.
    from cara_tpu.cli import export as export_cli

    hlo = str(tmp_path / "m.hlo")
    export_cli.main(["--ckpt", ckpts[0], "--out", hlo, "--mode", "stablehlo",
                     "--model", "vit_tiny_test", "--batch-size", "2",
                     "--dtype", "float32", "--platforms", "cpu"])
    results2 = predict_cli.main(paths + ["--exported", hlo, "--top", "2"])
    assert [r["classes"][0] for r in results2] == \
        [r["classes"][0] for r in results]


def test_vit_cp_fused_tp_mesh(tmp_path):
    """--mesh 4,2 with fused impls drives the fused-TP path through the
    full CLI/loop wiring (prepare_tp_frozen inside loop.fit)."""
    acc = cli.main(_common(tmp_path, [
        "--dim", "4", "--epochs", "1", "--mesh", "4,2",
        "--attn-impl", "fused", "--dense-impl", "fused"]))
    assert 0.0 <= acc <= 1.0
