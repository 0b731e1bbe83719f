"""End-to-end CLI smoke tests on synthetic data (tiny model, CPU mesh).

Covers the full reference workflow (SURVEY.md section 3.1): config lookup ->
loaders -> model build -> adapter injection -> train loop with eval cadence ->
best-checkpoint save -> eval-only mode restoring the single artifact."""

import glob
import os

import pytest

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
