"""tools/reproduce.py: the one-command reproduction front-end.

Mode resolution is pure logic (test it directly); the smoke mode is the
same sweep driver the e2e tests already exercise, so one tiny-model run
asserting the report shape is enough here."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import reproduce  # noqa: E402


def test_resolve_mode_auto(tmp_path):
    data = tmp_path / "vtab-1k"
    backbone = tmp_path / "ViT-B_16.npz"

    def mode(ckpt_dir=None):
        args = reproduce.parse_args(
            [f"--data-root={data}", f"--backbone={backbone}"]
            + ([f"--ckpt-dir={ckpt_dir}"] if ckpt_dir else []))
        return reproduce.resolve_mode(args)

    assert mode() == "smoke"                      # nothing on disk
    data.mkdir()
    backbone.write_bytes(b"x")
    assert mode() == "sweep"                      # data + backbone
    assert mode(ckpt_dir=str(tmp_path)) == "parity"  # + released ckpts

    # Explicit --mode always wins over detection.
    args = reproduce.parse_args(["--mode", "smoke",
                                 f"--data-root={data}",
                                 f"--backbone={backbone}"])
    assert reproduce.resolve_mode(args) == "smoke"


def test_smoke_mode_e2e(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # sweep writes ckpts/report to cwd
    rc = reproduce.main([
        "--mode", "smoke", "--tasks", "patch_camelyon",
        "--model", "vit_tiny_test", "--dim", "4", "--epochs", "1",
        "--out", "report.json"])
    assert rc == 0
    with open(tmp_path / "report.json") as f:
        report = json.load(f)
    assert report["mode"] == "smoke"
    assert "patch_camelyon" in report
    assert 0.0 <= report["patch_camelyon"]["top1"] <= 1.0
    assert report["__summary__"]["tasks"] == 1
