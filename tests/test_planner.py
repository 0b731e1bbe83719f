"""Parallelism planner: strategy ladder, constraints, estimate audit.

The planner must (a) pick pure DP whenever it fits (cheapest collectives),
(b) escalate to TP before pipeline for weight-bound geometries, (c) emit
only LEGAL configurations (divisibility of heads/hidden/depth/devices),
and (d) produce estimates in the same ballpark as XLA's own
memory_analysis of the compiled step.
"""

import numpy as np
import pytest

from cara_tpu.config import CaraConfig, MODEL_REGISTRY, ViTConfig
from cara_tpu.parallel import planner


CC = CaraConfig(rank=8)


def test_vitb_fits_pure_dp():
    cfg = MODEL_REGISTRY["vit_base_patch16_224_in21k"]
    p = planner.plan_mesh(cfg, CC, 8, 64, hbm_gb=16.0)
    assert p.kind == "dp" and p.fits
    assert p.mesh_shape == (8, 1) and p.pipeline is None
    assert p.cli_flags() == "--mesh 8,1"
    # ViT-B + 21k head + bs64/8: comfortably under 2 GiB/device.
    assert p.memory.total < 2 * 2**30


def test_escalates_under_pressure_and_stays_legal():
    cfg = MODEL_REGISTRY["vit_base_patch16_224_in21k"]
    seen_kinds = []
    for gb in (16.0, 0.7, 0.5, 0.3):
        p = planner.plan_mesh(cfg, CC, 8, 64, hbm_gb=gb)
        seen_kinds.append(p.kind)
        if p.pipeline is not None:
            s, m, t, v = p.pipeline
            assert cfg.depth % (s * v) == 0
            assert 8 % (s * t) == 0
            assert m >= s or v == 1
            d = p.mesh_shape[0]
            assert 64 % d == 0 and (64 // d) % m == 0
        if p.kind in ("tp", "pp_tp"):
            t = p.mesh_shape[1] if p.pipeline is None else p.pipeline[2]
            assert cfg.num_heads % t == 0 and cfg.hidden_dim % t == 0
    assert seen_kinds[0] == "dp"
    assert any(k != "dp" for k in seen_kinds)  # pressure forced sharding


def test_weight_bound_prefers_tp_over_pp():
    """A fat-and-shallow geometry (weights dominate, depth barely splits):
    the ladder reaches TP before pipeline."""
    cfg = ViTConfig(image_size=224, patch_size=16, embed_dim=1536, depth=2,
                    num_heads=16, repr_size=None, num_classes=100)
    dp_need = planner.plan_mesh(cfg, CC, 8, 8, hbm_gb=1e9).memory.total
    # Budget below pure-DP need but above the T=2 need.
    t2 = planner.estimate_memory(cfg, CC, 8, dp=4, tp=2)
    budget_gb = (t2.total / 0.85 + dp_need) / 2 / 2**30
    p = planner.plan_mesh(cfg, CC, 8, 8, hbm_gb=budget_gb)
    assert p.kind == "tp", (p.kind, p.rationale)
    assert p.fits and p.mesh_shape[1] == 2
    assert p.cli_flags() == "--mesh 4,2"


def test_nothing_fits_reports_honestly():
    cfg = MODEL_REGISTRY["vit_huge_patch14_224_in21k"]
    p = planner.plan_mesh(cfg, CC, 8, 64, hbm_gb=0.01)
    assert not p.fits
    assert any("NOTHING fits" in r for r in p.rationale)


def test_estimate_tracks_xla_memory_analysis():
    """Analytic estimate vs XLA's memory_analysis of the really-compiled
    step on the 8-device CPU mesh: same ballpark.  The CPU backend's
    buffer assignment runs fp32 upcasts and fuses less than TPU Mosaic,
    so its temp accounting sits ~3-4x above the analytic bf16 model —
    assert a 5x band both ways (the planner only needs the ORDERING;
    absolute checks belong to --verify on the target chip)."""
    cfg = ViTConfig(image_size=64, patch_size=8, embed_dim=256, depth=4,
                    num_heads=4, repr_size=None, num_classes=100,
                    drop_path_rate=0.0)
    p = planner.plan_mesh(cfg, CC, 8, 32, hbm_gb=16.0)
    assert p.kind == "dp"
    measured = planner.verify_plan(p, cfg, CC, 32)
    if measured is None:
        pytest.skip("backend lacks memory_analysis")
    est_mib = p.memory.total / 2**20
    got_mib = measured["total_mib"]
    assert got_mib / 5 < est_mib < got_mib * 5, (est_mib, got_mib)


def test_plan_cli():
    from cara_tpu.cli import plan as plan_cli

    rc = plan_cli.main(["--model", "vit_tiny_test", "--devices", "8",
                        "--batch-size", "32", "--hbm-gb", "16",
                        "--dim", "4", "--json"])
    assert rc == 0
    rc = plan_cli.main(["--model", "vit_huge_patch14_224_in21k",
                        "--devices", "8", "--batch-size", "64",
                        "--hbm-gb", "0.01"])
    assert rc == 1
    # Overrides + num-classes flow into the geometry.
    rc = plan_cli.main(["--model", "vit_tiny_test", "--devices", "8",
                        "--batch-size", "32", "--hbm-gb", "16",
                        "--model-override", "depth=4",
                        "--num-classes", "17", "--dim", "4"])
    assert rc == 0


def test_verify_plan_pipeline_compiles():
    """verify_plan compiles the PIPELINE step it recommended (not just the
    plain one) on the virtual mesh."""
    cfg = ViTConfig(image_size=32, patch_size=8, embed_dim=64, depth=4,
                    num_heads=4, repr_size=None, num_classes=10,
                    drop_path_rate=0.0)
    est = planner.estimate_memory(cfg, CC, 32, dp=8)
    # Force the ladder past dp/tp with a budget only a pipeline satisfies:
    # pick the planner's own pp estimate as the budget.
    p = None
    for gb in np.linspace(est.total / 2**30, est.total / 2**30 / 20, 12):
        cand = planner.plan_mesh(cfg, CC, 8, 32, hbm_gb=float(gb))
        if cand.pipeline is not None and cand.fits:
            p = cand
            break
    if p is None:
        pytest.skip("no fitting pipeline plan at this geometry")
    measured = planner.verify_plan(p, cfg, CC, 32)
    if measured is None:
        pytest.skip("backend lacks memory_analysis")
    assert measured["total_mib"] > 0


def test_mesh_auto_cli(tmp_path):
    """--mesh auto runs the planner inside the training CLI and trains
    with whatever it picked (pure DP for the tiny model)."""
    from cara_tpu.cli import vit_cp as cli

    acc = cli.main([
        "--synthetic", "--dataset", "patch_camelyon",
        "--model", "vit_tiny_test", "--batch-size", "8",
        "--eval-batch-size", "8", "--synthetic-size", "32",
        "--dtype", "float32", "--backbone", str(tmp_path / "missing.npz"),
        "--out-dir", str(tmp_path), "--log-every", "1000",
        "--dim", "4", "--epochs", "2", "--mesh", "auto"])
    assert 0.0 <= acc <= 1.0
    # An impossible budget dies with the ladder, not a traceback.
    with pytest.raises(SystemExit, match="nothing fits"):
        cli.main([
            "--synthetic", "--dataset", "patch_camelyon",
            "--model", "vit_tiny_test", "--batch-size", "8",
            "--eval-batch-size", "8", "--synthetic-size", "32",
            "--dtype", "float32",
            "--backbone", str(tmp_path / "missing.npz"),
            "--out-dir", str(tmp_path), "--dim", "4", "--epochs", "2",
            "--mesh", "auto", "--hbm-gb", "0.00001"])


def test_multi_slice_plans():
    """n_slices > 1: dp/tp plans carry --dcn-mesh, model/stage axes stay
    intra-slice, and invalid slice splits die loudly."""
    cfg = MODEL_REGISTRY["vit_base_patch16_224_in21k"]
    p = planner.plan_mesh(cfg, CC, 16, 64, hbm_gb=16.0, n_slices=2)
    assert p.kind == "dp"
    assert p.cli_flags() == "--mesh 16,1 --dcn-mesh 2,1"
    with pytest.raises(ValueError, match="slices"):
        planner.plan_mesh(cfg, CC, 8, 64, n_slices=3)

    # Under pressure on 4 slices x 2 devices: any tp/stage factor must
    # divide the per-slice count (2).
    for gb in (0.7, 0.5, 0.3):
        p = planner.plan_mesh(cfg, CC, 8, 64, hbm_gb=gb, n_slices=4)
        if p.pipeline is not None:
            s, _, t, _ = p.pipeline
            assert (s * t) in (1, 2), p.pipeline
        elif p.kind == "tp":
            assert p.mesh_shape[1] == 2
        if p.fits and p.pipeline is None:
            assert p.cli_flags().endswith("--dcn-mesh 4,1")
