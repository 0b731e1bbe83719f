"""FGVC pipeline + sweep runner smoke tests (synthetic data, tiny model)."""

import json
import os

import numpy as np

from cara_tpu.cli import fgvc as fgvc_cli
from cara_tpu.cli import sweep as sweep_cli
from cara_tpu.data import fgvc as fgvc_lib


def test_fgvc_registry():
    assert fgvc_lib.get_classes_num("cub2011") == 200
    assert fgvc_lib.get_classes_num("stanford_cars") == 196


def test_fgvc_augmented_loader(tmp_path):
    from PIL import Image

    d = tmp_path / "cub2011"
    os.makedirs(d / "img")
    rng = np.random.RandomState(0)
    lines = []
    for i in range(8):
        arr = rng.randint(0, 255, (48, 64, 3), np.uint8)
        Image.fromarray(arr).save(d / "img" / f"{i}.jpg")
        lines.append(f"img/{i}.jpg {i % 4}")
    for name in ("train.txt", "test.txt"):
        (d / name).write_text("\n".join(lines))
    train, test = fgvc_lib.get_data(
        "cub2011", root=str(tmp_path), batch_size=4, eval_batch_size=4,
        image_size=32, num_workers=2)
    b1 = next(iter(train))
    assert b1["image"].shape == (4, 32, 32, 3)
    # Augmentation is stochastic across epochs.
    b2 = next(iter(train))
    order_differs = not np.array_equal(b1["label"], b2["label"])
    pixels_differ = not np.array_equal(b1["image"], b2["image"])
    assert order_differs or pixels_differ


def test_fgvc_cli_synthetic(tmp_path):
    acc = fgvc_cli.main([
        "--synthetic", "--dataset", "cub2011", "--model", "vit_tiny_test",
        "--dim", "4", "--epochs", "2", "--batch-size", "8",
        "--eval-batch-size", "8", "--synthetic-size", "32",
        "--dtype", "float32", "--backbone", str(tmp_path / "none.npz"),
        "--out-dir", str(tmp_path), "--log-every", "1000"])
    assert 0.0 <= acc <= 1.0


def test_sweep_two_tasks(tmp_path):
    results = sweep_cli.main([
        "--synthetic", "--tasks", "patch_camelyon,kitti",
        "--model", "vit_tiny_test", "--dim", "4", "--epochs", "2",
        "--batch-size", "8", "--eval-batch-size", "8",
        "--synthetic-size", "32", "--dtype", "float32",
        "--backbone", str(tmp_path / "none.npz"),
        "--out-dir", str(tmp_path), "--log-every", "1000"])
    assert set(results) == {"patch_camelyon", "kitti", "__summary__"}
    with open(tmp_path / "vtab_results.json") as f:
        saved = json.load(f)
    assert saved["__summary__"]["tasks"] == 2


def test_sweep_hparam_grid(tmp_path):
    """--lrs/--scales multiply the task axis; per-task best across the
    whole grid lands in the summary with its winning hyperparameters."""
    results = sweep_cli.main([
        "--synthetic", "--tasks", "patch_camelyon",
        "--model", "vit_tiny_test", "--dim", "4", "--epochs", "1",
        "--batch-size", "8", "--eval-batch-size", "8",
        "--synthetic-size", "32", "--dtype", "float32",
        "--backbone", str(tmp_path / "none.npz"),
        "--out-dir", str(tmp_path), "--log-every", "1000",
        "--lrs", "0.001,0.0005", "--scales", "1,10"])
    keys = {k for k in results if not k.startswith("__")}
    assert keys == {
        "patch_camelyon@lr0.001@sc1", "patch_camelyon@lr0.001@sc10",
        "patch_camelyon@lr0.0005@sc1", "patch_camelyon@lr0.0005@sc10"}
    row = results["patch_camelyon@lr0.0005@sc10"]
    assert row["lr"] == 0.0005 and row["scale"] == 10.0
    best = results["__summary__"]["best_per_task"]["patch_camelyon"]
    assert best["lr"] in (0.001, 0.0005) and best["scale"] in (1.0, 10.0)
    assert best["top1"] == max(
        results[k]["top1"] for k in keys)


def test_sweep_grid_task_parallel(tmp_path):
    """Grid axes compose with --task-parallel: combos group by lr (one
    compiled pair per lr), scale rides as a traced per-device operand."""
    results = sweep_cli.main([
        "--synthetic", "--tasks", "patch_camelyon",
        "--model", "vit_tiny_test", "--dim", "4", "--epochs", "1",
        "--batch-size", "8", "--eval-batch-size", "8",
        "--synthetic-size", "32", "--dtype", "float32",
        "--backbone", str(tmp_path / "none.npz"),
        "--out-dir", str(tmp_path), "--log-every", "1000",
        "--pad-classes", "16", "--task-parallel", "2",
        "--lrs", "0.001,0.0005", "--scales", "1,10"])
    keys = {k for k in results if not k.startswith("__")}
    assert len(keys) == 4
    for k in keys:
        assert results[k]["scale"] in (1.0, 10.0)
    assert results["__summary__"]["tasks"] == 4
