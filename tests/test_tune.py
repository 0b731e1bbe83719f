"""Autotune cache + knob-resolution tests (cara_tpu/tune.py, cli/tune.py).

The sweep itself needs a real accelerator; here we test the machinery:
cache round-trip, resolution precedence (env > cache > heuristic) inside
the model's knob functions, and the CLI's two-pass selection/persistence
with a stubbed measurement function.
"""

import json
import re

import pytest

from cara_tpu import tune


@pytest.fixture()
def tmp_cache(tmp_path, monkeypatch):
    path = tmp_path / "tune.json"
    monkeypatch.setenv("CARA_TUNE_CACHE", str(path))
    monkeypatch.setenv("CARA_TUNE_DEFAULTS", "")  # isolate from shipped
    tune.reset()
    yield path
    tune.reset()


def test_cache_roundtrip(tmp_cache):
    key = tune.mlp_key(True, 197, 768, 3072, dev="TPU v5 lite")
    assert tune.lookup("mlp_bm", key) is None
    tune.record("mlp_bm", key, 1024, {"ms": 70.1})
    assert tune.lookup("mlp_bm", key) == 1024
    # Other knob / other key stay independent.
    assert tune.lookup("attn_bb", key) is None
    assert tune.lookup("mlp_bm", tune.mlp_key(False, 197, 768, 3072,
                                              dev="TPU v5 lite")) is None
    # On-disk format: flat dict with metadata preserved.
    data = json.loads(tmp_cache.read_text())
    assert data[f"mlp_bm|{key}"] == {"value": 1024, "ms": 70.1}


def test_cache_corrupt_file_is_ignored(tmp_cache):
    tmp_cache.write_text("{not json")
    assert tune.lookup("mlp_bm", "anything") is None
    # record() still works over the corrupt file.
    tune.record("attn_bb", "k", 2)
    assert tune.lookup("attn_bb", "k") == 2


def test_model_knobs_resolution_order(tmp_cache, monkeypatch):
    from cara_tpu.models import vit as vit_lib

    dev = tune.device_kind()
    # Heuristic when cache is empty.
    assert vit_lib._mlp_bm(True, 197, 768, 3072, b=64) == 512
    assert vit_lib._mlp_bm(False, 197, 768, 3072, b=64) == 256
    # ...scaled down with the (E x hidden) working set: reproduces the
    # measured ViT-L winner, and keeps ViT-H's element-dropout backward
    # inside VMEM (flat 512 overflowed the 128M budget by 15M).
    assert vit_lib._mlp_bm(True, 197, 1024, 4096, b=32) == 256   # ViT-L
    assert vit_lib._mlp_bm(True, 257, 1280, 5120, b=16) == 128   # ViT-H
    assert vit_lib._attn_bb(256, 768, b=64) == 4
    # Cache hit beats the heuristic.
    tune.record("mlp_bm",
                tune.mlp_key(True, 197, 768, 3072, b=64, dev=dev), 1024)
    tune.record("attn_bb", tune.attn_key(256, 768, b=64, dev=dev), 2)
    assert vit_lib._mlp_bm(True, 197, 768, 3072, b=64) == 1024
    assert vit_lib._mlp_bm(False, 197, 768, 3072, b=64) == 256  # impl: miss
    assert vit_lib._attn_bb(256, 768, b=64) == 2
    # train and eval kernels are tuned separately (different VJP/VMEM
    # budgets), and winners are per tuned batch: neither may leak.
    assert vit_lib._attn_bb(256, 768, train=False, b=64) == 4
    assert vit_lib._mlp_bm(True, 197, 768, 3072, train=False, b=64) == 512
    assert vit_lib._attn_bb(256, 768, b=128) == 4   # other batch: miss
    # The element-dropout train kernel and the plain one are distinct
    # compiles: a rank/plain lookup must not see the elem winner.
    assert vit_lib._attn_bb(256, 768, b=64, elem=False) == 4
    assert vit_lib._attn_bb(640, 1024, b=64) == max(
        1, (4 * 256 * 2304) // (640 * 3 * 1024))  # other geometry: miss
    # Env override beats the cache.
    monkeypatch.setattr(vit_lib, "_MLP_BM", "128")
    monkeypatch.setattr(vit_lib, "_ATTN_BB", "8")
    assert vit_lib._mlp_bm(True, 197, 768, 3072) == 128
    assert vit_lib._attn_bb(256, 768) == 8


def test_tune_cli_two_pass_selection(tmp_cache, monkeypatch, tmp_path):
    from cara_tpu.cli import tune as tune_cli

    calls = []

    def fake_measure(args, mlp_bm, attn_bb):
        calls.append((mlp_bm, attn_bb))
        if attn_bb == 8:
            raise RuntimeError("VMEM exceeded")  # infeasible candidate
        ms = {256: 80.0, 512: 75.0, 1024: 77.0}[mlp_bm or 512]
        if attn_bb == 2:
            ms += 1.5
        return {"ms": ms, "compile_s": 0.0}

    monkeypatch.setattr(tune_cli, "_measure", fake_measure)
    out = tmp_path / "log.jsonl"
    summary = tune_cli.main([
        "--model", "vit_base_patch16_224_in21k", "--mode", "train-element",
        "--batch-size", "64", "--attn-bbs", "2,4,8", "--out", str(out)])
    # Pass 1 sweeps mlp_bm at default bb; pass 2 sweeps bb at best bm.
    assert calls[:3] == [(256, None), (512, None), (1024, None)]
    assert calls[3:] == [(512, 2), (512, 4), (512, 8)]
    assert summary["best_mlp_bm"] == 512 and summary["best_attn_bb"] == 4
    # Winners persisted under the production keys -> the model now sees
    # them through its auto path.
    from cara_tpu.models import vit as vit_lib

    assert vit_lib._mlp_bm(True, 197, 768, 3072) == 512
    assert vit_lib._attn_bb(256, 768) == 4
    # The failed candidate is logged as an error, not silently dropped.
    recs = [json.loads(ln) for ln in out.read_text().splitlines()]
    assert any("error" in r and r.get("attn_bb") == 8 for r in recs)
    assert recs[-1]["summary"]["best_ms"] == 75.0


def test_shipped_defaults_precedence(tmp_cache, tmp_path, monkeypatch):
    """Packaged tune_defaults.json fills cache misses; the user's local
    cache overrides it; disabling via env falls back to heuristics."""
    defaults = tmp_path / "defaults.json"
    key = tune.mlp_key(True, 197, 768, 3072, b=64, dev="TPU v5 lite")
    defaults.write_text(json.dumps({
        f"mlp_bm|{key}": {"value": 1024, "ms": 70.0},
        f"attn_bb|{tune.attn_key(256, 768, b=64, dev='TPU v5 lite')}":
            {"value": 2, "ms": 70.0}}))
    monkeypatch.setenv("CARA_TUNE_DEFAULTS", str(defaults))
    tune.reset()
    assert tune.lookup("mlp_bm", key) == 1024
    # A local measurement beats the shipped default at the same key.
    tune.record("mlp_bm", key, 512, {"ms": 69.0})
    assert tune.lookup("mlp_bm", key) == 512
    # ...without hiding shipped entries at other keys.
    assert tune.lookup(
        "attn_bb", tune.attn_key(256, 768, b=64, dev="TPU v5 lite")) == 2
    # Disabled -> miss.
    monkeypatch.setenv("CARA_TUNE_DEFAULTS", "")
    tune.reset()
    assert tune.lookup(
        "attn_bb", tune.attn_key(256, 768, b=64, dev="TPU v5 lite")) is None


def test_shipped_defaults_file_is_valid():
    """The real packaged snapshot parses and its entries carry int values
    under well-formed keys (guards the freeze path against corruption)."""
    import os

    import cara_tpu

    path = os.path.join(os.path.dirname(cara_tpu.__file__),
                        "tune_defaults.json")
    data = json.loads(open(path).read())
    assert data, "shipped defaults snapshot must not be empty"
    for k, v in data.items():
        assert k.split("|")[0] in ("mlp_bm", "attn_bb", "dense_impl"), k
        assert isinstance(v["value"], int), (k, v)
        if k.startswith("mlp_bm|"):
            # Token-axis keys are NORMALIZED to the sublane multiple
            # (tune.mlp_key) so the stream-padded runtime lookup
            # (197 -> 200) hits the shipped winners.
            m = re.search(r"\|n=(\d+)\|", k)
            assert m and int(m.group(1)) % 8 == 0, k


def test_freeze_defaults_roundtrip(tmp_cache, tmp_path, monkeypatch):
    out = tmp_path / "frozen.json"
    monkeypatch.setenv("CARA_TUNE_DEFAULTS", str(out))
    tune.reset()
    tune.record("mlp_bm", "k1", 256, {"ms": 1.0})
    assert tune.freeze_defaults() == str(out)
    # The frozen file alone (no user cache) now serves lookups.
    monkeypatch.setenv("CARA_TUNE_CACHE", str(tmp_path / "empty.json"))
    tune.reset()
    assert tune.lookup("mlp_bm", "k1") == 256


def test_tune_cli_no_write(tmp_cache, monkeypatch, tmp_path):
    from cara_tpu.cli import tune as tune_cli

    monkeypatch.setattr(
        tune_cli, "_measure",
        lambda args, mlp_bm, attn_bb: {"ms": 1.0, "compile_s": 0.0})
    tune_cli.main(["--no-write", "--mlp-bms", "256", "--attn-bbs", "4",
                   "--out", str(tmp_path / "log.jsonl")])
    assert not tmp_cache.exists()
