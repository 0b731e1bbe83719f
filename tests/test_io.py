"""IO tests: npz backbone loading, checkpoint round-trips, data pipeline."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.data import vtab as vtab_lib
from cara_tpu.data.vtab_config import TASK_HPARAMS, get_task_hparams
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import npz as npz_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.train import checkpoint as ckpt_lib
from cara_tpu.train import steps as steps_lib


@pytest.fixture(scope="module")
def tiny_cfg():
    return ViTConfig(
        image_size=16, patch_size=8, embed_dim=32, depth=2, num_heads=2,
        repr_size=32, num_classes=9, drop_path_rate=0.0,
    )


def _fake_npz_dict(cfg, rng):
    """Synthesize a checkpoint in the original JAX ViT key layout."""
    e, h, dh, p = cfg.embed_dim, cfg.num_heads, cfg.head_dim, cfg.patch_size
    z = {
        "embedding/kernel": rng.randn(p, p, 3, e).astype(np.float32),
        "embedding/bias": rng.randn(e).astype(np.float32),
        "cls": rng.randn(1, 1, e).astype(np.float32),
        "Transformer/posembed_input/pos_embedding":
            rng.randn(1, cfg.seq_len, e).astype(np.float32),
        "Transformer/encoder_norm/scale": np.ones(e, np.float32),
        "Transformer/encoder_norm/bias": np.zeros(e, np.float32),
        "pre_logits/kernel": rng.randn(e, cfg.repr_size).astype(np.float32),
        "pre_logits/bias": rng.randn(cfg.repr_size).astype(np.float32),
        "head/kernel": rng.randn(cfg.repr_size, cfg.num_classes).astype(np.float32),
        "head/bias": rng.randn(cfg.num_classes).astype(np.float32),
    }
    attn = "MultiHeadDotProductAttention_1"
    for i in range(cfg.depth):
        pre = f"Transformer/encoderblock_{i}"
        z[f"{pre}/LayerNorm_0/scale"] = np.ones(e, np.float32)
        z[f"{pre}/LayerNorm_0/bias"] = np.zeros(e, np.float32)
        z[f"{pre}/LayerNorm_2/scale"] = np.ones(e, np.float32)
        z[f"{pre}/LayerNorm_2/bias"] = np.zeros(e, np.float32)
        for n in ("query", "key", "value"):
            z[f"{pre}/{attn}/{n}/kernel"] = \
                rng.randn(e, h, dh).astype(np.float32) * 0.05
            z[f"{pre}/{attn}/{n}/bias"] = rng.randn(h, dh).astype(np.float32) * 0.02
        z[f"{pre}/{attn}/out/kernel"] = rng.randn(h, dh, e).astype(np.float32) * 0.05
        z[f"{pre}/{attn}/out/bias"] = np.zeros(e, np.float32)
        z[f"{pre}/MlpBlock_3/Dense_0/kernel"] = \
            rng.randn(e, cfg.hidden_dim).astype(np.float32) * 0.05
        z[f"{pre}/MlpBlock_3/Dense_0/bias"] = np.zeros(cfg.hidden_dim, np.float32)
        z[f"{pre}/MlpBlock_3/Dense_1/kernel"] = \
            rng.randn(cfg.hidden_dim, e).astype(np.float32) * 0.05
        z[f"{pre}/MlpBlock_3/Dense_1/bias"] = np.zeros(e, np.float32)
    return z


def test_npz_roundtrip_forward(tiny_cfg, tmp_path):
    """Fused-qkv conversion is consistent: the loaded model's qkv split
    reproduces the per-head q/k/v kernels."""
    rng = np.random.RandomState(0)
    z = _fake_npz_dict(tiny_cfg, rng)
    path = str(tmp_path / "vit.npz")
    np.savez(path, **z)
    params = npz_lib.load_npz_backbone(path, tiny_cfg)
    e, h, dh = tiny_cfg.embed_dim, tiny_cfg.num_heads, tiny_cfg.head_dim
    qkv0 = np.asarray(params["blocks"]["qkv"]["kernel"][0]).reshape(e, 3, h, dh)
    attn = "MultiHeadDotProductAttention_1"
    np.testing.assert_array_equal(
        qkv0[:, 0], z[f"Transformer/encoderblock_0/{attn}/query/kernel"])
    np.testing.assert_array_equal(
        qkv0[:, 2], z[f"Transformer/encoderblock_0/{attn}/value/kernel"])
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
    out = vit_lib.vit_forward(params, x, tiny_cfg)
    assert out.shape == (2, 9)
    assert np.all(np.isfinite(np.asarray(out)))


def test_pos_embed_resize(tiny_cfg):
    rng = np.random.RandomState(0)
    z = _fake_npz_dict(tiny_cfg, rng)
    params = npz_lib.convert_npz_dict(z, tiny_cfg)
    import dataclasses
    big = dataclasses.replace(tiny_cfg, image_size=32)
    resized = npz_lib.maybe_resize_pos_embed(params, big)
    assert resized["pos_embed"].shape == (1, big.seq_len, tiny_cfg.embed_dim)


def test_model_checkpoint_roundtrip(tiny_cfg, tmp_path):
    cara_cfg = CaraConfig(rank=4)
    params = vit_lib.init_vit_params(jax.random.key(0), tiny_cfg)
    cara_params = cara_lib.init_cara_params(jax.random.key(1), tiny_cfg, cara_cfg)
    path = str(tmp_path / "model.npz")
    ckpt_lib.save_model(path, params, cara_params, {"dataset": "cifar"})
    p2, c2, meta = ckpt_lib.load_model(path)
    assert meta["dataset"] == "cifar"
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, p2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        cara_params, c2)


def test_adapter_checkpoint_roundtrip(tiny_cfg, tmp_path):
    cara_cfg = CaraConfig(rank=4)
    cara_params = cara_lib.init_cara_params(jax.random.key(1), tiny_cfg, cara_cfg)
    head = {"kernel": jnp.ones((32, 9)), "bias": jnp.zeros((9,))}
    path = str(tmp_path / "adapter.npz")
    ckpt_lib.save_adapter(path, cara_params, head, {"rank": 4})
    c2, h2, meta = ckpt_lib.load_adapter(path)
    assert meta["rank"] == 4
    np.testing.assert_array_equal(np.asarray(h2["kernel"]), 1.0)
    assert set(c2.keys()) == set(cara_params.keys())


def test_best_checkpoint_rotation(tiny_cfg, tmp_path):
    """Reference best-ckpt rotation: new best saved, previous deleted
    (vit_cp.py:61-66) — synchronous mode."""
    params = vit_lib.init_vit_params(jax.random.key(0), tiny_cfg)
    keeper = ckpt_lib.BestCheckpointKeeper(str(tmp_path), "cifar", seed=14,
                                           async_io=False)
    p1 = keeper.update(0.5, params, None)
    assert p1 and os.path.exists(p1) and "vit_cifar_0.5_seed_14" in p1
    assert keeper.update(0.4, params, None) is None  # not better
    p2 = keeper.update(0.75, params, None)
    assert p2 and os.path.exists(p2)
    assert not os.path.exists(p1)  # rotated away


def test_best_checkpoint_rotation_async(tiny_cfg, tmp_path):
    """Default async mode: writes land on a background thread; wait()
    joins, rotation order is preserved, and back-to-back updates leave
    exactly the newest artifact (loop.fit calls wait() before returning)."""
    params = vit_lib.init_vit_params(jax.random.key(0), tiny_cfg)
    keeper = ckpt_lib.BestCheckpointKeeper(str(tmp_path), "cifar", seed=14)
    assert keeper.async_io
    p1 = keeper.update(0.5, params, None)
    p2 = keeper.update(0.75, params, None)  # joins the p1 write first
    assert keeper.update(0.6, params, None) is None
    keeper.wait()
    assert os.path.exists(p2) and not os.path.exists(p1)
    # The artifact is complete and loadable after wait().
    loaded, cara, meta = ckpt_lib.load_model(p2)
    assert meta["acc"] == 0.75 and cara is None
    assert set(loaded) == set(params)
    keeper.wait()  # idempotent


def test_train_state_resume(tiny_cfg, tmp_path):
    cara_cfg = CaraConfig(rank=4, weight_dropout=0.0)
    params = vit_lib.init_vit_params(jax.random.key(0), tiny_cfg)
    cara_params = cara_lib.init_cara_params(jax.random.key(1), tiny_cfg, cara_cfg)
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=5)
    frozen, state = steps_lib.init_train_state(tx, params, cara_params)
    step = jax.jit(steps_lib.make_train_step(tiny_cfg, cara_cfg, tx))
    batch = {
        "image": jax.random.normal(jax.random.key(2), (4, 16, 16, 3)),
        "label": jnp.array([0, 1, 2, 3]),
    }
    state, _ = step(state, frozen, batch, jax.random.key(3))
    state, _ = step(state, frozen, batch, jax.random.key(3))
    ckpt_lib.save_train_state(str(tmp_path / "ck"), int(state.step), state,
                             extra={"epoch": 0})
    assert ckpt_lib.latest_step(str(tmp_path / "ck")) == 2
    _, template = steps_lib.init_train_state(tx, params, cara_params)
    restored, extra = ckpt_lib.restore_train_state(
        str(tmp_path / "ck"), 2, template)
    assert extra == {"epoch": 0}
    np.testing.assert_allclose(
        np.asarray(state.trainable["cara"]["A2"]),
        np.asarray(restored.trainable["cara"]["A2"]))
    # Resumed training continues bit-identically.
    s_a, m_a = step(state, frozen, batch, jax.random.key(3))
    s_b, m_b = step(
        steps_lib.TrainState(jnp.asarray(restored.step),
                             restored.trainable, restored.opt_state),
        frozen, batch, jax.random.key(3))
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-6)


def test_train_state_retention(tiny_cfg, tmp_path):
    """save_train_state keeps only the newest ``keep_last`` snapshots (a
    100-epoch cadence would otherwise accumulate hundreds of step dirs);
    the newest one must still restore."""
    cara_cfg = CaraConfig(rank=4, weight_dropout=0.0)
    params = vit_lib.init_vit_params(jax.random.key(0), tiny_cfg)
    cara_params = cara_lib.init_cara_params(
        jax.random.key(1), tiny_cfg, cara_cfg)
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=5)
    _, state = steps_lib.init_train_state(tx, params, cara_params)
    d = str(tmp_path / "ck")
    for s in (1, 2, 3, 4, 5):
        ckpt_lib.save_train_state(d, s, state, keep_last=3)
    kept = sorted(x for x in os.listdir(d) if x.startswith("step_"))
    assert kept == ["step_00000003", "step_00000004", "step_00000005"]
    assert ckpt_lib.latest_step(d) == 5
    _, template = steps_lib.init_train_state(tx, params, cara_params)
    restored, _ = ckpt_lib.restore_train_state(d, 5, template)
    np.testing.assert_allclose(
        np.asarray(state.trainable["cara"]["A2"]),
        np.asarray(restored.trainable["cara"]["A2"]))
    # keep_last=0 disables pruning.
    for s in (6, 7, 8, 9):
        ckpt_lib.save_train_state(d, s, state, keep_last=0)
    assert len([x for x in os.listdir(d) if x.startswith("step_")]) == 7


# --- data pipeline ---------------------------------------------------------


def test_task_registry():
    assert len(vtab_lib.VTAB_TASKS) == 19
    assert vtab_lib.get_classes_num("cifar") == 100
    assert vtab_lib.get_classes_num("sun397") == 397
    assert len(TASK_HPARAMS) == 19
    hp = get_task_hparams("cifar")
    assert hp.seed == 14 and hp.scale == 0.1


def test_paper_hparams():
    """--paper-hparams: the reference's 8 '# Dropout: 0.3'-annotated tasks
    (image_classification/vtab_config.py:16,23,30,44,72,86,114,128) train
    with weight_dropout 0.3; everything else — and the default paper=False
    path — keeps the code's hard-coded 0.1 (cara.py:148,158)."""
    from cara_tpu.data.vtab_config import PAPER_DROPOUT_03

    assert len(PAPER_DROPOUT_03) == 8
    for task in TASK_HPARAMS:
        assert get_task_hparams(task).weight_dropout == 0.1
        paper = get_task_hparams(task, paper=True)
        want = 0.3 if task in PAPER_DROPOUT_03 else 0.1
        assert paper.weight_dropout == want, task
        # Everything else is untouched by the paper flag.
        assert paper.scale == get_task_hparams(task).scale
        assert paper.seed == get_task_hparams(task).seed
    assert get_task_hparams("dtd", paper=True).weight_dropout == 0.3
    assert get_task_hparams("cifar", paper=True).weight_dropout == 0.1


def test_file_list_loader(tmp_path):
    """End-to-end file-list pipeline with real (tiny) image files."""
    from PIL import Image

    task_dir = tmp_path / "vtab-1k" / "cifar"
    os.makedirs(task_dir / "images")
    lines = []
    rng = np.random.RandomState(0)
    for i in range(10):
        arr = rng.randint(0, 255, (8, 10, 3), np.uint8)
        Image.fromarray(arr).save(task_dir / "images" / f"im{i}.jpg")
        lines.append(f"images/im{i}.jpg {i % 3}")
    for name in ("train800val200.txt", "test.txt"):
        (task_dir / name).write_text("\n".join(lines) + "\n")

    train, test = vtab_lib.get_data(
        "cifar", root=str(tmp_path / "vtab-1k"), evaluate=True,
        batch_size=4, eval_batch_size=4, image_size=16, num_workers=2)
    assert train.steps_per_epoch() == 2  # drop_last: 10//4
    assert test.steps_per_epoch() == 3   # ceil(10/4), padded tail
    batches = list(iter(train))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 16, 16, 3)
    tb = list(iter(test))
    assert len(tb) == 3
    assert tb[-1]["valid"].sum() == 2  # 10 = 4+4+2
    assert tb[-1]["image"].shape == (4, 16, 16, 3)
    # Small splits are cached as raw uint8 (normalized on device by the
    # train/eval steps — see test_uint8_cache_pipeline).
    assert batches[0]["image"].dtype == np.uint8


def test_synthetic_loader_and_prefetch():
    train, test = vtab_lib.get_data(
        "cifar", synthetic=True, synthetic_size=64, batch_size=16,
        eval_batch_size=16, image_size=8)
    n = 0
    for b in vtab_lib.prefetch(train, lambda x: x, depth=2):
        assert b["image"].shape == (16, 8, 8, 3)
        n += 1
    assert n == 4
    # Shuffling differs across epochs.
    e1 = next(iter(train))["label"]
    e2 = next(iter(train))["label"]
    assert not np.array_equal(e1, e2)


def test_uint8_cache_pipeline(tmp_path):
    """Decode-once uint8 cache + on-device normalization equals the float
    pipeline (bit-for-bit modulo fp rounding)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from cara_tpu.train.steps import prep_images

    task_dir = tmp_path / "vtab-1k" / "cifar"
    os.makedirs(task_dir)
    rng = np.random.RandomState(0)
    lines = []
    for i in range(6):
        arr = rng.randint(0, 255, (20, 24, 3), np.uint8)
        Image.fromarray(arr).save(task_dir / f"im{i}.png")
        lines.append(f"im{i}.png {i % 3}")
    (task_dir / "l.txt").write_text("\n".join(lines))

    cached = vtab_lib.FileListSource(
        str(task_dir), str(task_dir / "l.txt"), image_size=16, cache=True)
    plain = vtab_lib.FileListSource(
        str(task_dir), str(task_dir / "l.txt"), image_size=16, cache=False)
    u8 = cached.load_batch([0, 3, 5])
    assert u8.dtype == np.uint8
    # Second call hits the cache (no re-decode): identical array object data.
    u8b = cached.load_batch([0, 3, 5])
    np.testing.assert_array_equal(u8, u8b)
    ref = np.stack([plain.load(i) for i in (0, 3, 5)])
    dev = np.asarray(prep_images(jnp.asarray(u8)))
    np.testing.assert_allclose(dev, ref, atol=1e-5)

    # BatchLoader path: uint8 batches flow through and the train step
    # normalizes on device.
    loader = vtab_lib.BatchLoader(cached, 4, train=False)
    b = next(iter(loader))
    assert b["image"].dtype == np.uint8


def test_npz_missing_key_error(tiny_cfg):
    with pytest.raises(KeyError, match="embedding/kernel"):
        npz_lib.convert_npz_dict({}, tiny_cfg)


def test_profiler_trace_smoke(tmp_path):
    """--profile-dir produces a loadable trace directory."""
    from cara_tpu.utils.profiling import trace, annotate
    import jax.numpy as jnp

    with trace(str(tmp_path / "prof")):
        with annotate("smoke"):
            jnp.ones((8, 8)).sum().block_until_ready()
    assert any((tmp_path / "prof").rglob("*.pb")) or \
        any((tmp_path / "prof").rglob("*.json.gz"))


def test_compilation_cache_helper(tmp_path, monkeypatch):
    """enable_compilation_cache sets dir; the persistence thresholds are
    zeroed ONLY on the tunneled remote-compile backend (it reports ~0
    local compile seconds, so nonzero thresholds silently disable
    persistence there) — NOT in a CPU process that merely inherits
    JAX_PLATFORMS=axon from sitecustomize (regression: zeroed thresholds
    persisted every trivial CPU executable for the rest of the pytest
    process, ballooning suite time and crashing in the cache writer).
    All touched config is restored so later tests never write the cache."""
    import jax

    from cara_tpu.utils import jit_cache

    prior = (jax.config.jax_compilation_cache_dir,
             jax.config.jax_persistent_cache_min_compile_time_secs,
             jax.config.jax_persistent_cache_min_entry_size_bytes)
    try:
        d = str(tmp_path / "cache")
        got = jit_cache.enable_compilation_cache(d)
        assert got == d
        assert jax.config.jax_compilation_cache_dir == d
        # This process's ACTIVE backend is cpu -> thresholds untouched.
        assert (jax.config.jax_persistent_cache_min_compile_time_secs
                == prior[1])
        assert (jax.config.jax_persistent_cache_min_entry_size_bytes
                == prior[2])
        # Simulated tunneled backend -> thresholds zeroed.
        monkeypatch.setattr(jit_cache, "_remote_compile_backend",
                            lambda: True)
        assert jit_cache.enable_compilation_cache(d) == d
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.0
        assert jax.config.jax_persistent_cache_min_entry_size_bytes == 0
        # CARA_JIT_CACHE=0 disables (explicit path still wins).
        monkeypatch.setenv("CARA_JIT_CACHE", "0")
        assert jit_cache.enable_compilation_cache() == ""
        assert jit_cache.enable_compilation_cache(d) == d
    finally:
        jax.config.update("jax_compilation_cache_dir", prior[0])
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prior[1])
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          prior[2])
