"""Training-step tests: schedule golden values, learning on synthetic data,
and multi-device (8 virtual CPU) data/tensor-parallel equivalence — the
integration coverage the reference entirely lacks (SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.parallel import mesh as mesh_lib
from cara_tpu.train import steps as steps_lib
from cara_tpu.train.schedule import cara_cosine_schedule


def test_schedule_reference_curve():
    """Golden values of the effective reference LR curve
    (CosineLRScheduler(t_initial=100, warmup_t=10, lr_min=1e-5,
    warmup_lr_init=1e-6) stepped per-epoch, frozen after epoch 50 —
    vit_cp.py:55-59,187)."""
    spe = 15  # steps/epoch for train800val200 @ bs64 drop_last
    s = cara_cosine_schedule(1e-3, spe)
    # epoch 0: warmup_lr_init
    assert np.isclose(float(s(0)), 1e-6)
    # epoch 5: linear warmup
    want5 = 1e-6 + 5 * (1e-3 - 1e-6) / 10
    assert np.isclose(float(s(5 * spe)), want5, rtol=1e-6)
    # epoch 10: cosine at t=10 (warmup_prefix=False -> raw epoch index)
    want10 = 1e-5 + 0.5 * (1e-3 - 1e-5) * (1 + np.cos(np.pi * 10 / 100))
    assert np.isclose(float(s(10 * spe)), want10, rtol=1e-6)
    # epochs > 50 frozen at the epoch-50 value
    want50 = 1e-5 + 0.5 * (1e-3 - 1e-5) * (1 + np.cos(np.pi * 50 / 100))
    for e in (50, 51, 75, 99):
        assert np.isclose(float(s(e * spe)), want50, rtol=1e-6), e
    # piecewise-constant within an epoch
    assert float(s(7 * spe)) == float(s(7 * spe + spe - 1))


@pytest.fixture(scope="module")
def setup():
    cfg = ViTConfig(
        image_size=16, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        repr_size=None, num_classes=4, drop_path_rate=0.0,
    )
    cara_cfg = CaraConfig(rank=4, scale=1.0, l_mu=1.0, l_std=0.0,
                          weight_dropout=0.0)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara_params = cara_lib.init_cara_params(jax.random.key(1), cfg, cara_cfg)
    return cfg, cara_cfg, params, cara_params


def _synthetic_batch(key, n, cfg, num_classes):
    kx, ky = jax.random.split(key)
    y = jax.random.randint(ky, (n,), 0, num_classes)
    # Class-dependent mean so the task is learnable.
    x = jax.random.normal(kx, (n, cfg.image_size, cfg.image_size, 3))
    x = x + (y[:, None, None, None] - num_classes / 2) * 0.5
    return {"image": x, "label": y}


def test_loss_decreases(setup):
    cfg, cara_cfg, params, cara_params = setup
    tx = steps_lib.make_optimizer(1e-2, steps_per_epoch=10, total_epochs=100)
    frozen, state = steps_lib.init_train_state(tx, params, cara_params)
    train_step = jax.jit(steps_lib.make_train_step(cfg, cara_cfg, tx))
    batch = _synthetic_batch(jax.random.key(5), 32, cfg, 4)
    rng = jax.random.key(7)
    first = None
    for i in range(30):
        state, metrics = train_step(state, frozen, batch, rng)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first * 0.8, (first, last)
    assert int(state.step) == 30
    # Backbone must be untouched (frozen by construction).
    np.testing.assert_array_equal(
        np.asarray(frozen["blocks"]["qkv"]["kernel"]),
        np.asarray(params["blocks"]["qkv"]["kernel"]))


def test_eval_step_counts(setup):
    cfg, cara_cfg, params, cara_params = setup
    eval_step = jax.jit(steps_lib.make_eval_step(cfg, cara_cfg))
    batch = _synthetic_batch(jax.random.key(6), 16, cfg, 4)
    batch["valid"] = jnp.concatenate(
        [jnp.ones(12, jnp.float32), jnp.zeros(4, jnp.float32)])
    correct, total = eval_step(params, cara_params, batch)
    assert float(total) == 12.0
    assert 0.0 <= float(correct) <= 12.0


def test_data_parallel_matches_single_device(setup):
    """Batch-sharded step over an 8-device mesh == single-device step."""
    cfg, cara_cfg, params, cara_params = setup
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    frozen, state = steps_lib.init_train_state(tx, params, cara_params)
    step_fn = steps_lib.make_train_step(cfg, cara_cfg, tx)
    batch = _synthetic_batch(jax.random.key(5), 16, cfg, 4)
    rng = jax.random.key(7)

    ref_state, ref_metrics = jax.jit(step_fn)(state, frozen, batch, rng)

    mesh = mesh_lib.make_mesh((8, 1))
    sharded_batch = mesh_lib.put_batch(mesh, batch)
    frozen_r = mesh_lib.put_replicated(mesh, frozen)
    state_r = mesh_lib.put_replicated(mesh, state)
    got_state, got_metrics = jax.jit(step_fn)(state_r, frozen_r, sharded_batch, rng)

    np.testing.assert_allclose(
        float(ref_metrics["loss"]), float(got_metrics["loss"]), rtol=1e-5)
    a = np.asarray(ref_state.trainable["cara"]["A2"])
    b = np.asarray(got_state.trainable["cara"]["A2"])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_tensor_parallel_matches(setup):
    """(4 data x 2 model) mesh with Megatron-style weight sharding produces
    the same loss — GSPMD inserts all collectives from the PartitionSpecs."""
    cfg, cara_cfg, params, cara_params = setup
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    frozen, state = steps_lib.init_train_state(tx, params, cara_params)
    step_fn = steps_lib.make_train_step(cfg, cara_cfg, tx)
    batch = _synthetic_batch(jax.random.key(5), 16, cfg, 4)
    rng = jax.random.key(7)
    ref_state, ref_metrics = jax.jit(step_fn)(state, frozen, batch, rng)

    mesh = mesh_lib.make_mesh((4, 2))
    specs = mesh_lib.vit_param_specs(params, tensor_parallel=True)
    specs.pop("head")
    frozen_sh = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        frozen, specs, is_leaf=lambda x: isinstance(x, P))
    state_r = mesh_lib.put_replicated(mesh, state)
    sharded_batch = mesh_lib.put_batch(mesh, batch)
    got_state, got_metrics = jax.jit(step_fn)(
        state_r, frozen_sh, sharded_batch, rng)
    np.testing.assert_allclose(
        float(ref_metrics["loss"]), float(got_metrics["loss"]), rtol=1e-4)


def test_uint8_batch_sharded(setup):
    """uint8 batches (decode-once cache path) normalize on device and work
    under data-parallel sharding."""
    cfg, cara_cfg, params, cara_params = setup
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    frozen, state = steps_lib.init_train_state(tx, params, cara_params)
    step_fn = steps_lib.make_train_step(cfg, cara_cfg, tx)
    fbatch = _synthetic_batch(jax.random.key(5), 16, cfg, 4)
    # Build a uint8 twin of the float batch through the exact inverse of
    # prep_images' normalization.
    mean = np.array(steps_lib._IMAGENET_MEAN, np.float32)
    std = np.array(steps_lib._IMAGENET_STD, np.float32)
    u8 = np.clip((np.asarray(fbatch["image"]) * std + mean) * 255.0,
                 0, 255).round().astype(np.uint8)
    ubatch = {"image": jnp.asarray(u8), "label": fbatch["label"]}
    mesh = mesh_lib.make_mesh((8, 1))
    sb = mesh_lib.put_batch(mesh, ubatch)
    st = mesh_lib.put_replicated(mesh, state)
    fz = mesh_lib.put_replicated(mesh, frozen)
    st2, metrics = jax.jit(step_fn)(st, fz, sb, jax.random.key(7))
    assert np.isfinite(float(metrics["loss"]))
    # Equivalent float batch gives a close loss (uint8 round-trip error only).
    _, mref = jax.jit(step_fn)(state, frozen, {
        "image": steps_lib.prep_images(ubatch["image"]),
        "label": ubatch["label"]}, jax.random.key(7))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(mref["loss"]), rtol=1e-4)


def test_shard_map_fused_dp_matches_single_device(setup):
    """The fused Pallas path on a data mesh runs under shard_map (GSPMD
    treats pallas_call as opaque and would all-gather the batch — measured
    10 all-gathers in a fused forward's compiled HLO).  One DP step through
    shard_map must equal the single-device step, and its HLO must contain
    psum-style all-reduces but NO all-gather of the batch."""
    cfg, _, params, _ = setup
    cc = CaraConfig(rank=4, scale=1.5, l_mu=1.0, l_std=0.0,
                    weight_dropout=0.3, weight_dropout_impl="element")
    cara_params = cara_lib.init_cara_params(jax.random.key(1), cfg, cc)
    cara_params["A2"] = 0.1 * jax.random.normal(
        jax.random.key(2), cara_params["A2"].shape)
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    frozen, state = steps_lib.init_train_state(tx, params, cara_params)
    batch = _synthetic_batch(jax.random.key(5), 16, cfg, 4)
    rng = jax.random.key(7)

    single = steps_lib.make_train_step(
        cfg, cc, tx, attn_impl="fused", dense_impl="fused")
    ref_state, ref_metrics = jax.jit(single)(state, frozen, batch, rng)

    mesh = mesh_lib.make_mesh((8, 1))
    sharded = steps_lib.make_train_step(
        cfg, cc, tx, attn_impl="fused", dense_impl="fused", mesh=mesh)
    sb = mesh_lib.put_batch(mesh, batch)
    fr = mesh_lib.put_replicated(mesh, frozen)
    st = mesh_lib.put_replicated(mesh, state)
    jitted = jax.jit(sharded)
    hlo = jitted.lower(st, fr, sb, rng).compile().as_text()
    assert "all-gather" not in hlo, "fused DP path still replicates"
    assert "all-reduce" in hlo, "expected gradient psum collectives"
    got_state, got_metrics = jitted(st, fr, sb, rng)

    # drop_path/dropout rates are 0 => per-sample rng differences are inert;
    # weight-dropout masks are shard-invariant by construction => exact.
    np.testing.assert_allclose(float(ref_metrics["loss"]),
                               float(got_metrics["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(ref_metrics["accuracy"]),
                               float(got_metrics["accuracy"]), atol=1e-6)
    for name in ("A2", "P2", "R1", "bias1"):
        np.testing.assert_allclose(
            np.asarray(ref_state.trainable["cara"][name]),
            np.asarray(got_state.trainable["cara"][name]),
            atol=2e-6, err_msg=name)


def test_shard_map_fused_eval_matches(setup):
    cfg, cc, params, cara_params = setup
    batch = _synthetic_batch(jax.random.key(9), 16, cfg, 4)
    single = steps_lib.make_eval_step(cfg, cc, attn_impl="fused",
                                      dense_impl="fused")
    c0, t0 = jax.jit(single)(params, cara_params, batch)

    mesh = mesh_lib.make_mesh((8, 1))
    sharded = steps_lib.make_eval_step(cfg, cc, mesh=mesh,
                                       attn_impl="fused",
                                       dense_impl="fused")
    sb = mesh_lib.put_batch(mesh, batch)
    pr = mesh_lib.put_replicated(mesh, params)
    cr = mesh_lib.put_replicated(mesh, cara_params)
    jitted = jax.jit(sharded)
    hlo = jitted.lower(pr, cr, sb).compile().as_text()
    assert "all-gather" not in hlo
    c1, t1 = jitted(pr, cr, sb)
    assert float(t0) == float(t1) == 16.0
    np.testing.assert_allclose(float(c0), float(c1), atol=1e-6)


def test_grad_accum_matches_full_batch(setup):
    """grad_accum=4 microbatch scan == one full-batch step exactly (the
    weight-dropout mask is per-step constant; drop-path off)."""
    cfg, _, params, _ = setup
    cc = CaraConfig(rank=4, scale=1.5, l_mu=1.0, l_std=0.0,
                    weight_dropout=0.3, weight_dropout_impl="element")
    cara_params = cara_lib.init_cara_params(jax.random.key(1), cfg, cc)
    cara_params["A2"] = 0.1 * jax.random.normal(
        jax.random.key(2), cara_params["A2"].shape)
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    frozen, state = steps_lib.init_train_state(tx, params, cara_params)
    batch = _synthetic_batch(jax.random.key(5), 16, cfg, 4)
    rng = jax.random.key(7)

    full = jax.jit(steps_lib.make_train_step(cfg, cc, tx))
    ref_state, ref_m = full(state, frozen, batch, rng)

    accum = jax.jit(steps_lib.make_train_step(cfg, cc, tx, grad_accum=4))
    got_state, got_m = accum(state, frozen, batch, rng)

    np.testing.assert_allclose(float(ref_m["loss"]), float(got_m["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(ref_m["accuracy"]),
                               float(got_m["accuracy"]), atol=1e-6)
    for name in ("A2", "P2", "R1", "bias1"):
        np.testing.assert_allclose(
            np.asarray(ref_state.trainable["cara"][name]),
            np.asarray(got_state.trainable["cara"][name]),
            atol=2e-6, err_msg=name)

    # And composed with shard_map DP on the 8-device mesh.
    mesh = mesh_lib.make_mesh((8, 1))
    sharded = jax.jit(steps_lib.make_train_step(
        cfg, cc, tx, attn_impl="fused", dense_impl="fused", mesh=mesh,
        grad_accum=2))
    sb = mesh_lib.put_batch(mesh, batch)
    fr = mesh_lib.put_replicated(mesh, frozen)
    st = mesh_lib.put_replicated(mesh, state)
    _, m = sharded(st, fr, sb, rng)
    assert np.isfinite(float(m["loss"]))
