"""Fused tensor parallelism (round-3, closes VERDICT round-2 weak #3).

The megakernels run UNCHANGED on head-/hidden-sharded weight slices under
``shard_map``: each model shard feeds ``x/tp`` into the in-kernel residual so
``psum_i(x/tp + dpm*y_i) = x + dpm*psum(y_i)`` (LayerNorm is scale-invariant
so the in-kernel LN sees the same normalized rows), with replicated additive
terms carried at ``1/tp``.  See ``models.vit._block`` (tp_axis) and
``train.steps.prepare_tp_frozen``.

These tests run on the 8-virtual-CPU mesh with interpret-mode kernels:
fused TP=2 must match the single-device fused step and the XLA-TP step.
"""

import numpy as np
import jax
import pytest

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.parallel import mesh as mesh_lib
from cara_tpu.train import steps as steps_lib


@pytest.fixture(scope="module")
def setup():
    cfg = ViTConfig(
        image_size=16, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        repr_size=None, num_classes=4, drop_path_rate=0.0)
    cc = CaraConfig(rank=4, scale=1.5, l_mu=1.0, l_std=0.0,
                    weight_dropout=0.0)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara = cara_lib.init_cara_params(jax.random.key(1), cfg, cc)
    # Non-trivial deltas so the factor-slicing math is actually exercised.
    for name in ("A2", "P2", "bias1", "bias2", "bias3"):
        cara[name] = 0.1 * jax.random.normal(
            jax.random.fold_in(jax.random.key(2), hash(name) % 1000),
            cara[name].shape)
    return cfg, cc, params, cara


def _batch(key, n, cfg, ncls):
    kx, ky = jax.random.split(key)
    y = jax.random.randint(ky, (n,), 0, ncls)
    x = jax.random.normal(kx, (n, cfg.image_size, cfg.image_size, 3))
    return {"image": x + (y[:, None, None, None] - ncls / 2) * 0.5,
            "label": y}


def test_tp_fused_train_matches_single_and_xla(setup):
    cfg, cc, params, cara = setup
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    frozen, state = steps_lib.init_train_state(tx, params, cara)
    batch = _batch(jax.random.key(5), 16, cfg, 4)
    rng = jax.random.key(7)

    single = steps_lib.make_train_step(
        cfg, cc, tx, attn_impl="fused", dense_impl="fused")
    ref_state, ref_metrics = jax.jit(single)(state, frozen, batch, rng)

    mesh = mesh_lib.make_mesh((4, 2))
    fr_tp = steps_lib.prepare_tp_frozen(frozen, cfg, mesh)
    st = mesh_lib.put_replicated(mesh, state)
    sb = mesh_lib.put_batch(mesh, batch)
    tp_step = steps_lib.make_train_step(
        cfg, cc, tx, attn_impl="fused", dense_impl="fused", mesh=mesh)
    got_state, got_metrics = jax.jit(tp_step)(st, fr_tp, sb, rng)

    np.testing.assert_allclose(float(ref_metrics["loss"]),
                               float(got_metrics["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(ref_metrics["accuracy"]),
                               float(got_metrics["accuracy"]), atol=1e-6)
    for name in ("A1", "A2", "A3", "A4", "P1", "P2", "P3", "R1", "R2",
                 "bias1", "bias2", "bias3"):
        np.testing.assert_allclose(
            np.asarray(ref_state.trainable["cara"][name]),
            np.asarray(got_state.trainable["cara"][name]),
            atol=5e-6, err_msg=name)
    np.testing.assert_allclose(
        np.asarray(ref_state.trainable["head"]["kernel"]),
        np.asarray(got_state.trainable["head"]["kernel"]), atol=5e-6)

    # Cross-check against the GSPMD XLA-TP path (auto impls fall back to
    # xla off-TPU; mesh model axis > 1 with xla impls = round-2 behavior).
    from jax.sharding import NamedSharding

    xla_step = steps_lib.make_train_step(
        cfg, cc, tx, attn_impl="xla", dense_impl="xla", mesh=mesh)
    specs = mesh_lib.vit_param_specs(frozen, tensor_parallel=True)
    fr_xla = jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
        frozen, specs,
        is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
    _, xla_metrics = jax.jit(xla_step)(st, fr_xla, sb, rng)
    np.testing.assert_allclose(float(got_metrics["loss"]),
                               float(xla_metrics["loss"]), rtol=1e-5)


def test_tp_fused_eval_matches(setup):
    cfg, cc, params, cara = setup
    batch = _batch(jax.random.key(9), 16, cfg, 4)
    single = steps_lib.make_eval_step(cfg, cc, attn_impl="fused",
                                      dense_impl="fused")
    c0, t0 = jax.jit(single)(params, cara, batch)

    mesh = mesh_lib.make_mesh((4, 2))
    # Eval params include the (replicated) head; permute+shard the rest.
    p_tp = dict(steps_lib.prepare_tp_frozen(
        {k: v for k, v in params.items() if k != "head"}, cfg, mesh))
    p_tp["head"] = mesh_lib.put_replicated(mesh, params["head"])
    sharded = steps_lib.make_eval_step(cfg, cc, mesh=mesh,
                                       attn_impl="fused",
                                       dense_impl="fused")
    sb = mesh_lib.put_batch(mesh, batch)
    cr = mesh_lib.put_replicated(mesh, cara)
    c1, t1 = jax.jit(sharded)(p_tp, cr, sb)
    assert float(t0) == float(t1) == 16.0
    np.testing.assert_allclose(float(c0), float(c1), atol=1e-6)

    # tp=4 leg on a (2, 4) mesh (heads 4 -> 1 per shard, hid 256 -> 64).
    mesh4 = mesh_lib.make_mesh((2, 4))
    p4 = dict(steps_lib.prepare_tp_frozen(
        {k: v for k, v in params.items() if k != "head"}, cfg, mesh4))
    p4["head"] = mesh_lib.put_replicated(mesh4, params["head"])
    sharded4 = steps_lib.make_eval_step(cfg, cc, mesh=mesh4,
                                        attn_impl="fused",
                                        dense_impl="fused")
    c4, t4 = jax.jit(sharded4)(
        p4, mesh_lib.put_replicated(mesh4, cara),
        mesh_lib.put_batch(mesh4, batch))
    assert float(t4) == 16.0
    np.testing.assert_allclose(float(c0), float(c4), atol=1e-6)


def test_tp_fused_eval_order5(setup):
    """CP order 5 (dim_experiment ablation) under fused TP: the head-slice
    of the collapsed v factor has the same (3, H, Dh) column layout for
    every supported order."""
    cfg, _, params, _ = setup
    cc = CaraConfig(rank=3, scale=1.5, l_mu=1.0, l_std=0.0,
                    weight_dropout=0.0, cp_order=5)
    cara = cara_lib.init_cara_params(jax.random.key(1), cfg, cc)
    for name in ("A2", "P2"):
        cara[name] = 0.1 * jax.random.normal(
            jax.random.fold_in(jax.random.key(3), len(name)),
            cara[name].shape)
    batch = _batch(jax.random.key(9), 16, cfg, 4)
    single = steps_lib.make_eval_step(cfg, cc, attn_impl="fused",
                                      dense_impl="fused")
    c0, t0 = jax.jit(single)(params, cara, batch)

    mesh = mesh_lib.make_mesh((4, 2))
    p_tp = dict(steps_lib.prepare_tp_frozen(
        {k: v for k, v in params.items() if k != "head"}, cfg, mesh))
    p_tp["head"] = mesh_lib.put_replicated(mesh, params["head"])
    sharded = steps_lib.make_eval_step(cfg, cc, mesh=mesh,
                                       attn_impl="fused",
                                       dense_impl="fused")
    c1, t1 = jax.jit(sharded)(
        p_tp, mesh_lib.put_replicated(mesh, cara),
        mesh_lib.put_batch(mesh, batch))
    assert float(t0) == float(t1) == 16.0
    np.testing.assert_allclose(float(c0), float(c1), atol=1e-6)


def test_tp_fused_grad_accum_matches(setup):
    """grad_accum=2 microbatching composes with fused TP: equal to the
    single-pass TP step (weight dropout off, drop-path 0 -> exact)."""
    cfg, cc, params, cara = setup
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    frozen, state = steps_lib.init_train_state(tx, params, cara)
    mesh = mesh_lib.make_mesh((4, 2))
    fr_tp = steps_lib.prepare_tp_frozen(frozen, cfg, mesh)
    st = mesh_lib.put_replicated(mesh, state)
    sb = mesh_lib.put_batch(mesh, _batch(jax.random.key(5), 16, cfg, 4))
    rng = jax.random.key(7)
    full = steps_lib.make_train_step(
        cfg, cc, tx, attn_impl="fused", dense_impl="fused", mesh=mesh)
    ga = steps_lib.make_train_step(
        cfg, cc, tx, attn_impl="fused", dense_impl="fused", mesh=mesh,
        grad_accum=2)
    s1, m1 = jax.jit(full)(st, fr_tp, sb, rng)
    s2, m2 = jax.jit(ga)(st, fr_tp, sb, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    for name in ("A1", "P2", "R1", "bias1"):
        np.testing.assert_allclose(
            np.asarray(s1.trainable["cara"][name]),
            np.asarray(s2.trainable["cara"][name]), atol=2e-6, err_msg=name)


def test_tp_fused_element_wd_smoke(setup):
    """Element-wise weight dropout under fused TP: per-shard hash masks are
    a different realization than single-device (local coordinates +
    per-shard seed offset) but the step must run, produce finite loss and
    move every factor."""
    cfg, _, params, _ = setup
    cc = CaraConfig(rank=4, scale=1.5, l_mu=1.0, l_std=0.0,
                    weight_dropout=0.3, weight_dropout_impl="element")
    cara = cara_lib.init_cara_params(jax.random.key(1), cfg, cc)
    # A2/P2 are zero-init (delta==0 at start, cara.py:128,132) which also
    # zeroes the P3/R2 gradients (every chain term contains P2) — randomize
    # both so "factor moved" is a meaningful assertion.
    for name in ("A2", "P2"):
        cara[name] = 0.1 * jax.random.normal(
            jax.random.fold_in(jax.random.key(2), len(name)),
            cara[name].shape)
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    frozen, state = steps_lib.init_train_state(tx, params, cara)
    mesh = mesh_lib.make_mesh((4, 2))
    fr_tp = steps_lib.prepare_tp_frozen(frozen, cfg, mesh)
    st = mesh_lib.put_replicated(mesh, state)
    sb = mesh_lib.put_batch(mesh, _batch(jax.random.key(5), 16, cfg, 4))
    step = steps_lib.make_train_step(
        cfg, cc, tx, attn_impl="fused", dense_impl="fused", mesh=mesh)
    new_state, metrics = jax.jit(step)(st, fr_tp, sb, jax.random.key(7))
    assert np.isfinite(float(metrics["loss"]))
    for name in ("A1", "A2", "P3", "R1", "bias1", "bias3"):
        before = np.asarray(state.trainable["cara"][name])
        after = np.asarray(new_state.trainable["cara"][name])
        assert not np.array_equal(before, after), name
