"""FSDP (ZeRO-3-style frozen-backbone sharding over the data axis).

The reference has no parallelism at all (SURVEY.md §2.6); FSDP is the
TPU-native answer to "the frozen backbone is replicated dp times": shard
each large kernel's feature axis over the ``data`` axis
(``mesh.fsdp_param_specs``) and let XLA's SPMD partitioner all-gather one
layer's weights per scan iteration.  These tests pin, on the 8-virtual-CPU
mesh: spec construction (divisibility guards, TP-disjoint axes), per-device
byte savings, and exact-math equality of train/eval against the
single-device step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # >5 min; deselect with -m 'not slow'
from jax.sharding import NamedSharding, PartitionSpec as P

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.parallel import mesh as mesh_lib
from cara_tpu.train import steps as steps_lib


@pytest.fixture(scope="module")
def setup():
    cfg = ViTConfig(
        image_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        mlp_ratio=2, repr_size=None, num_classes=8, drop_path_rate=0.0)
    cc = CaraConfig(rank=4, scale=1.5, l_mu=1.0, l_std=0.0,
                    weight_dropout=0.0)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara = cara_lib.init_cara_params(jax.random.key(1), cfg, cc)
    # Non-zero A2/P2 so the delta path contributes to every gradient.
    cara["A2"] = 0.1 * jax.random.normal(jax.random.key(2), cara["A2"].shape)
    cara["P2"] = 0.1 * jax.random.normal(jax.random.key(3), cara["P2"].shape)
    return cfg, cc, params, cara


def _batch(key, n, cfg):
    kx, ky = jax.random.split(key)
    return {
        "image": jax.random.normal(
            kx, (n, cfg.image_size, cfg.image_size, 3), jnp.float32),
        "label": jax.random.randint(ky, (n,), 0, cfg.num_classes),
    }


def test_fsdp_specs_axes_and_guards(setup):
    """Kernels shard the planned feature axis over data; non-divisible
    dims stay replicated; TP composition uses disjoint axes."""
    cfg, cc, params, cara = setup
    frozen = {k: v for k, v in params.items() if k != "head"}
    specs = mesh_lib.fsdp_param_specs(frozen, 8)
    blocks = specs["blocks"]
    assert blocks["qkv"]["kernel"] == P(None, mesh_lib.DATA_AXIS, None)
    assert blocks["proj"]["kernel"] == P(None, None, mesh_lib.DATA_AXIS)
    assert blocks["fc1"]["kernel"] == P(None, mesh_lib.DATA_AXIS, None)
    assert blocks["fc2"]["kernel"] == P(None, None, mesh_lib.DATA_AXIS)
    assert blocks["qkv"]["bias"] == P()
    assert specs["pos_embed"] == P()
    # embed kernel is (8*8*3, 64) = (192, 64): 192 % 8 == 0 -> sharded.
    assert specs["embed"]["kernel"] == P(mesh_lib.DATA_AXIS, None)
    # Non-divisible guard: embed_dim=64 doesn't divide by 48.
    specs48 = mesh_lib.fsdp_param_specs(frozen, 48)
    assert specs48["blocks"]["qkv"]["kernel"] == P()
    assert specs48["embed"]["kernel"] == P(mesh_lib.DATA_AXIS, None)
    # TP composition: model on the TP axis, data on the disjoint one.
    tp_specs = mesh_lib.fsdp_param_specs(frozen, 4, tensor_parallel=True)
    assert tp_specs["blocks"]["qkv"]["kernel"] == P(
        None, mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS)
    assert tp_specs["blocks"]["fc2"]["kernel"] == P(
        None, mesh_lib.MODEL_AXIS, mesh_lib.DATA_AXIS)
    # fsdp_size == 1 is a no-op (pure vit_param_specs).
    assert mesh_lib.fsdp_param_specs(frozen, 1)["blocks"]["qkv"][
        "kernel"] == P()


def test_fsdp_shards_reduce_per_device_bytes(setup):
    cfg, cc, params, cara = setup
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    frozen, _ = steps_lib.init_train_state(tx, params, cara)
    mesh = mesh_lib.make_mesh((8, 1))
    sharded = steps_lib.prepare_fsdp_frozen(frozen, mesh)
    k = sharded["blocks"]["qkv"]["kernel"]
    assert not k.sharding.is_fully_replicated
    local = k.addressable_shards[0].data
    assert local.size == k.size // 8
    # Values unchanged (round-trip through the sharded layout).
    np.testing.assert_array_equal(
        np.asarray(k), np.asarray(frozen["blocks"]["qkv"]["kernel"]))


def test_resolve_impls_fsdp_forces_xla(setup):
    cfg, cc, *_ = setup
    mesh = mesh_lib.make_mesh((8, 1))
    out = steps_lib._resolve_impls("fused", "fused", cc, mesh, cfg=cfg,
                                   fsdp=True)
    assert out == ("xla", "xla", False, False, False, True, False)
    # Without a >1 data axis fsdp is a no-op.
    out1 = steps_lib._resolve_impls("xla", "xla", cc, None, cfg=cfg,
                                    fsdp=True)
    assert out1[5] is False


def test_fsdp_train_matches_single_device(setup):
    """3 FSDP steps over an (8,1) mesh == 3 single-device steps."""
    cfg, cc, params, cara = setup
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    frozen, state = steps_lib.init_train_state(tx, params, cara)
    step_ref = jax.jit(steps_lib.make_train_step(
        cfg, cc, tx, attn_impl="xla", dense_impl="xla"))
    batches = [_batch(jax.random.key(10 + i), 16, cfg) for i in range(3)]
    rng = jax.random.key(7)
    ref_state = state
    for b in batches:
        ref_state, ref_metrics = step_ref(ref_state, frozen, b, rng)

    mesh = mesh_lib.make_mesh((8, 1))
    frozen_f = steps_lib.prepare_fsdp_frozen(frozen, mesh)
    state_f = mesh_lib.put_replicated(mesh, state)
    step_f = jax.jit(steps_lib.make_train_step(
        cfg, cc, tx, mesh=mesh, fsdp=True))
    for b in batches:
        state_f, metrics_f = step_f(
            state_f, frozen_f, mesh_lib.put_batch(mesh, b), rng)
    np.testing.assert_allclose(
        float(ref_metrics["loss"]), float(metrics_f["loss"]), rtol=1e-5)
    for name in ("A2", "P2", "R1"):
        np.testing.assert_allclose(
            np.asarray(ref_state.trainable["cara"][name]),
            np.asarray(state_f.trainable["cara"][name]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ref_state.trainable["head"]["kernel"]),
        np.asarray(state_f.trainable["head"]["kernel"]), atol=1e-6)


def test_fsdp_with_tensor_parallel(setup):
    """(4 data x 2 model) mesh with FSDP x Megatron specs on disjoint axes
    matches the single-device step."""
    cfg, cc, params, cara = setup
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    frozen, state = steps_lib.init_train_state(tx, params, cara)
    batch = _batch(jax.random.key(5), 16, cfg)
    rng = jax.random.key(7)
    step_ref = jax.jit(steps_lib.make_train_step(
        cfg, cc, tx, attn_impl="xla", dense_impl="xla"))
    ref_state, ref_metrics = step_ref(state, frozen, batch, rng)

    mesh = mesh_lib.make_mesh((4, 2))
    frozen_f = steps_lib.prepare_fsdp_frozen(frozen, mesh,
                                             tensor_parallel=True)
    k = frozen_f["blocks"]["qkv"]["kernel"]
    assert k.addressable_shards[0].data.size == k.size // 8
    state_f = mesh_lib.put_replicated(mesh, state)
    step_f = jax.jit(steps_lib.make_train_step(
        cfg, cc, tx, mesh=mesh, fsdp=True))
    state_f, metrics_f = step_f(
        state_f, frozen_f, mesh_lib.put_batch(mesh, batch), rng)
    np.testing.assert_allclose(
        float(ref_metrics["loss"]), float(metrics_f["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ref_state.trainable["cara"]["A2"]),
        np.asarray(state_f.trainable["cara"]["A2"]), atol=1e-6)


def test_fsdp_eval_matches(setup):
    cfg, cc, params, cara = setup
    batch = _batch(jax.random.key(6), 16, cfg)
    ref = jax.jit(steps_lib.make_eval_step(
        cfg, cc, attn_impl="xla", dense_impl="xla"))(params, cara, batch)

    mesh = mesh_lib.make_mesh((8, 1))
    frozen = {k: v for k, v in params.items() if k != "head"}
    frozen_f = steps_lib.prepare_fsdp_frozen(frozen, mesh)
    params_f = dict(frozen_f)
    params_f["head"] = jax.device_put(
        params["head"], NamedSharding(mesh, P()))
    step = jax.jit(steps_lib.make_eval_step(cfg, cc, mesh=mesh, fsdp=True))
    got = step(params_f, mesh_lib.put_replicated(mesh, cara),
               mesh_lib.put_batch(mesh, batch))
    assert float(ref[0]) == float(got[0])
    assert float(ref[1]) == float(got[1])


def test_fit_fsdp_e2e(setup):
    """loop.fit(fsdp=True) places the frozen tree sharded and trains."""
    from cara_tpu.train import loop as loop_lib

    cfg, cc, params, cara = setup
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=2)
    frozen, state = steps_lib.init_train_state(tx, params, cara)
    mesh = mesh_lib.make_mesh((8, 1))

    class _Loader:
        batch_size = 8

        def steps_per_epoch(self):
            return 2

        def __iter__(self):
            for i in range(2):
                yield _batch(jax.random.key(50 + i), 8, cfg)

    out = loop_lib.fit(
        cfg=cfg, cara_cfg=cc, frozen=frozen, state=state, tx=tx,
        train_loader=_Loader(), eval_loader=_Loader(),
        rng=jax.random.key(0),
        fit_cfg=loop_lib.FitConfig(epochs=1, eval_every=1, eval_start=1,
                                   log_every=100),
        mesh=mesh, fsdp=True)
    assert np.isfinite(out["last_loss"])
    k = out["frozen"]["blocks"]["qkv"]["kernel"]
    assert not k.sharding.is_fully_replicated


def test_planner_fsdp_rung():
    """A geometry whose replicated frozen doesn't fit but whose FSDP shard
    does must pick the fsdp rung (and emit --fsdp in the CLI flags)."""
    from cara_tpu.parallel import planner

    # num_heads=5 keeps every TP rung ineligible (heads % t != 0 for all
    # t | 8), isolating the fsdp rung; embed 1280 divides by dp=8.
    cfg = ViTConfig(image_size=224, patch_size=14, embed_dim=1280, depth=32,
                    num_heads=5, num_classes=100)
    cc = CaraConfig(rank=8, scale=1.0, l_mu=1.0, l_std=0.0)
    est_dp = planner.estimate_memory(cfg, cc, 8, dp=8)
    est_fsdp = planner.estimate_memory(cfg, cc, 8, dp=8, fsdp=8)
    assert est_fsdp.frozen_params < est_dp.frozen_params / 4
    # Budget between the two estimates forces the fsdp rung.
    budget_gb = (est_fsdp.total + est_dp.total) / 2 / 2**30 / 0.85
    plan = planner.plan_mesh(cfg, cc, 8, 8, hbm_gb=budget_gb)
    assert plan.fits and plan.kind == "fsdp"
    assert "--fsdp" in plan.cli_flags()
    assert plan.cli_flags().startswith("--mesh 8,1")
