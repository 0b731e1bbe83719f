"""Pipeline x tensor parallelism: the (data, stage, model) 3-D mesh.

Each pipeline stage's ``(L/S, ...)`` block shard is additionally
head-/hidden-sharded over the ``model`` axis and runs the UNCHANGED
megakernels with ``tp_axis`` (``models.vit._block``): every residual is
psum'd over ``model``, so the resident activation stays model-replicated
and the GPipe stage schedule is oblivious to T.  The fused-qkv head
permutation happens IN-GRAPH from the canonical layout — callers never
pre-permute (contrast ``steps.prepare_tp_frozen``).

Runs on the 8-virtual-CPU mesh with interpret-mode kernels: pp(2,2,2)
fused must match the plain single-device XLA path exactly (reg off).
"""

import numpy as np
import jax
import pytest

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.parallel.pipeline import make_pp_mesh, pp_vit_forward
from cara_tpu.train import pp as pp_lib
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
    kx, ky = jax.random.split(jax.random.key(5))
    y = jax.random.randint(ky, (16,), 0, 4)
    x = jax.random.normal(kx, (16, 16, 16, 3)) \
        + (y[:, None, None, None] - 2.0) * 0.5
    return cfg, cc, params, cara, x, y


def test_pp_tp_forward_matches_plain(setup):
    cfg, cc, params, cara, x, _ = setup
    ref = vit_lib.vit_forward(params, x, cfg, cara_params=cara, cara_cfg=cc,
                              train=False, attn_impl="xla", dense_impl="xla")
    mesh = make_pp_mesh((2, 2, 2))
    got = pp_vit_forward(params, x, cfg, mesh=mesh, microbatches=2,
                         cara_params=cara, cara_cfg=cc, train=False,
                         attn_impl="fused", dense_impl="fused")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               atol=2e-5, rtol=1e-5)


def test_pp_tp_train_step_matches_plain(setup):
    """3-step pp(2,2,2) fused trajectory == plain single-device XLA (reg
    off, fp32): grads of every CP factor + head assemble correctly through
    the shard_map transpose (dynamic-slice scatter + model/stage/data
    psums)."""
    cfg, cc, params, cara, x, y = setup
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    frozen, state0 = steps_lib.init_train_state(tx, params, cara)
    batch = {"image": x, "label": y}
    rng = jax.random.key(7)

    plain = jax.jit(steps_lib.make_train_step(
        cfg, cc, tx, attn_impl="xla", dense_impl="xla", remat=False))
    mesh = make_pp_mesh((2, 2, 2))
    pp = jax.jit(pp_lib.make_pp_train_step(
        cfg, cc, tx, mesh, microbatches=2, remat=False,
        attn_impl="fused", dense_impl="fused"))

    s_a, s_b = state0, state0
    for _ in range(3):
        s_a, m_a = plain(s_a, frozen, batch, rng)
        s_b, m_b = pp(s_b, frozen, batch, rng)
    assert np.isclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    for pa, pb in zip(
            jax.tree_util.tree_leaves_with_path(s_a.trainable),
            jax.tree_util.tree_leaves_with_path(s_b.trainable)):
        np.testing.assert_allclose(np.asarray(pa[1]), np.asarray(pb[1]),
                                   rtol=2e-5, atol=1e-6, err_msg=str(pa[0]))


def test_pp_tp_eval_step_matches(setup):
    cfg, cc, params, cara, x, y = setup
    batch = {"image": x, "label": y}
    single = jax.jit(steps_lib.make_eval_step(
        cfg, cc, attn_impl="xla", dense_impl="xla"))
    c0, t0 = single(params, cara, batch)
    mesh = make_pp_mesh((2, 2, 2))
    pp_eval = jax.jit(pp_lib.make_pp_eval_step(
        cfg, cc, mesh, microbatches=2,
        attn_impl="fused", dense_impl="fused"))
    c1, t1 = pp_eval(params, cara, batch)
    assert float(t0) == float(t1) == 16.0
    np.testing.assert_allclose(float(c0), float(c1), atol=1e-6)


def test_pp_tp_ineligible_raises(setup):
    cfg, cc, params, cara, x, _ = setup
    mesh = make_pp_mesh((2, 2, 2))
    # XLA impls under a model axis: _block's tp math is megakernel-only.
    with pytest.raises(ValueError, match="megakernel-only"):
        pp_vit_forward(params, x, cfg, mesh=mesh, microbatches=2,
                       cara_params=cara, cara_cfg=cc, train=False,
                       attn_impl="xla", dense_impl="xla")
    # Heads/hidden not divisible by the model-axis size.
    mesh8 = make_pp_mesh((1, 1, 8))
    with pytest.raises(ValueError, match="divisible"):
        pp_vit_forward(params, x, cfg, mesh=mesh8, microbatches=2,
                       cara_params=cara, cara_cfg=cc, train=False,
                       attn_impl="fused", dense_impl="fused")
    # Activation dropout forces the XLA attention path -> no fused TP.
    import dataclasses

    cfg_do = dataclasses.replace(cfg, dropout_rate=0.1)
    with pytest.raises(ValueError, match="dropout"):
        pp_vit_forward(params, x, cfg_do, mesh=mesh, microbatches=2,
                       cara_params=cara, cara_cfg=cc, train=True,
                       rng=jax.random.key(0),
                       attn_impl="fused", dense_impl="fused")


def test_pp_tp_circular_matches_plain(setup):
    """Circular schedule x tensor parallelism: (2,2,2) mesh, V=2 on a
    depth-4 geometry — stage shards are lap-contiguous AND head-/hidden-
    sharded; must match the plain single-device XLA path exactly and the
    GPipe V=1 pp x TP run bitwise."""
    import dataclasses

    cfg2, cc, params2, _, x, y = setup
    cfg = dataclasses.replace(cfg2, depth=4)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara = cara_lib.init_cara_params(jax.random.key(1), cfg, cc)
    for name in ("A2", "P2", "bias1", "bias2", "bias3"):
        cara[name] = 0.1 * jax.random.normal(
            jax.random.fold_in(jax.random.key(2), hash(name) % 1000),
            cara[name].shape)
    ref = vit_lib.vit_forward(params, x, cfg, cara_params=cara, cara_cfg=cc,
                              train=False, attn_impl="xla", dense_impl="xla")
    mesh = make_pp_mesh((2, 2, 2))
    v1 = pp_vit_forward(params, x, cfg, mesh=mesh, microbatches=4,
                        cara_params=cara, cara_cfg=cc, train=False,
                        attn_impl="fused", dense_impl="fused")
    v2 = pp_vit_forward(params, x, cfg, mesh=mesh, microbatches=4,
                        cara_params=cara, cara_cfg=cc, train=False,
                        repeats=2, attn_impl="fused", dense_impl="fused")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(v2),
                               atol=2e-5, rtol=1e-5)
    assert np.array_equal(np.asarray(v1), np.asarray(v2))


def test_pp_tp_element_wd_smoke(setup):
    """Element weight dropout under pp x TP: per-shard hash masks are a
    different realization than single-device (documented, as on the plain
    fused-TP path) but the step must run, stay finite and move factors."""
    cfg, _, params, _, x, y = setup
    cc = CaraConfig(rank=4, scale=1.5, l_mu=1.0, l_std=0.0,
                    weight_dropout=0.3, weight_dropout_impl="element")
    cara = cara_lib.init_cara_params(jax.random.key(1), cfg, cc)
    for name in ("A2", "P2"):
        cara[name] = 0.1 * jax.random.normal(
            jax.random.fold_in(jax.random.key(2), len(name)),
            cara[name].shape)
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    frozen, state = steps_lib.init_train_state(tx, params, cara)
    mesh = make_pp_mesh((2, 2, 2))
    step = jax.jit(pp_lib.make_pp_train_step(
        cfg, cc, tx, mesh, microbatches=2, remat=False,
        attn_impl="fused", dense_impl="fused"))
    new_state, metrics = step(
        state, frozen, {"image": x, "label": y}, jax.random.key(7))
    assert np.isfinite(float(metrics["loss"]))
    for name in ("A1", "A2", "P3", "R1", "bias1", "bias3"):
        before = np.asarray(state.trainable["cara"][name])
        after = np.asarray(new_state.trainable["cara"][name])
        assert not np.array_equal(before, after), name
