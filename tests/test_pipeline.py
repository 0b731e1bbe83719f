"""Pipeline parallelism (GPipe over the layer scan) — exactness tests.

The pipeline's correctness claims (parallel/pipeline.py):
  * eval / reg-off forward is BIT-IDENTICAL to the single-device
    ``vit_forward`` at any (data, stage) mesh and microbatch count;
  * weight-dropout-only training (the reference regularizer, batch-shared
    masks) is also bit-identical — the per-layer key stream matches
    ``vit_forward``'s exactly;
  * with per-sample randomness (drop-path) the run is bit-identical
    ACROSS STAGE COUNTS at fixed microbatching (S=1 == S=4);
  * the pp train step reproduces the plain train step's trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # >5 min; deselect with -m 'not slow'

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.parallel.pipeline import (
    make_pp_mesh as _make_pp_mesh, pp_vit_forward)
from cara_tpu.train import pp as pp_lib
from cara_tpu.train import steps as steps_lib


def make_pp_mesh(shape, devices=None):
    """Sub-mesh helper: the public make_pp_mesh requires the shape to cover
    every visible device (same contract as make_mesh); tests exercise
    sub-meshes by passing the explicit device slice."""
    if devices is None:
        devices = jax.devices()[: shape[0] * shape[1]]
    return _make_pp_mesh(shape, devices=devices)


@pytest.fixture(scope="module")
def setup():
    cfg = ViTConfig(
        image_size=16, patch_size=8, embed_dim=64, depth=4, num_heads=4,
        repr_size=None, num_classes=4, drop_path_rate=0.0,
    )
    cc = CaraConfig(rank=4, scale=1.5, l_mu=1.0, l_std=0.0,
                    weight_dropout=0.0)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara = cara_lib.init_cara_params(jax.random.key(1), cfg, cc)
    x = jax.random.normal(jax.random.key(2), (8, 16, 16, 3), jnp.float32)
    y = jnp.arange(8) % 4
    return cfg, cc, params, cara, x, y


def test_forward_bitwise_vs_single_device(setup):
    """data=1 meshes: BIT-identical to vit_forward at any stage count and
    microbatching (same per-layer op shapes, same order).  Data-sharded
    meshes: GSPMD partitions the stem/head GEMMs into different tile
    shapes, so the contract there is 1-ulp-level closeness, not bits."""
    cfg, cc, params, cara, x, _ = setup
    ref = vit_lib.vit_forward(params, x, cfg, cara_params=cara, cara_cfg=cc,
                              train=False, attn_impl="xla", dense_impl="xla")
    for shape, m in (((1, 4), 2), ((1, 2), 4), ((1, 4), 8), ((1, 1), 1)):
        mesh = make_pp_mesh(shape)
        out = jax.jit(lambda p, c, xx: pp_vit_forward(
            p, xx, cfg, mesh=mesh, microbatches=m, cara_params=c,
            cara_cfg=cc, train=False))(params, cara, x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref),
                                      err_msg=f"mesh={shape} m={m}")
    for shape, m in (((2, 4), 4), ((4, 2), 2), ((8, 1), 1)):
        mesh = make_pp_mesh(shape)
        out = jax.jit(lambda p, c, xx: pp_vit_forward(
            p, xx, cfg, mesh=mesh, microbatches=m, cara_params=c,
            cara_cfg=cc, train=False))(params, cara, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"mesh={shape} m={m}")


def test_forward_plain_backbone(setup):
    """No adapter: the pipeline must handle cara_params=None."""
    cfg, _, params, _, x, _ = setup
    ref = vit_lib.vit_forward(params, x, cfg, train=False,
                              attn_impl="xla", dense_impl="xla")
    mesh = make_pp_mesh((2, 4))
    out = jax.jit(lambda p, xx: pp_vit_forward(
        p, xx, cfg, mesh=mesh, microbatches=2, train=False))(params, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_weight_dropout_train_bitwise(setup):
    """Weight dropout masks are batch-independent (reference cara.py:35) —
    the pipeline derives the identical per-layer key stream, so the whole
    training forward is bit-identical to vit_forward."""
    cfg, _, params, _, x, _ = setup
    cc = CaraConfig(rank=4, scale=1.5, l_mu=1.0, l_std=0.0,
                    weight_dropout=0.3, weight_dropout_impl="element")
    cara = cara_lib.init_cara_params(jax.random.key(1), cfg, cc)
    rng = jax.random.key(7)
    ref = vit_lib.vit_forward(params, x, cfg, cara_params=cara, cara_cfg=cc,
                              train=True, rng=rng, attn_impl="xla",
                              dense_impl="xla")
    mesh = make_pp_mesh((1, 4))
    out = jax.jit(lambda p, c, xx: pp_vit_forward(
        p, xx, cfg, mesh=mesh, microbatches=4, cara_params=c, cara_cfg=cc,
        train=True, rng=rng))(params, cara, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_stage_count_invariance_with_drop_path(setup):
    """Per-sample randomness folds (data idx, microbatch idx) — both
    stage-independent, so S=1 and S=4 pipelines are bit-identical even
    with drop-path + weight dropout active."""
    cfg0, _, params, _, x, _ = setup
    cfg = ViTConfig(**{**cfg0.__dict__, "drop_path_rate": 0.2})
    cc = CaraConfig(rank=4, scale=1.5, l_mu=1.0, l_std=0.0,
                    weight_dropout=0.3, weight_dropout_impl="element")
    cara = cara_lib.init_cara_params(jax.random.key(1), cfg, cc)
    rng = jax.random.key(11)

    def run(mesh, m):
        return jax.jit(lambda p, c, xx: pp_vit_forward(
            p, xx, cfg, mesh=mesh, microbatches=m, cara_params=c,
            cara_cfg=cc, train=True, rng=rng))(params, cara, x)

    a = run(make_pp_mesh((1, 1), devices=jax.devices()[:1]), 4)
    b = run(make_pp_mesh((1, 4), devices=jax.devices()[:4]), 4)
    c = run(make_pp_mesh((1, 2), devices=jax.devices()[:2]), 4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_pp_train_step_matches_plain(setup):
    """3 pp train steps == 3 plain train steps (reg off, fp32)."""
    cfg, cc, params, cara, x, y = setup
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=2)
    frozen, state0 = steps_lib.init_train_state(tx, params, cara)
    batch = {"image": x, "label": y}
    rng = jax.random.key(3)

    plain = jax.jit(steps_lib.make_train_step(
        cfg, cc, tx, attn_impl="xla", dense_impl="xla", remat=False))
    mesh = make_pp_mesh((2, 4))
    pp = jax.jit(pp_lib.make_pp_train_step(
        cfg, cc, tx, mesh, microbatches=4, remat=False))

    s_a, s_b = state0, state0
    for _ in range(3):
        s_a, m_a = plain(s_a, frozen, batch, rng)
        s_b, m_b = pp(s_b, frozen, batch, rng)
    assert np.isclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    fa = jax.tree_util.tree_leaves(s_a.trainable)
    fb = jax.tree_util.tree_leaves(s_b.trainable)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


def test_pp_train_step_grad_accum(setup):
    """pp grad_accum=2 == plain grad_accum=2 trajectory (reg off, fp32) —
    the CLI's --grad-accum must mean the same thing under --pipeline."""
    cfg, cc, params, cara, x, y = setup
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=2)
    frozen, state0 = steps_lib.init_train_state(tx, params, cara)
    batch = {"image": x, "label": y}
    rng = jax.random.key(3)

    plain = jax.jit(steps_lib.make_train_step(
        cfg, cc, tx, attn_impl="xla", dense_impl="xla", remat=False,
        grad_accum=2))
    mesh = make_pp_mesh((2, 2))
    pp = jax.jit(pp_lib.make_pp_train_step(
        cfg, cc, tx, mesh, microbatches=2, remat=False, grad_accum=2))

    s_a, s_b = state0, state0
    for _ in range(3):
        s_a, m_a = plain(s_a, frozen, batch, rng)
        s_b, m_b = pp(s_b, frozen, batch, rng)
    assert np.isclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_a.trainable),
                    jax.tree_util.tree_leaves(s_b.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


def test_pp_mesh_full_cover_contract():
    """Default-device make_pp_mesh must cover every visible device (same
    contract as make_mesh — silent truncation hides idle chips)."""
    n = len(jax.devices())
    assert n == 8
    with pytest.raises(ValueError, match="!= 8 devices"):
        _make_pp_mesh((1, 4))
    with pytest.raises(ValueError, match="devices"):
        _make_pp_mesh((2, 2), devices=jax.devices()[:2])


def test_pp_eval_step_valid_mask(setup):
    """Padded-class masking + valid mask through the pipelined eval step."""
    cfg, cc, params, cara, x, y = setup
    mesh = make_pp_mesh((2, 4))
    ev = jax.jit(pp_lib.make_pp_eval_step(cfg, cc, mesh, microbatches=2))
    valid = jnp.array([1, 1, 1, 1, 1, 1, 0, 0], jnp.float32)
    batch = {"image": x, "label": y, "valid": valid,
             "num_classes": jnp.int32(4)}
    correct, total = ev(params, cara, batch)
    ref = jax.jit(steps_lib.make_eval_step(
        cfg, cc, attn_impl="xla", dense_impl="xla"))(params, cara, batch)
    assert float(total) == 6.0
    assert float(correct) == float(ref[0])


def test_pp_shape_validation(setup):
    cfg, cc, params, cara, x, _ = setup
    mesh = make_pp_mesh((1, 8))  # depth 4 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        pp_vit_forward(params, x, cfg, mesh=mesh, microbatches=2,
                       cara_params=cara, cara_cfg=cc, train=False)
    mesh = make_pp_mesh((4, 2))
    with pytest.raises(ValueError, match="must split"):
        pp_vit_forward(params, x, cfg, mesh=mesh, microbatches=3,
                       cara_params=cara, cara_cfg=cc, train=False)


def test_circular_schedule_bitwise(setup):
    """repeats=V (circular/interleaved): bit-identical to GPipe V=1 and to
    vit_forward at data=1 — layers still run in ascending global order per
    microbatch and the key streams depend only on (microbatch, layer).
    Covers eval, weight-dropout + drop-path training, and S=4/V=1 vs
    S=2/V=2 cross-equality (same groups, different placement)."""
    cfg, cc, params, cara, x, _ = setup
    ref = vit_lib.vit_forward(params, x, cfg, cara_params=cara, cara_cfg=cc,
                              train=False, attn_impl="xla", dense_impl="xla")
    mesh2 = make_pp_mesh((1, 2))
    v1 = pp_vit_forward(params, x, cfg, mesh=mesh2, microbatches=4,
                        cara_params=cara, cara_cfg=cc, train=False)
    v2 = pp_vit_forward(params, x, cfg, mesh=mesh2, microbatches=4,
                        cara_params=cara, cara_cfg=cc, train=False,
                        repeats=2)
    assert np.array_equal(np.asarray(ref), np.asarray(v1))
    assert np.array_equal(np.asarray(v1), np.asarray(v2))

    mesh4 = make_pp_mesh((1, 4))
    s4 = pp_vit_forward(params, x, cfg, mesh=mesh4, microbatches=4,
                        cara_params=cara, cara_cfg=cc, train=False)
    # s4 and v2 live on different meshes — compare on host.
    assert np.array_equal(np.asarray(s4), np.asarray(v2))

    # Regularization on: same realization at any (S, V) split.
    import dataclasses

    cfg_t = dataclasses.replace(cfg, drop_path_rate=0.1)
    cc_t = CaraConfig(rank=4, scale=1.5, l_mu=1.0, l_std=0.0,
                      weight_dropout=0.3)
    cara_t = cara_lib.init_cara_params(jax.random.key(1), cfg_t, cc_t)
    r = jax.random.key(9)
    a = pp_vit_forward(params, x, cfg_t, mesh=mesh2, microbatches=4,
                       cara_params=cara_t, cara_cfg=cc_t, train=True, rng=r)
    b = pp_vit_forward(params, x, cfg_t, mesh=mesh2, microbatches=4,
                       cara_params=cara_t, cara_cfg=cc_t, train=True, rng=r,
                       repeats=2)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_circular_train_step_matches_gpipe(setup):
    """3-step trajectory: pp train step at V=2 == V=1 (exact same math,
    only the schedule differs)."""
    cfg, cc, params, cara, x, y = setup
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=2)
    frozen, state0 = steps_lib.init_train_state(tx, params, cara)
    batch = {"image": x, "label": y}
    rng = jax.random.key(3)
    mesh = make_pp_mesh((2, 2))
    g = jax.jit(pp_lib.make_pp_train_step(
        cfg, cc, tx, mesh, microbatches=2, remat=False))
    c = jax.jit(pp_lib.make_pp_train_step(
        cfg, cc, tx, mesh, microbatches=2, remat=False, repeats=2))
    s_a, s_b = state0, state0
    for _ in range(3):
        s_a, m_a = g(s_a, frozen, batch, rng)
        s_b, m_b = c(s_b, frozen, batch, rng)
    assert np.isclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-6)
    for pa, pb in zip(
            jax.tree_util.tree_leaves_with_path(s_a.trainable),
            jax.tree_util.tree_leaves_with_path(s_b.trainable)):
        np.testing.assert_allclose(np.asarray(pa[1]), np.asarray(pb[1]),
                                   rtol=1e-5, atol=1e-7, err_msg=str(pa[0]))


def test_circular_invalid_configs(setup):
    cfg, cc, params, cara, x, _ = setup
    mesh = make_pp_mesh((1, 2))
    # depth 4 % (S=2 * V=4) != 0
    with pytest.raises(ValueError, match="not divisible"):
        pp_vit_forward(params, x, cfg, mesh=mesh, microbatches=4,
                       cara_params=cara, cara_cfg=cc, train=False,
                       repeats=4)
    # circular needs M >= S
    with pytest.raises(ValueError, match="microbatches >= stages"):
        pp_vit_forward(params, x, cfg, mesh=mesh, microbatches=1,
                       cara_params=cara, cara_cfg=cc, train=False,
                       repeats=2)
