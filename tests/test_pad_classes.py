"""Padded-head sweep mode: logit masking by a runtime class count.

One static head shape serves every task (no per-task recompile); the true
count rides in the batch and masks trailing columns out of both the
cross-entropy and the argmax — must be EXACTLY the unpadded math."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.parallel import mesh as mesh_lib
from cara_tpu.train import steps as steps_lib

REAL, PADDED = 5, 16


def test_mask_equals_sliced_math():
    """softmax-CE + argmax on masked padded logits == on sliced logits."""
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(32, PADDED).astype(np.float32) * 3)
    labels = jnp.asarray(rng.randint(0, REAL, 32))
    batch = {"num_classes": jnp.int32(REAL)}
    masked = steps_lib.mask_padded_classes(logits, batch)

    ce_masked = optax.softmax_cross_entropy_with_integer_labels(
        masked, labels)
    ce_sliced = optax.softmax_cross_entropy_with_integer_labels(
        logits[:, :REAL], labels)
    np.testing.assert_allclose(ce_masked, ce_sliced, rtol=1e-6)
    np.testing.assert_array_equal(
        jnp.argmax(masked, -1), jnp.argmax(logits[:, :REAL], -1))
    # No-op without the batch key.
    np.testing.assert_array_equal(
        steps_lib.mask_padded_classes(logits, {}), logits)


@pytest.fixture(scope="module")
def tiny():
    cfg = ViTConfig(image_size=16, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, repr_size=None, num_classes=PADDED,
                    drop_path_rate=0.0)
    cara_cfg = CaraConfig(rank=4, scale=1.0, l_mu=1.0, l_std=0.0,
                          weight_dropout=0.0)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara_params = cara_lib.init_cara_params(jax.random.key(1), cfg, cara_cfg)
    return cfg, cara_cfg, params, cara_params


def _batch(cfg, n=16):
    rng = np.random.RandomState(1)
    return {
        "image": rng.randn(n, cfg.image_size, cfg.image_size, 3)
        .astype(np.float32),
        "label": rng.randint(0, REAL, n),
    }


def test_eval_step_never_predicts_padded_class(tiny):
    cfg, cara_cfg, params, cara_params = tiny
    b = _batch(cfg)
    b["num_classes"] = np.int32(REAL)
    ev = steps_lib.make_eval_step(cfg, cara_cfg)
    correct, total = jax.jit(ev)(params, cara_params, b)
    assert float(total) == len(b["label"])
    # Directly: masked argmax stays under REAL even with a random head.
    logits = vit_lib.vit_forward(params, jnp.asarray(b["image"]), cfg,
                                 cara_params=cara_params, cara_cfg=cara_cfg,
                                 train=False)
    pred = jnp.argmax(steps_lib.mask_padded_classes(
        logits, {"num_classes": jnp.int32(REAL)}), -1)
    assert int(pred.max()) < REAL
    assert int(jnp.argmax(logits, -1).max()) >= REAL  # padding WOULD win


def test_train_step_padded_runs_and_one_executable(tiny):
    """One compiled train step serves two tasks with different true class
    counts (the count is a traced operand, not a specialization)."""
    cfg, cara_cfg, params, cara_params = tiny
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=4)
    frozen, state = steps_lib.init_train_state(tx, params, cara_params)
    step = jax.jit(steps_lib.make_train_step(cfg, cara_cfg, tx))

    b = _batch(cfg)
    b5 = dict(b, num_classes=np.int32(REAL))
    b9 = dict(b, num_classes=np.int32(9))
    state, m5 = step(state, frozen, b5, jax.random.key(0))
    n0 = step._cache_size()
    state, m9 = step(state, frozen, b9, jax.random.key(0))
    assert step._cache_size() == n0  # no recompile for a new class count
    assert np.isfinite(float(m5["loss"])) and np.isfinite(float(m9["loss"]))
    # Fewer masked-out classes -> different (smaller or equal) loss, i.e.
    # the scalar is actually live in the computation.
    assert float(m5["loss"]) != float(m9["loss"])


def test_padded_batch_on_mesh(tiny):
    """put_batch replicates the 0-d class-count leaf and the sharded eval
    step matches the single-device result exactly."""
    cfg, cara_cfg, params, cara_params = tiny
    mesh = mesh_lib.make_mesh((8, 1))
    b = _batch(cfg)
    b["num_classes"] = np.int32(REAL)

    single = steps_lib.make_eval_step(cfg, cara_cfg)
    c0, t0 = jax.jit(single)(params, cara_params, b)

    dev = mesh_lib.put_batch(mesh, b)
    assert dev["num_classes"].shape == ()
    sharded = steps_lib.make_eval_step(cfg, cara_cfg, mesh=mesh,
                                      dense_impl="fused")
    c1, t1 = sharded(mesh_lib.put_replicated(mesh, params),
                     mesh_lib.put_replicated(mesh, cara_params), dev)
    assert float(c0) == float(c1) and float(t0) == float(t1)


def test_scale_override_matches_static(tiny):
    """vit_forward with a traced delta scale == the static-constant scale
    (compile sharing must not perturb the math)."""
    import dataclasses

    cfg, cara_cfg, params, cara_params = tiny
    rng = np.random.RandomState(3)
    # Init has A2/P2 zero (delta == 0); randomize so the scale is live.
    cara_params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.randn(*a.shape), a.dtype) * 0.05,
        cara_params)
    x = jnp.asarray(rng.randn(4, cfg.image_size, cfg.image_size, 3),
                    jnp.float32)
    static = vit_lib.vit_forward(
        params, x, cfg, cara_params=cara_params,
        cara_cfg=dataclasses.replace(cara_cfg, scale=3.7), train=False)
    overridden = vit_lib.vit_forward(
        params, x, cfg, cara_params=cara_params, cara_cfg=cara_cfg,
        train=False, scale_override=jnp.float32(3.7))
    np.testing.assert_array_equal(np.asarray(static),
                                  np.asarray(overridden))
    # And the scale is demonstrably live.
    assert not np.allclose(
        static, vit_lib.vit_forward(params, x, cfg,
                                    cara_params=cara_params,
                                    cara_cfg=cara_cfg, train=False))


def test_train_step_batch_scale_operand(tiny):
    """A batch-stamped delta_scale fully controls the train step: a step
    under (static bogus scale + stamped true scale) matches the step under
    the static true scale exactly."""
    import dataclasses

    cfg, cara_cfg, params, cara_params = tiny
    rng = np.random.RandomState(4)
    cara_params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.randn(*a.shape), a.dtype) * 0.05,
        cara_params)
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=4)
    b = _batch(cfg)

    def one_step(cc, batch):
        frozen, state = steps_lib.init_train_state(tx, params, cara_params)
        step = jax.jit(steps_lib.make_train_step(cfg, cc, tx))
        state, m = step(state, frozen, batch, jax.random.key(0))
        return float(m["loss"]), state

    loss_static, st_static = one_step(
        dataclasses.replace(cara_cfg, scale=2.5), b)
    loss_op, st_op = one_step(
        dataclasses.replace(cara_cfg, scale=999.0),
        dict(b, delta_scale=np.float32(2.5)))
    assert loss_static == loss_op
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, st_static.trainable,
        st_op.trainable)
