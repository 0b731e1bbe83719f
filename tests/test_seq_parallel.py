"""Sequence parallelism (token-axis GSPMD sharding, mesh (data,model,seq)).

The seq axis shards the (B, NP, E) token activations along NP via
``with_sharding_constraint`` (``vit_forward token_sharding``): LN and all
weight GEMMs stay row-parallel, attention gathers k/v internally — XLA
inserts the collectives.  For high-resolution geometries the (B,H,NP,NP)
score tensor is the memory axis; seq sharding divides it by the axis size.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.parallel import mesh as mesh_lib
from cara_tpu.train import steps as steps_lib


@pytest.fixture(scope="module")
def setup():
    cfg = ViTConfig(
        image_size=16, patch_size=4, embed_dim=64, depth=2, num_heads=4,
        repr_size=None, num_classes=4, drop_path_rate=0.0,
    )  # 16 patches + cls = 17 tokens (uneven over seq=4 — GSPMD pads)
    cc = CaraConfig(rank=4, scale=1.5, l_mu=1.0, l_std=0.0,
                    weight_dropout=0.0)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara = cara_lib.init_cara_params(jax.random.key(1), cfg, cc)
    x = jax.random.normal(jax.random.key(2), (8, 16, 16, 3), jnp.float32)
    y = jnp.arange(8) % 4
    return cfg, cc, params, cara, x, y


def test_seq_mesh_shape():
    mesh = mesh_lib.make_mesh((2, 1, 4))
    assert mesh.shape == {"data": 2, "model": 1, "seq": 4}
    assert mesh_lib.seq_size(mesh) == 4
    assert mesh_lib.seq_size(mesh_lib.make_mesh((8, 1))) == 1
    assert mesh_lib.seq_size(None) == 1


def test_resolve_forces_xla(setup):
    cfg, cc, *_ = setup
    mesh = mesh_lib.make_mesh((1, 1, 8))
    a, d, sm, tpf, sp, fsdp, ep = steps_lib._resolve_impls(
        "fused", "fused", cc, mesh, cfg=cfg)
    assert (a, d, sm, tpf, sp, fsdp, ep) == (
        "xla", "xla", False, False, True, False, False)


def test_seq_eval_matches_single_device(setup):
    cfg, cc, params, cara, x, y = setup
    ref_step = jax.jit(steps_lib.make_eval_step(
        cfg, cc, attn_impl="xla", dense_impl="xla"))
    batch = {"image": x, "label": y}
    ref = ref_step(params, cara, batch)
    for shape in ((1, 1, 8), (2, 1, 4), (2, 2, 2)):
        mesh = mesh_lib.make_mesh(shape)
        step = jax.jit(steps_lib.make_eval_step(cfg, cc, mesh=mesh))
        b = mesh_lib.put_batch(mesh, batch)
        out = step(params, cara, b)
        assert float(out[0]) == float(ref[0]), shape
        assert float(out[1]) == float(ref[1]), shape


def test_seq_sharding_actually_engages(setup):
    """On a seq-only mesh the compiled eval must contain gather/permute
    collectives for attention's k/v — evidence the tokens really are
    sharded rather than silently replicated."""
    cfg, cc, params, cara, x, y = setup
    mesh = mesh_lib.make_mesh((1, 1, 8))
    step = jax.jit(steps_lib.make_eval_step(cfg, cc, mesh=mesh))
    batch = mesh_lib.put_batch(mesh, {"image": x, "label": y})
    hlo = step.lower(params, cara, batch).compile().as_text()
    assert ("all-gather" in hlo or "all-to-all" in hlo
            or "collective-permute" in hlo), "no collectives: seq inert?"


def test_seq_train_matches_plain(setup):
    cfg, cc, params, cara, x, y = setup
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=2)
    frozen, state0 = steps_lib.init_train_state(tx, params, cara)
    batch = {"image": x, "label": y}
    rng = jax.random.key(3)
    plain = jax.jit(steps_lib.make_train_step(
        cfg, cc, tx, attn_impl="xla", dense_impl="xla"))
    mesh = mesh_lib.make_mesh((2, 1, 4))
    sp_step = jax.jit(steps_lib.make_train_step(cfg, cc, tx, mesh=mesh))
    b_sp = mesh_lib.put_batch(mesh, batch)
    s_a, s_b = state0, state0
    for _ in range(3):
        s_a, m_a = plain(s_a, frozen, batch, rng)
        s_b, m_b = sp_step(s_b, frozen, b_sp, rng)
    assert np.isclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_a.trainable),
                    jax.tree_util.tree_leaves(s_b.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)
