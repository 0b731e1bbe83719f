"""Mixture-of-expert adapters (models/moe.py) + expert parallelism.

The reference is a single-adapter method (SURVEY.md §0); MoE-CaRA is the
framework's MoE-LoRA-style generalization.  Anchors, on CPU + the
8-virtual-device mesh:

* routing math: top-k gates (renormalized, sparse), load-balance aux loss,
* EXACT equalities: forcing the router onto one expert reproduces the plain
  single-adapter forward bit-for-bit; identical experts make routing
  irrelevant,
* gradient isolation: unselected experts get exactly zero grads,
* expert parallelism: a (data, 1, 1, expert) mesh trains bit-consistently
  with the single device, experts sharded, batch over (data, expert),
* merge refusal, checkpoint round-trip, init statistics.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import moe as moe_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.parallel import mesh as mesh_lib
from cara_tpu.train import steps as steps_lib


@pytest.fixture(scope="module")
def setup():
    cfg = ViTConfig(
        image_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        mlp_ratio=2, repr_size=None, num_classes=8, drop_path_rate=0.0)
    cc = CaraConfig(rank=4, scale=1.5, l_mu=1.0, l_std=0.0,
                    weight_dropout=0.0, weight_dropout_impl="rank",
                    moe_experts=4, moe_top_k=2)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    mp = moe_lib.init_moe_params(jax.random.key(1), cfg, cc)
    # Non-zero contract modes so every expert's delta is active.
    mp["experts"]["A2"] = 0.1 * jax.random.normal(
        jax.random.key(2), mp["experts"]["A2"].shape)
    mp["experts"]["P2"] = 0.1 * jax.random.normal(
        jax.random.key(3), mp["experts"]["P2"].shape)
    return cfg, cc, params, mp


def _batch(key, n, cfg):
    kx, ky = jax.random.split(key)
    return {
        "image": jax.random.normal(
            kx, (n, cfg.image_size, cfg.image_size, 3), jnp.float32),
        "label": jax.random.randint(ky, (n,), 0, cfg.num_classes),
    }


def _forced_router(x, j, e):
    """Router params that route every token to expert j with gate 1."""
    return {"kernel": jnp.zeros((e, x)),
            "bias": jnp.where(jnp.arange(x) == j, 1e4, -1e4).astype(
                jnp.float32)}


def test_init_shapes_and_independence(setup):
    cfg, cc, _, mp = setup
    x = cc.moe_experts
    assert mp["experts"]["A1"].shape == (x, 3 * cfg.depth, cc.rank)
    assert mp["experts"]["R1"].shape == (x, cc.rank)
    assert mp["router"]["kernel"].shape == (cfg.embed_dim, x)
    # Experts are independent draws (orthogonal factors differ).
    a3 = np.asarray(mp["experts"]["A3"])
    assert np.abs(a3[0] - a3[1]).max() > 1e-3
    # Zero-init contract modes -> delta exactly 0 at step 0.
    fresh = moe_lib.init_moe_params(jax.random.key(9), cfg, cc)
    assert float(jnp.abs(fresh["experts"]["A2"]).max()) == 0.0
    assert float(jnp.abs(fresh["experts"]["P2"]).max()) == 0.0


def test_validate_rejects(setup):
    cfg, cc, *_ = setup
    with pytest.raises(ValueError, match="factorized"):
        moe_lib.validate_moe(dataclasses.replace(
            cc, delta_impl="materialized"))
    with pytest.raises(ValueError, match="cp_order"):
        moe_lib.validate_moe(dataclasses.replace(cc, cp_order=2))
    with pytest.raises(ValueError, match="moe_top_k"):
        moe_lib.validate_moe(dataclasses.replace(cc, moe_top_k=5))
    with pytest.raises(ValueError, match="rank"):
        moe_lib.validate_moe(
            dataclasses.replace(cc, weight_dropout=0.1,
                                weight_dropout_impl="element"), train=True)
    # eval ignores the dropout-impl restriction (dropout is off).
    moe_lib.validate_moe(
        dataclasses.replace(cc, weight_dropout=0.1,
                            weight_dropout_impl="element"), train=False)


def test_route_topk_and_aux():
    tokens = jax.random.normal(jax.random.key(0), (2, 5, 16))
    router = {"kernel": jax.random.normal(jax.random.key(1), (16, 6)),
              "bias": jnp.zeros((6,))}
    gates, aux = moe_lib.route(tokens, router, top_k=2)
    g = np.asarray(gates)
    assert g.shape == (2, 5, 6)
    # Exactly k nonzeros per token, summing to 1.
    assert ((g > 0).sum(-1) == 2).all()
    np.testing.assert_allclose(g.sum(-1), 1.0, rtol=1e-6)
    # Selected gates are proportional to the softmax probs.
    probs = np.asarray(jax.nn.softmax(
        np.asarray(tokens) @ np.asarray(router["kernel"]), axis=-1))
    top2 = np.sort(probs, -1)[..., -2:]
    np.testing.assert_allclose(
        np.sort(g, -1)[..., -2:], top2 / top2.sum(-1, keepdims=True),
        rtol=1e-5)
    # Uniform router -> aux exactly 1.0 (perfect balance).
    uni = {"kernel": jnp.zeros((16, 6)), "bias": jnp.zeros((6,))}
    _, aux_u = moe_lib.route(tokens, uni, top_k=2)
    np.testing.assert_allclose(float(aux_u), 1.0, rtol=1e-6)
    # Collapsed router -> aux == X (worst case for top-1).
    col = {"kernel": jnp.zeros((16, 6)),
           "bias": jnp.where(jnp.arange(6) == 3, 1e4, -1e4).astype(
               jnp.float32)}
    _, aux_c = moe_lib.route(tokens, col, top_k=1)
    np.testing.assert_allclose(float(aux_c), 6.0, rtol=1e-5)


def test_forced_expert_equals_single_adapter(setup):
    """Routing everything to expert j == the plain single-adapter forward
    with expert j's params — bit-exact (same ops, gate weight 1.0)."""
    cfg, cc, params, mp = setup
    x = _batch(jax.random.key(4), 2, cfg)["image"]
    cc_single = dataclasses.replace(cc, moe_experts=0)
    for j in (0, 2):
        forced = {"experts": mp["experts"],
                  "router": _forced_router(cc.moe_experts, j, cfg.embed_dim)}
        lo_moe, aux = vit_lib.vit_forward(
            params, x, cfg, cara_params=forced, cara_cfg=cc,
            train=False, attn_impl="xla", dense_impl="xla",
            return_moe_aux=True)
        single = jax.tree_util.tree_map(lambda a: a[j], mp["experts"])
        lo_ref = vit_lib.vit_forward(
            params, x, cfg, cara_params=single, cara_cfg=cc_single,
            train=False, attn_impl="xla", dense_impl="xla")
        np.testing.assert_array_equal(np.asarray(lo_moe), np.asarray(lo_ref))


def test_identical_experts_routing_invariant(setup):
    """All experts equal -> output equals the single adapter regardless of
    which experts the router picks."""
    cfg, cc, params, mp = setup
    x = _batch(jax.random.key(5), 2, cfg)["image"]
    tiled = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[0][None], a.shape), mp["experts"])
    lo_moe, _ = vit_lib.vit_forward(
        params, x, cfg, cara_params={"experts": tiled,
                                     "router": mp["router"]},
        cara_cfg=cc, train=False, attn_impl="xla", dense_impl="xla",
        return_moe_aux=True)
    single = jax.tree_util.tree_map(lambda a: a[0], mp["experts"])
    lo_ref = vit_lib.vit_forward(
        params, x, cfg, cara_params=single,
        cara_cfg=dataclasses.replace(cc, moe_experts=0),
        train=False, attn_impl="xla", dense_impl="xla")
    np.testing.assert_allclose(np.asarray(lo_moe), np.asarray(lo_ref),
                               atol=1e-5)


def test_unselected_expert_gets_zero_grads(setup):
    """With the router forced onto expert 0, experts 1..X-1 receive exactly
    zero gradient (their factors never touch the output or the aux loss)."""
    cfg, cc, params, mp = setup
    batch = _batch(jax.random.key(6), 4, cfg)
    forced = {"experts": mp["experts"],
              "router": _forced_router(cc.moe_experts, 0, cfg.embed_dim)}

    def loss(cara):
        lo, aux = vit_lib.vit_forward(
            params, batch["image"], cfg, cara_params=cara, cara_cfg=cc,
            train=False, attn_impl="xla", dense_impl="xla",
            return_moe_aux=True)
        ce = jnp.mean(jax.nn.log_softmax(lo)[
            jnp.arange(4), batch["label"]])
        return -ce + cc.moe_aux_coef * aux

    grads = jax.grad(loss)(forced)
    for name, g in grads["experts"].items():
        g = np.asarray(g)
        assert np.abs(g[1:]).max() == 0.0, f"{name} leaked grads"
        if name in ("A2", "P2", "P1", "A1"):
            assert np.abs(g[0]).max() > 0.0, f"{name}[0] has no grads"


def test_train_step_runs_and_router_learns(setup):
    cfg, cc, params, mp = setup
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    frozen, state = steps_lib.init_train_state(tx, params, mp)
    step = jax.jit(steps_lib.make_train_step(
        cfg, cc, tx, attn_impl="xla", dense_impl="xla"))
    r0 = np.asarray(state.trainable["cara"]["router"]["kernel"])
    rng = jax.random.key(7)
    for i in range(3):
        state, metrics = step(state, frozen, _batch(
            jax.random.key(20 + i), 8, cfg), rng)
    assert np.isfinite(float(metrics["loss"]))
    r1 = np.asarray(state.trainable["cara"]["router"]["kernel"])
    assert np.abs(r1 - r0).max() > 0  # router participates in training


def test_weight_dropout_rank_moe(setup):
    """Rank weight-dropout under MoE: train step runs; eval is identical
    with and without the dropout config (dropout off at eval)."""
    cfg, cc, params, mp = setup
    ccd = dataclasses.replace(cc, weight_dropout=0.25)
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    frozen, state = steps_lib.init_train_state(tx, params, mp)
    step = jax.jit(steps_lib.make_train_step(
        cfg, ccd, tx, attn_impl="xla", dense_impl="xla"))
    state, metrics = step(state, frozen, _batch(jax.random.key(8), 8, cfg),
                          jax.random.key(9))
    assert np.isfinite(float(metrics["loss"]))
    b = _batch(jax.random.key(10), 4, cfg)
    e1 = jax.jit(steps_lib.make_eval_step(cfg, cc))(params, mp, b)
    e2 = jax.jit(steps_lib.make_eval_step(cfg, ccd))(params, mp, b)
    assert float(e1[0]) == float(e2[0])


def test_expert_parallel_matches_single_device(setup):
    """(2 data, 1, 1, 4 expert) mesh: experts sharded over the expert axis,
    batch over (data, expert); 2 train steps match single device."""
    cfg, cc, params, mp = setup
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    frozen, state = steps_lib.init_train_state(tx, params, mp)
    batches = [_batch(jax.random.key(30 + i), 16, cfg) for i in range(2)]
    rng = jax.random.key(11)
    step_ref = jax.jit(steps_lib.make_train_step(
        cfg, cc, tx, attn_impl="xla", dense_impl="xla"))
    s_ref = state
    for b in batches:
        s_ref, m_ref = step_ref(s_ref, frozen, b, rng)

    mesh = mesh_lib.make_mesh((2, 1, 1, 4))
    s_ep = mesh_lib.put_replicated(mesh, state)
    s_ep = s_ep._replace(
        trainable=steps_lib.prepare_moe_trainable(s_ep.trainable, mesh))
    k = s_ep.trainable["cara"]["experts"]["A2"]
    assert not k.sharding.is_fully_replicated
    assert k.addressable_shards[0].data.shape[0] == 1  # 4 experts / 4
    frozen_ep = mesh_lib.put_replicated(mesh, frozen)
    step_ep = jax.jit(steps_lib.make_train_step(cfg, cc, tx, mesh=mesh))
    for b in batches:
        b_ep = mesh_lib.put_batch(mesh, b)
        assert b_ep["image"].sharding.spec == mesh_lib.batch_spec(mesh)
        s_ep, m_ep = step_ep(s_ep, frozen_ep, b_ep, rng)
    np.testing.assert_allclose(float(m_ref["loss"]), float(m_ep["loss"]),
                               rtol=1e-5)
    for name in ("A2", "P2", "R1"):
        np.testing.assert_allclose(
            np.asarray(s_ref.trainable["cara"]["experts"][name]),
            np.asarray(s_ep.trainable["cara"]["experts"][name]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_ref.trainable["cara"]["router"]["kernel"]),
        np.asarray(s_ep.trainable["cara"]["router"]["kernel"]), atol=1e-6)


def test_expert_axis_without_moe_rejected(setup):
    cfg, _, *_ = setup
    cc_plain = CaraConfig(rank=4, scale=1.0, l_mu=1.0, l_std=0.0)
    mesh = mesh_lib.make_mesh((2, 1, 1, 4))
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    with pytest.raises(ValueError, match="expert axis"):
        steps_lib.make_train_step(cfg, cc_plain, tx, mesh=mesh)


def test_moe_eval_step_and_merge_refusal(setup):
    cfg, cc, params, mp = setup
    b = _batch(jax.random.key(12), 8, cfg)
    correct, total = jax.jit(steps_lib.make_eval_step(cfg, cc))(params, mp, b)
    assert float(total) == 8.0
    from cara_tpu.models.merge import merge_cara

    with pytest.raises(ValueError, match="cannot be merged"):
        merge_cara(params, mp, cfg, cc)


def test_moe_checkpoint_roundtrip(setup, tmp_path):
    cfg, cc, params, mp = setup
    from cara_tpu.train import checkpoint as ckpt_lib

    path = str(tmp_path / "moe.npz")
    ckpt_lib.save_model(path, params, mp, meta=dataclasses.asdict(cc))
    p2, cara2, meta = ckpt_lib.load_model(path)
    assert meta["moe_experts"] == 4 and meta["moe_top_k"] == 2
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), mp, cara2)


def test_moe_serving_predictor(setup, tmp_path):
    """Predictor serves a MoE adapter checkpoint unmerged (merge auto-off)
    with logits identical to the raw forward; config inferred from meta."""
    cfg, cc, params, mp = setup
    from cara_tpu import serving
    from cara_tpu.train import checkpoint as ckpt_lib

    path = str(tmp_path / "moe_full.npz")
    ckpt_lib.save_model(path, params, mp, meta=dataclasses.asdict(cc))
    pred = serving.Predictor.from_checkpoint(
        path, cfg, merge=True, dtype=jnp.float32, batch_size=4)
    assert pred._cara is not None  # merge auto-disabled for MoE
    assert pred._cara_cfg.moe_experts == 4
    imgs = np.asarray(_batch(jax.random.key(13), 3, cfg)["image"])
    got = pred.logits(imgs)
    want = np.asarray(vit_lib.vit_forward(
        params, jnp.asarray(imgs), cfg, cara_params=mp, cara_cfg=cc,
        train=False, attn_impl="xla", dense_impl="xla"))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_moe_stablehlo_export_roundtrip(setup, tmp_path):
    """export_serialized embeds the UNMERGED MoE forward; the deserialized
    artifact reproduces the adapter logits with no model code."""
    cfg, cc, params, mp = setup
    from cara_tpu import serving

    blob = serving.export_serialized(
        params, cfg, cara_params=mp, cara_cfg=cc, batch_size=2,
        dtype=jnp.float32, platforms=("cpu",))
    from jax import export as jexport

    f = jexport.deserialize(bytearray(blob))
    imgs = _batch(jax.random.key(14), 2, cfg)["image"]
    got = np.asarray(f.call(jnp.asarray(imgs, jnp.float32)))
    want = np.asarray(vit_lib.vit_forward(
        params, imgs, cfg, cara_params=mp, cara_cfg=cc, train=False,
        attn_impl="xla", dense_impl="xla"))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_moe_multitask_refused(setup):
    cfg, cc, params, mp = setup
    from cara_tpu import serving

    with pytest.raises(ValueError, match="multi-task"):
        serving.MultiTaskPredictor(
            params, cfg,
            tasks={"a": {"cara": mp, "head": params["head"], "scale": 1.0}})


def test_infer_cara_cfg(setup):
    cfg, cc, params, mp = setup
    from cara_tpu.train import checkpoint as ckpt_lib

    got = ckpt_lib.infer_cara_cfg(mp, dataclasses.asdict(cc))
    assert got.moe_experts == 4 and got.moe_top_k == 2 and got.rank == 4
    assert got.weight_dropout_impl == "rank"
    # Plain tree still works; missing scale raises.
    single = jax.tree_util.tree_map(lambda a: a[0], mp["experts"])
    plain = ckpt_lib.infer_cara_cfg(single, {"scale": 2.0})
    assert plain.rank == 4 and plain.scale == 2.0 and not plain.moe
    with pytest.raises(ValueError, match="scale"):
        ckpt_lib.infer_cara_cfg(single, {})


def test_lambda_stats_moe(setup):
    from cara_tpu.utils.logging import MetricLogger

    *_, mp = setup
    out = MetricLogger(enabled=False).lambda_stats(jax.device_get(mp))
    assert np.isfinite(out["r1_mean"]) and np.isfinite(out["r2_std"])
