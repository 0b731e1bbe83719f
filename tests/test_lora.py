"""LoRA adapter method: init/zero-delta semantics, fused == XLA equality,
merge exactness, torch fp64 golden parity, training, checkpoint round-trip.

LoRA is the per-matrix baseline the CaRA paper compares against
(``/root/reference/README.rst:19``); it rides the same four injection
sites (``src/cara/cara.py:25-93``) and the same fused kernel / serving
stack (models/lora.py module docs).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import lora as lora_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.models.merge import merge_cara
from cara_tpu.train import steps as steps_lib

CFG = ViTConfig(
    image_size=16, patch_size=8, embed_dim=64, depth=2, num_heads=4,
    repr_size=None, num_classes=4, drop_path_rate=0.0)
LCFG = CaraConfig(method="lora", rank=4, scale=1.3, weight_dropout=0.0)


@pytest.fixture(scope="module")
def setup():
    params = vit_lib.init_vit_params(jax.random.key(0), CFG)
    lp = cara_lib.init_cara_params(jax.random.key(1), CFG, LCFG)
    # Nonzero B everywhere so every delta is live.
    lp = {s: dict(d, b=0.02 * jax.random.normal(
        jax.random.key(i + 10), d["b"].shape))
        for i, (s, d) in enumerate(lp.items())}
    x = jax.random.normal(jax.random.key(2), (4, 16, 16, 3))
    return params, lp, x


def test_shapes_and_count():
    shapes = lora_lib.lora_param_shapes(CFG, LCFG)
    L, e, hid, r = CFG.depth, CFG.embed_dim, CFG.hidden_dim, LCFG.rank
    assert shapes["qkv"] == {"a": (L, e, r), "b": (L, r, 3 * e)}
    assert shapes["fc2"] == {"a": (L, hid, r), "b": (L, r, e)}
    # per layer: qkv r(e+3e) + proj r(2e) + fc1 r(e+hid) + fc2 r(hid+e)
    want = L * r * (8 * e + 2 * hid)
    assert LCFG.trainable_param_count(CFG) == want
    lp = cara_lib.init_cara_params(jax.random.key(0), CFG, LCFG)
    assert lora_lib.is_lora_params(lp)
    assert cara_lib.count_params(lp) == want


def test_zero_delta_at_init(setup):
    """B = 0 at init (the LoRA convention) -> adapter forward == plain."""
    params, _, x = setup
    lp0 = cara_lib.init_cara_params(jax.random.key(1), CFG, LCFG)
    y0 = vit_lib.vit_forward(params, x, CFG)
    y1 = vit_lib.vit_forward(params, x, CFG, cara_params=lp0, cara_cfg=LCFG)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    # and every B leaf is exactly zero, A leaves are not
    for site in lora_lib.SITES:
        assert float(jnp.abs(lp0[site]["b"]).max()) == 0.0
        assert float(jnp.abs(lp0[site]["a"]).max()) > 0.0


def test_method_tree_mismatch_raises(setup):
    params, lp, x = setup
    with pytest.raises(ValueError, match="lora"):
        vit_lib.vit_forward(
            params, x, CFG, cara_params=lp,
            cara_cfg=dataclasses.replace(LCFG, method="cara"))
    cp = cara_lib.init_cara_params(
        jax.random.key(1), CFG, dataclasses.replace(LCFG, method="cara"))
    with pytest.raises(ValueError, match="per-site"):
        vit_lib.vit_forward(params, x, CFG, cara_params=cp, cara_cfg=LCFG)


def test_fused_matches_xla_eval(setup):
    params, lp, x = setup
    y_x = vit_lib.vit_forward(params, x, CFG, cara_params=lp, cara_cfg=LCFG,
                              attn_impl="xla", dense_impl="xla")
    y_f = vit_lib.vit_forward(params, x, CFG, cara_params=lp, cara_cfg=LCFG,
                              attn_impl="fused", dense_impl="fused")
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_x), atol=2e-5)


def test_fused_matches_xla_grads_rank_dropout(setup):
    """Training grads agree between the megakernel path and XLA under rank
    weight-dropout (the mask is a shared rank-space operand, so both impls
    see the identical regularizer)."""
    params, lp, x = setup
    cc = dataclasses.replace(LCFG, weight_dropout=0.25,
                             weight_dropout_impl="rank")

    def loss(lp_, ai, di):
        y = vit_lib.vit_forward(
            params, x, CFG, cara_params=lp_, cara_cfg=cc, train=True,
            rng=jax.random.key(5), attn_impl=ai, dense_impl=di)
        return jnp.sum(y ** 2)

    g_x = jax.grad(lambda p: loss(p, "xla", "xla"))(lp)
    g_f = jax.grad(lambda p: loss(p, "fused", "fused"))(lp)
    jax.tree_util.tree_map(
        lambda a_, b_: np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), atol=5e-4), g_x, g_f)


def test_element_dropout_grads_flow(setup):
    """Element weight-dropout (masks differ by construction between the
    in-kernel hash and the XLA threefry realization): both paths must run
    and produce nonzero grads on every leaf."""
    params, lp, x = setup
    cc = dataclasses.replace(LCFG, weight_dropout=0.25,
                             weight_dropout_impl="element")
    for ai, di in (("xla", "xla"), ("fused", "fused")):
        def loss(lp_):
            y = vit_lib.vit_forward(
                params, x, CFG, cara_params=lp_, cara_cfg=cc, train=True,
                rng=jax.random.key(5), attn_impl=ai, dense_impl=di)
            return jnp.sum(y ** 2)
        g = jax.grad(loss)(lp)
        for site, d in g.items():
            for k, v in d.items():
                assert float(jnp.linalg.norm(v)) > 0, (ai, site, k)


def test_merge_exactness(setup):
    """Eval delta is exactly linear -> the folded backbone reproduces the
    adapter forward (the LoRA analog of merge_cara; W += s * A @ B)."""
    params, lp, x = setup
    y_adapter = vit_lib.vit_forward(params, x, CFG, cara_params=lp,
                                    cara_cfg=LCFG)
    merged = merge_cara(params, lp, CFG, LCFG)
    y_merged = vit_lib.vit_forward(merged, x, CFG)
    np.testing.assert_allclose(
        np.asarray(y_merged), np.asarray(y_adapter), atol=2e-5)


def test_forward_matches_torch_reference(setup):
    """fp64 golden vs the independent torch replica with LoRA deltas."""
    from tests.test_torch_parity import torch_reference_forward

    params, lp, x = setup
    x_np = np.asarray(x, np.float64)
    want = torch_reference_forward(
        jax.device_get(params), jax.device_get(lp), x_np, CFG, LCFG)
    got = vit_lib.vit_forward(
        params, jnp.asarray(x_np, jnp.float32), CFG,
        cara_params=lp, cara_cfg=LCFG)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)


def test_train_step_learns(setup):
    """The production train step (optimizer over {cara: lora, head}) drives
    the loss down on a learnable synthetic task."""
    params, _, _ = setup
    lp0 = cara_lib.init_cara_params(jax.random.key(1), CFG, LCFG)
    tx = steps_lib.make_optimizer(1e-2, steps_per_epoch=10, total_epochs=100)
    frozen, state = steps_lib.init_train_state(tx, params, lp0)
    step = jax.jit(steps_lib.make_train_step(CFG, LCFG, tx))
    ky, kx = jax.random.split(jax.random.key(5))
    y = jax.random.randint(ky, (32,), 0, 4)
    xb = jax.random.normal(kx, (32, 16, 16, 3)) \
        + (y[:, None, None, None] - 2) * 0.5
    batch = {"image": xb, "label": y}
    rng = jax.random.key(7)
    state, m0 = step(state, frozen, batch, rng)
    for _ in range(15):
        state, m = step(state, frozen, batch, rng)
    assert float(m["loss"]) < float(m0["loss"])
    # LoRA B-factors moved away from zero.
    assert float(jnp.abs(state.trainable["cara"]["qkv"]["b"]).max()) > 0


def test_checkpoint_roundtrip_and_infer(tmp_path, setup):
    from cara_tpu.train import checkpoint as ckpt_lib

    params, lp, _ = setup
    meta = {"method": "lora", "scale": LCFG.scale,
            "weight_dropout": 0.0, "weight_dropout_impl": "element"}
    path = str(tmp_path / "lora.npz")
    ckpt_lib.save_model(path, params, lp, meta)
    p2, lp2, meta2 = ckpt_lib.load_model(path)
    jax.tree_util.tree_map(
        lambda a_, b_: np.testing.assert_array_equal(
            np.asarray(a_), np.asarray(b_)), lp, lp2)
    cc = ckpt_lib.infer_cara_cfg(lp2, meta2)
    assert cc.method == "lora" and cc.rank == LCFG.rank
    assert cc.scale == LCFG.scale
    # structural detection without the meta hint
    cc2 = ckpt_lib.infer_cara_cfg(lp2, {"scale": 2.0})
    assert cc2.method == "lora" and cc2.scale == 2.0


def test_data_parallel_matches_single_device(setup):
    """Fused DP shard_map == single device, same as the CaRA guarantee."""
    from cara_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) != 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    params, lp, _ = setup
    cc = dataclasses.replace(LCFG, weight_dropout=0.2,
                             weight_dropout_impl="rank")
    tx = steps_lib.make_optimizer(1e-2, steps_per_epoch=10, total_epochs=100)
    frozen, state = steps_lib.init_train_state(tx, params, lp)
    mesh = mesh_lib.make_mesh((8, 1))
    ky, kx = jax.random.split(jax.random.key(5))
    y = jax.random.randint(ky, (16,), 0, 4)
    xb = jax.random.normal(kx, (16, 16, 16, 3))
    batch = {"image": xb, "label": y}
    rng = jax.random.key(7)
    s1 = jax.jit(steps_lib.make_train_step(
        CFG, cc, tx, attn_impl="fused", dense_impl="fused"))
    sm = jax.jit(steps_lib.make_train_step(
        CFG, cc, tx, attn_impl="fused", dense_impl="fused", mesh=mesh))
    st1, m1 = s1(state, frozen, batch, rng)
    stm, mm = sm(state, frozen, batch, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(mm["loss"]),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a_, b_: np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), atol=1e-5),
        st1.trainable, stm.trainable)


def test_task_parallel_matches_sequential_lora(setup):
    """The task-parallel sweep stacks adapter trees generically — LoRA
    trees must keep the bit-identical-to-sequential guarantee."""
    from cara_tpu.train import task_parallel as tp_lib

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 virtual devices")
    params, _, _ = setup
    frozen = {k: v for k, v in params.items() if k != "head"}
    cc = dataclasses.replace(LCFG, weight_dropout=0.2,
                             weight_dropout_impl="rank")
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=2)
    T, seeds, num_real = 2, [11, 22], [3, 4]
    tasks = []
    for seed, n in zip(seeds, num_real):
        p = vit_lib.init_vit_params(jax.random.key(seed), CFG)
        lp0 = cara_lib.init_cara_params(jax.random.key(seed + 1), CFG, cc)
        lp0 = {s: dict(d, b=0.02 * jax.random.normal(
            jax.random.key(seed + 2), d["b"].shape))
            for s, d in lp0.items()}
        kx, ky = jax.random.split(jax.random.key(seed + 3))
        batches = [{
            "image": np.asarray(jax.random.normal(
                jax.random.fold_in(kx, i), (4, 16, 16, 3), np.float32)),
            "label": np.asarray(jax.random.randint(
                jax.random.fold_in(ky, i), (4,), 0, n)),
            "valid": np.ones(4, np.float32),
            "num_classes": np.int32(n),
            "delta_scale": np.float32(1.0 + seed / 100),
        } for i in range(2)]
        tasks.append(({"cara": lp0, "head": p["head"]}, batches))

    step_fn = jax.jit(steps_lib.make_train_step(CFG, cc, tx))
    seq = []
    for (trainable, batches), seed in zip(tasks, seeds):
        st = steps_lib.TrainState(
            jnp.zeros((), jnp.int32), trainable, tx.init(trainable))
        for b in batches:
            st, _ = step_fn(st, frozen, b, jax.random.key(seed))
        seq.append(jax.device_get(st).trainable)

    mesh = tp_lib.make_task_mesh(T, jax.devices()[:T])
    train_step = jax.jit(
        tp_lib.make_task_train_step(CFG, cc, tx, mesh),
        donate_argnums=(0,))
    states = [steps_lib.TrainState(
        jnp.zeros((), jnp.int32), tr, tx.init(tr)) for tr, _ in tasks]
    state = tp_lib.put_stacked(mesh, tp_lib.stack_trees(states))
    seeds_dev = jax.device_put(
        np.asarray(seeds, np.int32),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(tp_lib.TASK_AXIS)))
    for i in range(2):
        stacked = {k: np.stack([t[1][i][k] for t in tasks])
                   for k in tasks[0][1][0].keys()}
        state, _ = train_step(
            state, frozen, tp_lib.put_stacked(mesh, stacked), seeds_dev)
    host = jax.device_get(state)
    for i in range(T):
        jax.tree_util.tree_map(
            lambda a_, b_: np.testing.assert_array_equal(
                np.asarray(a_), np.asarray(b_)),
            tp_lib.index_tree(host.trainable, i), seq[i])


def test_multitask_predictor_stacks_lora(setup):
    from cara_tpu.serving import MultiTaskPredictor, Predictor

    params, lp, x = setup
    lp_b = {s: dict(d, b=0.03 * jax.random.normal(
        jax.random.key(i + 40), d["b"].shape))
        for i, (s, d) in enumerate(lp.items())}
    tasks = {
        "t0": {"cara": lp, "head": params["head"], "scale": LCFG.scale},
        "t1": {"cara": lp_b, "head": params["head"], "scale": 0.7},
    }
    mp = MultiTaskPredictor(params, CFG, tasks, batch_size=4,
                            dtype=jnp.float32)
    imgs = np.asarray(x, np.float32)
    for name, want_cc in (("t0", LCFG),
                          ("t1", dataclasses.replace(LCFG, scale=0.7))):
        single = Predictor(params, CFG, cara_params=tasks[name]["cara"],
                           cara_cfg=want_cc, merge=True, batch_size=4,
                           dtype=jnp.float32)
        np.testing.assert_allclose(
            mp.logits(imgs, name), single.logits(imgs), atol=2e-4)
