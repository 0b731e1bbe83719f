"""Non-adapter control rows — ``--method linear`` (linear probe) and
``--method full`` (full fine-tuning): the two universal comparison rows of
every PEFT results table (the CaRA paper reports both; the reference repo
implements neither).

Coverage: empty-adapter init + plain-forward identity, trainable/frozen
split semantics, fp64 gradient parity of EVERY backbone weight vs
``torch.autograd`` (full fine-tuning), head-only updates (linear),
data-parallel equality on an 8-virtual-device mesh, checkpoint round-trip,
and the safety guards (fused megakernels emit no backbone-weight
cotangents; FSDP/pipeline exclusions).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.parallel import mesh as mesh_lib
from cara_tpu.train import steps as steps_lib

CFG = ViTConfig(
    image_size=16, patch_size=8, embed_dim=64, depth=2, num_heads=4,
    repr_size=None, num_classes=4, drop_path_rate=0.0)
LIN = CaraConfig(method="linear", weight_dropout=0.0)
FULL = CaraConfig(method="full", weight_dropout=0.0)


@pytest.fixture(scope="module")
def setup():
    params = vit_lib.init_vit_params(jax.random.key(0), CFG)
    key = jax.random.key(2)
    kx, ky = jax.random.split(key)
    y = jax.random.randint(ky, (8,), 0, 4)
    x = jax.random.normal(kx, (8, 16, 16, 3)) \
        + (y[:, None, None, None] - 2.0) * 0.5
    return params, {"image": x, "label": y}


def test_empty_adapter_and_plain_forward(setup):
    params, batch = setup
    for cc in (LIN, FULL):
        tree = cara_lib.init_cara_params(jax.random.key(1), CFG, cc)
        assert tree == {}
        assert cara_lib.count_params(tree) == 0
    y0 = vit_lib.vit_forward(params, batch["image"], CFG)
    # The step factories translate the empty tree to the plain forward.
    eval_step = jax.jit(steps_lib.make_eval_step(CFG, None))
    c, t = eval_step(params, None, batch)
    pred = jnp.argmax(y0, axis=-1)
    assert float(t) == 8.0
    assert float(c) == float(jnp.sum(pred == batch["label"]))


def test_trainable_split_and_counts(setup):
    params, _ = setup
    frozen, tr = steps_lib.split_trainable(params, {}, "linear")
    assert set(tr) == {"cara", "head"} and tr["cara"] == {}
    assert "head" not in frozen and "blocks" in frozen
    frozen_f, tr_f = steps_lib.split_trainable(params, {}, "full")
    assert frozen_f == {}
    assert set(tr_f) == {"cara", "head", "backbone"}
    # merge restores the exact original tree either way.
    for fz, t in ((frozen, tr), (frozen_f, tr_f)):
        merged = steps_lib.merge_params(fz, t)
        assert set(merged) == set(params)
        jax.tree_util.tree_map(np.testing.assert_array_equal,
                               merged, params)
    # Count semantics: linear = head, full = everything.
    n_head = sum(int(np.prod(v.shape)) for v in params["head"].values())
    n_all = sum(int(np.prod(v.shape))
                for v in jax.tree_util.tree_leaves(params))
    assert LIN.trainable_param_count(CFG) == n_head
    assert FULL.trainable_param_count(CFG) == n_all


def test_linear_probe_trains_only_the_head(setup):
    params, batch = setup
    tx = steps_lib.make_optimizer(1e-2, steps_per_epoch=100)
    frozen, state = steps_lib.init_train_state(tx, params, {}, "linear")
    step = jax.jit(steps_lib.make_train_step(CFG, LIN, tx))
    s = state
    losses = []
    for i in range(20):
        s, met = step(s, frozen, batch, jax.random.key(0))
        losses.append(float(met["loss"]))
    assert losses[-1] < losses[0]
    # The head moved; the frozen backbone is untouched by construction
    # (it never enters the optimizer) — assert via the merged trees.
    assert float(jnp.abs(s.trainable["head"]["kernel"]
                         - state.trainable["head"]["kernel"]).max()) > 0
    m0 = steps_lib.merge_params(frozen, state.trainable)
    m1 = steps_lib.merge_params(frozen, s.trainable)
    for k in ("blocks", "embed", "pos_embed", "norm"):
        jax.tree_util.tree_map(
            np.testing.assert_array_equal, m0[k], m1[k])


def test_full_ft_gradients_match_torch(setup):
    """fp64 gradients of EVERY backbone weight + head vs torch.autograd —
    the strongest correctness evidence for full fine-tuning (a fused-path
    regression that dropped dense-weight cotangents would fail here)."""
    import optax

    from tests.test_torch_parity import to_torch_tree, torch_reference_logits

    cfg = dataclasses.replace(CFG, repr_size=40)  # cover pre_logits too
    params = jax.device_get(vit_lib.init_vit_params(jax.random.key(3), cfg))
    params = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float64), params)
    rng = np.random.RandomState(5)
    x = rng.randn(4, 16, 16, 3)
    y = rng.randint(0, 4, size=(4,))

    # torch side: zero-delta CaRA tree so the replica is the PLAIN model
    # (A2 = P2 = 0 -> delta tensors identically zero).
    zero_cara = jax.device_get(cara_lib.init_cara_params(
        jax.random.key(1), cfg, CaraConfig(rank=2, weight_dropout=0.0)))
    tparams = to_torch_tree(params, requires_grad=True)
    tcara = to_torch_tree(zero_cara)
    loss_t = torch.nn.functional.cross_entropy(
        torch_reference_logits(tparams, tcara,
                               torch.tensor(x, dtype=torch.float64), cfg,
                               CaraConfig(rank=2, weight_dropout=0.0)),
        torch.tensor(y))
    loss_t.backward()

    with jax.enable_x64():
        def loss_fn(p):
            logits = vit_lib.vit_forward(p, jnp.asarray(x), cfg)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.asarray(y)).mean()

        loss_j, grads = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-12)

    def tree_paths(tree, prefix=""):
        for k, v in tree.items():
            name = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                yield from tree_paths(v, name)
            else:
                yield name, v

    tgrads = {name: leaf.grad for name, leaf in tree_paths(tparams)}
    checked = 0
    for name, g in tree_paths(grads):
        tg = tgrads[name]
        assert tg is not None, f"torch grad missing for {name}"
        np.testing.assert_allclose(
            np.asarray(g), tg.numpy(), rtol=1e-8, atol=1e-13,
            err_msg=f"backbone grad {name}")
        checked += 1
    # Every leaf of the model (2 blocks x 10 + embed/cls/pos/norm/head/
    # pre_logits) was compared.
    assert checked == len(jax.tree_util.tree_leaves(params))


def test_full_ft_train_step_and_dp_equality(setup):
    """One production train step updates backbone leaves; the 8-device
    data-parallel step reproduces it exactly (backbone grads psum
    correctly)."""
    params, batch = setup
    tx = steps_lib.make_optimizer(1e-2, steps_per_epoch=1, total_epochs=100)
    frozen, state = steps_lib.init_train_state(tx, params, {}, "full")
    assert frozen == {}
    step = steps_lib.make_train_step(CFG, FULL, tx)
    ref_state, ref_metrics = jax.jit(step)(
        state, frozen, batch, jax.random.key(7))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        ref_state.trainable["backbone"], state.trainable["backbone"])
    assert min(jax.tree_util.tree_leaves(moved)) > 0.0  # every leaf moved

    mesh = mesh_lib.make_mesh((8, 1))
    got_state, got_metrics = jax.jit(step)(
        mesh_lib.put_replicated(mesh, state),
        mesh_lib.put_replicated(mesh, frozen),
        mesh_lib.put_batch(mesh, batch), jax.random.key(7))
    np.testing.assert_allclose(float(ref_metrics["loss"]),
                               float(got_metrics["loss"]), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6),
        ref_state.trainable["backbone"], got_state.trainable["backbone"])


def test_full_ft_fsdp_matches_replicated(setup):
    """ZeRO full-FT: trainable backbone + AdamW moments sharded over the
    data axis produce the same step as the replicated run, and the result
    state keeps the sharded layout (params and moments per-device bytes
    / dp)."""
    from jax.sharding import PartitionSpec as P

    params, batch = setup
    tx = steps_lib.make_optimizer(1e-2, steps_per_epoch=1, total_epochs=100)
    frozen, state = steps_lib.init_train_state(tx, params, {}, "full")
    ref_state, ref_metrics = jax.jit(
        steps_lib.make_train_step(CFG, FULL, tx))(
        state, frozen, batch, jax.random.key(7))

    mesh = mesh_lib.make_mesh((8, 1))
    state_sh = steps_lib.prepare_fsdp_trainable_state(state, mesh)
    # The big kernels actually went sharded (data axis in the spec).
    qkv_spec = state_sh.trainable["backbone"]["blocks"]["qkv"][
        "kernel"].sharding.spec
    assert mesh_lib.DATA_AXIS in tuple(qkv_spec)
    fsdp_step = jax.jit(steps_lib.make_train_step(
        CFG, FULL, tx, mesh=mesh, fsdp=True))
    got_state, got_metrics = fsdp_step(
        state_sh, mesh_lib.put_replicated(mesh, frozen),
        mesh_lib.put_batch(mesh, batch), jax.random.key(7))
    np.testing.assert_allclose(float(ref_metrics["loss"]),
                               float(got_metrics["loss"]), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6),
        ref_state.trainable, got_state.trainable)
    # Output state preserved the ZeRO layout (the moments too).
    out_spec = got_state.trainable["backbone"]["blocks"]["qkv"][
        "kernel"].sharding.spec
    assert mesh_lib.DATA_AXIS in tuple(out_spec)
    mu = got_state.opt_state[0].mu["backbone"]["blocks"]["qkv"]["kernel"]
    assert mesh_lib.DATA_AXIS in tuple(mu.sharding.spec)


def test_full_ft_tensor_parallel_matches(setup):
    """Full FT on a (4 data x 2 model) mesh with Megatron-sharded
    TRAINABLE weights + moments == the single-device step (GSPMD inserts
    the collectives; fsdp=False keeps the data axis replicated)."""
    params, batch = setup
    tx = steps_lib.make_optimizer(1e-2, steps_per_epoch=1, total_epochs=100)
    frozen, state = steps_lib.init_train_state(tx, params, {}, "full")
    ref_state, ref_metrics = jax.jit(
        steps_lib.make_train_step(CFG, FULL, tx))(
        state, frozen, batch, jax.random.key(7))

    mesh = mesh_lib.make_mesh((4, 2))
    state_sh = steps_lib.prepare_fsdp_trainable_state(
        state, mesh, tensor_parallel=True, fsdp=False)
    spec = state_sh.trainable["backbone"]["blocks"]["qkv"][
        "kernel"].sharding.spec
    assert mesh_lib.MODEL_AXIS in tuple(spec)
    step = jax.jit(steps_lib.make_train_step(CFG, FULL, tx, mesh=mesh))
    got_state, got_metrics = step(
        state_sh, mesh_lib.put_replicated(mesh, frozen),
        mesh_lib.put_batch(mesh, batch), jax.random.key(7))
    np.testing.assert_allclose(float(ref_metrics["loss"]),
                               float(got_metrics["loss"]), rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-6),
        ref_state.trainable, got_state.trainable)


def test_full_ft_beats_linear_probe(setup):
    """On a task the head alone cannot fully solve, full FT reaches a lower
    loss than the probe given identical steps/lr — the expected ordering of
    the two control rows."""
    params, batch = setup
    results = {}
    for method, cc in (("linear", LIN), ("full", FULL)):
        tx = steps_lib.make_optimizer(1e-2, steps_per_epoch=100)
        frozen, state = steps_lib.init_train_state(tx, params, {}, method)
        step = jax.jit(steps_lib.make_train_step(CFG, cc, tx))
        s = state
        for _ in range(25):
            s, met = step(s, frozen, batch, jax.random.key(0))
        results[method] = float(met["loss"])
    assert results["full"] < results["linear"]


def test_checkpoint_roundtrip(tmp_path, setup):
    from cara_tpu.train import checkpoint as ckpt_lib

    params, batch = setup
    tx = steps_lib.make_optimizer(1e-2, steps_per_epoch=10)
    frozen, state = steps_lib.init_train_state(tx, params, {}, "full")
    step = jax.jit(steps_lib.make_train_step(CFG, FULL, tx))
    s, _ = step(state, frozen, batch, jax.random.key(0))
    merged = jax.device_get(steps_lib.merge_params(frozen, s.trainable))
    path = str(tmp_path / "full.npz")
    ckpt_lib.save_model(path, merged, None,
                        meta=dataclasses.asdict(FULL))
    p2, cara2, meta = ckpt_lib.load_model(path)
    assert cara2 is None and meta["method"] == "full"
    eval_step = jax.jit(steps_lib.make_eval_step(CFG, None))
    c1, _ = eval_step(merged, None, batch)
    c2, _ = eval_step(p2, None, batch)
    assert float(c1) == float(c2)
    # Resume round-trip carries the trainable backbone through the
    # orbax-style train-state artifact.
    ckpt_lib.save_train_state(str(tmp_path), 1, s)
    _, template = steps_lib.init_train_state(tx, params, {}, "full")
    restored, _ = ckpt_lib.restore_train_state(str(tmp_path), 1, template)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        restored.trainable, s.trainable)


def test_guards(setup):
    params, _ = setup
    tx = steps_lib.make_optimizer(1e-2, steps_per_epoch=10)
    # weight dropout has nothing to drop.
    with pytest.raises(ValueError, match="no delta weight"):
        CaraConfig(method="full", weight_dropout=0.1)
    # The megakernel VJPs emit no backbone-weight cotangents.
    with pytest.raises(ValueError, match="cotangent"):
        steps_lib.make_train_step(CFG, FULL, tx, dense_impl="fused")
    # The trainable-FSDP placement rejects adapter-style trees.
    _, st = steps_lib.init_train_state(tx, vit_lib.init_vit_params(
        jax.random.key(0), CFG), {}, "linear")
    with pytest.raises(ValueError, match="full-fine-tuning"):
        steps_lib.prepare_fsdp_trainable_state(
            st, mesh_lib.make_mesh((8, 1)))
    # Pipeline parallelism excluded for full.
    from cara_tpu.train import pp as pp_lib
    with pytest.raises(ValueError, match="pipeline"):
        pp_lib.make_pp_train_step(CFG, FULL, tx, mesh=None)


def test_linear_probe_under_pipeline():
    """Linear probe rides the pipeline schedule (empty tree -> plain
    forward) bit-identically to the single-device step."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from cara_tpu.parallel.pipeline import make_pp_mesh
    from cara_tpu.train import pp as pp_lib

    devices = jax.devices()[:2]

    params = vit_lib.init_vit_params(jax.random.key(0), CFG)
    key = jax.random.key(2)
    kx, ky = jax.random.split(key)
    y = jax.random.randint(ky, (8,), 0, 4)
    x = jax.random.normal(kx, (8, 16, 16, 3))
    batch = {"image": x, "label": y}
    tx = steps_lib.make_optimizer(1e-2, steps_per_epoch=10)
    frozen, state = steps_lib.init_train_state(tx, params, {}, "linear")
    ref_state, ref_metrics = jax.jit(
        steps_lib.make_train_step(CFG, LIN, tx, dense_impl="xla",
                                  attn_impl="xla"))(
        state, frozen, batch, jax.random.key(7))

    mesh = make_pp_mesh((1, 2), devices=devices)
    pp_step = jax.jit(pp_lib.make_pp_train_step(
        CFG, LIN, tx, mesh, microbatches=2))
    got_state, got_metrics = pp_step(
        mesh_lib.put_replicated(mesh, state),
        mesh_lib.put_replicated(mesh, frozen),
        mesh_lib.put_batch(mesh, batch), jax.random.key(7))
    np.testing.assert_allclose(float(ref_metrics["loss"]),
                               float(got_metrics["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ref_state.trainable["head"]["kernel"]),
        np.asarray(got_state.trainable["head"]["kernel"]), atol=1e-7)
