"""FacT adapter method (models/fact.py): tensor-train / Tucker factor
tuning — init/zero-delta semantics, expansion vs an independent
block-loop construction, fused == XLA equality, merge exactness, torch
fp64 forward + gradient parity, training, checkpoint round-trip,
multi-task serving.

FacT (Jie & Deng, AAAI 2023) is the shared-factor tensorisation family
CaRA generalizes (the reference implements only CaRA,
``src/cara/cara.py``); here it rides the same four injection sites and
the same kernel / merge / serving stack by collapsing to the per-site
LoRA tree in-trace.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import fact as fact_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.models.merge import merge_cara
from cara_tpu.train import steps as steps_lib

CFG = ViTConfig(
    image_size=16, patch_size=8, embed_dim=64, depth=2, num_heads=4,
    repr_size=None, num_classes=4, drop_path_rate=0.0)
TT = CaraConfig(method="fact_tt", rank=4, scale=1.3, weight_dropout=0.0)
TK = CaraConfig(method="fact_tk", rank=4, scale=1.3, weight_dropout=0.0,
                fact_core_rank=3)


def _live(fp, key=11):
    """Push the (zero-initialized) middle factor off zero so the deltas
    are active."""
    out = dict(fp)
    for name in ("G", "C"):
        if name in out:
            out[name] = 0.03 * jax.random.normal(
                jax.random.key(key), out[name].shape)
    return out


@pytest.fixture(scope="module")
def setup():
    params = vit_lib.init_vit_params(jax.random.key(0), CFG)
    x = jax.random.normal(jax.random.key(2), (4, 16, 16, 3))
    trees = {cc.method: _live(
        cara_lib.init_cara_params(jax.random.key(1), CFG, cc))
        for cc in (TT, TK)}
    return params, trees, x


def _expand_blocks_reference(fp, cfg):
    """Independent expansion: explicit per-layer / per-block numpy loops
    (no shared einsum strings with models/fact.py)."""
    e, hid, L = cfg.embed_dim, cfg.hidden_dim, cfg.depth
    n_fc = hid // e
    u = np.asarray(fp["U"], np.float64)
    v = np.asarray(fp["V"], np.float64)
    if "G" in fp:
        g = np.asarray(fp["G"], np.float64)
    else:
        p, c = np.asarray(fp["P"], np.float64), np.asarray(fp["C"],
                                                           np.float64)
        g = np.stack([np.stack([
            sum(p[l, s_, q] * c[q] for q in range(c.shape[0]))
            for s_ in range(p.shape[1])]) for l in range(L)])
    dense = {"qkv": [], "proj": [], "fc1": [], "fc2": []}
    for l in range(L):
        blocks = [u @ g[l, m] @ v.T for m in range(g.shape[1])]
        dense["qkv"].append(np.concatenate(blocks[0:3], axis=1))
        dense["proj"].append(blocks[3])
        dense["fc1"].append(
            np.concatenate(blocks[4:4 + n_fc], axis=1))
        dense["fc2"].append(
            np.concatenate(blocks[4 + n_fc:4 + 2 * n_fc], axis=0))
    return {k: np.stack(vv) for k, vv in dense.items()}


@pytest.mark.parametrize("cc", [TT, TK], ids=["tt", "tk"])
def test_shapes_and_count(cc):
    shapes = fact_lib.fact_param_shapes(CFG, cc)
    L, e, hid, r = CFG.depth, CFG.embed_dim, CFG.hidden_dim, cc.rank
    s = 4 + 2 * hid // e
    assert shapes["U"] == (e, r) and shapes["V"] == (e, r)
    if cc.method == "fact_tt":
        assert shapes["G"] == (L, s, r, r)
        want = 2 * e * r + L * s * r * r
    else:
        rl = cc.fact_core_rank
        assert shapes["P"] == (L, s, rl) and shapes["C"] == (rl, r, r)
        want = 2 * e * r + L * s * rl + rl * r * r
    assert cc.trainable_param_count(CFG) == want
    fp = cara_lib.init_cara_params(jax.random.key(0), CFG, cc)
    assert fact_lib.is_fact_params(fp)
    assert fact_lib.detect_method(fp) == cc.method
    assert cara_lib.count_params(fp) == want


@pytest.mark.parametrize("cc", [TT, TK], ids=["tt", "tk"])
def test_zero_delta_at_init_and_grad_flow(cc):
    """Middle factor zero at init -> forward == plain; the FIRST backward
    already populates it (dG = U^T dW V != 0 for random U, V)."""
    params = vit_lib.init_vit_params(jax.random.key(0), CFG)
    x = jax.random.normal(jax.random.key(2), (2, 16, 16, 3))
    fp0 = cara_lib.init_cara_params(jax.random.key(1), CFG, cc)
    y0 = vit_lib.vit_forward(params, x, CFG)
    y1 = vit_lib.vit_forward(params, x, CFG, cara_params=fp0, cara_cfg=cc)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    mid = "G" if cc.method == "fact_tt" else "C"
    assert float(jnp.abs(fp0[mid]).max()) == 0.0
    g = jax.grad(lambda p: jnp.sum(vit_lib.vit_forward(
        params, x, CFG, cara_params=p, cara_cfg=cc) ** 2))(fp0)
    assert float(jnp.linalg.norm(g[mid])) > 0


@pytest.mark.parametrize("cc", [TT, TK], ids=["tt", "tk"])
def test_expansion_matches_block_loops(setup, cc):
    """expand_to_lora's rank-space einsums == the explicit per-block
    ``U @ G_m @ V^T`` construction (fp64 numpy loops)."""
    _, trees, _ = setup
    fp = trees[cc.method]
    lora = fact_lib.expand_to_lora(fp, CFG, cc)
    want = _expand_blocks_reference(fp, CFG)
    for site in ("qkv", "proj", "fc1", "fc2"):
        got = np.einsum("lir,lro->lio",
                        np.asarray(lora[site]["a"], np.float64),
                        np.asarray(lora[site]["b"], np.float64))
        np.testing.assert_allclose(got, want[site], atol=1e-5)


def test_method_tree_mismatch_raises(setup):
    params, trees, x = setup
    with pytest.raises(ValueError, match="fact"):
        vit_lib.vit_forward(
            params, x, CFG, cara_params=trees["fact_tt"],
            cara_cfg=dataclasses.replace(TT, method="cara"))
    cp = cara_lib.init_cara_params(
        jax.random.key(1), CFG, dataclasses.replace(TT, method="cara"))
    with pytest.raises(ValueError, match="fact"):
        vit_lib.vit_forward(params, x, CFG, cara_params=cp, cara_cfg=TT)
    # geometry mismatch: a tree built for a different rank
    small = dataclasses.replace(TT, rank=2)
    fp2 = cara_lib.init_cara_params(jax.random.key(1), CFG, small)
    with pytest.raises(ValueError, match="geometry"):
        fact_lib.expand_to_lora(fp2, CFG, TT)


@pytest.mark.parametrize("cc", [TT, TK], ids=["tt", "tk"])
def test_fused_matches_xla_eval(setup, cc):
    params, trees, x = setup
    fp = trees[cc.method]
    y_x = vit_lib.vit_forward(params, x, CFG, cara_params=fp, cara_cfg=cc,
                              attn_impl="xla", dense_impl="xla")
    y_f = vit_lib.vit_forward(params, x, CFG, cara_params=fp, cara_cfg=cc,
                              attn_impl="fused", dense_impl="fused")
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_x), atol=2e-5)


@pytest.mark.parametrize("cc", [TT, TK], ids=["tt", "tk"])
def test_merge_exactness(setup, cc):
    params, trees, x = setup
    fp = trees[cc.method]
    y_adapter = vit_lib.vit_forward(params, x, CFG, cara_params=fp,
                                    cara_cfg=cc)
    merged = merge_cara(params, fp, CFG, cc)
    y_merged = vit_lib.vit_forward(merged, x, CFG)
    np.testing.assert_allclose(
        np.asarray(y_merged), np.asarray(y_adapter), atol=2e-5)


def _torch_expand(tfp, cfg):
    """Independent torch expansion to the lora tree (block loops,
    differentiable)."""
    import torch as th

    e, hid, L = cfg.embed_dim, cfg.hidden_dim, cfg.depth
    n_fc = hid // e
    u, v = tfp["U"], tfp["V"]
    if "G" in tfp:
        g = tfp["G"]
    else:
        g = th.einsum("lsp,pab->lsab", tfp["P"], tfp["C"])
    r = u.shape[1]
    tree = {s_: {"a": [], "b": []} for s_ in ("qkv", "proj", "fc1", "fc2")}
    for l in range(L):
        bl = [g[l, m] @ v.T for m in range(g.shape[1])]  # (r, e) each
        tree["qkv"]["a"].append(u)
        tree["qkv"]["b"].append(th.cat(bl[0:3], dim=1))
        tree["proj"]["a"].append(u)
        tree["proj"]["b"].append(bl[3])
        tree["fc1"]["a"].append(u)
        tree["fc1"]["b"].append(th.cat(bl[4:4 + n_fc], dim=1))
        tree["fc2"]["a"].append(th.cat(
            [u @ g[l, 4 + n_fc + m] for m in range(n_fc)], dim=0))
        tree["fc2"]["b"].append(v.T)
    del r
    return {s_: {"a": th.stack(d["a"]), "b": th.stack(d["b"])}
            for s_, d in tree.items()}


@pytest.mark.parametrize("cc", [TT, TK], ids=["tt", "tk"])
def test_forward_and_grads_match_torch(setup, cc):
    """fp64 golden vs torch: independent block-loop expansion feeding the
    independent torch ViT replica — forward logits AND gradients of every
    shared factor via torch.autograd."""
    import torch as th

    from tests.test_torch_parity import to_torch_tree, torch_reference_logits

    params, trees, x = setup
    fp = trees[cc.method]
    x_np = np.asarray(x, np.float64)
    tparams = to_torch_tree(jax.device_get(params))
    tfp = {k: th.tensor(np.asarray(v, np.float64), requires_grad=True)
           for k, v in fp.items()}
    lora_cfg = dataclasses.replace(cc, method="lora")
    tlogits = torch_reference_logits(
        tparams, _torch_expand(tfp, CFG),
        th.tensor(x_np, dtype=th.float64), CFG, lora_cfg)
    got = vit_lib.vit_forward(
        params, jnp.asarray(x_np, jnp.float32), CFG,
        cara_params=fp, cara_cfg=cc)
    np.testing.assert_allclose(
        np.asarray(got), tlogits.detach().numpy(), atol=5e-4)

    (tlogits ** 2).sum().backward()
    jg = jax.grad(lambda p: jnp.sum(vit_lib.vit_forward(
        params, x, CFG, cara_params=p, cara_cfg=cc) ** 2))(fp)
    for k in fp:
        tg = tfp[k].grad.numpy()
        np.testing.assert_allclose(
            np.asarray(jg[k], np.float64), tg,
            atol=2e-2 + 2e-3 * float(np.abs(tg).max()))


def test_train_step_learns(setup):
    params, _, _ = setup
    fp0 = cara_lib.init_cara_params(jax.random.key(1), CFG, TT)
    tx = steps_lib.make_optimizer(1e-2, steps_per_epoch=10, total_epochs=100)
    frozen, state = steps_lib.init_train_state(tx, params, fp0)
    step = jax.jit(steps_lib.make_train_step(CFG, TT, tx))
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
    assert float(jnp.abs(state.trainable["cara"]["G"]).max()) > 0


def test_checkpoint_roundtrip_and_infer(tmp_path, setup):
    from cara_tpu.train import checkpoint as ckpt_lib

    params, trees, _ = setup
    for cc in (TT, TK):
        fp = trees[cc.method]
        meta = {"method": cc.method, "scale": cc.scale,
                "weight_dropout": 0.0,
                "fact_core_rank": cc.fact_core_rank}
        path = str(tmp_path / f"{cc.method}.npz")
        ckpt_lib.save_model(path, params, fp, meta)
        _, fp2, meta2 = ckpt_lib.load_model(path)
        jax.tree_util.tree_map(
            lambda a_, b_: np.testing.assert_array_equal(
                np.asarray(a_), np.asarray(b_)), fp, fp2)
        icc = ckpt_lib.infer_cara_cfg(fp2, meta2)
        assert icc.method == cc.method and icc.rank == cc.rank
        assert icc.scale == cc.scale
        if cc.method == "fact_tk":
            assert icc.fact_core_rank == cc.fact_core_rank
        # structural detection without the meta hint
        icc2 = ckpt_lib.infer_cara_cfg(fp2, {"scale": 2.0})
        assert icc2.method == cc.method and icc2.scale == 2.0


def test_multitask_predictor_stacks_fact(setup):
    from cara_tpu.serving import MultiTaskPredictor, Predictor

    params, trees, x = setup
    fp = trees["fact_tt"]
    fp_b = _live(fp, key=40)
    tasks = {
        "t0": {"cara": fp, "head": params["head"], "scale": TT.scale},
        "t1": {"cara": fp_b, "head": params["head"], "scale": 0.7},
    }
    mp = MultiTaskPredictor(params, CFG, tasks, batch_size=4,
                            dtype=jnp.float32)
    imgs = np.asarray(x, np.float32)
    for name, want_cc in (("t0", TT), ("t1", dataclasses.replace(
            TT, scale=0.7))):
        single = Predictor(params, CFG, cara_params=tasks[name]["cara"],
                           cara_cfg=want_cc, merge=True, batch_size=4,
                           dtype=jnp.float32)
        np.testing.assert_allclose(
            mp.logits(imgs, name), single.logits(imgs), atol=2e-4)
    # mixed families refuse to stack
    lora_cc = CaraConfig(method="lora", rank=4, scale=1.0,
                         weight_dropout=0.0)
    lp = cara_lib.init_cara_params(jax.random.key(3), CFG, lora_cc)
    with pytest.raises(ValueError, match="famil"):
        MultiTaskPredictor(params, CFG, {
            "a": tasks["t0"],
            "b": {"cara": lp, "head": params["head"], "scale": 1.0},
        }, batch_size=4, dtype=jnp.float32)
