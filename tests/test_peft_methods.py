"""VPT / SSF / BitFit adapter methods (models/vpt.py, ssf.py, bitfit.py):
init semantics, zero/identity-delta anchors, torch fp64 forward + gradient
parity (independent replicas), merge exactness, training, checkpoint
round-trip with structural detection, serving, config validation.

These are the remaining published PEFT baselines in the CaRA paper's
comparison set (the reference implements only CaRA, ``src/cara/cara.py``);
all ride the framework's uniform method contract.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import bitfit as bitfit_lib
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import ssf as ssf_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.models import vpt as vpt_lib
from cara_tpu.models.merge import merge_cara
from cara_tpu.train import steps as steps_lib

CFG = ViTConfig(
    image_size=16, patch_size=8, embed_dim=64, depth=2, num_heads=4,
    repr_size=None, num_classes=4, drop_path_rate=0.0)
VPT_D = CaraConfig(method="vpt_deep", weight_dropout=0.0, vpt_tokens=4)
VPT_S = CaraConfig(method="vpt_shallow", weight_dropout=0.0, vpt_tokens=4)
SSF = CaraConfig(method="ssf", weight_dropout=0.0)
BITFIT = CaraConfig(method="bitfit", weight_dropout=0.0)
ALL = {c.method: c for c in (VPT_D, VPT_S, SSF, BITFIT)}


def _live(method, tree, key=11):
    """Push zero-initialized deltas off zero so the adapters are active."""
    if method != "bitfit":
        return tree
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(jax.random.key(key), len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [0.05 * jax.random.normal(k, leaf.shape)
                  for k, leaf in zip(keys, leaves)])


@pytest.fixture(scope="module")
def setup():
    params = vit_lib.init_vit_params(jax.random.key(0), CFG)
    x = jax.random.normal(jax.random.key(2), (4, 16, 16, 3))
    trees = {m: _live(m, cara_lib.init_cara_params(jax.random.key(1),
                                                   CFG, cc))
             for m, cc in ALL.items()}
    return params, trees, x


# ---------------------------------------------------------------- shapes


def test_shapes_and_counts():
    L, e, hid, p = CFG.depth, CFG.embed_dim, CFG.hidden_dim, 4
    assert VPT_D.trainable_param_count(CFG) == L * p * e
    assert VPT_S.trainable_param_count(CFG) == p * e
    # SSF: (g, b) per site; widths 3E + E + hid + E + E + E per layer,
    # plus embed + final norm (E each).
    per_layer = 2 * (3 * e + e + hid + e + e + e)
    assert SSF.trainable_param_count(CFG) == L * per_layer + 2 * 2 * e
    # BitFit: bias widths 3E + E + hid + E + E + E per layer + embed + norm.
    assert BITFIT.trainable_param_count(CFG) == (
        L * (3 * e + e + hid + e + e + e) + 2 * e)


@pytest.mark.parametrize("m", list(ALL), ids=list(ALL))
def test_detection(setup, m):
    _, trees, _ = setup
    tree = trees[m]
    assert vpt_lib.is_vpt_params(tree) == m.startswith("vpt")
    assert ssf_lib.is_ssf_params(tree) == (m == "ssf")
    assert bitfit_lib.is_bitfit_params(tree) == (m == "bitfit")
    if m.startswith("vpt"):
        assert vpt_lib.detect_method(tree) == m


# ------------------------------------------------- init-semantics anchors


def test_bitfit_zero_delta_at_init_and_grad_flow(setup):
    params, _, x = setup
    fp0 = cara_lib.init_cara_params(jax.random.key(1), CFG, BITFIT)
    y0 = vit_lib.vit_forward(params, x, CFG)
    y1 = vit_lib.vit_forward(params, x, CFG, cara_params=fp0,
                             cara_cfg=BITFIT)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    g = jax.grad(lambda t: jnp.sum(vit_lib.vit_forward(
        params, x, CFG, cara_params=t, cara_cfg=BITFIT) ** 2))(fp0)
    for leaf in jax.tree_util.tree_leaves(g):
        assert float(jnp.linalg.norm(leaf)) > 0


def test_ssf_identity_params_are_exact_noop(setup):
    params, _, x = setup
    ident = ssf_lib.identity_ssf_params(CFG)
    y0 = vit_lib.vit_forward(params, x, CFG)
    y1 = vit_lib.vit_forward(params, x, CFG, cara_params=ident,
                             cara_cfg=SSF)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_ssf_init_stats():
    """Official-release init: gamma ~ N(1, .02), beta ~ N(0, .02)."""
    big = ViTConfig(image_size=16, patch_size=8, embed_dim=256, depth=4,
                    num_heads=4, repr_size=None, num_classes=4)
    tree = ssf_lib.init_ssf_params(jax.random.key(0), big, SSF)
    g_all, b_all = [], []

    def walk(t):
        if set(t) == {"g", "b"} and not isinstance(t["g"], dict):
            g_all.append(np.asarray(t["g"]).ravel())
            b_all.append(np.asarray(t["b"]).ravel())
            return
        for v in t.values():
            walk(v)

    walk(tree)
    g = np.concatenate(g_all)
    b = np.concatenate(b_all)
    assert abs(g.mean() - 1.0) < 5e-3 and abs(g.std() - 0.02) < 5e-3
    assert abs(b.mean()) < 5e-3 and abs(b.std() - 0.02) < 5e-3


def test_vpt_init_matches_paper_bound():
    tree = cara_lib.init_cara_params(jax.random.key(1), CFG, VPT_D)
    v = np.sqrt(6.0 / (3 * CFG.patch_size ** 2 + CFG.embed_dim))
    p = np.asarray(tree["prompts"])
    assert p.shape == (CFG.depth, 4, CFG.embed_dim)
    assert np.abs(p).max() <= v and np.abs(p).max() > 0.5 * v


# ------------------------------------------------------- torch parity


def _zero_lora_tree(cfg):
    from cara_tpu.models.lora import lora_param_shapes

    shapes = lora_param_shapes(cfg, CaraConfig(method="lora", rank=2,
                                               weight_dropout=0.0))
    return {s: {k: np.zeros(v, np.float64) for k, v in d.items()}
            for s, d in shapes.items()}


def _torch_plain_logits(tparams, x, cfg):
    """Independent plain forward: the torch replica with a ZERO LoRA tree
    (tests/test_torch_parity.py) — validates SSF/BitFit merged weights."""
    from tests.test_torch_parity import to_torch_tree, torch_reference_logits

    lora_cfg = CaraConfig(method="lora", rank=2, scale=1.0,
                          weight_dropout=0.0)
    return torch_reference_logits(
        tparams, to_torch_tree(_zero_lora_tree(cfg)), x, cfg, lora_cfg)


@pytest.mark.parametrize("m", ["ssf", "bitfit"], ids=["ssf", "bitfit"])
def test_fold_matches_torch_plain_forward(setup, m):
    """Merged (folded) weights through the INDEPENDENT torch replica ==
    the JAX adapter path: validates the fold math end-to-end."""
    import torch as th

    from tests.test_torch_parity import to_torch_tree

    params, trees, x = setup
    cc = ALL[m]
    got = vit_lib.vit_forward(params, x, CFG, cara_params=trees[m],
                              cara_cfg=cc)
    merged = merge_cara(params, trees[m], CFG, cc)
    tlogits = _torch_plain_logits(
        to_torch_tree(jax.device_get(merged)),
        th.tensor(np.asarray(x, np.float64)), CFG)
    np.testing.assert_allclose(
        np.asarray(got), tlogits.detach().numpy(), atol=5e-4)


def _torch_vpt_logits(tparams, prompts, x, cfg, deep):
    """Independent torch VPT forward (fp64, differentiable): plain blocks
    with prompt insertion/replacement per the paper."""
    import torch as th

    e, h, d = cfg.embed_dim, cfg.num_heads, cfg.head_dim
    b = x.shape[0]
    p, g = cfg.patch_size, cfg.grid_size
    x = x.reshape(b, g, p, g, p, 3).permute(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, g * g, p * p * 3) @ tparams["embed"]["kernel"] \
        + tparams["embed"]["bias"]
    cls = tparams["cls"].expand(b, 1, e)
    x = th.cat([cls, x], dim=1) + tparams["pos_embed"]

    def ln(v, scale, bias):
        return th.nn.functional.layer_norm(v, (e,), scale, bias,
                                           eps=cfg.layernorm_eps)

    npr = prompts.shape[1]
    x = th.cat([x[:, :1], prompts[0].expand(b, npr, e), x[:, 1:]], dim=1)
    bp = tparams["blocks"]
    n = x.shape[1]
    for li in range(cfg.depth):
        if deep and li > 0:
            x = th.cat([x[:, :1], prompts[li].expand(b, npr, e),
                        x[:, 1 + npr:]], dim=1)
        hin = ln(x, bp["ln1_scale"][li], bp["ln1_bias"][li])
        qkv = hin @ bp["qkv"]["kernel"][li] + bp["qkv"]["bias"][li]
        qkv = qkv.reshape(b, n, 3, h, d)
        q, k, v = (qkv[:, :, i].transpose(1, 2) for i in range(3))
        att = ((q @ k.transpose(-2, -1)) * d ** -0.5).softmax(-1)
        o = (att @ v).transpose(1, 2).reshape(b, n, e)
        x = x + o @ bp["proj"]["kernel"][li] + bp["proj"]["bias"][li]
        h2 = ln(x, bp["ln2_scale"][li], bp["ln2_bias"][li])
        up = th.nn.functional.gelu(
            h2 @ bp["fc1"]["kernel"][li] + bp["fc1"]["bias"][li])
        x = x + up @ bp["fc2"]["kernel"][li] + bp["fc2"]["bias"][li]
    x = th.nn.functional.layer_norm(
        x, (e,), tparams["norm"]["scale"], tparams["norm"]["bias"],
        eps=cfg.layernorm_eps)
    return (x[:, 0] @ tparams["head"]["kernel"]
            + tparams["head"]["bias"])


@pytest.mark.parametrize("cc", [VPT_D, VPT_S], ids=["deep", "shallow"])
def test_vpt_forward_and_grads_match_torch(setup, cc):
    import torch as th

    from tests.test_torch_parity import to_torch_tree

    params, trees, x = setup
    tree = trees[cc.method]
    tparams = to_torch_tree(jax.device_get(params))
    tprompts = th.tensor(np.asarray(tree["prompts"], np.float64),
                         requires_grad=True)
    tlogits = _torch_vpt_logits(
        tparams, tprompts, th.tensor(np.asarray(x, np.float64)), CFG,
        deep=cc.method == "vpt_deep")
    got = vit_lib.vit_forward(params, x, CFG, cara_params=tree, cara_cfg=cc)
    np.testing.assert_allclose(
        np.asarray(got), tlogits.detach().numpy(), atol=5e-4)

    (tlogits ** 2).sum().backward()
    jg = jax.grad(lambda t: jnp.sum(vit_lib.vit_forward(
        params, x, CFG, cara_params=t, cara_cfg=cc) ** 2))(tree)
    tg = tprompts.grad.numpy()
    np.testing.assert_allclose(
        np.asarray(jg["prompts"], np.float64), tg,
        atol=2e-2 + 2e-3 * float(np.abs(tg).max()))


def test_vpt_deep_differs_from_shallow(setup):
    params, trees, x = setup
    yd = vit_lib.vit_forward(params, x, CFG, cara_params=trees["vpt_deep"],
                             cara_cfg=VPT_D)
    # A shallow run with the deep tree's first slice: layers > 0 see the
    # flowed-through tokens, not fresh prompts.
    ys = vit_lib.vit_forward(
        params, x, CFG,
        cara_params={"prompts": trees["vpt_deep"]["prompts"][:1]},
        cara_cfg=VPT_S)
    assert float(jnp.abs(yd - ys).max()) > 1e-4


# ------------------------------------------------------------ validation


def test_config_validation():
    with pytest.raises(ValueError, match="weight_dropout"):
        CaraConfig(method="ssf", weight_dropout=0.1)
    with pytest.raises(ValueError, match="vpt_tokens"):
        CaraConfig(method="vpt_deep", weight_dropout=0.0, vpt_tokens=0)
    with pytest.raises(ValueError, match="method"):
        CaraConfig(method="adapterx")


def test_tree_mismatch_and_geometry_raise(setup):
    params, trees, x = setup
    with pytest.raises(ValueError, match="prompts"):
        vit_lib.vit_forward(params, x, CFG, cara_params=trees["ssf"],
                            cara_cfg=VPT_D)
    with pytest.raises(ValueError, match="gamma"):
        vit_lib.vit_forward(params, x, CFG, cara_params=trees["bitfit"],
                            cara_cfg=SSF)
    # wrong prompt count for the config
    with pytest.raises(ValueError, match="geometry|prompt"):
        vit_lib.vit_forward(
            params, x, CFG, cara_params=trees["vpt_deep"],
            cara_cfg=dataclasses.replace(VPT_D, vpt_tokens=6))


def test_vpt_merge_raises(setup):
    params, trees, _ = setup
    with pytest.raises(ValueError, match="architectural"):
        merge_cara(params, trees["vpt_deep"], CFG, VPT_D)


# ------------------------------------------------------- fused kernels


@pytest.mark.parametrize("m", list(ALL), ids=list(ALL))
def test_fused_attention_matches_xla(setup, m):
    params, trees, x = setup
    cc = ALL[m]
    y_x = vit_lib.vit_forward(params, x, CFG, cara_params=trees[m],
                              cara_cfg=cc, attn_impl="xla",
                              dense_impl="xla")
    y_f = vit_lib.vit_forward(params, x, CFG, cara_params=trees[m],
                              cara_cfg=cc, attn_impl="fused",
                              dense_impl="xla")
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_x), atol=2e-5)


# -------------------------------------------------------------- training


@pytest.mark.parametrize("m", ["vpt_deep", "ssf", "bitfit"],
                         ids=["vpt", "ssf", "bitfit"])
def test_train_step_learns(setup, m):
    params, _, _ = setup
    cc = ALL[m]
    fp0 = cara_lib.init_cara_params(jax.random.key(1), CFG, cc)
    tx = steps_lib.make_optimizer(1e-2, steps_per_epoch=10,
                                  total_epochs=100)
    frozen, state = steps_lib.init_train_state(tx, params, fp0)
    step = jax.jit(steps_lib.make_train_step(CFG, cc, tx))
    ky, kx = jax.random.split(jax.random.key(5))
    y = jax.random.randint(ky, (32,), 0, 4)
    xb = jax.random.normal(kx, (32, 16, 16, 3)) \
        + (y[:, None, None, None] - 2) * 0.5
    batch = {"image": xb, "label": y}
    rng = jax.random.key(7)
    state, m0 = step(state, frozen, batch, rng)
    for _ in range(15):
        state, mt = step(state, frozen, batch, rng)
    assert float(mt["loss"]) < float(m0["loss"])


# ---------------------------------------------------- checkpoint/serving


def test_checkpoint_roundtrip_and_infer(tmp_path, setup):
    from cara_tpu.train import checkpoint as ckpt_lib

    params, trees, _ = setup
    for m, cc in ALL.items():
        fp = trees[m]
        meta = {"method": m, "scale": 1.0, "weight_dropout": 0.0,
                "vpt_tokens": cc.vpt_tokens}
        path = str(tmp_path / f"{m}.npz")
        ckpt_lib.save_model(path, params, fp, meta)
        _, fp2, meta2 = ckpt_lib.load_model(path)
        jax.tree_util.tree_map(
            lambda a_, b_: np.testing.assert_array_equal(
                np.asarray(a_), np.asarray(b_)), fp, fp2)
        icc = ckpt_lib.infer_cara_cfg(fp2, meta2)
        assert icc.method == m and icc.weight_dropout == 0.0
        if m.startswith("vpt"):
            assert icc.vpt_tokens == 4
        # structural detection without the meta hint
        icc2 = ckpt_lib.infer_cara_cfg(fp2, {})
        assert icc2.method == m


def test_predictor_paths(setup):
    from cara_tpu.serving import Predictor

    params, trees, x = setup
    imgs = np.asarray(x, np.float32)
    # VPT: merge=True silently falls back to the adapter path.
    pv = Predictor(params, CFG, cara_params=trees["vpt_deep"],
                   cara_cfg=VPT_D, merge=True, batch_size=4,
                   dtype=jnp.float32)
    want = vit_lib.vit_forward(params, x, CFG,
                               cara_params=trees["vpt_deep"],
                               cara_cfg=VPT_D)
    np.testing.assert_allclose(pv.logits(imgs), np.asarray(want),
                               atol=2e-4)
    # SSF/BitFit: merged Predictor == adapter-path forward.
    for m in ("ssf", "bitfit"):
        pm = Predictor(params, CFG, cara_params=trees[m], cara_cfg=ALL[m],
                       merge=True, batch_size=4, dtype=jnp.float32)
        want = vit_lib.vit_forward(params, x, CFG, cara_params=trees[m],
                                   cara_cfg=ALL[m])
        np.testing.assert_allclose(pm.logits(imgs), np.asarray(want),
                                   atol=2e-4)


def test_ssf_folds_into_quantized_backbone(setup):
    """gamma folds into the per-channel dequant scale: the quantized+SSF
    forward tracks the dense+SSF forward within quantization error."""
    from cara_tpu.models.quant import quantize_block_weights

    params, trees, x = setup
    qparams = quantize_block_weights(params, mode="w8")
    y_dense = vit_lib.vit_forward(params, x, CFG, cara_params=trees["ssf"],
                                  cara_cfg=SSF)
    y_quant = vit_lib.vit_forward(qparams, x, CFG,
                                  cara_params=trees["ssf"], cara_cfg=SSF)
    # int8 backbone error bound (same scale as test_quant's plain bound).
    assert float(jnp.abs(y_quant - y_dense).max()) < 0.5
    y_qplain = vit_lib.vit_forward(qparams, x, CFG)
    assert float(jnp.abs(y_quant - y_qplain).max()) > 1e-3
