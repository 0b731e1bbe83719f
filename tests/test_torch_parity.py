"""Cross-framework golden test: the JAX forward must match an independent
torch implementation of the reference math (``src/cara/cara.py`` semantics:
materialized CP deltas, eval mode) given identical weights.

This is the strongest parity evidence available without the VTAB data /
pretrained checkpoint on disk: every layer's math (patch embed, LN, fused
qkv + 4-way CP delta, attention, proj + 3-way delta, MLP up/down deltas with
the transpose asymmetry, head) is validated end-to-end against torch.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import vit as vit_lib


def to_torch_tree(tree, requires_grad=False):
    """numpy/JAX pytree (nested dicts) -> torch float64 tensor tree."""
    import torch as th

    if isinstance(tree, dict):
        return {k: to_torch_tree(v, requires_grad) for k, v in tree.items()}
    t = th.tensor(np.asarray(tree), dtype=th.float64)
    if requires_grad:
        t.requires_grad_(True)
    return t


def torch_reference_forward(params, cara, x_np, cfg, cara_cfg):
    """Reference-math forward in torch (fp64 for a tight golden value)."""
    import torch as th

    logits = torch_reference_logits(
        to_torch_tree(params), to_torch_tree(cara),
        th.tensor(x_np, dtype=th.float64), cfg, cara_cfg)
    return logits.detach().numpy()


def torch_reference_logits(tparams, tcara, x, cfg, cara_cfg):
    """Differentiable torch-f64 reference forward over torch tensor trees.

    Same math as ``src/cara/cara.py`` eval mode; used both for the forward
    golden test (below) and the gradient / training-dynamics parity tests
    (``tests/test_torch_grad_parity.py``)."""
    import torch as th

    params, cara = tparams, tcara

    def t(a):
        return a

    e, h, d, mr = cfg.embed_dim, cfg.num_heads, cfg.head_dim, cfg.mlp_ratio
    s = cara_cfg.scale
    b = x.shape[0]
    p, g = cfg.patch_size, cfg.grid_size

    # Patch embed (reshape + matmul form).
    x = x.reshape(b, g, p, g, p, 3).permute(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, g * g, p * p * 3) @ t(params["embed"]["kernel"]) \
        + t(params["embed"]["bias"])
    cls = t(params["cls"]).expand(b, 1, e)
    x = th.cat([cls, x], dim=1) + t(params["pos_embed"])

    def ln(v, scale, bias):
        return th.nn.functional.layer_norm(
            v, (e,), t(scale), t(bias), eps=cfg.layernorm_eps)

    lora = "qkv" in cara and "A1" not in cara  # models.lora tree
    if lora:
        def site_T(li, site):
            """Dense per-layer LoRA delta weight A @ B (models/lora.py)."""
            return t(cara[site]["a"][li]) @ t(cara[site]["b"][li])

        b1 = th.zeros(e, dtype=th.float64)
        b2 = th.zeros(mr * e, dtype=th.float64)
        b3 = th.zeros(e, dtype=th.float64)
    else:
        P1, P2, P3 = (t(cara[k]) for k in ("P1", "P2", "P3"))
        R1, R2 = t(cara["R1"]), t(cara["R2"])
        b1, b2, b3 = t(cara["bias1"]), t(cara["bias2"]), t(cara["bias3"])

    def qkv_T(li):
        """This layer's materialized (3, E, E) QKV delta tensor, per CP
        order (inferred from which A-factors exist): order 4 =
        ``cara.py:26-32``; orders 5/3/2 = ``dim_experiment.py:264-295``."""
        A1 = t(cara["A1"])
        if "A5" in cara:   # order 5: (L, 3, E, H, Dh), 1 A1 row per layer
            T = th.einsum("r,lr,kr,er,hr,dr->lkehd", R1, A1[li:li + 1],
                          t(cara["A2"]), t(cara["A3"]), t(cara["A4"]),
                          t(cara["A5"]))[0]
            return T.reshape(3, e, e)
        f1 = A1[3 * li:3 * li + 3]
        if "A4" in cara:   # order 4 (published method)
            T = th.einsum("r,kr,er,hr,dr->kehd", R1, f1, t(cara["A2"]),
                          t(cara["A3"]), t(cara["A4"]))
            return T.reshape(3, e, e)
        if "A3" in cara:   # order 3: (3L, E, E)
            return th.einsum("r,kr,er,fr->kef", R1, f1, t(cara["A2"]),
                             t(cara["A3"]))
        # order 2: (3L, E*E)
        return th.einsum("r,kr,mr->km", R1, f1,
                         t(cara["A2"])).reshape(3, e, e)

    L = cfg.depth
    bp = params["blocks"]
    n = x.shape[1]
    for li in range(L):
        hin = ln(x, bp["ln1_scale"][li], bp["ln1_bias"][li])
        qkv = hin @ t(bp["qkv"]["kernel"][li]) + t(bp["qkv"]["bias"][li])
        # CP delta, materialized exactly like cara.py:26-35 (order per qkv_T);
        # LoRA: dense A @ B in the same fused-qkv column layout.
        if lora:
            T = site_T(li, "qkv").reshape(e, 3, e).permute(1, 0, 2)
        else:
            T = qkv_T(li)
        delta = th.einsum("bne,keo->bnko", hin, T)     # (B,N,3,E)
        qkv = qkv.reshape(b, n, 3, h, d) + delta.reshape(b, n, 3, h, d) * s
        q, k, v = (qkv[:, :, i].transpose(1, 2) for i in range(3))
        att = (q @ k.transpose(-2, -1)) * d ** -0.5
        att = att.softmax(-1)
        o = (att @ v).transpose(1, 2).reshape(b, n, e)
        proj = o @ t(bp["proj"]["kernel"][li]) + t(bp["proj"]["bias"][li])
        if lora:
            T2 = site_T(li, "proj").T
        else:
            p1 = P1[(1 + 2 * mr) * li:(1 + 2 * mr) * li + 1]
            T2 = th.einsum("r,ir,er,fr->ief", R2, p1, P2, P3).reshape(e, e)
        proj = proj + (o @ T2.T + b1) * s              # cara.py:57-58
        x = x + proj
        h2 = ln(x, bp["ln2_scale"][li], bp["ln2_bias"][li])
        up = h2 @ t(bp["fc1"]["kernel"][li]) + t(bp["fc1"]["bias"][li])
        if lora:
            Tu = site_T(li, "fc1").T
        else:
            base = (1 + 2 * mr) * li
            p1u = P1[base + 1:base + 1 + mr]
            Tu = th.einsum("r,ir,er,fr->ief", R2, p1u, P2,
                           P3).reshape(mr * e, e)
        up = up + (h2 @ Tu.T + b2) * s                 # cara.py:81-82
        act = th.nn.functional.gelu(up)
        down = act @ t(bp["fc2"]["kernel"][li]) + t(bp["fc2"]["bias"][li])
        if lora:
            Td = site_T(li, "fc2")
        else:
            p1d = P1[base + 1 + mr:base + 1 + 2 * mr]
            Td = th.einsum("r,ir,er,fr->ief", R2, p1d, P2,
                           P3).reshape(mr * e, e)
        down = down + (act @ Td + b3) * s              # cara.py:92-93 (no .T)
        x = x + down

    x = th.nn.functional.layer_norm(
        x, (e,), t(params["norm"]["scale"]), t(params["norm"]["bias"]),
        eps=cfg.layernorm_eps)
    feat = x[:, 0]
    if cfg.repr_size is not None:
        feat = th.tanh(feat @ t(params["pre_logits"]["kernel"])
                       + t(params["pre_logits"]["bias"]))
    return (feat @ t(params["head"]["kernel"])
            + t(params["head"]["bias"]))


def test_forward_matches_torch_reference_math():
    cfg = ViTConfig(
        image_size=16, patch_size=8, embed_dim=48, depth=3, num_heads=4,
        repr_size=40, num_classes=9, drop_path_rate=0.0, mlp_ratio=4)
    cara_cfg = CaraConfig(rank=5, scale=1.7, l_mu=1.2, l_std=0.1)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara = cara_lib.init_cara_params(jax.random.key(1), cfg, cara_cfg)
    # Non-trivial deltas everywhere.
    k = jax.random.key(2)
    for name in ("A2", "P2", "bias1", "bias2", "bias3"):
        k, sub = jax.random.split(k)
        cara[name] = 0.1 * jax.random.normal(sub, cara[name].shape)

    x_np = np.asarray(
        jax.random.normal(jax.random.key(3), (2, 16, 16, 3)), np.float64)

    want = torch_reference_forward(
        jax.device_get(params), jax.device_get(cara), x_np, cfg, cara_cfg)

    for impl in ("factorized", "materialized"):
        import dataclasses
        got = vit_lib.vit_forward(
            params, jnp.asarray(x_np, jnp.float32), cfg,
            cara_params=cara,
            cara_cfg=dataclasses.replace(cara_cfg, delta_impl=impl))
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-4), impl


@pytest.mark.parametrize("order,impl", [
    (5, "factorized"), (5, "materialized"),
    (3, "factorized"), (3, "materialized"),
    (2, "materialized"),   # order 2 has no rank-space contraction
])
def test_forward_matches_torch_other_cp_orders(order, impl):
    """dim_experiment's order-2/3/5 tensorisations vs the torch replica
    (reference: ``dim_experiment.py:264-295`` factor tables + private
    forwards)."""
    import dataclasses

    cfg = ViTConfig(
        image_size=16, patch_size=8, embed_dim=48, depth=3, num_heads=4,
        repr_size=40, num_classes=9, drop_path_rate=0.0, mlp_ratio=4)
    cara_cfg = CaraConfig(rank=5, scale=1.7, l_mu=1.2, l_std=0.1,
                          cp_order=order, delta_impl=impl)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara = cara_lib.init_cara_params(jax.random.key(1), cfg, cara_cfg)
    # Non-trivial values in every zero-initialized leaf (the zeroed
    # "embed/contract" factor differs per order: A3 at order 5, A2 else).
    k = jax.random.key(2)
    zero_factor = "A3" if order == 5 else "A2"
    for name in (zero_factor, "P2", "bias1", "bias2", "bias3"):
        k, sub = jax.random.split(k)
        cara[name] = 0.1 * jax.random.normal(sub, cara[name].shape)

    x_np = np.asarray(
        jax.random.normal(jax.random.key(3), (2, 16, 16, 3)), np.float64)
    want = torch_reference_forward(
        jax.device_get(params), jax.device_get(cara), x_np, cfg, cara_cfg)
    got = vit_lib.vit_forward(
        params, jnp.asarray(x_np, jnp.float32), cfg,
        cara_params=cara, cara_cfg=cara_cfg)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)
