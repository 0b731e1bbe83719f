"""Torch ``.pt`` checkpoint importer: the accuracy-parity ground-truth path.

The golden here is INDEPENDENT of the converter: ``_torch_sd_forward``
consumes the RAW timm-layout state dict with torch ops (F.conv2d patch
embed, ``x @ W.T`` linears, materialized CP deltas per ``src/cara/cara.py``),
so any transpose/layout bug in the importer shows up as a logits mismatch —
it cannot cancel out.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import torch_import
from cara_tpu.models import vit as vit_lib


def _make_timm_state_dict(cfg: ViTConfig, cara_cfg, seed=0, with_cara=True,
                          num_classes=9):
    """Random state dict in the exact timm-0.4.12 + set_cara layout
    (keys/shapes per ``src/cara/cara.py:112-125`` and timm ViT)."""
    g = torch.Generator().manual_seed(seed)
    e, L, p, mr = cfg.embed_dim, cfg.depth, cfg.patch_size, cfg.mlp_ratio
    h, d = cfg.num_heads, cfg.head_dim

    def rnd(*shape, s=0.1):
        return s * torch.randn(*shape, generator=g)

    sd = {
        "cls_token": rnd(1, 1, e),
        "pos_embed": rnd(1, cfg.seq_len, e),
        "patch_embed.proj.weight": rnd(e, cfg.in_chans, p, p),
        "patch_embed.proj.bias": rnd(e),
        "norm.weight": 1.0 + rnd(e),
        "norm.bias": rnd(e),
    }
    for i in range(L):
        pre = f"blocks.{i}."
        sd[pre + "norm1.weight"] = 1.0 + rnd(e)
        sd[pre + "norm1.bias"] = rnd(e)
        sd[pre + "attn.qkv.weight"] = rnd(3 * e, e)
        sd[pre + "attn.qkv.bias"] = rnd(3 * e)
        sd[pre + "attn.proj.weight"] = rnd(e, e)
        sd[pre + "attn.proj.bias"] = rnd(e)
        sd[pre + "norm2.weight"] = 1.0 + rnd(e)
        sd[pre + "norm2.bias"] = rnd(e)
        sd[pre + "mlp.fc1.weight"] = rnd(mr * e, e)
        sd[pre + "mlp.fc1.bias"] = rnd(mr * e)
        sd[pre + "mlp.fc2.weight"] = rnd(e, mr * e)
        sd[pre + "mlp.fc2.bias"] = rnd(e)
    if cfg.repr_size is not None:
        sd["pre_logits.fc.weight"] = rnd(cfg.repr_size, e)
        sd["pre_logits.fc.bias"] = rnd(cfg.repr_size)
    head_in = cfg.repr_size if cfg.repr_size is not None else e
    sd["head.weight"] = rnd(num_classes, head_in)
    sd["head.bias"] = rnd(num_classes)
    if with_cara:
        r = cara_cfg.rank
        sd.update({
            "CP_A1": rnd(3 * L, r), "CP_A2": rnd(e, r),
            "CP_A3": rnd(h, r), "CP_A4": rnd(d, r),
            "CP_P1": rnd((1 + 2 * mr) * L, r),
            "CP_P2": rnd(e, r), "CP_P3": rnd(e, r),
            "CP_R1": 1.0 + rnd(r), "CP_R2": 1.0 + rnd(r),
            "CP_bias1": rnd(e), "CP_bias2": rnd(mr * e), "CP_bias3": rnd(e),
        })
    return sd


def _torch_sd_forward(sd, x_np, cfg: ViTConfig, cara_cfg):
    """Forward in torch DIRECTLY from the state dict (timm semantics +
    reference CP math, eval mode, fp64)."""
    import torch.nn.functional as F

    t = {k: v.double() for k, v in sd.items()}
    e, h, d, mr, L = (cfg.embed_dim, cfg.num_heads, cfg.head_dim,
                      cfg.mlp_ratio, cfg.depth)
    s = cara_cfg.scale if cara_cfg else 0.0
    use_cara = "CP_R1" in t

    x = torch.tensor(x_np, dtype=torch.float64).permute(0, 3, 1, 2)  # NCHW
    x = F.conv2d(x, t["patch_embed.proj.weight"],
                 t["patch_embed.proj.bias"], stride=cfg.patch_size)
    b = x.shape[0]
    x = x.flatten(2).transpose(1, 2)                         # (B, N, E)
    x = torch.cat([t["cls_token"].expand(b, 1, e), x], 1) + t["pos_embed"]
    n = x.shape[1]

    for i in range(L):
        pre = f"blocks.{i}."
        hin = F.layer_norm(x, (e,), t[pre + "norm1.weight"],
                           t[pre + "norm1.bias"], cfg.layernorm_eps)
        qkv = F.linear(hin, t[pre + "attn.qkv.weight"],
                       t[pre + "attn.qkv.bias"])
        qkv = qkv.reshape(b, n, 3, h, d)
        if use_cara:
            f1 = t["CP_A1"][3 * i:3 * i + 3]
            T = torch.einsum("r,kr,er,hr,dr->kehd", t["CP_R1"], f1,
                             t["CP_A2"], t["CP_A3"], t["CP_A4"])
            delta = torch.einsum("bne,kehd->bnkhd", hin, T)
            qkv = qkv + delta * s
        q, k, v = (qkv[:, :, j].transpose(1, 2) for j in range(3))
        att = ((q @ k.transpose(-2, -1)) * d ** -0.5).softmax(-1)
        o = (att @ v).transpose(1, 2).reshape(b, n, e)
        proj = F.linear(o, t[pre + "attn.proj.weight"],
                        t[pre + "attn.proj.bias"])
        if use_cara:
            base = (1 + 2 * mr) * i
            p1 = t["CP_P1"][base:base + 1]
            T2 = torch.einsum("r,ir,er,fr->ief", t["CP_R2"], p1,
                              t["CP_P2"], t["CP_P3"]).reshape(e, e)
            proj = proj + (o @ T2.T + t["CP_bias1"]) * s     # cara.py:57-58
        x = x + proj
        h2 = F.layer_norm(x, (e,), t[pre + "norm2.weight"],
                          t[pre + "norm2.bias"], cfg.layernorm_eps)
        up = F.linear(h2, t[pre + "mlp.fc1.weight"], t[pre + "mlp.fc1.bias"])
        if use_cara:
            p1u = t["CP_P1"][base + 1:base + 1 + mr]
            Tu = torch.einsum("r,ir,er,fr->ief", t["CP_R2"], p1u,
                              t["CP_P2"], t["CP_P3"]).reshape(mr * e, e)
            up = up + (h2 @ Tu.T + t["CP_bias2"]) * s        # cara.py:81-82
        act = F.gelu(up)
        down = F.linear(act, t[pre + "mlp.fc2.weight"],
                        t[pre + "mlp.fc2.bias"])
        if use_cara:
            p1d = t["CP_P1"][base + 1 + mr:base + 1 + 2 * mr]
            Td = torch.einsum("r,ir,er,fr->ief", t["CP_R2"], p1d,
                              t["CP_P2"], t["CP_P3"]).reshape(mr * e, e)
            down = down + (act @ Td + t["CP_bias3"]) * s     # cara.py:92 no .T
        x = x + down

    x = F.layer_norm(x, (e,), t["norm.weight"], t["norm.bias"],
                     cfg.layernorm_eps)
    feat = x[:, 0]
    if cfg.repr_size is not None:
        feat = torch.tanh(F.linear(feat, t["pre_logits.fc.weight"],
                                   t["pre_logits.fc.bias"]))
    return F.linear(feat, t["head.weight"], t["head.bias"]).numpy()


CFG = ViTConfig(image_size=16, patch_size=8, embed_dim=48, depth=3,
                num_heads=4, repr_size=40, num_classes=9,
                drop_path_rate=0.0, mlp_ratio=4)
CARA = CaraConfig(rank=5, scale=1.7)


def test_import_matches_raw_torch_forward():
    sd = _make_timm_state_dict(CFG, CARA, seed=0)
    x_np = np.asarray(
        jax.random.normal(jax.random.key(3), (2, 16, 16, 3)), np.float64)
    want = _torch_sd_forward(sd, x_np, CFG, CARA)

    params, cara_params, info = torch_import.convert_torch_state_dict(sd, CFG)
    assert info == {"cp_order": 4, "rank": 5}
    for impl in ("materialized", "factorized"):
        got = vit_lib.vit_forward(
            params, jnp.asarray(x_np, jnp.float32), CFG,
            cara_params=cara_params,
            cara_cfg=dataclasses.replace(CARA, delta_impl=impl))
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-4,
                                   err_msg=impl)


def test_import_without_adapter():
    sd = _make_timm_state_dict(CFG, None, seed=1, with_cara=False)
    x_np = np.asarray(
        jax.random.normal(jax.random.key(4), (2, 16, 16, 3)), np.float64)
    want = _torch_sd_forward(sd, x_np, CFG, None)
    params, cara_params, info = torch_import.convert_torch_state_dict(sd, CFG)
    assert cara_params is None and info == {}
    got = vit_lib.vit_forward(params, jnp.asarray(x_np, jnp.float32), CFG)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)


def test_pt_file_roundtrip(tmp_path):
    sd = _make_timm_state_dict(CFG, CARA, seed=2)
    path = str(tmp_path / "ref_ckpt.pt")
    torch.save(sd, path)
    params, cara_params, info = torch_import.load_torch_checkpoint(path, CFG)
    x = jax.random.normal(jax.random.key(5), (2, 16, 16, 3))
    direct = torch_import.convert_torch_state_dict(sd, CFG)[0]
    a = vit_lib.vit_forward(params, x, CFG, cara_params=cara_params,
                            cara_cfg=CARA)
    b = vit_lib.vit_forward(direct, x, CFG,
                            cara_params=cara_params, cara_cfg=CARA)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_module_prefix_and_errors():
    sd = _make_timm_state_dict(CFG, CARA, seed=3)
    wrapped = {"module." + k: v for k, v in sd.items()}
    p1, c1, _ = torch_import.convert_torch_state_dict(wrapped, CFG)
    p2, c2, _ = torch_import.convert_torch_state_dict(sd, CFG)
    np.testing.assert_array_equal(np.asarray(p1["cls"]), np.asarray(p2["cls"]))
    # Missing key -> actionable error
    bad = dict(sd)
    del bad["blocks.1.attn.qkv.weight"]
    with pytest.raises(KeyError, match="blocks.1.attn.qkv.weight"):
        torch_import.convert_torch_state_dict(bad, CFG)
    # Wrong geometry -> shape error, not silent garbage
    with pytest.raises(ValueError, match="patch_embed"):
        torch_import.convert_torch_state_dict(
            sd, dataclasses.replace(CFG, patch_size=4))


def test_evaluate_cli_accepts_pt(tmp_path):
    """--evaluate <file>.pt drives the importer end-to-end (the released-
    checkpoint flow, README.rst:70 + vit_cp.py:168-173)."""
    from cara_tpu.cli import vit_cp as cli
    from cara_tpu.config import get_model_config

    cfg = get_model_config("vit_tiny_test", num_classes=10,
                           drop_path_rate=0.0)
    sd = _make_timm_state_dict(cfg, CaraConfig(rank=4), seed=4,
                               num_classes=10)
    path = str(tmp_path / "vit_svhn_ref.pt")
    torch.save(sd, path)
    args = ["--synthetic", "--dataset", "svhn", "--model", "vit_tiny_test",
            "--batch-size", "8", "--eval-batch-size", "8",
            "--synthetic-size", "32", "--dtype", "float32",
            "--backbone", str(tmp_path / "missing.npz"),
            "--out-dir", str(tmp_path), "--dim", "4",
            "--evaluate", path]
    acc = cli.main(args)
    assert 0.0 <= acc <= 1.0
    acc_merged = cli.main(args + ["--merged-eval"])
    assert acc_merged == pytest.approx(acc, abs=1e-6)


def test_export_cli_accepts_pt(tmp_path):
    """export --ckpt <file>.pt converts the released torch artifact in
    memory, then exports adapter/merged like any native checkpoint (the
    torch artifact records no scale, so --scale is required)."""
    from cara_tpu.cli import export as export_cli
    from cara_tpu.config import get_model_config
    from cara_tpu.train import checkpoint as ckpt_lib

    cfg = get_model_config("vit_tiny_test", num_classes=10,
                           drop_path_rate=0.0)
    sd = _make_timm_state_dict(cfg, CaraConfig(rank=4), seed=5,
                               num_classes=10)
    pt = str(tmp_path / "vit_svhn_ref.pt")
    torch.save(sd, pt)

    with pytest.raises(SystemExit, match="scale"):
        export_cli.main(["--ckpt", pt, "--out", str(tmp_path / "x.npz"),
                         "--mode", "adapter", "--model", "vit_tiny_test"])

    out_a = str(tmp_path / "adapter.npz")
    export_cli.main(["--ckpt", pt, "--out", out_a, "--mode", "adapter",
                     "--model", "vit_tiny_test", "--scale", "2.0"])
    cara, head, meta = ckpt_lib.load_adapter(out_a)
    assert meta["scale"] == 2.0 and head is not None
    assert cara["R1"].shape == (4,)

    out_m = str(tmp_path / "merged.npz")
    export_cli.main(["--ckpt", pt, "--out", out_m, "--mode", "merged",
                     "--model", "vit_tiny_test", "--scale", "2.0"])
    merged, none_cara, meta = ckpt_lib.load_model(out_m)
    assert none_cara is None and meta["merged"]
    assert merged["head"]["kernel"].shape == (64, 10)

    # .pt straight to a deployment artifact.
    from cara_tpu.serving import ExportedPredictor

    out_h = str(tmp_path / "ref.hlo")
    export_cli.main(["--ckpt", pt, "--out", out_h, "--mode", "stablehlo",
                     "--model", "vit_tiny_test", "--scale", "2.0",
                     "--batch-size", "2", "--dtype", "float32",
                     "--platforms", "cpu"])
    ep = ExportedPredictor.from_file(out_h)
    assert ep.predict(np.random.RandomState(0).rand(
        3, cfg.image_size, cfg.image_size, 3).astype("f4")).shape == (3,)
