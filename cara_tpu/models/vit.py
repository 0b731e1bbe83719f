"""Functional Vision Transformer with CaRA CP adapters, built for XLA/TPU.

Replaces the reference's timm ViT + monkey-patched forwards
(``src/cara/cara.py:146-166`` patches ``Attention.forward``/``Mlp.forward`` and
reads adapter state off a module-global) with an explicit parameter pytree and
a pure forward function:

* All 12 (or ``depth``) transformer blocks are **stacked along a leading layer
  axis and executed with ``lax.scan``** — one compiled block body, layer
  weights streamed HBM->VMEM by XLA, and the CaRA "one tensor across layers"
  structure maps directly onto per-layer slices that ride the scan.
* Patch embedding is a reshape + matmul (mathematically identical to the
  reference's 16x16/stride-16 conv, but hits the MXU as a plain GEMM).
* The CP deltas plug into the same four sites as the reference hot loop
  (SURVEY.md section 3.3): qkv (``cara.py:25-42``), attention projection
  (``cara.py:50-58``), MLP up (``cara.py:75-82``), MLP down (``cara.py:87-93``).

Layout conventions: images are NHWC; linear kernels are (in, out) so the
forward is ``x @ W + b``; qkv kernel output axis is flattened (3, heads,
head_dim) to match the timm fused-qkv layout the npz converter produces.
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.ops import cp as cp_ops
from cara_tpu.ops.layers import drop_path, dropout, layer_norm, mha

Params = Dict[str, Any]

# Attention+projection epilogue fusion (attn_out never round-trips HBM in
# the forward).  MEASURED SLOWER on v5e (paired A/B, bs64 rank8: train step
# 90.1 vs 86.9 ms, eval fwd 28.3 vs 27.7 — benchmarks/RESULTS.md): the
# backward must re-read qkv (75 MB/layer) to recompute attn_out for the
# factor grads, which outweighs the 50 MB/layer forward saving, and even
# forward-only the coarse (B/bb)-program grid pipelines worse than the
# two-kernel split.  Kept behind CARA_ATTNPROJ=1 for future shapes.
_ATTNPROJ = os.environ.get("CARA_ATTNPROJ", "0") == "1"

# MLP block megakernel (LN2 -> fc1+delta -> GELU -> fc2+delta in one
# pallas_call; the (B, N, 4E) hidden activation never exists in HBM, fwd or
# bwd — docs/DESIGN.md section 8 roofline lever).  Paired A/B at bs64 rank8:
# 92.6 vs 103.0 ms/step (element dropout), 75.0 vs 82.2 (rank).
# CARA_MLP_MEGA=0 falls back to the two-kernel cp_dense stack.
_MLP_MEGA = os.environ.get("CARA_MLP_MEGA", "1") == "1"

# Attention block megakernel (LN1 -> qkv+delta -> attention -> proj+delta in
# one pallas_call; qkv and attn_out never exist in HBM).  Unlike the rejected
# attention+proj epilogue fusion its backward keeps only the raw x residual
# and recomputes qkv in VMEM.  Paired A/B at bs64 rank8 (same session):
# element dropout 86.8 vs 92.6 ms/step (WIN — the split path pays an extra
# dT stream), rank dropout 75.7 vs 74.9 (slight loss — recompute FLOPs vs
# the split path's cheap rank-space grads), eval fwd 24.9 vs 25.8.
# Default "auto" = ON exactly for the element-dropout training path;
# CARA_ATTN_MEGA=1/0 forces.
_ATTN_MEGA = os.environ.get("CARA_ATTN_MEGA", "auto")

# Layer-scan unroll factor.  The round-4 trace attribution (RESULTS.md)
# measured ~9.5 ms/step (12% of device time) in lax.scan glue around the
# megakernels — stacked-weight dynamic-slices, pads, update-slices.
# FULL unroll removes the loop entirely (per-layer slicing becomes static
# and folds away): measured 809 -> 850 img/s (+5.0%) at ViT-B bs64 rank-8
# on the v5e; PARTIAL unrolls (2/4/6) measured WORSE than rolled (787/786/
# 766) — they keep the loop and its glue while bloating the body.  "auto"
# = full unroll on TPU, rolled on CPU (interpret-mode tests would pay the
# 12x body compile for nothing); CARA_SCAN_UNROLL=<n> forces a factor.
_SCAN_UNROLL = os.environ.get("CARA_SCAN_UNROLL", "auto")


def _scan_unroll(n_layers: int) -> int:
    if _SCAN_UNROLL == "auto":
        return n_layers if jax.default_backend() == "tpu" else 1
    try:
        u = int(_SCAN_UNROLL)
    except ValueError:
        return 1
    return max(1, min(u, n_layers))

# Megakernel tile knobs (swept on v5e, .bench_tune3/4.jsonl): images per
# attention program (8 fails VMEM, 4 beats 2 by ~3 ms/step at ViT-B) and
# m-rows per MLP program — the wd (element-dropout) variant prefers 512
# (82.9 vs 85.9 ms), the rank variant 256 (75.0 vs 78.4).
_MLP_BM = os.environ.get("CARA_MLP_BM", "auto")
_ATTN_BB = os.environ.get("CARA_ATTN_BB", "auto")


def _mlp_bm(use_elem: bool, n=None, e=None, hidden=None,
            train: bool = True, b=None) -> int:
    """m-rows per MLP-megakernel program.  Resolution order: env override
    (``CARA_MLP_BM``) > a measured winner from the autotune cache
    (``cara_tpu.tune`` — written by ``cli/tune.py`` on the live chip) >
    the v5e hand-swept default."""
    if _MLP_BM != "auto":
        return int(_MLP_BM)
    from cara_tpu import tune

    v = tune.lookup("mlp_bm", tune.mlp_key(use_elem, n, e, hidden, train, b))
    if v is not None:
        return v
    base = 512 if use_elem else 256
    if e and hidden:
        # Scale the ViT-B-swept tile down with the (E x hidden) working
        # set so bigger geometries stay inside VMEM: reproduces the
        # measured ViT-L winner (512 * (768*3072)/(1024*4096) -> 256) and
        # keeps ViT-H's element-dropout backward compiling (the flat 512
        # tile overflows the 128M budget by 15M at hidden=5120).
        v = int(base * (768 * 3072) / (e * hidden)) // 128 * 128
        return max(128, min(base, v))
    return base


def _attn_bb(npad: int, e: int, train: bool = True, b=None,
             elem: bool = True) -> int:
    """Images per attention-megakernel program: 4 at the ViT-B tile size,
    scaled down for larger (NP, E) so the backward's resident qkv scratch +
    dT accumulators stay inside VMEM (CLIP ViT-L/14 at bb=4 measured 155M
    vs the 128M capacity).  Env override > autotune cache > heuristic."""
    if _ATTN_BB != "auto":
        return int(_ATTN_BB)
    from cara_tpu import tune

    v = tune.lookup("attn_bb", tune.attn_key(npad, e, train, b, elem))
    if v is not None:
        return v
    return max(1, (4 * 256 * 2304) // (npad * 3 * e))


def _attn_mega_on(use_elem: bool, training: bool) -> bool:
    if isinstance(_ATTN_MEGA, bool):  # tests monkeypatch a bool
        return _ATTN_MEGA
    if _ATTN_MEGA == "1":
        return True
    if _ATTN_MEGA == "0":
        return False
    # auto: ON for eval forwards and element-dropout training; OFF only for
    # rank-dropout training, where the split path's rank-space factor grads
    # beat the megakernel's recompute (74.9 vs 75.7 ms).
    return use_elem or not training


def _stream_pad_eligible(params, cfg, cara_cfg, cara_params, attn_impl,
                         dense_impl, use_rng, n_strm, tp_axis) -> bool:
    """Whether vit_forward may carry the residual stream sublane-padded.

    True when every block's ATTENTION will mask keys/rows at ``n_real`` —
    that holds for the megakernel (``cp_attn_block``) AND the whole split
    fused-attention family (``fused_qkv_attention[_proj]``, blockwise),
    all of which take an explicit ``n_real``; every other block op (LN,
    MLP, deltas, drop-path, activation dropout) is row-wise, so pad rows
    are inert.  The XLA ``mha`` and ``flash`` paths have no valid-token
    mask and would treat pad rows as real keys — ineligible.  ``_block``
    raises if this predicate and its branch selection ever drift apart.

    Why pad the stream at all: 197 tokens is not sublane-aligned, so every
    per-layer (B, N, E) <-> (B*N, E) reshape around the MLP megakernels
    materializes (plus a pad to the row-block multiple and a slice back)
    — measured ~4.5 ms/step of pure HBM glue at ViT-B bs64.  At N=200
    the reshapes are free bitcasts and 64*200 rows divide the MLP row
    block exactly, for +1.5% MLP FLOPs on the 3 dead rows."""
    if attn_impl != "fused" or cfg.attn_dropout_rate != 0.0:
        return False  # mha/flash fallbacks take no n_real mask
    if cfg.dropout_rate != 0.0:
        return False  # keep the activation-dropout rng stream unchanged
    use_cara = cara_params is not None
    if use_cara and cara_cfg.method in ("adapter", "adaptformer"):
        return False  # bottleneck adapters ride the plain XLA path
    if use_cara and cara_cfg.moe:
        return False  # the load-balance aux loss counts every token
    return True


def matk(x, kernel):
    """``x @ kernel`` where ``kernel`` may be a weight-only int8 quant dict
    ``{"q": int8 (..., in, out), "scale": (..., 1, out)}`` (per-output-
    channel symmetric).  The dequant happens per layer inside the scan
    body, so XLA folds the int8->bf16 convert into the GEMM and the weight
    streams HBM->VMEM at half the bytes — the win for weight-bound
    (small-batch serving) shapes.  Produced by ``models.quant``."""
    if isinstance(kernel, dict) and "qa" in kernel:
        # Full int8 (w8a8, models.quant mode="w8a8"): dynamic per-token
        # symmetric activation quant, then an int8 x int8 -> int32 MXU
        # GEMM — 2x the bf16 MXU rate on v5e (measured 284 TOPS vs
        # 161 TF, benchmarks/RESULTS.md), attacking the compute bound
        # that caps weight-only int8 at ~13%.  Exact dequant:
        # y = y32 * (row_scale x col_scale); row maxima are exact so the
        # activation codes never clip.
        wq, s = kernel["qa"], kernel["scale"]
        x32 = x.astype(jnp.float32)
        ax = jnp.maximum(
            jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0, 1e-12)
        xq = jnp.round(x32 / ax).astype(jnp.int8)
        y32 = jax.lax.dot_general(
            xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (y32.astype(jnp.float32) * ax
                * s.astype(jnp.float32)).astype(x.dtype)
    if isinstance(kernel, dict) and "q" in kernel:
        wq, s = kernel["q"], kernel["scale"]
        # An untuned dequant-fused Pallas GEMM (ops/pallas/int8_dense)
        # measured SLOWER than XLA's convert+GEMM at every batch size
        # (bs1 0.86 vs 0.76 ms, bs64 32.6 vs 24.6) — XLA's pipelined dense
        # GEMMs take real tuning to beat (see cp_dense history).  Kept
        # behind CARA_INT8_PALLAS=1 for future tuning work.
        if (os.environ.get("CARA_INT8_PALLAS") == "1"
                and jax.default_backend() == "tpu" and wq.ndim == 2
                and wq.shape[0] % 128 == 0 and wq.shape[1] % 128 == 0):
            from cara_tpu.ops.pallas.int8_dense import int8_dense

            return int8_dense(x, wq, s.reshape(-1),
                              jnp.zeros((wq.shape[1],), x.dtype))
        return (x @ wq.astype(x.dtype)) * s.astype(x.dtype)
    return x @ kernel


def _dp_gate(rng, rate, b, dtype):
    """Per-sample drop-path gate ``mask/keep`` (B, 1, 1); ones when ``rng``
    is None (eval).  Mirrors ``ops.layers.drop_path`` so the megakernels can
    fuse the residual + stochastic-depth add without leaving VMEM."""
    if rng is None:
        return jnp.ones((b, 1, 1), dtype)
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (b, 1, 1)).astype(dtype)
    # stop_gradient enforces at the boundary what the megakernel VJPs
    # assume: the gate is a constant (they return a zero dpm cotangent).
    return jax.lax.stop_gradient(mask / jnp.asarray(keep, dtype))


def _trunc_normal(rng, shape, std, dtype):
    return std * jax.random.truncated_normal(rng, -2.0, 2.0, shape, dtype)


def _torch_linear_init(rng, in_dim, out_dim, dtype):
    """torch ``nn.Linear`` default init (timm ``reset_classifier`` head,
    ``vit_cp.py:166``): kaiming-uniform weight, uniform bias, both with
    bound 1/sqrt(fan_in)."""
    kw, kb = jax.random.split(rng)
    bound = 1.0 / math.sqrt(in_dim)
    w = jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)
    b = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return {"kernel": w, "bias": b}


def init_vit_params(rng: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> Params:
    """Random backbone init (tests / scratch training).

    Real runs overwrite this with the pretrained ``ViT-B_16.npz`` weights via
    :mod:`cara_tpu.models.npz` (the reference loads the same JAX-format file
    through timm, ``vit_cp.py:155``).
    """
    e, l3 = cfg.embed_dim, 3 * cfg.embed_dim
    hid = cfg.hidden_dim
    keys = iter(jax.random.split(rng, 16))
    patch_dim = cfg.patch_size * cfg.patch_size * cfg.in_chans

    def lin(k, i, o):
        return {
            "kernel": _trunc_normal(k, (i, o), 0.02, dtype),
            "bias": jnp.zeros((o,), dtype),
        }

    L = cfg.depth
    kq, kp, k1, k2 = jax.random.split(next(keys), 4)

    def stacked(k, i, o):
        return {
            "kernel": _trunc_normal(k, (L, i, o), 0.02, dtype),
            "bias": jnp.zeros((L, o), dtype),
        }

    params: Params = {
        "embed": lin(next(keys), patch_dim, e),
        "cls": _trunc_normal(next(keys), (1, 1, e), 0.02, dtype)
        if cfg.use_cls_token else None,
        "pos_embed": _trunc_normal(next(keys), (1, cfg.seq_len, e), 0.02, dtype),
        "blocks": {
            "ln1_scale": jnp.ones((L, e), dtype),
            "ln1_bias": jnp.zeros((L, e), dtype),
            "qkv": stacked(kq, e, l3),
            "proj": stacked(kp, e, e),
            "ln2_scale": jnp.ones((L, e), dtype),
            "ln2_bias": jnp.zeros((L, e), dtype),
            "fc1": stacked(k1, e, hid),
            "fc2": stacked(k2, hid, e),
        },
        "norm": {"scale": jnp.ones((e,), dtype), "bias": jnp.zeros((e,), dtype)},
    }
    if cfg.ln_pre:
        params["ln_pre"] = {
            "scale": jnp.ones((e,), dtype), "bias": jnp.zeros((e,), dtype)}
    if cfg.repr_size is not None:
        params["pre_logits"] = lin(next(keys), e, cfg.repr_size)
    if cfg.proj_dim is not None:
        params["proj_out"] = {
            "kernel": _trunc_normal(next(keys), (e, cfg.proj_dim),
                                    e ** -0.5, dtype)}
    head_in = _head_in_dim(cfg)
    if cfg.num_classes > 0:
        params["head"] = lin(next(keys), head_in, cfg.num_classes)
    return params


def _head_in_dim(cfg: ViTConfig) -> int:
    if cfg.proj_dim is not None:
        return cfg.proj_dim
    if cfg.repr_size is not None:
        return cfg.repr_size
    return cfg.embed_dim


def reset_classifier(
    params: Params, rng: jax.Array, cfg: ViTConfig, num_classes: int,
    dtype=jnp.float32,
) -> Params:
    """Replace the head with a fresh ``num_classes`` linear layer
    (``vit.reset_classifier(num_classes)``, ``vit_cp.py:166``)."""
    head_in = _head_in_dim(cfg)
    new = dict(params)
    if num_classes > 0:
        new["head"] = _torch_linear_init(rng, head_in, num_classes, dtype)
    else:
        new.pop("head", None)
    return new


def split_qkv_kernel(kernel: jax.Array, cfg: ViTConfig):
    """Split a fused (E, 3E) qkv kernel into per-projection (E, E) views
    (counterpart of the reference's ``split_weight`` helper,
    ``dim_experiment.py:98-104``, adapted to our (in, out) layout with the
    (3, heads, head_dim) output flattening)."""
    e, h, d = cfg.embed_dim, cfg.num_heads, cfg.head_dim
    if kernel.shape != (e, 3 * e):
        raise ValueError(
            f"expected (E, 3E) = ({e}, {3 * e}), got {kernel.shape}")
    k4 = kernel.reshape(e, 3, h * d)
    return k4[:, 0], k4[:, 1], k4[:, 2]


def patch_embed(params: Params, x: jax.Array, cfg: ViTConfig) -> jax.Array:
    """(B, H, W, C) -> (B, num_patches, E) via reshape + GEMM.

    Identical to the reference's Conv2d(patch, stride=patch) embedding but
    expressed as a single MXU matmul.  Flatten order (ph, pw, c) matches the
    HWIO npz conv kernel flattening.
    """
    b = x.shape[0]
    p, g = cfg.patch_size, cfg.grid_size
    x = x.reshape(b, g, p, g, p, cfg.in_chans)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, p * p * cfg.in_chans)
    return x @ params["embed"]["kernel"] + params["embed"]["bias"]


def _tp_slice_qkv_cols(v1: jax.Array, h: int, d: int, hl: int,
                       idx: jax.Array) -> jax.Array:
    """Head-slice the (r, 3E) qkv delta factor for TP shard ``idx``: the
    column layout is (3, H, Dh)-flattened; the local slice keeps heads
    [idx*hl, (idx+1)*hl) of each of q/k/v — matching the per-shard weight
    layout produced by ``parallel.mesh.tp_permute_qkv``."""
    r = v1.shape[0]
    v4 = v1.reshape(r, 3, h, d)
    loc = jax.lax.dynamic_slice_in_dim(v4, idx * hl, hl, axis=2)
    return loc.reshape(r, 3 * hl * d)


def _block(
    x: jax.Array,
    bp: Dict[str, jax.Array],
    f1: Optional[jax.Array],
    p1: Optional[jax.Array],
    dpr: jax.Array,
    key: Optional[jax.Array],
    skey: Optional[jax.Array],
    cfg: ViTConfig,
    cara_params: Optional[Dict[str, jax.Array]],
    cara_cfg: Optional[CaraConfig],
    attn_impl: str,
    dense_impl: str = "xla",
    tp_axis: Optional[str] = None,
    scale_override: Optional[jax.Array] = None,
    moe_gates: Optional[jax.Array] = None,
    n_real: Optional[int] = None,
) -> jax.Array:
    """One transformer block with optional CaRA deltas (reference hot loop,
    SURVEY.md section 3.3).

    ``n_real``: valid token count when ``vit_forward`` carries the residual
    stream sublane-PADDED (``_stream_pad_eligible``) — the attention
    megakernel masks keys/rows at ``n_real`` while every other op is
    row-wise, so the pad rows are inert.  ``None`` = all rows valid.

    ``scale_override``: optional 0-d TRACED delta scale replacing the
    static ``cara_cfg.scale`` — lets one compiled executable serve tasks
    whose scales span 0.1-100 (sweep compile sharing); cast to the
    activation dtype so it multiplies exactly like the Python constant.

    ``key`` drives the weight-dropout masks (shared across the batch by
    reference semantics, ``cara.py:35`` — under data-parallel shard_map it
    must be shard-invariant); ``skey`` drives per-sample randomness
    (drop-path, activation/attention dropout — per-shard under shard_map).

    ``moe_gates``: mixture-of-expert-adapters (``models.moe``).  When set,
    ``cara_params`` is the EXPERT-STACKED factor tree (leading axis X on
    every leaf) and ``f1``/``p1`` carry this layer's (X, rows, r) slices;
    the four delta sites compute the gate-weighted expert sum on the XLA
    path (``vit_forward`` forces ``dense_impl="xla"`` under MoE — the
    fused Pallas factor kernels have no expert axis).

    ``tp_axis``: fused tensor parallelism.  The caller (``train.steps``
    under ``shard_map``) hands this block PER-SHARD weight slices —
    head-sharded qkv (permuted layout, ``tp_permute_qkv``) / proj rows /
    fc1 columns / fc2 rows — and the block runs the UNCHANGED megakernels
    on them via the identity ``psum_i(x/tp + dpm*y_i) = x + dpm*psum(y_i)``
    (LayerNorm is scale-invariant, so LN(x/tp) == LN(x) up to an
    eps-in-variance drift of ~eps*tp^2).  Replicated additive terms (proj /
    fc2 biases, CP bias1/bias3) ride at 1/tp per shard so the psum restores
    them exactly once.  This supersedes the round-2 "no-residual kernel
    variant" sketch (docs/NEXT_ROUND.md) with zero kernel changes.
    """
    e, h, d = cfg.embed_dim, cfg.num_heads, cfg.head_dim
    mr = cfg.mlp_ratio
    tp = 1
    if tp_axis is not None:
        tp = (3 * e) // bp["qkv"]["kernel"].shape[-1]
    if tp > 1:
        h_loc = h // tp
        e_loc = e // tp
        hid_loc = (mr * e) // tp
        tp_idx = jax.lax.axis_index(tp_axis)
        inv_tp = 1.0 / tp
    if key is not None:
        k_wd_qkv, k_wd_proj, k_wd_up, k_wd_down = jax.random.split(key, 4)
        # split(skey, 6) is an exact prefix of split(skey, 7)
        # (partitionable threefry — see vit_forward's stream note), so the
        # extra bottleneck-adapter key leaves every other stream intact.
        (k_dp1, k_dp2, k_attn, k_do1, k_do2, k_do3,
         k_ad) = jax.random.split(skey, 7)
    else:
        k_wd_qkv = k_wd_proj = k_wd_up = k_wd_down = k_dp1 = k_dp2 = None
        k_attn = k_do1 = k_do2 = k_do3 = k_ad = None

    use_cara = cara_params is not None
    # Bottleneck adapters (models/adapter.py): this layer's {site: {kernel,
    # bias}} dict rides the p1 scan slot; the block then runs the PLAIN
    # XLA path (resolve_dense_impl pins "xla") with the bottleneck modules
    # injected at the method's insertion points below.
    ad = ad_s = None
    ad_seq = False
    if use_cara and cara_cfg.method in ("adapter", "adaptformer"):
        from cara_tpu.models import adapter as adapter_lib

        ad = p1
        ad_seq = cara_cfg.method == "adapter"
        ad_s = (cara_cfg.scale if scale_override is None
                else scale_override.astype(x.dtype))
        ad_rate = cara_cfg.adapter_dropout
        if k_ad is not None:
            k_ad_attn, k_ad_mlp = jax.random.split(k_ad)
        else:
            k_ad_attn = k_ad_mlp = None
        use_cara = False
        cara_params = None
    use_elem = False
    row_wd = False
    lora = use_cara and cara_cfg.method == "lora"
    if use_cara:
        s = (cara_cfg.scale if scale_override is None
             else scale_override.astype(x.dtype))
        materialized = cara_cfg.delta_impl == "materialized"
        # Exact element-wise weight dropout on the dense delta (reference
        # semantics, cara.py:35,57,81,92) — active in training only.  On
        # the fused path the *_wd kernels regenerate the mask tile-wise in
        # VMEM; on the XLA path the masked dense delta is materialized.
        use_elem = (not materialized
                    and cara_cfg.weight_dropout_impl == "element"
                    and key is not None and cara_cfg.weight_dropout > 0.0)
        # Row-structured weight dropout (--weight-dropout-impl row): drop
        # whole INPUT-ROWS of each site's effective (in, out) dense delta.
        # Expectation-equivalent to the exact element regularizer — the
        # inverted mask has E[m_k] = 1, so E[delta] = U V^T, and because
        # every entry (k, n) carries exactly one Bernoulli factor the
        # per-entry marginal variance p/(1-p) * (UV^T)_{kn}^2 is IDENTICAL
        # to element dropout's; only the within-row covariance differs
        # (element: 0, row: fully correlated).  Unlike the rank impl's
        # r~8 coarse components this draws K=768-3072 independent
        # Bernoullis per site.  Runs on the fast non-wd kernels via the
        # identity (m 1^T) o (U V^T) == (diag(m) U) V^T — no dense
        # cotangent dT = x^T g in the backward (the exact impl's ~16
        # ms/step floor, benchmarks/RESULTS.md "Element-dropout
        # backward").
        row_wd = (not materialized
                  and cara_cfg.weight_dropout_impl == "row"
                  and key is not None and cara_cfg.weight_dropout > 0.0)
        if lora:
            from cara_tpu.models import lora as lora_lib

            # LoRA adds no bias terms — the fused kernels' adapter-bias
            # operands ride as zeros (XLA folds the adds).
            cb_proj = jnp.zeros((e,), x.dtype)
            cb_up = jnp.zeros((cfg.hidden_dim,), x.dtype)
            cb_down = jnp.zeros((e,), x.dtype)
        else:
            cb_proj = cara_params["bias1"]
            cb_up = cara_params["bias2"]
            cb_down = cara_params["bias3"]

        def _rank_comp(k):
            """Rank-component mask for the structured impls (None under
            row — the row mask rides U / the delta input instead)."""
            if row_wd:
                return None
            return cp_ops.weight_dropout_mask(
                k, (cara_cfg.rank,), cara_cfg.weight_dropout, x.dtype)

        def _row_u(u, k):
            """Apply the row mask to the collapsed input-side factor
            ((m 1^T) o (U V^T) == (diag(m) U) V^T)."""
            if not row_wd:
                return u
            m = cp_ops.weight_dropout_mask(
                k, (u.shape[0], 1), cara_cfg.weight_dropout, u.dtype)
            return u * m

        def _row_x(t, k):
            """Row mask on the XLA delta path: masking the delta INPUT's
            features == masking the dense delta's input rows (the same
            (K,) Bernoulli draw as _row_u, so the fused and XLA paths
            realize the identical regularizer)."""
            if not row_wd:
                return t
            m = cp_ops.weight_dropout_mask(
                k, (t.shape[-1],), cara_cfg.weight_dropout, t.dtype)
            return t * m

        def _adapter_uv(site, comp=None):
            """This layer's collapsed (U, V) delta factors for one of the
            four injection sites — the common currency of the fused
            kernels.  LoRA's per-layer A/B pairs ARE that form; CaRA
            collapses its shared CP factors into it."""
            if lora:
                sp = f1 if site == "qkv" else p1[site]
                return lora_lib.site_uv(sp, comp)
            if site == "qkv":
                return cara_lib.qkv_uv(cara_params, f1, cfg, cara_cfg, comp)
            p2_, p3_, r2_ = (cara_params["P2"], cara_params["P3"],
                             cara_params["R2"])
            if site == "proj":
                return cara_lib.rows_out_uv(p1[0:1], p2_, p3_, r2_, comp)
            if site == "fc1":
                return cara_lib.rows_out_uv(p1[1:1 + mr], p2_, p3_, r2_,
                                            comp)
            return cara_lib.rows_in_uv(p1[1 + mr:1 + 2 * mr], p2_, p3_,
                                       r2_, comp)
    fused_dense = (dense_impl == "fused" and use_cara and not materialized
                   and cara_cfg.cp_order != 2)
    # Plain / merged-weight backbone (no adapter): the megakernels still pay
    # off — they run with zero CP factors (the rank GEMMs cost ~2%, the
    # deleted qkv / hidden-activation / residual round-trips dominate).
    fused_plain = dense_impl == "fused" and not use_cara
    if fused_dense:
        from cara_tpu.ops.pallas.cp_dense import (
            cp_dense, cp_dense_ln, cp_dense_ln_wd, cp_dense_wd)

        def _wd_seed(k):
            return jax.random.randint(
                k, (1, 1), -2 ** 31, 2 ** 31 - 1, jnp.int32)

    # --- Attention ---------------------------------------------------------
    b, n = x.shape[:2]
    nr = n if n_real is None else n_real
    # xa is skipped ONLY when the fused-attention branch below will actually
    # run and fuse LN1 into the qkv kernel — the condition must match that
    # branch exactly (attention dropout forces the xla path, which needs xa).
    fused_attn = attn_impl == "fused" and cfg.attn_dropout_rate == 0.0
    xa = None if fused_dense and fused_attn else layer_norm(
        x, bp["ln1_scale"], bp["ln1_bias"], cfg.layernorm_eps)
    proj = None  # set directly by the attention megakernel / attnproj fusion
    attn_mega = False
    if ((fused_dense or fused_plain) and fused_attn
            and (_attn_mega_on(use_elem, key is not None) or tp > 1)
            and cfg.dropout_rate == 0.0):
        from cara_tpu.ops.pallas.cp_attn_block import (
            cp_attn_block, cp_attn_block_wd)
        from cara_tpu.ops.pallas.fused_qkv_attention import (
            MAX_NP_FULL_SCORES)

        npad = -(-n // 128) * 128
        attn_mega = npad <= MAX_NP_FULL_SCORES
    if nr != n and not (attn_mega or fused_attn):
        # The stream-padding decision in vit_forward requires an attention
        # path that masks at n_real (megakernel or the fused_qkv family);
        # mha/flash would treat the pad rows as real keys.  Loud failure
        # beats silent corruption.
        raise ValueError(
            "vit_forward padded the token stream (n_real="
            f"{nr} != n={n}) but this block resolved to an attention path "
            "with no valid-token mask — _stream_pad_eligible and the "
            "branch selection have drifted apart; fix them to match")
    if tp > 1 and not attn_mega:
        raise ValueError(
            "fused tensor parallelism requires the megakernel path "
            "(fused attn+dense impls, zero activation dropout, padded "
            "sequence <= 512); _resolve_impls should have fallen back to "
            "XLA TP for this configuration")
    if attn_mega:
        # Whole attention half-block in ONE kernel (cara.py:25-58 + the
        # Block residual): LN1, the qkv GEMM + CP delta, per-head
        # attention, the projection GEMM + CP delta and the residual +
        # drop-path add all run on resident VMEM tiles.  The kernel
        # consumes the raw UNPADDED (B, N, E) residual and pads the token
        # axis inside its own BlockSpec (clipped boundary DMAs + masked
        # tail rows), so neither the pad-for-attention nor the
        # slice-for-MLP HBM round-trip exists in the graph.
        x_in = x
        dpm = _dp_gate(k_dp1, dpr, b, x.dtype)
        hh = h
        wq, bq = bp["qkv"]["kernel"], bp["qkv"]["bias"]
        wp, bpj = bp["proj"]["kernel"], bp["proj"]["bias"]
        if tp > 1:
            # Per-shard head slice: x/tp rides the in-kernel residual so
            # the caller's psum over tp_axis reassembles x + dpm*sum(y_i);
            # the replicated proj bias (and CP bias1 below) ride at 1/tp.
            hh = h_loc
            x_in = x_in * inv_tp
            bpj = bpj * inv_tp
        e3l = wq.shape[-1]
        if not use_cara:
            z1 = jnp.zeros((e, 1), x.dtype)
            zp = jnp.zeros((wp.shape[0], 1), x.dtype)  # (E/tp, 1) under TP
            x = cp_attn_block(
                x_in, wq, bq,
                z1, jnp.zeros((1, e3l), x.dtype),
                wp, bpj,
                zp, jnp.zeros((1, e), x.dtype), jnp.zeros((e,), x.dtype),
                bp["ln1_scale"], bp["ln1_bias"], dpm,
                hh, d ** -0.5, nr, 1.0,
                _attn_bb(npad, e, key is not None, b, use_elem), None,
                cfg.layernorm_eps)
        else:
            if use_elem:
                comp_q = comp_p = None
            else:
                comp_q = _rank_comp(k_wd_qkv)
                comp_p = _rank_comp(k_wd_proj)
            u1, v1 = _adapter_uv("qkv", comp_q)
            u2, v2 = _adapter_uv("proj", comp_p)
            u1 = _row_u(u1, k_wd_qkv)
            u2 = _row_u(u2, k_wd_proj)
            cb2 = cb_proj
            if tp > 1:
                v1 = _tp_slice_qkv_cols(v1, h, d, h_loc, tp_idx)
                u2 = jax.lax.dynamic_slice_in_dim(
                    u2, tp_idx * e_loc, e_loc, axis=0)
                cb2 = cb2 * inv_tp
            # The delta scale rides the collapsed factors (v*s, cb*s) and
            # the kernel runs at s=1.0 — a STATIC kernel s makes every
            # distinct per-task scale (0.1-100, vtab_config) a fresh
            # Mosaic compile; folding keeps ONE kernel set for all tasks.
            args = (x_in, wq, bq,
                    u1.astype(x.dtype), (v1 * s).astype(x.dtype),
                    wp, bpj,
                    u2.astype(x.dtype), (v2 * s).astype(x.dtype),
                    (cb2 * s).astype(x.dtype),
                    bp["ln1_scale"], bp["ln1_bias"], dpm)
            if use_elem:
                # Per-shard seed offset: the hash-mask coordinates are
                # local under TP, so distinct seeds keep the shard masks
                # decorrelated (same Bernoulli regularizer, different
                # realization than a single-device run).
                off = tp_idx if tp > 1 else 0
                x = cp_attn_block_wd(
                    *args, _wd_seed(k_wd_qkv) + off, _wd_seed(k_wd_proj) + off,
                    hh, d ** -0.5, nr, 1.0, cara_cfg.weight_dropout,
                    _attn_bb(npad, e, key is not None, b, use_elem), None,
                    cfg.layernorm_eps)
            else:
                x = cp_attn_block(
                    *args, hh, d ** -0.5, nr, 1.0,
                    _attn_bb(npad, e, key is not None, b, use_elem), None,
                    cfg.layernorm_eps)
        if tp > 1:
            x = jax.lax.psum(x, tp_axis)
    elif fused_attn:
        # Layout-native path: pad the token axis once, keep the qkv GEMM
        # output layout all the way through the Pallas kernel (no 5-D
        # transposes), slice back before the projection.  Past the
        # full-score kernel's VMEM ceiling, the key-axis-tiled online-
        # softmax variant takes over behind the same interface — long
        # context is a tile count, not a new code path (SURVEY.md sec. 5).
        from cara_tpu.ops.pallas.blockwise_attention import (
            blockwise_qkv_attention)
        from cara_tpu.ops.pallas.fused_qkv_attention import (
            MAX_NP_FULL_SCORES, fused_qkv_attention,
            fused_qkv_attention_proj)

        npad = -(-n // 128) * 128
        if npad > MAX_NP_FULL_SCORES:
            attn_fn = lambda qkv: blockwise_qkv_attention(
                qkv, h, d ** -0.5, nr)
        else:
            attn_fn = lambda qkv: fused_qkv_attention(qkv, h, d ** -0.5,
                                                      nr)
        if fused_dense:
            # LN1 fused into the qkv kernel prologue: pad the RAW residual
            # stream once; padded rows produce masked/sliced garbage only.
            x_p = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0))) \
                if npad != n else x
            if use_elem:
                u, vmat = _adapter_uv("qkv")
                qkv = cp_dense_ln_wd(
                    x_p, bp["qkv"]["kernel"], bp["qkv"]["bias"],
                    u.astype(x.dtype), (vmat * s).astype(x.dtype),
                    jnp.zeros((3 * e,), x.dtype),
                    bp["ln1_scale"], bp["ln1_bias"], _wd_seed(k_wd_qkv),
                    1.0, cara_cfg.weight_dropout, 256, 1024, 768, None,
                    None, cfg.layernorm_eps)
            else:
                comp = _rank_comp(k_wd_qkv)
                u, vmat = _adapter_uv("qkv", comp)
                u = _row_u(u, k_wd_qkv)
                qkv = cp_dense_ln(
                    x_p, bp["qkv"]["kernel"], bp["qkv"]["bias"],
                    u.astype(x.dtype), (vmat * s).astype(x.dtype),
                    jnp.zeros((3 * e,), x.dtype),
                    bp["ln1_scale"], bp["ln1_bias"], 1.0,
                    512, 3 * e, 768, None, None,
                    cfg.layernorm_eps)  # cara.py:42 + LN1 in one pass
                # (512-row x single-pass-N blocks: measured 1.79 vs 2.19 ms
                # at the qkv site, benchmarks/kernel_tune2.py round 2)
        else:
            xa_p = jnp.pad(xa, ((0, 0), (0, npad - n), (0, 0))) \
                if npad != n else xa
            qkv = matk(xa_p, bp["qkv"]["kernel"]) + bp["qkv"]["bias"]
            if use_cara:
                if moe_gates is not None:
                    from cara_tpu.models import moe as moe_lib

                    g_p = jnp.pad(moe_gates, ((0, 0), (0, npad - n), (0, 0))) \
                        if npad != n else moe_gates  # zero delta on pad rows
                    delta = moe_lib.moe_qkv_delta(
                        xa_p, cara_params, f1, g_p, cfg, cara_cfg,
                        drop_rng=k_wd_qkv).reshape(b, npad, 3 * e)
                elif lora:
                    delta = lora_lib.delta(
                        _row_x(xa_p, k_wd_qkv), f1,
                        rate=0.0 if row_wd else cara_cfg.weight_dropout,
                        drop_rng=None if row_wd else k_wd_qkv,
                        element=materialized or use_elem)
                else:
                    delta = cara_lib.qkv_delta(
                        _row_x(xa_p, k_wd_qkv), cara_params, f1, cfg,
                        cara_cfg, materialized=materialized or use_elem,
                        drop_rng=None if row_wd else k_wd_qkv,
                    ).reshape(b, npad, 3 * e)
                qkv = qkv + delta.astype(qkv.dtype) * s  # cara.py:42
        if (fused_dense and _ATTNPROJ and not use_elem
                and npad <= MAX_NP_FULL_SCORES):
            # Attention + projection + CP delta in ONE kernel: attn_out
            # stays in VMEM (saves its HBM write+read per layer;
            # cara.py:50-58 in one pass).
            comp = _rank_comp(k_wd_proj)
            u, vmat = _adapter_uv("proj", comp)
            u = _row_u(u, k_wd_proj)
            proj = fused_qkv_attention_proj(
                qkv, bp["proj"]["kernel"], bp["proj"]["bias"],
                u.astype(x.dtype), (vmat * s).astype(x.dtype),
                (cb_proj * s).astype(x.dtype),
                h, d ** -0.5, nr, 1.0)[:, :n, :]
        else:
            attn_out = attn_fn(qkv)[:, :n, :]
    else:
        qkv = matk(xa, bp["qkv"]["kernel"]) + bp["qkv"]["bias"]
        qkv = qkv.reshape(b, n, 3, h, d)
        if use_cara:
            if moe_gates is not None:
                from cara_tpu.models import moe as moe_lib

                delta = moe_lib.moe_qkv_delta(
                    xa, cara_params, f1, moe_gates, cfg, cara_cfg,
                    drop_rng=k_wd_qkv)
            elif lora:
                delta = lora_lib.delta(
                    _row_x(xa, k_wd_qkv), f1,
                    rate=0.0 if row_wd else cara_cfg.weight_dropout,
                    drop_rng=None if row_wd else k_wd_qkv,
                    element=materialized or use_elem,
                ).reshape(b, n, 3, h, d)
            else:
                delta = cara_lib.qkv_delta(
                    _row_x(xa, k_wd_qkv), cara_params, f1, cfg, cara_cfg,
                    materialized=materialized or use_elem,
                    drop_rng=None if row_wd else k_wd_qkv,
                )
            qkv = qkv + delta.astype(qkv.dtype) * s  # cara.py:42
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))  # (B,H,N,Dh)
        if attn_impl == "flash" and cfg.attn_dropout_rate == 0.0:
            from cara_tpu.ops.pallas.flash_attention import flash_attention

            o = flash_attention(q, k, v, d ** -0.5)
            attn_out = o.transpose(0, 2, 1, 3).reshape(b, n, e)
        else:
            attn_out = mha(
                q, k, v, d ** -0.5, cfg.attn_dropout_rate, k_attn
            )  # (B, N, E)

    if attn_mega or proj is not None:
        pass  # attention (+ residual) already fused in one kernel above
    elif fused_dense:
        if use_elem:
            u, vmat = _adapter_uv("proj")
            proj = cp_dense_wd(
                attn_out, bp["proj"]["kernel"], bp["proj"]["bias"],
                u.astype(x.dtype), (vmat * s).astype(x.dtype),
                (cb_proj * s).astype(x.dtype),
                _wd_seed(k_wd_proj), 1.0, cara_cfg.weight_dropout)
        else:
            comp = _rank_comp(k_wd_proj)
            u, vmat = _adapter_uv("proj", comp)
            u = _row_u(u, k_wd_proj)
            proj = cp_dense(
                attn_out, bp["proj"]["kernel"], bp["proj"]["bias"],
                u.astype(x.dtype), (vmat * s).astype(x.dtype),
                (cb_proj * s).astype(x.dtype), 1.0,
                512, e, 768)  # cara.py:57-58
    else:
      proj = matk(attn_out, bp["proj"]["kernel"]) + bp["proj"]["bias"]
      if use_cara:
        if moe_gates is not None:
            from cara_tpu.models import moe as moe_lib

            pd = moe_lib.moe_rows_delta_out(
                attn_out, p1[:, 0:1], cara_params, moe_gates,
                drop_rng=k_wd_proj, rate=cara_cfg.weight_dropout)
            cb1 = moe_lib.moe_bias(moe_gates, cara_params["bias1"])
        elif lora:
            pd = lora_lib.delta(
                _row_x(attn_out, k_wd_proj), p1["proj"],
                rate=0.0 if row_wd else cara_cfg.weight_dropout,
                drop_rng=None if row_wd else k_wd_proj,
                element=materialized or use_elem)
            cb1 = cb_proj
        elif materialized or use_elem:
            mask = cp_ops.weight_dropout_mask(
                k_wd_proj, (e, e), cara_cfg.weight_dropout, x.dtype)
            pd = cp_ops.rows_delta_out_materialized(
                attn_out, p1[0:1], cara_params["P2"], cara_params["P3"],
                cara_params["R2"], mask)
            cb1 = cara_params["bias1"]
        else:
            comp = _rank_comp(k_wd_proj)
            pd = cp_ops.rows_delta_out_factorized(
                _row_x(attn_out, k_wd_proj), p1[0:1], cara_params["P2"],
                cara_params["P3"], cara_params["R2"], comp)
            cb1 = cara_params["bias1"]
        proj = proj + (pd + cb1) * s  # cara.py:57-58
      if ad is not None and ad_seq:
        # Houlsby: internal-skip bottleneck on the attention sublayer
        # output, inside the block dropout / drop-path / residual.
        proj = proj + adapter_lib.bottleneck(
            proj, ad["attn_down"], ad["attn_up"], "gelu", k_ad_attn,
            ad_rate)
    if not attn_mega:  # megakernel already emitted x + dpm*proj
        proj = dropout(proj, cfg.dropout_rate, k_do1)
        x = x + drop_path(proj, dpr, k_dp1)

    # --- MLP ---------------------------------------------------------------
    ad_par = None
    if ad is not None and not ad_seq:
        # AdaptFormer: parallel bottleneck reading the PRE-LN2 residual
        # stream, scaled by s; joins the residual below NEXT TO the
        # drop-pathed MLP branch (the adapter output itself is neither
        # drop-pathed nor output-dropped — it carries its own internal
        # dropout, matching the official release).
        ad_par = adapter_lib.bottleneck(
            x, ad["mlp_down"], ad["mlp_up"], "relu", k_ad_mlp,
            ad_rate) * ad_s
    if use_cara:
        if lora:
            p1_up = p1_down = None  # LoRA per-site factors live in the
            # p1 dict; the fc1/fc2 branches go through _adapter_uv/delta.
        elif moe_gates is not None:  # expert-stacked (X, rows, r) slices
            p1_up, p1_down = p1[:, 1:1 + mr], p1[:, 1 + mr:1 + 2 * mr]
        else:
            p1_up, p1_down = p1[1:1 + mr], p1[1 + mr:1 + 2 * mr]
    if fused_plain and (_MLP_MEGA or tp > 1) and cfg.dropout_rate == 0.0:
        from cara_tpu.ops.pallas.cp_mlp import cp_mlp_block

        dpm = _dp_gate(k_dp2, dpr, b, x.dtype)
        hid = bp["fc1"]["kernel"].shape[-1]  # hid/tp under TP
        x_in, b2 = x, bp["fc2"]["bias"]
        if tp > 1:
            x_in, b2 = x * inv_tp, b2 * inv_tp
        x = cp_mlp_block(
            x_in, bp["fc1"]["kernel"], bp["fc1"]["bias"],
            jnp.zeros((e, 1), x.dtype), jnp.zeros((1, hid), x.dtype),
            jnp.zeros((hid,), x.dtype),
            bp["fc2"]["kernel"], b2,
            jnp.zeros((hid, 1), x.dtype), jnp.zeros((1, e), x.dtype),
            jnp.zeros((e,), x.dtype),
            bp["ln2_scale"], bp["ln2_bias"], dpm, 1.0,
            _mlp_bm(False, x.shape[1], e, hid, key is not None, b), None,
            cfg.activation, cfg.layernorm_eps)
        if tp > 1:
            x = jax.lax.psum(x, tp_axis)
        return x
    if fused_dense and (_MLP_MEGA or tp > 1) and cfg.dropout_rate == 0.0:
        # Block megakernel: both MLP GEMMs + deltas + LN2 + GELU in ONE
        # pallas_call (cara.py:72-93 in one pass).  Inter-GEMM activation
        # dropout can't ride inside it — gated on dropout_rate == 0 (the
        # ViT default; nonzero rates use the two-kernel path below).
        from cara_tpu.ops.pallas.cp_mlp import cp_mlp_block, cp_mlp_block_wd

        dpm = _dp_gate(k_dp2, dpr, b, x.dtype)
        if use_elem:
            comp_up = comp_down = None
        else:
            comp_up = _rank_comp(k_wd_up)
            comp_down = _rank_comp(k_wd_down)
        u1, v1 = _adapter_uv("fc1", comp_up)
        u2, v2 = _adapter_uv("fc2", comp_down)
        u1 = _row_u(u1, k_wd_up)
        u2 = _row_u(u2, k_wd_down)
        cb1, cb2 = cb_up, cb_down
        x_in, b2 = x, bp["fc2"]["bias"]
        if tp > 1:
            # Hidden-axis shard: v1 columns / cb1 (bias2) / u2 rows local;
            # x/tp rides the in-kernel residual, replicated fc2 bias and
            # CP bias3 at 1/tp (psum below restores each exactly once).
            hid0 = tp_idx * hid_loc
            v1 = jax.lax.dynamic_slice_in_dim(v1, hid0, hid_loc, axis=1)
            cb1 = jax.lax.dynamic_slice_in_dim(cb1, hid0, hid_loc, axis=0)
            u2 = jax.lax.dynamic_slice_in_dim(u2, hid0, hid_loc, axis=0)
            x_in = x * inv_tp
            b2 = b2 * inv_tp
            cb2 = cb2 * inv_tp
        # Scale folded into the factors (kernel s==1.0) — see the
        # attention branch note: per-task scales must not fork kernels.
        args = (x_in, bp["fc1"]["kernel"], bp["fc1"]["bias"],
                u1.astype(x.dtype), (v1 * s).astype(x.dtype),
                (cb1 * s).astype(x.dtype),
                bp["fc2"]["kernel"], b2,
                u2.astype(x.dtype), (v2 * s).astype(x.dtype),
                (cb2 * s).astype(x.dtype),
                bp["ln2_scale"], bp["ln2_bias"], dpm)
        if use_elem:
            off = tp_idx if tp > 1 else 0
            x = cp_mlp_block_wd(
                *args, _wd_seed(k_wd_up) + off, _wd_seed(k_wd_down) + off,
                1.0, cara_cfg.weight_dropout,
                _mlp_bm(True, x.shape[1], e, bp["fc1"]["kernel"].shape[-1],
                        key is not None, b),
                None, cfg.activation, cfg.layernorm_eps)
        else:
            x = cp_mlp_block(
                *args, 1.0,
                _mlp_bm(False, x.shape[1], e, bp["fc1"]["kernel"].shape[-1],
                        key is not None, b),
                None, cfg.activation, cfg.layernorm_eps)
        if tp > 1:
            x = jax.lax.psum(x, tp_axis)
        return x  # residual + drop-path fused in-kernel
    if fused_dense:
        # LN2 prologue + GELU epilogue fused into the fc1 kernel — neither
        # the normalized input nor the (B,N,4E) pre-activation round-trips
        # HBM (cara.py:81-84 in one pass).
        if use_elem:
            u, vmat = _adapter_uv("fc1")
            act = cp_dense_ln_wd(
                x, bp["fc1"]["kernel"], bp["fc1"]["bias"],
                u.astype(x.dtype), (vmat * s).astype(x.dtype),
                (cb_up * s).astype(x.dtype),
                bp["ln2_scale"], bp["ln2_bias"], _wd_seed(k_wd_up),
                1.0, cara_cfg.weight_dropout, 256, 1024, 768, None,
                cfg.activation, cfg.layernorm_eps)
        else:
            comp = _rank_comp(k_wd_up)
            u, vmat = _adapter_uv("fc1", comp)
            u = _row_u(u, k_wd_up)
            act = cp_dense_ln(
                x, bp["fc1"]["kernel"], bp["fc1"]["bias"],
                u.astype(x.dtype), (vmat * s).astype(x.dtype),
                (cb_up * s).astype(x.dtype),
                bp["ln2_scale"], bp["ln2_bias"], 1.0,
                512, mr * e, 768, None, cfg.activation, cfg.layernorm_eps)
    else:
      xm = layer_norm(x, bp["ln2_scale"], bp["ln2_bias"], cfg.layernorm_eps)
      up = matk(xm, bp["fc1"]["kernel"]) + bp["fc1"]["bias"]
      if use_cara:
        if moe_gates is not None:
            from cara_tpu.models import moe as moe_lib

            ud = moe_lib.moe_rows_delta_out(
                xm, p1_up, cara_params, moe_gates,
                drop_rng=k_wd_up, rate=cara_cfg.weight_dropout)
            cb2 = moe_lib.moe_bias(moe_gates, cara_params["bias2"])
        elif lora:
            ud = lora_lib.delta(
                _row_x(xm, k_wd_up), p1["fc1"],
                rate=0.0 if row_wd else cara_cfg.weight_dropout,
                drop_rng=None if row_wd else k_wd_up,
                element=materialized or use_elem)
            cb2 = cb_up
        elif materialized or use_elem:
            mask = cp_ops.weight_dropout_mask(
                k_wd_up, (mr * e, e), cara_cfg.weight_dropout, x.dtype)
            ud = cp_ops.rows_delta_out_materialized(
                xm, p1_up, cara_params["P2"], cara_params["P3"],
                cara_params["R2"], mask)
            cb2 = cara_params["bias2"]
        else:
            comp = _rank_comp(k_wd_up)
            ud = cp_ops.rows_delta_out_factorized(
                _row_x(xm, k_wd_up), p1_up, cara_params["P2"],
                cara_params["P3"], cara_params["R2"], comp)
            cb2 = cara_params["bias2"]
        up = up + (ud + cb2) * s  # cara.py:81-82
      if cfg.activation == "quick_gelu":  # CLIP: x * sigmoid(1.702 x)
        act = up * jax.nn.sigmoid(1.702 * up)
      else:
        act = jax.nn.gelu(up, approximate=False)
    act = dropout(act, cfg.dropout_rate, k_do2)
    if fused_dense:
        if use_elem:
            u, vmat = _adapter_uv("fc2")
            down = cp_dense_wd(
                act, bp["fc2"]["kernel"], bp["fc2"]["bias"],
                u.astype(x.dtype), (vmat * s).astype(x.dtype),
                (cb_down * s).astype(x.dtype),
                _wd_seed(k_wd_down), 1.0, cara_cfg.weight_dropout)
        else:
            comp = _rank_comp(k_wd_down)
            u, vmat = _adapter_uv("fc2", comp)
            u = _row_u(u, k_wd_down)
            down = cp_dense(
                act, bp["fc2"]["kernel"], bp["fc2"]["bias"],
                u.astype(x.dtype), (vmat * s).astype(x.dtype),
                (cb_down * s).astype(x.dtype),
                1.0)  # cara.py:92-93
    else:
      down = matk(act, bp["fc2"]["kernel"]) + bp["fc2"]["bias"]
      if use_cara:
        if moe_gates is not None:
            from cara_tpu.models import moe as moe_lib

            dd = moe_lib.moe_rows_delta_in(
                act, p1_down, cara_params, moe_gates,
                drop_rng=k_wd_down, rate=cara_cfg.weight_dropout)
            cb3 = moe_lib.moe_bias(moe_gates, cara_params["bias3"])
        elif lora:
            dd = lora_lib.delta(
                _row_x(act, k_wd_down), p1["fc2"],
                rate=0.0 if row_wd else cara_cfg.weight_dropout,
                drop_rng=None if row_wd else k_wd_down,
                element=materialized or use_elem)
            cb3 = cb_down
        elif materialized or use_elem:
            mask = cp_ops.weight_dropout_mask(
                k_wd_down, (mr * e, e), cara_cfg.weight_dropout, x.dtype)
            dd = cp_ops.rows_delta_in_materialized(
                act, p1_down, cara_params["P2"], cara_params["P3"],
                cara_params["R2"], mask)
            cb3 = cara_params["bias3"]
        else:
            comp = _rank_comp(k_wd_down)
            dd = cp_ops.rows_delta_in_factorized(
                _row_x(act, k_wd_down), p1_down, cara_params["P2"],
                cara_params["P3"], cara_params["R2"], comp)
            cb3 = cara_params["bias3"]
        down = down + (dd + cb3) * s  # cara.py:92-93
      if ad is not None and ad_seq:
        # Houlsby: internal-skip bottleneck on the MLP sublayer output.
        down = down + adapter_lib.bottleneck(
            down, ad["mlp_down"], ad["mlp_up"], "gelu", k_ad_mlp, ad_rate)
    down = dropout(down, cfg.dropout_rate, k_do3)
    x = x + drop_path(down, dpr, k_dp2)
    if ad_par is not None:
        x = x + ad_par
    return x


def resolve_dense_impl(has_cara: bool, cara_cfg, cfg=None,
                       train: bool = True) -> str:
    """Default dense implementation: the fused Pallas stack (block
    megakernels + cp_dense, custom VJPs) on TPU — measured past XLA's
    pipelined GEMMs (85.9 vs 103 ms/step element-dropout, 24.6 vs 27.7 ms
    eval fwd, ViT-B rank-8 bs64).  Applies to the plain/merged backbone
    too (zero CP factors).  Falls back to XLA off-TPU, for the
    materialized-delta path, and for CP order 2 (no rank-space
    contraction).

    GEOMETRY-AWARE at eval (VERDICT r4 weak 5): adapter eval flips to XLA
    dense at ViT-H scale (50.6 vs 55.1 ms, benchmarks/RESULTS.md
    "ViT-H/14" — the megakernel m-tiles stop amortizing the weight
    streams) while ViT-L stays fused-favorable (38.9 vs 39.4).  The tune
    cache's ``dense_impl`` knob (0 = xla, 1 = fused; shipped ViT-H eval
    winner in ``tune_defaults.json``) is consulted first, then an
    E*hidden working-set threshold between the measured ViT-L (4.2M,
    fused) and ViT-H (6.6M, xla) geometries.  Train keeps the fused
    default at every measured scale (2.0x XLA-with-remat at ViT-H)."""
    if jax.default_backend() != "tpu":
        return "xla"
    if not has_cara:
        # Measured: the plain/merged backbone is FASTER on XLA dense +
        # fused attention (2846 img/s serving) than through the megakernels
        # with zero factors (2578) — without adapter math to amortize, the
        # zero-rank GEMMs and coarser grids only cost.  dense_impl="fused"
        # opts in explicitly.
        return "xla"
    if cara_cfg.method.startswith("vpt") or cara_cfg.method in (
            "ssf", "bitfit", "adapter", "adaptformer", "linear", "full"):
        # No low-rank delta to fuse: VPT lengthens the sequence, SSF/BitFit
        # fold into the frozen weights in-trace, the bottleneck
        # adapters are nonlinear modules injected on the XLA block path,
        # and linear/full run the plain backbone (full additionally NEEDS
        # the XLA path: the megakernel VJPs emit no dense-weight grads) —
        # all run the plain block math, where XLA dense + fused attention
        # wins (same measurement as the merged backbone above).  This also
        # keeps fused-TP (which slices factor trees) disengaged.
        return "xla"
    if cara_cfg.delta_impl == "factorized" and cara_cfg.cp_order != 2:
        if cfg is not None and not train:
            from cara_tpu import tune

            hidden = cfg.mlp_ratio * cfg.embed_dim
            v = tune.lookup("dense_impl",
                            tune.dense_impl_key(cfg.embed_dim, hidden,
                                                train=False))
            if v is not None:
                return "fused" if v else "xla"
            if cfg.embed_dim * hidden >= 5_000_000:
                return "xla"  # past the ViT-L/ViT-H measured boundary
        return "fused"
    return "xla"


def vit_forward(
    params: Params,
    x: jax.Array,
    cfg: ViTConfig,
    *,
    cara_params: Optional[Dict[str, jax.Array]] = None,
    cara_cfg: Optional[CaraConfig] = None,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    sample_rng: Optional[jax.Array] = None,
    remat=False,
    attn_impl: str = "auto",
    dense_impl: str = "auto",
    tp_axis: Optional[str] = None,
    scale_override: Optional[jax.Array] = None,
    token_sharding=None,
    return_moe_aux: bool = False,
) -> jax.Array:
    """Full forward: images (B, H, W, C) NHWC -> logits (B, num_classes).

    Mixture-of-expert adapters (``cara_cfg.moe_experts > 1``,
    ``models.moe``): ``cara_params`` must be the ``{"experts", "router"}``
    tree; the router runs once on the post-stem tokens and the gates ride
    every block.  Forces ``dense_impl="xla"`` (the fused factor kernels
    have no expert axis).  ``return_moe_aux=True`` returns
    ``(logits, aux)`` where ``aux`` is the load-balance loss (0.0 when MoE
    is off) — training adds ``moe_aux_coef * aux`` to the objective.

    ``token_sharding``: optional ``NamedSharding`` for the (B, NP, E) token
    activations — sequence parallelism.  Asserted after the stem and on
    every scan-carry boundary, so GSPMD keeps tokens sharded along the seq
    axis through the whole stack (attention gathers k/v internally; LN and
    the GEMMs stay row-parallel).  XLA impls only (Pallas is opaque to the
    partitioner) — ``train.steps`` enforces that.

    ``scale_override``: optional 0-d traced delta scale replacing the
    static ``cara_cfg.scale`` (see ``_block``) — one executable serves
    every per-task scale when the caller threads it from the batch.

    ``train=True`` with an ``rng`` enables drop-path and the CaRA weight
    dropout; eval is fully deterministic.  ``sample_rng`` (default: ``rng``)
    separately drives per-sample randomness (drop-path, activation dropout)
    — under data-parallel ``shard_map`` the caller folds the shard index
    into it while ``rng`` stays shard-invariant, keeping the weight-dropout
    masks shared across the global batch (``cara.py:35`` semantics).
    ``remat`` wraps the per-layer body in ``jax.checkpoint`` to trade FLOPs
    for HBM during training.  ``attn_impl``: "flash" (fused Pallas kernel),
    "xla", or "auto" (flash on TPU, xla elsewhere).
    """
    if (cara_params is None) != (cara_cfg is None):
        raise ValueError("cara_params and cara_cfg must be provided together")
    if cara_cfg is not None and cara_cfg.method.startswith("fact"):
        # FacT (models/fact.py): collapse the shared TT/Tucker factors
        # into the per-site layer-stacked LoRA tree IN-TRACE (rank-space
        # einsums), then run the whole forward as method="lora" — every
        # downstream consumer (fused megakernels, TP slicing, weight
        # dropout, pipeline) sees its native collapsed-(U, V) form while
        # gradients flow to the shared factors.
        from cara_tpu.models import fact as fact_lib

        if not fact_lib.is_fact_params(cara_params):
            raise ValueError(
                f"cara_cfg.method={cara_cfg.method!r} wants the shared "
                "factor tree from models.fact.init_fact_params (U/V + "
                f"G or P/C); got keys {sorted(cara_params)}")
        cara_params = fact_lib.expand_to_lora(cara_params, cfg, cara_cfg)
        cara_cfg = dataclasses.replace(cara_cfg, method="lora")
    if cara_cfg is not None and cara_cfg.method in ("ssf", "bitfit"):
        # SSF / BitFit (models/ssf.py, models/bitfit.py): both methods
        # fold EXACTLY into the frozen weights, so apply them IN-TRACE to
        # the param pytree and run the plain (delta-less) forward — every
        # downstream consumer (fused megakernels, TP/GSPMD, pipeline,
        # quantized backbones) is untouched while gradients flow through
        # the fold to the adapter tree.
        if cara_cfg.method == "ssf":
            from cara_tpu.models import ssf as ssf_lib

            if not ssf_lib.is_ssf_params(cara_params):
                raise ValueError(
                    "cara_cfg.method='ssf' wants the (gamma, beta) tree "
                    "from models.ssf.init_ssf_params; got keys "
                    f"{sorted(cara_params)}")
            params = ssf_lib.apply_ssf(params, cara_params)
        else:
            from cara_tpu.models import bitfit as bitfit_lib

            if not bitfit_lib.is_bitfit_params(cara_params):
                raise ValueError(
                    "cara_cfg.method='bitfit' wants the bias-delta tree "
                    "from models.bitfit.init_bitfit_params; got keys "
                    f"{sorted(cara_params)}")
            params = bitfit_lib.apply_bitfit(params, cara_params)
        cara_params = cara_cfg = None
    vpt_prompts = None
    vpt_pos0 = 1 if cfg.use_cls_token else 0
    if cara_cfg is not None and cara_cfg.method.startswith("vpt"):
        # VPT (models/vpt.py): extract the prompt stack, then run the
        # plain block path on the lengthened sequence.  Deep mode threads
        # the per-layer prompts through the same lax.scan operand slots as
        # every other per-layer quantity.
        from cara_tpu.models import vpt as vpt_lib

        if not vpt_lib.is_vpt_params(cara_params):
            raise ValueError(
                f"cara_cfg.method={cara_cfg.method!r} wants the "
                "{'prompts'} tree from models.vpt.init_vpt_params; got "
                f"keys {sorted(cara_params)}")
        vpt_lib.check_geometry(cara_params, cfg, cara_cfg)
        vpt_prompts = cara_params["prompts"]
        vpt_deep = cara_cfg.method == "vpt_deep"
        vpt_n = vpt_prompts.shape[1]
        cara_params = cara_cfg = None
    if cara_cfg is not None and cara_cfg.method in ("adapter",
                                                    "adaptformer"):
        # Bottleneck adapters (models/adapter.py): per-layer nonlinear
        # modules — they ride the p1 scan slot as a layer-stacked dict
        # (the LoRA precedent) and inject on the XLA block path.
        from cara_tpu.models import adapter as adapter_lib

        if not adapter_lib.is_adapter_params(cara_params):
            raise ValueError(
                f"cara_cfg.method={cara_cfg.method!r} wants the "
                "layer-stacked bottleneck tree from "
                "models.adapter.init_adapter_params; got keys "
                f"{sorted(cara_params)}")
        adapter_lib.check_geometry(cara_params, cfg, cara_cfg)
        if dense_impl == "fused":
            raise ValueError(
                "bottleneck adapters are nonlinear modules on the XLA "
                "block path — the fused megakernels have no insertion "
                "point for them (dense_impl='fused' would silently skip "
                "the adapters); use dense_impl='auto' or 'xla'")
    moe = cara_cfg is not None and cara_cfg.moe
    if moe:
        from cara_tpu.models import moe as moe_lib

        moe_lib.validate_moe(cara_cfg, train=train)
        if not moe_lib.is_moe_params(cara_params):
            raise ValueError(
                "cara_cfg.moe_experts > 1 wants the {'experts', 'router'} "
                "param tree from models.moe.init_moe_params; got keys "
                f"{sorted(cara_params)}")
        if dense_impl == "fused":
            raise ValueError("MoE adapters require dense_impl='xla' — the "
                             "fused Pallas factor kernels have no expert "
                             "axis")
        dense_impl = "xla"
    if attn_impl == "auto":
        attn_impl = "fused" if jax.default_backend() == "tpu" else "xla"
    if dense_impl == "auto":
        dense_impl = resolve_dense_impl(cara_params is not None, cara_cfg,
                                        cfg, train=train)
        if (dense_impl == "fused"
                and isinstance(params["blocks"]["qkv"]["kernel"], dict)):
            # int8-quantized blocks: the fused Pallas kernels consume
            # dense kernel arrays, so auto falls back to the XLA dense
            # path — matk handles the quant dicts there (both the w8
            # dequant GEMM and the w8a8 int8 MXU path), and adapter
            # deltas still add on top (`qkv + delta`, cara.py:42).
            dense_impl = "xla"
    if (dense_impl == "fused"
            and isinstance(params["blocks"]["qkv"]["kernel"], dict)):
        raise ValueError(
            "int8-quantized weights require dense_impl='xla' — the fused "
            "Pallas kernels consume dense kernel arrays (the quant dicts "
            "would fail deep inside pallas_call otherwise)")
    use_rng = train and rng is not None
    if train and rng is None and (
            cfg.dropout_rate > 0.0 or cfg.attn_dropout_rate > 0.0
            or cfg.drop_path_rate > 0.0
            or (cara_cfg is not None and (cara_cfg.weight_dropout > 0.0
                                          or cara_cfg.adapter_dropout
                                          > 0.0))):
        raise ValueError(
            "train=True with a nonzero dropout/drop-path/weight-dropout "
            "rate requires an rng — refusing to silently skip "
            f"regularization (dropout={cfg.dropout_rate}, "
            f"attn={cfg.attn_dropout_rate}, "
            f"drop_path={cfg.drop_path_rate}, weight_dropout="
            f"{cara_cfg.weight_dropout if cara_cfg is not None else 0.0})")
    L = cfg.depth

    tokens = patch_embed(params, x, cfg)
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(
            params["cls"], (tokens.shape[0], 1, cfg.embed_dim)
        ).astype(tokens.dtype)
        tokens = jnp.concatenate([cls, tokens], axis=1)
    tokens = tokens + params["pos_embed"].astype(tokens.dtype)
    if cfg.ln_pre:
        tokens = layer_norm(tokens, params["ln_pre"]["scale"],
                            params["ln_pre"]["bias"], cfg.layernorm_eps)
    if vpt_prompts is not None:
        # Prompts sit between cls and patch tokens, after pos-embed/ln_pre
        # (the paper's placement); no positional embedding on prompts.
        tokens = vpt_lib.insert_prompts(tokens, vpt_prompts[0], vpt_pos0)
    # Sublane-aligned residual stream: pad the token axis ONCE (197 -> 200)
    # when every block takes the attention megakernel, so the per-layer
    # (B, N, E) <-> (B*N, E) reshapes around the MLP kernels are free
    # bitcasts and the MLP row pad/slice disappears (see
    # _stream_pad_eligible).  The pad rows are masked inside the attention
    # kernel (n_real) and inert everywhere else; sliced off after the scan.
    n_tok_real = tokens.shape[1]
    n_strm = -(-n_tok_real // 8) * 8
    stream_pad = (n_strm != n_tok_real and token_sharding is None
                  and _stream_pad_eligible(
                      params, cfg, cara_cfg, cara_params, attn_impl,
                      dense_impl, use_rng, n_strm, tp_axis))
    if stream_pad:
        tokens = jnp.pad(
            tokens, ((0, 0), (0, n_strm - n_tok_real), (0, 0)))
    if token_sharding is not None:
        tokens = jax.lax.with_sharding_constraint(tokens, token_sharding)

    dpr = jnp.linspace(0.0, cfg.drop_path_rate, L)  # timm per-block rates
    moe_gates = None
    moe_aux = jnp.float32(0.0)
    cara_blocks = cara_params
    if moe:
        moe_gates, moe_aux = moe_lib.route(
            tokens, cara_params["router"], cara_cfg.moe_top_k)
        cara_blocks = cara_params["experts"]
        a1_stack, p1_stack = moe_lib.moe_stacked_layer_slices(
            cara_blocks, cfg, cara_cfg)
    elif cara_params is not None and cara_cfg.method == "lora":
        from cara_tpu.models import lora as lora_lib

        if not lora_lib.is_lora_params(cara_params):
            raise ValueError(
                "cara_cfg.method='lora' wants the per-site {a, b} tree "
                "from models.lora.init_lora_params; got keys "
                f"{sorted(cara_params)}")
        # LoRA state is fully per-layer: the two scan operand slots carry
        # the layer-stacked qkv pair and the {proj, fc1, fc2} dict.
        a1_stack, p1_stack = lora_lib.layer_stacks(cara_params)
    elif cara_params is not None and cara_cfg.method in ("adapter",
                                                         "adaptformer"):
        # Bottleneck-adapter state is fully per-layer too: the whole tree
        # (every leaf (L, ...)) rides the p1 slot; the a1 slot is unused.
        a1_stack = jnp.zeros((L, 1, 1), tokens.dtype)
        p1_stack = cara_params
    elif cara_params is not None:
        if not isinstance(cara_params, dict) or "A1" not in cara_params:
            got = (sorted(cara_params) if isinstance(cara_params, dict)
                   else type(cara_params))
            raise ValueError(
                "cara_cfg.method='cara' wants the CP factor tree "
                f"(A1..., P1-P3, R1/R2, bias1-3); got keys {got} "
                "— did you load a LoRA checkpoint without method='lora'?")
        a1_stack, p1_stack = cara_lib.stacked_layer_slices(
            cara_params, cfg, cara_cfg)
    else:
        a1_stack = p1_stack = jnp.zeros((L, 1, 1), tokens.dtype)  # unused

    # Two DISTINCT derived streams: jax.random.split(key, 4) is an exact
    # prefix of split(key, 6) (partitionable threefry), so seeding both
    # streams from the same key would alias the per-layer weight-dropout
    # keys with the drop-path/dropout keys — the two regularizers would be
    # deterministically coupled.  fold_in with distinct tags decorrelates
    # them even when sample_rng defaults to rng.
    if use_rng:
        keys = jax.random.split(jax.random.fold_in(rng, 0), L)
        s_base = rng if sample_rng is None else sample_rng
        skeys = jax.random.split(jax.random.fold_in(s_base, 1), L)
    else:
        keys = skeys = None

    vpt_deep_stack = (vpt_prompts if vpt_prompts is not None and vpt_deep
                      else None)

    def body(carry, xs):
        if vpt_deep_stack is not None:
            # VPT-Deep: replace the prompt slots with this layer's fresh
            # learnable tokens before the block runs (models/vpt.py).
            carry = vpt_lib.set_prompts(carry, xs[-1], vpt_pos0)
            xs = xs[:-1]
        if use_rng:
            bp, f1, p1, dpr_l, key, skey = xs
        else:
            bp, f1, p1, dpr_l = xs
            key = skey = None
        out = _block(
            carry, bp, f1, p1, dpr_l, key, skey, cfg, cara_blocks, cara_cfg,
            attn_impl, dense_impl, tp_axis, scale_override, moe_gates,
            n_real=n_tok_real if stream_pad else None,
        )
        if token_sharding is not None:
            out = jax.lax.with_sharding_constraint(out, token_sharding)
        return out, None

    if remat == "dots":
        # Selective remat: keep matmul outputs as residuals, recompute only
        # the cheap elementwise/norm ops in the backward.
        body = jax.checkpoint(
            body, policy=jax.checkpoint_policies.checkpoint_dots)
    elif remat:
        body = jax.checkpoint(body)

    xs = (params["blocks"], a1_stack, p1_stack, dpr)
    if use_rng:
        xs = xs + (keys, skeys)
    if vpt_deep_stack is not None:
        xs = xs + (vpt_deep_stack,)
    tokens, _ = jax.lax.scan(body, tokens, xs, unroll=_scan_unroll(L))
    if stream_pad:
        tokens = tokens[:, :n_tok_real]
    if vpt_prompts is not None and not cfg.use_cls_token:
        # Mean-pool models average the PATCH tokens only; cls models read
        # position 0, which prompts never occupy (they sit at 1..P).
        tokens = vpt_lib.strip_prompts(tokens, vpt_n, vpt_pos0)

    if cfg.use_cls_token:
        # LayerNorm is per-token: LN(tokens)[:, 0] == LN(tokens[:, 0]).
        # Slicing first runs the final LN on (B, E) instead of (B, N, E) —
        # only the cls row feeds the head.
        feat = layer_norm(tokens[:, 0], params["norm"]["scale"],
                          params["norm"]["bias"], cfg.layernorm_eps)
    else:
        tokens = layer_norm(tokens, params["norm"]["scale"],
                            params["norm"]["bias"], cfg.layernorm_eps)
        feat = jnp.mean(tokens, axis=1)
    if cfg.repr_size is not None:
        pl_ = params["pre_logits"]
        feat = jnp.tanh(feat @ pl_["kernel"] + pl_["bias"])
    if cfg.proj_dim is not None:
        feat = feat @ params["proj_out"]["kernel"]
    if "head" not in params:
        out = feat
    else:
        out = feat @ params["head"]["kernel"] + params["head"]["bias"]
    if return_moe_aux:
        return out, moe_aux
    return out


# Convenience: a jitted eval forward factory.
def make_eval_fn(cfg: ViTConfig, cara_cfg: Optional[CaraConfig] = None):
    @partial(jax.jit, static_argnames=())
    def eval_fn(params, cara_params, x):
        return vit_forward(
            params, x, cfg, cara_params=cara_params,
            cara_cfg=cara_cfg if cara_params is not None else None,
            train=False,
        )
    return eval_fn
