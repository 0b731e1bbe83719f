"""ToMe (Token Merging): training-free ViT inference acceleration.

Bolya et al., "Token Merging: Your ViT But Faster" (ICLR 2023,
arXiv:2210.09461).  Between the attention and MLP halves of every
transformer block, the ``r`` most similar token pairs — bipartite soft
matching on the attention keys, mean over heads — are merged by
size-weighted average, and attention becomes *proportional*
(``softmax(qk^T/sqrt(d) + log s)``) so a token that represents ``s``
patches votes with weight ``s``.

Why this lives here (TPU rationale): ``r`` is a static per-layer
constant, so every intermediate shape is static — the layer loop
unrolls (depth iterations) over a shrinking token axis and XLA compiles
ONE executable with zero dynamic shapes.  It cuts eval FLOPs
*algorithmically*, orthogonal to the kernel work: the per-head Dh=64
attention GEMMs that pin the fused kernels at ~25% MXU utilization
(benchmarks/RESULTS.md, round 3 forward-efficiency push) simply run on
fewer tokens — the one lever the Mosaic lowering analysis left open.

Eval-only and opt-in (``Predictor(tome_r=...)``, ``serve --tome-r``,
``export --tome-r``): merging changes the math, with the paper's
measured off-the-shelf cost on ViT-B/16 @ 224 of roughly 0.1-0.5 top-1
for r <= 13 (Table 1 / Fig. 4 of the paper; re-validate on real VTAB
data via ``--evaluate`` + ``--tome-r`` when artifacts are available).
The reference has no inference-acceleration surface at all — its only
eval entry is the training CLI's ``--evaluate`` flag
(``image_classification/vit_cp.py:109-114,168-173``).

Works on dense (merged / plain) backbones, including int8-quantized
ones (``matk`` consumes the quant dicts).  Unmerged adapter params are
rejected — merge first (exact at eval, ``models/merge.py``).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from cara_tpu.config import ViTConfig
from cara_tpu.ops.layers import layer_norm, mha


def merge_schedule(cfg: ViTConfig, r: int) -> Tuple[int, ...]:
    """Per-layer merge counts for a constant-``r`` schedule.

    Clamps each layer's count like the official implementation:
    ``r_l = min(r, (n_l - protected) // 2)`` with the cls token
    protected, so merging can never consume the sequence.
    """
    if r < 0:
        raise ValueError(f"tome r must be >= 0, got {r}")
    protected = 1 if cfg.use_cls_token else 0
    out, n = [], cfg.seq_len
    for _ in range(cfg.depth):
        rl = max(0, min(r, (n - protected) // 2))
        out.append(rl)
        n -= rl
    return tuple(out)


def token_counts(cfg: ViTConfig, r: int) -> Tuple[int, ...]:
    """Token count entering each layer (diagnostics / FLOP accounting)."""
    ns, n = [], cfg.seq_len
    for rl in merge_schedule(cfg, r):
        ns.append(n)
        n -= rl
    return tuple(ns)


def _bipartite_indices(metric: jax.Array, r: int, protect_cls: bool):
    """Bipartite soft matching (ToMe section 3): tokens alternate into
    sets A (even index — contains cls) and B (odd); each A-token scores
    its most similar B-token by cosine similarity, and the ``r``
    best-scoring A-tokens merge into their B targets.

    Returns ``(unm_idx, src_idx, dst_idx)``: A-set indices kept
    (sorted ascending, so a protected cls stays first), A-set indices
    merged, and each merged token's B-set destination.
    """
    m = metric.astype(jnp.float32)
    m = m / jnp.maximum(
        jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-6)
    a, b = m[:, 0::2], m[:, 1::2]
    scores = jnp.einsum("bnd,bmd->bnm", a, b)
    if protect_cls:
        scores = scores.at[:, 0, :].set(-jnp.inf)  # cls never merges
    node_max = jnp.max(scores, axis=-1)
    node_idx = jnp.argmax(scores, axis=-1)
    order = jnp.argsort(-node_max, axis=-1)       # best edges first
    src_idx = order[:, :r]
    unm_idx = jnp.sort(order[:, r:], axis=-1)     # original token order
    dst_idx = jnp.take_along_axis(node_idx, src_idx, axis=-1)
    return unm_idx, src_idx, dst_idx


def _merge_sum(x: jax.Array, unm_idx, src_idx, dst_idx) -> jax.Array:
    """(B, N, D) -> (B, N - r, D): the ``r`` selected A-rows are SUMMED
    into their B destinations; output is [kept A-rows, B-rows]."""
    src, dst = x[:, 0::2], x[:, 1::2]
    unm = jnp.take_along_axis(src, unm_idx[..., None], axis=1)
    rows = jnp.take_along_axis(src, src_idx[..., None], axis=1)
    bidx = jnp.arange(x.shape[0])[:, None]
    dst = dst.at[bidx, dst_idx].add(rows)
    return jnp.concatenate([unm, dst], axis=1)


def _tome_block(x, sizes, bp, cfg: ViTConfig, r: int, biased: bool):
    """One eval transformer block with an r-pair merge between the
    halves.  Matches ``vit._block``'s XLA eval math exactly when
    ``r == 0 and not biased`` (the parity test relies on it)."""
    from cara_tpu.models.vit import matk

    e, h, d = cfg.embed_dim, cfg.num_heads, cfg.head_dim
    bsz, n = x.shape[:2]

    xa = layer_norm(x, bp["ln1_scale"], bp["ln1_bias"], cfg.layernorm_eps)
    qkv = matk(xa, bp["qkv"]["kernel"]) + bp["qkv"]["bias"]
    qkv = qkv.reshape(bsz, n, 3, h, d)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    # Proportional attention: a size-s merged token is s patches' worth
    # of evidence (paper eq. 1).  Skipped while all sizes are still 1
    # (log 1 == 0) to keep the unbiased fast path bit-identical.
    key_bias = jnp.log(sizes)[:, None, None, :] if biased else None
    attn_out = mha(q, k, v, d ** -0.5, key_bias=key_bias)
    proj = matk(attn_out, bp["proj"]["kernel"]) + bp["proj"]["bias"]
    x = x + proj

    if r > 0:
        metric = jnp.mean(k, axis=1)  # (B, N, Dh) — key mean over heads
        idxs = _bipartite_indices(metric, r, cfg.use_cls_token)
        # Size-weighted average, accumulated in fp32.
        ws = _merge_sum(x.astype(jnp.float32) * sizes[..., None], *idxs)
        sizes = _merge_sum(sizes[..., None], *idxs)[..., 0]
        x = (ws / sizes[..., None]).astype(x.dtype)

    xm = layer_norm(x, bp["ln2_scale"], bp["ln2_bias"], cfg.layernorm_eps)
    up = matk(xm, bp["fc1"]["kernel"]) + bp["fc1"]["bias"]
    if cfg.activation == "quick_gelu":
        act = up * jax.nn.sigmoid(1.702 * up)
    else:
        act = jax.nn.gelu(up, approximate=False)
    down = matk(act, bp["fc2"]["kernel"]) + bp["fc2"]["bias"]
    return x + down, sizes


def tome_forward(
    params: Dict[str, Any],
    x: jax.Array,
    cfg: ViTConfig,
    r: int,
) -> jax.Array:
    """Eval forward with per-layer token merging: images (B, H, W, C)
    -> logits (B, num_classes).

    Dense (merged/plain/quantized) backbones only.  The layer loop is
    UNROLLED — each layer is its own static shape — so this trades one
    longer trace/compile (depth bodies instead of one scanned body) for
    the FLOP cut; all shapes stay static and the executable caches like
    any other.
    """
    if not isinstance(params["blocks"]["qkv"], dict) or (
            "kernel" not in params["blocks"]["qkv"]):
        raise ValueError("tome_forward wants the stacked dense block tree")
    from cara_tpu.models.vit import patch_embed

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

    sched = merge_schedule(cfg, r)
    sizes = jnp.ones(tokens.shape[:2], jnp.float32)
    merged_yet = False
    for layer in range(cfg.depth):
        bp = jax.tree.map(lambda a: a[layer], params["blocks"])
        tokens, sizes = _tome_block(
            tokens, sizes, bp, cfg, sched[layer], biased=merged_yet)
        merged_yet = merged_yet or sched[layer] > 0

    if cfg.use_cls_token:
        feat = layer_norm(tokens[:, 0], params["norm"]["scale"],
                          params["norm"]["bias"], cfg.layernorm_eps)
    else:
        tokens = layer_norm(tokens, params["norm"]["scale"],
                            params["norm"]["bias"], cfg.layernorm_eps)
        # Size-weighted mean == the mean over the original unmerged
        # token set (each merged token stands for `size` patches).
        w = (sizes / jnp.sum(sizes, axis=1, keepdims=True))[..., None]
        feat = jnp.sum(tokens.astype(jnp.float32) * w,
                       axis=1).astype(tokens.dtype)
    if cfg.repr_size is not None:
        pl_ = params["pre_logits"]
        feat = jnp.tanh(feat @ pl_["kernel"] + pl_["bias"])
    if cfg.proj_dim is not None:
        feat = feat @ params["proj_out"]["kernel"]
    if "head" not in params:
        return feat
    return feat @ params["head"]["kernel"] + params["head"]["bias"]
