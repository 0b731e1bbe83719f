"""Pipeline parallelism: GPipe-style microbatch pipeline over the layer scan,
optionally composed with fused tensor parallelism on a (data, stage, model)
3-D mesh (see ``pp_vit_forward``).

Beyond-reference scale-out (the reference is single-GPU — its only
multi-device artifact is one commented-out ``DataParallel`` line,
``image_classification/dim_experiment.py:419``).  This module adds the
"stage" axis to the mesh portfolio (data / model / task / stage): the
stacked transformer blocks — already laid out ``(L, ...)`` for ``lax.scan``
(``models/vit.py``) — are sharded over a ``stage`` mesh axis, and a
microbatched GPipe schedule rides ``shard_map`` + ``lax.ppermute``:

* Stage ``k`` holds layers ``[k*L/S, (k+1)*L/S)`` — the leading-axis shard
  of every stacked block leaf, of the CaRA per-layer factor stacks, and of
  the per-layer drop-path rates/rng keys.  Nothing is re-laid-out: the
  ``lax.scan`` body runs unchanged on the local slice.
* The batch splits into ``M`` microbatches.  At tick ``t`` stage 0 ingests
  microbatch ``t``, every stage runs its local layers on its resident
  activation, and activations ``ppermute`` one stage forward — classic
  GPipe fill/steady/drain with ``M + S - 1`` ticks and an ``(S-1)/(M+S-1)``
  bubble.  All shapes are static; the schedule is a ``lax.scan`` over ticks.
* Only the pooled feature leaves the pipeline (the cls row per microbatch —
  ``(M, mb, E)``), psum-replicated from the last stage; patch-embed and the
  final-LN/head run outside the ``shard_map`` island in plain GSPMD-land,
  so the ``data`` mesh axis composes transparently (mesh ``(data, stage)``).
* Autodiff: ``ppermute``/``psum``/``dynamic_update_slice`` are all
  transposable, so ``jax.grad`` through the pipeline yields the reverse
  schedule automatically — no hand-written backward pass.

RNG semantics match the grad-accum microbatch convention
(``train/steps.py``): weight-dropout masks (batch-independent, reference
``cara.py:35``) derive from the same per-layer key stream as the
single-device path — bit-identical masks at any stage count; per-sample
randomness (drop-path, activation dropout) folds in the microbatch index
and the data-shard index.  Consequently a pipeline run is bit-identical
across stage counts at fixed microbatch count (``S=1`` == ``S=4``), and
bit-identical to the plain ``vit_forward`` when regularization is off.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models.vit import _block, patch_embed
from cara_tpu.ops.layers import layer_norm
from cara_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

STAGE_AXIS = "stage"

Params = Dict[str, Any]


def make_pp_mesh(shape, devices=None) -> Mesh:
    """A ``(data, stage)`` — or, with a 3-element shape, a
    ``(data, stage, model)`` — mesh for pipeline(+data[+tensor])
    parallelism.  The model axis composes fused tensor parallelism INSIDE
    each pipeline stage (every stage's layer shard is additionally
    head-/hidden-sharded over ``model`` — see :func:`pp_vit_forward`)."""
    axes = ((DATA_AXIS, STAGE_AXIS) if len(shape) == 2
            else (DATA_AXIS, STAGE_AXIS, MODEL_AXIS))
    n = int(np.prod(shape))
    if devices is None:
        devices = jax.devices()
        # Same contract as make_mesh: the shape must cover every visible
        # device — silently idling chips hides a throughput loss.  Tests
        # that want a sub-mesh pass an explicit ``devices=`` slice.
        if n != len(devices):
            raise ValueError(
                f"mesh shape {shape} != {len(devices)} devices "
                f"(pass devices= explicitly for a sub-mesh)")
    elif n != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axes)


def pp_vit_forward(
    params: Params,
    x: jax.Array,
    cfg: ViTConfig,
    *,
    mesh: Mesh,
    microbatches: int,
    cara_params: Optional[Dict[str, jax.Array]] = None,
    cara_cfg: Optional[CaraConfig] = None,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    sample_rng: Optional[jax.Array] = None,
    remat: bool = True,
    attn_impl: str = "xla",
    dense_impl: str = "xla",
    scale_override: Optional[jax.Array] = None,
    repeats: int = 1,
) -> jax.Array:
    """``vit_forward`` semantics over a ``(data, stage[, model])`` mesh.

    ``microbatches`` (M) statically splits the batch; B % M == 0 and the
    microbatch must split over the data axis.  The layer count must split
    over the stage axis.  ``attn_impl``/``dense_impl`` select the per-stage
    block implementation — the Pallas megakernels run per-device inside the
    shard_map exactly as on the data-parallel fused path.

    A ``model`` mesh axis > 1 composes FUSED tensor parallelism inside each
    stage: every stage's ``(L/S, ...)`` block shard is additionally
    head-/hidden-sharded over ``model`` and the blocks run with
    ``tp_axis`` (``models.vit._block`` — ``psum_i(x/tp + dpm*y_i)`` at each
    residual keeps activations model-replicated, so the stage ``ppermute``
    and the pooled-output ``psum`` are unchanged).  This path is
    megakernel-only (``_block`` tp contract): it requires fused impls
    (``auto`` resolves to fused here), zero activation/attention dropout,
    padded sequence <= 512, and head/hidden counts divisible by the model
    size.  The fused-qkv head permutation (``mesh.tp_permute_qkv``) is
    applied IN-GRAPH on the canonical layout — callers never pre-permute
    (unlike ``steps.prepare_tp_frozen``); one (L, E, 3E) transpose per step
    is noise next to the blocks it feeds.

    ``repeats`` (V) > 1 selects the CIRCULAR (interleaved) schedule: stage
    ``s`` holds the V non-contiguous layer groups ``{r*S+s : r < V}`` and
    every microbatch makes V laps around the stage ring, so the fill/drain
    bubble shrinks from ``(S-1)/(M+S-1)`` to ``(S-1)/(M*V+S-1)`` at the
    cost of V x the ppermute traffic — the standard TPU pipeline tradeoff
    (ICI is fast, idle MXUs are not).  Math is IDENTICAL to V=1: layers
    still execute in ascending global order per microbatch, and the
    weight-dropout / per-sample key streams depend only on (microbatch,
    global layer).  Requires L % (S*V) == 0 and M >= S (stage 0 re-ingests
    lap r+1 of microbatch m exactly M-S ticks after lap r leaves the last
    stage — a fixed-delay ring buffer of M-S+1 slots).
    """
    if (cara_params is None) != (cara_cfg is None):
        raise ValueError("cara_params and cara_cfg must be provided together")
    if cara_cfg is not None and cara_cfg.method.startswith("fact"):
        # Same in-trace normalization as vit_forward: FacT's shared
        # factors collapse to the per-layer LoRA tree (models/fact.py),
        # which the stage sharding below handles tree-generically.
        import dataclasses

        from cara_tpu.models import fact as fact_lib

        cara_params = fact_lib.expand_to_lora(cara_params, cfg, cara_cfg)
        cara_cfg = dataclasses.replace(cara_cfg, method="lora")
    if cara_cfg is not None and cara_cfg.method in ("ssf", "bitfit"):
        # Same in-trace fold as vit_forward (models/ssf.py, bitfit.py):
        # the modified layer-stacked block leaves flow through the stage
        # slicing below unchanged, gradients reach the adapter tree.
        if cara_cfg.method == "ssf":
            from cara_tpu.models import ssf as ssf_lib

            params = ssf_lib.apply_ssf(params, cara_params)
        else:
            from cara_tpu.models import bitfit as bitfit_lib

            params = bitfit_lib.apply_bitfit(params, cara_params)
        cara_params = cara_cfg = None
    if cara_cfg is not None and cara_cfg.method.startswith("vpt"):
        raise ValueError(
            "VPT is not supported under pipeline parallelism yet (the "
            "deep prompt stack would need stage-local slices); train VPT "
            "with data/tensor parallelism")
    bottleneck_ad = (cara_cfg is not None
                     and cara_cfg.method in ("adapter", "adaptformer"))
    T = mesh.shape.get(MODEL_AXIS, 1)
    if bottleneck_ad and T > 1:
        raise ValueError(
            "bottleneck adapters run the XLA block path — pipeline x "
            "tensor parallelism is megakernel-only and has no insertion "
            "point for them; use --pipeline S,M (model axis 1)")
    # Same auto-resolution as vit_forward: the megakernels run per-device
    # inside the shard_map exactly like the fused data-parallel path.  A
    # model axis forces fused — _block's tp math is megakernel-only.
    if attn_impl == "auto":
        attn_impl = ("fused" if T > 1 or jax.default_backend() == "tpu"
                     else "xla")
    if dense_impl == "auto":
        if T > 1:
            dense_impl = "fused"
        else:
            from cara_tpu.models.vit import resolve_dense_impl

            dense_impl = resolve_dense_impl(cara_params is not None, cara_cfg)
    S = mesh.shape[STAGE_AXIS]
    D = mesh.shape[DATA_AXIS]
    L = cfg.depth
    M = microbatches
    if T > 1:
        npad_geom = -(-cfg.seq_len // 128) * 128
        if attn_impl != "fused" or dense_impl != "fused":
            raise ValueError(
                "pipeline x tensor parallelism is megakernel-only "
                f"(got attn_impl={attn_impl!r}, dense_impl={dense_impl!r})")
        if cfg.dropout_rate != 0.0 or cfg.attn_dropout_rate != 0.0:
            raise ValueError(
                "pipeline x tensor parallelism requires zero activation/"
                "attention dropout (megakernel path)")
        if npad_geom > 512:
            raise ValueError(
                f"padded sequence {npad_geom} > 512: past the attention "
                "megakernel's full-score ceiling — no fused-TP path")
        if cfg.num_heads % T or cfg.hidden_dim % T:
            raise ValueError(
                f"heads {cfg.num_heads} / hidden {cfg.hidden_dim} not "
                f"divisible by model-axis size {T}")
        if cara_cfg is not None and (cara_cfg.delta_impl == "materialized"
                                     or cara_cfg.cp_order == 2):
            raise ValueError(
                "fused TP needs the factorized delta impl (cp_order != 2)")
    V = repeats
    if V < 1:
        raise ValueError(f"repeats must be >= 1, got {V}")
    if L % (S * V):
        raise ValueError(
            f"depth {L} not divisible by {S} stages x {V} repeats")
    if V > 1 and M < S:
        raise ValueError(
            f"circular schedule needs microbatches >= stages "
            f"(got M={M} < S={S})")
    B = x.shape[0]
    if B % M or (B // M) % D:
        raise ValueError(
            f"batch {B} must split into {M} microbatches x {D} data shards")
    use_rng = train and rng is not None
    if train and rng is None and (
            cfg.dropout_rate > 0.0 or cfg.attn_dropout_rate > 0.0
            or cfg.drop_path_rate > 0.0
            or (cara_cfg is not None and (cara_cfg.weight_dropout > 0.0
                                          or cara_cfg.adapter_dropout
                                          > 0.0))):
        raise ValueError("train=True with nonzero regularization needs rng")

    # --- Stem (GSPMD-land: batch shards over the data axis) ---------------
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
    npad, e = tokens.shape[1], tokens.shape[2]
    tokens = tokens.reshape(M, B // M, npad, e)

    dpr = jnp.linspace(0.0, cfg.drop_path_rate, L)
    use_cara = cara_params is not None
    if use_cara and cara_cfg.method == "lora":
        # LoRA state is fully per-layer — the stacks ARE the param tree
        # (models.lora.layer_stacks); every downstream stage shard /
        # circular reorder / per-tick slice is tree-generic.
        from cara_tpu.models import lora as lora_lib

        a1, p1 = lora_lib.layer_stacks(cara_params)
    elif use_cara and bottleneck_ad:
        # Bottleneck adapters: the whole tree is per-layer (every leaf
        # (L, ...)) and rides the p1 slot tree-generically through the
        # stage shard / circular reorder / per-tick slice, exactly like
        # the LoRA dict (models/adapter.py).
        from cara_tpu.models import adapter as adapter_lib

        adapter_lib.check_geometry(cara_params, cfg, cara_cfg)
        a1 = jnp.zeros((L, 1, 1), tokens.dtype)
        p1 = cara_params
    elif use_cara:
        a1, p1 = cara_lib.stacked_layer_slices(cara_params, cfg, cara_cfg)
    else:
        a1 = p1 = jnp.zeros((L, 1, 1), tokens.dtype)

    args = dict(tokens=tokens, blocks=params["blocks"], a1=a1, p1=p1, dpr=dpr)
    if use_cara:
        args["cara"] = cara_params
        args["scale"] = (jnp.asarray(cara_cfg.scale, tokens.dtype)
                         if scale_override is None
                         else scale_override.astype(tokens.dtype))
    if use_rng:
        args["wd_rng"] = rng
        args["s_rng"] = rng if sample_rng is None else sample_rng

    # Tree-prefix specs: one leading-axis stage shard for every stacked
    # (L, ...) leaf; everything else replicated.
    in_specs = {k: P() for k in args}
    in_specs["tokens"] = P(None, DATA_AXIS, None, None)
    for k in ("blocks", "a1", "p1", "dpr"):
        in_specs[k] = P(STAGE_AXIS)
    if T > 1:
        # Per-leaf block specs: stage on the stacked L axis PLUS the
        # Megatron column/row sharding (mesh.vit_param_specs pattern) on
        # the model axis.  The qkv head permutation makes each contiguous
        # column chunk a well-formed (3, H/T, Dh) fused layout.
        from cara_tpu.parallel.mesh import tp_permute_qkv

        args["blocks"] = tp_permute_qkv(
            {"blocks": args["blocks"]}, cfg, T)["blocks"]
        in_specs["blocks"] = {
            "ln1_scale": P(STAGE_AXIS), "ln1_bias": P(STAGE_AXIS),
            "qkv": {"kernel": P(STAGE_AXIS, None, MODEL_AXIS),
                    "bias": P(STAGE_AXIS, MODEL_AXIS)},
            "proj": {"kernel": P(STAGE_AXIS, MODEL_AXIS, None),
                     "bias": P(STAGE_AXIS)},
            "ln2_scale": P(STAGE_AXIS), "ln2_bias": P(STAGE_AXIS),
            "fc1": {"kernel": P(STAGE_AXIS, None, MODEL_AXIS),
                    "bias": P(STAGE_AXIS, MODEL_AXIS)},
            "fc2": {"kernel": P(STAGE_AXIS, MODEL_AXIS, None),
                    "bias": P(STAGE_AXIS)},
        }
    if V > 1:
        # Circular layout: stage s's V groups must be CONTIGUOUS on the
        # leading axis for the stage shard, so reorder layers in-graph:
        # position (s*V + r) <- group r*S + s.  The local shard then
        # reshapes to (V, L/(S*V), ...) and indexes lap r per tick.
        lg = L // (S * V)
        order = np.concatenate([
            np.arange((r * S + s) * lg, (r * S + s + 1) * lg)
            for s in range(S) for r in range(V)])
        for k in ("blocks", "a1", "p1", "dpr"):
            args[k] = jax.tree_util.tree_map(lambda a: a[order], args[k])
    out_spec = (P(None, DATA_AXIS, None) if cfg.use_cls_token
                else P(None, DATA_AXIS, None, None))

    body = functools.partial(
        _pipeline_body, cfg=cfg, cara_cfg=cara_cfg if use_cara else None,
        S=S, M=M, L=L, V=V, use_rng=use_rng, remat=remat,
        attn_impl=attn_impl, dense_impl=dense_impl,
        tp_axis=MODEL_AXIS if T > 1 else None)
    feats = jax.shard_map(
        body, mesh=mesh, in_specs=(in_specs,), out_specs=out_spec,
        check_vma=False)(args)

    # --- Head (GSPMD-land) -------------------------------------------------
    if cfg.use_cls_token:
        feat = feats.reshape(B, e)
        feat = layer_norm(feat, params["norm"]["scale"],
                          params["norm"]["bias"], cfg.layernorm_eps)
    else:
        toks = feats.reshape(B, npad, e)
        toks = layer_norm(toks, params["norm"]["scale"],
                          params["norm"]["bias"], cfg.layernorm_eps)
        feat = jnp.mean(toks, axis=1)
    if cfg.repr_size is not None:
        pl_ = params["pre_logits"]
        feat = jnp.tanh(feat @ pl_["kernel"] + pl_["bias"])
    if cfg.proj_dim is not None:
        feat = feat @ params["proj_out"]["kernel"]
    if "head" not in params:
        return feat
    return feat @ params["head"]["kernel"] + params["head"]["bias"]


def _pipeline_body(args, *, cfg, cara_cfg, S, M, L, V, use_rng, remat,
                   attn_impl, dense_impl, tp_axis=None):
    """Per-device pipeline schedule (runs under shard_map on (data, stage)
    or (data, stage, model)): GPipe at V == 1, circular/interleaved at
    V > 1 (see ``pp_vit_forward``).

    ``args['tokens']``: (M, mb, NP, E) local microbatch slices (every stage
    holds the inputs; only stage 0 reads them — ~MB-scale redundancy that
    buys a collective-free ingest).  Stacked leaves arrive as the local
    ``(L/S, ...)`` stage slice (at V > 1: the stage's V groups,
    lap-contiguous) — under ``tp_axis`` additionally head-/hidden-sharded;
    ``_block`` psums each residual over the model axis so the resident
    activation stays model-replicated and the stage-axis schedule below is
    oblivious to T.
    """
    tokens = args["tokens"]
    blocks, a1, p1, dpr = args["blocks"], args["a1"], args["p1"], args["dpr"]
    cara_params = args.get("cara")
    scale = args.get("scale")
    Ls = L // S
    sidx = jax.lax.axis_index(STAGE_AXIS)
    mb, npad, e = tokens.shape[1:]

    if use_rng:
        # Weight-dropout keys: the exact vit_forward stream (fold 0, split
        # L) — batch-independent, so identical for every microbatch and
        # stage count; slice this stage's layers.
        wd_all = jax.random.split(jax.random.fold_in(args["wd_rng"], 0), L)
        wd_loc = jax.lax.dynamic_slice_in_dim(wd_all, sidx * Ls, Ls, 0)
        # Per-sample base: decorrelate across data shards (fused-DP
        # convention); the microbatch index folds in per tick below
        # (grad-accum convention).
        s_dev = jax.random.fold_in(
            args["s_rng"], jax.lax.axis_index(DATA_AXIS))

    def layer(carry, xs):
        if use_rng:
            bp, f1_l, p1_l, dpr_l, key, skey = xs
        else:
            bp, f1_l, p1_l, dpr_l = xs
            key = skey = None
        out = _block(carry, bp, f1_l, p1_l, dpr_l, key, skey, cfg,
                     cara_params, cara_cfg, attn_impl, dense_impl,
                     tp_axis, scale)
        return out, None

    if remat:
        layer = jax.checkpoint(layer)

    perm = [(i, (i + 1) % S) for i in range(S)]
    fdim = (e,) if cfg.use_cls_token else (npad, e)
    out0 = jnp.zeros((M, mb) + fdim, tokens.dtype)

    if V > 1:
        return _circular_schedule(
            tokens, blocks, a1, p1, dpr, layer, perm, out0,
            wd_all=wd_all if use_rng else None,
            s_dev=s_dev if use_rng else None,
            cfg=cfg, S=S, M=M, L=L, V=V, sidx=sidx,
            mb=mb, npad=npad, e=e)

    def tick(carry, t):
        act, out = carry
        inject = jax.lax.dynamic_index_in_dim(
            tokens, jnp.clip(t, 0, M - 1), 0, keepdims=False)
        act = jnp.where(sidx == 0, inject, act)
        xs = (blocks, a1, p1, dpr)
        if use_rng:
            m_cur = jnp.clip(t - sidx, 0, M - 1)
            sk_all = jax.random.split(jax.random.fold_in(
                jax.random.fold_in(s_dev, m_cur), 1), L)
            sk_loc = jax.lax.dynamic_slice_in_dim(sk_all, sidx * Ls, Ls, 0)
            xs = xs + (wd_loc, sk_loc)
        act, _ = jax.lax.scan(layer, act, xs)
        emit = act[:, 0] if cfg.use_cls_token else act
        m_done = jnp.clip(t - (S - 1), 0, M - 1)
        out = jnp.where(
            sidx == S - 1,
            jax.lax.dynamic_update_index_in_dim(out, emit, m_done, 0),
            out)
        act = jax.lax.ppermute(act, STAGE_AXIS, perm)
        return (act, out), None

    act0 = jnp.zeros((mb, npad, e), tokens.dtype)
    (_, out), _ = jax.lax.scan(tick, (act0, out0), jnp.arange(M + S - 1))
    # Replicate the last stage's buffer so the out_spec (unmentioned stage
    # axis) is genuinely uniform.
    return jax.lax.psum(
        jnp.where(sidx == S - 1, out, jnp.zeros_like(out)), STAGE_AXIS)


def _circular_schedule(tokens, blocks, a1, p1, dpr, layer, perm, out0, *,
                       wd_all, s_dev, cfg, S, M, L, V, sidx, mb, npad, e):
    """Interleaved pipeline: V laps around the stage ring per microbatch.

    At tick ``t`` stage ``s`` works logical step ``k = t - s`` (valid while
    ``0 <= k < M*V``): microbatch ``m = k % M`` on lap ``r = k // M`` —
    its r-th LOCAL layer group, global group ``r*S + s``.  Stage s-1
    finished the same ``k`` one tick earlier, so the per-tick ``ppermute``
    feeds stages 1..S-1 directly.  Stage 0's lap-(r+1) input is stage
    S-1's lap-r output, emitted at tick ``k - M + S - 1`` and consumed at
    ``k`` — a fixed delay of ``M - S`` ticks, absorbed by a ring buffer of
    ``M - S + 1`` slots with pure mod-indexed write (tick t) / read
    (tick t - (M-S)) positions (write lands before read inside a tick, so
    M == S hands off in-place).  Total ``M*V + S - 1`` ticks of
    ``L/(S*V)``-layer work: bubble overhead = GPipe's / V.
    """
    use_rng = wd_all is not None
    Lg = L // (S * V)
    # Local stacked leaves arrive lap-contiguous: (V*Lg, ...) -> (V, Lg, ...)
    resh = lambda x: x.reshape((V, Lg) + x.shape[1:])  # noqa: E731
    blocks = jax.tree_util.tree_map(resh, blocks)
    a1, p1, dpr = resh(a1), resh(p1), resh(dpr)
    delay = M - S
    nbuf = delay + 1
    buf0 = jnp.zeros((nbuf, mb, npad, e), tokens.dtype)

    def tick(carry, t):
        act, buf, out = carry
        k = jnp.clip(t - sidx, 0, M * V - 1)
        m = jnp.mod(k, M)
        r = k // M
        # Stage 0: bank the arriving inter-lap activation BEFORE reading
        # (the tick-t arrival is stage S-1's output for step t - S).
        karr = t - S
        do_write = (sidx == 0) & (karr >= 0) & (karr < M * V)
        wslot = jnp.mod(t, nbuf)
        buf = buf.at[wslot].set(jnp.where(do_write, act, buf[wslot]))
        rslot = jnp.mod(t - delay, nbuf)
        inject = jnp.where(
            r == 0,
            jax.lax.dynamic_index_in_dim(tokens, m, 0, keepdims=False),
            buf[rslot])
        x_in = jnp.where(sidx == 0, inject, act)

        group = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, r, 0, keepdims=False),
            (blocks, a1, p1, dpr))
        xs = group
        if use_rng:
            # Keys by GLOBAL layer index — identical streams to V == 1 and
            # to the plain forward (depend only on (microbatch, layer)).
            g0 = (r * S + sidx) * Lg
            wd_loc = jax.lax.dynamic_slice_in_dim(wd_all, g0, Lg, 0)
            sk_all = jax.random.split(jax.random.fold_in(
                jax.random.fold_in(s_dev, m), 1), L)
            sk_loc = jax.lax.dynamic_slice_in_dim(sk_all, g0, Lg, 0)
            xs = xs + (wd_loc, sk_loc)
        act_new, _ = jax.lax.scan(layer, x_in, xs)

        emit = act_new[:, 0] if cfg.use_cls_token else act_new
        done = (sidx == S - 1) & (r == V - 1) & (t - sidx >= 0) \
            & (t - sidx < M * V)
        out = out.at[m].set(jnp.where(done, emit, out[m]))
        act_new = jax.lax.ppermute(act_new, STAGE_AXIS, perm)
        return (act_new, buf, out), None

    act0 = jnp.zeros((mb, npad, e), tokens.dtype)
    (_, _, out), _ = jax.lax.scan(
        tick, (act0, buf0, out0), jnp.arange(M * V + S - 1))
    return jax.lax.psum(
        jnp.where(sidx == S - 1, out, jnp.zeros_like(out)), STAGE_AXIS)
