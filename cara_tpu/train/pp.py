"""Pipeline-parallel train/eval steps (GPipe schedule over a (data, stage)
mesh — ``parallel/pipeline.py`` for the forward).

Beyond-reference scale-out (the reference is single-GPU).  The step bodies
mirror ``train/steps.py`` exactly — same loss (padded-class masking +
softmax CE), same metrics, same rng-per-step convention — with the block
stack executed by the microbatched pipeline instead of a single-device
``lax.scan``.  The pipeline island is the only ``shard_map``; the stem,
head, loss and optimizer run in GSPMD-land, so the data axis of the mesh
shards the batch exactly like the plain data-parallel path.

When to use: backbones whose per-device weight+activation footprint
exceeds one chip (ViT-g/e class) or meshes where the model axis is
exhausted — for everything that fits, data/tensor parallelism dominates
(no pipeline bubble).  Bubble fraction = (S-1)/(M+S-1).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.parallel.pipeline import pp_vit_forward
from cara_tpu.train.steps import (
    TrainState, cast_floating, mask_padded_classes, merge_params,
    prep_images)

Params = Dict[str, Any]


def make_pp_train_step(
    cfg: ViTConfig,
    cara_cfg: CaraConfig,
    tx: optax.GradientTransformation,
    mesh,
    *,
    microbatches: int = 4,
    repeats: int = 1,
    compute_dtype=None,
    attn_impl: str = "xla",
    dense_impl: str = "xla",
    remat: bool = True,
    grad_accum: int = 1,
):
    """(state, frozen, batch, rng) -> (state, metrics) over the pipeline.

    The caller jits this with the mesh's shardings on the batch (data axis)
    and replicated state/frozen — identical calling convention to
    ``steps.make_train_step``.  ``grad_accum > 1`` splits the batch into
    that many chunks, runs each through the pipeline, and averages grads —
    same semantics (constant weight-dropout mask per step, per-chunk sample
    rng) as ``steps.make_train_step``'s grad_accum.
    """
    if cara_cfg is not None and cara_cfg.method == "full":
        raise ValueError(
            "method='full' is not supported under pipeline parallelism "
            "(the backbone weights would need gradients through the stage "
            "sharding — untested transpose path); use data parallelism")

    def train_step(state: TrainState, frozen: Params, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(trainable, mb, srng):
            tr = trainable
            if compute_dtype is not None:
                tr = cast_floating(tr, compute_dtype)
            x = prep_images(mb["image"], compute_dtype)
            p = merge_params(frozen, tr)
            cara = tr["cara"] or None  # {} = linear probe
            logits = pp_vit_forward(
                p, x, cfg, mesh=mesh, microbatches=microbatches,
                repeats=repeats,
                cara_params=cara,
                cara_cfg=cara_cfg if cara is not None else None, train=True,
                rng=step_rng, sample_rng=srng, remat=remat,
                attn_impl=attn_impl, dense_impl=dense_impl,
                scale_override=mb.get("delta_scale"),
            ).astype(jnp.float32)
            logits = mask_padded_classes(logits, mb)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, mb["label"]).mean()
            acc = jnp.mean((jnp.argmax(logits, axis=-1)
                            == mb["label"]).astype(jnp.float32))
            return loss, acc

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if grad_accum == 1:
            (loss, acc), grads = grad_fn(state.trainable, batch, step_rng)
        else:
            b = batch["label"].shape[0]
            if b % grad_accum:
                raise ValueError(
                    f"batch {b} not divisible by grad_accum={grad_accum}")
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape(
                    grad_accum, b // grad_accum, *x.shape[1:]),
                batch)

            def body(carry, xs):
                mb, i = xs
                (loss, a), grads = grad_fn(
                    state.trainable, mb, jax.random.fold_in(step_rng, i))
                grads = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.float32), grads)
                l_c, a_c, g_c = carry
                g_c = jax.tree_util.tree_map(jnp.add, g_c, grads)
                return (l_c + loss, a_c + a, g_c), None

            zeros = jax.tree_util.tree_map(
                lambda x: jnp.zeros(x.shape, jnp.float32), state.trainable)
            (loss, acc, grads), _ = jax.lax.scan(
                body, (jnp.float32(0), jnp.float32(0), zeros),
                (micro, jnp.arange(grad_accum)))
            inv = 1.0 / grad_accum
            loss, acc = loss * inv, acc * inv
            grads = jax.tree_util.tree_map(lambda x: x * inv, grads)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        gnorm = optax.global_norm(grads)
        new_state = TrainState(state.step + 1, trainable, opt_state)
        return new_state, {"loss": loss, "accuracy": acc, "grad_norm": gnorm}

    return train_step


def make_pp_eval_step(
    cfg: ViTConfig,
    cara_cfg: Optional[CaraConfig],
    mesh,
    *,
    microbatches: int = 4,
    repeats: int = 1,
    compute_dtype=None,
    attn_impl: str = "xla",
    dense_impl: str = "xla",
):
    """(params, cara, batch) -> (num_correct, num_total), pipelined."""

    def eval_step(params: Params, cara_params, batch):
        p, cara = params, cara_params
        x = prep_images(batch["image"], compute_dtype)
        if compute_dtype is not None:
            p = cast_floating(p, compute_dtype)
            if cara is not None:
                cara = cast_floating(cara, compute_dtype)
        logits = pp_vit_forward(
            p, x, cfg, mesh=mesh, microbatches=microbatches,
            repeats=repeats,
            cara_params=cara,
            cara_cfg=cara_cfg if cara is not None else None, train=False,
            remat=False, attn_impl=attn_impl, dense_impl=dense_impl,
            scale_override=batch.get("delta_scale"))
        pred = jnp.argmax(mask_padded_classes(logits, batch), axis=-1)
        valid = batch.get("valid")
        ok = (pred == batch["label"]).astype(jnp.float32)
        if valid is not None:
            v = valid.astype(jnp.float32)
            return jnp.sum(ok * v), jnp.sum(v)
        return jnp.sum(ok), jnp.float32(ok.shape[0])

    return eval_step
