"""Learning-rate schedule reproducing the reference's *effective* LR curve.

The reference constructs ``timm.scheduler.CosineLRScheduler(t_initial=100,
warmup_t=10, lr_min=1e-5, warmup_lr_init=1e-6, decay_rate=0.1)``
(``image_classification/vit_cp.py:187``) and then:

* calls ``sched.step(epoch)`` after **every batch** with the epoch index
  (``vit_cp.py:55-56``) — so the LR is a step function of the epoch, and
* sets ``sched = None`` once the epoch-50 eval fires (``vit_cp.py:58-59``),
  freezing the LR at its epoch-50 value for the rest of training.

We reproduce that effective curve (epoch-resolution warmup+cosine, frozen
after epoch ``freeze_epoch``) rather than the torch call pattern, per
SURVEY.md section 7 "hard parts".  timm's ``warmup_prefix`` defaults to
False, so the cosine is evaluated at the raw epoch index (warmup simply
overrides the first ``warmup_epochs`` values), and ``decay_rate`` only
affects cycles beyond ``t_initial`` — never reached in a 100-epoch run.
"""

from __future__ import annotations

import jax.numpy as jnp


def cara_cosine_schedule(
    base_lr: float,
    steps_per_epoch: int,
    total_epochs: int = 100,
    warmup_epochs: int = 10,
    lr_min: float = 1e-5,
    warmup_lr_init: float = 1e-6,
    freeze_epoch: int = 50,
):
    """Returns an optax-style ``schedule(step) -> lr``.

    Known, documented divergence from the reference: within an epoch the
    reference's first batch still runs at the previous epoch's LR (the
    scheduler steps *after* the optimizer); we use the epoch's value for all
    of its batches — a one-batch offset on a piecewise-constant curve.
    """

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, total_epochs - 1)
        eff = jnp.minimum(epoch, freeze_epoch).astype(jnp.float32)
        warm = warmup_lr_init + eff * (base_lr - warmup_lr_init) / warmup_epochs
        cos = lr_min + 0.5 * (base_lr - lr_min) * (
            1.0 + jnp.cos(jnp.pi * eff / total_epochs)
        )
        return jnp.where(eff < warmup_epochs, warm, cos)

    return schedule
