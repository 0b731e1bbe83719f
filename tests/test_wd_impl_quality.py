"""Element vs row vs rank weight-dropout: SOLUTION-QUALITY study
(VERDICT r4 next 4).

Row-structured dropout runs at 982 img/s vs element's 892 (round-5
bench) with identical mean and per-entry marginal variance (only the
within-row covariance differs — config.CaraConfig docs).  The
moment-equivalence argument predicts equal learned-solution quality;
this study tests that prediction on the synthetic full protocol so the
promotion question doesn't wait for real data.

Protocol: the margin-rich, non-saturating task of
``test_full_protocol_statistical_parity`` (noisy class templates,
noise 0.35), the complete reference training protocol (100 epochs,
minibatch shuffling, cosine schedule + freeze-after-50, eval-every-10 +
best selection), weight dropout ON at the paper's strong 0.3 rate,
>= 5 seeds per impl.  Per seed all three impls share the same init,
data, and rng key — only the regularizer's realization differs — so the
per-seed deltas are paired.

Measured when written (CPU, f32, 5 seeds; full numbers in
benchmarks/RESULTS.md "Round-5: element-vs-row solution quality"):

* rate 0.1 (the production default): element 0.909 +/- 0.085,
  row 0.922 +/- 0.056 — a statistical tie (the prediction HOLDS);
  rank 0.693 +/- 0.174 — clearly worse.
* rate 0.3 (the --paper-hparams strong rate on 8 tasks):
  element 0.903 +/- 0.113, row 0.766 +/- 0.220 (one seed collapsed to
  0.35), rank 0.476 +/- 0.165 — the equivalence prediction is REFUTED
  at this scale: with only K=48-240 rows per site the within-row
  covariance is a large fraction of the regularizer and the coarser
  impls measurably degrade the learned solution.

CALL: NO PROMOTION.  Element stays the default — the strong-rate tasks
show a real quality gap at tiny geometry and production geometry
(K=768-3072) can only be cleared by real-VTAB data.  Row remains the
opt-in speed option (982 vs 892 img/s), safest at rates <= 0.1 where it
ties; rank should be avoided at high rates.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import vit as vit_lib

IMPLS = ("element", "row", "rank")
SEEDS = 5


@pytest.mark.slow
@pytest.mark.parametrize("rate", [0.1, 0.3])
def test_wd_impl_solution_quality_bands(rate):
    from cara_tpu.train import steps as steps_lib

    n_classes, n_train, n_eval, bs = 9, 32, 1000, 16
    epochs, steps_per_epoch = 100, n_train // bs
    base_lr, wd = 2e-2, 1e-4

    best = {impl: [] for impl in IMPLS}
    for seed in range(SEEDS):
        cfg = ViTConfig(
            image_size=16, patch_size=8, embed_dim=48, depth=2,
            num_heads=4, repr_size=40, num_classes=n_classes,
            drop_path_rate=0.0, mlp_ratio=4)
        params = vit_lib.init_vit_params(jax.random.key(3 * seed), cfg)
        base_cc = CaraConfig(rank=5, scale=1.7, l_mu=1.2, l_std=0.1,
                             weight_dropout=rate)
        cara = cara_lib.init_cara_params(
            jax.random.key(3 * seed + 1), cfg, base_cc)
        k = jax.random.key(3 * seed + 2)
        for name in ("A2", "P2", "bias1", "bias2", "bias3"):
            k, sub = jax.random.split(k)
            cara[name] = 0.1 * jax.random.normal(sub, cara[name].shape)

        tmpl = np.random.RandomState(100 + seed).randn(n_classes, 16, 16, 3)

        def make_split(n, s):
            r = np.random.RandomState(s)
            y = r.randint(0, n_classes, size=(n,))
            return (0.35 * r.randn(n, 16, 16, 3) + tmpl[y]).astype(
                np.float32), y

        x_train, y_train = make_split(n_train, 200 + seed)
        x_eval, y_eval = make_split(n_eval, 300 + seed)
        perm_rng = np.random.RandomState(400 + seed)
        epoch_orders = [perm_rng.permutation(n_train) for _ in range(epochs)]
        eval_epochs = set(range(10, epochs, 10))

        for impl in IMPLS:
            cc = dataclasses.replace(base_cc, weight_dropout_impl=impl)
            tx = steps_lib.make_optimizer(base_lr, steps_per_epoch,
                                          weight_decay=wd)
            frozen, state = steps_lib.init_train_state(tx, params, cara)
            train_step = jax.jit(steps_lib.make_train_step(cfg, cc, tx))
            key = jax.random.key(11 + seed)

            def jax_eval(state, cc=cc):
                p = dict(params)
                p["head"] = state.trainable["head"]
                lg = vit_lib.vit_forward(
                    p, jnp.asarray(x_eval), cfg,
                    cara_params=state.trainable["cara"], cara_cfg=cc,
                    train=False)
                return float(
                    (np.asarray(jnp.argmax(lg, -1)) == y_eval).mean())

            best_acc = 0.0
            for ep in range(epochs):
                order = epoch_orders[ep]
                for b in range(steps_per_epoch):
                    idx = order[b * bs:(b + 1) * bs]
                    batch = {"image": jnp.asarray(x_train[idx]),
                             "label": jnp.asarray(y_train[idx])}
                    state, _ = train_step(state, frozen, batch,
                                          jax.random.fold_in(key, ep))
                if ep in eval_epochs:
                    best_acc = max(best_acc, jax_eval(state))
            best_acc = max(best_acc, jax_eval(state))
            best[impl].append(best_acc)

    bands = {impl: (float(np.mean(v)), float(np.std(v)))
             for impl, v in best.items()}
    print("\nper-impl best-top-1 bands (mean +/- std over "
          f"{SEEDS} seeds, wd={rate}):")
    for impl in IMPLS:
        m, s = bands[impl]
        print(f"  {impl:8s} {m:.4f} +/- {s:.4f}  {best[impl]}")
    # The DEFAULT (exact reference) impl trains well at both rates.
    assert bands["element"][0] > 0.85, bands

    e = np.array(best["element"])
    for impl in ("row", "rank"):
        d = np.array(best[impl]) - e
        se = float(d.std(ddof=1) / np.sqrt(SEEDS)) if SEEDS > 1 else 0.0
        # Promotion gate: no structured impl significantly BEATS element
        # (if this ever fires, re-open the default question with the new
        # numbers — it is news, not a regression).
        assert float(d.mean()) <= 0.002 + 4 * se, (impl, d, bands)
    if rate <= 0.1:
        # Measured regime: at the production default rate row TIES
        # element (moment-equivalence holds — see module docstring).
        d = np.array(best["row"]) - e
        se = float(d.std(ddof=1) / np.sqrt(SEEDS))
        assert abs(float(d.mean())) <= 0.002 + 4 * se, (d, bands)
