"""ToMe token merging (models/tome.py): schedule, matching, exactness
properties, Predictor/export integration.

Accuracy impact on real checkpoints is paper-characterized
(arXiv:2210.09461) and not measurable here (no data); these tests pin
the math properties that make the implementation trustworthy: r=0 is
bit-exact to the standard forward, merging identical tokens is exact,
sizes are conserved, and the cls token is never merged.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cara_tpu.config import CaraConfig, MODEL_REGISTRY
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import tome
from cara_tpu.models import vit as vit_lib


def _cfg(**kw):
    base = dict(num_classes=7, drop_path_rate=0.0)
    base.update(kw)
    return dataclasses.replace(MODEL_REGISTRY["vit_tiny_test"], **base)


def test_merge_schedule_clamps():
    cfg = _cfg()  # tiny: few tokens
    n = cfg.seq_len
    sched = tome.merge_schedule(cfg, r=1000)
    counts = tome.token_counts(cfg, r=1000)
    assert counts[0] == n
    running = n
    for rl, nl in zip(sched, counts):
        assert nl == running
        assert rl <= (nl - 1) // 2  # cls protected
        running -= rl
    assert running >= 1  # never consumes the sequence
    assert tome.merge_schedule(cfg, 0) == (0,) * cfg.depth
    with pytest.raises(ValueError):
        tome.merge_schedule(cfg, -1)


def test_bipartite_cls_protected_and_sizes_conserved():
    key = jax.random.key(0)
    b, n, d = 2, 9, 8
    # Make cls maximally similar to everything: it must still never merge.
    metric = jax.random.normal(key, (b, n, d))
    metric = metric.at[:, 0].set(jnp.mean(metric, axis=1))
    r = 3
    idxs = tome._bipartite_indices(metric, r, protect_cls=True)
    unm_idx, src_idx, dst_idx = idxs
    assert unm_idx.shape == (b, (n + 1) // 2 - r)
    # cls is src-set index 0 and sorted-first among the unmerged
    assert np.all(np.asarray(unm_idx[:, 0]) == 0)
    assert np.all(np.asarray(src_idx) != 0)

    sizes = jnp.ones((b, n, 1))
    merged = tome._merge_sum(sizes, *idxs)
    assert merged.shape == (b, n - r, 1)
    np.testing.assert_allclose(np.asarray(jnp.sum(merged, axis=1)), n)

    # Sum-merge conserves any summed quantity exactly (permutation + add)
    x = jax.random.normal(jax.random.key(1), (b, n, 5))
    mx = tome._merge_sum(x, *idxs)
    np.testing.assert_allclose(np.asarray(jnp.sum(mx, axis=1)),
                               np.asarray(jnp.sum(x, axis=1)), atol=1e-5)


def test_r0_bit_exact_vs_vit_forward():
    cfg = _cfg()
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (3, 32, 32, 3))
    ref = vit_lib.vit_forward(params, x, cfg, train=False,
                              attn_impl="xla", dense_impl="xla")
    got = tome.tome_forward(params, x, cfg, r=0)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_identical_tokens_merge_exactly():
    """Zero positional embedding + a constant image makes every patch
    token identical; merging identical tokens by weighted average is the
    identity on the represented set, so any r must reproduce r=0."""
    cfg = _cfg()
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    params = dict(params)
    params["pos_embed"] = jnp.zeros_like(params["pos_embed"])
    x = jnp.full((2, 32, 32, 3), 0.25, jnp.float32)
    base = tome.tome_forward(params, x, cfg, r=0)
    for r in (1, 2):
        got = tome.tome_forward(params, x, cfg, r=r)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   atol=1e-4)


def test_tome_runs_with_merging_and_quantized():
    cfg = _cfg()
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    out = tome.tome_forward(params, x, cfg, r=2)
    assert out.shape == (2, 7)
    assert np.all(np.isfinite(np.asarray(out)))
    # logits stay in the same regime as the unmerged forward
    ref = tome.tome_forward(params, x, cfg, r=0)
    assert np.abs(np.asarray(out)).max() < 10 * np.abs(
        np.asarray(ref)).max() + 1.0

    from cara_tpu.models.quant import quantize_block_weights

    qp = quantize_block_weights(params)
    qout = tome.tome_forward(qp, x, cfg, r=2)
    assert qout.shape == (2, 7)
    assert np.all(np.isfinite(np.asarray(qout)))


def test_mean_pool_size_weighted():
    """Global-average-pool models (no cls token) pool by token size so the
    mean is over the ORIGINAL patch set."""
    cfg = _cfg(use_cls_token=False, repr_size=None)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    params = dict(params)
    params["pos_embed"] = jnp.zeros_like(params["pos_embed"])
    x = jnp.full((2, 32, 32, 3), -0.5, jnp.float32)
    base = tome.tome_forward(params, x, cfg, r=0)
    got = tome.tome_forward(params, x, cfg, r=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-4)


def test_predictor_tome_and_guards(tmp_path):
    from cara_tpu.serving import Predictor

    cfg = _cfg()
    cara_cfg = CaraConfig(rank=4, scale=2.0)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara_params = cara_lib.init_cara_params(jax.random.key(1), cfg, cara_cfg)
    cara_params["A2"] = 0.05 * jax.random.normal(
        jax.random.key(2), cara_params["A2"].shape)

    pred = Predictor(params, cfg, cara_params=cara_params, cara_cfg=cara_cfg,
                     batch_size=4, dtype=jnp.float32, tome_r=2)
    imgs = np.asarray(
        jax.random.normal(jax.random.key(3), (5, 32, 32, 3)), np.float32)
    lg = pred.logits(imgs)
    assert lg.shape == (5, 7) and np.all(np.isfinite(lg))
    assert pred.predict(imgs).shape == (5,)
    # merged-weight ToMe forward == direct tome_forward on merged params
    from cara_tpu.models.merge import merge_cara

    merged = merge_cara(params, cara_params, cfg, cara_cfg)
    ref = tome.tome_forward(merged, jnp.asarray(imgs), cfg, r=2)
    np.testing.assert_allclose(lg, np.asarray(ref), atol=2e-4)

    with pytest.raises(ValueError):
        Predictor(params, cfg, cara_params=cara_params, cara_cfg=cara_cfg,
                  merge=False, batch_size=4, tome_r=2)


def test_export_stablehlo_tome(tmp_path):
    from cara_tpu.serving import ExportedPredictor, export_serialized

    cfg = _cfg()
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    blob = export_serialized(
        params, cfg, batch_size=3, dtype=jnp.float32, platforms=("cpu",),
        tome_r=2)
    ep = ExportedPredictor.from_bytes(blob)
    imgs = np.asarray(
        jax.random.normal(jax.random.key(4), (3, 32, 32, 3)), np.float32)
    ref = tome.tome_forward(params, jnp.asarray(imgs), cfg, r=2)
    np.testing.assert_allclose(ep.logits(imgs), np.asarray(ref), atol=2e-4)
