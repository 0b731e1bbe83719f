"""Weight-only int8 serving quantization: round-trip error bounds, forward
deviation, Predictor integration."""

import numpy as np
import jax
import jax.numpy as jnp

from cara_tpu import api
from cara_tpu.models import vit as vit_lib
from cara_tpu.models.quant import (
    dequantize_kernel, quantize_block_weights, quantize_kernel)
from cara_tpu.serving import Predictor


def test_kernel_roundtrip_error():
    w = jax.random.normal(jax.random.key(0), (2, 64, 128)) * 0.05
    q = quantize_kernel(w)
    assert q["q"].dtype == jnp.int8
    assert q["scale"].shape == (2, 1, 128)
    back = dequantize_kernel(q)
    # per-channel symmetric int8: error <= scale/2 per element
    err = np.abs(np.asarray(back - w))
    bound = np.asarray(q["scale"]) / 2 + 1e-7
    assert (err <= bound).all()


def test_matk_quant_matches_dequant():
    w = jax.random.normal(jax.random.key(1), (96, 128)) * 0.05
    x = jax.random.normal(jax.random.key(2), (8, 96))
    q = quantize_kernel(w)
    np.testing.assert_allclose(
        np.asarray(vit_lib.matk(x, q)),
        np.asarray(x @ dequantize_kernel(q)), atol=1e-5)


def test_quantized_forward_close_and_agrees():
    model = api.build_model("vit_tiny_test", rank=4, scale=1.0,
                            num_classes=10, seed=0)
    merged = model.merged()
    x = jax.random.normal(jax.random.key(3), (8, 32, 32, 3))
    ref = vit_lib.vit_forward(merged, x, model.cfg, attn_impl="xla",
                              dense_impl="xla")
    qp = quantize_block_weights(merged)
    got = vit_lib.vit_forward(qp, x, model.cfg, attn_impl="xla",
                              dense_impl="xla")
    # Logit deviation small relative to the logit spread; argmax unchanged.
    spread = float(jnp.std(ref))
    assert float(jnp.abs(got - ref).max()) < 0.1 * spread + 0.05
    assert (np.asarray(jnp.argmax(got, -1))
            == np.asarray(jnp.argmax(ref, -1))).mean() >= 0.9


def test_predictor_quantized():
    model = api.build_model("vit_tiny_test", rank=4, scale=1.0,
                            num_classes=10, seed=0)
    rng = np.random.RandomState(0)
    x = rng.randn(5, 32, 32, 3).astype(np.float32)
    p_bf = Predictor(model.params, model.cfg, cara_params=model.cara_params,
                     cara_cfg=model.cara_cfg, batch_size=4,
                     dtype=jnp.float32)
    p_q = Predictor(model.params, model.cfg, cara_params=model.cara_params,
                    cara_cfg=model.cara_cfg, batch_size=4,
                    dtype=jnp.float32, quantize="int8")
    lb, lq = p_bf.logits(x), p_q.logits(x)
    assert lq.shape == lb.shape
    assert np.abs(lq - lb).max() < 0.1 * np.std(lb) + 0.05


def test_predictor_quantized_adapter_path():
    """Unmerged (adapter) serving composes with backbone quantization:
    the delta adds on top of the quantized frozen GEMM (vit.py matk), so
    logits stay close to the unquantized adapter path."""
    model = api.build_model("vit_tiny_test", rank=4, scale=1.0,
                            num_classes=10, seed=0)
    rng = np.random.RandomState(0)
    x = rng.randn(5, 32, 32, 3).astype(np.float32)
    p_bf = Predictor(model.params, model.cfg, cara_params=model.cara_params,
                     cara_cfg=model.cara_cfg, merge=False, batch_size=4,
                     dtype=jnp.float32)
    for mode, tol in (("int8", 0.1), ("w8a8", 0.25)):
        p_q = Predictor(model.params, model.cfg,
                        cara_params=model.cara_params,
                        cara_cfg=model.cara_cfg, merge=False, batch_size=4,
                        dtype=jnp.float32, quantize=mode)
        lb, lq = p_bf.logits(x), p_q.logits(x)
        assert np.abs(lq - lb).max() < tol * np.std(lb) + 0.1, mode


def test_multitask_predictor_quantized():
    """One int8 backbone shared by N tasks: per-task logits stay close to
    the unquantized multi-task group (both modes)."""
    from cara_tpu.serving import MultiTaskPredictor

    tasks = {}
    for i, name in enumerate(["taskA", "taskB"]):
        m = api.build_model("vit_tiny_test", rank=4, scale=1.0 + i,
                            num_classes=5 + 3 * i, seed=i)
        tasks[name] = {"cara": m.cara_params, "head": m.params["head"],
                       "scale": 1.0 + i, "cp_order": 4}
        backbone_params, cfg = m.params, m.cfg
    rng = np.random.RandomState(1)
    x = rng.randn(3, 32, 32, 3).astype(np.float32)
    p0 = MultiTaskPredictor(backbone_params, cfg, tasks, batch_size=4,
                            dtype=jnp.float32)
    for mode in ("int8", "w8a8"):
        pq = MultiTaskPredictor(backbone_params, cfg, tasks, batch_size=4,
                                dtype=jnp.float32, quantize=mode)
        for name in tasks:
            l0 = p0.logits(x, task=name)
            lq = pq.logits(x, task=name)
            assert lq.shape == l0.shape
            assert np.abs(lq - l0).max() < 0.25 * np.std(l0) + 0.1, (
                mode, name)


def test_matk_w8a8_matches_exact_quant_reference():
    """The int8 x int8 path == the explicit quantize-both-sides reference
    (same codes, same scales, f32 accumulation mirror of the int32 MXU)."""
    w = jax.random.normal(jax.random.key(1), (96, 128)) * 0.05
    x = jax.random.normal(jax.random.key(2), (4, 7, 96))
    q = quantize_kernel(w)
    qa = {"qa": q["q"], "scale": q["scale"]}
    got = vit_lib.matk(x, qa)
    x32 = np.asarray(x, np.float64)
    ax = np.maximum(np.abs(x32).max(-1, keepdims=True) / 127.0, 1e-12)
    xq = np.round(x32 / ax)
    assert np.abs(xq).max() <= 127  # exact row maxima never clip
    ref = (xq @ np.asarray(q["q"], np.float64)) * ax * np.asarray(
        q["scale"], np.float64)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-3, rtol=1e-4)
    # and the result approximates the unquantized GEMM
    dense = np.asarray(x32 @ np.asarray(w, np.float64))
    assert np.abs(np.asarray(got) - dense).max() < 0.05


def test_w8a8_forward_close_and_agrees():
    model = api.build_model("vit_tiny_test", rank=4, scale=1.0,
                            num_classes=10, seed=0)
    merged = model.merged()
    x = jax.random.normal(jax.random.key(3), (8, 32, 32, 3))
    ref = vit_lib.vit_forward(merged, x, model.cfg, attn_impl="xla",
                              dense_impl="xla")
    qp = quantize_block_weights(merged, mode="w8a8")
    got = vit_lib.vit_forward(qp, x, model.cfg, attn_impl="xla",
                              dense_impl="xla")
    spread = float(jnp.std(ref))
    # activation quant adds error on top of w8; still small vs the spread
    assert float(jnp.abs(got - ref).max()) < 0.25 * spread + 0.1
    assert (np.asarray(jnp.argmax(got, -1))
            == np.asarray(jnp.argmax(ref, -1))).mean() >= 0.8


def test_predictor_w8a8():
    model = api.build_model("vit_tiny_test", rank=4, scale=1.0,
                            num_classes=10, seed=0)
    rng = np.random.RandomState(0)
    x = rng.randn(5, 32, 32, 3).astype(np.float32)
    p_bf = Predictor(model.params, model.cfg, cara_params=model.cara_params,
                     cara_cfg=model.cara_cfg, batch_size=4,
                     dtype=jnp.float32)
    p_q = Predictor(model.params, model.cfg, cara_params=model.cara_params,
                    cara_cfg=model.cara_cfg, batch_size=4,
                    dtype=jnp.float32, quantize="w8a8")
    lb, lq = p_bf.logits(x), p_q.logits(x)
    assert lq.shape == lb.shape
    assert np.abs(lq - lb).max() < 0.25 * np.std(lb) + 0.1


def test_int8_dense_kernel_matches():
    """Dequant-fused Pallas GEMM == XLA dequant reference (interpret)."""
    from cara_tpu.ops.pallas.int8_dense import int8_dense

    for m in (128, 197):
        x = jax.random.normal(jax.random.key(5), (m, 128))
        w = jax.random.normal(jax.random.key(6), (128, 256)) * 0.05
        q = quantize_kernel(w)
        b = jax.random.normal(jax.random.key(7), (256,)) * 0.1
        got = int8_dense(x, q["q"], q["scale"].reshape(-1), b,
                         64, 128, 128, True)
        ref = (x @ q["q"].astype(x.dtype)) * q["scale"].reshape(1, -1) + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)


def test_quantized_fused_refuses():
    """Quant dicts reaching the fused kernels raise a clear error at entry
    instead of failing deep inside pallas_call."""
    import pytest

    model = api.build_model("vit_tiny_test", rank=4, scale=1.0,
                            num_classes=10, seed=0)
    qp = quantize_block_weights(model.merged())
    x = jax.random.normal(jax.random.key(4), (2, 32, 32, 3))
    with pytest.raises(ValueError, match="dense_impl='xla'"):
        vit_lib.vit_forward(qp, x, model.cfg, dense_impl="fused")
