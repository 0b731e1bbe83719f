"""Merged-weight export: folded dense model == adapter eval path, exactly
(the delta is linear in eval mode — SURVEY.md section 7 stage 5)."""

import dataclasses

import numpy as np
import jax
import pytest

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import merge as merge_lib
from cara_tpu.models import vit as vit_lib


@pytest.mark.parametrize("order", [2, 3, 4, 5])
def test_merge_matches_adapter_eval(order):
    cfg = ViTConfig(
        image_size=16, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        repr_size=None, num_classes=5, drop_path_rate=0.0,
    )
    cara_cfg = CaraConfig(rank=5, scale=3.0, l_mu=1.1, l_std=0.05,
                          cp_order=order)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara_params = cara_lib.init_cara_params(jax.random.key(1), cfg, cara_cfg)
    # Non-trivial deltas: perturb the zero modes and biases.
    zero_name = {5: "A3", 4: "A2", 3: "A2", 2: "A2"}[order]
    k = jax.random.key(2)
    for name in (zero_name, "P2", "bias1", "bias2", "bias3"):
        k, sub = jax.random.split(k)
        cara_params[name] = 0.05 * jax.random.normal(
            sub, cara_params[name].shape)

    x = jax.random.normal(jax.random.key(3), (2, 16, 16, 3))
    adapted = vit_lib.vit_forward(
        params, x, cfg, cara_params=cara_params, cara_cfg=cara_cfg)
    merged_params = merge_lib.merge_cara(params, cara_params, cfg, cara_cfg)
    merged = vit_lib.vit_forward(merged_params, x, cfg)
    np.testing.assert_allclose(
        np.asarray(adapted), np.asarray(merged), atol=2e-4)
    # Sanity: merge changed the weights / outputs differ from plain backbone.
    plain = vit_lib.vit_forward(params, x, cfg)
    assert float(np.abs(np.asarray(adapted) - np.asarray(plain)).max()) > 1e-3


def test_merge_scale_is_applied():
    cfg = ViTConfig(
        image_size=16, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        repr_size=None, num_classes=5, drop_path_rate=0.0,
    )
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    base = CaraConfig(rank=5, scale=1.0, l_mu=1.0, l_std=0.0)
    cara_params = cara_lib.init_cara_params(jax.random.key(1), cfg, base)
    cara_params["A2"] = 0.1 * jax.random.normal(
        jax.random.key(2), cara_params["A2"].shape)
    m1 = merge_lib.merge_cara(params, cara_params, cfg, base)
    m2 = merge_lib.merge_cara(
        params, cara_params, cfg, dataclasses.replace(base, scale=2.0))
    d1 = np.asarray(m1["blocks"]["qkv"]["kernel"]
                    - params["blocks"]["qkv"]["kernel"])
    d2 = np.asarray(m2["blocks"]["qkv"]["kernel"]
                    - params["blocks"]["qkv"]["kernel"])
    np.testing.assert_allclose(2 * d1, d2, atol=1e-5)
