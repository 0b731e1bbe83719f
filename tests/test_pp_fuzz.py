"""Pipeline schedule-space sweep: odd corners of (depth, S, M, T, V).

The GPipe and circular schedules in ``parallel/pipeline.py`` are index
arithmetic over a ring; the dedicated tests cover the canonical shapes
(S=2/V=2, S=4, pp x TP at depth 4).  This sweep pins the corners those
miss — odd lap counts (V=3), single-layer stages (S == depth), deep
microbatch queues (M >> S, exercising the M-S ring-buffer delay), and a
non-default M under tensor parallelism — each asserted equal to the
plain single-device forward on a 16-token geometry.
"""

import dataclasses

import numpy as np
import jax
import pytest

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.parallel.pipeline import make_pp_mesh, pp_vit_forward


BASE = ViTConfig(image_size=16, patch_size=8, embed_dim=64, depth=2,
                 num_heads=4, repr_size=None, num_classes=4,
                 drop_path_rate=0.0)
CC = CaraConfig(rank=4, scale=1.5, l_mu=1.0, l_std=0.0, weight_dropout=0.0)

# (depth, mesh_shape, microbatches, repeats, attn/dense impl)
CASES = [
    # Odd lap count: V=3 laps around a 2-stage ring, delay M-S = 2.
    (6, (4, 2), 4, 3, "xla"),
    # Single-layer stages (S == depth) with V=1 and M == S.
    (4, (2, 4), 4, 1, "xla"),
    # Deep microbatch queue: M = 8 >> S = 2 (ring buffer holds 7 slots),
    # V=2 so stage 0 re-ingests while still ingesting fresh microbatches.
    (4, (4, 2), 8, 2, "xla"),
    # Tensor parallelism with a non-default M and V=2 (lap-contiguous
    # head-sharded shards).
    (4, (2, 2, 2), 8, 2, "fused"),
]


@pytest.mark.parametrize("depth,shape,m,v,impl", CASES)
def test_pp_schedule_matches_plain(depth, shape, m, v, impl):
    cfg = dataclasses.replace(BASE, depth=depth)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara = cara_lib.init_cara_params(jax.random.key(1), cfg, CC)
    for name in ("A2", "P2", "bias1", "bias2", "bias3"):
        cara[name] = 0.1 * jax.random.normal(
            jax.random.fold_in(jax.random.key(2), hash(name) % 1000),
            cara[name].shape)
    bs = m * shape[0] * (2 if m <= 4 else 1)
    x = jax.random.normal(jax.random.key(5), (bs, 16, 16, 3))
    ref = vit_lib.vit_forward(params, x, cfg, cara_params=cara, cara_cfg=CC,
                              train=False, attn_impl="xla", dense_impl="xla")
    mesh = make_pp_mesh(shape)
    got = pp_vit_forward(params, x, cfg, mesh=mesh, microbatches=m,
                         repeats=v, cara_params=cara, cara_cfg=CC,
                         train=False, attn_impl=impl, dense_impl=impl)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               atol=2e-5, rtol=1e-5)
