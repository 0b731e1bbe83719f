"""Worker process for the N-process jax.distributed CPU smoke tests.

Invoked by ``tests/test_multihost.py`` with CARA_DIST_* env vars set; runs
the ``--distributed`` initialization path (``cli/common.py:setup_runtime``),
one DP-sharded train step on an 8-device global mesh (8/N local CPU devices
per process), and dumps the updated trainable params for cross-process and
vs-single-process comparison.  N comes from ``CARA_DIST_NPROCS`` (2 and 4
are exercised — pcount > 2 covers the general process-chunked loader math,
``data/vtab.py``).
"""

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    args_w = ap.parse_args()

    import jax

    from cara_tpu.cli import common

    ns = argparse.Namespace(distributed=True, nan_check=False,
                            compilation_cache=None)
    common.setup_runtime(ns)  # the --distributed flag path

    nprocs = int(os.environ["CARA_DIST_NPROCS"])
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    # Establish the Gloo full-mesh NOW, while every process sits at the
    # same point: its context init has a hard 30 s key-exchange deadline,
    # and at pcount > 2 the per-process compile-time skew of the real
    # train step can exceed it if the first collective is also the first
    # Gloo handshake (observed flaky DEADLINE_EXCEEDED at 4 processes).
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("cara_multihost_smoke_start")

    import numpy as np
    import jax.numpy as jnp

    from cara_tpu import api
    from cara_tpu.data.vtab import BatchLoader, synthetic_source
    from cara_tpu.parallel import mesh as mesh_lib
    from cara_tpu.train import steps as steps_lib

    model = api.build_model("vit_tiny_test", rank=4, scale=1.0,
                            num_classes=10, seed=0)
    mesh = mesh_lib.make_mesh()
    assert mesh.devices.size == 8

    src = synthetic_source(32, 10, model.cfg.image_size, seed=3)
    loader = BatchLoader(src, 8, train=True, seed=7)
    batch = mesh_lib.put_batch(mesh, next(iter(loader)))
    # Each host contributed only its 8/nprocs-row chunk.
    assert batch["image"].shape[0] == 8

    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=4)
    frozen, state = steps_lib.init_train_state(
        tx, model.params, model.cara_params)
    frozen = mesh_lib.put_replicated(mesh, frozen)
    state = mesh_lib.put_replicated(mesh, state)
    key = jax.random.key(0)
    step = jax.jit(steps_lib.make_train_step(
        model.cfg, model.cara_cfg, tx, compute_dtype=jnp.float32),
        donate_argnums=(0,))

    # Second leg: the FUSED Pallas path routed through shard_map across the
    # processes (interpret-mode kernels on CPU) — the multi-host
    # equivalent of the single-process shard_map DP test.
    frozen2, state2 = steps_lib.init_train_state(
        tx, model.params, model.cara_params)
    frozen2 = mesh_lib.put_replicated(mesh, frozen2)
    state2 = mesh_lib.put_replicated(mesh, state2)
    fused_step = jax.jit(steps_lib.make_train_step(
        model.cfg, model.cara_cfg, tx, compute_dtype=jnp.float32,
        attn_impl="fused", dense_impl="fused", mesh=mesh),
        donate_argnums=(0,))

    # Third leg: grad-accum microbatching COMPOSED with cross-process
    # shard_map DP (VERDICT round-2 next #8) — 16 global rows over 8
    # devices = 2 rows/shard, split into 2 scanned microbatches.
    loader16 = BatchLoader(src, 16, train=True, seed=7)
    batch16 = mesh_lib.put_batch(mesh, next(iter(loader16)))
    frozen3, state3 = steps_lib.init_train_state(
        tx, model.params, model.cara_params)
    frozen3 = mesh_lib.put_replicated(mesh, frozen3)
    state3 = mesh_lib.put_replicated(mesh, state3)
    ga_step = jax.jit(steps_lib.make_train_step(
        model.cfg, model.cara_cfg, tx, compute_dtype=jnp.float32,
        attn_impl="fused", dense_impl="fused", mesh=mesh, grad_accum=2),
        donate_argnums=(0,))

    # Fourth leg: HYBRID ICI x DCN mesh with each PROCESS as one slice
    # (slice_of = process_index) — the faithful multi-host DCN shape: the
    # data axis crosses the process/slice boundary, slice-contiguous
    # rows outermost, and the loss must equal the plain-mesh leg exactly.
    mesh_hy = mesh_lib.make_hybrid_mesh(
        (8, 1), (nprocs, 1), slice_of=lambda d: d.process_index)
    batch_hy = mesh_lib.put_batch(
        mesh_hy, next(iter(BatchLoader(src, 8, train=True, seed=7))))
    frozen4, state4 = steps_lib.init_train_state(
        tx, model.params, model.cara_params)
    frozen4 = mesh_lib.put_replicated(mesh_hy, frozen4)
    state4 = mesh_lib.put_replicated(mesh_hy, state4)
    hy_step = jax.jit(steps_lib.make_train_step(
        model.cfg, model.cara_cfg, tx, compute_dtype=jnp.float32),
        donate_argnums=(0,))

    # AOT-compile every leg FIRST, then barrier, then execute: each new
    # executable's Gloo communicator has a 30 s key-exchange deadline at
    # its first run, and per-process COMPILE skew (the slow part) exceeds
    # it at pcount > 2.  Compiling everything up front and re-syncing
    # bounds the skew at execution time to milliseconds.
    step_c = step.lower(state, frozen, batch, key).compile()
    fused_c = fused_step.lower(state2, frozen2, batch, key).compile()
    ga_c = ga_step.lower(state3, frozen3, batch16, key).compile()
    hy_c = hy_step.lower(state4, frozen4, batch_hy, key).compile()
    multihost_utils.sync_global_devices("cara_multihost_compiled")

    state, metrics = step_c(state, frozen, batch, key)
    loss = float(metrics["loss"])  # replicated scalar: fetch syncs
    assert np.isfinite(loss), loss
    _, m2 = fused_c(state2, frozen2, batch, key)
    loss_fused = float(m2["loss"])
    assert np.isfinite(loss_fused), loss_fused
    _, m3 = ga_c(state3, frozen3, batch16, key)
    loss_ga = float(m3["loss"])
    assert np.isfinite(loss_ga), loss_ga
    _, m4 = hy_c(state4, frozen4, batch_hy, key)
    loss_hy = float(m4["loss"])
    assert abs(loss_hy - loss) < 1e-6, \
        f"hybrid DCN mesh diverges from plain DP: {loss_hy} vs {loss}"

    flat = {}
    for k, v in jax.tree_util.tree_leaves_with_path(state.trainable):
        flat[jax.tree_util.keystr(k)] = np.asarray(jax.device_get(v))
    np.savez(args_w.out, loss=np.float32(loss), **flat)
    print(f"worker pid={jax.process_index()} loss={loss:.6f} ok")
    return 0


if __name__ == "__main__":
    sys.exit(main())
