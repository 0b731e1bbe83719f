"""2-process ``jax.distributed`` smoke: the multi-host path actually runs.

Two subprocesses, 4 virtual CPU devices each -> one 8-device global mesh.
Each host feeds only its own rows of the global batch; the jitted train step
all-reduces gradients across hosts via GSPMD.  Assertions:

* both processes see process_count=2 and 8 global devices,
* the updated trainable params are IDENTICAL on both hosts (the all-reduce
  produced one consistent replicated update),
* they match a single-process 8-device run on the same global batch bit-
  for-bit math (same mesh size, f32) — i.e. cross-host DP == local DP.

(Reference has no distributed anything — SURVEY.md section 2.6; this is the
DCN/multi-host exercise VERDICT round-1 flagged as never executed.)
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_procs(tmp_path, nprocs: int):
    """Spawn ``nprocs`` jax.distributed workers over an 8-device global
    mesh (8/nprocs virtual CPU devices each); returns the per-process npz
    dumps after asserting every worker exited cleanly."""
    port = _free_port()
    procs = []
    outs = []
    for pid in range(nprocs):
        out = str(tmp_path / f"proc{pid}.npz")
        outs.append(out)
        env = {
            **os.environ,
            "PYTHONPATH": REPO,          # drop any sitecustomize TPU pin
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": (
                f"--xla_force_host_platform_device_count={8 // nprocs}"),
            "CARA_DIST_COORDINATOR": f"127.0.0.1:{port}",
            "CARA_DIST_NPROCS": str(nprocs),
            "CARA_DIST_PROCID": str(pid),
        }
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "multihost_worker.py"),
             "--out", out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{log}"
        assert f"pid={pid}" in log and "ok" in log

    zs = [np.load(o) for o in outs]
    for z in zs[1:]:
        assert set(zs[0].files) == set(z.files)
        # One consistent replicated update on every host.
        for k in zs[0].files:
            np.testing.assert_array_equal(zs[0][k], z[k], err_msg=k)
    return zs


@pytest.mark.skipif(os.environ.get("CARA_SKIP_MULTIHOST") == "1",
                    reason="multi-process smoke disabled")
def test_four_process_distributed_train_step(tmp_path):
    """4 processes x 2 devices: the general (pcount > 2) process-chunked
    loader math plus the grad-accum + shard_map composition (the worker's
    third leg)."""
    _run_procs(tmp_path, 4)


@pytest.mark.skipif(os.environ.get("CARA_SKIP_MULTIHOST") == "1",
                    reason="multi-process smoke disabled")
def test_two_process_distributed_train_step(tmp_path):
    z0 = _run_procs(tmp_path, 2)[0]

    # Cross-host DP == single-process DP on the same global batch.
    import jax
    import jax.numpy as jnp

    from cara_tpu import api
    from cara_tpu.data.vtab import BatchLoader, synthetic_source
    from cara_tpu.parallel import mesh as mesh_lib
    from cara_tpu.train import steps as steps_lib

    model = api.build_model("vit_tiny_test", rank=4, scale=1.0,
                            num_classes=10, seed=0)
    mesh = mesh_lib.make_mesh()  # 8 virtual devices (conftest)
    src = synthetic_source(32, 10, model.cfg.image_size, seed=3)
    loader = BatchLoader(src, 8, train=True, seed=7,
                         process_index=0, process_count=1)
    batch = mesh_lib.put_batch(mesh, next(iter(loader)))
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=4)
    frozen, state = steps_lib.init_train_state(
        tx, model.params, model.cara_params)
    frozen = mesh_lib.put_replicated(mesh, frozen)
    state = mesh_lib.put_replicated(mesh, state)
    step = jax.jit(steps_lib.make_train_step(
        model.cfg, model.cara_cfg, tx, compute_dtype=jnp.float32),
        donate_argnums=(0,))
    state, metrics = step(state, frozen, batch, jax.random.key(0))
    assert float(metrics["loss"]) == pytest.approx(
        float(z0["loss"]), abs=1e-5)
    ref = {}
    for k, v in jax.tree_util.tree_leaves_with_path(state.trainable):
        ref[jax.tree_util.keystr(k)] = np.asarray(jax.device_get(v))
    for k in ref:
        np.testing.assert_allclose(z0[k], ref[k], atol=1e-6, err_msg=k)
