"""Task-parallel sweep: T tasks trained simultaneously on a T-device mesh
must be BIT-IDENTICAL to T sequential single-device runs (no cross-task
collectives exist, each shard runs the unmodified single-device step —
``train/task_parallel.py``)."""

import numpy as np
import jax
import pytest

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.train import steps as steps_lib
from cara_tpu.train import task_parallel as tp_lib

NUM_PAD = 8  # padded head size shared by all tasks


@pytest.fixture(scope="module")
def setup():
    cfg = ViTConfig(
        image_size=16, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        repr_size=None, num_classes=NUM_PAD, drop_path_rate=0.1,
    )
    cara_cfg = CaraConfig(rank=4, scale=1.0, l_mu=1.0, l_std=0.0,
                          weight_dropout=0.1)
    # Shared frozen backbone (the pretrained-npz situation); per-task
    # trainables (head from the task seed's init + cara from seed+1).
    base = vit_lib.init_vit_params(jax.random.key(0), cfg)
    frozen = {k: v for k, v in base.items() if k != "head"}
    return cfg, cara_cfg, frozen


def _task(cfg, cara_cfg, seed, num_real):
    """One synthetic 'task': trainables + a couple of batches."""
    params = vit_lib.init_vit_params(jax.random.key(seed), cfg)
    cara = cara_lib.init_cara_params(jax.random.key(seed + 1), cfg, cara_cfg)
    trainable = {"cara": cara, "head": params["head"]}
    kx, ky = jax.random.split(jax.random.key(seed + 2))
    batches = []
    for i in range(3):
        x = jax.random.normal(
            jax.random.fold_in(kx, i), (4, cfg.image_size, cfg.image_size, 3),
            np.float32)
        y = jax.random.randint(jax.random.fold_in(ky, i), (4,), 0, num_real)
        batches.append({
            "image": np.asarray(x), "label": np.asarray(y),
            "valid": np.ones(4, np.float32),
            "num_classes": np.int32(num_real),
            "delta_scale": np.float32(0.5 + seed / 10),
        })
    return trainable, batches


def test_task_parallel_matches_sequential(setup):
    cfg, cara_cfg, frozen = setup
    T = 4
    num_real = [3, 5, 2, 8]
    seeds = [11, 22, 33, 44]
    tasks = [_task(cfg, cara_cfg, s, n) for s, n in zip(seeds, num_real)]
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=3)

    # --- sequential reference: per-task single-device training ---
    seq_states, seq_evals = [], []
    step_fn = jax.jit(steps_lib.make_train_step(cfg, cara_cfg, tx))
    eval_fn = jax.jit(steps_lib.make_eval_step(cfg, cara_cfg))
    for (trainable, batches), seed in zip(tasks, seeds):
        st = steps_lib.TrainState(
            jax.numpy.zeros((), jax.numpy.int32), trainable,
            tx.init(trainable))
        rng = jax.random.key(seed)
        for b in batches:
            st, _ = step_fn(st, frozen, b, rng)
        seq_states.append(jax.device_get(st))
        c, n = eval_fn(steps_lib.merge_params(frozen, st.trainable),
                       st.trainable["cara"], batches[0])
        seq_evals.append((float(c), float(n)))

    # --- task-parallel: same math, one stacked step on a (task,) mesh ---
    mesh = tp_lib.make_task_mesh(T, jax.devices()[:T])
    train_step = jax.jit(
        tp_lib.make_task_train_step(cfg, cara_cfg, tx, mesh),
        donate_argnums=(0,))
    eval_step = jax.jit(tp_lib.make_task_eval_step(cfg, cara_cfg, mesh))

    states = [steps_lib.TrainState(
        jax.numpy.zeros((), jax.numpy.int32), tr, tx.init(tr))
        for tr, _ in tasks]
    state = tp_lib.put_stacked(mesh, tp_lib.stack_trees(states))
    seeds_dev = jax.device_put(
        np.asarray(seeds, np.int32),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(tp_lib.TASK_AXIS)))
    for i in range(3):
        stacked = {k: np.stack([t[1][i][k] for t in tasks])
                   for k in tasks[0][1][0].keys()}
        state, metrics = train_step(
            state, frozen, tp_lib.put_stacked(mesh, stacked), seeds_dev)

    host = jax.device_get(state)
    for i in range(T):
        got = tp_lib.index_tree(host.trainable, i)
        want = seq_states[i].trainable
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), got, want)

    stacked0 = {k: np.stack([t[1][0][k] for t in tasks])
                for k in tasks[0][1][0].keys()}
    c, n = eval_step(frozen, host.trainable,
                     tp_lib.put_stacked(mesh, stacked0))
    for i in range(T):
        assert (float(c[i]), float(n[i])) == seq_evals[i]


def _run_composed(cfg, cara_cfg, frozen, tasks, seeds, tx, devices, DP,
                  nsteps=2, **kw):
    """Train the given tasks through the composed (task, data) step;
    returns (host trainables stacked, eval (c, n) arrays on batch 0)."""
    T = len(tasks)
    mesh = tp_lib.make_task_mesh(T, devices[:T * DP], data=DP)
    train_step = jax.jit(
        tp_lib.make_task_train_step(cfg, cara_cfg, tx, mesh, **kw),
        donate_argnums=(0,))
    eval_step = jax.jit(tp_lib.make_task_eval_step(cfg, cara_cfg, mesh,
                                                   **kw))
    states = [steps_lib.TrainState(
        jax.numpy.zeros((), jax.numpy.int32), tr, tx.init(tr))
        for tr, _ in tasks]
    state = tp_lib.put_stacked(mesh, tp_lib.stack_trees(states))
    seeds_dev = jax.device_put(
        np.asarray(seeds, np.int32),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(tp_lib.TASK_AXIS)))
    for i in range(nsteps):
        stacked = {k: np.stack([t[1][i][k] for t in tasks])
                   for k in tasks[0][1][0].keys()}
        state, _ = train_step(
            state, frozen,
            tp_lib.put_stacked(mesh, stacked, shard_batch=True), seeds_dev)
    host = jax.device_get(state)
    stacked0 = {k: np.stack([t[1][0][k] for t in tasks])
                for k in tasks[0][1][0].keys()}
    c, n = eval_step(frozen, host.trainable,
                     tp_lib.put_stacked(mesh, stacked0, shard_batch=True))
    return host.trainable, np.asarray(c), np.asarray(n)


@pytest.mark.parametrize("impl", ["xla", "fused"])
def test_task_data_parallel_group_invariance(setup, impl):
    """(task=2, data=2) on 4 devices is BIT-IDENTICAL per task to running
    each task ALONE through the same composed step on a (1, 2) mesh — no
    cross-task leakage, group size never changes a task's math."""
    cfg, cara_cfg, frozen = setup
    DP = 2
    num_real = [3, 6]
    seeds = [7, 19]
    tasks = [_task(cfg, cara_cfg, s, n) for s, n in zip(seeds, num_real)]
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=3)
    kw = dict(attn_impl=impl, dense_impl=impl)
    devs = jax.devices()

    got, c, n = _run_composed(cfg, cara_cfg, frozen, tasks, seeds, tx,
                              devs, DP, **kw)
    # xla: every task index; fused (interpret-mode kernels, ~4x slower):
    # one index suffices — group invariance is per-shard, not per-slot.
    for i in range(len(tasks) if impl == "xla" else 1):
        want, c1, n1 = _run_composed(cfg, cara_cfg, frozen, [tasks[i]],
                                     [seeds[i]], tx, devs, DP, **kw)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a)[i], np.asarray(b)[0]), got, want)
        assert (float(c[i]), float(n[i])) == (float(c1[0]), float(n1[0]))


def test_task_data_parallel_matches_dp_semantics(setup):
    """The composed (task, data) step reproduces the production data-
    parallel path's SEMANTICS: same per-shard rng folding, same pmean'd
    grads.  Differently-structured XLA programs reassociate floats, and
    Adam's sign-normalized early updates amplify one-ulp gradient noise to
    ~1 update (~lr) on near-zero-gradient coordinates — so equality is
    asserted to a few-updates tolerance, not bitwise (bitwise invariance
    is covered by test_task_data_parallel_group_invariance)."""
    from cara_tpu.parallel import mesh as mesh_lib

    cfg, cara_cfg, frozen = setup
    DP = 2
    num_real = [3, 6]
    seeds = [7, 19]
    tasks = [_task(cfg, cara_cfg, s, n) for s, n in zip(seeds, num_real)]
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=3)
    kw = dict(attn_impl="xla", dense_impl="xla")

    dp_mesh = mesh_lib.make_mesh((DP, 1), devices=jax.devices()[:DP])
    step_fn = jax.jit(steps_lib.make_train_step(
        cfg, cara_cfg, tx, mesh=dp_mesh, **kw))
    eval_fn = jax.jit(steps_lib.make_eval_step(
        cfg, cara_cfg, mesh=dp_mesh, **kw))
    seq_states, seq_evals = [], []
    for (trainable, batches), seed in zip(tasks, seeds):
        st = steps_lib.TrainState(
            jax.numpy.zeros((), jax.numpy.int32), trainable,
            tx.init(trainable))
        rng = jax.random.key(seed)
        for b in batches[:2]:
            st, _ = step_fn(st, frozen, b, rng)
        seq_states.append(jax.device_get(st))
        c, n = eval_fn(steps_lib.merge_params(frozen, st.trainable),
                       st.trainable["cara"], batches[0])
        seq_evals.append((float(c), float(n)))

    got, c, n = _run_composed(cfg, cara_cfg, frozen, tasks, seeds, tx,
                              jax.devices(), DP, **kw)
    for i in range(len(tasks)):
        want = seq_states[i].trainable
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a)[i], np.asarray(b), rtol=0, atol=5e-6),
            got, want)
        assert (float(c[i]), float(n[i])) == seq_evals[i]


def test_task_mesh_data_validation():
    with pytest.raises(ValueError, match="devices"):
        tp_lib.make_task_mesh(8, jax.devices()[:8], data=2)
    mesh = tp_lib.make_task_mesh(2, jax.devices()[:4], data=2)
    assert mesh.axis_names == (tp_lib.TASK_AXIS, tp_lib.DATA_AXIS)
    assert tp_lib.mesh_data_degree(
        tp_lib.make_task_mesh(4, jax.devices()[:4])) == 1


def test_task_data_sweep_cli_e2e(tmp_path):
    """CLI path: 2 tasks x 2 data devices on the 8-device test mesh."""
    from cara_tpu.cli import sweep as sweep_cli

    results = sweep_cli.main([
        "--synthetic", "--tasks", "patch_camelyon,kitti",
        "--task-parallel", "2", "--task-data", "2", "--pad-classes", "8",
        "--model", "vit_tiny_test", "--dim", "4", "--epochs", "2",
        "--batch-size", "8", "--eval-batch-size", "8",
        "--synthetic-size", "32", "--dtype", "float32",
        "--backbone", str(tmp_path / "none.npz"),
        "--out-dir", str(tmp_path), "--log-every", "1000"])
    for task in ("patch_camelyon", "kitti"):
        assert 0.0 <= results[task]["top1"] <= 1.0


def test_stacked_loader_pads_uneven_eval(setup):
    """Exhausted tasks are padded with zero-valid batches; accuracy sums
    stay exact for every task."""

    class FakeLoader:
        batch_size = 4

        def __init__(self, nbatches, label):
            self.n, self.label = nbatches, label

        def steps_per_epoch(self):
            return self.n

        def __iter__(self):
            for _ in range(self.n):
                yield {"image": np.zeros((4, 2, 2, 3), np.float32),
                       "label": np.full(4, self.label, np.int32),
                       "valid": np.ones(4, np.float32)}

    sl = tp_lib.StackedLoader(
        [FakeLoader(2, 1), FakeLoader(4, 2)], num_classes=[3, 5],
        delta_scales=[1.0, 2.0], pad_tail=True)
    batches = list(sl)
    assert len(batches) == 4
    assert batches[0]["image"].shape == (2, 4, 2, 2, 3)
    np.testing.assert_array_equal(batches[0]["num_classes"], [3, 5])
    np.testing.assert_array_equal(batches[0]["delta_scale"], [1.0, 2.0])
    # Task 0 exhausted after 2 batches -> valid all-zero thereafter.
    assert batches[2]["valid"][0].sum() == 0
    assert batches[2]["valid"][1].sum() == 4
    total_valid = sum(b["valid"].sum(axis=1) for b in batches)
    np.testing.assert_array_equal(total_valid, [8.0, 16.0])


def test_stacked_loader_rejects_unequal_train(setup):
    class FakeLoader:
        batch_size = 4

        def __init__(self, n):
            self.n = n

        def steps_per_epoch(self):
            return self.n

        def __iter__(self):  # pragma: no cover
            return iter(())

    with pytest.raises(ValueError, match="steps_per_epoch"):
        tp_lib.StackedLoader([FakeLoader(2), FakeLoader(3)],
                             num_classes=[3, 3], delta_scales=[1.0, 1.0],
                             pad_tail=False)


def test_task_parallel_sweep_cli_e2e(tmp_path):
    """Full CLI path: 3 tasks on a 3-device (task,) mesh, synthetic data,
    padded heads, per-task checkpoints + results JSON."""
    import json
    import os

    from cara_tpu.cli import sweep as sweep_cli

    results = sweep_cli.main([
        "--synthetic", "--tasks", "patch_camelyon,kitti,svhn",
        "--task-parallel", "3", "--pad-classes", "16",
        "--model", "vit_tiny_test", "--dim", "4", "--epochs", "2",
        "--batch-size", "8", "--eval-batch-size", "8",
        "--synthetic-size", "32", "--dtype", "float32",
        "--backbone", str(tmp_path / "none.npz"),
        "--out-dir", str(tmp_path), "--log-every", "1000"])
    for task in ("patch_camelyon", "kitti", "svhn"):
        assert 0.0 <= results[task]["top1"] <= 1.0
        assert results[task]["ckpt"] and os.path.exists(results[task]["ckpt"])
    with open(tmp_path / "vtab_results.json") as f:
        on_disk = json.load(f)
    assert on_disk["__summary__"]["tasks"] == 3


def test_resume_sweep_filters_seed_combos(tmp_path):
    """--resume-sweep resumes at (task, seed) granularity: combos already
    in the results file are skipped, missing ones run."""
    import json

    from cara_tpu.cli import sweep as sweep_cli

    done = {"patch_camelyon@s3": {"top1": 0.5, "seed": 3,
                                  "images_per_sec": 1.0, "minutes": 0.1,
                                  "ckpt": None}}
    with open(tmp_path / "vtab_results.json", "w") as f:
        json.dump(done, f)
    results = sweep_cli.main([
        "--synthetic", "--tasks", "patch_camelyon", "--seeds", "3,4",
        "--resume-sweep", "--model", "vit_tiny_test", "--dim", "4",
        "--epochs", "2", "--batch-size", "8", "--eval-batch-size", "8",
        "--synthetic-size", "16", "--dtype", "float32",
        "--backbone", str(tmp_path / "none.npz"),
        "--out-dir", str(tmp_path), "--log-every", "1000"])
    assert results["patch_camelyon@s3"]["top1"] == 0.5  # untouched
    assert "patch_camelyon@s4" in results                # freshly run
    assert results["__summary__"]["tasks"] == 2
    assert set(results["__summary__"]["best_per_task"]) == {"patch_camelyon"}


def test_sequential_padded_sweep_cli_e2e(tmp_path):
    """Sequential (no --task-parallel) --pad-classes sweep: the shared
    step cache must not clobber the per-task results key (regression:
    the cache key once rebound `key`, storing every task under a tuple
    and crashing the results json dump)."""
    from cara_tpu.cli import sweep as sweep_cli

    results = sweep_cli.main([
        "--synthetic", "--tasks", "patch_camelyon,kitti",
        "--pad-classes", "8", "--model", "vit_tiny_test", "--dim", "4",
        "--epochs", "2", "--batch-size", "8", "--eval-batch-size", "8",
        "--synthetic-size", "16", "--dtype", "float32",
        "--backbone", str(tmp_path / "none.npz"),
        "--out-dir", str(tmp_path), "--log-every", "1000"])
    assert set(results) == {"patch_camelyon", "kitti", "__summary__"}
    assert results["__summary__"]["tasks"] == 2


def test_multi_seed_sweep_cli_e2e(tmp_path):
    """--seeds multiplies the task axis; same-task-different-seed combos
    share one task-parallel group (unique result keys, per-task best in
    the summary)."""
    from cara_tpu.cli import sweep as sweep_cli

    results = sweep_cli.main([
        "--synthetic", "--tasks", "patch_camelyon,kitti",
        "--seeds", "3,4", "--task-parallel", "4", "--pad-classes", "8",
        "--model", "vit_tiny_test", "--dim", "4", "--epochs", "2",
        "--batch-size", "8", "--eval-batch-size", "8",
        "--synthetic-size", "32", "--dtype", "float32",
        "--backbone", str(tmp_path / "none.npz"),
        "--out-dir", str(tmp_path), "--log-every", "1000"])
    for key in ("patch_camelyon@s3", "patch_camelyon@s4",
                "kitti@s3", "kitti@s4"):
        assert 0.0 <= results[key]["top1"] <= 1.0
    summ = results["__summary__"]
    assert summ["tasks"] == 4
    assert set(summ["best_per_task"]) == {"patch_camelyon", "kitti"}
    assert summ["best_per_task"]["kitti"]["seed"] in (3, 4)
