"""Preemption-safe training: SIGTERM mid-epoch -> resume checkpoint at the
next step boundary -> clean exit -> relaunch continues via auto-resume.

The reference has no preemption story at all (its only resilience artifact
is best-checkpoint rotation, ``vit_cp.py:63-66``); spot/preemptible TPU VMs
deliver SIGTERM ~30 s before reclaim, so ``train.loop.preemption_watcher``
is what makes `--resume-dir` an end-to-end spot-VM workflow rather than a
periodic-cadence gamble.
"""

import contextlib
import io
import os
import signal

import cara_tpu.train.checkpoint as ckpt_lib
import cara_tpu.train.loop as loop_lib
from cara_tpu.cli import vit_cp as cli


def _args(tmp_path, extra):
    return [
        "--synthetic", "--dataset", "patch_camelyon", "--model",
        "vit_tiny_test", "--batch-size", "8", "--eval-batch-size", "8",
        "--synthetic-size", "64", "--dtype", "float32",
        "--backbone", str(tmp_path / "missing.npz"),
        "--out-dir", str(tmp_path), "--log-every", "1000",
        "--dim", "4", "--resume-dir", str(tmp_path / "resume"),
    ] + extra


def test_sigterm_checkpoints_and_resumes(tmp_path, monkeypatch):
    # Deterministic injection: deliver SIGTERM to ourselves (main thread,
    # synchronous handler) right before the 4th train batch is handed to
    # the loop — the watcher flag must stop the run AFTER step 4 completes.
    real_prefetch = loop_lib.prefetch
    count = {"n": 0}

    def prefetch_and_preempt(iterator, put_fn, depth=2):
        for b in real_prefetch(iterator, put_fn, depth):
            count["n"] += 1
            if count["n"] == 4:
                os.kill(os.getpid(), signal.SIGTERM)
            yield b

    monkeypatch.setattr(loop_lib, "prefetch", prefetch_and_preempt)
    before = signal.getsignal(signal.SIGTERM)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        # resume-every-steps stays 0: the checkpoint below must come from
        # the preemption path itself, not the periodic cadence.
        cli.main(_args(tmp_path, ["--epochs", "2"]))
    out = buf.getvalue()
    assert "Preempted (SIGTERM) at step 4" in out, out
    assert '"preempted": true' in out, out
    # Handler restored after fit().
    assert signal.getsignal(signal.SIGTERM) is before
    # The resumable state exists at exactly the preempted step.
    assert ckpt_lib.latest_step(str(tmp_path / "resume")) == 4

    # Relaunch (no injection): resumes from step 4 and runs to completion.
    monkeypatch.setattr(loop_lib, "prefetch", real_prefetch)
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        acc = cli.main(_args(tmp_path, ["--epochs", "2"]))
    out2 = buf2.getvalue()
    assert "resumed from" in out2 and "step 4" in out2, out2
    assert "Preempted" not in out2
    assert 0.0 <= acc <= 1.0


def test_no_resume_dir_still_exits_cleanly(tmp_path, monkeypatch):
    """Without --resume-dir the run still unwinds at the step boundary and
    says so, instead of dying mid-step with stale device work queued."""
    real_prefetch = loop_lib.prefetch

    def prefetch_and_preempt(iterator, put_fn, depth=2):
        for i, b in enumerate(real_prefetch(iterator, put_fn, depth)):
            if i == 1:
                os.kill(os.getpid(), signal.SIGTERM)
            yield b

    monkeypatch.setattr(loop_lib, "prefetch", prefetch_and_preempt)
    args = [a for a in _args(tmp_path, ["--epochs", "1"])]
    i = args.index("--resume-dir")
    del args[i:i + 2]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(args)
    out = buf.getvalue()
    assert "optimizer state was NOT saved" in out, out
    assert not os.path.isdir(str(tmp_path / "resume"))


def test_sweep_preemption_stops_and_resumes(tmp_path, monkeypatch):
    """SIGTERM mid-sweep: the interrupted combo must NOT be recorded (else
    --resume-sweep would skip it forever), completed combos are persisted,
    and the relaunch finishes only the missing ones."""
    import json

    from cara_tpu.cli import sweep as sweep_cli

    args = [
        "--synthetic", "--tasks", "patch_camelyon,kitti",
        "--model", "vit_tiny_test", "--dim", "4", "--epochs", "1",
        "--batch-size", "8", "--eval-batch-size", "8",
        "--synthetic-size", "32", "--dtype", "float32",
        "--backbone", str(tmp_path / "none.npz"),
        "--out-dir", str(tmp_path), "--log-every", "1000"]

    # With epochs=1 the prefetch generators are created in order:
    # #1 task-1 train, #2 task-1 final eval, #3 task-2 train.  Fire the
    # signal as the first task-2 train batch is handed out — task 1 must
    # survive in results, task 2 must not.
    real_prefetch = loop_lib.prefetch
    created = {"n": 0}

    def prefetch_and_preempt(iterator, put_fn, depth=2):
        created["n"] += 1
        mine = created["n"]
        for i, b in enumerate(real_prefetch(iterator, put_fn, depth)):
            if mine == 3 and i == 0:
                os.kill(os.getpid(), signal.SIGTERM)
            yield b

    monkeypatch.setattr(loop_lib, "prefetch", prefetch_and_preempt)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        partial = sweep_cli.main(args)
    assert "sweep preempted during kitti" in buf.getvalue()
    assert set(partial) == {"patch_camelyon"}
    with open(tmp_path / "vtab_results.json") as f:
        saved = json.load(f)
    assert set(saved) == {"patch_camelyon"}  # no partial kitti, no summary

    # Relaunch: only kitti left to run; summary covers both.
    monkeypatch.setattr(loop_lib, "prefetch", real_prefetch)
    results = sweep_cli.main(args + ["--resume-sweep"])
    assert set(results) == {"patch_camelyon", "kitti", "__summary__"}
    assert results["__summary__"]["tasks"] == 2
