"""Driver-artifact contract for bench.py (VERDICT r4 weak 1).

The driver captures a bounded tail of bench.py's stdout and parses the
LAST line as the round's perf record.  Round 4 regressed this by
embedding the whole per-kernel trace table in the single printed line,
which outgrew the tail capture — the headline img/s and trace MFU were
unrecoverable from the artifact.  Contract pinned here:

* the last stdout line is valid JSON,
* it is compact (bounded length, safely inside any tail capture),
* it carries the headline directly (value, step_ms, trace MFU slot,
  vs_baseline, vs_ref_gpu, config),
* the full record (trace table included) lands in the sidecar file the
  compact line points to.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_last_line_is_compact_json():
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    env.pop("CARA_BENCH_TIMEOUT", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--model", "vit_tiny_test", "--batch-size", "8", "--steps", "3",
         "--dtype", "float32", "--skip-reference", "--no-trace"],
        env=env, capture_output=True, text=True, timeout=580, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    last = lines[-1]
    # Bounded: well inside a 4 KiB tail capture even after JSON escaping.
    assert len(last) < 2000, f"compact line grew to {len(last)} chars"
    rec = json.loads(last)
    for key in ("metric", "value", "unit", "step_ms",
                "mfu_vs_v5e_peak_measured_trace", "vs_baseline",
                "vs_ref_gpu", "batch_size", "full_record"):
        assert key in rec, key
    assert rec["value"] > 0
    assert rec["unit"] == "images/sec/chip"
    # The heavyweight fields must NOT be inline.
    assert "trace" not in rec and "absolute_note" not in rec
    # Sidecar carries the full record, trace table slot included.
    with open(rec["full_record"]) as f:
        full = json.load(f)
    for key in ("trace", "mfu_note", "vs_ref_gpu_estimate",
                "absolute_note", "value"):
        assert key in full, key
    assert full["value"] == rec["value"]
