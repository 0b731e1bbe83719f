"""trace_report: decode a real jax.profiler dump without TensorFlow.

Generates a small CPU trace (the same artifact ``--profile-dir`` writes on
TPU) and checks the stdlib protobuf-wire decoder finds planes, lines and
events, and that the CLI renders/aggregates it.
"""

import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import trace_report  # noqa: E402


@pytest.fixture(scope="module")
def trace_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("trace")

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x).sum()

    x = jnp.ones((64, 64), jnp.float32)
    f(x).block_until_ready()  # compile outside the trace
    jax.profiler.start_trace(str(d))
    for _ in range(3):
        f(x).block_until_ready()
    jax.profiler.stop_trace()
    return d


def test_finds_and_parses_xplane(trace_dir):
    files = trace_report.find_xplane_files(trace_dir)
    assert files, "start_trace produced no *.xplane.pb"
    planes = trace_report.parse_xspace(files[0].read_bytes())
    assert planes, "decoder found no XPlanes"
    # Every plane has a name; at least one carries events.
    assert all(isinstance(p["name"], str) for p in planes)
    n_events = sum(len(ln["events"]) for p in planes for ln in p["lines"])
    assert n_events > 0


def test_aggregate_tables(trace_dir):
    files = trace_report.find_xplane_files(trace_dir)
    planes = []
    for f in files:
        planes.extend(trace_report.parse_xspace(f.read_bytes()))
    tables = trace_report.aggregate(planes)
    assert tables
    busiest = max(tables, key=lambda t: t["busy_ps"])
    assert busiest["busy_ps"] > 0
    assert busiest["span_ps"] >= 0
    # op records are (count, total_ps) with positive totals
    for name, rec in busiest["ops"].items():
        assert rec["count"] >= 1 and rec["total_ps"] >= 0 and name

    # the jitted computation shows up somewhere in the trace
    all_names = {
        name for t in tables for name in t["ops"]
    }
    assert any("jit" in n or "tanh" in n or "dot" in n or "fusion" in n
               for n in all_names), sorted(all_names)[:40]


def test_group_folds_numeric_suffixes(trace_dir):
    files = trace_report.find_xplane_files(trace_dir)
    planes = []
    for f in files:
        planes.extend(trace_report.parse_xspace(f.read_bytes()))
    grouped = trace_report.aggregate(planes, group=True)
    for t in grouped:
        for name in t["ops"]:
            assert not trace_report._GROUP_RE.search(name)


def test_cli_json_and_text(trace_dir, capsys):
    rc = trace_report.main([str(trace_dir), "--json"])
    assert rc == 0
    tables = json.loads(capsys.readouterr().out)
    assert isinstance(tables, list) and tables

    rc = trace_report.main([str(trace_dir), "--top", "5"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "busy" in out and "total ms" in out


def test_memory_report_of_jitted_fn():
    from cara_tpu.utils.profiling import memory_report

    @jax.jit
    def f(x):
        return (x @ x).sum()

    x = jnp.ones((128, 128), jnp.float32)
    rec = memory_report(f, x)
    # XLA:CPU implements memory_analysis; on exotic backends None is legal.
    if rec is not None:
        assert rec["argument_mib"] >= 0.06  # 128*128*4 = 64 KiB
        assert rec["total_mib"] >= rec["output_mib"]
        assert set(rec) >= {"argument_mib", "output_mib", "total_mib"}


def test_cli_empty_dir(tmp_path, capsys):
    rc = trace_report.main([str(tmp_path)])
    assert rc == 1
    assert "no *.xplane.pb" in capsys.readouterr().err


def test_doctor_cli(capsys):
    """tools/doctor.py health check: all required checks pass on the CPU
    test backend, JSON mode is machine-readable, exit code reflects
    health."""
    import json
    import sys

    sys.path.insert(0, "tools")
    try:
        import doctor
    finally:
        sys.path.pop(0)
    rc = doctor.main(["--json"])
    out = capsys.readouterr().out
    assert rc == 0
    rep = json.loads(out.strip().splitlines()[-1])
    assert rep["ok"] is True
    names = {c["check"] for c in rep["checks"]}
    assert {"backend", "dispatch", "model-forward"} <= names
    assert all(c["ok"] for c in rep["checks"] if c["required"])
