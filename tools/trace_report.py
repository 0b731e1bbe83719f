#!/usr/bin/env python
"""Summarize a ``jax.profiler`` trace directory as per-op time tables.

The reference has no profiling subsystem at all (SURVEY.md section 5 —
only tqdm progress bars, ``vit_cp.py:26,54``); this framework records
XLA-level traces via ``--profile-dir`` (``cara_tpu/utils/profiling.trace``)
and this tool turns the dump into an actionable report without needing
TensorBoard: for every device plane it aggregates event durations per op,
prints the top-N table, and can emit JSON for scripting.

``jax.profiler.start_trace`` writes ``plugins/profile/<run>/<host>.xplane.pb``
— an ``XSpace`` protobuf (tsl/profiler/protobuf/xplane.proto).  The image
has no TensorFlow (the tensorboard profile plugin's converter needs
``_pywrap_profiler``), so this module decodes the protobuf wire format
directly with the stdlib; the XSpace schema is small and stable.

Usage::

    python tools/trace_report.py /tmp/profile            # newest run
    python tools/trace_report.py /tmp/profile --top 30 --plane TPU
    python tools/trace_report.py /tmp/profile --group    # fold fusion.1/2/..
    python tools/trace_report.py /tmp/profile --json
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path
from typing import Dict, Iterator, List, Tuple

# ----------------------------------------------------------------------------
# Minimal protobuf wire-format decoder (stdlib only).
# ----------------------------------------------------------------------------


def _varint(buf, pos: int) -> Tuple[int, int]:
    """Decode one varint; returns (value, new_pos)."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long (corrupt trace?)")


def _fields(buf) -> Iterator[Tuple[int, int, object]]:
    """Iterate (field_number, wire_type, value) over one message's bytes.

    Wire types: 0=varint (int), 2=length-delimited (memoryview); 1/5 are
    skipped by returning raw bytes (XSpace only uses 0 and 2 except for
    XStat.double_value, which this report does not need).
    """
    pos, n = 0, len(buf)
    while pos < n:
        key, pos = _varint(buf, pos)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = _varint(buf, pos)
        elif wt == 1:
            val = bytes(buf[pos : pos + 8])
            pos += 8
        elif wt == 2:
            ln, pos = _varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            val = bytes(buf[pos : pos + 4])
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, val


def _text(v) -> str:
    return bytes(v).decode("utf-8", errors="replace")


# ----------------------------------------------------------------------------
# XSpace schema walk (field numbers from tsl/profiler/protobuf/xplane.proto).
# ----------------------------------------------------------------------------


def _parse_event(buf) -> Tuple[int, int, int]:
    """XEvent -> (metadata_id, duration_ps, offset_ps)."""
    mid = dur = off = 0
    for fno, _, val in _fields(buf):
        if fno == 1:
            mid = val
        elif fno == 3:
            dur = val
        elif fno == 2:
            off = val
    return mid, dur, off


def _parse_line(buf) -> Dict:
    """XLine -> {name, events: [(mid, dur_ps, off_ps)]}."""
    name = display = ""
    events: List[Tuple[int, int, int]] = []
    for fno, _, val in _fields(buf):
        if fno == 2:
            name = _text(val)
        elif fno == 11:
            display = _text(val)
        elif fno == 4:
            events.append(_parse_event(val))
    return {"name": display or name, "events": events}


def _parse_stat(buf, stat_meta: Dict[int, str]) -> Tuple[str, object]:
    """XStat -> (name, value).  str_value (5) and ref_value (7, a
    stat_metadata id whose NAME is the value) cover everything this
    report consumes; numeric values pass through raw."""
    mid, val = None, None
    for fno, _, v in _fields(buf):
        if fno == 1:
            mid = v
        elif fno == 5:
            val = _text(v)
        elif fno == 7:
            val = stat_meta.get(v, v)
        elif fno in (3, 4):
            val = v
    return stat_meta.get(mid, mid), val


def _parse_event_metadata(buf, stat_meta: Dict[int, str]
                          ) -> Tuple[int, str, Dict]:
    """map<int64, XEventMetadata> entry -> (id, short_name, info).

    On TPU device planes the metadata ``name`` holds the FULL HLO op
    line (result shape, operands) and per-op XStats carry exact
    attribution — ``source`` (file:line) and ``deduplicated_name`` (the
    canonical op all duplicates of one kernel point at).  ``info`` keeps
    {hlo: full op text, source, dedup} for invocation-exact kernel
    attribution (bench.py); the aggregate tables keep using the short
    display name."""
    mid, name, display = 0, "", ""
    stats: Dict[str, object] = {}
    for fno, _, val in _fields(buf):
        if fno == 1:
            mid = val
        elif fno == 2:  # XEventMetadata payload
            for f2, _, v2 in _fields(val):
                if f2 == 2:
                    name = _text(v2)
                elif f2 == 4:
                    display = _text(v2)
                elif f2 == 5:
                    k, v = _parse_stat(v2, stat_meta)
                    if isinstance(k, str):
                        stats[k] = v
    short = display or name
    info = {"hlo": name if name != short else "",
            "source": stats.get("source", ""),
            "dedup": stats.get("deduplicated_name", "")}
    return mid, short, info


def _parse_plane(buf) -> Dict:
    """XPlane -> {name, lines, meta: id->name, meta_info: id->dict}."""
    name = ""
    lines: List[Dict] = []
    meta: Dict[int, str] = {}
    meta_info: Dict[int, Dict] = {}
    stat_meta: Dict[int, str] = {}
    raw_event_meta: List = []
    for fno, _, val in _fields(buf):
        if fno == 2:
            name = _text(val)
        elif fno == 3:
            lines.append(_parse_line(val))
        elif fno == 4:
            raw_event_meta.append(val)
        elif fno == 5:  # map<int64, XStatMetadata>
            k, nm = None, ""
            for f2, _, v2 in _fields(val):
                if f2 == 1:
                    k = v2
                elif f2 == 2:
                    for f3, _, v3 in _fields(v2):
                        if f3 == 2:
                            nm = _text(v3)
            if k is not None:
                stat_meta[k] = nm
    for val in raw_event_meta:  # stat_meta must be complete first
        mid, mname, info = _parse_event_metadata(val, stat_meta)
        meta[mid] = mname
        meta_info[mid] = info
    return {"name": name, "lines": lines, "meta": meta,
            "meta_info": meta_info}


def parse_xspace(data: bytes) -> List[Dict]:
    """Decode an XSpace file into a list of plane dicts."""
    planes = []
    for fno, _, val in _fields(memoryview(data)):
        if fno == 1:
            planes.append(_parse_plane(val))
    return planes


# ----------------------------------------------------------------------------
# Aggregation + report.
# ----------------------------------------------------------------------------

_GROUP_RE = re.compile(r"\.\d+$")


def aggregate(
    planes: List[Dict],
    plane_filter: str = "",
    line_filter: str = "",
    group: bool = False,
) -> List[Dict]:
    """Per (plane, line): op name -> {count, total_ps}, plus line span."""
    out = []
    for plane in planes:
        if plane_filter and plane_filter.lower() not in plane["name"].lower():
            continue
        meta = plane["meta"]
        for line in plane["lines"]:
            if line_filter and line_filter.lower() not in line["name"].lower():
                continue
            if not line["events"]:
                continue
            ops: Dict[str, Dict] = {}
            lo, hi, busy = None, 0, 0
            for mid, dur, off in line["events"]:
                name = meta.get(mid, f"<metadata {mid}>")
                if group:
                    name = _GROUP_RE.sub("", name)
                rec = ops.setdefault(name, {"count": 0, "total_ps": 0})
                rec["count"] += 1
                rec["total_ps"] += dur
                busy += dur
                lo = off if lo is None else min(lo, off)
                hi = max(hi, off + dur)
            out.append(
                {
                    "plane": plane["name"],
                    "line": line["name"],
                    "span_ps": (hi - (lo or 0)),
                    "busy_ps": busy,
                    "ops": ops,
                }
            )
    return out


def find_xplane_files(logdir: Path) -> List[Path]:
    """All ``*.xplane.pb`` under the newest profile run in ``logdir``."""
    files = sorted(logdir.rglob("*.xplane.pb"))
    if not files:
        return []
    # start_trace writes one run dir per trace; report only the newest run.
    newest_run = max((f.parent for f in files),
                     key=lambda d: d.stat().st_mtime)
    return [f for f in files if f.parent == newest_run]


def render(tables: List[Dict], top: int) -> str:
    """Human-readable report."""
    out = []
    for t in tables:
        span_ms = t["span_ps"] / 1e9
        busy_ms = t["busy_ps"] / 1e9
        out.append(f"\n=== {t['plane']} :: {t['line']} "
                   f"(span {span_ms:.3f} ms, busy {busy_ms:.3f} ms) ===")
        out.append(f"{'total ms':>10}  {'%busy':>6}  {'count':>6}  "
                   f"{'avg us':>9}  op")
        ranked = sorted(
            t["ops"].items(), key=lambda kv: kv[1]["total_ps"], reverse=True
        )
        for name, rec in ranked[:top]:
            tot_ms = rec["total_ps"] / 1e9
            pct = 100.0 * rec["total_ps"] / t["busy_ps"] if t["busy_ps"] else 0
            avg_us = rec["total_ps"] / rec["count"] / 1e6
            out.append(
                f"{tot_ms:>10.3f}  {pct:>6.1f}  {rec['count']:>6}  "
                f"{avg_us:>9.1f}  {name}"
            )
        if len(ranked) > top:
            rest = sum(r["total_ps"] for _, r in ranked[top:]) / 1e9
            out.append(f"{rest:>10.3f}  {'':>6}  {'':>6}  {'':>9}  "
                       f"... {len(ranked) - top} more ops")
    return "\n".join(out)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("logdir", type=Path,
                    help="directory passed to --profile-dir / start_trace")
    ap.add_argument("--top", type=int, default=20,
                    help="rows per table (default 20)")
    ap.add_argument("--plane", default="",
                    help="only planes whose name contains this substring "
                         "(e.g. 'TPU' to skip host threads)")
    ap.add_argument("--line", default="",
                    help="only lines whose name contains this substring "
                         "(e.g. 'XLA Ops')")
    ap.add_argument("--group", action="store_true",
                    help="fold trailing .N numeric suffixes (fusion.1, "
                         "fusion.2 -> fusion)")
    ap.add_argument("--json", action="store_true", dest="as_json",
                    help="machine-readable output")
    args = ap.parse_args(argv)

    files = find_xplane_files(args.logdir)
    if not files:
        print(f"no *.xplane.pb under {args.logdir} — run with --profile-dir "
              "(or jax.profiler.start_trace) first", file=sys.stderr)
        return 1

    tables: List[Dict] = []
    for f in files:
        tables.extend(
            aggregate(parse_xspace(f.read_bytes()),
                      args.plane, args.line, args.group)
        )
    tables.sort(key=lambda t: t["busy_ps"], reverse=True)

    if args.as_json:
        print(json.dumps(tables, indent=None, default=str))
    else:
        print(f"trace run: {files[0].parent}")
        print(render(tables, args.top))
    return 0


if __name__ == "__main__":
    sys.exit(main())
