#!/usr/bin/env python
"""Mechanical format gate (the reference's ``make check-format`` analog).

The reference ships black/isort gates (``/root/reference/Makefile:4-14``,
``.pre-commit-config.yaml``); this image has neither tool, so the gate
is a from-scratch stdlib checker enforcing the invariants the codebase
already holds — it FAILS on regressions instead of rewriting files:

* no line over 88 columns (black's width; the prevailing style is 79
  with a small tail of 80-88 in tables/citations),
* no trailing whitespace, no tab indentation,
* LF line endings, exactly one final newline,
* import-section ordering at module top level: ``__future__`` first,
  then stdlib, then third-party, then first-party (``cara_tpu`` /
  ``tools`` / ``benchmarks``) — a group may not come back after a later
  group has started (isort's section contract, without enforcing
  alphabetical order inside a group).

Usage::

    python tools/format_check.py            # whole repo (Makefile gate)
    python tools/format_check.py FILE...    # specific files
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

MAX_LINE = 88
REPO = Path(__file__).resolve().parent.parent
FIRST_PARTY = {"cara_tpu", "tools", "benchmarks", "conftest",
               "__graft_entry__"}
# Minimal stdlib membership via sys.stdlib_module_names (3.10+).
STDLIB = set(getattr(sys, "stdlib_module_names", ()))

SKIP_DIRS = {".git", "__pycache__", ".claude", "build", "dist",
             ".jax_cache"}


def _import_group(node) -> int:
    """0 = __future__, 1 = stdlib, 2 = third-party, 3 = first-party."""
    if isinstance(node, ast.ImportFrom):
        if node.level and node.level > 0:
            return 3  # relative import = first-party
        root = (node.module or "").split(".")[0]
    else:
        root = node.names[0].name.split(".")[0]
    if root == "__future__":
        return 0
    if root in FIRST_PARTY:
        return 3
    if root in STDLIB:
        return 1
    return 2


def check_file(path: Path) -> list:
    errs = []
    rel = path.relative_to(REPO) if path.is_relative_to(REPO) else path
    data = path.read_bytes()
    if b"\r" in data:
        errs.append(f"{rel}: CRLF line ending")
    if data and not data.endswith(b"\n"):
        errs.append(f"{rel}: missing final newline")
    if data.endswith(b"\n\n"):
        errs.append(f"{rel}: multiple final newlines")
    try:
        text = data.decode("utf-8")
    except UnicodeDecodeError as e:
        return errs + [f"{rel}: not UTF-8 ({e})"]
    for i, line in enumerate(text.splitlines(), 1):
        if len(line) > MAX_LINE:
            errs.append(f"{rel}:{i}: line too long ({len(line)} > "
                        f"{MAX_LINE})")
        if line != line.rstrip():
            errs.append(f"{rel}:{i}: trailing whitespace")
        stripped = line.lstrip("\t ")
        if "\t" in line[: len(line) - len(stripped)]:
            errs.append(f"{rel}:{i}: tab indentation")
    try:
        tree = ast.parse(text)
    except SyntaxError as e:
        return errs + [f"{rel}: syntax error at line {e.lineno}"]
    # Import-section ordering over the TOP-LEVEL prologue: consider the
    # imports before the first non-import/non-docstring statement (late
    # imports inside functions or after code are deliberate).
    max_group = -1
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            g = _import_group(node)
            if g < max_group:
                names = ["__future__", "stdlib", "third-party",
                         "first-party"]
                errs.append(
                    f"{rel}:{node.lineno}: {names[g]} import after a "
                    f"{names[max_group]} import (order: __future__ < "
                    "stdlib < third-party < first-party)")
            max_group = max(max_group, g)
        elif not (isinstance(node, ast.Expr)
                  and isinstance(node.value, ast.Constant)):
            break  # prologue over (docstring allowed before imports)
    return errs


def iter_files(args) -> list:
    if args:
        return [Path(a) for a in args]
    out = []
    for p in sorted(REPO.rglob("*.py")):
        if any(part in SKIP_DIRS for part in p.parts):
            continue
        out.append(p)
    return out


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    errs = []
    files = iter_files(argv)
    for p in files:
        errs.extend(check_file(p))
    for e in errs:
        print(e)
    print(f"format_check: {len(files)} files, {len(errs)} problem(s)")
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
