"""The mechanical format gate (tools/format_check.py) — the reference's
``make check-format`` counterpart (its Makefile:4-14 runs black/isort;
this image has neither, so the gate is a from-scratch checker)."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import format_check  # noqa: E402


def test_repo_is_clean():
    assert format_check.main([]) == 0


def _errs(tmp_path, src, name="mod.py"):
    p = tmp_path / name
    p.write_bytes(src if isinstance(src, bytes) else src.encode())
    return format_check.check_file(p)


def test_detects_long_line(tmp_path):
    errs = _errs(tmp_path, "x = 1  # " + "y" * 100 + "\n")
    assert any("line too long" in e for e in errs)


def test_detects_trailing_whitespace_and_tabs(tmp_path):
    errs = _errs(tmp_path, "x = 1 \nif x:\n\treturn_ = 2\n")
    assert any("trailing whitespace" in e for e in errs)
    assert any("tab indentation" in e for e in errs)


def test_detects_newline_problems(tmp_path):
    assert any("missing final newline" in e
               for e in _errs(tmp_path, "x = 1"))
    assert any("multiple final newlines" in e
               for e in _errs(tmp_path, "x = 1\n\n"))
    assert any("CRLF" in e for e in _errs(tmp_path, b"x = 1\r\n"))


def test_detects_import_section_disorder(tmp_path):
    bad = '"""doc."""\nimport numpy\nimport os\n'
    errs = _errs(tmp_path, bad)
    assert any("stdlib import after a third-party import" in e
               for e in errs)
    good = ('"""doc."""\nfrom __future__ import annotations\n'
            "import os\n\nimport numpy\n\nfrom cara_tpu import api\n"
            "api.x = os.path + numpy.pi\n")
    assert _errs(tmp_path, good) == []


def test_late_imports_are_exempt(tmp_path):
    src = ("import os\n\nX = os.sep\n\n"
           "def f():\n    import numpy\n    return numpy\n\n"
           "import json  # after code: outside the prologue contract\n")
    assert _errs(tmp_path, src) == []
