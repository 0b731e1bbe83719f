"""The lint gate must actually gate: seeded errors fail, the repo passes.

(Reference ships flake8+bugbear+mypy, ``/root/reference/pyproject.toml:60-76``;
this environment has none installed, so ``tools/lint.py`` implements the
load-bearing checks on ``ast`` — this test is the proof they fire.)
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import lint  # noqa: E402


def _codes(src, tmp_path, name="mod.py"):
    p = tmp_path / name
    p.write_text(textwrap.dedent(src))
    return {(f.code, f.line) for f in lint.lint_paths([str(p)])}, \
        [str(f) for f in lint.lint_paths([str(p)])]


def test_unused_import_fires(tmp_path):
    codes, _ = _codes("import os\nimport sys\nprint(sys.argv)\n", tmp_path)
    assert ("F401", 1) in codes
    assert not any(c == "F401" and ln == 2 for c, ln in codes)


def test_undefined_name_fires(tmp_path):
    codes, msgs = _codes("""
        def f():
            return undefined_thing + 1
    """, tmp_path)
    assert any(c == "F821" for c, _ in codes), msgs


def test_scoping_no_false_positives(tmp_path):
    codes, msgs = _codes("""
        import functools

        GLOBAL = 3

        def outer(a, b=GLOBAL):
            def inner(x):
                return a + x + GLOBAL
            items = [inner(i) for i in range(b) if i != a]
            fn = functools.partial(inner, 1)
            with open("f") as fh:
                data = fh.read()
            try:
                pass
            except ValueError as e:
                print(e)
            lam = lambda q: q + a
            return later(items, fn, data, lam)

        def later(*args):
            return args

        class K:
            attr = GLOBAL
            def method(self):
                return self.attr
    """, tmp_path)
    assert codes == set(), msgs


def test_misc_checks_fire(tmp_path):
    codes, msgs = _codes("""
        def f(x=[]):
            if x == None:
                pass
            if x == True:
                pass
            try:
                pass
            except:
                pass
            return f"no placeholder"

        D = {"a": 1, "a": 2}
        OK = x = 0
        y = x == 0   # int comparison: NOT E712
    """, tmp_path)
    got = {c for c, _ in codes}
    assert {"B006", "E711", "E712", "E722", "F541", "C901"} <= got, msgs
    # == 0 must not be E712 (0 == False in python!)
    e712_lines = [ln for c, ln in codes if c == "E712"]
    assert len(e712_lines) == 1


def test_call_arity_fires(tmp_path):
    codes, msgs = _codes("""
        def helper(a, b, c=1):
            return a + b + c

        helper(1, 2)            # ok
        helper(1, 2, 3)         # ok
        helper(1, 2, 3, 4)      # too many
        helper(1)               # missing b
        helper(1, 2, nope=3)    # unknown kwarg
    """, tmp_path)
    a001 = sorted(ln for c, ln in codes if c == "A001")
    assert len(a001) == 3, msgs


def test_noqa_suppresses(tmp_path):
    codes, _ = _codes("import os  # noqa\n", tmp_path)
    assert codes == set()
    codes, _ = _codes("import os  # noqa: F401\n", tmp_path)
    assert codes == set()
    codes, _ = _codes("import os  # noqa: E722\n", tmp_path)
    assert ("F401", 1) in codes  # wrong code does not suppress


def test_repo_is_clean():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "lint.py")],
        cwd=REPO, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr


def test_cli_exit_code_on_seeded_error(tmp_path):
    bad = tmp_path / "bad.py"
    bad.write_text("import os\n")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "lint.py"), str(bad)],
        capture_output=True, text=True)
    assert r.returncode == 1
    assert "F401" in r.stdout


def test_t_series_return_shape_checks(tmp_path):
    """T001/T002/T003: the mypy-gate stand-in (return-shape consistency)."""
    src = """
    def bad_arity(x):
        if x:
            return 1, 2
        return 1, 2, 3

    def bad_none(x) -> None:
        return x + 1

    def three():
        return 1, 2, 3

    a, b = three()
    """
    codes, msgs = _codes(src, tmp_path)
    assert any(c == "T001" for c, _ in codes), msgs
    assert any(c == "T002" for c, _ in codes), msgs
    assert any(c == "T003" for c, _ in codes), msgs


def test_t_series_no_false_positives(tmp_path):
    src = """
    from typing import Optional

    def gen() -> None:
        yield 1

    def maybe(x) -> Optional[int]:
        if x:
            return 1
        return None

    def mixed(x):
        if x:
            return [1, 2]
        return 1, 2  # non-tuple sibling -> unknown, not flagged

    def three():
        return 1, 2, 3

    a, *rest = three()       # starred unpack: skipped
    b = three()              # no unpack: fine
    a2, b2, c2 = three()     # correct arity
    """
    codes, msgs = _codes(src, tmp_path)
    assert not any(c.startswith("T") for c, _ in codes), msgs
