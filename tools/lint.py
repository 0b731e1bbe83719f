#!/usr/bin/env python
"""AST-based lint + static call checks for cara_tpu.

The reference repo gates on flake8(+bugbear+darglint)+mypy+pre-commit
(``/root/reference/pyproject.toml:60-76``, ``.flake8``).  This environment
has none of those installed and no network, so this module implements the
load-bearing subset natively on ``ast``:

  F401  unused import                     E711  ``== None`` / ``!= None``
  F821  undefined name (scope-aware)      E712  ``== True`` / ``== False``
  F541  f-string without placeholders     E722  bare ``except:``
  C901  duplicate dict key                B006  mutable default argument
  A001  call-arity/kwarg mismatch for functions defined in-repo
  T001  inconsistent tuple-return arities within one function
  T002  ``-> None`` annotation but the function returns a value
  T003  tuple-unpacking arity != the callee's known tuple-return arity

The T-series is the minimal stand-in for the reference's mypy gate
(annotation/return-shape consistency — the class of bug a return-signature
change like ``_resolve_impls`` growing a 4th element would introduce).

``# noqa`` (with or without codes) suppresses findings on that line.
Exit status 1 if any finding; used by ``make lint`` and CI.

Usage: python tools/lint.py [paths...]   (default: cara_tpu benchmarks tests
bench.py __graft_entry__.py tools)
"""

from __future__ import annotations

import ast
import builtins
import os
import re
import sys
from typing import Dict, List, Optional, Set, Tuple

BUILTINS = set(dir(builtins)) | {"__file__", "__name__", "__doc__",
                                 "__package__", "__spec__", "__builtins__",
                                 "__debug__", "__annotations__", "__dict__",
                                 "__class__", "__loader__", "__path__"}

NOQA_RE = re.compile(r"#\s*noqa(?::\s*(?P<codes>[A-Z0-9, ]+))?", re.I)


class Finding:
    def __init__(self, path: str, line: int, code: str, msg: str):
        self.path, self.line, self.code, self.msg = path, line, code, msg

    def __str__(self):
        return f"{self.path}:{self.line}: {self.code} {self.msg}"


def _noqa_lines(src: str) -> Dict[int, Optional[Set[str]]]:
    """line -> None (blanket noqa) or set of codes."""
    out: Dict[int, Optional[Set[str]]] = {}
    for i, line in enumerate(src.splitlines(), 1):
        m = NOQA_RE.search(line)
        if m:
            codes = m.group("codes")
            out[i] = (set(c.strip().upper() for c in codes.split(","))
                      if codes else None)
    return out


# --------------------------------------------------------------------------
# Scope-aware name tracking (F401 / F811 / F821)
# --------------------------------------------------------------------------


class _Scope:
    def __init__(self, kind: str, node):
        self.kind = kind          # module | function | class | comprehension
        self.node = node
        self.bindings: Dict[str, ast.AST] = {}
        self.uses: Set[str] = set()
        self.globals: Set[str] = set()
        self.nonlocals: Set[str] = set()


class NameChecker(ast.NodeVisitor):
    """One pass per module: records import bindings, name uses, and
    undefined-name candidates with lexical scoping."""

    def __init__(self, path: str, tree: ast.Module):
        self.path = path
        self.findings: List[Finding] = []
        self.scopes: List[_Scope] = []
        self.import_nodes: Dict[Tuple[int, str], ast.AST] = {}
        self.used_names: Set[str] = set()
        self.star_import = False
        self.tree = tree

    # -- scope helpers ------------------------------------------------------

    def _bind(self, name: str, node):
        sc = self.scopes[-1]
        if name in sc.globals or name in sc.nonlocals:
            return
        sc.bindings[name] = node

    def _lookup(self, name: str) -> bool:
        # class scopes are not visible from nested function scopes
        skip_class = False
        for sc in reversed(self.scopes):
            if sc.kind == "class" and skip_class:
                continue
            if name in sc.bindings or name in sc.globals \
                    or name in sc.nonlocals:
                return True
            if sc.kind == "function":
                skip_class = True
        return name in BUILTINS

    # -- visitors -----------------------------------------------------------

    def visit_Module(self, node):
        self.scopes.append(_Scope("module", node))
        # Hoist module-level function/class/import bindings (forward refs
        # inside function bodies are legal).
        for st in ast.walk(node):
            if isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.ClassDef)):
                pass
        self.generic_visit(node)
        self._finish_module()

    def _finish_module(self):
        sc = self.scopes.pop()
        if self.star_import:
            return
        for (line, name), nd in self.import_nodes.items():
            if name in self.used_names or name.startswith("_"):
                continue
            if name in getattr(self, "_dunder_all", set()):
                continue
            self.findings.append(Finding(
                self.path, line, "F401", f"'{name}' imported but unused"))

    def visit_Import(self, node):
        for alias in node.names:
            name = alias.asname or alias.name.split(".")[0]
            self._bind(name, node)
            if self.scopes[-1].kind == "module":
                self.import_nodes[(node.lineno, name)] = node

    def visit_ImportFrom(self, node):
        if node.module == "__future__":
            return
        for alias in node.names:
            if alias.name == "*":
                self.star_import = True
                continue
            name = alias.asname or alias.name
            self._bind(name, node)
            if self.scopes[-1].kind == "module":
                # "import x as x" is the PEP 484 re-export idiom
                if alias.asname == alias.name:
                    continue
                self.import_nodes[(node.lineno, name)] = node

    def visit_Assign(self, node):
        self.visit(node.value)
        for tgt in node.targets:
            self._bind_target(tgt)
        # record __all__
        for tgt in node.targets:
            if isinstance(tgt, ast.Name) and tgt.id == "__all__":
                try:
                    vals = ast.literal_eval(node.value)
                    self._dunder_all = set(vals)
                except Exception:
                    pass

    def visit_AnnAssign(self, node):
        if node.value:
            self.visit(node.value)
        self._record_annotation_uses(node.annotation)
        self._bind_target(node.target)

    def visit_AugAssign(self, node):
        self.visit(node.value)
        self.visit(node.target)
        self._bind_target(node.target)

    def visit_NamedExpr(self, node):
        self.visit(node.value)
        # walrus binds in the enclosing function/module scope, skipping
        # comprehension scopes
        for sc in reversed(self.scopes):
            if sc.kind != "comprehension":
                sc.bindings[node.target.id] = node
                break

    def _bind_target(self, tgt):
        if isinstance(tgt, ast.Name):
            self._bind(tgt.id, tgt)
        elif isinstance(tgt, (ast.Tuple, ast.List)):
            for el in tgt.elts:
                self._bind_target(el)
        elif isinstance(tgt, ast.Starred):
            self._bind_target(tgt.value)
        else:
            self.visit(tgt)

    def visit_For(self, node):
        self.visit(node.iter)
        self._bind_target(node.target)
        for st in node.body + node.orelse:
            self.visit(st)

    visit_AsyncFor = visit_For

    def visit_With(self, node):
        for item in node.items:
            self.visit(item.context_expr)
            if item.optional_vars is not None:
                self._bind_target(item.optional_vars)
        for st in node.body:
            self.visit(st)

    visit_AsyncWith = visit_With

    def visit_Global(self, node):
        self.scopes[-1].globals.update(node.names)

    def visit_Nonlocal(self, node):
        self.scopes[-1].nonlocals.update(node.names)

    def visit_ExceptHandler(self, node):
        if node.name:
            self._bind(node.name, node)
        self.generic_visit(node)

    def _visit_function(self, node):
        self._bind(node.name, node)
        for dec in node.decorator_list:
            self.visit(dec)
        for d in node.args.defaults + [
                d for d in node.args.kw_defaults if d is not None]:
            self.visit(d)
        # Annotations count as uses (whether or not `from __future__ import
        # annotations` makes them lazy) so typing imports aren't flagged.
        args = node.args
        for a in (args.posonlyargs + args.args + args.kwonlyargs
                  + ([args.vararg] if args.vararg else [])
                  + ([args.kwarg] if args.kwarg else [])):
            if a.annotation is not None:
                self._record_annotation_uses(a.annotation)
        if node.returns is not None:
            self._record_annotation_uses(node.returns)
        sc = _Scope("function", node)
        self.scopes.append(sc)
        args = node.args
        for a in (args.posonlyargs + args.args + args.kwonlyargs
                  + ([args.vararg] if args.vararg else [])
                  + ([args.kwarg] if args.kwarg else [])):
            sc.bindings[a.arg] = a
        for st in node.body:
            self.visit(st)
        self.scopes.pop()

    visit_FunctionDef = _visit_function
    visit_AsyncFunctionDef = _visit_function

    def visit_Lambda(self, node):
        for d in node.args.defaults + [
                d for d in node.args.kw_defaults if d is not None]:
            self.visit(d)
        sc = _Scope("function", node)
        self.scopes.append(sc)
        args = node.args
        for a in (args.posonlyargs + args.args + args.kwonlyargs
                  + ([args.vararg] if args.vararg else [])
                  + ([args.kwarg] if args.kwarg else [])):
            sc.bindings[a.arg] = a
        self.visit(node.body)
        self.scopes.pop()

    def visit_ClassDef(self, node):
        self._bind(node.name, node)
        for dec in node.decorator_list:
            self.visit(dec)
        for base in node.bases + node.keywords:
            self.visit(base.value if isinstance(base, ast.keyword) else base)
        self.scopes.append(_Scope("class", node))
        for st in node.body:
            self.visit(st)
        self.scopes.pop()

    def _visit_comprehension(self, node):
        gens = node.generators
        self.visit(gens[0].iter)
        self.scopes.append(_Scope("comprehension", node))
        for i, gen in enumerate(gens):
            if i > 0:
                self.visit(gen.iter)
            self._bind_target(gen.target)
            for cond in gen.ifs:
                self.visit(cond)
        if isinstance(node, ast.DictComp):
            self.visit(node.key)
            self.visit(node.value)
        else:
            self.visit(node.elt)
        self.scopes.pop()

    visit_ListComp = _visit_comprehension
    visit_SetComp = _visit_comprehension
    visit_GeneratorExp = _visit_comprehension
    visit_DictComp = _visit_comprehension

    def _record_annotation_uses(self, node):
        """Record names referenced by an annotation as uses WITHOUT running
        undefined-name checks (string annotations / forward refs are fine)."""
        for n in ast.walk(node):
            if isinstance(n, ast.Name):
                self.used_names.add(n.id)
            elif isinstance(n, ast.Constant) and isinstance(n.value, str):
                # string annotation: pick identifiers out of it
                for ident in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", n.value):
                    self.used_names.add(ident)

    def visit_Name(self, node):
        if isinstance(node.ctx, ast.Load):
            self.used_names.add(node.id)
            if not self._lookup(node.id) and not self.star_import:
                # Module-scope forward references are common (defs seen
                # later); only flag inside functions where lookup covers the
                # whole lexical chain after module hoisting below.
                self.findings.append(Finding(
                    self.path, node.lineno, "F821",
                    f"undefined name '{node.id}'"))
        elif isinstance(node.ctx, ast.Store):
            self._bind(node.id, node)

    def visit_Attribute(self, node):
        self.visit(node.value)


def _hoist_module_bindings(tree: ast.Module, checker: NameChecker):
    """Pre-bind every module-level name (defs, classes, imports, assigns)
    so forward references don't false-positive."""
    sc = checker.scopes[-1]
    for st in tree.body:
        for node in [st] + (st.body if isinstance(
                st, (ast.Try, ast.If, ast.For, ast.While, ast.With)) else []):
            _collect_bindings(node, sc)


def _collect_bindings(node, sc):
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        sc.bindings[node.name] = node
    elif isinstance(node, ast.Import):
        for a in node.names:
            sc.bindings[a.asname or a.name.split(".")[0]] = node
    elif isinstance(node, ast.ImportFrom):
        for a in node.names:
            if a.name != "*":
                sc.bindings[a.asname or a.name] = node
    elif isinstance(node, ast.Assign):
        for tgt in node.targets:
            _collect_target(tgt, sc, node)
    elif isinstance(node, ast.AnnAssign):
        _collect_target(node.target, sc, node)
    elif isinstance(node, (ast.If, ast.Try, ast.For, ast.While, ast.With)):
        for st in ast.iter_child_nodes(node):
            _collect_bindings(st, sc)


def _collect_target(tgt, sc, node):
    if isinstance(tgt, ast.Name):
        sc.bindings[tgt.id] = node
    elif isinstance(tgt, (ast.Tuple, ast.List)):
        for el in tgt.elts:
            _collect_target(el, sc, node)
    elif isinstance(tgt, ast.Starred):
        _collect_target(tgt.value, sc, node)


# --------------------------------------------------------------------------
# Simple per-node checks
# --------------------------------------------------------------------------


MUTABLE_CALLS = {"list", "dict", "set", "defaultdict", "OrderedDict"}


def simple_checks(path: str, tree: ast.Module) -> List[Finding]:
    out: List[Finding] = []
    # Format specs (f"{x:08d}") are themselves JoinedStr nodes with only
    # Constant parts — they are not user f-strings, skip them.
    spec_ids = {id(n.format_spec) for n in ast.walk(tree)
                if isinstance(n, ast.FormattedValue) and n.format_spec}
    for node in ast.walk(tree):
        if isinstance(node, ast.Compare):
            for op, cmp_ in zip(node.ops, node.comparators):
                if isinstance(op, (ast.Eq, ast.NotEq)):
                    if isinstance(cmp_, ast.Constant) and cmp_.value is None:
                        out.append(Finding(
                            path, node.lineno, "E711",
                            "comparison to None should be 'is None'"))
                    elif isinstance(cmp_, ast.Constant) \
                            and isinstance(cmp_.value, bool):
                        out.append(Finding(
                            path, node.lineno, "E712",
                            f"comparison to {cmp_.value} should be "
                            f"'is {cmp_.value}' or truthiness"))
        elif isinstance(node, ast.ExceptHandler) and node.type is None:
            out.append(Finding(path, node.lineno, "E722",
                               "do not use bare 'except:'"))
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in node.args.defaults + [
                    x for x in node.args.kw_defaults if x is not None]:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)) or (
                        isinstance(d, ast.Call)
                        and isinstance(d.func, ast.Name)
                        and d.func.id in MUTABLE_CALLS):
                    out.append(Finding(
                        path, d.lineno, "B006",
                        "mutable default argument"))
        elif isinstance(node, ast.JoinedStr):
            if id(node) not in spec_ids and not any(
                    isinstance(v, ast.FormattedValue) for v in node.values):
                out.append(Finding(path, node.lineno, "F541",
                                   "f-string without placeholders"))
        elif isinstance(node, ast.Dict):
            seen: Set = set()
            for k in node.keys:
                if isinstance(k, ast.Constant):
                    try:
                        if k.value in seen:
                            out.append(Finding(
                                path, k.lineno, "C901",
                                f"duplicate dict key {k.value!r}"))
                        seen.add(k.value)
                    except TypeError:
                        pass
    return out


# --------------------------------------------------------------------------
# Cross-module call-arity check (the "type gate")
# --------------------------------------------------------------------------


def _walk_own(func_node):
    """Walk a function's OWN statements, not those of nested defs/lambdas."""
    stack = list(func_node.body)
    while stack:
        node = stack.pop()
        yield node
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.Lambda)):
            continue
        stack.extend(ast.iter_child_nodes(node))


class FuncSig:
    def __init__(self, node):
        a = node.args
        self.name = node.name
        self.posonly = [x.arg for x in a.posonlyargs]
        self.args = [x.arg for x in a.args]
        self.kwonly = [x.arg for x in a.kwonlyargs]
        self.n_defaults = len(a.defaults)
        self.kw_defaults = [x is not None for x in a.kw_defaults]
        self.vararg = a.vararg is not None
        self.kwarg = a.kwarg is not None
        self.is_method = False
        self.decorated = bool(node.decorator_list)
        # Return-shape facts for the T-series (mypy-stand-in) checks.
        self.is_gen = False
        self.has_bare_return = False
        self.has_value_return = False
        lens = set()
        for sub in _walk_own(node):
            if isinstance(sub, (ast.Yield, ast.YieldFrom)):
                self.is_gen = True
            elif isinstance(sub, ast.Return):
                v = sub.value
                if v is None or (isinstance(v, ast.Constant)
                                 and v.value is None):
                    self.has_bare_return = True
                else:
                    self.has_value_return = True
                    lens.add(len(v.elts) if isinstance(v, ast.Tuple) else -1)
        self.ret_lens = lens
        ann = node.returns
        self.ann_none = isinstance(ann, ast.Constant) and ann.value is None

    def known_tuple_len(self):
        """Tuple arity if EVERY return is a same-length tuple literal."""
        if (self.decorated or self.is_gen or self.has_bare_return
                or len(self.ret_lens) != 1 or -1 in self.ret_lens):
            return None
        return next(iter(self.ret_lens))

    def check_call(self, call: ast.Call) -> Optional[str]:
        if self.decorated:
            return None  # decorator may change the signature
        npos_given = 0
        has_star = False
        for a in call.args:
            if isinstance(a, ast.Starred):
                has_star = True
            else:
                npos_given += 1
        kw_given = set()
        has_kwstar = False
        for kw in call.keywords:
            if kw.arg is None:
                has_kwstar = True
            else:
                kw_given.add(kw.arg)
        pos_params = self.posonly + self.args
        if self.is_method:
            pos_params = pos_params[1:] if pos_params else []
        max_pos = len(pos_params)
        if not self.vararg and not has_star and npos_given > max_pos:
            return (f"too many positional args to {self.name}() "
                    f"({npos_given} > {max_pos})")
        if not self.kwarg and not has_kwstar:
            valid_kw = set(pos_params[len(self.posonly):]) | set(self.kwonly)
            unknown = kw_given - valid_kw
            if unknown:
                return (f"unknown keyword arg(s) to {self.name}(): "
                        f"{sorted(unknown)}")
        if not has_star and not has_kwstar:
            required_pos = max_pos - self.n_defaults
            covered = npos_given + len(kw_given & set(pos_params))
            if covered < required_pos:
                missing = [p for p in pos_params[npos_given:required_pos]
                           if p not in kw_given]
                if missing:
                    return (f"missing required arg(s) to {self.name}(): "
                            f"{missing}")
            req_kwonly = set(
                k for k, hasdef in zip(self.kwonly, self.kw_defaults)
                if not hasdef)
            miss_kw = req_kwonly - kw_given
            if miss_kw:
                return (f"missing required kwonly arg(s) to {self.name}(): "
                        f"{sorted(miss_kw)}")
        return None


def collect_signatures(trees: Dict[str, ast.Module]) -> Dict[str, FuncSig]:
    """module-level function name -> signature (skipping names defined more
    than once with different arities — too ambiguous to check)."""
    sigs: Dict[str, FuncSig] = {}
    ambiguous: Set[str] = set()
    for tree in trees.values():
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                sig = FuncSig(node)
                if node.name in sigs or node.name in ambiguous:
                    ambiguous.add(node.name)
                    sigs.pop(node.name, None)
                else:
                    sigs[node.name] = sig
    return sigs


def check_calls(path: str, tree: ast.Module,
                sigs: Dict[str, FuncSig]) -> List[Finding]:
    out = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
            sig = sigs.get(node.func.id)
            if sig is not None:
                msg = sig.check_call(node)
                if msg:
                    out.append(Finding(path, node.lineno, "A001", msg))
        # T003: tuple-unpacking arity vs the callee's known return arity
        # (`a, b = f(...)` where every return in f is a 3-tuple literal).
        # The annotation/return half of the reference's mypy gate
        # (pyproject.toml:60-76) that call-arity A001 didn't cover.
        if (isinstance(node, ast.Assign) and len(node.targets) == 1
                and isinstance(node.targets[0], (ast.Tuple, ast.List))
                and isinstance(node.value, ast.Call)
                and isinstance(node.value.func, ast.Name)):
            elts = node.targets[0].elts
            if any(isinstance(t, ast.Starred) for t in elts):
                continue
            sig = sigs.get(node.value.func.id)
            want = sig.known_tuple_len() if sig is not None else None
            if want is not None and want != len(elts):
                out.append(Finding(
                    path, node.lineno, "T003",
                    f"unpacking {len(elts)} values from {sig.name}() "
                    f"which returns {want}-tuples"))
    return out


def signature_checks(path: str, tree: ast.Module) -> List[Finding]:
    """T001/T002: per-function return-shape consistency (mypy stand-in)."""
    out = []
    for node in ast.walk(tree):
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        sig = FuncSig(node)
        tuple_lens = {n for n in sig.ret_lens if n >= 0}
        if len(tuple_lens) > 1 and -1 not in sig.ret_lens:
            out.append(Finding(
                path, node.lineno, "T001",
                f"{node.name}() returns tuple literals of different "
                f"arities {sorted(tuple_lens)}"))
        if sig.ann_none and sig.has_value_return and not sig.is_gen:
            out.append(Finding(
                path, node.lineno, "T002",
                f"{node.name}() is annotated '-> None' but returns a "
                f"value"))
    return out


# --------------------------------------------------------------------------
# Driver
# --------------------------------------------------------------------------


def iter_py_files(paths):
    for p in paths:
        if os.path.isfile(p) and p.endswith(".py"):
            yield p
        elif os.path.isdir(p):
            for root, dirs, files in os.walk(p):
                dirs[:] = [d for d in dirs
                           if d not in ("__pycache__", ".git", ".venv")]
                for f in sorted(files):
                    if f.endswith(".py"):
                        yield os.path.join(root, f)


def lint_paths(paths) -> List[Finding]:
    findings: List[Finding] = []
    trees: Dict[str, ast.Module] = {}
    sources: Dict[str, str] = {}
    for path in iter_py_files(paths):
        try:
            src = open(path).read()
            tree = ast.parse(src, path)
        except SyntaxError as e:
            findings.append(Finding(path, e.lineno or 0, "E999",
                                    f"syntax error: {e.msg}"))
            continue
        trees[path] = tree
        sources[path] = src

    sigs = collect_signatures(
        {p: t for p, t in trees.items() if "/tests/" not in p})

    for path, tree in trees.items():
        per_file: List[Finding] = []
        checker = NameChecker(path, tree)
        checker.scopes.append(_Scope("module", tree))
        _hoist_module_bindings(tree, checker)
        checker.scopes.pop()
        # re-run with hoisted bindings as the module scope
        checker = NameChecker(path, tree)
        sc = _Scope("module", tree)
        checker.scopes.append(sc)
        _hoist_module_bindings(tree, checker)
        for st in tree.body:
            checker.visit(st)
        checker._finish_module()
        per_file.extend(checker.findings)
        per_file.extend(simple_checks(path, tree))
        per_file.extend(signature_checks(path, tree))
        if not path.endswith("tools/lint.py"):
            per_file.extend(check_calls(path, tree, sigs))

        noqa = _noqa_lines(sources[path])
        for f in per_file:
            codes = noqa.get(f.line, False)
            if codes is False:
                findings.append(f)
            elif codes is not None and f.code.upper() not in codes:
                findings.append(f)
    return findings


def main(argv=None) -> int:
    args = (argv if argv is not None else sys.argv[1:]) or [
        "cara_tpu", "benchmarks", "tests", "tools",
        "bench.py", "__graft_entry__.py"]
    missing = [p for p in args if not os.path.exists(p)]
    if missing:
        print(f"lint: path(s) do not exist: {missing}", file=sys.stderr)
        return 2
    findings = lint_paths(args)
    for f in sorted(findings, key=lambda f: (f.path, f.line)):
        print(f)
    print(f"lint: {len(findings)} finding(s) in "
          f"{sum(1 for _ in iter_py_files(args))} files")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
