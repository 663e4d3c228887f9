#!/usr/bin/env python
"""From-scratch AST linter — the repo's clippy-pedantic analog.

The reference gates CI on ``cargo clippy -- -D clippy::pedantic -D
clippy::nursery`` (reference: .github/workflows/ci.yml:31, justfile:12-16).
No third-party Python linter is available in this environment, so this tool
implements the high-signal subset natively on ``ast``:

  UNUSED-IMPORT     imported name never referenced in the module
  REDEF-IMPORT      import shadowed by a later import of the same name
  BARE-EXCEPT       ``except:`` with no exception class
  MUTABLE-DEFAULT   list/dict/set literal as a parameter default
  EQ-NONE           ``== None`` / ``!= None`` (use ``is``)
  EQ-BOOL           ``== True`` / ``== False``
  F-NO-PLACEHOLDER  f-string without any interpolation
  TAB-INDENT        tab characters in indentation
  TRAILING-WS       trailing whitespace
  LONG-LINE         line over the limit (default 100 columns)
  STAR-IMPORT       ``from x import *``
  EXEC-EVAL         use of exec()/eval()

Suppress a finding with ``# lint: ok`` on the offending line. Exit code is
the number of findings. Usage: ``python tools/lint.py [paths...]``.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

MAX_LINE = 100
DEFAULT_PATHS = ("clip_embedder_tpu", "tools", "bench.py", "pull_weights.py",
                 "__graft_entry__.py", "benches", "examples")


class _ImportVisitor(ast.NodeVisitor):
    """Collect every imported binding (scope-blind — for the unused check;
    name usage is gathered separately by _dotted_roots)."""

    def __init__(self) -> None:
        self.imports: dict[str, tuple[int, str]] = {}  # name -> (line, kind)

    def _bind(self, name: str, line: int, kind: str) -> None:
        self.imports[name] = (line, kind)

    def visit_Import(self, node: ast.Import) -> None:
        for alias in node.names:
            name = alias.asname or alias.name.split(".")[0]
            self._bind(name, node.lineno, "import")

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        for alias in node.names:
            if alias.name == "*":
                continue
            name = alias.asname or alias.name
            self._bind(name, node.lineno, "from")


def _dotted_roots(tree: ast.AST) -> set[str]:
    """Names used anywhere, including attribute roots and string annotations."""
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            inner = node.value
            while isinstance(inner, ast.Attribute):
                inner = inner.value
            if isinstance(inner, ast.Name):
                used.add(inner.id)
    return used


def lint_file(path: Path) -> list[str]:
    src = path.read_text()
    lines = src.splitlines()
    findings: list[str] = []

    def ok(lineno: int) -> bool:
        return 0 < lineno <= len(lines) and "# lint: ok" in lines[lineno - 1]

    def add(lineno: int, rule: str, msg: str) -> None:
        if not ok(lineno):
            findings.append(f"{path}:{lineno}: {rule}: {msg}")

    # -- text-level rules ---------------------------------------------------
    for i, line in enumerate(lines, 1):
        stripped = line.rstrip("\n")
        if stripped != stripped.rstrip():
            add(i, "TRAILING-WS", "trailing whitespace")
        indent = stripped[: len(stripped) - len(stripped.lstrip())]
        if "\t" in indent:
            add(i, "TAB-INDENT", "tab in indentation")
        if len(stripped) > MAX_LINE and "http" not in stripped:
            add(i, "LONG-LINE", f"line is {len(stripped)} > {MAX_LINE} columns")

    # -- ast-level rules ----------------------------------------------------
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: SYNTAX: {e.msg}"]

    iv = _ImportVisitor()
    # scope-blind import walk for the unused check; redefinition checks only
    # consider module-level imports (function-local re-imports are scoped)
    iv.visit(tree)
    module_level: dict[str, int] = {}
    redefs: list[tuple[int, str]] = []
    for stmt in tree.body:
        if isinstance(stmt, ast.Import):
            names = [(a.asname or a.name.split(".")[0], stmt.lineno)
                     for a in stmt.names]
        elif isinstance(stmt, ast.ImportFrom):
            names = [(a.asname or a.name, stmt.lineno)
                     for a in stmt.names if a.name != "*"]
        else:
            continue
        for name, line in names:
            if name in module_level:
                redefs.append((line, name))
            module_level[name] = line
    used = _dotted_roots(tree)
    # names re-exported via __all__ count as used
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    for elt in ast.walk(node.value):
                        if isinstance(elt, ast.Constant) and isinstance(
                                elt.value, str):
                            used.add(elt.value)
    is_package_init = path.name == "__init__.py"
    for name, (line, _kind) in iv.imports.items():
        if name.startswith("_") or name == "annotations":
            continue
        if not is_package_init and name not in used:
            add(line, "UNUSED-IMPORT", f"'{name}' imported but unused")
    for line, name in redefs:
        add(line, "REDEF-IMPORT", f"'{name}' re-imported at module level")

    # format_specs inside f-strings parse as nested JoinedStrs — not
    # themselves f-strings, so exempt from F-NO-PLACEHOLDER
    format_specs = {
        id(node.format_spec)
        for node in ast.walk(tree)
        if isinstance(node, ast.FormattedValue) and node.format_spec is not None
    }
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            add(node.lineno, "BARE-EXCEPT", "bare 'except:'")
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in [*node.args.defaults, *node.args.kw_defaults]:
                if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                    add(default.lineno, "MUTABLE-DEFAULT",
                        f"mutable default in '{node.name}'")
        elif isinstance(node, ast.Compare):
            for op, comp in zip(node.ops, node.comparators):
                if isinstance(comp, ast.Constant):
                    if comp.value is None and isinstance(
                            op, (ast.Eq, ast.NotEq)):
                        add(node.lineno, "EQ-NONE", "use 'is (not) None'")
                    elif isinstance(comp.value, bool) and isinstance(
                            op, (ast.Eq, ast.NotEq)):
                        add(node.lineno, "EQ-BOOL",
                            "compare to True/False with 'is' or drop it")
        elif isinstance(node, ast.JoinedStr) and id(node) not in format_specs:
            if not any(isinstance(v, ast.FormattedValue) for v in node.values):
                add(node.lineno, "F-NO-PLACEHOLDER",
                    "f-string without placeholders")
        elif isinstance(node, ast.ImportFrom):
            if any(a.name == "*" for a in node.names):
                add(node.lineno, "STAR-IMPORT", "wildcard import")
        elif isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
            if node.func.id in ("exec", "eval"):
                add(node.lineno, "EXEC-EVAL", f"use of {node.func.id}()")
    return findings


def main(argv: list[str]) -> int:
    targets = argv or list(DEFAULT_PATHS)
    files: list[Path] = []
    for t in targets:
        p = Path(t)
        if p.is_dir():
            files.extend(sorted(p.rglob("*.py")))
        elif p.suffix == ".py":
            files.append(p)
    findings: list[str] = []
    for f in files:
        findings.extend(dict.fromkeys(lint_file(f)))  # dedupe, keep order
    for line in findings:
        print(line)
    print(f"lint: {len(findings)} finding(s) over {len(files)} file(s)",
          file=sys.stderr)
    return min(len(findings), 100)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
