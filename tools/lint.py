#!/usr/bin/env python
"""Minimal dependency-free linter for CI.

The reference enforces hygiene with clang-format + a CI build matrix
(`run_format.sh`, `.gitlab-ci.yml`); the venv here ships no Python linters,
so this implements the checks that matter at that level: syntax (AST parse),
unused imports, tabs/trailing whitespace, and accidental breakpoints.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

ALLOWED_UNUSED = {
    "annotations",  # from __future__
    "jax",  # imported for side effects/backend registration in a few spots
}


def iter_py_files(targets: list[str]):
    for t in targets:
        p = Path(t)
        if p.is_dir():
            yield from sorted(p.rglob("*.py"))
        elif p.suffix == ".py":
            yield p


def collect_used_names(tree: ast.AST) -> set[str]:
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            root = node
            while isinstance(root, ast.Attribute):
                root = root.value
            if isinstance(root, ast.Name):
                used.add(root.id)
    return used


def lint_file(path: Path) -> list[str]:
    errors: list[str] = []
    text = path.read_text()
    try:
        tree = ast.parse(text, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    lines = text.splitlines()
    for i, line in enumerate(lines, 1):
        if "\t" in line:
            errors.append(f"{path}:{i}: tab character")
        if line.rstrip("\n") != line.rstrip():
            errors.append(f"{path}:{i}: trailing whitespace")

    used = collect_used_names(tree)
    is_pkg_init = path.name == "__init__.py"  # imports there are re-exports
    for node in ast.walk(tree):
        if is_pkg_init and isinstance(node, (ast.Import, ast.ImportFrom)):
            continue
        if isinstance(node, (ast.Import, ast.ImportFrom)) and "noqa" in (
            lines[node.lineno - 1] if node.lineno <= len(lines) else ""
        ):
            continue
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                if name not in used and name not in ALLOWED_UNUSED:
                    errors.append(f"{path}:{node.lineno}: unused import '{name}'")
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                name = a.asname or a.name
                if name not in used and name not in ALLOWED_UNUSED:
                    errors.append(f"{path}:{node.lineno}: unused import '{name}'")
        elif isinstance(node, ast.Call):
            f = node.func
            if isinstance(f, ast.Name) and f.id == "breakpoint":
                errors.append(f"{path}:{node.lineno}: breakpoint() left in code")
    return errors


def main() -> int:
    targets = sys.argv[1:] or ["evo_tpu", "tests"]
    all_errors: list[str] = []
    n = 0
    for f in iter_py_files(targets):
        n += 1
        all_errors += lint_file(f)
    for e in all_errors:
        print(e)
    print(f"lint: {n} files, {len(all_errors)} findings")
    return 1 if all_errors else 0


if __name__ == "__main__":
    sys.exit(main())
