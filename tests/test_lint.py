"""Static hygiene checks (no ruff/mypy in this container).

Guards against the round-1 regression class where a function was defined
twice in one module and the *second* (stale) definition silently shadowed
the fixed first one (ADVICE.md high: engine/stages.py fk_orphans_semijoin).
"""
from __future__ import annotations

import ast
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _py_files():
    for sub in ("engine", "tools"):
        base = ROOT / sub
        if base.exists():
            yield from base.rglob("*.py")
    yield ROOT / "__ray_entry__.py"
    yield ROOT / "bench.py"


def test_no_duplicate_toplevel_defs():
    """No module may define the same top-level function/class twice (F811)."""
    offenders = []
    for path in _py_files():
        tree = ast.parse(path.read_text(), filename=str(path))
        seen: dict[str, int] = {}
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                if node.name in seen:
                    offenders.append(f"{path}:{node.lineno} redefines {node.name} "
                                     f"(first at :{seen[node.name]})")
                seen[node.name] = node.lineno
    assert not offenders, "\n".join(offenders)


def test_no_duplicate_methods():
    """Same guard one level down: no class defines a method twice."""
    offenders = []
    for path in _py_files():
        tree = ast.parse(path.read_text(), filename=str(path))
        for node in ast.walk(tree):
            if not isinstance(node, ast.ClassDef):
                continue
            seen: dict[str, int] = {}
            for item in node.body:
                if isinstance(item, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    # @x.setter / @x.getter / @x.deleter legitimately reuse
                    # the property's name.
                    if any(isinstance(d, ast.Attribute)
                           and d.attr in ("setter", "getter", "deleter")
                           for d in item.decorator_list):
                        continue
                    if item.name in seen:
                        offenders.append(
                            f"{path}:{item.lineno} class {node.name} redefines "
                            f"{item.name} (first at :{seen[item.name]})")
                    seen[item.name] = item.lineno
    assert not offenders, "\n".join(offenders)
