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
                # typing.overload stubs legitimately precede the implementation.
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and any(
                        (isinstance(d, ast.Name) and d.id == "overload")
                        or (isinstance(d, ast.Attribute) and d.attr == "overload")
                        for d in node.decorator_list):
                    seen.pop(node.name, None)
                    continue
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


def test_typed_api_contract():
    """The reference guarantees overload inference for repair_json
    (reference tests/test_type_inference.py; mypy is absent in this container
    so the contract is gated at runtime via typing.get_overloads): default
    flags -> str, return_objects=True -> JSONReturnType, logging=True ->
    (value, log) tuple.  py.typed markers must ship with the package."""
    import inspect
    import typing

    from engine.repair.api import repair_json

    ovs = typing.get_overloads(repair_json)
    assert len(ovs) == 4
    shapes = []
    for f in ovs:
        sig = inspect.signature(f)
        shapes.append((str(sig.parameters["return_objects"].annotation),
                       str(sig.parameters["logging"].annotation),
                       str(sig.return_annotation)))
    assert ("Literal[False]", "Literal[False]", "str") in shapes
    assert ("Literal[True]", "Literal[False]", "JSONReturnType") in shapes
    assert ("bool", "Literal[True]",
            "tuple[JSONReturnType, list[dict[str, str]]]") in shapes

    for marker in (ROOT / "engine" / "py.typed",
                   ROOT / "engine" / "repair" / "py.typed",
                   ROOT / "tools" / "refshim" / "src" / "json_repair" / "py.typed"):
        assert marker.exists(), f"missing {marker}"

    from engine.repair import JSONReturnType  # public export  # noqa: F401
