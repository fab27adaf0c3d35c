"""Schema-directed repair behaviors (SchemaFixer via the public API)."""

import pytest

from engine.repair import repair_json


def test_coercions():
    schema = {"type": "object", "properties": {
        "age": {"type": "integer"}, "name": {"type": "string"},
        "score": {"type": "number"}, "ok": {"type": "boolean"}}}
    got = repair_json('{"age": "42", "name": 7, "score": "3.5", "ok": "yes"}',
                      return_objects=True, schema=schema)
    assert got == {"age": 42, "name": "7", "score": 3.5, "ok": True}


def test_defaults_and_required():
    schema = {"type": "object",
              "properties": {"a": {"type": "string"}, "b": {"type": "integer", "default": 9}},
              "required": ["a"]}
    # valid JSON satisfying the schema takes the fast path unchanged
    assert repair_json('{"a": "x"}', return_objects=True, schema=schema) == {"a": "x"}
    # the repair path inserts defaults
    assert repair_json('{"a": "x"}', return_objects=True, schema=schema,
                       skip_json_loads=True) == {"a": "x", "b": 9}
    with pytest.raises(ValueError, match="Missing required"):
        repair_json('{"b": 1}', return_objects=True, schema=schema)


def test_missing_value_filled_from_schema():
    schema = {"type": "object", "properties": {"k": {"type": "string", "default": "dflt"}}}
    assert repair_json('{"k": }', return_objects=True, schema=schema,
                       skip_json_loads=True) == {"k": "dflt"}


def test_union_and_enum():
    schema = {"type": "object", "properties": {
        "v": {"oneOf": [{"type": "integer"}, {"type": "string"}]},
        "e": {"enum": ["x", "y"]}}}
    assert repair_json('{"v": "12", "e": "x"}', return_objects=True, schema=schema,
                       skip_json_loads=True) == {"v": 12, "e": "x"}
    with pytest.raises(ValueError, match="enum"):
        repair_json('{"e": "zzz"}', return_objects=True, schema=schema)


def test_ref_resolution():
    schema = {
        "$defs": {"s": {"type": "string"}},
        "type": "object",
        "properties": {"a": {"$ref": "#/$defs/s"}},
    }
    assert repair_json('{"a": 5}', return_objects=True, schema=schema) == {"a": "5"}


def test_additional_properties_dropped():
    schema = {"type": "object", "properties": {"a": {"type": "integer"}},
              "additionalProperties": False}
    assert repair_json('{"a": 1, "junk": 2}', return_objects=True, schema=schema) == {"a": 1}


def test_salvage_mode():
    schema = {"type": "object",
              "properties": {"x": {"type": "integer"}, "y": {"type": "string"}},
              "required": ["x", "y"]}
    # list of right arity maps onto properties by order
    got = repair_json('[5, "hello"]', return_objects=True, schema=schema,
                      schema_repair_mode="salvage")
    assert got == {"x": 5, "y": "hello"}


def test_string_wrapped_array_unwrap():
    schema = {"type": "object", "properties": {"arr": {"type": "array", "items": {"type": "integer"}}}}
    assert repair_json('{"arr": "[1, 2, 3]"}', return_objects=True, schema=schema) == {"arr": [1, 2, 3]}


def test_pydantic_model_schema():
    pydantic = pytest.importorskip("pydantic")

    class Clip(pydantic.BaseModel):
        text: str
        confidence: float = 0.5

    got = repair_json('{"text": 42}', return_objects=True, schema=Clip)
    assert got == {"text": "42", "confidence": 0.5}


def test_schema_strict_conflict():
    with pytest.raises(ValueError, match="cannot be used together"):
        repair_json("{}", schema={"type": "object"}, strict=True)
    with pytest.raises(ValueError, match="requires schema"):
        repair_json("{}", schema_repair_mode="salvage")
