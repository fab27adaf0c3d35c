"""Differential fuzzer: this engine's repair kernel vs the reference library.

Compares outputs (or exception types) across flag combinations on three input
families: grammar-fragment soup, mutated valid documents, and random
(schema, value) pairs for the schema-guided path.  Any divergence prints a
repro; exit code 1 on mismatches.

    PYTHONPATH=. python tools/fuzz_differential.py [trials_per_family]

Requires the read-only reference checkout (REF env, default /root/reference).
Round-1 results: 0 divergences in ~80k trials except one input that crashes
the reference itself (pinned in tests/test_repair_kernel.py).
"""

from __future__ import annotations

import json
import os
import random
import sys

REF = os.environ.get("REF", "/root/reference")
sys.path.insert(0, REF)

from src.json_repair.json_repair import repair_json as ref_repair  # noqa: E402

from engine.repair import repair_json as my_repair  # noqa: E402

FRAGMENTS = ['{', '}', '[', ']', '(', ')', ',', ':', ' ', '\n', '\t', '"', "'",
             '“', '”', '„', '`', '``', '```', '```json', '\\', '\\"', '\\\\',
             '//c\n', '/*x*/', '#c\n', '...', 'true', 'True', 'false', 'null',
             'None', '-', '.', '1', '12.5', '1e3', '1_0', '1/2', 'abc', 'key',
             'value', 'a b', '"k"', "'k'", '"k":', 'k:', '"v"', 'x,', 'x}',
             '[1,2]', '{"a":1}', '€', '中']

FLAG_SETS = [
    {"return_objects": True},
    {"return_objects": True, "skip_json_loads": True},
    {"skip_json_loads": True},
    {"return_objects": True, "stream_stable": True},
    {"return_objects": True, "strict": True, "skip_json_loads": True},
    {"return_objects": True, "logging": True},
]


def _run(fn, raw: str, kwargs: dict):
    try:
        return fn(raw, **kwargs), None
    except Exception as exc:  # noqa: BLE001
        return None, type(exc).__name__


def compare(raw: str, kwargs: dict, *, ref_fn=ref_repair, my_fn=my_repair,
            label: str = "") -> bool:
    want = _run(ref_fn, raw, kwargs)
    got = _run(my_fn, raw, kwargs)
    if want != got:
        print(f"DIFF {label}kwargs={kwargs} raw={raw!r}")
        print(f"  ref : {want!r}"[:200])
        print(f"  mine: {got!r}"[:200])
        return False
    return True


def fuzz_grammar(n: int) -> int:
    bad = 0
    for _ in range(n):
        raw = "".join(random.choice(FRAGMENTS) for _ in range(random.randint(1, 24)))
        if not compare(raw, random.choice(FLAG_SETS)):
            bad += 1
    return bad


_MUTATION_BASES = [
    {"a": 1, "b": [1, 2, 3], "c": {"d": "x y, z", "e": None}, "f": True},
    [{"k": "v"}, {"k": "w"}, 3.5, "s"],
    {"text": "line1\nline2, key: val", "n": -2.5e3, "arr": [[1, 2], [3, 4]]},
]


def _mutate_doc() -> str:
    s = json.dumps(random.choice(_MUTATION_BASES))
    for _ in range(random.randint(1, 3)):
        op = random.choice(["del", "ins", "dup", "quote", "trunc"])
        if op == "del" and s:
            j = random.randrange(len(s))
            s = s[:j] + s[j + 1:]
        elif op == "ins":
            j = random.randrange(len(s) + 1)
            s = s[:j] + random.choice(FRAGMENTS) + s[j:]
        elif op == "dup" and s:
            j = random.randrange(len(s))
            s = s[:j] + s[j] + s[j:]
        elif op == "quote":
            s = s.replace('"', "'", 1)
        elif op == "trunc" and len(s) > 3:
            s = s[:random.randrange(3, len(s))]
    return s


def fuzz_mutated(n: int) -> int:
    bad = 0
    for _ in range(n):
        if not compare(_mutate_doc(), random.choice(FLAG_SETS[:4])):
            bad += 1
    return bad


def fuzz_chunked(n: int) -> int:
    """load(fd, chunk_length=k) for tiny k must agree with the reference —
    exercises the chunk-boundary logic of the file buffer on both sides."""
    import io as _io

    from src.json_repair.json_repair import load as ref_load

    from engine.repair import load as my_load

    def ref_fn(r, **kw):
        return ref_load(_io.StringIO(r), **kw)

    def my_fn(r, **kw):
        return my_load(_io.StringIO(r), **kw)

    bad = 0
    for _ in range(n):
        kwargs = {"chunk_length": random.choice([1, 2, 3, 5, 8, 64])}
        if random.random() < 0.3:
            kwargs["skip_json_loads"] = True
        if not compare(_mutate_doc(), kwargs, ref_fn=ref_fn, my_fn=my_fn,
                       label="chunked "):
            bad += 1
    return bad


def _rand_schema(depth=0):
    kinds = ["string", "integer", "number", "boolean", "null", "object", "array",
             "enum", "union", "typelist", "allOf"]
    k = random.choice(kinds if depth < 3 else kinds[:5])
    if k in ("integer", "number", "boolean", "null"):
        return {"type": k}
    if k == "string":
        s = {"type": "string"}
        if random.random() < 0.3:
            s["default"] = "dflt"
        return s
    if k == "enum":
        return {"enum": random.sample(["a", "b", 1, 2, True, None], k=random.randint(1, 3))}
    if k == "union":
        return {random.choice(["oneOf", "anyOf"]):
                [_rand_schema(depth + 1) for _ in range(random.randint(1, 3))]}
    if k == "typelist":
        return {"type": random.sample(["string", "integer", "boolean", "null", "number"],
                                      k=random.randint(2, 3))}
    if k == "allOf":
        return {"allOf": [_rand_schema(depth + 1)]}
    if k == "object":
        props = {f"k{i}": _rand_schema(depth + 1) for i in range(random.randint(0, 3))}
        s = {"type": "object", "properties": props}
        if props and random.random() < 0.4:
            s["required"] = random.sample(list(props), k=random.randint(1, len(props)))
        if random.random() < 0.3:
            s["additionalProperties"] = random.choice([True, False, {"type": "string"}])
        return s
    s = {"type": "array"}
    if random.random() < 0.7:
        s["items"] = (_rand_schema(depth + 1) if random.random() < 0.7
                      else [_rand_schema(depth + 1) for _ in range(random.randint(1, 3))])
    return s


def _rand_value(depth=0):
    if depth > 2 or random.random() < 0.4:
        return random.choice([None, True, False, 1, 2.5, "x", "7", "yes",
                              "no", "[1,2]", '{"a":1}', ""])
    if random.random() < 0.5:
        return [_rand_value(depth + 1) for _ in range(random.randint(0, 3))]
    return {f"k{i}": _rand_value(depth + 1) for i in range(random.randint(0, 3))}


def fuzz_schema(n: int) -> int:
    bad = 0
    for _ in range(n):
        raw = json.dumps(_rand_value())
        if random.random() < 0.5 and len(raw) > 2:
            j = random.randrange(len(raw))
            raw = raw[:j] + raw[j + 1:]
        kwargs = {"return_objects": True, "schema": _rand_schema(),
                  "schema_repair_mode": random.choice(["standard", "standard", "salvage"])}
        if random.random() < 0.5:
            kwargs["skip_json_loads"] = True
        if not compare(raw, kwargs):
            bad += 1
    return bad


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    random.seed(int(os.environ.get("FUZZ_SEED", "1234")))
    bad = (fuzz_grammar(n) + fuzz_mutated(n) + fuzz_schema(min(n, 3000))
           + fuzz_chunked(min(n, 2000)))
    total = n * 2 + min(n, 3000) + min(n, 2000)
    print(f"{total} trials, {bad} divergences")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
