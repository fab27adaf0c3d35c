"""Property-based invariants of the repair kernel (hypothesis).

The kernel's contract: any text in, JSON-compatible value out (or a
ValueError in strict mode) — never a crash, never a non-serializable result,
and repairing already-valid JSON is the identity.
"""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from engine.repair import loads, repair_json

json_values = st.recursive(
    st.none() | st.booleans() | st.integers(min_value=-2**53, max_value=2**53)
    | st.floats(allow_nan=False, allow_infinity=False, width=32)
    | st.text(max_size=40),
    lambda children: st.lists(children, max_size=5)
    | st.dictionaries(st.text(max_size=12), children, max_size=5),
    max_leaves=20,
)

# Strings over this alphabet never trigger repair heuristics (no quotes,
# backslashes, delimiters, or JSON-structural characters) — for these the
# tolerant parser is a strict identity.  On adversarial-but-valid JSON the
# heuristics fire BY DESIGN (e.g. '{"\\\\": null}' -> {} — verified identical
# to the reference), so identity there is intentionally not a property.
plain_text = st.text(alphabet=st.sampled_from(list(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 .-_!?;")), max_size=30)

plain_json_values = st.recursive(
    st.none() | st.booleans() | st.integers(min_value=-2**53, max_value=2**53)
    | plain_text,
    lambda children: st.lists(children, max_size=5)
    | st.dictionaries(plain_text, children, max_size=5),
    max_leaves=20,
)

junk_text = st.text(
    alphabet=st.sampled_from(list('{}[]()"\',:`\\ \n\t#/.-0123456789abcxyz“”„tfn')),
    max_size=120,
)


@settings(max_examples=300, deadline=None)
@given(json_values)
def test_valid_json_is_identity_on_fast_path(value):
    assert loads(json.dumps(value)) == value


@settings(max_examples=300, deadline=None)
@given(plain_json_values)
def test_repair_parser_is_identity_on_plain_content(value):
    # Container roots only: bare top-level scalars are fast-path-only by
    # contract (reference json_parser.py:220-226 skips them when the context
    # stack is empty).
    if isinstance(value, (dict, list)):
        assert loads(json.dumps(value), skip_json_loads=True) == value


@settings(max_examples=500, deadline=None)
@given(junk_text)
def test_any_text_yields_json_compatible_value(raw):
    out = loads(raw, skip_json_loads=True)
    # The result must round-trip through the strict json module.
    json.dumps(out)


@settings(max_examples=300, deadline=None)
@given(junk_text)
def test_repair_is_idempotent_on_its_own_output(raw):
    once = repair_json(raw, skip_json_loads=True)
    if once == "":
        return
    # Repairing the repaired serialization must be a no-op.
    assert repair_json(once) == once


@settings(max_examples=200, deadline=None)
@given(junk_text)
def test_strict_mode_raises_or_agrees(raw):
    try:
        strict_out = loads(raw, strict=True, skip_json_loads=True)
    except ValueError:
        return  # rejection is a valid strict outcome
    json.dumps(strict_out)


@settings(max_examples=200, deadline=None)
@given(json_values)
def test_stream_stable_prefix_parses(value):
    """Every prefix of a valid document repairs without error in
    stream-stable mode (the accumulating-LLM-stream use case)."""
    raw = json.dumps(value)
    for cut in range(1, len(raw), max(1, len(raw) // 5)):
        out = loads(raw[:cut], stream_stable=True, skip_json_loads=True)
        json.dumps(out)
