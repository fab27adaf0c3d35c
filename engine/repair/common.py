"""Shared constants and small value helpers for the repair kernel."""

from __future__ import annotations

from typing import Any

# Public alias for everything the repair API can return as a decoded value
# (reference utils/constants.py:7).
JSONReturnType = dict[str, Any] | list[Any] | str | float | int | bool | None

# The reference treats smart quotes as first-class delimiters (constants.py:15).
QUOTES: tuple[str, ...] = ('"', "'", "“", "”")

# Parse-context tags (the reference uses an Enum stack; strings compare fast
# and pickle cleanly into Ray workers).
KEY = "key"
VAL = "value"
ARR = "array"


class MissingType:
    """Sentinel for 'value absent, let the schema fill it'."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover
        return "<MISSING_VALUE>"

    def __deepcopy__(self, memo: dict) -> "MissingType":
        return self


MISSING = MissingType()


def same_shape(a: Any, b: Any) -> bool:
    """Structural equality of type + keys/shape (not leaf values).

    Drives the top-level "repeated object is an update" rule
    (reference utils/object_comparer.py:8-39).
    """
    if type(a) is not type(b):
        return False
    if isinstance(a, dict):
        if len(a) != len(b):
            return False
        return all(k in b and same_shape(a[k], b[k]) for k in a)
    if isinstance(a, list):
        if len(a) != len(b):
            return False
        return all(same_shape(x, y) for x, y in zip(a, b))
    return True


def strictly_empty(v: Any) -> bool:
    return isinstance(v, (str, list, dict, set, tuple)) and len(v) == 0
