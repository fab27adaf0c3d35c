from typing import Any

from engine.repair.common import MISSING as MISSING_VALUE
from engine.repair.common import MissingType as MissingValueType
from engine.repair.common import QUOTES

JSONReturnType = dict[str, Any] | list[Any] | str | float | int | bool | None
STRING_DELIMITERS = list(QUOTES)

__all__ = ["JSONReturnType", "MISSING_VALUE", "MissingValueType", "STRING_DELIMITERS"]
