"""Tolerant JSON repair kernel (per-row transform for Ray Data stages)."""

from .api import cli, from_file, load, loads, repair_json
from .common import MISSING, JSONReturnType, MissingType
from .core import RepairParser
from .schema import SchemaFixer, schema_from_input

__all__ = [
    "JSONReturnType",
    "MISSING",
    "MissingType",
    "RepairParser",
    "SchemaFixer",
    "cli",
    "from_file",
    "load",
    "loads",
    "repair_json",
    "schema_from_input",
]
