"""Adapter: reference facade module names over our api module.

Note: repair_json here wraps our implementation but keeps this module's
``json`` and ``JSONParser`` attributes patchable the way the reference tests
patch them (the engine's own api module reads the real stdlib json).
"""

import json  # noqa: F401  (reference tests monkeypatch this module attribute)

import engine.repair.api as _api
from engine.repair.api import cli, from_file, load, loads, repair_json  # noqa: F401

from .json_parser import JSONParser  # noqa: F401

# Make the facade construct the adapter class so reference tests that patch
# JSONParser methods observe the engine's behavior.
_api.RepairParser = JSONParser
