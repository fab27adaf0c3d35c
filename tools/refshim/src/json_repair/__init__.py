from .json_repair import from_file, load, loads, repair_json
from .utils.constants import JSONReturnType

__all__ = ["JSONReturnType", "from_file", "load", "loads", "repair_json"]
