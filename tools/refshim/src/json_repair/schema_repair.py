"""Adapter: reference SchemaRepairer API over our SchemaFixer."""

from typing import Any

from engine.repair.schema import (  # noqa: F401
    REPAIR_MODES as SUPPORTED_SCHEMA_REPAIR_MODES,
    SchemaDefinitionError,
    SchemaFixer,
    _shim_items_lists,
    load_schema_model,
    match_patterns,
    normalize_mode as normalize_schema_repair_mode,
    schema_from_input,
    scrub_missing as normalize_missing_values,
)


class SchemaRepairer(SchemaFixer):
    def __init__(self, schema, log=None, schema_repair_mode: str = "standard"):
        super().__init__(schema, log, mode=schema_repair_mode)

    @property
    def schema_repair_mode(self):
        return self.mode

    @property
    def root_schema(self):
        return self.root

    @property
    def _validator_cache(self):
        return self._validators

    def repair_value(self, value: Any, schema, path: str):
        return self.fix(value, schema, path)

    def _log(self, text: str, path: str):
        return self.report(text, path)

    def _fill_missing(self, schema, path):
        return self._fill(schema, path)

    def _coerce_scalar(self, value, schema_type, path):
        return self._coerce(value, schema_type, path)

    def _repair_object(self, value, schema, path):
        return self._fix_object(value, schema, path)

    def _repair_array(self, value, schema, path):
        return self._fix_array(value, schema, path)

    def _copy_json_value(self, value, path, label):
        return self.copy_value(value, path, label)

    def _resolve_ref(self, ref):
        return self._deref(ref)

    def _can_salvage_list_as_object(self, schema):
        return self._declares_type(schema, "object") and not self._declares_type(schema, "array")

    def _map_list_to_object(self, value, schema, path):
        return self._list_as_object(value, schema, path)

    def _load_json_string_container(self, value, expected_type, path, unwrap_log, salvage_log):
        return self._unwrap_json_string(value, expected_type, path, unwrap_log, salvage_log)

    def _get_validator(self, schema):
        return self._validator_for(schema)

    def _apply_enum_const(self, value, schema, path):
        return self._enforce_enum_const(value, schema, path)

    def _repair_union(self, value, schemas, path):
        return self._fix_union(value, schemas, path)

    def _repair_type_union(self, value, types, schema, path):
        return self._fix_type_union(value, types, schema, path)

    def _fill_missing_required_for_salvage(self, schema, path):
        return self._salvage_required_fill(schema, path)

    def _prepare_schema_for_validation(self, schema):
        out = _shim_items_lists(schema)
        if not isinstance(out, dict):
            raise ValueError("Schema must be an object.")
        return out
