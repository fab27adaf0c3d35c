"""Adapter: reference ``JSONParser`` API over our ``RepairParser``."""

from __future__ import annotations

from engine.repair.core import RepairParser as _Core
from engine.repair.filebuf import FileBuffer

from .utils.json_context import ContextValues, JsonContextView


class JSONParser(_Core):
    # RepairParser uses __slots__; allow arbitrary test attributes here.
    __slots__ = ("__dict__",)

    def __init__(
        self,
        json_str,
        json_fd=None,
        logging=False,
        json_fd_chunk_length: int = 0,
        stream_stable: bool = False,
        strict: bool = False,
        try_valid_json_suffix: bool = False,
        try_suffix: bool | None = None,
    ) -> None:
        if json_fd is not None:
            json_str = FileBuffer(json_fd, json_fd_chunk_length)
        super().__init__(
            json_str,
            logging=bool(logging),
            stream_stable=stream_stable,
            strict=strict,
            try_suffix=try_valid_json_suffix if try_suffix is None else try_suffix,
        )

    # ---- reference-name surface -------------------------------------------

    @property
    def json_str(self):
        return self.text

    @json_str.setter
    def json_str(self, value):
        self.text = value

    @property
    def index(self):
        return self.pos

    @index.setter
    def index(self, value):
        self.pos = value

    @property
    def context(self):
        return JsonContextView(self)

    @property
    def logger(self):
        return self.entries

    @logger.setter
    def logger(self, value):
        self.entries = value

    def parse(self):
        return self.run()

    def parse_with_schema(self, repairer, schema):
        return self.run_with_schema(repairer, schema)

    def parse_json(self, schema=None, path="$"):
        return self.value(schema, path)

    def parse_object(self, schema=None, path="$"):
        return self.obj(schema, path)

    def parse_array(self, schema=None, path="$", closing_delimiter="]"):
        return self.arr(schema, path, closing_delimiter)

    def parse_string(self):
        return self.string()

    def parse_number(self):
        return self.num()

    def parse_comment(self):
        return self.comment()

    def parse_parenthesized(self, schema=None, path="$"):
        return self.paren(schema, path)

    def get_char_at(self, count: int = 0):
        return self.char(count)

    def skip_whitespaces(self):
        return self.eat_ws()

    def scroll_whitespaces(self, idx: int = 0):
        return self.ws_offset(idx)

    def skip_to_character(self, character, idx: int = 0):
        return _Core.find_unescaped(self, character, idx)

    # Route internals through skip_to_character so counting subclasses see calls.
    def find_unescaped(self, targets, off: int = 0):
        return self.skip_to_character(targets, off)

    def parenthesized_is_explicit_tuple(self):
        return self.paren_is_tuple()

    def top_level_parenthesized_can_start_value(self):
        return self.paren_can_start_value()

    def _next_top_level_value_is_comma_separated(self):
        return self._comma_separates_next_value()

    def _try_parse_valid_json_value(self):
        return _Core._raw_decode_suffix(self)

    # Core calls _raw_decode_suffix; route it through the reference-named hook
    # so reference tests can monkeypatch/track it.
    def _raw_decode_suffix(self):
        return self._try_parse_valid_json_value()

    @property
    def schema_repairer(self):
        return self.fixer

    @schema_repairer.setter
    def schema_repairer(self, value):
        self.fixer = value
