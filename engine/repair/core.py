"""Tolerant JSON repair kernel — parser core.

From-scratch re-implementation of the repair-or-reject contract defined by the
reference library mangiucugna/json_repair v0.61.7 (read-only at
/root/reference).  The *semantics* (which heuristic fires on which malformed
input, and what it produces) follow the reference's conformance corpus; the
code itself is new and organized for use as a per-row kernel inside Ray Data
``map_batches`` stages: one flat parser class, explicit integer cursor, string
context tags, and no per-call allocation beyond the parser itself.

Behavioral contract citations (reference file:line):
  - top-level multi-value / update semantics  json_parser.py:96-155
  - dispatcher                                json_parser.py:176-231
  - object parsing heuristics                 parse_object.py:379-485
  - array parsing                             parse_array.py:41-112
  - number lexing                             parse_number.py:13-38
  - comments                                  parse_comment.py:10-77
  - parenthesized (python tuple) values       parser_parenthesized.py:9-168
"""

from __future__ import annotations

import json as _json

from .common import ARR, KEY, MISSING, QUOTES, VAL, same_shape, strictly_empty
from .strings import scan_string

NUM_CHARS = frozenset("0123456789-.eE/,_")


class RepairParser:
    """Single-document tolerant parser.

    One instance per document; never shared across rows.  ``text`` may be a
    ``str`` or a :class:`engine.repair.filebuf.FileBuffer` (indexable like a
    string).
    """

    __slots__ = (
        "text", "pos", "ctx", "deferred", "logging", "entries", "log",
        "stream_stable", "strict", "try_suffix", "suffix_tried", "fixer",
    )

    def __init__(
        self,
        text,
        *,
        logging: bool = False,
        stream_stable: bool = False,
        strict: bool = False,
        try_suffix: bool = False,
    ) -> None:
        self.text = text
        self.pos = 0
        self.ctx: list[str] = []
        self.deferred: list[str] = []
        self.logging = bool(logging)
        self.entries: list[dict[str, str]] = []
        # note() is hot; bind a no-op when logging is off.
        self.log = self._note if logging else self._no_note
        self.stream_stable = stream_stable
        self.strict = strict
        self.try_suffix = try_suffix
        self.suffix_tried = False
        self.fixer = None  # schema fixer (engine.repair.schema.SchemaFixer)

    # ---------------------------------------------------------------- logging

    def _note(self, text: str) -> None:
        lo = max(self.pos - 10, 0)
        hi = min(self.pos + 10, len(self.text))
        self.entries.append({"text": text, "context": self.text[lo:hi]})

    @staticmethod
    def _no_note(text: str) -> None:
        return None

    # ------------------------------------------------------------ char access

    def char(self, off: int = 0):
        try:
            return self.text[self.pos + off]
        except IndexError:
            return None

    def eat_ws(self) -> None:
        try:
            c = self.text[self.pos]
            while c.isspace():
                self.pos += 1
                c = self.text[self.pos]
        except IndexError:
            pass

    def ws_offset(self, off: int = 0) -> int:
        """Offset (relative to pos) of the first non-whitespace char at/after off."""
        try:
            c = self.text[self.pos + off]
            while c.isspace():
                off += 1
                c = self.text[self.pos + off]
        except IndexError:
            pass
        return off

    def find_unescaped(self, targets, off: int = 0) -> int:
        """Offset of the next target char not preceded by an odd backslash run.

        Returns distance to end-of-text when absent (reference
        json_parser.py:291-318 semantics).
        """
        want = set(targets) if isinstance(targets, (list, tuple, set)) else {targets}
        i = self.pos + off
        n = len(self.text)
        bs = 0
        while i < n:
            c = self.text[i]
            if c == "\\":
                bs += 1
                i += 1
                continue
            if c in want and bs % 2 == 0:
                return i - self.pos
            bs = 0
            i += 1
        return n - self.pos

    # ------------------------------------------------------------- top level

    def run(self):
        return self._top_level(self.value)

    def run_with_schema(self, fixer, schema):
        self.fixer = fixer
        return self._top_level(lambda: self.value(schema, "$"))

    def _top_level(self, produce):
        out = produce()
        if self.pos < len(self.text):
            self.log("The parser returned early, checking if there's more json elements")
            out = [out]
            while self.pos < len(self.text):
                del self.ctx[:]
                del self.deferred[:]
                comma_sep = self._comma_separates_next_value()
                mark = self.pos
                nxt = produce()
                if self.strict and self.pos > mark:
                    self.log("Multiple top-level JSON elements found in strict mode, raising an error")
                    raise ValueError("Multiple top-level JSON elements found in strict mode.")
                if nxt:
                    if not comma_sep and same_shape(out[-1], nxt):
                        # Repeated same-shape value: treat as an update, keep newest.
                        out.pop()
                    elif not out[-1]:
                        out.pop()
                    out.append(nxt)
                else:
                    self.pos += 1
            if len(out) == 1:
                self.log("There were no more elements, returning the element without the array")
                out = out[0]
        return out

    def _comma_separates_next_value(self) -> bool:
        if self.char(self.ws_offset()) == ",":
            return True
        i = self.pos - 1
        while i >= 0 and self.text[i].isspace():
            i -= 1
        return i >= 0 and self.text[i] == ","

    # ------------------------------------------------------------- dispatcher

    def _raw_decode_suffix(self):
        """One-shot strict decode of the remaining input (valid-suffix fast path)."""
        if (
            not self.try_suffix
            or self.suffix_tried
            or self.ctx
            or self.pos == 0
            or not isinstance(self.text, str)
        ):
            return False, ""
        self.suffix_tried = True
        try:
            value, consumed = _json.JSONDecoder().raw_decode(self.text[self.pos:])
        except _json.JSONDecodeError:
            return False, ""
        self.pos += consumed
        return True, value

    def value(self, schema=None, path: str = "$"):
        """Parse the next JSON value (schema-guided when a fixer is attached)."""
        if self.deferred:
            pending, self.deferred = self.deferred, []
            for tag in pending:
                self.ctx.append(tag)
            try:
                return self.value(schema, path)
            finally:
                for _ in pending:
                    self.ctx.pop()

        fixer, schema = self._schema_for_value(schema)

        while True:
            c = self.char()
            if c is None:
                return ""
            if self.try_suffix and (c == "{" or c == "["):
                ok, v = self._raw_decode_suffix()
                if ok:
                    return self._post(v, fixer, schema, path)
            if c == "{":
                self.pos += 1
                v = self.obj(schema, path) if fixer else self.obj()
                return self._post(v, fixer, schema, path)
            if c == "[":
                self.pos += 1
                v = self.arr(schema, path) if fixer else self.arr()
                return self._post(v, fixer, schema, path)
            if c == "(":
                # Top-level '(' is only a value when it doesn't look like prose.
                if self.ctx or self.paren_can_start_value():
                    v = self.paren(schema, path) if fixer else self.paren()
                    return self._post(v, fixer, schema, path)
                self.pos += 1
                continue
            if self.ctx and (c in QUOTES or c.isalpha()):
                return self._post(self.string(), fixer, schema, path)
            if self.ctx and (c.isdigit() or c == "-" or c == "."):
                return self._post(self.num(), fixer, schema, path)
            if c == "#" or c == "/":
                return self._post(self.comment(), fixer, schema, path)
            self.pos += 1

    def _schema_for_value(self, schema):
        fixer = self.fixer if self.fixer is not None and schema not in (None, True) else None
        if fixer is None:
            return None, schema
        schema = fixer.resolve_schema(schema)
        if schema is True:
            return None, schema
        if schema is False:
            raise ValueError("Schema does not allow any values.")
        return fixer, schema

    @staticmethod
    def _post(value, fixer, schema, path):
        if fixer is None:
            return value
        return fixer.fix(value, schema, path)

    # ---------------------------------------------------------------- strings

    def string(self):
        return scan_string(self)

    def literal_token(self):
        """Case-insensitive prefix match of true/false/null; rolls back on miss."""
        c = (self.char() or "").lower()
        word, result = {"t": ("true", True), "f": ("false", False), "n": ("null", None)}[c]
        i = 0
        mark = self.pos
        while c and i < len(word) and c == word[i]:
            i += 1
            self.pos += 1
            c = (self.char() or "").lower()
        if i == len(word):
            return result
        self.pos = mark
        return ""

    def fenced_block(self):
        """At a backtick: if a ```json ... ``` fence wraps a block, parse the payload."""
        if self.text[self.pos:self.pos + 7] == "```json":
            i = self.find_unescaped("`", 7)
            if self.text[self.pos + i:self.pos + i + 3] == "```":
                self.pos += 7
                return self.value()
        return False

    # ---------------------------------------------------------------- numbers

    def num(self):
        buf: list[str] = []
        in_arr = bool(self.ctx) and self.ctx[-1] == ARR
        c = self.char()
        while c and c in NUM_CHARS and not (in_arr and c == ","):
            if c != "_":
                buf.append(c)
            self.pos += 1
            c = self.char()
        s = "".join(buf)
        if (self.char() or "").isalpha():
            # `1notanumber` — this token is really a string.
            self.pos -= len(s)
            return self.string()
        if s and s[-1] in "-eE/,":
            s = s[:-1]
            self.pos -= 1
        try:
            if "," in s:
                return s  # currency-like "105,12" stays textual
            if "." in s or "e" in s or "E" in s:
                return float(s)
            return int(s)
        except ValueError:
            return s  # "1.1.1", "10-20", "1/3" stay textual

    # --------------------------------------------------------------- comments

    def comment(self):
        while True:
            c = self.char()
            stops = ["\n", "\r"]
            if ARR in self.ctx:
                stops.append("]")
            if VAL in self.ctx:
                stops.append("}")
            if KEY in self.ctx:
                stops.append(":")
            if c == "#":
                body = ""
                while c and c not in stops:
                    body += c
                    self.pos += 1
                    c = self.char()
                self.log(f"Found line comment: {body}, ignoring")
            elif c == "/":
                nxt = self.char(1)
                if nxt == "/":
                    body = "//"
                    self.pos += 2
                    c = self.char()
                    while c and c not in ("\n", "\r"):
                        body += c
                        self.pos += 1
                        c = self.char()
                    self.log(f"Found line comment: {body}, ignoring")
                elif nxt == "*":
                    body = "/*"
                    self.pos += 2
                    while True:
                        c = self.char()
                        if not c:
                            self.log("Reached end-of-string while parsing block comment; unclosed block comment.")
                            break
                        body += c
                        self.pos += 1
                        if body.endswith("*/"):
                            break
                    self.log(f"Found block comment: {body}, ignoring")
                else:
                    # A lone '/' is noise; step over it.
                    self.pos += 1
            if not self.ctx:
                # Consume runs of top-level comments iteratively (no recursion per line).
                self.eat_ws()
                if self.char() in ("#", "/"):
                    continue
                return self.value()
            break
        return ""

    # ----------------------------------------------------------------- arrays

    def arr(self, schema=None, path: str = "$", closer: str = "]"):
        fixer, schema, cfg = self._array_schema(schema)
        salvage = fixer is not None and fixer.mode == "salvage"
        out: list = []
        self.ctx.append(ARR)
        try:
            self.eat_ws()
            c = self.char()
            idx = 0
            while c and c != closer and c != "}":
                item_schema, drop = self._item_schema(cfg, idx)
                item_path = f"{path}[{idx}]"
                active = fixer if (fixer is not None and not drop and not salvage) else None

                if c in QUOTES:
                    # A quoted token followed by ':' is a missing object start.
                    i = self.find_unescaped(c, 1)
                    i = self.ws_offset(i + 1)
                    if self.char(i) == ":":
                        if active is not None:
                            v = self.obj(item_schema, item_path)
                            v = active.fix(v, item_schema, item_path)
                        else:
                            v = self.obj()
                    else:
                        v = self.string()
                        if active is not None:
                            v = active.fix(v, item_schema, item_path)
                else:
                    v = self.value(item_schema, item_path) if active is not None else self.value()

                if strictly_empty(v) and self.char() not in (closer, ","):
                    self.pos += 1
                elif v == "..." and self.char(-1) == ".":
                    self.log("While parsing an array, found a stray '...'; ignoring it")
                elif not drop:
                    out.append(v)
                elif fixer is not None:
                    fixer.report("Dropped extra array item not covered by schema", item_path)

                idx += 1
                c = self.char()
                while c and c != closer and (c.isspace() or c == ","):
                    self.pos += 1
                    c = self.char()

            if c != closer:
                self.log(f"While parsing an array we missed the closing {closer}, ignoring it")
            self.pos += 1
        finally:
            self.ctx.pop()
        return out

    def _array_schema(self, schema):
        fixer = self.fixer
        if fixer is None or schema in (None, True):
            return None, schema, None
        schema = fixer.resolve_schema(schema)
        if schema is False:
            raise ValueError("Schema does not allow any values.")
        if schema is True or not fixer.is_array_schema(schema):
            return None, schema, None
        return fixer, schema, (schema.get("items"), schema.get("additionalItems"))

    @staticmethod
    def _item_schema(cfg, idx):
        if cfg is None:
            return None, False
        items, extra = cfg
        if isinstance(items, list):
            if idx < len(items):
                raw = items[idx]
                if raw is not None and not isinstance(raw, (dict, bool)):
                    raise ValueError("Schema must be an object.")
                return raw, False
            if extra is False:
                return None, True
            if isinstance(extra, dict):
                return extra, False
            return True, False
        if isinstance(items, dict):
            return items, False
        return True, False

    # ------------------------------------------------------------ parentheses

    def paren(self, schema=None, path: str = "$"):
        explicit = self.paren_is_tuple()
        self.pos += 1
        items = self.arr(schema, path, closer=")")
        if explicit or len(items) != 1:
            return items
        return items[0]

    def paren_is_tuple(self) -> bool:
        """True when '(' starts an explicit tuple (empty, or with a top-level comma)."""
        i = self.pos + 1
        n = len(self.text)
        depth_p = depth_b = depth_c = 0
        quote = None
        bs = 0
        saw_content = False
        while i < n:
            c = self.text[i]
            if c == "\\":
                bs += 1
                i += 1
                continue
            if quote is not None:
                if c == quote and bs % 2 == 0:
                    quote = None
                bs = 0
                i += 1
                continue
            if c in QUOTES and bs % 2 == 0:
                quote = c
                saw_content = saw_content or (depth_p == 0 and depth_b == 0 and depth_c == 0)
                bs = 0
                i += 1
                continue
            bs = 0
            if not c.isspace() and c not in (",", ")") and depth_p == 0 and depth_b == 0 and depth_c == 0:
                saw_content = True
            if c == "(":
                depth_p += 1
            elif c == ")":
                if depth_p == 0 and depth_b == 0 and depth_c == 0:
                    return not saw_content
                if depth_p > 0:
                    depth_p -= 1
            elif c == "[":
                depth_b += 1
            elif c == "]" and depth_b > 0:
                depth_b -= 1
            elif c == "{":
                depth_c += 1
            elif c == "}" and depth_c > 0:
                depth_c -= 1
            elif c == "," and depth_p == 0 and depth_b == 0 and depth_c == 0:
                return True
            i += 1
        return not saw_content

    def paren_can_start_value(self) -> bool:
        """Gate for top-level '(': standalone value, not inline prose."""
        i = self.pos - 1
        while i >= 0:
            c = self.text[i]
            if c in "\n\r":
                break
            if not c.isspace():
                return False
            i -= 1

        off = self.ws_offset(1)
        first = self.char(off)
        if first is None:
            return False
        if (
            first not in (")", "{", "[", "(") + QUOTES
            and not first.isdigit()
            and first not in ("-", ".")
            and self.text[self.pos + off:self.pos + off + 4] not in ("true", "null")
            and self.text[self.pos + off:self.pos + off + 5] != "false"
        ):
            return False

        i = self.pos + 1
        n = len(self.text)
        depth_p = depth_b = depth_c = 0
        quote = None
        bs = 0
        while i < n:
            c = self.text[i]
            if c == "\\":
                bs += 1
                i += 1
                continue
            if quote is not None:
                if c == quote and bs % 2 == 0:
                    quote = None
                bs = 0
                i += 1
                continue
            if c in QUOTES and bs % 2 == 0:
                quote = c
                bs = 0
                i += 1
                continue
            bs = 0
            if c == "(":
                depth_p += 1
            elif c == ")":
                if depth_p == 0 and depth_b == 0 and depth_c == 0:
                    i += 1
                    while i < n:
                        t = self.text[i]
                        if t in "\n\r":
                            return True
                        if not t.isspace():
                            return False
                        i += 1
                    return True
                depth_p -= 1
            elif c == "[":
                depth_b += 1
            elif c == "]" and depth_b > 0:
                depth_b -= 1
            elif c == "{":
                depth_c += 1
            elif c == "}" and depth_c > 0:
                depth_c -= 1
            i += 1
        return True

    # ---------------------------------------------------------------- objects

    def obj(self, schema=None, path: str = "$"):
        out: dict = {}
        start = self.pos
        inside_value = bool(self.ctx) and self.ctx[-1] == VAL
        fixer, schema, cfg = self._object_schema(schema)

        while (self.char() or "}") != "}":
            self.eat_ws()

            if self.char() == ":":
                self.log("While parsing an object we found a : before a key, ignoring")
                self.pos += 1

            key, rollback = self._member_key(out)

            if ARR in self.ctx and key in out:
                if self.strict:
                    self.log("Duplicate key found in strict mode while parsing object, raising an error")
                    raise ValueError("Duplicate key found in strict mode while parsing object.")
                if not inside_value:
                    if self._duplicate_needs_split(rollback):
                        self.log(
                            "While parsing an object we found a duplicate key, closing the object here and rolling back the index",
                        )
                        # Rewrite input in place: open a new object before the key.
                        self.pos = rollback - 1
                        self.text = self.text[:self.pos + 1] + "{" + self.text[self.pos + 1:]
                        break
                    self.log(
                        "While parsing an object we found a duplicate key with a normal comma separator, keeping duplicate-key overwrite behavior",
                    )

            self.eat_ws()
            if (self.char() or "}") == "}":
                continue

            self.eat_ws()
            if self.char() != ":":
                if self.strict:
                    self.log("Missing ':' after key in strict mode while parsing object, raising an error")
                    raise ValueError("Missing ':' after key in strict mode while parsing object.")
                self.log("While parsing an object we missed a : after a key")

            self.pos += 1

            prop_schema, extra_schemas, drop = self._member_schema(fixer, cfg, key)
            key_path = f"{path}.{key}"
            value = self._member_value(fixer, prop_schema, key_path)
            if fixer is not None:
                for es in extra_schemas:
                    value = fixer.fix(value, es, key_path)

            if fixer is None and value == "" and self.strict and self.char(-1) not in QUOTES:
                self.log("Parsed value is empty in strict mode while parsing object, raising an error")
                raise ValueError("Parsed value is empty in strict mode while parsing object.")

            if fixer is None or not drop:
                out[key] = value
            else:
                fixer.report("Dropped extra property not covered by schema", key_path)

            if self.char() in (",", "'", '"'):
                self.pos += 1
            if self.char() == "]" and ARR in self.ctx:
                self.log(
                    "While parsing an object we found a closing array bracket, closing the object here and rolling back the index"
                )
                self.pos -= 1
                break
            self.eat_ws()

        self.pos += 1

        handled, replacement = self._rescue_empty_object(out, start, schema, path, fixer)
        if handled:
            return replacement

        return self._close_object(out, schema, path, fixer, cfg)

    def _object_schema(self, schema):
        fixer = self.fixer
        if fixer is None or schema in (None, True):
            return None, schema, None
        schema = fixer.resolve_schema(schema)
        if schema is False:
            raise ValueError("Schema does not allow any values.")
        if schema is True or not fixer.is_object_schema(schema):
            return None, schema, None
        props = schema.get("properties", {})
        if not isinstance(props, dict):
            props = {}
        patterns = schema.get("patternProperties", {})
        if not isinstance(patterns, dict):
            patterns = {}
        cfg = (props, patterns, schema.get("additionalProperties"), set(schema.get("required", [])))
        return fixer, schema, cfg

    def _member_key(self, out: dict):
        key = ""
        rollback = self.pos
        self.ctx.append(KEY)
        try:
            while self.char():
                rollback = self.pos
                if self.char() == "[" and key == "" and self._merge_trailing_arrays(out):
                    continue
                key = self.string()
                if key == "":
                    self.eat_ws()
                if key != "" or (key == "" and self.char() in (":", "}")):
                    if key == "" and self.strict:
                        self.log("Empty key found in strict mode while parsing object, raising an error")
                        raise ValueError("Empty key found in strict mode while parsing object.")
                    break
        finally:
            self.ctx.pop()
        return key, rollback

    def _duplicate_needs_split(self, rollback: int) -> bool:
        back = rollback - self.pos - 1
        prev = self.char(back)
        while prev and prev.isspace():
            back -= 1
            prev = self.char(back)
        key_start = self.char(rollback - self.pos)
        nxt = self.char(self.ws_offset())
        return not (key_start in QUOTES and prev == "," and nxt == ":")

    def _merge_trailing_arrays(self, out: dict) -> bool:
        """`"k": [..], [..]` — fold stray arrays into the previous list value."""
        prev_key = next(reversed(out)) if out else None
        if not prev_key or not isinstance(out[prev_key], list) or self.strict:
            return False

        self.pos += 1
        more = self.arr()
        if isinstance(more, list):
            prev = out[prev_key]
            row_lens = [len(x) for x in prev if isinstance(x, list)]
            row_len = row_lens[0] if row_lens and all(n == row_lens[0] for n in row_lens) else None
            if row_len:
                loose = []
                while prev and not isinstance(prev[-1], list):
                    loose.append(prev.pop())
                if loose:
                    loose.reverse()
                    if len(loose) % row_len == 0:
                        self.log(
                            "While parsing an object we found row values without an inner array, grouping them into rows",
                        )
                        for i in range(0, len(loose), row_len):
                            prev.append(loose[i:i + row_len])
                    else:
                        prev.extend(loose)
                if more:
                    if all(isinstance(x, list) for x in more):
                        self.log(
                            "While parsing an object we found additional rows, appending them without flattening",
                        )
                        prev.extend(more)
                    else:
                        prev.append(more)
            else:
                prev.extend(more[0] if len(more) == 1 and isinstance(more[0], list) else more)

        self.eat_ws()
        if self.char() == ",":
            self.pos += 1
        self.eat_ws()
        return True

    def _member_schema(self, fixer, cfg, key: str):
        if fixer is None or cfg is None:
            return None, [], False
        props, patterns, extra_props, _required = cfg
        if key in props:
            sv = props[key]
            if sv is not None and not isinstance(sv, (dict, bool)):
                raise ValueError("Schema must be an object.")
            return sv, [], False
        matched: list = []
        unsupported: list[str] = []
        if patterns:
            matched, unsupported = fixer.match_patterns(patterns, key)
        for pattern in unsupported:
            self.log(f"Skipped unsupported patternProperties regex '{pattern}' while parsing object key '{key}'")
        if matched:
            for m in matched:
                if m is not None and not isinstance(m, (dict, bool)):
                    raise ValueError("Schema must be an object.")
            return matched[0], matched[1:], False
        if extra_props is False:
            return None, [], True
        if isinstance(extra_props, dict):
            return extra_props, [], False
        return True, [], False

    def _member_value(self, fixer, prop_schema, key_path: str):
        self.ctx.append(VAL)
        try:
            self.eat_ws()
            c = self.char()
            if c in (",", "}"):
                self.log(f"While parsing an object value we found a stray {c}, ignoring it")
                if fixer is not None:
                    return fixer.fix(MISSING, prop_schema, key_path)
                return ""
            if fixer is not None:
                return self.value(prop_schema, key_path)
            return self.value()
        finally:
            self.ctx.pop()

    # -- empty-object rescue ------------------------------------------------

    def _rescue_empty_object(self, out, start, schema, path, fixer):
        if out or self.pos - start <= 2:
            return False, None

        if self.strict:
            self.log("Parsed object is empty but contains extra characters in strict mode, raising an error")
            raise ValueError("Parsed object is empty but contains extra characters in strict mode.")

        kind, normalized = self._classify_failed_object(start, schema, fixer)
        if kind == "object" and normalized is not None:
            end = self.pos + 1
            self.text = self.text[:start - 1] + normalized + self.text[end:]
            self.pos = start
            self.ctx.append(KEY)
            try:
                fixed = self.obj(schema, path)
            finally:
                self.ctx.pop()
            self.deferred.append(KEY)
            return True, fixed
        if kind == "schema_set_object":
            self.log(
                "Parsed object is empty but salvage schema expects an object, reparsing set-like members as null-valued object keys",
            )
            self.pos = start
            self.ctx.append(KEY)
            try:
                items = self.arr()
            finally:
                self.ctx.pop()
            self.deferred.append(KEY)
            if isinstance(items, list):
                names = [x for x in items if isinstance(x, str) and x]
                if len(names) == len(items):
                    return True, dict.fromkeys(names)
            return True, items
        if kind == "array":
            self.log("Parsed object is empty, we will try to parse this as an array instead")
            self.pos = start
            self.ctx.append(KEY)
            try:
                items = self.arr()
            finally:
                self.ctx.pop()
            self.deferred.append(KEY)
            return True, items
        return False, None

    def _classify_failed_object(self, start, schema, fixer):
        snippet = self.text[start - 1:self.pos + 1]
        body = snippet[1:]
        if body.endswith("}"):
            body = body[:-1]
        body = body.lstrip()
        if not body:
            return "keep", None
        if (body.startswith('\\"') and '\\":' in body) or (body.startswith("\\'") and "\\':" in body):
            normalized = snippet.replace('\\"', '"').replace("\\'", "'")
            self.log(
                "Parsed object is empty but the input starts like an escaped object key, normalizing and reparsing it as an object",
            )
            return "object", normalized
        body = _strip_comment_spans(body).lstrip()
        if not body:
            return "keep", None

        quote = None
        bs = 0
        for c in body:
            if c == "\\":
                bs += 1
                continue
            if quote is not None:
                if c == quote and bs % 2 == 0:
                    quote = None
            elif c in QUOTES and bs % 2 == 0:
                quote = c
            elif c == ":" and bs % 2 == 0:
                self.log(
                    "Parsed object is empty but the input still contains an object-style separator, keeping object repair",
                )
                return "keep", None
            bs = 0
        if (
            fixer is not None
            and fixer.mode == "salvage"
            and isinstance(schema, dict)
            and fixer.is_object_schema(schema)
            and not fixer.is_array_schema(schema)
        ):
            return "schema_set_object", None
        return "array", None

    def _close_object(self, out, schema, path, fixer, cfg):
        if self.ctx:
            if self.char() == "}" and self.ctx[-1] not in (KEY, VAL):
                self.log("Found an extra closing brace that shouldn't be there, skipping it")
                self.pos += 1
            return out

        self.eat_ws()
        if self.char() == ",":
            self.pos += 1
            self.eat_ws()
            if self.char() in QUOTES and not self.strict:
                self.log(
                    "Found a comma and string delimiter after object closing brace, checking for additional key-value pairs",
                )
                more = self.obj(schema, path)
                if isinstance(more, dict):
                    out.update(more)

        if fixer is not None and cfg is not None:
            props, _patterns, _extra, required = cfg
            missing = [k for k in required if k not in out]
            if missing and fixer.mode != "salvage":
                raise ValueError(f"Missing required properties at {path}: {', '.join(missing)}")
            for k, ps in props.items():
                if k in out or k in required:
                    continue
                if isinstance(ps, dict) and "default" in ps:
                    out[k] = fixer.copy_value(ps["default"], f"{path}.{k}", "default")
                    fixer.report("Inserted default value for missing property", f"{path}.{k}")
        return out


def _strip_comment_spans(body: str) -> str:
    """Remove #, // and /* */ comment spans outside quoted regions."""
    kept: list[str] = []
    quote = None
    bs = 0
    i = 0
    n = len(body)
    while i < n:
        c = body[i]
        nxt = body[i + 1] if i + 1 < n else ""
        if c == "\\":
            bs += 1
            kept.append(c)
            i += 1
            continue
        if quote is not None:
            kept.append(c)
            if c == quote and bs % 2 == 0:
                quote = None
            bs = 0
            i += 1
            continue
        if c in QUOTES and bs % 2 == 0:
            quote = c
            kept.append(c)
            bs = 0
            i += 1
            continue
        bs = 0
        if c == "#" or (c == "/" and nxt == "/"):
            i += 2 if c == "/" else 1
            while i < n and body[i] not in ("\n", "\r"):
                i += 1
            continue
        if c == "/" and nxt == "*":
            i += 2
            while i < n - 1 and body[i:i + 2] != "*/":
                i += 1
            i = min(i + 2, n)
            continue
        kept.append(c)
        i += 1
    return "".join(kept)
