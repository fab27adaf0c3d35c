"""Tolerant string scanning — the heuristic heart of the repair kernel.

From-scratch re-implementation of the reference's string disambiguation rules
(mangiucugna/json_repair ``parse_string.py`` 925 LoC +
``parse_string_helpers/``).  Every rule here answers one question: when the
scanner meets a quote / comma / brace inside an (often unterminated) string,
does that character *end* the string or *belong* to it?  The answers are pinned
by the reference conformance corpus (see tests/corpus/).

Behavioral contract citations (reference file:line):
  - simple-quoted fast path            parse_string.py:56-103
  - entry + doubled-quote logic        parse_string.py:185-271
  - escape normalization               parse_string.py:274-332
  - code-fence boundary checks         parse_string.py:335-399,803-821
  - inline-container balancing         parse_string.py:402-460
  - comment-prefixed member probes     parse_string.py:463-532
  - right-delimiter disambiguation     parse_string.py:535-656
  - body scan loop                     parse_string.py:659-878
  - finalize                           parse_string.py:881-907
  - comma classification               parse_string_helpers/object_value_context.py:38-94
  - lookahead memoization              parse_string.py:157-182
"""

from __future__ import annotations

from .common import ARR, KEY, QUOTES, VAL

SENTINEL = object()          # "no direct result, scan the body"
OPENER_TO_CLOSER = {"[": "]", "{": "}", "(": ")"}
OPENERS = ("[", "{", "(")
LOW_SPAN = "\0"              # marks an open „...” smart-quote span


class Scan:
    """Mutable per-string scan state."""

    __slots__ = (
        "missing_quotes", "doubled", "lq", "rq", "acc", "unmatched",
        "pend_container", "container_stack", "no_future_delim", "cache",
        "open_braces", "charclass_start",
    )

    def __init__(self) -> None:
        self.missing_quotes = False
        self.doubled = False
        self.lq = '"'
        self.rq = '"'
        self.acc = ""
        self.unmatched = False
        self.pend_container = False
        self.container_stack: list[str] = []
        self.no_future_delim = False
        self.cache: dict[tuple, tuple] = {}
        self.open_braces = 0
        self.charclass_start: int | None = None


def _outer(st: Scan) -> str:
    return st.rq[0]


def _in_low_span(st: Scan) -> bool:
    return st.rq[-1] == LOW_SPAN


def _append(st: Scan, content: str) -> None:
    base = len(st.acc)
    st.acc += content
    for k, c in enumerate(content):
        if c == "{":
            st.open_braces += 1
        elif c == "}" and st.open_braces:
            st.open_braces -= 1
        elif c == "[":
            st.charclass_start = base + k + 1
        elif c == "]":
            st.charclass_start = None


def _append_one(p, st: Scan, c: str):
    _append(st, c)
    p.pos += 1
    return p.char()


def _recount_braces(st: Scan) -> None:
    st.open_braces = 0
    st.charclass_start = None
    for k, c in enumerate(st.acc):
        if c == "{":
            st.open_braces += 1
        elif c == "}" and st.open_braces:
            st.open_braces -= 1
        elif c == "[":
            st.charclass_start = k + 1
        elif c == "]":
            st.charclass_start = None


def _quote_in_charclass(p, st: Scan) -> bool:
    """Is the current quote inside a compact regex ``[...]`` character class?"""
    start = st.charclass_start
    if start is None or any(c.isspace() for c in st.acc[start:]):
        return False
    off = p.find_unescaped("]", 1)
    return p.char(off) == "]"


def _cached_find(p, st: Scan, targets, off: int = 0) -> int:
    """find_unescaped with memoized misses so adversarial inputs scan once."""
    key = (targets,) if isinstance(targets, str) else tuple(targets)
    start = p.pos + off
    hit = st.cache.get(key)
    if hit is not None:
        hit_start, hit_match = hit
        if hit_match is None and start >= hit_start:
            return len(p.text) - p.pos
        if hit_match is not None and hit_start <= start <= hit_match:
            return hit_match - p.pos
    found = p.find_unescaped(targets, off)
    if not p.char(found):
        st.cache[key] = (start, None)
        return found
    match_abs = p.pos + found
    if match_abs == 0 or p.text[match_abs - 1] != "\\":
        st.cache[key] = (start, match_abs)
    return found


# --------------------------------------------------------------------- entry

def _simple_quoted(p):
    """Zero-heuristic path for `"..."` with a clean follower.  None = not simple."""
    if p.char() != '"':
        return None
    start = p.pos + 1
    text = p.text
    if isinstance(text, str):
        end = text.find('"', start)
        if end == -1:
            return None
        value = text[start:end]
        if "\\" in value or "\n" in value or "\r" in value:
            return None
    else:
        end = start
        limit = len(text)
        while end < limit:
            c = text[end]
            if c == '"':
                break
            if c in ("\\", "\n", "\r"):
                return None
            end += 1
        if end >= limit:
            return None
        value = text[start:end]

    nxt = end + 1
    limit = len(text)
    while nxt < limit and text[nxt].isspace():
        nxt += 1
    follower = text[nxt] if nxt < limit else None

    top = p.ctx[-1] if p.ctx else None
    if top == KEY:
        if follower != ":":
            return None
    elif top == VAL:
        if follower not in (",", "}", None):
            return None
    elif top == ARR:
        if follower not in (",", "]", None):
            return None
    elif follower is not None:
        return None

    p.pos = end + 1
    return value


def _entry(p):
    """Position on the string start; classify delimiters; handle degenerate cases.

    Returns (state, direct_result): when direct_result is not SENTINEL the
    string is fully handled.
    """
    c = p.char()
    if c in ("#", "/"):
        return None, p.comment()

    while c and c not in QUOTES and not c.isalnum():
        p.pos += 1
        c = p.char()

    if not c:
        return None, ""

    fast = _simple_quoted(p)
    if fast is not None:
        return None, fast

    st = Scan()
    top = p.ctx[-1] if p.ctx else None

    if c == "'":
        st.lq = st.rq = "'"
    elif c == "“":
        st.lq = "“"
        st.rq = "”"
    elif c.isalnum():
        if c.lower() in ("t", "f", "n") and top != KEY:
            value = p.literal_token()
            if value != "":
                return st, value
        p.log("While parsing a string, we found a literal instead of a quote")
        st.missing_quotes = True

    if not st.missing_quotes:
        p.pos += 1

    if p.char() == "`":
        block = p.fenced_block()
        if block is not False:
            return st, block
        p.log(
            "While parsing a string, we found code fences but they did not enclose valid JSON, continuing parsing the string",
        )

    if p.char() == st.lq:
        # A second quote right away: empty string, doubled quotes, or a typo.
        if (
            (top == KEY and p.char(1) == ":")
            or (top == VAL and p.char(1) in (",", "}"))
            or (top == ARR and p.char(1) in (",", "]"))
        ):
            p.pos += 1
            return st, ""
        if p.char(1) == st.lq:
            p.log("While parsing a string, we found a doubled quote and then a quote again, ignoring it")
            if p.strict:
                raise ValueError("Found doubled quotes followed by another quote.")
            return st, ""
        i = p.find_unescaped(st.rq, 1)
        if p.char(i + 1) == st.rq:
            p.log("While parsing a string, we found a valid starting doubled quote")
            st.doubled = True
            p.pos += 1
        else:
            i = p.ws_offset(1)
            follower = p.char(i)
            if follower in QUOTES + ("{", "["):
                p.log(
                    "While parsing a string, we found a doubled quote but also another quote afterwards, ignoring it",
                )
                if p.strict:
                    raise ValueError("Found doubled quotes followed by another quote while parsing a string.")
                p.pos += 1
                return st, ""
            if follower not in (",", "]", "}"):
                p.log("While parsing a string, we found a doubled quote but it was a mistake, removing one quote")
                p.pos += 1

    return st, SENTINEL


# ------------------------------------------------------------------- escapes

def _normalize_escape(p, st: Scan, c: str):
    """Resolve a backslash escape just appended to the accumulator.

    Returns (handled, next_char).
    """
    p.log("Found a stray escape sequence, normalizing it")
    active = st.rq[-1]
    if _in_low_span(st) and c == '"':
        st.acc = st.acc[:-1] + c
        _recount_braces(st)
        st.rq = st.rq[:-1]
        p.pos += 1
        return True, p.char()
    if c == "\\":
        run_start = p.pos - 1
        run_end = p.pos + 1
        while run_end < len(p.text) and p.text[run_end] == "\\":
            run_end += 1
        run_len = run_end - run_start
        after = p.char(run_end - p.pos)
        if run_len % 2 == 0 and after != active:
            st.acc = st.acc[:-1] + ("\\" * (run_len // 2))
            _recount_braces(st)
            p.pos = run_end
            return True, p.char()
    if c in (active, "t", "n", "r", "b", "\\"):
        st.acc = st.acc[:-1]
        st.acc += {"t": "\t", "n": "\n", "r": "\r", "b": "\b"}.get(c, c)
        _recount_braces(st)
        p.pos += 1
        nxt = p.char()
        while nxt and st.acc and st.acc[-1] == "\\" and nxt in (active, "\\"):
            st.acc = st.acc[:-1] + nxt
            _recount_braces(st)
            p.pos += 1
            nxt = p.char()
        return True, nxt
    if c in ("u", "x"):
        width = 4 if c == "u" else 2
        digits = p.text[p.pos + 1:p.pos + 1 + width]
        if len(digits) == width and all(d in "0123456789abcdefABCDEF" for d in digits):
            p.log("Found a unicode escape sequence, normalizing it")
            st.acc = st.acc[:-1] + chr(int(digits, 16))
            _recount_braces(st)
            p.pos += 1 + width
            return True, p.char()
    elif c == "„" or (c in QUOTES and c != active):
        p.log("Found a delimiter that was escaped but shouldn't be escaped, removing the escape")
        st.acc = st.acc[:-1] + c
        _recount_braces(st)
        p.pos += 1
        return True, p.char()
    return False, c


# ----------------------------------------------------- member-boundary probes

def _bare_key_then_colon(p, off: int) -> bool:
    c = p.char(off)
    if not c or not (c.isalnum() or c == "_"):
        return False
    while True:
        c = p.char(off)
        if not c or not (c.isalnum() or c in ("_", "-")):
            break
        off += 1
    off = p.ws_offset(off)
    return p.char(off) == ":"


def _skip_comment_prefix(p, off: int) -> int:
    off = p.ws_offset(off)
    while True:
        c = p.char(off)
        if c == "#":
            while c and c not in ("\n", "\r"):
                off += 1
                c = p.char(off)
            off = p.ws_offset(off)
            continue
        if c == "/":
            nxt = p.char(off + 1)
            if nxt == "/":
                off += 2
                c = p.char(off)
                while c and c not in ("\n", "\r"):
                    off += 1
                    c = p.char(off)
                off = p.ws_offset(off)
                continue
            if nxt == "*":
                off += 2
                while True:
                    c = p.char(off)
                    if not c:
                        return off
                    if c == "*" and p.char(off + 1) == "/":
                        off += 2
                        break
                    off += 1
                off = p.ws_offset(off)
                continue
        return off


def _closing_quote_for(q: str) -> str:
    return "”" if q == "“" else q


def _member_starts_at(p, off: int) -> bool:
    c = p.char(off)
    if c in ("}", None):
        return False
    if c in QUOTES:
        closer = _closing_quote_for(c)
        end = p.find_unescaped(closer, off + 1)
        if p.char(end) != closer:
            return False
        after = p.ws_offset(end + 1)
        return p.char(after) == ":"
    if c and (c.isalnum() or c == "_"):
        return _bare_key_then_colon(p, off)
    return False


def _member_follows_quote(p, quote_off: int) -> bool:
    comma = p.ws_offset(quote_off + 1)
    if p.char(comma) != ",":
        return False
    return _member_starts_at(p, _skip_comment_prefix(p, comma + 1))


def _post_fence_container_is_member(p, end_off: int) -> bool:
    after = p.ws_offset(end_off)
    c = p.char(after)
    if c in ("}", None):
        return True
    if c != ",":
        return False
    nxt = _skip_comment_prefix(p, after + 1)
    return p.char(nxt) in ("}", None) or _member_starts_at(p, nxt)


def _nested_container_opens(p, off: int) -> bool:
    """Does the opener at ``off`` start a real nested container (vs prose)?"""
    opener = p.char(off)
    back = off - 1
    while back >= 0:
        prev = p.char(back)
        if prev is None:
            return True
        if not prev.isspace():
            if prev in OPENERS:
                return True
            if prev not in (",", ":"):
                return False
            nxt_off = p.ws_offset(off + 1)
            nxt = p.char(nxt_off)
            if opener in ("[", "("):
                return nxt in ("]", ")", "-", "t", "f", "n") + QUOTES + OPENERS or (
                    nxt is not None and nxt.isdigit()
                )
            if opener != "{":
                return False
            if nxt in ("}",) + QUOTES:
                return True
            return prev == ":" and _bare_key_then_colon(p, nxt_off)
        back -= 1
    return True


def _skip_container(p, off: int):
    """Offset just past a balanced inline container, or None if unbalanced."""
    opener = p.char(off)
    if opener not in OPENER_TO_CLOSER:
        return off
    stack = [OPENER_TO_CLOSER[opener]]
    i = off + 1
    while stack:
        c = p.char(i)
        if not c:
            return None
        if c in QUOTES:
            closer = _closing_quote_for(c)
            i = p.find_unescaped(closer, i + 1)
            if p.char(i) != closer:
                return None
        elif c in OPENER_TO_CLOSER and _nested_container_opens(p, i):
            stack.append(OPENER_TO_CLOSER[c])
        elif c == stack[-1]:
            stack.pop()
            if not stack:
                return i + 1
        i += 1
    return None


def _fence_is_literal(p, st: Scan, fence_off: int) -> bool:
    """`}` then ``` — wrapper fence closing the object, or literal snippet?"""
    search_off = fence_off + 3
    content_off = _skip_comment_prefix(p, search_off)
    keep_container = False
    if p.char(content_off) in OPENERS:
        end = _skip_container(p, content_off)
        if end is not None:
            if _post_fence_container_is_member(p, end):
                return False
            keep_container = True
            search_off = end

    outer = _outer(st)
    q = p.find_unescaped(outer, search_off)
    while p.char(q) == outer:
        after = p.ws_offset(q + 1)
        after_c = p.char(after)
        if after_c in (",", "}", "]", None):
            if keep_container:
                st.pend_container = True
            return True
        q = p.find_unescaped(outer, q + 1)
    return False


# ------------------------------------------------- object-value comma triage

def _bare_value_recoverable(p, value_off: int, find) -> bool:
    start = p.ws_offset(value_off)
    c = p.char(start)
    if c in QUOTES + ("{", "[", "-"):
        return True
    if c and c.isdigit():
        return True
    for word in ("true", "false", "null"):
        if all(p.char(start + k) == w for k, w in enumerate(word)):
            boundary = p.char(start + len(word))
            if boundary is None or boundary.isspace() or boundary in (",", "}", "]"):
                return True
    # An unquoted value only marks a safe member boundary when its object
    # closes before the string could close again.
    end = find(list(QUOTES) + ["}"], start)
    return p.char(end) == "}"


def _classify_value_comma(p, find) -> str:
    """At a ',' inside an unterminated object value: member / string / container."""
    off = p.ws_offset(1)
    c = p.char(off)
    if c in ("}", None):
        return "member"

    if c in QUOTES:
        key_end = p.find_unescaped(c, off + 1)
        if not p.char(key_end):
            return "string"
        key_end = p.ws_offset(key_end + 1)
        return "member" if p.char(key_end) == ":" else "string"

    if c == "`":
        k = off + 1
        while True:
            kc = p.char(k)
            if not kc or not (kc.isalnum() or kc in ("_", "-")):
                break
            k += 1
        k = p.ws_offset(k)
        return "member" if p.char(k) == ":" else "string"

    if c and (c.isalnum() or c == "_"):
        k = off
        while True:
            kc = p.char(k)
            if not kc or not (kc.isalnum() or kc in ("_", "-")):
                break
            k += 1
        k = p.ws_offset(k)
        if p.char(k) == ":" and _bare_value_recoverable(p, k + 1, find):
            return "member"

    if c in ("{", "["):
        return "container"

    special_off = find(list(QUOTES) + ["{", "["], off)
    special = p.char(special_off)
    if not special:
        return "string_no_future_delimiter"
    if special in ("{", "["):
        return "string"

    key_end = find(special, special_off + 1)
    if not p.char(key_end):
        return "string"
    key_end = p.ws_offset(key_end + 1)
    return "member" if p.char(key_end) == ":" else "string"


def _track_container(c: str, pending: bool, stack: list[str]):
    """Update the literal inline-container stack.  Returns (pending, keep_char)."""
    if c in ("{", "["):
        if pending:
            stack.append(c)
            return False, False
        if stack:
            stack.append(c)
    if stack and ((c == "}" and stack[-1] == "{") or (c == "]" and stack[-1] == "[")):
        stack.pop()
        return pending, True
    return pending, False


# --------------------------------------------- right-delimiter disambiguation

def _close_candidate(p, st: Scan, c: str):
    """The scanner sits on a quote matching the string's delimiter.  Decide:
    terminator, or literal quote inside the string.

    Returns (handled, next_char, should_break).
    """
    outer = _outer(st)

    if st.doubled and p.char(1) == outer:
        p.log("While parsing a string, we found a doubled quote, ignoring it")
        p.pos += 1
        return True, c, False

    if st.missing_quotes and p.ctx and p.ctx[-1] == VAL:
        i = 1
        nxt = p.char(i)
        while nxt and nxt not in (outer, st.lq):
            i += 1
            nxt = p.char(i)
        if nxt:
            i += 1
            i = p.ws_offset(i)
            if p.char(i) == ":":
                p.pos -= 1
                p.log(
                    "In a string with missing quotes and object value context, I found a delimeter but it turns out it was the beginning on the next key. Stopping here.",
                )
                return False, p.char(), True
        return False, c, False

    if st.unmatched:
        st.unmatched = False
        return True, _append_one(p, st, c), False

    i = 1
    nxt = p.char(i)
    check_comma = True
    while nxt and nxt not in (outer, st.lq):
        if check_comma and nxt.isalpha():
            check_comma = False
        if (
            (KEY in p.ctx and nxt in (":", "}"))
            or (VAL in p.ctx and nxt == "}")
            or (ARR in p.ctx and nxt in ("]", ","))
            or (check_comma and p.ctx and p.ctx[-1] == VAL and nxt == ",")
        ):
            break
        i += 1
        nxt = p.char(i)

    if nxt == "," and p.ctx and p.ctx[-1] == VAL:
        i += 1
        i = p.find_unescaped(outer, i)
        i += 1
        i = p.ws_offset(i)
        nxt = p.char(i)
        if nxt in ("}", ","):
            p.log(
                "While parsing a string, we found a misplaced quote that would have closed the string but has a different meaning here, ignoring it",
            )
            return True, _append_one(p, st, c), False
    elif nxt == outer and p.char(i - 1) != "\\":
        top = p.ctx[-1] if p.ctx else None
        if _only_ws_before(p, i) and not (top == VAL and _member_follows_quote(p, i)):
            return False, c, True
        if top == VAL:
            if _member_follows_quote(p, i):
                p.log(
                    "While parsing a string, we found a misplaced quote that would have closed the string but has a different meaning here, ignoring it",
                )
                return True, _append_one(p, st, c), False
            i = p.find_unescaped(outer, i + 1)
            i += 1
            nxt = p.char(i)
            while nxt and nxt != ":":
                if nxt in (",", "]", "}") or (nxt == outer and p.char(i - 1) != "\\"):
                    break
                i += 1
                nxt = p.char(i)
            if nxt != ":":
                p.log(
                    "While parsing a string, we found a misplaced quote that would have closed the string but has a different meaning here, ignoring it",
                )
                st.unmatched = not st.unmatched
                return True, _append_one(p, st, c), False
        elif top == ARR:
            even = nxt == outer
            while nxt == outer:
                i = p.find_unescaped([outer, "]"], i + 1)
                nxt = p.char(i)
                if nxt != outer:
                    even = False
                    break
                i = p.find_unescaped([outer, "]"], i + 1)
                nxt = p.char(i)
            if even:
                p.log(
                    "While parsing a string in Array context, we detected a quoted section that would have closed the string but has a different meaning here, ignoring it",
                )
                st.unmatched = not st.unmatched
                return True, _append_one(p, st, c), False
            return False, c, True
        elif top == KEY:
            p.log(
                "While parsing a string in Object Key context, we detected a quoted section that would have closed the string but has a different meaning here, ignoring it",
            )
            return True, _append_one(p, st, c), False

    return False, c, False


def _only_ws_before(p, end: int) -> bool:
    for j in range(1, end):
        c = p.char(j)
        if c is not None and not c.isspace():
            return False
    return True


# ----------------------------------------------------------------- body scan

def _scan_body(p, st: Scan):
    outer = _outer(st)

    def find(targets, off=0):
        return _cached_find(p, st, targets, off)

    c = p.char()
    while c and (c != outer or _in_low_span(st)):
        top = p.ctx[-1] if p.ctx else None
        if st.missing_quotes:
            if top == KEY and (c == ":" or c.isspace()):
                p.log(
                    "While parsing a string missing the left delimiter in object key context, we found a :, stopping here",
                )
                break
            if top == ARR and c in ("]", ","):
                p.log(
                    "While parsing a string missing the left delimiter in array context, we found a ] or ,, stopping here",
                )
                break
        if c == "„" and (not st.acc or st.acc[-1] != "\\"):
            st.rq += LOW_SPAN
            c = _append_one(p, st, c)
            continue
        if _in_low_span(st) and c == "”":
            st.rq = st.rq[:-1]
            c = _append_one(p, st, c)
            continue
        if (
            (
                st.pend_container
                or (
                    top == VAL
                    and c == "{"
                    and p.char(-1) != "\\"
                    and _bare_key_then_colon(p, p.ws_offset(1))
                )
            )
            and c in OPENERS
            and (not st.acc or st.acc[-1] != "\\")
        ):
            end = _skip_container(p, 0)
            if end is not None:
                p.log(
                    "While parsing a string in object value context, we found a balanced inline container that belongs to the string, keeping it",
                )
                st.pend_container = False
                st.container_stack.clear()
                _append(st, p.text[p.pos:p.pos + end])
                p.pos += end
                c = p.char()
                continue
        if (
            not p.stream_stable
            and top == VAL
            and c == ","
            and not st.pend_container
            and not st.container_stack
        ):
            kind = "string" if st.no_future_delim else _classify_value_comma(p, find)
            if kind == "member":
                p.log(
                    "While parsing a string missing the right delimiter in object value context, we found a comma that starts the next object member. Stopping here",
                )
                break
            if kind == "string_no_future_delimiter":
                st.no_future_delim = True
            st.pend_container = kind == "container"
            p.log(
                "While parsing a string in object value context, we found a comma that belongs to the string, keeping it",
            )
            c = _append_one(p, st, c)
            continue
        st.pend_container, keep = _track_container(c, st.pend_container, st.container_stack)
        if keep:
            c = _append_one(p, st, c)
            continue
        if (
            not p.stream_stable
            and top == VAL
            and c == "}"
            and (not st.acc or st.acc[-1] != outer)
        ):
            if st.open_braces:
                c = _append_one(p, st, c)
                continue
            delimiter_missing = True
            if p.char(1) == "\\":
                delimiter_missing = False
            i = find(outer, 1)
            nxt = p.char(i)
            if nxt:
                i += 1
                i = p.ws_offset(i)
                nxt = p.char(i)
                if not nxt or nxt in (",", "}"):
                    delimiter_missing = False
                else:
                    i = p.find_unescaped(st.lq, i)
                    nxt = p.char(i)
                    if not nxt:
                        delimiter_missing = False
                    else:
                        i = p.ws_offset(i + 1)
                        nxt = p.char(i)
                        if nxt and nxt != ":":
                            delimiter_missing = False
            else:
                i = p.find_unescaped(":", 1)
                nxt = p.char(i)
                if nxt:
                    break
                i = p.ws_offset(1)
                j = p.find_unescaped("}", i)
                if j - i > 1:
                    delimiter_missing = False
            if delimiter_missing:
                p.log(
                    "While parsing a string missing the left delimiter in object value context, we found a , or } and we couldn't determine that a right delimiter was present. Stopping here",
                )
                break
        if (
            not p.stream_stable
            and c == "]"
            and ARR in p.ctx
            and (not st.acc or st.acc[-1] != outer)
        ):
            i = p.find_unescaped(outer)
            if not p.char(i):
                break
        if top == VAL and c == "}":
            i = p.ws_offset(1)
            nxt = p.char(i)
            if nxt == "`" and p.char(i + 1) == "`" and p.char(i + 2) == "`":
                if _fence_is_literal(p, st, i):
                    p.log(
                        "While parsing a string in object value context, we found a literal fenced snippet after }, keeping it in the string",
                    )
                    c = _append_one(p, st, c)
                    continue
                p.log(
                    "While parsing a string in object value context, we found a } that closes the object before code fences, stopping here",
                )
                break
            if not nxt:
                p.log(
                    "While parsing a string in object value context, we found a } that closes the object, stopping here",
                )
                break
        _append(st, c)
        p.pos += 1
        c = p.char()
        if c is None:
            if p.stream_stable and st.acc and st.acc[-1] == "\\":
                st.acc = st.acc[:-1]
                _recount_braces(st)
            break
        if st.acc and st.acc[-1] == "\\":
            handled, c = _normalize_escape(p, st, c)
            if handled:
                continue
        top = p.ctx[-1] if p.ctx else None
        if c == ":" and not st.missing_quotes and top == KEY:
            i = p.find_unescaped(st.lq, 1)
            nxt = p.char(i)
            if nxt:
                i += 1
                i = p.find_unescaped(outer, i)
                nxt = p.char(i)
                if nxt:
                    i += 1
                    i = p.ws_offset(i)
                    after = p.char(i)
                    if after in (",", "}"):
                        p.log(
                            f"While parsing a string missing the right delimiter in object key context, we found a {after} stopping here",
                        )
                        break
            else:
                p.log(
                    "While parsing a string missing the right delimiter in object key context, we found a :, stopping here",
                )
                break
        if _in_low_span(st) and c == '"':
            st.rq = st.rq[:-1]
            c = _append_one(p, st, c)
            continue
        if c == outer and top == VAL and _quote_in_charclass(p, st):
            p.log("While parsing a string, we found a bare quote inside a regex character class, keeping it")
            c = _append_one(p, st, c)
            continue
        if c == outer and st.acc and st.acc[-1] != "\\":
            handled, c, brk = _close_candidate(p, st, c)
            if brk:
                break
            if handled:
                continue
    return c


def _finalize(p, st: Scan, c):
    outer = _outer(st)
    top = p.ctx[-1] if p.ctx else None
    if c and st.missing_quotes and top == KEY and c.isspace():
        p.log(
            "While parsing a string, handling an extreme corner case in which the LLM added a comment instead of valid string, invalidate the string and return an empty value",
        )
        p.eat_ws()
        if p.char() not in (":", ","):
            return ""

    if c != outer:
        if not p.stream_stable:
            p.log("While parsing a string, we missed the closing quote, ignoring")
            st.acc = st.acc.rstrip()
    else:
        p.pos += 1

    if not p.stream_stable and (st.missing_quotes or (st.acc and st.acc[-1] == "\n")):
        st.acc = st.acc.rstrip()

    return st.acc


def scan_string(p):
    """Parse one (possibly malformed) string at the parser cursor."""
    st, direct = _entry(p)
    if direct is not SENTINEL:
        return direct
    return _finalize(p, st, _scan_body(p, st))
