"""Adapter: reference parse_string internals over our strings module."""

from __future__ import annotations

from engine.repair import strings as _s


class StringParseState(_s.Scan):
    """Scan state with the reference's field names as aliases."""

    __slots__ = ()

    def __init__(self, string_acc: str = "", inline_container_stack=None, rstring_delimiter: str = '"'):
        super().__init__()
        self.acc = string_acc
        if inline_container_stack is not None:
            self.container_stack[:] = list(inline_container_stack)
        self.rq = rstring_delimiter

    @property
    def string_acc(self):
        return self.acc

    @string_acc.setter
    def string_acc(self, v):
        self.acc = v

    @property
    def rstring_delimiter(self):
        return self.rq

    @rstring_delimiter.setter
    def rstring_delimiter(self, v):
        self.rq = v

    @property
    def lstring_delimiter(self):
        return self.lq

    @lstring_delimiter.setter
    def lstring_delimiter(self, v):
        self.lq = v

    @property
    def inline_container_stack(self):
        return self.container_stack

    @property
    def pending_inline_container(self):
        return self.pend_container

    @pending_inline_container.setter
    def pending_inline_container(self, v):
        self.pend_container = v

    @property
    def doubled_quotes(self):
        return self.doubled

    @doubled_quotes.setter
    def doubled_quotes(self, v):
        self.doubled = v

    @property
    def unmatched_delimiter(self):
        return self.unmatched

    @unmatched_delimiter.setter
    def unmatched_delimiter(self, v):
        self.unmatched = v


def parse_string(parser):
    return _s.scan_string(parser)


def _try_parse_simple_quoted_string(parser):
    return _s._simple_quoted(parser)


def _scan_string_body(parser, state):
    return _s._scan_body(parser, state)


def _brace_before_code_fence_belongs_to_string(parser, state, fence_idx):
    return _s._fence_is_literal(parser, state, fence_idx)


def _skip_inline_container(parser, idx):
    return _s._skip_container(parser, idx)


def _starts_nested_inline_container(parser, idx):
    return _s._nested_container_opens(parser, idx)


def _quoted_object_member_follows(parser, quote_idx):
    return _s._member_follows_quote(parser, quote_idx)
