"""Adapter: reference context API over our plain tag-stack."""

from engine.repair.common import ARR, KEY, VAL


class ContextValues:
    OBJECT_KEY = KEY
    OBJECT_VALUE = VAL
    ARRAY = ARR


class JsonContextView:
    """Live view over a parser's ctx list with the reference's method names."""

    def __init__(self, parser):
        self._parser = parser

    @property
    def context(self):
        return self._parser.ctx

    @property
    def current(self):
        ctx = self._parser.ctx
        return ctx[-1] if ctx else None

    @property
    def empty(self):
        return not self._parser.ctx

    def set(self, value):
        self._parser.ctx.append(value)

    def reset(self):
        if self._parser.ctx:
            self._parser.ctx.pop()

    def clear(self):
        del self._parser.ctx[:]

    def enter(self, value):
        view = self

        class _Entry:
            def __enter__(self_inner):
                view.set(value)

            def __exit__(self_inner, *exc):
                view.reset()
                return False

        return _Entry()
