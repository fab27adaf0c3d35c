"""Chunked, string-like view over a text file descriptor.

Own design (contract parity with the reference's lazily-chunked file view,
utils/string_file_wrapper.py): the repair parser indexes its input like a
string; for file input we read fixed-size character chunks on demand, keep a
small bounded cache, and remember the text-mode seek cookie at each chunk
boundary so random access never lands mid-codepoint.

In the Ray engine this path only serves the drop-in ``load``/``from_file``
API; table pipelines read Parquet and never touch it.
"""

from __future__ import annotations

DEFAULT_CHUNK = 1_000_000  # characters per chunk (reference default: 1 MB)


class FileBuffer:
    def __init__(self, fd, chunk_chars: int = 0) -> None:
        self.fd = fd
        self.chunk = chunk_chars if chunk_chars > 0 else DEFAULT_CHUNK
        # Keep at most ~2 MB of characters resident, but always >= 2 chunks so
        # scans across a boundary don't thrash.
        self.max_cached = max(2, 2_000_000 // self.chunk)
        self._cache: dict[int, str] = {}
        # _cookies[k] = fd seek cookie for the start of chunk k; grown lazily.
        self._cookies: list = [fd.tell()]
        self._length: int | None = None

    # -- chunk management ---------------------------------------------------

    def _chunk_text(self, k: int) -> str:
        got = self._cache.get(k)
        if got is not None:
            return got
        while len(self._cookies) <= k:
            # Discover intermediate cookies by reading forward.
            self._read_chunk(len(self._cookies) - 1)
        return self._read_chunk(k)

    def _read_chunk(self, k: int) -> str:
        got = self._cache.get(k)
        if got is not None:
            return got
        self.fd.seek(self._cookies[k])
        data = self.fd.read(self.chunk)
        if len(self._cookies) == k + 1:
            self._cookies.append(self.fd.tell())
        if len(self._cache) >= self.max_cached:
            self._cache.pop(next(iter(self._cache)))
        self._cache[k] = data
        return data

    def __len__(self) -> int:
        if self._length is None:
            # One forward scan; records every chunk cookie on the way.
            k = 0
            total = 0
            while True:
                text = self._chunk_text(k)
                total += len(text)
                if len(text) < self.chunk:
                    break
                k += 1
            self._length = total
        return self._length

    # -- string-style access ------------------------------------------------

    def __getitem__(self, index):
        if isinstance(index, slice):
            n = len(self)
            start, stop, step = index.indices(n)
            if step != 1:
                return "".join(self[i] for i in range(start, stop, step))
            if stop <= start:
                return ""
            parts = []
            k = start // self.chunk
            while k * self.chunk < stop:
                text = self._chunk_text(k)
                lo = max(start - k * self.chunk, 0)
                hi = min(stop - k * self.chunk, len(text))
                parts.append(text[lo:hi])
                if len(text) < self.chunk:
                    break
                k += 1
            return "".join(parts)
        if index < 0:
            index += len(self)
            if index < 0:
                raise IndexError("string index out of range")
        k, off = divmod(index, self.chunk)
        text = self._chunk_text(k)
        if off >= len(text):
            raise IndexError("string index out of range")
        return text[off]
