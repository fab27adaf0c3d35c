"""Adapter: reference StringFileWrapper name over our FileBuffer."""

from engine.repair.filebuf import FileBuffer


class StringFileWrapper(FileBuffer):
    def __init__(self, fd, chunk_length: int = 0):
        super().__init__(fd, chunk_length)

    # -- reference-internal surface used by its white-box tests ------------

    def _n_chunks(self) -> int:
        length = len(self)
        return max(1, -(-length // self.chunk))

    def get_buffer(self, index: int) -> str:
        if index < 0 or index >= self._n_chunks():
            raise IndexError(f"chunk index {index} out of range")
        return self._chunk_text(index)

    def _ensure_chunk_position(self, index: int) -> None:
        if index < 0 or index >= self._n_chunks():
            raise IndexError(f"chunk index {index} out of range")
        self._chunk_text(index)
