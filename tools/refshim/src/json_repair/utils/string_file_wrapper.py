"""Adapter: reference StringFileWrapper name over our FileBuffer."""

from engine.repair.filebuf import FileBuffer


class StringFileWrapper(FileBuffer):
    def __init__(self, fd, chunk_length: int = 0):
        super().__init__(fd, chunk_length)
