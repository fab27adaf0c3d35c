"""Storage seam: Lance when available, Parquet otherwise.

The north rule targets Lance tables; this sandbox has no ``lance`` package
(SURVEY.md §7.6), so every reader/writer in the engine goes through this seam
and silently uses Parquet.  When lance is installed, the same call sites get
``ray.data.read_lance`` / ``write_lance`` with no other changes.
"""

from __future__ import annotations


def have_lance() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_table(path: str, *, columns=None, **kwargs):
    import ray.data

    if have_lance() and str(path).endswith(".lance"):
        return ray.data.read_lance(path, columns=columns, **kwargs)
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def write_table(ds, path: str, **kwargs) -> None:
    if have_lance() and str(path).endswith(".lance"):
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)
