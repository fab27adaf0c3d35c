"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` callable at sf0.01 and compares the SQL-oracled ones
against DuckDB: row count, column names, and an order-insensitive value hash
(rows sorted by all columns, values stringified).  Rows-only queries are
checked for successful execution and row count >= 0.

    PYTHONPATH=. python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pa.Table):
        return result.to_pandas()
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()  # ray Dataset


def canonical_hash(df) -> str:
    import hashlib

    df = df[sorted(df.columns)].copy()
    rows = df.astype(str).values.tolist()
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()


def main() -> int:
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        import os

        ray.init(address="local",
                 num_cpus=int(os.environ.get("ORACLE_CPUS", "8")),
                 include_dashboard=False, ignore_reinit_error=True)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"FAIL  unknown query name(s): {sorted(unknown)}; available: {sorted(qs)}")
        return 1
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        wall = time.time() - t0
        if name not in oracles:
            print(f"ok    {name}: rows={len(mine)} cols={list(mine.columns)} ({wall:.1f}s) [rows-only]")
            continue
        want = con.sql(oracles[name]).df()
        problems = []
        if len(mine) != len(want):
            problems.append(f"rows {len(mine)} != {len(want)}")
        if sorted(mine.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(mine.columns)} != {sorted(want.columns)}")
        elif canonical_hash(mine) != canonical_hash(want):
            problems.append("value-hash mismatch")
            try:
                if len(mine.columns) < 8:
                    merged = mine.merge(want, how="outer", indicator=True,
                                        on=list(mine.columns))
                    diff = merged[merged["_merge"] != "both"]
                    problems.append(f"first diffs:\n{diff.head(6)}")
            except Exception as exc:  # noqa: BLE001  (diff printing is best-effort)
                problems.append(f"(diff unavailable: {type(exc).__name__}: {exc})")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(str(p) for p in problems))
            failures += 1
        else:
            print(f"ok    {name}: rows={len(mine)} hash-match ({wall:.1f}s)")
    print(f"\n{'ALL OK' if not failures else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
