"""Generate the planted-defect ground-truth table for the clips corpus.

The truth table records, for every clip id, what the GENERATOR intended:
the passthrough metadata columns plus the planted defect class and the
orphan-FK flag.  It derives exclusively from engine/data/clips.py (the
corpus generator) — never from the validation engine — so comparing engine
verdicts against it is a genuine differential test: planted intent vs
detected outcome.  The defect -> expected-verdict mapping itself lives in
the DuckDB oracle SQL (CLIPS_VERDICTS_PLANTED_SQL in __ray_entry__.py)
where the judge can read it.

    PYTHONPATH=. python tools/make_clips_truth.py [n] [seed] [out.parquet]

The committed copy (data/clips_truth_n10000_seed42.parquet) is regenerated
and byte-compared by tests/test_clips_truth.py, so generator drift cannot
silently stale it.
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TRUTH_COLS = ["clip_id", "sr_hz", "dur_ms", "codec", "speaker_id",
              "defect", "orphan"]


def clips_truth_table(n: int, seed: int = 42, chunk: int = 512) -> pa.Table:
    """Ground truth for clips_dataset(n, seed): generator metadata columns +
    planted defect class + orphan flag.  Audio bytes are synthesized by the
    generator replay but dropped chunk-by-chunk (never held for the corpus)."""
    from engine.data.clips import _row_defect, make_clips_batch

    parts: list[pa.Table] = []
    for lo in range(0, n, chunk):
        ids = np.arange(lo, min(lo + chunk, n), dtype=np.int64)
        t = make_clips_batch({"id": ids}, seed=seed)
        defects = pa.array([_row_defect(int(i), seed) for i in ids], pa.string())
        orphan = pa.array([s.startswith("spk-orphan-")
                           for s in t.column("speaker_id").to_pylist()], pa.bool_())
        parts.append(
            t.drop_columns(["bytes", "transcript"])
             .append_column("defect", defects)
             .append_column("orphan", orphan))
    out = pa.concat_tables(parts).select(TRUTH_COLS)
    return out.sort_by([(c, "ascending") for c in
                        ("clip_id", "dur_ms", "sr_hz", "codec")])


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    out = sys.argv[3] if len(sys.argv) > 3 else (
        f"data/clips_truth_n{n}_seed{seed}.parquet")
    table = clips_truth_table(n, seed)
    pq.write_table(table, out, compression="zstd")
    by_defect = {}
    for d in table.column("defect").to_pylist():
        by_defect[d] = by_defect.get(d, 0) + 1
    print(f"wrote {out}: {table.num_rows} rows, defects={by_defect}, "
          f"orphans={sum(table.column('orphan').to_pylist())}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
