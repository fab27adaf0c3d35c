"""cProfile harness for the repair kernel — the engine twin of the
reference's tests/profiler.py (same role: per-call hotspot listing over a
representative malformed document, 10k iterations), plus an optional
pipeline-stage mode profiling TranscriptRepairStage over a synthetic batch.

    PYTHONPATH=. python tools/profile_kernel.py            # kernel, 10k docs
    PYTHONPATH=. python tools/profile_kernel.py --stage    # actor stage batch
    PYTHONPATH=. python tools/profile_kernel.py --sort=cumtime --top=40

Reference parity note: the reference profiles repair_json(skip_json_loads=
True, return_objects=False) over a ~9 KB mixed document with one planted
malformation (tests/profiler.py:1-60); the DOC below reproduces that shape
without copying its content.
"""

from __future__ import annotations

import json
import pstats
import sys
import time
from cProfile import Profile
from pstats import SortKey, Stats

# Increase precision like the reference harness does.
pstats.__dict__["f8"] = lambda x: f"{x:14.9f}"


def _make_doc() -> str:
    """~9 KB mixed-type document with a planted malformation at the tail
    (missing comma between members + unterminated string), mirroring the
    reference profiler's workload shape."""
    rows = []
    for i in range(18):
        rows.append({
            "_id": f"row-{i:04d}",
            "index": i,
            "active": i % 3 == 0,
            "balance": f"${1000 + i * 7}.{i % 100:02d}",
            "age": 20 + i % 50,
            "name": f"Speaker {i}",
            "about": ("lorem ipsum dolor sit amet " * 8).strip(),
            "scores": [round(0.1 * j, 2) for j in range(8)],
            "friends": [{"id": j, "name": f"friend-{j}"} for j in range(3)],
        })
    body = json.dumps(rows, indent=2)
    return body[:-2] + ',\n  { "key": "value" "key2": "value }\n]'


def profile_kernel(n_iter: int, sort: str, top: int) -> None:
    from engine.repair.api import repair_json

    doc = _make_doc()
    with Profile() as profile:
        start = time.time()
        for _ in range(n_iter):
            repair_json(doc, return_objects=False, skip_json_loads=True)
        wall = time.time() - start
    print(f"kernel: {n_iter} docs in {wall:.3f}s "
          f"({n_iter / wall:,.0f} docs/s, {wall / n_iter * 1e6:.1f} us/doc)",
          flush=True)
    Stats(profile).strip_dirs().sort_stats(sort).print_stats(top)


def profile_stage(n_rows: int, sort: str, top: int) -> None:
    """Profile the actor-pool stage body (one __call__ over a batch) —
    where per-row kernel cost meets Arrow column plumbing."""
    import pyarrow as pa

    from engine.stages import TranscriptRepairStage

    doc = _make_doc()
    batch = pa.table({"transcript": pa.array([doc] * n_rows, pa.string())})
    stage = TranscriptRepairStage()
    with Profile() as profile:
        start = time.time()
        stage(batch)
        wall = time.time() - start
    print(f"stage: {n_rows} rows in {wall:.3f}s "
          f"({n_rows / wall:,.0f} rows/s)", flush=True)
    Stats(profile).strip_dirs().sort_stats(sort).print_stats(top)


def main() -> None:
    sort = SortKey.CALLS
    top = 30
    n = 10_000
    for arg in sys.argv[1:]:
        if arg.startswith("--sort="):
            sort = arg.split("=", 1)[1]
        elif arg.startswith("--top="):
            top = int(arg.split("=", 1)[1])
        elif arg.startswith("--n="):
            n = int(arg.split("=", 1)[1])
    if "--stage" in sys.argv:
        profile_stage(min(n, 2000), sort, top)
    else:
        profile_kernel(n, sort, top)


if __name__ == "__main__":
    main()
