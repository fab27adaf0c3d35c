"""Streaming-under-pressure proof: validate a corpus much larger than the
object store without OOM.

Runs the flagship validation over n clips with the Ray object store capped
far below the corpus size.  If any stage materialized the audio column, the
store would fill and the job would stall/die; the streaming executor +
column-pruned fan-out keeps peak usage bounded instead.

    PYTHONPATH=. python tools/stress_object_store.py [n_clips] [store_mb]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    store_mb = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             object_store_memory=store_mb * 1024 * 1024)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from engine.data.clips import clips_dataset
    from engine.run import validate_clips_dataset
    from engine.stages import sketch_partials_batch

    # ~30 KB/clip -> corpus size in the object store would be n_clips * 30 KB.
    corpus_mb = n_clips * 30 // 1024
    t0 = time.time()
    ds = clips_dataset(n_clips, seed=42)
    checked = validate_clips_dataset(ds, batch_size=256)
    partials = checked.map_batches(sketch_partials_batch, batch_format="pyarrow",
                                   zero_copy_batch=True)
    rows = sum(json.loads(r["partial"])["rows"] for r in partials.take_all())
    wall = time.time() - t0
    print(json.dumps({
        "rows": rows,
        "expected": n_clips,
        "wall_s": round(wall, 1),
        "object_store_mb": store_mb,
        "approx_corpus_mb": corpus_mb,
        "corpus_to_store_ratio": round(corpus_mb / store_mb, 1),
        "ok": rows == n_clips,
    }))
    ray.shutdown()
    return 0 if rows == n_clips else 1


if __name__ == "__main__":
    raise SystemExit(main())
