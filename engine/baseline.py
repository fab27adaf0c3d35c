"""Generate the frozen baseline sketch used for drift checks.

Run once (or whenever the corpus definition changes):

    PYTHONPATH=. python -m engine.baseline [n_clips]

Writes engine/data/baseline_sketch.json: histogram states for snr_db,
dur_ms, confidence computed from the canonical seed-42 corpus.  Runs compare
their histograms to these via PSI / KS (engine.run.drift_report).
"""

from __future__ import annotations

import json
import sys

from engine.run import BASELINE_SKETCH_PATH


def build_baseline(n_clips: int = 20_000, seed: int = 42) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, ignore_reinit_error=True)
    from engine.data.clips import clips_dataset
    from engine.run import validate_clips_dataset
    from engine.stages import merge_sketch_partials, sketch_partials_batch

    ds = validate_clips_dataset(clips_dataset(n_clips, seed=seed))
    partials = ds.map_batches(sketch_partials_batch, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    merged = merge_sketch_partials([json.loads(r["partial"]) for r in partials])
    return {
        "n_clips": n_clips,
        "seed": seed,
        "hists": {c: h.state() for c, h in merged["hists"].items()},
        "stats": {c: s.summary() for c, s in merged["stats"].items()},
    }


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    state = build_baseline(n)
    BASELINE_SKETCH_PATH.write_text(json.dumps(state))
    print(f"wrote {BASELINE_SKETCH_PATH} ({n} clips)")
