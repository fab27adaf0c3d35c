"""Benchmark the headline pipelines.

    python bench.py                  # full bench over $GRAFT_SF_DIR (default sf0.1)
    python bench.py --scaling        # same flagship job at two CPU levels in
                                     # fresh processes (default pair 2,8 — this
                                     # VM's linear region; override with
                                     # GRAFT_SCALING_CPUS="8,32"); prints
                                     # throughput at each + scaling efficiency
    python bench.py --scaling-worker N   # (internal) one flagship run at N cpus

Prints ONE JSON line:
    {"metric": ..., "value": seconds, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# The flagship metric is validated clips/sec; clip count scales with sf.
BENCH_CLIPS = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 100_000}
# Scaling runs use a larger corpus so the ~5s fixed session+actor startup is
# amortized and the measurement reflects the pipeline, not process spawn.
SCALING_CLIPS = {"sf0.001": 20_000, "sf0.01": 60_000, "sf0.1": 300_000}
# The default bench also records a two-scale signal each round at the SAME
# clip counts as the --scaling criterion: the earlier half-size tripwire
# (150k at sf0.1) spent ~5s of fixed session+actor startup against a 63s
# 2-CPU leg and read 0.77-0.80 while the criterion read 0.83-0.89 — the
# tripwire must not need an asterisk (round-3 VERDICT item 7), so each leg
# now runs >=60s and the two measurements share one methodology.
INLINE_SCALING_CLIPS = SCALING_CLIPS


def _sf_label() -> str:
    for label in BENCH_CLIPS:
        if label in SF_DIR:
            return label
    return "sf0.1"


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 ignore_reinit_error=True)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray


def prepare_flagship_input(n_clips: int) -> None:
    """Materialize the clips table to parquet once (untimed corpus build)."""
    from engine.data.clips import cached_clips_dataset

    cached_clips_dataset(n_clips, seed=42)


def run_flagship(n_clips: int) -> dict:
    """Validate the clips table from parquet (the production ingest path:
    read → repair+schema+audio-SNR actor pool → referential probe → sketch
    partials).  Corpus synthesis is cached to parquet and excluded from the
    timed window."""
    import ray

    from engine.data.clips import cached_clips_dataset, speakers_table
    from engine.run import validate_clips_dataset
    from engine.stages import build_fk_probe, fk_check_batch, sketch_partials_batch

    prepare_flagship_input(n_clips)
    bloom_state, exact = build_fk_probe(
        speakers_table(seed=42).column("speaker_id").to_pylist())

    t0 = time.time()
    ds = cached_clips_dataset(n_clips, seed=42)
    checked = validate_clips_dataset(ds, batch_size=512)
    bloom_ref, exact_ref = ray.put(bloom_state), ray.put(exact)
    checked = checked.map_batches(
        lambda t: fk_check_batch(t, bloom_ref, exact_ref),
        batch_format="pyarrow", zero_copy_batch=True)
    # Consume via the sketch-partials aggregate (streams, never materializes
    # audio bytes).
    partials = checked.map_batches(sketch_partials_batch, batch_format="pyarrow",
                                   zero_copy_batch=True)
    from engine.stages import tree_merge_partials

    merged = tree_merge_partials(partials.materialize())
    rows = merged["totals"]["rows"]
    wall = time.time() - t0
    if "--stats" in sys.argv:
        print(partials.stats(), file=sys.stderr)
    return {"rows": rows, "wall_s": round(wall, 2),
            "clips_per_s": round(rows / wall, 1)}


QUERY_BENCH_NAMES = [
    "q1_pricing_summary", "grouped_stats_orderpriority", "dedup_exact_documents",
    "distinct_users_events", "orders_per_segment", "top10_orders",
    "repair_extract_events", "events_daily_by_type", "knn_cosine_top10",
    "minhash_near_dup", "simhash_near_dup", "hll_distinct_users",
    "tdigest_quantity", "sessionize_events", "revenue_by_segment_day",
    # round-3 curation family (fast representatives)
    "top_terms_per_document", "large_gap_events", "distinct_users_by_type",
    # round-4 operators (one representative per new family)
    "orders_grouping_sets", "clicks_near_purchase", "heavy_hitter_terms",
    "orders_row_number", "jsonl_gz_repair_events",
    # round-4 continuation: real audio codecs + new window/drift/text ops
    "flac_audio_features", "adpcm_audio_features", "audio_spectrogram_report",
    "user_range_window_events", "drift_divergences_split",
    "doc_edit_distance_adjacent",
    # round-4 continuation session 3: JPEG codec + moments combiner
    "jpeg_image_metadata", "corr_stats_by_returnflag",
    # round-4 session 4: curation filters, profiler, constraint suite
    "decontaminate_documents", "profile_events",
    "lineitem_constraint_summary", "user_order_activity",
    "documents_diff", "events_checks_report",
    # round-5 surfaces
    "stream_stable_events", "repair_typed_extract_events",
    "decontaminate_documents_bloom", "profile_events_approx",
]

# Recorded per-query numbers are the median of this many sweeps: a single
# sweep was contaminated by whatever else shared the wall window (round-2
# VERDICT item 2 — the recorded metric must be trustworthy without reading
# bench/history.jsonl).
BENCH_REPEATS = 3


def _run_flagship_fresh(n_cpus: int, n_clips: int) -> dict | None:
    """One flagship run in a FRESH process (same path as the scaling workers).

    Repeating the flagship inside one long-lived session degrades run-over-run
    (~10k -> ~7.3k clips/s by run 3 — object-store/page-cache residue from the
    previous materialize), so in-session repeats understate the pipeline.  The
    production shape is one job per session (`ray job submit`), which is what
    a fresh process measures."""
    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--scaling-worker", str(n_cpus)],
            capture_output=True, text=True, timeout=3600,
            env={**os.environ,
                 "PYTHONPATH": os.path.dirname(os.path.abspath(__file__)),
                 "GRAFT_SCALING_CLIP_COUNT": str(n_clips)},
            check=False,
        )
    except subprocess.TimeoutExpired:
        return None
    line = next((ln for ln in proc.stdout.splitlines()
                 if ln.startswith("SCALING_RESULT ")), None)
    if line is None:
        return None
    res = json.loads(line[len("SCALING_RESULT "):])
    return {"rows": res["rows"], "wall_s": res["wall_s"],
            "clips_per_s": res["clips_per_s"]}


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    return s[len(s) // 2]


def run_query_bench(repeats: int = BENCH_REPEATS) -> dict[str, float]:
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    samples: dict[str, list[float]] = {n: [] for n in QUERY_BENCH_NAMES}
    for _ in range(repeats):
        for name in QUERY_BENCH_NAMES:
            t0 = time.time()
            result = qs[name](SF_DIR)
            if hasattr(result, "materialize"):
                result.materialize()
            samples[name].append(time.time() - t0)
    return {n: round(_median(v), 3) for n, v in samples.items()}


def _scaling_clip_count() -> int:
    override = os.environ.get("GRAFT_SCALING_CLIP_COUNT")
    return int(override) if override else SCALING_CLIPS[_sf_label()]


SCALING_REPEATS = 3


def _run_scaling_pair(pair: tuple[int, ...], n_clips: int) -> dict | None:
    """Run the flagship at each CPU level in fresh processes; return the
    throughput-at-each + efficiency dict (None on worker failure).

    Each level runs SCALING_REPEATS times, INTERLEAVED across levels so a
    drifting machine state (page-cache residue, background load) biases
    both legs alike, and the per-level number is the median — the same
    trustworthy-recorded-number rule the flagship uses (round-2 VERDICT
    item 2; a single-shot leg was observed to swing the efficiency
    0.79-0.87 run to run on this shared VM)."""
    per_level: dict[int, list[dict]] = {n: [] for n in pair}
    for _ in range(SCALING_REPEATS):
        for n_cpus in pair:
            try:
                os.sync()
            except (AttributeError, OSError):
                pass
            try:
                proc = subprocess.run(
                    [sys.executable, __file__, "--scaling-worker", str(n_cpus)],
                    capture_output=True, text=True, timeout=3600,
                    env={**os.environ,
                         "PYTHONPATH": os.path.dirname(os.path.abspath(__file__)),
                         "GRAFT_SCALING_CLIP_COUNT": str(n_clips)},
                    check=False,
                )
            except subprocess.TimeoutExpired:
                return None
            line = next((ln for ln in proc.stdout.splitlines()
                         if ln.startswith("SCALING_RESULT ")), None)
            if line is None:
                return None
            per_level[n_cpus].append(json.loads(line[len("SCALING_RESULT "):]))

    def med(n_cpus: int) -> dict:
        runs = sorted(per_level[n_cpus], key=lambda r: r["clips_per_s"])
        return runs[len(runs) // 2]

    lo, hi = med(pair[0]), med(pair[-1])
    factor = hi["num_cpus"] / lo["num_cpus"]
    efficiency = hi["clips_per_s"] / (factor * lo["clips_per_s"])
    return {
        "runs": [r for n in pair for r in per_level[n]],
        "repeats_per_level": SCALING_REPEATS,
        f"throughput_{lo['num_cpus']}cpu": lo["clips_per_s"],
        f"throughput_{hi['num_cpus']}cpu": hi["clips_per_s"],
        f"scaling_efficiency_{lo['num_cpus']}_to_{hi['num_cpus']}": round(efficiency, 3),
        "efficiency": round(efficiency, 3),
    }


# A query is flagged when its fresh median exceeds this multiple of its
# recorded-history median — noise vs regression decided by data, not
# narrative (round-4 VERDICT item 5: the r03->r04 dedup_exact/minhash
# wobbles could only be argued about, not measured).
TRIPWIRE_RATIO = 1.3


def _tripwire(queries: dict[str, float], hist_path: str | None = None) -> dict:
    """Per-query regression tripwire: compare each fresh median against the
    median of that query across ALL prior bench/history.jsonl records at the
    same sf.  Records with >= 2 history points are eligible (a single point
    is itself one noisy draw)."""
    if hist_path is None:
        hist_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench", "history.jsonl")
    past: dict[str, list[float]] = {}
    try:
        with open(hist_path) as fd:
            for line in fd:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if rec.get("sf") != _sf_label():
                    continue
                for name, sec in (rec.get("queries") or {}).items():
                    past.setdefault(name, []).append(float(sec))
    except OSError:
        return {"threshold_ratio": TRIPWIRE_RATIO, "flagged": {},
                "eligible_queries": 0}
    flagged: dict[str, dict] = {}
    eligible = 0
    for name, sec in queries.items():
        hist = past.get(name, [])
        if len(hist) < 2:
            continue
        eligible += 1
        base = _median(hist)
        if base > 0 and sec > TRIPWIRE_RATIO * base:
            flagged[name] = {"now_s": sec, "history_median_s": round(base, 3),
                             "ratio": round(sec / base, 2),
                             "history_points": len(hist)}
    return {"threshold_ratio": TRIPWIRE_RATIO, "flagged": flagged,
            "eligible_queries": eligible}


def _append_history(record: dict) -> None:
    """Round-over-round regression signal: bench/history.jsonl, one line/run."""
    try:
        hist_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench")
        os.makedirs(hist_dir, exist_ok=True)
        record = {"ts": time.time(), **record}
        with open(os.path.join(hist_dir, "history.jsonl"), "a") as fd:
            fd.write(json.dumps(record) + "\n")
    except OSError:
        pass


def main() -> None:
    if "--scaling-worker" in sys.argv:
        n_cpus = int(sys.argv[sys.argv.index("--scaling-worker") + 1])
        _init_ray(n_cpus)
        res = run_flagship(_scaling_clip_count())
        print("SCALING_RESULT " + json.dumps({"num_cpus": n_cpus, **res}))
        import ray

        ray.shutdown()
        return

    if "--scaling" in sys.argv:
        # Pair chosen inside this VM's linear-scaling region: raw numpy across
        # processes scales 2->8 at ~0.92 but 8->32 at only ~0.60 (the box is
        # ~16 effective cores behind 32 vCPUs) — see BASELINE.md.  Override
        # with GRAFT_SCALING_CPUS="8,32" to measure the full pair anyway.
        pair = tuple(int(x) for x in
                     os.environ.get("GRAFT_SCALING_CPUS", "2,8").split(",") if x.strip())
        if len(pair) < 2:
            print(json.dumps({"error": "GRAFT_SCALING_CPUS needs >= 2 levels"}))
            sys.exit(1)
        # Build the parquet corpus once at full parallelism so neither timed
        # worker pays the (untimed) synthesis cost.
        n_clips = _scaling_clip_count()
        _init_ray(NUM_CPUS)
        prepare_flagship_input(n_clips)
        import ray

        ray.shutdown()
        scaling = _run_scaling_pair(pair, n_clips)
        if scaling is None:
            print(json.dumps({"error": "scaling worker failed or timed out"}))
            sys.exit(1)
        record = {
            "metric": "validated_clips_per_s_scaling",
            "value": scaling["efficiency"],
            "unit": "efficiency",
            "sf": _sf_label(),
            **{k: v for k, v in scaling.items() if k != "efficiency"},
        }
        _append_history(record)
        print(json.dumps(record))
        return

    t_all = time.time()
    # Corpus build + dirty-page writeback happen before any timed window: a
    # fresh multi-GB /tmp write poisons the next timed read (~43s vs ~9s
    # observed round 2).
    _init_ray(NUM_CPUS)
    prepare_flagship_input(BENCH_CLIPS[_sf_label()])
    import ray

    ray.shutdown()   # flagship repeats measure fresh sessions (job-submit shape)
    try:
        os.sync()
    except (AttributeError, OSError):
        pass
    # Median-of-3 flagship runs, each in a FRESH process: the RECORDED number
    # must stand alone (round-2 VERDICT item 2) and in-session repeats degrade
    # (see _run_flagship_fresh).
    flagship_runs = [r for r in
                     (_run_flagship_fresh(NUM_CPUS, BENCH_CLIPS[_sf_label()])
                      for _ in range(BENCH_REPEATS)) if r is not None]
    if not flagship_runs:   # subprocess trouble: fall back to in-session
        _init_ray(NUM_CPUS)
        flagship_runs = [run_flagship(BENCH_CLIPS[_sf_label()])]
    flagship = sorted(flagship_runs, key=lambda r: r["clips_per_s"])[
        len(flagship_runs) // 2]
    _init_ray(NUM_CPUS)
    queries = run_query_bench()
    # Lighter per-round two-scale signal (round-1 VERDICT item 10): same
    # clips-cached path at two CPU levels in fresh processes.
    inline_clips = int(os.environ.get("GRAFT_SCALING_CLIP_COUNT",
                                      INLINE_SCALING_CLIPS[_sf_label()]))
    prepare_flagship_input(inline_clips)
    import ray

    ray.shutdown()   # free the session so the workers start clean
    pair = tuple(int(x) for x in
                 os.environ.get("GRAFT_SCALING_CPUS", "2,8").split(",") if x.strip())
    scaling = _run_scaling_pair(pair, inline_clips)
    total = round(time.time() - t_all, 2)
    all_queries = {"validate_clips": flagship["wall_s"], **queries}
    record = {
        "metric": "bench_total_wall",
        "value": total,
        "unit": "sec",
        "queries": all_queries,
        "tripwire": _tripwire(all_queries),
        "sf": _sf_label(),
        "num_cpus": NUM_CPUS,
        "validated_clips_per_s": flagship["clips_per_s"],
        "validated_clips": flagship["rows"],
        "flagship_runs_clips_per_s": [r["clips_per_s"] for r in flagship_runs],
        "bench_repeats": BENCH_REPEATS,
        "scaling": scaling,
    }
    _append_history(record)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
