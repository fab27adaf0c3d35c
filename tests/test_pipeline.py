"""End-to-end validation pipeline on a small clips corpus (needs Ray)."""

import json

import pytest


@pytest.fixture(scope="module")
def small_run(ray_session, tmp_path_factory):
    from engine.run import run_validation

    out = tmp_path_factory.mktemp("valrun")
    metrics = run_validation(600, str(out), n_partitions=2, batch_size=128)
    return out, metrics


def test_metrics_shape(small_run):
    _out, m = small_run
    assert m["rows"] == 600
    assert 0 < m["parse_ok"] <= 600
    assert m["violations"] > 0           # defects are planted by design
    assert m["duplicate_id_groups"] >= 0
    assert "dur_ms" in m["column_stats"]
    assert m["drift"]["available"]
    for col in ("snr_db", "dur_ms", "confidence"):
        assert not m["drift"][col]["drifted"], f"{col} should not drift vs baseline"


def test_outputs_on_disk(small_run):
    import pyarrow.parquet as pq

    out, _m = small_run
    verdicts = list((out / "verdicts").rglob("*.parquet"))
    violations = list((out / "violations").rglob("*.parquet"))
    manifests = list((out / "manifest").glob("part=*.json"))
    assert verdicts and violations and len(manifests) == 2
    t = pq.read_table(verdicts[0])
    assert {"clip_id", "parse_ok", "audio_ok", "snr_db"} <= set(t.schema.names)
    manifest = json.loads(manifests[0].read_text())
    assert manifest["row_range"] and "metrics" in manifest


def test_resume_skips_done_partitions(small_run, monkeypatch):
    """Behavioral, not timed: a fully-finished run's resume must never enter
    the per-partition compute path at all (a wall-clock bound here flaked
    under machine load — round-3)."""
    import engine.run as runmod
    from engine.run import run_validation

    out, m = small_run

    def bomb(*a, **k):
        raise AssertionError("resume recomputed a finished partition")

    monkeypatch.setattr(runmod, "_run_partition", bomb)
    m2 = run_validation(600, str(out), n_partitions=2, batch_size=128)
    assert m2["violations"] == m["violations"]
    assert m2["rows"] == m["rows"]


def test_determinism_across_runs(ray_session, tmp_path):
    from engine.run import run_validation

    a = run_validation(300, str(tmp_path / "a"), n_partitions=1, batch_size=128)
    b = run_validation(300, str(tmp_path / "b"), n_partitions=1, batch_size=128)
    for key in ("parse_ok", "audio_ok", "meta_ok", "violations", "repairs", "duplicate_id_groups"):
        assert a[key] == b[key]


def test_crash_mid_partition_resume_is_exactly_once(ray_session, tmp_path):
    """Round-1 VERDICT item 9: kill a run mid-partition, re-run, and prove
    the re-run (a) skips finished manifests, (b) clears the crashed
    partition's partial output instead of double-counting it, and (c)
    produces verdicts identical to an uninterrupted run."""
    import pyarrow.parquet as pq

    import engine.run as runmod
    from engine.run import run_validation

    def verdict_rows(out):
        files = sorted((out / "verdicts").rglob("*.parquet"))
        tbl = pq.read_table([str(f) for f in files])
        df = tbl.to_pandas().sort_values(
            ["clip_id", "dur_ms", "sr_hz", "codec"]).reset_index(drop=True)
        return df

    # Ground truth: clean uninterrupted run.
    clean = tmp_path / "clean"
    m_clean = run_validation(450, str(clean), n_partitions=3, batch_size=128)

    # Crashing run: partition 1 dies AFTER writing partial verdict output but
    # BEFORE its manifest lands (the worst-case window).
    crashed = tmp_path / "crashed"
    real_run_partition = runmod._run_partition

    def dying_run_partition(part, lo, hi, out, *args, **kwargs):
        metrics = real_run_partition(part, lo, hi, out, *args, **kwargs)
        if part == 1:
            # Simulate the kill: output written, manifest never recorded.
            raise KeyboardInterrupt("simulated mid-run kill")
        return metrics

    runmod._run_partition = dying_run_partition
    try:
        with pytest.raises(KeyboardInterrupt):
            run_validation(450, str(crashed), n_partitions=3, batch_size=128)
    finally:
        runmod._run_partition = real_run_partition

    # Partition 0 completed; partition 1 left partial files and no manifest.
    assert (crashed / "manifest" / "part=0.json").exists()
    assert not (crashed / "manifest" / "part=1.json").exists()
    assert list((crashed / "verdicts" / "part=1").rglob("*.parquet")), \
        "test premise: the kill must leave partial output behind"

    # Resume: partition 0 must be skipped (its _run_partition never called),
    # partitions 1-2 recomputed.
    ran_parts = []

    def recording_run_partition(part, *args, **kwargs):
        ran_parts.append(part)
        return real_run_partition(part, *args, **kwargs)

    runmod._run_partition = recording_run_partition
    try:
        m_resumed = run_validation(450, str(crashed), n_partitions=3, batch_size=128)
    finally:
        runmod._run_partition = real_run_partition
    assert ran_parts == [1, 2]

    # Verdicts identical to the uninterrupted run, no duplicated rows.
    df_clean, df_resumed = verdict_rows(clean), verdict_rows(crashed)
    assert len(df_resumed) == 450
    assert df_clean.equals(df_resumed)
    for key in ("rows", "parse_ok", "audio_ok", "meta_ok", "violations", "repairs"):
        assert m_resumed[key] == m_clean[key]


def test_cross_partition_duplicates_detected(ray_session, tmp_path):
    """Round-2 review finding 1: a planted dup pair (row 436 carries row
    435's clip_id) split across a partition boundary must still be counted.
    With per_part=436 the pair straddles partitions 0|1 exactly."""
    import glob

    import pyarrow.parquet as pq

    from engine.run import run_validation

    out = tmp_path / "xpart"
    # n=872, 2 partitions -> per_part=436: rows 0-435 | 436-871.
    m = run_validation(872, str(out), n_partitions=2, batch_size=128)

    files = glob.glob(str(out / "verdicts" / "**" / "*.parquet"), recursive=True)
    ids = pq.read_table(files, columns=["clip_id"]).column("clip_id").to_pylist()
    from collections import Counter
    exact_groups = sum(1 for c in Counter(ids).values() if c > 1)
    assert exact_groups >= 1
    assert m["duplicate_id_groups"] == exact_groups
    # the boundary pair specifically
    assert Counter(ids)["clip-000000000435"] == 2
    assert not m["overall_pass"]


def test_resume_rejects_mismatched_manifests(ray_session, tmp_path):
    """Round-2 review finding 2: a manifest from a DIFFERENT run shape
    (row range / params) must be recomputed, not silently resumed."""
    import glob

    import pyarrow.parquet as pq

    from engine.run import run_validation

    out = tmp_path / "mismatch"
    m1 = run_validation(400, str(out), n_partitions=2, batch_size=128)
    assert m1["rows"] == 400 and m1["clips_processed"] == 400

    # Same out dir, doubled corpus: old manifests cover [0,200) and
    # [200,400) but the new ranges are [0,400) and [400,800).
    m2 = run_validation(800, str(out), n_partitions=2, batch_size=128)
    assert m2["rows"] == 800
    assert m2["clips_processed"] == 800          # nothing stale was reused
    files = glob.glob(str(out / "verdicts" / "**" / "*.parquet"), recursive=True)
    total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert total == 800

    # Unchanged parameters now resume cleanly with zero processing.
    m3 = run_validation(800, str(out), n_partitions=2, batch_size=128)
    assert m3["rows"] == 800 and m3["clips_processed"] == 0


def test_shrinking_partitions_purges_stale_output(ray_session, tmp_path):
    """Round-2 advice (medium): re-running the same out dir with FEWER
    partitions must delete part=K output for K >= n_partitions.  Without the
    purge, run(800, parts=4) then run(800, parts=2) leaves parts 2-3
    (rows [400,800)) on disk beside the recomputed part 1 ([400,800)):
    verdict rows double-count and duplicate_id_groups inflates."""
    import glob

    import pyarrow.parquet as pq

    from engine.run import run_validation

    out = tmp_path / "shrink"
    m4 = run_validation(800, str(out), n_partitions=4, batch_size=128)
    assert m4["rows"] == 800

    m2 = run_validation(800, str(out), n_partitions=2, batch_size=128)
    assert m2["rows"] == 800
    # Exactly this run's partitions remain on disk.
    assert sorted(p.name for p in (out / "manifest").glob("part=*.json")) == \
        ["part=0.json", "part=1.json"]
    assert sorted(p.name for p in (out / "verdicts").glob("part=*")) == \
        ["part=0", "part=1"]
    files = glob.glob(str(out / "verdicts" / "**" / "*.parquet"), recursive=True)
    total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert total == 800                      # no double-counted rows
    # Same duplicate accounting as a fresh 800-row run (only the planted
    # defects, not resume artifacts).
    fresh = run_validation(800, str(tmp_path / "fresh"), n_partitions=2,
                           batch_size=128)
    assert m2["duplicate_id_groups"] == fresh["duplicate_id_groups"]
    assert m2["overall_pass"] == fresh["overall_pass"]


def test_fused_concurrency_prestarts_wide_machines(ray_session, monkeypatch):
    """Round-3 perf fix: on wide machines the fused pool pre-starts at 3/4 of
    cap (the autoscaler ramps too slowly to fill a short job — measured 9.6k
    -> 16.6k clips/s on 32 CPUs), while small machines keep min=1 (a pinned
    pool starves reads at 8 CPUs and deadlocks at 2)."""
    import ray

    from engine.run import _fused_concurrency

    monkeypatch.setattr(ray, "cluster_resources", lambda: {"CPU": 32})
    assert _fused_concurrency() == (24, 30)
    monkeypatch.setattr(ray, "cluster_resources", lambda: {"CPU": 16})
    assert _fused_concurrency() == (12, 14)
    monkeypatch.setattr(ray, "cluster_resources", lambda: {"CPU": 8})
    assert _fused_concurrency() == (1, 6)
    monkeypatch.setattr(ray, "cluster_resources", lambda: {"CPU": 2})
    assert _fused_concurrency() == (1, 2)
