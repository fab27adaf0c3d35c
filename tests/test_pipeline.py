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


def test_resume_skips_done_partitions(small_run):
    import time

    from engine.run import run_validation

    out, m = small_run
    t0 = time.time()
    m2 = run_validation(600, str(out), n_partitions=2, batch_size=128)
    assert time.time() - t0 < 2.0       # pure manifest read
    assert m2["violations"] == m["violations"]
    assert m2["rows"] == m["rows"]


def test_determinism_across_runs(ray_session, tmp_path):
    from engine.run import run_validation

    a = run_validation(300, str(tmp_path / "a"), n_partitions=1, batch_size=128)
    b = run_validation(300, str(tmp_path / "b"), n_partitions=1, batch_size=128)
    for key in ("parse_ok", "audio_ok", "meta_ok", "violations", "repairs", "duplicate_id_groups"):
        assert a[key] == b[key]
