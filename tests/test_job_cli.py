"""The `python -m engine` job surface — what `ray job submit` would invoke
on a real cluster.  Run as a subprocess because the job owns (and shuts
down) its own Ray session, unlike everything else in the test suite.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_job(args: list[str], timeout: int = 300):
    return subprocess.run(
        [sys.executable, "-m", "engine", *args],
        capture_output=True, text=True, timeout=timeout,
        env={**os.environ, "PYTHONPATH": REPO}, cwd=REPO, check=False)


@pytest.mark.slow
def test_validate_job_end_to_end(tmp_path):
    out = tmp_path / "job_out"
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({"clips": 400, "partitions": 2, "min_snr_db": 25.0}))

    proc = _run_job(["validate", "--out", str(out), "--num-cpus", "4",
                     "--config", str(cfg)])
    assert proc.returncode == 0, proc.stderr[-2000:]
    metrics = json.loads(proc.stdout.strip().splitlines()[-1])
    assert metrics["rows"] == 400                 # config overrides CLI default
    assert metrics["partitions"] == 2
    assert (out / "manifest" / "part=0.json").exists()
    assert list((out / "verdicts").rglob("*.parquet"))

    # Second invocation resumes from manifests.  Determinism would make the
    # metrics identical even on a silent full recompute, so ALSO prove no
    # partition was re-run: every verdict file and manifest must be untouched.
    before = {str(p): p.stat().st_mtime_ns
              for p in list(out.rglob("*.parquet")) + list((out / "manifest").glob("*.json"))}
    proc2 = _run_job(["validate", "--out", str(out), "--num-cpus", "4",
                      "--config", str(cfg)])
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    metrics2 = json.loads(proc2.stdout.strip().splitlines()[-1])
    for key in ("rows", "parse_ok", "audio_ok", "violations", "repairs"):
        assert metrics2[key] == metrics[key]
    after = {str(p): p.stat().st_mtime_ns
             for p in list(out.rglob("*.parquet")) + list((out / "manifest").glob("*.json"))}
    assert after == before, "resume must not rewrite finished partitions"


def test_unknown_command_rejected():
    proc = _run_job(["frobnicate"], timeout=60)
    assert proc.returncode != 0


@pytest.mark.slow
def test_query_cli_list_run_and_write(tmp_path):
    import pyarrow.parquet as pq

    listing = _run_job(["query", "--list"], timeout=120)
    assert listing.returncode == 0
    names = listing.stdout.split()
    assert "token_stats_documents" in names
    assert "validate_clips" in listing.stdout     # rows-only tag present
    assert "[rows-only]" in listing.stdout

    out = tmp_path / "q.parquet"
    proc = _run_job(["query", "token_stats_documents",
                     "--sf-dir", "/root/testdata/sf0.001",
                     "-o", str(out), "--num-cpus", "4"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    info = json.loads(proc.stdout.strip().splitlines()[-1])
    assert info["rows"] == 500
    assert pq.read_table(out).num_rows == 500

    bad = _run_job(["query", "definitely_not_a_query", "--num-cpus", "4"],
                   timeout=120)
    assert bad.returncode == 2
