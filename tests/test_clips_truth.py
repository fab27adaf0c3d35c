"""The planted-defect ground-truth table and the flagship differential.

Two invariants:
  1. The committed truth parquet is exactly what tools/make_clips_truth.py
     regenerates — generator drift cannot silently stale the oracle input.
  2. The engine's verdict flags match the planted-defect expectation row by
     row at n=1000 (the fast in-suite version of the n=10000 driver oracle).
"""

from __future__ import annotations

import pyarrow.parquet as pq

from tools.make_clips_truth import TRUTH_COLS, clips_truth_table

TRUTH_PATH = "data/clips_truth_n10000_seed42.parquet"


def test_committed_truth_matches_generator():
    committed = pq.read_table(TRUTH_PATH)
    regenerated = clips_truth_table(10_000, seed=42)
    assert committed.schema.names == TRUTH_COLS
    assert regenerated.schema.names == TRUTH_COLS
    assert committed.num_rows == regenerated.num_rows == 10_000
    assert committed.equals(regenerated), (
        "data/clips_truth_n10000_seed42.parquet is stale — regenerate with "
        "PYTHONPATH=. python tools/make_clips_truth.py 10000 42 " + TRUTH_PATH)


def test_verdicts_match_planted_defects(ray_session):
    from engine.data.clips import cached_clips_dataset
    from engine.run import attach_fk_check, validate_clips_dataset

    n = 1_000
    checked = attach_fk_check(validate_clips_dataset(
        cached_clips_dataset(n, seed=42), batch_size=256))
    eng = checked.select_columns(
        ["clip_id", "sr_hz", "dur_ms", "codec", "speaker_id",
         "parse_ok", "meta_ok", "audio_ok", "fk_ok"]).to_pandas() \
        .sort_values(["clip_id", "dur_ms", "sr_hz", "codec"]).reset_index(drop=True)
    truth = clips_truth_table(n, seed=42).to_pandas()

    assert (eng["clip_id"].values == truth["clip_id"].values).all()
    defect = truth["defect"]
    expected_parse = defect != "junk"
    expected_meta = defect != "sr_out"
    expected_audio = ~defect.isin(["sr_out", "dur_lie", "audio_corrupt", "audio_trunc"])
    expected_fk = ~truth["orphan"]
    assert (eng["parse_ok"].values == expected_parse.values).all()
    assert (eng["meta_ok"].values == expected_meta.values).all()
    assert (eng["audio_ok"].values == expected_audio.values).all()
    assert (eng["fk_ok"].values == expected_fk.values).all()
    # The corpus actually exercises every check family at this size.
    assert set(defect.unique()) >= {"junk", "sr_out", "dur_lie",
                                    "audio_corrupt", "audio_trunc"}
    assert truth["orphan"].any()
