"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship clips-validation pipeline at sf0.001 scale.
``queries()`` exposes one callable per implemented operator family
(SURVEY.md §2 + training-data ops); ``oracle_sql()`` gives DuckDB
equivalents for the SQL-expressible ones.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa


def entry() -> Any:
    """Flagship: synthesize the sf0.001-scale clips table, run both check
    stages, return the verdict rows (Dataset)."""
    from engine.data.clips import clips_dataset
    from engine.run import VERDICT_COLS, attach_fk_check, validate_clips_dataset

    ds = clips_dataset(1_000, seed=42)
    checked = attach_fk_check(validate_clips_dataset(ds, batch_size=256))
    # Deterministic row order: clip_id alone is not unique (planted dup ids).
    return checked.select_columns(VERDICT_COLS).sort(
        ["clip_id", "dur_ms", "sr_hz", "codec", "text_len"])


# --------------------------------------------------------------------------
# rows-only (non-SQL-expressible) queries


def _validate_clips(sf_dir: str):
    from engine.data.clips import cached_clips_dataset, clips_count_for_sf_dir
    from engine.run import VERDICT_COLS, attach_fk_check, validate_clips_dataset

    n = min(clips_count_for_sf_dir(sf_dir), 10_000)
    ds = cached_clips_dataset(n, seed=42)
    checked = attach_fk_check(validate_clips_dataset(ds, batch_size=256))
    # Deterministic row order: clip_id alone is not unique (planted dup ids).
    return checked.select_columns(VERDICT_COLS).sort(
        ["clip_id", "dur_ms", "sr_hz", "codec", "text_len"])


def _clips_violations(sf_dir: str):
    from engine.data.clips import cached_clips_dataset, clips_count_for_sf_dir
    from engine.run import attach_fk_check, validate_clips_dataset
    from engine.stages import violations_batch

    n = min(clips_count_for_sf_dir(sf_dir), 10_000)
    ds = attach_fk_check(validate_clips_dataset(cached_clips_dataset(n, seed=42), batch_size=256))
    return ds.map_batches(violations_batch, batch_format="pyarrow",
                          zero_copy_batch=True).sort(["clip_id", "check", "message"])


def _minhash_near_dup(sf_dir: str):
    import ray.data

    from engine.ops.dedup import minhash_lsh_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs(docs, min_est_jaccard=0.5).sort(["a", "b"])


def _simhash_near_dup(sf_dir: str):
    import ray.data

    from engine.ops.dedup import simhash_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    return simhash_pairs(docs, max_hamming=3).sort(["a", "b"])


def _jaccard_near_dup(sf_dir: str):
    import ray.data

    from engine.ops.dedup import jaccard_verify, minhash_lsh_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    cand = minhash_lsh_pairs(docs, min_est_jaccard=0.4)
    cand = cand.map_batches(lambda t: t.select(["a", "b"]), batch_format="pyarrow",
                            zero_copy_batch=True)
    return jaccard_verify(cand, docs, min_jaccard=0.5).sort(["a", "b"])


def _knn_lsh_top10(sf_dir: str):
    import ray.data

    from engine.ops.similarity import knn_lsh
    from engine.queries import _query_vector

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    # Round before the global cut and tiebreak on vec_id (deterministic order
    # even with duplicate embeddings — same convention as knn_cosine_top10).
    cand = knn_lsh(emb, _query_vector(sf_dir), k=20, max_hamming=3,
                   keep_all_candidates=True, tie_round_decimals=5)
    return cand.sort(["sim", "vec_id"], descending=[True, False]).limit(10)


def _knn_ivf_top10(sf_dir: str):
    import ray.data

    from engine.ops.similarity import knn_ivf
    from engine.queries import _query_vector, ivf_centroids_for

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    # nprobe=32/64 cells: this corpus is near-isotropic, so high recall costs
    # a wide probe (tests/test_recall.py gates >=0.9 vs brute force).
    # Centroids are trained once per corpus and cached across invocations.
    cand = knn_ivf(emb, _query_vector(sf_dir), k=20, nprobe=32,
                   centroids=ivf_centroids_for(sf_dir),
                   keep_all_candidates=True, tie_round_decimals=5)
    return cand.sort(["sim", "vec_id"], descending=[True, False]).limit(10)


def _embedding_near_dup(sf_dir: str):
    import ray.data

    from engine.ops.similarity import near_dup_cosine_pairs

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    rows = near_dup_cosine_pairs(emb, threshold=0.9).sort(["a", "b"]).take_all()
    # Near-dup pairs are a small report; materialize with an explicit schema
    # so an empty result still carries its columns.
    return pa.table({
        "a": pa.array([r["a"] for r in rows], pa.int64()),
        "b": pa.array([r["b"] for r in rows], pa.int64()),
        "cosine": pa.array([r["cosine"] for r in rows], pa.float64()),
    })


def _quality_scores_documents(sf_dir: str):
    """Float quality/stopword scores (heuristic — rows-only; the integer
    sub-metrics are hash-oracled separately in lang_quality_documents)."""
    import ray.data

    from engine.ops.text import LangIdStage, TokenStatsStage

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    # Task pools: chained actor pools starve placement at low CPU counts.
    out = docs.map_batches(TokenStatsStage(), batch_format="pyarrow") \
        .map_batches(LangIdStage(), batch_format="pyarrow")
    return out.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "lang_pred": t.column("lang_pred"),
            "quality": pa.array(np.round(t.column("quality").to_numpy(), 4)),
            "stop_ratio": pa.array(np.round(t.column("stop_ratio").to_numpy(), 4)),
        }), batch_format="pyarrow", zero_copy_batch=True).sort("doc_id")


def _rolling_fingerprint(sf_dir: str):
    import ray.data

    from engine.ops.text import FingerprintStage

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    return docs.map_batches(FingerprintStage(), batch_format="pyarrow") \
        .map_batches(lambda t: t.select(["doc_id", "roll_fp"]), batch_format="pyarrow",
                     zero_copy_batch=True).sort("doc_id")


def _hll_distinct_users(sf_dir: str):
    import ray.data

    from engine.checks.sketches import HyperLogLog

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        h = HyperLogLog()
        h.update(batch.column("user_id").to_numpy())
        return pa.table({"state": pa.array([json.dumps(h.state())], pa.large_string())})

    def combine(states: list[dict]) -> dict:
        merged = HyperLogLog()
        for st in states:
            merged.merge(HyperLogLog.from_state(st))
        return merged.state()

    from engine.stages import tree_reduce_states
    state = tree_reduce_states(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True), combine)
    merged = HyperLogLog.from_state(state) if state else HyperLogLog()
    return pa.table({"n_users_approx": pa.array([int(round(merged.estimate()))], pa.int64())})


def _tdigest_quantity(sf_dir: str):
    import ray.data

    from engine.checks.sketches import TDigest

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        t = TDigest()
        t.update(batch.column("l_quantity").to_numpy())
        return pa.table({"state": pa.array([json.dumps(t.state())], pa.large_string())})

    def combine(states: list[dict]) -> dict:
        merged = TDigest()
        for st in states:
            merged.merge(TDigest.from_state(st))
        return merged.state()

    from engine.stages import tree_reduce_states
    state = tree_reduce_states(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True), combine)
    merged = TDigest.from_state(state) if state else TDigest()
    return pa.table({
        "p50": pa.array([round(merged.quantile(0.5), 2)]),
        "p95": pa.array([round(merged.quantile(0.95), 2)]),
        "p99": pa.array([round(merged.quantile(0.99), 2)]),
    })


def _audio_features(sf_dir: str):
    from engine.data.clips import cached_clips_dataset, clips_count_for_sf_dir
    from engine.ops.multimodal import AudioFeatureStage

    n = min(clips_count_for_sf_dir(sf_dir), 5_000)
    ds = cached_clips_dataset(n, seed=42)
    out = ds.map_batches(AudioFeatureStage, batch_format="pyarrow",
                         batch_size=256, concurrency=(1, 8))
    return out.map_batches(
        lambda t: pa.table({
            "clip_id": t.column("clip_id"),
            "decode_ok": t.column("decode_ok"),
            "n_samples": t.column("n_samples"),
            "rms": pa.array(np.round(t.column("rms").to_numpy(zero_copy_only=False), 4)),
        }), batch_format="pyarrow", zero_copy_batch=True).sort("clip_id")



def _image_metadata(sf_dir: str):
    """Synthesized mixed-format image corpus → real decode metadata
    (pure-numpy PPM/PGM/BMP/TGA codecs; 'unknown' rows take the fallback)."""
    import ray.data

    from engine.data.clips import clips_count_for_sf_dir
    from engine.data.images import synth_image_batch
    from engine.ops.multimodal import ImageDecodeStage

    n = min(clips_count_for_sf_dir(sf_dir), 5_000)
    ds = ray.data.range(n).map_batches(synth_image_batch, batch_format="pyarrow",
                                       zero_copy_batch=True)
    out = ds.map_batches(ImageDecodeStage, batch_format="pyarrow",
                         batch_size=512, concurrency=(1, 4))
    return out.map_batches(
        lambda t: pa.table({
            "img_id": t.column("img_id"),
            "img_format": t.column("img_format"),
            "width": t.column("width"),
            "height": t.column("height"),
            "mode": t.column("mode"),
            "mean_lum": pa.array(np.round(
                t.column("mean_lum").to_numpy(zero_copy_only=False), 3)),
            "decode_ok": t.column("decode_ok"),
        }), batch_format="pyarrow", zero_copy_batch=True).sort("img_id")


IMAGE_DIMS_N = 4096

IMAGE_DIMS_SQL = """
WITH ids AS (SELECT CAST(range AS BIGINT) AS i FROM range(4096)),
d AS (
  SELECT i, 305 + (SELECT SUM((i * 13 + j.j) % 256)
                   FROM (SELECT CAST(range AS BIGINT) AS j FROM range(11)) j) AS dsum
  FROM ids
)
SELECT i AS img_id,
  CASE WHEN i % 5 = 4 THEN 'unknown' WHEN i % 5 = 2 THEN 'bmp'
       WHEN i % 5 = 3 THEN 'tga' ELSE 'pnm' END AS img_format,
  CAST(CASE WHEN i % 5 = 4 THEN 64 + (dsum % 192)
            ELSE 16 + (i * 7) % 49 END AS INTEGER) AS width,
  CAST(CASE WHEN i % 5 = 4 THEN 64 + ((dsum * 7) % 192)
            ELSE 16 + (i * 11) % 37 END AS INTEGER) AS height,
  CASE WHEN i % 5 = 1 THEN 'L' ELSE 'RGB' END AS mode,
  (i % 5) <> 4 AS decode_ok
FROM d ORDER BY img_id
"""


def _image_dims(sf_dir: str):
    """Hash-oracled image decode: the REAL codecs must reproduce the
    generator's closed-form header metadata; the DuckDB oracle computes the
    same closed form over range() — the only oracle in the multimodal family
    (fallback rows included: the opaque-payload fake dims are modeled too)."""
    import ray.data

    from engine.data.images import synth_image_batch
    from engine.ops.multimodal import ImageDecodeStage

    ds = ray.data.range(IMAGE_DIMS_N).map_batches(
        synth_image_batch, batch_format="pyarrow", zero_copy_batch=True)
    out = ds.map_batches(ImageDecodeStage, batch_format="pyarrow",
                         batch_size=512, concurrency=(1, 4))
    return out.map_batches(
        lambda t: t.select(["img_id", "img_format", "width", "height",
                            "mode", "decode_ok"]),
        batch_format="pyarrow", zero_copy_batch=True).sort("img_id")


VIDEO_DIMS_N = 2048

VIDEO_DIMS_SQL = """
WITH ids AS (SELECT CAST(range AS BIGINT) AS i FROM range(2048))
SELECT i AS vid_id,
  (i % 7) <> 6 AS video_ok,
  CAST(CASE WHEN i % 7 = 6 THEN 0 ELSE 3 + i % 6 END AS BIGINT) AS total_frames,
  CAST(CASE WHEN i % 7 = 6 THEN 0 ELSE 5 + i % 20 END AS DOUBLE) AS fps,
  CAST(CASE WHEN i % 7 = 6 THEN 4
            ELSE least(3 + i % 6, 4) END AS BIGINT) AS n_sampled
FROM ids ORDER BY vid_id
"""


def _video_dims(sf_dir: str):
    """Hash-oracled video frame-sampling: the REAL PPMV index parse must
    reproduce the generator's closed-form header metadata (fallback rows —
    every 7th id is an opaque payload — modeled too).  Companion to
    image_dims: the multimodal decode paths both hash against SQL."""
    import ray.data

    from engine.data.images import synth_video_batch
    from engine.ops.multimodal import FrameSampleStage

    ds = ray.data.range(VIDEO_DIMS_N).map_batches(
        synth_video_batch, batch_format="pyarrow", zero_copy_batch=True)
    out = ds.map_batches(FrameSampleStage(n_frames=4), batch_format="pyarrow",
                         batch_size=512)
    return out.map_batches(
        lambda t: pa.table({
            "vid_id": t.column("vid_id"),
            "video_ok": t.column("video_ok"),
            "total_frames": t.column("total_frames"),
            "fps": t.column("fps"),
            "n_sampled": pa.array(
                [len(o) for o in t.column("frame_offsets").to_pylist()], pa.int64()),
        }), batch_format="pyarrow", zero_copy_batch=True).sort("vid_id")


def _video_frame_sample(sf_dir: str):
    """Synthesized PPMV clips → sampled-and-decoded frame metadata (real
    index-seek decode; every 7th payload exercises the fallback)."""
    import ray.data

    from engine.data.clips import clips_count_for_sf_dir
    from engine.data.images import synth_video_batch
    from engine.ops.multimodal import FrameSampleStage

    n = min(clips_count_for_sf_dir(sf_dir), 2_000)
    ds = ray.data.range(n).map_batches(synth_video_batch, batch_format="pyarrow",
                                       zero_copy_batch=True)
    out = ds.map_batches(FrameSampleStage, fn_constructor_kwargs={"n_frames": 4},
                         batch_format="pyarrow", batch_size=256, concurrency=(1, 4))
    return out.map_batches(
        lambda t: pa.table({
            "vid_id": t.column("vid_id"),
            "video_ok": t.column("video_ok"),
            "total_frames": t.column("total_frames"),
            "fps": t.column("fps"),
            "n_sampled": pa.array([len(o) for o in t.column("frame_offsets").to_pylist()],
                                  pa.int64()),
            "mean_frame_lum": pa.array([
                round(float(np.mean(l)), 3) if l else None
                for l in t.column("frame_lums").to_pylist()], pa.float64()),
        }), batch_format="pyarrow", zero_copy_batch=True).sort("vid_id")


def _drift_clips(sf_dir: str):
    """Distribution drift (PSI + KS) of this corpus vs the frozen baseline
    sketch — the north-star drift operator as a standalone query.  Sketch
    partials tree-reduce in workers; the report is per-column."""
    from engine.data.clips import cached_clips_dataset, clips_count_for_sf_dir
    from engine.run import drift_report, validate_clips_dataset
    from engine.stages import sketch_partials_batch, tree_merge_partials

    n = min(clips_count_for_sf_dir(sf_dir), 10_000)
    checked = validate_clips_dataset(cached_clips_dataset(n, seed=42), batch_size=512)
    partials = checked.map_batches(sketch_partials_batch, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()
    merged = tree_merge_partials(partials)
    rep = drift_report(merged["hists"])
    cols = sorted(c for c in rep if c != "available")
    return pa.table({
        "column": pa.array(cols, pa.string()),
        "psi": pa.array([rep[c]["psi"] for c in cols], pa.float64()),
        "ks": pa.array([rep[c]["ks"] for c in cols], pa.float64()),
        "drifted": pa.array([rep[c]["drifted"] for c in cols], pa.bool_()),
    })


def _codec_duration_quantiles(sf_dir: str):
    from engine.data.clips import cached_clips_dataset, clips_count_for_sf_dir
    from engine.stages import salted_group_digests

    n = min(clips_count_for_sf_dir(sf_dir), 10_000)
    ds = cached_clips_dataset(n, seed=42, columns=["clip_id", "codec", "dur_ms"])
    return salted_group_digests(ds, key="codec", value_col="dur_ms").sort("codec")


def queries() -> dict[str, Callable[[str], Any]]:
    from engine import queries as q

    def q_sample(sf_dir):
        return q.sample_documents(sf_dir)

    return {
        # SQL-oracled
        "q1_pricing_summary": q.q1_pricing_summary,
        "stats_lineitem_quantity": q.stats_lineitem_quantity,
        "grouped_stats_orderpriority": q.grouped_stats_orderpriority,
        "dedup_exact_documents": q.dedup_exact_documents,
        "distinct_users_events": q.distinct_users_events,
        "orphan_orders": q.orphan_orders,
        "orders_per_segment": q.orders_per_segment,
        "top10_orders": q.top10_orders,
        "repair_extract_events": q.repair_extract_events,
        "token_stats_documents": q.token_stats_documents,
        "fingerprint_md5_documents": q.fingerprint_md5_documents,
        "events_daily_by_type": q.events_daily_by_type,
        "knn_cosine_top10": q.knn_cosine_top10,
        "sessionize_events": q.sessionize_events,
        "revenue_by_segment_day": q.revenue_by_segment_day,
        "union_region_nation_names": q.union_region_nation_names,
        "sample_documents": q_sample,
        "lang_quality_documents": q.lang_quality_documents,
        "image_dims": _image_dims,
        "video_dims": _video_dims,
        # rows-only (approximate / non-SQL-expressible / synthetic clips table)
        "validate_clips": _validate_clips,
        "clips_violations": _clips_violations,
        "minhash_near_dup": _minhash_near_dup,
        "simhash_near_dup": _simhash_near_dup,
        "jaccard_near_dup": _jaccard_near_dup,
        "knn_lsh_top10": _knn_lsh_top10,
        "knn_ivf_top10": _knn_ivf_top10,
        "embedding_near_dup": _embedding_near_dup,
        "quality_scores_documents": _quality_scores_documents,
        "rolling_fingerprint": _rolling_fingerprint,
        "hll_distinct_users": _hll_distinct_users,
        "tdigest_quantity": _tdigest_quantity,
        "audio_features": _audio_features,
        "image_metadata": _image_metadata,
        "video_frame_sample": _video_frame_sample,
        "drift_clips": _drift_clips,
        "codec_duration_quantiles": _codec_duration_quantiles,
    }


def oracle_sql() -> dict[str, str]:
    from engine import queries as q

    return {
        "q1_pricing_summary": q.Q1_SQL,
        "stats_lineitem_quantity": q.STATS_QTY_SQL,
        "grouped_stats_orderpriority": q.GROUPED_ORDERS_SQL,
        "dedup_exact_documents": q.DEDUP_EXACT_SQL,
        "distinct_users_events": q.DISTINCT_USERS_SQL,
        "orphan_orders": q.ORPHAN_ORDERS_SQL,
        "orders_per_segment": q.ORDERS_PER_SEGMENT_SQL,
        "top10_orders": q.TOP10_ORDERS_SQL,
        "repair_extract_events": q.REPAIR_EXTRACT_SQL,
        "token_stats_documents": q.TOKEN_STATS_SQL,
        "fingerprint_md5_documents": q.FINGERPRINT_MD5_SQL,
        "events_daily_by_type": q.EVENTS_DAILY_SQL,
        "knn_cosine_top10": q.KNN_SQL,
        "sessionize_events": q.SESSIONIZE_SQL,
        "revenue_by_segment_day": q.REVENUE_SQL,
        "union_region_nation_names": q.UNION_SQL,
        "sample_documents": q.SAMPLE_DOCS_SQL,
        "lang_quality_documents": q.LANG_QUALITY_SQL,
        "image_dims": IMAGE_DIMS_SQL,
        "video_dims": VIDEO_DIMS_SQL,
    }
