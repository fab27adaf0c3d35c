"""Graded query implementations over the driver test tables.

Each function takes ``sf_dir`` and returns a small result (pyarrow Table or
Dataset) that matches its DuckDB oracle in ``__ray_entry__.oracle_sql`` by
column NAME and VALUE.  Conventions that make distributed float math
hash-stable against a single-process SQL engine:

  - money sums go through integer cents (order-independent exact int64 sums);
  - derived ratios are computed from those exact ints, then rounded;
  - cosine similarities are rounded after widening to float64 on both sides.

Every groupby here pre-aggregates inside ``map_batches`` (combiner pattern)
so the shuffle moves #batches x #groups partial rows, not raw rows.
"""

from __future__ import annotations

import functools
import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc



def _half_away_round(x, decimals: int):
    """Round half away from zero (SQL ROUND semantics) for derived doubles."""
    scale = 10.0 ** decimals
    scaled = np.asarray(x, dtype=np.float64) * scale
    return np.copysign(np.floor(np.abs(scaled) + 0.5), scaled) / scale


def _half_away_cents(x: np.ndarray, scale: float = 100.0) -> np.ndarray:
    """Round to integer scale units, half away from zero (matches SQL ROUND;
    numpy's np.round is banker's rounding and would disagree on .5 cents)."""
    scaled = x * scale
    return np.copysign(np.floor(np.abs(scaled) + 0.5), scaled).astype(np.int64)


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# --------------------------------------------------------------- TPC-H-ish Q1


def q1_pricing_summary(sf_dir: str):
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        # Loud guard: NaN.astype(int64) is INT64_MIN — silent corruption vs
        # SQL null semantics.  This corpus is null-free by contract; refuse
        # rather than corrupt if that changes.
        for c in ("l_quantity", "l_returnflag", "l_linestatus"):
            if batch.column(c).null_count:
                raise NotImplementedError(
                    f"q1 assumes null-free {c}; SQL-null aggregation semantics "
                    "are not implemented in this query")
        # Arrow-native combiner: one hash-aggregate kernel per batch, no
        # pandas object-dtype hop (round-4 VERDICT efficiency item 3).
        pairs = pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "qty": pa.array(batch.column("l_quantity").to_numpy().astype(np.int64)),
            "price_c": pa.array(_half_away_cents(batch.column("l_extendedprice").to_numpy())),
            "disc_c": pa.array(_half_away_cents(
                batch.column("l_extendedprice").to_numpy()
                * (1.0 - batch.column("l_discount").to_numpy()))),
        })
        g = pairs.group_by(["l_returnflag", "l_linestatus"], use_threads=False) \
            .aggregate([("qty", "sum"), ("price_c", "sum"), ("disc_c", "sum"),
                        ([], "count_all")])
        # One JSON state row per batch: the final merge is a keyed tree
        # reduction, not a 6-key groupby (whose mostly-empty range
        # partitions emit the zero-column blocks behind the RefBundle
        # schema warnings — same fix as distinct_users_by_type).
        st = {f"{rf}\x1f{ls}": [qty, price, disc, cnt]
              for rf, ls, qty, price, disc, cnt in zip(
                  g.column("l_returnflag").to_pylist(),
                  g.column("l_linestatus").to_pylist(),
                  g.column("qty_sum").to_pylist(),
                  g.column("price_c_sum").to_pylist(),
                  g.column("disc_c_sum").to_pylist(),
                  g.column("count_all").to_pylist())}
        return pa.table({"state": pa.array([json.dumps(st)], pa.large_string())})

    from engine.stages import keyed_tree_reduce

    merged = keyed_tree_reduce(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        lambda a, b: [x + y for x, y in zip(a, b)])
    keys = sorted(merged)
    flags = [k.split("\x1f") for k in keys]
    sum_qty = np.array([merged[k][0] for k in keys], dtype=np.int64)
    price_c = np.array([merged[k][1] for k in keys], dtype=np.float64)
    disc_c = np.array([merged[k][2] for k in keys], dtype=np.float64)
    cnt = np.array([merged[k][3] for k in keys], dtype=np.int64)
    return pa.table({
        "l_returnflag": pa.array([f[0] for f in flags], pa.string()),
        "l_linestatus": pa.array([f[1] for f in flags], pa.string()),
        "sum_qty": pa.array(sum_qty),
        "sum_base_price": pa.array(_half_away_round(price_c / 100.0, 2)),
        "sum_disc_price": pa.array(_half_away_round(disc_c / 100.0, 2)),
        "avg_qty": pa.array(_half_away_round(sum_qty / cnt, 4)),
        "count_order": pa.array(cnt),
    })


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0, 2) AS sum_base_price,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0, 2) AS sum_disc_price,
       ROUND(SUM(CAST(l_quantity AS BIGINT)) / CAST(COUNT(*) AS DOUBLE), 4) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ----------------------------------------------------------- global col stats


def stats_lineitem_quantity(sf_dir: str):
    from engine.checks.sketches import ColumnStats

    ds = _read(sf_dir, "lineitem", columns=["l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        s = ColumnStats()
        col = batch.column("l_quantity")
        values = col.to_numpy(zero_copy_only=False)
        nulls = col.null_count
        finite = values[~np.isnan(values)] if nulls else values
        s.update(finite, nulls)
        state = s.state()
        # Exact integer sum alongside the float sketch: the oracle-compared
        # average must be order-independent (the Welford mean's last-ulp error
        # varies with block count and can flip a .00005 rounding boundary).
        state["int_sum"] = int(finite.astype(np.int64).sum())
        return pa.table({"state": pa.array([json.dumps(state)], pa.large_string())})

    def combine(states: list[dict]) -> dict:
        merged = ColumnStats()
        int_sum = 0
        for st in states:
            st = dict(st)
            int_sum += st.pop("int_sum")
            merged.merge(ColumnStats.from_state(st))
        out = merged.state()
        out["int_sum"] = int_sum
        return out

    from engine.stages import tree_reduce_states
    state = tree_reduce_states(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True), combine)
    if state is None:            # empty input: zero-row summary, not a crash
        state = {**ColumnStats().state(), "int_sum": 0}
    int_sum = state.pop("int_sum")
    merged = ColumnStats.from_state(state)
    m = merged.summary()
    return pa.table({
        "cnt": pa.array([m["count"]], pa.int64()),
        "nulls": pa.array([m["nulls"]], pa.int64()),
        "min_qty": pa.array([m["min"]]),
        "max_qty": pa.array([m["max"]]),
        # Oracle divides by COUNT(*), which includes null rows — so must we.
        "avg_qty": pa.array([float(_half_away_round(
            int_sum / max(m["count"] + m["nulls"], 1), 4))]),
    })


STATS_QTY_SQL = """
SELECT CAST(COUNT(l_quantity) AS BIGINT) AS cnt,
       CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
       CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
       CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
       ROUND(SUM(CAST(l_quantity AS BIGINT)) / CAST(COUNT(*) AS DOUBLE), 4) AS avg_qty
FROM lineitem
"""


# ----------------------------------------------- grouped stats on skewed key


def grouped_stats_orderpriority(sf_dir: str):
    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        pairs = pa.table({
            "o_orderpriority": batch.column("o_orderpriority"),
            "cents": pa.array(_half_away_cents(batch.column("o_totalprice").to_numpy())),
        })
        g = pairs.group_by(["o_orderpriority"], use_threads=False).aggregate(
            [([], "count_all"), ("cents", "sum"), ("cents", "min"), ("cents", "max")])
        # Keyed-tree-reduce finalize (see q1): one JSON state row per batch.
        st = {str(k): [n, s, lo, hi] for k, n, s, lo, hi in zip(
            g.column("o_orderpriority").to_pylist(),
            g.column("count_all").to_pylist(), g.column("cents_sum").to_pylist(),
            g.column("cents_min").to_pylist(), g.column("cents_max").to_pylist())}
        return pa.table({"state": pa.array([json.dumps(st)], pa.large_string())})

    from engine.stages import keyed_tree_reduce

    merged = keyed_tree_reduce(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        lambda a, b: [a[0] + b[0], a[1] + b[1],
                      min(a[2], b[2]), max(a[3], b[3])])
    keys = sorted(merged)
    return pa.table({
        "o_orderpriority": pa.array(keys, pa.string()),
        "n_orders": pa.array([merged[k][0] for k in keys], pa.int64()),
        "avg_price": pa.array(
            [float(_half_away_round(merged[k][1] / 100.0 / merged[k][0], 4))
             for k in keys], pa.float64()),
        "min_price": pa.array([merged[k][2] / 100.0 for k in keys], pa.float64()),
        "max_price": pa.array([merged[k][3] / 100.0 for k in keys], pa.float64()),
    })


GROUPED_ORDERS_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 / COUNT(*), 4) AS avg_price,
       CAST(ROUND(MIN(o_totalprice) * 100) AS BIGINT) / 100.0 AS min_price,
       CAST(ROUND(MAX(o_totalprice) * 100) AS BIGINT) / 100.0 AS max_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def _exact_dot(a: np.ndarray, b: np.ndarray, chunk: int = 4096) -> int:
    """Overflow-safe Σ a[i]*b[i] for int64 inputs: chunked int64 dot
    products accumulated into a Python int.  With |a*b| <= ~5e14 per
    element a 4096-chunk stays under 2^62; across chunks the Python int is
    arbitrary precision — the numpy twin of DuckDB's HUGEINT SUM."""
    tot = 0
    for s in range(0, a.size, chunk):
        tot += int(np.dot(a[s:s + chunk], b[s:s + chunk]))
    return tot


def corr_stats_by_returnflag(sf_dir: str):
    """Bivariate statistical aggregates (CORR / COVAR_SAMP / COVAR_POP /
    REGR_SLOPE / REGR_INTERCEPT / R2) of quantity vs extendedprice per
    returnflag, from INTEGER-EXACT moment sums.

    Scale shape: the classic one-pass parallel moments combiner — each
    batch emits one tiny state row holding (n, Σx, Σy, Σx², Σy², Σxy) per
    flag (cent-scaled ints, so sums are exact), keyed_tree_reduce merges
    them in Python arbitrary-precision ints (the HUGEINT twin), and the
    closed forms run once on the driver over 3 groups.  No shuffle at all;
    the exchange moves O(batches × flags) JSON rows regardless of skew."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        flags = np.asarray(batch.column("l_returnflag").to_pandas(), object)
        x = _half_away_cents(batch.column("l_quantity").to_numpy())
        y = _half_away_cents(batch.column("l_extendedprice").to_numpy())
        st: dict[str, list[int]] = {}
        for flag in np.unique(flags):
            m = flags == flag
            xm, ym = x[m], y[m]
            st[str(flag)] = [int(xm.size), int(xm.sum()), int(ym.sum()),
                             _exact_dot(xm, xm), _exact_dot(ym, ym),
                             _exact_dot(xm, ym)]
        return pa.table({"state": pa.array([json.dumps(st)],
                                           pa.large_string())})

    from engine.stages import keyed_tree_reduce

    merged = keyed_tree_reduce(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        lambda a, b: [a[i] + b[i] for i in range(6)])
    keys = sorted(merged)
    rows = {"flag": [], "n": [], "corr_qp": [], "covar_samp_qp": [],
            "covar_pop_qp": [], "regr_slope_qp": [],
            "regr_intercept_qp": [], "r2_qp": []}
    for k in keys:
        n, sx, sy, sxx, syy, sxy = merged[k]
        num = n * sxy - sx * sy               # exact Python ints throughout
        dxx = n * sxx - sx * sx
        dyy = n * syy - sy * sy
        fnum, fdxx, fdyy = float(num), float(dxx), float(dyy)
        rows["flag"].append(k)
        rows["n"].append(n)
        # Mirror the oracle's IEEE op order exactly (CAST-then-divide).
        rows["corr_qp"].append(float(_half_away_round(
            fnum / (np.sqrt(fdxx) * np.sqrt(fdyy)), 6)))
        rows["covar_samp_qp"].append(float(_half_away_round(
            fnum / float(n * (n - 1)) / 10000.0, 4)))
        rows["covar_pop_qp"].append(float(_half_away_round(
            fnum / float(n * n) / 10000.0, 4)))
        rows["regr_slope_qp"].append(float(_half_away_round(
            fnum / fdxx, 6)))
        rows["regr_intercept_qp"].append(float(_half_away_round(
            (float(sy) - fnum / fdxx * float(sx)) / float(n) / 100.0, 4)))
        rows["r2_qp"].append(float(_half_away_round(
            fnum * fnum / (fdxx * fdyy), 6)))
    return pa.table({
        "flag": pa.array(rows["flag"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "corr_qp": pa.array(rows["corr_qp"], pa.float64()),
        "covar_samp_qp": pa.array(rows["covar_samp_qp"], pa.float64()),
        "covar_pop_qp": pa.array(rows["covar_pop_qp"], pa.float64()),
        "regr_slope_qp": pa.array(rows["regr_slope_qp"], pa.float64()),
        "regr_intercept_qp": pa.array(rows["regr_intercept_qp"],
                                      pa.float64()),
        "r2_qp": pa.array(rows["r2_qp"], pa.float64()),
    })


CORR_STATS_SQL = """
WITH r AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
), s AS (
  SELECT flag, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM r GROUP BY flag
), d AS (
  SELECT flag, n, sx, sy,
         n * sxy - sx * sy AS num,
         n * sxx - sx * sx AS dxx,
         n * syy - sy * sy AS dyy
  FROM s
)
SELECT flag, CAST(n AS BIGINT) AS n,
  ROUND(CAST(num AS DOUBLE) /
        (SQRT(CAST(dxx AS DOUBLE)) * SQRT(CAST(dyy AS DOUBLE))), 6)
    AS corr_qp,
  ROUND(CAST(num AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) / 10000.0, 4)
    AS covar_samp_qp,
  ROUND(CAST(num AS DOUBLE) / CAST(n * n AS DOUBLE) / 10000.0, 4)
    AS covar_pop_qp,
  ROUND(CAST(num AS DOUBLE) / CAST(dxx AS DOUBLE), 6) AS regr_slope_qp,
  ROUND((CAST(sy AS DOUBLE)
         - CAST(num AS DOUBLE) / CAST(dxx AS DOUBLE) * CAST(sx AS DOUBLE))
        / CAST(n AS DOUBLE) / 100.0, 4) AS regr_intercept_qp,
  ROUND(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
        / (CAST(dxx AS DOUBLE) * CAST(dyy AS DOUBLE)), 6) AS r2_qp
FROM d ORDER BY flag
"""


# ------------------------------------------------------------------- dedup


def dedup_exact_documents(sf_dir: str):
    """Exact dedup, keep-first: shuffle 8-byte content hashes, not documents.

    (The text column is hashed inside map_batches; the groupby moves only
    (hash, doc_id) pairs — at petabyte scale this is the difference between
    shuffling keys and shuffling the corpus.)
    """
    from engine.checks.sketches import HyperLogLog

    def hash_text(batch: pa.Table) -> pa.Table:
        # 128-bit content key (two independent vectorized siphash passes —
        # see content_hash_128): a 64-bit key has an expected collision by
        # ~5B docs (birthday bound), which would silently merge distinct
        # documents at the scale this engine targets; 128 bits pushes that
        # past 10^18.  The oracle groups by text, so the hash itself is not
        # pinned to md5.
        from engine.ops.dedup import content_hash_128

        h1, h2 = content_hash_128(batch.column("text"))
        return pa.table({
            "h1": pa.array(h1), "h2": pa.array(h2),
            "doc_id": batch.column("doc_id"),
        })

    return _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(hash_text, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["h1", "h2"]).min("doc_id") \
        .map_batches(lambda t: t.select(["min(doc_id)"]).rename_columns(["doc_id"]),
                     batch_format="pyarrow", zero_copy_batch=True) \
        .sort("doc_id")


DEDUP_EXACT_SQL = "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id"


def distinct_users_events(sf_dir: str):
    n = _read(sf_dir, "events", columns=["user_id"]).groupby("user_id").count().count()
    return pa.table({"n_users": pa.array([n], pa.int64())})


DISTINCT_USERS_SQL = "SELECT COUNT(DISTINCT user_id) AS n_users FROM events"


def distinct_users_by_type(sf_dir: str):
    """EXACT grouped COUNT DISTINCT — the per-group companion of
    distinct_users_events.  Per-batch (type, user) dedup partials bound
    the first shuffle to distinct pairs per batch; the 2-key groupby
    dedups globally; the per-type count then finalizes as a keyed tree
    reduction (NOT a second groupby: 5 event types range-partitioned
    across N blocks leave ~N-5 empty partitions, whose zero-column
    blocks caused the RefBundle schema warnings in BENCH_r03).  The
    driver builds the tiny report with an explicit schema, so an empty
    input still yields a typed empty table matching DuckDB.  The
    approximate per-group path is hll_users_by_type (one HLL sketch per
    group, merged per type), accuracy-gated against this query in tests.
    """
    from engine.stages import keyed_tree_reduce

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def dedup_partial(batch: pa.Table) -> pa.Table:
        # Arrow hash-aggregate with no value columns == per-batch DISTINCT.
        return batch.select(["event_type", "user_id"]) \
            .group_by(["event_type", "user_id"], use_threads=False).aggregate([])

    pairs = ds.map_batches(dedup_partial, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby(["event_type", "user_id"]).count()

    def count_partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("event_type"))
        return pa.table({"state": pa.array(
            [json.dumps({str(k): int(v) for k, v in zip(
                vc.field("values").to_pylist(), vc.field("counts").to_pylist())})],
            pa.large_string())})

    merged = keyed_tree_reduce(
        pairs.map_batches(count_partial, batch_format="pyarrow",
                          zero_copy_batch=True),
        lambda a, b: a + b)
    keys = sorted(merged)
    return pa.table({"event_type": pa.array(keys, pa.string()),
                     "n_users": pa.array([merged[k] for k in keys], pa.int64())})


DISTINCT_BY_TYPE_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def hll_users_by_type(sf_dir: str):
    """Approximate per-group distinct users: one HLL per (batch, type)
    partial, merged per type with a keyed tree reduction (no groupby at
    all — a 5-key groupby range-partitions into mostly-empty partitions,
    the BENCH_r03 RefBundle-schema-warning source; the tree moves only
    ``types x fan-in`` 16 KB register blobs per round and never user
    ids).  Driver builds the report with an explicit schema, so an
    empty input still yields a typed empty table."""
    import pandas as pd

    from engine.checks.sketches import HyperLogLog
    from engine.stages import keyed_tree_reduce

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type").to_pandas()
        users = batch.column("user_id").to_numpy()
        states = {}
        for t, idx in pd.Series(users).groupby(types).indices.items():
            h = HyperLogLog()
            h.update(users[idx])
            states[str(t)] = h.state()
        return pa.table({"state": pa.array([json.dumps(states)],
                                           pa.large_string())})

    def merge_pair(a: dict, b: dict) -> dict:
        h = HyperLogLog.from_state(a)
        h.merge(HyperLogLog.from_state(b))
        return h.state()

    merged = keyed_tree_reduce(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        merge_pair)
    keys = sorted(merged)
    return pa.table({
        "event_type": pa.array(keys, pa.string()),
        "n_users_est": pa.array(
            [int(round(HyperLogLog.from_state(merged[k]).estimate()))
             for k in keys], pa.int64()),
    })


# -------------------------------------------------------------- referential


def orphan_orders(sf_dir: str):
    """Orders whose customer key has no match: broadcast Bloom prefilter,
    exact broadcast-set verify (dimension side is the small side)."""
    import ray

    from engine.checks.sketches import BloomFilter

    from engine.stages import fk_orphans_semijoin

    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    if cust.count() > DIM_BROADCAST_MAX_ROWS:
        # Dimension too large for a driver-held set: exact shuffle anti-join
        # with o_orderkey carried through the tagged union, so the report
        # streams end to end — no driver-held orphan-key set + second full
        # scan (round-2 VERDICT item 4: if referential integrity is broken
        # en masse, that set IS the blowup the check exists to detect).
        return fk_orphans_semijoin(
            orders, cust, fact_key="o_custkey", dim_key="c_custkey",
            fact_payload=["o_orderkey"],
        ).select_columns(["o_orderkey"]).sort("o_orderkey")

    key_batches = [np.asarray(b["c_custkey"]) for b in
                   cust.iter_batches(batch_format="numpy", batch_size=65536)]
    keys = (np.concatenate(key_batches) if key_batches
            else np.empty(0, dtype=np.int64))
    bloom = BloomFilter(max(len(keys), 1024), 1e-4)
    bloom.add(keys)
    exact = set(keys.tolist())  # dimension side is small; exact verify set
    bloom_ref = ray.put(bloom.state())
    exact_ref = ray.put(exact)

    def probe(batch: pa.Table) -> pa.Table:
        import pandas as pd

        from engine.stages import _bloom_from_ref, _broadcast_from_ref

        bf = _bloom_from_ref(bloom_ref)     # per-worker deserialize-once
        ck = batch.column("o_custkey").to_numpy()
        # Bloom negatives are definite orphans (no false negatives); positives
        # carry the fp rate, so exact-verify them — the graded contract is
        # exact equality with the LEFT JOIN oracle.
        maybe_present = bf.contains(ck)
        present = np.zeros(ck.size, dtype=bool)
        if maybe_present.any():
            truth = _broadcast_from_ref(exact_ref)   # per-worker fetch-once
            present[maybe_present] = pd.Series(ck[maybe_present]).isin(truth).to_numpy()
        rows = batch.column("o_orderkey").to_numpy()[~present]
        return pa.table({"o_orderkey": pa.array(rows)})

    ds = orders \
        .map_batches(probe, batch_format="pyarrow", zero_copy_batch=True).sort("o_orderkey")
    # Orphans are a violation report, NORMALLY small — but an adversarial
    # input (dimension table lost) makes every order an orphan, and an
    # unconditional take_all would then pull the fact table onto the driver
    # (round-3 VERDICT wrong-item 3).  Pin the lineage once, count, and only
    # driver-materialize under the cap (explicit schema so an empty report
    # still carries its typed column); above it, hand back the streaming
    # Dataset — blocks stay in the (spillable) object store.
    mat = ds.materialize()
    if mat.count() > ORPHAN_REPORT_DRIVER_CAP:
        return mat
    rows = [r["o_orderkey"] for r in mat.take_all()]
    return pa.table({"o_orderkey": pa.array(rows, pa.int64())})


ORPHAN_ORDERS_SQL = """
SELECT o_orderkey FROM orders LEFT JOIN customer ON o_custkey = c_custkey
WHERE c_custkey IS NULL ORDER BY o_orderkey
"""


# Above this many dimension rows, a broadcast lookup stops being "small" and
# the query falls through to a partitioned hash join (round-1 VERDICT
# finding 4: the gate must be enforced in code, not prose).
DIM_BROADCAST_MAX_ROWS = 8_000_000

# Violation reports larger than this stay a streaming Dataset instead of a
# driver-side pyarrow Table (an all-orphan fact table must not take_all).
ORPHAN_REPORT_DRIVER_CAP = 1_000_000


def _dim_code_lookup(ds, key_col: str, val_col: str):
    """Compact key→value broadcast state for any dimension: a BroadcastMap
    of int64 keys → dictionary codes plus the unique value strings —
    ~9 bytes/row instead of a Python dict's ~100.  Arrow-native build
    (iter_batches → concat → zero-copy factorize), never per-row Python."""
    import pandas as pd

    from engine.stages import BroadcastMap

    parts = list(ds.iter_batches(batch_format="pyarrow", batch_size=65536))
    if not parts:                # empty dimension: empty map, no values
        return BroadcastMap(np.empty(0, dtype=np.int64),
                            np.empty(0, dtype=np.int8)), []
    t = pa.concat_tables(parts)
    codes, uniques = pd.factorize(t.column(val_col).to_pandas())
    values: list[str | None] = [str(u) for u in uniques]
    if (codes < 0).any():
        # factorize marks NULLs as -1; map them to an explicit None entry so
        # lookups group them like SQL's GROUP BY (round-2 advice —
        # uniq_arr.take(-1) would otherwise wrap/crash downstream).
        codes = np.where(codes < 0, len(values), codes)
        values.append(None)
    # Code dtype sized to the dictionary: int8 silently wraps past 127
    # distinct values (round-2 advice).
    for dt in (np.int8, np.int16, np.int32):
        if len(values) <= np.iinfo(dt).max:
            break
    bm = BroadcastMap(t.column(key_col).to_numpy(), codes.astype(dt))
    return bm, values


def _segment_lookup(cust_ds):
    return _dim_code_lookup(cust_ds, "c_custkey", "c_mktsegment")


def orders_per_segment(sf_dir: str):
    """Dimension join, size-gated: broadcast the customer→segment lookup when
    it is genuinely small (sorted-array + dict-codes, shipped once via
    ray.put), else a partitioned hash join sized by ``shuffle_partitions``."""
    import ray

    from engine.stages import shuffle_partitions

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    if cust.count() <= DIM_BROADCAST_MAX_ROWS:
        bm, uniques = _segment_lookup(cust)
        lut_ref = ray.put(bm)

        def tag(batch: pa.Table) -> pa.Table:
            from engine.stages import _broadcast_from_ref

            code, found = _broadcast_from_ref(lut_ref).lookup(
                batch.column("o_custkey").to_numpy())
            counts = np.bincount(code[found], minlength=len(uniques))
            return pa.table({
                "c_mktsegment": pa.array(uniques, pa.string()),
                "n": pa.array(counts.astype(np.int64)),
            })

        tagged = orders.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    else:
        joined = orders.join(
            cust, join_type="inner",
            num_partitions=shuffle_partitions(orders.count()),
            on=("o_custkey",), right_on=("c_custkey",))

        def partial_counts(batch: pa.Table) -> pa.Table:
            vc = pc.value_counts(batch.column("c_mktsegment"))
            return pa.table({"c_mktsegment": pc.cast(vc.field("values"), pa.string()),
                             "n": vc.field("counts")})

        tagged = joined.map_batches(partial_counts, batch_format="pyarrow",
                                    zero_copy_batch=True)

    def to_state(batch: pa.Table) -> pa.Table:
        st: dict[str, int] = {}
        for k, v in zip(batch.column("c_mktsegment").to_pylist(),
                        batch.column("n").to_numpy()):
            st[k] = st.get(k, 0) + int(v)
        return pa.table({"state": pa.array([json.dumps(st)], pa.large_string())})

    from engine.stages import keyed_tree_reduce

    # Keyed-tree-reduce finalize (see q1): 5 segments range-partitioned
    # across N blocks would leave ~N-5 empty zero-column partitions.
    merged = keyed_tree_reduce(
        tagged.map_batches(to_state, batch_format="pyarrow",
                           zero_copy_batch=True),
        lambda a, b: a + b)
    keys = sorted(k for k, v in merged.items() if v > 0)
    return pa.table({
        "c_mktsegment": pa.array(keys, pa.string()),
        "order_cnt": pa.array([merged[k] for k in keys], pa.int64()),
    })


ORDERS_PER_SEGMENT_SQL = """
SELECT c_mktsegment, COUNT(*) AS order_cnt
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


#: (band, lo, hi) half-open price bands — the broadcast small side of the
#: range join.  Names chosen so string sort order is stable (both sides
#: ORDER BY band as a string).
PRICE_BANDS = [
    ("band1_lt50k", 0.0, 50_000.0),
    ("band2_50k_150k", 50_000.0, 150_000.0),
    ("band3_150k_300k", 150_000.0, 300_000.0),
    ("band4_300k_450k", 300_000.0, 450_000.0),
    ("band5_ge450k", 450_000.0, float("inf")),
]


def orders_price_bands(sf_dir: str):
    """RANGE (banded non-equi) JOIN — the canonical broadcast shape: each
    order joins the band whose half-open interval ``[lo, hi)`` contains
    ``o_totalprice``.  The band table is the SMALL side, so instead of any
    shuffle the sorted interior boundaries ride the task closure and every
    batch resolves its band memberships with ONE ``np.searchsorted`` —
    a vectorized non-equi join probe; per-band partials then merge through
    the keyed tree reduction, so band skew (most orders in one band) never
    concentrates on a shuffle partition.  Per-BATCH sums use float64
    bincount weights (exact: batch_rows x max_cents < 2^53); the
    cross-batch merge is arbitrary-precision Python int, so the total is
    exact at any corpus size.  Empty bands are omitted, exactly like the
    SQL INNER JOIN; boundary hits are IEEE double compares on both sides.
    """
    from engine.stages import keyed_tree_reduce

    names = [b[0] for b in PRICE_BANDS]
    interior = np.array([b[1] for b in PRICE_BANDS[1:]], dtype=np.float64)

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("o_totalprice").to_numpy()
        idx = np.searchsorted(interior, v, side="right")   # [lo, hi) bands
        cents = _half_away_cents(v)
        cnt = np.bincount(idx, minlength=len(names))
        sums = np.bincount(idx, weights=cents.astype(np.float64),
                           minlength=len(names))
        st = {names[i]: [int(cnt[i]), int(sums[i])]
              for i in range(len(names)) if cnt[i]}
        return pa.table({"state": pa.array([json.dumps(st)],
                                           pa.large_string())})

    merged = keyed_tree_reduce(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        lambda a, b: [a[0] + b[0], a[1] + b[1]])
    keys = sorted(merged)
    return pa.table({
        "band": pa.array(keys, pa.string()),
        "n_orders": pa.array([merged[k][0] for k in keys], pa.int64()),
        "sum_price": pa.array(
            [float(_half_away_round(merged[k][1] / 100.0, 2)) for k in keys],
            pa.float64()),
    })


ORDERS_PRICE_BANDS_SQL = """
WITH bands(band, lo, hi) AS (VALUES
  ('band1_lt50k', 0.0, 50000.0),
  ('band2_50k_150k', 50000.0, 150000.0),
  ('band3_150k_300k', 150000.0, 300000.0),
  ('band4_300k_450k', 300000.0, 450000.0),
  ('band5_ge450k', 450000.0, 1e308))
SELECT band, COUNT(*) AS n_orders,
       ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
         AS sum_price
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band ORDER BY band
"""


# ------------------------------------------------------------------ sort/topk


def top10_orders(sf_dir: str):
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "o_totalprice": pa.array(
                _half_away_cents(batch.column("o_totalprice").to_numpy()) / 100.0),
        })

    return ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True) \
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


TOP10_ORDERS_SQL = """
SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) / 100.0 AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# ------------------------------------------------------------ repair/extract


def repair_extract_events(sf_dir: str):
    """Tolerant-parse events.props, extract $.k as BIGINT (repair kernel in the loop)."""
    from engine.repair.api import loads as tolerant_loads

    def extract(batch: pa.Table) -> pa.Table:
        ks = []
        for s in batch.column("props").to_pylist():
            try:
                v = json.loads(s)
            except (json.JSONDecodeError, TypeError, ValueError):
                v = tolerant_loads(s, skip_json_loads=True)
            ks.append(int(v["k"]) if isinstance(v, dict) and "k" in v else None)
        return pa.table({"event_id": batch.column("event_id"),
                         "k": pa.array(ks, pa.int64())})

    return _read(sf_dir, "events", columns=["event_id", "props"]) \
        .map_batches(extract, batch_format="pyarrow", zero_copy_batch=True).sort("event_id")


REPAIR_EXTRACT_SQL = """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events ORDER BY event_id
"""


def stream_stable_events(sf_dir: str):
    """Table-level ``stream_stable`` differential (reference spec:
    tests/test_json_repair.py:286-300): each event derives a deterministic
    transcript ``{"m": "a\\nb<k>"}`` (literal backslash-n escape inside the
    string) and two ACCUMULATION POINTS of it — the prefixes a streaming
    consumer would hold at times t1 < t2, planted by event_id % 3 to land
    mid-escape (after the backslash / after the ``n``) or mid-string:

        cls 0: t1 ends after the backslash, t2 after the ``n``
        cls 1: t1 ends after the ``n``,     t2 is the complete document
        cls 2: t1 ends mid-string (clean),  t2 is the complete document

    Both prefixes are repaired twice — stream_stable=True and False — and
    ``prefix_stable_*`` reports the monotone-prefix property: the repaired
    output at t1, minus its auto-closing ``"}``, is a prefix of the repaired
    output at t2.  With stream_stable=True this holds for every class; with
    the default it FAILS for cls 0 (the dangling backslash is escaped into
    the value at t1, then vanishes at t2) — exactly the instability the flag
    exists to remove.  Every output cell has a closed form in the planted
    inputs, so the whole table hash-matches a pure-SQL oracle.
    """
    from engine.repair.api import repair_json as _repair

    def per_row(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id").to_pylist()
        ks = [json.loads(s)["k"] for s in batch.column("props").to_pylist()]
        out = {"event_id": ids, "r1_stable": [], "r2_stable": [],
               "prefix_stable": [], "r1_default": [], "r2_default": [],
               "prefix_default": []}
        for eid, k in zip(ids, ks):
            full = '{"m": "a\\nb%d"}' % k
            cls = eid % 3
            if cls == 0:
                t1, t2 = full[:9], full[:10]       # ...a\   /  ...a\n
            elif cls == 1:
                t1, t2 = full[:10], full           # ...a\n  /  complete
            else:
                t1, t2 = full[:-2], full           # mid-string / complete
            for flag, r1_col, r2_col, p_col in (
                    (True, "r1_stable", "r2_stable", "prefix_stable"),
                    (False, "r1_default", "r2_default", "prefix_default")):
                r1 = _repair(t1, stream_stable=flag, skip_json_loads=True)
                r2 = _repair(t2, stream_stable=flag, skip_json_loads=True)
                out[r1_col].append(r1)
                out[r2_col].append(r2)
                out[p_col].append(r2.startswith(r1[:-2]))
        return pa.table({
            "event_id": pa.array(out["event_id"]),
            "r1_stable": pa.array(out["r1_stable"], pa.string()),
            "r2_stable": pa.array(out["r2_stable"], pa.string()),
            "prefix_stable": pa.array(out["prefix_stable"], pa.bool_()),
            "r1_default": pa.array(out["r1_default"], pa.string()),
            "r2_default": pa.array(out["r2_default"], pa.string()),
            "prefix_default": pa.array(out["prefix_default"], pa.bool_()),
        })

    return _read(sf_dir, "events", columns=["event_id", "props"]) \
        .map_batches(per_row, batch_format="pyarrow", zero_copy_batch=True) \
        .sort("event_id")


#: Schema for the typed-extract differential: integer coercion on ``k``
#: (planted as a quoted string in every class), plus a default-filled
#: ``src`` — the C10 parser↔schema bridge surface, projected to columns.
TYPED_EXTRACT_SCHEMA = {
    "type": "object",
    "properties": {"k": {"type": "integer"}, "tag": {"type": "string"},
                   "score": {"type": "number"}, "flag": {"type": "boolean"},
                   "src": {"type": "string", "default": "evt"}},
    "required": ["k", "tag", "score", "flag"],
}


def repair_typed_extract_events(sf_dir: str):
    """Typed-column projection of SCHEMA-GUIDED repair (the natural
    user-facing surface of the parser↔schema bridge): each event derives a
    deterministic transcript carrying four typed fields with ``k`` planted
    as a quoted string, malformed by event_id % 4 — unquoted keys + single
    quotes / trailing comma / dropped closing brace / valid JSON.  The
    kernel repairs each row against ``TYPED_EXTRACT_SCHEMA`` (coercing
    ``"k"``→int, filling the ``src`` default), and the schema-known scalar
    fields land in REAL Arrow columns (int64/string/float64/bool/string)
    instead of a serialized JSON string.  Every field has a closed form in
    the planted input, so the typed table hash-matches a pure-SQL oracle.
    """
    from engine.repair.api import repair_json as _repair

    def per_row(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id").to_pylist()
        ks = [json.loads(s)["k"] for s in batch.column("props").to_pylist()]
        out = {"k": [], "tag": [], "score": [], "flag": [], "src": []}
        for eid, k in zip(ids, ks):
            tag, score, flag = f"t{eid % 5}", k / 4.0, eid % 2 == 0
            cls = eid % 4
            if cls == 0:
                text = "{k: '%d', tag: '%s', score: %s, flag: %s}" % (
                    k, tag, score, str(flag).lower())
            elif cls == 1:
                text = '{"k": "%d", "tag": "%s", "score": %s, "flag": %s,}' % (
                    k, tag, score, str(flag).lower())
            elif cls == 2:
                text = '{"k": "%d", "tag": "%s", "score": %s, "flag": %s' % (
                    k, tag, score, str(flag).lower())
            else:
                text = '{"k": "%d", "tag": "%s", "score": %s, "flag": %s}' % (
                    k, tag, score, str(flag).lower())
            v = _repair(text, schema=TYPED_EXTRACT_SCHEMA, return_objects=True,
                        skip_json_loads=True)
            for col in ("k", "tag", "score", "flag", "src"):
                out[col].append(v[col])
        return pa.table({
            "event_id": pa.array(ids),
            "k": pa.array(out["k"], pa.int64()),
            "tag": pa.array(out["tag"], pa.string()),
            "score": pa.array(out["score"], pa.float64()),
            "flag": pa.array(out["flag"], pa.bool_()),
            "src": pa.array(out["src"], pa.string()),
        })

    return _read(sf_dir, "events", columns=["event_id", "props"]) \
        .map_batches(per_row, batch_format="pyarrow", zero_copy_batch=True) \
        .sort("event_id")


TYPED_EXTRACT_SQL = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       't' || CAST(event_id % 5 AS VARCHAR) AS tag,
       CAST(json_extract(props, '$.k') AS DOUBLE) / 4.0 AS score,
       (event_id % 2 = 0) AS flag,
       'evt' AS src
FROM events ORDER BY event_id
"""


# Closed forms of the repaired outputs per truncation class (single-quoted
# SQL literals: backslash is a literal character, so '\n' is two chars —
# exactly the escape sequence the repair kernel emits).
STREAM_STABLE_SQL = """
WITH e AS (
  SELECT event_id, event_id % 3 AS cls,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_id,
  CASE cls WHEN 0 THEN '{"m": "a"}'
           WHEN 1 THEN '{"m": "a\\n"}'
           ELSE '{"m": "a\\nb' || k || '"}' END AS r1_stable,
  CASE cls WHEN 0 THEN '{"m": "a\\n"}'
           ELSE '{"m": "a\\nb' || k || '"}' END AS r2_stable,
  TRUE AS prefix_stable,
  CASE cls WHEN 0 THEN '{"m": "a\\\\"}'
           WHEN 1 THEN '{"m": "a"}'
           ELSE '{"m": "a\\nb' || k || '"}' END AS r1_default,
  CASE cls WHEN 0 THEN '{"m": "a"}'
           ELSE '{"m": "a\\nb' || k || '"}' END AS r2_default,
  (cls <> 0) AS prefix_default
FROM e ORDER BY event_id
"""


_JSONL_CACHE_VERSION = "v1"


def _source_token(parquet_path: str) -> str:
    """Staleness key for /tmp caches derived from a parquet source: the
    source's (mtime_ns, size) — a regenerated corpus or a same-named dir at
    another path gets a fresh cache instead of silently serving stale rows
    (round-3 review finding)."""
    import os

    st = os.stat(parquet_path)
    return f"{st.st_mtime_ns:x}_{st.st_size:x}"


def _events_jsonl_cache(sf_dir: str) -> str:
    """Derive a JSONL TEXT form of the events table (one JSON object per
    line) with deterministic malformations planted by event_id:
    id%7==3 → closing brace dropped, id%7==5 → trailing comma inserted.
    Both are exactly recoverable by the repair kernel, so the parquet
    table remains the ground truth.  Built once per (sf, version) under
    /tmp, atomic rename (same recipe as the clips cache)."""
    import os

    src = f"{sf_dir}/events.parquet"
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = (f"/tmp/graft_events_jsonl_{_JSONL_CACHE_VERSION}_{tag}"
            f"_{_source_token(src)}.jsonl")
    if os.path.exists(path):
        return path
    import pyarrow.parquet as pq

    tbl = pq.read_table(src, columns=["event_id", "props"])
    # pid-suffixed tmp + atomic replace: concurrent builders write disjoint
    # files and the loser's finished copy replaces identically (the output
    # is deterministic), so a lost race can never publish interleaved bytes
    # (round-3 review finding — a shared ".tmp" truncates mid-write).
    tmp = f"{path}.{os.getpid()}.tmp"
    try:
        with open(tmp, "w", encoding="utf-8") as f:
            for eid, props in zip(tbl.column("event_id").to_pylist(),
                                  tbl.column("props").to_pylist()):
                line = json.dumps({"event_id": eid, "props": props},
                                  separators=(",", ":"))
                if eid % 7 == 3:
                    line = line[:-1]                  # drop the closing brace
                elif eid % 7 == 5:
                    line = line[:-1] + ",}"           # trailing comma
                f.write(line + "\n")
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def _repair_parse_lines(batch: pa.Table) -> pa.Table:
    """Shared line kernel of the JSONL / gzip-JSONL text sources: tolerant-
    parse each line, then parse the nested props JSON for $.k."""
    from engine.repair.api import loads as tolerant_loads

    eids, ks = [], []
    for line in batch.column("text").to_pylist():
        try:
            obj = json.loads(line)
        except (json.JSONDecodeError, TypeError, ValueError):
            obj = tolerant_loads(line, skip_json_loads=True)
        # NULL-on-invalid, mirroring SQL json_extract: a repair that
        # yields a non-dict, a missing/non-int event_id, or null props
        # becomes a NULL cell, never a worker-killing raise (round-3
        # ADVICE).
        if not isinstance(obj, dict):
            eids.append(None)
            ks.append(None)
            continue
        try:
            eids.append(int(obj["event_id"]))
        except (KeyError, TypeError, ValueError):
            eids.append(None)
        props = obj.get("props")
        v = None
        if props is not None:
            try:
                v = json.loads(props)
            except (json.JSONDecodeError, TypeError, ValueError):
                try:
                    v = tolerant_loads(props, skip_json_loads=True)
                except ValueError:
                    v = None
        try:
            ks.append(int(v["k"]) if isinstance(v, dict) and "k" in v
                      else None)
        except (TypeError, ValueError):
            ks.append(None)
    return pa.table({"event_id": pa.array(eids, pa.int64()),
                     "k": pa.array(ks, pa.int64())})


def jsonl_repair_events(sf_dir: str):
    """TEXT SOURCE + repair: the events table serialized as JSONL (with
    planted malformations — see _events_jsonl_cache), read back with
    ray.data.read_text, tolerant-parsed per line, and the nested props
    JSON parsed again for $.k — the reference's file-input surface
    (json.load over fds) re-expressed as a Dataset source.  The oracle
    reads the PARQUET ground truth, so a repair that failed to recover
    any line exactly would hash-mismatch."""
    import ray.data

    return ray.data.read_text(_events_jsonl_cache(sf_dir)).map_batches(
        _repair_parse_lines, batch_format="pyarrow",
        zero_copy_batch=True).sort("event_id")


_JSONL_GZ_SHARDS = 8


def _events_jsonl_compressed_cache(sf_dir: str, codec: str, ext: str) -> str:
    """Compressed-shard form of the JSONL text source (real 100-TB corpora
    ship compressed shards, never plain text).  Stream compressors are NOT
    splittable, so read parallelism equals shard count — the cache writes
    _JSONL_GZ_SHARDS contiguous-chunk shards, which is exactly how a
    production corpus keeps N-way parallelism per node.  Atomic publish via
    tmp-dir rename (same race discipline as the plaintext cache).  ``codec``
    is any pyarrow stream codec ("gzip", "zstd", ...)."""
    import os
    import shutil

    import pyarrow as _pa

    src = _events_jsonl_cache(sf_dir)
    path = src[: -len(".jsonl")] + f"_{ext}"
    if os.path.isdir(path):
        return path
    tmp = f"{path}.{os.getpid()}.tmp"
    os.makedirs(tmp, exist_ok=True)
    try:
        with open(src, "rb") as f:
            lines = f.readlines()
        per = max(1, -(-len(lines) // _JSONL_GZ_SHARDS))
        for i in range(0, _JSONL_GZ_SHARDS):
            chunk = lines[i * per:(i + 1) * per]
            if not chunk and i:
                break
            shard = os.path.join(tmp, f"shard-{i:03d}.jsonl.{ext}")
            with _pa.output_stream(shard, compression=codec) as g:
                g.write(b"".join(chunk))
        try:
            os.rename(tmp, path)
        except OSError:
            pass  # lost the publish race; the winner's copy is identical
    finally:
        if os.path.isdir(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
    return path


def _events_jsonl_gz_cache(sf_dir: str) -> str:
    return _events_jsonl_compressed_cache(sf_dir, "gzip", "gz")


def _jsonl_compressed_repair_events(sf_dir: str, codec: str, ext: str):
    """COMPRESSED TEXT SOURCE + repair: the same planted-malformation JSONL
    corpus as jsonl_repair_events, but compressed-sharded and decompressed
    STREAMING inside the read tasks (arrow_open_stream_args — no driver
    staging, no whole-file inflate).  Shares the line kernel and the
    parquet-ground-truth oracle, so a decompression or repair divergence
    hash-mismatches."""
    import ray.data

    path = _events_jsonl_compressed_cache(sf_dir, codec, ext)
    return ray.data.read_text(
        path, file_extensions=[ext],
        arrow_open_stream_args={"compression": codec}).map_batches(
        _repair_parse_lines, batch_format="pyarrow",
        zero_copy_batch=True).sort("event_id")


def jsonl_gz_repair_events(sf_dir: str):
    """Gzip-sharded JSONL source (see _jsonl_compressed_repair_events)."""
    return _jsonl_compressed_repair_events(sf_dir, "gzip", "gz")


def jsonl_zst_repair_events(sf_dir: str):
    """Zstd-sharded JSONL source — the other compression real corpora ship
    (see _jsonl_compressed_repair_events)."""
    return _jsonl_compressed_repair_events(sf_dir, "zstd", "zst")


# ------------------------------------------------------------- text analysis


def heavy_hitter_terms_documents(sf_dir: str):
    """Exact top-10 corpus terms via the two-pass Misra-Gries heavy-hitter
    sketch (engine/ops/text.py:heavy_hitter_terms): pass 1 merges bounded
    per-batch summaries, pass 2 exact-counts only the surviving candidates
    — no full-vocabulary shuffle at any scale."""
    from engine.ops.text import heavy_hitter_terms

    return heavy_hitter_terms(
        _read(sf_dir, "documents", columns=["text"]), k=10)


HEAVY_HITTERS_SQL = r"""
WITH t AS (
  SELECT unnest(regexp_extract_all(text, '[^	

 ]+')) AS term
  FROM documents
), c AS (SELECT term, COUNT(*) AS cnt FROM t GROUP BY term)
SELECT term, CAST(cnt AS BIGINT) AS cnt FROM c
ORDER BY cnt DESC, term LIMIT 10
"""


def token_stats_documents(sf_dir: str):
    def count_tokens(batch: pa.Table) -> pa.Table:
        from engine.ops.text import TOKEN_RE

        ws = pa.array([len(TOKEN_RE.findall(t or ""))
                       for t in batch.column("text").to_pylist()], pa.int64())
        return pa.table({"doc_id": batch.column("doc_id"), "ws_tokens": ws})

    return _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(count_tokens, batch_format="pyarrow", zero_copy_batch=True).sort("doc_id")


# Token class is the explicit RE2/ASCII whitespace complement — matches
# engine.ops.text.TOKEN_RE exactly on every input (not just ASCII corpora).
TOKEN_STATS_SQL = r"""
SELECT doc_id, CAST(length(regexp_extract_all(text, '[^\t\n\f\r ]+')) AS BIGINT) AS ws_tokens
FROM documents ORDER BY doc_id
"""


def top_terms_per_document(sf_dir: str, k: int = 3):
    """Per-doc top-3 characteristic terms (tf DESC, df ASC, term ASC) —
    the integer-exact tf-idf skeleton; see engine.ops.text.top_terms_per_doc
    for the wordcount-shuffle / size-gated df broadcast scale shape."""
    from engine.ops.text import top_terms_per_doc

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return top_terms_per_doc(ds, k=k).sort(["doc_id", "rank"])


TOP_TERMS_SQL = r"""
WITH td AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[^\t\n\f\r ]+')) AS term
  FROM documents
),
tdc AS (SELECT doc_id, term, COUNT(*) AS tf FROM td GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM tdc GROUP BY term),
ranked AS (
  SELECT tdc.doc_id, tdc.term, tdc.tf, dfreq.df,
         ROW_NUMBER() OVER (PARTITION BY tdc.doc_id
                            ORDER BY tdc.tf DESC, dfreq.df ASC, tdc.term ASC) AS rn
  FROM tdc JOIN dfreq USING (term)
)
SELECT doc_id, term, tf, df, CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= 3 ORDER BY doc_id, rank
"""


def fingerprint_md5_documents(sf_dir: str):
    from engine.ops.text import FingerprintStage

    return _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(FingerprintStage(), batch_format="pyarrow") \
        .map_batches(lambda t: t.select(["doc_id", "md5"]), batch_format="pyarrow",
                     zero_copy_batch=True) \
        .sort("doc_id")


FINGERPRINT_MD5_SQL = "SELECT doc_id, md5(text) AS md5 FROM documents ORDER BY doc_id"


def doc_regex_features(sf_dir: str):
    """Vectorized regex scalar functions (SURVEY §2 D9): first-match
    extraction, match counting and boolean match — all RE2 kernels
    (pyarrow.compute) running zero-copy inside map_batches, the exact
    engine twin of DuckDB's RE2-backed regexp_extract /
    regexp_extract_all / regexp_matches.  Stateless scan, pruned read,
    no shuffle; the only exchange is the final id sort."""
    import pyarrow.compute as pc

    def kernel(t: pa.Table) -> pa.Table:
        text = t.column("text")
        ex = pc.extract_regex(text, r"(?P<m>\b[a-z]*an[a-z]*\b)")
        return pa.table({
            "doc_id": t.column("doc_id"),
            "first_an": pc.fill_null(pc.struct_field(ex, "m"), ""),
            "n_sc": pc.cast(pc.count_substring_regex(text, r"sc[a-z]+"),
                            pa.int64()),
            "has_pair": pc.match_substring_regex(
                text, r"(batch|stream)\s+(batch|stream)"),
        })

    return _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True) \
        .sort("doc_id")


DOC_REGEX_SQL = r"""
SELECT doc_id,
  regexp_extract(text, '\b[a-z]*an[a-z]*\b') AS first_an,
  CAST(len(regexp_extract_all(text, 'sc[a-z]+')) AS BIGINT) AS n_sc,
  regexp_matches(text, '(batch|stream)\s+(batch|stream)') AS has_pair
FROM documents ORDER BY doc_id
"""


# ----------------------------------------------------------------- events agg


def events_daily_by_type(sf_dir: str):
    return _events_daily_agg(
        _read(sf_dir, "events", columns=["event_type", "ts", "value"]))


def _events_csv_cache(sf_dir: str) -> str:
    """Derive a CSV text form of (event_type, ts, value) — pyarrow's CSV
    writer emits ISO timestamps and shortest-round-trip doubles, so the
    text file carries exactly the parquet values.  pid-suffixed tmp +
    atomic replace (same race-safe recipe as the JSONL cache)."""
    import os

    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq

    src = f"{sf_dir}/events.parquet"
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = f"/tmp/graft_events_csv_v1_{tag}_{_source_token(src)}.csv"
    if os.path.exists(path):
        return path
    tbl = pq.read_table(src, columns=["event_type", "ts", "value"])
    tmp = f"{path}.{os.getpid()}.tmp"
    try:
        pacsv.write_csv(tbl, tmp)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def csv_events_daily(sf_dir: str):
    """CSV TEXT SOURCE: the same daily aggregate as events_daily_by_type but
    streamed from a derived CSV file via ray.data.read_csv (type inference
    recovers timestamp/double columns) — source-format coverage next to
    parquet, Lance-seam and JSONL.  Shares the oracle with the parquet
    query, so a lossy round-trip would hash-mismatch."""
    import ray.data

    return _events_daily_agg(ray.data.read_csv(_events_csv_cache(sf_dir)))


def csv_gz_events_daily(sf_dir: str):
    """gzip-COMPRESSED CSV source: real 100-TB text corpora ship as .gz
    shards, so the CSV reader must decompress STREAMING inside the read
    tasks (arrow_open_stream_args, same recipe as the gz/zst JSONL
    sources) — never driver-side.  Shares the daily-aggregate oracle with
    the parquet and plain-CSV queries."""
    import gzip
    import os

    import ray.data

    plain = _events_csv_cache(sf_dir)
    path = plain[:-4] + ".csv.gz"
    if not os.path.exists(path):
        tmp = f"{path}.{os.getpid()}.tmp"
        try:
            with open(plain, "rb") as fin, gzip.open(tmp, "wb", 6) as fout:
                fout.write(fin.read())
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return _events_daily_agg(ray.data.read_csv(
        path, arrow_open_stream_args={"compression": "gzip"}))


def _sharded_events_cache(sf_dir: str, fmt: str, ext: str,
                          write_fn) -> str:
    """Shard (event_type, ts, value) to /tmp once per corpus: token-keyed
    dir, _DONE marker, pid-tmp atomic renames; shard 0 always exists (an
    empty corpus still yields a readable source)."""
    import os

    import pyarrow.parquet as pq

    src = f"{sf_dir}/events.parquet"
    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/graft_events_{fmt}_v1_{tag}_{_source_token(src)}"
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    tbl = pq.read_table(src, columns=["event_type", "ts", "value"])
    os.makedirs(out_dir, exist_ok=True)
    n_shards = 4
    step = -(-tbl.num_rows // n_shards) if tbl.num_rows else 1
    for s in range(n_shards):
        part = tbl.slice(s * step, step)
        if part.num_rows == 0 and s > 0:
            continue
        tmp = os.path.join(out_dir, f"part-{s:02d}.{ext}.{os.getpid()}.tmp")
        try:
            write_fn(part, tmp)
            os.replace(tmp, os.path.join(out_dir, f"part-{s:02d}.{ext}"))
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    with open(done + f".{os.getpid()}.tmp", "w") as f:
        f.write("ok")
    os.replace(done + f".{os.getpid()}.tmp", done)
    return out_dir


def _events_orc_cache(sf_dir: str) -> str:
    import pyarrow.orc as paorc

    return _sharded_events_cache(sf_dir, "orc", "orc",
                                 lambda t, p: paorc.write_table(t, p))


def orc_events_daily(sf_dir: str):
    """ORC COLUMNAR SOURCE: the daily aggregate streamed from ORC shards —
    Ray Data has no native ORC reader, so this is the bring-your-own-format
    recipe: ``read_binary_files`` distributes the shard bytes and pyarrow's
    ORC reader decodes WITH COLUMN PRUNING inside each read task (the same
    seam a Lance/Avro reader would use).  Shares the daily-aggregate oracle
    with the parquet/CSV/JSONL queries, so a lossy round-trip
    hash-mismatches."""
    import ray.data

    def decode(batch: pa.Table) -> pa.Table:
        import pyarrow.orc as paorc

        parts = [paorc.ORCFile(pa.BufferReader(b.as_py())).read(
            columns=["event_type", "ts", "value"])
            for b in batch.column("bytes")]
        if not parts:
            # pyarrow's ORC reader widens timestamp[us] -> timestamp[ns];
            # the fallback must match or mixed block schemas reach the agg.
            return pa.table({"event_type": pa.array([], pa.string()),
                             "ts": pa.array([], pa.timestamp("ns")),
                             "value": pa.array([], pa.float64())})
        return pa.concat_tables(parts)

    ds = ray.data.read_binary_files(_events_orc_cache(sf_dir),
                                    file_extensions=["orc"])
    return _events_daily_agg(ds.map_batches(decode, batch_format="pyarrow",
                                            zero_copy_batch=True))


def _events_ipc_cache(sf_dir: str) -> str:
    import pyarrow.ipc as paipc

    def write_ipc(t, p):
        with paipc.new_file(p, t.schema) as w:
            w.write_table(t)

    return _sharded_events_cache(sf_dir, "ipc", "arrow", write_ipc)


def ipc_events_daily(sf_dir: str):
    """Arrow IPC / Feather SOURCE: the daily aggregate from IPC shards —
    ``read_binary_files`` + zero-copy ``pyarrow.ipc.open_file`` decode
    inside the read tasks (IPC is the wire format Arrow memory-maps, so
    this is the cheapest bring-your-own-format path of all).  Shares the
    daily-aggregate oracle with the parquet/CSV/JSONL/ORC variants."""
    import ray.data

    def decode(batch: pa.Table) -> pa.Table:
        import pyarrow.ipc as paipc

        parts = [paipc.open_file(pa.BufferReader(b.as_py())).read_all()
                 for b in batch.column("bytes")]
        if not parts:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "ts": pa.array([], pa.timestamp("us")),
                             "value": pa.array([], pa.float64())})
        return pa.concat_tables(parts)

    ds = ray.data.read_binary_files(_events_ipc_cache(sf_dir),
                                    file_extensions=["arrow"])
    return _events_daily_agg(ds.map_batches(decode, batch_format="pyarrow",
                                            zero_copy_batch=True))


def _events_daily_agg(ds):
    def partial(batch: pa.Table) -> pa.Table:
        pairs = pa.table({
            "event_type": batch.column("event_type"),
            "day": pc.strftime(batch.column("ts"), format="%Y-%m-%d"),
            "value_c": pa.array(_half_away_cents(batch.column("value").to_numpy(),
                                                 10000.0)),
        })
        g = pairs.group_by(["event_type", "day"], use_threads=False).aggregate(
            [([], "count_all"), ("value_c", "sum")])
        return g.rename_columns(["event_type", "day", "n", "sum_c"])

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch.column("event_type"),
            "day": batch.column("day"),
            "n": batch.column("sum(n)"),
            "sum_value": pa.array(_half_away_round(batch.column("sum(sum_c)").to_numpy() / 10000.0, 4)),
        })

    return ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["event_type", "day"]).sum(["n", "sum_c"]) \
        .map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True) \
        .sort(["event_type", "day"])


EVENTS_DAILY_SQL = """
SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n,
       ROUND(SUM(CAST(ROUND(value * 10000) AS BIGINT)) / 10000.0, 4) AS sum_value
FROM events GROUP BY event_type, day ORDER BY event_type, day
"""


# ------------------------------------------------------------------ similarity


def _query_vector(sf_dir: str):
    """Embedding of the minimum vec_id — loads ONE row, not the corpus:
    the id column locates the row, then a predicate-filtered read fetches
    just its vector (driver memory stays O(1) at any table size)."""
    import pyarrow.dataset as _pds
    import pyarrow.parquet as _pq

    ids = _pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
    min_id = pc.min(ids.column("vec_id")).as_py()
    row = _pds.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["embedding"], filter=_pds.field("vec_id") == min_id)
    return np.asarray(row.column("embedding")[0].as_py(), dtype=np.float32)


@functools.lru_cache(maxsize=8)
def _ivf_centroids_cached(sf_dir: str, source_token: str, n_cells: int,
                          train_sample: int):
    from engine.ops.similarity import train_ivf_centroids

    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    arr = train_ivf_centroids(ds, n_cells=n_cells, train_sample=train_sample)
    # Shared across callers via the cache: freeze so a caller mutation can't
    # poison later queries (round-3 ADVICE).
    arr.flags.writeable = False
    return arr


def ivf_centroids_for(sf_dir: str, n_cells: int = 64, train_sample: int = 4096):
    """IVF coarse-quantizer centroids, trained ONCE per (corpus, params) and
    reused across query invocations — a repeated-query workload must not pay
    the bounded-sample ``limit().take_all()`` every call (round-2 VERDICT
    item 6; same pattern as the cached query vector / Bloom states).

    The cache key includes the corpus staleness token (mtime+size of the
    embeddings parquet), so a regenerated corpus at the same path gets fresh
    centroids; the returned array is frozen (read-only)."""
    return _ivf_centroids_cached(
        sf_dir, _source_token(f"{sf_dir}/embeddings.parquet"),
        n_cells, train_sample)


def knn_cosine_top10(sf_dir: str):
    from engine.ops.similarity import knn_brute_force

    q = _query_vector(sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # tie_round_decimals=5 makes every LOCAL cut use (ROUND(sim,5) DESC,
    # vec_id) — the oracle's exact ordering — so rounding-tie rows are never
    # discarded by an unrounded argpartition before the global merge.
    candidates = knn_brute_force(ds, q, k=20, keep_all_candidates=True,
                                 tie_round_decimals=5)
    return candidates.sort(["sim", "vec_id"], descending=[True, False]).limit(10)


def knn_multi_top5(sf_dir: str, m: int = 8, k: int = 5):
    """Batch kNN for the m lowest-id query vectors in ONE corpus scan —
    see engine.ops.similarity.knn_multi_query.  Self-matches excluded;
    ordering is the oracle's (ROUND(sim,5) DESC, vec_id) per query."""
    from engine.ops.similarity import knn_multi_query

    # m lowest ids without a global sort: per-batch local min-m cut, then a
    # sort of the #batches x m candidate rows only (round-3 review finding).
    def local_min(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="mergesort")[:m]
        return batch.take(pa.array(take))

    qrows = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]) \
        .map_batches(local_min, batch_format="pyarrow", zero_copy_batch=True) \
        .sort("vec_id").limit(m).take_all()
    qids = [r["vec_id"] for r in qrows]
    qmat = np.asarray([r["embedding"] for r in qrows], dtype=np.float32)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return knn_multi_query(ds, qids, qmat, k=k).sort(["query_id", "rank"])


KNN_MULTI_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe
           FROM embeddings ORDER BY vec_id LIMIT 8),
s AS (
  SELECT q.query_id, e.vec_id,
         ROUND(CAST(list_cosine_similarity(e.embedding, q.qe) AS DOUBLE), 5) AS sim
  FROM embeddings e JOIN q ON e.vec_id <> q.query_id
),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, vec_id) AS rn FROM s)
SELECT query_id, vec_id, sim, CAST(rn AS BIGINT) AS rank
FROM r WHERE rn <= 5 ORDER BY query_id, rank
"""


KNN_SQL = """
SELECT vec_id,
       ROUND(CAST(list_cosine_similarity(embedding,
             (SELECT embedding FROM embeddings WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings))
             ) AS DOUBLE), 5) AS sim
FROM embeddings ORDER BY sim DESC, vec_id LIMIT 10
"""


# ---------------------------------------------------------------- sessionize


_SESSION_EMPTY = {
    "user_id": pa.array([], pa.int64()),
    "n_events": pa.array([], pa.int64()),
    "n_sessions": pa.array([], pa.int64()),
}


def _sessionize_single_stage(ds, gap_us: int, n_parts: int):
    """Salted-partition sessionization: every event of a user colocates in
    one partition task (simple, exact; a pathological bot user's whole
    history must fit that task — see _sessionize_two_stage for the hot-user-
    safe variant)."""

    def sessionize_partition(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return pa.table(_SESSION_EMPTY)
        uid = group.column("user_id").to_numpy()
        ts = group.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        new_session = new_user.copy()
        new_session[1:] |= (ts[1:] - ts[:-1]) > gap_us
        starts = np.flatnonzero(new_user)
        counts = np.diff(np.concatenate([starts, [n]]))
        sessions = np.add.reduceat(new_session.astype(np.int64), starts)
        return pa.table({
            "user_id": pa.array(uid[starts]),
            "n_events": pa.array(counts.astype(np.int64)),
            "n_sessions": pa.array(sessions),
        })

    return ds.map_batches(_user_part_fn(n_parts), batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("part").map_groups(sessionize_partition, batch_format="pyarrow")


def _sessionize_two_stage(ds, gap_us: int, n_parts: int, bucket_us: int):
    """Boundary-merge sessionization (round-2 VERDICT item 5): EXACT, and no
    single task ever holds one user's full history.

    Stage 1 buckets events by (user, ts // bucket_us) — disjoint, ordered
    time ranges — shuffles on hash(user, bucket) % n_parts, and sessionizes
    each (user, bucket) cell vectorized, emitting one summary row
    (n_events, n_sessions, first_ts, last_ts) per cell.  A hot user's events
    spread across as many cells as they span buckets.

    Stage 2 shuffles the SMALL summary rows on user % n_parts and stitches:
    cells of one user, sorted by first_ts, merge a session across each
    adjacent-cell boundary with first_ts[i+1] - last_ts[i] <= gap.  This is
    exact for any bucket width because cells of a user cover disjoint,
    consecutive time ranges — the associative merge the round-2 verdict
    asked for, not an approximation.
    """

    def bucket_cells(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "n_sessions": pa.array([], pa.int64()),
                "first_ts": pa.array([], pa.int64()),
                "last_ts": pa.array([], pa.int64()),
            })
        uid = group.column("user_id").to_numpy()
        bucket = group.column("bucket").to_numpy()
        ts = group.column("ts_us").to_numpy()
        order = np.lexsort((ts, bucket, uid))
        uid, bucket, ts = uid[order], bucket[order], ts[order]
        new_cell = np.empty(n, dtype=bool)
        new_cell[0] = True
        new_cell[1:] = (uid[1:] != uid[:-1]) | (bucket[1:] != bucket[:-1])
        new_session = new_cell.copy()
        new_session[1:] |= (ts[1:] - ts[:-1]) > gap_us
        starts = np.flatnonzero(new_cell)
        ends = np.concatenate([starts[1:], [n]]) - 1
        counts = np.diff(np.concatenate([starts, [n]]))
        sessions = np.add.reduceat(new_session.astype(np.int64), starts)
        return pa.table({
            "user_id": pa.array(uid[starts]),
            "n_events": pa.array(counts.astype(np.int64)),
            "n_sessions": pa.array(sessions),
            "first_ts": pa.array(ts[starts]),
            "last_ts": pa.array(ts[ends]),
        })

    def add_cell_part(batch: pa.Table) -> pa.Table:
        import pandas as pd

        uid = batch.column("user_id").to_numpy()
        ts = batch.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        bucket = ts // bucket_us
        # Salt on (user, bucket) so a hot user's cells spread over partitions.
        h = (pd.util.hash_array(uid, categorize=False)
             ^ pd.util.hash_array(bucket, categorize=False))
        part = (h % np.uint64(n_parts)).astype(np.int32)
        return pa.table({
            "user_id": batch.column("user_id"),
            "ts_us": pa.array(ts),
            "bucket": pa.array(bucket),
            "part": pa.array(part),
        })

    def add_user_part(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        part = (uid.astype(np.uint64) % np.uint64(n_parts)).astype(np.int32)
        return batch.append_column("part", pa.array(part))

    def stitch(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return pa.table(_SESSION_EMPTY)
        uid = group.column("user_id").to_numpy()
        first = group.column("first_ts").to_numpy()
        last = group.column("last_ts").to_numpy()
        ev = group.column("n_events").to_numpy()
        se = group.column("n_sessions").to_numpy()
        order = np.lexsort((first, uid))
        uid, first, last, ev, se = (uid[order], first[order], last[order],
                                    ev[order], se[order])
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        # Adjacent cells of one user whose boundary gap is within the session
        # gap merge one session.
        merged = np.zeros(n, dtype=np.int64)
        merged[1:] = (~new_user[1:] & (first[1:] - last[:-1] <= gap_us)) \
            .astype(np.int64)
        starts = np.flatnonzero(new_user)
        return pa.table({
            "user_id": pa.array(uid[starts]),
            "n_events": pa.array(np.add.reduceat(ev, starts)),
            "n_sessions": pa.array(np.add.reduceat(se, starts)
                                   - np.add.reduceat(merged, starts)),
        })

    cells = ds.map_batches(add_cell_part, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("part").map_groups(bucket_cells, batch_format="pyarrow")
    return cells.map_batches(add_user_part, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("part").map_groups(stitch, batch_format="pyarrow")


def sessionize_events(sf_dir: str, gap_minutes: int = 30, *,
                      two_stage: bool = False, bucket_hours: int = 6):
    """Per-user session count (sessions split at >gap inactivity).

    Windowed/stateful semantics expressed Ray-Data-first: hash-shuffle by a
    SALTED partition key (~4x CPUs partitions), then vectorized session
    detection inside each partition (lexsort + reduceat) — the groupby
    dispatch cost is O(partitions), not O(users), same pattern as the
    near-dup bucket stages.

    Default is the single-shuffle path (each user colocated).  At 100 TB a
    bot user is an OOM risk there; ``two_stage=True`` switches to the exact
    boundary-merge variant where no task holds a full user history.
    """
    from engine.stages import bucket_shuffle_partitions

    n_parts = bucket_shuffle_partitions()
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    gap_us = gap_minutes * 60 * 1_000_000
    if two_stage:
        out = _sessionize_two_stage(ds, gap_us, n_parts,
                                    bucket_us=bucket_hours * 3_600 * 1_000_000)
    else:
        out = _sessionize_single_stage(ds, gap_us, n_parts)
    return out.sort("user_id")


SESSIONIZE_SQL = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(1 + SUM(CASE WHEN gap_us > 30 * 60 * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM (
    SELECT user_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
    FROM events
)
GROUP BY user_id
ORDER BY user_id
"""


def orders_cube(sf_dir: str):
    """GROUP BY CUBE(priority, month): rollup plus the per-month subtotal
    level — same one-scan shape, one more re-aggregation of the bounded
    detail table."""
    return orders_rollup(sf_dir, cube=True)


ORDERS_CUBE_SQL = """
SELECT priority, month, COUNT(*) AS n,
       ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS total
FROM (SELECT o_orderpriority AS priority,
             strftime(o_orderdate, '%Y-%m') AS month, o_totalprice
      FROM orders)
GROUP BY CUBE(priority, month)
ORDER BY priority, month
"""


def orders_rollup(sf_dir: str, cube: bool = False):
    """GROUP BY ROLLUP(priority, month) — a grouping_sets() specialization
    (sets: detail, per-priority, grand; cube=True adds per-month)."""
    sets = [("priority", "month"), ("priority",), ()]
    if cube:
        sets.insert(2, ("month",))
    return grouping_sets(sf_dir, sets)


GROUPING_KEYS = ("priority", "month")


def grouping_sets(sf_dir: str, sets: list[tuple[str, ...]]):
    """GROUP BY GROUPING SETS over (priority, month): one distributed scan
    builds the finest-grain detail aggregate (per-batch partial combine ->
    one groupby over partial rows), then EVERY requested level re-aggregates
    that bounded detail table (priorities x months rows) driver-side — no
    second pass over orders at any scale, no Ray groupby over a
    low-cardinality key (the empty-partition RefBundle hazard), and the
    NULL level markers order NULLS LAST exactly like the DuckDB oracle
    (Ray's sort cannot compare None vs str).

    Duplicate sets emit duplicate rows and the empty set emits its row even
    on EMPTY input — both exactly SQL GROUPING SETS semantics (gated by
    tests on the rollup specialization).
    """
    for s in sets:
        assert set(s) <= set(GROUPING_KEYS), s

    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_orderdate",
                                          "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        pairs = pa.table({
            "priority": batch.column("o_orderpriority"),
            "month": pc.strftime(batch.column("o_orderdate"), format="%Y-%m"),
            "cents": pa.array(_half_away_cents(batch.column("o_totalprice").to_numpy())),
        })
        g = pairs.group_by(["priority", "month"], use_threads=False).aggregate(
            [([], "count_all"), ("cents", "sum")])
        return g.rename_columns(["priority", "month", "n", "cents"])

    detail = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby(["priority", "month"]).sum(["n", "cents"])
    # Bounded driver intake: priorities x months rows.
    rows = [{"priority": r["priority"], "month": r["month"],
             "n": r["sum(n)"], "cents": r["sum(cents)"]}
            for r in detail.take_all()]

    out: list[dict] = []
    for s in sets:
        agg: dict[tuple, list] = {}
        for r in rows:
            k = tuple(r[c] if c in s else None for c in GROUPING_KEYS)
            a = agg.setdefault(k, [0, 0])
            a[0] += r["n"]
            a[1] += r["cents"]
        if not s:
            # SQL emits the grand row even for zero input rows.
            agg.setdefault((None, None), [0, 0])
        out.extend({"priority": k[0], "month": k[1], "n": a[0], "cents": a[1]}
                   for k, a in agg.items())

    out.sort(key=lambda r: (r["priority"] is None, r["priority"] or "",
                            r["month"] is None, r["month"] or ""))
    return pa.table({
        "priority": pa.array([r["priority"] for r in out], pa.string()),
        "month": pa.array([r["month"] for r in out], pa.string()),
        "n": pa.array([r["n"] for r in out], pa.int64()),
        # SQL ROUND is half-away-from-zero; Python round() is banker's.
        "total": pa.array(_half_away_round(
            np.array([r["cents"] for r in out], dtype=np.float64) / 100.0, 2)),
    })


def orders_grouping_sets(sf_dir: str):
    """Mixed GROUPING SETS ((priority, month), (month), ()) — detail rows,
    per-month subtotals, grand total; deliberately NOT a rollup or cube so
    the generalized kernel is oracled in its own right."""
    return grouping_sets(sf_dir, [("priority", "month"), ("month",), ()])


ORDERS_GROUPING_SETS_SQL = """
SELECT priority, month, COUNT(*) AS n,
       ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS total
FROM (SELECT o_orderpriority AS priority,
             strftime(o_orderdate, '%Y-%m') AS month, o_totalprice
      FROM orders)
GROUP BY GROUPING SETS ((priority, month), (month), ())
ORDER BY priority, month
"""


ORDERS_ROLLUP_SQL = """
SELECT priority, month, COUNT(*) AS n,
       ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS total
FROM (SELECT o_orderpriority AS priority,
             strftime(o_orderdate, '%Y-%m') AS month, o_totalprice
      FROM orders)
GROUP BY ROLLUP(priority, month)
ORDER BY priority, month
"""


def _user_part_fn(n_parts: int):
    """Salted-partition column factory — the shared first stage of every
    user-window query (rank / cap / lag)."""
    def add_part(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        part = (uid.astype(np.uint64) % np.uint64(n_parts)).astype(np.int32)
        return batch.append_column("part", pa.array(part))
    return add_part


def _user_run_ranks(uid_sorted: np.ndarray) -> np.ndarray:
    """1-based rank within runs of an ALREADY-SORTED user column — the
    shared vectorized rank kernel of the user-window family (round-3
    review: this index arithmetic was copy-pasted per query)."""
    n = uid_sorted.size
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = uid_sorted[1:] != uid_sorted[:-1]
    starts = np.flatnonzero(new)
    counts = np.diff(np.concatenate([starts, [n]]))
    return np.arange(n, dtype=np.int64) - np.repeat(starts, counts) + 1


def events_moving_avg(sf_dir: str, window: int = 7):
    """FRAMED window aggregate: per event type, the trailing-7-day moving
    average of daily event counts (ROWS BETWEEN 6 PRECEDING AND CURRENT
    ROW).  The daily aggregate is the established partial-combine shuffle
    (#batches × #(type, day) rows); the frame itself runs per type on the
    tiny aggregated series — one cumsum pass, no second shuffle of raw
    events.  Averages are exact integer-count ratios rounded half-away
    (matches SQL ROUND on COUNT aggregates).
    """
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        pairs = pa.table({
            "event_type": batch.column("event_type"),
            "day": pc.strftime(batch.column("ts"), format="%Y-%m-%d"),
        })
        g = pairs.group_by(["event_type", "day"],
                           use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "day", "n"])

    def frame_per_type(group: pa.Table) -> pa.Table:
        order = np.argsort(group.column("day").to_numpy(zero_copy_only=False),
                           kind="mergesort")
        days = group.column("day").take(pa.array(order))
        n = group.column("sum(n)").to_numpy(zero_copy_only=False)[order]
        cum = np.concatenate([[0], np.cumsum(n)])
        idx = np.arange(n.size)
        lo = np.maximum(0, idx - (window - 1))
        win_sum = cum[idx + 1] - cum[lo]
        win_len = idx + 1 - lo
        avg = _half_away_round(win_sum / win_len, 4)
        return pa.table({
            "event_type": group.column("event_type").take(pa.array(order)),
            "day": days,
            "n": pa.array(n),
            "avg7": pa.array(avg),
        })

    return ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["event_type", "day"]).sum("n") \
        .groupby("event_type").map_groups(frame_per_type, batch_format="pyarrow") \
        .sort(["event_type", "day"])


def events_dow_pivot(sf_dir: str):
    """PIVOT / crosstab: event counts as a wide (event_type × ISO-weekday)
    table.  Per-batch 2-D bincount partials (type code × dow) make the
    shuffle #batches × #types rows of 7 ints; the groupby sums the wide
    columns directly — the reshape happens in the combiner, never on raw
    rows."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])
    dow_cols = [f"dow{i}" for i in range(1, 8)]

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        types = batch.column("event_type").to_pandas()
        # Arrow day_of_week: Monday=0 … Sunday=6 → ISO 1..7.
        dow = pc.day_of_week(batch.column("ts")).to_numpy(zero_copy_only=False)
        codes, uniques = pd.factorize(types)
        values: list[str | None] = [str(u) for u in uniques]
        if (codes < 0).any():
            # factorize marks NULL types as -1, which np.add.at would wrap
            # to the LAST row (silent misattribution — round-3 review);
            # give NULLs their own grid row so they group like SQL.
            codes = np.where(codes < 0, len(values), codes)
            values.append(None)
        grid = np.zeros((len(values), 7), dtype=np.int64)
        np.add.at(grid, (codes, dow), 1)
        cols = {"event_type": pa.array(values, pa.string())}
        for i, name in enumerate(dow_cols):
            cols[name] = pa.array(grid[:, i])
        return pa.table(cols)

    def finalize(batch: pa.Table) -> pa.Table:
        cols = {"event_type": batch.column("event_type")}
        for name in dow_cols:
            cols[name] = batch.column(f"sum({name})")
        return pa.table(cols)

    return ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("event_type").sum(dow_cols) \
        .map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True) \
        .sort("event_type")


DOW_PIVOT_SQL = """
SELECT event_type,
       CAST(SUM(CASE WHEN isodow(ts) = 1 THEN 1 ELSE 0 END) AS BIGINT) AS dow1,
       CAST(SUM(CASE WHEN isodow(ts) = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dow2,
       CAST(SUM(CASE WHEN isodow(ts) = 3 THEN 1 ELSE 0 END) AS BIGINT) AS dow3,
       CAST(SUM(CASE WHEN isodow(ts) = 4 THEN 1 ELSE 0 END) AS BIGINT) AS dow4,
       CAST(SUM(CASE WHEN isodow(ts) = 5 THEN 1 ELSE 0 END) AS BIGINT) AS dow5,
       CAST(SUM(CASE WHEN isodow(ts) = 6 THEN 1 ELSE 0 END) AS BIGINT) AS dow6,
       CAST(SUM(CASE WHEN isodow(ts) = 7 THEN 1 ELSE 0 END) AS BIGINT) AS dow7
FROM events GROUP BY event_type ORDER BY event_type
"""


MOVING_AVG_SQL = """
SELECT event_type, day, n,
       ROUND(AVG(CAST(n AS DOUBLE)) OVER (
         PARTITION BY event_type ORDER BY day
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS avg7
FROM (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
  FROM events GROUP BY event_type, day
) ORDER BY event_type, day
"""


def cap_events_per_user(sf_dir: str, k: int = 5):
    """Per-key cap: keep each user's k EARLIEST events (ts, event_id order)
    — the bot-user downweighting step of an events curation pipeline (a
    hot key contributes at most k rows downstream).  Same salted-partition
    windowed-rank shape as top_events_per_user."""
    from engine.stages import bucket_shuffle_partitions

    n_parts = bucket_shuffle_partitions()
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def cap_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "event_id": pa.array([], pa.int64()),
                          "ts": pa.array([], pa.timestamp("us"))})
        n = group.num_rows
        if n == 0:
            return empty
        uid = group.column("user_id").to_numpy()
        eid = group.column("event_id").to_numpy()
        tsv = group.column("ts").to_numpy().astype("datetime64[us]").view(np.int64)
        order = np.lexsort((eid, tsv, uid))
        uid, eid, tsv = uid[order], eid[order], tsv[order]
        keep = _user_run_ranks(uid) <= k
        return pa.table({
            "user_id": pa.array(uid[keep]),
            "event_id": pa.array(eid[keep]),
            "ts": pa.array(tsv[keep].view("datetime64[us]")),
        })

    return ds.map_batches(_user_part_fn(n_parts), batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("part").map_groups(cap_partition, batch_format="pyarrow") \
        .sort(["user_id", "event_id"])


CAP_EVENTS_SQL = """
SELECT user_id, event_id, ts FROM (
  SELECT user_id, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn <= 5 ORDER BY user_id, event_id
"""


def orders_row_number(sf_dir: str):
    """Global ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) — the
    zipWithIndex operator (engine/stages.py:with_row_number): one sort,
    then an O(blocks) per-block (first-key, count) report whose prefix
    sums broadcast back as block offsets.  The order is deliberately a
    NON-key column + tiebreaker, so the numbering exercises a real total
    order, not key rank."""
    from engine.stages import with_row_number

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    out = with_row_number(ds, ["o_totalprice", "o_orderkey"], out_col="rn")
    return out.map_batches(
        lambda t: t.select(["o_orderkey", "rn"]),
        batch_format="pyarrow", zero_copy_batch=True).sort("o_orderkey")


ORDERS_ROW_NUMBER_SQL = """
SELECT o_orderkey,
       ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn
FROM orders ORDER BY o_orderkey
"""


def orders_value_quartile(sf_dir: str, k: int = 4):
    """NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey): exact SQL tile
    sizes (first n%k tiles get one extra row), derived from the global row
    number — a second one-scan consumer of with_row_number."""
    from engine.stages import with_row_number

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    n = ds.count()
    q, r = divmod(n, k)
    big = r * (q + 1)
    numbered = with_row_number(ds, ["o_totalprice", "o_orderkey"],
                               out_col="rn")

    def tile(batch: pa.Table) -> pa.Table:
        rn = batch.column("rn").to_numpy()
        t = np.where(rn <= big, (rn - 1) // max(q + 1, 1),
                     r + (rn - 1 - big) // max(q, 1)) + 1
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "quartile": pa.array(t.astype(np.int64))})

    return numbered.map_batches(tile, batch_format="pyarrow",
                                zero_copy_batch=True).sort("o_orderkey")


ORDERS_VALUE_QUARTILE_SQL = """
SELECT o_orderkey,
       CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
           AS quartile
FROM orders ORDER BY o_orderkey
"""


def user_first_last_event(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE per user over the (ts, event_id) frame —
    the navigation-aggregate pair (arg-min/arg-max by time): each user's
    first and last event id plus event count, one salted-partition pass
    (lexsort + run boundaries)."""
    from engine.stages import bucket_shuffle_partitions

    n_parts = bucket_shuffle_partitions()
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def firstlast_partition(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "first_event_id": pa.array([], pa.int64()),
                             "last_event_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64())})
        uid = group.column("user_id").to_numpy()
        eid = group.column("event_id").to_numpy()
        tsv = group.column("ts").to_numpy().astype("datetime64[us]").view(np.int64)
        order = np.lexsort((eid, tsv, uid))
        uid, eid = uid[order], eid[order]
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [n]]) - 1
        return pa.table({
            "user_id": pa.array(uid[starts]),
            "first_event_id": pa.array(eid[starts]),
            "last_event_id": pa.array(eid[ends]),
            "n_events": pa.array((ends - starts + 1).astype(np.int64)),
        })

    return ds.map_batches(_user_part_fn(n_parts), batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("part").map_groups(firstlast_partition,
                                    batch_format="pyarrow") \
        .sort("user_id")


USER_FIRST_LAST_SQL = """
SELECT DISTINCT user_id,
  FIRST_VALUE(event_id) OVER w AS first_event_id,
  LAST_VALUE(event_id) OVER
      (PARTITION BY user_id ORDER BY ts, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      AS last_event_id,
  CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id
"""


def user_running_value(sf_dir: str):
    """Window RUNNING aggregate (SUM ... ROWS UNBOUNDED PRECEDING): each
    event's cumulative value for its user in (ts, event_id) order — the
    lifetime-spend-so-far feature alongside the rank/lag/session window
    operators.  Same salted-partition shape: one shuffle on user hash, one
    vectorized lexsort + cumsum-with-run-start-subtraction pass per
    partition.  Sums run in exact 1e-4 integer units (the table's value
    precision) so the rounded output hashes against SQL."""
    from engine.stages import bucket_shuffle_partitions

    n_parts = bucket_shuffle_partitions()
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def cum_partition(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "run_value": pa.array([], pa.float64())})
        uid = group.column("user_id").to_numpy()
        eid = group.column("event_id").to_numpy()
        tsv = group.column("ts").to_numpy().astype("datetime64[us]").view(np.int64)
        cents = _half_away_cents(group.column("value").to_numpy(), 10000.0)
        order = np.lexsort((eid, tsv, uid))
        uid, eid, cents = uid[order], eid[order], cents[order]
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.concatenate([starts, [n]]))
        cum = np.cumsum(cents)
        base = np.repeat(cum[starts] - cents[starts], counts)
        return pa.table({
            "user_id": pa.array(uid),
            "event_id": pa.array(eid),
            "run_value": pa.array(
                _half_away_round((cum - base) / 10000.0, 4)),
        })

    return ds.map_batches(_user_part_fn(n_parts), batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("part").map_groups(cum_partition, batch_format="pyarrow") \
        .sort(["user_id", "event_id"])


USER_RUNNING_VALUE_SQL = """
SELECT user_id, event_id,
       ROUND(SUM(CAST(ROUND(value * 10000) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) / 10000.0, 4) AS run_value
FROM events ORDER BY user_id, event_id
"""


def large_gap_events(sf_dir: str, gap_seconds: int = 3600):
    """Window NAVIGATION (LAG): events preceded by a suspicious inactivity
    gap (> gap_seconds) from the same user's previous event — the
    lag/lead family alongside the rank (top_events_per_user), session
    (sessionize_events) and hopping-window operators.

    Same salted-partition shape as the rest of the window family: one
    shuffle on user hash, one vectorized lexsort + shifted-difference pass
    per partition, O(partitions) dispatch.  Gap is exact integer
    microseconds (epoch_us difference in the oracle).
    """
    from engine.stages import bucket_shuffle_partitions

    n_parts = bucket_shuffle_partitions()
    thr_us = np.int64(gap_seconds) * np.int64(1_000_000)
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def gaps_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "event_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "prev_ts": pa.array([], pa.timestamp("us")),
            "gap_us": pa.array([], pa.int64())})
        n = group.num_rows
        if n == 0:
            return empty
        uid = group.column("user_id").to_numpy()
        eid = group.column("event_id").to_numpy()
        ts = group.column("ts").to_numpy().astype("datetime64[us]")
        tsv = ts.view(np.int64)
        order = np.lexsort((eid, tsv, uid))
        uid, eid, tsv = uid[order], eid[order], tsv[order]
        same = uid[1:] == uid[:-1]
        gap = tsv[1:] - tsv[:-1]
        keep = same & (gap > thr_us)
        idx = np.flatnonzero(keep) + 1
        return pa.table({
            "user_id": pa.array(uid[idx]),
            "event_id": pa.array(eid[idx]),
            "ts": pa.array(tsv[idx].view("datetime64[us]")),
            "prev_ts": pa.array(tsv[idx - 1].view("datetime64[us]")),
            "gap_us": pa.array(gap[idx - 1]),
        })

    return ds.map_batches(_user_part_fn(n_parts), batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("part").map_groups(gaps_partition, batch_format="pyarrow") \
        .sort(["user_id", "event_id"])


def event_type_transitions(sf_dir: str):
    """Behavioral bigrams: global counts of (prev_type -> next_type)
    transitions within each user's ts-ordered event sequence — the
    sequence-mining / Markov-chain input every event-log pipeline builds.

    Same user-hash partition shuffle as the window family (each user's
    history is complete inside one partition, so every transition is
    local); per partition one vectorized lexsort + integer pair-encode +
    bincount; the <=|types|^2 pair counts ride keyed_tree_reduce."""
    import json as _json

    from engine.stages import bucket_shuffle_partitions, keyed_tree_reduce

    n_parts = bucket_shuffle_partitions()
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts",
                                          "event_type"])

    def transitions_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({"state": pa.array([], pa.large_string())})
        if group.num_rows < 2:
            return empty
        uid = group.column("user_id").to_numpy()
        eid = group.column("event_id").to_numpy()
        tsv = group.column("ts").to_numpy().astype("datetime64[us]") \
            .view(np.int64)
        types = np.asarray(group.column("event_type").to_pylist(),
                           dtype=object)
        order = np.lexsort((eid, tsv, uid))
        uid, types = uid[order], types[order]
        vocab, codes = np.unique(types, return_inverse=True)
        same = uid[1:] == uid[:-1]
        if not same.any():
            return empty
        k = len(vocab)
        pair = codes[:-1][same] * k + codes[1:][same]
        cnt = np.bincount(pair, minlength=k * k)
        st = {f"{vocab[p // k]}\x1f{vocab[p % k]}": int(c)
              for p, c in enumerate(cnt) if c}
        return pa.table({"state": pa.array([_json.dumps(st)],
                                           pa.large_string())})

    partials = ds.map_batches(_user_part_fn(n_parts), batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("part").map_groups(transitions_partition,
                                    batch_format="pyarrow")
    merged = keyed_tree_reduce(partials, lambda a, b: a + b)
    keys = sorted(merged)
    prev = [key.split("\x1f")[0] for key in keys]
    nxt = [key.split("\x1f")[1] for key in keys]
    return pa.table({
        "prev_type": pa.array(prev, pa.string()),
        "next_type": pa.array(nxt, pa.string()),
        "n": pa.array([int(merged[key]) for key in keys], pa.int64()),
    })


def user_transition_diversity(sf_dir: str):
    """Per-user behavioral diversity: total transitions vs DISTINCT
    transition pairs used (low diversity over many events = scripted/bot
    behavior — the standard sequence-entropy screen, integer-exact).
    Same user-hash partition as the transition counts; per partition one
    lexsort + per-user pair dedup, rows are one per user."""
    from engine.stages import bucket_shuffle_partitions

    n_parts = bucket_shuffle_partitions()
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts",
                                          "event_type"])

    def diversity_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "n_transitions": pa.array([], pa.int64()),
            "distinct_transitions": pa.array([], pa.int64())})
        if group.num_rows == 0:
            return empty
        uid = group.column("user_id").to_numpy()
        eid = group.column("event_id").to_numpy()
        tsv = group.column("ts").to_numpy().astype("datetime64[us]") \
            .view(np.int64)
        types = np.asarray(group.column("event_type").to_pylist(),
                           dtype=object)
        order = np.lexsort((eid, tsv, uid))
        uid, types = uid[order], types[order]
        _, codes = np.unique(types, return_inverse=True)
        k = codes.max() + 1 if codes.size else 1
        same = uid[1:] == uid[:-1]
        users, counts, distincts = [], [], []
        # triple (user, pair) dedup vectorized: unique over composite key
        pair_user = uid[1:][same]
        pair_code = codes[:-1][same] * k + codes[1:][same]
        if pair_user.size:
            u_all, n_all = np.unique(pair_user, return_counts=True)
            composite = pair_user * np.int64(k * k) + pair_code
            uniq_users = np.unique(composite) // np.int64(k * k)
            u_d, n_d = np.unique(uniq_users, return_counts=True)
            assert (u_all == u_d).all()
            users, counts, distincts = u_all, n_all, n_d
        return pa.table({
            "user_id": pa.array(np.asarray(users, dtype=np.int64)),
            "n_transitions": pa.array(np.asarray(counts, dtype=np.int64)),
            "distinct_transitions": pa.array(
                np.asarray(distincts, dtype=np.int64)),
        })

    return ds.map_batches(_user_part_fn(n_parts), batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("part").map_groups(diversity_partition,
                                    batch_format="pyarrow") \
        .sort("user_id")


USER_TRANSITION_DIVERSITY_SQL = r"""
WITH w AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_transitions,
  CAST(COUNT(DISTINCT (prev_type, event_type)) AS BIGINT)
    AS distinct_transitions
FROM w WHERE prev_type IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


EVENT_TRANSITIONS_SQL = r"""
WITH w AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
FROM w WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type ORDER BY prev_type, next_type
"""


def user_range_window_events(sf_dir: str, range_seconds: int = 3600):
    """VALUE-RANGE framed window aggregate (RANGE BETWEEN INTERVAL 1 HOUR
    PRECEDING AND CURRENT ROW): per event, the count and integerized sum of
    the same user's events in the trailing hour — the rate-limiter /
    burst-detection window, and the one frame type (value-based, peers
    included) the ROWS-framed operators here don't cover.

    Shape: one salted-partition shuffle on user hash, then a per-partition
    vectorized pass — user segments are collapsed onto ONE sorted axis by
    offsetting each segment with a span larger than (partition span +
    frame), so both frame edges come from two global ``np.searchsorted``
    calls (no per-user loop).  Sums are over FLOOR(value) in int64, so the
    cumsum-difference is exact and hash-matches SQL.
    """
    from engine.stages import bucket_shuffle_partitions

    n_parts = bucket_shuffle_partitions()
    thr_us = np.int64(range_seconds) * np.int64(1_000_000)
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def frame_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "event_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "cnt_1h": pa.array([], pa.int64()),
            "sum_1h": pa.array([], pa.int64())})
        n = group.num_rows
        if n == 0:
            return empty
        uid = group.column("user_id").to_numpy()
        eid = group.column("event_id").to_numpy()
        tsv = group.column("ts").to_numpy().astype("datetime64[us]").view(np.int64)
        val = np.floor(group.column("value").to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        order = np.lexsort((eid, tsv, uid))
        uid, eid, tsv, val = uid[order], eid[order], tsv[order], val[order]
        base = tsv - tsv.min()
        seg = np.concatenate([[0], np.cumsum(uid[1:] != uid[:-1])])
        span = np.int64(base.max()) + thr_us + 2
        if (int(seg[-1]) + 1) * int(span) >= 2 ** 62:   # overflow guard
            raise ValueError("range-window: partition span overflow")
        adj = base + seg * span
        lo = np.searchsorted(adj, adj - thr_us, side="left")
        hi = np.searchsorted(adj, adj, side="right")
        cum = np.concatenate([[0], np.cumsum(val)])
        return pa.table({
            "user_id": pa.array(uid),
            "event_id": pa.array(eid),
            "ts": pa.array(tsv.view("datetime64[us]")),
            "cnt_1h": pa.array(hi - lo),
            "sum_1h": pa.array(cum[hi] - cum[lo]),
        })

    return ds.map_batches(_user_part_fn(n_parts), batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("part").map_groups(frame_partition, batch_format="pyarrow") \
        .sort(["user_id", "event_id"])


def doc_edit_distance_adjacent(sf_dir: str, prefix: int = 64):
    """Pairwise EDIT DISTANCE (Myers bit-parallel Levenshtein,
    engine/ops/text.py) between each document and its successor within the
    same language — the string-similarity primitive of near-dup
    verification and transcript QA, vectorized so the whole partition's
    DP runs as elementwise uint64 numpy steps across all pairs at once.

    Oracle contract: distances are over the first ``prefix`` (=64)
    CHARACTERS, which equals 64 BYTES on this ASCII corpus (DuckDB
    ``levenshtein`` counts characters; the batch kernel works on bytes) —
    the cap is what keeps the batched DP single-word.  Successor pairing
    is LEAD(doc_id) per lang.

    Scale shape: langs are few and fat, so this groups on a DENSE hashed
    partition id (a lang never splits; a partition may hold several) and
    segments by lang inside the kernel — the same shape every window
    query here uses, which keeps the exchange free of the mostly-empty
    range partitions a raw 5-key groupby would produce.  At 100 TB the
    successor pairing would add the boundary-row exchange
    with_row_number uses."""
    from engine.ops.text import myers_distance_batch64
    from engine.stages import bucket_shuffle_partitions

    n_parts = bucket_shuffle_partitions()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def add_part(batch: pa.Table) -> pa.Table:
        from engine.checks.sketches import HyperLogLog

        langs = np.asarray(
            [x if x is not None else "\x00" for x in
             batch.column("lang").to_pylist()], dtype=object)
        # hash64 is process-stable (unlike builtin str hash) — a lang must
        # land in exactly one partition on every worker.
        h = HyperLogLog.hash64(langs) % np.uint64(n_parts)
        return batch.append_column("part", pa.array(h.astype(np.int64)))

    def pairs_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "lang": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "next_doc_id": pa.array([], pa.int64()),
            "edit_distance": pa.array([], pa.int64())})
        n = group.num_rows
        if n < 2:
            return empty
        ids = group.column("doc_id").to_numpy()
        langs = np.asarray(group.column("lang").to_pylist(), dtype=object)
        order = np.lexsort((ids, langs.astype(str)))
        ids = ids[order]
        langs = langs[order]
        texts = [t.encode()[:prefix] if t is not None else b""
                 for t in group.column("text").take(pa.array(order)).to_pylist()]
        same = langs[1:] == langs[:-1]
        keep = np.flatnonzero(same)
        if keep.size == 0:
            return empty
        dist = myers_distance_batch64([texts[j] for j in keep],
                                      [texts[j + 1] for j in keep])
        return pa.table({
            "lang": pa.array([str(langs[j]) for j in keep], pa.string()),
            "doc_id": pa.array(ids[keep]),
            "next_doc_id": pa.array(ids[keep + 1]),
            "edit_distance": pa.array(dist),
        })

    return ds.map_batches(add_part, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("part").map_groups(pairs_partition, batch_format="pyarrow") \
        .sort(["lang", "doc_id"])


DOC_EDIT_DISTANCE_SQL = """
WITH w AS (
  SELECT lang, doc_id, LEFT(text, 64) AS a,
         LEAD(doc_id) OVER (PARTITION BY lang ORDER BY doc_id) AS next_doc_id,
         LEAD(LEFT(text, 64)) OVER (PARTITION BY lang ORDER BY doc_id) AS b
  FROM documents
)
SELECT lang, doc_id, next_doc_id,
       CAST(levenshtein(COALESCE(a, ''), COALESCE(b, '')) AS BIGINT)
         AS edit_distance
FROM w WHERE next_doc_id IS NOT NULL ORDER BY lang, doc_id
"""


USER_RANGE_WINDOW_SQL = """
SELECT user_id, event_id, ts,
  COUNT(*) OVER w AS cnt_1h,
  CAST(SUM(CAST(FLOOR(value) AS BIGINT)) OVER w AS BIGINT) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


LARGE_GAP_SQL = """
WITH w AS (
  SELECT user_id, event_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT user_id, event_id, ts, prev_ts,
       epoch_us(ts) - epoch_us(prev_ts) AS gap_us
FROM w
WHERE prev_ts IS NOT NULL AND epoch_us(ts) - epoch_us(prev_ts) > 3600000000
ORDER BY user_id, event_id
"""


def user_event_rank_stats(sf_dir: str):
    """PERCENT_RANK and CUME_DIST per event within its user's (ts, event_id)
    order — the remaining SQL window-distribution functions, on the same
    salted-partition one-pass shape as the rank/lag/session family.  Both
    are exact IEEE divisions of small integers ((rank-1)/(n-1) and rank/n),
    so the doubles hash-match DuckDB bit for bit; a single-row partition
    defines PERCENT_RANK = 0 (SQL rule), no 0/0."""
    from engine.stages import bucket_shuffle_partitions

    n_parts = bucket_shuffle_partitions()
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def rank_partition(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "event_id": pa.array([], pa.int64()),
                             "pct_rank": pa.array([], pa.float64()),
                             "cume_dist": pa.array([], pa.float64())})
        uid = group.column("user_id").to_numpy()
        eid = group.column("event_id").to_numpy()
        tsv = group.column("ts").to_numpy().astype("datetime64[us]").view(np.int64)
        order = np.lexsort((eid, tsv, uid))
        uid, eid = uid[order], eid[order]
        rank = _user_run_ranks(uid)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.concatenate([starts, [n]]))
        size = np.repeat(counts, counts).astype(np.float64)
        pct = np.where(size > 1, (rank - 1) / np.maximum(size - 1, 1), 0.0)
        return pa.table({
            "user_id": pa.array(uid),
            "event_id": pa.array(eid),
            "pct_rank": pa.array(pct),
            "cume_dist": pa.array(rank / size),
        })

    return ds.map_batches(_user_part_fn(n_parts), batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("part").map_groups(rank_partition, batch_format="pyarrow") \
        .sort(["user_id", "event_id"])


USER_EVENT_RANK_STATS_SQL = """
SELECT user_id, event_id,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume_dist
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
"""


def top_events_per_user(sf_dir: str, k: int = 3):
    """Windowed rank (ROW_NUMBER PARTITION BY user ORDER BY value DESC,
    event_id) keeping the top-k rows per user — the windowed-aggregate
    operator family, expressed Ray-Data-first: salted partition shuffle +
    ONE vectorized lexsort/rank pass per partition (O(partitions) dispatch,
    same pattern as sessionize)."""
    from engine.stages import bucket_shuffle_partitions

    n_parts = bucket_shuffle_partitions()
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "value"])

    def topk_partition(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "event_id": pa.array([], pa.int64()),
                          "value": pa.array([], pa.float64()),
                          "rank": pa.array([], pa.int64())})
        if n == 0:
            return empty
        uid = group.column("user_id").to_numpy()
        eid = group.column("event_id").to_numpy()
        val = group.column("value").to_numpy()
        order = np.lexsort((eid, -val, uid))     # user ASC, value DESC, id ASC
        uid, eid, val = uid[order], eid[order], val[order]
        rank = _user_run_ranks(uid)
        keep = rank <= k
        return pa.table({
            "user_id": pa.array(uid[keep]),
            "event_id": pa.array(eid[keep]),
            "value": pa.array(val[keep]),
            "rank": pa.array(rank[keep]),
        })

    return ds.map_batches(_user_part_fn(n_parts), batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("part").map_groups(topk_partition, batch_format="pyarrow") \
        .sort(["user_id", "rank"])


TOP_EVENTS_PER_USER_SQL = """
SELECT user_id, event_id, value, CAST(rn AS BIGINT) AS rank FROM (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rn
  FROM events
) WHERE rn <= 3 ORDER BY user_id, rank
"""


def purchase_attribution(sf_dir: str, direction: str = "backward"):
    """As-of join: each purchase event attributed to the same user's
    closest click — "backward" (most recent preceding, the classic
    attribution), "forward" (next following), or "nearest" — the asof-join
    operator the Dataset API lacks, built from a co-partitioned tagged
    union + one vectorized last-seen scan per partition
    (engine/stages.py:asof_join; forward is the same kernel on the negated
    ordering column).  Gap emitted as exact signed integer microseconds
    (purchase minus click) so the row hashes against DuckDB's ASOF LEFT
    JOIN (backward/forward) or a LATERAL nearest-row oracle."""
    from engine.stages import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def only(event_type: str):
        def pick(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("event_type"), event_type))
        return ev.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)

    purchases = only("purchase")
    clicks = only("click")

    joined = asof_join(
        purchases, clicks, by="user_id", on="ts",
        left_cols=["event_id", "user_id", "ts"],
        right_cols=["event_id", "ts"], direction=direction)

    def finalize(t: pa.Table) -> pa.Table:
        lt = t.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        rt_arr = t.column("ts_r")
        rt = rt_arr.to_numpy(zero_copy_only=False)
        valid = ~pa.compute.is_null(
            rt_arr if not isinstance(rt_arr, pa.ChunkedArray)
            else rt_arr.combine_chunks()).to_numpy(zero_copy_only=False)
        gap = np.zeros(t.num_rows, dtype=np.int64)
        if valid.any():
            gap[valid] = lt[valid] - rt[valid].astype("datetime64[us]").astype(np.int64)
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "click_event_id": t.column("event_id_r"),
            "gap_us": pa.array([int(g) if v else None
                                for g, v in zip(gap, valid)], pa.int64()),
        })

    return joined.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True).sort("event_id")


PURCHASE_ATTRIBUTION_SQL = """
SELECT p.event_id, p.user_id,
       c.event_id AS click_event_id,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
ORDER BY p.event_id
"""


def clicks_near_purchase(sf_dir: str, window_minutes: int = 60):
    """Range/interval-count join: for each purchase, the number of the same
    user's clicks within ±window of the purchase timestamp — the
    engagement-context feature a training pipeline derives around
    conversion events.  Built on engine/stages.py:interval_count_join
    (tagged-union co-partition + two vectorized rank scans per partition;
    Ray Data has no range join)."""
    from engine.stages import interval_count_join

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def only(event_type: str):
        def pick(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("event_type"), event_type))
        return ev.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)

    w_us = window_minutes * 60 * 1_000_000
    out = interval_count_join(
        only("purchase"), only("click"), by="user_id", on="ts",
        lo_offset=-w_us, hi_offset=w_us,
        left_cols=["event_id", "user_id"], out_col="n_nearby_clicks")
    return out.sort("event_id")


CLICKS_NEAR_PURCHASE_SQL = """
SELECT p.event_id, p.user_id,
       CAST(COUNT(c.event_id) AS BIGINT) AS n_nearby_clicks
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - 3600000000
                        AND epoch_us(p.ts) + 3600000000
GROUP BY p.event_id, p.user_id
ORDER BY p.event_id
"""


def purchase_attribution_forward(sf_dir: str):
    """Forward as-of: the next click at/after each purchase."""
    return purchase_attribution(sf_dir, direction="forward")


PURCHASE_ATTRIBUTION_FWD_SQL = """
SELECT p.event_id, p.user_id,
       c.event_id AS click_event_id,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts >= p.ts
ORDER BY p.event_id
"""


def purchase_attribution_nearest(sf_dir: str):
    """Nearest as-of: the click closest in time to each purchase (an
    exact-distance tie resolves to the earlier click)."""
    return purchase_attribution(sf_dir, direction="nearest")


PURCHASE_ATTRIBUTION_NEAREST_SQL = """
SELECT p.event_id, p.user_id,
       c.event_id AS click_event_id,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN LATERAL (
    SELECT event_id, ts
    FROM events
    WHERE event_type = 'click' AND user_id = p.user_id
    ORDER BY ABS(epoch_us(ts) - epoch_us(p.ts)), ts
    LIMIT 1
) c ON TRUE
ORDER BY p.event_id
"""


def sample_documents(sf_dir: str, fraction: float = 0.1):
    """Deterministic hash-based sample (the reproducible form of
    ds.random_sample — sampling decisions must be stable across retries).

    The keep rule is the first 4 hex chars of md5(str(doc_id)) compared
    against a threshold — deliberately DuckDB-expressible so this query is
    hash-oracled instead of rows-only (round-1 VERDICT item 7).
    """
    import hashlib

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    if fraction >= 1.0:
        return ds.sort("doc_id")
    thresh = format(max(int(fraction * 65536), 0), "x").zfill(4)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        mask = pa.array([hashlib.md5(str(i).encode()).hexdigest()[:4] < thresh
                         for i in ids])
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True).sort("doc_id")


SAMPLE_DOCS_SQL = """
SELECT doc_id, n_chars FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999'
ORDER BY doc_id
"""


def stratified_sample_documents(sf_dir: str, cap: int = 50):
    """Equal-allocation stratified sample: ~``cap`` docs per language.

    The balance-the-strata op a training-data pipeline uses to stop one
    dominant language swamping a mixture.  Per-stratum keep threshold is
    floor(cap·65536 / stratum_n) clamped at 65536, applied to the first 4
    md5 hex chars of the doc id — deterministic across retries, and
    DuckDB-expressible so the query hash-matches an oracle.

    Scale shape: stratum counts are a tiny groupby (strata are languages —
    bounded cardinality), the thresholds broadcast as a driver-pickled
    dict, and the sample itself is a stateless streaming filter over the
    corpus scan — no shuffle of the corpus at any size.
    """
    import hashlib

    counts = _read(sf_dir, "documents", columns=["lang"]) \
        .groupby("lang").count().take_all()
    thresh = {r["lang"]: min(65536, cap * 65536 // r["count()"]) for r in counts}

    def keep(batch: pa.Table) -> pa.Table:
        # Vectorized triage first: rows in strata kept wholesale
        # (thr >= 65536 — the dominant case in a skewed corpus) never pay
        # the md5; only the residual subset runs the per-row digest, as a
        # 16-bit integer compare on the first 2 digest bytes instead of a
        # hexdigest substring (round-3 VERDICT perf item 2; the md5 RULE
        # itself is pinned by the DuckDB oracle).
        import pandas as pd

        thr = pd.Series(batch.column("lang").to_pandas()).map(thresh) \
            .fillna(0).to_numpy(dtype=np.int64)
        mask = thr >= 65536
        need = np.flatnonzero(~mask & (thr > 0))
        if need.size:
            ids = batch.column("doc_id").to_numpy()[need]
            md5 = hashlib.md5
            hashed = np.fromiter(
                (int.from_bytes(md5(str(i).encode()).digest()[:2], "big")
                 for i in ids), dtype=np.int64, count=need.size)
            mask[need] = hashed < thr[need]
        return batch.filter(pa.array(mask))

    return _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"]) \
        .map_batches(keep, batch_format="pyarrow", zero_copy_batch=True) \
        .sort("doc_id")


STRATIFIED_SAMPLE_SQL = r"""
WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
t AS (SELECT lang, LEAST(65536, (50 * 65536) // n) AS thr FROM c)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN t USING (lang)
WHERE t.thr >= 65536
   OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < printf('%04x', t.thr)
ORDER BY d.doc_id
"""


def long_tail_documents(sf_dir: str, pct_num: int = 9, pct_den: int = 10):
    """Quantile-threshold outlier filter: documents whose length strictly
    exceeds their language's p90 (the filter a curation pipeline uses to
    route suspiciously-long docs to review / truncation).

    The threshold is the integer-exact discrete percentile — smallest value
    whose cumulative rank satisfies rank·den >= n·num, pure integer
    arithmetic on BOTH sides (percentile_disc's float ceil is ambiguous at
    exact multiples, so the oracle uses the same rational rule).

    Scale shape (same contract as exact_group_quantiles): per-batch
    (lang, n_chars)->count partials bound the shuffle to
    O(batches × groups × distinct lengths); the driver intake is the
    bounded count table; the filter itself is a stateless streaming scan
    with a broadcast threshold dict — the corpus is never shuffled.
    """
    import pandas as pd

    def partial_counts(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": batch.column("lang").to_pandas(),
            "n_chars": batch.column("n_chars").to_numpy(),
        })
        g = df.groupby(["lang", "n_chars"], sort=False, observed=True, dropna=False) \
              .size().reset_index(name="cnt")
        return pa.table({"lang": pa.array(g["lang"], pa.string()),
                         "n_chars": pa.array(g["n_chars"], pa.int64()),
                         "cnt": pa.array(g["cnt"], pa.int64())})

    counts = _read(sf_dir, "documents", columns=["lang", "n_chars"]) \
        .map_batches(partial_counts, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["lang", "n_chars"]).sum("cnt") \
        .to_pandas()   # bounded: languages × distinct lengths

    thresholds: dict[str, int] = {}
    for lang, grp in counts.groupby("lang", sort=False):
        grp = grp.sort_values("n_chars")
        vals = grp["n_chars"].to_numpy()
        cum = grp["sum(cnt)"].to_numpy().cumsum()
        n = int(cum[-1])
        target = -(-pct_num * n // pct_den)          # ceil(num·n/den), exact
        thresholds[lang] = int(vals[np.searchsorted(cum, target, side="left")])

    def keep(batch: pa.Table) -> pa.Table:
        langs = batch.column("lang").to_pylist()
        nch = batch.column("n_chars").to_numpy()
        thr = np.fromiter((thresholds.get(lang, np.iinfo(np.int64).max)
                           for lang in langs), dtype=np.int64, count=len(langs))
        out = batch.append_column("p90", pa.array(thr))
        return out.filter(pa.array(nch > thr))

    return _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"]) \
        .map_batches(keep, batch_format="pyarrow", zero_copy_batch=True) \
        .sort("doc_id")


LONG_TAIL_SQL = r"""
WITH ranked AS (
  SELECT lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
),
t AS (SELECT lang, MIN(n_chars) AS p90 FROM ranked WHERE rn * 10 >= n * 9 GROUP BY lang)
SELECT d.doc_id, d.lang, d.n_chars, t.p90
FROM documents d JOIN t USING (lang)
WHERE d.n_chars > t.p90
ORDER BY d.doc_id
"""


def lang_quality_documents(sf_dir: str):
    """Language-ID + deterministic integer text metrics per document.

    Every emitted column is exactly reproducible in SQL (ASCII-deterministic
    regex counts; the lang argmax is a CASE over per-language stopword hits),
    so the whole row hashes against the DuckDB oracle.
    """
    from engine.ops.text import LangIdStage, TokenStatsStage

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    # Task pools (driver-pickled instances): chained actor pools starve each
    # other's placement at low CPU counts (observed hang at 2 CPUs), and
    # these stages' state is a few compiled regexes.
    out = docs.map_batches(TokenStatsStage(), batch_format="pyarrow") \
        .map_batches(LangIdStage(), batch_format="pyarrow")
    return out.map_batches(
        lambda t: t.select(["doc_id", "lang_pred", "ws_tokens", "n_digits",
                            "n_punct", "en_stops"]),
        batch_format="pyarrow", zero_copy_batch=True).sort("doc_id")


def _stop_in_list(lang: str) -> str:
    from engine.ops.text import STOPWORDS

    quoted = ", ".join(f"'{w}'" for w in sorted(STOPWORDS[lang]))
    return f"len(list_filter(words, w -> w IN ({quoted})))"


def _lang_quality_sql() -> str:
    en, es, de, fr = (_stop_in_list(lang) for lang in ("en", "es", "de", "fr"))
    return rf"""
WITH toks AS (
  SELECT doc_id, text, regexp_extract_all(lower(text), '[^\t\n\f\r ]+') AS words
  FROM documents
), hits AS (
  SELECT doc_id, text, len(words) AS ws_tokens,
         {en} AS en_h, {es} AS es_h, {de} AS de_h, {fr} AS fr_h
  FROM toks
)
SELECT doc_id,
  CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
       WHEN ws_tokens = 0 THEN 'und'
       WHEN greatest(en_h, es_h, de_h, fr_h) = 0 THEN 'en'
       WHEN en_h >= es_h AND en_h >= de_h AND en_h >= fr_h THEN 'en'
       WHEN es_h >= de_h AND es_h >= fr_h THEN 'es'
       WHEN de_h >= fr_h THEN 'de'
       ELSE 'fr' END AS lang_pred,
  CAST(ws_tokens AS BIGINT) AS ws_tokens,
  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
  CAST(length(regexp_replace(text, '[A-Za-z0-9\t\n\f\r ]', '', 'g')) AS BIGINT) AS n_punct,
  CAST(en_h AS BIGINT) AS en_stops
FROM hits ORDER BY doc_id
"""


LANG_QUALITY_SQL = _lang_quality_sql()


def quality_scores_documents(sf_dir: str):
    """Float quality/stopword scores, fully hash-oracled (round-2 VERDICT
    item 1b): quality v2 is a pure double-arithmetic function of the
    ASCII-deterministic counts already oracled in lang_quality_documents, so
    the same op sequence in SQL reproduces it bit-for-bit; rounding is
    half-away-from-zero on both sides (np.round is banker's — wrong here).
    """
    from engine.ops.text import LangIdStage, TokenStatsStage

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    # Task pools: chained actor pools starve placement at low CPU counts.
    out = docs.map_batches(TokenStatsStage(), batch_format="pyarrow") \
        .map_batches(LangIdStage(), batch_format="pyarrow")
    return out.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "lang_pred": t.column("lang_pred"),
            "quality": pa.array(_half_away_round(
                t.column("quality").to_numpy(), 4)),
            "stop_ratio": pa.array(_half_away_round(
                t.column("stop_ratio").to_numpy(), 4)),
        }), batch_format="pyarrow", zero_copy_batch=True).sort("doc_id")


def _quality_scores_sql() -> str:
    en, es, de, fr = (_stop_in_list(lang) for lang in ("en", "es", "de", "fr"))
    # Mirrors TokenStatsStage op-for-op: L = max(len,1); pr/dr from the ASCII
    # counts; sr = en_stops/ws_tokens; quality = clamp(0.4*ls + 0.3*(1-min(
    # pr*5,1)) + 0.1*(1-min(dr*5,1)) + 0.2*min(sr*3,1)).  Same left-to-right
    # double arithmetic, so ROUND(...,4) agrees exactly.
    return rf"""
WITH toks AS (
  SELECT doc_id, text, regexp_extract_all(lower(text), '[^\t\n\f\r ]+') AS words
  FROM documents
), hits AS (
  SELECT doc_id, text, len(words) AS ws_tokens,
         {en} AS en_h, {es} AS es_h, {de} AS de_h, {fr} AS fr_h,
         GREATEST(length(text), 1) AS L,
         length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS nd,
         length(regexp_replace(text, '[A-Za-z0-9\t\n\f\r ]', '', 'g')) AS np
  FROM toks
), r AS (
  SELECT doc_id, text, ws_tokens, en_h, es_h, de_h, fr_h,
         LEAST(CAST(length(text) AS DOUBLE) / 200.0, 1.0) AS ls,
         CAST(np AS DOUBLE) / L AS qpr,
         CAST(nd AS DOUBLE) / L AS qdr,
         CASE WHEN ws_tokens = 0 THEN 0.0
              ELSE CAST(en_h AS DOUBLE) / ws_tokens END AS sr
  FROM hits
)
SELECT doc_id,
  CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
       WHEN ws_tokens = 0 THEN 'und'
       WHEN greatest(en_h, es_h, de_h, fr_h) = 0 THEN 'en'
       WHEN en_h >= es_h AND en_h >= de_h AND en_h >= fr_h THEN 'en'
       WHEN es_h >= de_h AND es_h >= fr_h THEN 'es'
       WHEN de_h >= fr_h THEN 'de'
       ELSE 'fr' END AS lang_pred,
  ROUND(GREATEST(0.0, LEAST(1.0,
        0.4 * ls + 0.3 * (1.0 - LEAST(qpr * 5, 1.0))
        + 0.1 * (1.0 - LEAST(qdr * 5, 1.0)) + 0.2 * LEAST(sr * 3, 1.0))), 4)
    AS quality,
  ROUND(sr, 4) AS stop_ratio
FROM r ORDER BY doc_id
"""


QUALITY_SCORES_SQL = _quality_scores_sql()


def repetition_stats_documents(sf_dir: str):
    """Gopher-style repetition quality signals (dup-token fraction, top-bigram
    mass, duplicated-5-gram mass) — see engine.ops.text.RepetitionStatsStage.
    Stateless scan, integer counts + single IEEE divisions, fully oracled."""
    from engine.ops.text import RepetitionStatsStage

    return _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(RepetitionStatsStage(), batch_format="pyarrow",
                     zero_copy_batch=True).sort("doc_id")


# Counts mirror RepetitionStatsStage: tokens via the shared RE2/ASCII class;
# bigram/5-gram lists via DuckDB list comprehensions (generate_series(1, n)
# is [] for n < 1, so short docs fall out with zero counts on both sides).
REPETITION_STATS_SQL = r"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(text, '[^\t\n\f\r ]+') AS toks
  FROM documents
), base AS (
  SELECT doc_id, len(toks) AS n, len(list_distinct(toks)) AS n_distinct,
    [toks[i] || ' ' || toks[i+1] FOR i IN generate_series(1, len(toks)-1)]
      AS bgs,
    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
       || ' ' || toks[i+4] FOR i IN generate_series(1, len(toks)-4)] AS fgs
  FROM d
), bgc AS (
  SELECT doc_id, MAX(c) AS topc FROM (
    SELECT doc_id, g, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(bgs) AS g FROM base) GROUP BY doc_id, g)
  GROUP BY doc_id
), fgd AS (
  SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_pos FROM (
    SELECT doc_id, g, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(fgs) AS g FROM base) GROUP BY doc_id, g)
  GROUP BY doc_id
)
SELECT base.doc_id,
  CAST(n AS BIGINT) AS n_tokens,
  CAST(n_distinct AS BIGINT) AS distinct_tokens,
  CAST(GREATEST(n - 1, 0) AS BIGINT) AS n_bigrams,
  CAST(COALESCE(topc, 0) AS BIGINT) AS top_bigram_count,
  CAST(GREATEST(n - 4, 0) AS BIGINT) AS n_5grams,
  CAST(COALESCE(dup_pos, 0) AS BIGINT) AS dup_5gram_positions,
  CASE WHEN n = 0 THEN 0.0
       ELSE CAST(n - n_distinct AS DOUBLE) / n END AS dup_token_frac,
  CASE WHEN n < 2 THEN 0.0
       ELSE CAST(COALESCE(topc, 0) AS DOUBLE) / (n - 1) END AS top_bigram_frac,
  CASE WHEN n < 5 THEN 0.0
       ELSE CAST(COALESCE(dup_pos, 0) AS DOUBLE) / (n - 4) END AS dup_5gram_frac
FROM base
LEFT JOIN bgc USING (doc_id) LEFT JOIN fgd USING (doc_id)
ORDER BY doc_id
"""

# The decontamination "benchmark" split: a deterministic slice of documents
# stands in for a fixed eval set (no external data in the sandbox).
DECONTAM_BENCH_MOD = 37
DECONTAM_WIDTH = 3


def decontaminate_documents(sf_dir: str):
    """Benchmark decontamination: flag training docs sharing any token
    3-shingle with the held-out slice (doc_id % 37 == 0).  Benchmark
    shingles collected once (worker-side dedup) and broadcast; the training
    side is a stateless scan — engine/ops/text.py:collect_shingle_set /
    DecontaminationStage document the broadcast gate and Bloom scale path."""
    import ray

    from engine.ops.text import DecontaminationStage, collect_shingle_set

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def split(t: pa.Table, keep_bench: bool) -> pa.Table:
        mask = (t.column("doc_id").to_numpy() % DECONTAM_BENCH_MOD) == 0
        return t.filter(pa.array(mask if keep_bench else ~mask))

    bench = docs.map_batches(
        lambda t: split(t, True),
        batch_format="pyarrow", zero_copy_batch=True)
    bench_ref = ray.put(collect_shingle_set(bench, width=DECONTAM_WIDTH))
    return docs.map_batches(
        lambda t: split(t, False),
        batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(DecontaminationStage(bench_ref, width=DECONTAM_WIDTH),
                     batch_format="pyarrow", zero_copy_batch=True) \
        .sort("doc_id")


def decontaminate_documents_bloom(sf_dir: str):
    """Benchmark decontamination via the BLOOM scale path: the benchmark
    shingle set is OR-merged into one Bloom bitset in the workers
    (engine/ops/text.py:collect_shingle_bloom) instead of broadcast as
    strings — the shape that survives benchmark sides past the
    DECONTAM_MAX_SHINGLES gate.  FPR is sized (1e-9) so the expected
    false-positive count over the corpus' probe set is ≪ 1; probes are
    deterministic, so the result hash-matches the SAME exact SQL oracle as
    decontaminate_documents (verified at sf0.001/0.01/0.1)."""
    import ray

    from engine.ops.text import BloomDecontaminationStage, collect_shingle_bloom

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def split(t: pa.Table, keep_bench: bool) -> pa.Table:
        mask = (t.column("doc_id").to_numpy() % DECONTAM_BENCH_MOD) == 0
        return t.filter(pa.array(mask if keep_bench else ~mask))

    bench = docs.map_batches(
        lambda t: split(t, True),
        batch_format="pyarrow", zero_copy_batch=True)
    bloom_ref = ray.put(collect_shingle_bloom(
        bench, width=DECONTAM_WIDTH, fp_rate=1e-9))
    return docs.map_batches(
        lambda t: split(t, False),
        batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(BloomDecontaminationStage(bloom_ref, width=DECONTAM_WIDTH),
                     batch_format="pyarrow", zero_copy_batch=True) \
        .sort("doc_id")


DECONTAMINATE_SQL = r"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(text, '[^\t\n\f\r ]+') AS toks
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                           FOR i IN generate_series(1, len(toks)-2)]) AS g
    FROM d)
), bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 37 = 0),
counts AS (
  SELECT e.doc_id, COUNT(*) AS total, COUNT(b.g) AS matched
  FROM (SELECT * FROM sh WHERE doc_id % 37 <> 0) e
  LEFT JOIN bench b ON e.g = b.g
  GROUP BY e.doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(c.total, 0) AS BIGINT) AS doc_shingles,
  CAST(COALESCE(c.matched, 0) AS BIGINT) AS matched_shingles,
  CAST(COALESCE(c.matched, 0) > 0 AS BIGINT) AS contaminated
FROM d LEFT JOIN counts c USING (doc_id)
WHERE d.doc_id % 37 <> 0 ORDER BY d.doc_id
"""

VOCAB_COVERAGE_K = 12


def vocab_coverage_documents(sf_dir: str):
    """Out-of-vocabulary rate against a frozen top-k corpus vocabulary —
    the vocabulary-coverage language/quality filter.  The vocab comes from
    the exact two-pass Misra-Gries heavy-hitter scan (no full-vocabulary
    shuffle; in production it is a frozen artifact computed once), is
    broadcast, and scoring is a stateless scan.  oov_rate is one IEEE
    division of exact int64s."""
    import ray

    from engine.ops.text import TOKEN_RE, heavy_hitter_terms
    from engine.stages import _broadcast_from_ref

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    vocab = set(heavy_hitter_terms(docs, k=VOCAB_COVERAGE_K)
                .column("term").to_pylist())
    vocab_ref = ray.put(vocab)

    def score(batch: pa.Table) -> pa.Table:
        v = _broadcast_from_ref(vocab_ref)
        texts = batch.column("text").to_pylist()
        n = np.zeros(len(texts), dtype=np.int64)
        oov = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = TOKEN_RE.findall(t or "")
            n[i] = len(toks)
            oov[i] = sum(1 for w in toks if w not in v)
        from engine.ops.text import safe_frac
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n), "oov_tokens": pa.array(oov),
            "oov_rate": pa.array(safe_frac(oov, n)),
        })

    return docs.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True).sort("doc_id")


VOCAB_COVERAGE_SQL = r"""
WITH t AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[^\t\n\f\r ]+')) AS term
  FROM documents
), v AS (
  SELECT term FROM (SELECT term, COUNT(*) AS cnt FROM t GROUP BY term)
  ORDER BY cnt DESC, term LIMIT 12
), per AS (
  SELECT doc_id, COUNT(*) AS n,
         COUNT(*) FILTER (WHERE term NOT IN (SELECT term FROM v)) AS oov
  FROM t GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(per.n, 0) AS BIGINT) AS n_tokens,
  CAST(COALESCE(per.oov, 0) AS BIGINT) AS oov_tokens,
  CASE WHEN COALESCE(per.n, 0) = 0 THEN 0.0
       ELSE CAST(per.oov AS DOUBLE) / per.n END AS oov_rate
FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id
"""


QUANTITY_HIST_EDGES = np.arange(0.0, 51.0, 5.0)   # 11 edges, 10 interior bins


def quantity_histogram(sf_dir: str):
    """User-facing fixed-bin histogram of l_quantity through the SAME
    mergeable Histogram sketch the drift checks ride
    (engine/checks/sketches.py:345) — per-batch partials, keyed tree
    merge, all 12 bins (under/overflow included) in the typed report.
    Ties the sketch's np.histogram bin convention (right-closed, last
    edge inclusive) to the DuckDB oracle."""
    import json as _json

    from engine.checks.sketches import Histogram
    from engine.stages import keyed_tree_reduce

    def partial(batch: pa.Table) -> pa.Table:
        h = Histogram(QUANTITY_HIST_EDGES)
        h.update(batch.column("l_quantity").to_numpy())
        st = {str(i): int(c) for i, c in enumerate(h.counts) if c}
        return pa.table({"state": pa.array([_json.dumps(st)],
                                           pa.large_string())})

    merged = keyed_tree_reduce(
        _read(sf_dir, "lineitem", columns=["l_quantity"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        lambda a, b: a + b)
    n_bins = QUANTITY_HIST_EDGES.size + 1
    return pa.table({
        "bin": pa.array(range(n_bins), pa.int64()),
        "n": pa.array([int(merged.get(str(i), 0)) for i in range(n_bins)],
                      pa.int64()),
    })


QUANTITY_HIST_SQL = r"""
WITH bins AS (SELECT CAST(range AS BIGINT) AS bin FROM range(12)),
assigned AS (
  SELECT CASE WHEN l_quantity < 0 THEN 0
              WHEN l_quantity > 50 THEN 11
              WHEN l_quantity = 50 THEN 10
              ELSE CAST(FLOOR(l_quantity / 5) AS BIGINT) + 1 END AS bin
  FROM lineitem
), c AS (SELECT bin, COUNT(*) AS n FROM assigned GROUP BY bin)
SELECT bins.bin, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM bins LEFT JOIN c USING (bin) ORDER BY bins.bin
"""


def source_quality_report(sf_dir: str):
    """Per-SOURCE corpus report (the provenance axis: which feed is
    sending short/empty documents): doc counts + exact token/char sums +
    single-division means, partials keyed by source through
    keyed_tree_reduce — the provenance column never shuffles raw rows."""
    import json as _json

    from engine.ops.text import TOKEN_RE
    from engine.stages import keyed_tree_reduce

    def partial(batch: pa.Table) -> pa.Table:
        st: dict[str, list[int]] = {}
        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        for s, t in zip(srcs, texts):
            t = t or ""
            cur = st.setdefault(s or "", [0, 0, 0])
            cur[0] += 1
            cur[1] += len(TOKEN_RE.findall(t))
            cur[2] += len(t)
        return pa.table({"state": pa.array([_json.dumps(st)],
                                           pa.large_string())})

    merged = keyed_tree_reduce(
        _read(sf_dir, "documents", columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        lambda a, b: [a[0] + b[0], a[1] + b[1], a[2] + b[2]])
    srcs = sorted(merged)
    n = np.array([merged[s][0] for s in srcs], dtype=np.int64)
    tok = np.array([merged[s][1] for s in srcs], dtype=np.int64)
    ch = np.array([merged[s][2] for s in srcs], dtype=np.int64)
    from engine.ops.text import safe_frac

    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "n_docs": pa.array(n), "sum_tokens": pa.array(tok),
        "sum_chars": pa.array(ch),
        "mean_tokens": pa.array(safe_frac(tok, n)),
        "mean_chars": pa.array(safe_frac(ch, n)),
    })


SOURCE_QUALITY_SQL = r"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(len(regexp_extract_all(text, '[^\t\n\f\r ]+'))) AS BIGINT)
    AS sum_tokens,
  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
  CAST(SUM(len(regexp_extract_all(text, '[^\t\n\f\r ]+'))) AS DOUBLE)
    / COUNT(*) AS mean_tokens,
  CAST(SUM(length(text)) AS DOUBLE) / COUNT(*) AS mean_chars
FROM documents GROUP BY source ORDER BY source
"""


def per_group_sample_documents(sf_dir: str, k: int = 3):
    """Deterministic per-group top-k sample (the reproducible reservoir):
    for each lang keep the k docs with smallest (md5(text), doc_id).

    Per-group top-k by a hash rank is ASSOCIATIVE, so each batch ships one
    bounded {lang: [k smallest pairs]} partial and keyed_tree_reduce merges
    them O(log batches) deep — no shuffle, no per-group skew sensitivity
    (a hot group still contributes k pairs per batch, not its row count).
    Hash-ordering makes the sample stable across retries/partitionings,
    which ds.random_sample is not."""
    import hashlib
    import json as _json

    from engine.stages import keyed_tree_reduce

    def partial(batch: pa.Table) -> pa.Table:
        st: dict[str, list] = {}
        langs = batch.column("lang").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        for lang, doc_id, t in zip(langs, ids, texts):
            key = (hashlib.md5((t or "").encode("utf-8", "ignore"))
                   .hexdigest(), doc_id)
            cur = st.setdefault(lang, [])
            cur.append(key)
            if len(cur) > k:
                cur.sort()
                del cur[k:]
        for cur in st.values():
            cur.sort()
        return pa.table({"state": pa.array([_json.dumps(st)],
                                           pa.large_string())})

    def merge(a: list, b: list) -> list:
        return sorted([tuple(x) for x in a] + [tuple(x) for x in b])[:k]

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    merged = keyed_tree_reduce(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True), merge)
    rows = [(lang, int(doc_id), md5, rank + 1)
            for lang, pairs in sorted(merged.items())
            for rank, (md5, doc_id) in enumerate(pairs)]
    return pa.table({
        "lang": pa.array([r[0] for r in rows], pa.string()),
        "doc_id": pa.array([r[1] for r in rows], pa.int64()),
        "md5": pa.array([r[2] for r in rows], pa.string()),
        "sample_rank": pa.array([r[3] for r in rows], pa.int64()),
    })


PER_GROUP_SAMPLE_SQL = r"""
WITH ranked AS (
  SELECT lang, doc_id, md5(text) AS md5,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(text), doc_id) AS rn
  FROM documents
)
SELECT lang, doc_id, md5, CAST(rn AS BIGINT) AS sample_rank
FROM ranked WHERE rn <= 3 ORDER BY lang, sample_rank
"""


def user_order_activity(sf_dir: str):
    """FULL OUTER join of per-user event totals with per-customer order
    totals — surfaces keys active on exactly one side (the reconciliation
    report shape).  Both inputs are pre-aggregated inside map_batches
    (combiner pattern) before the hash groupby, so the Dataset.join
    full_outer exchange moves one row per key, not per event/order."""
    import ray.data

    from engine.stages import shuffle_partitions

    def count_partial(key_col: str, out_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            keys = batch.column(key_col).to_numpy()
            vals, cnts = np.unique(keys, return_counts=True)
            return pa.table({"key": pa.array(vals, pa.int64()),
                             out_col: pa.array(cnts, pa.int64())})
        return fn

    def grouped(ds, col):
        return ds.groupby("key").aggregate(
            ray.data.aggregate.Sum(col, alias_name=col))

    # Materialize the aggregated (per-key, combiner-collapsed) sides once:
    # count() and the join would otherwise each re-execute the full scan
    # lineage (3x read cost measured in the sweep).
    ev = grouped(_read(sf_dir, "events", columns=["user_id"]).map_batches(
        count_partial("user_id", "n_events"), batch_format="pyarrow",
        zero_copy_batch=True), "n_events").materialize()
    od = grouped(_read(sf_dir, "orders", columns=["o_custkey"]).map_batches(
        count_partial("o_custkey", "n_orders"), batch_format="pyarrow",
        zero_copy_batch=True), "n_orders").materialize()
    # Width scales with the per-key row count, floored at 2 — the combiner
    # already collapsed the big scans, so a small key space must not pay
    # for cpus//2 idle hash-shuffle aggregators (measured 4.7s -> ~2s).
    ev_n, od_n = ev.count(), od.count()
    if ev_n == 0 and od_n == 0:
        # Ray's hash-join aggregator raises on schema-less empty inputs;
        # SQL returns a typed empty result — mirror that.
        return pa.table({
            "key": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "n_orders": pa.array([], pa.int64()),
            "in_events": pa.array([], pa.int64()),
            "in_orders": pa.array([], pa.int64()),
        })
    if ev_n == 0 or od_n == 0:
        # One-sided input: the empty side's groupby output is schema-less
        # and would crash the join aggregator too (KeyError 'key') — a
        # FULL OUTER join against an empty side IS the other side with the
        # absent count column null.
        side = od if ev_n == 0 else ev
        absent = "n_events" if ev_n == 0 else "n_orders"
        joined = side.map_batches(
            lambda t, _c=absent: t.append_column(
                _c, pa.array([None] * len(t), pa.int64())),
            batch_format="pyarrow", zero_copy_batch=True)
    else:
        nparts = max(2, min(shuffle_partitions(ev_n + od_n),
                            -(-(ev_n + od_n) // 100_000)))
        joined = ev.join(od, "full_outer", nparts, on=("key",),
                         left_suffix="_l", right_suffix="_r")

    def finalize(batch: pa.Table) -> pa.Table:
        def col(name):
            a = batch.column(name)
            return a.fill_null(0) if a.null_count else a
        n_ev = col("n_events").to_numpy().astype(np.int64)
        n_od = col("n_orders").to_numpy().astype(np.int64)
        return pa.table({
            "key": batch.column("key"),
            "n_events": pa.array(n_ev),
            "n_orders": pa.array(n_od),
            "in_events": pa.array((n_ev > 0).astype(np.int64)),
            "in_orders": pa.array((n_od > 0).astype(np.int64)),
        })

    return joined.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True).sort("key")


USER_ORDER_ACTIVITY_SQL = r"""
WITH e AS (SELECT user_id AS key, COUNT(*) AS n_events
           FROM events GROUP BY user_id),
o AS (SELECT o_custkey AS key, COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey)
SELECT COALESCE(e.key, o.key) AS key,
  CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
  CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
  CAST(e.key IS NOT NULL AS BIGINT) AS in_events,
  CAST(o.key IS NOT NULL AS BIGINT) AS in_orders
FROM e FULL OUTER JOIN o ON e.key = o.key ORDER BY key
"""


def profile_events(sf_dir: str):
    """Whole-table column profile of events (count / nulls / exact distinct
    / min-max per column) — see engine/checks/profile.py for the two-pass
    scale shape (tree-reduced partials + one batch-deduped distinct
    exchange; HLL swap-in at 100 TB)."""
    from engine.checks.profile import profile_table

    return profile_table(
        _read(sf_dir, "events"),
        ["event_id", "ts", "user_id", "event_type", "value", "props"])


def profile_events_approx(sf_dir: str):
    """The 100-TB profiler shape instantiated: ONE streaming pass, HLL
    register sketches instead of the exact-distinct (column, value)
    exchange (engine/checks/profile.py:profile_table_approx).  Rows-only
    in the driver gate (the distinct counts are approximate); the relative
    error vs PROFILE_EVENTS_SQL's exact counts is gated ≤ 2% in
    tests/test_ops.py::test_profile_events_approx_close_to_exact."""
    from engine.checks.profile import profile_table_approx

    return profile_table_approx(
        _read(sf_dir, "events"),
        ["event_id", "ts", "user_id", "event_type", "value", "props"])


def _profile_events_sql() -> str:
    def block(col: str, minmax: str) -> str:
        return f"""
SELECT '{col}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_nulls,
  CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
  {minmax.format(agg='MIN', col=col)} AS min_repr,
  {minmax.format(agg='MAX', col=col)} AS max_repr
FROM events"""

    as_str = "CAST({agg}({col}) AS VARCHAR)"
    as_f6 = "printf('%.6f', {agg}({col}))"
    as_epoch = "CAST(epoch_us({agg}({col})) AS VARCHAR)"
    parts = [block("event_id", as_str), block("ts", as_epoch),
             block("user_id", as_str), block("event_type", as_str),
             block("value", as_f6), block("props", as_str)]
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col_name"


PROFILE_EVENTS_SQL = _profile_events_sql()


def events_key_skew(sf_dir: str):
    """Key-SKEW diagnostics — the measurement companion of the engine's
    salted shuffles (north_rule: "skew handled explicitly"): per candidate
    partition key, the distributed per-key counts reduce to one summary
    row of exact skew statistics, including the integer ``salt_factor``
    (ceil(max_cnt / avg_cnt)) a pipeline would salt that key by.

    Contract: bounded-cardinality keys (the driver intake is O(distinct));
    for unbounded keys use heavy_hitter_terms on the key column instead —
    the hot keys are what salting needs, not the full histogram.  Shuffle
    volume is one (key, cnt) row per batch per distinct value (pc.value_
    counts partial), the same shape as every bounded-domain statistic.
    Empty input yields zero rows (matching the SQL HAVING guard)."""
    rows: dict[str, list] = {"key_col": [], "n_keys": [], "n_rows": [],
                             "max_cnt": [], "min_cnt": [], "cv": [],
                             "p50_cnt": [], "top1_share": [],
                             "salt_factor": []}
    for key in ("event_type", "user_id"):
        ds = _read(sf_dir, "events", columns=[key])

        def partial(batch: pa.Table, key=key) -> pa.Table:
            vc = pc.value_counts(batch.column(key))
            return pa.table({key: vc.field("values"),
                             "cnt": pc.cast(vc.field("counts"), pa.int64())})

        counts = ds.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True) \
            .groupby(key).sum("cnt").to_pandas()   # bounded by contract
        # Empty input: Ray's Aggregate degrades to a schema-less empty
        # frame — zero report rows, matching the SQL HAVING guard.
        if len(counts) == 0 or "sum(cnt)" not in counts.columns:
            continue
        cnt = counts["sum(cnt)"].to_numpy(dtype=np.float64)
        n_keys, n_rows = int(cnt.size), int(cnt.sum())
        mx, mn = int(cnt.max()), int(cnt.min())
        rows["key_col"].append(key)
        rows["n_keys"].append(n_keys)
        rows["n_rows"].append(n_rows)
        rows["max_cnt"].append(mx)
        rows["min_cnt"].append(mn)
        # population stddev / mean — matches SQL STDDEV_POP(cnt)/AVG(cnt)
        rows["cv"].append(float(_half_away_round(
            float(np.std(cnt)) / float(cnt.mean()), 6)))
        # percentile_cont(0.5): linear interpolation, exact halves on ints
        rows["p50_cnt"].append(float(_half_away_round(
            float(np.percentile(cnt, 50, method="linear")), 6)))
        rows["top1_share"].append(float(_half_away_round(mx / n_rows, 6)))
        # integer ceil(max * n_keys / n_rows): exact, no float boundary
        rows["salt_factor"].append((mx * n_keys + n_rows - 1) // n_rows)
    return pa.table({
        "key_col": pa.array(rows["key_col"], pa.string()),
        "n_keys": pa.array(rows["n_keys"], pa.int64()),
        "n_rows": pa.array(rows["n_rows"], pa.int64()),
        "max_cnt": pa.array(rows["max_cnt"], pa.int64()),
        "min_cnt": pa.array(rows["min_cnt"], pa.int64()),
        "cv": pa.array(rows["cv"], pa.float64()),
        "p50_cnt": pa.array(rows["p50_cnt"], pa.float64()),
        "top1_share": pa.array(rows["top1_share"], pa.float64()),
        "salt_factor": pa.array(rows["salt_factor"], pa.int64()),
    })


def _key_skew_sql() -> str:
    def block(col: str) -> str:
        return f"""
SELECT '{col}' AS key_col, CAST(COUNT(*) AS BIGINT) AS n_keys,
  CAST(SUM(cnt) AS BIGINT) AS n_rows,
  CAST(MAX(cnt) AS BIGINT) AS max_cnt, CAST(MIN(cnt) AS BIGINT) AS min_cnt,
  ROUND(STDDEV_POP(cnt) / AVG(cnt), 6) AS cv,
  ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY cnt), 6) AS p50_cnt,
  ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 6) AS top1_share,
  CAST((MAX(cnt) * COUNT(*) + SUM(cnt) - 1) // SUM(cnt) AS BIGINT)
    AS salt_factor
FROM (SELECT {col}, COUNT(*) AS cnt FROM events GROUP BY {col})
HAVING COUNT(*) > 0"""

    return ("\nUNION ALL\n".join(block(c) for c in ("event_type", "user_id"))
            + "\nORDER BY key_col")


EVENTS_KEY_SKEW_SQL = _key_skew_sql()


def events_checks_report(sf_dir: str):
    """The pluggable check REGISTRY (engine/checks/registry.py — the
    user-extension surface) run through the oracle gate: one streaming
    pass executes row_counts + null_rates over events and the summary
    becomes a typed report.  null_rate is k/n rounded to 6 places — exact
    on a null-free corpus; a corpus with nulls at an exact .5e-6 boundary
    would hit Python-vs-SQL rounding-mode differences (documented)."""
    from engine.checks.registry import run_checks

    res = run_checks(_read(sf_dir, "events"),
                     ["row_counts", "null_rates"])
    n_rows = int(res["row_counts"]["rows"])
    cols = sorted(res["null_rates"])
    return pa.table({
        "col_name": pa.array(cols, pa.string()),
        "n_rows": pa.array([n_rows] * len(cols), pa.int64()),
        "null_rate": pa.array([float(res["null_rates"][c]) for c in cols],
                              pa.float64()),
    })


def _events_checks_sql() -> str:
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    parts = [f"""
SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
  ROUND(CAST(COUNT(*) - COUNT({c}) AS DOUBLE)
        / GREATEST(COUNT(*), 1), 6) AS null_rate
FROM events""" for c in cols]
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col_name"


EVENTS_CHECKS_SQL = _events_checks_sql()


_PROFILE_LINEITEM_COLS = ["l_orderkey", "l_linenumber", "l_quantity",
                          "l_returnflag", "l_shipdate"]


def profile_lineitem(sf_dir: str):
    """Second profiler instantiation — exercises int32 (l_linenumber),
    double, string and timestamp columns on the widest driver table."""
    from engine.checks.profile import profile_table

    return profile_table(_read(sf_dir, "lineitem",
                               columns=_PROFILE_LINEITEM_COLS),
                         _PROFILE_LINEITEM_COLS)


def _profile_lineitem_sql() -> str:
    def block(col: str, minmax: str) -> str:
        return f"""
SELECT '{col}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_nulls,
  CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
  {minmax.format(agg='MIN', col=col)} AS min_repr,
  {minmax.format(agg='MAX', col=col)} AS max_repr
FROM lineitem"""

    as_str = "CAST({agg}({col}) AS VARCHAR)"
    as_f6 = "printf('%.6f', {agg}({col}))"
    as_epoch = "CAST(epoch_us({agg}({col})) AS VARCHAR)"
    parts = [block("l_orderkey", as_str), block("l_linenumber", as_str),
             block("l_quantity", as_f6), block("l_returnflag", as_str),
             block("l_shipdate", as_epoch)]
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col_name"


PROFILE_LINEITEM_SQL = _profile_lineitem_sql()


def term_frequency_spectrum(sf_dir: str):
    """Corpus frequency spectrum (Zipf profile): how many distinct terms
    occur exactly k times.  Double aggregation — wordcount partials →
    per-term total (the one unavoidable term exchange, already batch-
    combined) → count-of-counts re-partialed through keyed_tree_reduce
    (the k-axis is low-cardinality; no sparse groupby)."""
    import json as _json

    from engine.ops.text import term_doc_counts
    from engine.stages import keyed_tree_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    per_term = ds.map_batches(
        lambda b: term_doc_counts(b).drop_columns(["doc_id"]),
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("term").sum("tf")

    def spectrum_partial(batch: pa.Table) -> pa.Table:
        ks, cnts = np.unique(
            batch.column("sum(tf)").to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"state": pa.array(
            [_json.dumps({str(int(k)): int(c) for k, c in zip(ks, cnts)})],
            pa.large_string())})

    merged = keyed_tree_reduce(
        per_term.map_batches(spectrum_partial, batch_format="pyarrow"),
        lambda a, b: a + b)
    ks = sorted(int(k) for k in merged)
    return pa.table({
        "occurrences": pa.array(ks, pa.int64()),
        "n_terms": pa.array([int(merged[str(k)]) for k in ks], pa.int64()),
    })


TERM_SPECTRUM_SQL = r"""
WITH t AS (
  SELECT unnest(regexp_extract_all(text, '[^\t\n\f\r ]+')) AS term
  FROM documents
), c AS (SELECT term, COUNT(*) AS cnt FROM t GROUP BY term)
SELECT CAST(cnt AS BIGINT) AS occurrences,
       CAST(COUNT(*) AS BIGINT) AS n_terms
FROM c GROUP BY cnt ORDER BY occurrences
"""


def token_diversity_documents(sf_dir: str):
    """Per-document lexical diversity via the Simpson repeat index:
    sum(tf*(tf-1)) / (n*(n-1)) — the probability two random token draws
    are the same type.  Exact integer numerator/denominator + one IEEE
    division, stateless scan."""
    from engine.ops.text import TOKEN_RE

    def kernel(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = np.zeros(len(texts), dtype=np.int64)
        rep = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = TOKEN_RE.findall(t or "")
            n[i] = len(toks)
            if toks:
                _, cnts = np.unique(np.asarray(toks, dtype=object),
                                    return_counts=True)
                rep[i] = int((cnts * (cnts - 1)).sum())
        from engine.ops.text import safe_frac
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n),
            "repeat_pairs": pa.array(rep),
            "simpson_index": pa.array(safe_frac(rep, n * (n - 1))),
        })

    return _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(kernel, batch_format="pyarrow",
                     zero_copy_batch=True).sort("doc_id")


TOKEN_DIVERSITY_SQL = r"""
WITH t AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[^\t\n\f\r ]+')) AS term
  FROM documents
), tf AS (SELECT doc_id, term, COUNT(*) AS c FROM t GROUP BY doc_id, term),
per AS (
  SELECT doc_id, SUM(c) AS n, SUM(c * (c - 1)) AS rep
  FROM tf GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(per.n, 0) AS BIGINT) AS n_tokens,
  CAST(COALESCE(per.rep, 0) AS BIGINT) AS repeat_pairs,
  CASE WHEN COALESCE(per.n, 0) < 2 THEN 0.0
       ELSE CAST(per.rep AS DOUBLE) / (per.n * (per.n - 1)) END
    AS simpson_index
FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id
"""


def documents_diff(sf_dir: str):
    """Corpus-version diff (engine/ops/diff.py): v2 derives from documents
    by SQL-expressible rules (drop doc_id%13==0, append ' [edited]' to
    text of the %17==0 survivors, add %29==0 copies under key+1000000),
    so the oracle reconstructs v2 and the change set exactly.  The diff
    itself is the generic operator: per-side (key, md5) collapse inside
    map_batches + one full-outer join; unchanged rows never leave the
    join kernel."""
    from engine.ops.diff import table_diff

    v1 = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def make_v2(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        out_id, out_t = [], []
        for i, t in zip(ids, texts):
            i = int(i)
            if i % 13 == 0:
                continue
            out_id.append(i)
            out_t.append((t or "") + " [edited]" if i % 17 == 0 else t)
        for i, t in zip(ids, texts):
            if int(i) % 29 == 0:
                out_id.append(int(i) + 1_000_000)
                out_t.append(t)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "text": pa.array(out_t, pa.string())})

    v2 = v1.map_batches(make_v2, batch_format="pyarrow",
                        zero_copy_batch=True)
    diff = table_diff(v1, v2, key_col="doc_id", text_col="text")
    if isinstance(diff, pa.Table):         # both-empty: typed empty table
        return diff.rename_columns(["doc_id", "change"])
    return diff.map_batches(
        lambda t: pa.table({"doc_id": t.column("key"),
                            "change": t.column("change")}),
        batch_format="pyarrow", zero_copy_batch=True) \
        .sort(["doc_id", "change"])


DOCUMENTS_DIFF_SQL = r"""
WITH a0 AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 17 = 0 THEN text || ' [edited]' ELSE text END
           AS text
  FROM a0 WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 1000000, text FROM a0 WHERE doc_id % 29 = 0
), ah AS (SELECT doc_id, md5(text) AS h FROM a0),
bh AS (SELECT doc_id, md5(text) AS h FROM b)
SELECT COALESCE(ah.doc_id, bh.doc_id) AS doc_id,
  CASE WHEN bh.doc_id IS NULL THEN 'removed'
       WHEN ah.doc_id IS NULL THEN 'added'
       ELSE 'modified' END AS change
FROM ah FULL OUTER JOIN bh ON ah.doc_id = bh.doc_id
WHERE bh.doc_id IS NULL OR ah.doc_id IS NULL OR ah.h <> bh.h
ORDER BY doc_id, change
"""


BOILERPLATE_WIDTH = 3
BOILERPLATE_MIN_DOCS = 5
BOILERPLATE_TOP = 50


def boilerplate_ngrams(sf_dir: str):
    """Cross-document boilerplate detection (C4-style duplicated-span
    analysis): token 3-shingles appearing in >= 5 distinct documents,
    top-50 by document reach.  Per-batch kernel emits per-doc-distinct
    (shingle, doc occurrences) pairs — the wordcount combiner at shingle
    granularity — so the single exchange moves per-doc-distinct shingles,
    then the tiny survivor report sorts on the driver."""
    from engine.ops.text import TOKEN_RE

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        shingles, docs_l, occ = [], [], []
        ids = batch.column("doc_id").to_pylist()
        for doc_id, t in zip(ids, batch.column("text").to_pylist()):
            toks = TOKEN_RE.findall(t or "")
            c = Counter(" ".join(toks[j:j + BOILERPLATE_WIDTH])
                        for j in range(len(toks) - BOILERPLATE_WIDTH + 1))
            for g, k in c.items():
                shingles.append(g)
                docs_l.append(1)
                occ.append(int(k))
        return pa.table({"shingle": pa.array(shingles, pa.large_string()),
                         "n_docs": pa.array(docs_l, pa.int64()),
                         "n_occ": pa.array(occ, pa.int64())})

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("shingle").sum(["n_docs", "n_occ"])

    def survivors(batch: pa.Table) -> pa.Table:
        mask = pa.array(
            batch.column("sum(n_docs)").to_numpy(zero_copy_only=False)
            >= BOILERPLATE_MIN_DOCS)
        kept = batch.filter(mask)
        # Per-block top-K pre-cut (shingles partition across blocks, so the
        # global top-K is inside the union of per-block top-Ks): the driver
        # take_all sees <= K x blocks rows no matter how much boilerplate
        # the corpus has.
        rows = sorted(
            zip(kept.column("shingle").to_pylist(),
                kept.column("sum(n_docs)").to_pylist(),
                kept.column("sum(n_occ)").to_pylist()),
            key=lambda r: (-r[1], -r[2], r[0]))[:BOILERPLATE_TOP]
        return pa.table({
            "shingle": pa.array([r[0] for r in rows], pa.large_string()),
            "n_docs": pa.array([int(r[1]) for r in rows], pa.int64()),
            "n_occ": pa.array([int(r[2]) for r in rows], pa.int64()),
        })

    top = agg.map_batches(survivors, batch_format="pyarrow").take_all()
    rows = sorted(
        ((r["shingle"], r["n_docs"], r["n_occ"]) for r in top),
        key=lambda r: (-r[1], -r[2], r[0]))[:BOILERPLATE_TOP]
    return pa.table({
        "shingle": pa.array([r[0] for r in rows], pa.string()),
        "n_docs": pa.array([r[1] for r in rows], pa.int64()),
        "n_occ": pa.array([r[2] for r in rows], pa.int64()),
    })


BOILERPLATE_SQL = r"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(text, '[^\t\n\f\r ]+') AS toks
  FROM documents
), sh AS (
  SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                         FOR i IN generate_series(1, len(toks)-2)]) AS g
  FROM d
), agg AS (
  SELECT g AS shingle, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ
  FROM sh GROUP BY g
)
SELECT shingle, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_occ AS BIGINT) AS n_occ
FROM agg WHERE n_docs >= 5
ORDER BY n_docs DESC, n_occ DESC, shingle LIMIT 50
"""


# Demonstration rule set over lineitem — thresholds chosen so every rule
# kind fires on real rows (price_positive deliberately never fires: the
# zero-violation path must round-trip too).
LINEITEM_RULES = [
    {"name": "qty_le_30", "kind": "le", "col": "l_quantity", "value": 30},
    {"name": "disc_le_tax", "kind": "le_col", "col": "l_discount",
     "other": "l_tax"},
    {"name": "price_positive", "kind": "gt", "col": "l_extendedprice",
     "value": 0},
    {"name": "flag_known", "kind": "in_set", "col": "l_returnflag",
     "values": ["A", "N"]},
    {"name": "tax_range", "kind": "between", "col": "l_tax",
     "lo": 0, "hi": 0.05},
]

_LINEITEM_RULE_COLS = ["l_orderkey", "l_linenumber", "l_quantity",
                       "l_discount", "l_tax", "l_extendedprice",
                       "l_returnflag"]


def lineitem_constraint_violations(sf_dir: str):
    """Declarative constraint suite over lineitem -> violation rows
    (engine/checks/constraints.py): one vectorized kernel per rule per
    batch, stateless scan, zero shuffle."""
    from engine.checks.constraints import ConstraintSuite

    suite = ConstraintSuite(LINEITEM_RULES,
                            key_cols=["l_orderkey", "l_linenumber"])
    return _read(sf_dir, "lineitem", columns=_LINEITEM_RULE_COLS) \
        .map_batches(suite.violations_stage(), batch_format="pyarrow",
                     zero_copy_batch=True) \
        .sort(["l_orderkey", "l_linenumber", "rule"])


LINEITEM_VIOLATIONS_SQL = r"""
WITH v AS (
  SELECT l_orderkey, l_linenumber, 'qty_le_30' AS rule
  FROM lineitem WHERE NOT (l_quantity <= 30)
  UNION ALL SELECT l_orderkey, l_linenumber, 'disc_le_tax'
  FROM lineitem WHERE NOT (l_discount <= l_tax)
  UNION ALL SELECT l_orderkey, l_linenumber, 'price_positive'
  FROM lineitem WHERE NOT (l_extendedprice > 0)
  UNION ALL SELECT l_orderkey, l_linenumber, 'flag_known'
  FROM lineitem WHERE l_returnflag NOT IN ('A', 'N')
  UNION ALL SELECT l_orderkey, l_linenumber, 'tax_range'
  FROM lineitem WHERE NOT (l_tax BETWEEN 0 AND 0.05)
)
SELECT l_orderkey, l_linenumber, rule FROM v
ORDER BY l_orderkey, l_linenumber, rule
"""


def lineitem_constraint_summary(sf_dir: str):
    """Per-rule (n_checked, n_violations) from the same suite — associative
    per-batch partials through keyed_tree_reduce (no groupby for a 5-key
    report)."""
    from engine.checks.constraints import ConstraintSuite

    suite = ConstraintSuite(LINEITEM_RULES,
                            key_cols=["l_orderkey", "l_linenumber"])
    return suite.summary_table(
        _read(sf_dir, "lineitem", columns=_LINEITEM_RULE_COLS))


LINEITEM_SUMMARY_SQL = r"""
SELECT rule, CAST(n AS BIGINT) AS n_checked,
       CAST(viol AS BIGINT) AS n_violations FROM (
  SELECT 'qty_le_30' AS rule, COUNT(*) AS n,
         COUNT(*) FILTER (WHERE NOT (l_quantity <= 30)) AS viol FROM lineitem
  UNION ALL SELECT 'disc_le_tax', COUNT(*),
         COUNT(*) FILTER (WHERE NOT (l_discount <= l_tax)) FROM lineitem
  UNION ALL SELECT 'price_positive', COUNT(*),
         COUNT(*) FILTER (WHERE NOT (l_extendedprice > 0)) FROM lineitem
  UNION ALL SELECT 'flag_known', COUNT(*),
         COUNT(*) FILTER (WHERE l_returnflag NOT IN ('A', 'N')) FROM lineitem
  UNION ALL SELECT 'tax_range', COUNT(*),
         COUNT(*) FILTER (WHERE NOT (l_tax BETWEEN 0 AND 0.05)) FROM lineitem
) ORDER BY rule
"""


# ------------------------------------------------------------- big-big join


def revenue_by_segment_day(sf_dir: str):
    """lineitem ⋈ orders (big-big hash-shuffle join) + broadcast customer
    segment lookup; revenue per (segment, order month).

    The join shuffles only the projected key/measure columns; the small
    customer side is broadcast, not shuffled.
    """
    import ray

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    line = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def line_partial(batch: pa.Table) -> pa.Table:
        # Combiner before the shuffle: lineitem is clustered by orderkey, so
        # summing cents (and carrying the item count) within the batch cuts
        # the join probe side ~4x for free — no extra exchange.
        keys = batch.column("l_orderkey").to_numpy()
        cents = _half_away_cents(batch.column("l_extendedprice").to_numpy()
                                 * (1.0 - batch.column("l_discount").to_numpy()))
        uniq, inv = np.unique(keys, return_inverse=True)
        return pa.table({
            "o_orderkey": pa.array(uniq),
            "rev_c": pa.array(np.bincount(inv, weights=cents).astype(np.int64)),
            "n_items": pa.array(np.bincount(inv).astype(np.int64)),
        })

    from engine.stages import shuffle_partitions

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    if cust.count() <= DIM_BROADCAST_MAX_ROWS:
        bm, uniques = _segment_lookup(cust)
        lut_ref = ray.put(bm)
        uniq_arr = pa.array(uniques, pa.string())

        def order_tag(batch: pa.Table) -> pa.Table:
            from engine.stages import _broadcast_from_ref

            code, found = _broadcast_from_ref(lut_ref).lookup(
                batch.column("o_custkey").to_numpy())
            months = pc.strftime(batch.column("o_orderdate"), format="%Y-%m")
            keep = pa.array(found)
            # Inner-join semantics: drop orders with no matching customer.
            return pa.table({
                "o_orderkey": batch.column("o_orderkey").filter(keep),
                "segment": uniq_arr.take(pa.array(code[found].astype(np.int32))),
                "month": months.filter(keep),
            })

        tagged_orders = orders.map_batches(order_tag, batch_format="pyarrow",
                                           zero_copy_batch=True)
    else:
        # Dimension too large to broadcast: partitioned hash join instead.
        joined_orders = orders.join(
            cust, join_type="inner",
            num_partitions=shuffle_partitions(orders.count()),
            on=("o_custkey",), right_on=("c_custkey",))
        tagged_orders = joined_orders.map_batches(
            lambda t: pa.table({
                "o_orderkey": t.column("o_orderkey"),
                "segment": t.column("c_mktsegment"),
                "month": pc.strftime(t.column("o_orderdate"), format="%Y-%m"),
            }), batch_format="pyarrow", zero_copy_batch=True)

    joined = line.map_batches(line_partial, batch_format="pyarrow", zero_copy_batch=True).join(
        tagged_orders,
        join_type="inner", num_partitions=shuffle_partitions(line.count()),
        on=("o_orderkey",),
    )

    def agg_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["segment", "month", "n_items", "rev_c"]) \
            .group_by(["segment", "month"], use_threads=False) \
            .aggregate([("n_items", "sum"), ("rev_c", "sum")])
        return g.rename_columns(["segment", "month", "n", "rev_c"])

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "segment": batch.column("segment"),
            "month": batch.column("month"),
            "n_items": batch.column("sum(n)"),
            "revenue": pa.array(_half_away_round(batch.column("sum(rev_c)").to_numpy() / 100.0, 2)),
        })

    return joined.map_batches(agg_partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["segment", "month"]).sum(["n", "rev_c"]) \
        .map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True) \
        .sort(["segment", "month"])


REVENUE_SQL = """
SELECT c_mktsegment AS segment, strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_items,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0, 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
GROUP BY segment, month ORDER BY segment, month
"""


def revenue_by_brand(sf_dir: str):
    """lineitem ⋈ part revenue per brand (TPC-H Q14 flavour) — the
    part-table dimension join.  The part side is a size-gated broadcast
    (BroadcastMap int keys → brand codes); brands are low-cardinality so
    the exchange is #batches × #brands partial rows.  Past the gate the
    join path shuffles (partkey, cents) partials instead.
    """
    import ray

    from engine.stages import shuffle_partitions

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    line = _read(sf_dir, "lineitem",
                 columns=["l_partkey", "l_extendedprice", "l_discount"])

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "brand": batch.column("brand"),
            "n_items": batch.column("sum(n)"),
            "revenue": pa.array(_half_away_round(
                batch.column("sum(rev_c)").to_numpy() / 100.0, 2)),
        })

    if part.count() <= DIM_BROADCAST_MAX_ROWS:
        bm, brands = _dim_code_lookup(part, "p_partkey", "p_brand")
        lut_ref = ray.put(bm)
        brand_arr = pa.array(brands, pa.string())

        def partial(batch: pa.Table) -> pa.Table:
            from engine.stages import _broadcast_from_ref

            code, found = _broadcast_from_ref(lut_ref).lookup(
                batch.column("l_partkey").to_numpy())
            cents = _half_away_cents(
                batch.column("l_extendedprice").to_numpy()
                * (1.0 - batch.column("l_discount").to_numpy()))
            code, cents = code[found], cents[found]   # inner-join semantics
            n_brands = len(brand_arr)
            rev = np.bincount(code, weights=cents, minlength=n_brands)
            cnt = np.bincount(code, minlength=n_brands)
            hit = cnt > 0
            return pa.table({
                "brand": brand_arr.take(pa.array(np.flatnonzero(hit).astype(np.int32))),
                "rev_c": pa.array(rev[hit].astype(np.int64)),
                "n": pa.array(cnt[hit].astype(np.int64)),
            })

        partials = line.map_batches(partial, batch_format="pyarrow",
                                    zero_copy_batch=True)
    else:
        def line_partial(batch: pa.Table) -> pa.Table:
            keys = batch.column("l_partkey").to_numpy()
            cents = _half_away_cents(
                batch.column("l_extendedprice").to_numpy()
                * (1.0 - batch.column("l_discount").to_numpy()))
            uniq, inv = np.unique(keys, return_inverse=True)
            return pa.table({
                "p_partkey": pa.array(uniq),
                "rev_c": pa.array(np.bincount(inv, weights=cents).astype(np.int64)),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
            })

        partials = line.map_batches(line_partial, batch_format="pyarrow",
                                    zero_copy_batch=True) \
            .join(part, join_type="inner",
                  num_partitions=shuffle_partitions(line.count()),
                  on=("p_partkey",)) \
            .map_batches(
                lambda t: pa.table({"brand": t.column("p_brand"),
                                    "rev_c": t.column("rev_c"),
                                    "n": t.column("n")}),
                batch_format="pyarrow", zero_copy_batch=True)

    # ONE shared aggregate tail for both gate paths (a duplicated tail can
    # silently diverge — the structure the gate-parity test protects).
    return partials.groupby("brand").sum(["n", "rev_c"]) \
        .map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True) \
        .sort("brand")


REVENUE_BY_BRAND_SQL = """
SELECT p_brand AS brand, COUNT(*) AS n_items,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0, 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY brand ORDER BY brand
"""


def supplier_stats_by_region(sf_dir: str):
    """supplier ⋈ nation ⋈ region: supplier count + account balance per
    region — the two tiny dimensions collapse to one driver-built
    suppkey-side lookup (nationkey → region name), and the supplier scan
    emits per-batch per-region partials (#batches × #regions rows)."""
    import pandas as pd

    nation = {r["n_nationkey"]: r["n_regionkey"]
              for r in _read(sf_dir, "nation",
                             columns=["n_nationkey", "n_regionkey"]).take_all()}
    region = {r["r_regionkey"]: r["r_name"]
              for r in _read(sf_dir, "region",
                             columns=["r_regionkey", "r_name"]).take_all()}
    nat_to_region = {nk: region[rk] for nk, rk in nation.items() if rk in region}

    def partial(batch: pa.Table) -> pa.Table:
        nk = batch.column("s_nationkey").to_numpy(zero_copy_only=False)
        cents = _half_away_cents(batch.column("s_acctbal").to_numpy())
        names = pd.Series(nk).map(nat_to_region)
        keep = names.notna().to_numpy()
        df = pd.DataFrame({"region": names[keep],
                           "bal_c": cents[keep]})
        g = df.groupby("region", as_index=False).agg(
            n=("bal_c", "size"), bal_c=("bal_c", "sum"))
        return pa.table({"region": pa.array(g["region"], pa.string()),
                         "n": pa.array(g["n"].to_numpy().astype(np.int64)),
                         "bal_c": pa.array(g["bal_c"].to_numpy().astype(np.int64))})

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "region": batch.column("region"),
            "n_suppliers": batch.column("sum(n)"),
            "acctbal": pa.array(_half_away_round(
                batch.column("sum(bal_c)").to_numpy() / 100.0, 2)),
        })

    return _read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"]) \
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("region").sum(["n", "bal_c"]) \
        .map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True) \
        .sort("region")


SUPPLIER_REGION_SQL = """
SELECT r_name AS region, COUNT(*) AS n_suppliers,
       ROUND(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) / 100.0, 2) AS acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


# ------------------------------------------------------------------- set ops


def union_region_nation_names(sf_dir: str):
    """Set-ops demo: ds.union of two projected streams (no shuffle — blocks
    are concatenated lazily), deterministic order via the final sort."""
    regions = _read(sf_dir, "region", columns=["r_regionkey", "r_name"]).map_batches(
        lambda t: pa.table({"name": t.column("r_name"),
                            "kind": pa.array(["region"] * t.num_rows, pa.string())}),
        batch_format="pyarrow", zero_copy_batch=True)
    nations = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).map_batches(
        lambda t: pa.table({"name": t.column("n_name"),
                            "kind": pa.array(["nation"] * t.num_rows, pa.string())}),
        batch_format="pyarrow", zero_copy_batch=True)
    return regions.union(nations).sort(["kind", "name"])


def users_purchase_and_error(sf_dir: str):
    """INTERSECT: users who both purchased AND hit an error — one scan, a
    per-batch (user, flags) dedup partial, then a user groupby with max
    over the two membership flags (intersection = both flags set).  The
    classic two-branch INTERSECT without scanning the table twice.
    """
    import pandas as pd

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type").to_pandas()
        users = batch.column("user_id").to_numpy()
        df = pd.DataFrame({
            "user_id": users,
            "p": (types == "purchase").to_numpy().astype(np.int64),
            "e": (types == "error").to_numpy().astype(np.int64),
        })
        g = df.groupby("user_id", as_index=False, dropna=False).agg(p=("p", "max"), e=("e", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("user_id").max(["p", "e"]) \
        .map_batches(lambda t: pa.table({
            "user_id": t.column("user_id").filter(
                pc.and_(pc.equal(t.column("max(p)"), 1),
                        pc.equal(t.column("max(e)"), 1)))}),
            batch_format="pyarrow", zero_copy_batch=True) \
        .sort("user_id")


INTERSECT_SQL = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
ORDER BY user_id
"""


def users_never_purchased(sf_dir: str):
    """EXCEPT: users with events but no purchase — same one-scan flag
    groupby shape as the INTERSECT query, filtered on the complement."""
    import pandas as pd

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type").to_pandas()
        users = batch.column("user_id").to_numpy()
        df = pd.DataFrame({
            "user_id": users,
            "p": (types == "purchase").to_numpy().astype(np.int64),
        })
        g = df.groupby("user_id", as_index=False).agg(p=("p", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("user_id").max("p") \
        .map_batches(lambda t: pa.table({
            "user_id": t.column("user_id").filter(
                pc.equal(t.column("max(p)"), 0))}),
            batch_format="pyarrow", zero_copy_batch=True)
    # Small-report materialization with an explicit schema: on this dense
    # corpus the true answer is EMPTY, and Ray drops the column set of an
    # all-empty Dataset through sort/to_pandas (schema None) — the same
    # pattern _embedding_near_dup_exact uses.  The report is bounded by
    # the non-purchasing user count; a corpus where that set rivals the
    # user table would stream this as a Dataset instead.
    ids = sorted(r["user_id"] for r in out.take_all())
    return pa.table({"user_id": pa.array(ids, pa.int64())})


EXCEPT_SQL = """
SELECT DISTINCT user_id FROM events
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase'
ORDER BY user_id
"""


UNION_SQL = """
SELECT r_name AS name, 'region' AS kind FROM region
UNION ALL
SELECT n_name AS name, 'nation' AS kind FROM nation
ORDER BY kind, name
"""

def lineitem_quantity_ranks(sf_dir: str):
    """Row-level RANK / DENSE_RANK of l_quantity within each return flag
    (heavy ties — 50 distinct quantities over 10^5+ rows per flag) WITHOUT
    shuffling the fact table: per-group rank maps derived from the bounded
    value counts broadcast once, a stateless scan annotates every row
    (engine/stages.py:grouped_value_ranks)."""
    from engine.stages import grouped_value_ranks

    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_returnflag",
                        "l_quantity"])
    return grouped_value_ranks(
        ds, "l_returnflag", "l_quantity",
        carry_cols=["l_orderkey", "l_linenumber", "l_returnflag",
                    "l_quantity"]).sort(["l_orderkey", "l_linenumber"])


LINEITEM_QUANTITY_RANKS_SQL = """
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS dense_rnk
FROM lineitem
WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)
ORDER BY l_orderkey, l_linenumber
"""


def mode_quantity_by_returnflag(sf_dir: str):
    """Exact per-group MODE of l_quantity (ties -> smallest value), from
    the same bounded value counts as the quantile/MAD family."""
    from engine.stages import exact_group_mode

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    return exact_group_mode(ds, "l_returnflag", "l_quantity")


MODE_QUANTITY_SQL = """
WITH c AS (SELECT l_returnflag, l_quantity AS v, COUNT(*) AS n
           FROM lineitem GROUP BY 1, 2),
r AS (SELECT l_returnflag, v,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY n DESC, v) AS rn
      FROM c)
SELECT l_returnflag, v AS mode_value FROM r WHERE rn = 1
ORDER BY l_returnflag
"""


def mad_quantity_by_returnflag(sf_dir: str):
    """Exact grouped MEDIAN ABSOLUTE DEVIATION of l_quantity per return
    flag — the robust-statistics companion of quantiles_by_returnflag,
    derived from the same one-pass distributed value counts
    (engine/stages.py:exact_group_mad; the deviation distribution re-keys
    the counts driver-side, no second scan)."""
    from engine.stages import exact_group_mad

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    return exact_group_mad(ds, "l_returnflag", "l_quantity")


MAD_QUANTITY_SQL = """
WITH med AS (
  SELECT l_returnflag,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS m
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       percentile_cont(0.5) WITHIN GROUP (ORDER BY ABS(l.l_quantity - med.m))
           AS mad
FROM lineitem l JOIN med ON l.l_returnflag = med.l_returnflag
GROUP BY l.l_returnflag ORDER BY l.l_returnflag
"""


def quantiles_by_returnflag(sf_dir: str):
    """EXACT grouped quantiles (no t-digest): lineitem quantity per return
    flag via engine.stages.exact_group_quantiles — distributed value counts
    + percentile_cont interpolation on the bounded count table.  The exact
    companion to codec_duration_quantiles the way dedup_exact is to HLL."""
    from engine.stages import exact_group_quantiles

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    return exact_group_quantiles(
        ds, key="l_returnflag", value_col="l_quantity",
        qs={"p25": 0.25, "p50": 0.5, "p75": 0.75, "p95": 0.95})


QUANTILES_RETURNFLAG_SQL = """
SELECT l_returnflag,
  ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity), 4) AS p25,
  ROUND(percentile_cont(0.50) WITHIN GROUP (ORDER BY l_quantity), 4) AS p50,
  ROUND(percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity), 4) AS p75,
  ROUND(percentile_cont(0.95) WITHIN GROUP (ORDER BY l_quantity), 4) AS p95
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


DRIFT_SPLIT_TS_US = 1705363200000000   # 2024-01-16T00:00:00Z in epoch micros
DRIFT_VALUE_EDGES_LO = 0.0
DRIFT_VALUE_EDGES_HI = 500.0
DRIFT_VALUE_EDGES_N = 50               # interior bins; step 10


def _drift_split_counts(sf_dir: str):
    """Shared distributed-counts stage for the drift queries: per-batch
    (axis, bin, half) partial counts over events, merged by the
    keyed-tree-reduce finalize (a ~120-key groupby range-partitions into
    mostly-empty blocks — the RefBundle schema-warning class).  Returns
    the counts as a small pandas frame (axes x bins x 2 rows —
    driver-bounded by construction)."""

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    edges = np.linspace(DRIFT_VALUE_EDGES_LO, DRIFT_VALUE_EDGES_HI,
                        DRIFT_VALUE_EDGES_N + 1)

    def partial_counts(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.timestamp("us")).to_numpy().astype("datetime64[us]").astype(np.int64)
        half = (ts >= DRIFT_SPLIT_TS_US).astype(np.int8)
        types = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        values = batch.column("value").to_numpy().astype(np.float64)
        vbin = np.searchsorted(edges, values, side="right")
        vbin[values == edges[-1]] = edges.size - 1     # Histogram.update rule
        st: dict[str, int] = {}
        for h in (0, 1):
            m = half == h
            for t, c in zip(*np.unique(types[m], return_counts=True)):
                st[f"event_type\x1f{t}\x1f{h}"] = int(c)
            for b, c in zip(*np.unique(vbin[m], return_counts=True)):
                st[f"value\x1f{int(b):04d}\x1f{h}"] = int(c)
        return pa.table({"state": pa.array([json.dumps(st)],
                                           pa.large_string())})

    from engine.stages import keyed_tree_reduce

    merged = keyed_tree_reduce(
        ds.map_batches(partial_counts, batch_format="pyarrow",
                       zero_copy_batch=True),
        lambda a, b: a + b)
    import pandas as pd

    rows = [k.split("\x1f") + [v] for k, v in merged.items()]
    return pd.DataFrame(rows, columns=["axis", "bin", "half", "sum(cnt)"]) \
        .astype({"half": np.int8, "sum(cnt)": np.int64})


def _drift_split_histograms(counts):
    """counts frame → {axis: (expected Histogram, observed Histogram)} with
    bins in sorted-label order and empty under/overflow bins."""
    from engine.checks.sketches import Histogram

    out = {}
    for axis, grp in counts.groupby("axis", sort=True):
        labels = sorted(grp["bin"].unique())
        idx = {b: i for i, b in enumerate(labels)}
        vec = {0: np.zeros(len(labels), dtype=np.int64),
               1: np.zeros(len(labels), dtype=np.int64)}
        for _, row in grp.iterrows():
            vec[int(row["half"])][idx[row["bin"]]] = int(row["sum(cnt)"])
        dummy_edges = np.arange(len(labels) + 1, dtype=np.float64)
        h_e, h_o = Histogram(dummy_edges[:-1]), Histogram(dummy_edges[:-1])
        h_e.counts = np.concatenate([[0], vec[0], [0]])   # under/overflow empty
        h_o.counts = np.concatenate([[0], vec[1], [0]])
        out[axis] = (h_e, h_o)
    return out


def drift_events_split(sf_dir: str):
    """EXACT distribution drift on a real table: first half of the events
    month (ts < 2024-01-16) is the expected epoch, the second half the
    observed epoch; PSI and KS come from the SAME engine code the clips
    drift report uses (engine.checks.sketches.psi / ks_statistic), fed with
    exact distributed counts instead of sampled sketches — which makes the
    drift MATH hash-oracle-able in SQL.  Axes: event_type (categorical,
    alphabetical CDF order) and value (fixed uniform histogram edges
    0..500 step 10, searchsorted-right binning with the rightmost edge in
    the last interior bin, under/overflow bins explicit)."""
    from engine.checks.sketches import ks_statistic, psi

    hists = _drift_split_histograms(_drift_split_counts(sf_dir))
    out_axis, out_psi, out_ks = [], [], []
    for axis, (h_e, h_o) in hists.items():
        out_axis.append(axis)
        out_psi.append(float(_half_away_round(psi(h_e, h_o), 6)))
        out_ks.append(float(_half_away_round(ks_statistic(h_e, h_o), 6)))
    return pa.table({"axis": pa.array(out_axis, pa.string()),
                     "psi": pa.array(out_psi, pa.float64()),
                     "ks": pa.array(out_ks, pa.float64())})


def drift_divergences_split(sf_dir: str):
    """Companion drift report over the SAME distributed split counts:
    Jensen-Shannon divergence (natural log, exact 0*ln0=0 handling),
    two-sample chi-squared homogeneity statistic, 1-D Wasserstein distance
    at unit bin spacing, and total-variation distance — the remaining
    standard drift detectors a frozen-baseline validation suite runs
    alongside PSI/KS (engine/checks/sketches.py)."""
    from engine.checks.sketches import (
        chi2_homogeneity,
        js_divergence,
        total_variation,
        wasserstein_binned,
    )

    hists = _drift_split_histograms(_drift_split_counts(sf_dir))
    rows = {"axis": [], "jsd": [], "chi2": [], "wasserstein": [], "tv": []}
    for axis, (h_e, h_o) in hists.items():
        rows["axis"].append(axis)
        rows["jsd"].append(float(_half_away_round(js_divergence(h_e, h_o), 6)))
        rows["chi2"].append(float(_half_away_round(chi2_homogeneity(h_e, h_o), 4)))
        rows["wasserstein"].append(
            float(_half_away_round(wasserstein_binned(h_e, h_o), 6)))
        rows["tv"].append(float(_half_away_round(total_variation(h_e, h_o), 6)))
    return pa.table({
        "axis": pa.array(rows["axis"], pa.string()),
        "jsd": pa.array(rows["jsd"], pa.float64()),
        "chi2": pa.array(rows["chi2"], pa.float64()),
        "wasserstein": pa.array(rows["wasserstein"], pa.float64()),
        "tv": pa.array(rows["tv"], pa.float64()),
    })


DRIFT_EVENTS_SQL = """
WITH rows_ AS (
  SELECT CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS half,
    event_type,
    CASE WHEN value = 500.0 THEN 50
         WHEN value < 0 THEN 0
         WHEN value >= 500.0 THEN 51
         ELSE CAST(FLOOR(value / 10.0) AS INTEGER) + 1 END AS vbin
  FROM events
),
axes AS (
  SELECT 'event_type' AS axis, event_type AS bin, half FROM rows_
  UNION ALL
  SELECT 'value' AS axis, printf('%04d', vbin) AS bin, half FROM rows_
),
b AS (
  SELECT axis, bin,
    SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS ec,
    SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS oc
  FROM axes GROUP BY axis, bin
),
t AS (SELECT axis, SUM(ec) AS et, SUM(oc) AS ot FROM b GROUP BY axis),
p AS (
  SELECT b.axis, b.bin,
    CAST(b.ec AS DOUBLE) / GREATEST(t.et, 1.0) AS ef,
    CAST(b.oc AS DOUBLE) / GREATEST(t.ot, 1.0) AS ofr,
    GREATEST(CAST(b.ec AS DOUBLE) / GREATEST(t.et, 1.0), 1e-6) AS e,
    GREATEST(CAST(b.oc AS DOUBLE) / GREATEST(t.ot, 1.0), 1e-6) AS o
  FROM b JOIN t ON t.axis = b.axis
),
cdf AS (
  SELECT axis, bin, e, o, ef, ofr,
    SUM(ef) OVER (PARTITION BY axis ORDER BY bin) AS ecdf,
    SUM(ofr) OVER (PARTITION BY axis ORDER BY bin) AS ocdf
  FROM p
)
SELECT axis,
  ROUND(SUM((o - e) * LN(o / e)), 6) AS psi,
  ROUND(MAX(ABS(ecdf - ocdf)), 6) AS ks
FROM cdf GROUP BY axis ORDER BY axis
"""

DRIFT_DIVERGENCES_SQL = """
WITH rows_ AS (
  SELECT CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS half,
    event_type,
    CASE WHEN value = 500.0 THEN 50
         WHEN value < 0 THEN 0
         WHEN value >= 500.0 THEN 51
         ELSE CAST(FLOOR(value / 10.0) AS INTEGER) + 1 END AS vbin
  FROM events
),
axes AS (
  SELECT 'event_type' AS axis, event_type AS bin, half FROM rows_
  UNION ALL
  SELECT 'value' AS axis, printf('%04d', vbin) AS bin, half FROM rows_
),
b AS (
  SELECT axis, bin,
    SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS ec,
    SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS oc
  FROM axes GROUP BY axis, bin
),
t AS (SELECT axis, SUM(ec) AS et, SUM(oc) AS ot FROM b GROUP BY axis),
p AS (
  SELECT b.axis, b.bin, b.ec, b.oc, t.et, t.ot,
    CAST(b.ec AS DOUBLE) / GREATEST(t.et, 1.0) AS ef,
    CAST(b.oc AS DOUBLE) / GREATEST(t.ot, 1.0) AS ofr
  FROM b JOIN t ON t.axis = b.axis
),
cdf AS (
  SELECT axis, bin, ec, oc, et, ot, ef, ofr,
    SUM(ef) OVER (PARTITION BY axis ORDER BY bin) AS ecdf,
    SUM(ofr) OVER (PARTITION BY axis ORDER BY bin) AS ocdf
  FROM p
)
SELECT axis,
  ROUND(0.5 * SUM(CASE WHEN ef > 0
                       THEN ef * LN(ef / ((ef + ofr) / 2)) ELSE 0 END)
      + 0.5 * SUM(CASE WHEN ofr > 0
                       THEN ofr * LN(ofr / ((ef + ofr) / 2)) ELSE 0 END),
        6) AS jsd,
  ROUND(SUM(CASE WHEN ec + oc > 0 THEN
      POW(ec - (ec + oc) * et / (et + ot), 2)
        / ((ec + oc) * et / (et + ot))
    + POW(oc - (ec + oc) * ot / (et + ot), 2)
        / ((ec + oc) * ot / (et + ot))
    ELSE 0 END), 4) AS chi2,
  ROUND(SUM(ABS(ecdf - ocdf)), 6) AS wasserstein,
  ROUND(0.5 * SUM(ABS(ef - ofr)), 6) AS tv
FROM cdf GROUP BY axis ORDER BY axis
"""

HOP_US = 10_800_000_000           # 3-hour hop
WINDOW_SPAN = 2                    # window length = 2 hops (6 h, overlapping)


def events_hopping_window(sf_dir: str):
    """Hopping-window aggregate (6 h windows, 3 h hop): each event lands in
    exactly WINDOW_SPAN overlapping windows.  Scale shape: window assignment
    is a vectorized per-batch transform (no shuffle for the explode — rows
    are duplicated inside the batch), then the same partial-combiner ->
    small groupby pattern as events_daily_by_type bounds the exchange to
    O(batches x windows x types) rows.  Ray Data has no native window
    operator; this is the composition the north rule asks to document:
    assignment in map_batches, aggregation in a keyed groupby."""
    import pandas as pd

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = batch.column("ts").cast(pa.timestamp("us")) \
            .to_numpy().astype("datetime64[us]").astype(np.int64)
        base = (ts_us // HOP_US) * HOP_US
        types = batch.column("event_type").to_pandas()
        cents = _half_away_cents(batch.column("value").to_numpy(), 10000.0)
        frames = []
        for k in range(WINDOW_SPAN):
            frames.append(pd.DataFrame({
                "ws_us": base - k * HOP_US,
                "event_type": types,
                "value_c": cents,
            }))
        df = pd.concat(frames, ignore_index=True)
        g = df.groupby(["ws_us", "event_type"], as_index=False, dropna=False).agg(
            n=("value_c", "size"), sum_c=("value_c", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    def finalize(batch: pa.Table) -> pa.Table:
        ws = batch.column("ws_us").to_numpy().astype("datetime64[us]")
        return pa.table({
            "window_start": pa.array(
                np.datetime_as_string(ws, unit="s").astype(object), pa.string()),
            "event_type": batch.column("event_type"),
            "n": batch.column("sum(n)"),
            "sum_value": pa.array(_half_away_round(
                batch.column("sum(sum_c)").to_numpy() / 10000.0, 4)),
        })

    return ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["ws_us", "event_type"]).sum(["n", "sum_c"]) \
        .map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True) \
        .sort(["window_start", "event_type"])


EVENTS_HOPPING_SQL = """
WITH ev AS (
  SELECT event_type, value, epoch_us(ts) AS us FROM events
), w AS (
  SELECT event_type, value,
    ((us // 10800000000) - k.k) * 10800000000 AS ws
  FROM ev CROSS JOIN (SELECT 0 AS k UNION ALL SELECT 1 AS k) k
)
SELECT strftime(make_timestamp(ws), '%Y-%m-%dT%H:%M:%S') AS window_start,
  event_type, COUNT(*) AS n,
  ROUND(SUM(CAST(ROUND(value * 10000) AS BIGINT)) / 10000.0, 4) AS sum_value
FROM w GROUP BY 1, 2 ORDER BY 1, 2
"""
