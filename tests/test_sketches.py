"""Mergeability + accuracy of the sketch library (pure numpy, no Ray)."""

import numpy as np

from engine.checks.sketches import (
    BloomFilter,
    ColumnStats,
    Histogram,
    HyperLogLog,
    TDigest,
    ks_statistic,
    psi,
)


def test_column_stats_merge_equals_whole():
    rng = np.random.default_rng(1)
    data = rng.normal(10, 3, 50_000)
    whole = ColumnStats()
    whole.update(data)
    merged = ColumnStats()
    for chunk in np.array_split(data, 17):
        part = ColumnStats()
        part.update(chunk)
        merged.merge(ColumnStats.from_state(part.state()))
    a, b = whole.summary(), merged.summary()
    assert abs(a["mean"] - b["mean"]) < 1e-9
    assert abs(a["std"] - b["std"]) < 1e-9
    assert a["min"] == b["min"] and a["max"] == b["max"] and a["count"] == b["count"]


def test_tdigest_quantiles_within_tolerance():
    rng = np.random.default_rng(2)
    data = rng.exponential(5.0, 80_000)
    td = TDigest()
    for chunk in np.array_split(data, 11):
        part = TDigest()
        part.update(chunk)
        td.merge(TDigest.from_state(part.state()))
    for q in (0.1, 0.5, 0.9, 0.99):
        assert abs(td.quantile(q) - np.quantile(data, q)) < 0.35


def test_hll_error_bound():
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 2_000_000, 300_000)
    true = len(np.unique(ids))
    h = HyperLogLog()
    for chunk in np.array_split(ids, 9):
        part = HyperLogLog()
        part.update(chunk)
        h.merge(HyperLogLog.from_state(part.state()))
    assert abs(h.estimate() - true) / true < 0.03


def test_bloom_membership_and_fp():
    members = np.arange(50_000)
    bf = BloomFilter(50_000, 1e-3)
    bf.add(members)
    bf = BloomFilter.from_state(bf.state())
    assert bf.contains(members).all()
    assert bf.contains(np.arange(50_000, 120_000)).mean() < 5e-3


def test_drift_metrics_separate_shifted_distributions():
    rng = np.random.default_rng(4)
    edges = np.linspace(-5, 25, 31)
    base = Histogram(edges)
    base.update(rng.normal(10, 3, 50_000))
    same = Histogram(edges)
    same.update(rng.normal(10, 3, 50_000))
    moved = Histogram(edges)
    moved.update(rng.normal(12, 3, 50_000))
    assert psi(base, same) < 0.01 < psi(base, moved)
    assert ks_statistic(base, same) < 0.02 < ks_statistic(base, moved)


def test_misra_gries_guarantee_and_merge():
    """Every item with frequency > n/(capacity+1) must survive, stored
    counts are lower bounds within n/(capacity+1), and merging per-chunk
    summaries preserves both (mergeable-summaries rule)."""
    import numpy as np

    from engine.checks.sketches import MisraGries

    rng = np.random.default_rng(7)
    stream = [f"t{int(i)}" for i in rng.zipf(1.3, 30000) if i < 3000]
    n = len(stream)
    cap = 128
    from collections import Counter
    true = Counter(stream)

    merged = MisraGries(cap)
    for lo in range(0, n, 2500):
        part = MisraGries(cap)
        chunk = stream[lo:lo + 2500]
        vals, cnts = np.unique(np.asarray(chunk, dtype=object),
                               return_counts=True)
        part.update([str(v) for v in vals], cnts)
        merged.merge(MisraGries.from_state(part.state()))

    slack = n / (cap + 1)
    for item, freq in true.items():
        if freq > slack:
            assert item in merged.counts, (item, freq, slack)
        if item in merged.counts:
            est = merged.counts[item]
            assert est <= freq and freq - est <= slack, (item, freq, est)


def test_heavy_hitter_terms_matches_exact(ray_session):
    """The two-pass operator must return the EXACT top-k over a skewed
    multi-block corpus (ties broken by term), even with a tiny capacity."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from collections import Counter

    from engine.ops.text import TOKEN_RE, heavy_hitter_terms

    rng = np.random.default_rng(3)
    vocab = [f"w{j}" for j in range(400)]
    docs = []
    for _ in range(300):
        ws = [vocab[min(int(z) - 1, 399)] for z in rng.zipf(1.2, 40)]
        docs.append(" ".join(ws))
    ds = ray.data.from_arrow(pa.table({"text": pa.array(docs, pa.string())}))
    ds = ds.repartition(8)

    got = heavy_hitter_terms(ds, k=10, capacity=64)
    true = Counter(w for d in docs for w in TOKEN_RE.findall(d))
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got.column("term").to_pylist(),
                    got.column("cnt").to_pylist())) == want

    empty = ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    out = heavy_hitter_terms(empty, k=5)
    assert out.num_rows == 0 and out.schema.field("cnt").type == pa.int64()


def test_heavy_hitter_terms_flat_distribution_falls_back_exact(ray_session):
    """Near-flat frequencies (vocab >> capacity, counts within the MG error
    bound) defeat the sketch's separability certificate — the operator must
    detect that and still return the EXACT top-k via the full-vocab path."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from collections import Counter

    from engine.ops.text import TOKEN_RE, heavy_hitter_terms

    rng = np.random.default_rng(11)
    # 600 terms, each appearing 5 or 6 times — far more terms than capacity,
    # top-k count (6) nowhere near n/(capacity+1) ≈ 3300/17.
    terms = [f"t{j:03d}" for j in range(600)]
    bag = [t for t in terms for _ in range(5)]
    bag += [f"t{j:03d}" for j in rng.choice(600, 300, replace=False)]
    rng.shuffle(bag)
    docs = [" ".join(bag[i:i + 40]) for i in range(0, len(bag), 40)]
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(docs, pa.string())})).repartition(6)

    got = heavy_hitter_terms(ds, k=10, capacity=16)
    true = Counter(w for d in docs for w in TOKEN_RE.findall(d))
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got.column("term").to_pylist(),
                    got.column("cnt").to_pylist())) == want


def test_divergence_metrics_known_values_and_bounds():
    """JSD / chi2 / Wasserstein / TV: hand-computed small cases plus the
    standard bounds (JSD <= ln 2, TV in [0,1], W1 = sum |CDF gap|)."""
    import math

    from engine.checks.sketches import (
        chi2_homogeneity,
        js_divergence,
        total_variation,
        wasserstein_binned,
    )

    def hist(counts):
        h = Histogram(np.arange(len(counts) + 1, dtype=np.float64))
        h.counts = np.concatenate([[0], np.asarray(counts, np.int64), [0]])
        return h

    a, b = hist([10, 10]), hist([10, 10])
    for fn in (js_divergence, chi2_homogeneity, wasserstein_binned,
               total_variation):
        assert fn(a, b) == 0.0

    # Disjoint supports: JSD = ln 2, TV = 1, W1 = number of unit steps the
    # mass must travel (here 1), chi2 = N (2x2 table with zero diagonals).
    c, d = hist([20, 0]), hist([0, 20])
    assert abs(js_divergence(c, d) - math.log(2)) < 1e-12
    assert total_variation(c, d) == 1.0
    assert abs(wasserstein_binned(c, d) - 1.0) < 1e-12
    assert abs(chi2_homogeneity(c, d) - 40.0) < 1e-9

    # Hand check of a 2x2 chi-squared: counts e=[30,10], o=[20,20].
    # Totals: rows (50,30), cols (40,40), N=80.
    e, o = hist([30, 10]), hist([20, 20])
    expect = sum((obs - exp) ** 2 / exp for obs, exp in
                 [(30, 25), (20, 25), (10, 15), (20, 15)])
    assert abs(chi2_homogeneity(e, o) - expect) < 1e-9

    # W1 moves 1/4 of the mass by one unit step.
    assert abs(wasserstein_binned(e, o) - 0.25) < 1e-12
    assert abs(total_variation(e, o) - 0.25) < 1e-12

    # Symmetry + shifted normals separate, same-dist stays near zero.
    rng = np.random.default_rng(4)
    edges = np.linspace(-5, 25, 31)
    base, same, moved = Histogram(edges), Histogram(edges), Histogram(edges)
    base.update(rng.normal(10, 3, 50_000))
    same.update(rng.normal(10, 3, 50_000))
    moved.update(rng.normal(13, 3, 50_000))
    for fn in (js_divergence, total_variation, wasserstein_binned):
        assert abs(fn(base, moved) - fn(moved, base)) < 1e-12
        assert fn(base, same) < fn(base, moved)
    assert js_divergence(base, moved) <= math.log(2) + 1e-12
