"""Mergeable sketches for distributed column checks.

Every sketch here follows the same contract so it can run as per-batch
partials inside ``map_batches`` and merge associatively (tree or linear) in a
small actor / on the driver:

    s = Sketch(...); s.update(numpy_array); s.merge(other); s.summary()
    Sketch.from_state(s.state())   # plain-dict state → shippable via Arrow/JSON

Numerics are vectorized (numpy) — including t-digest compression, which
assigns buffered points to k-space clusters with searchsorted/reduceat
(no Python loop over row data anywhere).

These generalize the reference's validate-or-reject contract to column level
(SURVEY.md §2.D "Aggregations"); the reference itself has no aggregates.
"""

from __future__ import annotations

import math

import numpy as np

# --------------------------------------------------------------------- moments


class ColumnStats:
    """count / nulls / min / max / mean / variance via Chan's parallel update."""

    __slots__ = ("count", "nulls", "vmin", "vmax", "mean", "m2")

    def __init__(self) -> None:
        self.count = 0          # non-null values
        self.nulls = 0
        self.vmin = math.inf
        self.vmax = -math.inf
        self.mean = 0.0
        self.m2 = 0.0

    def update(self, values: np.ndarray, null_count: int = 0) -> None:
        self.nulls += null_count
        n = values.size
        if n == 0:
            return
        b_mean = float(values.mean())
        b_m2 = float(((values - b_mean) ** 2).sum())
        self.vmin = min(self.vmin, float(values.min()))
        self.vmax = max(self.vmax, float(values.max()))
        self._combine(n, b_mean, b_m2)

    def _combine(self, n: int, b_mean: float, b_m2: float) -> None:
        total = self.count + n
        delta = b_mean - self.mean
        self.mean += delta * n / total
        self.m2 += b_m2 + delta * delta * self.count * n / total
        self.count = total

    def merge(self, other: "ColumnStats") -> "ColumnStats":
        self.nulls += other.nulls
        if other.count:
            self.vmin = min(self.vmin, other.vmin)
            self.vmax = max(self.vmax, other.vmax)
            self._combine(other.count, other.mean, other.m2)
        return self

    def state(self) -> dict:
        # min/max are None (not ±inf) for an empty sketch: inf is not valid
        # JSON and breaks strict parsers reading the frozen baseline.
        return {
            "count": self.count, "nulls": self.nulls,
            "min": self.vmin if self.count else None,
            "max": self.vmax if self.count else None,
            "mean": self.mean, "m2": self.m2,
        }

    @classmethod
    def from_state(cls, s: dict) -> "ColumnStats":
        out = cls()
        out.count = int(s["count"])
        out.nulls = int(s["nulls"])
        out.vmin = float(s["min"]) if s["min"] is not None else math.inf
        out.vmax = float(s["max"]) if s["max"] is not None else -math.inf
        out.mean = float(s["mean"])
        out.m2 = float(s["m2"])
        return out

    def summary(self) -> dict:
        var = self.m2 / self.count if self.count else float("nan")
        return {
            "count": self.count,
            "nulls": self.nulls,
            "null_rate": self.nulls / (self.count + self.nulls) if (self.count + self.nulls) else 0.0,
            "min": self.vmin if self.count else None,
            "max": self.vmax if self.count else None,
            "mean": self.mean if self.count else None,
            "std": math.sqrt(var) if self.count else None,
        }


# -------------------------------------------------------------------- t-digest


class TDigest:
    """Merging t-digest (Dunning) for streaming quantiles.

    Buffered: updates append, compression runs when the buffer passes
    ``4 * compression`` points; merge concatenates centroid sets and
    recompresses — associative up to quantile error ~1/compression.
    """

    __slots__ = ("compression", "means", "weights", "vmin", "vmax", "_buf_m", "_buf_w")

    def __init__(self, compression: int = 200) -> None:
        self.compression = compression
        self.means = np.empty(0)
        self.weights = np.empty(0)
        self.vmin = math.inf
        self.vmax = -math.inf
        self._buf_m: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []

    def update(self, values: np.ndarray) -> None:
        if values.size == 0:
            return
        # copy=True: buffering a view of the caller's array would silently
        # corrupt the digest if the caller reuses its batch buffer.
        vals = np.array(values, dtype=np.float64, copy=True)
        self.vmin = min(self.vmin, float(vals.min()))
        self.vmax = max(self.vmax, float(vals.max()))
        self._buf_m.append(vals)
        self._buf_w.append(np.ones(vals.size))
        # Flush at ~20x compression: compression cost is one argsort of the
        # buffer, so a bigger buffer amortizes it (accuracy is unchanged —
        # the k-space invariant is enforced at every compress).
        if sum(m.size for m in self._buf_m) + self.means.size > 20 * self.compression:
            self._compress()

    def merge(self, other: "TDigest") -> "TDigest":
        other._compress()
        if other.means.size:
            self.vmin = min(self.vmin, other.vmin)
            self.vmax = max(self.vmax, other.vmax)
            self._buf_m.append(other.means)
            self._buf_w.append(other.weights)
        self._compress()
        return self

    def _compress(self) -> None:
        """Vectorized k-space merge (textbook MergingDigest): each sorted
        point lands in the cluster floor(k(q_end)); clusters then reduce via
        reduceat — no Python loop over points."""
        if not self._buf_m and self.means.size <= 2 * self.compression:
            return
        if self.means.size:
            self._buf_m.append(self.means)
            self._buf_w.append(self.weights)
        if not self._buf_m:
            return
        m = np.concatenate(self._buf_m)
        w = np.concatenate(self._buf_w)
        self._buf_m, self._buf_w = [], []
        order = np.argsort(m, kind="mergesort")
        m, w = m[order], w[order]
        q_end = np.cumsum(w) / w.sum()
        k_end = self._k_vec(q_end)
        cluster = np.floor(k_end - 1e-12).astype(np.int64)
        starts = np.flatnonzero(np.concatenate([[True], cluster[1:] != cluster[:-1]]))
        sum_w = np.add.reduceat(w, starts)
        sum_wm = np.add.reduceat(w * m, starts)
        self.means = sum_wm / sum_w
        self.weights = sum_w

    def _k_vec(self, q: np.ndarray) -> np.ndarray:
        q = np.clip(q, 0.0, 1.0)
        return self.compression * (np.arcsin(2 * q - 1) / math.pi + 0.5)

    def quantile(self, q: float) -> float:
        self._compress()
        if self.means.size == 0:
            return float("nan")
        total = float(self.weights.sum())
        # Dunning-style tails: interpolate the first/last half-centroid down
        # to the tracked min/max so p0/p100 (and extreme tail quantiles) hit
        # the true extremes instead of clamping at interior centroid means.
        cum = np.cumsum(self.weights) - self.weights / 2
        xp = np.concatenate([[0.0], cum, [total]])
        fp = np.concatenate([[self.vmin], self.means, [self.vmax]])
        return float(np.interp(q * total, xp, fp))

    def state(self) -> dict:
        self._compress()
        return {
            "compression": self.compression,
            "means": self.means.tolist(),
            "weights": self.weights.tolist(),
            "min": self.vmin if self.means.size else None,
            "max": self.vmax if self.means.size else None,
        }

    @classmethod
    def from_state(cls, s: dict) -> "TDigest":
        out = cls(int(s["compression"]))
        out.means = np.array(s["means"], dtype=np.float64)
        out.weights = np.array(s["weights"], dtype=np.float64)
        # Older states carry no min/max: fall back to the edge centroids.
        vmin, vmax = s.get("min"), s.get("max")
        if vmin is None:
            vmin = float(out.means[0]) if out.means.size else math.inf
        if vmax is None:
            vmax = float(out.means[-1]) if out.means.size else -math.inf
        out.vmin, out.vmax = float(vmin), float(vmax)
        return out


# ---------------------------------------------------------------------- HLL++


class HyperLogLog:
    """Dense HyperLogLog with 64-bit hashes (no 32-bit far-range correction
    needed) and linear counting for the small range — classic Flajolet
    estimator; the HLL++ mid-range empirical bias table is NOT implemented
    (measured error in the transition region ~0.4% at p=14)."""

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 14) -> None:
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def hash64(values) -> np.ndarray:
        """Vectorized 64-bit mix of arbitrary values (via bytes → u64 FNV/splitmix)."""
        import pandas as pd
        h = pd.util.hash_array(np.asarray(values), categorize=False).astype(np.uint64)
        # splitmix64 finisher for avalanche
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return h ^ (h >> np.uint64(31))

    def update_hashes(self, h: np.ndarray) -> None:
        if h.size == 0:
            return
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        tail = h << np.uint64(self.p)
        # rank = leading zeros of tail + 1 (tail==0 → 64-p+1)
        nz = tail != 0
        rank = np.full(h.size, 64 - self.p + 1, dtype=np.uint8)
        if nz.any():
            # leading zeros via bit_length: lz = 64 - bit_length(tail)
            bl = np.zeros(h.size, dtype=np.int64)
            t = tail.copy()
            for shift in (32, 16, 8, 4, 2, 1):
                mask = t >= (np.uint64(1) << np.uint64(shift))
                bl[mask] += shift
                t[mask] >>= np.uint64(shift)
            bl[t > 0] += 1
            rank_nz = (64 - bl + 1).astype(np.uint8)
            rank = np.where(nz, rank_nz, rank)
        np.maximum.at(self.registers, idx, rank)

    def update(self, values) -> None:
        self.update_hashes(self.hash64(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * m and zeros:
            return m * math.log(m / zeros)  # linear counting for small cardinalities
        return float(est)

    def state(self) -> dict:
        return {"p": self.p, "registers": self.registers.tobytes().hex()}

    @classmethod
    def from_state(cls, s: dict) -> "HyperLogLog":
        out = cls(int(s["p"]))
        out.registers = np.frombuffer(bytes.fromhex(s["registers"]), dtype=np.uint8).copy()
        return out


# ---------------------------------------------------------------------- Bloom


class BloomFilter:
    """Broadcastable Bloom filter for referential membership probes.

    Build once from the dimension side, ``ray.put`` the state, probe per batch
    (vectorized double hashing: g_i = h1 + i*h2 mod m).
    """

    __slots__ = ("m", "k", "bits")

    def __init__(self, capacity: int, fp_rate: float = 1e-3) -> None:
        m = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.m = (m + 63) // 64 * 64
        self.k = max(1, round(self.m / max(capacity, 1) * math.log(2)))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)

    def _positions(self, values) -> np.ndarray:
        h1 = HyperLogLog.hash64(values)
        # |1 avoids a zero stride; note m = 64*ceil(m/64) has odd factors,
        # so an odd h2 sharing one gives a sub-m probe period — acceptable
        # because k << period for every practical filter size.
        h2 = (h1 >> np.uint64(33)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) % np.uint64(self.m)

    def add(self, values) -> None:
        pos = self._positions(values).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))

    def contains(self, values) -> np.ndarray:
        pos = self._positions(values)
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def state(self) -> dict:
        return {"m": self.m, "k": self.k, "bits": self.bits.tobytes().hex()}

    @classmethod
    def from_state(cls, s: dict) -> "BloomFilter":
        out = cls.__new__(cls)
        out.m = int(s["m"])
        out.k = int(s["k"])
        out.bits = np.frombuffer(bytes.fromhex(s["bits"]), dtype=np.uint64).copy()
        return out


# -------------------------------------------------------------------- histogram


class Histogram:
    """Fixed-bin histogram (mergeable) — backbone for PSI / KS drift checks."""

    __slots__ = ("edges", "counts")

    def __init__(self, edges: np.ndarray) -> None:
        self.edges = np.asarray(edges, dtype=np.float64)
        self.counts = np.zeros(self.edges.size + 1, dtype=np.int64)  # under/overflow bins

    def update(self, values: np.ndarray) -> None:
        if not values.size:
            return
        if np.issubdtype(values.dtype, np.floating):
            values = values[~np.isnan(values)]      # NaN is not "overflow"
            if not values.size:
                return
        idx = np.searchsorted(self.edges, values, side="right")
        # np.histogram convention: the rightmost edge belongs to the last
        # interior bin, not to overflow.
        idx[values == self.edges[-1]] = self.edges.size - 1
        self.counts += np.bincount(idx, minlength=self.counts.size)

    def _require_same_edges(self, other: "Histogram") -> None:
        if self.edges.size != other.edges.size or \
                not np.array_equal(self.edges, other.edges):
            raise ValueError(
                "histogram edges differ — merging/comparing by bin index "
                "would be silently wrong; re-freeze the baseline sketch")

    def merge(self, other: "Histogram") -> "Histogram":
        self._require_same_edges(other)
        self.counts += other.counts
        return self

    def state(self) -> dict:
        return {"edges": self.edges.tolist(), "counts": self.counts.tolist()}

    @classmethod
    def from_state(cls, s: dict) -> "Histogram":
        out = cls(np.array(s["edges"]))
        out.counts = np.array(s["counts"], dtype=np.int64)
        return out


def psi(expected: Histogram, observed: Histogram, eps: float = 1e-6) -> float:
    """Population Stability Index between two same-edged histograms."""
    expected._require_same_edges(observed)
    e = expected.counts.astype(np.float64)
    o = observed.counts.astype(np.float64)
    e = np.clip(e / max(e.sum(), 1.0), eps, None)
    o = np.clip(o / max(o.sum(), 1.0), eps, None)
    return float(np.sum((o - e) * np.log(o / e)))


def ks_statistic(expected: Histogram, observed: Histogram) -> float:
    """Kolmogorov–Smirnov D statistic from binned CDFs (same edges)."""
    expected._require_same_edges(observed)
    e = expected.counts.astype(np.float64)
    o = observed.counts.astype(np.float64)
    e_cdf = np.cumsum(e) / max(e.sum(), 1.0)
    o_cdf = np.cumsum(o) / max(o.sum(), 1.0)
    return float(np.max(np.abs(e_cdf - o_cdf)))


def js_divergence(expected: Histogram, observed: Histogram) -> float:
    """Jensen-Shannon divergence (natural log) between two same-edged
    histograms.  Uses the exact 0*ln(0/x) = 0 convention (no epsilon
    flooring): JSD is finite for any pair of distributions, unlike KL, so
    zero bins need no clipping.  Bounded by ln 2."""
    expected._require_same_edges(observed)
    e = expected.counts.astype(np.float64)
    o = observed.counts.astype(np.float64)
    p = e / max(e.sum(), 1.0)
    q = o / max(o.sum(), 1.0)
    m = 0.5 * (p + q)
    with np.errstate(divide="ignore", invalid="ignore"):
        kp = np.where(p > 0, p * np.log(p / m), 0.0)
        kq = np.where(q > 0, q * np.log(q / m), 0.0)
    return float(0.5 * kp.sum() + 0.5 * kq.sum())


def chi2_homogeneity(expected: Histogram, observed: Histogram) -> float:
    """Two-sample chi-squared homogeneity statistic: for each bin b and
    sample h, E_hb = rowtotal_b * coltotal_h / N; bins empty in BOTH
    samples contribute 0 (their E is 0)."""
    expected._require_same_edges(observed)
    e = expected.counts.astype(np.float64)
    o = observed.counts.astype(np.float64)
    n = e.sum() + o.sum()
    if n == 0:
        return 0.0
    rb = e + o
    mask = rb > 0
    exp_e = rb[mask] * e.sum() / n
    exp_o = rb[mask] * o.sum() / n
    with np.errstate(divide="ignore", invalid="ignore"):
        stat = np.where(exp_e > 0, (e[mask] - exp_e) ** 2 / exp_e, 0.0).sum() \
            + np.where(exp_o > 0, (o[mask] - exp_o) ** 2 / exp_o, 0.0).sum()
    return float(stat)


def wasserstein_binned(expected: Histogram, observed: Histogram) -> float:
    """1-D Wasserstein (earth mover's) distance between the two binned
    distributions at UNIT bin spacing: W1 = sum_b |CDF_e(b) - CDF_o(b)|.
    For physical-unit distances multiply by the bin width; categorical
    axes use the label order as the transport metric (documented choice)."""
    expected._require_same_edges(observed)
    e = expected.counts.astype(np.float64)
    o = observed.counts.astype(np.float64)
    e_cdf = np.cumsum(e) / max(e.sum(), 1.0)
    o_cdf = np.cumsum(o) / max(o.sum(), 1.0)
    return float(np.abs(e_cdf - o_cdf)[:-1].sum())


def total_variation(expected: Histogram, observed: Histogram) -> float:
    """Total-variation distance: 0.5 * sum_b |p_b - q_b| (in [0, 1])."""
    expected._require_same_edges(observed)
    e = expected.counts.astype(np.float64)
    o = observed.counts.astype(np.float64)
    p = e / max(e.sum(), 1.0)
    q = o / max(o.sum(), 1.0)
    return float(0.5 * np.abs(p - q).sum())


class MisraGries:
    """Misra-Gries heavy-hitter summary (mergeable form, Agarwal et al.,
    "Mergeable Summaries", PODS 2012).

    Holds at most ``capacity`` (item, count) pairs; after processing n items
    every item with true frequency > n / (capacity + 1) is guaranteed
    present, and each stored count underestimates the true count by at most
    n / (capacity + 1).  ``merge`` sums counters then decrements everything
    by the (capacity+1)-th largest count — the standard mergeable rule, so
    per-batch partials combine associatively through tree reductions.
    """

    def __init__(self, capacity: int = 4096) -> None:
        self.capacity = int(capacity)
        self.counts: dict[str, int] = {}

    def update(self, items: list[str], counts) -> None:
        for item, c in zip(items, counts):
            self.counts[item] = self.counts.get(item, 0) + int(c)
        self._shrink()

    def _shrink(self) -> None:
        if len(self.counts) <= self.capacity:
            return
        # Decrement by the (capacity+1)-th largest count and drop <= 0.
        vals = sorted(self.counts.values(), reverse=True)
        dec = vals[self.capacity]
        self.counts = {k: v - dec for k, v in self.counts.items() if v > dec}

    def merge(self, other: "MisraGries") -> "MisraGries":
        for k, v in other.counts.items():
            self.counts[k] = self.counts.get(k, 0) + v
        self._shrink()
        return self

    def candidates(self, k: int) -> list[str]:
        """Top-k items by lower-bound count (ties: lexicographic)."""
        return [t for t, _ in sorted(self.counts.items(),
                                     key=lambda kv: (-kv[1], kv[0]))[:k]]

    def state(self) -> dict:
        return {"capacity": self.capacity, "counts": self.counts}

    @classmethod
    def from_state(cls, s: dict) -> "MisraGries":
        mg = cls(s["capacity"])
        mg.counts = {str(k): int(v) for k, v in s["counts"].items()}
        return mg
