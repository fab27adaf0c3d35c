"""Connected components over a duplicate-pair edge set → cluster ids.

The step a dedup pipeline needs AFTER pairwise near-dup detection
(minhash/simhash/jaccard/embedding pairs are edges; transitive closure
groups them into clusters so "keep one canonical doc per cluster" is
well-defined).  The reference (json_repair) has no table layer; this op
belongs to the training-data-pipeline family layered on top (SURVEY §2
extensions), alongside engine/ops/dedup.py.

Cluster id contract: the MINIMUM doc id in the component — deterministic,
join-free to interpret, and the natural "keep-first" canonical key.
Output rows cover exactly the nodes that appear in at least one edge
(singletons are their own cluster by definition and are omitted, keeping
the output proportional to the duplicate set, not the corpus).

Two execution shapes, size-gated like the rest of the dedup family:

* Driver fast path (edge count <= ``max_driver_edges``): the verified pair
  set after LSH + exact verification is orders of magnitude smaller than
  the corpus (SCALE.md dedup capacity math), so a vectorized numpy
  min-label + pointer-jumping loop on the driver resolves it without a
  single shuffle.  5M edges ≈ 80 MB of int64 — bounded, and the gate is a
  parameter.
* Distributed path (past the gate, or forced): iterative min-label
  propagation — the MapReduce connected-components recipe of Rastogi et
  al., "Finding Connected Components in Map-Reduce in Logarithmic Rounds"
  (ICDE 2013), in its hash-to-min flavour.  Each round ships every node's
  current label across the (static, materialized-once) edge set with a
  hash join and takes a per-node min; labels only ever decrease, so the
  round-over-round SUM(label) is a monotone fixpoint witness — one cheap
  scalar aggregate per round, no old-vs-new join.  Rounds are bounded by
  the component diameter (near-dup clusters are dense in practice; the
  1-hop seeding below removes one round for free), with a loud
  ``max_rounds`` failure rather than a silent wrong answer.

Scale shape per round: one O(E) hash join + one O(V+E) groupby-min —
both standard all-to-all exchanges on int64 pairs; nothing wider than the
edge set ever moves, and the corpus itself is never touched.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

log = logging.getLogger(__name__)

# Past this many edges the driver fast path would hold >~160 MB of id
# arrays; hand off to the shuffle implementation instead.
CC_MAX_DRIVER_EDGES = 5_000_000


def _empty_clusters() -> pa.Table:
    return pa.table({"doc_id": pa.array([], pa.int64()),
                     "cluster_id": pa.array([], pa.int64())})


def minlabel_pointer_jumping(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized connected components on the driver.

    Alternates scatter-min across edges with pointer jumping
    (``label = label[label]``) until fixpoint — O((V+E) log V) with no
    Python per-edge loop.  Returns (nodes, cluster_id) aligned arrays.
    """
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[:a.size], inv[a.size:]
    label = np.arange(nodes.size, dtype=np.int64)
    while True:
        before = label.copy()
        m = np.minimum(label[ai], label[bi])
        np.minimum.at(label, ai, m)
        np.minimum.at(label, bi, m)
        while True:
            jumped = label[label]
            if np.array_equal(jumped, label):
                break
            label = jumped
        if np.array_equal(label, before):
            break
    return nodes, nodes[label]


def _edges_to_numpy(edges_ds, a_col: str, b_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Stream the (already materialized, gated-small) edge blocks to the driver."""
    a_parts, b_parts = [], []
    for batch in edges_ds.iter_batches(batch_format="pyarrow"):
        if batch.num_rows:
            a_parts.append(batch.column(a_col).to_numpy(zero_copy_only=False))
            b_parts.append(batch.column(b_col).to_numpy(zero_copy_only=False))
    if not a_parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return (np.concatenate(a_parts).astype(np.int64, copy=False),
            np.concatenate(b_parts).astype(np.int64, copy=False))


def _partition_min(batch: pa.Table, key: str, val: str) -> pa.Table:
    """Per-block combiner: min(val) per key, vectorized (sort + reduceat)."""
    if batch.num_rows == 0:
        return pa.table({key: pa.array([], pa.int64()),
                         val: pa.array([], pa.int64())})
    k = batch.column(key).to_numpy(zero_copy_only=False)
    v = batch.column(val).to_numpy(zero_copy_only=False)
    order = np.argsort(k, kind="mergesort")
    k, v = k[order], v[order]
    starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
    mins = np.minimum.reduceat(v, starts)
    return pa.table({key: pa.array(k[starts]), val: pa.array(mins)})


# Past this many drop-ids the broadcast isin filter stops being "small";
# hand the anti-join to the shuffle implementation instead.
KEEP_CANONICAL_MAX_BROADCAST_IDS = 1_000_000


def keep_canonical(docs_ds, clusters_ds, *, id_col: str = "doc_id",
                   max_broadcast_ids: int = KEEP_CANONICAL_MAX_BROADCAST_IDS,
                   num_partitions: int | None = None):
    """Drop every clustered doc except its cluster representative.

    ``clusters_ds`` is connected_components output (doc_id, cluster_id);
    the representative is the row with doc_id == cluster_id.  Returns the
    surviving rows of ``docs_ds`` (all columns), i.e. the deduplicated
    corpus.

    The drop set is proportional to the DUPLICATE set, not the corpus —
    the common case broadcasts it once (ray.put) and filters the corpus
    scan with a vectorized isin: zero shuffle of the corpus.  Past
    ``max_broadcast_ids`` the corpus is anti-joined against the drop set
    instead (one hash shuffle of (id)-projected rows), so a pathological
    everything-is-duplicate input never materializes on the driver.
    """
    import ray
    import ray.data

    drop = clusters_ds.map_batches(
        lambda t: t.filter(
            pa.compute.not_equal(t.column("doc_id"), t.column("cluster_id")))
        .select(["doc_id"]),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    n_drop = drop.count()
    if n_drop == 0:
        return docs_ds

    if n_drop > max_broadcast_ids:
        if num_partitions is None:
            cpus = int(ray.cluster_resources().get("CPU", 4))
            num_partitions = max(2, min(4 * cpus, n_drop // 262_144 + 1))
        if id_col != "doc_id":
            drop = drop.map_batches(
                lambda t: t.rename_columns([id_col]),
                batch_format="pyarrow", zero_copy_batch=True)
        return docs_ds.join(drop, join_type="left_anti",
                            num_partitions=num_partitions, on=(id_col,))

    drop_ids, _ = _edges_to_numpy(drop, "doc_id", "doc_id")
    drop_ref = ray.put(np.unique(drop_ids))

    def keep(batch: pa.Table) -> pa.Table:
        from engine.stages import _broadcast_from_ref

        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mask = ~np.isin(ids, _broadcast_from_ref(drop_ref))  # fetch-once
        return batch.filter(pa.array(mask))

    return docs_ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def connected_components(edges_ds, *, a_col: str = "a", b_col: str = "b",
                         max_driver_edges: int = CC_MAX_DRIVER_EDGES,
                         max_rounds: int = 64,
                         num_partitions: int | None = None):
    """Edge Dataset (a_col, b_col) → Dataset (doc_id, cluster_id).

    cluster_id = min node id in the connected component.  Only nodes that
    appear in an edge are emitted.  See module docstring for the two
    execution shapes and their scale rationale.
    """
    import ray
    import ray.data

    # The edge set is consumed several times (count + one join per round):
    # pin it once so the upstream pair pipeline does not re-execute.
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        return ray.data.from_arrow(_empty_clusters())

    if n_edges <= max_driver_edges:
        a, b = _edges_to_numpy(edges_ds, a_col, b_col)
        keep = a != b
        if not np.all(keep):
            a, b = a[keep], b[keep]
        if a.size == 0:
            return ray.data.from_arrow(_empty_clusters())
        nodes, labels = minlabel_pointer_jumping(a, b)
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(nodes), "cluster_id": pa.array(labels)}))

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_partitions = max(2, min(4 * cpus, n_edges // 262_144 + 1))

    def orient_both(t: pa.Table) -> pa.Table:
        src = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        dst = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        return pa.table({"src": pa.array(np.concatenate([src, dst])),
                         "dst": pa.array(np.concatenate([dst, src]))})

    both = edges_ds.map_batches(orient_both, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()

    # Seed labels with the 1-hop minimum (node itself ∧ min neighbour) —
    # one groupby instead of a full propagate round.
    def seed(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        return _partition_min(pa.table({
            "node": pa.array(src), "label": pa.array(np.minimum(src, dst))}),
            "node", "label")

    labels = both.map_batches(seed, batch_format="pyarrow", zero_copy_batch=True) \
                 .groupby("node").min("label") \
                 .map_batches(lambda t: t.rename_columns(["node", "label"]),
                              batch_format="pyarrow", zero_copy_batch=True) \
                 .materialize()
    prev_sum = labels.sum("label")

    for round_no in range(max_rounds):
        msgs = both.join(labels, join_type="inner",
                         num_partitions=num_partitions,
                         on=("src",), right_on=("node",))
        msgs = msgs.map_batches(
            lambda t: _partition_min(
                pa.table({"node": t.column("dst"), "label": t.column("label")}),
                "node", "label"),
            batch_format="pyarrow", zero_copy_batch=True)
        labels = labels.union(msgs).groupby("node").min("label") \
            .map_batches(lambda t: t.rename_columns(["node", "label"]),
                         batch_format="pyarrow", zero_copy_batch=True) \
            .materialize()
        new_sum = labels.sum("label")
        if new_sum == prev_sum:   # labels are monotone non-increasing ints
            break
        prev_sum = new_sum
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_rounds} rounds "
            f"(component diameter exceeds the bound); raise max_rounds")
    log.info("connected_components: converged in %d propagate rounds "
             "(%d edges, %d partitions)", round_no + 1, n_edges, num_partitions)

    return labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "cluster_id"]),
        batch_format="pyarrow", zero_copy_batch=True)
