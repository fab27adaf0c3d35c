"""Pluggable check registry — the engine's user-extension surface.

A check is a class with four hooks (all state is a plain JSON-able dict so it
ships through Arrow rows and manifests):

    batch_partial(batch: pa.Table) -> dict      # per-batch, inside map_batches
    merge(a: dict, b: dict) -> dict             # associative
    finalize(state: dict) -> dict               # summary for metrics.json
    violations(batch: pa.Table) -> pa.Table     # optional per-row violations
                                                # (clip_id, check, message)

Register with ``@register_check`` and select by name in a run config:

    {"checks": ["row_counts", "null_rates", "my_custom_check"]}

``run_checks(ds, names)`` executes any selection in ONE pass over the
Dataset: each batch produces one combined partial row; rows tree-reduce in
workers (every check's merge is associative by contract) so the driver never
sees more than the reduce threshold, regardless of block count.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

_REGISTRY: dict[str, type] = {}


def register_check(cls):
    _REGISTRY[cls.name] = cls
    return cls


def available_checks() -> list[str]:
    return sorted(_REGISTRY)


def get_check(name: str):
    if name not in _REGISTRY:
        raise KeyError(f"unknown check {name!r}; available: {available_checks()}")
    return _REGISTRY[name]()


def run_checks(ds, names: list[str], *, violations: bool = False):
    """One streaming pass: per-batch partials for every named check, driver
    merge, finalized summaries.  Returns {check_name: summary}."""
    checks = [get_check(n) for n in names]

    def partials(batch: pa.Table) -> pa.Table:
        state = {c.name: c.batch_partial(batch) for c in checks}
        return pa.table({"state": pa.array([json.dumps(state)], pa.large_string())})

    def combine(states: list[dict]) -> dict:
        out: dict[str, dict] = {}
        for state in states:
            for c in checks:
                out[c.name] = c.merge(out[c.name], state[c.name]) if c.name in out \
                    else state[c.name]
        return out

    from engine.stages import tree_reduce_states

    merged = tree_reduce_states(
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True),
        combine)
    if merged is None:
        merged = {c.name: c.batch_partial(pa.table({})) for c in checks}
    return {c.name: c.finalize(merged[c.name]) for c in checks}


# ------------------------------------------------------------ built-in checks


@register_check
class RowCounts:
    name = "row_counts"

    def batch_partial(self, batch: pa.Table) -> dict:
        return {"rows": batch.num_rows}

    def merge(self, a: dict, b: dict) -> dict:
        return {"rows": a["rows"] + b["rows"]}

    def finalize(self, state: dict) -> dict:
        return state


@register_check
class NullRates:
    name = "null_rates"

    def batch_partial(self, batch: pa.Table) -> dict:
        return {
            "rows": batch.num_rows,
            "nulls": {f.name: batch.column(f.name).null_count for f in batch.schema},
        }

    def merge(self, a: dict, b: dict) -> dict:
        nulls = dict(a["nulls"])
        for k, v in b["nulls"].items():
            nulls[k] = nulls.get(k, 0) + v
        return {"rows": a["rows"] + b["rows"], "nulls": nulls}

    def finalize(self, state: dict) -> dict:
        rows = max(state["rows"], 1)
        return {k: round(v / rows, 6) for k, v in state["nulls"].items()}


@register_check
class NumericStats:
    name = "numeric_stats"

    def batch_partial(self, batch: pa.Table) -> dict:
        from engine.checks.sketches import ColumnStats

        out = {}
        for f in batch.schema:
            if pa.types.is_integer(f.type) or pa.types.is_floating(f.type):
                s = ColumnStats()
                values = batch.column(f.name).to_numpy(zero_copy_only=False).astype(np.float64)
                finite = values[np.isfinite(values)]
                s.update(finite, int(values.size - finite.size))
                out[f.name] = s.state()
        return out

    def merge(self, a: dict, b: dict) -> dict:
        from engine.checks.sketches import ColumnStats

        out = dict(a)
        for k, st in b.items():
            if k in out:
                merged = ColumnStats.from_state(out[k])
                merged.merge(ColumnStats.from_state(st))
                out[k] = merged.state()
            else:
                out[k] = st
        return out

    def finalize(self, state: dict) -> dict:
        from engine.checks.sketches import ColumnStats

        return {k: ColumnStats.from_state(st).summary() for k, st in state.items()}


@register_check
class DistinctApprox:
    name = "distinct_approx"
    key_col = "clip_id"

    def batch_partial(self, batch: pa.Table) -> dict:
        from engine.checks.sketches import HyperLogLog

        h = HyperLogLog()
        if self.key_col in batch.schema.names:
            h.update(np.asarray(batch.column(self.key_col).to_pylist(), dtype=object))
        return h.state()

    def merge(self, a: dict, b: dict) -> dict:
        from engine.checks.sketches import HyperLogLog

        merged = HyperLogLog.from_state(a)
        merged.merge(HyperLogLog.from_state(b))
        return merged.state()

    def finalize(self, state: dict) -> dict:
        from engine.checks.sketches import HyperLogLog

        return {"distinct": int(round(HyperLogLog.from_state(state).estimate()))}
