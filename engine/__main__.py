"""Job entry points: ``python -m engine <command>``.

On a real cluster these are the ``ray job submit`` targets, e.g.:

    ray job submit --working-dir . -- python -m engine validate \\
        --clips 1000000 --out /data/validation/run1 --partitions 64

Standalone invocations own their Ray session (guarded init + shutdown); the
graft driver's entry points in ``__ray_entry__.py`` never init Ray themselves.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False, "ignore_reinit_error": True}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="engine", description="Validation engine jobs")
    sub = ap.add_subparsers(dest="command", required=True)

    val = sub.add_parser("validate", help="run the resumable clips validation job")
    val.add_argument("--clips", type=int, default=10_000, help="corpus size (seeded synthesis)")
    val.add_argument("--out", required=True, help="output directory (verdicts/violations/manifest)")
    val.add_argument("--partitions", type=int, default=4)
    val.add_argument("--seed", type=int, default=42)
    val.add_argument("--batch-size", type=int, default=256)
    val.add_argument("--no-resume", action="store_true", help="recompute even if manifests exist")
    val.add_argument("--num-cpus", type=int, default=None)
    val.add_argument("--config", default=None,
                     help="JSON config file; keys override CLI defaults "
                          "(clips, partitions, seed, batch_size, min_snr_db, transcript_schema)")

    base = sub.add_parser("baseline", help="regenerate the frozen drift baseline sketch")
    base.add_argument("--clips", type=int, default=20_000)
    base.add_argument("--num-cpus", type=int, default=None)

    qr = sub.add_parser(
        "query", help="run a named pipeline from the query catalog")
    qr.add_argument("name", nargs="?", default=None,
                    help="query name (omit with --list to enumerate)")
    qr.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                    help="input table directory (parquet per table)")
    qr.add_argument("-o", "--out", default=None,
                    help="write the result to this parquet file "
                         "(default: print a preview + row count)")
    qr.add_argument("--list", action="store_true",
                    help="list available query names and exit")
    qr.add_argument("--limit", type=int, default=10,
                    help="preview row count when not writing (default 10)")
    qr.add_argument("--num-cpus", type=int, default=None)

    args = ap.parse_args(argv)

    if args.command == "query":
        # Catalog listing and name validation need no Ray session.
        import __ray_entry__ as entrymod

        catalog = entrymod.queries()
        if args.list:
            oracled = set(entrymod.oracle_sql())
            for name in sorted(catalog):
                print(f"{name}{'' if name in oracled else '  [rows-only]'}")
            return 0
        if args.name is None or args.name not in catalog:
            known = ", ".join(sorted(catalog)[:8])
            print(f"unknown query {args.name!r}; try --list ({known}, ...)",
                  file=sys.stderr)
            return 2

    ray = _ensure_ray(args.num_cpus)
    try:
        if args.command == "validate":
            from engine.run import run_validation

            cfg = {}
            if args.config:
                from pathlib import Path

                cfg = json.loads(Path(args.config).read_text())
            n_clips = cfg.get("clips", args.clips)
            metrics = run_validation(
                n_clips, args.out,
                seed=cfg.get("seed", args.seed),
                n_partitions=cfg.get("partitions", args.partitions),
                batch_size=cfg.get("batch_size", args.batch_size),
                resume=not args.no_resume,
                min_snr_db=cfg.get("min_snr_db"),
                schema=cfg.get("transcript_schema"),
            )
            print(json.dumps(metrics, default=str))
            return 0 if metrics["rows"] == n_clips else 1
        if args.command == "query":
            import pyarrow as pa

            result = catalog[args.name](args.sf_dir)
            table = result if isinstance(result, pa.Table) else None
            if table is None:
                if hasattr(result, "to_arrow_refs"):   # ray Dataset
                    # Collect in ONE pass (count() would re-execute the
                    # whole plan); keep the typed schema on empty results.
                    batches = list(result.iter_batches(batch_format="pyarrow"))
                    if batches:
                        table = pa.concat_tables(batches)
                    else:
                        schema = result.schema()
                        table = (schema.empty_table()
                                 if schema is not None and hasattr(schema, "empty_table")
                                 else (pa.schema(
                                     list(zip(schema.names, schema.types)))
                                     .empty_table() if schema is not None
                                     else pa.table({})))
                else:                                   # pandas
                    table = pa.Table.from_pandas(result, preserve_index=False)
            if args.out:
                import pyarrow.parquet as pq

                pq.write_table(table, args.out)
                print(json.dumps({"query": args.name, "rows": table.num_rows,
                                  "out": args.out}))
            else:
                print(table.slice(0, args.limit).to_pandas().to_string())
                print(json.dumps({"query": args.name, "rows": table.num_rows}))
            return 0
        if args.command == "baseline":
            from engine.baseline import build_baseline
            from engine.run import BASELINE_SKETCH_PATH

            state = build_baseline(args.clips)
            BASELINE_SKETCH_PATH.write_text(json.dumps(state))
            print(f"wrote {BASELINE_SKETCH_PATH} ({args.clips} clips)")
            return 0
        return 2
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
