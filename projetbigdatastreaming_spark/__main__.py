"""Command-line entry point: list, run, or explain any registered
query against a testdata scale-factor directory.

    python -m projetbigdatastreaming_spark list
    python -m projetbigdatastreaming_spark run kpi_quarter_hour \
        --sf-dir /root/testdata/sf0.01 --limit 20
    python -m projetbigdatastreaming_spark explain tpch_q3 --mode formatted

This is the batch twin of the reference's ``spark-submit`` entry
objects (SparkBigData / TraitementsStreaming main methods): one
process, one named workload, stdout output.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession


def _registry():
    import __spark_entry__ as entry

    return entry.queries()


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="projetbigdatastreaming_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="print all registered query names")

    run = sub.add_parser("run", help="execute a query and print rows")
    run.add_argument("name")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument("--limit", type=int, default=20)

    ex = sub.add_parser("explain", help="print a query's physical plan")
    ex.add_argument("name")
    ex.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ex.add_argument(
        "--mode",
        default="formatted",
        choices=["simple", "extended", "formatted", "cost", "codegen"],
    )

    mt = sub.add_parser(
        "maintain",
        help="table/state maintenance: repair, compact, retract",
    )
    mt.add_argument(
        "op",
        choices=[
            "repair-table",
            "compact-parquet",
            "compact-cms",
            "compact-bloom",
            "compact-hist",
            "compact-curation",
            "compact-neardup",
            "compact-ann",
            "retract-neardup",
            "retract-ann",
            "retract-curation",
            "compact-tombstones",
            "rebuild-sketches",
            "index-status",
            "table-history",
            "vacuum-versions",
            "compact-versioned",
            "replicate",
        ],
    )
    mt.add_argument("path", help="table or state directory")
    mt.add_argument(
        "--dst", default=None, help="output dir (compact-parquet only)"
    )
    mt.add_argument("--target-mb", type=int, default=256)
    mt.add_argument("--cluster-by", default=None)
    mt.add_argument(
        "--ids",
        default=None,
        help="comma-separated doc/vec ids (retract-* only)",
    )
    mt.add_argument(
        "--keep-last",
        type=int,
        default=None,
        help="versions to keep (vacuum-versions only)",
    )
    mt.add_argument(
        "--base",
        default=None,
        help="base-relation parquet path (rebuild-sketches only)",
    )
    mt.add_argument(
        "--kind",
        default=None,
        choices=["cms", "bloom", "kmv", "hist"],
        help="sketch family (rebuild-sketches only)",
    )
    mt.add_argument(
        "--tomb-dir",
        default=None,
        help="tombstone dir to filter the base with (rebuild-sketches)",
    )
    mt.add_argument("--id-col", default="doc_id")
    mt.add_argument(
        "--column",
        default=None,
        help="sketched column: CMS/KMV key, Bloom fp, hist value",
    )
    mt.add_argument("--group-col", default="event_type")
    mt.add_argument(
        "--key-cols",
        default=None,
        help="comma-separated CDC key columns (replicate only)",
    )
    mt.add_argument(
        "--cursor",
        default=None,
        help="durable cursor file path (replicate only)",
    )
    return p


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    """Returns a process exit code; ``spark`` is injectable for tests
    (when omitted, a local session is created and left to the JVM's
    shutdown hook — matching spark-submit lifetime semantics)."""
    args = _build_parser().parse_args(argv)
    queries = _registry()

    if args.cmd == "list":
        for name in queries:
            print(name)
        return 0

    if args.cmd == "maintain":
        if spark is None:
            from .session import get_session

            spark = get_session(app_name=f"cli:maintain:{args.op}")
        if args.op == "repair-table":
            from .maintenance import repair_table

            ok = repair_table(args.path)
            print(f"table {'present' if ok else 'ABSENT'}: {args.path}")
            return 0 if ok else 1
        if args.op == "compact-parquet":
            from .maintenance import compact_parquet

            if not args.dst:
                print("--dst is required for compact-parquet",
                      file=sys.stderr)
                return 2
            n = compact_parquet(
                spark, args.path, args.dst,
                target_mb=args.target_mb, cluster_by=args.cluster_by,
            )
            print(f"wrote {n} files to {args.dst}")
            return 0
        if args.op == "compact-cms":
            from .streaming.sketches import compact_cms

            print(f"compacted {compact_cms(spark, args.path)} cells")
            return 0
        if args.op == "compact-bloom":
            from .streaming.sketches import compact_bloom

            print(f"compacted {compact_bloom(spark, args.path)} words")
            return 0
        if args.op == "compact-hist":
            from .streaming.sketches import compact_hist

            print(f"compacted {compact_hist(spark, args.path)} bins")
            return 0
        if args.op == "compact-neardup":
            from .streaming.neardup import compact_neardup

            nb, ns = compact_neardup(spark, args.path)
            print(f"compacted {nb} band rows, {ns} sig rows")
            return 0
        if args.op == "compact-ann":
            from .streaming.annindex import compact_ann_index

            print(f"compacted {compact_ann_index(spark, args.path)} codes")
            return 0
        if args.op == "rebuild-sketches":
            from .maintenance import rebuild_sketches

            if not (args.base and args.kind and args.column):
                print(
                    "--base, --kind and --column are required for "
                    "rebuild-sketches",
                    file=sys.stderr,
                )
                return 2
            n = rebuild_sketches(
                spark,
                spark.read.parquet(args.base),
                args.path,
                args.kind,
                tomb_dir=args.tomb_dir,
                id_col=args.id_col,
                column=args.column,
                group_col=args.group_col,
            )
            print(f"rebuilt {args.kind} state: {n} rows")
            return 0
        if args.op == "replicate":
            from .sinks.versioned import replicate_versioned

            if not (args.dst and args.key_cols and args.cursor):
                print(
                    "--dst, --key-cols and --cursor are required for "
                    "replicate",
                    file=sys.stderr,
                )
                return 2
            n = replicate_versioned(
                spark,
                args.path,
                args.dst,
                [c for c in args.key_cols.split(",") if c.strip()],
                args.cursor,
            )
            print(f"applied {n} change rows to {args.dst}")
            return 0
        if args.op == "compact-tombstones":
            from .streaming.tombstones import compact_tombstones

            nf, ni = compact_tombstones(spark, args.path)
            print(f"folded {nf} tombstone files into 1 ({ni} ids)")
            return 0
        if args.op == "index-status":
            from .streaming.monitoring import index_status

            index_status(spark, args.path).show(100, truncate=False)
            return 0
        if args.op == "table-history":
            from .sinks.versioned import table_history

            for h in table_history(args.path):
                print(
                    f"v{h['version']} parent={h['parent']} "
                    f"op={h['op']} files={h['n_files']}"
                )
            return 0
        if args.op == "vacuum-versions":
            from .sinks.versioned import vacuum

            m, f = vacuum(args.path, keep_last=args.keep_last)
            print(f"removed {m} manifests, {f} orphan files")
            return 0
        if args.op == "compact-versioned":
            from .sinks.versioned import compact_versioned

            v, n = compact_versioned(
                spark, args.path, target_mb=args.target_mb
            )
            print(f"compacted {n} base files into version {v}")
            return 0
        if args.op.startswith("retract-"):
            if not args.ids:
                print("--ids is required for retract-*", file=sys.stderr)
                return 2
            ids = [int(s) for s in args.ids.split(",") if s.strip()]
            if args.op == "retract-neardup":
                from .streaming.neardup import retract_docs

                n = retract_docs(spark, args.path, ids)
            elif args.op == "retract-ann":
                from .streaming.annindex import retract_vectors

                n = retract_vectors(spark, args.path, ids)
            else:
                from .streaming.curation import retract_curation_docs

                n = retract_curation_docs(spark, args.path, ids)
            print(f"tombstoned {n} ids")
            return 0
        from .streaming.curation import compact_curation

        print(f"compacted {compact_curation(spark, args.path)} rows")
        return 0

    if args.name not in queries:
        print(f"unknown query: {args.name!r} (try 'list')", file=sys.stderr)
        return 2

    if spark is None:
        from .session import get_session

        spark = get_session(app_name=f"cli:{args.name}")

    df = queries[args.name](spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain(mode=args.mode)
        return 0

    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
