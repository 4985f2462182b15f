"""CLI entry point — the reference's main.py/arguments.py surface
(reference arguments.py:26–74, main.py:28–121) over the Spark engine.

    python -m geo_explorer_etl_spark.cli --insert --prodid P [P2 ...]
    python -m geo_explorer_etl_spark.cli --prodid P            # append
    python -m geo_explorer_etl_spark.cli --start D1 --end D2   # refresh

Validation parity: insert requires prodid; a date range and prodid are
mutually exclusive; date range requires both ends, ordered.
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="geo-explorer-etl-spark")
    p.add_argument("-i", "--insert", action="store_true", help="insert new product(s)")
    p.add_argument("--prodid", type=int, nargs="+", help="8-digit product id(s)")
    p.add_argument("--start", help="refresh range start YYYY-MM-DD")
    p.add_argument("--end", help="refresh range end YYYY-MM-DD")
    p.add_argument("--warehouse", default="./warehouse", help="table store root")
    p.add_argument("--staging", default="./staging", help="download/extract dir")
    p.add_argument(
        "--merged-registry", default="./products_to_merge.json", help="merge registry path"
    )
    p.add_argument(
        "--jdbc-url",
        help="read the lookup tables (GeographyReference, "
        "IndicatorNullReason) from this JDBC database — parity with the "
        "reference's pre-existing gis.* RDBMS (scdb.py:83-143) — "
        "instead of the warehouse; UOM/subject code sets come from WDS",
    )
    p.add_argument("--jdbc-schema", default="gis", help="schema of the JDBC lookup tables")
    p.add_argument(
        "--bucketed-mirror",
        action="store_true",
        help="also write IndicatorValues + the geo-ref bridge as "
        "bucketed mirror tables (co-located values⋈bridge joins, "
        "zero Exchange) — extra storage, faster repeated reads",
    )
    p.add_argument(
        "--vacuum",
        type=float,
        metavar="HOURS",
        help="garbage-collect fact-table files superseded more than "
        "HOURS ago (snapshot-read retention), then exit",
    )
    p.add_argument(
        "--compact",
        action="store_true",
        help="rewrite fragmented fact-table partitions at target file "
        "size (atomic manifest swap; superseded files left for "
        "--vacuum), then exit; combinable with --vacuum",
    )
    p.add_argument(
        "--compact-sort",
        metavar="COLUMN",
        nargs="+",
        help="with --compact: cluster the rewrite on COLUMN(s) "
        "(one column: range-partitioned sorted files; two or more: "
        "interleaved-bit Z-order -> tight zone maps on EVERY listed "
        "column, so filtered reads skip non-covering files)",
    )
    p.add_argument(
        "--prune-history",
        action="store_true",
        help="with --vacuum: also truncate the commit journal to the "
        "retention window (successor-timestamp criterion; read_at/"
        "read_changes below the truncation point refuse loudly)",
    )
    p.add_argument(
        "--fsck",
        action="store_true",
        help="audit the store (missing / superseded / unknown / "
        "stats_missing per table) and exit",
    )
    p.add_argument(
        "--repair",
        action="store_true",
        help="with --fsck: GC aged unknown leftovers and re-harvest "
        "missing zone-map/bloom stats (live data never touched)",
    )
    args = p.parse_args(argv)

    has_range = args.start is not None or args.end is not None
    if args.compact_sort and not args.compact:
        p.error("--compact-sort requires --compact")
    if args.repair and not args.fsck:
        p.error("--repair requires --fsck")
    if args.prune_history and args.vacuum is None:
        p.error("--prune-history requires --vacuum")
    if args.vacuum is not None or args.compact or args.fsck:
        if args.insert or args.prodid or has_range:
            p.error("--vacuum/--compact/--fsck run alone")
        return args
    if args.insert and not args.prodid:
        p.error("--insert requires --prodid")
    if has_range and args.prodid:
        p.error("--start/--end and --prodid are mutually exclusive")
    if has_range and (args.start is None or args.end is None):
        p.error("--start and --end must both be given")
    if has_range and args.end < args.start:
        p.error("--end must not precede --start")
    if not has_range and not args.prodid:
        p.error("nothing to do: give --prodid or --start/--end")
    for pid in args.prodid or []:
        if not 10_000_000 <= pid <= 99_999_999:
            p.error(f"product id {pid} is not 8 digits")
    return args


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)

    from geo_explorer_etl_spark.plans.pipeline import Pipeline
    from geo_explorer_etl_spark.session import get_spark
    from geo_explorer_etl_spark.sources.cube_csv import extract_zip
    from geo_explorer_etl_spark.sources.merge_registry import MergeRegistry
    from geo_explorer_etl_spark.sources.store import TableStore
    from geo_explorer_etl_spark.sources.wds import WdsClient

    spark = get_spark("geo-explorer-etl")
    store = TableStore(spark, args.warehouse)
    if args.compact or args.vacuum is not None or args.fsck:
        if args.compact:
            sort_by = args.compact_sort
            if sort_by is not None and len(sort_by) == 1:
                sort_by = sort_by[0]
            n = store.compact(sort_by=sort_by)
            print(f"compact: rewrote {n} fragmented partitions")
        if args.vacuum is not None:
            removed = store.vacuum(
                older_than_seconds=args.vacuum * 3600,
                prune_history=args.prune_history,
            )
            print(f"vacuum: removed {removed} superseded files")
        if args.fsck:
            import json as _json

            report = store.fsck(repair=args.repair)
            print(_json.dumps(report, indent=2) if report else "fsck: clean")
        return 0
    wds = WdsClient(spark)

    def csv_path_for(pid: int) -> str:
        import urllib.request

        url = wds.full_table_url(pid)
        zip_path = f"{args.staging}/{pid}.zip"
        urllib.request.urlretrieve(url, zip_path)  # noqa: S310 — WDS https url
        return extract_zip(zip_path, args.staging)

    # Lookup tables: from the JDBC database when --jdbc-url is given
    # (the reference's deployment shape — gis.* pre-exists in the
    # RDBMS, scdb.py:83–143), else from the warehouse (loaded by a
    # separate bootstrap).
    if args.jdbc_url:
        from geo_explorer_etl_spark.sources.jdbc import JdbcLookupSource

        src = JdbcLookupSource(spark, args.jdbc_url, schema=args.jdbc_schema)
        geo_ref = src.read_table("GeographyReference")
        null_reason = src.null_reasons()
        codes = wds.code_sets()
        uom = codes.get("uom")
        subjects = codes.get("subject")
    else:
        geo_ref = store.read("GeographyReference")
        null_reason = store.read("IndicatorNullReason")
        uom = store.read("UomCodes")
        subjects = store.read("SubjectCodes")
    missing = [
        n
        for n, df in [
            ("GeographyReference", geo_ref),
            ("IndicatorNullReason", null_reason),
            ("UomCodes", uom),
            ("SubjectCodes", subjects),
        ]
        if df is None
    ]
    if missing:
        print(f"missing lookup tables: {missing}", file=sys.stderr)
        return 2

    bucketed = None
    if args.bucketed_mirror:
        from geo_explorer_etl_spark.sources.store import BucketedStore

        bucketed = BucketedStore(spark)
    pipe = Pipeline(
        spark=spark,
        store=store,
        wds=wds,
        registry=MergeRegistry(args.merged_registry),
        geo_ref=geo_ref,
        null_reason=null_reason,
        uom_codes=uom,
        subject_codes=subjects,
        bucketed=bucketed,
    )
    if args.insert:
        pipe.insert_product(args.prodid, csv_path_for)
    elif args.prodid:
        for pid in pipe.registry.ordered(args.prodid):
            pipe.append_product(pid, csv_path_for(pid))
    else:
        pipe.refresh_date_range(args.start, args.end, csv_path_for)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
