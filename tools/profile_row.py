"""Per-action profiler for one bench row (guide §1: measure first).

Monkeypatches the DataFrame action surface (count/collect/first/head/
toPandas/foreachPartition) and the writer entry points, runs ONE
headline row the same way bench.py does (warm-up at sf0.001, then a
timed pass at $SPARK_GRAFT_SF_DIR), and prints every action the timed
pass ran: wall seconds + the repo-side call site. The sum of action
seconds vs the row's wall time also exposes driver-side (non-Spark)
overhead.

Usage: python tools/profile_row.py <row_name> [more rows...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENTS: list[tuple[float, float, str, str]] = []
ACTIVE = False
T_BASE = 0.0


def _site() -> str:
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "/repo/" in fn and "profile_row" not in fn and "pyspark" not in fn:
            return f"{fn.rsplit('/repo/', 1)[-1]}:{fr.lineno} {fr.name}"
    return "<pyspark-internal>"


def _wrap(cls, name):
    orig = getattr(cls, name)

    def timed(self, *a, **kw):
        if not ACTIVE:
            return orig(self, *a, **kw)
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **kw)
        finally:
            EVENTS.append((t0 - T_BASE, time.perf_counter() - t0, name, _site()))

    setattr(cls, name, timed)


def main() -> None:
    rows = sys.argv[1:]
    if not rows:
        raise SystemExit("usage: profile_row.py <row> [row...]")
    global ACTIVE

    # Spark 4: the session returns pyspark.sql.classic.dataframe.DataFrame,
    # which OVERRIDES the action methods — patching the abstract base in
    # pyspark.sql does not intercept them.
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # Spark 3.x
        from pyspark.sql import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    for m in ("count", "collect", "first", "head", "toPandas",
              "foreachPartition", "localCheckpoint", "persist", "checkpoint"):
        _wrap(DataFrame, m)
    for m in ("parquet", "save", "csv", "json", "saveAsTable"):
        _wrap(DataFrameWriter, m)

    import bench
    from geo_explorer_etl_spark.plans import bucketed_bench, store_bench
    from geo_explorer_etl_spark.plans.registry import all_queries
    from geo_explorer_etl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("profile", cpus=cpus)
    queries = dict(all_queries())
    queries["bridge_join_bucketed"] = bucketed_bench.bridge_join_bucketed
    queries["bridge_join_plain"] = bucketed_bench.bridge_join_plain
    queries.update(bench.comparable_overrides())
    for name in bench.HEADLINE:
        if name not in queries:
            queries[name] = getattr(store_bench, name)

    bucketed_bench.prepare(spark, sf_dir)
    store_bench.prepare(spark, sf_dir)

    for row in rows:
        fn = queries[row]
        fn(spark, "/root/testdata/sf0.001").count()  # warm-up, untimed
        EVENTS.clear()
        global T_BASE
        ACTIVE = True
        T_BASE = t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        ACTIVE = False
        print(f"\n=== {row}: wall {wall:.3f}s, "
              f"{len(EVENTS)} actions, action-sum "
              f"{sum(e[1] for e in EVENTS):.3f}s ===")
        for start, dur, op, site in sorted(EVENTS):
            print(f"  @{start:7.3f}  {dur:7.3f}s  {op:<16} {site}")


if __name__ == "__main__":
    main()
