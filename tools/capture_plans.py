"""Capture .explain('formatted') for headline/declared queries into
plans/r17/<query>_<tag>.txt (guide §1: record the plan shape before
and after each change).

Usage: python tools/capture_plans.py <tag> [row ...]
  tag: 'before' or 'after'; with no rows, captures every HEADLINE row.

DML-flavoured store rows mutate their store when invoked; the captured
plan is the returned verification frame's — the mutation machinery's
plans are examined with tools/profile_row.py instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    rows = sys.argv[2:]

    import bench
    from geo_explorer_etl_spark.plans import bucketed_bench, store_bench
    from geo_explorer_etl_spark.plans.registry import all_queries
    from geo_explorer_etl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plans", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    queries = dict(all_queries())
    queries["bridge_join_bucketed"] = bucketed_bench.bridge_join_bucketed
    queries["bridge_join_plain"] = bucketed_bench.bridge_join_plain
    queries.update(bench.comparable_overrides())
    for name in bench.HEADLINE:
        if name not in queries:
            queries[name] = getattr(store_bench, name)

    bucketed_bench.prepare(spark, sf_dir)
    store_bench.prepare(spark, sf_dir)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r17")
    os.makedirs(out_dir, exist_ok=True)
    for row in rows or bench.HEADLINE:
        df = queries[row](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{row}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
