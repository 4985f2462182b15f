"""Capture the DML matched-counts probe plan with the window keyed by
file only ("before") vs by the aggregation's full key list ("after"),
into plans/r17/dml_matched_counts_probe_{before,after}.txt.

MEASURED NEGATIVE RESULT (r17): both shapes compile to a byte-identical
single-Exchange plan — HashPartitioning on the window's file key is a
SUBSET of the aggregate's grouping keys, so it already satisfies the
aggregate's ClusteredDistribution and no second Exchange ever existed.
The probe therefore keeps its original window spec (whose per-file cap
is also the stronger aggregation-buffer bound); these captures are the
evidence for why the "align the window keys" idea was dropped.

The probe is internal DML machinery (never a declared query), so
capture_plans.py can't reach it; this script rebuilds the exact probe
frame both ways over a real store layout and explains each.

Usage: python tools/capture_probe_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from geo_explorer_etl_spark.session import get_spark
    from geo_explorer_etl_spark.sources.store import PARTITION_COL, TableStore

    spark = get_spark("probe_plans", cpus=8)
    root = tempfile.mkdtemp(prefix="probe_plans_")
    store = TableStore(spark, root)
    df = (
        spark.range(2000)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 37 * 0.5).alias("value"),
        )
        .withColumn(PARTITION_COL, F.lit(1).cast("long"))
    )
    store.replace_product_all(1, {"IndicatorValues": df.repartition(4)})

    part_manifest = store._manifest(
        __import__("pathlib").Path(store._path("IndicatorValues")) / f"{PARTITION_COL}=1"
    )
    _, keyed_live, _, _ = store._dml_scan_ctx(
        __import__("pathlib").Path(store._path("IndicatorValues")) / f"{PARTITION_COL}=1",
        part_manifest,
        1,
    )
    matched = keyed_live(part_manifest["files"]).filter(F.col("event_id") % 10 == 3)

    cap = TableStore.DV_INLINE_POSITIONS
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17"
    )
    os.makedirs(out_dir, exist_ok=True)

    # "before": window keyed by file alone (the shipped shape);
    # "after": window keyed by the aggregate's full key list. Both
    # compile to the same single-Exchange plan (module docstring).
    before = (
        matched.withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy("__dv_name").orderBy("__dv_pos")),
        )
        .groupBy("__dv_name", "event_id")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.collect_list(
                F.when(F.col("__rn") <= cap, F.col("__dv_pos"))
            ).alias("pos"),
        )
    )
    after = (
        matched.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__dv_name", "event_id").orderBy("__dv_pos")
            ),
        )
        .groupBy("__dv_name", "event_id")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.collect_list(
                F.when(F.col("__rn") <= cap, F.col("__dv_pos"))
            ).alias("pos"),
        )
    )
    for tag, frame in (("before", before), ("after", after)):
        txt = frame._sc._jvm.PythonSQLUtils.explainString(
            frame._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"dml_matched_counts_probe_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        print(f"{tag}: {n_ex} Exchange nodes -> {path}")


if __name__ == "__main__":
    main()
