"""Measure the matview recompute-branch pruning gain (VERDICT r12
wrong #1 fix): a group-clustered base, MIN-moving deletes, the same
warmed session/store timing the recompute window with the group-key
pushdown ON vs forced OFF (RECOMPUTE_PUSH_CAP=0 → the loud unpruned
fallback). A discarded warmup refresh removes JVM/codegen bias; each
mode is timed on its own fresh delete so both windows recompute
exactly one group.

Usage: python3 tools/mv_recompute_gain.py [n_groups] [rows_per_group]
Prints one JSON line. Run on a quiet box (load < 1)."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from geo_explorer_etl_spark.operators import matview as MV
from geo_explorer_etl_spark.sources.store import PARTITION_COL, TableStore


def build(store: TableStore, n_groups: int, per_group: int) -> None:
    spark = store.spark
    for g in range(n_groups):
        df = (
            spark.range(per_group)
            .select(
                (F.lit(g) * per_group + F.col("id")).alias("id"),
                F.lit(f"g{g:04d}").alias("grp"),
                (F.col("id") + 1).alias("v"),  # min sits at offset 0
            )
            .withColumn(PARTITION_COL, F.lit(1).cast("long"))
            .coalesce(1)
        )
        store.append("Base", df)
    store.adopt_manifests("Base")


def timed_refresh(store: TableStore, group: int, per_group: int, cap: int) -> float:
    store.delete_where("Base", [("id", "==", group * per_group)])  # g's min
    old = MV.RECOMPUTE_PUSH_CAP
    MV.RECOMPUTE_PUSH_CAP = cap
    try:
        t0 = time.time()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            rep = MV.refresh_matview(store, "mv")
        dt = time.time() - t0
    finally:
        MV.RECOMPUTE_PUSH_CAP = old
    assert rep["groups_recomputed"] == 1, rep
    return dt


def main() -> None:
    n_groups = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    per_group = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("mv_recompute_gain")
        .getOrCreate()
    )
    store = TableStore(spark, tempfile.mkdtemp(prefix="mvgain_"))
    build(store, n_groups, per_group)
    MV.create_matview(
        store, "mv", "Base", ["grp"],
        {"lo": ("min", "v"), "n": ("count", None)}, n_partitions=8,
    )
    timed_refresh(store, 1, per_group, 4096)        # warmup, discarded
    # alternate modes twice each, min per mode (the quiet-box rule)
    pruned = min(
        timed_refresh(store, 10, per_group, 4096),
        timed_refresh(store, 11, per_group, 4096),
    )
    unpruned = min(
        timed_refresh(store, 20, per_group, 0),
        timed_refresh(store, 21, per_group, 0),
    )
    print(json.dumps({
        "n_groups": n_groups,
        "rows": n_groups * per_group,
        "refresh_pruned_sec": round(pruned, 3),
        "refresh_unpruned_sec": round(unpruned, 3),
        "gain": round(unpruned / max(pruned, 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
