"""Bucketed vs plain layout on the PrimaryQuery fact⋈fact edge.

``primary_query``'s one fact-to-fact join is ``geo_ref_bridge ⋈ values
ON IndicatorValueId`` (star_schema.py:838–845). At 100 TB neither side
broadcasts, so the join shuffles BOTH fact tables on every query —
unless they were written ``bucketBy(IndicatorValueId)`` once, which is
exactly what ``BucketedStore.mirror_product`` maintains in the pipeline
(pipeline.py:228–238). This module gives bench a measurable twin pair:

- ``bridge_join_bucketed`` — reads the two bucketed mirrors; the merge
  join runs with ZERO Exchange (pytest-pinned).
- ``bridge_join_plain``    — same frames from plain parquet; the merge
  join shuffles both sides.

Both twins force SortMergeJoin via ``hint("merge")`` rather than a
session-conf broadcast toggle: at bench scale Spark would broadcast
the smaller side, which is precisely the plan that stops existing at
100 TB, and a hint scopes the constraint to this query instead of
leaking conf state into the rest of the bench session.

The fact frames are synthesized from ``lineitem`` (the largest
testdata table) at PrimaryQuery shape: a deterministic
``IndicatorValueId`` join key, a ``Value`` payload on one side, the
(GeographyReferenceId, IndicatorId) bridge columns on the other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geo_explorer_etl_spark.session import load_tables
from geo_explorer_etl_spark.sources.store import BucketedStore

VALUES_BUCKETED = "bench_values_bucketed"
BRIDGE_BUCKETED = "bench_bridge_bucketed"
VALUES_PLAIN = "bench_values_plain"
BRIDGE_PLAIN = "bench_bridge_plain"


def synth_fact_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """values + geo-ref-bridge at PrimaryQuery shape, derived from
    lineitem with a deterministic join key (no monotonically_increasing_id
    — the frames must be identical across layouts and runs)."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    vid = (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("IndicatorValueId")
    values = li.select(
        vid,
        F.col("l_extendedprice").alias("Value"),
        (F.col("l_suppkey") % 4).cast("int").alias("NullReasonId"),
    )
    bridge = li.select(
        vid,
        (F.col("l_suppkey") % 500).alias("GeographyReferenceId"),
        (F.col("l_partkey") % 100).cast("int").alias("IndicatorId"),
    )
    return values, bridge


def _warehouse(spark: SparkSession) -> str:
    return spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")


def prepare(spark: SparkSession, sf_dir: str, n_buckets: int = 32) -> None:
    """One-time (per sf) layout setup — NOT part of the timed query:
    the bucketed layout is written once per publish and amortized over
    every subsequent read, which is the trade BucketedStore documents."""
    values, bridge = synth_fact_frames(spark, sf_dir)
    bs = BucketedStore(spark, n_buckets=n_buckets)
    bs.write(values, VALUES_BUCKETED, "IndicatorValueId")
    bs.write(bridge, BRIDGE_BUCKETED, "IndicatorValueId")
    wh = _warehouse(spark)
    values.write.mode("overwrite").parquet(f"{wh}/{VALUES_PLAIN}")
    bridge.write.mode("overwrite").parquet(f"{wh}/{BRIDGE_PLAIN}")


def _joined(values: DataFrame, bridge: DataFrame) -> DataFrame:
    return (
        bridge.join(values.hint("merge"), "IndicatorValueId")
        .groupBy("IndicatorId")
        .agg(F.sum("Value").alias("total_value"), F.count(F.lit(1)).alias("n_values"))
    )


def bridge_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """values⋈bridge over the bucketed mirrors: SMJ, zero Exchange."""
    return _joined(spark.table(VALUES_BUCKETED), spark.table(BRIDGE_BUCKETED))


def bridge_join_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same join over plain parquet: SMJ shuffling both sides."""
    wh = _warehouse(spark)
    return _joined(
        spark.read.parquet(f"{wh}/{VALUES_PLAIN}"),
        spark.read.parquet(f"{wh}/{BRIDGE_PLAIN}"),
    )
