"""Range (interval-containment) join — points joined to the intervals
containing them. Spark has no native range join (pyspark_guide
"Common OLAP patterns"); the naive formulation is a theta join
(BroadcastNestedLoop at best, cross-product at worst).

Scale strategy (the standard bucketized range join):

1. choose a bucket width ~ the typical interval length;
2. explode each interval over the buckets it overlaps (intervals
   spanning b buckets produce b rows — bounded when width ≈ length);
3. bucketize each point (one row);
4. EQUI-join on the bucket — hash shuffle, well distributed — then
   filter the exact containment predicate.

The nested-loop O(points × intervals) becomes O(points + interval
fan-out) shuffle plus per-bucket local comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point_ts < end`` (half-open, the usual window
    convention). Column names must not collide across the two inputs
    (select/alias beforehand)."""
    bucket = lambda c: F.floor(F.unix_timestamp(c) / bucket_seconds)  # noqa: E731
    iv = intervals.withColumn(
        "_b",
        F.explode(F.sequence(bucket(F.col(start_ts)), bucket(F.col(end_ts)))),
    )
    pt = points.withColumn("_b", bucket(F.col(point_ts)))
    joined = pt.join(iv, "_b", how).filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
    return joined.drop("_b")
