"""As-of (point-in-time) join — an operator Spark's built-ins lack
(pyspark_guide "Common OLAP patterns"); composed from union + a
running last-value window rather than a Pandas UDF:

For each left row, find the most recent right row with
``right.ts <= left.ts`` within the same key.

Plan shape: tag both sides, union, ONE window pass per key ordered by
(ts, side) carrying the right side's payload forward, filter back to
left rows. Cost = one shuffle on the key + one sort — same as a
sort-merge join, no per-group Python. Skewed keys fall under the same
AQE/salting story as any other keyed window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row annotated with the latest
    preceding-or-equal right row's ``right_cols`` (null when no right
    row precedes it).

    Ties: a right row at exactly left.ts matches (<= semantics, right
    sorts before left at equal ts); multiple right rows at the same ts
    resolve to the last one in (ts, side) order.
    """
    lcols = left.columns
    payload = [F.col(c).alias(f"{c}{suffix}") for c in right_cols]
    r = right.select(F.col(key), F.col(ts), F.lit(0).alias("_side"), *payload)
    l = left.select(*lcols, F.lit(1).alias("_side"))
    # union fills each side's missing columns with nulls: left rows get
    # null payload (to be carried over), right rows get null left cols
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in right_cols
        ],
    )
    out = carried.filter(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_c_{c}").alias(f"{c}{suffix}") for c in right_cols]
    )
    return out
