"""Skew mitigation for hot join keys (SURVEY.md §4 / SCALE.md).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on
by default in ``session.get_spark``) handles most skew at runtime.
Salting is the explicit fallback for the cases AQE can't fix —
a broadcast-ineligible dimension side, or aggregation skew:

- ``salted_join``: replicate the small side ``n_salts`` times, salt the
  big side's key uniformly, equi-join on (key, salt). The hot key's
  rows spread over n partitions instead of one straggler.
- ``salted_count``: two-phase aggregation — partial count per
  (key, salt), then final sum per key — for count-like aggs whose
  partial combine alone can't save a single hot reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(n_salts: int) -> Column:
    # deterministic-enough spread without RNG state: hash row identity
    return (F.spark_partition_id() * 31 + F.monotonically_increasing_id()) % n_salts


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side to a non-broadcastable small side by
    exploding the small side across ``n_salts`` salt values."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn("_salt", _salt(n_salts).cast("int"))
    out = big_salted.join(small_rep, [key, "_salt"], how)
    return out.drop("_salt")


def salted_count(
    df: DataFrame, key: str, n_salts: int = 16, out_col: str = "n"
) -> DataFrame:
    """Count per key with a salt-sharded partial phase: hot keys
    aggregate on ``n_salts`` reducers, then a tiny final sum."""
    partial = (
        df.withColumn("_salt", _salt(n_salts).cast("int"))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").cast("long").alias(out_col))
