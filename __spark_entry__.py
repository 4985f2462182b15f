"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship PrimaryQuery-shaped join
(SURVEY.md §2.14) on sf0.001. ``queries()``/``oracle_sql()`` expose the
operator catalog in ``geo_explorer_etl_spark.plans`` — one entry per
implemented operator from SURVEY.md §2 plus the LLM-pipeline
extensions, each with a DuckDB oracle unless genuinely
non-SQL-expressible (those are marked oracle=None in the registry and
get the driver's rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from geo_explorer_etl_spark.plans.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from geo_explorer_etl_spark.plans.catalog import flagship_primary_query

    return flagship_primary_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted for rows-only ops)."""
    return all_oracles()
