"""Query registry backing ``__spark_entry__.py``.

Every implemented operator registers a named pair:
- a PySpark callable ``(spark, sf_dir) -> DataFrame``;
- an ANSI-SQL oracle string for DuckDB over the same parquet views
  (``None`` only for genuinely non-SQL-expressible ops — the driver
  then records a weaker rows-only check).

Column names/types are aligned between the two sides because the
driver's comparator sorts columns by name and hashes values. Floats
that involve cross-engine accumulation order are rounded in BOTH
queries; derived integers are cast to BIGINT on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, tags: str = ""):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, spark_fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {k: v.spark_fn for k, v in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {k: v.oracle for k, v in REGISTRY.items() if v.oracle is not None}


def _ensure_loaded() -> None:
    # Import for side effect: modules register their queries on import.
    from geo_explorer_etl_spark.plans import catalog, catalog_ext  # noqa: F401
