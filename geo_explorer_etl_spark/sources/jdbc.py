"""S8 — JDBC lookup reads: the reference reads its lookup and
presentation state straight from the RDBMS (reference scdb.py:83–143:
GeographyReference ids, NullReason symbols, Indicators, chart info,
geo levels). A parity deployment pointed at an existing ``gis.*``
database needs the same read path, so this module wraps
``spark.read.format("jdbc")`` with the reference's query surface.

Scale notes:
- Lookup tables are dimension-sized — a single-partition JDBC read is
  correct and cheap; each becomes a broadcast side downstream.
- For the one big read (Indicators of a product), per-product
  predicates are pushed INTO the database (Spark JDBC filter
  pushdown), and ``partition_options`` exposes
  partitionColumn/lowerBound/upperBound/numPartitions for parallel
  range-chunked reads when a table is genuinely large.
- No driver-side pandas round-trip: rows land directly in executors.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class JdbcLookupSource:
    """Spark-native stand-in for the reference's ``scdb`` read methods.

    ``schema`` mirrors the reference's ``gis.`` prefix; set it to ""
    for databases without schemas. Extra ``options`` pass through to
    the JDBC reader (driver, user, password, fetchsize...).
    """

    spark: SparkSession
    url: str
    schema: str = "gis"
    options: dict[str, str] = field(default_factory=dict)
    # quote table identifiers (uppercased) — required when a lookup
    # table name is an ANSI reserved word in the target DB ("Indicator"
    # is reserved in Derby, for example); leave False for SQL Server's
    # unquoted gis.* names
    quote_identifiers: bool = False

    def _qualified(self, table: str) -> str:
        name = f'"{table.upper()}"' if self.quote_identifiers else table
        return f"{self.schema}.{name}" if self.schema else name

    def _reader(self, dbtable: str, partition_options: dict | None = None):
        r = (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", dbtable)
        )
        for k, v in {**self.options, **(partition_options or {})}.items():
            r = r.option(k, str(v))
        return r

    def read_table(
        self, table: str, partition_options: dict | None = None
    ) -> DataFrame:
        """Whole-table read; filters/projections applied on the result
        are pushed down into the database by the JDBC source."""
        return self._reader(self._qualified(table), partition_options).load()

    def read_query(self, query: str) -> DataFrame:
        """Arbitrary SQL evaluated DB-side (Spark wraps it as a
        derived table) — for the reference's join-shaped lookups."""
        return self._reader(f"({query}) sq").load()

    # -- reference scdb.py read surface ---------------------------------
    def geo_reference_ids(self) -> DataFrame:
        """reference scdb.py:117–121 (get_geo_reference_ids)."""
        return self.read_table("GeographyReference").select("GeographyReferenceId")

    def null_reasons(self) -> DataFrame:
        """reference scdb.py:140–144 (get_indicator_null_reason):
        NullReasonId + Symbol, non-null symbols only."""
        return (
            self.read_table("IndicatorNullReason")
            .select("NullReasonId", "Symbol")
            .filter(F.col("Symbol").isNotNull())
        )

    def indicators(self, product_id: int, partition_options: dict | None = None) -> DataFrame:
        """reference scdb.py:123–127 (get_indicators): one product's
        rows; the pid predicate is pushed into the database."""
        return self.read_table("Indicator", partition_options).filter(
            F.col("IndicatorThemeId") == product_id
        )

    def geo_levels(self, product_id: int) -> DataFrame:
        """reference scdb.py:108–115 (get_geo_levels): existing
        (level, indicator) pairs for a product — the anti-join state."""
        ind = self._qualified("Indicator")
        glfi = self._qualified("GeographicLevelForIndicator")
        return self.read_query(
            f"SELECT g.GeographicLevelId AS GeographicLevelIdExist, "
            f"g.IndicatorId AS IndicatorIdExist "
            f"FROM {glfi} g INNER JOIN {ind} i ON g.IndicatorId = i.IndicatorId "
            f"WHERE i.IndicatorThemeId = {int(product_id)}"
        )

    def indicator_chart_info(self, product_id: int) -> DataFrame:
        """reference scdb.py:129–138 (get_indicator_chart_info):
        indicator × metadata × related-chart config, joined DB-side."""
        ind = self._qualified("Indicator")
        meta = self._qualified("IndicatorMetaData")
        rc = self._qualified("RelatedCharts")
        return self.read_query(
            f"SELECT i.IndicatorThemeId, i.IndicatorCode, "
            f"im.DefaultBreaksAlgorithmId, im.DefaultBreaks, "
            f"im.PrimaryChartTypeId, im.ColorTo, im.ColorFrom, "
            f"r.ChartTypeId, r.ChartTitle_EN, r.ChartTitle_FR, "
            f"r.FieldAlias_EN, r.FieldAlias_FR "
            f"FROM {ind} i "
            f"LEFT JOIN {meta} im ON i.IndicatorId = im.IndicatorId "
            f"LEFT JOIN {rc} r ON im.IndicatorId = r.RelatedChartId "
            f"WHERE i.IndicatorThemeId = {int(product_id)}"
        )

    def date_dimension_values(self, product_id: int) -> DataFrame:
        """reference scdb.py:83–89 (get_date_dimension_values)."""
        dims = self._qualified("Dimensions")
        dv = self._qualified("DimensionValues")
        return self.read_query(
            f"SELECT v.DimensionValueId, v.DimensionId, v.Display_EN, "
            f"v.Display_FR, v.ValueDisplayOrder "
            f"FROM {dv} v WHERE v.DimensionId IN "
            f"(SELECT d.DimensionId FROM {dims} d "
            f"WHERE d.IndicatorThemeId = {int(product_id)} "
            f"AND d.Dimension_EN = 'Date')"
        )
