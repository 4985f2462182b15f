"""Explicit StructTypes + width contracts for the star-schema target
tables (SURVEY.md §7 step 1; the ``gis.*`` tables the reference bulk
loads, scdb.py:174–187).

Two uses:
- ``conform(df, table)`` — order/select the frame to the declared
  schema and apply the fixed-width truncations (F11) the reference
  does column-by-column before insert (dfhandler.py:108–109, 299,
  366–371, 420–423, 532–536) — one place instead of 15 call sites;
- empty-frame construction for first-run anti-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# column -> (type, max_width or None). Widths from the reference's
# truncation calls; None = untruncated.
TARGET_TABLES: dict[str, dict[str, tuple[T.DataType, int | None]]] = {
    # reference insert column set (dfhandler.py:424-427)
    "IndicatorTheme": {
        "IndicatorThemeId": (T.LongType(), None),
        "IndicatorTheme_EN": (T.StringType(), 400),
        "IndicatorTheme_FR": (T.StringType(), 400),
        "StatisticsProgramId": (T.LongType(), None),
        "IndicatorThemeDescription_EN": (T.StringType(), 1000),
        "IndicatorThemeDescription_FR": (T.StringType(), 1000),
        "ParentThemeId": (T.LongType(), None),
        "IndicatorThemeStatus": (T.StringType(), 1),
    },
    # reference insert column sets (dfhandler.py:38-39, 110-111);
    # DimPosId/MemberId/MemberUomCode kept for downstream joins
    "Dimensions": {
        "DimensionId": (T.LongType(), None),
        "IndicatorThemeId": (T.LongType(), None),
        "Dimension_EN": (T.StringType(), 255),
        "Dimension_FR": (T.StringType(), 255),
        "DisplayOrder": (T.IntegerType(), None),
        "DimensionType": (T.StringType(), 10),
        "DimPosId": (T.IntegerType(), None),
    },
    "DimensionValues": {
        "DimensionValueId": (T.LongType(), None),
        "DimensionId": (T.LongType(), None),
        "Display_EN": (T.StringType(), 255),
        "Display_FR": (T.StringType(), 255),
        "ValueDisplayOrder": (T.IntegerType(), None),
        "ValueDisplayParent": (T.StringType(), 50),
        "MemberId": (T.IntegerType(), None),
        "MemberUomCode": (T.ShortType(), None),
    },
    "Indicators": {
        "IndicatorId": (T.LongType(), None),
        "IndicatorThemeId": (T.LongType(), None),
        "IndicatorCode": (T.StringType(), 100),
        "IndicatorFmt": (T.StringType(), 255),
        "IndicatorName_EN": (T.StringType(), 255),
        "IndicatorName_FR": (T.StringType(), 255),
        "LastIndicatorMember_EN": (T.StringType(), 255),
        "LastIndicatorMember_FR": (T.StringType(), 255),
        "IndicatorNameLong_EN": (T.StringType(), 500),
        "IndicatorNameLong_FR": (T.StringType(), 500),
        "IndicatorDisplay_EN": (T.StringType(), 500),
        "IndicatorDisplay_FR": (T.StringType(), 500),
        "ReleaseIndicatorDate": (T.TimestampType(), None),
        "Vector": (T.IntegerType(), None),
        "ReferencePeriod": (T.DateType(), None),
        "UOM_EN": (T.StringType(), 255),
        "UOM_FR": (T.StringType(), 255),
        "UOM_ID": (T.ShortType(), None),
    },
    "IndicatorValues": {
        "IndicatorValueId": (T.LongType(), None),
        "IndicatorValueCode": (T.StringType(), 120),
        "IndicatorCode": (T.StringType(), 100),
        "DGUID": (T.StringType(), 25),
        "Value": (T.DoubleType(), None),
        "NullReasonId": (T.IntegerType(), None),
    },
    "GeographyReferenceForIndicator": {
        "GeographyReferenceId": (T.StringType(), 25),
        "IndicatorId": (T.LongType(), None),
        "IndicatorValueId": (T.LongType(), None),
        "ReferencePeriod": (T.DateType(), None),
    },
    "GeographicLevelForIndicator": {
        "GeographicLevelId": (T.StringType(), 5),
        "IndicatorId": (T.LongType(), None),
    },
    # reference insert column set (dfhandler.py:374-377); the generated
    # T-SQL PrimaryQuery string is replaced by the parameterized view
    # primary_query (its inputs live as the typed columns here)
    "IndicatorMetaData": {
        "MetaDataId": (T.LongType(), None),
        "IndicatorId": (T.LongType(), None),
        "DefaultRelatedChartId": (T.LongType(), None),
        "IndicatorCode": (T.StringType(), 100),
        "DimensionUniqueKey": (T.StringType(), 50),
        "FieldAlias_EN": (T.StringType(), 600),
        "FieldAlias_FR": (T.StringType(), 600),
        "DataFormatId": (T.IntegerType(), None),
        "ColorTo": (T.StringType(), 35),
        "ColorFrom": (T.StringType(), 35),
        "DefaultBreaks": (T.IntegerType(), None),
        "DefaultBreaksAlgorithmId": (T.IntegerType(), None),
        "PrimaryChartTypeId": (T.IntegerType(), None),
        "UOM_EN": (T.StringType(), 255),
        "UOM_FR": (T.StringType(), 255),
        "UOM_ID": (T.ShortType(), None),
    },
    # reference insert column set (dfhandler.py:539-541) with the
    # generated T-SQL Query string replaced by RelatedIndicatorIds
    # (the parameterized related_charts_query consumes it);
    # IndicatorId/IndicatorCode kept for the view + chart-type reuse
    "RelatedCharts": {
        "IndicatorId": (T.LongType(), None),
        "RelatedChartId": (T.LongType(), None),
        "IndicatorMetaDataId": (T.LongType(), None),
        "IndicatorCode": (T.StringType(), 100),
        "ChartTitle_EN": (T.StringType(), 150),
        "ChartTitle_FR": (T.StringType(), 150),
        "RelatedIndicatorIds": (T.StringType(), 255),
        "ChartTypeId": (T.IntegerType(), None),
        "DataFormatId": (T.IntegerType(), None),
        "FieldAlias_EN": (T.StringType(), 150),
        "FieldAlias_FR": (T.StringType(), 150),
    },
}


def schema_of(table: str) -> T.StructType:
    return T.StructType(
        [T.StructField(c, t, True) for c, (t, _) in TARGET_TABLES[table].items()]
    )


def conform(df: DataFrame, table: str, keep: list[str] | None = None) -> DataFrame:
    """Project/cast/truncate a builder output onto the declared target
    schema. Missing declared columns become typed nulls; extra builder
    columns are dropped unless named in ``keep`` (e.g. ``coordinate``
    on Indicators, which siblings/metadata need downstream)."""
    spec = TARGET_TABLES[table]
    cols = []
    for name, (dtype, width) in spec.items():
        if name in df.columns:
            c = F.col(name).cast(dtype)
            if width is not None and isinstance(dtype, T.StringType):
                c = F.substring(c, 1, width)
        else:
            c = F.lit(None).cast(dtype)
        cols.append(c.alias(name))
    for extra in keep or []:
        if extra in df.columns and extra not in spec:
            cols.append(F.col(extra))
    return df.select(*cols)
