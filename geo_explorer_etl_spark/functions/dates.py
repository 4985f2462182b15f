"""Date/time scalar operators (SURVEY.md §2.9, D1–D5).

The reference materializes pandas ``date_range`` lists on the driver
(reference helpers.py:14–36, dfhandler.py:481–489); here a date series
is a lazy ``sequence()`` column exploded executor-side — the fan-out
(J14) becomes a crossJoin against a tiny exploded frame instead of a
driver-side copy loop, which is what survives a 100 TB scale-up.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# D1 — WDS frequency code -> Spark INTERVAL literal
# (reference helpers.py:14–36 maps 21 codes to pandas freq strings).
FREQ_INTERVALS: dict[int, str] = {
    1: "interval 1 day",        # daily
    2: "interval 1 week",       # weekly
    4: "interval 2 week",       # biweekly
    6: "interval 1 month",      # monthly
    7: "interval 2 month",      # bimonthly
    9: "interval 3 month",      # quarterly
    10: "interval 4 month",
    11: "interval 6 month",     # semiannual
    12: "interval 1 year",      # annual
    13: "interval 2 year",
    14: "interval 3 year",
    15: "interval 4 year",
    16: "interval 5 year",
    17: "interval 10 year",
    18: "interval 1 day",       # occasional -> treated as point dates
    19: "interval 1 day",
    20: "interval 1 day",
    21: "interval 1 day",
}
DEFAULT_FREQ_CODE = 12


def date_series(start: Column, end: Column, freq_code: int) -> Column:
    """D1 — inclusive array of reference dates from start to end at the
    cube's frequency. Explode the result to fan out (J14)."""
    interval = FREQ_INTERVALS.get(freq_code, FREQ_INTERVALS[DEFAULT_FREQ_CODE])
    return F.sequence(start.cast("date"), end.cast("date"), F.expr(interval))


def day_series_df(spark: SparkSession, start: str, end: str) -> DataFrame:
    """D4 — one row per day in [start, end] (changed-cube polling loop,
    reference helpers.py:69–75, main.py:104)."""
    return spark.sql(
        f"SELECT explode(sequence(date'{start}', date'{end}', interval 1 day)) AS day"
    )


def ref_year_normalize(ref_date: Column) -> Column:
    """D2 — REF_DATE string -> reference year (reference
    helpers.py:86–101, dfhandler.py:677):

    - ``"2017"``      -> 2017
    - ``"2017/18"``   -> 2018  (century of the start + 2-digit end)
    - ``"2017/2018"`` -> 2018
    - anything else   -> 1900 (reference logs a warning and defaults)
    """
    return (
        F.when(ref_date.rlike(r"^\d{4}$"), ref_date)
        .when(
            ref_date.rlike(r"^\d{4}/\d{2}$"),
            F.concat(F.substring(ref_date, 1, 2), F.substring(ref_date, 6, 2)),
        )
        .when(ref_date.rlike(r"^\d{4}/\d{4}$"), F.substring(ref_date, 6, 4))
        .otherwise(F.lit("1900"))
        .cast("int")
    )


def year_to_jan1(year: Column) -> Column:
    """D3 — reference period = Jan 1 of the ref year (reference
    dfhandler.py:682–683, helpers.py:48–55)."""
    return F.make_date(year.cast("int"), F.lit(1), F.lit(1))


def format_date(col: Column, fmt: str = "yyyy-MM-dd") -> Column:
    """D5 — date -> display string (reference dfhandler.py:574,
    scwds.py:15–16)."""
    return F.date_format(col, fmt)
