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

# D1 — WDS frequency code -> (Spark INTERVAL literal, anchor unit).
# Mirrors the reference's pandas freq map (helpers.py:14–36): pandas
# "MS"/"QS"/"AS" emit only period-START dates within [start, end]
# (never the raw start when it is mid-period), and "W" anchors to
# Sunday — so each code carries the anchor its series snaps to.
# Occasional codes 18/19/20/21 are annual/quarterly/monthly/daily
# (helpers.py:31–34), NOT daily point-dates.
FREQ_SPEC: dict[int, tuple[str, str]] = {
    1: ("interval 1 day", "day"),        # D
    2: ("interval 1 week", "week"),      # W (Sunday)
    4: ("interval 2 week", "week"),      # 2W (Sunday)
    6: ("interval 1 month", "month"),    # MS
    7: ("interval 2 month", "month"),    # 2MS
    9: ("interval 3 month", "quarter"),  # QS
    10: ("interval 4 month", "month"),   # 4MS (3×/year)
    11: ("interval 6 month", "month"),   # 6MS (semiannual)
    12: ("interval 1 year", "year"),     # AS
    13: ("interval 2 year", "year"),
    14: ("interval 3 year", "year"),
    15: ("interval 4 year", "year"),
    16: ("interval 5 year", "year"),
    17: ("interval 10 year", "year"),
    18: ("interval 1 year", "year"),     # occasional -> annual
    19: ("interval 3 month", "quarter"), # occasional quarterly
    20: ("interval 1 month", "month"),   # occasional monthly
    21: ("interval 1 day", "day"),       # occasional daily
}
DEFAULT_FREQ_CODE = 12

_ANCHOR_STEP_MONTHS = {"month": 1, "quarter": 3, "year": 12}


def _ceil_to_anchor(start: Column, unit: str) -> Column:
    """First anchor point >= start: period start for month/quarter/year,
    Sunday for week, identity for day — pandas ``date_range`` semantics
    (anchored offsets emit only on-anchor dates inside the range)."""
    if unit == "day":
        return start
    if unit == "week":
        # next_day is strictly-after, so back up one day to keep a
        # start that already falls on Sunday
        return F.next_day(F.date_add(start, -1), "Sun")
    trunc = F.date_trunc(unit, start).cast("date")
    bumped = F.add_months(trunc, _ANCHOR_STEP_MONTHS[unit])
    return F.when(trunc == start, start).otherwise(bumped)


def date_series(start: Column, end: Column, freq_code: int) -> Column:
    """D1 — inclusive array of reference dates at the cube's frequency,
    snapped to the pandas anchor (reference dfhandler.py:481–489 uses
    ``pd.date_range``). Explode the result to fan out (J14). An
    anchor past ``end`` yields an empty array, like pandas."""
    interval, unit = FREQ_SPEC.get(freq_code, FREQ_SPEC[DEFAULT_FREQ_CODE])
    s = start.cast("date")
    e = end.cast("date")
    anchored = _ceil_to_anchor(s, unit)
    return F.when(
        anchored <= e, F.sequence(anchored, e, F.expr(interval))
    ).otherwise(F.array().cast("array<date>"))


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
