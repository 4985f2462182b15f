"""Unit tests for the scalar function library (SURVEY.md §5.3 property
tests): every D2 ref-year form, every F5 DGUID-repair branch, F* edge
cases — checked on literal rows, no testdata dependency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geo_explorer_etl_spark.functions import (
    dguid_geo_level,
    dguid_repair,
    dguid_scrub,
    generic_wildcard_code,
    html_member_list,
    nth_delimited,
    ordinal_prefix,
    ref_year_normalize,
    strip_coordinate_geography,
    strip_sort_prefix,
    substring_after_first,
    uom_from_combo,
    vector_id,
    year_to_jan1,
)


def one(spark, expr_col, **lits):
    """Evaluate a column expression over a single literal row."""
    df = spark.createDataFrame([tuple(lits.values())], list(lits.keys()))
    return df.select(expr_col.alias("out")).first()["out"]


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("02. Resident owners", "Resident owners"),
        ("123. Thing", "Thing"),
        # the reference pattern (dfhandler.py:55) tops out at "0999." —
        # "1000." is not treated as a sort prefix
        ("1000. X", "1000. X"),
        ("0999. Y", "Y"),
        ("No prefix", "No prefix"),
        # reference lstrips even when no prefix matched (dfhandler.py:57)
        ("  leading space", "leading space"),
    ],
)
def test_strip_sort_prefix(spark, raw, expected):
    assert one(spark, strip_sort_prefix(F.col("s")), s=raw) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [("1.2.3", "2.3"), ("17.4", "4"), ("9", "9")],
)
def test_strip_coordinate_geography(spark, raw, expected):
    assert one(spark, strip_coordinate_geography(F.col("s")), s=raw) == expected


def test_dguid_scrub(spark):
    assert one(spark, dguid_scrub(F.col("s")), s="201A.0001") == "2015A0001"


@pytest.mark.parametrize(
    "dguid,year,expected",
    [
        # short id, pre-2016 year -> default 2016 vintage prepended
        ("1124", 2014, "2016A00251124"),
        # short id, 2016+ -> that year's vintage
        ("1124", 2017, "2017A00251124"),
        # schema typo: 2011B -> 2011S (reference dfhandler.py:606)
        ("2011B00000001", 2018, "2011S00000001"),
        # St. John's typo, pre-2016 vintage left alone
        ("2011S0503122", 2014, "2011S050300122"),
        # CMA vintage rewrite only when vintage >= 2016
        ("2011S0503001", 2018, "2018S0503001"),
        ("2011S0503001", 2014, "2011S0503001"),
        # Belleville / Lethbridge CA recodes (pre-2016 path)
        ("2011S0503522", 2014, "2011S0504522"),
        ("2011S0503810", 2015, "2011S0504810"),
        # vintage rewrite wins over Belleville when >= 2016
        ("2011S0503522", 2018, "2018S0503522"),
        # clean id passes through
        ("2016A000011124", 2018, "2016A000011124"),
    ],
)
def test_dguid_repair_branches(spark, dguid, year, expected):
    got = one(
        spark,
        dguid_repair(F.col("d"), F.col("y")),
        d=dguid,
        y=year,
    )
    assert got == expected


@pytest.mark.parametrize(
    "raw,expected",
    [("2017", 2017), ("2017/18", 2018), ("2017/2018", 2018), ("1999/00", 1900), ("junk", 1900)],
)
def test_ref_year_normalize(spark, raw, expected):
    assert one(spark, ref_year_normalize(F.col("s")), s=raw) == expected


def test_year_to_jan1(spark):
    import datetime

    assert one(spark, year_to_jan1(F.lit(2017)), s="x") == datetime.date(2017, 1, 1)


def test_nth_delimited(spark):
    s = "a _ b _ c"
    assert one(spark, nth_delimited(F.col("s"), -1), s=s) == "c"
    assert one(spark, nth_delimited(F.col("s"), -2), s=s) == "b"
    assert one(spark, nth_delimited(F.col("s"), 1), s=s) == "a"


def test_html_member_list(spark):
    got = one(spark, html_member_list(F.lit(2020), F.col("s")), s="m1 _ m2")
    assert got == "<ul><li>2020<li>m1<li>m2</li></ul>"


def test_ordinal_prefix(spark):
    assert one(spark, ordinal_prefix(F.lit(7)), s="x") == "07. "


def test_substring_after_first(spark):
    assert one(spark, substring_after_first(F.col("s")), s="a/b/c") == "b/c"
    assert one(spark, substring_after_first(F.col("s")), s="nosep") == "nosep"
    # reference str.partition branch: empty tail -> original string
    # (helpers.py:116-121, "str_tup[2] if str_tup[2] != '' else search_str")
    assert one(spark, substring_after_first(F.col("s")), s="trailing/") == "trailing/"
    assert one(spark, substring_after_first(F.col("s")), s="/lead") == "lead"


def test_vector_id(spark):
    assert one(spark, vector_id(F.col("s")), s="v123456") == 123456


def test_dguid_geo_level(spark):
    assert one(spark, dguid_geo_level(F.col("s")), s="2016A000011124") == "A0000"


@pytest.mark.parametrize(
    "coord,expected",
    [
        # reference dfhandler.py:637-644's own example
        ("13100778.4.1.2.1.2018-01-01", "13100778.4.1.%.1.2018-01-01"),
        # wildcard lands third-from-last; last TWO elements kept
        ("1.2.3.4", "1.%.3.4"),
        # len <= 3 -> null (reference's guard)
        ("1.2.3", None),
        ("2.3", None),
        ("7", None),
    ],
)
def test_generic_wildcard_code(spark, coord, expected):
    assert one(spark, generic_wildcard_code(F.col("s")), s=coord) == expected


def test_uom_from_combo(spark):
    assert one(spark, uom_from_combo(F.col("s")), s="nan nan 229.0") == 229
    assert one(spark, uom_from_combo(F.col("s")), s="81") == 81
    assert one(spark, uom_from_combo(F.col("s")), s="nan nan") is None


def test_date_series_frequencies(spark):
    from geo_explorer_etl_spark.functions import date_series

    def count_for(code):
        return spark.range(1).select(
            F.size(
                date_series(F.lit("2020-01-01"), F.lit("2021-12-31"), freq_code=code)
            ).alias("n")
        ).first()["n"]

    assert count_for(12) == 2      # annual
    assert count_for(9) == 8       # quarterly
    assert count_for(6) == 24      # monthly
    # occasional codes are annual/quarterly/monthly/daily
    # (reference helpers.py:31-34), not daily point-dates
    assert count_for(18) == 2
    assert count_for(19) == 8
    assert count_for(20) == 24


def test_date_series_matches_pandas_date_range(spark):
    """All 18 WDS codes against the reference's own engine: pandas
    date_range (helpers.py:14-36, dfhandler.py:481-489), including
    mid-period starts that must snap to the anchor."""
    import pandas as pd

    from geo_explorer_etl_spark.functions.dates import FREQ_SPEC, date_series

    pd_freq = {
        1: "D", 2: "W", 4: "2W", 6: "MS", 7: "2MS", 9: "QS", 10: "4MS",
        11: "6MS", 12: "YS", 13: "2YS", 14: "3YS", 15: "4YS", 16: "5YS",
        17: "10YS", 18: "YS", 19: "QS", 20: "MS", 21: "D",
    }
    spans = [("2016-07-01", "2020-12-31"), ("2020-01-01", "2020-03-15")]
    frames = []
    for code in FREQ_SPEC:
        for start, end in spans:
            frames.append(
                spark.range(1).select(
                    F.lit(code).alias("code"),
                    F.lit(start).alias("start"),
                    F.explode_outer(
                        date_series(F.lit(start), F.lit(end), freq_code=code)
                    ).alias("d"),
                )
            )
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    got: dict[tuple[int, str], list] = {}
    for r in out.collect():
        got.setdefault((r["code"], r["start"]), []).append(r["d"])
    for code in FREQ_SPEC:
        for start, end in spans:
            expected = [
                ts.date() for ts in pd.date_range(start, end, freq=pd_freq[code])
            ]
            actual = [d for d in got[(code, start)] if d is not None]
            assert actual == expected, (code, start, actual[:3], expected[:3])
