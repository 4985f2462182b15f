"""Golden-pipeline tests (SURVEY.md §5.2/§5.4): a synthetic mini-cube
(FIXTURES.md Part A) runs through every star-schema builder; exact
target-table contents are asserted, plus anti-join idempotence and the
parameterized read-side views."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geo_explorer_etl_spark.plans import star_schema as SS
from geo_explorer_etl_spark.plans.policy import ProductPolicy

PID = 35100177


@pytest.fixture(scope="module")
def metadata(spark):
    member = "memberId int, memberNameEn string, memberNameFr string, memberUomCode smallint"
    schema = (
        "productId long, cubeTitleEn string, cubeTitleFr string, "
        "cubeStartDate string, cubeEndDate string, frequencyCode int, "
        f"dimension array<struct<dimensionPositionId:int, dimensionNameEn:string, "
        f"dimensionNameFr:string, hasUom:boolean, member:array<struct<{member}>>>>"
    )
    row = (
        PID,
        "Police personnel",
        "Personnel policier",
        "2018-01-01",
        "2020-01-01",
        12,
        [
            (1, "Geography", "Géographie", False, [(1, "Canada", "Canada", None)]),
            (
                2,
                "Property type",
                "Type de propriété",
                False,
                [(1, "House", "Maison", None), (2, "Condo", "Condo", None)],
            ),
            (
                3,
                "Owner status",
                "Statut du propriétaire",
                True,
                [(1, "Owner", "Propriétaire", 229), (2, "02. Renter", "02. Locataire", 229)],
            ),
        ],
    )
    return spark.createDataFrame([row], schema)


@pytest.fixture(scope="module")
def members(metadata):
    return SS.explode_metadata_members(metadata)


@pytest.fixture(scope="module")
def lookups(spark):
    uom = spark.createDataFrame(
        [(229, "Number", "Nombre"), (81, "Dollars", "Dollars")],
        "memberUomCode int, memberUomEn string, memberUomFr string",
    )
    subjects = spark.createDataFrame(
        [
            ("35", "Crime and justice", "Criminalité et justice"),
            # slash-delimited form the reference strips via
            # get_partitioned_string(desc, "/") (helpers.py:116-121)
            (
                "3510",
                "Crime and justice/Crimes and offences",
                "Criminalité et justice/Crimes et infractions",
            ),
        ],
        "subjectCode string, subjectEn string, subjectFr string",
    )
    null_reason = spark.createDataFrame(
        [(1, "..", "not available"), (2, "x", "suppressed"), (3, "F", "unreliable")],
        "NullReasonId int, Symbol string, Description_EN string",
    )
    geo_ref = spark.createDataFrame(
        [
            ("2016A000011124", "Canada", "A0000", "POLYGON((0 0))"),
            ("2016A000235", "Ontario", "A0002", "POLYGON((1 1))"),
            ("2016S05030001", "Toronto CMA", "S0503", "POLYGON((2 2))"),
            ("2019S05030001", "Toronto CMA (2019 vintage)", "S0503", "POLYGON((2 2))"),
        ],
        "GeographyReferenceId string, DisplayNameShort_EN string, "
        "GeographicLevelId string, Shape string",
    )
    geo_level = spark.createDataFrame(
        [("A0000", "Country"), ("A0002", "Province"), ("S0503", "CMA"), ("SSSS", "Web")],
        "GeographicLevelId string, LevelName_EN string",
    )
    return {
        "uom": uom,
        "subjects": subjects,
        "null_reason": null_reason,
        "geo_ref": geo_ref,
        "geo_level": geo_level,
    }


@pytest.fixture(scope="module")
def cube(spark):
    # REF_DATE forms, dirty DGUIDs, null VALUE w/ STATUS, orphan DGUID
    rows = [
        # clean national row
        ("2018", "2016A000011124", "v100", "1.1.1", None, 10.5),
        # YYYY/YYYY form + provincial
        ("2017/2018", "2016A000235", "v101", "1.1.2", None, 20.0),
        # dotted DGUID (scrub) + CMA 2011-vintage rewrite (F5 rule 4:
        # 2011S0503→{vintage}S0503 since RefYear 2019 >= 2016)
        ("2019", "2011S0503.0001", "v102", "1.2.1", None, 30.25),
        # null value with status symbol
        ("2019", "2016A000011124", "v103", "1.2.2", "x", None),
        # orphan DGUID (not in geo_ref)
        ("2020", "2016A000999999", "v104", "1.1.1", None, 40.0),
        # pre-min-year row at CMA level (dropped for mixed_geo)
        ("2015", "2016S05030001", "v105", "1.2.1", None, 5.0),
        # pre-min-year row at national level (kept for mixed_geo)
        ("2015", "2016A000011124", "v106", "1.1.2", None, 6.0),
    ]
    return spark.createDataFrame(
        rows, "REF_DATE string, DGUID string, VECTOR string, COORDINATE string, STATUS string, VALUE double"
    )


def test_theme_with_parent_subjects(metadata, lookups):
    themes = SS.build_indicator_theme(metadata, lookups["subjects"]).collect()
    by_id = {r["IndicatorThemeId"]: r for r in themes}
    assert by_id[PID]["IndicatorTheme_EN"] == "Police personnel"
    assert by_id[PID]["ParentThemeId"] == 35
    assert by_id[35]["IndicatorTheme_EN"] == "Crime and justice"
    assert by_id[35]["ParentThemeId"] is None
    # L6 dummy selector row under the 2-digit subject (reference
    # dfhandler.py:407-411: code + "9999" suffix, parent = subject)
    assert by_id[359999]["IndicatorTheme_EN"] == "*...Select a Theme "
    assert by_id[359999]["ParentThemeId"] == 35
    # common fields (dfhandler.py:414-416)
    assert by_id[PID]["IndicatorThemeStatus"] == "C"
    assert by_id[PID]["IndicatorThemeDescription_EN"] == "Police personnel"


def test_dimensions_prepend_date_and_type_value(members):
    dims = SS.build_dimensions(members, id_offset=100).orderBy("DimensionId").collect()
    assert [d["Dimension_EN"] for d in dims] == ["Date", "Property type", "Owner status"]
    assert [d["DimensionId"] for d in dims] == [101, 102, 103]
    assert [d["DimensionType"] for d in dims] == ["Filter", "Filter", "Value"]
    # 1-based per-product counter (reference dfhandler.py:30)
    assert [d["DisplayOrder"] for d in dims] == [1, 2, 3]
    # geography never becomes a dimension
    assert all(d["Dimension_EN"].lower() != "geography" for d in dims)


def test_dimension_values_ordinals_and_prefixes(members):
    dims = SS.build_dimensions(members, id_offset=0)
    dv = SS.build_dimension_values(members, dims, id_offset=500).orderBy(
        "DimensionValueId"
    ).collect()
    assert len(dv) == 4  # 2 property + 2 owner (geography stripped, Date empty)
    assert dv[0]["Display_EN"] == "01. House"
    assert dv[1]["Display_EN"] == "02. Condo"
    # source sort prefix "02. " stripped then re-prefixed with ordinal
    assert dv[3]["Display_EN"] == "02. Renter"
    assert [r["DimensionValueId"] for r in dv] == [501, 502, 503, 504]


def test_indicator_build_cross_product_and_dates(spark, members, lookups, metadata):
    ref_dates = SS.build_reference_dates(
        spark, metadata.first().asDict()
    )
    assert ref_dates.count() == 3  # annual 2018..2020
    ind = SS.build_indicators(members, ref_dates, lookups["uom"], PID, id_offset=0)
    rows = ind.orderBy("IndicatorId").collect()
    assert len(rows) == 12  # 2 property × 2 owner × 3 dates
    first = rows[0]
    assert first["IndicatorCode"] == "35100177.1.1.2018-01-01"
    assert first["IndicatorName_EN"] == "House"           # 2nd-to-last member (F8)
    assert first["LastIndicatorMember_EN"] == "Owner"     # last member
    assert first["UOM_EN"] == "Number"                    # M1+L1 via broadcast
    assert first["IndicatorDisplay_EN"] == "<ul><li>2018<li>House<li>Owner</li></ul>"
    assert rows[-1]["IndicatorCode"] == "35100177.2.2.2020-01-01"
    # ids contiguous in code order
    assert [r["IndicatorId"] for r in rows] == list(range(1, 13))


def test_prepare_values_repair_and_policy(cube):
    pol = ProductPolicy(product_id=PID, min_ref_year=2016, mixed_geo=True)
    prep = SS.prepare_values(cube, pol)
    rows = {r["VectorId"]: r for r in prep.collect()}
    # scrub+repair: dot removed, then 2011-vintage CMA recoded to RefYear
    assert rows[102]["DGUID"] == "2019S05030001"
    assert rows[102]["GeographicLevelId"] == "S0503"
    # ref-year forms
    assert rows[101]["RefYear"] == 2018
    assert str(rows[101]["ReferencePeriod"]) == "2018-01-01"
    # mixed-geo policy: pre-2017 CMA row dropped, national kept
    assert 105 not in rows
    assert 106 in rows
    # coordinate tail strips geography member
    assert rows[100]["Coordinate"] == "1.1"
    assert rows[100]["IndicatorCode"] == "35100177.1.1.2018-01-01"


def test_indicator_values_orphans_and_nullreason(cube, lookups):
    pol = ProductPolicy(product_id=PID, mixed_geo=True)
    prep = SS.prepare_values(cube, pol)
    vals, orphans = SS.build_indicator_values(
        prep, lookups["geo_ref"], lookups["null_reason"], id_offset=9000
    )
    v = {r["IndicatorValueCode"]: r for r in vals.collect()}
    o = [r["DGUID"] for r in orphans.collect()]
    assert o == ["2016A000999999"]                  # J12 orphan capture
    assert len(v) == 5                              # 6 surviving - 1 orphan
    nullrow = v["2016A000011124.35100177.2.2.2019-01-01"]
    assert nullrow["Value"] is None and nullrow["NullReasonId"] == 2
    # scale-safe ids: unique, NOT contiguous, and DETERMINISTIC — a
    # second, independent execution of the same lineage (the bridge
    # write re-runs the values plan as its own job) must produce the
    # identical code->id mapping, or the fact<->bridge linkage breaks
    ids = [r["IndicatorValueId"] for r in v.values()]
    assert len(set(ids)) == 5
    vals2, _ = SS.build_indicator_values(
        prep, lookups["geo_ref"], lookups["null_reason"], id_offset=9000
    )
    v2 = {r["IndicatorValueCode"]: r["IndicatorValueId"] for r in vals2.collect()}
    assert {c: r["IndicatorValueId"] for c, r in v.items()} == v2
    # no single-partition window in the fact-id plan (the 100 TB
    # killer); contiguity is only required on dimension-sized frames
    plan = vals._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # reference-parity strategy still available on demand
    seq_vals, _ = SS.build_indicator_values(
        prep, lookups["geo_ref"], lookups["null_reason"], id_offset=9000,
        scale_ids=False,
    )
    seq_ids = sorted(r["IndicatorValueId"] for r in seq_vals.collect())
    assert seq_ids == list(range(9001, 9006))


@pytest.mark.slow
def test_bridges_and_idempotence(spark, cube, lookups, members, metadata):
    pol = ProductPolicy(product_id=PID, mixed_geo=True)
    prep = SS.prepare_values(cube, pol)
    ref_dates = SS.build_reference_dates(spark, metadata.first().asDict())
    ind = SS.build_indicators(members, ref_dates, lookups["uom"], PID)
    vals, _ = SS.build_indicator_values(prep, lookups["geo_ref"], lookups["null_reason"])
    grb = SS.build_geo_ref_bridge(vals, ind)
    # every surviving value row with an indicator in range links up;
    # 2017/2018→2018 and 2019/2020 codes exist; 2015 national row has
    # no indicator (dates start 2018) → inner join drops it
    assert grb.count() == 4
    assert grb.filter(F.col("GeographyReferenceId") == "2016A000011124").count() == 2

    glb = SS.build_geo_level_bridge(prep, ind, existing_bridge=None, policy=pol)
    lv = {(r["GeographicLevelId"], r["IndicatorId"]) for r in glb.collect()}
    assert any(l == "SSSS" for l, _ in lv)          # U2 web-display rows
    assert any(l == "A0000" for l, _ in lv)
    # idempotence (I3): re-running against the existing bridge adds nothing
    again = SS.build_geo_level_bridge(prep, ind, existing_bridge=glb, policy=pol)
    assert again.count() == 0


def test_date_dimension_growth_anti_join(spark, cube, members):
    pol = ProductPolicy(product_id=PID, mixed_geo=True)
    prep = SS.prepare_values(cube, pol)
    dims = SS.build_dimensions(members)
    date_dim = dims.filter(F.col("Dimension_EN") == "Date")
    existing = spark.createDataFrame([("2018",)], "Display_EN string")
    grown = SS.grow_date_dimension(prep, date_dim, existing, id_offset=700, order_offset=1)
    rows = grown.orderBy("ValueDisplayOrder").collect()
    # observed {2015(kept national), 2018, 2019, 2020} minus existing {2018}
    assert [r["Display_EN"] for r in rows] == ["2015", "2019", "2020"]
    assert [r["ValueDisplayOrder"] for r in rows] == [2, 3, 4]
    assert [r["DimensionValueId"] for r in rows] == [701, 702, 703]
    # idempotence: nothing new when all dates known
    all_known = spark.createDataFrame(
        [("2015",), ("2018",), ("2019",), ("2020",)], "Display_EN string"
    )
    assert SS.grow_date_dimension(prep, date_dim, all_known).count() == 0


@pytest.mark.slow
def test_presentation_and_read_side_views(spark, cube, members, lookups, metadata):
    pol = ProductPolicy(product_id=PID, mixed_geo=True)
    prep = SS.prepare_values(cube, pol)
    ref_dates = SS.build_reference_dates(spark, metadata.first().asDict())
    ind = SS.build_indicators(members, ref_dates, lookups["uom"], PID)
    vals, _ = SS.build_indicator_values(prep, lookups["geo_ref"], lookups["null_reason"])
    grb = SS.build_geo_ref_bridge(vals, ind)
    glb = SS.build_geo_level_bridge(prep, ind, None, pol)

    keys = SS.build_dimension_unique_keys(None, ind)
    meta = SS.build_indicator_metadata(ind, keys, existing_meta=None)
    m = meta.orderBy("IndicatorId").first()
    assert m["ColorTo"] == SS.CHART_DEFAULTS["ColorTo"]   # M3 defaults
    assert m["DimensionUniqueKey"] == "1-1"
    # reference dfhandler.py:330-333: duplicated id columns + UOM renames
    assert m["MetaDataId"] == m["IndicatorId"] == m["DefaultRelatedChartId"]
    assert m["FieldAlias_EN"] == m["UOM_EN"] and m["DataFormatId"] == m["UOM_ID"]

    rc = SS.build_related_charts(ind)
    r = rc.filter(F.col("IndicatorId") == 1).first()
    # generic code wildcards the 2nd-to-last COORDINATE element (3rd-
    # from-last of the full code, reference dfhandler.py:637-644): the
    # group is {same owner-status, same date} over property types —
    # coords 1.1 and 2.1 @ 2018 = indicator ids 1 and 7
    assert r["RelatedIndicatorIds"].split(",") == ["1", "7"]
    # reference dfhandler.py:502-510: titles = LAST member, aliases =
    # UOM text, DataFormatId = UOM id, default related chart type
    assert r["ChartTitle_EN"] == "Owner" and r["ChartTitle_FR"] == "Propriétaire"
    assert r["FieldAlias_EN"] == "Number" and r["DataFormatId"] == 229
    assert r["ChartTypeId"] == SS.CHART_DEFAULTS["RelatedChartTypeId"]

    # PrimaryQuery view: indicator 4 = coord 2.1? find the 2019 null row's
    # indicator to check symbol formatting; use indicator of 1.1@2018
    pq = SS.primary_query(
        1, lookups["geo_ref"], grb, lookups["geo_level"], glb, vals, ind,
        lookups["null_reason"],
    )
    prow = pq.collect()
    assert len(prow) == 1
    assert prow[0]["GeographyName"] == "Canada"
    assert prow[0]["FormattedValue"] == "10.5"
    assert prow[0]["Shape"] == "POLYGON((0 0))"

    # null-value indicator formats the symbol instead
    null_ind = ind.filter(F.col("IndicatorCode") == "35100177.2.2.2019-01-01").first()
    pq2 = SS.primary_query(
        null_ind["IndicatorId"], lookups["geo_ref"], grb, lookups["geo_level"], glb,
        vals, ind, lookups["null_reason"],
    )
    assert [r["FormattedValue"] for r in pq2.collect()] == ["x"]

    # RelatedCharts view at one geography
    rq = SS.related_charts_query(
        1, rc, vals, grb, ind, lookups["null_reason"], dguid="2016A000011124"
    )
    got = {r["IndicatorId"]: r["FormattedValue"] for r in rq.collect()}
    assert got == {1: "10.5"}  # related id 7 has no value at this geo


def test_conform_schema_and_truncation(spark):
    from geo_explorer_etl_spark.plans.schemas import conform, schema_of

    df = spark.createDataFrame(
        [(1, "x" * 500, None, 5, "EXTRA")],
        "IndicatorThemeId long, IndicatorTheme_EN string, IndicatorTheme_FR string, "
        "ParentThemeId int, junk string",
    )
    out = conform(df, "IndicatorTheme")
    assert out.schema == schema_of("IndicatorTheme")
    row = out.first()
    assert len(row["IndicatorTheme_EN"]) == 400      # F11 truncation
    assert row["IndicatorTheme_FR"] is None          # missing -> typed null
    assert "junk" not in out.columns                 # extras dropped
    assert row["ParentThemeId"] == 5                 # int -> long cast


def test_repair_dguids_gated_on_subject_35():
    # Reference dfhandler.py:601: fix_dguid runs for EVERY subject-35
    # product (first 2 digits), not only the mixed-geo list.
    assert ProductPolicy(product_id=35100005).repair_dguids          # justice, not mixed-geo
    assert ProductPolicy(product_id=35100177, mixed_geo=True).repair_dguids
    assert not ProductPolicy(product_id=46100027).repair_dguids      # non-justice


def test_mixed_geo_pid_list_matches_reference():
    from geo_explorer_etl_spark.plans.pipeline import MIXED_GEO_PIDS

    # reference main.py:20 lists exactly these four master pids
    assert MIXED_GEO_PIDS == {35100177, 35100002, 35100026, 35100068}


def test_indicator_fanout_respects_min_ref_year(spark, members, lookups, metadata):
    # Non-mixed-geo products drop pre-min-ref-year dates at the fan-out
    # (reference copy_data_frames_for_date_range, dfhandler.py:562-580)
    ref_dates = SS.build_reference_dates(spark, metadata.first().asDict())
    pol = ProductPolicy(product_id=PID, min_ref_year=2019, mixed_geo=False)
    ind = SS.build_indicators(members, ref_dates, lookups["uom"], PID, policy=pol)
    years = {r["ReferencePeriod"].year for r in ind.select("ReferencePeriod").collect()}
    assert years == {2019, 2020}
    # mixed-geo products keep every date
    pol_mixed = ProductPolicy(product_id=PID, min_ref_year=2019, mixed_geo=True)
    ind_mixed = SS.build_indicators(members, ref_dates, lookups["uom"], PID, policy=pol_mixed)
    assert ind_mixed.count() == 12


def test_theme_hierarchy_with_full_subject_code(spark, lookups):
    # subjectCode "3510" (4-digit): product -> 3510 -> 35, with dummy
    # selector rows under both levels (reference dfhandler.py:392-411)
    md = spark.createDataFrame(
        [(35100177, "Police personnel", "Personnel policier", ["3510"], ["3302"])],
        "productId long, cubeTitleEn string, cubeTitleFr string, "
        "subjectCode array<string>, surveyCode array<string>",
    )
    by_id = {
        r["IndicatorThemeId"]: r
        for r in SS.build_indicator_theme(md, lookups["subjects"]).collect()
    }
    assert by_id[35100177]["ParentThemeId"] == 3510
    assert by_id[35100177]["StatisticsProgramId"] == 3302
    assert by_id[3510]["ParentThemeId"] == 35
    # L2/F9: the 4-digit ancestor carries the code set's description
    # with everything before the first "/" stripped (reference
    # dfhandler.py:394-405, helpers.py:116-121)
    assert by_id[3510]["IndicatorTheme_EN"] == "Crimes and offences"
    assert by_id[3510]["IndicatorTheme_FR"] == "Crimes et infractions"
    assert by_id[35109999]["IndicatorTheme_EN"] == "*...Select a Product"
    assert by_id[35109999]["ParentThemeId"] == 3510
    assert by_id[359999]["ParentThemeId"] == 35
    assert by_id[35]["ParentThemeId"] is None


def test_theme_absent_subject_code_yields_null(spark, lookups):
    # reference get_subject_desc_from_code_set returns None when the
    # code is missing from the set (helpers.py:129-142) — no literal
    # "Unknown subject" substitute
    md = spark.createDataFrame(
        [(44100001, "Some cube", "Un cube", ["4410"], ["9999"])],
        "productId long, cubeTitleEn string, cubeTitleFr string, "
        "subjectCode array<string>, surveyCode array<string>",
    )
    by_id = {
        r["IndicatorThemeId"]: r
        for r in SS.build_indicator_theme(md, lookups["subjects"]).collect()
    }
    assert by_id[4410]["IndicatorTheme_EN"] is None
    assert by_id[44]["IndicatorTheme_FR"] is None
