"""Core operator catalog — reference-parity queries (SURVEY.md §2)
expressed over the TPC-H-ish testdata, each with a DuckDB oracle.

The TPC-H tables play the reference's roles (FIXTURES.md §C):
``lineitem``/``orders`` = the fact cube / IndicatorValues;
``customer``/``nation``/``region``/``supplier``/``part`` = the small
broadcast lookups (GeographyReference, code sets); ``events`` = the
incremental feed.

Plan-shape invariants (checked in tests/test_plans.py):
- every lookup join is a BroadcastHashJoin (no fact shuffle);
- scans show pushed filters / pruned schemas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from geo_explorer_etl_spark.functions import (
    date_series,
    dguid_geo_level,
    dguid_repair,
    generic_wildcard_code,
    html_member_list,
    nth_delimited,
    ordinal_prefix,
    ref_year_normalize,
    strip_coordinate_geography,
    strip_sort_prefix,
    substring_after_first,
    truncate_for_column,
    vector_id,
    year_to_jan1,
)
from geo_explorer_etl_spark.operators import joins as J
from geo_explorer_etl_spark.operators import windows as W
from geo_explorer_etl_spark.plans.registry import register
from geo_explorer_etl_spark.session import load_tables


def _t(spark: SparkSession, sf_dir: str, *names: str):
    return load_tables(spark, sf_dir, *names)


# ---------------------------------------------------------------------------
# Null-reason lookup: the reference's IndicatorNullReason table
# (scdb.py:139–143) recreated as a literal broadcast frame; the oracle
# uses an equivalent VALUES clause.
# ---------------------------------------------------------------------------
_NULL_REASONS = [("A", "suppressed"), ("N", "not available"), ("R", "revised")]
def _null_reason_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_NULL_REASONS, "symbol string, reason string")


# ---------------------------------------------------------------------------
# Flagship — the generated PrimaryQuery shape (SURVEY.md §2.14,
# reference dfhandler.py:345–363): fact ⋈ 5 lookups (all broadcast)
# ⟕ null-reason, with the null-display CASE. The "indicator value" is
# discounted price, nulled when quantity > 45 to exercise the NULL arm
# (the reference's STATUS-symbol path).
# ---------------------------------------------------------------------------
@register(
    "flagship_primary_query",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           r.r_name AS region_name, n.n_name AS nation_name,
           c.c_name AS customer_name, s.s_name AS supplier_name,
           floor((CASE WHEN l.l_quantity > 45 THEN NULL
                  ELSE l.l_extendedprice * (1 - l.l_discount) END) * 100 + 0.5) / 100
             AS ind_value,
           CASE WHEN l.l_quantity > 45 THEN nr.reason
                ELSE CAST(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 0) AS BIGINT) AS VARCHAR)
           END AS display_value
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    LEFT JOIN (VALUES ('A','suppressed'),('N','not available'),('R','revised'))
         AS nr(symbol, reason) ON l.l_returnflag = nr.symbol
    WHERE r.r_name = 'ASIA' AND o.o_orderdate < TIMESTAMP '1997-01-01'
    """,
    tags="flagship J1 J2 M5 P1",
)
def flagship_primary_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "orders", "customer", "nation", "region", "supplier")
    li, o, c, n, r, s = (
        t["lineitem"], t["orders"], t["customer"], t["nation"], t["region"], t["supplier"],
    )
    nr = _null_reason_df(spark)
    value = F.when(F.col("l_quantity") > 45, F.lit(None).cast("double")).otherwise(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    out = (
        li.join(o.filter(F.col("o_orderdate") < "1997-01-01"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .join(F.broadcast(nr), li.l_returnflag == nr.symbol, "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            F.col("c_name").alias("customer_name"),
            F.col("s_name").alias("supplier_name"),
            # floor(x*100+0.5)/100 instead of round(x, 2): both engines
            # then execute the identical IEEE ops, so no half-boundary
            # disagreements (Spark rounds via BigDecimal, DuckDB doesn't).
            (F.floor(value * 100 + F.lit(0.5)) / 100).alias("ind_value"),
            F.when(F.col("l_quantity") > 45, F.col("reason"))
            .otherwise(F.round(value, 0).cast("long").cast("string"))
            .alias("display_value"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# A* — aggregation suite (TPC-H Q1 shape: the engine's headline agg).
# The reference itself never aggregates values (SURVEY.md §2.4), but the
# engine must: partial/final hash aggregation, map-side combine.
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags="A2 A4 agg",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "2000-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "a_group_max_distinct",
    oracle="""
    SELECT o_orderpriority,
           MAX(o_totalprice) AS max_price,
           MIN(o_totalprice) AS min_price,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    tags="A1 A2 A5",
)
def a_group_max_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "a6_distinct_years",
    oracle="""
    SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS ref_year FROM orders
    """,
    tags="A6 D",
)
def a6_distinct_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    return o.select(F.year("o_orderdate").cast("long").alias("ref_year")).distinct()


# ---------------------------------------------------------------------------
# J* — joins
# ---------------------------------------------------------------------------
@register(
    "j7_anti_new_members",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 4000)
    """,
    tags="J7 anti",
)
def j7_anti_new_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders", "customer")
    existing = t["customer"].filter(F.col("c_acctbal") > 4000).select(
        F.col("c_custkey").alias("o_custkey")
    )
    return J.anti_new_rows(t["orders"], existing, ["o_custkey"]).select(
        "o_orderkey", "o_custkey"
    )


@register(
    "j8_anti_composite_key",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem l
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem e
        WHERE e.l_shipdate < TIMESTAMP '1997-01-01'
          AND e.l_orderkey = l.l_orderkey AND e.l_linenumber = l.l_linenumber)
    """,
    tags="J8 anti I3",
)
def j8_anti_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    existing = li.filter(F.col("l_shipdate") < "1997-01-01")
    # fact-vs-fact: the existing side is ~86% of lineitem — force-
    # broadcasting it was the highest-exponent shape in the scale
    # sweep; shuffle-anti (AQE may still downgrade to broadcast when
    # small) is the 100 TB plan
    return J.anti_new_rows(
        li, existing, ["l_orderkey", "l_linenumber"], broadcast_state=False
    ).select("l_orderkey", "l_linenumber")


@register(
    "j11_semi_product_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags="J11 semi",
)
def j11_semi_product_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders", "customer")
    ids = t["orders"].select(F.col("o_custkey").alias("c_custkey"))
    # the probing id set comes from the ORDERS fact table — fact-sized,
    # so no broadcast hint (AQE downgrades at runtime if it shrinks)
    return J.semi_exists(
        t["customer"], ids, "c_custkey", broadcast_ids=False
    ).select("c_custkey", "c_name")


@register(
    "j12_orphan_validation",
    oracle="""
    SELECT DISTINCT l_suppkey AS orphan_key FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM supplier s
                      WHERE s.s_acctbal > 0 AND s.s_suppkey = l.l_suppkey)
    """,
    tags="J12 anti validation",
)
def j12_orphan_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "supplier")
    known = t["supplier"].filter(F.col("s_acctbal") > 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    _, orphans = J.inner_with_orphans(
        t["lineitem"].select("l_suppkey"), known.withColumnRenamed("l_suppkey", "k"),
        "l_suppkey", "k",
    )
    return orphans.withColumnRenamed("l_suppkey", "orphan_key")


@register(
    "j13_member_cross_product",
    oracle="""
    SELECT concat_ws('.', seg.id, st.id, fl.id) AS coordinate,
           concat_ws(' _ ', seg.nm, st.nm, fl.nm) AS member_names
    FROM (SELECT DISTINCT c_mktsegment AS id, lower(c_mktsegment) AS nm FROM customer) seg
    CROSS JOIN (SELECT DISTINCT o_orderstatus AS id, lower(o_orderstatus) AS nm FROM orders) st
    CROSS JOIN (SELECT DISTINCT l_returnflag AS id, lower(l_returnflag) AS nm FROM lineitem) fl
    """,
    tags="J13 cross",
)
def j13_member_cross_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    dims = [
        t["customer"].select(F.col("c_mktsegment").alias("member_id")).distinct()
        .withColumn("member_name", F.lower("member_id")),
        t["orders"].select(F.col("o_orderstatus").alias("member_id")).distinct()
        .withColumn("member_name", F.lower("member_id")),
        t["lineitem"].select(F.col("l_returnflag").alias("member_id")).distinct()
        .withColumn("member_name", F.lower("member_id")),
    ]
    return J.member_cross_product(dims).select("coordinate", "member_names")


@register(
    "j14_date_fanout",
    oracle="""
    SELECT seg.c_mktsegment, CAST(d.d AS DATE) AS ref_date
    FROM (SELECT DISTINCT c_mktsegment FROM customer) seg
    CROSS JOIN (SELECT unnest(generate_series(DATE '2020-01-01', DATE '2020-12-01',
                                              INTERVAL 1 MONTH)) AS d) d
    """,
    tags="J14 D1 cross",
)
def j14_date_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")["customer"]
    dates = spark.range(1).select(
        F.explode(
            date_series(F.lit("2020-01-01"), F.lit("2020-12-01"), freq_code=6)
        ).alias("ref_date")
    )
    segs = c.select("c_mktsegment").distinct()
    return J.date_fanout(segs, dates)


@register(
    "j15_related_topk_csv",
    oracle="""
    SELECT p_brand,
           array_to_string(
             (list(CAST(p_partkey AS VARCHAR) ORDER BY p_partkey))[1:10],
             ',') AS related_ids
    FROM part GROUP BY p_brand
    """,
    tags="J15 O3 agg",
)
def j15_related_topk_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")["part"]
    return J.related_topk_csv(p, "p_brand", "p_partkey", k=10)


# ---------------------------------------------------------------------------
# W*/O* — windows, ids, top-k
# ---------------------------------------------------------------------------
@register(
    "w1_sequential_ids",
    oracle="""
    SELECT o_orderkey,
           ROW_NUMBER() OVER (ORDER BY o_orderkey) + 1000 AS indicator_id
    FROM orders
    """,
    tags="W1 ids",
)
def w1_sequential_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    return W.sequential_ids(o, ["o_orderkey"], id_col="indicator_id", offset=1000).select(
        "o_orderkey", "indicator_id"
    )


@register(
    "w2_group_ordinal_display",
    oracle="""
    SELECT n_name,
           lpad(CAST(ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_name)
                AS VARCHAR), 2, '0') || '. ' || n_name AS display_name
    FROM nation
    """,
    tags="W2 A3 F10",
)
def w2_group_ordinal_display(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")["nation"]
    ranked = W.group_ordinal(n, ["n_regionkey"], ["n_name"], out_col="ord")
    return ranked.select(
        "n_name",
        F.concat(ordinal_prefix(F.col("ord")), F.col("n_name")).alias("display_name"),
    )


@register(
    "w3_keep_first_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey AS first_orderkey FROM (
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders) WHERE rn = 1
    """,
    tags="W3 J10 dedup",
)
def w3_keep_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    return J.keep_first_per_key(o, "o_custkey", ["o_orderdate", "o_orderkey"]).select(
        "o_custkey", F.col("o_orderkey").alias("first_orderkey")
    )


@register(
    "o3_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) WHERE rn <= 5
    """,
    tags="O3 topk",
)
def o3_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    return W.topk_per_group(
        o, ["o_orderpriority"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], k=5
    ).select("o_orderpriority", "o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# U* — set ops: union of derived rows with literal rows (the reference
# appends synthesized subject-code theme rows, dfhandler.py:392–411).
# ---------------------------------------------------------------------------
@register(
    "u2_union_literal_rows",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS theme_id, n_name AS theme_name FROM nation
    UNION ALL
    SELECT * FROM (VALUES (CAST(9900 AS BIGINT), 'SYNTH-SUBJECT-99'),
                          (CAST(9999 AS BIGINT), 'SYNTH-SUBJECT-9999')) t(theme_id, theme_name)
    """,
    tags="U2 union",
)
def u2_union_literal_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")["nation"]
    base = n.select(
        F.col("n_nationkey").cast("long").alias("theme_id"),
        F.col("n_name").alias("theme_name"),
    )
    synth = spark.createDataFrame(
        [(9900, "SYNTH-SUBJECT-99"), (9999, "SYNTH-SUBJECT-9999")],
        "theme_id long, theme_name string",
    )
    return base.unionByName(synth)


# ---------------------------------------------------------------------------
# F* — string scalar suite. Synthetic DGUID/coordinate/vector inputs are
# derived deterministically from part/lineitem columns, then every F*
# operator is applied; the oracle mirrors each expression.
# ---------------------------------------------------------------------------
@register(
    "f_scalar_string_suite",
    oracle="""
    WITH src AS (
        SELECT *,
               p_name || ' _ ' || p_brand || ' _ ' || p_type AS names,
               CASE p_partkey % 3
                    WHEN 0 THEN 'nan nan ' || CAST(p_size AS VARCHAR) || '.0'
                    WHEN 1 THEN CAST(p_size AS VARCHAR)
                    ELSE 'nan nan'
               END AS combo
        FROM part)
    SELECT p_partkey,
           regexp_replace(regexp_replace('0' || CAST(p_partkey % 100 AS VARCHAR) || '. ' || p_name,
                          '^(\\d{1,3}|0\\d{3})\\.', ''), '^\\s+', '') AS clean_name,
           regexp_replace(CAST(p_partkey AS VARCHAR) || '.2.3', '^[^.]+\\.', '') AS coord_tail,
           regexp_replace('S050' || CAST(p_partkey % 7 AS VARCHAR),
                          'S0504|S0505|S0506', 'S0503', 'g') AS level_recoded,
           substr('2016A' || lpad(CAST(p_partkey AS VARCHAR), 8, '0'), 5, 5) AS geo_level,
           CAST(regexp_replace('v' || CAST(p_partkey AS VARCHAR), '^v', '') AS INTEGER) AS vector_id,
           substr(p_name, 1, 5) AS name_trunc,
           lower(p_brand) AS brand_key,
           trim('  ' || p_type || ' ') AS type_trim,
           regexp_replace(p_type || '/EXTRA', '^[^/]*/', '') AS after_slash,
           CAST(p_partkey AS VARCHAR) || '.' || p_brand || '.' || p_type AS composite_code,
           '<ul><li>' || CAST(2020 AS VARCHAR) || '<li>' ||
             regexp_replace(names, ' _ ', '<li>', 'g') || '</li></ul>' AS indicator_display,
           string_split(names, ' _ ')[-1] AS short_name,
           string_split(names, ' _ ')[-2] AS legend_member,
           combo,
           CAST(CASE WHEN combo = 'nan nan' THEN NULL
                ELSE CAST(string_split_regex(combo, '\\s+')[-1] AS DOUBLE) END
           AS SMALLINT) AS uom_id
    FROM src
    """,
    tags="F1 F2 F3 F6 F7 F8 F9 F11 F12 F13 F14 F15 M1",
)
def f_scalar_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every row-local F* string operator plus the F7/F8 display-string
    builders and the M1 UOM extraction, applied to the same ``part``
    scan. (F7/F8 and M1 were standalone catalog entries through round
    2 — folded in here so the registry fits the driver's 50-entry
    correctness window without losing any operator's oracle check.)"""
    from geo_explorer_etl_spark.functions import uom_from_combo

    p = _t(spark, sf_dir, "part")["part"]
    pk = F.col("p_partkey")
    prefixed = F.concat(F.lit("0"), (pk % 100).cast("string"), F.lit(". "), F.col("p_name"))
    coord = F.concat(pk.cast("string"), F.lit(".2.3"))
    level = F.concat(F.lit("S050"), (pk % 7).cast("string"))
    dguid = F.concat(F.lit("2016A"), F.lpad(pk.cast("string"), 8, "0"))
    names = F.concat_ws(" _ ", F.col("p_name"), F.col("p_brand"), F.col("p_type"))
    combo = (
        F.when(pk % 3 == 0, F.concat(F.lit("nan nan "), F.col("p_size").cast("string"), F.lit(".0")))
        .when(pk % 3 == 1, F.col("p_size").cast("string"))
        .otherwise(F.lit("nan nan"))
    )
    return p.select(
        pk.alias("p_partkey"),
        strip_sort_prefix(prefixed).alias("clean_name"),
        strip_coordinate_geography(coord).alias("coord_tail"),
        F.regexp_replace(level, "S0504|S0505|S0506", "S0503").alias("level_recoded"),
        dguid_geo_level(dguid).alias("geo_level"),
        vector_id(F.concat(F.lit("v"), pk.cast("string"))).alias("vector_id"),
        truncate_for_column(F.col("p_name"), 5).alias("name_trunc"),
        F.lower("p_brand").alias("brand_key"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("type_trim"),
        substring_after_first(F.concat(F.col("p_type"), F.lit("/EXTRA")), "/").alias("after_slash"),
        F.concat_ws(".", pk.cast("string"), F.col("p_brand"), F.col("p_type")).alias("composite_code"),
        html_member_list(F.lit(2020), names).alias("indicator_display"),
        nth_delimited(names, -1).alias("short_name"),
        nth_delimited(names, -2).alias("legend_member"),
        combo.alias("combo"),
        uom_from_combo(combo).alias("uom_id"),
    )


@register(
    "f5_dguid_repair_chain",
    oracle="""
    WITH src AS (
        SELECT o_orderkey,
               CASE o_orderkey % 6
                    WHEN 0 THEN lpad(CAST(o_custkey AS VARCHAR), 4, '0')
                    WHEN 1 THEN '2011B' || lpad(CAST(o_custkey AS VARCHAR), 8, '0')
                    WHEN 2 THEN '2011S05031' || lpad(CAST(o_custkey AS VARCHAR), 2, '0')
                    WHEN 3 THEN '2011S0503' || lpad(CAST(o_custkey AS VARCHAR), 3, '0')
                    WHEN 4 THEN '2011S0503522'
                    ELSE '2011S0503810'
               END AS dguid,
               CAST(2014 + o_orderkey % 4 AS INTEGER) AS ref_year
        FROM orders),
    s1 AS (
        SELECT o_orderkey, ref_year,
               CASE WHEN length(dguid) < 10 THEN
                    (CASE WHEN ref_year < 2016 THEN '2016'
                          ELSE CAST(ref_year AS VARCHAR) END) || 'A0025' || dguid
                    ELSE dguid END AS d
        FROM src),
    s3 AS (
        SELECT o_orderkey, ref_year,
               replace(replace(d, '2011B', '2011S'),
                       '2011S05031', '2011S0503001') AS d
        FROM s1),
    s4 AS (
        SELECT o_orderkey, ref_year,
               CASE WHEN ref_year >= 2016
                    THEN replace(d, '2011S0503', CAST(ref_year AS VARCHAR) || 'S0503')
                    ELSE d END AS d
        FROM s3)
    SELECT o_orderkey,
           replace(replace(d, '2011S0503522', '2011S0504522'),
                   '2011S0503810', '2011S0504810') AS dguid_fixed
    FROM s4
    """,
    tags="F5 F4 when-chain",
)
def f5_dguid_repair_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six fix_dguid rules (reference dfhandler.py:597–617): short
    prepend, 2011B schema typo, St. John's, conditional CMA vintage
    rewrite, Belleville, Lethbridge — over ref years 2014–2017 so both
    the <2016 and >=2016 arms of rules 1 and 4 are exercised."""
    o = _t(spark, sf_dir, "orders")["orders"]
    k = F.col("o_orderkey")
    ck = F.col("o_custkey").cast("string")
    dguid = (
        F.when(k % 6 == 0, F.lpad(ck, 4, "0"))
        .when(k % 6 == 1, F.concat(F.lit("2011B"), F.lpad(ck, 8, "0")))
        .when(k % 6 == 2, F.concat(F.lit("2011S05031"), F.lpad(ck, 2, "0")))
        .when(k % 6 == 3, F.concat(F.lit("2011S0503"), F.lpad(ck, 3, "0")))
        .when(k % 6 == 4, F.lit("2011S0503522"))
        .otherwise(F.lit("2011S0503810"))
    )
    ref_year = (F.lit(2014) + (k % 4)).cast("int")
    return o.select(
        "o_orderkey",
        dguid_repair(dguid, ref_year).alias("dguid_fixed"),
    )


@register(
    "f16_generic_wildcard",
    oracle="""
    WITH src AS (SELECT l_orderkey, l_linenumber,
                        CASE WHEN l_linenumber % 2 = 0
                             THEN CAST(l_orderkey AS VARCHAR) || '.' || CAST(l_partkey AS VARCHAR)
                                  || '.' || CAST(l_suppkey AS VARCHAR)
                                  || '.' || CAST(l_linenumber AS VARCHAR) || '.2020-01-01'
                             ELSE CAST(l_orderkey AS VARCHAR) || '.' || CAST(l_partkey AS VARCHAR)
                                  || '.2020-01-01'
                        END AS code
                 FROM lineitem),
    parts AS (SELECT l_orderkey, l_linenumber, string_split(code, '.') AS p FROM src)
    SELECT l_orderkey, l_linenumber,
           CASE WHEN len(p) > 3
                THEN array_to_string(
                       list_concat(list_append(p[1:len(p) - 3], '%'), p[-2:]), '.')
                ELSE NULL END AS generic_code
    FROM parts
    """,
    tags="F16 J15",
)
def f16_generic_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference set_generic_indicator_code semantics: wildcard the
    third-from-last element of the full IndicatorCode, keep the last
    two; codes with <= 3 elements (odd lines here) yield null."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    long_code = F.concat_ws(
        ".",
        F.col("l_orderkey").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.lit("2020-01-01"),
    )
    short_code = F.concat_ws(
        ".",
        F.col("l_orderkey").cast("string"),
        F.col("l_partkey").cast("string"),
        F.lit("2020-01-01"),
    )
    code = F.when(F.col("l_linenumber") % 2 == 0, long_code).otherwise(short_code)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        generic_wildcard_code(code).alias("generic_code"),
    )


# ---------------------------------------------------------------------------
# D* — date scalar suite
# ---------------------------------------------------------------------------
@register(
    "d1_freq_date_series",
    oracle="""
    SELECT 6 AS freq_code, CAST(unnest(generate_series(DATE '2020-01-01', DATE '2021-12-31',
                                       INTERVAL 1 MONTH)) AS DATE) AS ref_date
    UNION ALL
    SELECT 9, CAST(unnest(generate_series(DATE '2020-01-01', DATE '2021-12-31',
                          INTERVAL 3 MONTH)) AS DATE)
    UNION ALL
    SELECT 12, CAST(unnest(generate_series(DATE '2020-01-01', DATE '2021-12-31',
                           INTERVAL 1 YEAR)) AS DATE)
    -- occasional codes map to annual/quarterly/monthly (reference
    -- helpers.py:31-34), and a mid-period start snaps UP to the next
    -- anchor like pandas date_range (2020-07-15 -> first Jan-1 /
    -- quarter-start / month-start / Sunday on or after it)
    UNION ALL
    SELECT 18, CAST(unnest(generate_series(DATE '2021-01-01', DATE '2023-12-31',
                           INTERVAL 1 YEAR)) AS DATE)
    UNION ALL
    SELECT 19, CAST(unnest(generate_series(DATE '2020-10-01', DATE '2021-06-30',
                           INTERVAL 3 MONTH)) AS DATE)
    UNION ALL
    SELECT 20, CAST(unnest(generate_series(DATE '2020-08-01', DATE '2020-12-31',
                           INTERVAL 1 MONTH)) AS DATE)
    UNION ALL
    SELECT 2, CAST(unnest(generate_series(DATE '2020-07-19', DATE '2020-09-01',
                          INTERVAL 7 DAY)) AS DATE)
    UNION ALL
    SELECT 4, CAST(unnest(generate_series(DATE '2020-07-19', DATE '2020-09-01',
                          INTERVAL 14 DAY)) AS DATE)
    -- D4 day-range iterator (reference helpers.py:69-75), tagged as
    -- pseudo-code 1; standalone d4_day_series entry through round 2,
    -- folded in so the registry fits the driver's 50-entry window.
    UNION ALL
    SELECT 1, CAST(unnest(generate_series(DATE '2024-02-26', DATE '2024-03-03',
                          INTERVAL 1 DAY)) AS DATE)
    """,
    tags="D1 D4",
)
def d1_freq_date_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    cases = [
        (6, "2020-01-01", "2021-12-31"),
        (9, "2020-01-01", "2021-12-31"),
        (12, "2020-01-01", "2021-12-31"),
        (18, "2020-07-15", "2023-12-31"),   # occasional -> annual, snapped
        (19, "2020-07-15", "2021-06-30"),   # occasional quarterly, snapped
        (20, "2020-07-15", "2020-12-31"),   # occasional monthly, snapped
        (2, "2020-07-15", "2020-09-01"),    # weekly -> Sundays
        (4, "2020-07-15", "2020-09-01"),    # biweekly -> Sundays
    ]
    frames = []
    for code, start, end in cases:
        frames.append(
            spark.range(1).select(
                F.lit(code).cast("int").alias("freq_code"),
                F.explode(
                    date_series(F.lit(start), F.lit(end), freq_code=code)
                ).alias("ref_date"),
            )
        )
    from geo_explorer_etl_spark.functions.dates import day_series_df

    frames.append(
        day_series_df(spark, "2024-02-26", "2024-03-03").select(
            F.lit(1).cast("int").alias("freq_code"), F.col("day").alias("ref_date")
        )
    )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


@register(
    "d2_ref_year_normalize",
    oracle="""
    WITH src AS (
        SELECT o_orderkey, o_orderdate, CAST(year(o_orderdate) AS INTEGER) AS y,
               CASE o_orderkey % 4
                    WHEN 0 THEN CAST(year(o_orderdate) AS VARCHAR)
                    WHEN 1 THEN CAST(year(o_orderdate) AS VARCHAR) || '/'
                         || lpad(CAST((year(o_orderdate) + 1) % 100 AS VARCHAR), 2, '0')
                    WHEN 2 THEN CAST(year(o_orderdate) AS VARCHAR) || '/'
                         || CAST(year(o_orderdate) + 1 AS VARCHAR)
                    ELSE 'bogus'
               END AS ref_date
        FROM orders)
    SELECT o_orderkey, ref_date,
           CAST(CASE WHEN length(ref_date) = 4 THEN ref_date
                 WHEN length(ref_date) = 7 THEN substr(ref_date, 1, 2) || substr(ref_date, 6, 2)
                 WHEN length(ref_date) = 9 THEN substr(ref_date, 6, 4)
                 ELSE '1900' END AS INTEGER) AS ref_year,
           CAST(make_date(CAST(CASE WHEN length(ref_date) = 4 THEN ref_date
                 WHEN length(ref_date) = 7 THEN substr(ref_date, 1, 2) || substr(ref_date, 6, 2)
                 WHEN length(ref_date) = 9 THEN substr(ref_date, 6, 4)
                 ELSE '1900' END AS INTEGER), 1, 1) AS DATE) AS reference_period,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_date,
           strftime(o_orderdate, '%Y-%m') AS year_month
    FROM src
    """,
    tags="D2 D3 D5",
)
def d2_ref_year_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2/D3 REF_DATE-string normalization plus the D5 display formats
    (standalone ``d5_date_format`` entry through round 2 — folded in
    so the registry fits the driver's 50-entry window)."""
    o = _t(spark, sf_dir, "orders")["orders"]
    k = F.col("o_orderkey")
    y = F.year("o_orderdate").cast("int")
    ref_date = (
        F.when(k % 4 == 0, y.cast("string"))
        .when(k % 4 == 1, F.concat(y.cast("string"), F.lit("/"), F.lpad(((y + 1) % 100).cast("string"), 2, "0")))
        .when(k % 4 == 2, F.concat(y.cast("string"), F.lit("/"), (y + 1).cast("string")))
        .otherwise(F.lit("bogus"))
    )
    ry = ref_year_normalize(F.col("ref_date"))
    return o.select("o_orderkey", "o_orderdate", ref_date.alias("ref_date")).select(
        "o_orderkey",
        "ref_date",
        ry.alias("ref_year"),
        year_to_jan1(ry).alias("reference_period"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_date"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
    )


# ---------------------------------------------------------------------------
# M* — null handling / CASE display
# ---------------------------------------------------------------------------
# (The former m3_coalesce_defaults registry slot now carries the
# store-lifecycle oracle below — VERDICT r6 directive #5. M3/M4
# COALESCE/CASE semantics stay pinned by tests/test_functions.py over
# functions/nulls.py and by the l1_l4/m5/f_scalar catalog entries.)

#: Bucket boundaries for the mvp percentile leg — shared literal
#: between the Spark matview (hist_bins) and the DuckDB rebuild.
_MVP_BOUNDS = [
    1000.0, 2000.0, 5000.0, 10000.0, 20000.0,
    50000.0, 100000.0, 200000.0, 400000.0, 800000.0,
]
_MVP_Q = 0.9


def _mvp_leg_sql() -> str:
    """DuckDB rebuild of the percentile matview's estimator — the
    bucket-count histogram (one CASE-sum per boundary), the rank
    r = max(1, ceil(q*n)), the cumulative walk to the bucket holding
    r, and the SAME interpolation arithmetic ``lo + span * ((r -
    prev) / c)`` the engine computes in ``matview._hist_est`` — so a
    mis-netted histogram slot, a wrong rank rule, or an off-by-one
    bucket boundary all break the value hash."""
    bs = _MVP_BOUNDS
    k = len(bs)
    idx = " + ".join(
        f"CASE WHEN price > {b!r} THEN 1 ELSE 0 END" for b in bs
    )
    bounds_rows = ", ".join(
        f"({i}, {bs[i - 1]!r}, {bs[i] - bs[i - 1]!r})" for i in range(1, k)
    )
    return f"""
    UNION ALL
    -- driven from the GROUP list (cg), LEFT-joined to the non-NULL
    -- price histogram walk (sel): a status group whose prices are all
    -- NULL still emits its row, with a NULL estimate — the matview's
    -- NULL-estimate-on-empty-histogram contract (ADVICE r13 #2)
    SELECT 'mvp', cg.cnt, cg.status,
           ROUND(CASE WHEN sel.bidx = 0 THEN {bs[0]!r}
                      WHEN sel.bidx = {k} THEN {bs[-1]!r}
                      ELSE bb.lo + bb.span *
                           (CAST(sel.r - sel.prevc AS DOUBLE) /
                            CAST(sel.c AS DOUBLE))
                 END, 2)
    FROM (SELECT status, COUNT(*) AS cnt FROM v3state GROUP BY status) cg
    LEFT JOIN (
      SELECT status, bidx, c, cum, r, cum - c AS prevc,
             row_number() OVER (PARTITION BY status ORDER BY bidx) AS rn
      FROM (
        SELECT status, bidx, c,
               SUM(c) OVER (PARTITION BY status ORDER BY bidx) AS cum,
               GREATEST(1, CAST(CEIL({_MVP_Q!r} *
                   SUM(c) OVER (PARTITION BY status)) AS BIGINT)) AS r
        FROM (
          SELECT status, ({idx}) AS bidx, COUNT(*) AS c
          FROM v3state WHERE price IS NOT NULL
          GROUP BY status, 2
        )
      ) WHERE cum >= r
    ) sel ON sel.status = cg.status AND sel.rn = 1
    LEFT JOIN (VALUES {bounds_rows}) AS bb(bidx, lo, span)
           ON bb.bidx = sel.bidx
    """


@register(
    "store_merge_timetravel",
    oracle="""
    WITH v3state AS (
        SELECT o_orderkey, 'C2' AS status, o_totalprice * 3 AS price
        FROM orders WHERE o_orderkey % 100 >= 15 AND o_orderkey % 100 < 20
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 100 >= 20 AND o_orderkey % 100 < 50
          AND o_orderstatus <> 'P'
        UNION ALL
        SELECT o_orderkey, 'N', CAST(1.0 AS DOUBLE)
        FROM orders WHERE o_orderkey % 100 >= 95
    )
    SELECT 'v0' AS snap, o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS totalprice
    FROM orders WHERE o_orderkey % 100 < 50
    UNION ALL
    SELECT 'v1', o_orderkey, o_orderstatus, ROUND(o_totalprice, 2)
    FROM orders WHERE o_orderkey % 100 >= 10 AND o_orderkey % 100 < 50
    UNION ALL
    SELECT 'v1', o_orderkey, 'U', ROUND(o_totalprice * 2, 2)
    FROM orders WHERE o_orderkey % 100 < 10 OR o_orderkey % 100 >= 95
    UNION ALL
    SELECT 'v2', o_orderkey,
           CASE WHEN o_orderstatus = 'P' THEN 'P+' ELSE o_orderstatus END,
           ROUND(CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 0.5
                      ELSE o_totalprice END, 2)
    FROM orders WHERE o_orderkey % 100 >= 10 AND o_orderkey % 100 < 50
    UNION ALL
    SELECT 'v2cdf', o_orderkey,
           CASE WHEN o_orderstatus = 'P' THEN 'P+' ELSE o_orderstatus END,
           ROUND(CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 0.5
                      ELSE o_totalprice END, 2)
    FROM orders WHERE o_orderkey % 100 >= 10 AND o_orderkey % 100 < 50
    UNION ALL
    SELECT 'v3', o_orderkey, status, ROUND(price, 2) FROM v3state
    UNION ALL
    SELECT 'orq', o_orderkey, status, ROUND(price, 2) FROM v3state
    WHERE status = 'N' OR price > 100000.0
    UNION ALL
    SELECT 'likeq', o_orderkey, status, ROUND(price, 2) FROM v3state
    WHERE status LIKE 'C%' OR status LIKE '%F'
    UNION ALL
    SELECT 'parenq', o_orderkey, status, ROUND(price, 2) FROM v3state
    WHERE NOT ((status = 'C2' OR status = 'N') AND price < 100000.0)
    UNION ALL
    SELECT 'notq', o_orderkey, status, ROUND(price, 2) FROM v3state
    WHERE NOT (status LIKE 'C%') AND NOT (price = 1.0)
    UNION ALL
    SELECT 'mv', COUNT(*), status, ROUND(SUM(price), 2)
    FROM v3state GROUP BY status
    UNION ALL
    SELECT 'mvmax', COUNT(*), status, ROUND(MAX(price), 2)
    FROM v3state GROUP BY status
    UNION ALL
    SELECT 'mvb', COUNT(*), CAST(CAST(o_orderkey % 7 AS INTEGER) AS VARCHAR),
           ROUND(SUM(price * 2), 2)
    FROM v3state WHERE price > 1000 GROUP BY o_orderkey % 7
    UNION ALL
    SELECT 'mvbmax', COUNT(*), CAST(CAST(o_orderkey % 7 AS INTEGER) AS VARCHAR),
           ROUND(MAX(price), 2)
    FROM v3state WHERE price > 1000 GROUP BY o_orderkey % 7
    """ + _mvp_leg_sql(),
    tags="S11 I2 store merge update delete time-travel CDF matview percentile",
)
def store_merge_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TableStore lifecycle under the hard hash oracle: publish a
    base snapshot (replace_product_all's write-ahead txn), MERGE an
    upsert batch (updates double the price and flip the status;
    brand-new keys insert — round 8: the file-granularity
    copy-on-write path), then (round 10, VERDICT directive #1)
    UPDATE_WHERE with EXPRESSION-valued sets — the reference's manual
    script shape, ``SET IndicatorTheme_EN = CONCAT(...) WHERE ... IN``
    (sql_scripts/Housing - Manual Updates.sql:13–31) — appending '+'
    to 'P' and 'U' statuses and bumping their price, sparse 'P'
    matches riding DELETION VECTORS; then DELETE_WHERE the upserted
    rows back out BY THEIR UPDATED VALUE ('U+' — proving the delete
    reads through the update), reading the as-of snapshots — v0/v1
    via read_at time travel, v2 current — PLUS ``v2cdf``: the v2
    snapshot RECONSTRUCTED by replaying the change data feed over the
    v0 snapshot with ``apply_changes``. DuckDB recomputes each
    expected table from the same ``orders`` slices (v2cdf must equal
    v2 row-for-row), so a torn merge, a leaked pre-merge row, a wrong
    time-travel resolution, an update that transformed the wrong rows
    (or read post-update values into a SET expression), a delete that
    dropped/kept the wrong rows, or a change feed that mis-slices any
    commit's deltas (file-level OR deletion-vector positions) all
    break the value hash. Round 11 adds ``v3``: ONE op-typed CDC batch
    through the clause-MERGE grammar (``merge_apply`` — matched
    DELETE, matched UPDATE, NOT MATCHED INSERT, NOT MATCHED BY SOURCE
    DELETE in one atomic swap), served through the BATCH data source
    (``spark.read.format("store")``, sources/store_source.py) so both
    new surfaces sit under the same hash. Round 12 adds ``mv``/
    ``mvmax``: a MATERIALIZED AGGREGATE created at v2 and advanced
    through the clause-MERGE by ONE incremental refresh window
    (operators/matview.py) — DuckDB recomputes the expected GROUP BY
    from the v3 slices, so a mis-netted delta, a missed touched
    group, or a wrong min/max recompute under deletes breaks the
    value hash."""
    import tempfile
    import time

    from geo_explorer_etl_spark.sources.store import TableStore, apply_changes

    o = _t(spark, sf_dir, "orders")["orders"]
    key = F.col("o_orderkey") % 100
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    base = o.filter(key < 50).select(*cols)
    upsert = (
        o.filter((key < 10) | (key >= 95))
        .select(
            "o_orderkey",
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") * 2).alias("o_totalprice"),
        )
        .withColumn("IndicatorThemeId", F.lit(1).cast("long"))
    )
    store = TableStore(spark, tempfile.mkdtemp(prefix="store_mtt_"))
    store.replace_product_all(1, {"IndicatorValues": base})
    t0 = time.time()
    store.merge_rows("IndicatorValues", upsert, ["o_orderkey"])
    t1 = time.time()
    # one SQL-string set and one Column set, both evaluated against
    # the OLD row (the SQL UPDATE rule)
    store.update_where(
        "IndicatorValues",
        {
            "o_orderstatus": "CONCAT(o_orderstatus, '+')",
            "o_totalprice": F.col("o_totalprice") + 0.5,
        },
        [("o_orderstatus", "in", ("P", "U"))],
    )
    store.delete_where("IndicatorValues", [("o_orderstatus", "==", "U+")])
    # round 9: RENAME COLUMN under the same hash oracle — metadata-only
    # column mapping; v2 reads back through the mapping (physical name
    # unchanged in every file) while v0/v1 time-travel with the name
    # THEY declared. A mapping bug (wrong physical resolution, nulled
    # column, era mix-up) breaks the value hash.
    store.rename_column("IndicatorValues", "o_orderstatus", "status")

    def tagged(df: DataFrame, tag: str) -> DataFrame:
        col = "status" if "status" in df.columns else "o_orderstatus"
        return df.select(
            F.lit(tag).alias("snap"),
            "o_orderkey",
            F.col(col).alias("o_orderstatus"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )

    # CDF reconstruction: v0 + every post-t0 delta (merge's file-level
    # deltas, the update's and delete's deletion-vector position
    # slices) must reproduce the current snapshot exactly. Round 10
    # (VERDICT directive #4): the deltas are delivered THROUGH the
    # native streaming source — ``spark.readStream.format("store_cdf")``
    # availableNow into a memory sink, offsets/slices planned on the
    # driver and each slice materialized by EXECUTOR-side pyarrow (read →
    # position mask → physical→logical rename → schema align) — so the
    # one load-bearing store path that previously had no DuckDB hash
    # now sits under this entry's value hash. Pre-rename commits
    # stream under the CURRENT column name ('status'), aliased back
    # for the replay against the era-named v0 frame.
    import uuid

    from geo_explorer_etl_spark.streaming.cdf_source import (
        StoreChangeFeedDataSource,
    )

    spark.dataSource.register(StoreChangeFeedDataSource)
    sink = f"mtt_cdf_{uuid.uuid4().hex[:8]}"
    (
        spark.readStream.format("store_cdf")
        .option("path", store.root)
        .option("table", "IndicatorValues")
        .option("start_at", str(t0))
        .option("watermark_lag", "0.0")
        .load()
        .writeStream.format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    payload = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    # DROP the per-run memory-sink view so repeated bench invocations
    # don't accrete driver-held result tables (review r10 wave 8);
    # localCheckpoint first detaches the plan from the view — one
    # JVM-side materialization to executor storage, no row ever copied
    # through Python (review r10 wave 9 replaced a collect/recreate
    # round-trip that pickled the whole delta set twice)
    streamed_src = spark.table(sink).localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    streamed = streamed_src.select(
        "o_orderkey",
        F.col("status").alias("o_orderstatus"),
        "o_totalprice",
        "_change_type",
        "_committed_at",
    )
    v2cdf = apply_changes(
        store.read_at("IndicatorValues", t0).select(*payload), streamed
    )
    # v2 is served THROUGH THE BATCH DATA SOURCE (round 11, VERDICT
    # directive #1): spark.read.format("store") plans the snapshot
    # driver-side on StoreMeta and materializes files with EXECUTOR
    # pyarrow — deletion-vector masks from the update/delete, the
    # renamed column through the mapping, schema alignment — so the
    # query-time SQL serving path sits under this entry's value hash,
    # not just a row-count check.
    from geo_explorer_etl_spark.sources.store_source import register_store_source

    register_store_source(spark)
    # v2 pins its snapshot the classic way — store.read resolves the
    # manifest file list AT CALL TIME, so the frame stays v2 even
    # after the clause-MERGE below commits v3 (snapshot isolation)
    v2 = store.read("IndicatorValues")
    # Round 12: a MATERIALIZED AGGREGATE (operators/matview.py) joins
    # the lifecycle under the same hash — created here (pinned to the
    # v2 snapshot), then advanced through the clause-MERGE below by
    # ONE incremental refresh window, so the change-feed netting, the
    # touched-partition merge, AND the min/max recompute branch (the
    # window has deletes; max_p forces it) must all reproduce exactly
    # the GROUP BY DuckDB computes from first principles over the v3
    # slices ('mv' and 'mvmax' legs).
    from geo_explorer_etl_spark.operators.matview import (
        create_matview,
        read_matview,
        refresh_matview,
    )

    create_matview(
        store,
        "mtt",
        "IndicatorValues",
        ["status"],
        {
            "cnt": ("count", None),
            "sum_p": ("sum", "o_totalprice"),
            "max_p": ("max", "o_totalprice"),
        },
        n_partitions=4,
    )
    # Round 13 (VERDICT r12 directive #2): a FILTERED, DERIVED-GROUP
    # view — WHERE price > 1000 GROUP BY a key-bucket EXPRESSION —
    # created at v2 and advanced through the same clause-MERGE window,
    # so the where-predicate applied to the change feed and the
    # derived-group delta algebra (incl. the filtered max recompute
    # under the CDC deletes) sit under the hash too ('mvb'/'mvbmax').
    create_matview(
        store,
        "mttb",
        "IndicatorValues",
        ["kb"],
        {
            "cnt": ("count", None),
            # EXPRESSION aggregate: sum(price * 2) — the last piece of
            # VERDICT r12 missing #1, maintained through the same
            # delta algebra and hashed by DuckDB's SUM(price * 2)
            "sum_p": ("sum", "o_totalprice * 2"),
            "max_p": ("max", "o_totalprice"),
        },
        n_partitions=4,
        where=[("o_totalprice", ">", 1000.0)],
        group_exprs={"kb": "CAST(o_orderkey % 7 AS INT)"},
    )
    # Round 13 second wave: a PERCENTILE matview ('mvp') — the
    # fully-invertible bucket-histogram aggregate (matview._hist_est)
    # — created at v2 and advanced through the same clause-MERGE
    # window. The window's deletes must NET OUT of the histogram
    # (never a recompute), and DuckDB rebuilds the estimator —
    # histogram, rank rule, cumulative walk, interpolation — from the
    # v3 slices, so a wrong bucket slot or rank all break the hash.
    create_matview(
        store,
        "mttp",
        "IndicatorValues",
        ["status"],
        {"cnt": ("count", None), "p90_p": ("p90", "o_totalprice")},
        hist_bins={"p90_p": list(_MVP_BOUNDS)},
        n_partitions=4,
    )
    # v3 (round 11, VERDICT directive #2): ONE op-typed CDC batch
    # through the clause-MERGE grammar — matched DELETE (DV path),
    # matched UPDATE-as-replace, NOT MATCHED INSERT, and NOT MATCHED
    # BY SOURCE DELETE (every 'P+' row the batch doesn't mention),
    # all under one atomic manifest swap per partition. DuckDB
    # recomputes the expected v3 from the same orders slices, so a
    # clause routed to the wrong rows, a torn multi-clause apply, or
    # a by-source delete that leaked outside its predicate all break
    # the value hash.
    cdc = (
        o.filter(((key >= 10) & (key < 20)) | (key >= 95))
        .select(
            "o_orderkey",
            F.when(key < 15, "D").when(key < 20, "U").otherwise("I").alias("op"),
            F.when(key < 20, F.lit("C2")).otherwise(F.lit("N")).alias("status"),
            F.when((key >= 15) & (key < 20), F.col("o_totalprice") * 3)
            .otherwise(F.lit(1.0))
            .alias("o_totalprice"),
        )
        .withColumn("IndicatorThemeId", F.lit(1).cast("long"))
    )
    store.merge_apply(
        "IndicatorValues",
        cdc,
        ["o_orderkey"],
        when_matched=[
            {"condition": "op = 'D'", "action": "delete"},
            {"condition": "op = 'U'", "action": "update"},
        ],
        when_not_matched=[{"condition": "op = 'I'"}],
        when_not_matched_by_source=[
            {"condition": [("status", "==", "P+")], "action": "delete"}
        ],
    )
    # v3 is served THROUGH the batch data source (query-time manifest
    # resolution = the post-MERGE snapshot), putting store_source.py's
    # executor pyarrow path — the fresh DV masks, the renamed column
    # through the mapping, the evolved 'op' column — under the hash.
    # Round 12 (VERDICT r11 next #1): served via the PRUNED catalog
    # path — create_catalog_table with pushdown=true (options ride the
    # schema field metadata; fresh provider per statement makes the
    # pruning concurrency-safe) — so the catalog serving path, not
    # just the temp-view one, sits under the DuckDB value hash.
    from geo_explorer_etl_spark.sources.store_source import create_catalog_table

    v3_cat = create_catalog_table(
        spark, "mtt_v3_served", store.root, "IndicatorValues", replace=True
    )
    v3_served = spark.table(v3_cat)
    refresh_matview(store, "mtt")  # one window: the whole clause-MERGE
    refresh_matview(store, "mttb")
    mttp_rep = refresh_matview(store, "mttp")
    # the invertibility claim, enforced IN the hashed query: a pure-
    # percentile window with deletes must never hit the recompute path
    assert mttp_rep["groups_recomputed"] == 0, mttp_rep
    mv = read_matview(store, "mtt")
    mvb = read_matview(store, "mttb")
    mvp = read_matview(store, "mttp")

    def mv_leg(df: DataFrame, tag: str, value_col: str, group_col) -> DataFrame:
        return df.select(
            F.lit(tag).alias("snap"),
            F.col("cnt").alias("o_orderkey"),
            group_col.alias("o_orderstatus"),
            F.round(value_col, 2).alias("totalprice"),
        )

    # r14 (VERDICT r13 missing #2): the OR disjunct grammar under the
    # value hash — a disjunction of conjunctions read through the
    # RENAMED column's mapping (logical 'status' → physical
    # o_orderstatus stats), zone maps unioning file sets across the
    # two disjuncts; DuckDB evaluates the same OR over the v3 slices.
    orq = store.read(
        "IndicatorValues",
        where=[[("status", "==", "N")], "or", [("o_totalprice", ">", 100000.0)]],
    )
    # r15 (VERDICT r14 next #4): LIKE through the tuple grammar under
    # the same hash — a zone-map-prunable PREFIX pattern OR'd with an
    # honest full-scan suffix pattern, both read through the renamed
    # column's mapping; DuckDB evaluates the same LIKEs over v3state.
    likeq = store.read(
        "IndicatorValues",
        where=[[("status", "like", "C%")], "or", [("status", "like", "%F")]],
    )
    # r16 (VERDICT r15 next #3): a PARENTHESIZED predicate through the
    # store.sql DELETE router under the same hash — `(a OR b) AND c`
    # distributes into the DNF grammar (the paren placement changes
    # the deleted set on this data: without them C2 rows above 100k
    # would go too); DuckDB keeps the complement of the same boolean.
    snap_v3 = store.read("IndicatorValues").select(
        "o_orderkey", "status", "o_totalprice"
    )
    store.replace_product_all(1, {"ParenT": snap_v3})
    store.sql(
        "DELETE FROM ParenT WHERE (status = 'C2' OR status = 'N') "
        "AND o_totalprice < 100000.0"
    )
    parenq = store.read("ParenT")
    # r16: the NOT ops through the tuple grammar under the same hash —
    # NOT LIKE drops the 'C2' rows (zone maps keep files honestly: no
    # pure-prefix all-match proof here), NOT IN drops the price-1.0
    # inserts; DuckDB evaluates the same negations over v3state.
    notq = store.read(
        "IndicatorValues",
        where=[("status", "notlike", "C%"), ("o_totalprice", "notin", [1.0])],
    )
    return (
        tagged(store.read_at("IndicatorValues", t0), "v0")
        .unionByName(tagged(store.read_at("IndicatorValues", t1), "v1"))
        .unionByName(tagged(v2, "v2"))
        .unionByName(tagged(v2cdf, "v2cdf"))
        .unionByName(tagged(v3_served, "v3"))
        .unionByName(tagged(orq, "orq"))
        .unionByName(tagged(likeq, "likeq"))
        .unionByName(tagged(parenq, "parenq"))
        .unionByName(tagged(notq, "notq"))
        .unionByName(mv_leg(mv, "mv", "sum_p", F.col("status")))
        .unionByName(mv_leg(mv, "mvmax", "max_p", F.col("status")))
        .unionByName(mv_leg(mvb, "mvb", "sum_p", F.col("kb").cast("string")))
        .unionByName(mv_leg(mvb, "mvbmax", "max_p", F.col("kb").cast("string")))
        .unionByName(mv_leg(mvp, "mvp", "p90_p", F.col("status")))
    )


@register(
    "m5_null_display_case",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           CASE WHEN l.l_quantity > 45 THEN nr.reason
                ELSE CAST(CAST(ROUND(l.l_extendedprice, 0) AS BIGINT) AS VARCHAR)
           END AS display_value
    FROM lineitem l
    LEFT JOIN (VALUES ('A','suppressed'),('N','not available'),('R','revised'))
         AS nr(symbol, reason) ON l.l_returnflag = nr.symbol
    """,
    tags="M5 J2",
)
def m5_null_display_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    nr = _null_reason_df(spark)
    return (
        li.join(F.broadcast(nr), li.l_returnflag == nr.symbol, "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.when(F.col("l_quantity") > 45, F.col("reason"))
            .otherwise(F.round(F.col("l_extendedprice"), 0).cast("long").cast("string"))
            .alias("display_value"),
        )
    )


# ---------------------------------------------------------------------------
# P3/P4 — min-ref-year filter with special-product escape (reference
# dfhandler.py:686–690, 437–443): normal rows need year >= cutoff;
# "mixed-geo" rows survive when their level is in the keep-set.
# ---------------------------------------------------------------------------
@register(
    "p3_p4_policy_filter",
    oracle="""
    SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS ref_year, o_orderpriority
    FROM orders
    WHERE year(o_orderdate) >= 1998 OR o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    tags="P3 P4 filter",
)
def p3_p4_policy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    keep = (F.year("o_orderdate") >= 1998) | F.col("o_orderpriority").isin(
        "1-URGENT", "2-HIGH"
    )
    return o.filter(keep).select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("ref_year"),
        "o_orderpriority",
    )


# ---------------------------------------------------------------------------
# L1/L2 — code-set lookup as broadcast join + default fallback
# (reference scans the code set per row, helpers.py:155–167, 129–142;
# json_handler "default" fallback L4 → coalesce)
# ---------------------------------------------------------------------------
@register(
    "l1_l4_lookup_with_default",
    oracle="""
    SELECT n.n_nationkey, n.n_name,
           COALESCE(r.r_name, 'UNKNOWN REGION') AS region_desc
    FROM nation n
    LEFT JOIN (SELECT * FROM region WHERE r_regionkey <> 2) r
      ON n.n_regionkey = r.r_regionkey
    """,
    tags="L1 L2 L4 M3 lookup",
)
def l1_l4_lookup_with_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "nation", "region")
    codes = t["region"].filter(F.col("r_regionkey") != 2)
    out = J.broadcast_lookup(
        t["nation"], codes, t["nation"].n_regionkey == codes.r_regionkey, "left"
    )
    return out.select(
        "n_nationkey",
        "n_name",
        F.coalesce(F.col("r_name"), F.lit("UNKNOWN REGION")).alias("region_desc"),
    )


# ---------------------------------------------------------------------------
# O4 — deterministic LIMIT (reference sql_scripts TOP(1000)): the
# standalone o4_ordered_limit registry slot was folded into
# q3_shipping_priority (which now ends in the same ORDER BY ... LIMIT
# shape with a deterministic tie-break) in round 8, freeing the slot
# for ann_quantized_topk under the driver's 50-entry window. The
# operator itself needs no code: it IS orderBy().limit().
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# U1 — chunk-accumulation union + dedup (reference pd.concat of
# per-chunk frames then drop_duplicates, main.py:234–248)
# ---------------------------------------------------------------------------
@register(
    "u1_union_chunks_dedup",
    oracle="""
    SELECT l_returnflag, l_linestatus FROM (
        SELECT l_returnflag, l_linestatus FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1998-01-01'
        UNION ALL
        SELECT l_returnflag, l_linestatus FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01')
    GROUP BY l_returnflag, l_linestatus
    """,
    tags="U1 A2 union",
)
def u1_union_chunks_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    c1 = li.filter(F.col("l_shipdate") < "1998-01-01").select("l_returnflag", "l_linestatus")
    c2 = li.filter(F.col("l_shipdate") >= "1997-01-01").select("l_returnflag", "l_linestatus")
    return c1.unionByName(c2).distinct()


def _decimal_revenue():
    """SUM(extprice*(1-disc)) in exact decimal arithmetic: 2-decimal
    inputs -> exact 4-decimal products -> exact sum -> one rounding at
    the end. Engine-order-independent, so Spark and DuckDB agree to
    the bit (a double sum would differ in the last ulp per engine and
    occasionally flip a half-boundary rounding)."""
    d = F.col("l_discount").cast("decimal(18,2)")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    return F.round(F.sum(p * (F.lit(1).cast("decimal(18,2)") - d)), 2).cast("double")


# ---------------------------------------------------------------------------
# Headline joins beyond the flagship: TPC-H Q3/Q5 shapes — the
# fact-to-fact join (lineitem ⋈ orders) shuffles on the key while every
# dimension stays broadcast; AQE picks the strategy at runtime.
# ---------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_date
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey LIMIT 100
    """,
    tags="headline J1 agg O4 limit",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Also carries the O4 deterministic ordered-LIMIT pin (reference
    sql_scripts TOP(1000)): the standalone ``o4_ordered_limit`` entry
    was folded in here (round 8) so the registry stays inside the
    driver's 50-entry window — ties at equal revenue break by
    l_orderkey, making the cut deterministic on both engines.

    BENCH COMPARABILITY (ADVICE r8, low): the fold changed the
    measured work — rounds ≤7 timed this entry WITHOUT the trailing
    ORDER BY/LIMIT, so round-over-round q3 comparisons are only valid
    within r8+; BENCH_r08 onward carry the new shape."""
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].filter(F.col("o_orderdate") < "1998-03-15")
    li = t["lineitem"].filter(F.col("l_shipdate") > "1998-03-15")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(_decimal_revenue().alias("revenue"))
        .select("l_orderkey", "revenue", "order_date")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(100)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
    WHERE r.r_name = 'EUROPE'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
    tags="headline J1 agg",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "region", "nation", "customer", "supplier", "orders", "lineitem")
    r = t["region"].filter(F.col("r_name") == "EUROPE")
    n, c, s = t["nation"], t["customer"], t["supplier"]
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = t["lineitem"]
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == n.n_nationkey),
        )
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(_decimal_revenue().alias("revenue"))
    )
