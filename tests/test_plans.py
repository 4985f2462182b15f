"""Physical-plan shape assertions — the scale contract.

Correctness says WHAT; these tests pin HOW: lookup joins must be
broadcast (no fact-side shuffle), parquet scans must show pushed
filters and pruned schemas, higher-order text ops must not introduce
exchanges. A regression here is a 100 TB performance bug even when
every value still matches."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from geo_explorer_etl_spark.plans.catalog import flagship_primary_query
from geo_explorer_etl_spark.operators.text import fingerprint
from geo_explorer_etl_spark.session import load_tables
from tests.conftest import SF_SMOKE


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_flagship_joins_are_broadcast(spark):
    plan = plan_of(flagship_primary_query(spark, SF_SMOKE))
    # 5 lookup joins + null-reason: every one must be broadcast…
    assert plan.count("BroadcastHashJoin") >= 5, plan
    # …and nothing may fall back to a fact-shuffling strategy.
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan


def test_scan_pushdown_and_pruning(spark):
    li = load_tables(spark, SF_SMOKE, "lineitem")["lineitem"]
    q = li.filter(F.col("l_shipdate") < "1996-01-01").select("l_orderkey", "l_quantity")
    plan = plan_of(q)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan, plan
    # projection pruning: the parquet ReadSchema must not include
    # unprojected columns like l_comment-tier fields
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" not in read_schema, read_schema


def test_rowlocal_text_ops_have_no_exchange(spark):
    docs = load_tables(spark, SF_SMOKE, "documents")["documents"]
    plan = plan_of(fingerprint(docs, "text", "doc_id"))
    assert "Exchange" not in plan, plan


@pytest.mark.slow
def test_no_python_udf_in_any_catalog_query(spark):
    """Reference-parity invariant (SURVEY §2.13): zero row-at-a-time
    Python evaluation in the whole catalog. mapInPandas appears only
    in the multimodal extension, which is not a catalog query."""
    import __spark_entry__ as entrymod

    for name, fn in entrymod.queries().items():
        plan = plan_of(fn(spark, SF_SMOKE))
        assert "BatchEvalPython" not in plan, f"{name} uses a Python UDF"
        assert "ArrowEvalPython" not in plan, f"{name} uses a Pandas UDF"


def test_anti_joins_follow_the_sizing_rule(spark):
    """Dimension-sized existing state broadcasts (j7: customer dim);
    a FACT-sized existing side must NOT carry a forced broadcast hint
    (j8: lineitem anti lineitem — the hint was the highest-exponent
    shape in the scale sweep; AQE may still downgrade at runtime, so
    the pin is on the ABSENCE of the static hint, i.e. the analyzed
    plan's join strategy is not pre-empted)."""
    from geo_explorer_etl_spark.plans.catalog import (
        j7_anti_new_members,
        j8_anti_composite_key,
    )

    plan7 = plan_of(j7_anti_new_members(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan7 and "LeftAnti" in plan7, plan7

    # at smoke scale Catalyst may COST-CHOOSE broadcast for j8 (both
    # sides are tiny — that is size-based selection doing its job);
    # the pin is on the optimized LOGICAL plan carrying no forced
    # strategy hint, which is what would pre-empt the choice at 100 TB
    lp8 = (
        j8_anti_composite_key(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "LeftAnti" in lp8, lp8
    assert "strategy=broadcast" not in lp8, lp8
    lp7 = (
        j7_anti_new_members(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "strategy=broadcast" in lp7, lp7

    # j11's id set comes from the ORDERS fact table — the other half
    # of the sizing decision this rule ships; pin its hint absence too
    from geo_explorer_etl_spark.plans.catalog import j11_semi_product_exists

    lp11 = (
        j11_semi_product_exists(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "LeftSemi" in lp11, lp11
    assert "strategy=broadcast" not in lp11, lp11


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Co-located join: two tables bucketed on the join key join with
    ZERO Exchange — the 100 TB fact-to-fact pattern (SCALE.md)."""
    from geo_explorer_etl_spark.sources.store import BucketedStore

    li = load_tables(spark, SF_SMOKE, "lineitem")["lineitem"]
    orders = load_tables(spark, SF_SMOKE, "orders")["orders"]
    bs = BucketedStore(spark, n_buckets=4)
    bs.write(li.select("l_orderkey", "l_quantity"), "b_lineitem", "l_orderkey")
    bs.write(
        orders.select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"),
        "b_orders",
        "l_orderkey",
    )
    # disable broadcast so the plan shows what happens when BOTH sides
    # are big (the case bucketing exists for): SMJ over bucketed scans,
    # no shuffle Exchange on either side
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bs.read("b_lineitem").join(bs.read("b_orders"), "l_orderkey")
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # one file per bucket + sortBy + the sorted-scan flag: the merge
        # join needs no per-read Sort either
        assert "Sort (" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_store_read_prunes_product_partitions(spark, tmp_path):
    """SCALE.md's 'readers prune on the product id for free': a
    product-filtered read through the manifest-resolved file list must
    show a PartitionFilters entry on IndicatorThemeId and scan ONE
    partition, not every product's files."""
    from geo_explorer_etl_spark.sources.store import TableStore

    store = TableStore(spark, str(tmp_path / "store"))
    for pid in (1, 2, 3):
        store.replace_product_all(
            pid, {"IndicatorValues": spark.range(100).select(F.col("id"))}
        )
    df = store.read("IndicatorValues").filter(F.col("IndicatorThemeId") == 2)
    plan = plan_of(df)
    assert "PartitionFilters: [isnotnull(IndicatorThemeId" in plan, plan
    assert "(IndicatorThemeId" in plan and "= 2)" in plan, plan
    assert df.count() == 100


def test_bench_bridge_join_twins_plans(spark):
    """The bench twin pair (plans/bucketed_bench.py) must show exactly
    the contrast it claims: the bucketed path joins with ZERO Exchange
    before the aggregation, the plain path shuffles both fact sides.
    Pinned on the same code bench.py times."""
    from geo_explorer_etl_spark.plans import bucketed_bench as bb

    bb.prepare(spark, SF_SMOKE, n_buckets=4)
    bucketed = bb.bridge_join_bucketed(spark, SF_SMOKE)
    plain = bb.bridge_join_plain(spark, SF_SMOKE)
    # capture plans BEFORE executing: after collect() the adaptive plan
    # prints Final+Initial sections and double-counts Exchanges
    pb, pp = plan_of(bucketed), plan_of(plain)
    # same results across layouts (double sums differ in the last ulp
    # with aggregation order, hence the rounding)
    rb = sorted((r["IndicatorId"], round(r["total_value"], 3), r["n_values"]) for r in bucketed.collect())
    rp = sorted((r["IndicatorId"], round(r["total_value"], 3), r["n_values"]) for r in plain.collect())
    assert rb == rp
    assert "SortMergeJoin" in pb, pb
    # the only Exchange allowed in the bucketed plan is the aggregation's
    # (hashpartitioning on IndicatorId) — never on the join key
    assert "hashpartitioning(IndicatorValueId" not in pb, pb
    # exactly one Exchange tree node (the aggregation's); formatted
    # explain repeats node names in the detail section, so count the
    # tree labels. The bucketed scans also report their sortBy order
    # (one file per bucket), so the merge join needs no Sort.
    assert pb.count("Exchange (") == 1, pb
    assert pb.count("Sort (") == 0, pb
    # the plain layout pays the join-key shuffle on both sides
    assert pp.count("hashpartitioning(IndicatorValueId") >= 2, pp


def test_asof_join_plan_is_one_keyed_window_no_nested_loop(spark):
    """The as-of join must execute as union + ONE keyed window — never
    a BroadcastNestedLoop/CartesianProduct theta join (the naive
    right.ts <= left.ts formulation), whose cost is points×rows."""
    from geo_explorer_etl_spark.operators.asof import as_of_join
    from geo_explorer_etl_spark.session import load_tables

    ev = load_tables(spark, SF_SMOKE, "events")["events"]
    left = ev.select("event_id", "user_id", "ts").limit(500)
    right = ev.select(
        F.col("user_id"), F.col("ts"), F.col("event_type")
    ).limit(500)
    out = as_of_join(left, right, key="user_id", ts="ts", right_cols=["event_type"])
    plan = plan_of(out)
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan, plan
    import re

    assert len(re.findall(r"\(\d+\) Window", plan)) == 1, plan


def test_range_join_plan_is_bucketized_equi_join(spark):
    """The range join must hit the bucketized equi-join path (hash
    join/SMJ on the bucket), not a nested-loop theta join over the raw
    containment predicate."""
    from geo_explorer_etl_spark.operators.rangejoin import range_join
    from geo_explorer_etl_spark.session import load_tables

    ev = load_tables(spark, SF_SMOKE, "events")["events"]
    points = ev.select("event_id", F.col("ts").alias("pt_ts"))
    intervals = ev.select(
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
        F.col("user_id").alias("iv_user"),
    ).limit(200)
    out = range_join(points, intervals, "pt_ts", "start_ts", "end_ts")
    plan = plan_of(out)
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan, plan
    assert "Join" in plan, plan


def test_pack_offsets_distributed_prefix_sum(spark):
    """Sequence packing must compute its global cumsum WITHOUT a
    single-partition global Window: the plan pins no
    `Exchange SinglePartition` (the naive Window.orderBy shape), and
    the result equals a driver-side cumsum — identically for any
    bucket count, since base + within-bucket rank telescopes."""
    from geo_explorer_etl_spark.operators.text import pack_offsets

    rows = [(i, (i * 7) % 50 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n long").repartition(8)

    out = pack_offsets(df, "n", "doc_id", window=64, n_ranges=5)
    plan = plan_of(out)
    assert "SinglePartition" not in plan, plan

    got = {r["doc_id"]: r for r in out.collect()}
    acc = 0
    for i, n in rows:
        assert got[i]["pack_offset"] == acc, i
        assert got[i]["pack_first"] == acc // 64
        assert got[i]["pack_last"] == (acc + max(n, 1) - 1) // 64
        acc += n
    # bucket-count independence
    again = {
        r["doc_id"]: r["pack_offset"]
        for r in pack_offsets(df, "n", "doc_id", window=64, n_ranges=2).collect()
    }
    assert again == {k: v["pack_offset"] for k, v in got.items()}
    # empty frame edge
    assert pack_offsets(df.filter("doc_id < 0"), "n", "doc_id").count() == 0


def test_pack_offsets_refuses_null_ids(spark):
    """Review r10 wave 6: a null id has no pack position — the bucket
    join would silently drop the row and deflate every later offset,
    so the tiny domain aggregate refuses loudly instead."""
    import pytest

    from geo_explorer_etl_spark.operators.text import pack_offsets

    df = spark.createDataFrame(
        [(1, 5), (None, 3), (2, 4)], "doc_id long, n long"
    )
    with pytest.raises(ValueError, match="null value"):
        pack_offsets(df, "n", "doc_id").collect()
