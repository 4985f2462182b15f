"""Store→store streaming replication (streaming/replicate.py): the
native change-feed source composed with the clause MERGE — replica
equals source through append / merge / update / delete DML, schema
stays clean of CDC metadata, and replayed batches land once."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geo_explorer_etl_spark.sources.store import PARTITION_COL, TableStore
from geo_explorer_etl_spark.streaming.replicate import (
    OP_COL,
    apply_change_batch,
    compact_changes,
    replicate_stream,
)

PID = 4
COLS = ["k", "v"]


def _frame(spark, rows):
    return spark.createDataFrame(rows, "k LONG, v DOUBLE").withColumn(
        PARTITION_COL, F.lit(PID).cast("long")
    )


def _rows(store):
    return sorted(
        map(tuple, store.read("IndicatorValues").select(*COLS).collect())
    )


def _drain(spark, src_root, target, ck):
    q = replicate_stream(
        spark, src_root, target, "IndicatorValues", ["k"], str(ck)
    )
    q.awaitTermination()


@pytest.mark.slow
def test_replica_tracks_source_through_dml(spark, tmp_path):
    src = TableStore(spark, str(tmp_path / "src"))
    dst = TableStore(spark, str(tmp_path / "dst"))
    ck = tmp_path / "ck"
    src.replace_product_all(
        PID, {"IndicatorValues": _frame(spark, [(i, float(i)) for i in range(40)])}
    )
    _drain(spark, src.root, dst, ck)
    assert _rows(dst) == _rows(src)
    # CDC metadata must not leak into the replica's schema
    assert sorted(dst.read("IndicatorValues").columns) == sorted(
        [*COLS, PARTITION_COL]
    )

    # a mixed DML soak: merge (update+insert), expression update, delete
    src.merge_rows(
        "IndicatorValues",
        _frame(spark, [(3, 300.0), (100, 1.0)]),
        ["k"],
    )
    src.update_where("IndicatorValues", {"v": "v + 0.25"}, [("k", "==", 7)])
    src.delete_where("IndicatorValues", [("k", "in", (1, 5, 100))])
    _drain(spark, src.root, dst, ck)
    assert _rows(dst) == _rows(src)
    got = dict(_rows(dst))
    assert got[3] == 300.0 and got[7] == 7.25
    assert 1 not in got and 100 not in got

    # quiet source: another drain is a no-op that stays equal
    _drain(spark, src.root, dst, ck)
    assert _rows(dst) == _rows(src)


def test_compact_changes_nets_update_and_requeue(spark):
    batch = spark.createDataFrame(
        [
            # k=1: update at t=2 (delete old + insert new, same ts)
            (1, 10.0, PID, "delete", 2.0),
            (1, 11.0, PID, "insert", 2.0),
            # k=2: inserted at t=1 then deleted at t=3 -> net delete
            (2, 20.0, PID, "insert", 1.0),
            (2, 20.0, PID, "delete", 3.0),
            # k=3: plain insert
            (3, 30.0, PID, "insert", 1.0),
        ],
        f"k LONG, v DOUBLE, {PARTITION_COL} LONG, _change_type STRING, _committed_at DOUBLE",
    )
    net = {r.k: (r.v, r[OP_COL]) for r in compact_changes(batch, ["k"]).collect()}
    assert net == {1: (11.0, "I"), 2: (20.0, "D"), 3: (30.0, "I")}


def test_apply_change_batch_is_idempotent(spark, tmp_path):
    """Crash-between-merge-and-record convergence: re-applying the
    same net batch yields the same replica."""
    dst = TableStore(spark, str(tmp_path / "dst"))
    dst.replace_product_all(
        PID, {"IndicatorValues": _frame(spark, [(1, 1.0), (2, 2.0)])}
    )
    batch = spark.createDataFrame(
        [
            (1, 100.0, PID, "insert", 5.0),
            (2, 2.0, PID, "delete", 5.0),
            (9, 9.0, PID, "insert", 5.0),
        ],
        f"k LONG, v DOUBLE, {PARTITION_COL} LONG, _change_type STRING, _committed_at DOUBLE",
    )
    apply_change_batch(dst, "IndicatorValues", batch, ["k"])
    first = _rows(dst)
    apply_change_batch(dst, "IndicatorValues", batch, ["k"])
    assert _rows(dst) == first == [(1, 100.0), (9, 9.0)]


@pytest.mark.slow
def test_two_pipelines_one_target_do_not_share_a_ledger_key(spark, tmp_path):
    """Review r11: a shared constant stream_id would let the second
    pipeline's batches 0..high-water be dropped silently (its fresh
    checkpoint restarts epoch ids at 0). The default id derives from
    the checkpoint, so two pipelines into one target both deliver."""
    src_a = TableStore(spark, str(tmp_path / "src_a"))
    src_b = TableStore(spark, str(tmp_path / "src_b"))
    dst = TableStore(spark, str(tmp_path / "dst"))
    src_a.replace_product_all(
        PID, {"IndicatorValues": _frame(spark, [(1, 1.0)])}
    )
    src_b.replace_product_all(
        PID, {"Indicators": _frame(spark, [(7, 7.0)])}
    )
    q = replicate_stream(
        spark, src_a.root, dst, "IndicatorValues", ["k"], str(tmp_path / "ck_a")
    )
    q.awaitTermination()
    q = replicate_stream(
        spark, src_b.root, dst, "Indicators", ["k"], str(tmp_path / "ck_b")
    )
    q.awaitTermination()
    assert dst.read("IndicatorValues").count() == 1
    got = dst.read("Indicators")
    assert got is not None and got.count() == 1  # NOT silently dropped


@pytest.mark.slow
def test_replicate_store_whole_store_convenience(spark, tmp_path):
    """replicate_store (r12): every existing source table with a key
    mapping replicates in one call; tables without keys are skipped
    with -1 (never guessed); a second drain after more DML pulls only
    the new changes (per-table checkpoints resume)."""
    from geo_explorer_etl_spark.streaming.replicate import replicate_store

    src = TableStore(spark, str(tmp_path / "src"))
    dst = TableStore(spark, str(tmp_path / "dst"))
    src.replace_product_all(
        PID,
        {
            "IndicatorValues": _frame(spark, [(1, 1.0), (2, 2.0)]),
            "Indicators": _frame(spark, [(7, 7.0)]),
            "RelatedCharts": _frame(spark, [(9, 9.0)]),  # no key mapping
        },
    )
    ck = str(tmp_path / "ck")
    keys = {"IndicatorValues": ["k"], "Indicators": ["k"]}
    rep = replicate_store(spark, src.root, dst, keys, ck)
    assert rep["RelatedCharts"] == -1
    assert rep["IndicatorValues"] >= 1 and rep["Indicators"] >= 1
    assert _rows(dst) == [(1, 1.0), (2, 2.0)]
    assert sorted(
        map(tuple, dst.read("Indicators").select(*COLS).collect())
    ) == [(7, 7.0)]
    assert dst.read("RelatedCharts") is None  # skipped, not guessed

    # incremental second drain: one table changes, resume pulls it
    src.update_where("IndicatorValues", {"v": "v + 10"}, [("k", "==", 1)])
    rep2 = replicate_store(spark, src.root, dst, keys, ck)
    assert _rows(dst) == [(1, 11.0), (2, 2.0)]
    # the unchanged table's drain applied no new data batches beyond
    # the (possibly empty) windows the feed emitted — replica intact
    assert sorted(
        map(tuple, dst.read("Indicators").select(*COLS).collect())
    ) == [(7, 7.0)]
