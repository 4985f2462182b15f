"""Deterministic shard export (operators/corpus.export_shards) —
VERDICT r10 directive #5: seeded membership stable across runs, shard
sizes hash-uniform, one file per shard through the store commit path,
round-trip read equals the corpus."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from geo_explorer_etl_spark.operators.corpus import export_shards
from geo_explorer_etl_spark.sources.store import PARTITION_COL, TableStore

N = 2000
SHARDS = 8


def _corpus(spark, n=N):
    return spark.createDataFrame(
        [(i, f"document body {i} " * 3) for i in range(n)],
        "doc_id LONG, text STRING",
    )


def _membership(store):
    return {
        r.doc_id: r[PARTITION_COL]
        for r in store.read("TrainingShards").select("doc_id", PARTITION_COL).collect()
    }


def test_same_seed_identical_membership_across_runs(spark, tmp_path):
    df = _corpus(spark)
    store_a = TableStore(spark, str(tmp_path / "a"))
    store_b = TableStore(spark, str(tmp_path / "b"))
    rep_a = export_shards(store_a, df, SHARDS, seed=42)
    # second run: DIFFERENT partitioning of the input, same seed
    rep_b = export_shards(store_b, df.repartition(13), SHARDS, seed=42)
    assert rep_a["rows"] == rep_b["rows"] == N
    assert _membership(store_a) == _membership(store_b)
    # a different seed reshuffles
    store_c = TableStore(spark, str(tmp_path / "c"))
    export_shards(store_c, df, SHARDS, seed=43)
    assert _membership(store_c) != _membership(store_a)


def test_shard_sizes_within_tolerance_and_one_file_each(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh"))
    rep = export_shards(store, _corpus(spark), SHARDS, seed=7)
    assert rep["files"] == SHARDS  # one file per shard
    sizes = {
        r[PARTITION_COL]: r["n"]
        for r in store.read("TrainingShards")
        .groupBy(PARTITION_COL)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(sizes) == SHARDS
    mean = N / SHARDS
    # hash-uniform: allow 5 sigma of a binomial spread
    tol = 5 * (mean * (1 - 1 / SHARDS)) ** 0.5
    assert all(abs(n - mean) <= tol for n in sizes.values()), sizes
    # ACID + describable: every shard partition is under manifest
    # control with per-file zone maps from day one
    for s in range(SHARDS):
        part = Path(store.root) / "TrainingShards" / f"{PARTITION_COL}={s}"
        m = store._manifest(part)
        assert m is not None and len(m["files"]) == 1
        assert m.get("stats")
    # rows are id-sorted INSIDE each shard file (sequential readers
    # stream in id order)
    one = store.read("TrainingShards", where=[(PARTITION_COL, "==", 0)])
    ids = [r.doc_id for r in one.select("doc_id").collect()]
    assert ids == sorted(ids)


def test_round_trip_equals_corpus_and_refuses_overwrite(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh"))
    df = _corpus(spark, n=300)
    export_shards(store, df, 4, seed=1)
    back = store.read("TrainingShards").drop(PARTITION_COL)
    a = sorted(map(tuple, back.collect()))
    b = sorted(map(tuple, df.collect()))
    assert a == b
    with pytest.raises(ValueError, match="already exists"):
        export_shards(store, df, 4, seed=1)


def test_shuffle_within_is_deterministic_and_not_id_order(spark, tmp_path):
    """shuffle_within=True: within-shard row order is a pure function
    of (seed, id) — identical across exports and partitionings,
    different from id order, and membership unchanged."""
    from geo_explorer_etl_spark.operators.corpus import export_shards
    from geo_explorer_etl_spark.sources.store import TableStore

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id LONG, text STRING"
    )
    orders = []
    for rep, parts in ((0, 4), (1, 9)):
        store = TableStore(spark, str(tmp_path / f"wh{rep}"))
        export_shards(
            store, docs.repartition(parts), n_shards=4, seed=7,
            shuffle_within=True,
        )
        per_shard = {}
        import pyarrow.parquet as pq

        df = store.read("TrainingShards")
        for f in sorted(df.inputFiles()):
            ids = pq.read_table(f.removeprefix("file:"), columns=["doc_id"])
            per_shard[f.rsplit("/", 2)[-2]] = ids["doc_id"].to_pylist()
        orders.append(per_shard)
    assert orders[0] == orders[1]  # deterministic across partitionings
    assert any(
        ids != sorted(ids) for ids in orders[0].values()
    )  # actually shuffled
    # membership matches the unshuffled export (same seed)
    store = TableStore(spark, str(tmp_path / "wh_plain"))
    export_shards(store, docs, n_shards=4, seed=7)
    plain = {
        k: sorted(v)
        for k, v in (
            (f.rsplit("/", 2)[-2],
             pq.read_table(
                 f.removeprefix("file:"), columns=["doc_id"]
             )["doc_id"].to_pylist())
            for f in sorted(store.read("TrainingShards").inputFiles())
        )
    }
    assert {k: sorted(v) for k, v in orders[0].items()} == plain
