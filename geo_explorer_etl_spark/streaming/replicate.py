"""Store→store streaming replication: the round-10 native change-feed
SOURCE composed with the round-11 clause MERGE into a continuously
maintained replica — the Delta "CDF + MERGE" replication recipe, all
engine-native:

    spark.readStream.format("store_cdf")   (offsets = commit ts)
      → compact_changes (net effect per key within the micro-batch)
      → foreachBatch merge_apply            (one atomic swap/partition)

Why each stage exists:

- The CDF emits an UPDATE as delete(old row) + insert(new row) at one
  commit timestamp, and a key may change several times inside one
  micro-batch window. ``compact_changes`` reduces the batch to its NET
  effect per key — last change wins, ordered by ``_committed_at`` then
  change type (insert outranks delete at equal timestamps, which is
  exactly the update case) — because MERGE is a set operation: feeding
  it two ops for one key is the ambiguous-merge error, by design.
- ``merge_apply`` routes the net ops in ONE call: matched+D → delete
  (deletion vectors — a scattered CDC batch writes sidecars), matched+
  I → replace row, unmatched+I → insert; the routing columns ride
  ``drop_cols`` so the replica's schema never grows CDC metadata.
- EXACTLY-ONCE: offsets live in the query checkpoint; a replayed batch
  is skipped outright through the TARGET store's epoch ledger (the
  ``merge_sink`` pattern), and a crash between merge and ledger record
  converges because re-applying the identical net batch is idempotent.

KEY CONTRACT: ``key_cols`` must uniquely identify rows in the source
table (the precondition of any merge-based replication). A fresh
replica bootstraps by replaying the feed from ``start_at=0`` —
valid while the source's vacuum retention covers its history;
otherwise seed the target with a snapshot copy and pass the snapshot
timestamp as ``start_at``.

Scale shape: per micro-batch cost ∝ changed files (the CDF plan) +
the target's candidate files for the batch's keys (zone-map/bloom
bounded) — never either table's size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from geo_explorer_etl_spark.sources.store import PARTITION_COL, TableStore
from geo_explorer_etl_spark.streaming.cdf_source import (
    CHANGE_TYPE_COL,
    COMMITTED_AT_COL,
    StoreChangeFeedDataSource,
)

#: Routing column carried into merge_apply ('I' upsert / 'D' delete).
OP_COL = "_cdc_op"


def compact_changes(batch: DataFrame, key_cols: list[str]) -> DataFrame:
    """The net effect of a change batch per (partition, key): keep the
    LAST change — ordered by commit time, inserts outranking deletes at
    the same commit (an update is delete+insert at one timestamp; its
    net effect is the insert). Emits the payload plus ``_cdc_op``."""
    keys = [PARTITION_COL, *key_cols]
    rn = F.row_number().over(
        Window.partitionBy(*keys).orderBy(
            F.col(COMMITTED_AT_COL).desc(),
            # 'insert' > 'delete' lexicographically: desc puts the
            # insert first at equal timestamps — the update case
            F.col(CHANGE_TYPE_COL).desc(),
        )
    )
    return (
        batch.withColumn("_rn", rn)
        .filter(F.col("_rn") == 1)
        .withColumn(
            OP_COL,
            F.when(F.col(CHANGE_TYPE_COL) == "delete", F.lit("D")).otherwise(
                F.lit("I")
            ),
        )
        .drop("_rn", CHANGE_TYPE_COL, COMMITTED_AT_COL)
    )


def apply_change_batch(
    target: TableStore, table: str, batch: DataFrame, key_cols: list[str]
) -> dict:
    """One micro-batch (or one ``read_changes`` window) applied to the
    target in ONE merge_apply call. Usable standalone for batch CDC."""
    net = compact_changes(batch, key_cols)
    return target.merge_apply(
        table,
        net,
        key_cols,
        when_matched=[
            {"condition": f"{OP_COL} = 'D'", "action": "delete"},
            {"condition": None, "action": "update"},
        ],
        when_not_matched=[{"condition": f"{OP_COL} = 'I'"}],
        drop_cols=[OP_COL],
    )


def replicate_stream(
    spark: SparkSession,
    source_root: str,
    target: TableStore,
    table: str,
    key_cols: list[str],
    checkpoint_dir: str,
    stream_id: str | None = None,
    source_backend: str = "localfs",
    start_at: float = 0.0,
    watermark_lag: float = 0.0,
):
    """Start (availableNow) the replication query: every committed
    change window on the source lands on the target exactly once.
    Returns the StreamingQuery; call ``awaitTermination()`` to drain.

    ``stream_id`` defaults to a digest of ``checkpoint_dir`` — the
    query's durable identity — NOT a shared constant: two replication
    pipelines into one target store sharing one ledger key would let
    the second pipeline's batches 0..high-water be dropped SILENTLY
    while its checkpoint advances (the store_sink.py rule, review
    r11). Pass an explicit id only to resume a pipeline whose
    checkpoint moved."""
    if not stream_id:
        import hashlib

        stream_id = (
            "replicate-"
            + hashlib.sha256(str(checkpoint_dir).encode()).hexdigest()[:16]
        )
    spark.dataSource.register(StoreChangeFeedDataSource)
    feed = (
        spark.readStream.format("store_cdf")
        .option("path", source_root)
        .option("table", table)
        .option("backend", source_backend)
        .option("start_at", str(start_at))
        .option("watermark_lag", str(watermark_lag))
        .load()
    )

    def apply(df: DataFrame, epoch_id: int) -> None:
        # ledger replay-skip (merge_sink pattern): the checkpoint can
        # re-offer the last uncommitted batch after a crash
        if int(epoch_id) <= int(target._epoch_ledger().get(stream_id, -1)):
            return
        if not df.isEmpty():
            apply_change_batch(target, table, df, key_cols)
        target._record_epoch(stream_id, int(epoch_id))

    return (
        feed.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def replicate_store(
    spark: SparkSession,
    source_root: str,
    target: TableStore,
    key_cols: dict[str, list[str]],
    checkpoint_root: str,
    tables: list[str] | None = None,
    source_backend: str = "localfs",
    start_at: float = 0.0,
) -> dict[str, int]:
    """Whole-store replication convenience: one ``replicate_stream``
    per source table that exists, each with its OWN checkpoint subdir
    (→ its own derived ledger key — per-table pipelines never share a
    high-water, the store_sink rule). Drains every query
    (availableNow) and returns ``{table: batches_applied}``.

    ``key_cols`` maps table → merge keys; tables without an entry are
    SKIPPED with a report value of -1 rather than guessed (a wrong
    key silently merges rows together — worse than asking). Re-run
    with the same ``checkpoint_root`` to pull only new changes:
    per-table offsets resume, cost ∝ changed files since last drain.
    Tables replicate INDEPENDENTLY (per-table exactly-once, no
    cross-table transaction): a consumer needing one consistent
    cross-table point reads the TARGET with ``snapshot_at`` after the
    drain, exactly like any store reader."""
    import hashlib
    from pathlib import Path

    from geo_explorer_etl_spark.sources.store import PRODUCT_TABLES

    report: dict[str, int] = {}
    src = TableStore(spark, source_root, backend=source_backend)
    for t in tables if tables is not None else PRODUCT_TABLES:
        if not src.exists(t):
            continue
        if t not in key_cols:
            report[t] = -1
            continue
        ck = str(Path(checkpoint_root) / t)
        sid = "replicate-" + hashlib.sha256(ck.encode()).hexdigest()[:16]
        before = int(target._epoch_ledger().get(sid, -1))
        replicate_stream(
            spark, source_root, target, t, key_cols[t],
            checkpoint_dir=ck, source_backend=source_backend,
            start_at=start_at,
        ).awaitTermination()
        report[t] = int(target._epoch_ledger().get(sid, -1)) - before
    return report
