"""The TableStore as a native Spark STREAMING SINK (VERDICT r10
directive #6).

Reads already compose through ``spark.readStream.format("store_cdf")``;
writes needed the bespoke ``append_epoch`` helper wired through
``foreachBatch``. This module closes the loop as a Python Data Source
writer, so a store-to-store pipeline is pure Structured Streaming:

    spark.dataSource.register(StoreSinkDataSource)
    (df.writeStream.format("store")
        .option("path", store_root).option("table", "IndicatorValues")
        .option("stream_id", "my-pipeline")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True).start())

Execution shape (the 100 TB story):

- ``write(iterator)`` runs on EXECUTORS over Arrow RecordBatches
  (``DataSourceStreamArrowWriter`` — vectorized hand-off, never
  row-at-a-time Python): each task splits its rows by the partition
  column, renames logical column names to the table's PHYSICAL names
  through the column mapping (read Spark-free from the manifests),
  and stages ONE parquet file per (task, partition) under
  ``<root>/_sink_staging/<stream_id>/`` via pyarrow — these staged
  files ARE the table files; nothing is written twice.
- ``commit(messages, batchId)`` runs in a SESSION-LESS worker process
  (Spark's Python streaming sink protocol provides no SparkSession
  there), so the publish is Spark-free end to end: the staged files
  move into an ``etxn`` transaction dir — the SAME layout
  ``append_epoch`` stages and ``recover()`` rolls forward — then
  ``_claim_epoch`` CAS-claims (stream_id, batchId) in the epoch
  ledger and ``_publish_epoch`` moves the files live and extends each
  partition manifest (stats/blooms harvested via pyarrow). Exactly
  one of any racing attempts publishes; a crash between claim and
  publish rolls forward; a Structured Streaming REPLAY of a
  committed batch (same batchId after a kill) loses the claim and
  publishes nothing.
- ``abort`` deletes the attempt's staged files; crashed leftovers age
  out via vacuum's stale-staging GC.

MERGE-by-key needs joins against the current snapshot, which the
session-less commit hook cannot run — merge pipelines compose as
``store_cdf`` source → ``incremental.merge_sink`` (foreachBatch +
the same epoch-ledger exactly-once), which has a driver session.
"""

from __future__ import annotations

import json
import uuid
from dataclasses import dataclass, field

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

SINK_STAGING = "_sink_staging"


def _canonical_pid(pid):
    """One canonical dir spelling per logical partition value. The
    store's readers parse ``{PARTITION_COL}=<raw>`` dir names
    VERBATIM, so any value whose f-string rendering differs from what
    a batch append's ``partitionBy`` writes would silently split one
    logical partition across two spellings (review r10 wave 3):

    - integral floats canonicalize to int (a double-typed product-id
      column after an upstream cast must land in ``=46100018``, not
      ``=46100018.0``);
    - bools, non-integral floats, empty strings, the literal
      ``__HIVE_DEFAULT_PARTITION__`` (partitionBy's NULL spelling),
      and strings containing characters Spark percent-escapes in
      partition paths are refused loudly.
    """
    if isinstance(pid, bool):
        raise ValueError("store sink: boolean partition values are not supported")
    if isinstance(pid, float):
        if not pid.is_integer():
            raise ValueError(
                f"store sink: non-integral partition value {pid!r} has no "
                "canonical dir spelling — cast the partition column to long"
            )
        return int(pid)
    if isinstance(pid, str):
        if pid == "" or pid == "__HIVE_DEFAULT_PARTITION__" or any(
            c in '\x00/=%:#?*"\'\\{}[]^' or ord(c) < 0x20 or c == "\x7f"
            for c in pid
        ):
            raise ValueError(
                f"store sink: partition value {pid!r} collides with or would "
                "be escaped in Spark's partition dir naming — use an "
                "escape-free, non-empty partition key"
            )
    return pid


@dataclass
class StoreSinkCommitMessage(WriterCommitMessage):
    """Per-task result: one staged file per partition value touched by
    the task ((partition value or None, absolute path, rows)). Must
    stay picklable — it rides executor→driver."""

    files: list = field(default_factory=list)


class StoreStreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, schema: T.StructType | None, options: dict):
        self._schema = schema
        self._root = options["path"]
        self._table = options.get("table", "IndicatorValues")
        self._backend = options.get("backend", "localfs")
        self._stream_id = self._resolve_stream_id(options)
        self._bloom_cols = [
            c.strip() for c in options.get("bloom_cols", "").split(",") if c.strip()
        ]

    @staticmethod
    def _resolve_stream_id(options: dict) -> str:
        """The epoch-ledger key MUST be unique per logical pipeline: a
        shared constant default would make two independent queries
        (each starting at batchId 0) share one high-water, so the
        second query's batches 0..hw would lose the dedup check and be
        dropped SILENTLY while its checkpoint advances (review r10
        wave 4). When the caller gives no stream_id, derive one from
        the checkpoint location — in Structured Streaming the
        checkpoint IS the query's durable identity (same across
        restarts, distinct across queries). No checkpoint in the
        options → refuse loudly rather than guess.

        UPGRADE NOTE (ADVICE r10): pipelines that ran under the
        pre-r10 shared default key ``'store_sink'`` must pin
        ``.option('stream_id', 'store_sink')`` explicitly when
        upgrading — the checkpoint-derived id is a NEW ledger key, so
        the high-water lookup would miss and Spark's replayed last
        batch would re-publish as duplicate rows. Auto-migrating the
        legacy entry is deliberately NOT done: at resolve time an
        upgraded pipeline is indistinguishable from a brand-new one,
        and adopting the legacy high-water for a new pipeline would
        silently DROP its batches 0..hw — the worse failure."""
        sid = options.get("stream_id")
        if sid:
            return sid
        ck = options.get("checkpointlocation") or options.get("checkpointLocation")
        if ck:
            import hashlib

            return "ck-" + hashlib.sha256(ck.encode()).hexdigest()[:16]
        raise ValueError(
            "store sink: set .option('stream_id', <unique pipeline name>) "
            "(or a checkpointLocation to derive one from) — the epoch "
            "ledger dedups on it, and a shared default would silently "
            "drop another pipeline's batches"
        )

    def _colmap(self) -> tuple[dict, set]:
        """The table's logical→physical column mapping, read
        Spark-free from the manifests (same rule as append())."""
        from pathlib import Path

        from geo_explorer_etl_spark.sources.store import StoreMeta

        meta = StoreMeta(self._root, self._backend)
        tdir = Path(meta._path(self._table))
        return meta._table_colmap(tdir) if tdir.exists() else ({}, set())

    # -- executor side ------------------------------------------------------
    def write(self, iterator) -> StoreSinkCommitMessage:
        """Stage one parquet file per (task, partition value), already
        under PHYSICAL column names — these are the final table files;
        uuid names mean replays/races can never stomp each other."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pathlib import Path

        from geo_explorer_etl_spark.sources.store import PARTITION_COL

        batches = list(iterator)
        if not batches or sum(b.num_rows for b in batches) == 0:
            return StoreSinkCommitMessage(files=[])
        tbl = pa.Table.from_batches(batches)
        colmap, dropped = self._colmap()
        bad = {colmap.get(c, c) for c in tbl.column_names} & set(dropped)
        if bad:
            raise ValueError(
                f"store sink: column(s) map onto retired physical names "
                f"{sorted(bad)} — re-add the column through append() first"
            )
        staging = Path(self._root) / SINK_STAGING / self._stream_id
        staging.mkdir(parents=True, exist_ok=True)

        def stage(sub: "pa.Table", pid) -> tuple:
            sub = sub.rename_columns(
                [colmap.get(c, c) for c in sub.column_names]
            )
            name = staging / f"task-{uuid.uuid4().hex}.parquet"
            tmp = staging / f"_tmp-{name.name}"
            pq.write_table(sub, str(tmp))
            tmp.rename(name)  # crash-atomic: a torn stage is never adopted
            return (pid, str(name), sub.num_rows)

        files: list = []
        if PARTITION_COL in tbl.column_names:
            pids = pc.unique(tbl.column(PARTITION_COL)).to_pylist()
            for pid in pids:
                if pid is None:
                    raise ValueError(
                        f"store sink: NULL {PARTITION_COL} rows cannot be "
                        "routed to a partition"
                    )
                sub = tbl.filter(
                    pc.equal(tbl.column(PARTITION_COL), pid)
                ).drop_columns([PARTITION_COL])
                files.append(stage(sub, _canonical_pid(pid)))
        else:
            files.append(stage(tbl, None))
        return StoreSinkCommitMessage(files=files)

    # -- driver-side worker (NO SparkSession) -------------------------------
    def commit(self, messages, batchId: int) -> None:
        """Assemble the staged files into an ``append_epoch``-shaped
        transaction and publish it Spark-free through the CAS epoch
        claim — the identical crash/replay story, minus the session."""
        import shutil
        from pathlib import Path

        from geo_explorer_etl_spark.sources.store import PARTITION_COL, StoreMeta

        staged = [
            t for m in messages if m is not None for t in (m.files or [])
        ]
        try:
            if not staged:
                return
            meta = StoreMeta(self._root, self._backend)
            if self._bloom_cols:
                # bloom_cols is a TableStore-construction concern, not
                # persisted state — pass it through so streamed files
                # get their per-file blooms at publish (without this
                # they'd stay bloom-less until a compact rewrite)
                meta.bloom_cols = {self._table: list(self._bloom_cols)}
            ledger = meta._epoch_ledger()
            if int(batchId) <= int(ledger.get(self._stream_id, -1)):
                # replayed batch: already claimed — make sure a crashed
                # winner's staging rolls forward, then drop ours
                meta._complete_claimed_epoch(self._stream_id)
                return
            txn = (
                Path(self._root)
                / "_staging"
                / f"etxn_{self._stream_id}_{batchId}_{uuid.uuid4().hex[:8]}"
            )
            # resolve the declared schema BEFORE the staged files move
            schema_json = self._payload_schema_json(staged)
            # the _INFLIGHT sentinel marks this manifest-less txn as a
            # LIVE assembly: without it a concurrent recover() (any
            # fresh TableStore handle) rmtrees the dir mid-move and the
            # batch's staged files are destroyed — the same window
            # append_epoch covers (its assembly is a long Spark write,
            # so it heartbeats; this one is a handful of renames, one
            # sentinel write suffices under the 1 h grace)
            txn.mkdir(parents=True)
            (txn / "_INFLIGHT").write_text("")
            files: dict[str, list[str]] = {}
            for pid, path, _rows in staged:
                part_name = "." if pid is None else f"{PARTITION_COL}={pid}"
                dest = txn / self._table / ("" if pid is None else part_name)
                dest.mkdir(parents=True, exist_ok=True)
                name = Path(path).name
                Path(path).rename(dest / name)
                files.setdefault(part_name, []).append(name)
            colmap, _ = self._colmap()
            manifest = {
                "mode": "append",
                "stream_id": self._stream_id,
                "batch_id": int(batchId),
                "table": self._table,
                "files": {k: sorted(v) for k, v in files.items()},
                "schema": schema_json,
            }
            if colmap:
                manifest["colmap"] = {k: v for k, v in colmap.items() if k != v}
            # declared table constraints gate the staged files BEFORE
            # the claim (same order as append_epoch: claiming first
            # would wedge the batch slot forever) — Spark-free via the
            # footer probes + pyarrow scan fallback. The violation
            # fails the streaming batch; the checkpoint does NOT
            # advance, nothing publishes.
            try:
                meta._enforce_constraints(
                    self._table,
                    [
                        txn / self._table / (p if p != "." else "") / n
                        for p, ns in manifest["files"].items()
                        for n in ns
                    ],
                    manifest.get("colmap") or {},
                )
            except Exception:
                shutil.rmtree(txn, ignore_errors=True)
                raise
            tmp = txn / "MANIFEST.json.tmp"
            tmp.write_text(json.dumps(manifest))
            tmp.rename(txn / "MANIFEST.json")          # commit-ready
            if not meta._claim_epoch(self._stream_id, int(batchId), txn.name):
                shutil.rmtree(txn, ignore_errors=True)
                meta._complete_claimed_epoch(self._stream_id)
                return
            with meta._exclusive_lock():
                meta._publish_epoch(txn, manifest)
        finally:
            staging = Path(self._root) / SINK_STAGING / self._stream_id
            shutil.rmtree(staging, ignore_errors=True)

    def _payload_schema_json(self, staged) -> str:
        """LOGICAL payload schema for the txn manifest: the writer's
        declared schema minus the partition column when the query
        provided one, else (direct protocol drivers) one staged file's
        footer schema mapped back to logical names."""
        from pathlib import Path

        from geo_explorer_etl_spark.sources.store import PARTITION_COL

        if self._schema is not None:
            fields = [
                f for f in self._schema.fields if f.name != PARTITION_COL
            ]
            return T.StructType(fields).json()
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        colmap, _ = self._colmap()
        inv = {v: k for k, v in colmap.items()}
        phys = from_arrow_schema(
            pq.ParquetFile(staged[0][1]).schema_arrow
        )
        return T.StructType(
            [
                T.StructField(inv.get(f.name, f.name), f.dataType, True)
                for f in phys.fields
            ]
        ).json()

    def abort(self, messages, batchId: int) -> None:
        from pathlib import Path

        for m in messages:
            if m is None:
                continue
            for _pid, path, _rows in m.files or []:
                Path(path).unlink(missing_ok=True)


class StoreSinkDataSource(DataSource):
    """``df.writeStream.format("store")`` into a TableStore root.

    Options: ``path`` (store root, required), ``table`` (default
    IndicatorValues), ``backend`` (localfs|cas), ``stream_id`` (epoch
    ledger key — one per logical pipeline; defaults to a digest of
    the checkpoint location, the query's durable identity; with
    neither set the writer refuses rather than share a ledger key),
    ``bloom_cols`` (comma-separated key columns to bloom-index per
    published file — mirror the TableStore constructor's setting or
    streamed files lose point-lookup skipping until compacted).
    Append semantics; the frame should carry the partition column
    (IndicatorThemeId) like any append. For merge-by-key pipelines
    use ``incremental.merge_sink`` (the commit hook here runs without
    a SparkSession, and MERGE needs joins)."""

    @classmethod
    def name(cls) -> str:
        return "store"

    def streamWriter(self, schema: T.StructType, overwrite: bool) -> StoreStreamWriter:
        return StoreStreamWriter(schema, dict(self.options))
