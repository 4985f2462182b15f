"""The TableStore change feed as a native Spark STREAMING SOURCE
(VERDICT r9 directive #6).

``ChangeFeedReader`` (incremental.py) is a bespoke poll loop: callers
own the cadence, the callback, and the cursor. This module wraps the
same manifest-journal diff as a Python Data Source
(``spark.readStream.format("store_cdf")``), so a store's change feed
composes with EVERYTHING Structured Streaming offers — triggers
(including ``availableNow``), checkpointed exactly-once offsets,
watermarks, windowed aggs, and any sink — with no bespoke loop:

    spark.dataSource.register(StoreChangeFeedDataSource)
    (spark.readStream.format("store_cdf")
        .option("path", store_root).option("table", "IndicatorValues")
        .load()
        .writeStream.option("checkpointLocation", ck)
        .trigger(availableNow=True).start())

Execution shape (the 100 TB story):

- OFFSETS are commit timestamps. ``latestOffset`` runs driver-side on
  ``StoreMeta`` — plain JSON reads, no session — and clamps below the
  journal-pending floor exactly like ``ChangeFeedReader.poll``, so the
  checkpoint can never advance past a commit whose journal entry
  hasn't landed.
- ``partitions(start, end)`` is the same slice plan ``read_changes``
  uses (``TableStore._change_slices``): one InputPartition per changed
  file per commit, carrying the commit's schema, column mapping, and
  deletion-vector mask. Cost is proportional to CHANGED files.
- ``read(partition)`` runs on EXECUTORS with pyarrow (no SparkSession
  exists there): read the file, apply the position mask, rename
  physical→logical, align to the source schema, and yield Arrow
  RecordBatches — vectorized end to end, never row-at-a-time Python.

Exactly-once: offsets live in the query checkpoint; a killed and
restarted query replays the last uncommitted window from the same
``(start, end]`` and the slice plan is deterministic, so the sink sees
each commit window once (pytest-pinned across a kill).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from geo_explorer_etl_spark.sources.store import PARTITION_COL, StoreMeta

CHANGE_TYPE_COL = "_change_type"
COMMITTED_AT_COL = "_committed_at"


def cdf_output_schema(meta: StoreMeta, table: str) -> T.StructType:
    """Payload logical columns + partition id + the two CDF columns —
    the same surface ``TableStore.read_changes`` returns."""
    payload = meta.table_logical_schema(table)
    if payload is None:
        raise ValueError(
            f"store_cdf: table {table!r} at {meta.root} has no manifest-"
            "declared schema — publish through the manifest protocol first"
        )
    fields = [T.StructField(f.name, f.dataType, True) for f in payload.fields]
    fields.append(T.StructField(PARTITION_COL, T.LongType(), True))
    fields.append(T.StructField(CHANGE_TYPE_COL, T.StringType(), False))
    fields.append(T.StructField(COMMITTED_AT_COL, T.DoubleType(), False))
    return T.StructType(fields)


@dataclass
class CDFSlicePartition(InputPartition):
    """One changed file of one commit. Picklable by design (plain
    strings/floats/lists) — it ships to executors."""

    path: str
    kind: str
    ts: float
    colmap: dict
    mask: tuple | None
    partition_value: int | None
    out_schema_json: str = field(default="")


class StoreCDFStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict):
        self._schema = schema
        self._root = options["path"]
        self._table = options.get("table", "IndicatorValues")
        self._backend = options.get("backend", "localfs")
        self._start_at = float(options.get("start_at", 0.0) or 0.0)
        self._lag = float(options.get("watermark_lag", 2.0))

    def _meta(self) -> StoreMeta:
        return StoreMeta(self._root, self._backend)

    def initialOffset(self) -> dict:
        return {"ts": self._start_at}

    def latestOffset(self) -> dict:
        meta = self._meta()
        until = time.time() - self._lag
        # HARD bound (same rule as ChangeFeedReader.poll): never let
        # the checkpoint advance past a commit whose journal entry the
        # feed cannot see yet
        pending = meta.journal_pending_floor(self._table)
        if pending is not None:
            until = min(until, pending - 1e-6)
        return {"ts": max(until, self._start_at)}

    def partitions(self, start: dict, end: dict):
        since, until = float(start["ts"]), float(end["ts"])
        if until <= since:
            return []
        meta = self._meta()
        slices = meta._change_slices(self._table, since, until)
        # fail on vacuumed windows DRIVER-side, before any task runs
        from pathlib import Path

        for s in slices:
            if not Path(s["path"]).exists():
                raise FileNotFoundError(
                    f"store_cdf: change file vacuumed: {s['path']} — the "
                    "checkpointed window is outside vacuum retention"
                )
        out_json = self._schema.json()
        # a STREAMING source has ONE fixed schema — the CURRENT logical
        # names — so every era's slice renames its (stable) physical
        # column names through the CURRENT table mapping, not its own
        # era's: a commit made before a rename must stream the renamed
        # column's data under the new name, exactly where the fixed
        # schema expects it (the batch read_changes keeps era names
        # and unions — a luxury a fixed-schema source doesn't have)
        # ONE manifest pass feeds both the current mapping and the
        # schema-drift guard (review r9 wave 3 — partitions() was
        # sweeping the manifest set three times per microbatch)
        current_schema, current_colmap = meta.table_schema_colmap(self._table)
        # schema-drift guard (review r9 wave 2): the output schema was
        # captured at query start; a column RENAMED or DROPPED since
        # then would silently stream as all-NULL through the fixed
        # schema — fail loudly and ask for a restart instead. Columns
        # purely ADDED since start keep streaming (they just don't
        # surface until a restart adopts the wider schema).
        current_names = {
            f.name for f in (current_schema.fields if current_schema else [])
        } | {PARTITION_COL, CHANGE_TYPE_COL, COMMITTED_AT_COL}
        stale = sorted(
            f.name for f in self._schema.fields if f.name not in current_names
        )
        if stale:
            raise ValueError(
                f"store_cdf: column(s) {stale} were renamed or dropped "
                "while the stream was running — the fixed source schema "
                "would stream them as NULL; restart the query to adopt "
                "the new table schema"
            )
        parts = []
        for s in slices:
            raw = Path(s["path"]).parent.name.split("=", 1)
            try:
                pv: int | None = int(raw[1]) if len(raw) == 2 else None
            except ValueError:
                pv = None
            parts.append(
                CDFSlicePartition(
                    path=s["path"],
                    kind=s["kind"],
                    ts=float(s["ts"]),
                    # the CURRENT mapping, not the slice's era (fixed
                    # source schema — physical names are stable); the
                    # era schema is deliberately NOT shipped: read()
                    # aligns to out_schema_json alone
                    colmap=dict(current_colmap),
                    mask=s["mask"],
                    partition_value=pv,
                    out_schema_json=out_json,
                )
            )
        return parts

    def read(self, partition: CDFSlicePartition):
        """EXECUTOR-side slice materialization: pyarrow read + mask +
        physical→logical rename + alignment to the source schema,
        yielded as Arrow RecordBatches (vectorized hand-off)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        tbl = pq.read_table(partition.path)
        if partition.mask is not None:
            mode, positions = partition.mask
            sel = np.zeros(tbl.num_rows, dtype=bool)
            pos = np.asarray(positions, dtype="int64")
            # a position beyond the file is CORRUPTION (a sidecar
            # associated with the wrong/truncated file): silently
            # dropping it would, for an 'exclude' mask, resurrect a
            # deleted row in the feed — the failure mode _dv_positions
            # refuses to paper over. Raise, naming the slice (ADVICE r9).
            bad = pos[(pos < 0) | (pos >= tbl.num_rows)]
            if len(bad):
                raise ValueError(
                    f"store_cdf: deletion-vector position {int(bad[0])} out "
                    f"of range for {partition.path} ({tbl.num_rows} rows) — "
                    "mask/file mismatch; run fsck"
                )
            sel[pos] = True
            if mode == "exclude":
                sel = ~sel
            tbl = tbl.filter(pa.array(sel))
        inv = {v: k for k, v in (partition.colmap or {}).items()}
        tbl = tbl.rename_columns(
            [inv.get(c, c) for c in tbl.column_names]
        )
        out_struct = T.StructType.fromJson(__import__("json").loads(partition.out_schema_json))
        target = to_arrow_schema(out_struct)
        n = tbl.num_rows
        arrays = []
        for f in target:
            if f.name == CHANGE_TYPE_COL:
                arrays.append(pa.array([partition.kind] * n, type=f.type))
            elif f.name == COMMITTED_AT_COL:
                arrays.append(pa.array([partition.ts] * n, type=f.type))
            elif f.name == PARTITION_COL and PARTITION_COL not in tbl.column_names:
                arrays.append(pa.array([partition.partition_value] * n, type=f.type))
            elif f.name in tbl.column_names:
                arrays.append(
                    tbl.column(f.name).combine_chunks().cast(f.type)
                )
            else:  # pre-evolution file: surface the column as nulls
                arrays.append(pa.nulls(n, type=f.type))
        yield from pa.Table.from_arrays(arrays, schema=target).to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets are owned by the query checkpoint


class StoreChangeFeedDataSource(DataSource):
    """``spark.readStream.format("store_cdf")`` over a TableStore root.

    Options: ``path`` (store root, required), ``table`` (default
    IndicatorValues), ``backend`` (localfs|cas), ``start_at`` (epoch
    seconds; a fresh subscriber on a mature store should pass now()
    — same contract as ChangeFeedReader), ``watermark_lag`` (seconds,
    default 2.0)."""

    @classmethod
    def name(cls) -> str:
        return "store_cdf"

    def schema(self) -> T.StructType:
        meta = StoreMeta(
            self.options["path"], self.options.get("backend", "localfs")
        )
        return cdf_output_schema(
            meta, self.options.get("table", "IndicatorValues")
        )

    def streamReader(self, schema: T.StructType) -> StoreCDFStreamReader:
        return StoreCDFStreamReader(schema, self.options)
