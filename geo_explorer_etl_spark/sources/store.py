"""Table store: the SQL Server sink re-imagined for Spark
(SURVEY.md §2.1 S8–S11, §2.12 I2).

Parquet tables partitioned by ``IndicatorThemeId`` (the product id)
give the reference's delete-then-append product replace (reference
scdb.py:32–72) as an atomic-per-partition dynamic overwrite — no
6-table cascading DELETE, no transaction bookkeeping. Delta/Iceberg
would add cross-table atomicity; their jars aren't in this image, so
the store isolates the commit protocol behind one class (swap the
implementation, keep the pipeline).

At 100 TB: partitioning by product bounds every replace to the files
of one product; appends never rewrite history; readers prune on
partition column automatically.
"""

from __future__ import annotations

import json
from contextlib import contextmanager
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COMMITTED = "_committed.json"  # per-partition live-file manifest (hidden from Spark's own discovery by the leading underscore)


# -- file-level data skipping -----------------------------------------------
# Manifests carry per-file column min/max ("zone maps"), harvested from
# the parquet footers at commit time (publish / append / compact). A
# predicate-bearing read then drops files whose stats PROVE no row can
# match — below the IndicatorThemeId partition grain, this is the
# single biggest scan reducer for the web app's per-indicator reads
# (SURVEY §2.14 filters far below product grain). Skipping is purely an
# optimization: the same predicate is also applied as a real filter on
# the returned frame, so a file kept conservatively (no stats, type
# mismatch, legacy manifest) never changes the result.


def _norm_stat(v):
    """Normalize a footer statistic (or a caller's predicate value) to a
    JSON-storable, order-preserving scalar: numbers stay numeric,
    date/datetime become ISO strings (lexicographic == chronologic),
    bytes decode to str. None = not comparable -> no pruning on it.
    Decimals are excluded: their string form does not order correctly
    and floating them would be lossy."""
    import datetime

    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, str):
        return v
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, datetime.datetime):
        # normalize tz-aware stats (parquet isAdjustedToUTC) to naive
        # UTC so they compare exactly against naive-UTC caller values
        # (the session timezone is pinned to UTC) — an appended "+00:00"
        # suffix would corrupt lexicographic ordering at equal instants
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return None


def _temporal_shape(s: str) -> str:
    """Classify a normalized string stat/bound: 'date' (exactly
    YYYY-MM-DD), 'datetime' (ISO date + 'T' time), or 'str' (anything
    else). Pruning only compares strings of the SAME shape: a date
    predicate against timestamp stats (or vice versa) normalizes to
    mixed granularity ('2024-01-15' vs '2024-01-15T08:30:00') where
    lexicographic order no longer tracks Spark's re-applied filter
    semantics (date→timestamp midnight cast) — and for genuine string
    columns holding ISO-looking values, any granularity "expansion"
    would be unsound. Mixed shape ⇒ non-comparable ⇒ keep the file."""
    import re

    if re.fullmatch(r"\d{4}-\d{2}-\d{2}", s):
        return "date"
    if re.fullmatch(r"\d{4}-\d{2}-\d{2}T.*", s):
        return "datetime"
    return "str"


def _stat_comparable(a, b) -> bool:
    num = (int, float)
    if isinstance(a, num) and isinstance(b, num):
        return True
    if isinstance(a, str) and isinstance(b, str):
        return _temporal_shape(a) == _temporal_shape(b)
    return False


def _parquet_file_stats(path: Path) -> tuple[dict[str, list], int] | None:
    """Per-column [min, max] over all row groups of one parquet file,
    plus the file's exact row count — one footer read, no data pages.
    Columns whose stats are missing in ANY row group are omitted
    (unknown -> never pruned). Parquet's truncated string stats are
    safe here: a truncated min is a prefix (<= the true min), a
    truncated max is prefix+1 (>= the true max), so the bounds stay
    conservative."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(str(path)).metadata
    except Exception:
        return None
    out: dict[str, list] = {}
    bad: set[str] = set()
    for rg in range(md.num_row_groups):
        row = md.row_group(rg)
        for ci in range(row.num_columns):
            col = row.column(ci)
            name = col.path_in_schema
            if "." in name or name in bad:  # nested leaf: not top-level-pruneable
                continue
            st = col.statistics
            has = st is not None and st.has_min_max
            mn = _norm_stat(st.min) if has else None
            mx = _norm_stat(st.max) if has else None
            if mn is None or mx is None:
                bad.add(name)
                out.pop(name, None)
                continue
            if name in out:
                prev_mn, prev_mx = out[name]
                if not (_stat_comparable(prev_mn, mn) and _stat_comparable(prev_mx, mx)):
                    bad.add(name)
                    out.pop(name, None)
                    continue
                out[name] = [min(prev_mn, mn), max(prev_mx, mx)]
            else:
                out[name] = [mn, mx]
    return out, md.num_rows


def _normalize_bound(val):
    v = _norm_stat(val)
    return v


def _file_may_match(stats: dict[str, list] | None, where) -> bool:
    """Conservative zone-map check: False only when some predicate is
    PROVEN empty against the file's [min, max]. Parquet min/max exclude
    nulls, and every supported op is null-rejecting, so pruning on
    non-null bounds is sound."""
    for col, op, val in where:
        s = (stats or {}).get(col)
        if not s:
            continue
        mn, mx = s
        if op == "between":
            lo, hi = _normalize_bound(val[0]), _normalize_bound(val[1])
            # every pair that gets compared must be comparable (same
            # numeric kind, or strings of the same temporal shape) —
            # a mixed (lo, hi) bound pair or mixed-granularity stats
            # fall back to keeping the file, never a TypeError
            if (
                lo is None
                or hi is None
                or not _stat_comparable(lo, hi)
                or not _stat_comparable(mn, lo)
                or not _stat_comparable(mx, hi)
            ):
                continue
            if mx < lo or mn > hi:
                return False
            continue
        v = _normalize_bound(val)
        if v is None or not _stat_comparable(mn, v):
            continue
        if op == "==" and (v < mn or v > mx):
            return False
        if op == "!=" and mn == mx == v:
            return False  # single-valued file: every row equals v
        if op == ">=" and mx < v:
            return False
        if op == ">" and mx <= v:
            return False
        if op == "<=" and mn > v:
            return False
        if op == "<" and mn >= v:
            return False
    return True


def _merge_schemas(a, b):
    """Union of two payload schemas for schema evolution: fields by
    name, ``a``'s order first, new fields appended; same-name fields
    must agree on type (nullability is coerced to nullable — evolved
    columns are null for pre-evolution files). A type conflict raises:
    silent coercion would corrupt the zone maps and the readback."""
    from pyspark.sql import types as T

    by_name = {f.name: f for f in a.fields}
    out = [T.StructField(f.name, f.dataType, True) for f in a.fields]
    for f in b.fields:
        ex = by_name.get(f.name)
        if ex is None:
            by_name[f.name] = f
            out.append(T.StructField(f.name, f.dataType, True))
        elif ex.dataType != f.dataType:
            raise ValueError(
                f"schema evolution type conflict on {f.name!r}: "
                f"{ex.dataType.simpleString()} vs {f.dataType.simpleString()}"
            )
    return T.StructType(out)


def _schema_from_json(schema_json: str):
    from pyspark.sql import types as T

    return T.StructType.fromJson(json.loads(schema_json))


def _where_expr(where):
    """The where-list as a Spark Column (ANDed) — applied to the pruned
    frame so results never depend on stats quality."""
    import functools

    exprs = []
    for col, op, val in where:
        c = F.col(col)
        if op == "==":
            exprs.append(c == val)
        elif op == "!=":
            exprs.append(c != val)
        elif op == ">=":
            exprs.append(c >= val)
        elif op == ">":
            exprs.append(c > val)
        elif op == "<=":
            exprs.append(c <= val)
        elif op == "<":
            exprs.append(c < val)
        elif op == "between":
            exprs.append(c.between(val[0], val[1]))
        else:
            raise ValueError(f"unsupported predicate op {op!r}")
    return functools.reduce(lambda a, b: a & b, exprs)

# Tables partitioned by product (replace unit). Lookup tables
# (GeographyReference, GeographicLevel, NullReason) are unpartitioned.
PRODUCT_TABLES = [
    "IndicatorTheme",
    "Dimensions",
    "DimensionValues",
    "Indicators",
    "IndicatorValues",
    "GeographyReferenceForIndicator",
    "GeographicLevelForIndicator",
    "IndicatorMetaData",
    "RelatedCharts",
]
PARTITION_COL = "IndicatorThemeId"


class TableStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        # dynamic mode: overwrite only the partitions present in the
        # incoming frame — this IS the product-replace primitive
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # never write INT96 timestamps: they carry no parquet min/max
        # stats, which would blind the manifest zone maps (and Spark's
        # own row-group skipping) for every timestamp column
        spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # roll forward / roll back any replace_product_all transaction
        # a previous process died inside — readers through a fresh
        # store handle always see a consistent all-old or all-new state
        self.recover()

    def _path(self, table: str) -> str:
        return f"{self.root}/{table}"

    @contextmanager
    def _exclusive_lock(self):
        """Cross-process mutual exclusion for recover()/publish: two
        processes opening the store while a committed txn is publishing
        must not both enter _publish on the same txn dir (the bare
        ``staged.exists()`` guard is TOCTOU). flock works on local and
        NFS filesystems; on an object store a table format's own commit
        service would replace this class wholesale."""
        import fcntl

        Path(self.root).mkdir(parents=True, exist_ok=True)
        f = open(Path(self.root) / "_lock", "w")
        try:
            fcntl.flock(f, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(f, fcntl.LOCK_UN)
            f.close()

    def exists(self, table: str) -> bool:
        return Path(self._path(table)).exists()

    def _live_files(self, table_dir: Path, where=None) -> list[str]:
        """Resolve the table's live data files through the per-partition
        ``_committed.json`` manifests (snapshot isolation: a publish
        swaps the manifest atomically and leaves the previous version's
        files on disk until vacuum(), so an in-flight reader whose plan
        captured the old list keeps reading consistent all-old data).
        Partitions without a manifest — plain appends, legacy layouts —
        fall back to directory listing, where every file is live.

        ``where`` (list of ``(col, op, value)``) enables file-level data
        skipping against the manifest's per-file min/max stats, plus
        partition-dir skipping when a predicate names PARTITION_COL —
        both conservative (a file without stats for the column is kept)."""
        files: list[str] = []
        for entry in sorted(table_dir.iterdir()):
            if entry.is_dir() and entry.name.startswith(f"{PARTITION_COL}="):
                if where:
                    raw = entry.name.split("=", 1)[1]
                    try:
                        pv: float | str = int(raw)
                    except ValueError:
                        pv = raw
                    if not _file_may_match({PARTITION_COL: [pv, pv]}, where):
                        continue
                cm = entry / COMMITTED
                if cm.exists():
                    manifest = json.loads(cm.read_text())
                    stats = manifest.get("stats", {})
                    for n in manifest["files"]:
                        if where and not _file_may_match(stats.get(n), where):
                            continue
                        files.append(str(entry / n))
                else:
                    files += sorted(str(f) for f in entry.glob("*.parquet"))
            elif entry.suffix == ".parquet":
                files.append(str(entry))
        return files

    def live_files(self, table: str, where=None) -> list[str]:
        """The exact file list a ``read(table, where)`` would scan —
        the listing probe tests and ops tooling use to verify skipping."""
        p = Path(self._path(table))
        if not p.exists():
            return []
        return self._live_files(p, where)

    def read(self, table: str, where=None) -> DataFrame | None:
        """None when the table has no data yet (including the
        every-partition-deleted state). Reads resolve through the
        committed manifests — the explicit file list (with basePath so
        the partition column survives) is the same mechanism a table
        format's snapshot read uses, and costs one driver-side listing,
        no extra Spark jobs.

        ``where`` is a list of ``(col, op, value)`` with op in
        ``== >= > <= < between`` (between takes a ``(lo, hi)`` value):
        the predicates prune the FILE LIST through the manifest zone
        maps (min/max harvested from parquet footers at commit), then
        are applied as a real ``filter`` on the frame — so the result
        is always identical to ``read(table).filter(...)``, just
        without opening files that provably hold no matching row. At
        100 TB this is the difference between scanning a product's
        whole history and touching only the files covering one RefDate
        range."""
        p = Path(self._path(table))
        if not p.exists():
            return None
        schema = self._declared_schema(p)
        reader = self.spark.read.option("basePath", str(p))
        if schema is not None:
            # declared union schema: pre-evolution files surface new
            # columns as nulls, subset-appended files surface missing
            # ones — without a mergeSchema scan of every footer
            reader = reader.schema(schema)
        files = self._live_files(p, where)
        if not files:
            if where:
                # every file pruned, but the TABLE may have data: return
                # an empty frame with the real schema (one footer read),
                # not None — None means "no data at all"
                all_files = self._live_files(p)
                if all_files:
                    return reader.parquet(all_files[0]).filter(F.lit(False))
            return None
        df = reader.parquet(*files)
        if where:
            df = df.filter(_where_expr(where))
        return df

    def read_at(self, table: str, as_of: float) -> DataFrame | None:
        """TIME TRAVEL (TIMESTAMP AS OF): the table as of wall-clock
        ``as_of`` (epoch seconds). Each partition resolves the latest
        history manifest committed at or before ``as_of`` — partitions
        first committed later are absent, exactly as they were then.
        Works as far back as vacuum retention lets the superseded DATA
        files live (the Delta contract: history manifests are
        metadata-sized and kept; ``vacuum(older_than_seconds=W)``
        bounds how old a snapshot remains materializable). Returns None
        when nothing existed yet."""
        p = Path(self._path(table))
        if not p.exists():
            return None
        files: list[str] = []
        schemas = []
        for entry in sorted(p.iterdir()):
            if not (entry.is_dir() and entry.name.startswith(f"{PARTITION_COL}=")):
                continue
            hist = entry / "_history"
            if not hist.exists():
                continue
            best = None
            for h in sorted(hist.glob("*.json")):
                m = json.loads(h.read_text())
                if m.get("committed_at", 0) <= as_of:
                    best = m          # sorted names: last match = latest
                else:
                    break
            if best is None:
                continue
            files += [str(entry / n) for n in best["files"]]
            if best.get("schema"):
                schemas.append(_schema_from_json(best["schema"]))
        if not files:
            return None
        reader = self.spark.read.option("basePath", str(p))
        if schemas:
            import functools

            reader = reader.schema(functools.reduce(_merge_schemas, schemas))
        return reader.parquet(*files)

    def restore(self, table: str, as_of: float) -> int:
        """RESTORE (rollback): make the ``as_of`` snapshot current
        again, per partition, by republishing that version's manifest —
        a metadata-only operation (no data rewrite; the files must
        still exist, i.e. lie within vacuum retention — checked, with a
        clear error naming the first missing file). Partitions born
        after ``as_of`` are emptied (their manifest becomes a zero-file
        list; history keeps every prior version, so a restore is itself
        restorable). Returns the number of partitions whose manifest
        changed. Takes the store lock like any publish."""
        p = Path(self._path(table))
        if not p.exists():
            return 0
        changed = 0
        with self._exclusive_lock():
            for entry in sorted(p.iterdir()):
                if not (entry.is_dir() and entry.name.startswith(f"{PARTITION_COL}=")):
                    continue
                hist = entry / "_history"
                cm = entry / COMMITTED
                if not hist.exists() or not cm.exists():
                    continue
                best = None
                for h in sorted(hist.glob("*.json")):
                    m = json.loads(h.read_text())
                    if m.get("committed_at", 0) <= as_of:
                        best = m
                    else:
                        break
                current = json.loads(cm.read_text())
                target_files = best["files"] if best else []
                if target_files == current["files"]:
                    continue
                for n in target_files:
                    if not (entry / n).exists():
                        raise FileNotFoundError(
                            f"restore target file vacuumed: {entry / n} — the "
                            f"{as_of} snapshot is outside vacuum retention"
                        )
                self._write_committed(
                    entry,
                    target_files,
                    prior_stats=(best or {}).get("stats"),
                    schema_json=(best or {}).get("schema"),
                    prior_rows=(best or {}).get("rows"),
                )
                changed += 1
        return changed

    def count_rows(self, table: str) -> int:
        """Metadata-only table row count: live file counts are summed
        from the manifests (recorded at commit from the parquet
        footers), so a full-table COUNT(*) touches no data pages and
        launches no Spark job for manifest-covered files. Files outside
        manifest coverage (legacy/listing partitions) are counted with
        one scan over exactly those files. At 100 TB this is the
        difference between a metadata lookup and a cluster-wide scan —
        the same trick a table format's snapshot row-count serves."""
        p = Path(self._path(table))
        if not p.exists():
            return 0
        total = 0
        unknown: list[str] = []
        for entry in sorted(p.iterdir()):
            if entry.is_dir() and entry.name.startswith(f"{PARTITION_COL}="):
                cm = entry / COMMITTED
                if cm.exists():
                    manifest = json.loads(cm.read_text())
                    rows = manifest.get("rows", {})
                    for n in manifest["files"]:
                        if n in rows:
                            total += int(rows[n])
                        else:
                            unknown.append(str(entry / n))
                else:
                    unknown += sorted(str(f) for f in entry.glob("*.parquet"))
            elif entry.suffix == ".parquet":
                unknown.append(str(entry))
        if unknown:
            total += self.spark.read.parquet(*unknown).count()
        return total

    def _declared_schema(self, table_dir: Path):
        """Merged declared payload schema across the table's manifest
        partitions, or None for fully-legacy layouts (plain inference).
        Partitions without a declared schema contribute one live file's
        footer schema (driver cost bounded by PARTITION count, not file
        count — intra-partition evolution only happens through manifest
        commits, so one file per legacy partition is representative)."""
        import functools

        declared = []
        probes: list[Path] = []
        for entry in sorted(table_dir.iterdir()):
            if entry.is_dir() and entry.name.startswith(f"{PARTITION_COL}="):
                cm = entry / COMMITTED
                if cm.exists():
                    manifest = json.loads(cm.read_text())
                    if manifest.get("schema"):
                        declared.append(_schema_from_json(manifest["schema"]))
                    elif manifest["files"]:
                        probes.append(entry / manifest["files"][0])
                else:
                    fs = sorted(entry.glob("*.parquet"))
                    if fs:
                        probes.append(fs[0])
            elif entry.suffix == ".parquet":
                probes.append(entry)
        if not declared:
            return None  # legacy store: schema inference, as always
        for f in probes:
            declared.append(self.spark.read.parquet(str(f)).schema)
        return functools.reduce(_merge_schemas, declared)

    # -- S10: append sink --------------------------------------------------
    def append(self, table: str, df: DataFrame) -> None:
        """Append rows; product tables keep their partition layout (a
        bare-file append into a partitioned directory would make the
        rows invisible to partition discovery). Partitions already under
        manifest control get their manifest extended with exactly the
        newly-written files, so the append is visible without
        resurrecting unvacuumed previous-version files.

        SCHEMA EVOLUTION: the appended frame may carry a superset or
        subset of the partition's current schema — exactly how a cube's
        dimension tail varies between refreshes (the reference discovers
        dimensions at runtime, dfhandler.py:21–22). The manifest's
        declared schema becomes the UNION (new columns appended, missing
        columns stay); reads declare that union so old files surface the
        new columns as nulls and subset-appended files surface the
        missing ones as nulls — no mergeSchema footer-scan, no file
        rewrite. Same-name-different-type raises before anything is
        written."""
        p = Path(self._path(table))
        payload_schema = df.drop(PARTITION_COL).schema if PARTITION_COL in df.columns else df.schema
        before: dict[Path, set[str]] = {}
        prior_schemas: dict[Path, object] = {}
        if p.exists():
            for part in p.glob(f"{PARTITION_COL}=*"):
                cm = part / COMMITTED
                if cm.exists():
                    before[part] = {f.name for f in part.glob("*.parquet")}
                    manifest = json.loads(cm.read_text())
                    if manifest.get("schema"):
                        prior = _schema_from_json(manifest["schema"])
                    elif manifest["files"]:
                        # legacy manifest: derive the partition schema
                        # from one live file's footer
                        prior = self.spark.read.parquet(
                            str(part / manifest["files"][0])
                        ).schema
                    else:
                        prior = None
                    # validate type compatibility BEFORE writing
                    prior_schemas[part] = (
                        _merge_schemas(prior, payload_schema) if prior else payload_schema
                    )
        w = df.write.mode("append")
        if PARTITION_COL in df.columns:
            w = w.partitionBy(PARTITION_COL)
        w.parquet(self._path(table))
        for part, old_names in before.items():
            new_names = {f.name for f in part.glob("*.parquet")} - old_names
            if new_names:
                cm = part / COMMITTED
                manifest = json.loads(cm.read_text())
                names = manifest["files"] + sorted(new_names)
                # reuse the existing files' stats — only the appended
                # files pay a footer read
                self._write_committed(
                    part,
                    names,
                    prior_stats=manifest.get("stats"),
                    schema_json=prior_schemas[part].json(),
                    prior_rows=manifest.get("rows"),
                )

    @staticmethod
    def _write_committed(
        part_dir: Path,
        names: list[str],
        prior_stats: dict | None = None,
        schema_json: str | None = None,
        prior_rows: dict | None = None,
    ) -> None:
        """Atomic manifest swap (the snapshot point), carrying per-file
        zone maps, per-file row counts, and (when known) the partition's
        declared payload schema. Stats are harvested from each file's
        footer at commit time — one metadata read per NEW file
        (``prior_stats``/``prior_rows`` carry forward entries for files
        already profiled). A file whose stats can't be read simply gets
        no entry (kept by every predicate-bearing read, scanned by
        metadata-only counts — conservative, never wrong)."""
        stats: dict[str, dict] = {}
        rows: dict[str, int] = {}
        for n in names:
            if prior_stats and n in prior_stats:
                stats[n] = prior_stats[n]
                if prior_rows and n in prior_rows:
                    rows[n] = prior_rows[n]
                continue
            st = _parquet_file_stats(part_dir / n)
            if st:
                stats[n], rows[n] = st
        import time
        import uuid

        manifest: dict = {
            "files": names,
            "stats": stats,
            "rows": rows,
            "committed_at": time.time(),
        }
        if schema_json is not None:
            manifest["schema"] = schema_json
        body = json.dumps(manifest)
        tmp = part_dir / (COMMITTED + ".tmp")
        tmp.write_text(body)
        tmp.rename(part_dir / COMMITTED)  # atomic swap: the snapshot point
        # append-only version history for time travel (read_at): one
        # tiny JSON per commit, named so lexicographic order = commit
        # order. History is metadata-sized; vacuum governs how far back
        # the DATA files survive (the Delta retention contract).
        hist = part_dir / "_history"
        hist.mkdir(exist_ok=True)
        (hist / f"{manifest['committed_at']:020.6f}-{uuid.uuid4().hex[:8]}.json").write_text(body)

    # -- S11 + I2: idempotent product replace ------------------------------
    def replace_product(self, table: str, df: DataFrame, product_id: int) -> None:
        """Replace exactly one product's rows: write partitioned by
        product id with dynamic partition overwrite. The frame must
        carry PARTITION_COL (added here when absent). This legacy
        single-table path rewrites the partition dir in place (no
        snapshot for in-flight readers — use replace_product_all for
        the transactional publish); any manifest left from a previous
        transactional publish is dropped so the freshly-written files
        are live under listing mode."""
        if PARTITION_COL not in df.columns:
            df = df.withColumn(PARTITION_COL, F.lit(product_id).cast("long"))
        (
            df.write.mode("overwrite")
            .partitionBy(PARTITION_COL)
            .parquet(self._path(table))
        )
        cm = Path(self._path(table)) / f"{PARTITION_COL}={product_id}" / COMMITTED
        cm.unlink(missing_ok=True)

    # -- I2 at cross-table scope: atomic multi-table product replace ------
    # The reference wraps its 6-table cascading DELETE + inserts in one
    # RDBMS transaction (reference scdb.py:51–71). On a filesystem the
    # same guarantee comes from write-ahead intent + roll-forward:
    #
    #   1. STAGE   every table's new partition payload under
    #              _staging/txn_{pid}/<table>/ (no live dir touched);
    #   2. INTENT  write MANIFEST.json into the txn dir via tmp+rename
    #              (the atomic commit point);
    #   3. PUBLISH swap each table's IndicatorThemeId={pid} dir for the
    #              staged one.
    #
    # A crash before (2) leaves the live tables untouched (recover()
    # discards the orphan staging dir -> all-OLD). A crash after (2)
    # is completed by recover() on the next store open (roll-forward
    # -> all-NEW). Readers opening the store never observe a mix.
    # In-flight readers during PUBLISH are covered by manifest
    # indirection: staged files move into the partition dir under
    # their (UUID-unique) names, then the partition's _committed.json
    # swaps atomically — a reader whose plan resolved the old manifest
    # keeps scanning the old files, which stay on disk until vacuum().
    def replace_product_all(
        self, product_id: int, frames: dict[str, DataFrame]
    ) -> None:
        import shutil

        with self._exclusive_lock():
            txn = Path(self.root) / "_staging" / f"txn_{product_id}"
            if txn.exists():
                shutil.rmtree(txn)
            txn.mkdir(parents=True)
            schemas: dict[str, str] = {}
            for table, df in frames.items():
                if PARTITION_COL in df.columns:
                    df = df.drop(PARTITION_COL)
                # payload files exclude the partition column, exactly like
                # a partitioned write's IndicatorThemeId={pid} directory
                df.write.parquet(str(txn / table))
                schemas[table] = df.schema.json()
            manifest = {
                "product_id": product_id,
                "tables": sorted(frames),
                # captured at commit time so a redo after a mid-publish
                # crash knows exactly which target files belong to this
                # txn (some may already have moved out of staging)
                "files": {
                    t: sorted(f.name for f in (txn / t).glob("*.parquet"))
                    for t in frames
                },
                # declared payload schema per table: a replace RESETS the
                # partition's schema to the new frames' (old files are
                # superseded, so no union with history)
                "schemas": schemas,
            }
            tmp = txn / "MANIFEST.json.tmp"
            tmp.write_text(json.dumps(manifest))
            tmp.rename(txn / "MANIFEST.json")          # commit point
            self._publish(txn, manifest)

    def _publish(self, txn: Path, manifest: dict, fail_after: int | None = None) -> None:
        """Move each table's staged files into its partition dir, then
        atomically swap that partition's _committed.json to the new file
        list. Idempotent: a redo re-moves whatever is still staged and
        rewrites the same manifests. Caller holds the store lock (or is
        a test driving the crash hook). ``fail_after`` simulates a crash
        after N tables are published."""
        import shutil

        pid = manifest["product_id"]
        if "files" not in manifest:
            # manifest from an older layout (or hand-built in tests):
            # amend it with the staged file lists before touching any
            # live dir, so a crash mid-publish still leaves a redo-able
            # record of which files are this txn's
            manifest["files"] = {
                t: sorted(f.name for f in (txn / t).glob("*.parquet"))
                for t in manifest["tables"]
                if (txn / t).exists()
            }
            tmp = txn / "MANIFEST.json.tmp"
            tmp.write_text(json.dumps(manifest))
            tmp.rename(txn / "MANIFEST.json")
        for n, table in enumerate(manifest["tables"]):
            if fail_after is not None and n >= fail_after:
                raise RuntimeError(f"simulated crash after {fail_after} swaps")
            names = manifest["files"].get(table, [])
            if not names:
                continue
            target = Path(self._path(table)) / f"{PARTITION_COL}={pid}"
            target.mkdir(parents=True, exist_ok=True)
            for name in names:
                src = txn / table / name
                if src.exists():
                    try:
                        src.rename(target / name)
                    except FileNotFoundError:
                        pass                       # concurrent recover won
            self._write_committed(                 # snapshot point
                target, names, schema_json=manifest.get("schemas", {}).get(table)
            )
        shutil.rmtree(txn)

    # -- exactly-once streaming epochs ------------------------------------
    # foreachBatch can REPLAY a micro-batch after a failure (the
    # checkpoint only guarantees at-least-once delivery to the sink);
    # exactly-once therefore needs an idempotent sink. Epoch appends
    # ride the same write-ahead txn machinery as replace_product_all:
    # stage -> MANIFEST rename (commit point, carrying stream + batch
    # id) -> publish EXTENDS the partition manifests (idempotent: file
    # moves skip already-moved files, name lists dedupe) -> the epoch
    # ledger (_epochs.json, tmp+rename) records the batch LAST, then
    # staging is removed. A replay of a ledger-recorded batch is a
    # no-op before it stages anything; a crash at any point either
    # rolls back (no manifest) or rolls forward (recover() completes
    # the publish and the ledger entry) — rows land exactly once.

    def _epoch_ledger(self) -> dict:
        f = Path(self.root) / "_epochs.json"
        return json.loads(f.read_text()) if f.exists() else {}

    def _record_epoch(self, stream_id: str, batch_id: int) -> None:
        ledger = self._epoch_ledger()
        ledger[stream_id] = max(int(batch_id), int(ledger.get(stream_id, -1)))
        tmp = Path(self.root) / "_epochs.json.tmp"
        tmp.write_text(json.dumps(ledger))
        tmp.rename(Path(self.root) / "_epochs.json")

    def append_epoch(
        self, stream_id: str, batch_id: int, table: str, df: DataFrame
    ) -> bool:
        """Idempotent micro-batch append: returns False (no-op) when
        ``batch_id`` is already recorded for ``stream_id`` — the replay
        case — else stages, commits, and publishes the batch through
        the manifest protocol. Structured Streaming batch ids are
        monotonic per query, which is what the ledger's high-water
        check relies on. Readers get the same snapshot isolation as a
        publish: rows become visible at the atomic manifest swap.

        LOCK SCOPE: the Spark staging write — by far the longest part
        of the batch — runs OUTSIDE the store lock (the staging dir is
        uniquely named per stream/batch, touching nothing live), so
        concurrent store opens / publishes / vacuums are not blocked
        for the whole batch-write duration. The lock is taken only for
        the authoritative ledger check, the MANIFEST commit rename,
        and the publish; the unlocked pre-check just short-circuits
        obvious replays before paying the staging write."""
        import shutil

        if int(batch_id) <= int(self._epoch_ledger().get(stream_id, -1)):
            return False                               # replay fast-path
        txn = Path(self.root) / "_staging" / f"etxn_{stream_id}_{batch_id}"
        if txn.exists():
            shutil.rmtree(txn)
        txn.mkdir(parents=True)
        # sentinel: this manifest-less staging dir is live (being
        # written OUTSIDE the lock) — a concurrent recover() must not
        # roll it back unless the sentinel has gone stale (crashed
        # writer), see recover()'s grace window
        (txn / "_INFLIGHT").write_text("")
        w = df.write
        if PARTITION_COL in df.columns:
            w = w.partitionBy(PARTITION_COL)
        w.parquet(str(txn / table))
        payload_schema = (
            df.drop(PARTITION_COL).schema if PARTITION_COL in df.columns else df.schema
        )
        files: dict[str, list[str]] = {}
        tdir = txn / table
        parts = sorted(d.name for d in tdir.glob(f"{PARTITION_COL}=*"))
        if parts:
            for d in parts:
                files[d] = sorted(
                    f.name for f in (tdir / d).glob("*.parquet")
                )
        else:
            files["."] = sorted(f.name for f in tdir.glob("*.parquet"))
        manifest = {
            "mode": "append",
            "stream_id": stream_id,
            "batch_id": int(batch_id),
            "table": table,
            "files": files,
            "schema": payload_schema.json(),
        }
        with self._exclusive_lock():
            if int(batch_id) <= int(self._epoch_ledger().get(stream_id, -1)):
                shutil.rmtree(txn)                     # lost the race: replay
                return False
            tmp = txn / "MANIFEST.json.tmp"
            tmp.write_text(json.dumps(manifest))
            tmp.rename(txn / "MANIFEST.json")          # commit point
            self._publish_epoch(txn, manifest)
            return True

    def _publish_epoch(
        self, txn: Path, manifest: dict, fail_after: int | None = None
    ) -> None:
        """Roll an epoch txn forward: move staged files into the live
        partition dirs, EXTEND each partition's manifest (deduped, so a
        redo after a crash converges), record the ledger entry, drop
        the staging dir. Idempotent end to end; caller holds the lock
        (or is a test driving the crash hook)."""
        import shutil

        table = manifest["table"]
        for n_done, (part_name, names) in enumerate(sorted(manifest["files"].items())):
            if fail_after is not None and n_done >= fail_after:
                raise RuntimeError(f"simulated crash after {fail_after} partitions")
            if part_name == ".":
                target = Path(self._path(table))
                src_dir = txn / table
            else:
                target = Path(self._path(table)) / part_name
                src_dir = txn / table / part_name
            target.mkdir(parents=True, exist_ok=True)
            for name in names:
                src = src_dir / name
                if src.exists():
                    try:
                        src.rename(target / name)
                    except FileNotFoundError:
                        pass                       # concurrent recover won
            if part_name == ".":
                continue  # unpartitioned root appends stay listing-mode
            cm = target / COMMITTED
            if cm.exists():
                prior = json.loads(cm.read_text())
                merged = prior["files"] + [n for n in names if n not in prior["files"]]
                prior_schema = (
                    _merge_schemas(
                        _schema_from_json(prior["schema"]),
                        _schema_from_json(manifest["schema"]),
                    ).json()
                    if prior.get("schema")
                    else manifest["schema"]
                )
                self._write_committed(
                    target,
                    merged,
                    prior_stats=prior.get("stats"),
                    schema_json=prior_schema,
                    prior_rows=prior.get("rows"),
                )
            else:
                # first manifest for this partition: everything listed
                # on disk is live (listing-mode history) plus the batch.
                # The declared schema must UNION one legacy file's footer
                # schema with the batch's (mirroring append()): declaring
                # only the batch schema would silently drop columns that
                # exist solely in the legacy files, and a same-name type
                # conflict should fail loud here, not at scan time.
                existing = sorted(
                    f.name for f in target.glob("*.parquet") if f.name not in names
                )
                declared = _schema_from_json(manifest["schema"])
                if existing:
                    legacy = self.spark.read.parquet(str(target / existing[0])).schema
                    declared = _merge_schemas(legacy, declared)
                self._write_committed(
                    target, existing + names, schema_json=declared.json()
                )
        self._record_epoch(manifest["stream_id"], manifest["batch_id"])
        shutil.rmtree(txn)

    INFLIGHT_GRACE_SECONDS = 3600.0

    def recover(self) -> None:
        """Complete (roll forward) any committed-but-unpublished
        transaction — replace or epoch-append; discard (roll back) any
        uncommitted staging. Exclusive-locked: concurrent store opens
        serialize here instead of double-publishing. A manifest-less
        staging dir carrying a FRESH ``_INFLIGHT`` sentinel belongs to
        a writer currently staging OUTSIDE the lock (append_epoch's
        unlocked batch write) and is left alone; the sentinel going
        stale (> INFLIGHT_GRACE_SECONDS) marks a crashed writer and
        the dir is rolled back as before."""
        import shutil
        import time

        staging = Path(self.root) / "_staging"
        if not staging.exists():
            return
        with self._exclusive_lock():
            if not staging.exists():
                return
            for txn in staging.iterdir():
                if not txn.is_dir():
                    continue
                mf = txn / "MANIFEST.json"
                if not mf.exists():
                    sentinel = txn / "_INFLIGHT"
                    if (
                        sentinel.exists()
                        and time.time() - sentinel.stat().st_mtime
                        < self.INFLIGHT_GRACE_SECONDS
                    ):
                        continue               # live unlocked stage
                    shutil.rmtree(txn)
                    continue
                manifest = json.loads(mf.read_text())
                if manifest.get("mode") == "append":
                    self._publish_epoch(txn, manifest)
                else:
                    self._publish(txn, manifest)

    def vacuum(self, table: str | None = None, older_than_seconds: float = 0.0) -> int:
        """Garbage-collect previous-version data files: in every
        manifest-bearing partition, delete parquet files NOT in the
        committed manifest and older than the retention window. Run
        out-of-band (the analog of a table format's VACUUM) once no
        reader still holds a plan over the superseded snapshot.
        Returns the number of files removed. Takes the store lock: a
        publish mid-flight has moved files into the partition dir that
        its manifest swap has not yet listed — unlocked GC would eat
        them.

        RETENTION CONTRACT (pytest-pinned): an in-flight reader whose
        plan resolved a superseded manifest keeps scanning the old
        files, so ``older_than_seconds`` must exceed the longest
        reader's runtime — files younger than the window survive and
        the reader completes. ``older_than_seconds=0`` is only safe
        when no reader holds a superseded snapshot; after it runs, a
        stale plan points at deleted files and fails on next execution
        (the same contract as Delta/Iceberg VACUUM retention)."""
        import time

        cutoff = time.time() - older_than_seconds
        removed = 0
        tables = [table] if table else PRODUCT_TABLES
        with self._exclusive_lock():
            for t in tables:
                p = Path(self._path(t))
                if not p.exists():
                    continue
                for part in p.glob(f"{PARTITION_COL}=*"):
                    cm = part / COMMITTED
                    if not cm.exists():
                        continue
                    live = set(json.loads(cm.read_text())["files"])
                    for f in part.glob("*.parquet"):
                        if f.name not in live and f.stat().st_mtime <= cutoff:
                            f.unlink()
                            removed += 1
        return removed

    def compact(
        self,
        table: str | None = None,
        target_file_bytes: int = 128 * 1024 * 1024,
        sort_by: str | None = None,
    ) -> int:
        """Rewrite fragmented manifest-bearing partitions into
        ~``target_file_bytes`` files (the Delta/Iceberg OPTIMIZE
        analog). Every ``append`` extends a partition's manifest by at
        least one file, so a hot partition fragments over time — and at
        scale a scan over thousands of small files pays task-scheduling
        and footer-read overhead per file. Compaction reads the live
        file list, rewrites it at target size, and ATOMICALLY swaps the
        manifest — in-flight readers keep scanning the superseded files
        (same snapshot semantics as a publish; ``vacuum`` GCs them
        under the retention contract). Only manifest-bearing partitions
        are compacted: listing-mode partitions have no snapshot
        indirection, so a rewrite there couldn't be atomic for readers.

        Returns the number of partitions compacted. A partition is
        skipped when its live file count is already within the target
        (``ceil(total_bytes / target)``), so repeated calls are cheap
        no-ops. Takes the store lock (like vacuum) so a concurrent
        publish can't interleave with the manifest swap.

        ``sort_by`` additionally CLUSTERS the rewrite on one column
        (``repartitionByRange`` + ``sortWithinPartitions`` — the
        OPTIMIZE ZORDER-lite analog for a single key): each output
        file covers a disjoint value range, so the manifest zone maps
        become maximally tight on that column and a later
        ``read(where=[(sort_by, ...)])`` skips every non-covering file.
        With ``sort_by`` set, any multi-file partition is rewritten
        (clustering is the point, not just file count), and the
        row-group sort also sharpens parquet's own page/row-group
        skipping for scans that bypass the manifests."""
        import math
        import uuid

        compacted = 0
        tables = [table] if table else PRODUCT_TABLES
        with self._exclusive_lock():
            for t in tables:
                p = Path(self._path(t))
                if not p.exists():
                    continue
                for part in p.glob(f"{PARTITION_COL}=*"):
                    cm = part / COMMITTED
                    if not cm.exists():
                        continue
                    manifest = json.loads(cm.read_text())
                    names = manifest["files"]
                    paths = [part / n for n in names if (part / n).exists()]
                    if len(paths) <= 1:
                        continue
                    total = sum(f.stat().st_size for f in paths)
                    target_n = max(1, math.ceil(total / target_file_bytes))
                    if len(paths) <= target_n and sort_by is None:
                        continue
                    staging = part / f"_compact_{uuid.uuid4().hex}"
                    # read under the DECLARED schema when the partition
                    # has evolved: a plain read would sample one file's
                    # schema and silently drop columns the other files
                    # carry — the rewrite must materialize the union
                    reader = self.spark.read
                    schema_json = manifest.get("schema")
                    if schema_json:
                        reader = reader.schema(_schema_from_json(schema_json))
                    df = reader.parquet(*[str(f) for f in paths])
                    if sort_by is not None:
                        df = df.repartitionByRange(
                            target_n, F.col(sort_by)
                        ).sortWithinPartitions(sort_by)
                    else:
                        df = df.repartition(target_n)
                    df.write.parquet(str(staging))
                    new_names = []
                    for f in sorted(staging.glob("*.parquet")):
                        new_name = f"compact-{uuid.uuid4().hex}.parquet"
                        f.rename(part / new_name)
                        new_names.append(new_name)
                    import shutil

                    shutil.rmtree(staging)
                    self._write_committed(  # snapshot point
                        part, sorted(new_names), schema_json=schema_json
                    )
                    compacted += 1
        return compacted

    def merge_rows(self, table: str, df: DataFrame, key_cols: list[str]) -> None:
        """MERGE (upsert-by-key) — the table-format operation between
        append and full replace: incoming rows REPLACE current rows
        with equal ``key_cols`` and APPEND otherwise, per product
        partition, atomically. Composition, not new machinery: the
        merged state (current ⟕-anti incoming ∪ incoming) is published
        through ``replace_product_all``'s write-ahead txn, so readers
        get the same snapshot isolation and crash recovery as any
        publish — the staging write materializes from the OLD snapshot
        before the manifest swap, so a concurrent reader never sees a
        half-merged partition. Schema evolution applies: an incoming
        frame with new columns unions in (old rows null-fill).

        Cost shape at 100 TB: one partition's live rows re-written per
        merged product (the replace unit) — same bound as the
        reference's delete-then-insert, minus the cross-table cascade.
        """
        if PARTITION_COL not in df.columns:
            raise ValueError(f"merge_rows needs {PARTITION_COL} on the incoming frame")
        pids = [r[0] for r in df.select(PARTITION_COL).distinct().collect()]
        for pid in pids:
            incoming = df.filter(F.col(PARTITION_COL) == pid)
            current = self.read_product_slice(table, pid)
            if current is None:
                merged = incoming
            else:
                keys = incoming.select(*key_cols).distinct()
                remaining = current.join(keys, key_cols, "left_anti")
                merged = remaining.unionByName(incoming, allowMissingColumns=True)
            self.replace_product_all(pid, {table: merged})

    def fsck(self, table: str | None = None) -> dict[str, dict]:
        """Read-only consistency audit — the ops check a 100 TB
        deployment runs before trusting a store root. Per table:

        - ``missing``    — files a LIVE manifest references that are
          gone from disk (data loss: a vacuum bug or manual deletion;
          reads of that partition will fail);
        - ``superseded`` — on-disk files not in the live manifest but
          referenced by manifest HISTORY (healthy: retained snapshot
          data awaiting vacuum / serving time travel);
        - ``unknown``    — on-disk files referenced by nothing (write
          leftovers from a crashed pre-manifest append; safe to GC);
        - ``stats_missing`` — live files without zone-map entries
          (reads stay correct but skip nothing for them).

        Driver-side listing + JSON reads only — no Spark jobs."""
        report: dict[str, dict] = {}
        tables = [table] if table else PRODUCT_TABLES
        for t in tables:
            p = Path(self._path(t))
            if not p.exists():
                continue
            missing: list[str] = []
            superseded: list[str] = []
            unknown: list[str] = []
            stats_missing: list[str] = []
            for part in sorted(p.glob(f"{PARTITION_COL}=*")):
                cm = part / COMMITTED
                if not cm.exists():
                    continue  # listing-mode partition: everything is live
                manifest = json.loads(cm.read_text())
                live = set(manifest["files"])
                stats = manifest.get("stats", {})
                on_disk = {f.name for f in part.glob("*.parquet")}
                missing += sorted(f"{part.name}/{n}" for n in live - on_disk)
                stats_missing += sorted(
                    f"{part.name}/{n}" for n in live & on_disk if n not in stats
                )
                historical: set[str] = set()
                hist = part / "_history"
                if hist.exists():
                    for h in hist.glob("*.json"):
                        historical |= set(json.loads(h.read_text())["files"])
                for n in sorted(on_disk - live):
                    target = superseded if n in historical else unknown
                    target.append(f"{part.name}/{n}")
            if missing or superseded or unknown or stats_missing:
                report[t] = {
                    "missing": missing,
                    "superseded": superseded,
                    "unknown": unknown,
                    "stats_missing": stats_missing,
                }
        return report

    def delete_product(self, product_id: int) -> None:
        """Cascading delete across all product tables (reference
        scdb.py:32–72): with product partitioning this is dropping one
        partition directory per table — O(1) metadata, not a scan."""
        import shutil

        for table in PRODUCT_TABLES:
            part_dir = Path(self._path(table)) / f"{PARTITION_COL}={product_id}"
            if part_dir.exists():
                shutil.rmtree(part_dir)

    # -- S9: scalar service queries ---------------------------------------
    def max_id(self, table: str, col: str, exclude_product: int | None = None) -> int:
        """A1 high-water mark. ``exclude_product`` mirrors the
        reference's delete-before-MAX ordering (scdb.py:32–72 then
        :154–159): a replaced product's old ids don't count, so
        re-appends reuse the same id range (idempotent ids)."""
        df = self.read(table)
        if df is None:
            return 0
        if exclude_product is not None and PARTITION_COL in df.columns:
            df = df.filter(F.col(PARTITION_COL) != exclude_product)
        row = df.agg(F.max(col).alias("m")).first()
        return int(row["m"]) if row and row["m"] is not None else 0

    def read_product_slice(
        self, table: str, product_id: int, where=None
    ) -> DataFrame | None:
        """Serving-path read for one product, optionally filtered below
        product grain (SURVEY §2.14: the web app's PrimaryQuery-style
        reads filter to one indicator / date range / geo level). The
        product predicate skips other partitions at the driver; extra
        ``where`` predicates engage the manifest zone maps so only
        files that can match are ever listed into the plan."""
        w = [(PARTITION_COL, "==", product_id)] + list(where or [])
        return self.read(table, where=w)

    def read_other_products(self, table: str, product_id: int) -> DataFrame | None:
        """Current state EXCLUDING one product's partition — the
        post-delete view the reference's anti-joins see, and safe to
        scan lazily while that partition is being overwritten. The
        excluded partition's directory is skipped at the driver (the
        ``!=`` predicate proves a single-valued partition empty), so
        its files never even enter the plan's listing."""
        p = Path(self._path(table))
        if p.exists() and any(p.glob(f"{PARTITION_COL}=*")):
            return self.read(table, where=[(PARTITION_COL, "!=", product_id)])
        return self.read(table)

    def product_exists(self, product_id: int) -> bool:
        df = self.read("IndicatorTheme")
        if df is None:
            return False
        return (
            df.filter(F.col(PARTITION_COL) == product_id).limit(1).count() > 0
        )


def write_jdbc(df: DataFrame, url: str, table: str, batchsize: int = 10000, **options) -> None:
    """S10 parity mode — bulk append to an external RDBMS, the analog
    of the reference's fast_executemany/chunksize=10000 path
    (scdb.py:27–30, 174–187)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .options(**options)
        .mode("append")
        .save()
    )


class BucketedStore:
    """Bucketed managed tables for co-located fact-to-fact joins.

    The parquet ``TableStore`` covers the reference's product-replace
    lifecycle; THIS store covers the scale pattern the reference never
    needed: two fact tables repeatedly joined on the same key (e.g.
    values ⋈ bridge on IndicatorValueCode at 100 TB) should be written
    ``bucketBy(n, key)`` once so every later join is shuffle-free on
    both sides (SortMergeJoin over pre-bucketed scans, no Exchange).

    Uses the session's warehouse dir + in-memory catalog — no Hive
    server needed; ``saveAsTable`` is required because bucketing
    metadata lives in the table catalog, not in parquet files.
    """

    def __init__(self, spark: SparkSession, n_buckets: int = 32):
        self.spark = spark
        self.n_buckets = n_buckets

    def write(self, df: DataFrame, table: str, bucket_col: str, sort: bool = True) -> None:
        # drop catalog entry AND any stale location (a crashed earlier
        # write can leave the dir behind with no catalog entry, which
        # saveAsTable then refuses: LOCATION_ALREADY_EXISTS)
        self.spark.sql(f"DROP TABLE IF EXISTS {table}")
        import shutil
        from pathlib import Path

        loc = Path(self.spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")) / table
        if loc.exists():
            shutil.rmtree(loc)
        # one file per bucket: repartition on the bucket column with
        # exactly n_buckets partitions (repartition and bucketBy share
        # the Murmur3 hash, so each write task holds one whole bucket).
        # With multiple files per bucket the reader can't trust the
        # sortBy ordering and re-Sorts above every bucketed scan — one
        # file per bucket makes later merge joins Sort-free as well as
        # Exchange-free.
        df = df.repartition(self.n_buckets, F.col(bucket_col))
        w = df.write.mode("overwrite").bucketBy(self.n_buckets, bucket_col)
        if sort:
            w = w.sortBy(bucket_col)
        w.format("parquet").saveAsTable(table)

    def read(self, table: str) -> DataFrame:
        return self.spark.table(table)

    def mirror_product(
        self, df: DataFrame, table: str, product_id: int, bucket_col: str
    ) -> None:
        """Per-product replace into a PARTITIONED + BUCKETED managed
        table — the co-located mirror of a TableStore fact table. The
        partition column keeps the product-replace lifecycle (drop one
        partition, append its successor); the bucket spec makes every
        later join on ``bucket_col`` between two mirrors shuffle-free
        on both sides. Storage is paid twice for these tables by
        design: the bucketed layout is written once per product replace
        and saves a full-table Exchange on every subsequent fact⋈fact
        read — the right trade when the read path (PrimaryQuery's
        values⋈bridge) runs many times per publish."""
        if PARTITION_COL not in df.columns:
            df = df.withColumn(PARTITION_COL, F.lit(product_id).cast("long"))
        if self.spark.catalog.tableExists(table):
            self.spark.sql(
                f"ALTER TABLE {table} DROP IF EXISTS "
                f"PARTITION ({PARTITION_COL}={product_id})"
            )
            mode = "append"
        else:
            # a fresh in-memory catalog may not know a table whose
            # warehouse dir survives from an earlier session — clear the
            # stale location or saveAsTable refuses (LOCATION_ALREADY_EXISTS)
            import shutil

            loc = Path(
                self.spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
            ) / table.lower()
            if loc.exists():
                shutil.rmtree(loc)
            mode = "overwrite"
        (
            df.write.mode(mode)
            .partitionBy(PARTITION_COL)
            .bucketBy(self.n_buckets, bucket_col)
            .sortBy(bucket_col)
            .format("parquet")
            .saveAsTable(table)
        )
