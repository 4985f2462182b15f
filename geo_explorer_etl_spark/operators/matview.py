"""Incrementally-maintained MATERIALIZED AGGREGATES over a TableStore
table — the continuous-aggregate / OPTIMIZE-refresh analog (Timescale
continuous aggregates, Materialize/DBSP delta maintenance), built from
pieces this engine already has: the change feed supplies row-level
deltas, ``merge_apply`` lands per-group upserts atomically, and a CAS
control blob carries the refresh high-water with write-ahead intent.

Why not just re-run the GROUP BY? At 100 TB the base table's daily
churn is a few thousand changed files; a full re-aggregation reads
every file every time, while ``refresh_matview`` reads ONLY

- the change-feed window (cost ∝ changed files — read_changes),
- the matview rows of the touched groups (partition-pruned: groups
  hash to ``n_partitions`` store partitions, the probe reads just the
  partitions the delta touches), and
- for MIN/MAX groups that saw a delete, the base rows of exactly
  those groups (an absolute re-aggregate bounded by a group-key join
  — the classic non-invertible-aggregate recompute, same tradeoff as
  Materialize's reduction on retractions).

Maintenance algebra, per group:

- COUNT(*) / COUNT(col) / SUM / AVG are INVERTIBLE: the window nets to
  ``sum(sign)``, ``sum(sign·[col IS NOT NULL])``, ``sum(sign·col)``
  (sign = +1 insert / −1 delete), applied to the stored values. SQL
  NULL semantics survive exactly: each SUM/AVG keeps a hidden non-null
  count, and the stored value returns to NULL when it hits zero.
- MIN/MAX are invertible on INSERTS ONLY (``least``/``greatest`` with
  the window's insert-side extreme); APPROX_DISTINCT likewise — it
  stores the HLL sketch (Spark's datasketches HllSketch) beside the
  estimate and UNIONS it with the insert window's sketch, the
  mergeable-sketch property that makes HLL the scale-correct distinct
  count. A group with any delete in the window re-aggregates
  absolutely from the base snapshot (sketches don't retract) — but
  ONLY when the delete can actually move the state: a deleted value
  at-or-past the stored extreme, or any non-null delete against a
  sketch. Deletes strictly inside the stored (min, max) — the
  scattered-update common case — stay invertible. A view with none of
  these aggregates never touches the base table at all.
- A group whose row count reaches zero is DELETED from the view.

Crash safety / exactly-once: refresh first CAS-publishes the window
``[hw, until]`` as PENDING intent in the registry blob, applies it,
then CAS-advances ``hw = until``. Every stored row carries the
``_mv_hw`` of the refresh that last wrote it, and BOTH source
branches SKIP groups whose stored ``_mv_hw`` already carries the
window's ``until`` — so a crash between per-partition merge swaps
re-applies the SAME window and converges: already-swapped partitions
are no-ops, unswapped ones apply old+delta (or the absolute
re-aggregate), and a STALE window re-applied after newer windows
landed touches nothing (pytest pins it). A racing refresher loses the
pending CAS and raises rather than double-netting one window; the
whole refresh additionally runs under a per-view writer lock (flock
under localfs — kernel-released on crash; a no-op under CAS, where
the claim + fence carry the serialization). The recovery path
(``pending`` found set) completes the recorded window BEFORE opening
a new one — never a merged, wider window, which would double-count
the already-applied prefix.

Reference parity: the reference has no materialized-view surface —
this extends the engine's table-format capabilities (SURVEY §6
extension lane, same as the dedup/ANN index tables).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, functions as F

from geo_explorer_etl_spark.sources.store import PARTITION_COL, TableStore

#: Store-root control blob: {name: {table, group_cols, aggs,
#: n_partitions, hw, pending}} — CAS-updated like the epoch ledger.
MATVIEWS = "_matviews.json"
MV_PREFIX = "MatView_"
#: Refresh high-water stamped on every stored row (idempotent re-apply).
MV_HW = "_mv_hw"
#: Hidden live-row count per group (group death detection).
MV_CNT = "__cnt"
AGG_OPS = ("count", "sum", "avg", "min", "max", "approx_distinct")
_OP_COL = "_mv_op"  # routing-only merge column, dropped from the table


def mv_table(name: str) -> str:
    return MV_PREFIX + name


def _nn(out: str) -> str:
    return f"__nn_{out}"  # hidden non-null count (sum/avg NULL semantics)


def _avs(out: str) -> str:
    return f"__avs_{out}"  # hidden raw sum behind an avg


def _hll(out: str) -> str:
    return f"__hll_{out}"  # hidden HLL sketch behind an approx_distinct


def _views(body: dict | None) -> dict:
    # entries nest under "views" — the backend stamps bookkeeping keys
    # (e.g. "version") on the blob root, the epoch-ledger rule
    return dict((body or {}).get("views", {}))


def _registry(store: TableStore) -> dict:
    cur = store._backend.read(Path(store.root), MATVIEWS)
    return _views(cur[1] if cur else None)


def _cas_registry(store: TableStore, update_fn):
    """CAS over the views map: ``update_fn(views_dict)`` returns the
    new views dict (or None to abort)."""
    from geo_explorer_etl_spark.sources.commit import cas_update

    def wrap(prior):
        new = update_fn(_views(prior))
        return None if new is None else {"views": new}

    return cas_update(store._backend, Path(store.root), MATVIEWS, wrap)


def _last_commit(store: TableStore, table: str) -> float | None:
    hist = store.history(table)
    ts = [h["committed_at"] for h in hist if h["committed_at"] is not None]
    return max(ts) if ts else None


def _check_aggs(aggs: dict, group_cols: list[str]) -> dict:
    """Validate + normalize the agg spec ``{out: (op, col)}``; COUNT
    may take ``None`` (count(*)). Output names must be distinct from
    group/hidden/routing columns — they become the view's schema."""
    if not aggs:
        raise ValueError("matview: empty aggs")
    norm: dict[str, tuple[str, str | None]] = {}
    reserved = set(group_cols) | {MV_CNT, MV_HW, PARTITION_COL, _OP_COL}
    for out, spec in aggs.items():
        op, col = (spec, None) if isinstance(spec, str) else tuple(spec)
        if op not in AGG_OPS:
            raise ValueError(f"matview: agg op {op!r} not in {AGG_OPS}")
        if col is None and op != "count":
            raise ValueError(f"matview: {op} needs a column ({out!r})")
        if out in reserved or out.startswith("__"):
            raise ValueError(f"matview: output name {out!r} is reserved")
        norm[out] = (op, col)
    return norm


def _abs_exprs(aggs: dict) -> list:
    """Absolute aggregation expressions (create / min-max recompute):
    the stored value IS the SQL aggregate, hidden columns alongside."""
    exprs = [F.count(F.lit(1)).cast("long").alias(MV_CNT)]
    for out, (op, col) in aggs.items():
        if op == "count":
            src = F.count(F.lit(1)) if col is None else F.count(F.col(col))
            exprs.append(src.cast("long").alias(out))
        elif op == "sum":
            exprs.append(F.sum(col).alias(out))
            exprs.append(F.count(F.col(col)).cast("long").alias(_nn(out)))
        elif op == "avg":
            exprs.append(F.avg(col).alias(out))
            exprs.append(F.sum(col).alias(_avs(out)))
            exprs.append(F.count(F.col(col)).cast("long").alias(_nn(out)))
        elif op == "min":
            exprs.append(F.min(col).alias(out))
        elif op == "max":
            exprs.append(F.max(col).alias(out))
        else:  # approx_distinct: the MERGEABLE-SKETCH aggregate — the
            # stored value is the estimate, the hidden column the HLL
            # sketch itself (Spark's datasketches HllSketch), so an
            # insert-only window UNIONS sketches instead of recounting
            sk = F.hll_sketch_agg(F.col(col))
            exprs.append(
                F.coalesce(F.hll_sketch_estimate(sk), F.lit(0))
                .cast("long")
                .alias(out)
            )
            exprs.append(sk.alias(_hll(out)))
    return exprs


def _delta_exprs(aggs: dict) -> list:
    """Netted window aggregates over change-feed rows (+1 insert /
    −1 delete) — the invertible-aggregate algebra."""
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    exprs = [F.sum(sign).cast("long").alias("_d" + MV_CNT)]
    for out, (op, col) in aggs.items():
        if op == "count":
            present = (
                F.lit(1) if col is None
                else F.when(F.col(col).isNotNull(), 1).otherwise(0)
            )
            exprs.append(F.sum(sign * present).cast("long").alias("_d_" + out))
        elif op in ("sum", "avg"):
            exprs.append(
                F.sum(sign * F.coalesce(F.col(col), F.lit(0))).alias("_d_" + out)
            )
            exprs.append(
                F.sum(sign * F.when(F.col(col).isNotNull(), 1).otherwise(0))
                .cast("long")
                .alias("_dnn_" + out)
            )
        elif op in ("min", "max"):
            ins = F.when(F.col("_change_type") == "insert", F.col(col))
            dl = F.when(F.col("_change_type") == "delete", F.col(col))
            fn = F.min if op == "min" else F.max
            exprs.append(fn(ins).alias("_dins_" + out))
            # the delete-side extreme decides whether the group can
            # stay on the invertible path (_recompute_cond)
            exprs.append(fn(dl).alias("_ddel_" + out))
            exprs.append(
                F.sum(F.when(dl.isNotNull(), 1).otherwise(0))
                .cast("long")
                .alias("_ddn_" + out)
            )
        else:  # approx_distinct: sketch over the window's INSERT values
            exprs.append(
                F.hll_sketch_agg(
                    F.when(F.col("_change_type") == "insert", F.col(col))
                ).alias("_dins_" + out)
            )
            exprs.append(
                F.sum(
                    F.when(
                        (F.col("_change_type") == "delete")
                        & F.col(col).isNotNull(),
                        1,
                    ).otherwise(0)
                )
                .cast("long")
                .alias("_ddn_" + out)
            )
    return exprs


def _recompute_cond(aggs: dict):
    """Does THIS group need the absolute base re-aggregate? Only when
    a delete could actually move non-invertible state: a deleted value
    at-or-past the stored extreme (min/max), or ANY non-null delete
    against a sketch (sketches don't retract). Deletes strictly inside
    the stored (min, max) — the scattered-update common case — stay on
    the invertible path. NULL deletes never trigger (aggregates ignore
    them); a group with no stored row but non-null deletes triggers
    (an in-window insert-then-delete would otherwise corrupt the
    insert-side extreme/sketch)."""
    cond = F.lit(False)
    for out, (op, _col) in aggs.items():
        if op in ("min", "max"):
            cmp = (
                F.col("_ddel_" + out) <= F.col(f"_o_{out}")
                if op == "min"
                else F.col("_ddel_" + out) >= F.col(f"_o_{out}")
            )
            trig = (
                F.when(F.col("_ddn_" + out) <= 0, F.lit(False))
                .when(F.col(f"_o_{MV_CNT}").isNull(), F.lit(True))
                .when(F.col(f"_o_{out}").isNull(), F.lit(True))
                .otherwise(cmp)
            )
        elif op == "approx_distinct":
            trig = F.col("_ddn_" + out) > 0
        else:
            continue
        cond = cond | F.coalesce(trig, F.lit(False))
    return cond


def _storage_cols(group_cols: list[str], aggs: dict) -> list[str]:
    """The view table's column order (group keys, outputs, hidden,
    watermark) — both the create write and every merge source select
    exactly this, so replace-row merges can never reorder schema."""
    cols = list(group_cols)
    for out, (op, _) in aggs.items():
        cols.append(out)
        if op == "sum":
            cols.append(_nn(out))
        elif op == "avg":
            cols += [_avs(out), _nn(out)]
        elif op == "approx_distinct":
            cols.append(_hll(out))
    cols += [MV_CNT, MV_HW]
    return cols


def _with_pid(df: DataFrame, group_cols: list[str], n_partitions: int) -> DataFrame:
    return df.withColumn(
        PARTITION_COL,
        F.pmod(F.xxhash64(*group_cols), F.lit(int(n_partitions))).cast("long"),
    )


def _refuse_null_keys(df: DataFrame, group_cols: list[str], ctx: str) -> None:
    """NULL group keys cannot round-trip a key-equality MERGE (SQL
    NULL never equals NULL) — refuse loudly up front rather than let a
    NULL group duplicate on every refresh."""
    cond = None
    for c in group_cols:
        n = F.col(c).isNull()
        cond = n if cond is None else (cond | n)
    if df.filter(cond).limit(1).count():
        raise ValueError(
            f"{ctx}: NULL in group column(s) {group_cols} — materialized "
            "views need non-null group keys (filter or coalesce upstream)"
        )


def create_matview(
    store: TableStore,
    name: str,
    table: str,
    group_cols: list[str],
    aggs: dict,
    n_partitions: int = 8,
    replace: bool = False,
) -> dict:
    """Materialize ``SELECT group_cols, aggs FROM table GROUP BY
    group_cols`` as the store table ``MatView_<name>``, pinned to the
    base table's latest commit, and register it for incremental
    ``refresh_matview``. ``aggs`` maps output name → ``(op, col)``
    with op in count|sum|avg|min|max (count takes ``None`` for
    count(*)). Groups hash to ``n_partitions`` store partitions so a
    refresh merges (and a probe reads) only partitions holding touched
    groups. Listing-mode base partitions are invisible to the pinned
    snapshot and the change feed — adopt_manifests them first.

    Returns ``{"hw": ts, "groups": n}``. Crash note: data lands before
    the registry entry, so a crash in between leaves an unregistered
    ``MatView_`` table — re-run with ``replace=True``."""
    aggs = _check_aggs(aggs, list(group_cols))
    if not group_cols:
        raise ValueError("create_matview: empty group_cols")
    existing = _registry(store).get(name)
    if existing is not None and not replace:
        raise ValueError(
            f"create_matview: {name!r} exists (over {existing['table']!r}) — "
            "pass replace=True to rebuild"
        )
    hw = _last_commit(store, table)
    if hw is None:
        raise ValueError(
            f"create_matview: base table {table!r} has no committed "
            "(manifest-covered) data"
        )
    base = store.read_at(table, hw)
    if base is None:
        raise ValueError(f"create_matview: base table {table!r} is empty")
    _refuse_null_keys(base.select(*group_cols), group_cols, "create_matview")
    mv = (
        base.groupBy(*group_cols)
        .agg(*_abs_exprs(aggs))
        .withColumn(MV_HW, F.lit(float(hw)))
        .select(*_storage_cols(list(group_cols), aggs))
    )
    t = mv_table(name)
    # same per-view lock refresh holds: a rebuild can't interleave
    # with a running refresh's merge (localfs; CAS stays optimistic)
    with store._backend.lock(Path(store.root) / "_mv" / name):
        if replace:
            _drop_mv_table(store, t)
        elif store.exists(t):
            raise ValueError(
                f"create_matview: orphan table {t!r} exists without a registry "
                "entry (crashed create) — pass replace=True to adopt"
            )
        store.append(t, _with_pid(mv, list(group_cols), n_partitions))
        # first write lands listing-mode: adopt immediately so refresh's
        # merge_apply / partition-pruned probes have manifests from day one
        store.adopt_manifests(t)
        n_groups = store.count_rows(t)

        def upsert(prior):
            reg = dict(prior or {})
            reg[name] = {
                "table": table,
                "group_cols": list(group_cols),
                "aggs": {out: [op, col] for out, (op, col) in aggs.items()},
                "n_partitions": int(n_partitions),
                "hw": float(hw),
                "pending": None,
            }
            return reg

        _cas_registry(store, upsert)
    return {"hw": float(hw), "groups": int(n_groups)}


def _drop_mv_table(store: TableStore, t: str) -> None:
    import shutil

    p = Path(store._path(t))
    if p.exists():
        with store._exclusive_lock():
            shutil.rmtree(p)


def read_matview(store: TableStore, name: str) -> DataFrame | None:
    """The view's user-facing frame: group keys + declared outputs
    (hidden maintenance columns dropped); None when every group was
    deleted (the store's every-partition-deleted state, same contract
    as ``store.read``). Reading between a crash and its recovery
    refresh can surface a PER-PARTITION torn point — some partitions
    post-window, others pre; run ``refresh_matview`` to converge (it
    completes the pending window first)."""
    ent = _registry(store).get(name)
    if ent is None:
        raise KeyError(f"read_matview: no materialized view {name!r}")
    df = store.read(mv_table(name))
    if df is None:
        # every group deleted: the store's every-partition-deleted
        # state — same contract as store.read
        return None
    return df.select(*ent["group_cols"], *ent["aggs"])


def register_matview_view(store: TableStore, name: str, view: str | None = None) -> str:
    """SQL serving for a materialized view: registers a temp view over
    the BATCH DATA SOURCE (query-time-fresh — every statement re-plans
    the snapshot, so a refresh is visible with no re-registration),
    projected to the user-facing columns (group keys + declared
    outputs; maintenance columns hidden). Returns the view name
    (default: the matview's own name). The projection prunes at the
    pyarrow scan, so hidden sketch/counter columns cost no I/O."""
    ent = _registry(store).get(name)
    if ent is None:
        raise KeyError(f"register_matview_view: no materialized view {name!r}")
    from geo_explorer_etl_spark.sources.store_source import (
        register_store_source,
        store_table,
    )

    register_store_source(store.spark)
    v = view or name
    df = store_table(store.spark, store.root, mv_table(name), backend=store._backend.format_name)
    df.select(*ent["group_cols"], *ent["aggs"]).createOrReplaceTempView(v)
    return v


def drop_matview(store: TableStore, name: str) -> None:
    def remove(prior):
        reg = dict(prior or {})
        if name not in reg:
            return None
        del reg[name]
        return reg

    with store._backend.lock(Path(store.root) / "_mv" / name):
        _cas_registry(store, remove)
        _drop_mv_table(store, mv_table(name))


def list_matviews(store: TableStore) -> dict:
    return _registry(store)


def refresh_matview(
    store: TableStore, name: str, until: float | None = None
) -> dict:
    """Advance the view to the base table's latest commit (or
    ``until``) by applying the change-feed window — cost ∝ changed
    files + touched groups, never base-table size (module docstring
    for the algebra and the crash contract). Returns a report:
    ``{"windows": [...], "groups_touched": n, "groups_recomputed": n,
    "noop": bool}``."""
    ent = _registry(store).get(name)
    if ent is None:
        raise KeyError(f"refresh_matview: no materialized view {name!r}")
    # Per-view writer lock (flock under localfs, released by the
    # kernel on crash; a no-op under CAS where the pending claim +
    # the per-row _mv_hw fence carry the serialization): two refresh
    # calls recovering the SAME crashed window would otherwise race —
    # the loser's stale absolute values could land after the winner's
    # NEXT window and silently regress those groups.
    with store._backend.lock(Path(store.root) / "_mv" / name):
        return _refresh_locked(store, name, until)


def _refresh_locked(
    store: TableStore, name: str, until: float | None
) -> dict:
    ent = _registry(store).get(name)
    if ent is None:
        raise KeyError(f"refresh_matview: no materialized view {name!r}")
    report: dict = {"windows": [], "groups_touched": 0, "groups_recomputed": 0}
    # recovery: a recorded pending window completes FIRST, exactly as
    # recorded — never widened into the new window (double-counting)
    if ent.get("pending") is not None:
        w = _apply_window(store, name, ent, float(ent["hw"]), float(ent["pending"]))
        report["windows"].append(w)
        report["groups_touched"] += w["groups_touched"]
        report["groups_recomputed"] += w["groups_recomputed"]
        ent = _advance_hw(store, name, float(ent["hw"]), float(ent["pending"]))
    hw = float(ent["hw"])
    new_hw = _last_commit(store, ent["table"]) if until is None else float(until)
    if new_hw is None or new_hw <= hw:
        report["noop"] = not report["windows"]
        return report
    ent = _claim_pending(store, name, hw, new_hw)
    w = _apply_window(store, name, ent, hw, new_hw)
    report["windows"].append(w)
    report["groups_touched"] += w["groups_touched"]
    report["groups_recomputed"] += w["groups_recomputed"]
    _advance_hw(store, name, hw, new_hw)
    report["noop"] = False
    return report


def refresh_all_matviews(store: TableStore, table: str | None = None) -> dict:
    """Advance every registered view (optionally: only views DIRECTLY
    over ``table``) — the post-ingest hook a pipeline calls after its
    append/merge lands. Views refresh in DEPENDENCY order: a cascaded
    rollup (a view whose base is another view's table) refreshes after
    its parent, so one call advances a whole hierarchy consistently.
    Views refresh independently (each is its own pending-window
    transaction); a failure in one raises after the earlier ones have
    advanced, and re-running converges (the refresh contract).
    Returns ``{name: report}`` in refresh order."""
    reg = _registry(store)
    owner = {mv_table(n): n for n in reg}
    order: list[str] = []
    seen: set[str] = set()

    def visit(n: str) -> None:
        if n in seen:
            return
        seen.add(n)
        parent = owner.get(reg[n]["table"])
        if parent is not None and parent != n:
            visit(parent)
        order.append(n)

    for n in sorted(reg):
        visit(n)
    out: dict = {}
    for name in order:
        if table is not None and reg[name]["table"] != table:
            continue
        out[name] = refresh_matview(store, name)
    return out


def _claim_pending(store: TableStore, name: str, hw: float, new_hw: float) -> dict:
    """Write-ahead intent: CAS ``pending = new_hw`` iff the entry is
    still (hw, no pending) — exactly one refresher owns a window."""
    out: dict = {}

    def claim(prior):
        reg = dict(prior or {})
        ent = reg.get(name)
        if ent is None or float(ent["hw"]) != hw or ent.get("pending") is not None:
            return None
        ent = dict(ent)
        ent["pending"] = float(new_hw)
        reg[name] = ent
        out.update(ent)
        return reg

    if _cas_registry(store, claim) is None:
        raise RuntimeError(
            f"refresh_matview({name!r}): lost the refresh claim — a "
            "concurrent refresher advanced the view (re-run to continue)"
        )
    return out


def _advance_hw(store: TableStore, name: str, hw: float, new_hw: float) -> dict:
    out: dict = {}

    def advance(prior):
        reg = dict(prior or {})
        ent = dict(reg[name])
        if float(ent["hw"]) != hw:
            return None  # someone else completed it — converged either way
        ent["hw"] = float(new_hw)
        ent["pending"] = None
        reg[name] = ent
        out.update(ent)
        return reg

    body = _cas_registry(store, advance)
    return out if body is not None else _registry(store)[name]


def _apply_window(
    store: TableStore, name: str, ent: dict, since: float, until: float
) -> dict:
    """Compute and merge one window's group-state changes. Absolute
    values land through replace-row merges, so re-applying the same
    window converges (module docstring)."""
    table, t = ent["table"], mv_table(name)
    group_cols = list(ent["group_cols"])
    aggs = {out: tuple(spec) for out, spec in ent["aggs"].items()}
    # min/max and approx_distinct are non-invertible: groups that saw
    # a delete re-aggregate absolutely (the others net deltas/sketches)
    has_minmax = any(
        op in ("min", "max", "approx_distinct") for op, _ in aggs.values()
    )
    w: dict = {"window": [since, until], "groups_touched": 0, "groups_recomputed": 0}
    try:
        delta = store.read_changes(table, since=since, until=until)
    except FileNotFoundError as e:
        # vacuum pruned a superseded file the window needs: the view
        # can no longer be advanced incrementally — say so, and say
        # what to do (the read_changes retention contract)
        raise RuntimeError(
            f"refresh_matview({name!r}): the window [{since}, {until}] "
            f"over {table!r} is outside vacuum retention — rebuild with "
            "create_matview(..., replace=True), and size the vacuum "
            "retention to at least the refresh cadence"
        ) from e
    if delta is None:
        return w
    _refuse_null_keys(delta.select(*group_cols), group_cols, "refresh_matview")
    delta_g = _with_pid(
        delta.groupBy(*group_cols).agg(*_delta_exprs(aggs)),
        group_cols,
        int(ent["n_partitions"]),
    ).persist()
    try:
        w["groups_touched"] = delta_g.count()
        if not w["groups_touched"]:
            return w
        pids = [
            r[0] for r in delta_g.select(PARTITION_COL).distinct().collect()
        ]  # ≤ n_partitions values, bounded by construction
        old = (
            store.read(t, where=[(PARTITION_COL, "in", pids)], prune_only=True)
            if store.exists(t)
            else None
        )
        storage = _storage_cols(group_cols, aggs)
        # ONE join against the stored rows serves the crash fence AND
        # the per-agg recompute classification
        if old is not None:
            o = old.select(
                *[F.col(c).alias(f"_o_{c}") if c not in group_cols else F.col(c)
                  for c in storage]
            )
            j = delta_g.join(o, group_cols, "left")
            applied = F.col(f"_o_{MV_HW}") >= F.lit(float(until))
            j = j.filter(~F.coalesce(applied, F.lit(False)))
        else:
            j = delta_g
            for c in storage:
                if c not in group_cols:
                    j = j.withColumn(f"_o_{c}", F.lit(None))

        if has_minmax:
            j = j.withColumn("_recomp", _recompute_cond(aggs))
            additive_j = j.filter(~F.col("_recomp")).drop("_recomp")
            recompute_keys = j.filter(F.col("_recomp")).select(
                *group_cols, PARTITION_COL
            )
        else:
            additive_j = j
            recompute_keys = None

        add_rows = _additive_rows(additive_j, group_cols, aggs, until, storage)
        src = add_rows
        if recompute_keys is not None:
            w["groups_recomputed"] = recompute_keys.count()
            if w["groups_recomputed"]:
                rec_rows = _recompute_rows(
                    store, table, recompute_keys, group_cols, aggs, until, storage
                )
                src = add_rows.unionByName(rec_rows)

        if old is None:
            # first data into an empty view: every surviving row is an
            # insert — plain clustered append, no merge machinery
            live = src.filter(F.col(_OP_COL) != "del").drop(_OP_COL)
            if live.limit(1).count():
                store.append(t, live)
                store.adopt_manifests(t)
            return w
        rep = store.merge_apply(
            t,
            src,
            key_cols=group_cols,
            when_matched=[
                {"condition": f"{_OP_COL} = 'del'", "action": "delete"},
                {"action": "update"},  # replace-row: absolute new state
            ],
            when_not_matched=[{"condition": f"{_OP_COL} <> 'del'"}],
            drop_cols=[_OP_COL],
        )
        w["merge"] = rep
        return w
    finally:
        delta_g.unpersist()


def _additive_rows(
    j: DataFrame,
    group_cols: list[str],
    aggs: dict,
    until: float,
    storage: list[str],
) -> DataFrame:
    """Absolute next-state for invertible (or invertible-this-window)
    groups: stored ⊕ window net. ``j`` arrives pre-joined with the
    stored ``_o_*`` columns and already fenced on ``_mv_hw`` (crash
    re-apply skips — _apply_window)."""

    def old_col(c, zero=False):
        col = F.col(f"_o_{c}")
        return F.coalesce(col, F.lit(0)) if zero else col

    cnt_new = old_col(MV_CNT, zero=True) + F.col("_d" + MV_CNT)
    cols = {MV_CNT: cnt_new.cast("long"), MV_HW: F.lit(float(until))}
    for out, (op, _col) in aggs.items():
        if op == "count":
            cols[out] = (old_col(out, zero=True) + F.col("_d_" + out)).cast("long")
        elif op in ("sum", "avg"):
            nn = (old_col(_nn(out), zero=True) + F.col("_dnn_" + out)).cast("long")
            raw_prev = _avs(out) if op == "avg" else out
            raw = old_col(raw_prev, zero=True) + F.col("_d_" + out)
            cols[_nn(out)] = nn
            if op == "avg":
                cols[_avs(out)] = F.when(nn > 0, raw)
                cols[out] = F.when(nn > 0, raw / nn)
            else:
                cols[out] = F.when(nn > 0, raw)
        elif op in ("min", "max"):
            # insert-only extreme: least/greatest skip NULLs, so an
            # all-null window leaves the stored extreme untouched
            fn = F.least if op == "min" else F.greatest
            cols[out] = fn(old_col(out), F.col("_dins_" + out))
        else:
            # approx_distinct, insert-only window: UNION the stored
            # sketch with the window's sketch — the mergeable-sketch
            # property that makes HLL the 100 TB distinct count
            old_sk, dsk = old_col(_hll(out)), F.col("_dins_" + out)
            merged = (
                F.when(old_sk.isNull(), dsk)
                .when(dsk.isNull(), old_sk)
                .otherwise(F.hll_union(old_sk, dsk))
            )
            cols[_hll(out)] = merged
            cols[out] = (
                F.coalesce(F.hll_sketch_estimate(merged), F.lit(0)).cast("long")
            )
    out_df = j.select(
        *group_cols,
        *[cols[c].alias(c) for c in storage if c not in group_cols],
        F.col(PARTITION_COL),
        F.when(cnt_new <= 0, F.lit("del")).otherwise(F.lit("up")).alias(_OP_COL),
    )
    return out_df


def _recompute_rows(
    store: TableStore,
    table: str,
    keys: DataFrame,
    group_cols: list[str],
    aggs: dict,
    until: float,
    storage: list[str],
) -> DataFrame:
    """Absolute re-aggregate for the groups ``_recompute_cond``
    selected (a delete that can move non-invertible state): base rows
    bounded to exactly those groups by a key join (cluster the base on
    the group column — compact(sort_by=...) — to make this
    file-prunable too). A group with no surviving base rows is a
    delete. ``keys`` is already fenced on ``_mv_hw`` (the hoisted join
    in _apply_window), so a stale re-apply can't regress a group a
    newer window updated."""
    base = store.read_at(table, until)
    if base is None:
        abs_g = None
    else:
        abs_g = (
            base.join(keys.select(*group_cols), group_cols)
            .groupBy(*group_cols)
            .agg(*_abs_exprs(aggs))
        )
    k = keys
    if abs_g is not None:
        j = k.join(abs_g, group_cols, "left")
    else:
        j = k
        for c in storage:
            if c not in group_cols:
                j = j.withColumn(c, F.lit(None))
    alive = F.coalesce(F.col(MV_CNT), F.lit(0)) > 0
    return j.select(
        *group_cols,
        *[
            (F.lit(float(until)) if c == MV_HW else F.col(c)).alias(c)
            for c in storage
            if c not in group_cols
        ],
        F.col(PARTITION_COL),
        F.when(alive, F.lit("up")).otherwise(F.lit("del")).alias(_OP_COL),
    )
