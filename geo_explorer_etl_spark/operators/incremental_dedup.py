"""Incremental corpus deduplication — VERDICT r10 directive #3.

Every dedup operator in ``operators/dedup.py`` takes ONE frame; a
training pipeline ingests daily and cannot re-run MinHash-LSH over the
whole corpus per batch. This module persists the per-doc dedup state
as TableStore tables at corpus build and dedups each NEW batch against
that index in O(delta), not O(corpus):

- ``DedupExactIndex``  — one row per exact-survivor document:
  ``(content_hash, doc id)``, files range-clustered by content_hash so
  a batch's hash probe (``where=[("content_hash","in", ...)]``)
  zone-map-prunes to the few files covering the probed ranges;
- ``DedupBandIndex``   — the LSH band keys of those documents:
  ``(band_id, band_hash, doc id)``, files range-clustered by band_hash
  for the same reason;
- ``DedupLineIndex``   — one row per first-occurrence ELIGIBLE LINE
  (``incremental_dedup_lines``, the Dolma paragraph-dedupe production
  shape): ``(line_hash, doc id, pos)``, range-clustered by line_hash.

``incremental_dedup(store, batch)``:

1. EXACT: md5 the batch, anti-join hashes already in the index (a
   pruned semi-probe of ``DedupExactIndex``), then keep min-id per
   in-batch hash group — byte-identical semantics to
   ``exact_dedup_groups`` over the union when ids are monotone with
   ingest order (the standard pipeline invariant; documented below).
2. NEAR-DUP: MinHash signatures + band keys for the exact survivors;
   candidate edges = in-batch band self-join UNION batch-bands joined
   against the PERSISTED index **restricted to the batch's own band
   keys** (the pruned scan — never the full signature table);
   connected components over that delta subgraph (bounded by the
   batch, not the corpus); a component containing ANY corpus doc
   drops all its new members, a components of only-new docs keeps its
   min id.
3. INDEX APPEND: the kept documents' hash and band rows append to the
   two index tables (one atomic manifest extend each), range-clustered
   so the NEXT batch's probes keep pruning.

DETERMINISM CONTRACT: with ``id_col`` monotone across batches
(earlier-ingested docs have smaller ids), batch-then-batch equals the
all-at-once pipeline (exact dedup -> LSH -> components -> min-id
representative) on the union — pytest-pinned. Without monotone ids the
incremental result is still a valid dedup (first-ingested wins), it
just differs from min-id-wins.

At 100 TB: the batch is small; every corpus-sized structure is touched
through zone-map-pruned file reads (the probe lists are bounded by
``PROBE_CAP`` — beyond it the scan falls back to full, loudly). Index
growth is one clustered file set per batch; ``store.compact`` with
``sort_by`` restores clustering after many appends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_explorer_etl_spark.operators import dedup as DD
from geo_explorer_etl_spark.sources.store import PARTITION_COL, TableStore

EXACT_TABLE = "DedupExactIndex"
BAND_TABLE = "DedupBandIndex"
#: The ALTERNATIVE near-dup index (VERDICT r15 next #1c): banded
#: SimHash band values + the two signature words, so the probe join
#: can verify Hamming distance row-locally against persisted docs.
#: One near-dup mode per store — the decide phase refuses a store
#: already carrying the other mode's index (recall would silently
#: halve if the two indexes coexisted half-populated).
SIMHASH_BAND_TABLE = "DedupSimhashBandIndex"
#: Driver-side bound on probe value lists (the same role as
#: TableStore.MERGE_KEYSET_CAP): a batch whose hash/band-key set
#: exceeds it probes with a FULL index scan instead — correct, logged
#: by the returned report, never silent.
PROBE_CAP = 100_000
#: All index rows live in one reserved store partition.
INDEX_PID = 0
#: Mirror auto-compaction policy (VERDICT r14 next #2 — the mirrors
#: join the store's auto_compact discipline): every batch append adds
#: one file per touched bucket (bucketed appends never rewrite), so a
#: months-long daily pipeline accretes one file SET per batch and the
#: over-cap probe pays per-file open overhead that grows without
#: bound. After each mirror append the persist path counts the
#: accreted file sets (a driver-side ls, no Spark job) and runs
#: ``mirror_compact`` when they exceed this threshold — exactly the
#: fragmentation trigger ``TableStore.auto_compact`` applies to the
#: range-clustered side. Set to 0/None to disable (manual
#: ``mirror_compact`` stays available).
MIRROR_AUTO_COMPACT_FILESETS = 16

#: Deferred-compaction window (VERDICT r15 next #5): a breach batch
#: MARKS the sync marker (``breach_age`` field) instead of paying the
#: compaction inline, so ingest latency stays flat — the
#: ``mirrors_auto_compact`` maintenance sweep is the DEFAULT executor
#: of the actual rewrite. If the sweep hasn't run after this many
#: further marked appends, the persist path compacts inline as the
#: fallback (the over-cap probe tax must stay bounded even without a
#: nightly job). 0 = always inline (the r15 behavior).
MIRROR_COMPACT_DEFER_BATCHES = 8

#: Opt-in plan capture for the over-cap mirror join (ADVICE r14 low):
#: the formatted-plan string exists for the plan-pin TESTS, not for
#: production batches — default off, and failures never break dedup.
CAPTURE_PLANS = False


def _capture_plan(df: DataFrame) -> str | None:
    """Formatted plan via the PUBLIC ``df.explain`` surface (stdout
    redirect), so the capture works under classic and Connect alike;
    any failure degrades to None instead of breaking the batch."""
    import contextlib
    import io

    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()
    except Exception:  # noqa: BLE001 — diagnostics must never raise
        return None


def _content_hash(text_col: str):
    """md5 of the text, with NULL text mapped to a sentinel so the
    exact anti-join can MATCH across batches (SQL equality never
    matches NULL = NULL — one null-text doc per batch would survive,
    while the all-at-once groupBy keeps exactly one; review r11). The
    sentinel cannot collide with a real digest (md5 is hex)."""
    return F.coalesce(F.md5(F.col(text_col)), F.lit("__null_text__"))


def _band_rows(
    df: DataFrame, text_col: str, id_col: str, n: int, num_hashes: int, bands: int
) -> DataFrame:
    """(doc id, band_id, band_hash) rows through dedup.band_keys — ONE
    shared banding definition, so the persisted index and the batch
    operator can never desynchronize (review r11)."""
    sig = DD.minhash_signatures(df, text_col, id_col, n, num_hashes)
    return DD.band_keys(sig, id_col, num_hashes, bands)


def _simhash_spec_marker(store: TableStore) -> str:
    import os

    return os.path.join(store.root, "_dedup_simhash_spec.json")


def _check_simhash_spec(store: TableStore, bits: int, max_hamming: int) -> None:
    """Refuse a decide whose (bits, max_hamming) differ from the spec
    the persisted index was built under (r16 review find): band
    values computed under a different spec silently never match the
    recorded ones — near-dups against the existing corpus would be
    missed with no error, exactly the failure the one-mode-per-store
    guard exists to prevent."""
    import json
    import os

    p = _simhash_spec_marker(store)
    if not os.path.isfile(p):
        return
    with open(p) as f:
        rec = json.load(f)
    if rec.get("bits") != bits or rec.get("max_hamming") != max_hamming:
        raise ValueError(
            f"dedup_decide: store's SimHash index was built with "
            f"bits={rec.get('bits')}, max_hamming={rec.get('max_hamming')} "
            f"— this call passed bits={bits}, max_hamming={max_hamming}; "
            "band values under different specs never match (silent "
            "recall loss); use the recorded spec or rebuild the index"
        )


def _record_simhash_spec(store: TableStore, bits: int, max_hamming: int) -> None:
    """Write-if-absent, BEFORE the first band append (any persisted
    band row is then always covered by a spec marker — a crash
    between marker and append retries into an empty-index marker,
    which is harmless)."""
    import json
    import os

    p = _simhash_spec_marker(store)
    if os.path.isfile(p):
        return
    tmp = f"{p}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"bits": bits, "max_hamming": max_hamming}, f)
    os.replace(tmp, p)


def _simhash_band_rows(
    df: DataFrame, text_col: str, id_col: str, bits: int, max_hamming: int
) -> DataFrame:
    """(doc id, band_id, band_hash, sh0, sh1) rows through the SAME
    ``dedup.simhash_band_specs`` banding the batch operator uses
    (VERDICT r15 next #1c) — band_hash is the band value as a string
    (the probe/cluster column, same role as the MinHash band_hash),
    and the two signature words ride along so the candidate join
    verifies Hamming distance row-locally against persisted docs."""
    sig = DD.simhash_wide(df, text_col, id_col, bits=bits)
    return sig.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    DD.simhash_band_val(lo, hi, F.col("sh0"), F.col("sh1"))
                    .cast("string")
                    .alias("band_hash"),
                )
                for b, lo, hi in DD.simhash_band_specs(bits, max_hamming)
            ])
        ).alias("_b"),
        "sh0",
        "sh1",
    ).select(id_col, "_b.band_id", "_b.band_hash", "sh0", "sh1")


def _append_clustered(
    store: TableStore, table: str, df: DataFrame, cluster_col: str, n_files: int
) -> None:
    """Append index rows range-clustered on the probe column: each
    written file covers a narrow value range, which is exactly what
    makes the NEXT batch's ``in`` probe zone-map-prunable."""
    out = (
        df.repartitionByRange(max(1, n_files), cluster_col)
        .sortWithinPartitions(cluster_col)
        .withColumn(PARTITION_COL, F.lit(INDEX_PID).cast("long"))
    )
    if store.exists(table):
        store.append(table, out)
    else:
        # first batch: publish under manifest control so every later
        # append extends atomically and zone maps exist from day one
        store.replace_product_all(INDEX_PID, {table: out})


def _pruned_index(
    store: TableStore, table: str, col: str, values: list, report: dict
) -> DataFrame | None:
    """The persisted index restricted to the batch's own key FILES —
    a zone-map-pruned scan when the probe list fits PROBE_CAP, a full
    scan (reported, never silent) beyond it. PRUNE-ONLY on purpose:
    the returned frame is a superset (whole pruned files) and every
    caller's next step is an equi/anti-join on the probed column,
    which enforces exact membership for free — while the row-filter
    expression a 10k-literal isin() would build costs seconds of
    driver time per probe (measured; review r11)."""
    if not values:
        return None  # empty batch: nothing can match
    if len(values) <= PROBE_CAP:
        report[f"{table}_probe"] = "pruned"
        return store.read(table, where=[(col, "in", values)], prune_only=True)
    report[f"{table}_probe"] = "full_scan"
    return store.read(table)


def incremental_dedup(
    store: TableStore,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    report: dict | None = None,
    near_dup: str = "minhash",
    simhash_bits: int = 96,
    max_hamming: int = 3,
) -> DataFrame:
    """Dedup ``batch`` against everything previously ingested through
    this function (and within itself), persist the survivors' index
    rows, and return the kept batch rows (all original columns).

    ``near_dup`` selects the fuzzy leg: ``"minhash"`` (shingle
    Jaccard, probabilistic banding recall) or ``"simhash"``
    (``simhash_bits``-bit two-word signatures, EXACT recall at
    Hamming ≤ ``max_hamming`` — VERDICT r15 next #1c). One mode per
    store; switching modes on an existing index refuses loudly.

    The returned frame is MATERIALIZED (the index append already ran,
    and the decision must not re-evaluate against the post-append
    index), so callers get a stable result frame.

    ``report`` (optional dict) receives observability fields:
    batch/kept counts and whether each index probe pruned or fell back
    to a full scan.

    Composition note: this is ``dedup_decide`` + ``dedup_persist``.
    Orchestrators that need crash-safe ordering around OTHER writes
    (``ingest_corpus_batch`` appends the corpus BEFORE the index so a
    retry converges instead of losing the batch) call the two phases
    directly."""
    kept, surv_hashes, bands_new, rep = dedup_decide(
        store, batch, text_col, id_col, n, num_hashes, bands, report,
        near_dup=near_dup, simhash_bits=simhash_bits, max_hamming=max_hamming,
    )
    dedup_persist(
        store, surv_hashes, bands_new, rep.get("kept_rows", 0),
        band_table=BAND_TABLE if near_dup == "minhash" else SIMHASH_BAND_TABLE,
        simhash_spec=(
            (simhash_bits, max_hamming) if near_dup == "simhash" else None
        ),
    )
    return kept


def dedup_decide(
    store: TableStore,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    report: dict | None = None,
    near_dup: str = "minhash",
    simhash_bits: int = 96,
    max_hamming: int = 3,
):
    """The DECISION phase: returns ``(kept, surv_hashes, bands_new,
    report)`` without touching the persisted indexes. The returned
    frames carry LAZY localCheckpoint marks: each is cached (block-
    level) by the first job that touches it, but lineage truncation
    only lands on the topmost marked frame of that job
    (``doCheckpoint`` finalizes one mark per job unless
    ``spark.checkpoint.checkpointAllMarkedAncestors`` is set), so
    ``survivors``/``kept`` may keep their original store-reading
    lineage with cached blocks in front of it. That is still stable
    however the caller orders its writes: store reads pin an explicit
    file list at plan time, so even a recompute after block loss
    replays the same snapshot (see the surv_hashes note below).
    ``near_dup``: ``incremental_dedup``'s docstring (one mode per
    store)."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    if near_dup not in ("minhash", "simhash"):
        raise ValueError(f"dedup_decide: unknown near_dup mode {near_dup!r}")
    band_table = BAND_TABLE if near_dup == "minhash" else SIMHASH_BAND_TABLE
    other_table = SIMHASH_BAND_TABLE if near_dup == "minhash" else BAND_TABLE
    if store.exists(other_table):
        raise ValueError(
            f"dedup_decide: store already carries a "
            f"{'SimHash' if near_dup == 'minhash' else 'MinHash'} band "
            f"index ({other_table}) — one near-dup mode per store (a "
            "mixed index would silently narrow recall); re-ingest into "
            "a fresh store to switch modes"
        )
    rep: dict = report if report is not None else {}
    rep["near_dup_mode"] = near_dup
    hashed = batch.withColumn("_ch", _content_hash(text_col))
    # -- exact leg ---------------------------------------------------------
    batch_hashes = [
        r[0]
        for r in hashed.select("_ch").distinct().limit(PROBE_CAP + 1).collect()
    ]
    seen = (
        _pruned_index(store, EXACT_TABLE, "content_hash", batch_hashes, rep)
        if store.exists(EXACT_TABLE)
        else None
    )
    fresh = hashed
    if seen is not None:
        seen_hashes = seen.select(F.col("content_hash").alias("_ch")).distinct()
        if len(batch_hashes) <= PROBE_CAP:
            # the pruned probe is bounded by the batch's own hash set
            seen_hashes = F.broadcast(seen_hashes)
        fresh = hashed.join(seen_hashes, "_ch", "left_anti")
    # in-batch exact dedup: min id per content group (exact_dedup_groups
    # semantics, kept inline to reuse the already-computed hash)
    from pyspark.sql.window import Window

    rn = F.row_number().over(Window.partitionBy("_ch").orderBy(F.col(id_col)))
    survivors = fresh.withColumn("_rn", rn).filter(F.col("_rn") == 1).drop("_rn")
    # LAZY checkpoints (r16, guide §1.2): the band-keys probe below is
    # a full shuffle aggregate over bands_new, whose single plan
    # reference to survivors computes once — so ONE job materializes
    # both frames where eager=True ran two checkpoint jobs first. Every
    # later reader (the band self-join legs, kept, surv_hashes) hits
    # the cached blocks.
    survivors = survivors.localCheckpoint(eager=False)

    # -- near-dup leg ------------------------------------------------------
    if near_dup == "simhash":
        _check_simhash_spec(store, simhash_bits, max_hamming)
        bands_new = _simhash_band_rows(
            survivors, text_col, id_col, simhash_bits, max_hamming
        ).localCheckpoint(eager=False)
    else:
        bands_new = _band_rows(
            survivors, text_col, id_col, n, num_hashes, bands
        ).localCheckpoint(eager=False)
    band_keys = [
        r[0]
        for r in bands_new.select("band_hash").distinct().limit(PROBE_CAP + 1).collect()
    ]
    old_bands = (
        _pruned_index(store, band_table, "band_hash", band_keys, rep)
        if store.exists(band_table)
        else None
    )
    # ONE edge construction for both modes (r16 review): candidate =
    # band agreement; in simhash mode an EDGE additionally requires
    # the row-local two-word Hamming verify ≤ cap, making incremental
    # recall EXACT w.r.t. the signature, same as the batch operator.
    sig_cols = ("sh0", "sh1") if near_dup == "simhash" else ()

    def _side(frame: DataFrame, out_id: str, tag: str) -> DataFrame:
        return frame.select(
            F.col(id_col).alias(out_id), "band_id", "band_hash",
            *[F.col(c).alias(f"_{tag}{i}") for i, c in enumerate(sig_cols)],
        )

    def _verified(cand: DataFrame, a0: str, a1: str) -> DataFrame:
        if not sig_cols:
            return cand
        ham = F.bit_count(
            F.col(a0).bitwiseXOR(F.col("_b0"))
        ) + F.bit_count(F.col(a1).bitwiseXOR(F.col("_b1")))
        return cand.filter(ham <= max_hamming)

    edges = _verified(
        _side(bands_new, "doc_a", "a")
        .join(_side(bands_new, "doc_b", "b"), ["band_id", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b")),
        "_a0", "_a1",
    ).select("doc_a", "doc_b")
    if old_bands is not None:
        # orient corpus edges old->new so the component label a new
        # doc inherits is the OLD id (always smaller under the
        # monotone-id contract) — any old contact dooms the new doc
        corpus_edges = _verified(
            bands_new.join(
                _side(old_bands, "_old_id", "b"), ["band_id", "band_hash"]
            ),
            "sh0", "sh1",
        ).select(
            F.col("_old_id").alias("doc_a"), F.col(id_col).alias("doc_b")
        )
        edges = edges.unionByName(corpus_edges)
    edges = edges.distinct()
    # the delta subgraph: new docs + directly-touched old ids only —
    # bounded by the batch's band contacts, never the corpus
    comp = DD.connected_components(edges, "doc_a", "doc_b")
    new_ids = survivors.select(F.col(id_col).alias("node"))
    labeled = new_ids.join(comp, "node", "left")
    doomed_cond = F.col("component").isNotNull() & (
        (F.col("component") != F.col("node"))
    )
    keep_ids = labeled.filter(~F.coalesce(doomed_cond, F.lit(False))).select(
        F.col("node").alias(id_col)
    )
    kept = (
        survivors.join(keep_ids, id_col, "left_semi")
        .drop("_ch")
        # lazy: kept_rows right below materializes it in the same job
        .localCheckpoint(eager=False)
    )
    rep["batch_rows"] = batch.count()
    rep["kept_rows"] = kept.count()
    # ALL exact-survivors are indexed, kept AND near-dup-dropped: a
    # later doc can connect to the corpus TRANSITIVELY through a
    # dropped near-dup (all-at-once components see that path, so the
    # incremental index must too — indexing only kept docs would keep
    # such a doc and break the batch-equals-all-at-once contract).
    # Exact-dropped docs need no rows: their signature is identical to
    # their surviving twin's.
    # lazy: a cheap projection of the already-cached survivors —
    # cached by the persist phase's first action. Deferral cannot
    # change the rows NOT because the lineage avoids the store (it
    # anti-joins a pruned read of EXACT_TABLE) but because store reads
    # pin an explicit file list at plan time and the checkpoint blocks
    # are cached: a later index append never enters this plan, and a
    # recompute after block loss replays the same pinned snapshot.
    surv_hashes = survivors.select(
        F.col("_ch").alias("content_hash"), F.col(id_col)
    ).localCheckpoint(eager=False)
    return kept, surv_hashes, bands_new, rep


def dedup_persist(
    store: TableStore,
    surv_hashes: DataFrame,
    bands_new: DataFrame,
    n_rows_hint: int = 0,
    band_table: str = BAND_TABLE,
    simhash_spec: tuple[int, int] | None = None,
) -> None:
    """The PERSISTENCE phase: append the decision's index rows
    (range-clustered, one atomic manifest extend per table).
    ``band_table`` names the near-dup index the decision built
    (MinHash or SimHash — the caller passes the mode's table);
    ``simhash_spec`` = (bits, max_hamming) records the SimHash
    construction parameters next to the index on first persist, so
    later decides refuse a drifted spec instead of silently missing
    every cross-batch near-dup."""
    n_files = max(1, min(8, int(n_rows_hint) // 50_000 + 1))
    if simhash_spec is not None and band_table == SIMHASH_BAND_TABLE:
        _record_simhash_spec(store, *simhash_spec)
    _append_clustered(store, EXACT_TABLE, surv_hashes, "content_hash", n_files)
    _append_clustered(store, band_table, bands_new, "band_hash", n_files)


# -- line-level incremental dedup (the Dolma production shape) --------------

LINE_TABLE = "DedupLineIndex"
#: Line probes get their OWN (smaller) cap: md5 keys are uniform over
#: the hash space, so an in-list probe only skips files while the
#: probe count is small relative to the file count — a file covering
#: 1/F of the space is hit by B uniform values with p = 1-(1-1/F)^B,
#: ~1 already at B in the low thousands. Beyond the cap the right
#: shape is ONE distributed pass over the index (read + hash join),
#: not a pretend prune — and the driver never collects the hash list
#: at all (the old path hauled 100k strings up before deciding).
LINE_PROBE_CAP = 10_000

#: Bucket count for NEWLY-CREATED line-index mirrors. The bucket
#: count is also the over-cap join's parallelism ceiling on the index
#: side (one task per bucket), so size it to the CLUSTER before first
#: ingest — 64 suits local boxes; a 1000-executor deployment wants
#: thousands. The count is frozen per mirror at creation (bucketBy
#: appends must match the existing spec): the sync marker records it,
#: and every later append/registration honors the RECORDED count, so
#: changing this constant mid-life can never corrupt an existing
#: mirror — rebuild the mirror (drop + re-ingest) to rescale.
LINE_MIRROR_BUCKETS = 64


def _mirror_name(store: TableStore, table: str = None) -> str:
    """Catalog table name for a store index table's bucketed mirror —
    derived from the store root AND the index table, so two stores in
    one session (or two mirrored indexes of one store) never collide."""
    import hashlib
    import os

    table = table or LINE_TABLE
    digest = hashlib.md5(os.path.abspath(store.root).encode()).hexdigest()[:12]
    return f"dedup_mirror_{table.lower()}_{digest}"


def _mirror_loc(store: TableStore, table: str = None) -> str:
    import os

    return os.path.join(store.root, "_bucketed", table or LINE_TABLE)


def _mirror_marker(store: TableStore, table: str = None) -> str:
    import os

    return os.path.join(
        store.root, "_bucketed", f"_{table or LINE_TABLE}_rows.json"
    )


def _mirror_append(
    store: TableStore, table: str, col: str, new_rows: DataFrame,
    n_new: int | None = None,
) -> None:
    """Maintain an index table's BUCKETED mirror (VERDICT r13 next #2):
    a catalog table CLUSTERED BY (col) under the store root, so the
    over-cap decide path joins the index WITHOUT shuffling it — only
    the batch's keys move (plan-pinned). Storage is paid twice (the
    BucketedStore.mirror_product trade): each batch appends its new
    first-occurrence keys once range-clustered (zone-map probes) and
    once bucketed (the over-cap join side). The mirror holds ONLY the
    hash column — membership is all the decide path reads.

    SYNC RULE (ADVICE r14 high): staleness is checked BEFORE the
    append, against the store count MINUS this batch. A crash between
    a prior batch's clustered append and its mirror append leaves the
    mirror missing that batch's hashes; appending only THIS batch and
    stamping the current store count would mark the mirror fresh
    while it permanently under-dedups. Out-of-sync (missed batch,
    torn marker, out-of-band index DML) → rebuild from the source
    index via ``mirror_compact``, which includes both the crashed
    batch and this one because both already live in the store."""
    import json
    import os

    n_new = new_rows.count() if n_new is None else n_new
    store_rows = store.count_rows(table)  # includes this batch's rows
    expected_before = store_rows - n_new
    marker = _mirror_marker(store, table)
    # brand-new mirror for a new index — but ONLY if no leftover
    # mirror files exist (a marker-less dir is a crash remnant;
    # appending onto it would resurrect stale hashes as "seen")
    synced = expected_before == 0 and not os.path.isdir(_mirror_loc(store, table))
    if os.path.isfile(marker) and os.path.isdir(_mirror_loc(store, table)):
        with open(marker) as f:
            synced = json.load(f).get("rows") == expected_before
    if not synced:
        mirror_compact(store, table, col)
        return
    sets = _mirror_filesets(store, table) + 1
    # accretion policy (VERDICT r14 next #2, deferred r15 next #5):
    # one file set lands per batch append. Crossing the threshold
    # MARKS the marker (breach_age counts marked appends) and leaves
    # the rewrite to the mirrors_auto_compact sweep — ingest latency
    # stays flat; only when the sweep has missed
    # MIRROR_COMPACT_DEFER_BATCHES marked appends does the persist
    # path compact inline as the bounded-tax fallback.
    over = bool(MIRROR_AUTO_COMPACT_FILESETS) and (
        sets > MIRROR_AUTO_COMPACT_FILESETS
    )
    age = _mirror_breach_age(store, table) + 1 if over else 0
    _mirror_write(
        store, table, col, new_rows, marker_rows=store_rows, sets=sets,
        breach_age=age,
    )
    if over and age > MIRROR_COMPACT_DEFER_BATCHES:
        mirror_compact(store, table, col)


def _mirror_filesets(store: TableStore, table: str) -> int:
    """File sets accreted since the last compact — the marker counts
    them (one per append; compact resets to 1). A missing marker or a
    pre-r15 marker without the counter reads as 0 (the next append
    records 1). Driver-side file read, no Spark job."""
    import json
    import os

    marker = _mirror_marker(store, table)
    if not os.path.isfile(marker):
        return 0
    with open(marker) as f:
        return int(json.load(f).get("sets", 0))


def _mirror_breach_age(store: TableStore, table: str) -> int:
    """Marked appends since the accretion threshold was first crossed
    (0 = no live breach). Lives in the sync marker; compaction —
    sweep or inline — resets it."""
    import json
    import os

    marker = _mirror_marker(store, table)
    if not os.path.isfile(marker):
        return 0
    with open(marker) as f:
        return int(json.load(f).get("breach_age", 0))


def _mirror_write(
    store: TableStore, table: str, col: str, rows: DataFrame,
    marker_rows: int, n_buckets: int | None = None, sets: int = 1,
    breach_age: int = 0,
) -> None:
    """The raw bucketed append + marker refresh (marker written LAST,
    so any crash window leaves a detectably-stale marker, never a
    fresh marker over missing rows)."""
    import json
    import os

    name = _mirror_name(store, table)
    loc = _mirror_loc(store, table)
    n_buckets = n_buckets or _mirror_buckets(store, table)
    _ensure_mirror_registered(store, table, col)
    (
        rows.select(col)
        .repartition(n_buckets, F.col(col))
        .write.mode("append")
        .bucketBy(n_buckets, col)
        .sortBy(col)
        .option("path", loc)
        .format("parquet")
        .saveAsTable(name)
    )
    marker = _mirror_marker(store, table)
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w") as f:
        json.dump(
            {
                "rows": marker_rows,
                "buckets": n_buckets,
                "sets": sets,
                "breach_age": breach_age,
            },
            f,
        )


def _mirror_buckets(store: TableStore, table: str = None) -> int:
    """The mirror's FROZEN bucket count: the marker's recorded value
    when the mirror exists (appends must match the table's spec),
    else the module default for a brand-new mirror."""
    import json
    import os

    marker = _mirror_marker(store, table)
    if os.path.isfile(marker):
        with open(marker) as f:
            return int(json.load(f).get("buckets", LINE_MIRROR_BUCKETS))
    return int(LINE_MIRROR_BUCKETS)


def _ensure_mirror_registered(store: TableStore, table: str, col: str) -> None:
    """Re-attach a mirror to a fresh session's in-memory catalog: the
    bucket spec lives in the catalog, not the parquet files, so a new
    session must re-CREATE the external entry (bucket ids re-derive
    from the file names) before Spark will plan a bucketed scan."""
    import os

    spark = store.spark
    name = _mirror_name(store, table)
    loc = _mirror_loc(store, table)
    if spark.catalog.tableExists(name) or not os.path.isdir(loc):
        return
    spark.sql(
        f"CREATE TABLE {name} ({col} STRING) USING PARQUET "
        f"CLUSTERED BY ({col}) SORTED BY ({col}) "
        f"INTO {_mirror_buckets(store, table)} BUCKETS LOCATION '{loc}'"
    )


def _mirror_read(
    store: TableStore, table: str, col: str, report: dict | None = None
) -> DataFrame | None:
    """An index table's bucketed mirror, or ``None`` when it is missing
    or STALE (its marker row count disagrees with the store table's
    metadata-only count — e.g. a crash between the clustered append
    and the mirror append, or out-of-band DML on the index). Staleness
    never degrades correctness: the caller falls back to the plain
    store read, loudly."""
    import json
    import os

    rep = report if report is not None else {}
    marker = _mirror_marker(store, table)
    if not os.path.isfile(marker):
        return None
    with open(marker) as f:
        rows = json.load(f).get("rows")
    actual = store.count_rows(table)
    if rows != actual:
        rep[f"{table}_mirror"] = f"stale (mirror={rows}, store={actual})"
        return None
    # ADVICE r14 medium: a matching marker does NOT guarantee the
    # mirror files exist (crash in mirror_compact between rmtree and
    # the rebuild append leaves the store count unchanged) — a missing
    # dir or an unresolvable catalog entry degrades to the plain store
    # read instead of raising out of the decide path.
    if not os.path.isdir(_mirror_loc(store, table)):
        rep[f"{table}_mirror"] = "stale (mirror files missing)"
        return None
    try:
        _ensure_mirror_registered(store, table, col)
        return store.spark.table(_mirror_name(store, table))
    except Exception as e:  # noqa: BLE001 — fallback, never a crash
        rep[f"{table}_mirror"] = f"stale (unresolvable: {e})"
        return None


def line_mirror_read(store: TableStore, report: dict | None = None) -> DataFrame | None:
    return _mirror_read(store, LINE_TABLE, "line_hash", report)


def line_mirror_drop(store: TableStore) -> None:
    """Detach this store's mirrors' catalog entries (the data lives
    under the store root and goes with it) — throwaway stores call
    this before removing their root so the session catalog never
    dangles."""
    for t in (LINE_TABLE, WINDOW_TABLE):
        store.spark.sql(f"DROP TABLE IF EXISTS {_mirror_name(store, t)}")


def line_dedup_decide(
    store: TableStore,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 15,
    report: dict | None = None,
):
    """The DECISION phase of line-level incremental dedup: clean the
    batch against the persisted line index WITHOUT touching it.
    Returns ``(cleaned, new_rows, report)`` — ``cleaned`` is the
    per-document frame of ``dedup_lines`` (materialized), ``new_rows``
    the first-occurrence index rows to persist afterwards
    (``line_dedup_persist``). Split from the one-call form so
    orchestrators control crash ordering (``ingest_corpus_batch``
    appends the corpus before any index)."""
    from geo_explorer_etl_spark.operators.dedup import (
        _line_eligible,
        _reassemble_lines,
        _split_lines,
    )

    rep = report if report is not None else {}
    lines = _split_lines(batch, text_col, id_col)
    # persist the exploded+hashed batch ONCE: four consumers below
    # (capped distinct count, under-cap distinct collect, the winners
    # groupBy, the kept_elig join) would otherwise each re-run the
    # split/posexplode/md5 lineage (ADVICE r13 #1); unpersisted after
    # the outputs are checkpointed
    from pyspark.storagelevel import StorageLevel

    elig = (
        lines.filter(_line_eligible(min_chars))
        .withColumn("_lh", F.md5("line"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    winners = elig.groupBy("_lh").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_w")
    )
    # ONE capped collect decides the route AND yields the under-cap
    # hash list (r16: the limit-CAP+1-then-collect discipline the
    # dedup_decide and SQL-router probes already use) — the former
    # count-then-collect shape ran the distinct twice; the driver
    # haul stays bounded at CAP+1 hashes either way (review r13)
    hash_rows = (
        elig.select("_lh").distinct().limit(LINE_PROBE_CAP + 1).collect()
    )
    n_hashes = len(hash_rows)
    seen = None
    if store.exists(LINE_TABLE) and n_hashes:
        if n_hashes <= LINE_PROBE_CAP:
            hashes = [r[0] for r in hash_rows]
            idx = _pruned_index(store, LINE_TABLE, "line_hash", hashes, rep)
            seen = idx.select(F.col("line_hash").alias("_lh")).distinct()
        else:
            # over the cap: the bucketed mirror joins WITHOUT an
            # Exchange on the index side — only the batch's winners
            # shuffle into the mirror's bucketing (VERDICT r13 #2).
            # line_hash is UNIQUE in the index by construction (only
            # never-seen winners are ever appended), so no distinct —
            # a distinct would put the Exchange right back.
            mirror = line_mirror_read(store, rep)
            if mirror is not None:
                rep[f"{LINE_TABLE}_probe"] = "bucketed_mirror"
                seen = mirror.select(F.col("line_hash").alias("_lh"))
            else:
                rep[f"{LINE_TABLE}_probe"] = "full_scan"
                idx = store.read(LINE_TABLE)
                seen = idx.select(F.col("line_hash").alias("_lh")).distinct()
    if seen is not None:
        marked = winners.join(
            seen.withColumn("_seen", F.lit(True)), "_lh", "left"
        )
        if CAPTURE_PLANS and rep.get(f"{LINE_TABLE}_probe") == "bucketed_mirror":
            # the plan the mirror exists FOR, recorded so the no-
            # Exchange-on-the-index-side claim is pinnable on the real
            # decide path (the outputs are checkpointed below, which
            # erases the join from their plans). Opt-in (CAPTURE_PLANS)
            # and failure-tolerant: production batches skip it entirely
            # (ADVICE r14 low — no private JVM API on the hot path).
            plan = _capture_plan(marked)
            if plan is not None:
                rep["_mirror_join_plan"] = plan
    else:
        marked = winners.withColumn("_seen", F.lit(None).cast("boolean"))
    kept_elig = elig.join(marked, "_lh").select(
        id_col,
        "pos",
        "line",
        (
            (F.struct(F.col(id_col), F.col("pos")) == F.col("_w"))
            & F.col("_seen").isNull()
        ).alias("_keep"),
    )
    kept_short = lines.filter(~_line_eligible(min_chars)).select(
        id_col, "pos", "line", F.lit(True).alias("_keep")
    )
    cleaned = _reassemble_lines(
        kept_elig.unionByName(kept_short), id_col
    ).localCheckpoint(eager=True)
    # index only the NEW first occurrences (a seen winner is already
    # indexed by the batch that first carried it)
    new_rows = (
        marked.filter(F.col("_seen").isNull())
        .select(
            F.col("_lh").alias("line_hash"),
            F.col("_w")[id_col].alias(id_col),
            F.col("_w")["pos"].alias("pos"),
        )
        # lazy: the count right below materializes it (still BEFORE
        # the index append and the elig unpersist)
        .localCheckpoint(eager=False)
    )
    rep["new_index_rows"] = new_rows.count()
    elig.unpersist()
    return cleaned, new_rows, rep


def line_dedup_persist(store: TableStore, new_rows: DataFrame) -> None:
    """The PERSISTENCE phase: append the decision's first-occurrence
    line rows, range-clustered so the next batch's probe prunes."""
    n_new = new_rows.count()
    if n_new:
        n_files = max(1, min(8, n_new // 200_000 + 1))
        _append_clustered(store, LINE_TABLE, new_rows, "line_hash", n_files)
        # the bucketed mirror appends AFTER the source of truth: a
        # crash between the two leaves the mirror stale, which
        # line_mirror_read detects (marker vs metadata count) and the
        # decide path falls back to the plain read
        _mirror_append(store, LINE_TABLE, "line_hash", new_rows, n_new=n_new)


def incremental_dedup_lines(
    store: TableStore,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 15,
    report: dict | None = None,
) -> DataFrame:
    """LINE-level dedup of ``batch`` against every line previously
    ingested through this function (and within the batch itself) — the
    incremental twin of ``dedup.dedup_lines``, the shape a daily
    pipeline actually runs: Dolma does this with a Bloom filter; here
    the line index is an EXACT store table (``DedupLineIndex``, one
    row per first-occurrence eligible line, files range-clustered on
    the line hash), so a batch probe zone-map-prunes to the few files
    covering its own hashes and there are no false-positive removals.

    Semantics: an eligible line (trimmed length >= ``min_chars``)
    already present in the index is removed from every batch document
    — including the batch's own first copy; an eligible line new to
    the corpus keeps its batch-first occurrence (min ``(id, pos)``)
    and drops later batch copies; short lines always survive. Returns
    the cleaned per-document frame of ``dedup_lines`` (clean_text /
    lines_kept / lines_removed / chars_removed), MATERIALIZED before
    the index append so the result is stable.

    DETERMINISM CONTRACT (same as ``incremental_dedup``): with
    ``id_col`` monotone across batches, batch-then-batch equals
    ``dedup_lines`` over the union — pytest-pinned. NOT idempotent
    under re-run: a crash AFTER the index append and BEFORE the caller
    persists the cleaned batch must re-clean from the pre-crash
    result, not re-run this function (the batch's own lines are now
    indexed and would all be removed); orchestrators should persist
    the cleaned output first, then append the index — the
    ``ingest_corpus_batch`` ordering, available directly as
    ``line_dedup_decide`` + ``line_dedup_persist``.

    At 100 TB: cost ∝ batch lines, never corpus lines — the index is
    touched only through the pruned probe (``PROBE_CAP`` fallback to a
    full scan is loud in ``report``), and index growth is one
    range-clustered file set per batch (``store.compact`` with
    ``sort_by="line_hash"`` restores clustering after many appends)."""
    cleaned, new_rows, _ = line_dedup_decide(
        store, batch, text_col, id_col, min_chars, report
    )
    line_dedup_persist(store, new_rows)
    return cleaned


# -- incremental exact-substring dedup (the Lee et al. production shape) -----

WINDOW_TABLE = "DedupWindowIndex"


def substring_dedup_decide(
    store: TableStore,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 50,
    report: dict | None = None,
    normalize: bool = False,
):
    """DECISION phase of incremental exact-substring dedup: splice the
    batch against the persisted window-fingerprint index WITHOUT
    touching it. Returns ``(cleaned, new_rows, report)`` — ``cleaned``
    the per-document frame of ``dedup.dedup_substrings``
    (materialized), ``new_rows`` the batch's first-occurrence window
    fingerprints to persist afterwards (``substring_dedup_persist``).

    Rule (the keep-one-copy semantics at ``min_count=2`` — the only
    count an exact-membership index can carry): a window fingerprint
    already in the index loses EVERY batch occurrence (the corpus
    first copy lives elsewhere); a fingerprint new to the corpus keeps
    its batch-first occurrence (min ``(id, wpos)``) and loses later
    batch copies only when the batch itself repeats it. EVERY unseen
    fingerprint indexes (not just removed ones) — the next batch must
    see a once-occurring window to drop its second copy.

    Probe shape = the line index's: ONE capped distinct collect
    (bounded at LINE_PROBE_CAP + 1 rows) decides the route and yields
    the under-cap fingerprint list; under LINE_PROBE_CAP a
    zone-map-pruned in-list read; over it the bucketed mirror joins
    with ZERO Exchange on the index side (stale mirror falls back to
    the plain read, loudly)."""
    from pyspark.storagelevel import StorageLevel

    from geo_explorer_etl_spark.operators.dedup import (
        _splice_windows,
        _window_fingerprints,
    )

    rep = report if report is not None else {}
    base, fps = _window_fingerprints(batch, text_col, id_col, window)
    fps = fps.persist(StorageLevel.MEMORY_AND_DISK)
    winners = fps.groupBy("_fp").agg(
        F.min(F.struct(F.col(id_col), F.col("wpos"))).alias("_w"),
        F.count(F.lit(1)).alias("_c"),
    )
    # ONE capped collect (the line-index discipline above): route
    # decision + under-cap fingerprint list from the same job
    print_rows = (
        fps.select("_fp").distinct().limit(LINE_PROBE_CAP + 1).collect()
    )
    n_prints = len(print_rows)
    seen = None
    if store.exists(WINDOW_TABLE) and n_prints:
        if n_prints <= LINE_PROBE_CAP:
            prints = [r[0] for r in print_rows]
            idx = _pruned_index(store, WINDOW_TABLE, "window_hash", prints, rep)
            seen = idx.select(F.col("window_hash").alias("_fp")).distinct()
        else:
            mirror = _mirror_read(store, WINDOW_TABLE, "window_hash", rep)
            if mirror is not None:
                rep[f"{WINDOW_TABLE}_probe"] = "bucketed_mirror"
                seen = mirror.select(F.col("window_hash").alias("_fp"))
            else:
                rep[f"{WINDOW_TABLE}_probe"] = "full_scan"
                idx = store.read(WINDOW_TABLE)
                seen = idx.select(F.col("window_hash").alias("_fp")).distinct()
    if seen is not None:
        marked = winners.join(
            seen.withColumn("_seen", F.lit(True)), "_fp", "left"
        )
    else:
        marked = winners.withColumn("_seen", F.lit(None).cast("boolean"))
    occ = fps.join(marked, "_fp")
    losers = (
        occ.filter(
            F.col("_seen").isNotNull()
            | (
                (F.col("_c") >= 2)
                & (F.struct(F.col(id_col), F.col("wpos")) != F.col("_w"))
            )
        )
        .groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list("wpos")).alias("_starts"),
            F.count(F.lit(1)).alias("windows_removed"),
        )
    )
    cleaned = _splice_windows(
        base, losers, id_col, window, normalize=normalize
    ).localCheckpoint(eager=True)
    new_rows = (
        marked.filter(F.col("_seen").isNull())
        .select(
            F.col("_fp").alias("window_hash"),
            F.col("_w")[id_col].alias(id_col),
            F.col("_w")["wpos"].alias("wpos"),
        )
        # lazy: the count right below materializes it (still BEFORE
        # the index append and the fps unpersist)
        .localCheckpoint(eager=False)
    )
    rep["new_index_rows"] = new_rows.count()
    fps.unpersist()
    return cleaned, new_rows, rep


def substring_dedup_persist(store: TableStore, new_rows: DataFrame) -> None:
    """PERSISTENCE phase: append the first-occurrence window prints —
    range-clustered for the next batch's zone-map probe, then the
    bucketed mirror (a crash between the two leaves the mirror
    detectably stale; decide falls back to the plain read)."""
    n_new = new_rows.count()
    if n_new:
        n_files = max(1, min(8, n_new // 200_000 + 1))
        _append_clustered(store, WINDOW_TABLE, new_rows, "window_hash", n_files)
        _mirror_append(store, WINDOW_TABLE, "window_hash", new_rows, n_new=n_new)


def incremental_dedup_substrings(
    store: TableStore,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 50,
    report: dict | None = None,
    normalize: bool = False,
) -> DataFrame:
    """Exact-substring dedup of ``batch`` against every window
    previously ingested through this function (and within the batch)
    — the incremental twin of ``dedup.dedup_substrings`` at
    ``min_count=2``, the shape a daily Lee-et-al pipeline runs: cost
    is O(batch windows), the corpus-sized fingerprint index is touched
    only through the pruned probe / bucketed mirror.

    DETERMINISM CONTRACT (the line/exact rule): with ``id_col``
    monotone across batches, batch-then-batch equals the all-at-once
    ``dedup_substrings(window, min_count=2)`` on the union —
    pytest-pinned. The cleaned frame materializes BEFORE the index
    append (the ingest crash-ordering rule)."""
    cleaned, new_rows, rep = substring_dedup_decide(
        store, batch, text_col, id_col, window, report, normalize=normalize
    )
    substring_dedup_persist(store, new_rows)
    return cleaned


#: (index table, hash column) for every mirrored index this module
#: maintains — the sweep list mirrors_auto_compact walks.
MIRRORED_INDEXES = (("DedupLineIndex", "line_hash"),
                    ("DedupWindowIndex", "window_hash"))


def mirrors_auto_compact(
    store: TableStore, threshold: int | None = None
) -> dict:
    """Policy sweep over every index mirror of this store — the
    explicit maintenance companion of ``TableStore.auto_compact`` for
    the bucketed side (VERDICT r14 next #2): compact exactly the
    mirrors whose accreted file sets exceed ``threshold`` (default
    ``MIRROR_AUTO_COMPACT_FILESETS``) or whose marker carries a live
    breach mark. Since r16 (VERDICT r15 next #5) this sweep is the
    DEFAULT executor of the rewrite: breach batches only MARK the
    marker and return fast; the persist path compacts inline only
    after ``MIRROR_COMPACT_DEFER_BATCHES`` marked appends without a
    sweep — a nightly maintenance job calls ``store.auto_compact()``
    and this back to back. Healthy mirrors are a marker read each
    (no Spark job). Returns ``{table: {"sets": n, "marked": bool,
    "compacted": bool}}`` for mirrors that exist."""
    thr = MIRROR_AUTO_COMPACT_FILESETS if threshold is None else threshold
    report: dict = {}
    for table, col in MIRRORED_INDEXES:
        sets = _mirror_filesets(store, table)
        if not sets:
            continue
        marked = _mirror_breach_age(store, table) > 0
        hit = marked or (bool(thr) and sets > thr)
        if hit:
            mirror_compact(store, table, col)
        report[table] = {"sets": sets, "marked": marked, "compacted": hit}
    return report


def mirror_compact(store: TableStore, table: str = None, col: str = "line_hash") -> int:
    """Rewrite an index table's bucketed mirror into one file set —
    every batch append adds a file per touched bucket (bucketed
    appends never rewrite), so after N batches each bucket holds up to
    N files: open-file overhead on every over-cap join and no trusted
    sortBy order. Rebuilds FROM THE SOURCE INDEX (the store table is
    the truth — a stale mirror comes back current as a side effect),
    one distributed job at the marker-frozen bucket count, marker
    refreshed last. Returns the mirror row count. The maintenance
    companion of ``store.compact`` for the range-clustered side."""
    import os
    import shutil

    table = table or LINE_TABLE
    idx = store.read(table)
    # freeze the bucket count BEFORE removing the marker, then remove
    # the marker FIRST: any crash inside the rebuild window leaves a
    # marker-less (= detectably stale) mirror, never a fresh-looking
    # marker over missing or partial files (ADVICE r14 medium)
    n_buckets = _mirror_buckets(store, table)
    loc = _mirror_loc(store, table)
    marker = _mirror_marker(store, table)
    if os.path.isfile(marker):
        os.remove(marker)
    store.spark.sql(f"DROP TABLE IF EXISTS {_mirror_name(store, table)}")
    if idx is None:
        shutil.rmtree(loc, ignore_errors=True)
        return 0
    rows = idx.select(col).localCheckpoint(eager=True)
    shutil.rmtree(loc, ignore_errors=True)
    n = rows.count()
    _mirror_write(store, table, col, rows, marker_rows=store.count_rows(table),
                  n_buckets=n_buckets)
    return n
