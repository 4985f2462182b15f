"""End-to-end training-corpus construction: the composition the
individual operators exist for, as one declarative pipeline.

``build_training_corpus`` chains the stages a large-scale LLM data
pipeline runs over a raw document pool:

1. LANGUAGE gate        — stopword-vote langid, keep the wanted set;
2. QUALITY gates        — token-count window, stopword ratio (too low =
   non-natural text), distinct-token ratio (too low = boilerplate);
3. EXACT dedup          — one survivor (min id) per md5 content group;
4. NEAR-DUP removal     — MinHash-LSH candidate pairs clustered by
   connected components, min-id representative kept per cluster;
5. TOKEN BUDGET (opt.)  — deterministic prefix by ascending id under a
   total BPE-token cap.

Every stage is lazy DataFrame ops on the same lineage — Catalyst fuses
the scans, and nothing here collects fact-sized data. The token budget
uses a TWO-LEVEL cumulative sum (per-bucket totals prefix-summed on the
driver — thousands of rows, never documents — then a within-bucket
window), so the global running total needs no single-partition sort at
100 TB.

Stage counts are exposed via ``corpus_report`` as a separate (eager)
helper rather than side effects inside the builder, so the composed
plan stays one lazy lineage unless a report is actually wanted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from geo_explorer_etl_spark.operators import dedup as DD
from geo_explorer_etl_spark.operators import text as TX

BPE_TOKEN_RE = TX.BPE_TOKEN_RE


def build_training_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    languages: tuple[str, ...] = ("en",),
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_stopword_ratio: float = 0.0,
    min_distinct_ratio: float = 0.0,
    near_dup: bool = True,
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    near_dup_mode: str = "minhash",
    simhash_bits: int = 96,
    max_hamming: int = 3,
    token_budget: int | None = None,
    budget_bucket_width: int = 100_000,
    eval_df: DataFrame | None = None,
    decon_ngram: int = 13,
    domain_weights: dict[str, float] | None = None,
    domain_col: str = "source",
) -> DataFrame:
    """The cleaned corpus: original document rows (all columns) that
    survive every gate, deterministically — same input, same survivor
    set, independent of partitioning (min-id representatives, id-ordered
    budget prefix). ``eval_df`` switches on the decontamination gate
    (docs sharing a ``decon_ngram``-gram with the eval suite drop —
    ``_apply_gates`` docstring for ordering). ``domain_weights``
    (VERDICT r11 next #5) splits ``token_budget`` into per-domain
    budgets (``mixture_budgets``' deterministic rounding) and keeps
    each domain's own ascending-id prefix — the 30%-code/5%-wiki
    corpus-composition recipe; domains outside the mixture drop."""
    kept = _apply_gates(
        docs, text_col, id_col, languages,
        min_tokens, max_tokens, min_stopword_ratio, min_distinct_ratio,
        eval_df=eval_df, decon_ngram=decon_ngram,
    )

    # exact dedup: the canonical (min-id) doc of each content group
    canon = DD.exact_dedup_groups(kept, text_col=text_col, id_col=id_col).select(
        F.col("canonical_doc_id").alias(id_col)
    )
    kept = kept.join(canon, id_col)

    if near_dup:
        # near_dup_mode mirrors ingest_corpus_batch (VERDICT r15 next
        # #1c): "simhash" = banded wide signatures with exact recall at
        # the Hamming cap — the batch twin of the incremental SimHash
        # index, so batch-equals-ingest holds in BOTH modes
        if near_dup_mode == "simhash":
            pairs = DD.simhash_pairs(
                kept, text_col=text_col, id_col=id_col,
                bits=simhash_bits, max_hamming=max_hamming,
                max_bucket_size=None,
            )
        elif near_dup_mode == "minhash":
            pairs = DD.minhash_lsh_candidates(
                kept, text_col=text_col, id_col=id_col,
                n=shingle_n, num_hashes=num_hashes, bands=bands,
            )
        else:
            raise ValueError(
                f"build_training_corpus: unknown near_dup_mode "
                f"{near_dup_mode!r}"
            )
        kept = DD.keep_representatives(kept, pairs, id_col=id_col)

    if domain_weights is not None:
        if token_budget is None:
            raise ValueError(
                "build_training_corpus: domain_weights needs token_budget "
                "(weights are fractions OF the total budget)"
            )
        kept = _prefix_under_budget_by_domain(
            kept, text_col, id_col, domain_col,
            mixture_budgets(token_budget, domain_weights),
            budget_bucket_width,
        )
    elif token_budget is not None:
        kept = _prefix_under_budget(
            kept, text_col, id_col, token_budget, budget_bucket_width
        )
    return kept


def _apply_gates(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    languages: tuple[str, ...],
    min_tokens: int,
    max_tokens: int,
    min_stopword_ratio: float,
    min_distinct_ratio: float,
    eval_df: DataFrame | None = None,
    decon_ngram: int = 13,
) -> DataFrame:
    """THE language/quality gate stage, shared by the batch builder
    and ``ingest_corpus_batch`` — the ingest/batch equivalence
    contract depends on one definition (review r11). ``eval_df``
    (r12, VERDICT r11 next #3) adds the DECONTAMINATION gate: any doc
    sharing a ``decon_ngram``-gram with the eval suite is dropped —
    it runs AFTER the cheap row-local gates (fewer docs to shingle)
    and BEFORE dedup (a contaminated doc must not be the kept
    representative of a clean duplicate group). A doc that IS
    row-identical to a clean doc still survives through its clean
    twin; near-dup grouping likewise prefers clean survivors."""
    lang = TX.langid(docs, text_col=text_col, id_col=id_col)
    kept = docs.join(
        lang.filter(F.col("lang_guess").isin(*languages)).select(id_col), id_col
    )
    q = TX.quality_scores(kept, text_col=text_col, id_col=id_col)
    good = q.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
        & (F.col("distinct_ratio") >= min_distinct_ratio)
    ).select(id_col)
    kept = kept.join(good, id_col)
    if eval_df is not None:
        flagged = DD.decontaminate(
            kept, eval_df, n=decon_ngram, text_col=text_col, id_col=id_col
        ).select(id_col)
        kept = kept.join(flagged, id_col, "left_anti")
    return kept


def _prefix_under_budget(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    token_budget: int,
    bucket_width: int,
    return_total: bool = False,
):
    """Keep the longest ascending-id prefix whose cumulative BPE token
    count stays within ``token_budget`` — deterministic subset
    selection under a cap.

    Scale shape: a naive cumulative sum is a GLOBAL ordered window =
    one partition holding the corpus. Instead: (1) per-doc token
    counts; (2) per-BUCKET totals (bucket = id div width) — a tiny
    aggregate; (3) the bucket prefix offsets computed on the DRIVER
    (#buckets rows, never documents) and joined back broadcast;
    (4) a within-bucket ordered window finishes the running total.
    Window state per task is one bucket, not the corpus."""
    toks = docs.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0))
        .cast("long")
        .alias("_ntok"),
        (F.col(id_col) / bucket_width).cast("long").alias("_bucket"),
    )
    bucket_totals = (
        toks.groupBy("_bucket").agg(F.sum("_ntok").alias("_btot")).collect()
    )
    offsets = {}
    running = 0
    for r in sorted(bucket_totals, key=lambda r: r["_bucket"]):
        offsets[r["_bucket"]] = running
        running += r["_btot"]
    spark = docs.sparkSession
    off_df = spark.createDataFrame(
        [(b, o) for b, o in offsets.items()], "_bucket long, _offset long"
    )
    w = Window.partitionBy("_bucket").orderBy(id_col)
    cum = (
        toks.join(F.broadcast(off_df), "_bucket")
        .withColumn("_cum", F.sum("_ntok").over(w) + F.col("_offset"))
        .filter(F.col("_cum") <= token_budget)
        .select(id_col)
    )
    out = docs.join(cum, id_col)
    # `running` is the INPUT's total token count — callers carrying a
    # cross-batch budget need it (the global prefix's cumsum includes
    # REJECTED docs' tokens: once a doc overflows, the budget is
    # exhausted permanently), and the bucket totals already paid for
    # it (review r11 — no second tokenization scan)
    return (out, int(running)) if return_total else out


def mixture_budgets(token_budget: int, weights: dict[str, float]) -> dict[str, int]:
    """Per-domain token budgets from mixture weights (VERDICT r11 next
    #5): ``{"code": 0.3, "web": 0.65, "wiki": 0.05}`` × total budget,
    rounded DETERMINISTICALLY by largest remainder (ties by domain
    name) so the per-domain integers sum exactly to
    ``floor(token_budget × sum(weights))`` — no token silently lost or
    invented by floor-ing each domain independently."""
    if not weights:
        raise ValueError("mixture_budgets: empty weights")
    bad = {d: w for d, w in weights.items() if w < 0}
    if bad:
        raise ValueError(f"mixture_budgets: negative weight(s) {bad}")
    total_w = sum(weights.values())
    if total_w > 1.0 + 1e-9:
        raise ValueError(
            f"mixture_budgets: weights sum to {total_w:.6f} > 1 — a "
            "mixture cannot admit more than the total budget"
        )
    raw = {d: token_budget * w for d, w in weights.items()}
    out = {d: int(raw[d]) for d in weights}
    leftover = int(token_budget * total_w + 1e-9) - sum(out.values())
    by_remainder = sorted(
        weights, key=lambda d: (-(raw[d] - out[d]), d)
    )
    for d in by_remainder[:leftover]:
        out[d] += 1
    return out


#: split_corpus resolution: assignments are exact integer basis
#: points over this many hash cells.
SPLIT_CELLS = 10_000


def split_corpus(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    out_col: str = "split",
    stratify_by: str | None = None,
) -> DataFrame:
    """Deterministic train/val/test split assignment (r15): each
    row's split is a PURE FUNCTION of ``(seed, id)`` — the first 15
    hex chars of ``md5(f"{seed}:{id}")`` taken mod ``SPLIT_CELLS``,
    compared against cumulative integer thresholds. Properties a
    training pipeline needs and a bare ``randomSplit`` lacks:

    - machine-, partitioning- and run-independent: re-running on a
      re-shuffled or re-partitioned corpus can NEVER move a document
      across splits (randomSplit's per-partition sampling does);
    - engine-reproducible: any engine with md5 rebuilds the identical
      assignment (the DuckDB oracle does, bit for bit);
    - exact proportions at the cell grain: weights resolve to integer
      basis points by the ``mixture_budgets`` largest-remainder rule
      (weights must cover 1.0 — a split, unlike a mixture, cannot
      leave documents unassigned), so thresholds are exact, not
      float-accumulated;
    - row-local: zero shuffle at any scale.

    ``stratify_by`` (VERDICT r15 next #4) names a column to STRATIFY
    on: the hash input becomes ``f"{seed}:{stratum}:{id}"``, so the
    cell distribution — and therefore the threshold proportions — is
    uniform WITHIN every stratum independently (a domain cannot drift
    toward val because its ids happened to cluster in the unsalted
    hash space), while the assignment stays a pure function of
    (seed, stratum, id): replay-safe across partitionings, runs and
    machines, and changing one document's stratum value moves only
    that document. A NULL stratum is its own stratum
    (``'__null__'``). Strata containing ``:`` fold into the key
    verbatim (numeric ids cannot collide; exotic string-id corpora
    should avoid ``:`` in the stratifier).

    Returns ``df`` plus ``out_col``; NULL ids get a NULL split
    (surface them upstream — a null key has no stable identity).
    Threshold order is the ``weights`` dict's insertion order."""
    if not weights:
        raise ValueError("split_corpus: empty weights")
    total_w = sum(weights.values())
    if abs(total_w - 1.0) > 1e-9:
        raise ValueError(
            f"split_corpus: weights sum to {total_w:.6f} — a split must "
            "cover exactly 1.0 (every document belongs to one split)"
        )
    cells = mixture_budgets(SPLIT_CELLS, weights)
    if min(cells.values()) == 0:
        tiny = [d for d, c in cells.items() if c == 0]
        raise ValueError(
            f"split_corpus: weight(s) {tiny} resolve to zero of "
            f"{SPLIT_CELLS} cells — raise the weight or SPLIT_CELLS"
        )
    if stratify_by is None:
        key = F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    else:
        key = F.concat(
            F.lit(f"{seed}:"),
            F.coalesce(F.col(stratify_by).cast("string"), F.lit("__null__")),
            F.lit(":"),
            F.col(id_col).cast("string"),
        )
    h = (
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
        % SPLIT_CELLS
    )
    expr = None
    cum = 0
    names = list(weights)
    for name in names[:-1]:
        cum += cells[name]
        cond = h < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(
        out_col, F.when(F.col(id_col).isNull(), None).otherwise(last)
    )


def split_corpus_threshold_sql(
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    stratify_by: str | None = None,
) -> str:
    """The ANSI-SQL twin of ``split_corpus``'s assignment expression
    (oracle construction): a CASE over the same md5-derived cell and
    the same largest-remainder thresholds, stratified when
    ``stratify_by`` is set. Split names and the column identifiers
    interpolate into SQL text, so all validate against a word regex
    first (ADVICE r15: a name carrying a quote would produce broken —
    or injectable — oracle SQL)."""
    import re

    for nm in list(weights):
        if not re.fullmatch(r"\w+", str(nm)):
            raise ValueError(
                f"split_corpus_threshold_sql: split name {nm!r} is not a "
                "bare word — names interpolate into SQL text"
            )
    for ident in [id_col] + ([stratify_by] if stratify_by else []):
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", ident):
            raise ValueError(
                f"split_corpus_threshold_sql: column {ident!r} is not a "
                "bare identifier"
            )
    cells = mixture_budgets(SPLIT_CELLS, weights)
    if stratify_by is None:
        keysql = f"CONCAT('{seed}:', CAST({id_col} AS VARCHAR))"
    else:
        keysql = (
            f"CONCAT('{seed}:', "
            f"COALESCE(CAST({stratify_by} AS VARCHAR), '__null__'), ':', "
            f"CAST({id_col} AS VARCHAR))"
        )
    hsql = (
        f"CAST(('0x' || substr(md5({keysql}), 1, 15)) AS BIGINT) "
        f"% {SPLIT_CELLS}"
    )
    names = list(weights)
    arms, cum = [], 0
    for name in names[:-1]:
        cum += cells[name]
        arms.append(f"WHEN {hsql} < {cum} THEN '{name}'")
    body = " ".join(arms)
    return f"CASE WHEN {id_col} IS NULL THEN NULL {body} ELSE '{names[-1]}' END"


def _prefix_under_budget_by_domain(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    domain_col: str,
    budgets: dict[str, int],
    bucket_width: int,
    return_totals: bool = False,
):
    """The two-level budget prefix (``_prefix_under_budget``) run PER
    DOMAIN: each domain keeps its own longest ascending-id prefix
    within its own budget. Same scale shape — per-(domain, bucket)
    totals are the only driver data (#domains × #buckets rows), the
    within-bucket window now partitions by (domain, bucket). Docs
    whose domain carries no weight are dropped (weight zero). NULL
    domains are dropped too — a doc outside every declared mixture
    component cannot be admitted against any budget."""
    domains = sorted(budgets)
    toks = docs.select(
        F.col(id_col),
        F.col(domain_col).alias("_dom"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0))
        .cast("long")
        .alias("_ntok"),
        (F.col(id_col) / bucket_width).cast("long").alias("_bucket"),
    ).filter(F.col(domain_col).isin(domains))
    bucket_totals = (
        toks.groupBy("_dom", "_bucket").agg(F.sum("_ntok").alias("_btot")).collect()
    )
    offsets: list[tuple] = []
    totals: dict[str, int] = {d: 0 for d in domains}
    for r in sorted(bucket_totals, key=lambda r: (r["_dom"], r["_bucket"])):
        offsets.append((r["_dom"], r["_bucket"], totals[r["_dom"]]))
        totals[r["_dom"]] += r["_btot"]
    spark = docs.sparkSession
    off_df = spark.createDataFrame(
        offsets or [("", -1, 0)], "_dom string, _bucket long, _offset long"
    )
    bud_df = spark.createDataFrame(
        [(d, budgets[d]) for d in domains], "_dom string, _dbudget long"
    )
    w = Window.partitionBy("_dom", "_bucket").orderBy(id_col)
    cum = (
        toks.join(F.broadcast(off_df), ["_dom", "_bucket"])
        .join(F.broadcast(bud_df), "_dom")
        .withColumn("_cum", F.sum("_ntok").over(w) + F.col("_offset"))
        .filter(F.col("_cum") <= F.col("_dbudget"))
        .select(id_col)
    )
    out = docs.join(cum, id_col)
    return (out, {d: int(n) for d, n in totals.items()}) if return_totals else out


def corpus_report(docs: DataFrame, stages: dict[str, DataFrame]) -> dict[str, int]:
    """Eager per-stage survivor counts for observability — separate
    from the builder so the composed plan itself stays lazy."""
    out = {"input": docs.count()}
    for name, frame in stages.items():
        out[name] = frame.count()
    return out


def export_shards(
    store,
    df: DataFrame,
    n_shards: int,
    seed: int,
    table: str = "TrainingShards",
    id_col: str = "doc_id",
    shuffle_within: bool = False,
) -> dict:
    """Deterministic training-shard export — VERDICT r10 directive #5:
    the step after ``build_training_corpus`` that turns the budgeted
    corpus into the fixed shard layout a training run consumes.

    - MEMBERSHIP is a pure function of ``(seed, id)``:
      ``xxhash64(seed, id) mod n_shards`` — the seeded global shuffle.
      Same seed → identical shard membership across runs, machines,
      and partitionings (pytest-pinned); a new seed reshuffles.
    - LAYOUT: one file per shard (each shard value hashes to exactly
      one write task), rows sorted by ``id_col`` inside the file, the
      shard id doubling as the store partition value — so the export
      goes through the TableStore commit path and is ACID (atomic
      manifests per shard, snapshot-isolated readers), time-travelable,
      and ``describe()``-able like any other table.
    - SIZES: hash-uniform — shards differ by O(sqrt(rows/shards))
      (pytest-pinned tolerance), the standard trade for a stateless
      membership function.
    - ORDER: id-sorted within each shard by default (debuggable,
      delta-friendly); ``shuffle_within=True`` orders rows by
      ``xxhash64(seed+1, id)`` instead — the deterministic seeded
      WITHIN-shard shuffle a training consumer reading shards
      sequentially needs (id order replays ingest order, which is a
      curriculum bias; same seed → identical order across runs and
      partitionings — ``id_col`` breaks the astronomically-rare
      64-bit hash tie deterministically).

    Returns ``{"table", "n_shards", "rows", "files"}``. Refuses an
    existing table: shard exports are immutable artifacts — write a
    new table (or vacuum + drop the old one) rather than silently
    mixing two exports.
    """
    from geo_explorer_etl_spark.sources.store import PARTITION_COL

    if n_shards < 1:
        raise ValueError("export_shards: n_shards must be >= 1")
    if store.exists(table):
        raise ValueError(
            f"export_shards: table {table!r} already exists — shard "
            "exports are immutable; export under a new name"
        )
    if PARTITION_COL in df.columns:
        df = df.drop(PARTITION_COL)
    shard = F.pmod(F.xxhash64(F.lit(int(seed)), F.col(id_col)), F.lit(n_shards))
    out = (
        df.withColumn(PARTITION_COL, shard.cast("long"))
        # one partition per shard VALUE: hash partitioning sends each
        # VALUE to exactly one task — that task owns every row of the
        # shard, so the shard's directory gets exactly one file. Two
        # shard values COLLIDING into one task is fine (that task
        # writes two files into two different shard directories); the
        # guarantee is per-directory, not a perfect hash (VERDICT r11
        # nit). Rows id-sorted within.
        .repartition(n_shards, PARTITION_COL)
        # the partition col LEADS the sort: dynamic-partition writers
        # require task rows clustered by the partition columns and
        # insert their own (order-destroying) sort otherwise — with
        # the prefix satisfied, rows stream to each shard's file in
        # exactly this order (review r13: the shuffled order came
        # back writer-mangled without it whenever two shard values
        # collided into one task)
        .sortWithinPartitions(
            F.col(PARTITION_COL),
            *(
                [F.xxhash64(F.lit(int(seed) + 1), F.col(id_col)), F.col(id_col)]
                if shuffle_within
                else [F.col(id_col)]
            ),
        )
    )
    store.append(table, out)
    # plain append leaves fresh partitions in listing mode; adoption
    # gives every shard its manifest (zone maps, row counts, ACID DML)
    store.adopt_manifests(table)
    desc = store.describe(table) or {}
    return {
        "table": table,
        "n_shards": n_shards,
        "rows": desc.get("rows"),
        "files": desc.get("files"),
    }


def ingest_corpus_batch(
    store,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    languages: tuple[str, ...] = ("en",),
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_stopword_ratio: float = 0.0,
    min_distinct_ratio: float = 0.0,
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    near_dup_mode: str = "minhash",
    simhash_bits: int = 96,
    max_hamming: int = 3,
    token_budget: int | None = None,
    budget_bucket_width: int = 100_000,
    corpus_table: str = "Corpus",
    report: dict | None = None,
    eval_df: DataFrame | None = None,
    decon_ngram: int = 13,
    domain_weights: dict[str, float] | None = None,
    domain_col: str = "source",
    ann_batch: DataFrame | None = None,
    ann_policy: dict | None = None,
    line_dedup: bool = False,
    line_min_chars: int = 15,
    substring_dedup: bool = False,
    substring_window: int = 50,
) -> DataFrame:
    """The INCREMENTAL twin of ``build_training_corpus`` — the daily
    ingest a production pipeline actually runs, in O(batch):

    1. GATES — the shared ``_apply_gates`` stage (one batch scan);
    2. DEDUP DECISION — ``dedup_decide`` against the persisted indexes
       (new-vs-corpus AND new-vs-new), WITHOUT persisting yet;
       ``near_dup_mode`` picks the fuzzy leg (VERDICT r15 next #1c):
       ``"minhash"`` (shingle-Jaccard banding) or ``"simhash"``
       (``simhash_bits``-bit banded signatures with exact recall at
       Hamming ≤ ``max_hamming``) — one mode per store, enforced; with
       ``line_dedup=True`` the survivors are additionally LINE-scrubbed
       against the persisted line index (``line_dedup_decide`` — the
       Dolma paragraph dedupe), docs scrubbed empty drop, and the
       budget then charges the CLEANED text; ``substring_dedup=True``
       additionally splices corpus-duplicated ``substring_window``-token
       runs (the Lee et al. rule, ``substring_dedup_decide``) — both
       scrubs compose, line first;
    3. BUDGET — the deterministic ascending-id token-budget prefix,
       carried ACROSS batches through a CAS-versioned running total at
       the store root. The carry counts ALL dedup-survivor tokens,
       accepted or rejected — the global prefix's cumulative sum does
       too, so once a doc overflows the budget it is exhausted
       permanently, exactly like ``build_training_corpus`` over the
       union (review r11). Admission runs inside the conditional-write
       loop: a concurrent ingest that moved the counter forces a
       recompute against the new remaining budget, so two racers can
       never jointly overspend.
    4. WRITES, crash-ordered for convergence (review r11): corpus
       append FIRST (guarded by an anti-join against ids already in
       the corpus, so a retry after a partial run never duplicates),
       THEN the dedup-index rows, with the budget marker recording the
       batch digest so a retry neither double-charges tokens nor
       re-admits against a self-charged counter. A crash at any point
       leaves a state from which re-running the SAME batch converges
       to the committed outcome. Index order: LINE rows first (once
       the exact index holds the batch, a retry keeps nothing and
       could never re-derive them), then exact+band; only a crash
       between the exact and band appends narrows future near-dup
       recall for this batch's docs (each append is itself atomic),
       and the budget's retry digest is computed over the PRE-scrub
       survivors so every window re-admits without double-charging.

    Returns the batch's accepted rows (materialized). With monotone
    ids, the corpus table after N ingests equals
    ``build_training_corpus`` over the concatenation — pytest-pinned.
    """
    from pathlib import Path

    from geo_explorer_etl_spark.operators.incremental_dedup import (
        dedup_decide,
        dedup_persist,
    )
    from geo_explorer_etl_spark.sources.commit import CommitConflict
    from geo_explorer_etl_spark.sources.store import PARTITION_COL

    rep: dict = report if report is not None else {}
    gated = _apply_gates(
        batch, text_col, id_col, languages,
        min_tokens, max_tokens, min_stopword_ratio, min_distinct_ratio,
        eval_df=eval_df, decon_ngram=decon_ngram,
    )
    kept, surv_hashes, bands_new, rep = dedup_decide(
        store, gated, text_col, id_col, shingle_n, num_hashes, bands, rep,
        near_dup=near_dup_mode, simhash_bits=simhash_bits,
        max_hamming=max_hamming,
    )
    line_rows = None
    window_rows = None
    pre_scrub = kept
    if line_dedup:
        # opt-in LINE-level scrub (Dolma paragraph dedupe) of the
        # doc-dedup survivors BEFORE the budget, so token accounting
        # charges the text that actually lands in the corpus; docs
        # scrubbed down to nothing are dropped (reported). The line
        # index rows persist LAST with the other indexes — a retry
        # whose lines are already indexed scrubs its docs empty, and
        # the corpus anti-join absorbs it (the docs already landed).
        from geo_explorer_etl_spark.operators.incremental_dedup import (
            line_dedup_decide,
        )

        cleaned, line_rows, rep = line_dedup_decide(
            store, kept, text_col, id_col, line_min_chars, rep
        )
        kept = kept.drop(text_col).join(
            cleaned.select(
                id_col, F.col("clean_text").alias(text_col)
            ),
            id_col,
        ).filter(F.length(F.trim(F.col(text_col))) > 0)
        # counted off the already-materialized cleaned frame — no
        # re-execution of the scrub join (review r13)
        rep["line_scrubbed_empty"] = cleaned.filter(
            F.length(F.trim(F.col("clean_text"))) == 0
        ).count()
    if substring_dedup:
        # opt-in EXACT-SUBSTRING scrub (the Lee et al. window rule)
        # over the (possibly line-cleaned) survivors, before the
        # budget for the same reason as the line scrub; window index
        # rows persist with the line rows (before the exact/band
        # indexes — the same crash-window reasoning)
        from geo_explorer_etl_spark.operators.incremental_dedup import (
            substring_dedup_decide,
        )

        cleaned2, window_rows, rep = substring_dedup_decide(
            store, kept, text_col, id_col, substring_window, rep
        )
        kept = kept.drop(text_col).join(
            cleaned2.select(
                id_col, F.col("clean_text").alias(text_col)
            ),
            id_col,
        ).filter(F.length(F.trim(F.col(text_col))) > 0)
        rep["substring_scrubbed_empty"] = cleaned2.filter(
            F.length(F.trim(F.col("clean_text"))) == 0
        ).count()
    if domain_weights is not None and token_budget is None:
        raise ValueError(
            "ingest_corpus_batch: domain_weights needs token_budget"
        )
    if token_budget is not None:
        kept = _budget_admit(
            store, corpus_table, kept, text_col, id_col,
            token_budget, budget_bucket_width, rep,
            domain_budgets=(
                mixture_budgets(token_budget, domain_weights)
                if domain_weights is not None
                else None
            ),
            domain_col=domain_col,
            # retry digest over the PRE-scrub survivors (stable across
            # every crash window; the post-scrub set shrinks on a
            # retry whose lines are already indexed)
            digest_basis=(
                pre_scrub if (line_dedup or substring_dedup) else None
            ),
        )
    rep["accepted_rows"] = kept.count()
    if rep["accepted_rows"]:
        out = kept.withColumn(PARTITION_COL, F.lit(0).cast("long"))
        existing = None
        if store.exists(corpus_table):
            span = kept.select(
                F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
            ).collect()[0]
            # retry-dedup guard, bounded by the batch's id span: the
            # corpus is id-clustered, so the zone maps prune this probe
            # to the files covering [lo, hi] — with monotone ids that
            # is the table's high tail, never a corpus scan
            existing = store.read(
                corpus_table,
                where=[(id_col, "between", (span["lo"], span["hi"]))],
            )
        if existing is not None:
            out = out.join(
                existing.select(id_col).distinct(), id_col, "left_anti"
            )
        out = out.repartitionByRange(
            max(1, rep["accepted_rows"] // 500_000 + 1), id_col
        ).sortWithinPartitions(id_col)
        store.append(corpus_table, out)
        store.adopt_manifests(corpus_table)
    # index rows LAST: a crash before this point leaves the indexes
    # untouched, so the retry's dedup decision is identical and the
    # corpus anti-join absorbs any partial append
    # line index rows BEFORE the exact/band indexes: once the exact
    # index holds this batch, a retry's dedup_decide keeps nothing and
    # can never re-derive the line rows — persisting lines first makes
    # every crash window recoverable (review r13: the old order lost
    # the batch's line rows permanently on a crash between the two
    # persists; with this order a crash after the line persist retries
    # into scrubbed-empty docs that the corpus anti-join absorbs,
    # while the pre-scrub budget digest still recognizes the retry)
    if line_rows is not None:
        from geo_explorer_etl_spark.operators.incremental_dedup import (
            line_dedup_persist,
        )

        line_dedup_persist(store, line_rows)
    if window_rows is not None:
        from geo_explorer_etl_spark.operators.incremental_dedup import (
            substring_dedup_persist,
        )

        substring_dedup_persist(store, window_rows)
    from geo_explorer_etl_spark.operators.incremental_dedup import (
        BAND_TABLE,
        SIMHASH_BAND_TABLE,
    )

    dedup_persist(
        store, surv_hashes, bands_new, rep.get("kept_rows", 0),
        band_table=(
            BAND_TABLE if near_dup_mode == "minhash" else SIMHASH_BAND_TABLE
        ),
        simhash_spec=(
            (simhash_bits, max_hamming)
            if near_dup_mode == "simhash"
            else None
        ),
    )
    if ann_batch is not None:
        # opt-in vector upkeep (VERDICT r12 next #3 wiring): index the
        # ACCEPTED docs' embeddings against the frozen centroids, then
        # let the drift policy decide whether this append tipped the
        # index into a rebuild — ingest stays a one-call pipeline
        from geo_explorer_etl_spark.operators.ann_index import (
            append_ann_index,
            maintain_ann_index,
        )

        arep: dict = {}
        accepted = ann_batch.join(
            F.broadcast(kept.select(id_col).distinct())
            if rep["accepted_rows"] <= 1_000_000
            else kept.select(id_col).distinct(),
            id_col,
            "left_semi",
        )
        append_ann_index(store, accepted, report=arep)
        if ann_policy is not None:
            maintain_ann_index(store, report=arep, **ann_policy)
        rep["ann"] = arep
    return kept


def _budget_admit(
    store, corpus_table: str, kept: DataFrame, text_col: str, id_col: str,
    token_budget: int, bucket_width: int, rep: dict,
    domain_budgets: dict[str, int] | None = None, domain_col: str = "source",
    digest_basis: DataFrame | None = None,
) -> DataFrame:
    """Cross-batch budget admission under optimistic concurrency: read
    the counter version, compute the prefix against the remaining
    budget, publish the charge conditionally — a concurrent ingest
    that won the version forces a recompute (review r11: a plain
    read-then-CAS admitted against stale 'remaining' and two racers
    jointly overspent). The blob records the last batch's digest and
    charge so an immediate RETRY of the same batch re-admits against
    the pre-charge base instead of double-charging.

    With ``domain_budgets`` (r12, mixture sampling) the counter holds
    one running total PER DOMAIN under the same CAS version — one
    conditional write still commits the whole batch's charge
    atomically, so racers can't jointly overspend any single domain."""
    import hashlib
    from pathlib import Path

    from geo_explorer_etl_spark.sources.commit import CommitConflict

    key = f"_corpus_budget_{corpus_table}.json"
    # batch digest: the survivor id span + count identifies a retry
    # (ids are unique and monotone by contract). ``digest_basis``
    # overrides the frame it is computed from: the line-scrub path
    # passes the PRE-scrub doc-dedup survivors, which are stable
    # across every crash-retry window (the post-scrub set is NOT —
    # a retry whose lines already landed in the index scrubs docs
    # empty, and a digest over that set would miss the match and
    # double-charge the residue)
    stats = (digest_basis if digest_basis is not None else kept).select(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    digest = hashlib.sha256(
        f"{stats['lo']}|{stats['hi']}|{stats['n']}".encode()
    ).hexdigest()[:16]
    root = Path(store.root)

    def admit(remaining, want_totals):
        if domain_budgets is None:
            return _prefix_under_budget(
                kept, text_col, id_col, remaining, bucket_width,
                return_total=want_totals,
            )
        return _prefix_under_budget_by_domain(
            kept, text_col, id_col, domain_col, remaining, bucket_width,
            return_totals=want_totals,
        )

    while True:
        cur = store._backend.read(root, key)
        version = cur[0] if cur else 0
        body = dict(cur[1]) if cur else {}
        # the two modes charge DISJOINT fields of this blob — a
        # pipeline silently switching modes on one corpus would read
        # zero consumption and overspend the total budget (ADVICE r12
        # #4): refuse loudly, naming the recorded mode
        stored_mode = (
            "domain" if "domain_tokens" in body
            else "plain" if "tokens" in body
            else None
        )
        req_mode = "plain" if domain_budgets is None else "domain"
        if stored_mode is not None and stored_mode != req_mode:
            raise ValueError(
                f"corpus token budget for {corpus_table!r} was charged in "
                f"{stored_mode!r} mode but this ingest requests "
                f"{req_mode!r} (token_budget vs domain_weights) — the "
                "counters are not fungible; keep one mode per corpus, or "
                f"start a new corpus table (counter blob: {key})"
            )
        if domain_budgets is None:
            consumed = int(body.get("tokens", 0))
            last = int(body.get("last_tokens", 0))
        else:
            consumed = {
                d: int(n) for d, n in (body.get("domain_tokens") or {}).items()
            }
            last = {
                d: int(n)
                for d, n in (body.get("last_domain_tokens") or {}).items()
            }
        if body.get("last_digest") == digest:
            # retry of the very batch that last charged: admit against
            # the PRE-charge base and skip the write (idempotent)
            if domain_budgets is None:
                remaining = max(0, token_budget - (consumed - last))
            else:
                remaining = {
                    d: max(0, b - (consumed.get(d, 0) - last.get(d, 0)))
                    for d, b in domain_budgets.items()
                }
            admitted, _ = admit(remaining, True)
            rep["budget_tokens_consumed"] = consumed
            return admitted.localCheckpoint(eager=True)
        if domain_budgets is None:
            remaining = max(0, token_budget - consumed)
        else:
            remaining = {
                d: max(0, b - consumed.get(d, 0))
                for d, b in domain_budgets.items()
            }
        admitted, batch_total = admit(remaining, True)
        admitted = admitted.localCheckpoint(eager=True)
        if domain_budgets is None:
            new_consumed = consumed + batch_total
            new_body = {
                "tokens": new_consumed,
                "last_digest": digest,
                "last_tokens": batch_total,
            }
        else:
            new_consumed = {
                d: consumed.get(d, 0) + batch_total.get(d, 0)
                for d in set(consumed) | set(batch_total)
            }
            new_body = {
                "domain_tokens": new_consumed,
                "last_digest": digest,
                "last_domain_tokens": batch_total,
            }
        try:
            store._backend.write(root, key, new_body, expected_version=version)
            rep["budget_tokens_consumed"] = new_consumed
            return admitted
        except CommitConflict:
            continue  # a concurrent ingest moved the counter: recompute
