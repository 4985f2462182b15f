"""Text-analysis operators for training-data pipelines: quality
scoring, token counting, language ID, fingerprinting, PII scrubbing,
sequence packing, corpus-level LM scoring.

Row-local column expressions (higher-order array functions) pipeline
inside whole-stage codegen with zero shuffles, so throughput at 100 TB
is scan-bound — EXCEPT the two operators whose semantics are global by
nature and say so in their docstrings: ``pack_offsets`` (a distributed
prefix sum) and ``unigram_logprob`` (corpus-statistics vocabulary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = ["the", "a", "of", "and", "to", "in"]
STOPWORDS_FR = ["le", "la", "de", "et", "un", "les"]
STOPWORDS_DE = ["der", "die", "das", "und", "ein", "zu"]
STOPWORDS_ES = ["el", "la", "de", "y", "un", "en"]

# BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation.
# The symbol class spells out WS_RE's whitespace set instead of \s:
# Java's \s matches \x0B (vertical tab), RE2's does not — with \s the
# engine and a DuckDB oracle disagree by one token per \x0B (the same
# skew the r14 WS_RE fix closed for the splitting tokenizers; caught
# by the r15 adversarial-parity gate on text_token_count_bpe).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]"
PUNCT_RE = "[.,;:!?]"

# PII patterns, deliberately restricted to syntax BOTH Java regex
# (Spark) and RE2 (DuckDB) evaluate identically — character classes,
# bounded quantifiers, \b/\d; no lookaround, no backreferences — so
# the email/IP counts can sit under the cross-engine value hash.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# Phones stay OUT of the oracle: `[\d()\s.-]{7,}` exercises the one
# place Java (leftmost-first backtracking) and RE2 (leftmost-longest)
# can disagree on match extents; pytest pins it with known answers.
PII_PHONE_RE = r"\+?\d[\d()\s.-]{7,}\d"



#: Whitespace-tokenizer class, written out EXPLICITLY so Spark (Java
#: regex) and the DuckDB oracles (RE2) agree on every input: Java's
#: \s additionally matches \x0B (vertical tab) while RE2's does not —
#: a generated text containing one would silently split the engines.
#: This is RE2's \s, which Java interprets identically.
WS_RE = "[ \t\n\f\r]+"

def _ws_tokens(text: Column) -> Column:
    return F.split(F.trim(text), WS_RE)


def _count_in(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda x: x.isin(*words)))


def fingerprint_expr(text: Column) -> Column:
    """md5 of the sorted distinct token set — the order-insensitive
    content fingerprint used by both ``fingerprint`` and the combined
    quality query."""
    toks = F.split(F.trim(F.lower(text)), WS_RE)
    return F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))


def dup_line_fraction_expr(text: Column) -> Column:
    """Gopher-style repetition signal: the fraction of non-empty lines
    that duplicate an earlier line (0.0 = all distinct). Row-local —
    split, trim, drop empties, compare distinct count to count."""
    # explicit single-arg lambda: F.trim's optional second parameter
    # makes the HOF introspection treat it as a (element, index)
    # callable, and the index silently becomes the trim-CHARACTER set
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    n = F.size(lines)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        F.round(
            1.0 - F.size(F.array_distinct(lines)).cast("double") / n, 4
        )
    )


def dup_line_char_fraction_expr(text: Column) -> Column:
    """Gopher repetition: fraction of CHARACTERS sitting in duplicate
    occurrences of a line (0.0 = all line chars distinct) — the
    char-weighted sibling of ``dup_line_fraction_expr``, same
    non-empty-trimmed-line universe. Row-local HOF fold."""
    lines = F.filter(
        # coalesce: NULL text is an EMPTY document (fraction 0.0, like
        # the DuckDB leg's COALESCE(list_sum(...), 0) guard), not NULL
        F.transform(F.split(F.coalesce(text, F.lit("")), "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    zero = F.lit(0).cast("long")
    tot = F.aggregate(lines, zero, lambda a, x: a + F.length(x))
    dis = F.aggregate(
        F.array_distinct(lines), zero, lambda a, x: a + F.length(x)
    )
    return F.when(tot <= 0, F.lit(0.0)).otherwise(
        F.round(1.0 - dis.cast("double") / tot, 4)
    )


def top_ngram_char_fraction_expr(text: Column, n: int = 2) -> Column:
    """Gopher repetition: characters covered by the MOST FREQUENT word
    n-gram (positional — overlapping occurrences each count) divided
    by the text length; ties break to the lexicographically smallest
    gram. Row-local: sort the positional grams, then ONE fold tracks
    the current run and the best run — the first max in sorted order
    IS the lexicographic tie-break, and the expression stays
    constant-size (no per-gram unrolling)."""
    toks = F.split(F.trim(F.lower(text)), WS_RE)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    grams = F.array_sort(F.transform(idx, gram))
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit("").alias("prev"),
        zero.alias("run"),
        F.lit("").alias("best"),
        zero.alias("bestn"),
    )

    def step(acc, g):
        new_run = F.when(g == acc.prev, acc.run + 1).otherwise(
            F.lit(1).cast("long")
        )
        better = new_run > acc.bestn
        return F.struct(
            g.alias("prev"),
            new_run.alias("run"),
            F.when(better, g).otherwise(acc.best).alias("best"),
            F.when(better, new_run).otherwise(acc.bestn).alias("bestn"),
        )

    acc = F.aggregate(grams, init, step)
    chars = (acc.bestn * F.length(acc.best)).cast("double")
    return F.when(
        (F.size(toks) >= n) & (F.length(text) > 0),
        F.round(chars / F.length(text), 4),
    ).otherwise(F.lit(0.0))


def dup_ngram_char_fraction_expr(text: Column, n: int = 5) -> Column:
    """Gopher repetition: the fraction of CHARACTERS covered by at
    least one occurrence of a DUPLICATED word n-gram — true distinct
    coverage, bounded by 1.0, so Gopher Table-A1's published drop
    thresholds (~0.10-0.15 for the 5..10-gram family) apply directly
    (review r13: the first cut multi-counted overlapping occurrences
    and exceeded 1 on repetitive text). Covered chars = the covered
    tokens' lengths plus the separators INSIDE contiguous covered
    runs — the same arithmetic the decontamination span leg hashes.

    Expression-shape rule (the second r13 lesson): a HOF lambda
    re-evaluates every outer subexpression it references once PER
    ELEMENT, so the duplicated-gram set and the token-length table
    ride in the fold's INITIAL ACCUMULATOR — evaluated once per row —
    and the walk is interval algebra over the flagged gram positions
    (each covered token charged exactly once via the last-covered-end
    watermark), never a per-position scan of a rebuilt flags array
    (which made the first formulation O(L²·split) and hung the
    oracle differential)."""
    toks = F.split(F.trim(F.lower(text)), WS_RE)
    t_cnt = F.size(toks)
    m = t_cnt - (n - 1)  # number of positional n-grams
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    grams = F.transform(F.sequence(F.lit(1), m), gram)
    zero = F.lit(0).cast("long")
    dup_init = F.struct(
        F.lit("").alias("prev"),
        zero.alias("run"),
        F.array().cast("array<string>").alias("d"),
    )

    def dup_step(acc, g):
        new_run = F.when(g == acc.prev, acc.run + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            g.alias("prev"),
            new_run.alias("run"),
            F.when(new_run == 2, F.array_append(acc.d, g))
            .otherwise(acc.d)
            .alias("d"),
        )

    dupset = F.aggregate(F.array_sort(grams), dup_init, dup_step).d
    walk_init = F.struct(
        dupset.alias("d"),                       # evaluated ONCE per row
        F.transform(toks, F.length).alias("l"),  # token-length table
        F.lit(-(10**9)).cast("int").alias("end"),
        zero.alias("cc"),
        zero.alias("nc"),
        zero.alias("runs"),
    )
    indexed = F.transform(
        grams,
        # 2-arg lambda: the element AND its 0-based index — reuses the
        # materialized gram array instead of rebuilding every gram
        # (the function's own materialize-once rule, review r13)
        lambda g, i0: F.struct((i0 + 1).alias("i"), g.alias("g")),
    )

    def walk_step(acc, el):
        flag = F.array_contains(acc.d, el.g)
        lo = F.greatest(el.i, acc.end + 1)
        hi = el.i + (n - 1)
        span = F.when(
            flag,
            F.aggregate(
                F.sequence(lo, hi),
                zero,
                lambda a, p: a + F.element_at(acc.l, p),
            ),
        ).otherwise(zero)
        return F.struct(
            acc.d.alias("d"),
            acc.l.alias("l"),
            F.when(flag, hi).otherwise(acc.end).cast("int").alias("end"),
            (acc.cc + span).cast("long").alias("cc"),
            (acc.nc + F.when(flag, hi - lo + 1).otherwise(0))
            .cast("long")
            .alias("nc"),
            (acc.runs + F.when(flag & (el.i > acc.end + 1), 1).otherwise(0))
            .cast("long")
            .alias("runs"),
        )

    walk = F.aggregate(indexed, walk_init, walk_step)
    chars = (walk.cc + walk.nc - walk.runs).cast("double")
    return F.when(
        (t_cnt >= n) & (F.length(text) > 0),
        F.round(chars / F.length(text), 4),
    ).otherwise(F.lit(0.0))


def _pii_exprs(text: Column) -> dict[str, Column]:
    """THE sequential PII pass, shared by ``pii_scrub`` and the
    quality fold (review r10 wave 8 — two inline copies had already
    drifted): counts and tags come from the same progressive
    redaction, so ``n_emails + n_ipv4 + n_phones`` always equals the
    tag count in ``redacted`` and an IP-shaped email host or
    phone-shaped IP never double-counts."""
    after_email = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IPV4_RE, "<IP>")
    return {
        "n_emails": F.regexp_count(text, F.lit(PII_EMAIL_RE)).cast("long"),
        "n_ipv4": F.regexp_count(after_email, F.lit(PII_IPV4_RE)).cast("long"),
        "n_phones": F.regexp_count(after_ip, F.lit(PII_PHONE_RE)).cast("long"),
        "redacted": F.regexp_replace(after_ip, PII_PHONE_RE, "<PHONE>"),
    }


def pii_scrub(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """PII detection + redaction for corpus assembly (the CCNet/Dolma
    pre-training hygiene pass): per-doc match counts for emails,
    IPv4 addresses, and phone-shaped digit runs, plus the text with
    each match replaced by a typed tag. Row-local regexes — zero
    shuffle, scan-bound at 100 TB.

    Counts and tags come from the SAME sequential pass (review r10
    wave 6 — counting each pattern on the raw text disagreed with the
    tags: an IP is also a phone-shaped digit run, an email host can
    be IP-shaped): emails count on the raw text, IPs on the
    email-redacted text, phones on the IP-redacted text, so
    ``n_emails + n_ipv4 + n_phones`` always equals the tag count in
    ``redacted``."""
    e = _pii_exprs(F.col(text_col))
    return df.select(
        F.col(id_col),
        e["n_emails"].alias("n_emails"),
        e["n_ipv4"].alias("n_ipv4"),
        e["n_phones"].alias("n_phones"),
        e["redacted"].alias("redacted"),
    )


def quality_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    with_fingerprint: bool = False,
    with_pii: bool = False,
    with_repetition: bool = False,
) -> DataFrame:
    """Per-document quality features: token count, stopword ratio,
    distinct-token ratio, punctuation count — optionally plus the
    order-insensitive content fingerprint, the PII hygiene signals
    (incl. the line-count duplicate fraction), and — separately
    gated, ``with_repetition`` — the heavier Gopher char-coverage
    repetition family (each is a per-row sorted-gram fold, ~3-4x the
    plain scan's cost; all row-local, one scan either way)."""
    text = F.col(text_col)
    toks = _ws_tokens(text)
    lt = F.lower(text)
    n_tokens = F.size(toks).cast("long")
    cols = [
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.col("n_chars").cast("long").alias("n_chars_meta"),
        F.round(
            _count_in(F.transform(toks, F.lower), STOPWORDS_EN).cast("double")
            / F.size(toks),
            4,
        ).alias("stopword_ratio"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 4
        ).alias("distinct_ratio"),
        (F.length(lt) - F.length(F.regexp_replace(lt, PUNCT_RE, ""))).cast("long").alias(
            "n_punct"
        ),
    ]
    if with_fingerprint:
        cols.append(fingerprint_expr(text).alias("fingerprint"))
    if with_pii:
        e = _pii_exprs(text)  # the ONE sequential-count rule
        cols += [
            e["n_emails"].alias("n_emails"),
            e["n_ipv4"].alias("n_ipv4"),
            dup_line_fraction_expr(text).alias("dup_line_fraction"),
        ]
    if with_repetition:
        # Gopher Table-A1 repetition signals (r13): char-weighted
        # duplicate lines, most-frequent-bigram char coverage, and
        # duplicate-5-gram char coverage
        cols += [
            dup_line_char_fraction_expr(text).alias("dup_line_char_fraction"),
            top_ngram_char_fraction_expr(text, 2).alias("top2gram_char_frac"),
            dup_ngram_char_fraction_expr(text, 5).alias("dup5gram_char_frac"),
        ]
    return df.select(*cols)


def token_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    method: str = "regex",
    merges: list | None = None,
) -> DataFrame:
    """Per-document token counts.

    - ``method="regex"`` (default): whitespace and BPE-ish regex
      counts — pure column expressions, zero shuffle, SQL-oracle-able
      (the registered entry's path).
    - ``method="bpe_vocab"`` (round 11, VERDICT directive #4): REAL
      byte-pair encoding against a trained ``merges`` table
      (``operators/bpe.train_bpe``), Arrow-batched — the counts a
      training run actually sees, so ``pack_offsets`` packs true
      sequence lengths. Returns the same ``n_bpe_tokens`` column name
      so packing composes unchanged (``n_ws_tokens`` still the regex
      whitespace count, computed Spark-side)."""
    text = F.col(text_col)
    if method == "bpe_vocab":
        if not merges:
            raise ValueError(
                "token_counts(method='bpe_vocab') needs a trained merges "
                "table — operators.bpe.train_bpe(corpus)"
            )
        from geo_explorer_etl_spark.operators.bpe import bpe_encode_counts

        # the whitespace count is computed Spark-side on the SAME scan
        # and carried through the one mapInPandas — no second corpus
        # read, no re-join on doc id (review r11)
        with_ws = df.withColumn(
            "n_ws_tokens", F.size(_ws_tokens(text)).cast("long")
        )
        return bpe_encode_counts(
            with_ws,
            merges,
            text_col=text_col,
            id_col=id_col,
            carry_cols=["n_ws_tokens"],
        )
    if method != "regex":
        raise ValueError(f"token_counts method {method!r} not in regex|bpe_vocab")
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)).cast("long").alias(
            "n_bpe_tokens"
        ),
        F.size(_ws_tokens(text)).cast("long").alias("n_ws_tokens"),
    )


#: Tokens per packed training sequence (the GPT-style context window).
PACK_WINDOW = 2048


def pack_offsets(
    df: DataFrame,
    tokens_col: str,
    id_col: str,
    window: int = PACK_WINDOW,
    n_ranges: int | None = None,
) -> DataFrame:
    """Sequence packing for pretraining-data assembly, GPT-style
    concat-then-chunk: documents ordered by ``id_col`` are treated as
    one token stream sliced into fixed ``window``-token sequences, and
    each document gets its global ``pack_offset`` (tokens before it),
    ``pack_first`` and ``pack_last`` (the sequence ids its tokens land
    in — a doc longer than the window spans several; boundary docs
    split across two). Deterministic: a pure function of the id order
    and the token counts.

    The global running total is the textbook DISTRIBUTED PREFIX SUM,
    never a single-partition global Window (the naive
    ``Window.orderBy(id)`` plan funnels 100 TB through ONE task):

    1. split the NUMERIC id domain into ``n_ranges`` contiguous
       value-buckets from its [min, max] (one tiny aggregate —
       deterministic by construction, unlike ``repartitionByRange``
       whose sampled boundaries can move between the two passes);
    2. ONE per-bucket total aggregate (``n_ranges`` rows, map-side
       partial) → exclusive prefix bases on the driver;
    3. bases broadcast back; within-bucket cumulative sum under a
       PARTITIONED window — every bucket ranks in parallel.

    Bucket boundaries never affect the result — base + within-bucket
    sum telescopes to the same global cumsum wherever the cuts fall
    (skewed id densities only skew WORK, never values).

    COST NOTE: the input frame is evaluated by THREE jobs (the id
    domain/null-check aggregate, the per-bucket totals, and the output
    itself) — deliberately uncached, because this function cannot know
    the caller's memory budget and a hidden ``persist`` of a 100 TB
    lineage is worse than a documented recompute. When the upstream
    computation is expensive (e.g. per-doc tokenization), persist the
    narrow ``(id, tokens)`` projection before calling and unpersist
    after the action (review r10 wave 6)."""
    from pyspark.sql import Window

    spark = df.sparkSession
    if n_ranges is None:
        n_ranges = max(2, spark.sparkContext.defaultParallelism)
    lo_hi = df.agg(
        F.min(F.col(id_col)).alias("lo"),
        F.max(F.col(id_col)).alias("hi"),
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.col(id_col)).alias("n_id"),
    ).first()
    if int(lo_hi["n_all"]) != int(lo_hi["n_id"]):
        # a null id has no position in the pack order — bucketing
        # would silently drop it through the inner base join and
        # deflate every later offset (review r10 wave 6): refuse
        raise ValueError(
            f"pack_offsets: {int(lo_hi['n_all']) - int(lo_hi['n_id'])} "
            f"null value(s) in id column {id_col!r} — packing needs a "
            "total order; filter or assign ids first"
        )
    if lo_hi["lo"] is None:
        return (
            df.withColumn("pack_offset", F.lit(0).cast("long"))
            .withColumn("pack_first", F.lit(0).cast("long"))
            .withColumn("pack_last", F.lit(0).cast("long"))
        )
    lo, hi = int(lo_hi["lo"]), int(lo_hi["hi"])
    span = max(1, (hi - lo + 1 + n_ranges - 1) // n_ranges)
    bucket = F.floor((F.col(id_col) - F.lit(lo)) / F.lit(span)).cast("int")
    parts = df.withColumn("__bkt", bucket)
    totals = parts.groupBy("__bkt").agg(
        F.sum(F.col(tokens_col)).alias("__t")
    ).collect()
    bases, acc = [], 0
    for r in sorted(totals, key=lambda r: r["__bkt"]):
        bases.append((int(r["__bkt"]), acc))
        acc += int(r["__t"] or 0)
    base_df = F.broadcast(
        spark.createDataFrame(bases or [(0, 0)], "__bkt int, __base long")
    )
    w = (
        Window.partitionBy("__bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = (
        F.col("__base") + F.coalesce(F.sum(F.col(tokens_col)).over(w), F.lit(0))
    ).cast("long")
    return (
        parts.join(base_df, "__bkt")
        .withColumn("pack_offset", offset)
        .withColumn(
            "pack_first", F.floor(F.col("pack_offset") / window).cast("long")
        )
        .withColumn(
            "pack_last",
            F.floor(
                (F.col("pack_offset") + F.greatest(F.col(tokens_col), F.lit(1)) - 1)
                / window
            ).cast("long"),
        )
        .drop("__bkt", "__base")
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab_size: int = 50000,
    restore_ids: bool = True,
) -> DataFrame:
    """Corpus-statistics quality score — the CCNet-style LM-perplexity
    proxy, with a unigram model ESTIMATED FROM THE CORPUS ITSELF
    rather than an external KenLM: each document scores the mean log
    probability of its tokens under the corpus' top-``vocab_size``
    unigram distribution (out-of-vocab tokens get a deterministic
    floor of ln(0.5 / total_tokens)). Near-zero scores mean stereotyped
    common-token text; very negative means rare-token noise — both
    tails are what a pretraining filter trims.

    The one text operator here that is NOT row-local, by necessity:
    the vocabulary is a global property. Shapes chosen for 100 TB —
    token counting is the classic map-side-combined word count, the
    top-K vocabulary resolves as TakeOrderedAndProject (never a global
    sort), scoring joins the BROADCAST vocab (bounded by vocab_size),
    and the per-doc mean is one keyed aggregation. Ties at the vocab
    boundary break on the token string, so the model is deterministic."""
    text = F.col(text_col)
    toks = F.filter(
        F.split(F.trim(F.lower(text)), WS_RE), lambda x: x != F.lit("")
    )
    exploded = df.select(F.col(id_col), F.explode(toks).alias("__tok"))
    counts = exploded.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    # the corpus token total rides IN-PLAN as a broadcast 1-row cross
    # join (review r10 wave 7): an eager `.first()` here both launched
    # a full corpus job at PLAN-CONSTRUCTION time (an EXPLAIN of the
    # folded query cost a corpus pass) and froze the total as a
    # literal while counts stayed lazy — appended data could push
    # c/total_stale above 1. In-plan, total and counts always describe
    # the same snapshot, and the two aggregations over the identical
    # counts subtree dedupe under ReuseExchange.
    tot = counts.agg(F.sum("__c").cast("double").alias("__total"))
    vocab = (
        counts.orderBy(F.col("__c").desc(), F.col("__tok"))
        .limit(vocab_size)
        .select("__tok", "__c")
    )
    lp = F.when(
        F.col("__c").isNotNull(), F.log(F.col("__c") / F.col("__total"))
    ).otherwise(F.log(F.lit(0.5) / F.col("__total")))
    scored = (
        exploded.join(F.broadcast(vocab), "__tok", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(F.round(F.avg(lp), 4).alias("lm_logprob"))
    )
    if not restore_ids:
        # caller already left-joins on the full id set — the wrapper
        # scan of `df` below would be a pure extra corpus pass
        return scored
    # empty/token-less docs keep a row with a null score
    return df.select(F.col(id_col)).join(scored, id_col, "left")


def langid(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-vote language ID (en/fr/de/es) with a deterministic
    argmax tiebreak (en > fr > de > es). A heuristic by construction —
    the oracle checks the formula, not linguistic truth."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), WS_RE)
    en = _count_in(toks, STOPWORDS_EN)
    fr = _count_in(toks, STOPWORDS_FR)
    de = _count_in(toks, STOPWORDS_DE)
    es = _count_in(toks, STOPWORDS_ES)
    guess = (
        F.when((en >= fr) & (en >= de) & (en >= es), "en")
        .when((fr >= de) & (fr >= es), "fr")
        .when(de >= es, "de")
        .otherwise("es")
    )
    return df.select(F.col(id_col), guess.alias("lang_guess"))


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token set — catches shuffled/duplicated-content documents that
    exact hashing misses."""
    return df.select(
        F.col(id_col), fingerprint_expr(F.col(text_col)).alias("fingerprint")
    )
