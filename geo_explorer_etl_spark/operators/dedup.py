"""Deduplication operators for training-data pipelines.

Four strategies, scale-ranked:

- exact            — one hash-groupBy; the 100 TB default first pass.
- minhash_lsh      — shingle -> minhash signature -> banded LSH
                     bucket join; near-dup candidates without the O(n²)
                     pair explosion (the scale path for fuzzy dedup).
- simhash          — per-doc 64/16-bit signature via higher-order
                     functions; no shuffle at all until the final
                     bucket grouping.
- ngram_jaccard    — exact pairwise Jaccard on shared-shingle pairs;
                     quadratic in the worst case, use on candidate sets
                     (or small partitions), not raw corpora.

Plus the step every pair generator feeds: ``connected_components``
(min-label propagation — union-find as iterative DataFrame joins)
clusters pairs into duplicate groups, and ``keep_representatives``
emits the deduplicated corpus (min-id doc per cluster, singletons
untouched).

All are pure DataFrame ops — shingling and signatures use Spark's
higher-order array functions, not Python UDFs.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geo_explorer_etl_spark.operators.text import WS_RE

# Universal-hash modulus for the minhash family (Mersenne prime 2^31-1):
# base values and coefficients stay below 2^31, so c*a + d < 2^62 never
# overflows ANSI-mode 64-bit arithmetic in Spark or DuckDB.
MERSENNE_P = (1 << 31) - 1

#: Byte cap for broadcasting the byte-exact splice's loser frame
#: (VERDICT r15 next #2): ~64 MB of estimated (row + window-start)
#: payload — past it the routing joins shuffle instead (identical
#: output, no driver-side materialization of an unbounded frame).
SPLICE_BROADCAST_MAX_BYTES = 64 * 1024 * 1024


def minhash_coefficients(
    num_hashes: int, seed: int = 42
) -> list[tuple[int, int]]:
    """Seeded (c_i, d_i) pairs for the affine minhash permutations
    h_i = (c_i*a + d_i) mod p. Deterministic, so the DuckDB oracle can
    inline the identical constants and rebuild signatures bit for bit."""
    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, MERSENNE_P), rnd.randrange(0, MERSENNE_P))
        for _ in range(num_hashes)
    ]


def _tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), WS_RE)


def _shingles(text: Column, n: int) -> Column:
    """Distinct word n-gram shingles as an array column (empty when the
    document has fewer than n tokens — guards sequence() against a
    descending range)."""
    toks = _tokens(text)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.when(
        F.size(toks) >= n, F.array_distinct(F.transform(idx, gram))
    ).otherwise(F.array().cast("array<string>"))


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: group by content hash, keep the smallest id as
    canonical. One shuffle on the hash — the map side pre-aggregates,
    so at 100 TB this moves one row per distinct document."""
    return df.groupBy(F.md5(F.col(text_col)).alias("content_hash")).agg(
        F.min(id_col).cast("long").alias("canonical_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def shingle_df(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, shingle) pairs, distinct per doc. Shingling is compute-bound
    — spread narrow inputs across cores first (no-op on well-split
    data)."""
    from geo_explorer_etl_spark.session import ensure_parallelism

    return ensure_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode(_shingles(F.col(text_col), n)).alias("shingle")
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    eval_id_col: str | None = None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Eval-set decontamination report (VERDICT r11 next #3): the
    GPT-3/Dolma n-gram rule — a training document is CONTAMINATED if
    it shares at least one word ``n``-gram (default 13) with any
    document of the benchmark/eval suite. Returns one row per flagged
    document: ``(id_col, decon_overlap, decon_eval_hits,
    decon_sample)`` — distinct shared shingles, distinct eval docs
    hit, and the lexicographically-first offending shingle (a
    deterministic span sample for audit). Callers drop flagged docs
    with a left-anti join (``build_training_corpus(eval_df=...)``
    wires that gate in).

    Scale shape: eval suites are benchmark-sized (thousands of docs →
    ~1e6 distinct shingles), so the eval side reduces to DISTINCT
    shingles and BROADCASTS — the corpus side's (doc × shingle)
    explosion joins map-side, no shuffle of fact data. For an
    oversized eval set pass ``broadcast_eval=False``: the equi-join
    keys on the high-cardinality shingle string, a well-distributed
    hash shuffle (the ngram_jaccard_pairs argument). Tokenization is
    ``_shingles``' rule (lower + whitespace split), shared with every
    other shingle operator so one definition governs."""
    ev = shingle_df(
        eval_docs.select(
            F.col(eval_id_col or id_col).alias("_eval_id"),
            F.col(eval_text_col or text_col).alias("_eval_text"),
        ),
        "_eval_text",
        "_eval_id",
        n,
    ).distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    return (
        shingle_df(docs, text_col, id_col, n)
        .join(ev, "shingle")
        .groupBy(id_col)
        .agg(
            F.countDistinct("shingle").alias("decon_overlap"),
            F.countDistinct("_eval_id").alias("decon_eval_hits"),
            F.min("shingle").alias("decon_sample"),
        )
    )


def decontaminate_spans(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    window: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    eval_id_col: str | None = None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """SPAN-level decontamination (VERDICT r12 next #4 — the Dolma
    scrub): instead of dropping a contaminated document wholesale,
    remove each matched eval ``n``-gram's exact character span ±
    ``window`` characters and keep the rest — the right trade for
    high-value long documents where one quoted benchmark item should
    not cost the whole text. ``decontaminate`` (doc-drop) stays the
    default gate; this is the opt-in surgical path.

    Returns ``docs`` with ``text_col`` scrubbed in place plus
    ``decon_spans_removed`` / ``decon_chars_removed`` ints (0 for
    clean documents — every row passes through). Surrounding text is
    BYTE-IDENTICAL: spans are located against the ORIGINAL string via
    ``\\S+`` token offsets (the same token sequence ``_shingles``'
    lower+whitespace rule produces), matched case-insensitively, then
    overlapping/adjacent extended spans merge before one splice pass.

    Scale shape: the matched-shingle sets ride the same broadcast
    eval-shingle join as ``decontaminate`` (fact data never
    shuffles); the splice itself is an Arrow-batched ``mapInPandas``
    pass — row-local string arithmetic, no driver data, no shuffle
    (the extension-operator lane, same as similarity/bpe)."""
    ev = shingle_df(
        eval_docs.select(
            F.col(eval_id_col or id_col).alias("_eval_id"),
            F.col(eval_text_col or text_col).alias("_eval_text"),
        ),
        "_eval_text",
        "_eval_id",
        n,
    ).select("shingle").distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    hits = (
        shingle_df(docs, text_col, id_col, n)
        .join(ev, "shingle")
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("_decon_shingles"))
    )
    joined = docs.join(hits, id_col, "left")
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in docs.schema
    )
    out_schema = f"{fields}, decon_spans_removed int, decon_chars_removed int"
    w = int(window)

    def scrub(batches):
        import re

        for pdf in batches:
            if not len(pdf):
                continue
            texts, nspans, nchars = [], [], []
            for text, grams in zip(pdf[text_col], pdf["_decon_shingles"]):
                if grams is None or len(grams) == 0 or text is None:
                    texts.append(text)
                    nspans.append(0)
                    nchars.append(0)
                    continue
                toks = list(re.finditer(r"\S+", text))
                low = [m.group(0).lower() for m in toks]
                by_len: dict[int, set] = {}
                for g in grams:
                    by_len.setdefault(g.count(" ") + 1, set()).add(g)
                spans = []
                for ln, gset in by_len.items():
                    for i in range(len(low) - ln + 1):
                        if " ".join(low[i : i + ln]) in gset:
                            spans.append(
                                (toks[i].start(), toks[i + ln - 1].end())
                            )
                if not spans:
                    texts.append(text)
                    nspans.append(0)
                    nchars.append(0)
                    continue
                spans = sorted(
                    (max(0, a - w), min(len(text), b + w)) for a, b in spans
                )
                merged = [list(spans[0])]
                for a, b in spans[1:]:
                    if a <= merged[-1][1]:
                        merged[-1][1] = max(merged[-1][1], b)
                    else:
                        merged.append([a, b])
                out, cur = [], 0
                for a, b in merged:
                    out.append(text[cur:a])
                    cur = b
                out.append(text[cur:])
                texts.append("".join(out))
                nspans.append(len(merged))
                nchars.append(sum(b - a for a, b in merged))
            res = pdf.drop(columns=["_decon_shingles"]).copy()
            res[text_col] = texts
            res["decon_spans_removed"] = nspans
            res["decon_chars_removed"] = nchars
            yield res

    return joined.mapInPandas(scrub, schema=out_schema)


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, threshold: float = 0.1
) -> DataFrame:
    """Pairwise n-gram Jaccard similarity for pairs sharing ≥1 shingle.

    shuffle plan: explode shingles -> self equi-join on shingle (hash
    shuffle on the shingle, which is high-cardinality and therefore
    well distributed) -> count per pair -> join doc sizes (broadcastable
    summary). The shingle join bounds candidates to docs that actually
    share content — never a full cross join.

    The shingle frame feeds FOUR plan positions (both self-join legs
    plus the two size lookups); materialize it once (lazy
    localCheckpoint, the similarity/minhash signature-frame pattern)
    so the corpus is scanned and shingled exactly one time — the
    captured before-plan ran 4 scan+explode passes and 20 Exchanges
    for one logical pass (guide §2.4).
    """
    sh = shingle_df(df, text_col, id_col, n).localCheckpoint(eager=False)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    # Explicit aliases: a bare self-join on `shingle` would resolve both
    # sides to the same attribute id (Spark's trivially-true-predicate
    # trap) and silently cross-join.
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle").alias("a")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle").alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_a") < F.col("b.doc_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = F.col("inter").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("inter")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 16,
    seeded_hash: str = "md5",
) -> DataFrame:
    """MinHash signature per doc: h_i = min over shingles of
    xxhash64(i, shingle). One explode + one groupBy with num_hashes
    min() aggregates.

    Plan notes (measured at sf0.1): this explode -> partial-agg shape
    is ~10x faster than the "zero-shuffle" row-local alternative
    (``array_min`` over ``transform`` lambdas) because exploded rows
    feed whole-stage-codegen'd hash+min operators, while higher-order
    function lambdas evaluate interpreted per array element. And the
    explode is NOT a shuffle cost: partial aggregation runs map-side,
    so only one signature row per doc crosses the wire — the
    (doc x shingle) expansion never leaves its input partition. This
    is the plan to keep at 100 TB.

    ``seeded_hash="md5"`` (default) is bit-for-bit reproducible in any
    engine with md5, so the whole MinHash+LSH pipeline is
    oracle-checkable (same trick as ``simhash``) — and it hashes each
    shingle ONCE, not once per seed: the classical universal-hash
    construction maps the shingle to a base integer a (56 digest bits
    mod p, p = 2³¹−1) and then applies ``num_hashes`` seeded affine
    permutations h_i = (c_i·a + d_i) mod p (c_i, d_i from
    ``minhash_coefficients``; c_i·a < 2⁶² so the arithmetic never
    overflows a signed 64-bit value under ANSI mode, in Spark or in
    the DuckDB twin). Measured at sf0.1 this is ~8× faster than
    ``num_hashes`` independent md5(seed:shingle) digests — per-shingle
    digest cost dominates the signature stage, and that stage touches
    every (doc × shingle) row. NOTE: plain double hashing (h_i =
    a + i·b) is NOT a valid family here — its argmin barely moves with
    i, which collapses band diversity and inflated the candidate set
    ~50× when measured. ``"xxhash64"`` trades oracle-checkability for
    raw hash throughput in Spark-only deployments."""
    sh = shingle_df(df, text_col, id_col, n)
    if seeded_hash == "md5":
        coeffs = minhash_coefficients(num_hashes)
        base = F.conv(F.substring(F.md5(F.col("shingle")), 1, 14), 16, 10).cast(
            "long"
        ) % F.lit(MERSENNE_P)
        sh = sh.select(F.col(id_col), base.alias("_ha"))

        def h(i: int) -> Column:
            c, d = coeffs[i]
            return (F.lit(c) * F.col("_ha") + F.lit(d)) % F.lit(MERSENNE_P)
    else:
        def h(i: int) -> Column:
            return F.xxhash64(F.lit(i), F.col("shingle"))
    aggs = [F.min(h(i)).alias(f"h{i}") for i in range(num_hashes)]
    return sh.groupBy(id_col).agg(*aggs)


def band_keys(
    sig: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """THE banding rule: signature frame (h0..h{n-1} columns) →
    ``(id, band_id, band_hash)`` rows, band key = the band's signature
    values joined as a string — engine-reproducible (a Spark-side
    F.hash() would be cheaper per byte but un-oracle-able). ONE
    definition shared by ``minhash_lsh_candidates`` and the
    incremental dedup index (operators/incremental_dedup.py), whose
    persisted band keys must stay bit-identical to the batch
    operator's across releases."""
    rows_per_band = num_hashes // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"h{b * rows_per_band + r}").cast("string")
                        for r in range(rows_per_band)
                    ],
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    return sig.select(F.col(id_col), F.explode(band_structs).alias("bb")).select(
        F.col(id_col),
        F.col("bb.band_id").alias("band_id"),
        F.col("bb.band_hash").alias("band_hash"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket_size: int | None = None,
    overflow: str = "drop",
) -> DataFrame:
    """Banded LSH over MinHash signatures: docs sharing any band bucket
    become candidate near-duplicate pairs.

    At scale: the band-bucket self-join shuffles on (band_id,
    band_hash) — a high-cardinality composite key; true near-dups
    concentrate in small buckets, so no quadratic blowup unless data
    is pathologically self-similar. ``max_bucket_size`` bounds that
    worst case (a bucket of B docs emits B²/2 pairs), with two
    selectable behaviors for over-full buckets:

    - ``overflow="drop"``: discard them before the self-join. Zero
      recall inside those buckets — at corpus scale an over-full
      bucket is near-always boilerplate/templated text, and
      byte-identical copies are already caught by
      ``exact_dedup_groups`` upstream. Candidates ≤
      bands × n_buckets × cap²/2.
    - ``overflow="salt"``: shard each over-full bucket into
      ⌈B/cap⌉ hash-shards of ~cap docs and self-join within shards.
      PARTIAL recall inside those buckets (~1/shards of their pairs —
      the cross-shard pairs are the sacrifice) instead of zero, at the
      same per-task bound: no shard exceeds ~cap expected members, so
      the worst task stays bounded and skew-free. Pick salt when
      over-full buckets may still hide real near-dups worth a
      recall floor; pick drop when they are known boilerplate.
    """
    # ONE materialization of the signatures (r16, guide §5): the band
    # self-join reads ``banded`` from both legs, and without the
    # checkpoint each leg re-ran the whole scan → shingle explode →
    # md5 → 16-min aggregation pipeline (the captured plan showed the
    # signature subtree twice). One row of 16 longs per doc — tiny.
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes).localCheckpoint(
        eager=True
    )
    banded = band_keys(sig, id_col, num_hashes, bands)
    join_keys = ["band_id", "band_hash"]
    if max_bucket_size is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("band_id", "band_hash")
        banded = banded.withColumn("_bucket_n", F.count(F.lit(1)).over(w))
        if overflow == "salt":
            shards = F.ceil(F.col("_bucket_n") / F.lit(max_bucket_size)).cast("long")
            banded = banded.withColumn(
                "_shard",
                F.when(F.col("_bucket_n") <= max_bucket_size, F.lit(0)).otherwise(
                    F.pmod(F.xxhash64(F.col(id_col)), shards).cast("int")
                ),
            ).drop("_bucket_n")
            join_keys = join_keys + ["_shard"]
        else:
            banded = banded.filter(F.col("_bucket_n") <= max_bucket_size).drop(
                "_bucket_n"
            )
    a = banded.select(F.col(id_col).alias("doc_a"), *join_keys)
    b = banded.select(F.col(id_col).alias("doc_b"), *join_keys)
    return (
        a.join(b, join_keys)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 16) -> DataFrame:
    """SimHash signature per document, computed entirely row-local with
    nested higher-order functions (no explode, no shuffle): for each bit
    position, sum +-1 votes of every distinct token's md5-derived hash,
    set the bit when the vote is positive.

    Token hash = first 15 hex chars of md5 -> 60-bit integer, so the
    same signature is reproducible in any engine with md5 (the DuckDB
    oracle mirrors it bit for bit).
    """
    from geo_explorer_etl_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    toks_sql = (
        f"array_distinct(split(trim(lower({text_col})), '{WS_RE}'))"
    )
    tok_hash = "cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)"
    expr = f"""
      aggregate(
        sequence(0, {bits - 1}),
        cast(0 as bigint),
        (acc, bit) -> acc + if(
          aggregate({toks_sql}, cast(0 as bigint),
                    (a, t) -> a + if((({tok_hash} >> bit) & 1) = 1,
                                     cast(1 as bigint), cast(-1 as bigint))) > 0,
          shiftleft(cast(1 as bigint), bit), cast(0 as bigint)))
    """
    return df.select(F.col(id_col), F.expr(expr).alias(f"simhash{bits}"))


#: One md5-derived signature word is 60 bits (15 hex chars); two
#: independent words (hex chars 1–15 and 17–31 of the same digest)
#: give the 64–128-bit signatures web-scale SimHash dedup runs
#: (VERDICT r15 next #1b) while keeping the engine-reproducibility
#: contract: any engine with md5 rebuilds both words bit for bit.
SIMHASH_WORD_BITS = 60
SIMHASH_MAX_BITS = 120

#: Finite DEFAULT bucket cap for the banded self-join (VERDICT r15
#: next #1a): on boilerplate-heavy corpora whole cohorts share a
#: signature, and an uncapped band bucket of B docs emits B²/2 pairs.
#: Mirrors MinHash's drop/salt semantics — out of the box the join is
#: never quadratic; pass ``max_bucket_size=None`` to opt out.
SIMHASH_DEFAULT_BUCKET_CAP = 256


def simhash_wide(
    df: DataFrame, text_col: str, id_col: str, bits: int = 96
) -> DataFrame:
    """SimHash signature per document for ``bits`` ≤ 120, as TWO
    md5-derived words ``(id, sh0, sh1)``: bit i < 60 comes from word
    0 (md5 hex chars 1–15 of the token digest), bit i ≥ 60 from word
    1 (chars 17–31) — so for bits ≤ 60 ``sh0`` equals ``simhash``'s
    single-word signature exactly (pytest-pinned) and ``sh1`` is 0.

    Scale shape (r16 — OPTIMIZATION_r16.md): ENTIRELY ROW-LOCAL, like
    the narrow ``simhash`` but with the md5 hoisted OUT of the bit
    loop — one ``transform`` materializes each distinct token's two
    hash words once per document, then a nested higher-order
    ``aggregate`` (bits × tokens integer ops, no hashing) folds the
    ±1 votes into each word. Zero Exchange, zero join: the signature
    column rides whatever partitioning the corpus already has.
    Documents with no tokens (NULL text) propagate NULL through the
    fold and coalesce to the all-zero signature. The r15 shape
    (explode distinct tokens → 96 per-bit SUM aggregates → join-back)
    shuffled little but its 100+-expression plan cost ~2.2 s of
    Catalyst analysis per fresh build and its aggregate ran outside
    whole-stage codegen (>100 buffer fields) — measured 6× slower
    than this shape at sf0.1 with byte-identical output."""
    if not (1 <= bits <= SIMHASH_MAX_BITS):
        raise ValueError(
            f"simhash_wide: bits={bits} must be in [1, {SIMHASH_MAX_BITS}]"
        )
    from geo_explorer_etl_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    toks = f"array_distinct(split(trim(lower({text_col})), '{WS_RE}'))"
    ws = (
        f"transform({toks}, t -> named_struct("
        f"'w0', cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint), "
        f"'w1', cast(conv(substring(md5(t), 17, 15), 16, 10) as bigint)))"
    )
    stage = df.select(F.col(id_col), F.expr(ws).alias("_ws"))

    def word_sql(lo: int, hi: int, field: str) -> str:
        # bit b of word `field`: majority vote over tokens, ±1 per
        # token — vote > 0 sets weight 2^(b-lo). The inner aggregate
        # re-scans the (already-hashed) token array per bit: bits ×
        # tokens integer lambda ops, embarrassingly parallel.
        return (
            f"aggregate(sequence({lo}, {hi - 1}), cast(0 as bigint), "
            f"(acc, b) -> acc + if("
            f"aggregate(_ws, cast(0 as bigint), "
            f"(a, w) -> a + (((w.{field} >> (b % {SIMHASH_WORD_BITS})) & 1) * 2 - 1)"
            f") > 0, "
            f"shiftleft(cast(1 as bigint), b - {lo}), cast(0 as bigint)))"
        )

    w0 = word_sql(0, min(bits, SIMHASH_WORD_BITS), "w0")
    w1 = (
        word_sql(SIMHASH_WORD_BITS, bits, "w1")
        if bits > SIMHASH_WORD_BITS
        else "cast(0 as bigint)"
    )
    return stage.select(
        F.col(id_col),
        F.expr(f"coalesce({w0}, cast(0 as bigint))").alias("sh0"),
        F.expr(f"coalesce({w1}, cast(0 as bigint))").alias("sh1"),
    )


def simhash_band_specs(bits: int, max_hamming: int) -> list[tuple[int, int, int]]:
    """THE banding rule for SimHash pairs, shared by the Spark
    operator, the incremental index and the DuckDB oracle builders:
    ``max_hamming + 1`` contiguous bands over the ``bits``-bit space,
    band b covering [b*width, (b+1)*width) with the last band taking
    the remainder. Returns [(band_id, lo, hi), ...].

    Validation lives HERE so every consumer gets it (r16 review find:
    the incremental leg accepted degenerate specs the batch operator
    refused): ``max_hamming`` ≥ 0, at least one bit per band
    (zero-width bands collide everything — a quadratic self-join),
    and no band wider than 60 bits (``simhash_band_val``'s straddle
    arithmetic must stay inside signed-64 ANSI math in Spark AND the
    DuckDB twin — the module's engine-reproducibility contract)."""
    if max_hamming < 0:
        raise ValueError(f"simhash bands: max_hamming={max_hamming} < 0")
    bands = max_hamming + 1
    width = bits // bands
    if width < 1:
        raise ValueError(
            f"simhash bands: bits={bits} splits into {bands} bands of "
            "zero width — every doc would share every band value "
            "(quadratic self-join); raise bits or lower max_hamming"
        )
    last_width = bits - (bands - 1) * width
    if max(width, last_width) > SIMHASH_WORD_BITS:
        raise ValueError(
            f"simhash bands: a {max(width, last_width)}-bit band value "
            f"overflows 64-bit arithmetic (max {SIMHASH_WORD_BITS} bits "
            "per band) — raise max_hamming or lower bits"
        )
    return [
        (b, b * width, (b + 1) * width if b < bands - 1 else bits)
        for b in range(bands)
    ]


def simhash_band_val(lo: int, hi: int, sh0: Column, sh1: Column) -> Column:
    """Band value = bits [lo, hi) of the two-word signature, as a
    Column. Three cases: fully in word 0, fully in word 1, or
    straddling the 60-bit boundary (low part = sh0's top bits — no
    mask needed, sh0 < 2^60 — plus word-1 bits shifted above them)."""
    W = SIMHASH_WORD_BITS
    if hi <= W:
        return F.shiftright(sh0, lo) % F.lit(1 << (hi - lo))
    if lo >= W:
        return F.shiftright(sh1, lo - W) % F.lit(1 << (hi - lo))
    return F.shiftright(sh0, lo) + (sh1 % F.lit(1 << (hi - W))) * F.lit(
        1 << (W - lo)
    )


def simhash_band_val_sql(lo: int, hi: int, sh0: str = "sh0", sh1: str = "sh1") -> str:
    """The ANSI-SQL twin of ``simhash_band_val`` — identical
    arithmetic, so a DuckDB oracle rebuilds the exact band keys."""
    W = SIMHASH_WORD_BITS
    if hi <= W:
        return f"({sh0} >> {lo}) % {1 << (hi - lo)}"
    if lo >= W:
        return f"({sh1} >> {lo - W}) % {1 << (hi - lo)}"
    return f"(({sh0} >> {lo}) + (({sh1} % {1 << (hi - W)}) * {1 << (W - lo)}))"


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 96,
    max_hamming: int = 3,
    max_bucket_size: int | None = SIMHASH_DEFAULT_BUCKET_CAP,
    overflow: str = "drop",
    report: dict | None = None,
) -> DataFrame:
    """Near-duplicate candidate PAIRS from SimHash signatures — the
    multi-probe banding Manku et al. (WWW'07) run at web scale: the
    ``bits``-bit signature splits into ``max_hamming + 1`` contiguous
    bands, and by pigeonhole ANY pair within Hamming distance
    ``max_hamming`` agrees exactly on at least one band — so an
    equi-join on (band_id, band_value) finds every such pair, and a
    row-local ``bit_count(xor)`` verify discards the false bucket
    collisions. Returns ``(doc_a, doc_b, hamming)``, exact w.r.t. the
    signature (no recall loss below the threshold — unlike MinHash
    banding, whose recall is probabilistic).

    Scale shape: one row-local signature pass (``simhash_wide`` — two
    md5 words give up to 120 signature bits, VERDICT r15 next #1b),
    one hash shuffle on the high-cardinality band value, a row-local
    two-word ``bit_count(xor)`` verify. ``bits`` defaults to 96
    (bands of 24 bits at the default threshold — 16M values each, so
    band collisions at corpus size are overwhelmingly REAL near-dups).

    ``max_bucket_size`` bounds the pathological bucket (templated/
    empty docs all but share a signature; a bucket of B docs emits
    B²/2 pairs) and now defaults FINITE (VERDICT r15 next #1a), with
    MinHash's two overflow behaviors:

    - ``overflow="drop"`` (default): over-full buckets drop before
      the self-join — at corpus scale they are boilerplate, and
      byte-identical copies are already caught by
      ``exact_dedup_groups`` upstream;
    - ``overflow="salt"``: shard each over-full bucket into ⌈B/cap⌉
      xxhash-shards and self-join within shards — a bounded-recall
      floor (~1/shards of the bucket's pairs) at the same per-task
      bound.

    ``report`` (optional dict) receives ``overfull_buckets`` /
    ``overfull_rows`` / ``overflow`` — the drops are counted, never
    silent (costs one small extra aggregation job)."""
    if bits > SIMHASH_MAX_BITS or bits < (max_hamming + 1):
        raise ValueError(
            f"simhash_pairs: bits={bits} must be in "
            f"[max_hamming+1, {SIMHASH_MAX_BITS}]"
        )
    if overflow not in ("drop", "salt"):
        raise ValueError(f"simhash_pairs: unknown overflow {overflow!r}")
    sig = simhash_wide(df, text_col, id_col, bits=bits)
    specs = simhash_band_specs(bits, max_hamming)
    if max_bucket_size is None:
        return _simhash_pairs_join(sig, id_col, specs, max_hamming)

    # Finite cap (the default): buckets are ≤ cap docs, so pairs can be
    # generated ROW-LOCALLY from one collect_list per bucket instead of
    # a banded self-join — one hash shuffle of the banded rows replaces
    # {window count (shuffle+sort) + two self-join legs that each
    # recomputed the whole signature pass} (guide §2.4: remove shuffles
    # outright). The signature frame is lazily localCheckpoint'ed so
    # the bucket-size pre-pass and the grouped pass share one
    # materialization — a few dozen bytes per doc, and plan
    # construction stays lazy.
    sig = sig.localCheckpoint(eager=False)
    banded = sig.select(
        id_col,
        "sh0",
        "sh1",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    simhash_band_val(lo, hi, F.col("sh0"), F.col("sh1")).alias(
                        "band_val"
                    ),
                )
                for b, lo, hi in specs
            ])
        ).alias("_b"),
    ).select(id_col, "sh0", "sh1", "_b.band_id", "_b.band_val")
    # Over-full buckets only (count > cap): normally empty or tiny —
    # AQE broadcast-joins it at runtime; on a degenerate corpus it can
    # reach rows/cap entries, which a plain join (NOT a forced
    # broadcast) still handles by sharing the (band_id, band_val)
    # partitioning with the groupBy below.
    sizes = (
        banded.groupBy("band_id", "band_val")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_bucket_size)
    )
    if report is not None:
        over = sizes.agg(
            F.count(F.lit(1)).alias("b"),
            F.coalesce(F.sum("_n"), F.lit(0)).alias("r"),
        ).collect()[0]
        report["overfull_buckets"] = over["b"]
        report["overfull_rows"] = int(over["r"])
        report["overflow"] = overflow
    joined = banded.join(sizes, ["band_id", "band_val"], "left")
    group_keys = ["band_id", "band_val"]
    if overflow == "salt":
        shards = F.ceil(F.col("_n") / F.lit(max_bucket_size)).cast("long")
        joined = joined.withColumn(
            "_shard",
            F.when(F.col("_n").isNull(), F.lit(0)).otherwise(
                F.pmod(F.xxhash64(F.col(id_col)), shards).cast("int")
            ),
        )
        group_keys = group_keys + ["_shard"]
    else:
        joined = joined.filter(F.col("_n").isNull())
    grouped = (
        joined.groupBy(*group_keys)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(id_col).alias("i"),
                        F.col("sh0").alias("s0"),
                        F.col("sh1").alias("s1"),
                    )
                )
            ).alias("m")
        )
        .filter(F.size("m") >= 2)
    )
    # In-bucket pair expansion: m is id-sorted, so element i pairs with
    # every later element (a < b by construction for non-NULL ids; a
    # NULL id yields a NULL comparison and is dropped, exactly like the
    # doc_a < doc_b filter of the join shape). The hamming verify runs
    # INSIDE the array so only true near-dup pairs are exploded.
    pair_expr = f"""
      filter(
        flatten(transform(m, (x, xi) ->
          transform(slice(m, xi + 2, size(m)), y ->
            struct(x.i AS a, y.i AS b,
                   bit_count(x.s0 ^ y.s0) + bit_count(x.s1 ^ y.s1) AS h)))),
        p -> p.h <= {max_hamming})
    """
    return (
        grouped.select(F.explode(F.expr(pair_expr)).alias("_p"))
        .select(
            F.col("_p.a").alias("doc_a"),
            F.col("_p.b").alias("doc_b"),
            F.col("_p.h").alias("hamming"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )


def _simhash_pairs_join(
    sig: DataFrame, id_col: str, specs: list[tuple[int, int, int]],
    max_hamming: int,
) -> DataFrame:
    """The UNCAPPED banded self-join (``max_bucket_size=None``, the
    explicit opt-out): kept on the join shape because row-local
    expansion of an unbounded bucket would materialize B²/2 pair
    structs in one row — the join spills gracefully instead."""
    banded = sig.select(
        id_col,
        "sh0",
        "sh1",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    simhash_band_val(lo, hi, F.col("sh0"), F.col("sh1")).alias(
                        "band_val"
                    ),
                )
                for b, lo, hi in specs
            ])
        ).alias("_b"),
    ).select(id_col, "sh0", "sh1", "_b.band_id", "_b.band_val")
    join_keys = ["band_id", "band_val"]
    a = banded.select(
        F.col(id_col).alias("doc_a"), F.col("sh0").alias("_sa0"),
        F.col("sh1").alias("_sa1"), *join_keys,
    )
    b = banded.select(
        F.col(id_col).alias("doc_b"), F.col("sh0").alias("_sb0"),
        F.col("sh1").alias("_sb1"), *join_keys,
    )
    return (
        a.join(b, join_keys)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            (
                F.bit_count(F.col("_sa0").bitwiseXOR(F.col("_sb0")))
                + F.bit_count(F.col("_sa1").bitwiseXOR(F.col("_sb1")))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iters: int = 20,
) -> DataFrame:
    """Duplicate clusters from near-dup pairs: every dedup operator in
    this module emits PAIRS; the pipeline step that follows them needs
    CLUSTERS ("these 7 docs are one document") with one representative
    kept. This is connected components over the pair graph, as
    iterative min-label propagation in plain DataFrame ops — the
    union-find analog that scales out:

    each node starts labeled with itself; every iteration each node
    takes the min of its own label and its neighbors' labels; converged
    when no label changes. Iterations needed = graph diameter — for
    dedup graphs (dense near-cliques around a template) that is small;
    ``max_iters`` bounds pathological chains, and each iteration is one
    self-equi-join + groupBy (no cartesian anything). Lineage is cut
    per iteration with localCheckpoint so the plan does not grow
    exponentially (the standard Spark iterative-algorithm pattern; at
    cluster scale use a reliable checkpoint dir instead).

    Returns (node, component) where component = min node id of the
    cluster. Nodes that appear in no pair are their own singleton
    cluster by definition and are NOT emitted — left-join the corpus
    and coalesce to the doc's own id for the full labeling
    (``keep_representatives`` does exactly that).
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    # materialize the edge set ONCE: every iteration below joins
    # against `edges`, and the caller's pair plan is typically a full
    # LSH/banding pipeline — without this cut each label round
    # re-executed that pipeline end to end (measured: the incremental
    # simhash decide spent ~4× its signature cost re-deriving edges
    # across iterations; the batch keep_representatives path re-ran
    # the MinHash join per round the same way)
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("component").alias("dst_comp")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dst_comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                F.col("node"),
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_comp"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def keep_representatives(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """The dedup KEEP set: cluster the near-dup pairs, keep the min-id
    document of every cluster, pass singletons through untouched. One
    row per surviving document, original columns preserved."""
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    labeled = docs.join(
        comp.select(F.col("node").alias(id_col), "component"), id_col, "left"
    ).withColumn("component", F.coalesce("component", F.col(id_col)))
    return (
        labeled.filter(F.col(id_col) == F.col("component")).drop("component")
    )


def _split_lines(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, pos, line) rows — one per line of every document, position
    0-based, NULL text treated as empty (Spark's split keeps trailing
    empty strings, matching DuckDB string_split)."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1))
        .alias("pos", "line"),
    )


def _line_eligible(min_chars: int) -> Column:
    return F.length(F.trim(F.col("line"))) >= int(min_chars)


def _reassemble_lines(flagged: DataFrame, id_col: str) -> DataFrame:
    """Per-document reassembly of a (id, pos, line, _keep) frame:
    surviving lines re-joined with \n in position order, plus the
    kept/removed/chars-removed accounting. One doc-grain shuffle.

    ``flagged`` carries EVERY line of each document (callers union the
    kept-eligible and short frames), and ``split(text, '\\n', -1)``
    followed by ``join('\\n')`` is the identity — so the source length
    is ``sum(length(line)) + count - 1`` and rides this aggregate. The
    former shape re-scanned the corpus for ``length(text)`` and paid a
    doc-key join to attach it (guide §2.4: one pass, not two)."""
    out = flagged.groupBy(id_col).agg(
        # ordered reassembly without an order-sensitive collect:
        # sort the (pos, line) structs AFTER collection (struct sort
        # is field-lexicographic, pos first), then strip to the text
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_keep"), F.struct("pos", "line"))
                    )
                ),
                lambda s: s.line,
            ),
            "\n",
        ).alias("clean_text"),
        F.sum(F.when(F.col("_keep"), 1).otherwise(0))
        .cast("long")
        .alias("lines_kept"),
        F.sum(F.when(F.col("_keep"), 0).otherwise(1))
        .cast("long")
        .alias("lines_removed"),
        (F.sum(F.length("line")) + F.count(F.lit(1)) - 1).alias("_src_len"),
    )
    return out.select(
        id_col,
        "clean_text",
        "lines_kept",
        "lines_removed",
        (F.col("_src_len") - F.length("clean_text"))
        .cast("long")
        .alias("chars_removed"),
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 15,
    scope: str = "corpus",
) -> DataFrame:
    """Corpus-wide LINE-level exact dedup (the C4 / Dolma paragraph
    dedupe): a line that already occurred anywhere earlier in the
    corpus — ordered by ``(id, line position)`` — is removed from
    every later document; the first occurrence survives. Duplicates
    INSIDE one document fall out of the same rule (the first copy
    keeps, later copies drop). Lines whose trimmed length is below
    ``min_chars`` are never dedup-eligible (boilerplate headers,
    blank separators — and the skew guard: the hottest line keys in
    a web corpus are short, and they never enter the shuffle).

    Returns one row per input document: ``(id, clean_text,
    lines_kept, lines_removed, chars_removed)`` where ``clean_text``
    is the surviving lines re-joined with ``\n`` (possibly the empty
    string when every line was a later duplicate) and
    ``chars_removed = length(text) - length(clean_text)``.

    Scale shape: three shuffles, all key-hashed — (1) groupBy(line)
    over ELIGIBLE lines only, with map-side combine collapsing each
    map partition to one ``min(struct(id, pos))`` row per distinct
    line, so a line duplicated a million times moves one row per
    partition, not a million; (2) the eligible lines re-join their
    winner on the line key (AQE-planned hash join, both sides pruned
    to eligible rows); (3) the per-document reassembly groupBy. No
    window functions (a window over the line key would sort instead
    of partially aggregating, and the hottest key would serialize on
    one reducer), no Python UDFs, no driver-side collection.

    ``scope="document"`` restricts the rule to WITHIN each document
    (Dolma's paragraph-dedupe document mode): later copies of a line
    inside one doc drop, but the same line in another doc survives —
    no cross-document shuffle at all (the winner reduce and re-join
    key on (id, line), so both shuffles are doc-local and the hottest
    corpus-wide line key never concentrates anywhere).

    The INCREMENTAL variant (new batches dedup against a persisted
    line index in O(batch)) is
    ``incremental_dedup.incremental_dedup_lines``."""
    if scope not in ("corpus", "document"):
        raise ValueError(f"dedup_lines: scope {scope!r} not in corpus|document")
    # the exploded frame feeds three plan positions (the winner
    # aggregate, the winner re-join and the short-line passthrough);
    # re-splitting is DELIBERATE — a localCheckpoint of the exploded
    # corpus measured +35% at sf0.1 (materializing ~corpus bytes costs
    # more than two extra row-local pruned scans, and the same holds
    # at scale: split is compute-trivial and shuffle-free)
    lines = _split_lines(df, text_col, id_col)
    eligible = _line_eligible(min_chars)
    # key the shuffle on a 32-hex digest, not the raw line bytes —
    # web-corpus lines run hundreds of bytes and both the groupBy and
    # the re-join would move them twice (review r13; the incremental
    # twin already keys on md5, and the two are pinned equal)
    elig = lines.filter(eligible).withColumn("_lh", F.md5("line"))
    wkey = ["_lh"] if scope == "corpus" else [id_col, "_lh"]
    winners = elig.groupBy(*wkey).agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_w")
    )
    kept_elig = elig.join(winners, wkey).select(
        id_col,
        "pos",
        "line",
        (F.struct(F.col(id_col), F.col("pos")) == F.col("_w")).alias("_keep"),
    )
    kept_short = lines.filter(~eligible).select(
        id_col, "pos", "line", F.lit(True).alias("_keep")
    )
    return _reassemble_lines(kept_elig.unionByName(kept_short), id_col)


def dedup_substrings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 50,
    min_count: int = 2,
    normalize: bool = False,
) -> DataFrame:
    """EXACT-SUBSTRING dedup — the Lee et al. 2022 50-token rule
    (Deduplicating Training Data Makes Language Models Better), in the
    Spark shape of the suffix-array family: every ``window``-token run
    that occurs ``min_count``+ times across the corpus keeps its FIRST
    occurrence by global ``(id, token position)`` order and is spliced
    out of every other position — including later repeats INSIDE the
    first document, matching the paper's "keep one copy" rule.

    Fingerprints are md5 over every stride-1 token window (a
    duplicated run of >= ``window`` tokens shares at least one
    window, so detection is EXACT at window granularity — the
    approximation vs a true suffix array is only that shorter shared
    runs are invisible and removal is window-quantized). Fingerprints
    are always computed over the WHITESPACE-NORMALIZED token stream
    (``WS_RE`` splits of the trimmed text); the SPLICE is byte-exact
    against the original text by default — losing windows' exact char
    spans are removed and every other byte (newlines, tabs, space
    runs) survives, the paper's remove-exact-spans semantics (VERDICT
    r14 next #3). Pass ``normalize=True`` for the r14
    normalized-output behavior (the oracle basis — ``clean_text``
    re-joined with single spaces, ``chars_removed`` against the
    normalized text, pure column ops).

    Returns one row per input document: ``(id, clean_text,
    windows_removed, tokens_removed, chars_removed)``.

    Scale shape (the dedup_lines pattern at token grain): ONE row-local
    window-hash projection (O(tokens x window) compute, no shuffle),
    one md5-keyed winner groupBy with map-side combine (a
    million-copy boilerplate window moves one row per partition), one
    fingerprint-keyed join pruned to duplicated fingerprints, one
    doc-grain collect of losing window starts (bounded by the doc's
    own window count), and a row-local splice: covered positions via
    flatten+distinct, survivors via array_except (hash-set
    semantics, O(tokens)), rebuild via element_at. No window
    functions over the fingerprint key, no driver-side collection.

    NOTE (ADVICE r15): with ``normalize=False`` this call is EAGER —
    the loser frame materializes (localCheckpoint + count) at
    plan-construction time, so constructing the result costs the full
    fingerprint job even if the returned frame is never acted on.
    ``normalize=True`` stays fully lazy (pure column ops end to end).
    """
    if window < 2:
        raise ValueError(f"dedup_substrings: window {window} < 2")
    # raw 16-byte digests only on the byte-exact path: there the fps
    # frame is persisted and feeds two shuffles + a cache, where the
    # halved key bytes shrink the persisted frame and both exchanges
    # (guide §2.3; sf0.1 wall time is noise-bound — the bytes win is
    # the 100 TB term). The normalized path runs the pipeline once
    # unpersisted, where hex keys measured FASTER (binary group-by
    # keys miss the hash aggregate's fast row map: +70% wall there),
    # so it keeps the string form.
    base, fps = _window_fingerprints(
        df, text_col, id_col, window, raw=not normalize
    )
    if not normalize:
        # the byte-exact splice MATERIALIZES the losers frame (it
        # feeds two routing joins) — without a persist the
        # checkpoint's RDD job loses the single-plan exchange reuse
        # and re-runs the O(tokens×window) fingerprint explosion
        # twice (measured 5× the normalized pass at sf0.1)
        from pyspark.storagelevel import StorageLevel

        fps = fps.persist(StorageLevel.MEMORY_AND_DISK)
    wins = fps.groupBy("_fp").agg(
        F.min(F.struct(F.col(id_col), F.col("wpos"))).alias("_w"),
        F.count(F.lit(1)).alias("_c"),
    )
    losers = (
        fps.join(wins.filter(F.col("_c") >= int(min_count)), "_fp")
        .filter(F.struct(F.col(id_col), F.col("wpos")) != F.col("_w"))
        .groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list("wpos")).alias("_starts"),
            F.count(F.lit(1)).alias("windows_removed"),
        )
    )
    out = _splice_windows(base, losers, id_col, window, normalize=normalize)
    if not normalize:
        # the splice checkpointed losers during construction; nothing
        # the returned plan executes touches fps again
        fps.unpersist()
    return out


def _window_fingerprints(
    df, text_col: str, id_col: str, window: int, raw: bool = False
):
    """(base, fps): the tokenized doc frame (``_orig`` original text +
    ``_tk`` array + ``_n``) and one (id, wpos, _fp) row per stride-1
    token window — md5 over the space-joined window, row-local
    O(tokens x window) compute.

    ``raw=True`` emits ``_fp`` as the 16-byte digest (``unhex``)
    instead of the 32-char hex string: the batch operator only ever
    uses the fingerprint for groupBy/join equality, and hex↔binary md5
    is bijective, so grouping is identical while the winner shuffle,
    the routing join and the persisted frame carry half the key bytes
    (guide §2.3, narrower types). The INCREMENTAL path keeps the hex
    default — its fingerprints persist as ``window_hash`` index rows,
    where the string form is the zone-map/probe contract."""
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), WS_RE)
    base = df.select(
        F.col(id_col), F.col(text_col).alias("_orig"), toks.alias("_tk")
    ).withColumn("_n", F.size("_tk"))
    fp_ty = "binary" if raw else "string"

    def fp(i):
        h = F.md5(F.concat_ws(" ", F.slice(F.col("_tk"), i + 1, window)))
        return F.unhex(h) if raw else h

    fps = base.select(
        id_col,
        F.posexplode(
            F.when(
                F.col("_n") >= window,
                F.transform(F.sequence(F.lit(0), F.col("_n") - window), fp),
            ).otherwise(F.array().cast(f"array<{fp_ty}>"))
        ).alias("wpos", "_fp"),
    )
    return base, fps


def _splice_windows(base, losers, id_col: str, window: int,
                    normalize: bool = False):
    """Remove every losing window's tokens from its doc and rebuild.

    ``normalize=False`` (the default — VERDICT r14 next #3): splice
    the ORIGINAL text byte-exactly, the Lee et al. semantics. Each
    maximal run of covered token indices maps to its char span in the
    un-normalized document (the same ``decontaminate_spans`` span
    arithmetic) and exactly those chars are removed — every byte
    outside removed spans, including newlines, tabs and space runs,
    survives untouched, and a document with no removals passes through
    BYTE-IDENTICAL (ADVICE r14 medium: ingest no longer normalizes
    the whole corpus as a side effect). Only documents WITH removals
    ride the Arrow-batched ``mapInPandas`` splice — clean documents
    stay on pure column ops, so at 100 TB the Python lane carries the
    loser fraction, not the corpus. NULL text passes through as NULL.

    ``normalize=True``: the r14 behavior — ``clean_text`` re-joins
    surviving tokens of the whitespace-normalized stream with single
    spaces and ``chars_removed`` counts against that normalized text.
    This is the engine-reproducible ORACLE basis (the registered
    ``substr`` correctness leg uses it; DuckDB rebuilds the identical
    arithmetic) and stays pure column ops end to end.

    ``losers`` is the per-doc (id, _starts, windows_removed) frame."""
    if normalize:
        out = base.join(losers, id_col, "left").withColumn(
            "_cov",
            F.when(
                F.col("_starts").isNotNull(),
                F.array_distinct(
                    F.flatten(
                        F.transform(
                            F.col("_starts"),
                            lambda s: F.sequence(s, s + window - 1),
                        )
                    )
                ),
            ).otherwise(F.array().cast("array<int>")),
        )
        clean = F.concat_ws(
            " ",
            F.transform(
                F.array_except(
                    F.sequence(F.lit(0), F.col("_n") - 1), F.col("_cov")
                ),
                lambda p: F.element_at(F.col("_tk"), p + 1),
            ),
        )
        norm = F.concat_ws(" ", F.col("_tk"))
        return out.select(
            F.col(id_col),
            clean.alias("clean_text"),
            F.coalesce(F.col("windows_removed"), F.lit(0)).cast("long").alias(
                "windows_removed"
            ),
            F.size("_cov").cast("long").alias("tokens_removed"),
            (F.length(norm) - F.length(clean)).cast("long").alias(
                "chars_removed"
            ),
        )

    # byte-exact path: clean docs pass through column-only; losers
    # splice row-locally over Arrow batches. The losers frame (the
    # whole fingerprint → winner → covered-starts pipeline) feeds BOTH
    # joins below — materialize it once (it is small: one row per doc
    # WITH removals) or the anti-join and the inner join each re-run
    # the full fingerprint explosion (measured 2× the entry's bench
    # time at sf0.01).
    # LAZY: the routing aggregate right below reads every loser row,
    # so its job materializes the checkpoint — eager=True paid a
    # separate fingerprint-pipeline job first (r16, guide §1.2)
    losers = losers.localCheckpoint(eager=False)
    agg = losers.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("windows_removed"), F.lit(0)).alias("w"),
    ).collect()[0]
    n_losers, total_windows = agg["n"], int(agg["w"])
    if not n_losers:
        # nothing to splice anywhere: ONE passthrough scan, no joins,
        # no Python — the common no-duplicated-windows case
        return base.select(
            F.col(id_col),
            F.col("_orig").alias("clean_text"),
            F.lit(0).cast("long").alias("windows_removed"),
            F.lit(0).cast("long").alias("tokens_removed"),
            F.lit(0).cast("long").alias("chars_removed"),
        )
    # broadcast by PAYLOAD, not row count (VERDICT r15 next #2): the
    # frame's weight is the _starts arrays — pathological long-doc
    # losers can carry millions of window starts in few rows, and a
    # row-count gate would happily broadcast gigabytes. Estimate from
    # the checkpointed frame's own aggregates (windows_removed ==
    # len(_starts) by construction) and fall back to the plain
    # shuffled joins beyond the cap — same result, no driver OOM.
    est_bytes = n_losers * 64 + total_windows * 16
    if est_bytes <= SPLICE_BROADCAST_MAX_BYTES:
        # the loser set is splice-plan small (one row per doc WITH
        # removals): broadcast it so neither routing join shuffles the
        # corpus — the corpus side stays two sequential scans
        losers = F.broadcast(losers)
    no_hit = base.join(losers, id_col, "left_anti").select(
        F.col(id_col),
        F.col("_orig").alias("clean_text"),
        F.lit(0).cast("long").alias("windows_removed"),
        F.lit(0).cast("long").alias("tokens_removed"),
        F.lit(0).cast("long").alias("chars_removed"),
    )
    hit = base.join(losers, id_col, "inner").select(
        id_col, "_orig", "_starts", "windows_removed"
    )
    id_type = next(f for f in base.schema if f.name == id_col).dataType
    schema = (
        f"`{id_col}` {id_type.simpleString()}, clean_text string, "
        "windows_removed long, tokens_removed long, chars_removed long"
    )
    win = int(window)

    def scrub(batches):
        import re

        sep = re.compile(r"[ \t\n\f\r]+")  # the engine tokenizer's WS_RE

        def token_spans(text):
            # replicate F.split(F.trim(text), WS_RE) against the
            # ORIGINAL string: trim strips ASCII spaces only; Java
            # split(limit=-1) keeps boundary empties
            n = len(text)
            lead = 0
            while lead < n and text[lead] == " ":
                lead += 1
            tail = n
            while tail > lead and text[tail - 1] == " ":
                tail -= 1
            spans, prev = [], lead
            for m in sep.finditer(text, lead, tail):
                spans.append((prev, m.start()))
                prev = m.end()
            spans.append((prev, tail))
            return spans

        for pdf in batches:
            if not len(pdf):
                continue
            texts, ntok, nchars = [], [], []
            for text, starts in zip(pdf["_orig"], pdf["_starts"]):
                spans = token_spans(text)
                cov = sorted(
                    {
                        p
                        for s in starts
                        for p in range(int(s), int(s) + win)
                        if p < len(spans)
                    }
                )
                runs = []
                for p in cov:
                    if runs and p == runs[-1][1] + 1:
                        runs[-1][1] = p
                    else:
                        runs.append([p, p])
                out, cur, removed = [], 0, 0
                for a, b in runs:
                    ca, cb = spans[a][0], spans[b][1]
                    out.append(text[cur:ca])
                    removed += cb - ca
                    cur = cb
                out.append(text[cur:])
                texts.append("".join(out))
                ntok.append(len(cov))
                nchars.append(removed)
            res = pdf[[id_col, "windows_removed"]].copy()
            res["clean_text"] = texts
            res["tokens_removed"] = ntok
            res["chars_removed"] = nchars
            yield res[
                [id_col, "clean_text", "windows_removed",
                 "tokens_removed", "chars_removed"]
            ]

    return no_hit.unionByName(hit.mapInPandas(scrub, schema=schema))
