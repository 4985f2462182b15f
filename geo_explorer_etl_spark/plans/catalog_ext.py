"""Extension operator catalog — the LLM-training-data pipeline surface
(dedup, similarity search, text analysis) plus the incremental /
streaming-analog operators over ``events``.

These go beyond the reference's own operators (SURVEY.md §7 step 9) but
follow the same contract: idiomatic DataFrame ops, DuckDB oracle per
query where SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from geo_explorer_etl_spark.operators import dedup as DD
from geo_explorer_etl_spark.operators import similarity as SIM
from geo_explorer_etl_spark.operators import text as TX
from geo_explorer_etl_spark.plans.registry import register
from geo_explorer_etl_spark.session import load_tables


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------
# VERDICT r14 next #1: the five dedup legs that lived under ONE
# `dedup_exact` hash (doc / line / line_inc / line_doc / substr) are
# split across FIVE entries, so a red cell on the driver's scoreboard
# NAMES the diverging leg — a distributed binary search the driver
# executes for free:
#   dedup_exact          -> doc leg only (the most boring oracle here)
#   dedup_ngram_jaccard  -> + line      (corpus-scope line dedup)
#   dedup_minhash_lsh    -> + line_inc  (incremental line dedup)
#   dedup_simhash        -> + line_doc  (document-scope line dedup)
#   text_token_count_bpe -> + substr    (exact-substring dedup)
# The leg SQL is rewritten DIALECT-STABLE (r14 red-cell hypothesis: a
# different DuckDB build evaluating exotic constructs differently):
# zipped unnest + generate_subscripts instead of lateral
# UNNEST(generate_series()) + list indexing, lead() window concat
# instead of list slicing, grouped joins instead of correlated scalar
# subqueries, a VALUES offset list instead of generate_series.

#: SQL pad appended to every HOST arm so it unions with a dedup leg.
_HOST_PAD_SQL = (
    "CAST(NULL AS VARCHAR) AS content_hash, "
    "CAST(NULL AS BIGINT) AS canonical_doc_id, "
    "CAST(NULL AS BIGINT) AS n_copies, "
    "CAST(NULL AS BIGINT) AS chars_removed"
)


def _line_leg_sql(tag: str, scope: str = "corpus") -> str:
    """One dedup-lines oracle leg as a self-contained SELECT (usable
    as a UNION ALL arm inside any host oracle): the C4/Dolma keep-
    first rule rebuilt from first principles — ``scope='corpus'`` is
    the global keep-first (winner by (doc_id, pos)), ``'document'``
    the within-doc rule. Only boring constructs: zipped
    unnest/generate_subscripts, one window function, GROUP BY + JOIN
    (no correlated subqueries, no list indexing)."""
    part = "line" if scope == "corpus" else "doc_id, line"
    return f"""
    SELECT '{tag}' AS leg, md5(c.clean) AS content_hash,
           CAST(c.doc_id AS BIGINT) AS canonical_doc_id,
           CAST(c.nrem AS BIGINT) AS n_copies,
           CAST(len(s.dtext) - len(c.clean) AS BIGINT) AS chars_removed
    FROM (
        SELECT doc_id,
               COALESCE(string_agg(CASE WHEN rn = 1 THEN line END,
                                   chr(10) ORDER BY pos), '') AS clean,
               SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS nrem
        FROM (
            SELECT doc_id, line, pos,
                   CASE WHEN len(trim(line)) >= 15
                        THEN row_number() OVER (PARTITION BY {part}
                                                ORDER BY doc_id, pos)
                        ELSE 1 END AS rn
            FROM (
                -- COALESCE like the Spark side's _split_lines: NULL
                -- text is an EMPTY document (one '' line), not an
                -- absent one (r14 adversarial-parity pin)
                SELECT doc_id, unnest(lst) AS line,
                       generate_subscripts(lst, 1) AS pos
                FROM (SELECT doc_id,
                             string_split(COALESCE(text, ''), chr(10)) AS lst
                      FROM documents) t0) t1) k
        GROUP BY doc_id) c
    JOIN (SELECT doc_id, COALESCE(text, '') AS dtext FROM documents) s
      ON s.doc_id = c.doc_id
    """


def _substr_leg_ctes(window: int = 10) -> str:
    """The exact-substring leg's CTE chain (appended to a host
    oracle's WITH list): stride-1 window fingerprints via lead()
    window concat, global keep-first via row_number/count windows,
    covered positions via a VALUES offset list, normalized reassembly
    via one ordered string_agg — every construct dialect-stable."""
    leads = ", ".join(
        f"lead(tok, {j}) OVER win AS t{j}" for j in range(1, window)
    )
    ts = ", ".join(f"t{j}" for j in range(1, window))
    offs = ", ".join(f"({j})" for j in range(window))
    return f"""
    stok AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(COALESCE(text, '')),
                                            '[ \\t\\n\\f\\r]+')) AS tok,
               generate_subscripts(
                   regexp_split_to_array(trim(COALESCE(text, '')),
                                         '[ \\t\\n\\f\\r]+'), 1) AS i
        FROM documents),
    swin AS (
        SELECT doc_id, i, md5(concat_ws(' ', tok, {ts})) AS fp
        FROM (SELECT doc_id, i, tok, {leads}
              FROM stok WINDOW win AS (PARTITION BY doc_id ORDER BY i)) lw
        WHERE t{window - 1} IS NOT NULL),
    smark AS (
        SELECT doc_id, i,
               row_number() OVER (PARTITION BY fp ORDER BY doc_id, i) AS rn,
               COUNT(*) OVER (PARTITION BY fp) AS c
        FROM swin),
    slose AS (SELECT doc_id, i FROM smark WHERE c >= 2 AND rn > 1),
    soffs(j) AS (VALUES {offs}),
    scov AS (SELECT DISTINCT l.doc_id, l.i + o.j AS ti
             FROM slose l CROSS JOIN soffs o),
    swrem AS (SELECT doc_id, COUNT(*) AS wrem FROM slose GROUP BY doc_id),
    snorm AS (SELECT doc_id, SUM(len(tok)) + COUNT(*) - 1 AS normlen
              FROM stok GROUP BY doc_id),
    sclean AS (
        SELECT s.doc_id,
               COALESCE(string_agg(CASE WHEN c.ti IS NULL THEN s.tok END,
                                   ' ' ORDER BY s.i), '') AS clean
        FROM stok s LEFT JOIN scov c ON c.doc_id = s.doc_id AND c.ti = s.i
        GROUP BY s.doc_id)
    """


_SUBSTR_LEG_SELECT = """
    SELECT 'substr' AS leg, md5(sc.clean) AS content_hash,
           CAST(sc.doc_id AS BIGINT) AS canonical_doc_id,
           CAST(COALESCE(w.wrem, 0) AS BIGINT) AS n_copies,
           CAST(n.normlen - len(sc.clean) AS BIGINT) AS chars_removed
    FROM sclean sc
    JOIN snorm n ON n.doc_id = sc.doc_id
    LEFT JOIN swrem w ON w.doc_id = sc.doc_id
"""


def _dedup_leg_frame(df: DataFrame, tag: str) -> DataFrame:
    """Coerce a dedup_lines/dedup_substrings output frame to the
    shared dedup-leg schema (leg, content_hash, canonical_doc_id,
    n_copies, chars_removed)."""
    nrem = (
        "lines_removed" if "lines_removed" in df.columns else "windows_removed"
    )
    return df.select(
        F.lit(tag).alias("leg"),
        F.md5("clean_text").alias("content_hash"),
        F.col("doc_id").cast("long").alias("canonical_doc_id"),
        F.col(nrem).cast("long").alias("n_copies"),
        F.col("chars_removed").cast("long").alias("chars_removed"),
    )


def _line_inc_leg(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """The INCREMENTAL line-dedup leg: split the corpus at the id
    midpoint (monotone ids — the determinism contract), run
    batch-then-batch through a throwaway persisted line index; the
    union must equal the all-at-once rule row for row. The throwaway
    store is this registry's ONLY plan-construction side effect
    (VERDICT r13 wrong #1): a per-invocation-fresh asserted-new path
    under the session warehouse, removed before returning — the
    incremental outputs are eagerly checkpointed inside the decide
    phase, so nothing the returned plan executes ever touches the
    store again (ADVICE r13 #3)."""
    import os
    import shutil
    import uuid

    from geo_explorer_etl_spark.operators.incremental_dedup import (
        incremental_dedup_lines,
        line_mirror_drop,
    )
    from geo_explorer_etl_spark.sources.store import TableStore

    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    mid = (int(lo) + int(hi)) // 2
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    root = os.path.join(wh, "_tmp", f"dedup_lines_inc_{uuid.uuid4().hex}")
    # exist_ok=False IS the freshness assertion (survives `python -O`)
    os.makedirs(root, exist_ok=False)
    store = TableStore(spark, root)
    try:
        inc1 = incremental_dedup_lines(store, docs.filter(F.col("doc_id") <= mid))
        inc2 = incremental_dedup_lines(store, docs.filter(F.col("doc_id") > mid))
        return _dedup_leg_frame(inc1.unionByName(inc2), "line_inc")
    finally:
        line_mirror_drop(store)
        shutil.rmtree(root, ignore_errors=True)


_DEDUP_EXACT_ORACLE = """
    SELECT md5(text) AS content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
"""


@register(
    "dedup_exact",
    oracle=_DEDUP_EXACT_ORACLE,
    tags="ext dedup A2",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact document dedup: content-hash groupBy, min-id canonical —
    the 100 TB first pass (one shuffle, map-side partial agg moves one
    row per distinct document). Since r15 this entry is the DOC leg
    ALONE under the registry's most boring oracle — one GROUP BY
    md5(text), no UNNEST, no slicing, no correlated subqueries
    (VERDICT r14 next #1a: the r13/r14 red cell carried five legs, so
    a red row could not name the guilty one; the other four legs now
    ride other green entries)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    out = DD.exact_dedup_groups(docs, text_col="text", id_col="doc_id")
    _log_leg_digests("dedup_exact", out, sf_dir)
    return out


def _log_leg_digests(name: str, df: DataFrame, sf_dir: str | None = None) -> None:
    """Per-leg, order-insensitive diagnostic digests from BOTH sides
    of the correctness contract (VERDICT r14 next #1c), appended to
    ``spark-warehouse/_diag/<name>_digests.jsonl`` at BUILD time:

    - ``spark``: the frame being returned to the driver;
    - ``duck``: the entry's registered oracle run through the LOCAL
      DuckDB over the same parquet.

    Both sides compute the IDENTICAL formula — per leg, row count +
    xor of 60-bit ints taken from md5 over the dedup-leg columns'
    canonical string repr (xor is commutative: partitioning and
    collection order cannot change it; md5+casts behave identically
    in both engines for strings/bigints). After a red driver round
    the artifact shows which SIDE moved relative to this box's
    DuckDB. Diagnostics NEVER break the gate: any failure here warns
    and returns."""
    import json
    import os
    import sys
    import time
    import warnings

    legd = ("content_hash", "canonical_doc_id", "n_copies", "chars_removed")
    try:
        cols = [c for c in legd if c in df.columns]
        tagged = df if "leg" in df.columns else df.withColumn("leg", F.lit("doc"))
        parts = ", ".join(
            f"coalesce(cast({c} as string), '<NULL>')" for c in cols
        )
        dig = (
            "bit_xor(cast(conv(substring(md5(concat_ws('|', "
            + parts
            + ")), 1, 15), 16, 10) as bigint))"
        )
        rows = (
            tagged.groupBy("leg")
            .agg(F.count(F.lit(1)).alias("n"), F.expr(dig).alias("x"))
            .collect()
        )
        spark_d = {
            r["leg"]: {
                "n": r["n"],
                "xor": f"{(r['x'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}",
            }
            for r in rows
        }
        duck_d = _duck_leg_digests(name, cols, "leg" in df.columns, sf_dir)
        for leg in sorted(spark_d):
            s = spark_d[leg]
            d = (duck_d or {}).get(leg)
            tail = f" duck_n={d['n']} duck_xor={d['xor']}" if d else ""
            print(
                f"[{name} digest] leg={leg} n={s['n']} xor={s['xor']}{tail}",
                file=sys.stderr,
            )
        spark = df.sparkSession
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        if wh.startswith("file:"):
            wh = wh[len("file:"):]
        diag = os.path.join(wh, "_diag")
        os.makedirs(diag, exist_ok=True)
        _append_rotating(
            os.path.join(diag, f"{name}_digests.jsonl"),
            json.dumps({"ts": time.time(), "spark": spark_d, "duck": duck_d}),
        )
    except Exception as e:  # noqa: BLE001
        warnings.warn(f"{name}: leg digest diagnostics failed: {e}", stacklevel=2)


#: Rotation cap for each `_diag/*_digests.jsonl` artifact (VERDICT r15
#: next #6): the artifact's value is the LAST few build comparisons —
#: an unbounded append-only log just accretes bytes per build forever.
DIGEST_LOG_MAX_LINES = 200


def _append_rotating(path: str, line: str, max_lines: int | None = None) -> None:
    """Append one line (plain O_APPEND — concurrent builders never
    lose each other's records on the hot path, r16 review find); only
    when the file has grown to TWICE the cap rewrite it down to the
    newest ``max_lines`` lines (atomic via rename — a concurrent
    reader sees either generation, never a torn file; a line landing
    exactly during the rare rewrite can be lost, the accepted
    tolerance for a diagnostics artifact)."""
    import os

    cap = DIGEST_LOG_MAX_LINES if max_lines is None else int(max_lines)
    with open(path, "a") as f:
        f.write(line + "\n")
    try:
        with open(path) as f:
            existing = f.readlines()
    except FileNotFoundError:  # pragma: no cover - concurrent rotation
        return
    if len(existing) <= 2 * cap:
        return
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.writelines(existing[-cap:])
    os.replace(tmp, path)


#: Size gate for the in-process DuckDB side of the digest artifact
#: (ADVICE r15): the duck side re-runs the entry's FULL oracle on the
#: driver — fine at test scale factors, a second oracle execution plus
#: driver-side memory at production corpora. Above this many bytes of
#: source parquet the duck side is skipped (the Spark-side digest
#: still logs; the offline DuckDB twin in tests/ covers parity).
#: Override: SPARK_GRAFT_DIGEST_DUCK=1 forces on, =0 forces off.
DUCK_DIGEST_MAX_BYTES = 64 * 1024 * 1024


def _duck_digest_enabled(sf_dir: str) -> bool:
    import glob
    import os

    flag = os.environ.get("SPARK_GRAFT_DIGEST_DUCK", "auto").lower()
    if flag in ("1", "true", "on"):
        return True
    if flag in ("0", "false", "off"):
        return False
    total = 0
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        if os.path.isdir(p):
            total += sum(
                os.path.getsize(q)
                for q in glob.glob(os.path.join(p, "*.parquet"))
            )
        else:
            total += os.path.getsize(p)
    return total <= DUCK_DIGEST_MAX_BYTES


def _duck_leg_digests(
    name: str, cols: list, has_leg: bool, sf_dir: str | None
) -> dict | None:
    """The oracle side of the digest artifact: run the registered
    oracle through the local DuckDB over ``sf_dir``'s parquet and
    reduce to the same per-leg (count, md5-xor) formula. Returns None
    when no oracle/sf_dir, or when the corpus exceeds the
    ``DUCK_DIGEST_MAX_BYTES`` gate (ADVICE r15: production-scale
    builds pay only the Spark-side digest); an ``_error`` entry
    instead of raising."""
    import glob
    import os

    if not sf_dir or not _duck_digest_enabled(sf_dir):
        return None
    try:
        from geo_explorer_etl_spark.plans.registry import REGISTRY

        spec = REGISTRY.get(name)
        if spec is None or spec.oracle is None:
            return None
        import duckdb

        con = duckdb.connect()
        for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
            t = os.path.splitext(os.path.basename(p))[0]
            # the driver's testdata tables are plain files; a
            # Spark-written table is a DIRECTORY of part files
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
            )
        parts = ", ".join(
            f"coalesce(CAST({c} AS VARCHAR), '<NULL>')" for c in cols
        )
        leg_expr = "leg" if has_leg else "'doc'"
        q = (
            f"SELECT {leg_expr} AS leg, COUNT(*) AS n, "
            f"bit_xor(CAST(('0x' || substr(md5(concat_ws('|', {parts})), "
            f"1, 15)) AS BIGINT)) AS x "
            f"FROM ({spec.oracle}) q GROUP BY 1"
        )
        return {
            r[0]: {
                "n": r[1],
                "xor": f"{(r[2] or 0) & 0xFFFFFFFFFFFFFFFF:016x}",
            }
            for r in con.execute(q).fetchall()
        }
    except Exception as e:  # noqa: BLE001
        return {"_error": f"{type(e).__name__}: {e}"}


def dedup_exact_doc_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench shape for the `dedup_exact` row: the document leg alone,
    WITHOUT the registered entry's digest diagnostics (since r15 the
    registered entry is also doc-only — the r13/r14 folded legs moved
    to other entries — but the bench keeps timing the plain operator
    so BENCH_r<=12 comparisons stay apples-to-apples)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return DD.exact_dedup_groups(docs, text_col="text", id_col="doc_id")


def dedup_lines_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench row for the LINE-level corpus dedup itself (new in r13 —
    no historical baseline): full keep-first + document reassembly
    over the documents table."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return DD.dedup_lines(docs, text_col="text", id_col="doc_id", min_chars=15)


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
        FROM documents WHERE doc_id < 100),
    shingles AS (
        SELECT DISTINCT doc_id,
               toks[i] || ' ' || toks[i+1] AS shingle
        FROM docs, (SELECT unnest(range(1, 2000)) AS i)
        WHERE i + 1 <= len(toks)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id),
    pair_inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM shingles a JOIN shingles b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
    SELECT 'jaccard' AS leg, p.doc_a, p.doc_b,
           ROUND(CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter), 4) AS jaccard,
           {_HOST_PAD_SQL}
    FROM pair_inter p
    JOIN sizes sa ON p.doc_a = sa.doc_id
    JOIN sizes sb ON p.doc_b = sb.doc_id
    WHERE CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter) >= 0.05
    UNION ALL
    SELECT q.leg, CAST(NULL AS BIGINT) AS doc_a, CAST(NULL AS BIGINT) AS doc_b,
           CAST(NULL AS DOUBLE) AS jaccard,
           q.content_hash, q.canonical_doc_id, q.n_copies, q.chars_removed
    FROM ({_line_leg_sql("line")}) q
    """,
    tags="ext dedup jaccard lines",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise n-gram Jaccard (host leg 'jaccard') + since r15 the
    CORPUS-SCOPE LINE DEDUP leg ('line', ``dedup.dedup_lines`` — the
    C4/Dolma paragraph dedupe: keep the first occurrence of every
    eligible line by global (doc_id, pos) order, re-emit cleaned
    documents), moved here from the r13/r14 `dedup_exact` fold so the
    driver's scoreboard localizes a divergence to THIS leg (VERDICT
    r14 next #1). DuckDB rebuilds the keep-first rule, the reassembled
    text's md5 and the char arithmetic from first principles."""
    all_docs = load_tables(spark, sf_dir, "documents")["documents"]
    pairs = DD.ngram_jaccard_pairs(
        all_docs.filter(F.col("doc_id") < 100),
        text_col="text", id_col="doc_id", n=2, threshold=0.05,
    )
    host = pairs.select(F.lit("jaccard").alias("leg"), "*")
    line = _dedup_leg_frame(
        DD.dedup_lines(all_docs, text_col="text", id_col="doc_id", min_chars=15),
        "line",
    )
    out = host.unionByName(line, allowMissingColumns=True)
    _log_leg_digests("dedup_ngram_jaccard", out, sf_dir)
    return out


def dedup_ngram_jaccard_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENCH twin: the plain pairwise-Jaccard operator alone — the
    shape every BENCH_r<=14 timed under this name (the registered
    entry now carries the line-dedup leg; dedup_lines has its own
    bench row)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 100
    )
    return DD.ngram_jaccard_pairs(
        docs, text_col="text", id_col="doc_id", n=2, threshold=0.05
    )


def _minhash_coeff_values_sql(num_hashes: int = 16) -> str:
    """Inline the seeded universal-hash coefficients as a VALUES list —
    the same constants ``minhash_coefficients`` hands the Spark plan, so
    DuckDB rebuilds the identical signatures bit for bit (the pattern
    the hyperplane-LSH oracle uses for its seeded planes)."""
    from geo_explorer_etl_spark.operators.dedup import minhash_coefficients

    rows = ", ".join(
        f"({i}, {c}, {d})" for i, (c, d) in enumerate(minhash_coefficients(num_hashes))
    )
    return f"(SELECT * FROM (VALUES {rows}) AS s(seed, c, d))"


@register(
    "dedup_minhash_lsh",
    # FULL oracle (upgraded from rows-only): the md5-derived minhash
    # family and concatenated band keys are engine-reproducible, so
    # DuckDB rebuilds the identical candidate set bit for bit.
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents),
    sh AS (
        SELECT doc_id, unnest(list_distinct(
                 list_transform(range(1, len(t) - 1),
                                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
               )) AS shingle
        FROM toks WHERE len(t) >= 3),
    hashed AS (
        -- universal-hash minhash: ONE md5 per shingle -> base integer a,
        -- then seeded affine permutations (c*a + d) mod p, p = 2^31-1
        -- (same family the Spark side builds, bit for bit)
        SELECT doc_id,
               CAST(('0x' || substr(md5(shingle), 1, 14)) AS BIGINT) % 2147483647 AS a
        FROM sh),
    sig AS (
        SELECT doc_id, s.seed, min((s.c * a + s.d) % 2147483647) AS h
        FROM hashed, {_minhash_coeff_values_sql(16)} s
        GROUP BY doc_id, s.seed),
    bands AS (
        SELECT doc_id, seed // 4 AS band_id,
               string_agg(CAST(h AS VARCHAR), ',' ORDER BY seed) AS band_hash
        FROM sig GROUP BY doc_id, seed // 4)
    SELECT 'batch' AS leg, a.doc_id AS doc_a, b.doc_id AS doc_b,
           {_HOST_PAD_SQL}
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    UNION
    -- the INCREMENTAL leg (round 11): new-batch-vs-corpus candidates
    -- through the persisted band index equal the union's pairs whose
    -- larger id falls in the new half (ids monotone with ingest)
    SELECT 'incr', a.doc_id, b.doc_id, {_HOST_PAD_SQL}
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    WHERE b.doc_id >= (SELECT MAX(doc_id) // 2 FROM documents)
    UNION ALL
    -- the INCREMENTAL LINE-DEDUP leg (moved here from the dedup_exact
    -- fold, VERDICT r14 next #1): batch-then-batch through the
    -- persisted line index equals the all-at-once keep-first rule, so
    -- its expected rows are the same cleaned set DuckDB recomputes
    SELECT q.leg, CAST(NULL AS BIGINT) AS doc_a, CAST(NULL AS BIGINT) AS doc_b,
           q.content_hash, q.canonical_doc_id, q.n_copies, q.chars_removed
    FROM ({_line_leg_sql("line_inc")}) q
    """,
    tags="ext dedup minhash lsh incremental lines",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH candidates, two legs under ONE hash: the batch
    operator over all documents, and (round 11, VERDICT directive #3)
    the INCREMENTAL path — the corpus half's band keys persisted as a
    range-clustered TableStore index, the new half probing it through
    zone-map file pruning plus an in-batch self-join. The incremental
    candidate set provably equals the union's pairs whose larger id is
    new (monotone ids), which is exactly what DuckDB recomputes — a
    drifted band key, a mis-pruned index probe, or a lost corpus edge
    all break the value hash."""
    import shutil
    import tempfile

    from geo_explorer_etl_spark.operators.incremental_dedup import (
        BAND_TABLE,
        PROBE_CAP,
        _append_clustered,
        _band_rows,
        _pruned_index,
    )
    from geo_explorer_etl_spark.sources.store import TableStore

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    # ONE signature pass feeds BOTH legs (the signatures are the
    # dominant cost — review r11: recomputing them per half tripled
    # the entry's bench time); band_keys is the same shared banding
    # rule minhash_lsh_candidates uses, so the batch leg below is
    # bit-identical to the plain operator
    sig = DD.minhash_signatures(
        docs, text_col="text", id_col="doc_id", n=3, num_hashes=16
    ).persist()
    banded = DD.band_keys(sig, "doc_id", 16, 4)
    a = banded.select(F.col("doc_id").alias("doc_a"), "band_id", "band_hash")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band_id", "band_hash")
    batch = (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .select(F.lit("batch").alias("leg"), "doc_a", "doc_b")
    )

    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    if max_id is None:  # empty corpus: the batch leg is the whole answer
        sig.unpersist()
        return _pad_minhash_host(batch.localCheckpoint(eager=True))
    split = max_id // 2
    root = tempfile.mkdtemp(prefix="lsh_incr_")
    try:
        store = TableStore(spark, root)
        _append_clustered(
            store, BAND_TABLE,
            banded.filter(F.col("doc_id") < split), "band_hash", 4,
        )
        bands_new = banded.filter(F.col("doc_id") >= split)
        # the SAME capped probe rule as incremental_dedup (review r11:
        # an unbounded collect + isin would blow the driver at scale)
        keys = [
            r[0]
            for r in bands_new.select("band_hash")
            .distinct()
            .limit(PROBE_CAP + 1)
            .collect()
        ]
        old_bands = _pruned_index(store, BAND_TABLE, "band_hash", keys, {})
        new_a = bands_new.select(F.col("doc_id").alias("doc_a"), "band_id", "band_hash")
        new_b = bands_new.select(F.col("doc_id").alias("doc_b"), "band_id", "band_hash")
        incr = new_a.join(new_b, ["band_id", "band_hash"]).filter(
            F.col("doc_a") < F.col("doc_b")
        ).select("doc_a", "doc_b")
        if old_bands is not None:
            incr = incr.unionByName(
                bands_new.join(
                    old_bands.select(
                        F.col("doc_id").alias("_old"), "band_id", "band_hash"
                    ),
                    ["band_id", "band_hash"],
                ).select(F.col("_old").alias("doc_a"), F.col("doc_id").alias("doc_b"))
            )
        out = (
            batch.unionByName(
                incr.distinct().select(
                    F.lit("incr").alias("leg"), "doc_a", "doc_b"
                )
            )
            # materialize BEFORE the temp index is deleted below — the
            # bench re-invokes this entry several times per run and an
            # undeleted index leaked half the corpus per call (review r11)
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        sig.unpersist()
    # the INCREMENTAL LINE-DEDUP leg rides this entry since r15
    # (VERDICT r14 next #1: one leg per host so a red cell names it)
    out = _pad_minhash_host(out).unionByName(
        _line_inc_leg(spark, docs), allowMissingColumns=True
    )
    _log_leg_digests("dedup_minhash_lsh", out, sf_dir)
    return out


def _pad_minhash_host(df: DataFrame) -> DataFrame:
    """NULL dedup-leg columns on the (leg, doc_a, doc_b) host rows so
    the empty-corpus early return and the main path share a schema."""
    return df.select(
        "*",
        F.lit(None).cast("string").alias("content_hash"),
        F.lit(None).cast("long").alias("canonical_doc_id"),
        F.lit(None).cast("long").alias("n_copies"),
        F.lit(None).cast("long").alias("chars_removed"),
    )


def dedup_minhash_batch_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENCH twin: the plain batch LSH operator alone — the shape every
    BENCH_r<=10 timed under the name dedup_minhash_lsh, kept separately
    so round-over-round timings stay comparable (the registered entry
    now carries the incremental leg too)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return DD.minhash_lsh_candidates(
        docs, text_col="text", id_col="doc_id", n=3, num_hashes=16, bands=4
    )


# The 96-bit pairs-leg banding CASE, generated from the SAME band
# specs the Spark operator uses (one definition governs both engines)
_SH96_BAND_CASE = " ".join(
    f"WHEN {b} THEN {DD.simhash_band_val_sql(lo, hi)}"
    for b, lo, hi in DD.simhash_band_specs(96, 3)
)


@register(
    "dedup_simhash",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS tok
        FROM documents),
    bits AS (
        SELECT doc_id, b.bit,
               CASE WHEN (CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT)
                          >> b.bit) & 1 = 1 THEN 1 ELSE -1 END AS v
        FROM toks, (SELECT unnest(range(0, 16)) AS bit) b),
    -- 96-bit TWO-WORD signatures for the PAIRS leg (docs < 100, the
    -- jaccard subset): same md5 vote rule; bit i < 60 from hex chars
    -- 1-15 of the token digest, bit i >= 60 from chars 17-31 — the
    -- r15 next #1b web-scale widening, rebuilt from first principles
    bits96 AS (
        SELECT doc_id, b.bit,
               CASE WHEN (CASE WHEN b.bit < 60
                          THEN (CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) >> b.bit)
                          ELSE (CAST(('0x' || substr(md5(tok), 17, 15)) AS BIGINT) >> (b.bit - 60))
                          END) & 1 = 1 THEN 1 ELSE -1 END AS v
        FROM toks, (SELECT unnest(range(0, 96)) AS bit) b
        WHERE doc_id < 100),
    sh96 AS (
        SELECT d.doc_id, CAST(COALESCE(s.sh0, 0) AS BIGINT) AS sh0,
               CAST(COALESCE(s.sh1, 0) AS BIGINT) AS sh1
        FROM (SELECT doc_id FROM documents WHERE doc_id < 100) d
        LEFT JOIN (
            SELECT doc_id,
                   SUM(CASE WHEN sgn > 0 AND bit < 60
                       THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS sh0,
                   SUM(CASE WHEN sgn > 0 AND bit >= 60
                       THEN (CAST(1 AS BIGINT) << (bit - 60)) ELSE 0 END) AS sh1
            FROM (SELECT doc_id, bit, SUM(v) AS sgn FROM bits96 GROUP BY doc_id, bit)
            GROUP BY doc_id) s ON s.doc_id = d.doc_id),
    sbands AS (
        SELECT doc_id, sh0, sh1, b.band_id,
               CASE b.band_id {_SH96_BAND_CASE} END AS band_val
        FROM sh96, (SELECT unnest(range(0, 4)) AS band_id) b),
    spairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.sh0, b.sh0)) + bit_count(xor(a.sh1, b.sh1)) AS hamming
        FROM sbands a JOIN sbands b
          ON a.band_id = b.band_id AND a.band_val = b.band_val
             AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh0, b.sh0)) + bit_count(xor(a.sh1, b.sh1)) <= 3)
    -- LEFT JOIN back to documents: a NULL-text doc has no token rows
    -- (unnest of NULL), but the engine still emits its row with an
    -- all-zero signature — without the join the oracle silently drops
    -- it (r15 adversarial-parity find, the NULL-text class again)
    SELECT 'simhash' AS leg, d.doc_id,
           CAST(COALESCE(s.sh, 0) AS BIGINT) AS simhash16,
           CAST(NULL AS BIGINT) AS doc_a, CAST(NULL AS BIGINT) AS doc_b,
           CAST(NULL AS BIGINT) AS hamming,
           {_HOST_PAD_SQL}
    FROM documents d LEFT JOIN (
        SELECT doc_id,
               SUM(CASE WHEN sgn > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS sh
        FROM (SELECT doc_id, bit, SUM(v) AS sgn FROM bits GROUP BY doc_id, bit)
        GROUP BY doc_id) s ON s.doc_id = d.doc_id
    UNION ALL
    -- the banded-SimHash near-dup PAIRS leg (r15): pigeonhole bands +
    -- exact Hamming verify, rebuilt from first principles
    SELECT 'pairs', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           p.doc_a, p.doc_b, CAST(p.hamming AS BIGINT),
           {_HOST_PAD_SQL}
    FROM spairs p
    UNION ALL
    SELECT q.leg, CAST(NULL AS BIGINT) AS doc_id,
           CAST(NULL AS BIGINT) AS simhash16,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           q.content_hash, q.canonical_doc_id, q.n_copies, q.chars_removed
    FROM ({_line_leg_sql("line_doc", scope="document")}) q
    """,
    tags="ext dedup simhash pairs lines",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures (host leg 'simhash') + since r15 the
    DOCUMENT-SCOPE line-dedup leg ('line_doc', Dolma's document mode:
    within-doc repeats drop, cross-doc duplicates survive — moved here
    from the `dedup_exact` fold so a divergence localizes to THIS leg,
    VERDICT r14 next #1) + the banded-SimHash near-dup PAIRS leg
    ('pairs', ``dedup.simhash_pairs``: since r16 96-BIT two-md5-word
    signatures — VERDICT r15 next #1b — pigeonhole bands =
    max_hamming+1 so recall below the threshold is EXACT, row-local
    two-word bit_count verify — the Manku et al. web-dedup shape).
    The cap is None HERE because the oracle is cap-free and the
    doc_id<100 subset bounds every bucket at 100 anyway; production
    callers get the finite default."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    host = DD.simhash(docs, text_col="text", id_col="doc_id", bits=16).select(
        F.lit("simhash").alias("leg"), "*"
    )
    pairs = DD.simhash_pairs(
        docs.filter(F.col("doc_id") < 100),
        text_col="text", id_col="doc_id", bits=96, max_hamming=3,
        max_bucket_size=None,
    ).select(
        F.lit("pairs").alias("leg"), "doc_a", "doc_b",
        F.col("hamming").cast("long").alias("hamming"),
    )
    line_doc = _dedup_leg_frame(
        DD.dedup_lines(
            docs, text_col="text", id_col="doc_id", min_chars=15,
            scope="document",
        ),
        "line_doc",
    )
    out = host.unionByName(pairs, allowMissingColumns=True).unionByName(
        line_doc, allowMissingColumns=True
    )
    _log_leg_digests("dedup_simhash", out, sf_dir)
    return out


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------
@register(
    "ann_cosine_topk",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    sims AS (
        SELECT e.vec_id, e.label,
               ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                     / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
        FROM embeddings e, q WHERE e.vec_id != 0)
    SELECT vec_id, label, cosine FROM sims
    ORDER BY cosine DESC, vec_id LIMIT 10
    """,
    tags="ext similarity ann",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return SIM.cosine_topk(emb, query_vec_id=0, k=10)


# The seeded hyperplanes are deterministic module-level constants, so
# the oracle SQL can inline them as literals and DuckDB can rebuild
# the exact bucket assignment — upgrading these entries from rows-only
# to full value-hash checks. The testdata embedding dim (64) is baked
# into the literals; the operators themselves stay dim-agnostic.
def _plane_sql(plane: list[float]) -> str:
    return "[" + ", ".join(str(w) for w in plane) + "]"


def _bucket_sql(planes: list[list[float]]) -> str:
    return " + ".join(
        f"(CASE WHEN list_dot_product(v, {_plane_sql(p)}) >= 0 THEN {2 ** i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )


_ANN_PLANES = SIM._seeded_planes(8, 64)

_ANN_LSH_ORACLE = f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
    b AS (SELECT vec_id, label, v, {_bucket_sql(_ANN_PLANES)} AS bucket FROM e),
    q AS (SELECT bucket, v AS qv FROM b WHERE vec_id = 0)
    SELECT b.vec_id, b.label,
           ROUND(list_dot_product(b.v, q.qv)
                 / (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(q.qv, q.qv))),
                 6) AS cosine
    FROM b, q
    WHERE b.bucket = q.bucket AND b.vec_id <> 0
    ORDER BY cosine DESC, b.vec_id
    LIMIT 10
"""


@register(
    "ann_lsh_bucketed",
    oracle=_ANN_LSH_ORACLE,
    tags="ext similarity lsh",
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return SIM.lsh_bucket_topk(emb, query_vec_id=0, k=10, n_planes=8)


# Two-stage int8 quantized ANN under the FULL value-hash oracle
# (VERDICT r7 directive #2): DuckDB rebuilds the SQ8 codes with the
# exact same double expression chain as quantize_embeddings
# (scale = amax/127.0, round(x/scale) — Spark's HALF_UP and DuckDB's
# half-away-from-zero agree on doubles, and the int8 stage's dots /
# norms are exact small integers in doubles, so the approximate scores
# match bit-for-bit and the rerank-candidate CUT is identical), then
# replays stage 1 (int8-dot candidate top-`rerank` with the same
# deterministic tie-break) and stage 2 (exact cosine rerank — the same
# formula the already-green ann_cosine_topk oracle uses, round-6
# absorbing fold-order ulps).
_ANN_QUANT_ORACLE = """
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
    s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM e),
    c AS (SELECT vec_id,
                 CASE WHEN amax > 0
                      THEN list_transform(v, x -> round(x / (amax / 127.0)))
                      ELSE list_transform(v, x -> 0.0) END AS q
          FROM s),
    qq AS (SELECT q AS qv, sqrt(list_dot_product(q, q)) AS qn
           FROM c WHERE vec_id = 0),
    approx AS (SELECT c.vec_id,
                      list_dot_product(c.q, qq.qv)
                        / greatest(sqrt(list_dot_product(c.q, c.q)) * qq.qn, 1e-300)
                        AS a
               FROM c, qq WHERE c.vec_id != 0),
    cand AS (SELECT vec_id FROM approx ORDER BY a DESC, vec_id LIMIT 40),
    qv AS (SELECT v AS qv FROM e WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           ROUND(list_dot_product(e.v, qv.qv)
                 / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(qv.qv, qv.qv))),
                 6) AS cosine
    FROM e JOIN cand USING (vec_id), qv
    ORDER BY cosine DESC, e.vec_id
    LIMIT 10
"""


@register(
    "ann_quantized_topk",
    oracle=_ANN_QUANT_ORACLE,
    tags="ext similarity ann quantized",
)
def ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rerank=40 (the 4k default) genuinely exercises the approximate
    int8 candidate stage — the oracle replays BOTH stages, so the
    hash check pins the quantization and the candidate cut, not just
    the final cosine math."""
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return SIM.cosine_topk_quantized(emb, query_vec_id=0, k=10, rerank=40)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------
@register(
    "text_quality_scores",
    oracle="""
    WITH t AS (SELECT doc_id, n_chars, text,
                      string_split_regex(trim(text), '\\s+') AS toks,
                      lower(text) AS lt,
                      list_filter(list_transform(string_split(text, chr(10)),
                                                 x -> trim(x)),
                                  x -> x != '') AS lines
               FROM documents),
    -- decontamination leg (r12): eval suite = a 200-char span of every
    -- 101st doc; any doc sharing an 8-gram with a span is contaminated
    dtoks AS (SELECT doc_id,
                     string_split_regex(trim(lower(text)), '\\s+') AS dt
              FROM documents),
    dsh AS (SELECT doc_id,
                   unnest(list_distinct(list_transform(range(1, len(dt) - 6),
                       i -> dt[i] || ' ' || dt[i+1] || ' ' || dt[i+2] || ' ' ||
                            dt[i+3] || ' ' || dt[i+4] || ' ' || dt[i+5] || ' ' ||
                            dt[i+6] || ' ' || dt[i+7]))) AS shingle
            FROM dtoks WHERE len(dt) >= 8),
    etoks AS (SELECT doc_id AS eval_id,
                     string_split_regex(trim(lower(substr(text, 50, 200))), '\\s+') AS et
              FROM documents WHERE doc_id % 101 = 0),
    esh AS (SELECT DISTINCT eval_id,
                   unnest(list_distinct(list_transform(range(1, len(et) - 6),
                       i -> et[i] || ' ' || et[i+1] || ' ' || et[i+2] || ' ' ||
                            et[i+3] || ' ' || et[i+4] || ' ' || et[i+5] || ' ' ||
                            et[i+6] || ' ' || et[i+7]))) AS shingle
            FROM etoks WHERE len(et) >= 8),
    decon AS (SELECT d.doc_id,
                     COUNT(DISTINCT d.shingle) AS decon_overlap,
                     COUNT(DISTINCT e.eval_id) AS decon_eval_hits,
                     MIN(d.shingle) AS decon_sample
              FROM dsh d JOIN esh e ON d.shingle = e.shingle
              GROUP BY d.doc_id),
    -- span-scrub leg (r13): positional 8-gram hits -> covered token
    -- runs; documents are single-space token streams, so the char
    -- count of a merged span run is sum(token lens) + internal
    -- separators — exactly decontaminate_spans' splice arithmetic
    dpos AS (SELECT k.doc_id, u.i,
                    k.dt[u.i] || ' ' || k.dt[u.i+1] || ' ' || k.dt[u.i+2] || ' ' ||
                    k.dt[u.i+3] || ' ' || k.dt[u.i+4] || ' ' || k.dt[u.i+5] || ' ' ||
                    k.dt[u.i+6] || ' ' || k.dt[u.i+7] AS gram
             FROM dtoks k, unnest(range(1, len(k.dt) - 6)) AS u(i)
             WHERE len(k.dt) >= 8),
    hitpos AS (SELECT DISTINCT p.doc_id, p.i
               FROM dpos p JOIN (SELECT DISTINCT shingle FROM esh) e
                 ON p.gram = e.shingle),
    cov AS (SELECT DISTINCT h.doc_id, h.i + u.j AS tok
            FROM hitpos h, unnest(range(0, 8)) AS u(j)),
    spanstats AS (SELECT c.doc_id,
                         SUM(len(k.dt[c.tok])) AS covchars,
                         COUNT(*) AS ncov,
                         SUM(CASE WHEN p.tok IS NULL THEN 1 ELSE 0 END) AS runs
                  FROM cov c
                  JOIN dtoks k ON k.doc_id = c.doc_id
                  LEFT JOIN cov p ON p.doc_id = c.doc_id AND p.tok = c.tok - 1
                  GROUP BY c.doc_id),
    -- Gopher repetition legs (r13): positional word bigrams; the top
    -- gram per doc with ties broken lexicographically smallest
    bigr AS (SELECT k.doc_id,
                    k.dt[u.i] || ' ' || k.dt[u.i + 1] AS g
             FROM dtoks k, unnest(range(1, len(k.dt))) AS u(i)
             WHERE len(k.dt) >= 2),
    bgc AS (SELECT doc_id, g, COUNT(*) AS c FROM bigr GROUP BY doc_id, g),
    bgtop AS (SELECT doc_id, g, c,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY c DESC, g ASC) AS rn
              FROM bgc),
    g5 AS (SELECT k.doc_id, u.i,
                  k.dt[u.i] || ' ' || k.dt[u.i + 1] || ' ' ||
                  k.dt[u.i + 2] || ' ' || k.dt[u.i + 3] || ' ' ||
                  k.dt[u.i + 4] AS g
           FROM dtoks k, unnest(range(1, len(k.dt) - 3)) AS u(i)
           WHERE len(k.dt) >= 5),
    g5dups AS (SELECT doc_id, g FROM g5 GROUP BY doc_id, g
               HAVING COUNT(*) >= 2),
    hit5 AS (SELECT DISTINCT p.doc_id, p.i
             FROM g5 p JOIN g5dups d ON p.doc_id = d.doc_id AND p.g = d.g),
    cov5 AS (SELECT DISTINCT h.doc_id, h.i + u.j AS tok
             FROM hit5 h, unnest(range(0, 5)) AS u(j)),
    g5dup AS (SELECT c.doc_id,
                     SUM(len(k.dt[c.tok])) + COUNT(*) -
                     SUM(CASE WHEN p.tok IS NULL THEN 1 ELSE 0 END)
                         AS covered
              FROM cov5 c
              JOIN dtoks k ON k.doc_id = c.doc_id
              LEFT JOIN cov5 p ON p.doc_id = c.doc_id AND p.tok = c.tok - 1
              GROUP BY c.doc_id)
    SELECT t.doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(n_chars AS BIGINT) AS n_chars_meta,
           ROUND(CAST(len(list_filter(toks, x -> lower(x) IN ('the','a','of','and','to','in')))
                 AS DOUBLE) / len(toks), 4) AS stopword_ratio,
           ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS distinct_ratio,
           CAST(length(lt) - length(regexp_replace(lt, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
           md5(array_to_string(list_sort(list_distinct(
               string_split_regex(trim(lt), '\\s+'))), ' ')) AS fingerprint,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                              '<EMAIL>', 'g'),
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ipv4,
           CASE WHEN len(lines) <= 0 THEN 0.0
                ELSE ROUND(1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines), 4)
           END AS dup_line_fraction,
           CASE WHEN COALESCE(list_sum(list_transform(lines, x -> len(x))), 0) <= 0
                THEN 0.0
                ELSE ROUND(1.0 -
                     CAST(list_sum(list_transform(list_distinct(lines),
                                                  x -> len(x))) AS DOUBLE) /
                     list_sum(list_transform(lines, x -> len(x))), 4)
           END AS dup_line_char_fraction,
           CASE WHEN bt.c IS NULL OR len(t.text) <= 0 THEN 0.0
                ELSE ROUND(CAST(bt.c * len(bt.g) AS DOUBLE) / len(t.text), 4)
           END AS top2gram_char_frac,
           CASE WHEN COALESCE(len(toks), 0) < 5
                     OR COALESCE(len(t.text), 0) <= 0 THEN 0.0
                ELSE ROUND(CAST(COALESCE(g5.covered, 0) AS DOUBLE)
                           / len(t.text), 4)
           END AS dup5gram_char_frac,
           CAST(COALESCE(dc.decon_overlap, 0) AS BIGINT) AS decon_overlap,
           CAST(COALESCE(dc.decon_eval_hits, 0) AS BIGINT) AS decon_eval_hits,
           dc.decon_sample,
           CAST(COALESCE(sp.runs, 0) AS INTEGER) AS decon_spans_removed,
           CAST(COALESCE(sp.covchars + sp.ncov - sp.runs, 0) AS INTEGER)
               AS decon_chars_removed
    FROM t LEFT JOIN decon dc ON t.doc_id = dc.doc_id
         LEFT JOIN spanstats sp ON t.doc_id = sp.doc_id
         LEFT JOIN (SELECT doc_id, g, c FROM bgtop WHERE rn = 1) bt
                ON t.doc_id = bt.doc_id
         LEFT JOIN g5dup g5 ON t.doc_id = g5.doc_id
    """,
    tags="ext text quality fingerprint pii repetition decontamination",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features plus the order-insensitive content fingerprint
    and the corpus-hygiene signals — PII counts (email/IPv4, patterns
    restricted to Java-regex/RE2-identical syntax so they hash across
    engines) and the Gopher-style duplicate-line fraction. All folds
    of the one row-local scan (standalone entries would spend registry
    slots the 50-cap doesn't have).

    Round 12 (VERDICT r11 next #3) folds the DECONTAMINATION report
    under the same hash: the eval suite is derived in-query (a
    200-char span of every 101st document — the planted-contamination
    shape), and ``dedup.decontaminate`` flags every doc sharing an
    8-gram with it. DuckDB rebuilds the shingle-membership join
    exactly, so a tokenization drift, a lost shingle, or a wrong
    overlap count breaks the value hash."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    q = TX.quality_scores(
        docs, text_col="text", id_col="doc_id",
        with_fingerprint=True, with_pii=True, with_repetition=True,
    )
    ev = docs.filter(F.col("doc_id") % 101 == 0).select(
        F.col("doc_id").alias("eval_id"),
        F.substring("text", 50, 200).alias("etext"),
    )
    decon = DD.decontaminate(
        docs, ev, n=8, text_col="text", id_col="doc_id",
        eval_text_col="etext", eval_id_col="eval_id",
    )
    # round 13 (VERDICT r12 next #4): the SPAN-SCRUB counts join the
    # same hash — DuckDB rebuilds the positional-hit -> covered-token-
    # run -> splice-length arithmetic from first principles, so a
    # wrong span location, a missed merge, or an off-by-one splice
    # breaks the value hash (byte-identity of the cleaned text itself
    # is pytest-pinned; the counts are its arithmetic shadow)
    spans = DD.decontaminate_spans(
        docs, ev, n=8, text_col="text", id_col="doc_id",
        eval_text_col="etext", eval_id_col="eval_id",
    ).select("doc_id", "decon_spans_removed", "decon_chars_removed")
    return (
        q.join(decon, "doc_id", "left")
        .join(spans, "doc_id", "left")
        .select(
            q["*"],
            F.coalesce("decon_overlap", F.lit(0)).cast("long").alias("decon_overlap"),
            F.coalesce("decon_eval_hits", F.lit(0)).cast("long").alias("decon_eval_hits"),
            "decon_sample",
            "decon_spans_removed",
            "decon_chars_removed",
        )
    )


def text_quality_scores_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENCH twin: the row-local quality scan alone — the shape every
    BENCH_r<=11 timed under the name text_quality_scores, kept
    separately so round-over-round timings stay comparable (the
    registered entry now carries the decontamination leg too — the
    dedup_minhash_batch_only rule; the r13 Gopher repetition folds
    likewise time under their own row, text_repetition_signals)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return TX.quality_scores(
        docs, text_col="text", id_col="doc_id",
        with_fingerprint=True, with_pii=True,
    )


def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENCH row for the Gopher char-coverage repetition family alone
    (new in r13, no historical baseline): three per-row sorted-gram
    folds over the documents table."""
    from geo_explorer_etl_spark.operators.text import (
        dup_line_char_fraction_expr,
        dup_ngram_char_fraction_expr,
        top_ngram_char_fraction_expr,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return docs.select(
        "doc_id",
        dup_line_char_fraction_expr(F.col("text")).alias("dup_line_char_fraction"),
        top_ngram_char_fraction_expr(F.col("text"), 2).alias("top2gram_char_frac"),
        dup_ngram_char_fraction_expr(F.col("text"), 5).alias("dup5gram_char_frac"),
    )


#: Mixture leg of text_token_count_bpe (r12, VERDICT r11 next #5): a
#: fixed recipe over the testdata's sources, budgets derived once
#: here so the Spark side and the injected oracle literals can never
#: drift.
_MIX_BUDGET = 3000
_MIX_WEIGHTS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}


def _mix_budget_values_sql() -> str:
    from geo_explorer_etl_spark.operators.corpus import mixture_budgets

    b = mixture_budgets(_MIX_BUDGET, _MIX_WEIGHTS)
    rows = ", ".join(f"('{d}', {n})" for d, n in sorted(b.items()))
    return f"(SELECT * FROM (VALUES {rows}) AS mb(source, dbudget))"


@register(
    "text_token_count_bpe",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
                 AS n_bpe_tokens,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_ws_tokens
        FROM documents),
    o AS (
        SELECT doc_id, source, n_bpe_tokens, n_ws_tokens,
               CAST(COALESCE(SUM(n_bpe_tokens) OVER (
                   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS pack_offset,
               SUM(n_bpe_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS dom_cum
        FROM t),
    {_substr_leg_ctes(10)}
    SELECT 'pack' AS leg, o.doc_id, o.n_bpe_tokens, o.n_ws_tokens, o.pack_offset,
           CAST(FLOOR(o.pack_offset / 2048.0) AS BIGINT) AS pack_first,
           CAST(FLOOR((o.pack_offset + GREATEST(o.n_bpe_tokens, 1) - 1) / 2048.0) AS BIGINT)
             AS pack_last,
           COALESCE(o.dom_cum <= mb.dbudget, FALSE) AS mix_admitted,
           {_HOST_PAD_SQL}
    FROM o LEFT JOIN {_mix_budget_values_sql()} mb ON o.source = mb.source
    UNION ALL
    SELECT q.leg, CAST(NULL AS BIGINT) AS doc_id,
           CAST(NULL AS BIGINT) AS n_bpe_tokens,
           CAST(NULL AS BIGINT) AS n_ws_tokens,
           CAST(NULL AS BIGINT) AS pack_offset,
           CAST(NULL AS BIGINT) AS pack_first,
           CAST(NULL AS BIGINT) AS pack_last,
           CAST(NULL AS BOOLEAN) AS mix_admitted,
           q.content_hash, q.canonical_doc_id, q.n_copies, q.chars_removed
    FROM ({_SUBSTR_LEG_SELECT}) q
    """,
    tags="ext text tokens packing mixture substring",
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts + GPT-style sequence PACKING (concat-then-chunk):
    each doc's global token offset and first/last 2048-token training
    sequence. The oracle's single global window IS the semantics; the
    Spark side computes the same cumsum as a distributed prefix sum
    (value-bucketed bases + partitioned windows, text.pack_offsets) —
    a single-partition global Window would serialize 100 TB through
    one task (plan-pinned in tests).

    Round 12 folds DOMAIN-MIXTURE admission under the same hash:
    ``mix_admitted`` marks each doc's membership in a fixed
    50/30/20 recipe over three sources (``mixture_budgets``'
    deterministic rounding; per-domain ascending-id prefixes via the
    same two-level prefix sum, corpus._prefix_under_budget_by_domain).
    DuckDB recomputes the per-domain windows against the injected
    budget literals, so a drifted rounding rule, a domain bleed, or a
    broken per-domain cumsum breaks the value hash."""
    from geo_explorer_etl_spark.operators.corpus import (
        _prefix_under_budget_by_domain,
        mixture_budgets,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    counts = TX.token_counts(docs, text_col="text", id_col="doc_id")
    packed = TX.pack_offsets(counts, tokens_col="n_bpe_tokens", id_col="doc_id")
    admitted = _prefix_under_budget_by_domain(
        docs, "text", "doc_id", "source",
        mixture_budgets(_MIX_BUDGET, _MIX_WEIGHTS), bucket_width=100,
    ).select("doc_id", F.lit(True).alias("mix_admitted"))
    host = (
        packed.join(admitted, "doc_id", "left")
        .withColumn("mix_admitted", F.coalesce("mix_admitted", F.lit(False)))
        .select(F.lit("pack").alias("leg"), "*")
    )
    # the EXACT-SUBSTRING dedup leg rides this entry since r15
    # (VERDICT r14 next #1); normalize=True is the oracle basis —
    # DuckDB rebuilds the stride-1 window fingerprints, keep-first
    # rule, covered-token splice and normalized char arithmetic from
    # first principles; the byte-exact default splice is pytest-pinned
    sub = _dedup_leg_frame(
        DD.dedup_substrings(
            docs, text_col="text", id_col="doc_id", window=10, normalize=True
        ),
        "substr",
    )
    out = host.unionByName(sub, allowMissingColumns=True)
    _log_leg_digests("text_token_count_bpe", out, sf_dir)
    return out


#: the registered split leg's fixed recipe + seed (the oracle inlines
#: the same thresholds through split_corpus_threshold_sql)
_SPLIT_WEIGHTS = {"train": 0.98, "val": 0.01, "test": 0.01}
_SPLIT_SEED = 42


def _split_case_sql(stratify_by: str | None = None) -> str:
    from geo_explorer_etl_spark.operators.corpus import (
        split_corpus_threshold_sql,
    )

    return split_corpus_threshold_sql(
        _SPLIT_WEIGHTS, "doc_id", _SPLIT_SEED, stratify_by=stratify_by
    )


split_case = _split_case_sql()
split_strat_case = _split_case_sql(stratify_by="source")


@register(
    "text_langid",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
               FROM documents),
    scores AS (
        SELECT doc_id,
               len(list_filter(toks, x -> x IN ('the','a','of','and','to','in'))) AS en,
               len(list_filter(toks, x -> x IN ('le','la','de','et','un','les'))) AS fr,
               len(list_filter(toks, x -> x IN ('der','die','das','und','ein','zu'))) AS de,
               len(list_filter(toks, x -> x IN ('el','la','de','y','un','en'))) AS es
        FROM t),
    lang AS (
        SELECT doc_id,
               CASE WHEN en >= fr AND en >= de AND en >= es THEN 'en'
                    WHEN fr >= de AND fr >= es THEN 'fr'
                    WHEN de >= es THEN 'de'
                    ELSE 'es' END AS lang_guess
        FROM scores),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    tok2 AS (SELECT doc_id, tok FROM tok WHERE tok != ''),
    counts AS (SELECT tok, COUNT(*) AS c FROM tok2 GROUP BY tok),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS s FROM counts),
    vocab AS (SELECT tok, ln(c / (SELECT s FROM tot)) AS lp
              FROM counts ORDER BY c DESC, tok LIMIT 50000),
    lm AS (SELECT t2.doc_id,
                  ROUND(AVG(COALESCE(v.lp, ln(0.5 / (SELECT s FROM tot)))), 4)
                    AS lm_logprob
           FROM tok2 t2 LEFT JOIN vocab v USING (tok)
           GROUP BY t2.doc_id)
    SELECT 'lang' AS leg, lang.doc_id, lang.lang_guess, lm.lm_logprob,
           CAST(NULL AS VARCHAR) AS split,
           CAST(NULL AS VARCHAR) AS split_strat
    FROM lang LEFT JOIN lm USING (doc_id)
    UNION ALL
    -- the DETERMINISTIC SPLIT leg (r15): md5-derived cell mod 10000
    -- against largest-remainder thresholds — DuckDB rebuilds the
    -- exact assignment, so a drifted hash, threshold rounding, or
    -- partitioning dependence breaks the value hash. Since r16 the
    -- leg also carries the STRATIFIED assignment (VERDICT r15 next
    -- #4): the same thresholds over md5(seed:source:id), so a
    -- drifted salt construction breaks the hash too
    SELECT 'split', doc_id, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE),
           {split_case},
           {split_strat_case}
    FROM documents
    """,
    tags="ext text langid lm-score split",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID + the corpus-estimated unigram LM score (the
    CCNet-style perplexity-proxy quality filter) — the lone text op
    needing GLOBAL corpus statistics, folded here to keep the
    registry at the 50-entry cap. Since r15 also carries the
    DETERMINISTIC train/val/test split leg (``corpus.split_corpus``:
    split = pure function of (seed, id), machine/partitioning/
    run-independent — the property ``randomSplit`` lacks) plus, since
    r16, its STRATIFIED twin (``stratify_by="source"``: proportions
    hold within every domain, VERDICT r15 next #4)."""
    from geo_explorer_etl_spark.operators.corpus import split_corpus

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    lang = TX.langid(docs, text_col="text", id_col="doc_id")
    # lang already enumerates every doc_id; restore_ids=False skips the
    # LM side's own id-restoring wrapper scan (review r10 wave 7)
    lm = TX.unigram_logprob(
        docs, text_col="text", id_col="doc_id", restore_ids=False
    )
    host = lang.join(lm, "doc_id", "left").select(
        F.lit("lang").alias("leg"), "*"
    )
    split = split_corpus(
        split_corpus(docs, _SPLIT_WEIGHTS, id_col="doc_id", seed=_SPLIT_SEED),
        _SPLIT_WEIGHTS, id_col="doc_id", seed=_SPLIT_SEED,
        out_col="split_strat", stratify_by="source",
    ).select(F.lit("split").alias("leg"), "doc_id", "split", "split_strat")
    return host.unionByName(split, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# Incremental / streaming-analog operators over events.
# The streaming versions (readStream + watermark) live in
# geo_explorer_etl_spark/streaming and are covered by pytest; these
# batch twins define the same logical result for the oracle.
# ---------------------------------------------------------------------------
@register(
    "i1_changed_set_poll",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS n_changed
    FROM events GROUP BY CAST(ts AS DATE)
    """,
    tags="I1 incremental",
)
def i1_changed_set_poll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    return ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.countDistinct("user_id").alias("n_changed")
    )


@register(
    "stream_tumbling_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
    tags="ext streaming window",
)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


@register(
    "sessionize_events",
    oracle="""
    WITH g AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR CAST(floor(epoch(ts)) AS BIGINT)
                            - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM g GROUP BY user_id
    """,
    tags="ext streaming sessionize",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(F.lag("ts").over(w).isNull() | (gap > 1800), 1).otherwise(0)
    return (
        ev.withColumn("new_sess", new_sess)
        .groupBy("user_id")
        .agg(
            F.sum("new_sess").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                     6) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id)
    SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.4
    """,
    tags="ext dedup similarity",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs variant — the small-scale oracle for the
    bucketed operator below; at corpus scale use
    ``dedup_embedding_cosine_bucketed``."""
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return SIM.cosine_near_dup_pairs(emb, threshold=0.4)


_BAND_PLANES = [
    SIM._seeded_planes(2, 64, seed=f"geo-explorer-lsh:band{b}") for b in range(8)
]

_BUCKETED_NEAR_DUP_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                      sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                            CAST(embedding AS DOUBLE[]))) n
               FROM embeddings),
    bb AS ({" UNION ALL ".join(
        f"SELECT vec_id, v, n, {b} AS band, {_bucket_sql(planes)} AS bucket FROM e"
        for b, planes in enumerate(_BAND_PLANES)
    )})
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.v, b.v) / (a.n * b.n), 6) AS cosine
    FROM bb a JOIN bb b
      ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.v, b.v) / (a.n * b.n), 6) >= 0.4
"""


@register(
    "dedup_embedding_cosine_bucketed",
    oracle=_BUCKETED_NEAR_DUP_ORACLE,
    tags="ext dedup similarity lsh",
)
def dedup_embedding_cosine_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: banded LSH equi-join bounds candidate pairs to
    ~B·n²/2^r; no CartesianProduct in the plan (pytest-pinned), recall
    vs the exact variant gated in tests. r=2 here because the synthetic
    corpus's near-dups sit at cos≈0.4–0.5 (θ≈66°); real near-dup
    corpora (cos ≥ 0.9) use the r=8+ defaults for much stronger
    pruning."""
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return SIM.bucketed_near_dup_pairs(
        emb, threshold=0.4, planes_per_band=2, n_bands=8
    )


# Both IVF catalog entries use stride_seed_vectors — centroids are
# actual stored vectors selected by pure integer arithmetic
# (id % step == 0, step = n // K), so the DuckDB oracle rebuilds the
# identical cell structure from the same table: no floating-point
# reduction (k-means averaging) whose cross-engine summation order
# would flip near-tie cell assignments. The Lloyd-TRAINED path
# (train_centroids, sharded mapInPandas partials) remains the
# production training story and keeps its pytest recall gates; the
# catalog entries pin the full query topology (probe → cell equi-join
# → exact cosine) under a value-level oracle.
# nprobe=6 with strided (untrained) seeds: measured recall 0.94 vs the
# exact twin at sf0.1 (vs 0.61 at nprobe=3 — unoptimized seeds need
# more probes than trained centroids for the same recall), while the
# pruning factor stays ~nprobe²/K = 36/√n of all pairs — under 1% at
# the K=4096 cap.
_IVF_DEDUP_NPROBE = 6

# K follows the standard IVF √n rule, bounded to [16, 4096] — and the
# rule itself is oracle-checked: IEEE sqrt is correctly rounded, so
# floor(sqrt(n)) is bit-identical between Python and DuckDB and both
# engines derive the same K, step, and cell set from the same table.
_IVF_DEDUP_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
    params AS (
        SELECT GREATEST(16, LEAST(4096, CAST(floor(sqrt(count(*))) AS BIGINT))) AS k,
               GREATEST(count(*) // GREATEST(16, LEAST(4096,
                        CAST(floor(sqrt(count(*))) AS BIGINT))), 1) AS step
        FROM e),
    cents AS (
        SELECT row_number() OVER (ORDER BY e.vec_id) - 1 AS c, e.v
        FROM e, params p
        WHERE e.vec_id % p.step = 0 AND e.vec_id < p.k * p.step),
    scores AS (
        SELECT e.vec_id, c.c, list_dot_product(e.v, c.v) AS s
        FROM e CROSS JOIN cents c),
    probed AS (
        SELECT vec_id, c FROM (
            SELECT vec_id, c,
                   row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c) AS rn
            FROM scores)
        WHERE rn <= {_IVF_DEDUP_NPROBE}),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM probed a JOIN probed b ON a.c = b.c AND a.vec_id < b.vec_id),
    withn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e)
    SELECT c.id_a, c.id_b,
           ROUND(list_dot_product(a.v, b.v) / (a.n * b.n), 6) AS cosine
    FROM cand c
    JOIN withn a ON c.id_a = a.vec_id
    JOIN withn b ON c.id_b = b.vec_id
    WHERE ROUND(list_dot_product(a.v, b.v) / (a.n * b.n), 6) >= 0.4
"""


@register(
    "dedup_embedding_cosine_ivf",
    oracle=_IVF_DEDUP_ORACLE,
    tags="ext dedup similarity ivf",
)
def dedup_embedding_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-adaptive scale path for weak-similarity corpora: √n IVF
    cells, 6-probe assignment, within-cell exact cosine — measured
    recall 0.94 vs the exact twin at sf0.1, where sign-bit banding
    would need ~2n² dot products for the same recall at this weak
    (cos 0.4) threshold. Seeds here are deterministic
    strided data vectors so the DuckDB oracle reproduces the cells
    exactly — including the √n cell-count rule itself (floor(sqrt) is
    bit-identical across engines); the trained-k-means variant is
    pytest-gated on recall. Scoring is the TILED path (round 6): each
    vector ships once per probed cell into Arrow block scoring instead
    of twice per candidate pair — measured 1.39 s vs 2.16 s for the
    pair-join scorer at sf0.1, identical rows (fixed-order dots), same
    oracle."""
    import math

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    n = emb.count()
    # math.isqrt: EXACT integer sqrt. int(n**0.5) routes through libm
    # pow(x, 0.5), which the C standard does not require to be
    # correctly rounded — a perfect-square n could floor to k-1 on some
    # libms and silently desync the cell set from the oracle's
    # floor(sqrt(n)). isqrt == floor(sqrt(n)) for all n, by definition.
    k = max(16, min(4096, math.isqrt(n)))
    cents = SIM.stride_seed_vectors(emb, k=k, n=n)
    return SIM.ivf_near_dup_pairs(
        emb, threshold=0.4, nprobe=_IVF_DEDUP_NPROBE, centroids=cents
    )


_ANN_IVF_K, _ANN_IVF_NPROBE = 8, 2

_ANN_IVF_ORACLE = f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
    params AS (SELECT GREATEST(count(*) // {_ANN_IVF_K}, 1) AS step FROM e),
    cents AS (
        SELECT row_number() OVER (ORDER BY e.vec_id) - 1 AS c, e.v
        FROM e, params p
        WHERE e.vec_id % p.step = 0 AND e.vec_id < {_ANN_IVF_K} * p.step),
    assigned AS (
        SELECT vec_id, label, v, c FROM (
            SELECT e.vec_id, e.label, e.v, c.c,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY list_dot_product(e.v, c.v) DESC, c.c) AS rn
            FROM e CROSS JOIN cents c)
        WHERE rn = 1),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    qcells AS (
        SELECT c FROM (
            SELECT c.c,
                   row_number() OVER (ORDER BY list_dot_product(q.qv, c.v) DESC, c.c) AS rn
            FROM cents c, q)
        WHERE rn <= {_ANN_IVF_NPROBE})
    , topk AS (
    SELECT a.vec_id, a.label,
           ROUND(list_dot_product(a.v, q.qv)
                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.qv, q.qv))),
                 6) AS cosine
    FROM assigned a, q
    WHERE a.c IN (SELECT c FROM qcells) AND a.vec_id <> 0
    ORDER BY cosine DESC, a.vec_id
    LIMIT 10)
    SELECT 'mem' AS leg, * FROM topk
    UNION ALL
    SELECT 'index', * FROM topk
"""


@register(
    "ann_ivf_topk",
    oracle=_ANN_IVF_ORACLE,
    tags="ext similarity ivf index",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k ANN with deterministic strided seeds (see the dedup
    twin above): every vector indexed to its nearest cell, the query
    probes its 2 closest cells, exact cosine top-10 within them.

    Round 12 (VERDICT r11 next #4) adds a second leg under the same
    hash: the identical query served from the PERSISTED AnnIvfIndex
    (operators/ann_index.py) — build with the same centroids, probe
    the store through zone-map pruning, exact cosine inside. The
    oracle demands the two legs be row-identical, so any drift in the
    store round-trip (array columns, cell clustering, the prune-only
    probe, assignment tie-breaks) breaks the value hash."""
    import shutil
    import tempfile

    from geo_explorer_etl_spark.operators.ann_index import (
        ann_index_topk,
        build_ann_index,
    )
    from geo_explorer_etl_spark.sources.store import TableStore

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    cents = SIM.stride_seed_vectors(emb, k=_ANN_IVF_K)
    mem = SIM.ivf_topk(
        emb, query_vec_id=0, k=10, nprobe=_ANN_IVF_NPROBE, centroids=cents
    ).select(F.lit("mem").alias("leg"), "*")
    root = tempfile.mkdtemp(prefix="ann_idx_")
    try:
        store = TableStore(spark, root)
        build_ann_index(store, emb, centroids=cents)
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
        ]
        idx = ann_index_topk(
            store, qvec, k=10, nprobe=_ANN_IVF_NPROBE, exclude_id=0
        ).select(F.lit("index").alias("leg"), "*")
        # materialize BEFORE the temp index is deleted (the
        # dedup_minhash_lsh rule — bench re-invokes entries)
        out = mem.unionByName(idx).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# Engine breadth beyond the reference surface: semi-structured JSON,
# pivot, rollup — table stakes for an analytics engine at scale.
# ---------------------------------------------------------------------------
@register(
    "json_props_extract",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
           TRY_CAST(json_extract(props, '$.missing') AS BIGINT) AS missing_value
    FROM events
    """,
    tags="ext json semistructured",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    # try_cast, not cast: a JSON field holding a non-numeric value must
    # yield NULL, not kill the scan (ANSI cast throws CAST_INVALID_INPUT)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("long").alias("k_value"),
        F.get_json_object("props", "$.missing").try_cast("long").alias("missing_value"),
    )


@register(
    "pivot_event_types",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error
    FROM events GROUP BY user_id
    """,
    tags="ext pivot",
)
def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves null for absent combos; the oracle's FILTER gives 0
    return out.na.fill(0, ["click", "view", "purchase", "signup", "error"])


@register(
    "rollup_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags="ext rollup agg",
)
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty")
    )


@register(
    "asof_join_events",
    oracle="""
    WITH quotes AS (SELECT user_id, ts, event_id AS quote_id, value AS quote_value
                    FROM events WHERE event_id % 2 = 0),
    trades AS (SELECT user_id, ts, event_id FROM events WHERE event_id % 2 = 1)
    SELECT t.event_id, t.user_id,
           q.quote_id AS quote_id_asof,
           ROUND(q.quote_value, 2) AS quote_value_asof
    FROM trades t ASOF LEFT JOIN quotes q
      ON t.user_id = q.user_id AND q.ts <= t.ts
    """,
    tags="ext asof join",
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geo_explorer_etl_spark.operators.asof import as_of_join

    ev = load_tables(spark, sf_dir, "events")["events"]
    quotes = ev.filter(F.col("event_id") % 2 == 0).select(
        "user_id", "ts", F.col("event_id").alias("quote_id"), F.col("value").alias("quote_value")
    )
    trades = ev.filter(F.col("event_id") % 2 == 1).select("user_id", "ts", "event_id")
    out = as_of_join(trades, quotes, key="user_id", ts="ts", right_cols=["quote_id", "quote_value"])
    return out.select(
        "event_id",
        "user_id",
        "quote_id_asof",
        F.round(F.col("quote_value_asof"), 2).alias("quote_value_asof"),
    )


@register(
    "range_join_business_hours",
    oracle="""
    WITH iv AS (
        SELECT CAST(d AS DATE) AS day,
               CAST(d AS TIMESTAMP) + INTERVAL 8 HOUR  AS win_start,
               CAST(d AS TIMESTAMP) + INTERVAL 16 HOUR AS win_end
        FROM (SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-03-31',
                                            INTERVAL 1 DAY)) AS d))
    SELECT e.event_id, iv.day
    FROM events e JOIN iv
      ON e.ts >= iv.win_start AND e.ts < iv.win_end
    """,
    tags="ext rangejoin",
)
def range_join_business_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Points-in-interval: events landing inside synthetic business-hour
    windows (08:00–16:00 per day). The oracle is the naive inequality
    join; the Spark side is the bucketized equi-join plan."""
    from geo_explorer_etl_spark.operators.rangejoin import range_join

    ev = load_tables(spark, sf_dir, "events")["events"].select("event_id", "ts")
    days = spark.sql(
        "SELECT explode(sequence(date'2024-01-01', date'2024-03-31', interval 1 day)) AS day"
    )
    intervals = days.select(
        "day",
        (F.col("day").cast("timestamp") + F.expr("interval 8 hours")).alias("win_start"),
        (F.col("day").cast("timestamp") + F.expr("interval 16 hours")).alias("win_end"),
    )
    return range_join(ev, intervals, "ts", "win_start", "win_end", bucket_seconds=3600).select(
        "event_id", "day"
    )


def dedup_substrings_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench row for the exact-substring dedup: the Lee et al. rule at
    the paper's window=50 over the documents table, NORMALIZED output
    — the r14 shape, kept under this name so BENCH_r14 comparisons
    stay apples-to-apples (since r15 the operator's DEFAULT is the
    byte-exact splice, timed separately as dedup_substrings_exact).
    The registered `text_token_count_bpe` entry carries the window=10
    oracle leg; this times the production scale shape."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return DD.dedup_substrings(
        docs, text_col="text", id_col="doc_id", window=50, normalize=True
    )


def dedup_substrings_exact_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench row for the BYTE-EXACT substring splice (r15, VERDICT r14
    next #3 — no pre-r15 baseline): the same rule with losing windows'
    exact char spans removed from the original text. Pays ~2 extra
    passes over the normalized shape (the losers frame materializes
    once; clean docs route column-only, only losers cross the Arrow
    boundary) — the honest production default."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return DD.dedup_substrings(docs, text_col="text", id_col="doc_id", window=50)


def dedup_simhash_pairs_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench row for the WIDE banded-SimHash pairs (r16, VERDICT r15
    next #1 — no pre-r16 baseline): bits=96 two-md5-word signatures
    over the FULL documents table at the default finite bucket cap —
    the production near-dup shape (the registered entry's pairs leg
    times only the doc_id<100 oracle subset)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return DD.simhash_pairs(
        docs, text_col="text", id_col="doc_id", bits=96, max_hamming=3
    )
