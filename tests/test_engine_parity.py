"""Cross-engine parity on ADVERSARIAL text (r14, the red-cell guard):
the registered ``dedup_exact`` query and its DuckDB oracle must agree
on a corpus built to probe every known engine-divergence edge —
vertical tab (Java ``\\s`` matches it, RE2's does not — the WS_RE
fix), CRLF, NBSP/thin-space, ZWJ emoji and astral-plane codepoints
(length/md5 counting), empty/None text, only-whitespace, trailing
newlines, and exact/line/window duplicates spanning those shapes. The
driver's correctness gate runs on REGENERATED data each round; this
test keeps the gate green for text the current testdata happens not
to contain."""

from __future__ import annotations

import duckdb
import pytest

from tools.verify_local import compare


def _adversarial_rows():
    run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    boiler = "a shared boilerplate line long enough to be dedup eligible"
    return [
        (1, f"{boiler}\nplain first document body here"),
        (2, f"{boiler}\nsecond document shares the boilerplate line"),
        (3, f"vertical\x0btab {run} inside this document"),
        (4, f"also a vertical\x0btab {run} later occurrence"),
        (5, "windows line endings\r\nsecond line here\r\nthird"),
        (6, "nbsp joined and thin space tokens stay whole"),
        (7, "emoji \U0001F469‍\U0001F469‍\U0001F467 and astral \U0001D11E clef"),
        (8, "emoji \U0001F469‍\U0001F469‍\U0001F467 and astral \U0001D11E clef"),  # exact dup of 7
        (9, ""),
        (10, None),
        (11, "   \t  "),
        (12, f"{run} {run}"),  # within-doc window repeat
        (13, "trailing newlines\n\n\n"),
        (14, f"{boiler}\n{boiler}\nsame line twice plus a unique tail"),
    ]


@pytest.fixture(scope="module")
def adversarial_sf(spark, tmp_path_factory):
    """A minimal sf-dir: just documents.parquet (the only table the
    dedup-leg entries read). ``source`` cycles the mixture recipe's
    domains so text_token_count_bpe's mix leg is non-vacuous."""
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("adversarial_sf")
    spark.createDataFrame(
        _adversarial_rows(), "doc_id LONG, text STRING"
    ).withColumn(
        "source", F.concat(F.lit("src"), (F.col("doc_id") % 3).cast("string"))
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


#: the five entries carrying the dedup legs since the r15 split
#: (VERDICT r14 next #1): entry -> its dedup leg tag
_LEG_ENTRIES = {
    "dedup_exact": "doc",
    "dedup_ngram_jaccard": "line",
    "dedup_minhash_lsh": "line_inc",
    "dedup_simhash": "line_doc",
    "text_token_count_bpe": "substr",
}


@pytest.mark.parametrize("entry_name", sorted(_LEG_ENTRIES))
@pytest.mark.slow
def test_dedup_leg_entries_hash_green_on_adversarial_text(
    spark, adversarial_sf, entry_name
):
    import __spark_entry__ as entry

    fn = entry.queries()[entry_name]
    sql = entry.oracle_sql()[entry_name]
    spark_pdf = fn(spark, adversarial_sf).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{adversarial_sf}/documents.parquet/*.parquet')"
    )
    duck_pdf = con.sql(sql).df()
    problems = compare(f"{entry_name}[adversarial]", spark_pdf, duck_pdf)
    assert not problems, problems
    # the probe was non-vacuous: the carried dedup leg fired
    leg = _LEG_ENTRIES[entry_name]
    if leg == "doc":
        assert spark_pdf["n_copies"].sum() > len(_adversarial_rows()) - 2
    else:
        picked = spark_pdf[spark_pdf["leg"] == leg]
        assert len(picked) > 0
        # doc 14 repeats a line within itself, doc 12 a window — every
        # leg's dup rule fires on this corpus
        assert picked["n_copies"].sum() > 0


def test_quality_scores_hash_green_on_adversarial_text(spark, adversarial_sf):
    """The \\s+-tokenized legs (token counts, shingles, repetition
    signals) agree on the same corpus — the WS_RE vertical-tab fix is
    what keeps doc 3/4 green here."""
    import pandas as pd

    import __spark_entry__ as entry

    fn = entry.queries()["text_quality_scores"]
    sql = entry.oracle_sql()["text_quality_scores"]
    docs = pd.DataFrame(_adversarial_rows(), columns=["doc_id", "text"])
    docs["n_chars"] = docs["text"].str.len()
    df = spark.createDataFrame(docs.where(pd.notna(docs), None))
    import tempfile

    d = tempfile.mkdtemp(prefix="adv_q_")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    spark_pdf = fn(spark, d).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    duck_pdf = con.sql(sql).df()
    problems = compare("text_quality_scores[adversarial]", spark_pdf, duck_pdf)
    assert not problems, problems


def test_dual_side_leg_digests_artifact(spark):
    """The r15 digest artifact (VERDICT r14 next #1c): building a leg
    entry appends one jsonl record carrying BOTH sides — the Spark
    frame's per-leg canonical digests and the registered oracle run
    through the local DuckDB — and on healthy data the two sides are
    byte-equal, so a future red round localizes to the side that
    moved."""
    import json
    import os

    import __spark_entry__ as entry
    from tests.conftest import SF_SMOKE

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    path = os.path.join(wh, "_diag", "dedup_exact_digests.jsonl")
    n0 = sum(1 for _ in open(path)) if os.path.exists(path) else 0
    entry.queries()["dedup_exact"](spark, SF_SMOKE).count()
    with open(path) as f:
        lines = f.read().splitlines()
    assert len(lines) == n0 + 1
    rec = json.loads(lines[-1])
    assert set(rec) >= {"ts", "spark", "duck"}
    assert rec["spark"].keys() == rec["duck"].keys() == {"doc"}
    assert rec["spark"]["doc"] == rec["duck"]["doc"]
    assert rec["spark"]["doc"]["n"] > 0


def test_digest_artifact_rotates_at_cap(tmp_path):
    """VERDICT r15 next #6: the _diag jsonl artifacts are capped —
    appending beyond DIGEST_LOG_MAX_LINES keeps only the newest
    lines, atomically, instead of accreting bytes per build forever."""
    from geo_explorer_etl_spark.plans.catalog_ext import _append_rotating

    p = str(tmp_path / "x_digests.jsonl")
    # under 2x the cap: plain atomic appends, nothing lost
    for i in range(10):
        _append_rotating(p, f"line{i}", max_lines=5)
    assert open(p).read().splitlines() == [f"line{i}" for i in range(10)]
    # crossing 2x the cap triggers ONE rewrite down to the newest cap
    _append_rotating(p, "line10", max_lines=5)
    assert open(p).read().splitlines() == [f"line{i}" for i in range(6, 11)]
    # and appends keep accumulating from there
    _append_rotating(p, "line11", max_lines=5)
    assert open(p).read().splitlines() == [f"line{i}" for i in range(6, 12)]


def test_duck_digest_side_gated_by_size_and_env(tmp_path, monkeypatch):
    """ADVICE r15: the in-process DuckDB oracle re-run is gated — a
    corpus above DUCK_DIGEST_MAX_BYTES skips the duck side (Spark
    digest still logs), and SPARK_GRAFT_DIGEST_DUCK forces either
    way."""
    from geo_explorer_etl_spark.plans import catalog_ext as CE
    from tests.conftest import SF_SMOKE

    assert CE._duck_digest_enabled(SF_SMOKE)  # test SFs are tiny
    monkeypatch.setattr(CE, "DUCK_DIGEST_MAX_BYTES", 10)
    assert not CE._duck_digest_enabled(SF_SMOKE)
    assert CE._duck_leg_digests("dedup_exact", [], False, SF_SMOKE) is None
    monkeypatch.setenv("SPARK_GRAFT_DIGEST_DUCK", "1")
    assert CE._duck_digest_enabled(SF_SMOKE)
    monkeypatch.setenv("SPARK_GRAFT_DIGEST_DUCK", "0")
    monkeypatch.setattr(CE, "DUCK_DIGEST_MAX_BYTES", 1 << 30)
    assert not CE._duck_digest_enabled(SF_SMOKE)


@pytest.fixture(scope="module")
def fuzz_sf(spark, tmp_path_factory):
    """A seeded RANDOMIZED corpus (deterministic — no flake): random
    words over a small vocab (guaranteed collisions), random
    whitespace drawn from every class the engines could disagree on
    (space runs, tab, LF, CRLF, vertical tab, NBSP, thin space),
    planted duplicate lines and token windows, empty/None/ws-only
    docs. The driver's gate runs on regenerated data each round; the
    hand-built adversarial corpus probes KNOWN edges — this samples
    the space between them."""
    import random

    from pyspark.sql import functions as F

    # seed rotates each round (VERDICT r15 next #7): r15=1509, r16=1609
    rng = random.Random(1609)
    vocab = [f"w{i}" for i in range(40)] + ["the", "and", "of", "a"]
    seps = [" ", "  ", "   ", "\t", "\n", "\r\n", "\x0b", " ", " "]

    def doc():
        n = rng.randint(0, 60)
        out = []
        for i in range(n):
            out.append(rng.choice(vocab))
            if i < n - 1:
                out.append(rng.choice(seps))
        return "".join(out)

    rows = []
    for i in range(70):
        rows.append((i, doc()))
    # planted cross-doc duplicates: exact, shared line, shared window
    rows.append((100, rows[3][1]))
    shared_line = "this exact shared line is long enough to dedup"
    rows.append((101, f"{shared_line}\n{rows[5][1]}"))
    rows.append((102, f"prefix text\n{shared_line}\ntail"))
    run = " ".join(rng.choice(vocab) for _ in range(12))
    rows.append((103, f"{run} unique tail one"))
    rows.append((104, f"other head {run}"))
    rows += [(110, ""), (111, None), (112, " \t "), (113, "\x0b")]
    d = tmp_path_factory.mktemp("fuzz_sf")
    spark.createDataFrame(rows, "doc_id LONG, text STRING").withColumn(
        "source", F.concat(F.lit("src"), (F.col("doc_id") % 3).cast("string"))
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("entry_name", sorted(_LEG_ENTRIES))
@pytest.mark.slow
def test_dedup_leg_entries_hash_green_on_fuzz_corpus(
    spark, fuzz_sf, entry_name
):
    import __spark_entry__ as entry

    fn = entry.queries()[entry_name]
    sql = entry.oracle_sql()[entry_name]
    spark_pdf = fn(spark, fuzz_sf).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{fuzz_sf}/documents.parquet/*.parquet')"
    )
    duck_pdf = con.sql(sql).df()
    problems = compare(f"{entry_name}[fuzz]", spark_pdf, duck_pdf)
    assert not problems, problems


def test_split_legs_hash_green_on_fuzz_corpus(spark, fuzz_sf):
    """The text_langid entry's split + split_strat legs (r16): the
    deterministic and STRATIFIED assignments rebuild identically in
    DuckDB over the randomized corpus — a drifted salt construction
    (seed:source:id) or threshold rounding breaks this before the
    driver sees it."""
    import __spark_entry__ as entry

    fn = entry.queries()["text_langid"]
    sql = entry.oracle_sql()["text_langid"]
    spark_pdf = fn(spark, fuzz_sf).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{fuzz_sf}/documents.parquet/*.parquet')"
    )
    duck_pdf = con.sql(sql).df()
    problems = compare("text_langid[fuzz]", spark_pdf, duck_pdf)
    assert not problems, problems
    s = spark_pdf[spark_pdf["leg"] == "split"]
    assert len(s) > 0 and s["split"].notna().all()
    assert s["split_strat"].notna().all()
    # the stratified assignment actually differs from the flat one
    # somewhere on this corpus (the salt is live)
    assert (s["split"] != s["split_strat"]).any()
