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
    dedup_exact entry reads)."""
    d = tmp_path_factory.mktemp("adversarial_sf")
    spark.createDataFrame(
        _adversarial_rows(), "doc_id LONG, text STRING"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_dedup_exact_hash_green_on_adversarial_text(spark, adversarial_sf):
    import __spark_entry__ as entry

    fn = entry.queries()["dedup_exact"]
    sql = entry.oracle_sql()["dedup_exact"]
    spark_pdf = fn(spark, adversarial_sf).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{adversarial_sf}/documents.parquet/*.parquet')"
    )
    duck_pdf = con.sql(sql).df()
    problems = compare("dedup_exact[adversarial]", spark_pdf, duck_pdf)
    assert not problems, problems
    # the probes were non-vacuous: dups fired on every shape
    legs = spark_pdf.groupby("leg")["n_copies"].sum()
    assert legs["doc"] > len(_adversarial_rows()) - 2  # rows minus the dup
    assert legs["line"] > 0 and legs["substr"] > 0


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
