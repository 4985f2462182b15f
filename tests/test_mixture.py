"""Domain-mixture corpus sampling (VERDICT r11 next #5): per-domain
token budgets via deterministic largest-remainder rounding, the
two-level budget prefix run per domain, and composition with
ingest_corpus_batch's CAS carry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geo_explorer_etl_spark.operators.corpus import (
    _prefix_under_budget_by_domain,
    build_training_corpus,
    ingest_corpus_batch,
    mixture_budgets,
)
from geo_explorer_etl_spark.sources.store import TableStore


def _docs(spark, rows):
    """rows: (doc_id, domain, n_tokens) -> docs with exactly that many
    BPE tokens: each doc repeats its OWN all-alpha word (one BPE token,
    and distinct per doc so the ingest path's exact/near-dup stages
    are no-ops — these tests isolate the budget math)."""

    def word(i):
        return "x" + "".join(chr(97 + int(c)) for c in str(i))

    return spark.createDataFrame(
        [(i, d, " ".join([word(i)] * n)) for i, d, n in rows],
        "doc_id LONG, source STRING, text STRING",
    ).withColumn("n_chars", F.length("text").cast("long"))


def test_mixture_budgets_largest_remainder_rounding():
    # 0.3/0.65/0.05 of 1000 is exact
    assert mixture_budgets(1000, {"code": 0.3, "web": 0.65, "wiki": 0.05}) == {
        "code": 300, "web": 650, "wiki": 50,
    }
    # 1/3 each of 100: floors to 33+33+33, largest-remainder hands the
    # leftover token to the tie-break winner by NAME (deterministic)
    got = mixture_budgets(100, {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3})
    assert sum(got.values()) == 100  # the thirds sum to 1.0 in IEEE
    assert got == {"a": 34, "b": 33, "c": 33}  # leftover by name tie-break
    # weights that don't sum to 1 admit only their share
    assert mixture_budgets(100, {"a": 0.5}) == {"a": 50}
    # remainder distribution: 0.55/0.45 of 101 -> 55.55/45.45 ->
    # floors 55+45=100, leftover 1 goes to the larger fraction (.55)
    assert mixture_budgets(101, {"a": 0.55, "b": 0.45}) == {"a": 56, "b": 45}
    with pytest.raises(ValueError, match="sum to"):
        mixture_budgets(100, {"a": 0.7, "b": 0.6})
    with pytest.raises(ValueError, match="negative"):
        mixture_budgets(100, {"a": -0.1, "b": 0.5})
    with pytest.raises(ValueError, match="empty"):
        mixture_budgets(100, {})


def test_per_domain_prefix_exact_on_known_corpus(spark):
    """Hand-checkable admission: each domain keeps its own longest
    ascending-id prefix within its own budget; other domains' usage
    never bleeds over; out-of-mixture domains drop entirely."""
    docs = _docs(
        spark,
        [
            (1, "code", 40), (3, "code", 40), (5, "code", 40),   # 40/80/120
            (2, "web", 10), (4, "web", 10), (6, "web", 10),      # 10/20/30
            (7, "junk", 1),                                       # no weight
        ],
    )
    out = _prefix_under_budget_by_domain(
        docs, "text", "doc_id", "source",
        {"code": 80, "web": 25}, bucket_width=2,
    )
    got = {r.doc_id for r in out.collect()}
    # code: 40+40 fits 80, third overflows; web: 10+10 fits 25, third
    # would reach 30 > 25; junk: dropped
    assert got == {1, 3, 2, 4}


def test_mixture_is_deterministic_across_partitionings(spark):
    rows = [(i, ["code", "web", "wiki"][i % 3], 5 + i % 7) for i in range(60)]
    docs = _docs(spark, rows)
    budgets = {"code": 60, "web": 45, "wiki": 30}
    a = {
        r.doc_id
        for r in _prefix_under_budget_by_domain(
            docs, "text", "doc_id", "source", budgets, bucket_width=7
        ).collect()
    }
    b = {
        r.doc_id
        for r in _prefix_under_budget_by_domain(
            docs.repartition(13), "text", "doc_id", "source", budgets, bucket_width=7
        ).collect()
    }
    assert a == b and a


@pytest.mark.slow
def test_build_training_corpus_mixture_gate(spark):
    """End-to-end through the builder: weights × budget admit exactly
    the per-domain prefixes; domain_weights without token_budget is a
    loud error."""
    docs = _docs(
        spark,
        [(1, "code", 40), (3, "code", 40), (2, "web", 10), (4, "web", 10)],
    )
    kept = build_training_corpus(
        docs, languages=("en", "fr", "de", "es"), min_tokens=1,
        near_dup=False,
        token_budget=100, domain_weights={"code": 0.5, "web": 0.15},
        budget_bucket_width=2,
    )
    # code budget 50 -> only doc 1 (40; 80 > 50); web budget 15 -> doc 2
    assert {r.doc_id for r in kept.collect()} == {1, 2}
    with pytest.raises(ValueError, match="needs token_budget"):
        build_training_corpus(docs, domain_weights={"code": 1.0})


@pytest.mark.slow
def test_ingest_mixture_carries_per_domain_budget_across_batches(spark, tmp_path):
    """The CAS carry per domain: batch 1 consumes most of 'code';
    batch 2's code docs admit only against the remainder while 'web'
    still has headroom — and two ingests equal one batch build over
    the concatenation (identical texts => dedup-neutral ids)."""
    store = TableStore(spark, str(tmp_path / "wh"))
    kw = dict(
        languages=("en", "fr", "de", "es"), min_tokens=1,
        token_budget=100, domain_weights={"code": 0.5, "web": 0.5},
        budget_bucket_width=4,
    )
    b1 = _docs(spark, [(1, "code", 30), (2, "web", 10)])
    b2 = _docs(spark, [(11, "code", 30), (12, "web", 10), (13, "code", 30)])
    ingest_corpus_batch(store, b1, **kw)
    rep: dict = {}
    ingest_corpus_batch(store, b2, report=rep, **kw)
    got = {r.doc_id for r in store.read("Corpus").collect()}
    # code budget 50: 30 (doc1) + 30 (doc11) overflows at doc11? no —
    # cumulative 30+30=60 > 50, so doc11 is REJECTED and doc13 too
    # (budget exhausted by the cumsum rule); web: 10+10 fits 50
    assert got == {1, 2, 12}
    assert rep["budget_tokens_consumed"]["code"] == 90  # charged incl. rejected
    assert rep["budget_tokens_consumed"]["web"] == 20

    # equivalence with the one-shot builder over the concatenation
    union = _docs(
        spark,
        [(1, "code", 30), (2, "web", 10), (11, "code", 30),
         (12, "web", 10), (13, "code", 30)],
    )
    oneshot = {
        r.doc_id
        for r in build_training_corpus(union, near_dup=False, **kw).collect()
    }
    assert oneshot == got


@pytest.mark.slow
def test_budget_mode_switch_refused(spark, tmp_path):
    """ADVICE r12 #4: the plain and domain budget modes charge
    DISJOINT counter fields — switching modes on one corpus would
    read zero consumption and overspend; the ingest refuses loudly in
    both directions."""
    store = TableStore(spark, str(tmp_path / "wh"))
    kw = dict(languages=("en", "fr", "de", "es"), min_tokens=1,
              budget_bucket_width=4)
    ingest_corpus_batch(
        store, _docs(spark, [(1, "code", 30)]), token_budget=100, **kw
    )
    with pytest.raises(ValueError, match="'plain' mode.*'domain'"):
        ingest_corpus_batch(
            store, _docs(spark, [(2, "web", 10)]),
            token_budget=100, domain_weights={"code": 0.5, "web": 0.5}, **kw
        )
    store2 = TableStore(spark, str(tmp_path / "wh2"))
    ingest_corpus_batch(
        store2, _docs(spark, [(1, "code", 30)]),
        token_budget=100, domain_weights={"code": 0.5, "web": 0.5}, **kw
    )
    with pytest.raises(ValueError, match="'domain' mode.*'plain'"):
        ingest_corpus_batch(
            store2, _docs(spark, [(2, "web", 10)]), token_budget=100, **kw
        )


def test_split_corpus_deterministic_and_exact(spark):
    """split_corpus (r15): assignment is a pure function of (seed, id)
    — identical across re-partitionings and runs, proportions land
    near the basis-point thresholds, weights must cover 1.0, NULL ids
    get NULL, and the SQL twin produces the identical assignment."""
    import pytest
    from pyspark.sql import functions as F

    from geo_explorer_etl_spark.operators.corpus import split_corpus

    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in split_corpus(docs, w).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in split_corpus(docs.repartition(17), w).collect()
    }
    assert a == b  # partitioning-independent
    from collections import Counter

    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert abs(c["train"] / 2000 - 0.8) < 0.03
    assert abs(c["val"] / 2000 - 0.1) < 0.02
    # (the DuckDB-side twin is pinned by the text_langid oracle leg —
    # verify_local/oracle-parity run the exact CASE against this rule)
    # seed/shape pins: different seed moves SOME docs, same seed none
    a2 = {
        r["doc_id"]: r["split"]
        for r in split_corpus(docs, w, seed=43).collect()
    }
    assert a2 != a and set(a2) == set(a)
    # NULL id -> NULL split
    nulled = spark.createDataFrame([(None,), (1,)], "doc_id LONG")
    got = {r["doc_id"]: r["split"] for r in split_corpus(nulled, w).collect()}
    assert got[None] is None and got[1] in w
    with pytest.raises(ValueError, match="cover exactly 1.0"):
        split_corpus(docs, {"train": 0.5})
    with pytest.raises(ValueError, match="zero of"):
        split_corpus(docs, {"train": 0.99999, "val": 0.00001})


def test_split_corpus_stratified_per_domain(spark):
    """VERDICT r15 next #4: stratify_by salts the hash with the
    stratum value — proportions hold within EVERY domain (cell-grain
    thresholds over each stratum's own uniform hash space), the
    assignment stays a pure function of (seed, stratum, id)
    (partition-invariant, replay-safe), a NULL stratum is its own
    stratum, and the salt is effective (identical id sets in
    different domains split differently)."""
    from collections import Counter

    import duckdb
    from pyspark.sql import functions as F

    from geo_explorer_etl_spark.operators.corpus import (
        split_corpus,
        split_corpus_threshold_sql,
    )

    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    docs = spark.range(6000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("dom"), (F.col("id") % 3).cast("string")).alias("domain"),
    )
    got = split_corpus(docs, w, stratify_by="domain").collect()
    by_dom: dict[str, Counter] = {}
    for r in got:
        by_dom.setdefault(r["domain"], Counter())[r["split"]] += 1
    assert set(by_dom) == {"dom0", "dom1", "dom2"}
    for dom, c in by_dom.items():
        n = sum(c.values())
        assert n == 2000
        assert abs(c["train"] / n - 0.8) < 0.04, (dom, c)
        assert abs(c["val"] / n - 0.1) < 0.03, (dom, c)
        assert abs(c["test"] / n - 0.1) < 0.03, (dom, c)
    # partition invariance
    again = {
        (r["doc_id"], r["domain"]): r["split"]
        for r in split_corpus(
            docs.repartition(13), w, stratify_by="domain"
        ).collect()
    }
    assert again == {(r["doc_id"], r["domain"]): r["split"] for r in got}
    # salt effectiveness: the SAME ids under two domain labels split
    # differently (and differently from the unstratified assignment)
    flat = {
        r["doc_id"]: r["split"] for r in split_corpus(docs, w).collect()
    }
    strat = {r["doc_id"]: r["split"] for r in got}
    assert strat != flat
    two = docs.withColumn("domain", F.lit("other"))
    other = {
        r["doc_id"]: r["split"]
        for r in split_corpus(two, w, stratify_by="domain").collect()
    }
    assert other != strat
    # NULL stratum: its own stratum, rows still assigned
    nulled = spark.createDataFrame(
        [(1, None), (2, "dom0")], "doc_id LONG, domain STRING"
    )
    gotn = {
        r["doc_id"]: r["split"]
        for r in split_corpus(nulled, w, stratify_by="domain").collect()
    }
    assert gotn[1] in w and gotn[2] in w
    # the SQL twin rebuilds the identical stratified assignment
    pdf = docs.toPandas()
    case = split_corpus_threshold_sql(w, "doc_id", 42, stratify_by="domain")
    duck = duckdb.connect()
    duck.register("docs", pdf)
    twin = {
        r[0]: r[1]
        for r in duck.sql(f"SELECT doc_id, {case} FROM docs").fetchall()
    }
    assert twin == strat


def test_split_threshold_sql_validates_interpolated_names():
    """ADVICE r15: split names and id_col interpolate into the oracle
    CASE text — non-word names refuse loudly instead of emitting
    broken (or injectable) SQL."""
    import pytest

    from geo_explorer_etl_spark.operators.corpus import (
        split_corpus_threshold_sql,
    )

    ok = split_corpus_threshold_sql({"train": 0.9, "val": 0.1})
    assert "WHEN" in ok and "'train'" in ok
    with pytest.raises(ValueError, match="not a bare word"):
        split_corpus_threshold_sql({"tr'ain": 0.9, "val": 0.1})
    with pytest.raises(ValueError, match="not a bare identifier"):
        split_corpus_threshold_sql(
            {"train": 0.9, "val": 0.1}, id_col="doc_id; DROP"
        )
