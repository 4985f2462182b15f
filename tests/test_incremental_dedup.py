"""Incremental corpus dedup (operators/incremental_dedup.py) — VERDICT
r10 directive #3: batch-then-batch equals all-at-once dedup on the
union, and the incremental path probes the persisted index through
zone-map-pruned file reads, never a full signature-table scan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from geo_explorer_etl_spark.operators import dedup as DD
from geo_explorer_etl_spark.operators.incremental_dedup import (
    BAND_TABLE,
    EXACT_TABLE,
    INDEX_PID,
    incremental_dedup,
)
from geo_explorer_etl_spark.sources.store import TableStore


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _corpus_rows():
    """Three batches with monotone ids: exact dups, near-dups (small
    edits of shared templates), cross-batch near-dup chains, and
    unique docs."""
    t1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    t2 = "an entirely different document about spark partitioning and shuffle costs"
    t3 = "completely unrelated text mentioning parquet footers and zone map stats"
    b1 = [
        (1, t1),
        (2, t1 + " extra"),        # near-dup of 1
        (3, t2),
        (4, t2),                   # exact dup of 3
        (5, t3),
    ]
    b2 = [
        (11, t1),                  # exact dup of 1 (cross-batch)
        (12, t1 + " extra words"), # near-dup chain into 1/2
        (13, "fresh unique content about watermarks and stateful streaming ops"),
        (14, t3 + " slightly"),    # near-dup of 5
        (15, "fresh unique content about watermarks and stateful streaming ops"),
        # 15 = exact dup of 13 WITHIN the batch
    ]
    b3 = [
        (21, t2 + " tail"),        # near-dup of 3
        (22, "one more genuinely novel document with nothing shared at all here"),
        (23, t1),                  # exact dup again
    ]
    return b1, b2, b3


def _all_at_once_keep(spark, rows, n=3, num_hashes=16, bands=4):
    """The batch pipeline's semantics over the full union: exact dedup
    (min id per content group), LSH candidates over survivors,
    components, min-id representative."""
    docs = _docs(spark, rows)
    exact = DD.exact_dedup_groups(docs, "text", "doc_id")
    survivors = docs.join(
        exact.select(F.col("canonical_doc_id").alias("doc_id")).distinct(),
        "doc_id",
        "left_semi",
    )
    pairs = DD.minhash_lsh_candidates(
        survivors, "text", "doc_id", n=n, num_hashes=num_hashes, bands=bands
    )
    comp = DD.connected_components(pairs, "doc_a", "doc_b")
    labeled = survivors.join(
        comp, survivors.doc_id == comp.node, "left"
    )
    kept = labeled.filter(
        F.col("component").isNull() | (F.col("component") == F.col("doc_id"))
    )
    return sorted(r.doc_id for r in kept.select("doc_id").collect())


@pytest.mark.slow
def test_batch_then_batch_equals_all_at_once(spark, tmp_path):
    b1, b2, b3 = _corpus_rows()
    store = TableStore(spark, str(tmp_path / "wh"))
    kept_ids = []
    for b in (b1, b2, b3):
        kept = incremental_dedup(store, _docs(spark, b))
        kept_ids += [r.doc_id for r in kept.select("doc_id").collect()]
    expected = _all_at_once_keep(spark, b1 + b2 + b3)
    assert sorted(kept_ids) == expected
    # sanity on the shape: exact dup 4, cross-batch dup 11/23, in-batch
    # dup 15, and the near-dup family members are gone
    assert 1 in kept_ids and 3 in kept_ids and 5 in kept_ids
    assert 4 not in kept_ids and 11 not in kept_ids and 23 not in kept_ids
    assert 15 not in kept_ids and 13 in kept_ids
    assert 22 in kept_ids


@pytest.mark.slow
def test_index_probe_is_zone_map_pruned(spark, tmp_path):
    """The file-skip pin: after several batches the band-index probe
    for one batch's keys must open FEWER files than the table holds
    (each batch appends range-clustered files, so a key probe touches
    only the files covering its ranges)."""
    store = TableStore(spark, str(tmp_path / "wh"))
    rows = [
        (i, f"document number {i} with shared filler words plus token {i % 7} "
            f"and some more body text {i * 13}")
        for i in range(60)
    ]
    for lo in range(0, 60, 20):
        incremental_dedup(store, _docs(spark, rows[lo : lo + 20]))
    all_files = store.live_files(BAND_TABLE)
    assert len(all_files) >= 3  # one clustered file set per batch
    # probe with a key set that provably misses most ranges: a single
    # synthetic band hash smaller than every real one
    probed = store.live_files(BAND_TABLE, where=[("band_hash", "in", ["0,0,0,0"])])
    assert len(probed) < len(all_files)
    # and the exact index prunes on content_hash the same way
    all_exact = store.live_files(EXACT_TABLE)
    probed_exact = store.live_files(
        EXACT_TABLE, where=[("content_hash", "in", ["00000000"])]
    )
    assert len(probed_exact) < len(all_exact)


@pytest.mark.slow
def test_report_and_empty_and_first_batch(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh"))
    rep: dict = {}
    kept = incremental_dedup(store, _docs(spark, [(1, "alpha beta gamma delta")]), report=rep)
    assert rep["batch_rows"] == 1 and rep["kept_rows"] == 1
    assert kept.count() == 1
    rep2: dict = {}
    kept2 = incremental_dedup(
        store, _docs(spark, [(2, "alpha beta gamma delta")]), report=rep2
    )
    assert rep2["kept_rows"] == 0 and kept2.count() == 0
    assert rep2[f"{EXACT_TABLE}_probe"] == "pruned"
    # index tables live in the reserved partition under manifest control
    assert store._manifest(
        __import__("pathlib").Path(store.root) / EXACT_TABLE / f"IndicatorThemeId={INDEX_PID}"
    )


@pytest.mark.slow
def test_transitive_drop_through_a_dropped_near_dup(spark, tmp_path):
    """The index must hold ALL exact-survivors, kept AND dropped: a
    batch-2 doc whose only corpus contact is a batch-1 near-dup that
    was itself DROPPED still belongs to the corpus cluster and must
    drop (all-at-once components see that path). Texts pinned so the
    real banding yields exactly the edges (A,B) and (B,C) — verified
    against minhash_lsh_candidates below, so the pin cannot rot
    silently."""
    words = [f"w{i}" for i in range(24)]
    xt = [f"x{i}" for i in range(4)]
    A = " ".join(words)
    B = " ".join(words + xt)          # near-dup of A -> dropped
    C = " ".join(words[6:] + xt)      # near-dup of B, NOT of A
    pairs = sorted(
        tuple(r)
        for r in DD.minhash_lsh_candidates(
            _docs(spark, [(1, A), (2, B), (3, C)]), "text", "doc_id"
        ).collect()
    )
    assert pairs == [(1, 2), (2, 3)], "banding moved — re-pin the texts"

    store = TableStore(spark, str(tmp_path / "wh"))
    kept1 = incremental_dedup(store, _docs(spark, [(1, A), (2, B)]))
    assert sorted(r.doc_id for r in kept1.select("doc_id").collect()) == [1]
    kept2 = incremental_dedup(store, _docs(spark, [(11, C)]))
    assert kept2.count() == 0  # C drops THROUGH the dropped B
    # and the all-at-once union agrees
    assert _all_at_once_keep(spark, [(1, A), (2, B), (11, C)]) == [1]


def test_null_text_dedupes_across_batches(spark, tmp_path):
    """NULL text must dedupe like any exact group (review r11): SQL
    equality never matches NULL = NULL, so without the sentinel hash
    one null-text doc per batch survived while all-at-once keeps one."""
    store = TableStore(spark, str(tmp_path / "wh"))
    b1 = spark.createDataFrame([(1, None), (2, "real text here")], "doc_id LONG, text STRING")
    b2 = spark.createDataFrame([(11, None), (12, None)], "doc_id LONG, text STRING")
    k1 = sorted(r.doc_id for r in incremental_dedup(store, b1).select("doc_id").collect())
    k2 = sorted(r.doc_id for r in incremental_dedup(store, b2).select("doc_id").collect())
    assert k1 == [1, 2]
    assert k2 == []  # both null-text docs match batch 1's null doc


def _ingest_docs(spark, rows):
    # the documents-table shape: quality_scores reads n_chars
    return spark.createDataFrame(
        [(i, t, len(t)) for i, t in rows],
        "doc_id LONG, text STRING, n_chars LONG",
    )


@pytest.mark.slow
def test_ingest_corpus_batch_equals_build_training_corpus(spark, tmp_path):
    """The end-to-end incremental pipeline: N gated+deduped+budgeted
    ingests equal ONE build_training_corpus over the concatenation
    (monotone ids) — including the cross-batch token-budget prefix
    carried through the CAS running total."""
    from geo_explorer_etl_spark.operators.corpus import (
        build_training_corpus,
        ingest_corpus_batch,
    )

    t1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    t2 = "an entirely different document about spark partitioning and shuffle costs"
    rows = [
        (1, t1),
        (2, t1 + " extra"),                   # near-dup of 1
        (3, t2),
        (4, t2),                              # exact dup of 3
        (5, "zz"),                            # fails min_tokens gate
        (11, t1),                             # cross-batch exact dup
        (12, "a fresh and rather long document about watermark semantics in the engine"),
        (13, "another genuinely novel text that should consume the remaining budget here"),
        (21, "late arrival that must be rejected by the exhausted token budget rule"),
    ]
    batches = [rows[:5], rows[5:8], rows[8:]]
    budget = 40  # tokens: enough for 1, 3, 12 — 13 crosses the line
    store = TableStore(spark, str(tmp_path / "wh"))
    accepted = []
    for b in batches:
        kept = ingest_corpus_batch(
            store,
            _ingest_docs(spark, b),
            min_tokens=5,
            token_budget=budget,
        )
        accepted += [r.doc_id for r in kept.select("doc_id").collect()]
    expected = sorted(
        r.doc_id
        for r in build_training_corpus(
            _ingest_docs(spark, rows),
            min_tokens=5,
            token_budget=budget,
        ).select("doc_id").collect()
    )
    assert sorted(accepted) == expected
    # the corpus TABLE holds exactly the accepted union, readable back
    corpus = store.read("Corpus")
    assert sorted(r.doc_id for r in corpus.select("doc_id").collect()) == expected
    # and it is a real manifest-bearing store table (DML-ready)
    assert store.describe("Corpus")["rows"] == len(expected)


@pytest.mark.slow
def test_budget_counts_rejected_tokens_like_the_global_prefix(spark, tmp_path):
    """Review r11: the cross-batch carry must count ALL dedup-survivor
    tokens, accepted or rejected — the global prefix's cumulative sum
    does, so once a doc overflows the budget is exhausted permanently.
    A later small doc must NOT slip in through the leftover gap."""
    from geo_explorer_etl_spark.operators.corpus import (
        build_training_corpus,
        ingest_corpus_batch,
    )

    big = "word " * 37 + "tail"          # 38 tokens
    over = "other words " * 5            # 10 tokens -> cum 48 > 40
    tiny = "just two more little ones"   # 5 tokens, would fit the gap
    rows = [(1, big), (2, over), (11, tiny)]
    store = TableStore(spark, str(tmp_path / "wh"))
    accepted = []
    for b in (rows[:2], rows[2:]):
        kept = ingest_corpus_batch(
            store, _ingest_docs(spark, b), min_tokens=3, token_budget=40
        )
        accepted += [r.doc_id for r in kept.select("doc_id").collect()]
    expected = sorted(
        r.doc_id
        for r in build_training_corpus(
            _ingest_docs(spark, rows), min_tokens=3, token_budget=40
        ).select("doc_id").collect()
    )
    assert sorted(accepted) == expected == [1]  # 2 overflows, 11 stays out


@pytest.mark.slow
def test_ingest_retry_after_partial_run_converges(spark, tmp_path):
    """Review r11 crash ordering: a run that died AFTER the corpus
    append but BEFORE the index persist must converge when the same
    batch is re-ingested — no duplicate corpus rows, no double budget
    charge, indexes completed."""
    from geo_explorer_etl_spark.operators.corpus import (
        _apply_gates,
        _budget_admit,
        ingest_corpus_batch,
    )
    from geo_explorer_etl_spark.operators.incremental_dedup import dedup_decide
    from geo_explorer_etl_spark.sources.store import PARTITION_COL

    rows = [(1, "a genuinely long document about engines " * 2),
            (2, "a second long document concerning shuffles " * 2)]
    batch = _ingest_docs(spark, rows)
    store = TableStore(spark, str(tmp_path / "wh"))
    # --- simulate the crashed run: gates -> decide -> budget -> corpus
    # append, then DIE before dedup_persist
    gated = _apply_gates(batch, "text", "doc_id", ("en",), 3, 100_000, 0.0, 0.0)
    kept, _sh, _bn, rep = dedup_decide(store, gated, "text", "doc_id")
    kept = _budget_admit(store, "Corpus", kept, "text", "doc_id", 1000, 100_000, rep)
    store.append(
        "Corpus", kept.withColumn(PARTITION_COL, F.lit(0).cast("long"))
    )
    store.adopt_manifests("Corpus")
    charged = store._backend.read(
        __import__("pathlib").Path(store.root), "_corpus_budget_Corpus.json"
    )[1]["tokens"]
    # --- the retry: full ingest of the SAME batch
    rep2: dict = {}
    ingest_corpus_batch(
        store, batch, min_tokens=3, token_budget=1000, report=rep2
    )
    # converged: corpus holds each doc once, budget charged once
    corpus = store.read("Corpus")
    assert sorted(r.doc_id for r in corpus.select("doc_id").collect()) == [1, 2]
    body = store._backend.read(
        __import__("pathlib").Path(store.root), "_corpus_budget_Corpus.json"
    )[1]
    assert body["tokens"] == charged  # no double charge
    assert rep2["budget_tokens_consumed"] == charged
    # indexes completed: a re-ingest of a copy now dedups against them
    rep3: dict = {}
    kept3 = ingest_corpus_batch(
        store,
        _ingest_docs(spark, [(21, rows[0][1])]),
        min_tokens=3,
        token_budget=1000,
        report=rep3,
    )
    assert kept3.count() == 0


@pytest.mark.slow
def test_ingest_corpus_batch_ann_wiring(spark, tmp_path):
    """VERDICT r12 next #3 wiring: ingest with ``ann_batch`` indexes
    ONLY the accepted docs' embeddings (gated/deduped docs never reach
    the index) and ``ann_policy`` runs the drift check in the same
    call; the report carries the ann leg."""
    from geo_explorer_etl_spark.operators.ann_index import (
        INDEX_TABLE,
        build_ann_index,
    )
    from geo_explorer_etl_spark.operators.corpus import ingest_corpus_batch

    store = TableStore(spark, str(tmp_path / "wh"))

    def embs(ids):
        return spark.createDataFrame(
            [
                (i, "d", [float((i * 7 + j) % 5) + 0.1 for j in range(4)])
                for i in ids
            ],
            "doc_id LONG, label STRING, embedding ARRAY<DOUBLE>",
        )

    # seed index (frozen geometry for the appends)
    build_ann_index(store, embs(range(100, 110)), n_centroids=2,
                    id_col="doc_id", n_files=1)
    base = store.read(INDEX_TABLE).count()
    t = "a genuinely long document about spark shuffle and partition semantics"
    rows = [
        (1, t),
        (2, t),          # exact dup of 1 -> rejected
        (3, "zz"),       # fails the min_tokens gate
        (4, t + " with an extra disambiguating tail of several more words"),
    ]
    rep: dict = {}
    kept = ingest_corpus_batch(
        store,
        _ingest_docs(spark, rows),
        min_tokens=5,
        report=rep,
        ann_batch=embs([1, 2, 3, 4]),
        ann_policy={"skew_threshold": 99.0, "id_col": "doc_id"},
    )
    accepted = {r.doc_id for r in kept.select("doc_id").collect()}
    assert accepted == {1, 4}
    got = store.read(INDEX_TABLE).count()
    assert got == base + 2  # only the accepted docs' vectors
    assert rep["ann"]["batch_rows"] == 2
    assert rep["ann"]["rebuilt"] is False  # healthy threshold: no-op


# -- line-level incremental dedup -------------------------------------------


def _line_corpus():
    dup_a = "this exact sentence repeats across many documents here"
    dup_b = "another long boilerplate footer line that sites share"
    b1 = [
        (1, f"{dup_a}\nunique one first\n--"),
        (2, f"prefix two\n{dup_a}\n{dup_b}"),
        (3, "standalone three with its own content line"),
    ]
    b2 = [
        (11, f"{dup_a}\nnovel line in batch two only"),     # dup vs batch 1
        (12, f"{dup_b}\n{dup_b}\nshort"),                   # cross+within dup
        (13, "fresh thirteen content never seen before"),
    ]
    return b1, b2


def test_incremental_lines_batch_then_batch_equals_all_at_once(spark, tmp_path):
    from geo_explorer_etl_spark.operators.incremental_dedup import (
        incremental_dedup_lines,
    )

    b1, b2 = _line_corpus()
    store = TableStore(spark, str(tmp_path / "wh"))
    rep1, rep2 = {}, {}
    out1 = incremental_dedup_lines(store, _docs(spark, b1), report=rep1)
    out2 = incremental_dedup_lines(store, _docs(spark, b2), report=rep2)
    got = {
        r["doc_id"]: (r["clean_text"], r["lines_removed"], r["chars_removed"])
        for r in out1.collect() + out2.collect()
    }
    exp = {
        r["doc_id"]: (r["clean_text"], r["lines_removed"], r["chars_removed"])
        for r in DD.dedup_lines(_docs(spark, b1 + b2)).collect()
    }
    assert got == exp
    # second batch probed the pruned index and indexed only its novel lines
    assert rep2["DedupLineIndex_probe"] == "pruned"
    assert rep1["new_index_rows"] > 0 and rep2["new_index_rows"] > 0


def test_incremental_lines_first_copy_of_seen_line_removed(spark, tmp_path):
    """A batch-2 document whose FIRST line is a batch-1 line loses it
    (the index wins over the batch-first rule), while short lines
    always survive."""
    from geo_explorer_etl_spark.operators.incremental_dedup import (
        incremental_dedup_lines,
    )

    b1, b2 = _line_corpus()
    store = TableStore(spark, str(tmp_path / "wh"))
    incremental_dedup_lines(store, _docs(spark, b1))
    out2 = {r["doc_id"]: r for r in
            incremental_dedup_lines(store, _docs(spark, b2)).collect()}
    assert out2[11]["clean_text"] == "novel line in batch two only"
    assert out2[11]["lines_removed"] == 1
    # doc 12: both dup_b copies removed (cross-batch), 'short' kept
    assert out2[12]["clean_text"] == "short"
    assert out2[12]["lines_removed"] == 2


def test_incremental_lines_index_is_clustered_and_probe_prunes(spark, tmp_path):
    """The line index's second-batch probe opens fewer files than the
    full index holds (range-clustered append + zone-map pruning)."""
    from geo_explorer_etl_spark.operators.incremental_dedup import (
        LINE_TABLE,
        incremental_dedup_lines,
    )

    store = TableStore(spark, str(tmp_path / "wh"))
    rows = [
        (i, "\n".join(f"unique line {i} number {j} with enough length"
                      for j in range(4)))
        for i in range(1, 41)
    ]
    incremental_dedup_lines(store, _docs(spark, rows))
    total_files = len(store.read(LINE_TABLE).inputFiles())
    probe = {}
    incremental_dedup_lines(
        store, _docs(spark, [(100, "unique line 1 number 0 with enough length")]),
        report=probe,
    )
    pruned = store.read(
        LINE_TABLE,
        where=[("line_hash", "in",
                [__import__("hashlib").md5(
                    b"unique line 1 number 0 with enough length").hexdigest()])],
        prune_only=True,
    )
    assert probe["DedupLineIndex_probe"] == "pruned"
    if total_files > 1:
        assert len(pruned.inputFiles()) < total_files


def test_incremental_lines_overcap_joins_bucketed_mirror_without_index_exchange(
    spark, tmp_path, monkeypatch
):
    """Beyond LINE_PROBE_CAP the decide path must join the BUCKETED
    mirror, not re-shuffle the ever-growing index per batch (VERDICT
    r13 next #2): the recorded join plan shows the mirror's bucketed
    scan with ZERO Exchange on the index side — only the batch's
    winners move — and the over-cap result still equals the
    all-at-once rule."""
    from geo_explorer_etl_spark.operators import incremental_dedup as ID

    b1, b2 = _line_corpus()
    store = TableStore(spark, str(tmp_path / "wh"))
    ID.incremental_dedup_lines(store, _docs(spark, b1))
    monkeypatch.setattr(ID, "LINE_PROBE_CAP", 0)  # force the over-cap branch
    monkeypatch.setattr(ID, "CAPTURE_PLANS", True)  # opt-in plan capture
    rep = {}
    # at test scale AQE would broadcast the tiny mirror (a
    # BroadcastExchange OF the index side) — the 100 TB index can't
    # broadcast, so pin the plan that exists at scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out2 = ID.incremental_dedup_lines(store, _docs(spark, b2), report=rep)
        got = {r["doc_id"]: (r["clean_text"], r["lines_removed"]) for r in out2.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert rep["DedupLineIndex_probe"] == "bucketed_mirror"
    plan = rep["_mirror_join_plan"]
    assert "Bucketed: true" in plan, plan
    # walk the mirror scan's ancestor chain up to the join: NO Exchange
    # may sit between them (the index side never shuffles); the batch
    # side is free to shuffle into the mirror's bucketing
    import re

    def _marker(l):  # tree-node marker column ("+- " or ":- ")
        m = re.search(r"[+:]- ", l)
        return m.start() if m else None

    tree = [(pos, l) for l in plan.splitlines() if (pos := _marker(l)) is not None]
    scan_i = next(
        i for i, (_, l) in enumerate(tree)
        if "Scan parquet" in l and "dedup_mirror_" in l
    )
    depth = tree[scan_i][0]
    found_join = False
    for i in range(scan_i - 1, -1, -1):
        d, line = tree[i]
        if d < depth:  # a strict ancestor of the scan
            depth = d
            assert "Exchange" not in line, plan
            if "Join" in line:
                found_join = True
                break
    assert found_join, f"no join above the mirror scan:\n{plan}"
    assert got[11] == ("novel line in batch two only", 1)
    assert got[12] == ("short", 2)


def test_incremental_lines_stale_mirror_falls_back_to_full_scan(
    spark, tmp_path, monkeypatch
):
    """A mirror that missed an append (crash between the clustered and
    bucketed writes, simulated by corrupting the sync marker) is
    DETECTED — the decide path reports staleness, falls back to the
    plain store read, and the result is unchanged."""
    import json

    from geo_explorer_etl_spark.operators import incremental_dedup as ID

    b1, b2 = _line_corpus()
    store = TableStore(spark, str(tmp_path / "wh"))
    ID.incremental_dedup_lines(store, _docs(spark, b1))
    marker = ID._mirror_marker(store)
    with open(marker) as f:
        rows = json.load(f)["rows"]
    with open(marker, "w") as f:
        json.dump({"rows": rows - 1}, f)
    monkeypatch.setattr(ID, "LINE_PROBE_CAP", 0)
    rep = {}
    out2 = ID.incremental_dedup_lines(store, _docs(spark, b2), report=rep)
    assert rep["DedupLineIndex_probe"] == "full_scan"
    assert "stale" in rep["DedupLineIndex_mirror"]
    got = {r["doc_id"]: (r["clean_text"], r["lines_removed"]) for r in out2.collect()}
    assert got[11] == ("novel line in batch two only", 1)
    assert got[12] == ("short", 2)


@pytest.mark.slow
def test_ingest_with_line_dedup_scrubs_and_converges(spark, tmp_path):
    """ingest_corpus_batch(line_dedup=True): a batch-2 document
    sharing a line with batch 1 lands in the corpus SCRUBBED; a doc
    that scrubs down to nothing is dropped (reported); re-running the
    same batch converges (corpus unchanged)."""
    from geo_explorer_etl_spark.operators.corpus import ingest_corpus_batch

    shared = "a shared boilerplate line long enough to be dedup eligible"
    l1 = "the first document has its own unique tail line here"
    l2 = "the second document is entirely unique content with many words"
    # texts must pass the default gates (>=5 tokens, language en-ish);
    # doc 12 is a MASHUP of two already-seen lines from DIFFERENT docs
    # — it survives doc-level dedup (its signature matches neither
    # source) but the line scrub empties it
    b1 = [(1, f"{shared}\n{l1}"), (2, l2)]
    b2 = [
        (11, f"{shared}\nthe eleventh document keeps this novel trailing line"),
        (12, f"{l1}\n{l2}"),  # scrubs to nothing -> dropped
    ]
    store = TableStore(spark, str(tmp_path / "wh"))
    rep1, rep2 = {}, {}
    ingest_corpus_batch(store, _ingest_docs(spark, b1),
                        line_dedup=True, report=rep1)
    ingest_corpus_batch(store, _ingest_docs(spark, b2),
                        line_dedup=True, report=rep2)
    corpus = {r["doc_id"]: r["text"]
              for r in store.read("Corpus").select("doc_id", "text").collect()}
    assert corpus[1].startswith(shared)          # first occurrence kept
    assert corpus[11] == "the eleventh document keeps this novel trailing line"
    assert 12 not in corpus                      # scrubbed empty -> dropped
    assert rep2["line_scrubbed_empty"] == 1
    # retry the SAME batch: its lines are now indexed, so the scrub
    # empties everything, and the corpus anti-join absorbs the rest —
    # the committed corpus must not change
    before = sorted(corpus)
    ingest_corpus_batch(store, _ingest_docs(spark, b2),
                        line_dedup=True, report={})
    after = sorted(
        r["doc_id"] for r in store.read("Corpus").select("doc_id").collect()
    )
    assert after == before


@pytest.mark.slow
def test_ingest_line_dedup_crash_between_persists_converges(
    spark, tmp_path, monkeypatch
):
    """Crash AFTER the line-index persist but BEFORE the exact/band
    persist (the r13 review window): the retry must converge — corpus
    identical, every index complete, and the budget counter charged
    exactly once (the pre-scrub digest recognizes the retry even
    though its post-scrub survivor set collapses)."""
    from geo_explorer_etl_spark.operators import incremental_dedup as ID
    from geo_explorer_etl_spark.operators.corpus import ingest_corpus_batch

    shared = "a shared boilerplate line long enough to be dedup eligible"
    b1 = [(1, f"{shared}\nthe first document has its own unique tail line here"),
          (2, "the second document is entirely unique content with many words")]
    b2 = [(11, f"{shared}\nthe eleventh document keeps this novel trailing line"),
          (13, "a fresh thirteenth document with plenty of unique words")]

    def run(root, crash_second):
        store = TableStore(spark, str(tmp_path / root))
        ingest_corpus_batch(store, _ingest_docs(spark, b1),
                            line_dedup=True, token_budget=10_000)
        if crash_second:
            real = ID.dedup_persist

            def boom(*a, **k):
                raise RuntimeError("crash before exact/band persist")

            monkeypatch.setattr(ID, "dedup_persist", boom)
            try:
                ingest_corpus_batch(store, _ingest_docs(spark, b2),
                                    line_dedup=True, token_budget=10_000)
            except RuntimeError:
                pass
            monkeypatch.setattr(ID, "dedup_persist", real)
        ingest_corpus_batch(store, _ingest_docs(spark, b2),
                            line_dedup=True, token_budget=10_000)
        corpus = sorted(
            (r["doc_id"], r["text"])
            for r in store.read("Corpus").select("doc_id", "text").collect()
        )
        blob = store._backend.read(
            __import__("pathlib").Path(store.root), "_corpus_budget_Corpus.json"
        )[1]
        n_exact = store.read(ID.EXACT_TABLE).count()
        n_lines = store.read(ID.LINE_TABLE).count()
        return corpus, blob["tokens"], n_exact, n_lines

    clean = run("clean", crash_second=False)
    crashed = run("crashed", crash_second=True)
    assert crashed == clean


@pytest.mark.slow
def test_corpus_ingest_sink_streaming_exactly_once(spark, tmp_path):
    """Streaming corpus ingest end-to-end: a file stream of documents
    drained through corpus_ingest_sink runs the FULL pipeline (gates,
    dedup, line scrub, corpus append, index appends) per micro-batch;
    a replayed epoch is skipped outright by the ledger — critical for
    the line index, whose re-run would scrub the batch's docs empty."""
    from geo_explorer_etl_spark.streaming.incremental import corpus_ingest_sink

    src = tmp_path / "docs_in"
    src.mkdir()
    shared = "a shared boilerplate line long enough to be dedup eligible"
    docs = _ingest_docs(spark, [
        (1, f"{shared}\nthe first document has its own unique tail line here"),
        (2, "the second document is entirely unique content with many words"),
    ])
    docs.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage"))
    import shutil

    part = next((tmp_path / "stage").glob("part-*.parquet"))
    shutil.copy(part, src / "b0.parquet")
    store = TableStore(spark, str(tmp_path / "wh"))
    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    q = corpus_ingest_sink(
        stream, str(tmp_path / "ckpt"), store, "corpus_stream",
        line_dedup=True,
    )
    q.awaitTermination(120)
    ids = sorted(r["doc_id"] for r in store.read("Corpus").select("doc_id").collect())
    assert ids == [1, 2]
    from geo_explorer_etl_spark.operators.incremental_dedup import LINE_TABLE

    n_lines = store.read(LINE_TABLE).count()
    # simulate the foreachBatch replay of epoch 0: skipped outright,
    # nothing re-scrubbed, nothing re-appended
    from geo_explorer_etl_spark.operators import corpus as CP

    called = {"n": 0}
    real = CP.ingest_corpus_batch

    def spy(*a, **k):
        called["n"] += 1
        return real(*a, **k)

    # the skip must be LOUD on EVERY occurrence: it logs (not
    # warnings.warn, whose per-callsite registry swallows the second
    # identical skip) naming the checkpoint/stream_id pairing rule —
    # a reset checkpoint with the old stream_id is silent data loss
    # otherwise (review r13). Logging is process-global, so the
    # microbatch thread's record lands in a handler attached here.
    import logging as _logging

    seen: list[str] = []

    class _Grab(_logging.Handler):
        def emit(self, record):
            seen.append(record.getMessage())

    grab = _Grab()
    sink_log = _logging.getLogger(
        "geo_explorer_etl_spark.streaming.incremental"
    )
    sink_log.addHandler(grab)
    CP.ingest_corpus_batch = spy
    try:
        q2 = corpus_ingest_sink(
            stream, str(tmp_path / "ckpt2"), store, "corpus_stream",
            line_dedup=True,
        )
        q2.awaitTermination(120)
    finally:
        CP.ingest_corpus_batch = real
        sink_log.removeHandler(grab)
    assert any("NEW stream_id" in m for m in seen)
    assert called["n"] == 0  # ledger skipped the replayed epoch
    assert sorted(
        r["doc_id"] for r in store.read("Corpus").select("doc_id").collect()
    ) == [1, 2]
    assert store.read(LINE_TABLE).count() == n_lines


@pytest.mark.slow
def test_incremental_substrings_batch_then_batch_equals_all_at_once(
    spark, tmp_path
):
    """The Lee-et-al rule run daily: batch-then-batch through the
    persisted window-fingerprint index equals the all-at-once
    dedup_substrings(min_count=2) on the union (monotone ids) — a
    batch-2 doc repeating a batch-1 run loses it, a batch-1 run seen
    ONCE still indexes (so its second copy in batch 2 drops), and
    within-batch repeats fall to the batch-first rule."""
    from geo_explorer_etl_spark.operators import incremental_dedup as ID
    from geo_explorer_etl_spark.operators.dedup import dedup_substrings

    run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    run2 = "uno dos tres cuatro cinco seis siete ocho nueve diez"
    b1 = [
        (1, f"{run} tail one"),
        (2, f"once only {run2} here now"),
        (3, f"left {run} mid {run} right"),
    ]
    b2 = [
        (11, f"batch two copy {run} end"),
        (12, f"{run2} second corpus copy"),
        (13, "nothing shared at all in this document"),
    ]
    store = TableStore(spark, str(tmp_path / "wh"))
    rep1, rep2 = {}, {}
    out1 = ID.incremental_dedup_substrings(
        store, _docs(spark, b1), window=10, report=rep1
    )
    out2 = ID.incremental_dedup_substrings(
        store, _docs(spark, b2), window=10, report=rep2
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["windows_removed"], r["chars_removed"])
        for r in out1.collect() + out2.collect()
    }
    exp = {
        r["doc_id"]: (r["clean_text"], r["windows_removed"], r["chars_removed"])
        for r in dedup_substrings(
            _docs(spark, b1 + b2), window=10, min_count=2
        ).collect()
    }
    assert got == exp
    assert got[11][0] == "batch two copy  end"  # byte-exact: flanking seps stay
    assert got[12][0] == " second corpus copy"
    assert rep1["new_index_rows"] > 0 and rep2["new_index_rows"] > 0
    assert rep2["DedupWindowIndex_probe"] == "pruned"


@pytest.mark.slow
def test_incremental_substrings_overcap_mirror_and_stale_fallback(
    spark, tmp_path, monkeypatch
):
    """Over LINE_PROBE_CAP the window index joins its bucketed mirror
    (no Exchange on the index side is pinned by the line twin — the
    machinery is shared); a corrupted sync marker falls back to the
    plain read with the result unchanged."""
    import json

    from geo_explorer_etl_spark.operators import incremental_dedup as ID

    run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    store = TableStore(spark, str(tmp_path / "wh"))
    ID.incremental_dedup_substrings(
        store, _docs(spark, [(1, f"{run} tail")]), window=10
    )
    monkeypatch.setattr(ID, "LINE_PROBE_CAP", 0)
    rep = {}
    out = ID.incremental_dedup_substrings(
        store, _docs(spark, [(5, f"pre {run} post")]), window=10, report=rep
    )
    assert rep["DedupWindowIndex_probe"] == "bucketed_mirror"
    assert out.collect()[0]["clean_text"] == "pre  post"
    marker = ID._mirror_marker(store, ID.WINDOW_TABLE)
    with open(marker) as f:
        rows = json.load(f)["rows"]
    with open(marker, "w") as f:
        json.dump({"rows": rows - 1}, f)
    rep = {}
    out = ID.incremental_dedup_substrings(
        store, _docs(spark, [(7, f"x {run} y")]), window=10, report=rep
    )
    assert rep["DedupWindowIndex_probe"] == "full_scan"
    assert "stale" in rep["DedupWindowIndex_mirror"]
    assert out.collect()[0]["clean_text"] == "x  y"


@pytest.mark.slow
def test_ingest_with_substring_dedup_scrubs_and_converges(spark, tmp_path):
    """ingest_corpus_batch(substring_dedup=True): a batch-2 document
    repeating a batch-1 10-token run lands in the corpus SPLICED; a
    doc that scrubs down to nothing is dropped (reported); re-running
    the same batch leaves the corpus unchanged."""
    from geo_explorer_etl_spark.operators.corpus import ingest_corpus_batch

    run = "the quick brown fox jumps over the lazy dog tonight"
    run2 = "a shared boilerplate passage about spark shuffles and zone maps"
    store = TableStore(spark, str(tmp_path / "wh"))
    kw = dict(min_tokens=1, substring_dedup=True, substring_window=10)
    b1 = [
        (1, f"{run} with a fresh ending here"),
        (2, run2),
    ]
    # doc 12 is a MASHUP of two seen runs from DIFFERENT docs — it
    # survives doc-level dedup (signature matches neither source) but
    # every token is covered by the seen windows -> scrubs empty
    b2 = [
        (11, f"in the beginning of it all {run} and then the closing bits arrive"),
        (12, f"{run} {run2}"),  # scrubs to nothing -> dropped
        (13, "a genuinely novel document with nothing shared anywhere in the corpus"),
    ]
    ingest_corpus_batch(store, _ingest_docs(spark, b1), **kw)
    rep: dict = {}
    ingest_corpus_batch(store, _ingest_docs(spark, b2), report=rep, **kw)
    assert rep["substring_scrubbed_empty"] == 1
    rows = {r["doc_id"]: r["text"] for r in store.read("Corpus").collect()}
    assert rows[1] == f"{run} with a fresh ending here"
    assert rows[11] == "in the beginning of it all  and then the closing bits arrive"
    assert 12 not in rows and 13 in rows
    # retry converges: same batch again, corpus byte-stable
    before = sorted(rows.items())
    ingest_corpus_batch(store, _ingest_docs(spark, b2), **kw)
    after = sorted(
        (r["doc_id"], r["text"]) for r in store.read("Corpus").collect()
    )
    assert after == before


@pytest.mark.slow
def test_mirror_compact_collapses_files_and_heals_staleness(spark, tmp_path, monkeypatch):
    """After N batches the mirror holds ~N files per touched bucket;
    mirror_compact rebuilds it from the source index into one file
    set, a STALE mirror comes back current, and the over-cap decide
    path keeps using it with results unchanged."""
    import glob
    import json

    from geo_explorer_etl_spark.operators import incremental_dedup as ID

    store = TableStore(spark, str(tmp_path / "wh"))
    for i in range(3):
        ID.incremental_dedup_lines(
            store,
            _docs(spark, [(i * 10 + 1,
                           f"unique enough line number {i} for the dedup index here")]),
        )
    loc = ID._mirror_loc(store, ID.LINE_TABLE)
    before = len(glob.glob(f"{loc}/part-*"))
    assert before >= 3  # one file set per batch append
    # corrupt the marker: compact must heal it, not fall back forever
    marker = ID._mirror_marker(store, ID.LINE_TABLE)
    with open(marker) as f:
        meta = json.load(f)
    with open(marker, "w") as f:
        json.dump({"rows": meta["rows"] - 1, "buckets": meta["buckets"]}, f)
    n = ID.mirror_compact(store, ID.LINE_TABLE, "line_hash")
    assert n == store.count_rows(ID.LINE_TABLE)
    after = len(glob.glob(f"{loc}/part-*"))
    assert after < before
    monkeypatch.setattr(ID, "LINE_PROBE_CAP", 0)
    rep = {}
    out = ID.incremental_dedup_lines(
        store,
        _docs(spark, [(99, "unique enough line number 0 for the dedup index here")]),
        report=rep,
    )
    assert rep["DedupLineIndex_probe"] == "bucketed_mirror"
    assert out.collect()[0]["clean_text"] == ""


def test_mirror_append_heals_batch_missed_by_crash(spark, tmp_path, monkeypatch):
    """ADVICE r14 high: a crash between a batch's clustered append and
    its mirror append must NOT be masked by the next batch's marker
    write. The next successful persist detects the mirror is missing a
    whole batch (marker-vs-store-minus-batch check BEFORE appending)
    and rebuilds from the source index — so an over-cap probe still
    sees the crashed batch's lines as duplicates."""
    from geo_explorer_etl_spark.operators import incremental_dedup as ID

    store = TableStore(spark, str(tmp_path / "wh"))
    ID.incremental_dedup_lines(
        store, _docs(spark, [(1, "seed line long enough for eligibility here")])
    )
    # batch 2 "crashes" after the store append, before the mirror one
    monkeypatch.setattr(ID, "_mirror_append", lambda *a, **k: None)
    ID.incremental_dedup_lines(
        store, _docs(spark, [(2, "crashed batch line long enough for the index")])
    )
    monkeypatch.undo()
    monkeypatch.setattr(ID, "CAPTURE_PLANS", False)
    # batch 3 persists normally: the pre-append sync check must spot
    # the missed batch and rebuild instead of stamping a fresh marker
    ID.incremental_dedup_lines(
        store, _docs(spark, [(3, "third batch line long enough for the index too")])
    )
    mirror = ID.line_mirror_read(store)
    assert mirror is not None, "mirror should be fresh after the heal"
    assert mirror.count() == store.count_rows(ID.LINE_TABLE)
    # the crashed batch's line is IN the healed mirror: an over-cap
    # decide dedups against it
    monkeypatch.setattr(ID, "LINE_PROBE_CAP", 0)
    rep = {}
    out = ID.incremental_dedup_lines(
        store,
        _docs(spark, [(9, "crashed batch line long enough for the index")]),
        report=rep,
    )
    assert rep["DedupLineIndex_probe"] == "bucketed_mirror"
    row = out.collect()[0]
    assert row["clean_text"] == "" and row["lines_removed"] == 1


def test_mirror_read_falls_back_when_files_missing(spark, tmp_path, monkeypatch):
    """ADVICE r14 medium: marker fresh + counts matching but the
    mirror DIRECTORY gone (crash in mirror_compact between rmtree and
    the rebuild) must degrade to the plain store read, not raise."""
    import shutil

    from geo_explorer_etl_spark.operators import incremental_dedup as ID

    store = TableStore(spark, str(tmp_path / "wh"))
    ID.incremental_dedup_lines(
        store, _docs(spark, [(1, "a line definitely long enough for the index")])
    )
    shutil.rmtree(ID._mirror_loc(store, ID.LINE_TABLE))
    rep = {}
    assert ID.line_mirror_read(store, rep) is None
    assert "missing" in rep[f"{ID.LINE_TABLE}_mirror"]
    # the over-cap decide path survives on the full-scan fallback
    monkeypatch.setattr(ID, "LINE_PROBE_CAP", 0)
    rep2 = {}
    out = ID.incremental_dedup_lines(
        store,
        _docs(spark, [(2, "a line definitely long enough for the index")]),
        report=rep2,
    )
    assert rep2["DedupLineIndex_probe"] == "full_scan"
    row = out.collect()[0]
    assert row["clean_text"] == "" and row["lines_removed"] == 1


@pytest.mark.slow
def test_mirror_auto_compacts_on_fileset_threshold(spark, tmp_path, monkeypatch):
    """VERDICT r14 next #2: the mirror joins the store's auto-compact
    discipline — once accreted file sets exceed the threshold the
    persist path compacts EXACTLY once (the counter resets to one
    set), the marker stays fresh, and the over-cap decide still joins
    the bucketed mirror with the zero-Exchange plan."""
    import glob

    from geo_explorer_etl_spark.operators import incremental_dedup as ID

    monkeypatch.setattr(ID, "MIRROR_AUTO_COMPACT_FILESETS", 3)
    # defer window 0 = the r15 always-inline behavior this test pins
    monkeypatch.setattr(ID, "MIRROR_COMPACT_DEFER_BATCHES", 0)
    compacts: list = []
    real = ID.mirror_compact

    def spy(*a, **k):
        compacts.append(a)
        return real(*a, **k)

    monkeypatch.setattr(ID, "mirror_compact", spy)
    store = TableStore(spark, str(tmp_path / "wh"))
    for i in range(5):
        ID.incremental_dedup_lines(
            store,
            _docs(spark, [(i * 10 + 1,
                           f"unique enough line number {i} for the dedup index ok")]),
        )
    # batches 1-3 accrete sets 1..3; batch 4 crosses (4 > 3) -> ONE
    # compact; batch 5 lands set 2 of the compacted mirror -> none
    assert len(compacts) == 1
    loc = ID._mirror_loc(store, ID.LINE_TABLE)
    assert ID._mirror_filesets(store, ID.LINE_TABLE) <= 2
    assert len(glob.glob(f"{loc}/part-*")) < 5 * ID._mirror_buckets(store, ID.LINE_TABLE)
    # marker fresh: the mirror serves the over-cap decide
    mirror = ID.line_mirror_read(store)
    assert mirror is not None
    assert mirror.count() == store.count_rows(ID.LINE_TABLE)
    monkeypatch.setattr(ID, "LINE_PROBE_CAP", 0)
    monkeypatch.setattr(ID, "CAPTURE_PLANS", True)
    rep = {}
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = ID.incremental_dedup_lines(
            store,
            _docs(spark, [(99, "unique enough line number 0 for the dedup index ok")]),
            report=rep,
        )
        row = out.collect()[0]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert rep["DedupLineIndex_probe"] == "bucketed_mirror"
    assert "Bucketed: true" in rep["_mirror_join_plan"]
    assert row["clean_text"] == "" and row["lines_removed"] == 1


@pytest.mark.slow
def test_mirrors_auto_compact_sweep(spark, tmp_path, monkeypatch):
    """mirrors_auto_compact: the explicit maintenance sweep compacts
    exactly the breaching mirrors (healthy ones are a marker read),
    reporting per-table file sets."""
    from geo_explorer_etl_spark.operators import incremental_dedup as ID

    monkeypatch.setattr(ID, "MIRROR_AUTO_COMPACT_FILESETS", 0)  # accrete
    store = TableStore(spark, str(tmp_path / "wh"))
    for i in range(3):
        ID.incremental_dedup_lines(
            store,
            _docs(spark, [(i * 10 + 1,
                           f"one unique line number {i} long enough for the index")]),
        )
    ID.incremental_dedup_substrings(
        store,
        _docs(spark, [(99, "ten tokens alpha beta gamma delta epsilon zeta eta theta")]),
        window=8,
    )
    rep = ID.mirrors_auto_compact(store, threshold=2)
    assert rep[ID.LINE_TABLE] == {"sets": 3, "marked": False, "compacted": True}
    assert rep[ID.WINDOW_TABLE] == {
        "sets": 1, "marked": False, "compacted": False,
    }
    assert ID._mirror_filesets(store, ID.LINE_TABLE) == 1  # reset by compact
    # both mirrors stay fresh and serve
    assert ID.line_mirror_read(store) is not None
    assert ID._mirror_read(store, ID.WINDOW_TABLE, "window_hash") is not None


@pytest.mark.slow
def test_incremental_dedup_simhash_mode(spark, tmp_path):
    """The SimHash near-dup leg (VERDICT r15 next #1c): batches dedup
    against the persisted DedupSimhashBandIndex with EXACT recall at
    Hamming <= max_hamming, batch-then-batch equals the all-at-once
    simhash pipeline on the union, and mixing near-dup modes on one
    store refuses loudly."""
    import pytest

    from geo_explorer_etl_spark.operators.incremental_dedup import (
        SIMHASH_BAND_TABLE,
        dedup_decide,
    )

    base = " ".join(f"tok{i}" for i in range(60))
    far = " ".join(f"other{i}" for i in range(60))
    third = " ".join(f"third{i}" for i in range(60))
    b1 = [(1, base), (2, far)]
    # 3 = case/whitespace variant of 1 (different md5, IDENTICAL token
    # set -> hamming 0); 5 = case variant of 4 within the batch
    b2 = [(3, base.upper() + "  "), (4, third), (5, third.upper())]
    store = TableStore(spark, str(tmp_path / "wh"))
    rep1: dict = {}
    kept1 = incremental_dedup(
        store, _docs(spark, b1), near_dup="simhash", report=rep1
    )
    assert sorted(r.doc_id for r in kept1.collect()) == [1, 2]
    assert rep1["near_dup_mode"] == "simhash"
    assert store.exists(SIMHASH_BAND_TABLE)
    idx = store.read(SIMHASH_BAND_TABLE)
    assert set(idx.columns) >= {"doc_id", "band_id", "band_hash", "sh0", "sh1"}
    rep2: dict = {}
    kept2 = incremental_dedup(
        store, _docs(spark, b2), near_dup="simhash", report=rep2
    )
    assert sorted(r.doc_id for r in kept2.collect()) == [4]
    assert rep2[f"{SIMHASH_BAND_TABLE}_probe"] == "pruned"

    # all-at-once equality over the union: exact dedup -> simhash
    # pairs -> components -> min-id representative
    union = _docs(spark, b1 + b2)
    exact = DD.exact_dedup_groups(union, "text", "doc_id")
    survivors = union.join(
        exact.select(F.col("canonical_doc_id").alias("doc_id")).distinct(),
        "doc_id", "left_semi",
    )
    pairs = DD.simhash_pairs(
        survivors, "text", "doc_id", bits=96, max_hamming=3,
        max_bucket_size=None,
    )
    comp = DD.connected_components(pairs, "doc_a", "doc_b")
    labeled = survivors.join(comp, survivors.doc_id == comp.node, "left")
    want = sorted(
        r.doc_id
        for r in labeled.filter(
            F.col("component").isNull() | (F.col("component") == F.col("doc_id"))
        ).select("doc_id").collect()
    )
    assert want == [1, 2, 4]

    # mode mixing refuses in BOTH directions
    with pytest.raises(ValueError, match="SimHash band"):
        dedup_decide(store, _docs(spark, [(9, "x y z")]), near_dup="minhash")
    store2 = TableStore(spark, str(tmp_path / "wh2"))
    incremental_dedup(store2, _docs(spark, b1))  # minhash default
    with pytest.raises(ValueError, match="MinHash band"):
        dedup_decide(store2, _docs(spark, [(9, "x y z")]), near_dup="simhash")
    with pytest.raises(ValueError, match="unknown near_dup"):
        dedup_decide(store2, _docs(spark, [(9, "x")]), near_dup="phash")


@pytest.mark.slow
def test_ingest_corpus_batch_simhash_leg(spark, tmp_path):
    """ingest_corpus_batch(near_dup_mode='simhash'): the one-call
    pipeline rides the SimHash index — cross-batch case-variant
    near-dups drop, the corpus equals the survivors, and the MinHash
    band table never appears."""
    from geo_explorer_etl_spark.operators.corpus import ingest_corpus_batch
    from geo_explorer_etl_spark.operators.incremental_dedup import (
        SIMHASH_BAND_TABLE,
    )

    def docs(rows):
        return _docs(spark, rows).withColumn(
            "n_chars", F.length("text").cast("long")
        )

    base = " ".join(f"alpha{i}" for i in range(40))
    far = " ".join(f"beta{i}" for i in range(40))
    store = TableStore(spark, str(tmp_path / "wh"))
    kw = dict(
        languages=("en", "fr", "de", "es"), min_tokens=1,
        near_dup_mode="simhash",
    )
    rep1: dict = {}
    ingest_corpus_batch(
        store, docs([(1, base), (2, far)]), report=rep1, **kw
    )
    assert rep1["accepted_rows"] == 2 and rep1["near_dup_mode"] == "simhash"
    rep2: dict = {}
    ingest_corpus_batch(
        store,
        docs([(3, base.upper()), (4, "gamma delta epsilon zeta")]),
        report=rep2,
        **kw,
    )
    assert rep2["accepted_rows"] == 1  # 3 doomed via the simhash index
    got = sorted(r.doc_id for r in store.read("Corpus").collect())
    assert got == [1, 2, 4]
    assert store.exists(SIMHASH_BAND_TABLE) and not store.exists(BAND_TABLE)
    # batch-equals-ingest holds in simhash mode too: the BATCH builder
    # with near_dup_mode="simhash" over the union reproduces the
    # incrementally-built corpus (r16 symmetry)
    from geo_explorer_etl_spark.operators.corpus import build_training_corpus

    union = docs(
        [(1, base), (2, far), (3, base.upper()), (4, "gamma delta epsilon zeta")]
    )
    want = sorted(
        r.doc_id
        for r in build_training_corpus(
            union, languages=("en", "fr", "de", "es"), min_tokens=1,
            near_dup_mode="simhash",
        ).collect()
    )
    assert want == got
    import pytest

    with pytest.raises(ValueError, match="unknown near_dup_mode"):
        build_training_corpus(union, near_dup_mode="phash")


@pytest.mark.slow
def test_mirror_breach_marks_then_sweep_compacts_then_inline_fallback(
    spark, tmp_path, monkeypatch
):
    """VERDICT r15 next #5: a breach batch MARKS the sync marker and
    returns without compacting (ingest latency flat); the
    mirrors_auto_compact sweep performs the rewrite exactly once and
    clears the mark; when the sweep never runs, the persist path
    compacts inline after MIRROR_COMPACT_DEFER_BATCHES marked
    appends — the bounded-tax fallback. The mirror stays fresh and
    serving throughout."""
    from geo_explorer_etl_spark.operators import incremental_dedup as ID

    monkeypatch.setattr(ID, "MIRROR_AUTO_COMPACT_FILESETS", 2)
    compacts: list = []
    real = ID.mirror_compact

    def spy(*a, **k):
        compacts.append(a)
        return real(*a, **k)

    monkeypatch.setattr(ID, "mirror_compact", spy)
    store = TableStore(spark, str(tmp_path / "wh"))

    def batch(i):
        ID.incremental_dedup_lines(
            store,
            _docs(spark, [(i * 10 + 1,
                           f"unique line number {i} long enough for the index")]),
        )

    for i in range(4):
        batch(i)
    # sets went 1,2,3,4: batches 3 and 4 breached -> MARKED only
    assert compacts == []
    assert ID._mirror_filesets(store, ID.LINE_TABLE) == 4
    assert ID._mirror_breach_age(store, ID.LINE_TABLE) == 2
    assert ID.line_mirror_read(store) is not None  # still fresh, serves
    # the sweep is the default executor: compacts exactly once, resets
    rep = ID.mirrors_auto_compact(store)
    assert rep[ID.LINE_TABLE] == {"sets": 4, "marked": True, "compacted": True}
    assert len(compacts) == 1
    assert ID._mirror_filesets(store, ID.LINE_TABLE) == 1
    assert ID._mirror_breach_age(store, ID.LINE_TABLE) == 0
    mirror = ID.line_mirror_read(store)
    assert mirror is not None
    assert mirror.count() == store.count_rows(ID.LINE_TABLE)
    # no sweep this time: after DEFER marked appends the persist path
    # falls back to ONE inline compact
    monkeypatch.setattr(ID, "MIRROR_COMPACT_DEFER_BATCHES", 2)
    for i in range(4, 9):
        batch(i)
    # sets 2,3,4,5: breaches at 3 (age1), 4 (age2), 5 (age3>2 -> inline)
    assert len(compacts) == 2
    assert ID._mirror_breach_age(store, ID.LINE_TABLE) == 0
    assert ID._mirror_filesets(store, ID.LINE_TABLE) <= 2
    mirror = ID.line_mirror_read(store)
    assert mirror is not None
    assert mirror.count() == store.count_rows(ID.LINE_TABLE)


@pytest.mark.slow
def test_simhash_spec_drift_refused(spark, tmp_path):
    """r16 review find: the persisted SimHash index records its
    (bits, max_hamming) spec on first persist; a later decide under a
    DIFFERENT spec refuses loudly instead of silently missing every
    cross-batch near-dup (band values under different specs never
    match). Degenerate band specs refuse at the shared definition."""
    import pytest

    from geo_explorer_etl_spark.operators import dedup as DDop
    from geo_explorer_etl_spark.operators.incremental_dedup import (
        dedup_decide,
    )

    store = TableStore(spark, str(tmp_path / "wh"))
    incremental_dedup(
        store, _docs(spark, [(1, "alpha beta gamma")]), near_dup="simhash"
    )
    with pytest.raises(ValueError, match="built with bits=96"):
        dedup_decide(
            store, _docs(spark, [(2, "x y z")]), near_dup="simhash",
            simhash_bits=64,
        )
    with pytest.raises(ValueError, match="built with"):
        dedup_decide(
            store, _docs(spark, [(2, "x y z")]), near_dup="simhash",
            max_hamming=5,
        )
    # same spec keeps working
    kept = incremental_dedup(
        store, _docs(spark, [(2, "delta epsilon zeta")]), near_dup="simhash"
    )
    assert kept.count() == 1
    # shared band-spec validation: zero-width bands and >60-bit bands
    with pytest.raises(ValueError, match="zero width"):
        DDop.simhash_band_specs(2, 3)
    with pytest.raises(ValueError, match="overflows 64-bit"):
        DDop.simhash_band_specs(96, 0)
    with pytest.raises(ValueError, match="max_hamming=-1"):
        DDop.simhash_band_specs(96, -1)
    with pytest.raises(ValueError, match="overflows 64-bit"):
        dedup_decide(
            store2 := TableStore(spark, str(tmp_path / "wh2")),
            _docs(spark, [(1, "a b")]), near_dup="simhash", max_hamming=0,
        )
    del store2
