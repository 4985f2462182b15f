"""Skew operators + pushdown audit + hypothesis property tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from geo_explorer_etl_spark.operators.skew import salted_count, salted_join
from geo_explorer_etl_spark.session import load_tables
from tests.conftest import SF_SMOKE


def test_salted_join_matches_plain_join(spark):
    t = load_tables(spark, SF_SMOKE, "lineitem", "orders")
    li, o = t["lineitem"], t["orders"]
    small = o.select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    plain = li.join(small, "l_orderkey").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
    ).first()
    salted = salted_join(li, small, "l_orderkey", n_salts=4).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
    ).first()
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])


def test_salted_count_matches_plain_count(spark):
    li = load_tables(spark, SF_SMOKE, "lineitem")["lineitem"]
    plain = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        r["l_returnflag"]: r["n"]
        for r in salted_count(li, "l_returnflag", n_salts=8).collect()
    }
    assert plain == salted


def test_doc_filter_pushdown(spark):
    """Extension scans prune too: the ngram query's doc_id<100 filter
    must reach the parquet reader."""
    docs = load_tables(spark, SF_SMOKE, "documents")["documents"].filter(
        F.col("doc_id") < 100
    )
    plan = docs._sc._jvm.PythonSQLUtils.explainString(
        docs._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]" in plan, plan


def test_ivf_trained_recall(spark):
    """Trained IVF cells must recover most of the brute-force top-10
    while scanning only nprobe/n_centroids of the corpus."""
    from geo_explorer_etl_spark.operators import similarity as SIM

    emb = load_tables(spark, SF_SMOKE, "embeddings")["embeddings"]
    bf = {r["vec_id"] for r in SIM.cosine_topk(emb, 0, 10).collect()}
    cents = SIM.train_centroids(emb, n_centroids=8)
    ivf = {
        r["vec_id"]
        for r in SIM.ivf_topk(emb, 0, 10, nprobe=2, centroids=cents).collect()
    }
    assert len(ivf & bf) / 10 >= 0.6


def test_bucketed_near_dup_recall_and_plan(spark):
    """LSH-bucketed near-dup pairs: every reported pair must also be in
    the exact all-pairs set (precision 1.0 — within-bucket cosine is
    exact), recall must clear 0.8 with 8 bands of 2 planes, and the plan must be an
    equi-join, never a CartesianProduct/BroadcastNestedLoop."""
    from geo_explorer_etl_spark.operators import similarity as SIM

    emb = load_tables(spark, SF_SMOKE, "embeddings")["embeddings"]
    exact = {
        (r["id_a"], r["id_b"])
        for r in SIM.cosine_near_dup_pairs(emb, threshold=0.4).collect()
    }
    bucketed_df = SIM.bucketed_near_dup_pairs(
        emb, threshold=0.4, planes_per_band=2, n_bands=8
    )
    bucketed = {(r["id_a"], r["id_b"]) for r in bucketed_df.collect()}
    assert bucketed <= exact
    assert exact and len(bucketed & exact) / len(exact) >= 0.8
    plan = bucketed_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_bucketed_near_dup_null_rows_dropped(spark):
    """A null vector (or null id) in a bucket must be dropped, not
    poison the numpy scoring batch with an object-dtype array: same
    outcome as the expression path (null cosine fails the threshold),
    different failure mode avoided."""
    from geo_explorer_etl_spark.operators import similarity as SIM

    emb = load_tables(spark, SF_SMOKE, "embeddings")["embeddings"]
    dim = len(emb.select("embedding").first()[0])
    polluted = emb.unionByName(
        spark.createDataFrame(
            [(100001, None, 0), (None, [0.5] * dim, 0)],
            "vec_id bigint, embedding array<float>, label int",
        )
    )
    clean = {
        (r["id_a"], r["id_b"])
        for r in SIM.bucketed_near_dup_pairs(
            emb, threshold=0.4, planes_per_band=2, n_bands=8
        ).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in SIM.bucketed_near_dup_pairs(
            polluted, threshold=0.4, planes_per_band=2, n_bands=8
        ).collect()
    }
    assert got == clean


def test_ivf_near_dup_recall_and_plan(spark):
    """Trained-centroid multi-probe near-dup: subset of exact pairs
    (precision 1.0), recall >= 0.7 at K=16/nprobe=3, equi-join plan."""
    from geo_explorer_etl_spark.operators import similarity as SIM

    emb = load_tables(spark, SF_SMOKE, "embeddings")["embeddings"]
    exact = {
        (r["id_a"], r["id_b"])
        for r in SIM.cosine_near_dup_pairs(emb, threshold=0.4).collect()
    }
    ivf_df = SIM.ivf_near_dup_pairs(emb, threshold=0.4, n_centroids=16, nprobe=3)
    ivf = {(r["id_a"], r["id_b"]) for r in ivf_df.collect()}
    assert ivf <= exact
    assert exact and len(ivf & exact) / len(exact) >= 0.7
    plan = ivf_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_ivf_angular_prune_is_superset_safe(spark):
    """The angular candidate bound (min over shared cells of
    sa·sb + sin·sin) is a STRICT superset filter on the pair-join
    scorer: results with pruning on and off must be identical
    pair-for-pair — and the tiled scorer (the default) must agree with
    both bit-exactly (fixed-order dots collapse under distinct)."""
    from geo_explorer_etl_spark.operators import similarity as SIM

    emb = load_tables(spark, SF_SMOKE, "embeddings")["embeddings"]

    def run(**kw):
        return {
            tuple(r)
            for r in SIM.ivf_near_dup_pairs(
                emb, threshold=0.4, n_centroids=16, nprobe=3, **kw
            ).collect()
        }

    on = run(scorer="pairs", angular_prune=True)
    off = run(scorer="pairs", angular_prune=False)
    tiled = run(scorer="tiled")
    assert on == off == tiled and on


def test_distributed_kmeans_matches_driver_recall(spark):
    """Sharded Lloyd training (mapInPandas partials + Spark-side merge,
    K×dim driver collect) must clear the same near-dup recall gate as
    the driver-mode trainer — the path a 100 TB corpus takes."""
    from geo_explorer_etl_spark.operators import similarity as SIM

    emb = load_tables(spark, SF_SMOKE, "embeddings")["embeddings"]
    exact = {
        (r["id_a"], r["id_b"])
        for r in SIM.cosine_near_dup_pairs(emb, threshold=0.4).collect()
    }
    cents = SIM.train_centroids(emb, n_centroids=16, iters=5, distributed=True)
    assert len(cents) == 16 and all(len(c) == len(cents[0]) for c in cents)
    ivf = {
        (r["id_a"], r["id_b"])
        for r in SIM.ivf_near_dup_pairs(
            emb, threshold=0.4, centroids=cents, nprobe=3
        ).collect()
    }
    assert ivf <= exact
    assert exact and len(ivf & exact) / len(exact) >= 0.7


def test_near_dup_empty_input_and_string_ids(spark):
    """Empty corpora return empty (id_a, id_b, cosine) frames from all
    three near-dup variants (the exact twin's contract); non-long doc
    ids survive the IVF mapInPandas round-trip unchanged."""
    from geo_explorer_etl_spark.operators import similarity as SIM

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>, label string")
    assert SIM.cosine_near_dup_pairs(empty).count() == 0
    assert SIM.bucketed_near_dup_pairs(empty).count() == 0
    assert SIM.ivf_near_dup_pairs(empty).count() == 0
    assert SIM.train_centroids(empty) == []

    sids = spark.createDataFrame(
        [("doc-a", [1.0, 0.0]), ("doc-b", [0.9, 0.1]), ("doc-c", [-1.0, 0.2])],
        "vec_id string, embedding array<float>",
    )
    pairs = SIM.ivf_near_dup_pairs(sids, threshold=0.9, n_centroids=2, nprobe=2).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {("doc-a", "doc-b")}


def test_connected_components_matches_union_find(spark):
    """Min-label propagation must produce exactly the components a
    driver-side union-find computes — including a long chain (worst
    case for propagation depth) and multi-clique merges."""
    import random

    from geo_explorer_etl_spark.operators.dedup import connected_components

    rnd = random.Random(7)
    edges = [(i, i + 1) for i in range(0, 12)]              # chain 0..12
    edges += [(20 + a, 20 + b) for a in range(5) for b in range(a + 1, 5)]  # clique
    edges += [(24, 30), (30, 31)]                            # merge clique into tail
    edges += [(rnd.randrange(40, 60), rnd.randrange(40, 60)) for _ in range(25)]
    edges = [(a, b) for a, b in edges if a != b]

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(pairs, max_iters=30).collect()
    }
    assert got == expected


def test_keep_representatives_composes_with_pair_generators(spark):
    """End-of-pipeline dedup: exact + near-dup pairs -> clusters -> one
    surviving doc per cluster, singletons untouched, columns intact."""
    from geo_explorer_etl_spark.operators.dedup import keep_representatives

    docs = spark.createDataFrame(
        [
            (1, "the same text"), (2, "the same text"),   # pair (1,2)
            (3, "other text a"), (4, "other text a"),     # pair (3,4)
            (5, "bridges both"),                          # pairs (2,5),(4,5): merges all
            (9, "a singleton"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (2, 5), (4, 5)], "doc_a long, doc_b long"
    )
    kept = keep_representatives(docs, pairs)
    assert {r["doc_id"] for r in kept.collect()} == {1, 9}
    assert set(kept.columns) == {"doc_id", "text"}
    # empty pair set: everything survives
    nop = keep_representatives(
        docs, spark.createDataFrame([], "doc_a long, doc_b long")
    )
    assert nop.count() == 6


def test_minhash_bucket_cap_bounds_degenerate_buckets(spark):
    """A pathological corpus (many copies of one template) floods one
    LSH bucket; max_bucket_size drops the degenerate bucket so the
    candidate count is bounded, while distinct near-dup pairs in
    normal-sized buckets survive."""
    from geo_explorer_etl_spark.operators.dedup import minhash_lsh_candidates

    template = "the quick brown fox jumps over the lazy dog number %d end"
    rows = [(i, "identical boilerplate text repeated verbatim many times over") for i in range(50)]
    rows += [(100, template % 1), (101, template % 1)]  # one true near-dup pair
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = minhash_lsh_candidates(docs, "text", "doc_id").count()
    assert uncapped >= 50 * 49 / 2               # boilerplate quadratic blowup
    capped = minhash_lsh_candidates(docs, "text", "doc_id", max_bucket_size=10)
    capped_pairs = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert (100, 101) in capped_pairs            # real pair survives
    assert len(capped_pairs) < 50                # blowup gone

    # salt mode: over-full buckets shard instead of vanish — PARTIAL
    # recall inside the degenerate bucket (drop gives zero there),
    # bounded per-shard work, and strictly fewer candidates than the
    # uncapped blowup
    salted = minhash_lsh_candidates(
        docs, "text", "doc_id", max_bucket_size=10, overflow="salt"
    )
    salted_pairs = {(r["doc_a"], r["doc_b"]) for r in salted.collect()}
    assert (100, 101) in salted_pairs            # real pair still survives
    boiler = {p for p in salted_pairs if p[0] < 50 and p[1] < 50}
    assert boiler                                 # drop-mode recall floor beaten
    assert len(salted_pairs) < uncapped           # but bounded vs uncapped
    assert len(capped_pairs) <= len(salted_pairs) <= uncapped


@pytest.mark.slow
def test_build_training_corpus_composition(spark):
    """The end-to-end corpus builder: every gate's invariant holds on
    the survivor set, the result is deterministic, and the token budget
    keeps the maximal ascending-id prefix (two-level cumulative sum —
    no global single-partition sort)."""
    from geo_explorer_etl_spark.operators import text as TX
    from geo_explorer_etl_spark.operators.corpus import build_training_corpus

    docs = load_tables(spark, SF_SMOKE, "documents")["documents"]
    kept = build_training_corpus(
        docs,
        languages=("en",),
        min_tokens=5,
        min_distinct_ratio=0.2,
        near_dup=True,
    )
    rows = kept.collect()
    ids = sorted(r["doc_id"] for r in rows)
    assert 0 < len(ids) < docs.count()

    # language gate: every survivor votes en
    langs = {r["lang_guess"] for r in TX.langid(kept, "text", "doc_id").collect()}
    assert langs == {"en"}
    # quality gates hold on survivors
    q = {r["doc_id"]: r for r in TX.quality_scores(kept, "text", "doc_id").collect()}
    assert all(v["n_tokens"] >= 5 and v["distinct_ratio"] >= 0.2 for v in q.values())
    # exact-dup free: one row per content hash
    assert (
        kept.select(F.md5("text")).distinct().count() == len(ids)
    )
    # deterministic: a second build yields the identical survivor set
    ids2 = sorted(
        r["doc_id"]
        for r in build_training_corpus(
            docs, languages=("en",), min_tokens=5, min_distinct_ratio=0.2
        ).collect()
    )
    assert ids2 == ids

    # token budget: maximal ascending-id prefix under the cap
    budget = 5000
    capped = build_training_corpus(
        docs,
        languages=("en",),
        min_tokens=5,
        min_distinct_ratio=0.2,
        token_budget=budget,
        budget_bucket_width=100,  # force multiple buckets
    )
    capped_ids = sorted(r["doc_id"] for r in capped.collect())
    ntok = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in TX.token_counts(kept, "text", "doc_id").collect()
    }
    assert capped_ids == ids[: len(capped_ids)]  # a prefix, in id order
    used = sum(ntok[i] for i in capped_ids)
    assert used <= budget
    if len(capped_ids) < len(ids):  # maximality: the next doc overflows
        assert used + ntok[ids[len(capped_ids)]] > budget


def test_int8_quantized_ann_recall_and_exactness(spark):
    """int8 scalar quantization (the 4x serving-layout lever): with
    rerank >= corpus the two-stage search EQUALS brute force exactly
    (stage 2 is that computation); at the default 4k rerank recall@10
    must stay >= 0.9 on the synthetic corpus; quantized codes bound
    the per-element error by scale/2 and are scale-invariant for
    cosine."""
    from geo_explorer_etl_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_quantized,
        quantize_embeddings,
    )
    from geo_explorer_etl_spark.session import load_tables
    from tests.conftest import SF_SMOKE

    emb = load_tables(spark, SF_SMOKE, "embeddings")["embeddings"]
    n = emb.count()
    serving = quantize_embeddings(emb).localCheckpoint()  # the persisted layout

    exact = cosine_topk(emb, query_vec_id=0, k=10).collect()
    full = cosine_topk_quantized(
        emb, query_vec_id=0, k=10, rerank=n, quantized=serving
    ).collect()
    assert [(r["vec_id"], r["cosine"]) for r in full] == [
        (r["vec_id"], r["cosine"]) for r in exact
    ]

    approx = cosine_topk_quantized(
        emb, query_vec_id=0, k=10, quantized=serving
    ).collect()
    exact_ids = {r["vec_id"] for r in exact}
    hit = len(exact_ids & {r["vec_id"] for r in approx}) / len(exact_ids)
    assert hit >= 0.9
    # surviving candidates carry EXACT cosines (stage 2 rescored them)
    exact_by_id = {r["vec_id"]: r["cosine"] for r in exact}
    for r in approx:
        if r["vec_id"] in exact_by_id:
            assert r["cosine"] == exact_by_id[r["vec_id"]]

    # quantization error bound: |v_i - q_i*scale| <= scale/2 (+fp slack)
    row = quantize_embeddings(emb).filter(F.col("vec_id") == 0).first()
    scale, vec, q = row["scale"], row["embedding"], row["qvec"]
    assert all(
        abs(float(v) - int(c) * scale) <= scale / 2 + 1e-9
        for v, c in zip(vec, q)
    )
    assert all(-127 <= int(c) <= 127 for c in q)

    # degenerate inputs inherit the exact operator's semantics: a
    # missing query id returns empty with cosine_topk's schema; a
    # null-vector corpus row never crashes the int8 stage
    from pyspark.sql import functions as _F

    dirty = emb.unionByName(
        emb.limit(1).select(
            _F.lit(10**9).alias("vec_id"),
            _F.lit(None).cast(emb.schema["embedding"].dataType).alias("embedding"),
            _F.lit(-1).cast(emb.schema["label"].dataType).alias("label"),
        ).select(*emb.columns)
    )
    got = cosine_topk_quantized(dirty, query_vec_id=0, k=10).collect()
    assert len(got) == 10 and all(r["vec_id"] != 10**9 for r in got)
    empty = cosine_topk_quantized(emb, query_vec_id=10**9, k=10)
    assert empty.count() == 0
    assert empty.columns == cosine_topk(emb, query_vec_id=10**9, k=10).columns


def test_pii_scrub_known_answers(spark):
    """Email/IPv4/phone detection + typed-tag redaction, with the
    known-answer strings that pin each pattern — including the phone
    pattern that deliberately stays OUT of the cross-engine oracle
    (Java leftmost-first vs RE2 leftmost-longest can disagree on its
    greedy run)."""
    from geo_explorer_etl_spark.operators.text import pii_scrub

    rows = [
        (1, "contact alice@example.com or bob.smith+x@sub.domain.org today"),
        (2, "server at 10.0.0.1 and backup 192.168.100.200 are up"),
        (3, "call +1 (555) 123-4567 now"),
        (4, "mixed: c@d.io from 8.8.8.8 dial 555-867-5309 ok"),
        (5, "nothing sensitive here"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(df, "text", "doc_id").collect()}

    assert (got[1]["n_emails"], got[1]["n_ipv4"], got[1]["n_phones"]) == (2, 0, 0)
    assert got[1]["redacted"] == "contact <EMAIL> or <EMAIL> today"
    # sequential counts (review r10 wave 6): a >=10-char IPv4 is also
    # a phone-shaped digit run — counted on the IP-redacted text it
    # must NOT register as a phone
    assert (got[2]["n_emails"], got[2]["n_ipv4"], got[2]["n_phones"]) == (0, 2, 0)
    assert got[2]["redacted"] == "server at <IP> and backup <IP> are up"
    assert got[3]["n_phones"] == 1
    assert got[3]["redacted"] == "call <PHONE> now"
    assert got[4]["n_emails"] == 1 and got[4]["n_ipv4"] == 1 and got[4]["n_phones"] == 1
    assert got[4]["redacted"] == "mixed: <EMAIL> from <IP> dial <PHONE> ok"
    assert (got[5]["n_emails"], got[5]["n_ipv4"], got[5]["n_phones"]) == (0, 0, 0)
    assert got[5]["redacted"] == rows[4][1]
    assert got[6]["redacted"] == ""


def test_dup_line_fraction_and_quality_pii_fold(spark):
    """Gopher-style duplicate-line fraction: trimmed, empty lines
    dropped; 0.0 for all-distinct and for empty docs. The quality
    fold surfaces it alongside the PII counts in the one scan."""
    from geo_explorer_etl_spark.operators.text import quality_scores

    rows = [
        (1, "a\nb\na\n\n  a  ", 10),   # lines a,b,a,a -> 2 dup of 4
        (2, "x\ny\nz", 5),             # all distinct
        (3, "", 0),
        (4, "mail me: a@b.co\n1.2.3.4\n1.2.3.4", 20),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars int")
    got = {
        r["doc_id"]: r
        for r in quality_scores(
            df, "text", "doc_id", with_fingerprint=True, with_pii=True
        ).collect()
    }
    assert got[1]["dup_line_fraction"] == 0.5
    assert got[2]["dup_line_fraction"] == 0.0
    assert got[3]["dup_line_fraction"] == 0.0
    assert got[4]["n_emails"] == 1 and got[4]["n_ipv4"] == 2
    assert got[4]["dup_line_fraction"] == round(1 - 2 / 3, 4)


def test_unigram_logprob_known_answers(spark):
    """Corpus-estimated unigram LM scoring: hand-checkable corpus,
    OOV floor, empty-doc null, and the top-K plan property (vocab
    resolves as TakeOrderedAndProject, never a global sort)."""
    import math

    from geo_explorer_etl_spark.operators.text import unigram_logprob

    # corpus: 6 tokens total -> p(a)=3/6, p(b)=2/6, p(c)=1/6
    rows = [(1, "a a b"), (2, "a b c"), (3, ""), (4, "zzz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # vocab_size=2 keeps {a, b}; c and zzz fall to the OOV floor.
    # NOTE: zzz IS part of the corpus, so totals count it: 7 tokens.
    got = {
        r["doc_id"]: r["lm_logprob"]
        for r in unigram_logprob(df, "text", "doc_id", vocab_size=2).collect()
    }
    total = 7.0
    lp = lambda c: math.log(c / total)
    oov = math.log(0.5 / total)
    assert got[1] == round((lp(3) + lp(3) + lp(2)) / 3, 4)
    assert got[2] == round((lp(3) + lp(2) + oov) / 3, 4)
    assert got[3] is None          # token-less doc keeps a null score
    assert got[4] == round(oov, 4)

    # plan property: the vocabulary is a TakeOrderedAndProject (top-K),
    # not a global Sort feeding a Limit
    plan = unigram_logprob(df, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_stride_seed_vectors_sparse_id_fallback(spark):
    """VERDICT r10 'what's wrong' #2: over a sparse/clustered id
    domain the id-strided probe silently yielded fewer than k seeds
    (degraded IVF cells, no warning). Pin the fix: a loud warning plus
    a rank-strided fallback that still returns ~k seeds."""
    import warnings

    from geo_explorer_etl_spark.operators.similarity import stride_seed_vectors

    # dense domain: exact-k seeds, no warning
    dense = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(100)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        seeds = stride_seed_vectors(dense, k=10)
    assert len(seeds) == 10

    # sparse domain (ids clustered far above n): the old arithmetic
    # finds zero seeds; the fallback must warn and still return k
    sparse = spark.createDataFrame(
        [(10_000_019 + 7 * i, [float(i), 1.0]) for i in range(100)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        seeds = stride_seed_vectors(sparse, k=10)
    assert any("sparse id domain" in str(x.message) for x in w)
    assert len(seeds) == 10
    # deterministic: same call, same seeds
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        again = stride_seed_vectors(sparse, k=10)
    assert seeds == again


def test_decontaminate_flags_ngram_overlap_exactly(spark):
    """The Dolma/GPT-3 rule with teeth: a planted doc sharing a full
    13-gram with the eval suite is flagged with the right counts; a
    doc sharing only a 12-gram (n-1) is NOT; tokenization is
    case/whitespace-insensitive like every other shingle operator."""
    from geo_explorer_etl_spark.operators.dedup import decontaminate

    span = " ".join(f"w{i}" for i in range(13))  # the contaminated span
    docs = spark.createDataFrame(
        [
            (1, f"prefix text {span} suffix text"),          # full 13-gram
            (2, "PREFIX TEXT " + span.upper()),               # case variant
            (3, " ".join(f"w{i}" for i in range(12)) + " zz"),  # only 12-gram
            (4, "entirely unrelated document body here"),
            (5, None),                                        # NULL text
        ],
        "doc_id LONG, text STRING",
    )
    eval_df = spark.createDataFrame(
        [(100, f"question: {span} ?"), (101, "another eval item")],
        "eval_id LONG, etext STRING",
    )
    got = {
        r.doc_id: (r.decon_overlap, r.decon_eval_hits)
        for r in decontaminate(
            docs, eval_df, n=13, eval_text_col="etext", eval_id_col="eval_id"
        ).collect()
    }
    assert got == {1: (1, 1), 2: (1, 1)}


def test_decontaminate_counts_multiple_spans_and_eval_hits(spark):
    """Overlap counts are DISTINCT shingles and DISTINCT eval docs —
    a doc hit by two eval items reports both."""
    from geo_explorer_etl_spark.operators.dedup import decontaminate

    a = " ".join(f"a{i}" for i in range(13))
    b = " ".join(f"b{i}" for i in range(13))
    docs = spark.createDataFrame(
        [(1, f"{a} bridge {b}")], "doc_id LONG, text STRING"
    )
    eval_df = spark.createDataFrame(
        [(100, a), (101, b), (102, a)], "doc_id LONG, text STRING"
    )
    [r] = decontaminate(docs, eval_df, n=13).collect()
    assert r.decon_overlap == 2          # the two distinct 13-grams
    assert r.decon_eval_hits == 3        # all three eval docs hit
    assert r.decon_sample == a           # lexicographic min, deterministic


def test_corpus_decontamination_gate_drops_planted_doc(spark):
    """build_training_corpus(eval_df=...): the contaminated doc is
    gone from the corpus, its clean near-identical twin survives, and
    without eval_df the contaminated doc would have survived (the gate
    is the only difference)."""
    from geo_explorer_etl_spark.operators.corpus import build_training_corpus

    span = " ".join(f"s{i}" for i in range(13))
    base = "the a of and to in common words flow through this body "
    docs = spark.createDataFrame(
        [
            (1, base + span),                 # contaminated
            (2, base + "completely clean tail of words"),
            (3, base + "another clean document body"),
        ],
        "doc_id LONG, text STRING",
    ).withColumn("n_chars", F.length("text").cast("long"))
    eval_df = spark.createDataFrame([(9, span)], "doc_id LONG, text STRING")
    kw = dict(languages=("en",), min_tokens=1, near_dup=False)
    with_gate = {
        r.doc_id for r in build_training_corpus(docs, eval_df=eval_df, **kw).collect()
    }
    without_gate = {r.doc_id for r in build_training_corpus(docs, **kw).collect()}
    assert with_gate == {2, 3}
    assert without_gate == {1, 2, 3}


def test_decontaminate_spans_surgical_scrub(spark):
    """VERDICT r12 next #4 (the Dolma span scrub): the planted 13-gram
    span is removed with surrounding text BYTE-identical, an n-1-gram
    overlap is untouched, clean docs pass through with zero counts,
    ± window chars extend the cut, and adjacent matches merge into
    one span."""
    from geo_explorer_etl_spark.operators.dedup import decontaminate_spans

    span = " ".join(f"w{i}" for i in range(13))
    a = " ".join(f"a{i}" for i in range(13))
    docs = spark.createDataFrame(
        [
            (1, f"prefix  text {span} suffix\ttext"),  # odd whitespace kept
            (2, "HEAD " + span.upper() + " TAIL"),      # case-insensitive hit
            (3, " ".join(f"w{i}" for i in range(12)) + " zz"),  # n-1: clean
            (4, f"{a} {span}"),                          # adjacent: one splice
            (5, None),
        ],
        "doc_id LONG, text STRING",
    )
    eval_df = spark.createDataFrame(
        [(100, f"q: {span} ?"), (101, a)], "doc_id LONG, text STRING"
    )
    got = {
        r.doc_id: r
        for r in decontaminate_spans(docs, eval_df, n=13).collect()
    }
    assert got[1].text == "prefix  text  suffix\ttext"
    assert got[1].decon_spans_removed == 1
    assert got[1].decon_chars_removed == len(span)
    assert got[2].text == "HEAD  TAIL"
    assert got[3].text == " ".join(f"w{i}" for i in range(12)) + " zz"
    assert got[3].decon_spans_removed == 0
    # doc 4: both grams match and the extended spans touch via the
    # separating space only when window > 0; at window=0 they are two
    assert got[4].decon_spans_removed == 2
    assert got[4].text == " "
    assert got[5].text is None and got[5].decon_spans_removed == 0

    # window extension merges the adjacent spans into one
    got_w = {
        r.doc_id: r
        for r in decontaminate_spans(docs, eval_df, n=13, window=3).collect()
    }
    assert got_w[4].decon_spans_removed == 1
    assert got_w[4].text == ""
    # window=3 eats 3 chars each side of the span: 'xt ' and ' su'
    assert got_w[1].text == "prefix  te" + "ffix\ttext"


def test_dedup_lines_keep_first_and_counts(spark):
    """Corpus-wide line dedup: the FIRST occurrence by (doc_id, pos)
    survives, later copies drop (cross-doc AND within-doc); lines
    shorter than min_chars are never eligible; chars_removed is the
    exact length delta; a doc losing every line survives as ''."""
    from geo_explorer_etl_spark.operators.dedup import dedup_lines

    dup = "this line is duplicated across documents"
    docs = spark.createDataFrame(
        [
            (1, f"{dup}\nunique first doc line content\n--\n{dup}"),
            (2, f"prefix line of second document\n{dup}\n--"),
            (3, dup),
            (4, "short\n--\nok"),  # nothing eligible, all kept
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r for r in dedup_lines(docs, min_chars=10).collect()
    }
    # doc 1: keeps the first copy, loses its own within-doc repeat
    assert out[1]["clean_text"] == f"{dup}\nunique first doc line content\n--"
    assert out[1]["lines_removed"] == 1
    # doc 2: loses the cross-doc duplicate, keeps short '--'
    assert out[2]["clean_text"] == "prefix line of second document\n--"
    assert out[2]["lines_removed"] == 1
    # doc 3: its only line is a later duplicate -> empty doc survives
    assert out[3]["clean_text"] == ""
    assert out[3]["lines_kept"] == 0 and out[3]["lines_removed"] == 1
    # doc 4: short lines never dedup (even '--' repeated corpus-wide)
    assert out[4]["clean_text"] == "short\n--\nok"
    assert out[4]["lines_removed"] == 0
    for r in out.values():
        assert r["chars_removed"] == (
            len({1: f"{dup}\nunique first doc line content\n--\n{dup}",
                 2: f"prefix line of second document\n{dup}\n--",
                 3: dup, 4: "short\n--\nok"}[r["doc_id"]])
            - len(r["clean_text"])
        )


def test_dedup_lines_matches_naive_reference(spark):
    """Seeded randomized differential vs a pure-Python keep-first
    reference (global (doc_id, pos) order, min_chars gate)."""
    import random as _random

    from geo_explorer_etl_spark.operators.dedup import dedup_lines

    rnd = _random.Random(1309)
    pool = [
        "alpha beta gamma delta epsilon",
        "the quick brown fox jumps over",
        "lorem ipsum dolor sit amet text",
        "x",
        "",
        "short ln",
        "another heavily repeated long line here",
    ]
    corpus = {
        i: "\n".join(rnd.choice(pool) for _ in range(rnd.randint(0, 6)))
        for i in range(1, 21)
    }
    min_chars = 9
    seen: set[str] = set()
    expect = {}
    for i in sorted(corpus):
        kept, removed = [], 0
        for ln in corpus[i].split("\n"):
            if len(ln.strip()) >= min_chars and ln in seen:
                removed += 1
            else:
                kept.append(ln)
                if len(ln.strip()) >= min_chars:
                    seen.add(ln)
        expect[i] = ("\n".join(kept), removed)
    docs = spark.createDataFrame(
        sorted(corpus.items()), ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r
        for r in dedup_lines(docs, min_chars=min_chars).collect()
    }
    assert set(got) == set(expect)
    for i, (clean, removed) in expect.items():
        assert got[i]["clean_text"] == clean, i
        assert got[i]["lines_removed"] == removed, i
        assert got[i]["chars_removed"] == len(corpus[i]) - len(clean), i


def test_gopher_repetition_signals_known_answers(spark):
    """dup_line_char_fraction (char-weighted duplicate lines) and
    top2gram_char_frac (most-frequent positional bigram's char
    coverage, lexicographic tie-break) against hand-computed values."""
    from geo_explorer_etl_spark.operators.text import (
        dup_line_char_fraction_expr,
        top_ngram_char_fraction_expr,
    )

    rows = [
        # "aaaa" duplicated: lines aaaa(4) bb(2) aaaa(4): tot=10 dis=6
        (1, "aaaa\nbb\naaaa"),
        (2, "x y x y x y"),          # top bigram "x y" 3x, len 3 -> 9/11
        (3, "one two three four"),   # all bigrams unique -> 1*len/18
        (4, ""),                     # empty -> both 0.0
        (5, "ab cd ab cd\nab cd ab cd"),  # bigram across lines too
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["dlc"], r["tg"])
        for r in df.select(
            "doc_id",
            dup_line_char_fraction_expr(F.col("text")).alias("dlc"),
            top_ngram_char_fraction_expr(F.col("text"), 2).alias("tg"),
        ).collect()
    }
    assert got[1][0] == round(1 - 6 / 10, 4)
    assert got[2] == (0.0, round(3 * 3 / 11, 4))
    # ties (every bigram count 1): lexicographically smallest gram is
    # "four three"? no - grams are positional: "one two","two three",
    # "three four"; sorted -> "one two" wins; len("one two")=7 -> 7/18
    assert got[3] == (0.0, round(7 / 18, 4))
    assert got[4] == (0.0, 0.0)
    # doc 5: line dup: tot=22 dis=11 -> 0.5; bigrams of the token
    # stream (newline is whitespace): ab cd ab cd ab cd ab cd ->
    # "ab cd" occurs 4x ("cd ab" 3x), len 5 -> 20/23
    assert got[5] == (0.5, round(20 / 23, 4))


def test_dedup_lines_document_scope(spark):
    """scope='document': in-doc repeats drop, cross-doc copies
    survive; bad scope refused."""
    import pytest as _pytest

    from geo_explorer_etl_spark.operators.dedup import dedup_lines

    dup = "this line is duplicated across documents"
    docs = spark.createDataFrame(
        [(1, f"{dup}\nunique\n{dup}"), (2, dup)], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in dedup_lines(docs, min_chars=10, scope="document").collect()
    }
    assert out[1]["clean_text"] == f"{dup}\nunique"
    assert out[1]["lines_removed"] == 1
    assert out[2]["clean_text"] == dup       # cross-doc copy survives
    assert out[2]["lines_removed"] == 0
    with _pytest.raises(ValueError, match="scope"):
        dedup_lines(docs, scope="nope").collect()


def test_dup_ngram_char_fraction_known_answers(spark):
    """TRUE distinct coverage (bounded by 1.0): chars covered by at
    least one duplicated-5-gram occurrence + in-run separators, over
    text length."""
    from geo_explorer_etl_spark.operators.text import (
        dup_ngram_char_fraction_expr,
    )

    rows = [
        # period-5 stream: every position covered -> full coverage 1.0
        (1, "a b c d e a b c d e a b c d e"),
        # "p q r s t" dups at 1/10, "q r s t u" at 2/11 -> covered
        # token positions {1..6, 10..15}: covchars 12, runs 2, ncov 12
        # -> chars 12 + (12-2) = 22; len 29
        (2, "p q r s t u m n o p q r s t u"),
        (3, "one two three four five six"),  # no dup 5-gram -> 0
        (4, "short text"),                   # <5 tokens -> 0
        (5, ""),                             # empty -> 0
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["f"]
        for r in df.select(
            "doc_id", dup_ngram_char_fraction_expr(F.col("text"), 5).alias("f")
        ).collect()
    }
    assert got[1] == 1.0
    assert got[2] == round(22 / 29, 4)
    assert got[3] == 0.0 and got[4] == 0.0 and got[5] == 0.0
    assert all(v <= 1.0 for v in got.values())


def test_dedup_substrings_keeps_first_splices_rest(spark):
    """The Lee-et-al exact-substring rule (window-quantized): a
    planted cross-doc 10-token run keeps its first occurrence by
    (id, pos) and is spliced out of every later one — including a
    WITHIN-doc repeat — BYTE-EXACTLY (VERDICT r14 next #3): only the
    losing windows' exact char spans go; every other byte, including
    whitespace runs, survives untouched. Short shared runs invisible;
    token/char arithmetic exact."""
    from geo_explorer_etl_spark.operators.dedup import dedup_substrings

    run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, f"{run} tail one"),
        (2, f"prefix   two {run} suffix"),          # space run SURVIVES
        (3, f"left {run} mid {run} right"),          # cross-doc + second copy
        (4, "alpha beta gamma delta epsilon short"),  # < window: invisible
        (5, ""),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r["doc_id"]: r for r in dedup_substrings(df, window=10).collect()}
    assert got[1]["clean_text"] == f"{run} tail one"          # first keeps all
    assert got[1]["windows_removed"] == 0
    # byte-exact splice: exactly the run's span goes; the triple space
    # and the separators flanking the removed span stay
    assert got[2]["clean_text"] == "prefix   two  suffix"
    assert got[2]["windows_removed"] == 1
    assert got[2]["tokens_removed"] == 10
    assert got[2]["chars_removed"] == len(run)
    assert got[3]["clean_text"] == "left  mid  right"
    assert got[3]["windows_removed"] == 2
    assert got[3]["tokens_removed"] == 20
    assert got[3]["chars_removed"] == 2 * len(run)
    assert got[4]["clean_text"] == rows[3][1]                 # sub-window run survives
    assert got[5]["clean_text"] == "" and got[6]["clean_text"] is None
    assert all(r["chars_removed"] >= 0 for r in got.values())

    # normalize=True: the r14 oracle basis — single-space rejoin of
    # surviving tokens, chars against the normalized text
    norm = {
        r["doc_id"]: r
        for r in dedup_substrings(df, window=10, normalize=True).collect()
    }
    assert norm[2]["clean_text"] == "prefix two suffix"
    assert norm[2]["chars_removed"] == len(run) + 1           # run + one joiner
    assert norm[3]["clean_text"] == "left mid right"
    assert norm[6]["clean_text"] == ""


def test_dedup_substrings_byte_exact_preserves_formatting(spark):
    """The done-criterion pin (VERDICT r14 next #3): a document with
    tabs, newlines and multi-space runs keeps its EXACT original bytes
    outside spliced spans — and a doc with nothing removed passes
    through byte-identical, not whitespace-normalized (ADVICE r14
    medium)."""
    from geo_explorer_etl_spark.operators.dedup import dedup_substrings

    run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    formatted = f"keep\tthis\n\nexact   layout\n{run}\nand\t\tthis tail too"
    untouched = "no dup here\n\tbut\tlots   of\n layout to preserve intact now"
    df = spark.createDataFrame(
        [(1, f"{run} first copy wins"), (2, formatted), (3, untouched)],
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: r for r in dedup_substrings(df, window=10).collect()}
    # zero-removal docs: byte-identical passthrough
    assert got[3]["clean_text"] == untouched
    assert got[1]["clean_text"] == f"{run} first copy wins"
    # the hit doc: exactly the run's chars go; both flanking newlines
    # and every tab/space-run elsewhere survive
    assert got[2]["clean_text"] == (
        f"keep\tthis\n\nexact   layout\n\nand\t\tthis tail too"
    )
    assert got[2]["chars_removed"] == len(run)
    assert got[2]["tokens_removed"] == 10


def test_dedup_substrings_splice_shuffle_fallback_identical(
    spark, monkeypatch
):
    """VERDICT r15 next #2: the loser broadcast gates on estimated
    PAYLOAD (row + window-start bytes), not row count — pathological
    long-doc losers (few rows, huge _starts arrays) must take the
    shuffled-join fallback, and the fallback's output is byte-equal
    to the broadcast path's."""
    from geo_explorer_etl_spark.operators import dedup as DD

    run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # ONE loser row whose doc repeats the run many times: the row
    # count (1) says broadcast, the window payload says otherwise
    rows = [
        (1, f"{run} original winner"),
        (2, " filler ".join([run] * 120)),
        (3, "clean untouched document body"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    base = {
        r["doc_id"]: tuple(r)
        for r in DD.dedup_substrings(df, window=10).collect()
    }
    assert base[2][2] > 0  # windows_removed: doc 2 is the loser
    monkeypatch.setattr(DD, "SPLICE_BROADCAST_MAX_BYTES", 1)
    forced = {
        r["doc_id"]: tuple(r)
        for r in DD.dedup_substrings(df, window=10).collect()
    }
    assert forced == base


def test_dedup_substrings_within_doc_repeat_and_min_count(spark):
    """A run repeated ONLY inside one doc still dedups (the paper's
    keep-one-copy rule); min_count=3 leaves a twice-occurring run
    alone."""
    from geo_explorer_etl_spark.operators.dedup import dedup_substrings

    run = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(7, f"{run} {run}"), (8, f"other {run} words")],
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: r for r in dedup_substrings(df, window=10).collect()}
    # doc 7 pos 0 is the global winner; its own repeat AND doc 8's copy drop.
    # the straddling windows (ten one, nine ten one ...) occur once each.
    # byte-exact splice: the separator adjoining each removed span stays
    assert got[7]["clean_text"] == f"{run} "
    assert got[8]["clean_text"] == "other  words"
    got3 = {
        r["doc_id"]: r
        for r in dedup_substrings(df, window=10, min_count=3).collect()
    }
    assert got3[7]["windows_removed"] + got3[8]["windows_removed"] == 2
    # (three total occurrences -> winner keeps, two copies removed even
    # at min_count=3; a run occurring only twice would survive)
    df2 = spark.createDataFrame(
        [(9, f"{run} x"), (10, f"y {run}")], "doc_id LONG, text STRING"
    )
    got2 = {
        r["doc_id"]: r
        for r in dedup_substrings(df2, window=10, min_count=3).collect()
    }
    assert got2[9]["windows_removed"] == 0 and got2[10]["windows_removed"] == 0


def test_simhash_pairs_banded_hamming(spark):
    """simhash_pairs (r15): exact w.r.t. the signature — every pair
    within max_hamming lands (pigeonhole: bands = max_hamming + 1),
    nothing beyond it does, identical docs pair at hamming 0, the
    bucket cap drops pathological buckets, and bad bits refuse."""
    import itertools

    import pytest
    from pyspark.sql import functions as F

    from geo_explorer_etl_spark.operators.dedup import simhash, simhash_pairs

    base = " ".join(f"tok{i}" for i in range(60))
    rows = [
        (1, base),
        (2, base),                                  # identical -> hamming 0
        (3, base + " extra few words here"),        # near-dup of 1/2
        (4, " ".join(f"other{i}" for i in range(60))),  # far
        (5, None),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(df, "text", "doc_id", bits=48, max_hamming=3).collect()
    }
    assert got.get((1, 2)) == 0
    # ground truth: brute-force hamming over the signatures — the
    # banded join must find EXACTLY the pairs within the threshold
    sig = {
        r["doc_id"]: r["simhash48"]
        for r in simhash(df, "text", "doc_id", bits=48).collect()
    }
    want = {
        (a, b): bin(sig[a] ^ sig[b]).count("1")
        for a, b in itertools.combinations(sorted(sig), 2)
        if bin(sig[a] ^ sig[b]).count("1") <= 3
    }
    assert got == want
    # NULL and empty text both signature deterministically (5 vs 6:
    # NULL -> all-zero, '' -> md5('') votes)
    assert 5 in sig and 6 in sig
    # bucket cap: every doc shares every band in a clone corpus -> a
    # cap of 2 drops the 4-clone buckets entirely
    clones = spark.createDataFrame(
        [(i, base) for i in range(4)], "doc_id LONG, text STRING"
    )
    assert (
        simhash_pairs(clones, "text", "doc_id", bits=48, max_hamming=3,
                      max_bucket_size=2).count() == 0
    )
    with pytest.raises(ValueError, match="bits=128"):
        simhash_pairs(df, "text", "doc_id", bits=128)
    with pytest.raises(ValueError, match="overflow"):
        simhash_pairs(df, "text", "doc_id", overflow="explode")


def test_simhash_wide_matches_simhash_and_widens(spark):
    """simhash_wide (VERDICT r15 next #1b): for bits ≤ 60 the
    explode-aggregate shape reproduces ``simhash``'s single-word
    signature EXACTLY (sh1 = 0); for bits > 60 the second md5 word
    populates, NULL text stays all-zero, and the shared band-spec
    helpers cover the full bit space with the straddling band split
    across both words."""
    from pyspark.sql import functions as F

    from geo_explorer_etl_spark.operators.dedup import (
        simhash,
        simhash_band_specs,
        simhash_band_val,
        simhash_wide,
    )

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "the   quick\tbrown\nfox"),
        (3, ""),
        (4, None),
        (5, "ALPHA Beta gamma DELTA"),  # case-folds to doc 1's tokens
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    for bits in (16, 48, 60):
        narrow = {
            r["doc_id"]: r[f"simhash{bits}"]
            for r in simhash(df, "text", "doc_id", bits=bits).collect()
        }
        wide = {
            r["doc_id"]: (r["sh0"], r["sh1"])
            for r in simhash_wide(df, "text", "doc_id", bits=bits).collect()
        }
        assert {k: v[0] for k, v in wide.items()} == narrow, bits
        assert all(v[1] == 0 for v in wide.values())
    w96 = {
        r["doc_id"]: (r["sh0"], r["sh1"])
        for r in simhash_wide(df, "text", "doc_id", bits=96).collect()
    }
    assert w96[4] == (0, 0)                      # NULL text -> all-zero
    assert w96[1] == w96[5]                      # tokenizer case-folds
    assert any(v[1] != 0 for v in w96.values())  # word 1 in play
    assert all(0 <= v[0] < (1 << 60) and 0 <= v[1] < (1 << 36) for v in w96.values())
    # band specs tile [0, bits) contiguously; band values reassemble
    # the signature (straddle arithmetic is exact)
    specs = simhash_band_specs(96, 3)
    assert [s[1] for s in specs] == [0, 24, 48, 72] and specs[-1][2] == 96
    vals = df.select(F.col("doc_id")).join(
        simhash_wide(df, "text", "doc_id", 96), "doc_id"
    ).select(
        "doc_id", "sh0", "sh1",
        *[
            simhash_band_val(lo, hi, F.col("sh0"), F.col("sh1")).alias(f"b{b}")
            for b, lo, hi in specs
        ],
    ).collect()
    for r in vals:
        full = r["sh0"] | (r["sh1"] << 60)
        for b, lo, hi in specs:
            assert r[f"b{b}"] == (full >> lo) % (1 << (hi - lo))


@pytest.mark.slow
def test_simhash_pairs_wide_bits_exact_and_skew_capped(spark):
    """The r15 done-criteria (next #1): at bits=96 the banded join is
    still EXACT against two-word brute force; a pathological
    100k-identical-doc corpus completes under the FINITE DEFAULT cap
    with the drops counted in the report (never silent); salt mode
    keeps a bounded-recall floor with hamming-0 pairs intact."""
    import itertools

    from geo_explorer_etl_spark.operators.dedup import (
        simhash_pairs,
        simhash_wide,
    )

    base = " ".join(f"tok{i}" for i in range(60))
    rows = [
        (1, base),
        (2, base),
        (3, base + " extra few words here"),
        (4, " ".join(f"other{i}" for i in range(60))),
        (5, None),
        (6, ""),
        (7, base + " extra few words there"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(
            df, "text", "doc_id", bits=96, max_hamming=8
        ).collect()
    }
    sig = {
        r["doc_id"]: r["sh0"] | (r["sh1"] << 60)
        for r in simhash_wide(df, "text", "doc_id", bits=96).collect()
    }
    want = {
        (a, b): bin(sig[a] ^ sig[b]).count("1")
        for a, b in itertools.combinations(sorted(sig), 2)
        if bin(sig[a] ^ sig[b]).count("1") <= 8
    }
    assert got == want and got.get((1, 2)) == 0

    # skew: 100k identical docs -> every band bucket holds all 100k
    # rows; the DEFAULT cap drops them all, the join emits nothing,
    # and the report carries the counts
    clones = spark.range(100_000).selectExpr(
        "id AS doc_id", f"'{base}' AS text"
    )
    rep: dict = {}
    assert (
        simhash_pairs(clones, "text", "doc_id", bits=96, report=rep).count()
        == 0
    )
    assert rep["overflow"] == "drop"
    assert rep["overfull_buckets"] == 4          # one per band
    assert rep["overfull_rows"] == 4 * 100_000

    # salt: shards bound every task at ~cap docs and keep ~1/shards
    # of the bucket's pairs — identical docs, so every surviving pair
    # verifies at hamming 0
    small = spark.range(300).selectExpr("id AS doc_id", f"'{base}' AS text")
    rep2: dict = {}
    pairs = simhash_pairs(
        small, "text", "doc_id", bits=96, max_bucket_size=50,
        overflow="salt", report=rep2,
    ).collect()
    assert rep2["overflow"] == "salt" and rep2["overfull_rows"] == 4 * 300
    n_all = 300 * 299 // 2
    assert 0 < len(pairs) < n_all                # partial, non-zero recall
    assert all(r["hamming"] == 0 for r in pairs)

    # scale-shape pin: the wide banded join stays a hash equi-join —
    # no CartesianProduct/BroadcastNestedLoop at any bits width
    plan = (
        simhash_pairs(df, "text", "doc_id", bits=96)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
