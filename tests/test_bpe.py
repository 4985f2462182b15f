"""Real BPE tokenization (operators/bpe.py) — VERDICT r10 directive
#4: hand-checkable merges on the classic corpus, deterministic
training, Arrow-batched encoding, and sequence packing over REAL
counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geo_explorer_etl_spark.operators import text as TX
from geo_explorer_etl_spark.operators.bpe import (
    EOW,
    bpe_apply_word,
    bpe_encode_counts,
    train_bpe,
)


def _classic_corpus(spark):
    """The Sennrich walk-through corpus: word frequencies
    low×5 lower×2 newest×6 widest×3."""
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    return spark.createDataFrame(
        [(1, " ".join(words))], "doc_id LONG, text STRING"
    )


def test_train_bpe_classic_known_answer(spark):
    """First merges, hand-derivable: pair counts over
    {low:5, lower:2, newest:6, widest:3} + </w> give
    ('e','s')=9 as the unique max, then ('es','t')=9, then
    ('est','</w>')=9, then ('l','o')=7, then ('lo','w')=7."""
    merges = train_bpe(_classic_corpus(spark), num_merges=5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", EOW),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_train_bpe_deterministic(spark):
    df = _classic_corpus(spark)
    assert train_bpe(df, num_merges=8) == train_bpe(df, num_merges=8)


def test_bpe_apply_word_known_answers(spark):
    merges = train_bpe(_classic_corpus(spark), num_merges=5)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    # lowest: l+o -> lo, lo+w -> low? no — 'low' merge is (lo,w): parts
    # l o w e s t </w> -> es -> est -> (no est</w>: 't' isn't last) ...
    assert bpe_apply_word("low", ranks) == ["low", EOW]
    assert bpe_apply_word("newest", ranks) == ["n", "e", "w", "est" + EOW]
    assert bpe_apply_word("widest", ranks) == ["w", "i", "d", "est" + EOW]
    assert bpe_apply_word("lower", ranks) == ["low", "e", "r", EOW]
    # unseen word: falls back to characters + EOW (open vocabulary)
    assert bpe_apply_word("zq", ranks) == ["z", "q", EOW]


def test_bpe_encode_counts_and_token_counts_fold(spark):
    corpus = _classic_corpus(spark)
    merges = train_bpe(corpus, num_merges=5)
    docs = spark.createDataFrame(
        [
            (1, "low lower"),      # [low </w>] + [low e r </w>] = 2 + 4
            (2, "newest widest"),  # [n e w est</w>] + [w i d est</w>] = 4 + 4
            (3, ""),
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_encode_counts(docs, merges).collect()
    }
    assert got == {1: 6, 2: 8, 3: 0}
    # the token_counts front-end: same counts + the regex ws count
    tc = {
        r.doc_id: (r.n_bpe_tokens, r.n_ws_tokens)
        for r in TX.token_counts(
            docs, "text", "doc_id", method="bpe_vocab", merges=merges
        ).collect()
    }
    # n_ws_tokens on "" is 1 — split-of-empty yields one empty token,
    # the same behavior as the regex method (consistency pin)
    assert tc == {1: (6, 2), 2: (8, 2), 3: (0, 1)}
    with pytest.raises(ValueError, match="needs a trained merges"):
        TX.token_counts(docs, "text", "doc_id", method="bpe_vocab")


def test_pack_offsets_over_real_bpe_counts(spark):
    """The packing fold re-verified with REAL counts (the directive's
    'done' condition): offsets are the exclusive prefix sum of the
    true BPE lengths in id order, and every doc lands in the right
    window."""
    corpus = _classic_corpus(spark)
    merges = train_bpe(corpus, num_merges=5)
    docs = spark.createDataFrame(
        [(i, "low lower newest " * (i + 1)) for i in range(50)],
        "doc_id LONG, text STRING",
    )
    counts = TX.token_counts(docs, "text", "doc_id", method="bpe_vocab", merges=merges)
    packed = TX.pack_offsets(counts, "n_bpe_tokens", "doc_id", window=64).collect()
    by_id = {r.doc_id: r for r in packed}
    # differential against a driver-side exclusive cumsum
    lens = {r.doc_id: r.n_bpe_tokens for r in counts.collect()}
    run = 0
    for i in range(50):
        assert by_id[i].pack_offset == run
        assert by_id[i].pack_first == run // 64
        assert by_id[i].pack_last == (run + lens[i] - 1) // 64
        run += lens[i]


def test_save_load_merges_roundtrip(tmp_path):
    from geo_explorer_etl_spark.operators.bpe import load_merges, save_merges

    # '#' is a legitimate merge token (code/markdown corpora): only the
    # first-line '#version' header is a comment — a blanket '#' rule
    # silently dropped such merges and the reloaded vocab tokenized
    # differently (review r11)
    m = [("e", "s"), ("es", "t"), ("est", EOW), ("#", EOW), ("#", "#")]
    p = str(tmp_path / "merges.txt")
    save_merges(m, p)
    assert load_merges(p) == m
    # malformed lines refused
    (tmp_path / "bad.txt").write_text("#version: x\na b c\n")
    with pytest.raises(ValueError, match="malformed"):
        load_merges(str(tmp_path / "bad.txt"))


def test_token_counts_bpe_single_pass_no_join(spark):
    """The ws count rides the one mapInPandas scan — no second corpus
    read, no re-join on doc id (review r11): the plan carries no join
    and exactly one scan of the input."""
    merges = train_bpe(_classic_corpus(spark), num_merges=5)
    docs = spark.createDataFrame(
        [(1, "low lower")], "doc_id LONG, text STRING"
    )
    df = TX.token_counts(docs, "text", "doc_id", method="bpe_vocab", merges=merges)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    got = df.collect()[0]
    assert (got.n_bpe_tokens, got.n_ws_tokens) == (6, 2)
