"""Real byte-pair-encoding tokenization — VERDICT r10 directive #4.

``token_counts``' regex method approximates what a trainer sees;
``pack_offsets`` therefore packed approximate counts. This module adds
a vocab-file-driven BPE (the Sennrich/GPT-2 construction) so packing
can use the counts a training run actually produces:

- ``train_bpe``     — learn a merges table from a corpus DataFrame.
  The WORD-FREQUENCY reduction is distributed (pre-tokenize → groupBy
  → top-``max_words`` by count, a map-side-combined aggregate +
  TakeOrdered — the only corpus-sized work); the merge loop itself
  runs driver-side over that bounded frequency dict, exactly the
  classical algorithm (each merge depends on the previous one — it is
  sequential by definition, and its input is ``max_words`` rows, not
  the corpus).
- ``bpe_encode_counts`` — apply a merges table to a DataFrame via ONE
  Arrow-batched ``mapInPandas`` (the merges ride the closure —
  broadcast by Spark's task serialization; a per-batch word→tokens
  memo makes the common case a dict hit since natural text repeats
  words heavily). Row-at-a-time Python never touches the hot loop's
  data transfer: batches arrive and leave as Arrow.
- ``token_counts(method="bpe_vocab")`` in operators/text.py consumes
  this module, and ``pack_offsets`` packs the real counts
  (pytest-pinned).

Determinism: merge selection breaks count ties lexicographically, so
the same corpus always yields the same merges; encoding is a pure
function of (merges, text). Known-answer pytest pins hand-checkable
merges on the classic low/lower/newest/widest corpus.

Scale shape: training = one shuffle (word counts) + a driver loop over
``max_words`` rows; encoding = zero shuffle (row-local mapInPandas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_explorer_etl_spark.operators.text import BPE_TOKEN_RE

#: Pre-tokenizer: THE SAME word/number/punct split the regex counter
#: uses — imported, not re-declared, so the approximate and real
#: counts can never diverge on the split rule (review r11); merges
#: never cross pre-token boundaries, the GPT-2 rule.
PRETOKEN_RE = BPE_TOKEN_RE
#: End-of-word marker (Sennrich): lets the vocab distinguish "est" in
#: "estimate" from the suffix "est</w>" in "lowest".
EOW = "</w>"


def _word_counts(df: DataFrame, text_col: str, max_words: int) -> list[tuple[str, int]]:
    """Distributed (word, count) top-``max_words``: explode the
    pre-tokens, one map-side-combined groupBy, TakeOrderedAndProject.
    Deterministic: ties on count break by word."""
    rows = (
        df.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_RE), 0)
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    return [(r["w"], int(r["c"])) for r in rows]


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 256,
    max_words: int = 100_000,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn a ranked merges table (earlier = higher priority). The
    classical frequency-weighted pair-merge loop over the corpus's
    word-frequency table; stops early when no pair reaches
    ``min_pair_count``."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (EOW,): c for w, c in _word_counts(df, text_col, max_words)
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for word, c in vocab.items():
            for i in range(len(word) - 1):
                pairs[word[i], word[i + 1]] = pairs.get((word[i], word[i + 1]), 0) + c
        if not pairs:
            break
        # count DESC, then lexicographic ASC tie-break (determinism)
        best_count = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == best_count)
        if best_count < min_pair_count:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for word, c in vocab.items():
            out = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def bpe_apply_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE pre-token: repeatedly merge the lowest-rank adjacent
    pair — the standard greedy BPE apply. Pure function; driver- and
    executor-safe."""
    parts = list(word) + [EOW]
    while len(parts) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


def bpe_encode_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    with_tokens: bool = False,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document REAL BPE token counts (optionally the token string
    array) via one Arrow-batched ``mapInPandas``. The merges table
    rides the task closure; a per-batch word→len memo collapses the
    per-word cost to a dict hit for repeated words (Zipf makes that
    the common case). ``carry_cols`` pass through unchanged — callers
    attach Spark-computed columns (token_counts' whitespace count)
    WITHOUT a second corpus scan and a re-join (review r11)."""
    import re

    carry = list(carry_cols or [])
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    pretoken = re.compile(PRETOKEN_RE)
    carry_schema = "".join(
        f", {f.name} {f.dataType.simpleString()}"
        for f in df.select(*carry).schema.fields
    )
    out_fields = f"{id_col} LONG, n_bpe_tokens LONG" + carry_schema
    if with_tokens:
        out_fields += ", bpe_tokens ARRAY<STRING>"

    def encode(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def word_tokens(w: str) -> list[str]:
            hit = memo.get(w)
            if hit is None:
                hit = memo[w] = bpe_apply_word(w, ranks)
            return hit

        for pdf in batches:
            counts = []
            toks_out = []
            for text in pdf[text_col]:
                n = 0
                toks: list[str] = []
                if text is not None:
                    for w in pretoken.findall(str(text)):
                        t = word_tokens(w)
                        n += len(t)
                        if with_tokens:
                            toks.extend(t)
                counts.append(n)
                if with_tokens:
                    toks_out.append(toks)
            out = {id_col: pdf[id_col], "n_bpe_tokens": counts}
            for c in carry:
                out[c] = pdf[c]
            if with_tokens:
                out["bpe_tokens"] = toks_out
            yield pd.DataFrame(out)

    return df.select(id_col, text_col, *carry).mapInPandas(encode, out_fields)


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    """Persist a merges table as the standard one-merge-per-line text
    format (rank = line order — the GPT-2 ``merges.txt`` layout), so a
    vocabulary trained once is reusable across sessions and engines.
    Written atomically (tmp + rename): a crash never leaves a torn
    vocab that would silently tokenize differently."""
    import os

    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write("#version: geo_explorer_etl_spark bpe\n")
        for a, b in merges:
            fh.write(f"{a} {b}\n")
    os.replace(tmp, path)


def load_merges(path: str) -> list[tuple[str, str]]:
    """Read a merges table written by ``save_merges`` (or any
    merges.txt-shaped file: optional #-comment header, one
    space-separated pair per line)."""
    merges: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as fh:
        for i, line in enumerate(fh):
            line = line.rstrip("\n")
            # ONLY the first-line '#version' header is a comment (the
            # GPT-2 merges.txt convention): '#' is a legitimate merge
            # token — skipping every '#'-prefixed line silently
            # dropped merges learned from code/markdown corpora and
            # the reloaded vocab tokenized differently (review r11)
            if not line or (i == 0 and line.startswith("#version")):
                continue
            parts = line.split(" ")
            if len(parts) != 2:
                raise ValueError(
                    f"load_merges({path!r}): malformed line {line!r} — "
                    "expected exactly one space-separated pair"
                )
            merges.append((parts[0], parts[1]))
    return merges
