"""Property-based tests (SURVEY §5.3) — hypothesis generates inputs,
a pure-Python model predicts the result, one Spark job per example
batch checks the column expressions agree with the model."""

from __future__ import annotations

import re

from hypothesis import example, given, settings, strategies as st
from pyspark.sql import functions as F

from geo_explorer_etl_spark.functions import (
    dguid_repair,
    generic_wildcard_code,
    ref_year_normalize,
    strip_sort_prefix,
)


def run_batch(spark, expr_builder, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [r["out"] for r in df.select(expr_builder().alias("out")).collect()]


# -- D2 ref-year ----------------------------------------------------------
def model_ref_year(s: str) -> int:
    if re.fullmatch(r"\d{4}", s):
        return int(s)
    if re.fullmatch(r"\d{4}/\d{2}", s):
        return int(s[:2] + s[5:7])
    if re.fullmatch(r"\d{4}/\d{4}", s):
        return int(s[5:9])
    return 1900


ref_date_strategy = st.one_of(
    st.integers(1900, 2100).map(str),
    st.integers(1900, 2099).map(lambda y: f"{y}/{(y + 1) % 100:02d}"),
    st.integers(1900, 2099).map(lambda y: f"{y}/{y + 1}"),
    st.text(
        alphabet="0123456789/ab", min_size=0, max_size=12
    ),  # junk incl. near-misses
)


@settings(max_examples=12, deadline=None)
@given(st.lists(ref_date_strategy, min_size=1, max_size=30))
def test_ref_year_property(spark, inputs):
    got = run_batch(
        spark, lambda: ref_year_normalize(F.col("s")), [(x,) for x in inputs], "s string"
    )
    assert got == [model_ref_year(x) for x in inputs]


# -- F5 DGUID repair ------------------------------------------------------
def model_dguid_repair(dguid: str, year: int) -> str:
    """Reference-derived model of fix_dguid (dfhandler.py:597–617):
    six sequential unanchored literal replaces."""
    if len(dguid) < 10:
        vintage = "2016" if year < 2016 else str(year)
        dguid = f"{vintage}A0025{dguid}"
    dguid = dguid.replace("2011B", "2011S")
    dguid = dguid.replace("2011S05031", "2011S0503001")
    if year >= 2016:
        dguid = dguid.replace("2011S0503", f"{year}S0503")
    dguid = dguid.replace("2011S0503522", "2011S0504522")
    dguid = dguid.replace("2011S0503810", "2011S0504810")
    return dguid


dguid_strategy = st.one_of(
    st.text(alphabet="0123456789AB", min_size=0, max_size=9),          # short ids
    st.text(alphabet="0123456789", min_size=2, max_size=6).map(lambda s: "2011B" + s),
    st.text(alphabet="0123456789", min_size=1, max_size=6).map(lambda s: "2011S05031" + s),
    st.text(alphabet="0123456789", min_size=2, max_size=6).map(lambda s: "2011S0503" + s),
    st.sampled_from(["2011S0503522", "2011S0503810", "2011S0504522"]),
    st.text(alphabet="0123456789AS", min_size=10, max_size=18),
)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(dguid_strategy, st.integers(2000, 2030)), min_size=1, max_size=30
    )
)
def test_dguid_repair_property(spark, pairs):
    got = run_batch(
        spark,
        lambda: dguid_repair(F.col("d"), F.col("y")),
        pairs,
        "d string, y int",
    )
    assert got == [model_dguid_repair(d, y) for d, y in pairs]


# -- F16 generic wildcard -------------------------------------------------
def model_wildcard(coord: str) -> str | None:
    # reference set_generic_indicator_code (dfhandler.py:637-644)
    parts = coord.split(".")
    if len(parts) <= 3:
        return None
    return ".".join(parts[: len(parts) - 3]) + ".%." + ".".join(parts[-2:])


coord_strategy = st.lists(
    st.integers(0, 99).map(str), min_size=1, max_size=8
).map(".".join)


@settings(max_examples=12, deadline=None)
@given(st.lists(coord_strategy, min_size=1, max_size=30))
def test_generic_wildcard_property(spark, coords):
    got = run_batch(
        spark,
        lambda: generic_wildcard_code(F.col("c")),
        [(c,) for c in coords],
        "c string",
    )
    assert got == [model_wildcard(c) for c in coords]


# -- F1 sort prefix -------------------------------------------------------
# The model IS the reference computation (dfhandler.py:55–57): sub the
# 0..999-with-zero-padding prefix pattern, then Python ``.lstrip()``.
# ``^(?:\d{1,3}|0\d{3})\.`` is exhaustively equivalent to the reference's
# alternation over every digit string of length 1–5.
_REF_SORT_PREFIX = r"^(?:\d{1,3}|0\d{3})\."


def model_strip_sort_prefix(raw: str) -> str:
    return re.sub(_REF_SORT_PREFIX, "", raw).lstrip()


@settings(max_examples=12, deadline=None)
@example(items=[(0, " ")])  # round-4 falsifier: "00.  " -> "" (lstrip)
@example(items=[(None, "  Abc")])  # unprefixed names lstrip too
@example(items=[(1000, "X")])  # "1000." is NOT a prefix in the reference
@example(items=[(999, "X"), (None, " nbsp")])  # unicode whitespace
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 1000)),
            st.text(
                alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Zs")),
                min_size=0,
                max_size=20,
            ),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_strip_sort_prefix_property(spark, items):
    rows, expected = [], []
    for prefix_num, name in items:
        raw = name if prefix_num is None else f"{prefix_num:02d}. {name}"
        expected.append(model_strip_sort_prefix(raw))
        rows.append((raw,))
    got = run_batch(spark, lambda: strip_sort_prefix(F.col("s")), rows, "s string")
    assert got == expected


# -- zone-map pruning soundness ------------------------------------------
# _file_may_match may only return False when NO value in [mn, mx] can
# satisfy the predicate — pure-Python exhaustive witness check over an
# integer domain (no Spark job needed; the read path re-applies the
# predicate, so the only way skipping can be WRONG is a false negative
# here).
def _pred_holds(w, op, v) -> bool:
    return {
        "==": w == v,
        "!=": w != v,
        ">=": w >= v,
        ">": w > v,
        "<=": w <= v,
        "<": w < v,
    }[op]


@settings(max_examples=300, deadline=None)
@example(mn=0, span=0, v=0, op="==")          # point file, point predicate
@example(mn=5, span=0, v=5, op=">")           # boundary: strict op at edge
@example(mn=5, span=0, v=5, op=">=")
@given(
    mn=st.integers(-50, 50),
    span=st.integers(0, 20),
    v=st.integers(-60, 60),
    op=st.sampled_from(["==", "!=", ">=", ">", "<=", "<"]),
)
def test_zone_map_pruning_never_drops_a_matching_file(mn, span, v, op):
    from geo_explorer_etl_spark.sources.store import _file_may_match

    mx = mn + span
    kept = _file_may_match({"c": [mn, mx]}, [("c", op, v)])
    some_row_matches = any(_pred_holds(w, op, v) for w in range(mn, mx + 1))
    if some_row_matches:
        assert kept  # skipping a file with a matching row would lose rows


@settings(max_examples=200, deadline=None)
@given(
    mn=st.integers(-50, 50),
    span=st.integers(0, 20),
    lo=st.integers(-60, 60),
    width=st.integers(0, 30),
)
def test_zone_map_between_pruning_sound(mn, span, lo, width):
    from geo_explorer_etl_spark.sources.store import _file_may_match

    mx, hi = mn + span, lo + width
    kept = _file_may_match({"c": [mn, mx]}, [("c", "between", (lo, hi))])
    some_row_matches = any(lo <= w <= hi for w in range(mn, mx + 1))
    if some_row_matches:
        assert kept


# -- bloom filter soundness ---------------------------------------------------
# A bloom may only answer "definitely absent" for values NOT in the
# committed set: every committed value must admit (no false negative,
# ever) — a false positive merely keeps a file, which is always safe.


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(
        st.one_of(
            st.integers(-(10**12), 10**12),
            st.text(max_size=30),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
        ),
        min_size=1,
        max_size=200,
    ),
    probe=st.integers(-(10**12), 10**12),
)
def test_bloom_never_false_negative(vals, probe):
    import base64

    from geo_explorer_etl_spark.sources.store import (
        BLOOM_K,
        _bloom_key,
        _bloom_may_contain,
        _bloom_positions,
    )

    keys = {k for k in (_bloom_key(v) for v in vals) if k is not None}
    if not keys:
        return
    m = max(64, 1 << (len(keys) * 10 - 1).bit_length())
    bits = bytearray(m // 8)
    for kk in keys:
        for pos in _bloom_positions(kk, BLOOM_K, m):
            bits[pos >> 3] |= 1 << (pos & 7)
    bloom = {"m": m, "k": BLOOM_K, "b64": base64.b64encode(bytes(bits)).decode()}
    # THE PROPERTY: every committed value admits
    for v in vals:
        assert _bloom_may_contain(bloom, v)
    # integral float / int cross-representation admits too (Spark's
    # numeric equality crosses long/double)
    for v in vals:
        if isinstance(v, int):
            assert _bloom_may_contain(bloom, float(v)) or not float(
                v
            ).is_integer()
    # an undecodable bloom body keeps the file (conservative)
    assert _bloom_may_contain({"m": 64, "k": 7, "b64": "!!!"}, probe)


@settings(max_examples=200, deadline=None)
@given(
    mn=st.integers(-50, 50),
    span=st.integers(0, 20),
    vals=st.lists(st.integers(-60, 60), min_size=0, max_size=8),
)
def test_zone_map_in_pruning_sound(mn, span, vals):
    """The ``in`` op (point-SET predicate): a file may only be dropped
    when EVERY set member provably misses [mn, mx] — one member inside
    the range keeps it, and the empty set never prunes (conservative)."""
    from geo_explorer_etl_spark.sources.store import _file_may_match

    mx = mn + span
    kept = _file_may_match({"c": [mn, mx]}, [("c", "in", vals)])
    some_row_matches = any(mn <= v <= mx for v in vals)
    if some_row_matches or not vals:
        assert kept
