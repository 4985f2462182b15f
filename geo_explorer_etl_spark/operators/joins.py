"""Join operators (SURVEY.md §2.3, J1–J15).

Scale notes baked into every helper:

- Lookup/dimension right sides are small by construction (code sets,
  geography reference, member lists) -> ``F.broadcast`` hints so the
  100 TB fact side never shuffles for them.
- Anti-joins implement the reference's "only new rows" incrementals
  (reference dfhandler.py:119–123, 169–173) — at scale these are
  broadcast-anti (current dimension state is small) so appends stay
  shuffle-free.
- The member cross-product (reference dfhandler.py:75–84 itertools)
  builds coordinates and display names in ONE DataFrame — the Spark
  build must never rely on implicit row order to zip parallel lists
  (SURVEY.md §7 hard part #1).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def broadcast_lookup(
    fact: DataFrame,
    lookup: DataFrame,
    on,
    how: str = "left",
) -> DataFrame:
    """J1/J2/J3/J5/J6/J9 — fact x small-lookup equi-join, broadcast so
    the big side never shuffles (reference pandas merges e.g.
    dfhandler.py:447–450, 453–454, 99, 164)."""
    return fact.join(F.broadcast(lookup), on, how)


def inner_with_orphans(
    fact: DataFrame, lookup: DataFrame, fact_key: str, lookup_key: str
) -> tuple[DataFrame, DataFrame]:
    """J1 + J12 — inner-join semantics with orphan capture: the
    reference left-joins values to GeographyReference, drops non-matches
    and warns about the orphan DGUIDs (dfhandler.py:447–450, 556–559,
    694–705). One broadcast each; orphans as a distinct left_anti."""
    cond = fact[fact_key] == lookup[lookup_key]
    matched = fact.join(F.broadcast(lookup), cond, "inner")
    orphans = (
        fact.join(F.broadcast(lookup), cond, "left_anti")
        .select(fact_key)
        .distinct()
    )
    return matched, orphans


def anti_new_rows(
    incoming: DataFrame,
    existing: DataFrame,
    keys: list[str],
    broadcast_state: bool = True,
) -> DataFrame:
    """J7/J8 — keep only rows whose key (simple or composite) is absent
    from the existing state (new ref-dates dfhandler.py:119–123; new
    geo-levels dfhandler.py:169–173). The default broadcasts the
    existing side — right for the reference's DIMENSION-sized state —
    but a FACT-sized existing side must pass ``broadcast_state=False``:
    forcing a broadcast there collects the whole distinct key set to
    the driver, the one shape that cannot survive 100 TB (review r10 —
    the fact-vs-fact bench twin carried the highest scale exponent for
    exactly this reason). With the hint off, AQE picks shuffle-anti,
    and still converts to broadcast at runtime when the built side
    turns out small."""
    state = existing.select(*keys).distinct()
    if broadcast_state:
        state = F.broadcast(state)
    return incoming.join(state, keys, "left_anti")


def semi_exists(
    df: DataFrame, ids: DataFrame, key: str, broadcast_ids: bool = True
) -> DataFrame:
    """J11 — 'product exists' membership (reference scdb.py:161–172
    SELECT DISTINCT ... IN (...)). Same sizing rule as
    ``anti_new_rows``: broadcast by default (the reference probes a
    product-id set), ``broadcast_ids=False`` for fact-sized id sets."""
    key_ids = ids.select(key).distinct()
    if broadcast_ids:
        key_ids = F.broadcast(key_ids)
    return df.join(key_ids, key, "left_semi")


def member_cross_product(
    dims: list[DataFrame],
    id_col: str = "member_id",
    name_col: str = "member_name",
    sep_names: str = " _ ",
    sep_coord: str = ".",
) -> DataFrame:
    """J13 — combinatorial expansion of per-dimension member lists into
    one row per combination, with the dotted coordinate and the
    separator-joined display name built in the SAME row (reference
    itertools.product, dfhandler.py:75–84, 252–265).

    Each input frame is one dimension's member list. The chained
    crossJoin keeps ids and names in one schema — no zip-by-row-order.
    All inputs are tiny (member lists), so every crossJoin is a
    broadcast nested loop; the combination count is the product of
    member counts, still dimension-sized, and only explodes against the
    date series later (date_fanout).
    """
    renamed = [
        d.select(
            F.col(id_col).cast("string").alias(f"_id_{i}"),
            F.col(name_col).alias(f"_nm_{i}"),
        )
        for i, d in enumerate(dims)
    ]
    combos = reduce(lambda a, b: a.crossJoin(F.broadcast(b)), renamed)
    n = len(dims)
    cols = [
        F.concat_ws(sep_coord, *[F.col(f"_id_{i}") for i in range(n)]).alias("coordinate")
    ]
    # joined display names only when names are plain strings; struct
    # names (e.g. en/fr/uom bundles) stay per-dimension for the caller
    if dict(dims[0].dtypes)[name_col] == "string":
        cols.append(
            F.concat_ws(sep_names, *[F.col(f"_nm_{i}") for i in range(n)]).alias(
                "member_names"
            )
        )
    return combos.select(
        *cols,
        *[F.col(f"_id_{i}") for i in range(n)],
        *[F.col(f"_nm_{i}") for i in range(n)],
    )


def date_fanout(indicators: DataFrame, dates: DataFrame) -> DataFrame:
    """J14 — one indicator row per reference date: crossJoin against the
    exploded date-series frame (replaces the reference's per-date copy
    loop, dfhandler.py:562–580). ``dates`` is tiny -> broadcast."""
    return indicators.crossJoin(F.broadcast(dates))


def related_topk_csv(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int = 10,
    out_col: str = "related_ids",
) -> DataFrame:
    """J15/O3 — per generic-code group, the first ≤k ids as a CSV string
    (related-chart id lists, reference dfhandler.py:620–644).

    ``sort_array(collect_list())`` then ``slice`` — one shuffle, no
    window pass. Ids sort NUMERICALLY before stringifying (the
    reference keeps ascending-id frame order; a lexicographic sort
    would put "10" before "2").
    """
    return df.groupBy(group_col).agg(
        F.array_join(
            F.transform(
                F.slice(
                    F.sort_array(F.collect_list(F.col(id_col).cast("long"))), 1, k
                ),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias(out_col)
    )


def keep_first_per_key(df: DataFrame, key: str, order_cols: list[str]) -> DataFrame:
    """J10/W3 — dedup keep-first per key with an EXPLICIT order (the
    reference relies on pandas row order, dfhandler.py:327; Spark must
    name the ordering)."""
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
