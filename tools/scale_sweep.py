"""Scale sweep: run the bench headline at every available scale factor
and report per-query scaling ratios AND fitted growth exponents —
evidence that plans scale with data volume, not superlinearly
(SCALE.md's claim, measured then fitted).

The sweep adds a DERIVED sf0.05 point (round-6 directive) by
integrity-preserving key-range halving of sf0.1 (lineitem+orders cut
on the same orderkey parity so joins keep their selectivity; events /
documents / embeddings cut on their own ids; dimensions kept whole).
Derived data lives under the repo's gitignored ``.derived/`` and is
built once.

Exponent fit: t = c·n^e  =>  least-squares slope of log t vs log sf
over the three largest SFs (0.01, 0.05, 0.1 — the smallest SF is
pure fixed overhead and would drag every fit toward 0). e ≈ 0 means
overhead-dominated, e ≈ 1 linear, e ≈ 2 quadratic.

Usage: python tools/scale_sweep.py
Prints one JSON line per SF plus ratio and exponent summaries.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

DERIVED_005 = "/root/repo/.derived/sf0.05"
SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    DERIVED_005,
    "/root/testdata/sf0.1",
]
FIT_SFS = ["0.01", "0.05", "0.1"]  # fit over the volume-sensitive points


def ensure_derived_sf005(spark) -> None:
    """Build the sf0.05 point once: half of sf0.1 by key range."""
    from pyspark.sql import functions as F

    from geo_explorer_etl_spark.session import load_tables

    done = os.path.join(DERIVED_005, "_DONE")
    if os.path.exists(done):
        return
    src = "/root/testdata/sf0.1"
    tables = load_tables(spark, src)
    halvers = {
        "lineitem": F.col("l_orderkey") % 2 == 0,
        "orders": F.col("o_orderkey") % 2 == 0,
        "events": F.col("event_id") % 2 == 0,
        "documents": F.col("doc_id") % 2 == 0,
        "embeddings": F.col("vec_id") % 2 == 0,
    }
    for name, df in tables.items():
        if name in halvers:
            df = df.filter(halvers[name])
        df.write.mode("overwrite").parquet(f"{DERIVED_005}/{name}.parquet")
    with open(done, "w") as f:
        f.write("ok")


def main() -> None:
    from bench import HEADLINE
    from geo_explorer_etl_spark.plans import bucketed_bench, store_bench
    from geo_explorer_etl_spark.plans.registry import all_queries
    from geo_explorer_etl_spark.session import get_spark

    spark = get_spark("scale_sweep", cpus=32)
    ensure_derived_sf005(spark)
    from bench import comparable_overrides

    queries = dict(all_queries())
    queries["bridge_join_bucketed"] = bucketed_bench.bridge_join_bucketed
    queries["bridge_join_plain"] = bucketed_bench.bridge_join_plain
    # the bench's comparable-shape overrides — THE shared definition
    queries.update(comparable_overrides())
    # every store twin in the headline resolves from store_bench —
    # one rule, so a twin added to bench.py can't silently KeyError
    # here (review r10: the hand-kept list fell behind)
    for name in HEADLINE:
        if name not in queries and hasattr(store_bench, name):
            queries[name] = getattr(store_bench, name)

    results: dict[str, dict[str, float]] = {}
    for sf_dir in SFS:
        sf = sf_dir.rsplit("sf", 1)[-1]
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
        bucketed_bench.prepare(spark, sf_dir)   # untimed layout setup per SF
        store_bench.prepare(spark, sf_dir)
        times = {}
        for name in HEADLINE:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).count()
            times[name] = round(time.perf_counter() - t0, 3)
        results[sf] = times
        print(json.dumps({"sf": sf, "queries": times}))

    # 100x data ratio: sf0.1 time over sf0.001 time (ideal < 100;
    # constant-overhead-dominated queries land near 1)
    ratios = {
        name: round(results["0.1"][name] / max(results["0.001"][name], 1e-9), 1)
        for name in results["0.1"]
    }
    print(json.dumps({"metric": "t(sf0.1)/t(sf0.001) at 100x data", "ratios": ratios}))

    # least-squares growth exponent over the three largest SFs
    exps = {}
    xs = [math.log(float(s)) for s in FIT_SFS]
    xbar = sum(xs) / len(xs)
    for name in results["0.1"]:
        ys = [math.log(max(results[s][name], 1e-9)) for s in FIT_SFS]
        ybar = sum(ys) / len(ys)
        num = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys))
        den = sum((x - xbar) ** 2 for x in xs)
        exps[name] = round(num / den, 2)
    print(
        json.dumps(
            {
                "metric": "fitted growth exponent e in t ~ sf^e (sf 0.01..0.1)",
                "exponents": exps,
            }
        )
    )


if __name__ == "__main__":
    main()
