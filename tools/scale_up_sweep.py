"""UP-scale sweep (r17, VERDICT r16 next #5): a scaling-VISIBLE bench
point above sf0.1, so per-core ratios mean something.

PERF_r16's scaling block showed every row but one running FASTER at 8
cores than 32 — at sf0.1 (~17 MB) every query is fixed-cost/barrier
bound and a plan that silently serialized would be invisible. This
tool derives an sf0.5 point (5x sf0.1 by key-shifted replication,
built once under the gitignored ``.derived/``) and times the most
expensive headline rows there at the invoking core count, so a
32-core vs 8-core pair of runs measures real parallel speedup on
volume-bound work.

Derivation (integrity-preserving):
- ``events``: 5 copies, ``event_id`` shifted per replica by a power
  of ten above the max id — user_id/ts/value kept, so each user gets
  5x events (volume growth, same key cardinality: the matview/store
  layouts scale in rows per group, the realistic churn shape).
- ``documents``: 5 copies, ``doc_id`` shifted the same way, text kept
  byte-identical — a dup-heavy corpus, exactly what the exact-window
  dedup is for (its fingerprint job is the scale term being measured).
- other tables pass through untouched (the swept rows read only
  events/documents + the store layouts prepare() builds from them).

Swept rows = the 5 most expensive in BASELINE_r17 (store_matview_
max_recompute / pctl_net / refresh / rebuild, dedup_substrings_exact).
Pair-emitting similarity rows are deliberately NOT swept: replicated
corpora make their OUTPUT grow ~k^2 per duplicate cluster, which
measures output explosion, not plan scaling.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/scale_up_sweep.py
    SPARK_GRAFT_CPUS=8  python tools/scale_up_sweep.py
Prints one JSON line per (sf, cpus) with per-row min-of-2 seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

DERIVED_05 = "/root/repo/.derived/sf0.5"
SRC = "/root/testdata/sf0.1"
REPS = 5

SWEEP_ROWS = [
    "store_matview_max_recompute",
    "store_matview_pctl_net",
    "store_matview_refresh",
    "store_matview_rebuild",
    "dedup_substrings_exact",
]


def ensure_derived_sf05(spark) -> None:
    from pyspark.sql import functions as F

    from geo_explorer_etl_spark.session import load_tables

    done = os.path.join(DERIVED_05, "_DONE")
    if os.path.exists(done):
        return
    tables = load_tables(spark, SRC)
    shift_keys = {"events": "event_id", "documents": "doc_id"}
    for name, df in tables.items():
        if name in shift_keys:
            key = shift_keys[name]
            mx = df.agg(F.max(key)).first()[0] or 0
            off = 10 ** (len(str(int(mx))) + 1)  # clean decimal shift
            reps = None
            for r in range(REPS):
                part = df.withColumn(
                    key, (F.col(key) + F.lit(r * off)).cast("long")
                )
                reps = part if reps is None else reps.unionByName(part)
            df = reps
        df.write.mode("overwrite").parquet(f"{DERIVED_05}/{name}.parquet")
    with open(done, "w") as f:
        f.write("ok")


def main() -> None:
    from bench import HEADLINE, comparable_overrides
    from geo_explorer_etl_spark.plans import bucketed_bench, store_bench
    from geo_explorer_etl_spark.plans.registry import all_queries
    from geo_explorer_etl_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("scale_up_sweep", cpus=cpus)
    ensure_derived_sf05(spark)

    queries = dict(all_queries())
    queries.update(comparable_overrides())
    for name in HEADLINE:
        if name not in queries and hasattr(store_bench, name):
            queries[name] = getattr(store_bench, name)

    for sf_dir, sf in ((SRC, "0.1"), (DERIVED_05, "0.5")):
        bucketed_bench.prepare(spark, sf_dir)
        store_bench.prepare(spark, sf_dir)
        for name in SWEEP_ROWS:  # codegen warm-up, untimed
            queries[name](spark, "/root/testdata/sf0.001").count()
        times: dict[str, float] = {}
        for _ in range(2):
            for name in SWEEP_ROWS:
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).count()
                dt = round(time.perf_counter() - t0, 3)
                times[name] = min(times.get(name, dt), dt)
        print(
            json.dumps(
                {"sf": sf, "cpus": cpus, "runs": 2, "agg": "min",
                 "queries": times}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
