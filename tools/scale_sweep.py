"""Scale sweep: run the bench headline at every available scale factor
and report per-query scaling ratios — evidence that plans scale with
data volume, not superlinearly (SCALE.md's claim, measured).

Usage: python tools/scale_sweep.py
Prints one JSON line per SF plus a final ratio summary.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    from bench import HEADLINE
    from geo_explorer_etl_spark.plans import bucketed_bench
    from geo_explorer_etl_spark.plans.registry import all_queries
    from geo_explorer_etl_spark.session import get_spark

    spark = get_spark("scale_sweep", cpus=32)
    queries = dict(all_queries())
    queries["bridge_join_bucketed"] = bucketed_bench.bridge_join_bucketed
    queries["bridge_join_plain"] = bucketed_bench.bridge_join_plain
    results: dict[str, dict[str, float]] = {}
    for sf_dir in SFS:
        sf = sf_dir.rsplit("sf", 1)[-1]
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
        bucketed_bench.prepare(spark, sf_dir)   # untimed layout setup per SF
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


if __name__ == "__main__":
    main()
