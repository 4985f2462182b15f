"""Cost of the incremental near-dup leg per mode (r16, VERDICT r15
next #1c): the same two-batch ingest through `incremental_dedup` with
near_dup="minhash" vs "simhash" — decide+persist wall time per batch
and the second batch's probe shape. SimHash pays the 96-aggregate
signature pass (fixed plan cost + one band shuffle) but indexes 4
band rows/doc vs MinHash's 4 and verifies Hamming row-locally, so
recall is exact instead of probabilistic.

Usage: python tools/simhash_ingest_cost.py  (prints one JSON line)
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    from pyspark.sql import functions as F

    from geo_explorer_etl_spark.operators.incremental_dedup import (
        incremental_dedup,
    )
    from geo_explorer_etl_spark.session import get_spark, load_tables
    from geo_explorer_etl_spark.sources.store import TableStore

    spark = get_spark("simhash_ingest_cost", cpus=32)
    docs = load_tables(spark, "/root/testdata/sf0.1", "documents")[
        "documents"
    ].select("doc_id", "text")
    docs.count()
    mid = 2500
    b1 = docs.filter(F.col("doc_id") < mid).localCheckpoint(eager=True)
    b2 = docs.filter(F.col("doc_id") >= mid).localCheckpoint(eager=True)

    out: dict = {}
    for mode in ("minhash", "simhash"):
        store = TableStore(spark, tempfile.mkdtemp(prefix=f"ing_{mode}_"))
        times = []
        reps = []
        for b in (b1, b2):
            rep: dict = {}
            t0 = time.perf_counter()
            incremental_dedup(store, b, near_dup=mode, report=rep)
            times.append(round(time.perf_counter() - t0, 2))
            reps.append(rep)
        out[mode] = {
            "batch_secs": times,
            "kept": [r["kept_rows"] for r in reps],
            "b2_probe": {
                k: v for k, v in reps[1].items() if k.endswith("_probe")
            },
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
