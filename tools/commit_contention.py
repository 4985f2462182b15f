"""Measure the commit protocol's optimistic-concurrency overhead
under writer contention (SCALE.md "Concurrent writers", VERDICT r7
stretch directive #7).

The round-7 chaos soak proves SAFETY under injected conflicts; this
tool puts a NUMBER on the cost. Two layers:

1. PROTOCOL-LEVEL: N threads hammer ``cas_update`` on ONE manifest
   blob (the maximum-contention case — every writer targets the same
   partition). Reports commits/sec and mean retries per committed
   update for both backends. The localfs backend serializes through
   the per-blob flock (retries ≈ 0 by construction: the version check
   runs inside the lock); the CAS backend takes losses and retries —
   the measured retry multiple IS the optimistic-concurrency tax.

2. END-TO-END: N concurrent ``TableStore.append`` writers into one
   product partition (real Spark staging writes + manifest extends),
   reporting wall-clock and observed CAS conflicts. Dominated by the
   Spark write, which is the honest picture: at 100 TB the manifest
   commit is microseconds against a multi-second data write, so even
   a 2-3x retry multiple on the control-blob write is invisible
   end-to-end until hundreds of writers share one partition.

Usage: python tools/commit_contention.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import sys
import tempfile
import threading
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")


def protocol_bench(backend_name: str, n_threads: int, ops_per_thread: int) -> dict:
    from geo_explorer_etl_spark.sources.commit import cas_update, make_backend

    backend = make_backend(backend_name)
    d = Path(tempfile.mkdtemp()) / "part"
    retries = [0] * n_threads
    committed = [0] * n_threads

    def run(tid: int) -> None:
        for _ in range(ops_per_thread):
            attempts = {"n": 0}

            def bump(prior):
                attempts["n"] += 1
                return {"n": int((prior or {}).get("n", 0)) + 1}

            cas_update(backend, d, "blob.json", bump)
            committed[tid] += 1
            retries[tid] += attempts["n"] - 1

    threads = [threading.Thread(target=run, args=(i,)) for i in range(n_threads)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    total = sum(committed)
    cur = backend.read(d, "blob.json")
    assert cur is not None and cur[1]["n"] == total, "lost update!"
    return {
        "backend": backend_name,
        "writers": n_threads,
        "commits": total,
        "wall_sec": round(wall, 3),
        "commits_per_sec": round(total / wall, 1),
        "retries_per_commit": round(sum(retries) / total, 3),
    }


def end_to_end_bench(spark, backend_name: str, n_threads: int, appends_each: int) -> dict:
    from pyspark.sql import functions as F

    from geo_explorer_etl_spark.sources import commit as commit_mod
    from geo_explorer_etl_spark.sources.store import PARTITION_COL, TableStore

    conflicts = {"n": 0}

    class Counting(commit_mod.CommitBackend):
        format_name = None  # wrapper: opt out of the root format tag

        def __init__(self, inner):
            self.inner = inner

        def read(self, d, key):
            return self.inner.read(d, key)

        def delete(self, d, key):
            return self.inner.delete(d, key)

        def lock(self, root):
            return self.inner.lock(root)

        def write(self, d, key, body, expected):
            try:
                return self.inner.write(d, key, body, expected)
            except commit_mod.CommitConflict:
                conflicts["n"] += 1
                raise

    root = tempfile.mkdtemp() + "/store"
    store = TableStore(
        spark, root, backend=Counting(commit_mod.make_backend(backend_name))
    )
    pid = 1
    base = spark.createDataFrame([(0, "init")], "k long, v string").withColumn(
        PARTITION_COL, F.lit(pid).cast("long")
    )
    store.replace_product_all(pid, {"IndicatorValues": base})
    errors: list = []

    def run(tid: int) -> None:
        try:
            for i in range(appends_each):
                df = spark.createDataFrame(
                    [(tid * 1000 + i, f"w{tid}")], "k long, v string"
                ).withColumn(PARTITION_COL, F.lit(pid).cast("long"))
                store.append("IndicatorValues", df)
        except Exception as e:  # surface, don't swallow
            errors.append(repr(e))

    threads = [threading.Thread(target=run, args=(i,)) for i in range(n_threads)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errors:
        raise RuntimeError(errors[0])
    expect = 1 + n_threads * appends_each
    got = store.count_rows("IndicatorValues")
    assert got == expect, f"lost rows: {got} != {expect}"
    return {
        "backend": backend_name,
        "writers": n_threads,
        "appends": n_threads * appends_each,
        "wall_sec": round(wall, 3),
        "appends_per_sec": round(n_threads * appends_each / wall, 2),
        "cas_conflicts": conflicts["n"],
    }


def main() -> None:
    from geo_explorer_etl_spark.session import get_spark

    protocol = [
        protocol_bench(backend, n, ops)
        for backend in ("localfs", "cas")
        for n, ops in ((1, 400), (4, 200), (8, 100))
    ]
    spark = get_spark("commit_contention", cpus=8)
    end_to_end = [
        end_to_end_bench(spark, backend, n, appends_each=4)
        for backend in ("localfs", "cas")
        for n in (1, 4)
    ]
    print(json.dumps({"protocol": protocol, "end_to_end": end_to_end}))


if __name__ == "__main__":
    main()
