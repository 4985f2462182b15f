"""Stress the incremental line-dedup equivalence (r13 red-cell hunt).

Loops: fresh temp store, split documents at a varying midpoint, run
``incremental_dedup_lines`` batch-then-batch, compare the union to the
all-at-once ``dedup_lines`` row for row — under VARYING
``spark.sql.shuffle.partitions`` (the driver's session conf is not
ours) and alternating 2-way/3-way splits. Any mismatch prints the
differing doc ids and their clean-text md5s, then exits 1.

Usage: python tools/stress_line_inc.py [sf_dir] [iters]
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from geo_explorer_etl_spark.operators.dedup import dedup_lines
    from geo_explorer_etl_spark.operators.incremental_dedup import (
        incremental_dedup_lines,
    )
    from geo_explorer_etl_spark.session import load_tables
    from geo_explorer_etl_spark.sources.store import TableStore

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    lo, hi = int(lo), int(hi)
    span = hi - lo

    expected = {
        r["doc_id"]: (r["clean_text"], r["lines_removed"], r["chars_removed"])
        for r in dedup_lines(docs, min_chars=15).collect()
    }

    for i in range(iters):
        parts = [7, 32, 200, 3][i % 4]
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        cuts = sorted({lo + span * (j + 1) * (i % 5 + 1) // ((i % 5 + 2) * ((i % 3) + 2)) for j in range((i % 3) + 1)})
        bounds = [lo - 1] + [c for c in cuts if lo - 1 < c < hi] + [hi]
        root = tempfile.mkdtemp(prefix=f"stress_li_{i}_")
        store = TableStore(spark, root)
        outs = []
        for a, b in zip(bounds, bounds[1:]):
            outs.append(
                incremental_dedup_lines(
                    store, docs.filter((F.col("doc_id") > a) & (F.col("doc_id") <= b))
                )
            )
        got = {}
        union = outs[0]
        for o in outs[1:]:
            union = union.unionByName(o)
        for r in union.collect():
            got[r["doc_id"]] = (r["clean_text"], r["lines_removed"], r["chars_removed"])
        shutil.rmtree(root, ignore_errors=True)
        if got != expected:
            bad = [k for k in expected if got.get(k) != expected[k]]
            print(f"MISMATCH iter={i} parts={parts} bounds={bounds} bad_docs={bad[:10]}")
            for k in bad[:3]:
                print(f"  doc {k}: exp={expected[k][1:]}, got={got.get(k, ('<missing>',))[1:]}")
            return 1
        print(f"ok iter={i} parts={parts} splits={len(bounds)-1}", flush=True)
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
