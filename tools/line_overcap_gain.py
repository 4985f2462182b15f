"""Measure the bucketed-mirror gain on the OVER-CAP line-dedup path.

Shape: a corpus-sized DedupLineIndex, a daily batch whose distinct
line count exceeds LINE_PROBE_CAP. Pre-r14 the decide path read the
whole index and hash-joined it (shuffling the index side every
batch); r14 joins the bucketed mirror instead — no Exchange on the
index side, only the batch's winners move. This tool times both
branches on the same store so SCALE.md carries a number, not a claim.

The corpus-sized index is SYNTHESIZED directly (N rows of uniform md5
keys appended through the same two-layout persist path) — the sf
testdata's own index is a few thousand rows, where the mirror's fixed
bucketed-scan overhead dominates and the shuffle it exists to remove
costs nothing yet.

Usage: python tools/line_overcap_gain.py [sf_dir] [reps] [index_rows]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    index_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000_000

    import tempfile

    from pyspark.sql import functions as F

    from geo_explorer_etl_spark.operators import incremental_dedup as ID
    from geo_explorer_etl_spark.session import get_spark, load_tables
    from geo_explorer_etl_spark.sources.store import TableStore

    spark = get_spark("line_overcap_gain", cpus=32)
    # the 100 TB index never broadcasts — measure the scale plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    mid = (int(lo) + int(hi)) // 2
    store = TableStore(spark, tempfile.mkdtemp(prefix="overcap_gain_"))
    # seed through the REAL path once (creates both layouts), then bulk
    # the index to corpus size through the same persist function
    ID.incremental_dedup_lines(store, docs.filter(F.col("doc_id") <= mid))
    synth = spark.range(index_rows).select(
        F.md5(F.concat(F.lit("synth"), F.col("id").cast("string"))).alias("line_hash"),
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.lit(0).cast("int").alias("pos"),
    )
    ID.line_dedup_persist(store, synth)
    batch = docs.filter(F.col("doc_id") > mid).localCheckpoint(eager=True)
    ID.LINE_PROBE_CAP = 0  # force the over-cap branch

    idx_rows = store.count_rows(ID.LINE_TABLE)
    print(f"index rows: {idx_rows}, batch docs: {batch.count()}")

    real_read = ID.line_mirror_read
    for label, hook in (("bucketed_mirror", real_read),
                        ("full_scan", lambda *a, **k: None)):
        ID.line_mirror_read = hook
        times = []
        for _ in range(reps):
            t0 = time.time()
            rep = {}
            cleaned, new_rows, _ = ID.line_dedup_decide(store, batch, report=rep)
            cleaned.count()
            times.append(time.time() - t0)
        probe = rep.get(f"{ID.LINE_TABLE}_probe")
        print(f"{label}: min={min(times):.2f}s over {reps} (probe={probe})")
    ID.line_mirror_read = real_read
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
