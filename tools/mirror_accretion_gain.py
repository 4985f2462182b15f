"""Measure what mirror ACCRETION costs the over-cap decide path, and
what mirror_compact buys back (VERDICT r14 next #2 / missing #2).

Shape: the bucketed mirror accretes one file set per batch append
(bucketed appends never rewrite), so after N daily batches every
bucket holds up to N files — the over-cap join pays N× the file
opens and loses the trusted within-bucket sort order. This tool
builds the index through MANY small appends (auto-compaction
disabled), times the over-cap decide against the accreted mirror,
compacts, and times the same decide again — so SCALE.md's
auto-compaction row carries a measured number, not a claim.

Usage: python tools/mirror_accretion_gain.py [sf_dir] [reps] [appends] [rows_per]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    appends = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    rows_per = int(sys.argv[4]) if len(sys.argv) > 4 else 100_000

    import tempfile

    from pyspark.sql import functions as F

    from geo_explorer_etl_spark.operators import incremental_dedup as ID
    from geo_explorer_etl_spark.session import get_spark, load_tables
    from geo_explorer_etl_spark.sources.store import TableStore

    spark = get_spark("mirror_accretion_gain", cpus=32)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    mid = (int(lo) + int(hi)) // 2
    store = TableStore(spark, tempfile.mkdtemp(prefix="accretion_gain_"))
    ID.MIRROR_AUTO_COMPACT_FILESETS = 0  # accrete on purpose
    ID.incremental_dedup_lines(store, docs.filter(F.col("doc_id") <= mid))
    for i in range(appends):
        synth = spark.range(rows_per).select(
            F.md5(F.concat(F.lit(f"synth{i}-"), F.col("id").cast("string"))).alias(
                "line_hash"
            ),
            (F.col("id") + 10_000_000 + i * rows_per).alias("doc_id"),
            F.lit(0).cast("int").alias("pos"),
        )
        ID.line_dedup_persist(store, synth)
    batch = docs.filter(F.col("doc_id") > mid).localCheckpoint(eager=True)
    ID.LINE_PROBE_CAP = 0  # force the over-cap branch

    print(
        f"index rows: {store.count_rows(ID.LINE_TABLE)}, "
        f"file sets: {ID._mirror_filesets(store, ID.LINE_TABLE)}, "
        f"batch docs: {batch.count()}"
    )

    def timed(label: str) -> None:
        times = []
        for _ in range(reps):
            t0 = time.time()
            rep: dict = {}
            cleaned, _new, _ = ID.line_dedup_decide(store, batch, report=rep)
            cleaned.count()
            times.append(time.time() - t0)
        probe = rep.get(f"{ID.LINE_TABLE}_probe")
        print(f"{label}: min={min(times):.2f}s over {reps} (probe={probe})")

    timed(f"accreted ({appends} file sets)")
    n = ID.mirror_compact(store, ID.LINE_TABLE, "line_hash")
    print(f"compacted to one file set ({n} rows)")
    timed("compacted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
