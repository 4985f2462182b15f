"""Commit-service tests: the object-store CAS backend must deliver the
same ACID guarantees as the POSIX flock+rename backend — put-if-absent
versioned manifests, optimistic conflict retry with no lost update,
and per-product txn sequencing so concurrent cross-table replaces
never tear. (VERDICT r6 directive #1.)"""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from geo_explorer_etl_spark.sources.commit import (
    CASBackend,
    CommitConflict,
    LocalFSBackend,
    make_backend,
)
from geo_explorer_etl_spark.sources.store import PARTITION_COL, TableStore


@pytest.mark.parametrize("backend", [LocalFSBackend(), CASBackend()])
def test_backend_versioned_cas_semantics(tmp_path, backend):
    """Unit contract both backends share: versions start at 1, a write
    against a stale expected version raises CommitConflict (exactly
    one winner per version), delete clears the blob."""
    d = tmp_path / "part"
    assert backend.read(d, "_committed.json") is None
    v1 = backend.write(d, "_committed.json", {"files": ["a"]}, 0)
    assert v1 == 1
    version, body = backend.read(d, "_committed.json")
    assert version == 1 and body["files"] == ["a"]

    # two writers race for version 2: the one with the stale expected
    # version loses loudly — never a silent overwrite
    backend.write(d, "_committed.json", {"files": ["a", "b"]}, 1)
    with pytest.raises(CommitConflict):
        backend.write(d, "_committed.json", {"files": ["a", "c"]}, 1)
    _, body = backend.read(d, "_committed.json")
    assert body["files"] == ["a", "b"]

    backend.delete(d, "_committed.json")
    assert backend.read(d, "_committed.json") is None


def test_cas_commit_log_is_bounded(tmp_path):
    """The CAS commit log self-prunes to KEEP_COMMITS entries — bounded
    metadata like Delta's log cleanup, not an unbounded file-per-commit
    graveyard."""
    b = CASBackend()
    d = tmp_path / "part"
    for v in range(b.KEEP_COMMITS + 40):
        b.write(d, "_committed.json", {"n": v}, v)
    log = d / "_cas" / "_committed.json"
    commits = [f for f in log.iterdir() if f.suffix == ".json"]
    assert len(commits) == b.KEEP_COMMITS
    version, body = b.read(d, "_committed.json")
    assert version == b.KEEP_COMMITS + 40 and body["n"] == b.KEEP_COMMITS + 39


def test_make_backend_dispatch():
    assert isinstance(make_backend("localfs"), LocalFSBackend)
    assert isinstance(make_backend("cas"), CASBackend)
    cb = CASBackend()
    assert make_backend(cb) is cb
    with pytest.raises(ValueError, match="unknown commit backend"):
        make_backend("s3")


def test_concurrent_appends_merge_without_lost_update(spark, tmp_path):
    """THE no-lost-update pin (deterministic interleave, no threads):
    writer A reads manifest version v, then writer B commits v+1
    before A's conditional write lands. A's CAS fails, A recomputes
    against B's snapshot, and the final manifest carries BOTH writers'
    files — under a lock-free backend, nothing is clobbered."""
    root = str(tmp_path / "store")
    pid = 11
    store_a = TableStore(spark, root, backend="cas")
    store_b = TableStore(spark, root, backend="cas")
    store_a.replace_product_all(
        pid, {"IndicatorValues": spark.createDataFrame([(0, "base")], "id long, v string")}
    )

    def batch(store, ids, tag):
        return spark.createDataFrame(
            [(i, tag) for i in ids], "id long, v string"
        ).withColumn(PARTITION_COL, F.lit(pid).cast("long"))

    # interleave: the first conditional write A attempts is preceded by
    # B completing an ENTIRE append against the same partition
    real_write = store_a._backend.write
    fired = {"done": False}

    def write_with_race(d, key, body, expected):
        if not fired["done"] and key == "_committed.json":
            fired["done"] = True
            store_b.append("IndicatorValues", batch(store_b, [100, 101], "B"))
        return real_write(d, key, body, expected)

    store_a._backend.write = write_with_race
    try:
        store_a.append("IndicatorValues", batch(store_a, [200], "A"))
    finally:
        store_a._backend.write = real_write

    out = TableStore(spark, root, backend="cas").read("IndicatorValues")
    got = {(r["id"], r["v"]) for r in out.collect()}
    assert got == {(0, "base"), (100, "B"), (101, "B"), (200, "A")}
    # and the race actually happened
    assert fired["done"]


def test_concurrent_replaces_never_tear_cross_table(spark, tmp_path):
    """Per-product txn sequencing: writer A (older seq) crashes after
    publishing 1 of 2 tables; writer B (newer seq) then publishes both
    tables; A's roll-forward must NOT clobber B on the remaining
    table — every swap by the stale txn aborts and the store converges
    to B's version on ALL tables (no torn cross-table mix)."""
    root = str(tmp_path / "store")
    pid = 21
    store = TableStore(spark, root, backend="cas")

    def frames(tag):
        return {
            "IndicatorValues": spark.createDataFrame([(1, tag)], "id long, v string"),
            "RelatedCharts": spark.createDataFrame([(1, tag)], "id long, v string"),
        }

    def versions(st):
        return {
            t: st.read(t).select("v").first()["v"]
            for t in ("IndicatorValues", "RelatedCharts")
        }

    store.replace_product_all(pid, frames("v0"))

    # stage txn A (older seq) by hand — mimics replace_product_all up
    # to the commit point
    seq_a = store._claim_product_seq(pid)
    txn_a = Path(root) / "_staging" / f"txn_{pid}_{seq_a}_manual"
    schemas = {}
    for table, df in frames("A").items():
        df.write.parquet(str(txn_a / table))
        schemas[table] = df.schema.json()
    manifest_a = {
        "product_id": pid,
        "seq": seq_a,
        "tables": sorted(frames("A")),
        "files": {
            t: sorted(f.name for f in (txn_a / t).glob("*.parquet"))
            for t in frames("A")
        },
        "schemas": schemas,
    }
    (txn_a / "MANIFEST.json.tmp").write_text(json.dumps(manifest_a))
    (txn_a / "MANIFEST.json.tmp").rename(txn_a / "MANIFEST.json")

    # A crashes after publishing 1 of 2 tables
    with pytest.raises(RuntimeError, match="simulated crash"):
        store._publish(txn_a, manifest_a, fail_after=1)
    assert versions(store)["IndicatorValues"] == "A"  # torn... for now

    # B replaces the same product with a NEWER seq, all tables
    store.replace_product_all(pid, frames("B"))
    assert versions(store) == {"IndicatorValues": "B", "RelatedCharts": "B"}

    # A's crashed txn rolls forward on the next open — and is refused
    # everywhere: B's newer-seq state stands on BOTH tables
    store2 = TableStore(spark, root, backend="cas")
    assert versions(store2) == {"IndicatorValues": "B", "RelatedCharts": "B"}
    assert not txn_a.exists()


def test_epoch_ledger_stays_o_streams(spark, tmp_path):
    """VERDICT r6 directive #7: the exactly-once ledger records ONE
    high-water batch id per stream — its size is bounded by writer
    count, not stream lifetime — and any batch at or below the
    high-water replays as a no-op."""
    root = str(tmp_path / "store")
    store = TableStore(spark, root, backend="cas")

    def batch(i):
        return spark.createDataFrame([(i, f"b{i}")], "id long, v string").withColumn(
            PARTITION_COL, F.lit(1).cast("long")
        )

    for i in range(12):
        assert store.append_epoch("s1", i, "IndicatorValues", batch(i)) is True
    assert store.append_epoch("s2", 0, "IndicatorValues", batch(100)) is True

    ledger = store._epoch_ledger()
    assert ledger == {"s1": 11, "s2": 0}          # O(streams), high-water only
    # replay of ANY batch <= high-water is a no-op
    for i in (0, 5, 11):
        assert store.append_epoch("s1", i, "IndicatorValues", batch(i)) is False
    assert store.read("IndicatorValues").count() == 13


def test_localfs_write_version_check_is_atomic(tmp_path):
    """Review r7: LocalFSBackend.write's read-check-rename runs under a
    per-blob flock, so two racing writers targeting the same expected
    version produce exactly one winner even with no store-wide lock —
    pinned with threads hammering the same blob."""
    import threading

    b = LocalFSBackend()
    d = tmp_path / "part"
    outcomes: list[str] = []
    lock = threading.Lock()

    def writer(tag):
        for _ in range(20):
            cur = b.read(d, "_committed.json")
            v = cur[0] if cur else 0
            try:
                b.write(d, "_committed.json", {"by": tag, "at": v + 1}, v)
                with lock:
                    outcomes.append("win")
            except CommitConflict:
                with lock:
                    outcomes.append("lose")

    threads = [threading.Thread(target=writer, args=(t,)) for t in ("a", "b")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    version, body = b.read(d, "_committed.json")
    # every win advanced the version exactly once — no silent overwrite
    assert version == outcomes.count("win")
    assert version == body["at"]


def test_epoch_ledger_migrates_legacy_flat_layout(spark, tmp_path):
    """Review r7: a store written before the ledger moved behind the
    commit backend holds a FLAT {stream: batch} _epochs.json; its
    high-water marks must survive the upgrade, or every replay on an
    upgraded store double-appends."""
    import json
    from pathlib import Path

    root = tmp_path / "store"
    root.mkdir()
    (root / "_epochs.json").write_text(json.dumps({"s1": 7, "s2": 0}))
    store = TableStore(spark, str(root))
    assert store._epoch_ledger() == {"s1": 7, "s2": 0}
    # replay of a legacy-recorded batch is still a no-op
    df = spark.createDataFrame([(1, "x")], "id long, v string").withColumn(
        PARTITION_COL, F.lit(1).cast("long")
    )
    assert store.append_epoch("s1", 7, "IndicatorValues", df) is False
    assert store.read("IndicatorValues") is None
    # and a NEW batch claims through, migrating the layout
    assert store.append_epoch("s1", 8, "IndicatorValues", df) is True
    assert store._epoch_ledger() == {"s1": 8, "s2": 0}


def test_duplicate_epoch_attempts_land_exactly_once(spark, tmp_path):
    """Review r7: two fully-staged-and-committed attempts for the SAME
    (stream, batch) — the double-started-writer case recover() may
    find after a crash — publish exactly one of them; the loser is
    discarded, rows land once."""
    import json
    from pathlib import Path

    root = str(tmp_path / "store")
    store = TableStore(spark, root, backend="cas")

    def stage(tag):
        txn = Path(root) / "_staging" / f"etxn_s9_0_{tag}"
        df = spark.createDataFrame([(1, tag)], "id long, v string").withColumn(
            PARTITION_COL, F.lit(5).cast("long")
        )
        df.write.partitionBy(PARTITION_COL).parquet(str(txn / "IndicatorValues"))
        tdir = txn / "IndicatorValues"
        files = {
            d.name: sorted(f.name for f in d.glob("*.parquet"))
            for d in tdir.glob(f"{PARTITION_COL}=*")
        }
        manifest = {
            "mode": "append",
            "stream_id": "s9",
            "batch_id": 0,
            "table": "IndicatorValues",
            "files": files,
            "schema": df.drop(PARTITION_COL).schema.json(),
        }
        (txn / "MANIFEST.json.tmp").write_text(json.dumps(manifest))
        (txn / "MANIFEST.json.tmp").rename(txn / "MANIFEST.json")
        return txn

    a, b = stage("aa"), stage("bb")
    TableStore(spark, root, backend="cas")  # recover() arbitrates
    out = TableStore(spark, root, backend="cas").read("IndicatorValues")
    assert out.count() == 1                      # exactly once, not twice
    assert not (a.exists() and b.exists())       # the loser was discarded


def test_zorder_key_stays_in_value_bits_at_many_columns(spark):
    """Review r7: 4+ z-order columns must not push bits into the
    bigint sign bit (which would invert the clustering) — resolution
    adapts to 63 // k bits per dimension and the key stays
    non-negative and monotone-safe."""
    from geo_explorer_etl_spark.sources.store import _zorder_key

    df = spark.range(256).select(
        F.col("id").alias("a"),
        (F.col("id") * 3 % 251).alias("b"),
        (F.col("id") * 7 % 127).alias("c"),
        (F.col("id") * 11 % 63).alias("d"),
    )
    z = df.select(_zorder_key(df, ["a", "b", "c", "d"]).alias("z"))
    row = z.agg(F.min("z").alias("mn"), F.max("z").alias("mx")).first()
    assert row["mn"] >= 0
    assert row["mx"] < (1 << 63)


def test_replay_completes_claimed_but_unpublished_batch(spark, tmp_path):
    """Review r7 #2: a writer that crashes BETWEEN claiming its batch
    and publishing it leaves the rows staged-but-invisible while the
    ledger says 'done'. A replay on a LONG-LIVED store handle (no
    fresh recover()) must roll the claimed txn forward before
    returning False — a False return always means the rows are
    visible."""
    import json
    from pathlib import Path

    root = str(tmp_path / "store")
    store = TableStore(spark, root, backend="cas")
    df = spark.createDataFrame([(1, "x")], "id long, v string").withColumn(
        PARTITION_COL, F.lit(2).cast("long")
    )

    # stage + MANIFEST + claim by hand = crash right before publish
    txn = Path(root) / "_staging" / "etxn_s5_0_crashed"
    df.write.partitionBy(PARTITION_COL).parquet(str(txn / "IndicatorValues"))
    files = {
        d.name: sorted(f.name for f in d.glob("*.parquet"))
        for d in (txn / "IndicatorValues").glob(f"{PARTITION_COL}=*")
    }
    manifest = {
        "mode": "append", "stream_id": "s5", "batch_id": 0,
        "table": "IndicatorValues", "files": files,
        "schema": df.drop(PARTITION_COL).schema.json(),
    }
    (txn / "MANIFEST.json.tmp").write_text(json.dumps(manifest))
    (txn / "MANIFEST.json.tmp").rename(txn / "MANIFEST.json")
    assert store._claim_epoch("s5", 0, txn.name) is True
    assert store.read("IndicatorValues") is None      # invisible...

    # ...until the replay on the SAME handle completes it
    assert store.append_epoch("s5", 0, "IndicatorValues", df) is False
    assert store.read("IndicatorValues").count() == 1
    assert not txn.exists()


@pytest.mark.parametrize("base_backend", ["localfs", "cas"])
def test_commit_protocol_chaos_under_injected_conflicts(spark, tmp_path, base_backend):
    """Protocol soak: every conditional write randomly loses its first
    attempt to a simulated racer (the backend bumps the version
    underneath before delegating), so EVERY retry loop in the store —
    manifest extends, replace swaps, product-seq claims, epoch claims,
    ledger merges — exercises its conflict path constantly while a
    seeded random op sequence (append / merge / replace / epoch append
    + replay / compact / vacuum) runs against an in-test row model.
    After every op the store must equal the model; at the end fsck
    reports no missing files and count_rows agrees."""
    import random

    from geo_explorer_etl_spark.sources.commit import CommitBackend, make_backend
    from geo_explorer_etl_spark.sources.store import TableStore

    class Flaky(CommitBackend):
        def __init__(self, inner, seed):
            self.inner = inner
            self.rng = random.Random(seed)

        def read(self, d, key):
            return self.inner.read(d, key)

        def delete(self, d, key):
            return self.inner.delete(d, key)

        def lock(self, root):
            return self.inner.lock(root)

        def write(self, d, key, body, expected):
            cur = self.inner.read(d, key)
            if cur is not None and self.rng.random() < 0.4:
                # a phantom racer re-commits the CURRENT content at the
                # next version: the caller's conditional write must
                # lose and retry against it
                self.inner.write(d, key, dict(cur[1]), cur[0])
            return self.inner.write(d, key, body, expected)

    store = TableStore(
        spark, str(tmp_path / "store"), backend=Flaky(make_backend(base_backend), seed=7)
    )
    pid = 6
    rng = random.Random(42)
    model: dict[int, str] = {}
    next_k = 0
    epoch = 0

    def frame(rows):
        return spark.createDataFrame(
            list(rows), "k long, v string"
        ).withColumn("IndicatorThemeId", F.lit(pid).cast("long"))

    def check():
        df = store.read("IndicatorValues")
        got = (
            {(r["k"], r["v"]) for r in df.select("k", "v").collect()}
            if df is not None
            else set()
        )
        assert got == set(model.items())

    store.replace_product_all(pid, {"IndicatorValues": frame([(0, "init")])})
    model = {0: "init"}
    next_k = 1
    for step in range(14):
        op = rng.choice(
            ["append", "merge", "replace", "epoch", "compact", "vacuum", "delete"]
        )
        if op == "append":
            rows = [(next_k + i, f"a{step}") for i in range(2)]
            store.append("IndicatorValues", frame(rows))
            model.update(dict(rows))
            next_k += 2
        elif op == "merge":
            ks = rng.sample(sorted(model), min(2, len(model))) + [next_k]
            rows = [(k, f"m{step}") for k in ks]
            store.merge_rows("IndicatorValues", frame(rows), ["k"])
            model.update(dict(rows))
            next_k += 1
        elif op == "replace":
            rows = [(next_k, f"r{step}"), (next_k + 1, f"r{step}")]
            store.replace_product_all(pid, {"IndicatorValues": frame(rows)})
            model = dict(rows)
            next_k += 2
        elif op == "epoch":
            rows = [(next_k, f"e{step}")]
            assert store.append_epoch("chaos", epoch, "IndicatorValues", frame(rows))
            # replay must be a no-op even under injected conflicts
            assert not store.append_epoch("chaos", epoch, "IndicatorValues", frame(rows))
            model.update(dict(rows))
            next_k += 1
            epoch += 1
        elif op == "compact":
            store.compact("IndicatorValues", target_file_bytes=1 << 30)
        elif op == "delete":
            if model:
                cut = rng.choice(sorted(model))
                store.delete_where("IndicatorValues", [("k", ">=", cut)])
                model = {k: v for k, v in model.items() if k < cut}
        else:
            store.vacuum("IndicatorValues", older_than_seconds=0.0)
        check()

    report = store.fsck("IndicatorValues")
    assert not report.get("IndicatorValues", {}).get("missing")
    assert store.count_rows("IndicatorValues") == len(model)


def test_compact_aborts_when_rewrite_superseded(spark, tmp_path):
    """Review r7 #4: a compaction whose source files were superseded by
    a concurrent replace must ABORT its manifest swap (committing it
    would resurrect the old rows next to the replacement). Simulated
    deterministically: the replace lands between compact's read and
    its swap via a backend write hook."""
    root = str(tmp_path / "store")
    pid = 31
    store = TableStore(spark, root, backend="cas")

    def frame(tag, n=50):
        return spark.range(n).select(
            F.col("id"), F.lit(tag).alias("v")
        ).withColumn(PARTITION_COL, F.lit(pid).cast("long"))

    store.replace_product_all(pid, {"IndicatorValues": frame("old").repartition(4)})
    racer = TableStore(spark, root, backend="cas")
    real_write = store._backend.write
    fired = {"done": False}

    def write_with_replace(d, key, body, expected):
        if not fired["done"] and key == "_committed.json" and "compact-" in str(
            body.get("files", [])
        ):
            fired["done"] = True
            racer.replace_product_all(pid, {"IndicatorValues": frame("new", 7)})
        return real_write(d, key, body, expected)

    store._backend.write = write_with_replace
    try:
        n = store.compact("IndicatorValues", target_file_bytes=1 << 30)
    finally:
        store._backend.write = real_write
    assert fired["done"]
    assert n == 0                                  # aborted, not committed
    out = TableStore(spark, root, backend="cas").read("IndicatorValues")
    assert out.count() == 7                        # replacement only
    assert {r["v"] for r in out.select("v").distinct().collect()} == {"new"}


def test_bloom_temporal_probe_keeps_midnight_rows(spark, tmp_path):
    """Review r7 #4: a date probe against a bloom-indexed TIMESTAMP
    column must not prune the file holding the matching midnight rows
    (probe keys expand across granularities, like the zone maps'
    shape rule)."""
    import datetime

    root = str(tmp_path / "store")
    store = TableStore(spark, root, bloom_cols={"IndicatorValues": ["ts"]})
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 15, 0, 0, 0)),
         (2, datetime.datetime(2024, 1, 16, 12, 0, 0))],
        "id long, ts timestamp",
    ).coalesce(1)
    store.replace_product_all(33, {"IndicatorValues": df})
    got = store.read("IndicatorValues", [("ts", "==", datetime.date(2024, 1, 15))])
    assert [r["id"] for r in got.collect()] == [1]
    # converse: midnight datetime probe against a DATE column
    store2 = TableStore(
        spark, str(tmp_path / "s2"), bloom_cols={"IndicatorValues": ["d"]}
    )
    df2 = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 15))], "id long, d date"
    ).coalesce(1)
    store2.replace_product_all(34, {"IndicatorValues": df2})
    got2 = store2.read(
        "IndicatorValues", [("d", "==", datetime.datetime(2024, 1, 15))]
    )
    assert [r["id"] for r in got2.collect()] == [1]


def test_new_change_feed_subscriber_starts_at_now(spark, tmp_path):
    """Review r7 #4: a fresh subscriber on a mature (journal-pruned)
    store attaches with start_at and polls cleanly from there instead
    of failing forever on the pruned epoch window."""
    import time

    from geo_explorer_etl_spark.streaming.incremental import ChangeFeedReader

    root = str(tmp_path / "store")
    pid = 35
    store = TableStore(spark, root)

    def frame(rows):
        return spark.createDataFrame(rows, "k long, v string").withColumn(
            PARTITION_COL, F.lit(pid).cast("long")
        )

    store.replace_product_all(pid, {"IndicatorValues": frame([(1, "a")])})
    store.merge_rows("IndicatorValues", frame([(2, "b")]), ["k"])
    store.vacuum("IndicatorValues", older_than_seconds=0.0, prune_history=True)

    # without start_at: the epoch window is pruned -> loud refusal
    import pytest

    naive = ChangeFeedReader(store, "IndicatorValues", "late_naive")
    with pytest.raises(ValueError, match="outside vacuum retention"):
        naive.poll(until=time.time())

    # with start_at: attaches at now, sees only subsequent commits
    late = ChangeFeedReader(
        store, "IndicatorValues", "late_sub", start_at=time.time()
    )
    assert late.poll(until=time.time()) is None
    store.append("IndicatorValues", frame([(3, "c")]))
    seen = late.poll(until=time.time())
    assert sorted(r["k"] for r in seen.collect()) == [3]


def test_bloom_shape_mismatch_never_prunes(spark, tmp_path):
    """ADVICE r7 (medium): a NUMERIC probe against a bloom-indexed
    STRING column holding non-canonical numeric text ('05', ' 5')
    hashes to a different key than the stored values, but Spark's
    re-applied cast filter matches those rows — the bloom must keep
    the file (shape mismatch), not prune it."""
    root = str(tmp_path / "store")
    store = TableStore(spark, root, bloom_cols={"IndicatorValues": ["code"]})
    df = spark.createDataFrame(
        [(1, "05"), (2, " 5"), (3, "9")], "id long, code string"
    ).coalesce(1)
    store.replace_product_all(41, {"IndicatorValues": df})
    got = store.read("IndicatorValues", [("code", "==", 5)])
    assert sorted(r["id"] for r in got.collect()) == [1, 2]
    # in-set form takes the same keep-on-mismatch path
    got_in = store.read("IndicatorValues", [("code", "in", [5])])
    assert sorted(r["id"] for r in got_in.collect()) == [1, 2]
    # same-shape probes still prune: a string probe for an absent key
    # drops the file at the listing
    assert store.live_files("IndicatorValues", [("code", "==", "nope")]) == []


def test_bloom_tz_aware_midnight_probe_keeps_file(spark, tmp_path):
    """ADVICE r7 (medium), second half: a tz-AWARE UTC-midnight
    datetime probe against a bloom-indexed DATE column must get the
    same date-granularity key expansion a naive midnight gets —
    pruning the file would drop rows Spark's date→timestamp cast
    filter matches."""
    import datetime

    root = str(tmp_path / "store")
    store = TableStore(spark, root, bloom_cols={"IndicatorValues": ["d"]})
    df = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 15))], "id long, d date"
    ).coalesce(1)
    store.replace_product_all(42, {"IndicatorValues": df})
    aware = datetime.datetime(2024, 1, 15, tzinfo=datetime.timezone.utc)
    assert len(store.live_files("IndicatorValues", [("d", "==", aware)])) == 1
    got = store.read("IndicatorValues", [("d", "==", aware)])
    assert [r["id"] for r in got.collect()] == [1]


def test_vacuum_prune_history_ignores_tmp_leftovers(spark, tmp_path):
    """ADVICE r7 (low): a crashed _append_history leaves a
    _tmp-*.json that sorts AFTER every real journal entry; the
    prune-history listing must not treat it as the latest entry's
    'successor' (which would unlink the genuine latest entry and
    break read_at/read_changes baselines). Stale tmp files are GC'd."""
    import json as _json
    import os
    import time

    root = str(tmp_path / "store")
    pid = 43
    store = TableStore(spark, root)

    def frame(rows):
        return spark.createDataFrame(rows, "k long, v string").withColumn(
            PARTITION_COL, F.lit(pid).cast("long")
        )

    store.replace_product_all(pid, {"IndicatorValues": frame([(1, "a")])})
    time.sleep(0.02)
    store.append("IndicatorValues", frame([(2, "b")]))
    part = Path(root) / "IndicatorValues" / f"{PARTITION_COL}={pid}"
    hist = part / "_history"
    entries_before = sorted(
        h.name for h in hist.glob("*.json") if not h.name.startswith("_")
    )
    assert len(entries_before) == 2
    latest = entries_before[-1]
    # crashed-writer leftover: valid JSON, old committed_at, name sorts
    # last; STALE past the unknown-grace floor (a younger tmp may be a
    # live writer mid-append and must survive — checked below)
    tmp = hist / "_tmp-zzzzzzzzzzzzzzzzzzzz.json"
    tmp.write_text(_json.dumps({"committed_at": 1.0, "files": []}))
    old = time.time() - store.VACUUM_UNKNOWN_GRACE_SECONDS - 60
    os.utime(tmp, (old, old))
    fresh = hist / "_tmp-yyyyyyyyyyyyyyyyyyyy.json"
    fresh.write_text(_json.dumps({"committed_at": 1.0, "files": []}))

    store.vacuum("IndicatorValues", older_than_seconds=0.0, prune_history=True)
    after = sorted(h.name for h in hist.glob("*.json"))
    assert latest in after            # keep-latest invariant holds
    assert not tmp.exists()           # stale tmp GC'd
    assert fresh.exists()             # possible LIVE writer: spared
    # the latest snapshot is still materializable
    assert store.read_at("IndicatorValues", time.time()).count() == 2


def test_format_tag_blocks_backend_mismatch(spark, tmp_path):
    """ADVICE r7 (low): opening a store with the WRONG commit backend
    must fail fast instead of silently reading zero manifests
    (listing-mode degradation that resurrects superseded rows) — both
    via the recorded tag and, for pre-tag legacy roots, via layout
    detection."""
    root = str(tmp_path / "store")
    pid = 44
    store = TableStore(spark, root, backend="localfs")
    df = spark.createDataFrame([(1, "a")], "k long, v string").withColumn(
        PARTITION_COL, F.lit(pid).cast("long")
    )
    store.replace_product_all(pid, {"IndicatorValues": df})

    with pytest.raises(ValueError, match="formatted for commit backend 'localfs'"):
        TableStore(spark, root, backend="cas")
    # same backend reopens fine
    assert TableStore(spark, root, backend="localfs").count_rows("IndicatorValues") == 1

    # legacy root (no tag): detection still refuses the mismatch and
    # the matching open retro-tags it
    (Path(root) / TableStore.FORMAT_TAG).unlink()
    with pytest.raises(ValueError, match="formatted for commit backend 'localfs'"):
        TableStore(spark, root, backend="cas")
    TableStore(spark, root, backend="localfs")
    assert (Path(root) / TableStore.FORMAT_TAG).exists()

    # wrapper backends (format_name=None) opt out entirely
    class Wrapper(make_backend("localfs").__class__):
        format_name = None

    TableStore(spark, root, backend=Wrapper())


def test_format_tag_memo_survives_root_recreation(spark, tmp_path):
    """Review r10 wave 4: the process-lifetime verification memo must
    not outlive the tag file's IDENTITY — a root deleted and recreated
    under a DIFFERENT backend reuses the same path, and an
    existence-only memo check would wave the stale verification
    through (every partition degrades to listing mode)."""
    import shutil

    root = str(tmp_path / "store")
    pid = 45
    df = spark.createDataFrame([(1, "a")], "k long, v string").withColumn(
        PARTITION_COL, F.lit(pid).cast("long")
    )
    TableStore(spark, root, backend="localfs").replace_product_all(
        pid, {"IndicatorValues": df}
    )
    # memoized: a re-open is the fast path
    TableStore(spark, root, backend="localfs")

    shutil.rmtree(root)
    cas = TableStore(spark, root, backend="cas")
    cas.replace_product_all(pid, {"IndicatorValues": df})

    # the stale (root, 'localfs') memo must NOT bless this open
    with pytest.raises(ValueError, match="formatted for commit backend 'cas'"):
        TableStore(spark, root, backend="localfs")
    assert TableStore(spark, root, backend="cas").count_rows("IndicatorValues") == 1


def test_pending_journal_rolls_forward_after_grace(spark, tmp_path):
    """ADVICE r7 (low): a writer crashing between the manifest CAS and
    the journal append pins journal_pending_floor at that commit
    forever (no recovery path appends the entry). After the grace
    window the floor itself must roll the entry forward from the
    current manifest body, unclamping the change feed."""
    import time

    from geo_explorer_etl_spark.streaming.incremental import ChangeFeedReader

    root = str(tmp_path / "store")
    pid = 45
    store = TableStore(spark, root)

    def frame(rows):
        return spark.createDataFrame(rows, "k long, v string").withColumn(
            PARTITION_COL, F.lit(pid).cast("long")
        )

    reader = ChangeFeedReader(store, "IndicatorValues", "stall_probe")
    store.replace_product_all(pid, {"IndicatorValues": frame([(1, "a")])})
    assert reader.poll(until=time.time()) is not None

    # simulate the crash: commit lands, journal entry does not
    store.append("IndicatorValues", frame([(2, "b")]))
    part = Path(root) / "IndicatorValues" / f"{PARTITION_COL}={pid}"
    latest = sorted(
        h for h in (part / "_history").glob("*.json") if not h.name.startswith("_")
    )[-1]
    latest.unlink()

    ts = store._manifest(part)["committed_at"]
    # inside the grace window: presumed live writer -> floor clamps
    assert store.journal_pending_floor("IndicatorValues") == ts
    assert reader.poll(until=time.time()) is None  # feed stalled (clamped)

    # past the grace window: entry rolled forward, floor clears,
    # the feed delivers the stranded commit
    store.JOURNAL_REPAIR_GRACE_SECONDS = 0.0
    assert store.journal_pending_floor("IndicatorValues") is None
    seen = reader.poll(until=time.time())
    assert sorted(r["k"] for r in seen.filter(F.col("_change_type") == "insert").collect()) == [2]


def test_vacuum_spares_midflight_publish_on_cas_backend(spark, tmp_path):
    """VERDICT r7 directive #3: on the lock-free CAS backend the store
    lock is a no-op, so a vacuum(0) running in a publish's
    rename→manifest-swap window must not unlink the just-renamed (not
    yet manifested) data files. The staged txn's committed MANIFEST
    names them — the GC skips those names."""
    root = str(tmp_path / "store")
    pid = 46
    store = TableStore(spark, root, backend="cas")

    def frame(rows):
        return spark.createDataFrame(rows, "k long, v string").withColumn(
            PARTITION_COL, F.lit(pid).cast("long")
        )

    store.replace_product_all(pid, {"IndicatorValues": frame([(1, "v1"), (2, "v1")])})
    # the concurrent maintenance handle opens BEFORE the publish (so
    # its recover() can't be the thing that completes the txn)
    other = TableStore(spark, root, backend="cas")

    # second publish, paused between the file renames and the manifest
    # swap: hijack _update_manifest to run a concurrent vacuum(0) from
    # the other handle exactly in that window
    raced = {"fired": False, "removed": None}
    real_update = store._update_manifest

    def pause_then_update(part_dir, update_fn):
        if not raced["fired"] and part_dir.name == f"{PARTITION_COL}={pid}":
            raced["fired"] = True
            raced["removed"] = other.vacuum(
                "IndicatorValues", older_than_seconds=0.0
            )
        return real_update(part_dir, update_fn)

    store._update_manifest = pause_then_update
    try:
        store.replace_product_all(pid, {"IndicatorValues": frame([(3, "v2")])})
    finally:
        store._update_manifest = real_update

    assert raced["fired"]
    # the publish completed intact: replacement rows all present,
    # nothing the txn had renamed was eaten
    out = store.read("IndicatorValues")
    assert {(r["k"], r["v"]) for r in out.select("k", "v").collect()} == {(3, "v2")}
    report = store.fsck("IndicatorValues")
    assert not report.get("IndicatorValues", {}).get("missing")
    # superseded v1 files are NOT mid-flight: a later vacuum still
    # GCs them at the cutoff exactly (retention contract intact)
    assert store.vacuum("IndicatorValues", older_than_seconds=0.0) > 0


def test_vacuum_retention_gates_on_supersede_time_not_mtime(spark, tmp_path):
    """Review r8 wave-2 #1: a file WRITTEN hours ago but superseded a
    second ago is inside every in-flight reader's snapshot window —
    vacuum(W) must keep it until the SUPERSEDING commit is W old, not
    until the file's write mtime is. (The old mtime gate deleted it
    immediately.)"""
    import os
    import time

    root = str(tmp_path / "store")
    pid = 47
    store = TableStore(spark, root)

    def frame(rows):
        return spark.createDataFrame(rows, "k long, v string").withColumn(
            PARTITION_COL, F.lit(pid).cast("long")
        )

    store.replace_product_all(pid, {"IndicatorValues": frame([(1, "v1")])})
    part = Path(root) / "IndicatorValues" / f"{PARTITION_COL}={pid}"
    v1_files = set(store._manifest(part)["files"])
    # age the v1 data files far past any retention window
    old = time.time() - 7200
    for n in v1_files:
        os.utime(part / n, (old, old))

    store.replace_product_all(pid, {"IndicatorValues": frame([(2, "v2")])})
    # superseded ONE moment ago: an hour-long retention window must
    # spare the old files regardless of their ancient write mtime
    assert store.vacuum("IndicatorValues", older_than_seconds=3600.0) == 0
    assert all((part / n).exists() for n in v1_files)
    # and read_at still materializes the pre-replace snapshot
    assert store.read_at("IndicatorValues", time.time() - 0.0001) is not None

    # outside the window (supersede time aged past it): GC proceeds
    assert store.vacuum("IndicatorValues", older_than_seconds=0.0) >= len(v1_files)
    assert not any((part / n).exists() for n in v1_files)


def test_vacuum_gcs_stale_rewrite_staging_dirs(spark, tmp_path):
    """Review r8 wave-2 #4: a crashed merge/delete/compact leaves a
    _merge_*/_delete_*/_compact_* staging dir full of data nothing
    references; vacuum reclaims it once stale, spares a fresh one
    (possible live writer)."""
    import os
    import time

    root = str(tmp_path / "store")
    pid = 48
    store = TableStore(spark, root)
    df = spark.createDataFrame([(1, "a")], "k long, v string").withColumn(
        PARTITION_COL, F.lit(pid).cast("long")
    )
    store.replace_product_all(pid, {"IndicatorValues": df})
    part = Path(root) / "IndicatorValues" / f"{PARTITION_COL}={pid}"

    stale = part / "_merge_deadbeef"
    stale.mkdir()
    (stale / "part-0.parquet").write_bytes(b"x")
    old = time.time() - store.VACUUM_UNKNOWN_GRACE_SECONDS - 60
    for p in (stale, stale / "part-0.parquet"):
        os.utime(p, (old, old))
    fresh = part / "_delete_cafebabe"
    fresh.mkdir()
    (fresh / "part-0.parquet").write_bytes(b"y")

    store.vacuum("IndicatorValues", older_than_seconds=0.0)
    assert not stale.exists()
    assert fresh.exists()


def test_backend_read_cache_is_byte_bounded_and_thread_safe(tmp_path):
    """Review r10 wave 4: the parsed-manifest caches hold whole bodies
    (stats+blooms maps can be MBs), so the bound must be BYTES, not
    entry count; and because backends are process-shared singletons
    used concurrently, every cache touch — including delete()'s
    prefix sweep — must be lock-guarded."""
    import json as _json
    import threading

    from geo_explorer_etl_spark.sources.commit import CASBackend, LocalFSBackend

    b = LocalFSBackend()
    b.READ_CACHE_MAX_BYTES = 4096
    big = {"files": ["f" * 100] * 10}  # ~1 KB of JSON each
    for i in range(12):
        d = tmp_path / f"p{i}"
        d.mkdir()
        (d / "m.json").write_text(_json.dumps(big))
        assert b.read(d, "m.json") is not None
    # accounted bytes never exceed the cap (wholesale reset on overflow)
    assert b._read_cache_bytes <= 4096
    assert 0 < len(b._read_cache) < 12

    # concurrent CAS reads + deletes over one instance: the unlocked
    # version died with "dictionary changed size during iteration"
    cb = CASBackend()
    for i in range(64):
        d = tmp_path / f"c{i}"
        cb.write(d, "m", {"v": i}, 0)
        cb.read(d, "m")
    errs = []

    def deleter():
        try:
            for i in range(0, 64, 2):
                cb.delete(tmp_path / f"c{i}", "m")
        except Exception as e:  # pragma: no cover - the regression
            errs.append(e)

    def reader():
        try:
            for _ in range(20):
                for i in range(1, 64, 2):
                    cb.read(tmp_path / f"c{i}", "m")
        except Exception as e:  # pragma: no cover - the regression
            errs.append(e)

    ts = [threading.Thread(target=f) for f in (deleter, reader, reader)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs


def test_store_sink_stream_id_resolution():
    """Review r10 wave 4: two pipelines sharing the old constant
    default stream_id shared ONE epoch high-water — the younger
    query's batches silently dropped. No stream_id now derives from
    the checkpoint (the query's durable identity) or refuses."""
    import pytest as _pytest

    from geo_explorer_etl_spark.streaming.store_sink import StoreStreamWriter

    resolve = StoreStreamWriter._resolve_stream_id
    assert resolve({"stream_id": "pipe"}) == "pipe"
    a = resolve({"checkpointlocation": "/ck/a"})
    b = resolve({"checkpointlocation": "/ck/b"})
    assert a.startswith("ck-") and a != b
    assert a == resolve({"checkpointlocation": "/ck/a"})  # stable
    with _pytest.raises(ValueError, match="stream_id"):
        resolve({})
