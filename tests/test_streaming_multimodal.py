"""Streaming + multimodal tests: memory-sink streaming runs compared
to their batch twins; mapInPandas plumbing with the stubbed decoder."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geo_explorer_etl_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample_plan,
)
from geo_explorer_etl_spark.streaming.incremental import (
    run_to_memory,
    session_aggregates,
    stream_events,
    tumbling_counts,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_stream(spark, tmp_path_factory):
    # stream source dir = a copy of the events parquet file
    import shutil
    from pathlib import Path

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "events.parquet")
    return stream_events(spark, str(d))


def test_streaming_tumbling_matches_batch(spark, events_stream):
    streamed = run_to_memory(
        tumbling_counts(events_stream), "t_tumbling", output_mode="append"
    )
    from geo_explorer_etl_spark.plans.catalog_ext import stream_tumbling_agg

    batch = stream_tumbling_agg(spark, SF_SMOKE)
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    # append mode emits only watermark-closed windows; every emitted
    # window must match its batch twin exactly, and most windows close
    assert s <= b
    assert len(s) >= len(b) - 4  # ≤ watermark horizon (2h/1h windows) + tail


def test_streaming_sessions_close_and_sum(spark, events_stream):
    sessions = run_to_memory(
        session_aggregates(events_stream), "t_sessions", output_mode="append"
    )
    rows = sessions.collect()
    assert len(rows) > 0
    # session invariant: end >= start, positive counts
    assert all(r["session_end"] >= r["session_start"] for r in rows)
    assert all(r["n_events"] >= 1 for r in rows)
    # per-user totals of closed sessions can't exceed the user's events
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    totals = {r["user_id"]: r["c"] for r in ev.groupBy("user_id").agg(F.count("*").alias("c")).collect()}
    per_user = {}
    for r in rows:
        per_user[r["user_id"]] = per_user.get(r["user_id"], 0) + r["n_events"]
    assert all(per_user[u] <= totals[u] for u in per_user)


def test_multimodal_feature_plumbing(spark):
    rows = [
        (1, "image", "image/png", b"\x89PNG-fake-bytes-0123456789", 64, 64, None),
        (2, "audio", "audio/wav", b"RIFF-fake-audio", None, None, 2500),
        (3, "video", "video/mp4", b"\x00\x00ftyp-fake-video", 1920, 1080, 3500),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media, dim=8, fake=True)
    got = {r["media_id"]: r for r in feats.collect()}
    assert len(got) == 3
    assert got[1]["n_bytes"] == 26
    assert len(got[1]["feat"]) == 8
    # deterministic: same content → same features on a second run
    again = {r["media_id"]: r for r in extract_features(media, dim=8, fake=True).collect()}
    assert got[1]["feat"] == again[1]["feat"]
    assert got[2]["content_sha"] == again[2]["content_sha"]


def test_multimodal_decode_stub_raises(spark):
    media = spark.createDataFrame(
        [(1, "image", "image/png", b"x", None, None, None)], MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="NotImplementedError|codecs not available"):
        extract_features(media, fake=False).collect()


def test_video_frame_sampling_fanout(spark):
    media = spark.createDataFrame(
        [(3, "video", "video/mp4", b"v", None, None, 3500)], MEDIA_SCHEMA
    )
    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert [(r["frame_idx"], r["frame_ts_ms"]) for r in frames] == [
        (0, 0), (1, 1000), (2, 2000),
    ]


def test_stateful_first_seen_dedup(spark, events_stream, tmp_path):
    """applyInPandasWithState: per-key first-seen id + running count;
    final state must equal the batch ground truth."""
    from geo_explorer_etl_spark.streaming.stateful import streaming_first_seen_dedup

    out = streaming_first_seen_dedup(events_stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_stateful")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode may emit a row per batch per key; the LAST row per key
    # is the final state
    rows = spark.sql(
        "SELECT key, first_event_id, n_seen FROM t_stateful"
    ).toPandas()
    final = rows.groupby("key").last()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    truth = {
        r["event_type"]: (r["first_id"], r["n"])
        for r in ev.groupBy("event_type")
        .agg(F.min("event_id").alias("first_id"), F.count("*").alias("n"))
        .collect()
    }
    got = {k: (int(v["first_event_id"]), int(v["n_seen"])) for k, v in final.iterrows()}
    assert got == truth


def test_locale_formatting(spark):
    from geo_explorer_etl_spark.functions.nulls import format_number_locale

    df = spark.createDataFrame([(1234567.85,), (0.5,)], "v double")
    en = [r[0] for r in df.select(format_number_locale(F.col("v"), "en-US")).collect()]
    fr = [r[0] for r in df.select(format_number_locale(F.col("v"), "fr-CA")).collect()]
    assert en == ["1,234,567.9", "0.5"]
    assert fr == ["1 234 567,9", "0,5"]
