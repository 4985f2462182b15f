"""Structured Streaming operators: incremental ingest (the reference's
changed-cube polling, upgraded to a stream), watermarked windowed
aggregation, session windows, and foreachBatch upserts into the store."""
