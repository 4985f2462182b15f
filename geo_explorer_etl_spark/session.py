"""SparkSession factory tuned for the engine.

Local mode is a correctness/bench harness; the config is written so the
same code runs unchanged on a multi-executor cluster:

- AQE on (runtime join-strategy switching, skew splitting, partition
  coalescing) — replaces the reference's hand-tuned chunk sizes
  (reference main.py:194, scdb.py:178).
- ``spark.sql.shuffle.partitions`` defaults to the local core count;
  on a real cluster AQE coalesces from a higher initial number.
- Session timezone pinned to UTC so results hash-match the DuckDB
  oracle (DuckDB timestamps are UTC-naive).
- Arrow enabled for the Pandas-UDF extension operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "geo_explorer_etl_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``cpus`` controls both local parallelism and the shuffle-partition
    count; at cluster scale callers pass ``extra_conf`` overrides
    instead (e.g. shuffle.partitions sized to data volume — AQE
    coalesces down, it never splits up non-skewed partitions).
    """
    n = cpus or DEFAULT_CPUS
    b = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # BucketedStore writes exactly one file per bucket; this flag
        # lets the scan report that file's sortBy ordering so bucketed
        # merge joins skip the per-read Sort as well as the Exchange.
        # Spark only claims the ordering when a bucket is a single file,
        # so multi-file buckets (e.g. partitioned mirrors read whole)
        # simply fall back to sorting — never wrong results.
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        # INT96 (the historical default) is deprecated AND carries no
        # parquet min/max statistics, which blinds both row-group
        # skipping and the TableStore manifest zone maps for timestamp
        # columns. Micros timestamps get full stats + pushdown.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Read testdata parquet tables; returns dict name -> DataFrame.

    Parquet scans get column pruning + predicate pushdown from Catalyst
    automatically (the Spark-native replacement for the reference's
    ``usecols``/``dtype`` manual pushdown, reference main.py:193–195).
    """
    all_names = names or (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    )
    out = {}
    for t in all_names:
        if t == "events":
            out[t] = _read_events(spark, sf_dir)
        else:
            out[t] = spark.read.parquet(f"{sf_dir}/{t}.parquet")
    return out


def ensure_parallelism(df, min_partitions: int | None = None):
    """Spread a narrow input before CPU-heavy row-local work.

    A small parquet table arrives as one partition (one file, one row
    group) and a compute-bound operator then runs on one core. At
    cluster scale inputs are many-files so this is a no-op; locally it
    buys cores at the cost of one round-robin shuffle of the (small)
    input. Only repartitions UP — never coalesces a well-split input.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _read_events(spark: SparkSession, sf_dir: str):
    """events.parquet timestamp handling, robust to the file's unit.

    Some generations of the testdata store ``ts`` as nanosecond
    timestamps, which the vectorized parquet reader rejects
    ([PARQUET_TYPE_ILLEGAL]); those are read as raw nanos (legacy conf)
    and converted with integer division — ``div`` not ``/``, because a
    double can't hold an epoch-nanos value exactly — truncating to
    micros exactly like DuckDB does. Other generations store
    microsecond timestamps, which arrive as a timestamp column already
    and need no conversion."""
    from pyspark.sql import functions as F

    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    ts_type = dict(ev.dtypes).get("ts")
    if ts_type in ("bigint", "long"):
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Mirror stream_events: micro-stamped generations arrive as
        # TIMESTAMP_NTZ; cast to TIMESTAMP (session tz is UTC, so the
        # wall-clock maps 1:1 onto the same instant) so the batch
        # schema is generation-invariant and watermark-requiring
        # consumers can mix batch frames with their streaming twins.
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev
