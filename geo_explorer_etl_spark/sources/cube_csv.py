"""Cube CSV source (SURVEY.md §2.1 S1/S2).

The reference streams ``{pid}.csv`` from a zip in 20k-row pandas chunks
with a hand-built dtype dict (reference main.py:193–195,
dfhandler.py:15–23). Spark-first:

- the schema is still *declared-dynamic* — fixed core + one string
  column per cube dimension, built programmatically from metadata
  (never inferred, matching the reference);
- chunking disappears: the CSV scan is partitioned and pipelined by
  Spark; column pruning and predicate pushdown come from Catalyst;
- zips are expanded driver-side to a staging dir first (Spark's text
  reader can't split inside a zip — and an unsplittable 100 TB input
  would serialize the whole scan on one task).
"""

from __future__ import annotations

import zipfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Fixed core columns of every cube CSV (reference dfhandler.py:15–23).
CUBE_CORE_FIELDS: list[tuple[str, T.DataType]] = [
    ("REF_DATE", T.StringType()),
    ("DGUID", T.StringType()),
    ("UOM", T.StringType()),         # category in pandas; parquet/Tungsten dict-encode
    ("UOM_ID", T.ShortType()),
    ("VECTOR", T.StringType()),
    ("COORDINATE", T.StringType()),
    ("STATUS", T.StringType()),
    ("SYMBOL", T.StringType()),
    ("VALUE", T.DoubleType()),
]


def cube_schema(dimension_names: list[str]) -> T.StructType:
    """S2 — fixed core + one string column per (non-geography handled
    later) cube dimension, discovered from metadata at runtime."""
    fields = [T.StructField(n, t, True) for n, t in CUBE_CORE_FIELDS]
    fields += [
        T.StructField(d, T.StringType(), True)
        for d in dimension_names
        if d not in {n for n, _ in CUBE_CORE_FIELDS}
    ]
    return T.StructType(fields)


def extract_zip(zip_path: str, staging_dir: str) -> str:
    """S6 — expand the downloaded cube zip into a splittable staging
    area; returns the extracted csv path. Driver-side by design (one
    zip per product; the data parallelism is inside the CSV)."""
    out = Path(staging_dir)
    out.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(zip_path) as z:
        csvs = [n for n in z.namelist() if n.lower().endswith(".csv")]
        if not csvs:
            raise ValueError(f"no csv inside {zip_path}")
        z.extract(csvs[0], out)
    return str(out / csvs[0])


def read_cube_csv(
    spark: SparkSession, csv_path: str, dimension_names: list[str]
) -> DataFrame:
    """S1 — schema-declared CSV scan. ``maxPartitionBytes`` governs the
    split size (the reference's chunksize analog, but parallel)."""
    return (
        spark.read.schema(cube_schema(dimension_names))
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .csv(csv_path)
    )
