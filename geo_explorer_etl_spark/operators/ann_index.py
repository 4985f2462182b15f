"""Persisted, incrementally-maintained IVF ANN index over a TableStore
(VERDICT r11 next #4) — the ``incremental_dedup`` pattern applied to
the similarity stack, so a daily-ingest pipeline stops re-paying
O(corpus) cell assignment per query session.

Two store tables, both living in the reserved index partition under
manifest control (atomic appends, time travel, describe/fsck — the
DedupExactIndex/DedupBandIndex shape, incremental_dedup.py):

- ``AnnCentroids``  — (cell, centroid) rows, K×dim total: the FROZEN
  cell geometry. Written once per (re)build in the same cross-table
  txn as the assignments, so a reader can never pair new centroids
  with old assignments or vice versa.
- ``AnnIvfIndex``   — (id, vector, payload..., cell) rows, appended
  RANGE-CLUSTERED on ``cell``: each written file covers a narrow cell
  range, which is exactly what makes a query's ``nprobe``-cell probe
  zone-map-prunable to the files holding those cells.

Execution shape (the 100 TB story):

- ``build_ann_index``: train k-means centroids (``train_centroids`` —
  seeded hash sample, driver data bounded by K×dim) or accept a fixed
  centroid set; assign every vector by an Arrow-batched matmul
  (``mapInPandas`` — a per-centroid column expression would codegen
  K×dim literal folds per row, minutes of analysis at K≈√n); publish
  both tables in ONE ``replace_product_all`` txn.
- ``append_ann_index``: read the K×dim centroid matrix driver-side,
  assign ONLY the batch, append clustered — O(batch), not O(corpus).
  Centroids stay frozen across appends (assignments would otherwise
  disagree with the files already written); after heavy drift,
  rebuild — the report's per-append ``cell_skew`` is the signal.
- ``ann_index_topk``: pick the query's ``nprobe`` closest cells from
  the driver-side centroid matrix, read the index PRUNE-ONLY with a
  ``cell IN`` predicate (whole zone-map-selected files; the exact
  cell filter re-applies in the plan — the incremental_dedup probe
  rule), exact cosine top-k inside. Scan cost ∝ the probed cells'
  files, never the index.

Cell assignment and probe-cell selection both use the
``_fixed_order_scores`` + stable-argsort rule shared with
``ivf_near_dup_pairs``, so a DuckDB oracle rebuilding the assignment
from injected centroid literals reproduces the candidate sets bit for
bit (catalog_ext.py's ann_ivf_topk index leg).

Reference parity: the reference has no vector surface at all — this
extends the engine's LLM-pipeline operator set (SURVEY §6 extension
lane, same as similarity.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from geo_explorer_etl_spark.operators.similarity import (
    _as_double,
    _fixed_order_scores,
    cosine,
    train_centroids,
)
from geo_explorer_etl_spark.sources.store import PARTITION_COL, TableStore

CENTROID_TABLE = "AnnCentroids"
INDEX_TABLE = "AnnIvfIndex"
#: All index rows live in one reserved store partition (the
#: incremental_dedup rule — the partition column is routing-only here).
INDEX_PID = 0


def _assign_cells(emb: DataFrame, cents: list[list[float]], vec_col: str) -> DataFrame:
    """Every input row plus its nearest-centroid ``cell`` — one
    Arrow-batched (batch × dim) @ (dim × K) matmul per partition, all
    input columns carried through unchanged. Ties break to the lowest
    cell index (stable argsort), matching the oracle's sequential
    argmax."""
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in emb.schema)

    def assign(batches):
        import numpy as np

        cmat = np.array(cents, dtype=np.float64)  # K × dim
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            dots = _fixed_order_scores(x, cmat)
            out = pdf.copy()
            out["cell"] = np.argsort(-dots, axis=1, kind="stable")[:, 0].astype("int32")
            yield out

    return emb.mapInPandas(assign, schema=f"{fields}, cell int")


def _cluster_by_cell(df: DataFrame, n_files: int) -> DataFrame:
    return (
        df.repartitionByRange(max(1, n_files), "cell")
        .sortWithinPartitions("cell")
        .withColumn(PARTITION_COL, F.lit(INDEX_PID).cast("long"))
    )


def load_centroids(store: TableStore) -> list[list[float]]:
    """The K×dim centroid matrix, driver-side (K rows — bounded by
    construction, the only driver data any index operation holds)."""
    rows = store.read(CENTROID_TABLE).select("cell", "centroid").collect()
    return [list(map(float, r["centroid"])) for r in sorted(rows, key=lambda r: r["cell"])]


def build_ann_index(
    store: TableStore,
    emb: DataFrame,
    n_centroids: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    n_files: int = 4,
    report: dict | None = None,
) -> dict:
    """(Re)build the persisted IVF index from scratch: train (or
    adopt) centroids, assign every vector, publish BOTH tables in one
    atomic cross-table txn — a crash leaves the prior index intact,
    never a centroid/assignment mismatch. K defaults to ~√n (the
    similarity.py IVF rule). Returns the report dict."""
    rep: dict = report if report is not None else {}
    n = emb.count()
    rep["n_vectors"] = n
    if n == 0:
        raise ValueError("build_ann_index: empty embedding frame")
    if centroids is None:
        k = n_centroids or max(2, int(math.isqrt(n)))
        centroids = train_centroids(
            emb, n_centroids=k, vec_col=vec_col, id_col=id_col
        )
    rep["n_centroids"] = len(centroids)
    spark = emb.sparkSession
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cell INT, centroid ARRAY<DOUBLE>"
    ).withColumn(PARTITION_COL, F.lit(INDEX_PID).cast("long"))
    assigned = _cluster_by_cell(_assign_cells(emb, centroids, vec_col), n_files)
    store.replace_product_all(
        INDEX_PID, {CENTROID_TABLE: cdf, INDEX_TABLE: assigned}
    )
    return rep


def append_ann_index(
    store: TableStore,
    batch: DataFrame,
    vec_col: str = "embedding",
    n_files: int = 2,
    report: dict | None = None,
) -> dict:
    """Extend the index by one ingest batch against the FROZEN
    centroids — O(batch) assignment plus one clustered atomic append.
    The report's ``cell_skew`` (max cell share of this batch) is the
    rebuild signal: drifted data piles into few cells and probe cost
    degrades toward a scan."""
    rep: dict = report if report is not None else {}
    cents = load_centroids(store)
    assigned = _assign_cells(batch, cents, vec_col)
    counts = assigned.groupBy("cell").count().collect()  # ≤ K rows
    total = sum(r["count"] for r in counts)
    rep["batch_rows"] = total
    rep["cell_skew"] = (
        round(max((r["count"] for r in counts), default=0) / total, 4) if total else 0.0
    )
    if total:
        store.append(INDEX_TABLE, _cluster_by_cell(assigned, n_files))
    return rep


def query_cells(
    cents: list[list[float]], query_vec: list[float], nprobe: int
) -> list[int]:
    """The query's ``nprobe`` closest cells by the same fixed-order
    dot + stable sort the assignment uses (reproducible across
    engines and partitionings)."""
    import numpy as np

    dots = _fixed_order_scores(
        np.array([query_vec], dtype=np.float64), np.array(cents, dtype=np.float64)
    )
    return [int(c) for c in np.argsort(-dots, axis=1, kind="stable")[0, :nprobe]]


def ann_index_topk(
    store: TableStore,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    exclude_id=None,
    report: dict | None = None,
) -> DataFrame:
    """Top-k by exact cosine inside the query's ``nprobe`` cells,
    served from the PERSISTED index: the ``cell IN`` probe reads only
    the zone-map-selected files (prune-only — the plan's own cell
    filter enforces exact membership, the incremental_dedup rule).
    Same output shape as ``similarity.ivf_topk``."""
    rep: dict = report if report is not None else {}
    cents = load_centroids(store)
    cells = query_cells(cents, [float(x) for x in query_vec], nprobe)
    rep["probed_cells"] = cells
    idx = store.read(
        INDEX_TABLE, where=[("cell", "in", cells)], prune_only=True
    )
    qarr = F.array(*[F.lit(float(x)) for x in query_vec])
    cands = idx.filter(F.col("cell").isin(cells))
    if exclude_id is not None:
        cands = cands.filter(F.col(id_col) != exclude_id)
    return (
        cands.select(
            F.col(id_col),
            F.col(label_col),
            F.round(cosine(_as_double(F.col(vec_col)), qarr), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
