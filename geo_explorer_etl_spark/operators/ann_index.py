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
PQ_TABLE = "AnnPqCodebooks"
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


def _last_commit(store: TableStore, table: str) -> float:
    if not store.exists(table):
        return 0.0
    ts = [
        h["committed_at"]
        for h in store.history(table)
        if h.get("committed_at") is not None
    ]
    return max(ts, default=0.0)


def index_snapshot(store: TableStore) -> tuple[float, list[list[float]], list | None]:
    """Resolve ONE timestamp covering all three index tables and load
    the centroid matrix + PQ codebooks AT that timestamp — so a query
    (or an append's assignment pass) sees a single consistent index
    GENERATION even while a concurrent ``build_ann_index`` txn is
    publishing (ADVICE r12 #3: two independent live reads could pair
    new centroids with old assignments). The timestamp is validated
    after loading and the load retried if a commit landed in between
    (the cross-table publish is sequential renames; re-resolving
    closes the straddle window). Returns ``(ts, centroids,
    codebooks|None)``."""

    def maxts() -> float:
        # reverse publish order (publish walks tables alphabetically):
        # if a publish is mid-flight, the max lands BEFORE its first
        # swap or AFTER its last far more often than in between
        return max(
            _last_commit(store, t)
            for t in (PQ_TABLE, INDEX_TABLE, CENTROID_TABLE)
        )

    last_err: Exception | None = None
    for _ in range(3):
        ts = maxts()
        try:
            crows = store.read_at(CENTROID_TABLE, ts)
            if crows is None:
                raise ValueError("index_snapshot: no AnnCentroids committed yet")
            cents = [
                list(map(float, r["centroid"]))
                for r in sorted(
                    crows.select("cell", "centroid").collect(),
                    key=lambda r: r["cell"],
                )
            ]
            books = _codebooks_at(store, ts)
        except (ValueError, FileNotFoundError) as e:
            # a concurrent rebuild vacuum/replace raced the load —
            # re-resolve and retry
            last_err = e
            continue
        if maxts() == ts:
            return ts, cents, books
    if last_err is not None:
        raise last_err
    raise RuntimeError(
        "index_snapshot: index tables kept committing during 3 resolution "
        "attempts — retry when the rebuild settles"
    )


def _codebooks_at(store: TableStore, ts: float) -> list | None:
    if not store.exists(PQ_TABLE):
        return None
    df = store.read_at(PQ_TABLE, ts)
    if df is None:
        return None
    rows = df.select("m", "code", "centroid").collect()
    by_m: dict[int, dict[int, list[float]]] = {}
    for r in rows:
        by_m.setdefault(r["m"], {})[r["code"]] = list(map(float, r["centroid"]))
    return [[by_m[j][c] for c in sorted(by_m[j])] for j in sorted(by_m)]


# -- product quantization (IVF-PQ, the FAISS composition) --------------------
def train_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_limit: int = 2000,
    iters: int = 10,
) -> list[list[list[float]]]:
    """Per-subspace k-means codebooks (m × k × dim/m), trained on the
    same seeded hash-drawn sample rule as ``train_centroids`` — driver
    data bounded by the sample, the codebooks themselves m·k·(dim/m) =
    k·dim doubles. Deterministic: seeded sample, farthest-first init
    per subspace, fixed iterations."""
    import numpy as np

    if not 1 <= k <= 256:
        raise ValueError(
            f"train_pq_codebooks: k={k} — PQ codes are one uint8 per "
            "subspace, so k must be in [1, 256] (k>256 would silently "
            "alias codewords modulo 256)"
        )
    n = emb.count()
    if n == 0:
        raise ValueError("train_pq_codebooks: empty embedding frame")
    mod = max(1, n // sample_limit)
    rows = (
        emb.select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v"))
        .filter(F.pmod(F.xxhash64(F.col("_id")), F.lit(mod)) == F.lit(0))
        .select("_v")
        .collect()
    )
    x = np.array([list(r["_v"]) for r in rows], dtype=np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"train_pq_codebooks: dim {dim} not divisible by m={m}")
    sub = dim // m
    books: list[list[list[float]]] = []
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        # farthest-first init (the train_centroids rule, per subspace)
        kk = min(k, len(xs))
        chosen = [0]
        d = ((xs - xs[0]) ** 2).sum(axis=1)
        for _ in range(1, kk):
            nxt = int(np.argmax(d))
            chosen.append(nxt)
            d = np.minimum(d, ((xs - xs[nxt]) ** 2).sum(axis=1))
        c = xs[chosen].copy()
        for _ in range(iters):
            dist = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = dist.argmin(axis=1)
            for ci in range(len(c)):
                members = xs[assign == ci]
                if len(members):
                    c[ci] = members.mean(axis=0)
        books.append([[float(v) for v in row] for row in c])
    return books


def _pq_encode(df: DataFrame, books: list[list[list[float]]], vec_col: str) -> DataFrame:
    """Add ``pq_code`` (binary, one uint8 per subspace): per-subspace
    argmin-L2 against the codebooks — an Arrow-batched distance matmul,
    all input columns carried through (the ``_assign_cells`` shape).
    Ties break to the lowest code index (argmin), deterministic."""
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema)

    def encode(batches):
        import numpy as np

        bs = [np.array(b, dtype=np.float64) for b in books]
        sub = bs[0].shape[1]
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            codes = np.empty((len(x), len(bs)), dtype=np.uint8)
            for j, cb in enumerate(bs):
                xs = x[:, j * sub : (j + 1) * sub]
                d = ((xs[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d.argmin(axis=1).astype(np.uint8)
            out = pdf.copy()
            out["pq_code"] = [c.tobytes() for c in codes]
            yield out

    return df.mapInPandas(encode, schema=f"{fields}, pq_code binary")


def load_pq_codebooks(store: TableStore) -> list[list[list[float]]] | None:
    """The m × k × sub codebook tensor, driver-side; None when the
    index was built without PQ."""
    if not store.exists(PQ_TABLE):
        return None
    rows = store.read(PQ_TABLE).select("m", "code", "centroid").collect()
    by_m: dict[int, dict[int, list[float]]] = {}
    for r in rows:
        by_m.setdefault(r["m"], {})[r["code"]] = list(map(float, r["centroid"]))
    return [
        [by_m[j][c] for c in sorted(by_m[j])] for j in sorted(by_m)
    ]


def build_ann_index(
    store: TableStore,
    emb: DataFrame,
    n_centroids: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    n_files: int = 4,
    pq_m: int | None = None,
    pq_k: int = 16,
    pq_codebooks: list[list[list[float]]] | None = None,
    report: dict | None = None,
) -> dict:
    """(Re)build the persisted IVF index from scratch: train (or
    adopt) centroids, assign every vector, publish BOTH tables in one
    atomic cross-table txn — a crash leaves the prior index intact,
    never a centroid/assignment mismatch. K defaults to ~√n (the
    similarity.py IVF rule). Returns the report dict.

    ``pq_m`` switches on IVF-PQ (the FAISS composition): per-subspace
    codebooks train alongside the cells, every row additionally
    carries an m-byte ``pq_code``, and the codebook table joins the
    same atomic txn. At 100 TB the PQ scoring pass then reads m bytes
    per vector instead of 4·dim (``ann_index_topk(pq_refine=...)``)."""
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
    rows = _assign_cells(emb, centroids, vec_col)
    tables = {CENTROID_TABLE: cdf, INDEX_TABLE: None}
    if pq_m is not None or pq_codebooks is not None:
        books = pq_codebooks if pq_codebooks is not None else train_pq_codebooks(
            emb, m=pq_m, k=pq_k, vec_col=vec_col, id_col=id_col
        )
        # every book must fit uint8 codes — an oversized book passed in
        # via pq_codebooks would alias codewords modulo 256, silently
        # corrupting ADC scores and recall (ADVICE r12 #5)
        for j, book in enumerate(books):
            if not 1 <= len(book) <= 256:
                raise ValueError(
                    f"build_ann_index: codebook {j} has {len(book)} "
                    "codewords — PQ codes are uint8, so every book must "
                    "hold 1..256"
                )
        rep["pq_m"], rep["pq_k"] = len(books), len(books[0])
        rows = _pq_encode(rows, books, vec_col)
        tables[PQ_TABLE] = spark.createDataFrame(
            [
                (j, c, cw)
                for j, book in enumerate(books)
                for c, cw in enumerate(book)
            ],
            "m INT, code INT, centroid ARRAY<DOUBLE>",
        ).withColumn(PARTITION_COL, F.lit(INDEX_PID).cast("long"))
    tables[INDEX_TABLE] = _cluster_by_cell(rows, n_files)
    store.replace_product_all(INDEX_PID, tables)
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
    # one consistent generation: centroids + codebooks resolved at a
    # single snapshot ts (ADVICE r12 #3)
    _ts, cents, books = index_snapshot(store)
    assigned = _assign_cells(batch, cents, vec_col)
    if books is not None:
        # the index carries PQ codes: encode the batch against the
        # FROZEN codebooks (same rule as the frozen cells)
        assigned = _pq_encode(assigned, books, vec_col)
    counts = assigned.groupBy("cell").count().collect()  # ≤ K rows
    total = sum(r["count"] for r in counts)
    rep["batch_rows"] = total
    rep["cell_skew"] = (
        round(max((r["count"] for r in counts), default=0) / total, 4) if total else 0.0
    )
    if total:
        store.append(INDEX_TABLE, _cluster_by_cell(assigned, n_files))
    return rep


def maintain_ann_index(
    store: TableStore,
    skew_threshold: float = 4.0,
    recall_floor: float | None = None,
    recall_queries: int = 8,
    recall_k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_files: int = 4,
    report: dict | None = None,
) -> dict:
    """The DRIFT POLICY the ``cell_skew`` signal was missing (VERDICT
    r12 missing #3): measure the index's health and rebuild — cells,
    assignments AND PQ codebooks, through ``build_ann_index``'s
    existing one-txn path — when it crosses a threshold. Two
    triggers, both seeded/deterministic:

    - ``skew``: max cell share × K (1.0 = perfectly balanced). A year
      of drifting appends piles rows into few frozen cells and probe
      cost degrades toward a scan; ``skew > skew_threshold`` (default
      4×: the hottest cell holds 4× its balanced share) rebuilds.
    - ``recall_floor`` (optional): a sampled-recall probe — the
      ``recall_queries`` index vectors with the smallest
      ``xxhash64(id)`` query the index at ``nprobe`` and are scored
      against exact brute-force cosine over the same snapshot;
      ``recall < recall_floor`` rebuilds even when skew looks fine
      (correlated drift can poison geometry without imbalance).

    A HEALTHY index is a no-op: one K-row groupBy count (plus the
    bounded probe when enabled), no writes. A rebuild retrains
    centroids at K ≈ √n and, if the index carries PQ codes, retrains
    the codebooks at the same (m, k) — closing the "codebooks frozen
    forever" recall rot. Returns the report (``rebuilt``, ``skew``,
    ``recall``, nested rebuild report)."""
    rep: dict = report if report is not None else {}
    ts, cents, books = index_snapshot(store)
    k_cells = len(cents)
    idx = store.read_at(INDEX_TABLE, ts)
    counts = idx.groupBy("cell").count().collect()  # ≤ K driver rows
    total = sum(r["count"] for r in counts)
    max_share = max((r["count"] for r in counts), default=0) / max(1, total)
    rep["n_vectors"], rep["n_cells"] = total, k_cells
    rep["skew"] = round(max_share * k_cells, 4)
    trigger = rep["skew"] > skew_threshold
    rep["trigger"] = "skew" if trigger else None
    if not trigger and recall_floor is not None:
        rep["recall"] = _sampled_recall(
            store, idx, recall_queries, recall_k, nprobe,
            id_col, vec_col, label_col,
        )
        if rep["recall"] < recall_floor:
            trigger, rep["trigger"] = True, "recall"
    rep["rebuilt"] = trigger
    if not trigger:
        return rep
    vectors = idx.drop("cell", "pq_code", PARTITION_COL)
    rebuild: dict = {}
    build_ann_index(
        store,
        vectors,
        id_col=id_col,
        vec_col=vec_col,
        n_files=n_files,
        # PQ follows the index: retrain at the SAME (m, k) when codes
        # exist, stay PQ-free when they don't
        pq_m=len(books) if books else None,
        pq_k=len(books[0]) if books else 16,
        report=rebuild,
    )
    rep["rebuild"] = rebuild
    return rep


def _sampled_recall(
    store, idx, n_queries, k, nprobe, id_col, vec_col, label_col
) -> float:
    """Seeded recall probe: overlap between the index's nprobe-cell
    top-k and exact brute-force cosine, averaged over the n_queries
    hash-smallest index vectors (deterministic across runs and
    partitionings; driver data = n_queries rows + 2·k ids each)."""
    qrows = (
        idx.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_queries)
        .collect()
    )
    if not qrows:
        return 1.0
    hits = 0
    for q in qrows:
        qv = [float(x) for x in q[vec_col]]
        got = {
            r[id_col]
            for r in ann_index_topk(
                store, qv, k=k, nprobe=nprobe, id_col=id_col,
                vec_col=vec_col, label_col=label_col,
                exclude_id=q[id_col],
            ).collect()
        }
        qarr = F.array(*[F.lit(x) for x in qv])
        truth = {
            r[id_col]
            for r in idx.filter(F.col(id_col) != q[id_col])
            .select(
                id_col,
                F.round(cosine(_as_double(F.col(vec_col)), qarr), 6).alias("c"),
            )
            .orderBy(F.col("c").desc(), F.col(id_col))
            .limit(k)
            .collect()
        }
        hits += len(got & truth)
    return hits / (k * len(qrows))


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
    pq_refine: int | None = None,
    report: dict | None = None,
) -> DataFrame:
    """Top-k by exact cosine inside the query's ``nprobe`` cells,
    served from the PERSISTED index: the ``cell IN`` probe reads only
    the zone-map-selected files (prune-only — the plan's own cell
    filter enforces exact membership, the incremental_dedup rule).
    Same output shape as ``similarity.ivf_topk``.

    ``pq_refine`` (needs a ``pq_m`` build) switches the scoring pass
    to ASYMMETRIC-DISTANCE over the m-byte PQ codes: the probed scan
    reads ONLY (id, cell, pq_code) — column pruning drops the raw
    vectors, a 4·dim/m I/O reduction — keeps the ``k × pq_refine``
    best by the LUT-summed approximate dot, and re-ranks just those
    by exact cosine (one id-bounded fetch). The final top-k equals
    the exact top-k whenever it survives the ADC cut — the recall
    pytest gates it."""
    rep: dict = report if report is not None else {}
    # centroids, codebooks AND the index scan all resolve at ONE
    # snapshot ts — a concurrent rebuild committing mid-query can no
    # longer pair new cell geometry with old assignments (ADVICE r12
    # #3); read_at prunes the snapshot's files through the same zone
    # maps as the live read
    ts, cents, books = index_snapshot(store)
    qv = [float(x) for x in query_vec]
    cells = query_cells(cents, qv, nprobe)
    rep["probed_cells"] = cells
    qarr = F.array(*[F.lit(x) for x in qv])

    def exact_topk(cands, kk):
        return (
            cands.select(
                F.col(id_col),
                F.col(label_col),
                F.round(cosine(_as_double(F.col(vec_col)), qarr), 6).alias(
                    "cosine"
                ),
            )
            .orderBy(F.col("cosine").desc(), F.col(id_col))
            .limit(kk)
        )

    if pq_refine is None:
        cands = store.read_at(
            INDEX_TABLE, ts, where=[("cell", "in", cells)], prune_only=True
        ).filter(F.col("cell").isin(cells))
        if exclude_id is not None:
            cands = cands.filter(F.col(id_col) != exclude_id)
        return exact_topk(cands, k)

    if books is None:
        raise ValueError(
            "ann_index_topk: pq_refine set but the index was built "
            "without pq_m — rebuild with build_ann_index(pq_m=...)"
        )
    import numpy as np

    # ADC lookup table: dot(query_sub, codeword) per (subspace, code)
    # — m × k doubles, driver-side, shipped in the UDF closure
    sub = len(books[0][0])
    lut = [
        [
            float(np.dot(qv[j * sub : (j + 1) * sub], cw))
            for cw in book
        ]
        for j, book in enumerate(books)
    ]

    def adc(batches):
        import numpy as np
        import pandas as pd

        tbl = np.array(lut, dtype=np.float64)  # m × k
        m = tbl.shape[0]
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.frombuffer(
                b"".join(pdf["pq_code"].tolist()), dtype=np.uint8
            ).reshape(len(pdf), m)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "_adc": tbl[np.arange(m)[None, :], codes].sum(axis=1),
                }
            )

    idx = store.read_at(
        INDEX_TABLE, ts, where=[("cell", "in", cells)], prune_only=True
    ).filter(F.col("cell").isin(cells))
    if exclude_id is not None:
        idx = idx.filter(F.col(id_col) != exclude_id)
    id_type = dict(zip(idx.schema.names, idx.schema))[id_col].dataType.simpleString()
    shortlist = (
        idx.select(id_col, "pq_code")  # column-pruned scan: no vectors
        .mapInPandas(adc, schema=f"{id_col} {id_type}, _adc double")
        .orderBy(F.col("_adc").desc(), F.col(id_col))
        .limit(int(k) * int(pq_refine))
        .select(id_col)
    )
    refine = idx.join(F.broadcast(shortlist), id_col)
    return exact_topk(refine, k)
