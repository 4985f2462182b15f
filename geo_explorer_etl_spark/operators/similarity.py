"""Embedding similarity search.

- ``cosine_topk``     — brute-force cosine top-k against one query
  vector: the correctness baseline. The dot product is a higher-order
  ``zip_with``+``aggregate`` fold — JVM-side, no Python. One pass over
  the corpus, a top-k sort of a scalar column; at 100 TB this is a
  full scan but embarrassingly parallel (no shuffle until the final
  k-row ordering, which AQE executes as a partial top-k per partition).
- ``lsh_bucket_topk`` — random-hyperplane LSH: each vector gets a
  sign-bit bucket; only the query's bucket is scanned. The scale path:
  bucket count 2^n_planes partitions the corpus so the scan touches
  ~corpus/2^n of the data; planes are deterministic (seeded) driver
  constants broadcast into the plan as literals.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def _dot(a: Column, b: Column) -> Column:
    """zip_with+aggregate fold. Measured (sf0.1, dim 64, ~1.8M pairs):
    this fold is ~3.5× FASTER than an unrolled 64-term element_at sum
    — the giant flat expression tree blows past JIT/codegen method
    limits, while the fold's tight loop stays hot. Don't "optimize"
    this into unrolled form again without re-measuring."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Brute-force cosine top-k neighbours of one stored vector.

    The 1-row query side is crossJoined broadcast — no shuffle of the
    corpus. Ties at equal (rounded) similarity break by id so the k-cut
    is deterministic.
    """
    q = (
        emb.filter(F.col(id_col) == query_vec_id)
        .select(_as_double(F.col(vec_col)).alias("qv"))
    )
    sims = (
        emb.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.col(label_col),
            F.round(cosine(_as_double(F.col(vec_col)), F.col("qv")), 6).alias("cosine"),
        )
    )
    return sims.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def _seeded_planes(n_planes: int, dim: int, seed: str = "geo-explorer-lsh") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from sha256 — stable
    across runs and engines, no RNG state in the plan."""
    planes = []
    for p in range(n_planes):
        row = []
        for j in range(dim):
            h = hashlib.sha256(f"{seed}:{p}:{j}".encode()).digest()
            (v,) = struct.unpack(">q", h[:8])
            row.append((v % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def bucket_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit p = 1 iff vec · plane_p >= 0."""
    bits = [
        F.when(
            _dot(vec, F.array(*[F.lit(w) for w in plane])) >= 0, F.lit(1)
        ).otherwise(F.lit(0))
        * (2**p)
        for p, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_bucket_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """ANN: scan only the query's LSH bucket, then exact cosine top-k
    within it. Recall < 1.0 by design — the scale/latency trade; the
    brute-force twin is the accuracy oracle."""
    dim = len(emb.select(vec_col).first()[0])
    planes = _seeded_planes(n_planes, dim)
    v = _as_double(F.col(vec_col))
    bucketed = emb.withColumn("bucket", bucket_bits(v, planes))
    qrow = bucketed.filter(F.col(id_col) == query_vec_id).select("bucket", v.alias("qv"))
    cands = (
        bucketed.filter(F.col(id_col) != query_vec_id)
        .join(F.broadcast(qrow), "bucket")
        .select(
            F.col(id_col),
            F.col(label_col),
            F.round(cosine(v, F.col("qv")), 6).alias("cosine"),
        )
    )
    return cands.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def _block_score_pairs(
    grouped: DataFrame,
    key_cols: list[str],
    threshold: float,
    id_type: str,
    tile_size: int = 512,
    sig_col: str | None = None,
    ord_col: str | None = None,
    own_mode: str = "prefix",
) -> DataFrame:
    """Score candidate pairs per bucket with tiled block arithmetic.

    ``grouped`` holds one row per (bucket-key..., id, vec float array);
    a pair is a candidate iff it shares ANY bucket key. Instead of
    enumerating candidate pairs and joining both vectors onto each one
    (which ships O(pairs × dim) bytes through the shuffle — the
    dominant cost: measured at sf0.1 the pair-join tail moved ~1 GB
    where this path moves ~4 MB), each bucket's members are split into
    hash tiles of ~``tile_size`` vectors, tile pairs meet through an
    equi-join on the bucket key, and an Arrow-batched numpy stage
    scores every cross pair in one vectorized sweep. Bytes shipped
    drop to O(n × bands × dim × tiles-per-bucket). Per-task memory is
    bounded by one Arrow input batch — Spark caps worker-bound batches
    at ``spark.sql.execution.arrow.maxBytesPerBatch`` (64 MB default)
    in addition to the row cap — plus, per block pair, 2 × tile_size
    vectors and a tile_size² score block; results are flushed every
    ``_FLUSH_ROWS`` candidate rows rather than accumulated across the
    whole batch. A degenerate bucket splits into bounded tile-pair
    tasks instead of one quadratic task — the 100 TB shape.

    Rows with a null id or null vector are dropped before tiling: the
    expression path scored them to a null cosine that the threshold
    filter discarded, while ``np.array`` over a None-bearing list
    would poison the whole batch (object dtype); the outcome (pair
    dropped) is identical, the failure mode is not.

    A pair sharing k buckets is scored k times (the price of not
    materializing a distinct pair set before the vectors); the dot is
    accumulated dimension-by-dimension in a fixed order, so every
    re-scoring produces the bit-identical double and the final
    ``distinct()`` collapses them exactly like the oracle's DISTINCT.
    With ``sig_col``/``ord_col`` set, each row also carries its FULL
    bucket signature plus this group's ordinal, and every pair is
    emitted from exactly ONE owning group — ``own_mode`` picks the
    ownership rule:

    - ``"prefix"`` (banded LSH): sig index IS the band; the pair
      belongs to its first colliding band, so groups mask pairs whose
      signatures already collided at an earlier index;
    - ``"min"`` (IVF multi-probe): sig is the unordered probed-cell
      set; the pair belongs to the SMALLEST cell id both rows probed,
      so groups mask pairs whose shared-cell minimum isn't this cell.

    Either way the mask costs cheap integer outers before any dot
    products are paid, removes the ~(expected shared-bucket
    multiplicity)× redundant scoring entirely, and — because no pair
    is ever scored twice — frees the dot products to use BLAS GEMM
    (the fixed-order constraint exists only so RE-scorings collapse
    bit-exactly under distinct(); with ownership there are none).
    BLAS GEMM is deliberately NOT used for the dot: its summation
    order varies with block shape, which would make re-scorings differ
    in the last ulp and survive distinct() as phantom rows.

    Python appears here only as Arrow-batched numpy (mapInPandas) —
    the same boundary the IVF assignment and multimodal decode use;
    the row-at-a-time UDF ban (SURVEY §2.13) is untouched.

    Returns (id_a, id_b, cosine) with id_a < id_b, cosine rounded to
    6 (rounding applied JVM-side so semantics match the expression
    path bit for bit), filtered to >= threshold, distinct.
    """
    grouped = grouped.filter(F.col("_id").isNotNull() & F.col("_vec").isNotNull())
    keys = [F.col(k) for k in key_cols]
    # per-bucket tile count: |bucket| / tile_size, via one tiny
    # aggregate (bucket-key cardinality rows) broadcast back
    counts = grouped.groupBy(*keys).agg(F.count(F.lit(1)).alias("_cnt"))
    tiled = grouped.join(F.broadcast(counts), key_cols).withColumn(
        "_tile",
        F.pmod(
            F.xxhash64(F.col("_id")), F.greatest(F.ceil(F.col("_cnt") / tile_size), F.lit(1))
        ).cast("int"),
    )
    member = [F.col("_id").alias("id"), F.col("_vec").alias("vec")]
    if sig_col is not None:
        member.append(F.col(sig_col).alias("sig"))
    blocks = tiled.groupBy(*keys, F.col("_tile")).agg(
        F.collect_list(F.struct(*member)).alias("_blk")
    )
    a = blocks.select(*keys, F.col("_tile").alias("_ta"), F.col("_blk").alias("_ba"))
    b = blocks.select(*keys, F.col("_tile").alias("_tb"), F.col("_blk").alias("_bb"))
    ord_expr = (
        F.col(ord_col).cast("int") if ord_col is not None else F.lit(0).cast("int")
    )
    block_pairs = a.join(b, key_cols).filter(F.col("_ta") <= F.col("_tb")).select(
        (F.col("_ta") == F.col("_tb")).alias("_same"),
        ord_expr.alias("_ord"),
        "_ba",
        "_bb",
    )
    # emit with a safety margin below the threshold; the exact
    # round-then-compare happens JVM-side so the cut is identical to
    # the expression path
    margin = threshold - 1e-6

    _FLUSH_ROWS = 1 << 18  # flush accumulated candidates every ~256k rows

    def score(batches):
        import numpy as np
        import pandas as pd

        def flush(out_a, out_b, out_c):
            return pd.DataFrame(
                {
                    "id_a": np.concatenate(out_a),
                    "id_b": np.concatenate(out_b),
                    "_cos": np.concatenate(out_c),
                }
            )

        use_sig = sig_col is not None
        for pdf in batches:
            out_a, out_b, out_c, pending = [], [], [], 0
            for same, ordv, blk_a, blk_b in zip(
                pdf["_same"], pdf["_ord"], pdf["_ba"], pdf["_bb"]
            ):
                ids_a = np.array([r["id"] for r in blk_a])
                X = np.array([r["vec"] for r in blk_a], dtype=np.float64)
                if same:
                    ids_b, Y = ids_a, X
                else:
                    ids_b = np.array([r["id"] for r in blk_b])
                    Y = np.array([r["vec"] for r in blk_b], dtype=np.float64)
                na, nb = X.shape[0], Y.shape[0]
                if use_sig:
                    # first-colliding-band ownership: every pair is
                    # scored exactly ONCE globally, so no re-scoring
                    # exists to keep bit-identical — BLAS GEMM is safe
                    # here (and ~an order of magnitude faster than the
                    # per-dimension passes; round(6) downstream absorbs
                    # summation-order ulps vs the SQL oracle)
                    dots = X @ Y.T
                    sqa = np.einsum("ij,ij->i", X, X)
                    sqb = sqa if same else np.einsum("ij,ij->i", Y, Y)
                else:
                    # fixed-order accumulation: outer-product per
                    # dimension, never GEMM — multi-cell IVF rescorings
                    # must produce the bit-identical double so the
                    # final distinct() collapses them
                    dots = np.zeros((na, nb))
                    sqa = np.zeros(na)
                    sqb = np.zeros(nb)
                    for j in range(X.shape[1]):
                        dots += np.outer(X[:, j], Y[:, j])
                        sqa += X[:, j] * X[:, j]
                        sqb += Y[:, j] * Y[:, j]
                cos = dots / np.outer(np.sqrt(sqa), np.sqrt(sqb))
                if use_sig:
                    Sa = np.array([r["sig"] for r in blk_a], dtype=np.int64)
                    Sb = Sa if same else np.array(
                        [r["sig"] for r in blk_b], dtype=np.int64
                    )
                    if own_mode == "prefix" and ordv > 0:
                        # owned by the first colliding band: mask pairs
                        # that already collided at an earlier index
                        not_mine = (
                            Sa[:, None, :ordv] == Sb[None, :, :ordv]
                        ).any(axis=-1)
                        cos = np.where(not_mine, -2.0, cos)  # below any margin
                    elif own_mode == "min":
                        # owned by the smallest shared cell id: for each
                        # a-side probe value, pairs where the b side also
                        # probed it lower their shared-min candidate —
                        # one (na, nb, p) boolean sweep per probe keeps
                        # memory linear in p instead of quadratic
                        shared_min = np.full(
                            (len(ids_a), len(ids_b)), np.iinfo(np.int64).max
                        )
                        for kk in range(Sa.shape[1]):
                            a_k = Sa[:, kk][:, None]          # (na, 1)
                            match = (a_k[:, :, None] == Sb[None, :, :]).any(-1)
                            shared_min = np.where(
                                match,
                                np.minimum(shared_min, a_k),
                                shared_min,
                            )
                        cos = np.where(shared_min != ordv, -2.0, cos)
                if same:
                    ii, jj = np.triu_indices(na, k=1)
                else:
                    ii, jj = np.meshgrid(np.arange(na), np.arange(nb), indexing="ij")
                    ii, jj = ii.reshape(-1), jj.reshape(-1)
                c = cos[ii, jj]
                keep = c >= margin
                ii, jj, c = ii[keep], jj[keep], c[keep]
                ia, ib = ids_a[ii], ids_b[jj]
                lo_mask = ia < ib
                out_a.append(np.where(lo_mask, ia, ib))
                out_b.append(np.where(lo_mask, ib, ia))
                out_c.append(c)
                pending += len(c)
                if pending >= _FLUSH_ROWS:
                    yield flush(out_a, out_b, out_c)
                    out_a, out_b, out_c, pending = [], [], [], 0
            if out_a:
                yield flush(out_a, out_b, out_c)

    scored = block_pairs.mapInPandas(
        score, schema=f"id_a {id_type}, id_b {id_type}, _cos double"
    )
    return (
        scored.select("id_a", "id_b", F.round(F.col("_cos"), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: ids whose vectors exceed
    the cosine threshold.

    This is the EXACT variant (all-pairs self-join) — the correctness
    oracle. At corpus scale compose it with the LSH bucketer: bucket
    first, run this within buckets (identical code, bounded pairs).
    Norms are precomputed once per row so the pair loop only pays one
    dot product.
    """
    first = emb.select(vec_col).first()
    if first is None:
        return emb.sparkSession.createDataFrame(
            [], f"id_a {emb.schema[id_col].dataType.simpleString()}, "
                f"id_b {emb.schema[id_col].dataType.simpleString()}, cosine double"
        )
    v = _as_double(F.col(vec_col))
    # spread the pair enumeration across the cluster: a single-file
    # corpus otherwise cross-joins (and pays every dot product) in ONE
    # task
    par = emb.sparkSession.sparkContext.defaultParallelism
    withn = emb.select(
        F.col(id_col), v.alias("_v"), F.sqrt(_dot(v, v)).alias("_n")
    )
    a = withn.repartition(par).select(
        F.col(id_col).alias("id_a"), F.col("_v").alias("va"), F.col("_n").alias("na")
    ).alias("a")
    b = withn.select(
        F.col(id_col).alias("id_b"), F.col("_v").alias("vb"), F.col("_n").alias("nb")
    ).alias("b")
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return pairs.select(
        "id_a", "id_b", F.round(cos, 6).alias("cosine")
    ).filter(F.col("cosine") >= threshold)


def bucketed_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    planes_per_band: int = 8,
    n_bands: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at scale: banded
    random-hyperplane LSH (OR-of-ANDs, the SimHash analog of MinHash
    banding). Each vector gets ``n_bands`` bucket ids, one per band of
    ``planes_per_band`` sign bits; candidate pairs share a bucket in
    ANY band (equi-join on (band, bucket) — never a CartesianProduct);
    the exact cosine then filters candidates, so precision is 1.0 and
    only recall trades off.

    For a pair at angle θ, P(same bucket in one band) = (1-θ/π)^r and
    recall = 1-(1-(1-θ/π)^r)^B. Candidate volume per band ~ n²/2^r.
    Tune r to the threshold regime: true near-dup corpora (cos ≥ 0.9,
    θ ≤ 26°) support r=8..16 with strong pruning; a weak threshold
    like 0.4 (θ ≈ 66°) needs r=2..3 — at that angle sign-bit LSH
    prunes little, which is a property of the similarity level, not of
    the plan. ``cosine_near_dup_pairs`` is the exact oracle; the
    recall gate in tests compares the two. Skewed buckets are handled
    by AQE skew-join or the salting helpers in operators/skew.
    """
    first = emb.select(vec_col).first()
    if first is None:  # empty input: same empty (id_a, id_b, cosine) frame as the exact twin
        return emb.sparkSession.createDataFrame(
            [], f"id_a {emb.schema[id_col].dataType.simpleString()}, "
                f"id_b {emb.schema[id_col].dataType.simpleString()}, cosine double"
        )
    dim = len(first[0])
    # full bucket signature, index = band: rides along (B small ints
    # per vector) so the scorer can assign each pair to its FIRST
    # colliding band and never score it twice. Signatures are computed
    # in ONE Arrow-batched numpy stage — (batch × dim) @ (dim × B·r)
    # then sign-bits packed per band — because the expression-fold
    # alternative (B·r higher-order F.aggregate dots) runs interpreted
    # per element: at 16 planes × 64 dims it was the measured dominant
    # cost of the whole query (~1 s of the ~2.5 s at sf0.1), not the
    # scoring. Sign flips from summation-order ulps need |dot| within
    # ~1e-13 of zero — never observed on the fixed gate datasets, and
    # round(6) guards the cosine side the same way.
    planes_np = [
        plane
        for band in range(n_bands)
        for plane in _seeded_planes(
            planes_per_band, dim, seed=f"geo-explorer-lsh:band{band}"
        )
    ]
    id_field = emb.schema[id_col]
    vec_field = emb.schema[vec_col]
    import pyspark.sql.types as T

    sig_schema = T.StructType(
        [
            T.StructField("_id", id_field.dataType),
            T.StructField("_vec", vec_field.dataType),
            T.StructField("_sig", T.ArrayType(T.IntegerType())),
        ]
    )

    def add_sig(batches):
        import numpy as np

        P = np.array(planes_np, dtype=np.float64).T          # (dim, B*r)
        w = (1 << np.arange(planes_per_band)).astype(np.int64)  # bit weights
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(x, dtype=np.float64) for x in pdf["_vec"]])
            bits = (V @ P >= 0).astype(np.int64)             # (n, B*r)
            buckets = bits.reshape(len(V), n_bands, planes_per_band) @ w
            out = pdf[["_id", "_vec"]].copy()
            out["_sig"] = [row.astype("int32") for row in buckets]
            yield out

    # band explode -> tiled block scoring (see _block_score_pairs):
    # each vector ships once per band instead of twice per candidate
    # pair — at sf0.1 that's ~4 MB through the shuffle vs the ~1 GB
    # the pair-join formulation moved, and the scoring itself is one
    # vectorized numpy sweep per tile pair instead of an interpreted
    # fold per pair.
    # The signature frame is materialized ONCE (r16, guide §4/§5): the
    # tiled scorer references its input from four plan positions (the
    # bucket-count aggregate and both legs of the tile self-join), and
    # without the checkpoint each copy re-ran the parquet scan AND this
    # Python signature stage — the captured plan showed 4× MapInPandas
    # over the same subtree. Checkpointing BEFORE the band explode
    # keeps the stored volume at one row per vector; the explode
    # re-runs per reference, a cheap JVM generator over cached rows.
    sig = (
        emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
        # null ids/vectors never pair (the scorer drops them too) —
        # gone BEFORE the numpy stage, where a None would poison the
        # whole batch matmul
        .filter(F.col("_id").isNotNull() & F.col("_vec").isNotNull())
        .mapInPandas(add_sig, schema=sig_schema)
        .localCheckpoint(eager=True)
    )
    banded = sig.select(
        "_id",
        "_vec",
        "_sig",
        F.posexplode(F.col("_sig")).alias("_band", "_bucket"),
    )
    return _block_score_pairs(
        banded,
        key_cols=["_band", "_bucket"],
        threshold=threshold,
        id_type=emb.schema[id_col].dataType.simpleString(),
        sig_col="_sig",
        ord_col="_band",
    )


def stride_seed_vectors(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n: int | None = None,
) -> list[list[float]]:
    """Deterministic data-adaptive IVF seeds: the corpus vectors whose
    id satisfies ``id % step == 0 and id < k*step`` with
    ``step = max(n // k, 1)`` — i.e. up to ``k`` evenly-strided rows,
    indexed by ascending id.

    SELECTION, not averaging: each centroid is an actual stored vector,
    so an external SQL oracle (DuckDB) can rebuild the identical
    centroid set from the same table with pure integer arithmetic —
    no floating-point reduction whose summation order would diverge
    across engines. This is the zero-iteration point on the k-means
    spectrum (FAISS-style sampled seeds); ``train_centroids`` is the
    Lloyd-refined variant for when cross-engine reproducibility isn't
    required. Cost: one count() plus a k-row collect — pass ``n`` when
    the caller already counted the corpus (the IVF catalog entries
    derive k from the same count) to skip the second scan.
    """
    if n is None:
        n = emb.count()
    if n == 0:
        return []
    step = max(n // k, 1)
    rows = (
        emb.filter(
            (F.pmod(F.col(id_col), F.lit(step)) == 0) & (F.col(id_col) < k * step)
        )
        .select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v"))
        .collect()
    )
    # the stride arithmetic assumes a near-dense 0..n id domain; over
    # a sparse/clustered domain it silently yields far fewer than k
    # seeds — degraded IVF cells with no warning (VERDICT r10). Fall
    # back LOUDLY to rank-strided seeds: row_number over ascending id
    # is dense by construction, still deterministic, and an external
    # SQL oracle rebuilds it with the same integer arithmetic.
    want = min(k, n)
    if len(rows) < max(1, want // 2):
        import warnings

        warnings.warn(
            f"stride_seed_vectors: id-strided probe found {len(rows)} of "
            f"{want} seeds — sparse id domain; falling back to "
            "rank-strided selection (ROW_NUMBER() OVER (ORDER BY id))",
            stacklevel=2,
        )
        from pyspark.sql.window import Window

        rn = F.row_number().over(Window.orderBy(F.col(id_col))) - 1
        rows = (
            emb.select(
                F.col(id_col).alias("_id"),
                _as_double(F.col(vec_col)).alias("_v"),
                rn.alias("_rn"),
            )
            .filter((F.col("_rn") % step == 0) & (F.col("_rn") < want * step))
            .collect()
        )
    rows.sort(key=lambda r: r["_id"])
    return [[float(x) for x in r["_v"]] for r in rows]


def _fixed_order_scores(x, cmat):
    """batch × K dot scores, accumulated dimension-by-dimension in a
    fixed order — bit-identical to a left-to-right per-pair fold (the
    same trick ``_block_score_pairs`` documents), so argmax cell
    decisions agree exactly with a sequential-loop SQL engine. GEMM is
    deliberately avoided: its summation order varies with block shape.
    """
    import numpy as np

    dots = np.zeros((x.shape[0], cmat.shape[0]))
    for j in range(x.shape[1]):
        dots += np.outer(x[:, j], cmat[:, j])
    return dots


def ivf_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    n_centroids: int | None = None,
    nprobe: int = 3,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    angular_prune: bool = True,
    scorer: str = "tiled",
) -> DataFrame:
    """Near-duplicate pairs via trained-centroid (IVF) multi-probe
    buckets: assign each vector to its ``nprobe`` closest k-means
    cells, candidate pairs share ANY cell (equi-join on cell id), exact
    cosine filters candidates — precision 1.0, recall trades off.

    ``scorer`` picks the exact-cosine stage:

    - ``"tiled"`` (default) routes cell-sharing pairs through the same
      tiled Arrow block scoring as the banded path
      (``_block_score_pairs`` with the cell as the bucket key): each
      vector ships once per probed cell (~n·nprobe·dim doubles) instead
      of twice per candidate pair (~pairs·2·dim — at sf0.1 that is
      ~6 MB vs ~1.2 GB through the shuffle), and scoring is a
      vectorized numpy sweep per tile pair. Each row carries its full
      probe set, so the scorer assigns every pair to its MIN shared
      cell and scores it exactly once (own_mode="min") — no
      re-scoring exists, GEMM is safe, and the DuckDB oracle is
      untouched (same pair set, same rounded cosines).
    - ``"pairs"`` distinct-dedupes candidate ids first and computes one
      JVM-side fold per pair — the shape the oracle SQL mirrors
      literally, and the path the ``angular_prune`` bound applies to
      (the bound is per (pair, shared cell), which the tiled scorer
      never materializes).

    Complements ``bucketed_near_dup_pairs``: random-hyperplane bands
    prune hard in the high-similarity regime (cos >= 0.9), while
    DATA-ADAPTIVE centroids prune meaningfully even for weak
    similarity. Measured on the synthetic corpus (cos 0.4–0.5 pairs,
    where sign-bit LSH needs ~2n² dot products for recall 0.8):
    K=16, nprobe=3 touches ~0.48·n²/2 candidates at recall ~0.9.
    Training is a bounded driver-side sample (train_centroids);
    assignment and the pair join stay fully distributed.

    ``n_centroids=None`` sizes cells by the standard IVF √n rule
    (bounded to [16, 4096]) so per-cell candidate blowup stays ~constant
    as the corpus grows; the count() it costs is one columnar scan.

    ``angular_prune`` (default on) cuts the candidate volume BEFORE the
    expensive vector join using the angular triangle inequality: for a
    pair (x, y) sharing probed cell c, θ(x,y) >= |θ(x,c) − θ(y,c)|, so
    cos(x,y) <= cos(x,c)·cos(y,c) + sin(x,c)·sin(y,c). The assignment
    stage already computes every x·c dot, so the per-(id, cell) cosine
    rides along for free and the bound is evaluated JVM-side on the
    ids-only join — pairs whose upper bound cannot reach the threshold
    never ship their vectors. The bound is EXACT mathematics (a strict
    superset of the threshold survivors, kept safe against fp rounding
    by a 1e-6 margin), so results are bit-identical with it on or off
    — it needs no oracle change and is pytest-pinned as such.
    """
    import math

    id_type = emb.schema[id_col].dataType.simpleString()
    if centroids is None and n_centroids is None:
        # isqrt, not int(n**0.5): exact floor(sqrt) for every n — the
        # libm pow(x, 0.5) path is not guaranteed correctly rounded and
        # could desync K from an external oracle at a perfect square
        n_centroids = max(16, min(4096, math.isqrt(emb.count())))
    cents = (
        centroids
        if centroids is not None
        else train_centroids(emb, n_centroids=n_centroids, vec_col=vec_col, id_col=id_col)
    )
    if not cents:  # empty corpus: same empty frame as the exact twin
        return emb.sparkSession.createDataFrame(
            [], f"id_a {id_type}, id_b {id_type}, cosine double"
        )
    # cell assignment is a dense (batch × dim) @ (dim × K) matmul —
    # exactly what Arrow-batched numpy is for. A per-centroid column
    # expression would codegen K×dim literal folds per row (minutes of
    # plan analysis at K≈√n); mapInPandas keeps the plan tiny and the
    # work vectorized, with zero shuffle until the pair join.
    nprobe_ = nprobe

    def assign(batches):
        import numpy as np
        import pandas as pd

        cmat = np.array(cents, dtype=np.float64)            # K × dim
        cnorm = np.maximum(np.sqrt((cmat * cmat).sum(axis=1)), 1e-300)
        for pdf in batches:
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if len(x) == 0:
                continue
            # fixed-order dots + STABLE sort: ties break by cell index,
            # and the scores are bit-identical to the oracle's
            # sequential list_dot_product, so the probed cell set is
            # reproducible across engines
            dots = _fixed_order_scores(x, cmat)
            top = np.argsort(-dots, axis=1, kind="stable")[:, :nprobe_]
            k = top.shape[1]
            rows = np.arange(len(x)).repeat(k)
            cells = top.reshape(-1)
            # cosine-to-probed-cell for the angular bound — pruning
            # only (never in result values), so plain numpy is fine
            xnorm = np.maximum(np.sqrt((x * x).sum(axis=1)), 1e-300)
            sims = np.clip(dots[rows, cells] / (xnorm[rows] * cnorm[cells]), -1.0, 1.0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy().repeat(k),
                    "_cell": cells,
                    "_sim": sims,
                    # the row's FULL probe set rides along so the tiled
                    # scorer can assign each pair to its min shared cell
                    "_probes": [top[i // k].astype("int32") for i in range(len(rows))],
                }
            )

    # id field keeps the INPUT id type (string ids must round-trip
    # unchanged, not be coerced to long)
    assigned = emb.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} {id_type}, _cell int, _sim double, _probes array<int>"
    )
    if scorer == "tiled":
        # materialized ONCE (r16, guide §4/§5): the tiled scorer reads
        # its input from four plan positions; without the checkpoint
        # each copy re-ran the scan, the Python assignment stage AND
        # the vector join (4× MapInPandas in the captured plan)
        grouped = assigned.join(
            emb.select(F.col(id_col), F.col(vec_col).alias("_vec")), id_col
        ).select(
            F.col(id_col).alias("_id"), F.col("_vec"), F.col("_cell"), F.col("_probes")
        ).localCheckpoint(eager=True)
        return _block_score_pairs(
            grouped,
            key_cols=["_cell"],
            threshold=threshold,
            id_type=id_type,
            sig_col="_probes",
            ord_col="_cell",
            own_mode="min",
        )
    # ids-only cell join -> angular bound -> distinct -> join vectors
    # back (same shape as bucketed_near_dup_pairs): one dot per distinct
    # surviving pair, and the expensive cosine stage is partitioned by
    # pair id instead of by the K-distinct-key cell column
    a_side = assigned.select(
        F.col("_cell"), F.col(id_col).alias("id_a"), F.col("_sim").alias("_sa")
    )
    b_side = assigned.select(
        F.col("_cell"), F.col(id_col).alias("id_b"), F.col("_sim").alias("_sb")
    )
    joined = a_side.join(b_side, "_cell").filter(F.col("id_a") < F.col("id_b"))
    if angular_prune:
        # cos(x,y) <= sa·sb + sin_a·sin_b where sin = sqrt(1 − s²).
        # EVERY shared cell yields a valid upper bound, so the MIN over
        # a pair's shared cells is the tightest sound bound — the
        # groupBy replaces the plain distinct() (same shuffle keys,
        # same cost) and prunes pairs whose best bound still can't
        # reach the threshold. The 1e-6 margin absorbs fp rounding so
        # the filter stays a strict superset of the exact survivors.
        sin_a = F.sqrt(F.greatest(F.lit(0.0), F.lit(1.0) - F.col("_sa") * F.col("_sa")))
        sin_b = F.sqrt(F.greatest(F.lit(0.0), F.lit(1.0) - F.col("_sb") * F.col("_sb")))
        ub = F.col("_sa") * F.col("_sb") + sin_a * sin_b
        cand = (
            joined.groupBy("id_a", "id_b")
            .agg(F.min(ub).alias("_ub"))
            .filter(F.col("_ub") >= threshold - 1e-6)
            .select("id_a", "id_b")
        )
    else:
        cand = joined.select("id_a", "id_b").distinct()
    v = _as_double(F.col(vec_col))
    withn = emb.select(F.col(id_col), v.alias("_v"), F.sqrt(_dot(v, v)).alias("_n"))
    pairs = cand.join(
        withn.select(
            F.col(id_col).alias("id_a"), F.col("_v").alias("va"), F.col("_n").alias("na")
        ),
        "id_a",
    ).join(
        withn.select(
            F.col(id_col).alias("id_b"), F.col("_v").alias("vb"), F.col("_n").alias("nb")
        ),
        "id_b",
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return pairs.select(
        "id_a", "id_b", F.round(cos, 6).alias("cosine")
    ).filter(F.col("cosine") >= threshold)


def _seeded_centroids(n: int, dim: int, seed: str = "geo-explorer-ivf") -> list[list[float]]:
    return _seeded_planes(n, dim, seed)


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest seeded
    centroid (argmax dot), scan only the query's ``nprobe`` closest
    cells, exact cosine top-k within them.

    The centroid set here is deterministic-seeded rather than trained
    (no MLlib dependency); swapping in k-means centroids changes only
    the literal arrays. Scan cost ~ corpus * nprobe / n_centroids.
    """
    dim = len(emb.select(vec_col).first()[0])
    cents = centroids if centroids is not None else _seeded_centroids(n_centroids, dim)
    n_centroids = len(cents)
    v = _as_double(F.col(vec_col))
    scores = F.array(
        *[_dot(v, F.array(*[F.lit(w) for w in c])) for c in cents]
    )
    # cell = argmax(scores): materialize the score array once, then
    # array_position against its max (1-based -> 0-based)
    assigned = emb.withColumn("_scores", scores).withColumn(
        "cell",
        (F.array_position(F.col("_scores"), F.array_max(F.col("_scores"))) - 1).cast("int"),
    ).drop("_scores")
    qrow = assigned.filter(F.col(id_col) == query_vec_id).first()
    qcells = sorted(
        range(n_centroids),
        key=lambda i: -sum(
            x * y for x, y in zip(qrow[vec_col], cents[i])
        ),
    )[:nprobe]
    qv = [float(x) for x in qrow[vec_col]]
    qarr = F.array(*[F.lit(x) for x in qv])
    cands = assigned.filter(
        (F.col("cell").isin(qcells)) & (F.col(id_col) != query_vec_id)
    )
    cos = cosine(v, qarr)
    return (
        cands.select(F.col(id_col), F.col(label_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def train_centroids(
    emb: DataFrame,
    n_centroids: int = 8,
    sample_limit: int = 2000,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    samples_per_centroid: int = 32,
    distributed: bool | None = None,
) -> list[list[float]]:
    """Deterministic k-means for IVF cells — scales to the corpus.

    The training set is drawn DISTRIBUTED: a seeded hash-mod filter on
    the id keeps ~target rows wherever they live — no global sort, no
    low-id bias, no driver materialization of the corpus (the round-2
    version collected the first ``sample_limit`` rows by id, which
    neither grew with K nor sampled uniformly). The target grows with
    the cell count (``samples_per_centroid × K``), so K=√n stays
    well-determined as the corpus grows.

    Lloyd iterations then run in one of two modes:

    - driver  (small corpora / samples ≤ ``sample_limit``): collect the
      hash-drawn sample once, iterate in numpy. Bounded and fast.
    - sharded (``distributed=True`` or target > ``sample_limit``): each
      iteration is one Spark job — mapInPandas emits per-partition
      partial (count, vector-sum) per cell, a (cell, pos) groupBy merges
      them, and the driver collects only K×dim doubles to renormalize.
      Nothing driver-side ever exceeds the centroid matrix.

    Deterministic by construction: seeded hash sample, farthest-first
    init over a bounded hash-ordered subsample, fixed iteration count
    (sharded-mode float sums can differ in the last ulp across
    partition layouts; cell assignments are robust to that).
    """
    import numpy as np

    n = emb.count()
    if n == 0:
        return []
    target = max(sample_limit, samples_per_centroid * n_centroids)
    mod = max(1, n // target)
    s = emb.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
    ).filter(F.pmod(F.xxhash64(F.col("_id")), F.lit(mod)) == F.lit(0))
    if distributed is None:
        distributed = target > sample_limit

    # deterministic, well-spread init: farthest-first (k-center greedy)
    # over a BOUNDED hash-ordered subsample — O(k·|subsample|) driver
    # work, never more than max(2048, k) vectors collected
    init_rows = (
        s.orderBy(F.xxhash64(F.col("_id"), F.lit(1)), F.col("_id"))
        .limit(max(2048, n_centroids))
        .select("_v")
        .collect()
    )
    if not init_rows:
        return []
    xi = np.array([list(r["_v"]) for r in init_rows], dtype=np.float64)
    xi = xi / np.maximum(np.linalg.norm(xi, axis=1, keepdims=True), 1e-12)
    k = min(n_centroids, len(xi))
    chosen = [0]
    dist = 1.0 - xi @ xi[0]
    for _ in range(1, k):
        nxt = int(np.argmax(dist))
        chosen.append(nxt)
        dist = np.minimum(dist, 1.0 - xi @ xi[nxt])
    c = xi[chosen].copy()
    dim = c.shape[1]

    if not distributed:
        x = np.array(
            [list(r["_v"]) for r in s.select("_v").collect()], dtype=np.float64
        )
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        for _ in range(iters):
            assign = (x @ c.T).argmax(axis=1)
            for j in range(k):
                members = x[assign == j]
                if len(members):
                    m = members.mean(axis=0)
                    c[j] = m / max(np.linalg.norm(m), 1e-12)
        return [[float(v) for v in row] for row in c]

    s = s.persist()
    try:
        for _ in range(iters):
            cb = c.copy()

            def partials(batches, cb=cb):
                import numpy as np
                import pandas as pd

                sums = np.zeros_like(cb)
                cnts = np.zeros(len(cb), dtype=np.int64)
                for pdf in batches:
                    x = np.array(pdf["_v"].tolist(), dtype=np.float64)
                    if len(x) == 0:
                        continue
                    xn = x / np.maximum(
                        np.linalg.norm(x, axis=1, keepdims=True), 1e-12
                    )
                    a = (xn @ cb.T).argmax(axis=1)
                    np.add.at(sums, a, xn)
                    cnts += np.bincount(a, minlength=len(cb))
                yield pd.DataFrame(
                    {
                        "cell": np.arange(len(cb), dtype=np.int32),
                        "cnt": cnts,
                        "vsum": [list(r) for r in sums],
                    }
                )

            part = s.mapInPandas(partials, schema="cell int, cnt long, vsum array<double>")
            counts = {
                r["cell"]: r["n"]
                for r in part.groupBy("cell").agg(F.sum("cnt").alias("n")).collect()
            }
            merged = (
                part.select("cell", F.posexplode("vsum").alias("pos", "val"))
                .groupBy("cell", "pos")
                .agg(F.sum("val").alias("s"))
                .collect()                       # K×dim rows — the only driver data
            )
            new_c = c.copy()
            acc = np.zeros((k, dim))
            for r in merged:
                acc[r["cell"], r["pos"]] = r["s"]
            for j in range(k):
                if counts.get(j, 0):
                    m = acc[j] / counts[j]
                    new_c[j] = m / max(np.linalg.norm(m), 1e-12)
            c = new_c
        return [[float(v) for v in row] for row in c]
    finally:
        s.unpersist()


# -- int8 scalar quantization (memory/IO lever for the ANN stack) ------------
def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization:
    ``q_i = round(127 * v_i / amax)``, carried with ``scale = amax/127``
    — a 4× cut of the bytes every ANN scan reads and ships, the
    standard serving-layout lever for embedding corpora at 100 TB
    (FAISS SQ8). Run ONCE at ingest and PERSIST the result (e.g. a
    TableStore table); ``cosine_topk_quantized`` then scans only the
    ``qvec`` codes. The quantized column is ``array<tinyint>``; cosine
    is SCALE-INVARIANT, so approximate scores need only the int8 dots
    and per-vector int8 norms (no dequantization in the hot loop).
    All JVM-side expressions. Zero/null vectors keep scale 0 / null
    codes (filtered from the approximate stage downstream)."""
    v = _as_double(F.col(vec_col))
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(0.0))
    out = emb.withColumn("scale", scale)
    qvec = F.transform(
        v,
        lambda x: F.when(
            F.col("scale") > 0, F.round(x / F.col("scale"), 0)
        )
        .otherwise(F.lit(0.0))
        .cast("tinyint"),
    )
    return out.withColumn("qvec", qvec)


def cosine_topk_quantized(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    rerank: int | None = None,
    quantized: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Two-stage ANN over the int8 layout: (1) approximate cosine from
    int8 dot products — an Arrow-batched ``(batch × dim) @ (dim,)``
    int32 matmul over the QUANTIZED codes — keeps the top ``rerank``
    (default 4k) candidates; (2) the exact ``cosine_topk`` re-scores
    ONLY those (delegated, so rounding / tie-break / schema / null
    semantics are inherited from the brute-force operator by
    construction). Pass ``quantized`` — the PERSISTED output of
    ``quantize_embeddings`` — so stage 1 reads a quarter of the float
    bytes; without it the codes are derived inline from ``emb``
    (convenience for tests/small corpora: correct, but the bandwidth
    saving only materializes with the persisted layout). With
    ``rerank >= corpus`` the result equals ``cosine_topk`` exactly;
    smaller rerank trades recall for stage-1 bandwidth — the recall
    gate pins ≥0.9 at 4k on the synthetic corpus. A missing or
    null-vector query falls through to the exact operator (same
    degenerate semantics)."""
    rerank = 4 * k if rerank is None else rerank
    quant = (
        quantized
        if quantized is not None
        else quantize_embeddings(emb, id_col=id_col, vec_col=vec_col)
    )
    qrow = quant.filter(F.col(id_col) == query_vec_id).select("qvec").first()
    if qrow is None or qrow["qvec"] is None:
        return cosine_topk(
            emb, query_vec_id, k, id_col=id_col, vec_col=vec_col,
            label_col=label_col,
        )
    qcode = [int(x) for x in qrow["qvec"]]

    def approx(batches):
        import numpy as np
        import pandas as pd

        qv = np.array(qcode, dtype=np.int32)
        qn = float(np.sqrt((qv * qv).sum()))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(
                [np.asarray(r, dtype=np.int32) for r in pdf["qvec"]]
            )
            dots = X @ qv
            norms = np.sqrt((X * X).sum(axis=1))
            # guard the PRODUCT: flooring the factors separately still
            # underflows to 0 for zero×zero and desc-sorts NaN first
            denom = np.maximum(norms * qn, 1e-300)
            yield pd.DataFrame({id_col: pdf[id_col], "_approx": dots / denom})

    id_type = emb.schema[id_col].dataType.simpleString()
    cands = (
        quant.filter(
            (F.col(id_col) != query_vec_id) & F.col("qvec").isNotNull()
        )
        .select(id_col, "qvec")
        .mapInPandas(approx, schema=f"{id_col} {id_type}, _approx double")
        .orderBy(F.col("_approx").desc(), F.col(id_col))
        .limit(rerank)
        .select(id_col)
    )
    subset = emb.join(F.broadcast(cands), id_col).unionByName(
        emb.filter(F.col(id_col) == query_vec_id)
    )
    return cosine_topk(
        subset, query_vec_id, k, id_col=id_col, vec_col=vec_col,
        label_col=label_col,
    )
