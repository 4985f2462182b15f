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
    v = _as_double(F.col(vec_col))
    withn = emb.select(
        F.col(id_col), v.alias("_v"), F.sqrt(_dot(v, v)).alias("_n")
    )
    a = withn.select(
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
    dim = len(emb.select(vec_col).first()[0])
    v = _as_double(F.col(vec_col))
    band_buckets = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                bucket_bits(
                    v, _seeded_planes(planes_per_band, dim, seed=f"geo-explorer-lsh:band{band}")
                ).alias("bucket"),
            )
            for band in range(n_bands)
        ]
    )
    withn = emb.select(
        F.col(id_col),
        v.alias("_v"),
        F.sqrt(_dot(v, v)).alias("_n"),
        F.explode(band_buckets).alias("_bb"),
    ).select(
        id_col, "_v", "_n", F.col("_bb.band").alias("_band"), F.col("_bb.bucket").alias("_bucket")
    )
    a = withn.select(
        F.col("_band").alias("band_a"),
        F.col("_bucket").alias("bucket_a"),
        F.col(id_col).alias("id_a"),
        F.col("_v").alias("va"),
        F.col("_n").alias("na"),
    )
    b = withn.select(
        F.col("_band").alias("band_b"),
        F.col("_bucket").alias("bucket_b"),
        F.col(id_col).alias("id_b"),
        F.col("_v").alias("vb"),
        F.col("_n").alias("nb"),
    )
    pairs = a.join(
        b,
        (F.col("band_a") == F.col("band_b")) & (F.col("bucket_a") == F.col("bucket_b")),
    ).filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    # a pair can match in several bands: the rounded cosine is
    # deterministic, so distinct() dedups without a join-back
    return (
        pairs.select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )


def ivf_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    n_centroids: int | None = None,
    nprobe: int = 3,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs via trained-centroid (IVF) multi-probe
    buckets: assign each vector to its ``nprobe`` closest k-means
    cells, candidate pairs share ANY cell (equi-join on cell id), exact
    cosine filters candidates — precision 1.0, recall trades off.

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
    """
    if centroids is None and n_centroids is None:
        n_centroids = max(16, min(4096, int(emb.count() ** 0.5)))
    cents = (
        centroids
        if centroids is not None
        else train_centroids(emb, n_centroids=n_centroids, vec_col=vec_col, id_col=id_col)
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

        cmat = np.array(cents, dtype=np.float64).T          # dim × K
        for pdf in batches:
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if len(x) == 0:
                continue
            top = np.argsort(-(x @ cmat), axis=1)[:, :nprobe_]
            norms = np.sqrt((x * x).sum(axis=1))
            k = top.shape[1]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy().repeat(k),
                    "_v": [list(row) for row in x.repeat(k, axis=0)],
                    "_n": norms.repeat(k),
                    "_cell": top.reshape(-1),
                }
            )

    assigned = emb.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, _v array<double>, _n double, _cell int"
    )
    a = assigned.select(
        F.col("_cell").alias("cell_a"),
        F.col(id_col).alias("id_a"),
        F.col("_v").alias("va"),
        F.col("_n").alias("na"),
    )
    b = assigned.select(
        F.col("_cell").alias("cell_b"),
        F.col(id_col).alias("id_b"),
        F.col("_v").alias("vb"),
        F.col("_n").alias("nb"),
    )
    pairs = a.join(b, F.col("cell_a") == F.col("cell_b")).filter(
        F.col("id_a") < F.col("id_b")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        pairs.select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )


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
) -> list[list[float]]:
    """Deterministic driver-side k-means for IVF cells.

    Samples up to ``sample_limit`` vectors (ordered by id — stable),
    initializes centroids from evenly spaced sample points, runs a few
    Lloyd iterations in numpy. Driver-side by design: the TRAINING set
    is a bounded sample regardless of corpus size; only ASSIGNMENT
    scales with the data and that stays in Spark.
    """
    import numpy as np

    sample = (
        emb.orderBy(id_col).limit(sample_limit).select(vec_col).collect()
    )
    x = np.array([list(r[0]) for r in sample], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    idx = np.linspace(0, len(x) - 1, n_centroids).astype(int)
    c = x[idx].copy()
    for _ in range(iters):
        sims = x @ c.T                       # cosine on normalized rows
        assign = sims.argmax(axis=1)
        for j in range(n_centroids):
            members = x[assign == j]
            if len(members):
                m = members.mean(axis=0)
                c[j] = m / max(np.linalg.norm(m), 1e-12)
    return [[float(v) for v in row] for row in c]
