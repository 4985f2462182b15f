"""Measure the angular-bound candidate pruning in ivf_near_dup_pairs.

Replicates the catalog entry's exact configuration (strided seeds,
sqrt(n) cells, 6-probe, cos >= 0.4) and reports:

- distinct candidate pairs WITHOUT the bound (every cell-sharing pair
  ships its two vectors to the exact-cosine stage),
- distinct candidate pairs WITH the bound (pairs whose angular upper
  bound cos_a*cos_b + sin_a*sin_b cannot reach the threshold are
  dropped on the ids-only join),
- final result rows both ways — MUST be identical (the bound is a
  strict superset filter; recall is untouched by construction).

Usage: python3 tools/ivf_prune_gain.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _clustered_corpus(spark, n: int = 2000, k_clusters: int = 40, dim: int = 64):
    """Deterministic clustered corpus: vectors at cos ≈ 0.95 to their
    cluster direction — the geometry real near-dup embedding corpora
    have (tight semantic clusters), where the angular bound is designed
    to pay."""
    import numpy as np

    rng = np.random.default_rng(7)
    dirs = rng.standard_normal((k_clusters, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    noise = rng.standard_normal((n, dim)) * 0.11
    x = dirs[np.arange(n) % k_clusters] + noise
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    rows = [(int(i), [float(v) for v in x[i]], "c") for i in range(n)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>, label string")


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--clustered"]
    clustered = "--clustered" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    thresholds = [float(t) for t in args[1:]] or [0.4, 0.7, 0.9]

    from geo_explorer_etl_spark.operators import similarity as SIM
    from geo_explorer_etl_spark.session import get_spark, load_tables

    spark = get_spark("ivf_prune_gain")
    if clustered:
        emb = _clustered_corpus(spark)
        print("corpus: synthetic CLUSTERED (cos≈0.95 to cluster dirs)")
    else:
        emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
        print(f"corpus: {sf_dir} embeddings (isotropic synthetic)")
    n = emb.count()
    k = max(16, min(4096, math.isqrt(n)))
    cents = SIM.stride_seed_vectors(emb, k=k)
    total_pairs = n * (n - 1) // 2
    print(f"corpus n={n}, K={k}, nprobe=6")

    n_all = ivf_candidate_count(SIM, emb, cents, nprobe=6, threshold=0.0, prune=False)
    print(f"candidate pairs without bound: {n_all}  ({n_all / total_pairs:.3f} of all pairs)")

    for threshold in thresholds:
        def run(prune: bool):
            # scorer="pairs": the angular bound only exists on the
            # pair-join path (the tiled default never materializes
            # per-(pair, cell) rows), so that is the path measured here
            return SIM.ivf_near_dup_pairs(
                emb,
                threshold=threshold,
                nprobe=6,
                centroids=cents,
                angular_prune=prune,
                scorer="pairs",
            )

        n_pruned = ivf_candidate_count(
            SIM, emb, cents, nprobe=6, threshold=threshold, prune=True
        )
        full = {tuple(r) for r in run(False).collect()}
        pruned = {tuple(r) for r in run(True).collect()}
        assert full == pruned, "angular bound changed results — bound is WRONG"
        print(
            f"threshold {threshold}: candidates with bound {n_pruned} "
            f"(reduction {1 - n_pruned / max(n_all, 1):.1%}), "
            f"result rows identical both ways: {len(full)}"
        )


def ivf_candidate_count(SIM, emb, cents, nprobe: int, threshold: float, prune: bool) -> int:
    """Distinct candidate pairs entering the exact-cosine stage —
    rebuilt from the operator's own assignment stage so the measured
    set is exactly what the operator would ship."""
    import numpy as np  # noqa: F401
    import pyspark.sql.functions as F

    id_col, vec_col = "vec_id", "embedding"
    nprobe_ = nprobe

    def assign(batches):
        import numpy as np
        import pandas as pd

        cmat = np.array(cents, dtype=np.float64)
        cnorm = np.maximum(np.sqrt((cmat * cmat).sum(axis=1)), 1e-300)
        for pdf in batches:
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if len(x) == 0:
                continue
            dots = SIM._fixed_order_scores(x, cmat)
            top = np.argsort(-dots, axis=1, kind="stable")[:, :nprobe_]
            k = top.shape[1]
            rows = np.arange(len(x)).repeat(k)
            cells = top.reshape(-1)
            xnorm = np.maximum(np.sqrt((x * x).sum(axis=1)), 1e-300)
            sims = np.clip(dots[rows, cells] / (xnorm[rows] * cnorm[cells]), -1.0, 1.0)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy().repeat(k), "_cell": cells, "_sim": sims}
            )

    assigned = emb.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} bigint, _cell int, _sim double"
    )
    a = assigned.select(F.col("_cell"), F.col(id_col).alias("id_a"), F.col("_sim").alias("_sa"))
    b = assigned.select(F.col("_cell"), F.col(id_col).alias("id_b"), F.col("_sim").alias("_sb"))
    joined = a.join(b, "_cell").filter(F.col("id_a") < F.col("id_b"))
    if prune:
        sin_a = F.sqrt(F.greatest(F.lit(0.0), F.lit(1.0) - F.col("_sa") * F.col("_sa")))
        sin_b = F.sqrt(F.greatest(F.lit(0.0), F.lit(1.0) - F.col("_sb") * F.col("_sb")))
        ub = F.col("_sa") * F.col("_sb") + sin_a * sin_b
        return (
            joined.groupBy("id_a", "id_b")
            .agg(F.min(ub).alias("_ub"))
            .filter(F.col("_ub") >= threshold - 1e-6)
            .count()
        )
    return joined.select("id_a", "id_b").distinct().count()


if __name__ == "__main__":
    main()
