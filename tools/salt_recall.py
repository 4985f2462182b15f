"""Quantify the drop-vs-salt trade for over-full LSH buckets
(SCALE.md "Dedup / similarity are shuffle-frugal").

Fixture: a 60-doc near-duplicate cluster (template with small per-doc
perturbations — NOT byte-identical, so exact dedup can't catch it)
plus a background of unrelated docs and one normal-sized near-dup
pair. With ``max_bucket_size=10`` the cluster floods its band buckets
past the cap.

Reported per mode (uncapped / drop / salt):
- candidate pair count (the per-task cost bound capping exists for)
- pair recall inside the over-full cluster vs the uncapped candidates
- survivors after connected-component clustering + keep-one-per-
  cluster — the metric that matters for DEDUP: salt's shards still
  collapse the cluster to ~n_shards survivors even though cross-shard
  PAIRS are sacrificed, while drop leaves every member alive.

Usage: python tools/salt_recall.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    from geo_explorer_etl_spark.operators.dedup import (
        keep_representatives,
        minhash_lsh_candidates,
    )
    from geo_explorer_etl_spark.session import get_spark

    spark = get_spark("salt_recall", cpus=8)

    template = (
        "common boilerplate sentence repeated across the whole cluster "
        "with only a tiny per document suffix variation number"
    )
    cluster = [(i, f"{template} {i}") for i in range(60)]
    background = [
        (1000 + i, f"completely unrelated document body {i} talking about "
                   f"topic {i * 7 % 13} with distinct vocabulary {i * 31}")
        for i in range(40)
    ]
    near_pair = [
        (2000, "a normal sized near duplicate pair lives here with shared text"),
        (2001, "a normal sized near duplicate pair lives here with shared text!"),
    ]
    docs = spark.createDataFrame(
        cluster + background + near_pair, "doc_id long, text string"
    )
    cap = 10
    cluster_ids = {i for i, _ in cluster}

    def pairs(**kw):
        return {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_candidates(docs, "text", "doc_id", **kw).collect()
        }

    uncapped = pairs()
    drop = pairs(max_bucket_size=cap, overflow="drop")
    salt = pairs(max_bucket_size=cap, overflow="salt")

    in_cluster = lambda ps: {p for p in ps if p[0] in cluster_ids and p[1] in cluster_ids}
    base = in_cluster(uncapped)

    def survivors(ps):
        pdf = spark.createDataFrame(
            sorted(ps) or [(None, None)], "doc_a long, doc_b long"
        ).dropna()
        return keep_representatives(docs, pdf).count()

    out = {
        "cap": cap,
        "cluster_size": len(cluster_ids),
        "uncapped": {"candidates": len(uncapped), "cluster_pairs": len(base),
                     "survivors": survivors(uncapped)},
        "drop": {"candidates": len(drop),
                 "cluster_pair_recall": round(len(in_cluster(drop)) / max(len(base), 1), 3),
                 "survivors": survivors(drop)},
        "salt": {"candidates": len(salt),
                 "cluster_pair_recall": round(len(in_cluster(salt)) / max(len(base), 1), 3),
                 "survivors": survivors(salt)},
    }

    # the SAME fixture through the wide banded-SimHash pairs (r16):
    # max_hamming=8 so the one-token cluster perturbations land inside
    # the threshold; recall measured against simhash's own uncapped set
    from geo_explorer_etl_spark.operators.dedup import simhash_pairs

    def spairs(**kw):
        return {
            (r["doc_a"], r["doc_b"])
            for r in simhash_pairs(
                docs, "text", "doc_id", bits=96, max_hamming=8, **kw
            ).collect()
        }

    s_un = spairs(max_bucket_size=None)
    s_drop = spairs(max_bucket_size=cap, overflow="drop")
    s_salt = spairs(max_bucket_size=cap, overflow="salt")
    s_base = in_cluster(s_un)
    out["simhash96"] = {
        "uncapped": {"candidates": len(s_un), "cluster_pairs": len(s_base),
                     "survivors": survivors(s_un)},
        "drop": {"candidates": len(s_drop),
                 "cluster_pair_recall": round(len(in_cluster(s_drop)) / max(len(s_base), 1), 3),
                 "survivors": survivors(s_drop)},
        "salt": {"candidates": len(s_salt),
                 "cluster_pair_recall": round(len(in_cluster(s_salt)) / max(len(s_base), 1), 3),
                 "survivors": survivors(s_salt)},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
