#!/usr/bin/env python
"""Recall audit for the registered ANN queries vs brute-force cosine.

Each ANN variant (IVF cell probe, LSH sign buckets, learned k-means
cells, SQ8 overfetch+rescore) trades candidates for speed; this tool
measures what that trade costs in recall@k at a given SF, against the
exact brute-force top-k (operators.similarity.cosine_topk) over the
same corpus, query set, k and self-exclusion rule. Prints ONE JSON
line {"sf": .., "recall": {variant: {"recall_at_k": .., ...}}}.

Run: python tools/ann_recall.py [sf_dir]   (default sf0.1)

Measured 2026-08-14 at sf0.1 (deterministic — same fixture, same
fits): ann_kmeans 1.0, ann_sq8 1.0, ann_ivf 0.2667, ann_lsh 0.1333,
ann_lsh_multiprobe 0.3333 (the Hamming<=1 five-bucket probe buys
2.5x recall for ~5x candidates).
The split is structural, not noise: ann_kmeans probes LEARNED
geometric cells (the k-means partition actually clusters cosine
neighbors) and ann_sq8's exact rescore recovers everything its 10x
overfetch retains; ann_ivf probes the fixture's semantic ``label``
column — a class label, not a nearest-centroid cell, so true
neighbors routinely live under other labels — and ann_lsh is the
deliberately minimal 4-plane/16-bucket single-probe configuration.
Both are kept as certified demonstrations of the probe SHAPE; the
production guidance this audit yields is "fit cells (ann_kmeans /
build_ivf_index), don't reuse upstream labels, and buy LSH recall
with multi-probe". Recorded in SCALE.md (ANN recall section);
the persistent index's own recall lives in
vector_index.index_recall / CLI `index stats --recall`.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_wikipedia_updates_spark.operators import similarity as S
from etl_wikipedia_updates_spark.registry import REGISTRY
from etl_wikipedia_updates_spark.session import get_spark
from etl_wikipedia_updates_spark.tables import load_table

# variant -> (n_queries, k): must mirror each query's own constants
# (plans/northstar.py ANN_*, plans/clustering.py ANN_KMEANS_*)
from etl_wikipedia_updates_spark.plans.clustering import (  # noqa: E402
    ANN_KMEANS_K,
    ANN_KMEANS_N_QUERIES,
    PQ_N_QUERIES,
    PQ_TOPK,
)
from etl_wikipedia_updates_spark.plans.northstar import (  # noqa: E402
    ANN_K,
    ANN_N_QUERIES,
    ANN_SQ8_K,
    ANN_SQ8_N_QUERIES,
)

VARIANTS: dict[str, tuple[int, int]] = {
    "ann_ivf": (ANN_N_QUERIES, ANN_K),
    "ann_lsh": (ANN_N_QUERIES, ANN_K),
    "ann_lsh_multiprobe": (ANN_N_QUERIES, ANN_K),
    "ann_kmeans": (ANN_KMEANS_N_QUERIES, ANN_KMEANS_K),
    "ann_sq8": (ANN_SQ8_N_QUERIES, ANN_SQ8_K),
    "ann_pq": (PQ_N_QUERIES, PQ_TOPK),
}


def recall_of(spark, sf_dir: str, name: str, n_queries: int, k: int) -> dict:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    )
    exact = S.cosine_topk(emb, queries, k=k)
    approx = REGISTRY.queries[name].builder(spark, sf_dir)

    def hit_sets(df) -> dict:
        return {
            r["q_vec_id"]: set(r["hits"])
            for r in df.groupBy("q_vec_id")
            .agg(F.collect_set("vec_id").alias("hits"))
            .collect()
        }

    got, want = hit_sets(approx), hit_sets(exact)
    per_query = {
        str(q): round(len(got.get(q, set()) & hits) / len(hits), 4)
        for q, hits in sorted(want.items())
        if hits
    }
    mean = (
        round(sum(per_query.values()) / len(per_query), 4)
        if per_query
        else 1.0
    )
    return {
        "recall_at_k": mean,
        "k": k,
        "n_queries": len(per_query),
        "per_query": per_query,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="ann_recall")
    out = {
        name: recall_of(spark, sf_dir, name, nq, k)
        for name, (nq, k) in VARIANTS.items()
    }
    base = os.path.basename(sf_dir.rstrip("/"))
    print(json.dumps({"sf_dir": base, "recall": out}))
    spark.stop()


if __name__ == "__main__":
    main()
