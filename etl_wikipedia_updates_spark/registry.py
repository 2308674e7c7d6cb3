"""Global query registry — single source of truth for __spark_entry__,
tests, and bench.

Registry order is a CERTIFICATION ROTATION over SURVEY.md §2.3's
entries (76 since round 10; round 11 adds none — a consolidation
round per the r10 verdict). The external correctness gate records the
first 50 entries per round, so the surplus sits past the cutoff each
round; the rotation policy keeps every official row as fresh as the
window allows:

- Entries with NO official row ever go FIRST. Round 11: the six that
  landed past round 10's cutoff (distinct_kmv, ann_pq,
  corpus_release_temp, zipf_fit, length_hist, embedding_stats)
  certify at the head, as the r10 plan promised.
- Entries whose newest official row is OLDEST come next: q12_approx
  and percentiles_approx (rows-only by design) last certified in r7.
- The contract rows Q1-Q28 + wiki and every entry CHANGED this round
  stay inside the first 50 (a changed query needs a fresh row; its
  old row certifies code that no longer exists). Round 11 changed
  distinct_kmv (localCheckpoint removed — in the head anyway),
  charlm_score (out-of-charset guard), shard_manifest (manifest_of
  refactor), ann_pq + corpus_release_temp + corpus_release +
  dedup_corpus (ne_sql zero-norm floor / release_members temperature
  refactor).
- The remaining slots re-certify the 18 entries whose newest official
  rows are r9, FIFO in tail order: span_dedup through ann_sq8 fit
  this round (positions 42-50); grouped_agg_udf through
  stratified_sample head the round-12 rotation at 51-59.
- The entries that yield are UNCHANGED-this-round entries certified
  green in the immediately-preceding round (the r10-official
  extensions at the tail) — every one still oracle-proven locally on
  each pytest run by tests/test_queries_oracle.py.

All entries are benched by bench.py regardless of position, and the
oracle-backed entries are oracle-tested every run in
tests/test_queries_oracle.py (q12_approx and percentiles_approx are
approximate by design, declare no oracle, and get only the driver's
rows-only check); the rotation affects only which 50 the external gate
re-certifies this round.
"""

from __future__ import annotations

from etl_wikipedia_updates_spark.plans.base import QueryRegistry
from etl_wikipedia_updates_spark.plans.clustering import CLUSTERING_QUERIES
from etl_wikipedia_updates_spark.plans.corpus import CORPUS_QUERIES
from etl_wikipedia_updates_spark.plans.events import EVENTS_QUERIES
from etl_wikipedia_updates_spark.plans.northstar import NORTHSTAR_QUERIES
from etl_wikipedia_updates_spark.plans.relational import RELATIONAL_QUERIES
from etl_wikipedia_updates_spark.plans.wiki import WIKI_QUERIES

DECLARATION_ORDER: list[str] = [
    # --- round-11 rotation head: the six entries that have NEVER had
    # an official row (r10 positions 51-56) certify first, exactly as
    # the r10 plan promised. distinct_kmv leads: its r11 replan
    # (localCheckpoint removed, fused countDistinct audit) lands with
    # its first-ever official row ---
    "distinct_kmv",
    "ann_pq",
    "corpus_release_temp",
    "zipf_fit",
    "length_hist",
    "embedding_stats",
    # --- the two rows-only approximate entries: their newest official
    # rows date to r7 (they yielded their r10 slots to never-certified
    # oracle-backed entries); with no new entries this round there is
    # room to refresh the stalest rows in the registry ---
    "q12_approx",
    "percentiles_approx",
    # --- §2.3 contract rows (always inside the gate window) ---
    *[f"q{i}" for i in range(1, 29)],
    "wiki_pipeline",
    # --- CHANGED in round 11, so their r10 rows certify code that no
    # longer exists: charlm_score (out-of-charset loud-fail guard in
    # the dense scorer), shard_manifest (refactored onto the shared
    # manifest_of aggregation the new write_sharded verifier uses),
    # corpus_release and dedup_corpus (both run through the
    # release_members temperature refactor / shared plan modules).
    # ann_pq (ne_sql zero-norm floor) and corpus_release_temp (same
    # release_members refactor) also changed — they sit in the head ---
    "charlm_score",
    "shard_manifest",
    "corpus_release",
    "dedup_corpus",
    # --- positions 42-50: the 18 entries whose newest official rows
    # are r9 re-certify FIFO in the order they have waited in the
    # tail; the first nine fit this round's window ---
    "span_dedup",
    "token_stats",
    "corpus_stats",
    "rep_filter",
    "minhash_lsh",
    "lang_id",
    "quantize_embeddings",
    "lang_id_chargram",
    "ann_sq8",
    # --- positions 51-76: past the cutoff this round. First the nine
    # remaining r9-official entries (they HEAD the round-12 rotation,
    # same FIFO), then the r10-certified, unchanged-this-round
    # extensions — every one oracle-tested locally on every pytest
    # run by tests/test_queries_oracle.py ---
    "grouped_agg_udf",
    "kmeans_clusters",
    "ann_kmeans",
    "simhash_pairs",
    "source_mix",
    "tfidf_topterms",
    "seq_pack",
    "sample_hash",
    "stratified_sample",
    "text_quality",
    "dedup_clusters",
    "contamination",
    "percentiles",
    "grouped_zscore",
    "doc_fingerprint",
    "text_normalize",
    "cosine_neardup",
    "multimodal_bytes",
    "ann_lsh",
    "ann_ivf",
    "bm25_rank",
    "span_removal",
    "ann_lsh_multiprobe",
    "temperature_mix",
    "semantic_dedup",
    "pii_scrub",
]

_declared = QueryRegistry()
_declared.extend(RELATIONAL_QUERIES)
_declared.extend(EVENTS_QUERIES)
_declared.extend(NORTHSTAR_QUERIES)
_declared.extend(CLUSTERING_QUERIES)
_declared.extend(CORPUS_QUERIES)
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
