"""Global query registry — single source of truth for __spark_entry__,
tests, and bench.

Registry order is a CERTIFICATION ROTATION over SURVEY.md §2.3's 86
entries (84 oracle-backed + 2 bench-only approximate). The external
correctness gate records the first 50 entries per round, so the
surplus sits past the cutoff each round; the rotation policy keeps
every official row as fresh as the window allows (pinned by
tests/test_survey_contract.py's freshness test since r15: with ~29
contract rows pinned every round, the ~56 rotating entries share ~21
slots, so the feasible bound is a refresh every THIRD gate — any
entry about to exceed it, or never certified, must sit inside the
next window):

- Entries with NO official row ever go FIRST, then entries CHANGED
  this round (their old rows certify code that no longer exists),
  then the entries hitting the 3-gate freshness bound, then the
  contract rows Q1-Q28 + wiki (inside the window every round), with
  any spare slots refreshing the OLDEST remaining rows FIFO.
- Round-18 window arithmetic: (1 never-certified: the NEW
  percentiles_refined) + (1 changed-core re-cert: bm25_rank, whose
  r18 single-scan replan invalidated its r17 row) + (12 r15-official
  entries at the bound: pii_scrub .. ann_sq8) + (2 rows-only
  approximate entries, also last recorded r15) + (29 contract) = 45,
  leaving 5 spare slots spent on the OLDEST r16-official rows FIFO
  (packed_sequences .. incremental_dedup) to lighten r19.
- Round-19 horizon: the remaining 16 r16-official entries
  (grouped_agg_udf .. text_normalize) hit their bound at r19; with
  29 contract rows that window is 45/50 full before new work —
  5 free slots.
- The entries that yield are the freshest (r16-certified) ones —
  every oracle-backed one still differentially tested locally on each
  pytest run by tests/test_queries_oracle.py.

All entries are benched by bench.py regardless of position, and the
oracle-backed entries are oracle-tested every run in
tests/test_queries_oracle.py (q12_approx and percentiles_approx are
approximate by design, declare no oracle, and get only the driver's
rows-only check); the rotation affects only which 50 the external gate
re-certifies this round.
"""

from __future__ import annotations

from etl_wikipedia_updates_spark.plans.base import QueryRegistry
from etl_wikipedia_updates_spark.plans.bpe import BPE_QUERIES
from etl_wikipedia_updates_spark.plans.clustering import CLUSTERING_QUERIES
from etl_wikipedia_updates_spark.plans.corpus import CORPUS_QUERIES
from etl_wikipedia_updates_spark.plans.events import EVENTS_QUERIES
from etl_wikipedia_updates_spark.plans.incremental import INCREMENTAL_QUERIES
from etl_wikipedia_updates_spark.plans.northstar import NORTHSTAR_QUERIES
from etl_wikipedia_updates_spark.plans.relational import RELATIONAL_QUERIES
from etl_wikipedia_updates_spark.plans.wiki import WIKI_QUERIES

DECLARATION_ORDER: list[str] = [
    # --- NEVER-CERTIFIED first: percentiles_refined (NEW r18 — the
    # approx-pivot two-pass exact quantile path from
    # operators/quantiles.py, registered per the r17 verdict to close
    # weak `percentiles` with a hash-certified scale-true exact plan)
    # has no official row ---
    "percentiles_refined",
    # --- CHANGED this round: bm25_rank's r18 single-scan replan (its
    # stats and per-doc branches now share one (doc_id, dl, tf_*)
    # exchange instead of scanning + tokenizing the corpus twice) —
    # its r17 row certifies a plan that no longer exists, so it
    # re-certifies directly ---
    "bm25_rank",
    # --- round-18 rotation head, executing the window the r17
    # registry promised (r17 verdict #1): the 12 entries whose newest
    # official row is r15 — they hit the every-third-gate freshness
    # bound at this gate (tests/test_survey_contract.py), FIFO in
    # prior tail order ---
    "pii_scrub",
    "charlm_score",
    "shard_manifest",
    "dedup_corpus",
    "span_dedup",
    "token_stats",
    "corpus_stats",
    "minhash_lsh",
    "lang_id",
    "quantize_embeddings",
    "lang_id_chargram",
    "ann_sq8",
    # --- the rows-only approximate pair: their err='no_oracle'
    # recorded rows are their official rows (freshness test counts
    # them); last recorded r15, so at the bound too ---
    "q12_approx",
    "percentiles_approx",
    # --- §2.3 contract rows (always inside the gate window) ---
    *[f"q{i}" for i in range(1, 29)],
    "wiki_pipeline",
    # --- spare slots (5 after bm25_rank's re-cert): the OLDEST
    # r16-official rows, FIFO, pulled forward to lighten the r19
    # window — the 21-entry r16 block hits its bound at r19, which
    # with 29 contract rows would otherwise be exactly 50/50 full
    # (r17 verdict #6); pulling 5 leaves r19 at 45/50 with 5 free
    # slots ---
    "packed_sequences",
    "span_decontam",
    "seq_pack_subword",
    "source_mix_subword",
    "incremental_dedup",
    # --- positions 51+: past the cutoff this round. The remaining 16
    # r16-official entries head the round-19 queue (they hit the
    # 3-gate bound at r19), FIFO in tail order, followed by the
    # freshest r17-certified block. Every oracle-backed entry is
    # still differentially tested locally on each pytest run by
    # tests/test_queries_oracle.py ---
    "grouped_agg_udf",
    "kmeans_clusters",
    "ann_kmeans",
    "sample_hash",
    "simhash_pairs",
    "stratified_sample",
    "tfidf_topterms",
    "semantic_dedup",
    "cosine_neardup",
    "text_quality",
    "dedup_clusters",
    "contamination",
    "percentiles",
    "grouped_zscore",
    "doc_fingerprint",
    "text_normalize",
    # r17-certified block, FIFO in r17 window order
    "incremental_span_dedup",
    "seq_pack",
    "pack_assignments",
    "rep_filter",
    "corpus_release",
    "corpus_release_temp",
    "multimodal_bytes",
    "ann_lsh",
    "ann_ivf",
    "span_removal",
    "ann_lsh_multiprobe",
    "temperature_mix",
    "distinct_kmv",
    "ann_pq",
    "zipf_fit",
    "length_hist",
    "embedding_stats",
    "ngram_quality",
    "bpe_token_stats",
    "source_mix",
]

_declared = QueryRegistry()
_declared.extend(RELATIONAL_QUERIES)
_declared.extend(EVENTS_QUERIES)
_declared.extend(NORTHSTAR_QUERIES)
_declared.extend(CLUSTERING_QUERIES)
_declared.extend(CORPUS_QUERIES)
_declared.extend(WIKI_QUERIES)
_declared.extend(BPE_QUERIES)
_declared.extend(INCREMENTAL_QUERIES)

_missing = set(_declared.queries) - set(DECLARATION_ORDER)
_extra = set(DECLARATION_ORDER) - set(_declared.queries)
if _missing or _extra:
    raise RuntimeError(
        "DECLARATION_ORDER out of sync: "
        f"missing={sorted(_missing)} extra={sorted(_extra)}"
    )

REGISTRY = QueryRegistry()
REGISTRY.extend([_declared.queries[name] for name in DECLARATION_ORDER])
