"""Global query registry — single source of truth for __spark_entry__,
tests, and bench.

Registry order is a CERTIFICATION ROTATION over SURVEY.md §2.3's
entries (62 as of round 7). The external correctness gate records the
first 50 entries per round, so 12 entries now sit past the cutoff;
the rotation policy keeps every official row at most one round stale:

- Entries whose newest official row is OLDEST go FIRST (round 7: the
  11 that fell past round 6's cutoff — grouped_zscore through
  percentiles_approx — whose newest official rows date to r5).
- The contract rows Q1-Q28 + wiki and every entry CHANGED this round
  stay inside the first 50 (a changed query needs a fresh row; its
  old row certifies code that no longer exists). Round 7 changed
  source_mix (64-bit cast in mix_keep_cond) and thereby
  corpus_release (shared rule), so both stay inside.
- NEW entries (round 7: seq_pack) have no official row at all, so
  they must sit inside the first 50.
- The 12 that yield their slots are UNCHANGED-this-round entries
  certified green in the immediately-preceding round (round 7: the
  former r6 head, the kmeans pair, rep_filter, minhash_lsh /
  simhash_pairs, and lang_id — all r6-fresh green).

All 62 entries are benched by bench.py and oracle-tested every run in
tests/test_queries_oracle.py regardless of position; the rotation
affects only which 50 the external gate re-certifies this round.
"""

from __future__ import annotations

from etl_wikipedia_updates_spark.plans.base import QueryRegistry
from etl_wikipedia_updates_spark.plans.clustering import CLUSTERING_QUERIES
from etl_wikipedia_updates_spark.plans.events import EVENTS_QUERIES
from etl_wikipedia_updates_spark.plans.northstar import NORTHSTAR_QUERIES
from etl_wikipedia_updates_spark.plans.relational import RELATIONAL_QUERIES
from etl_wikipedia_updates_spark.plans.wiki import WIKI_QUERIES

DECLARATION_ORDER: list[str] = [
    # --- round-7 rotation head: past-cutoff-in-r6 entries (newest
    # official rows r5, or rows-only by design) regain certification
    # first ---
    "grouped_zscore",
    "stratified_sample",
    "token_stats",
    "doc_fingerprint",
    "sample_hash",
    "text_normalize",
    "cosine_neardup",
    "multimodal_bytes",
    "ann_lsh",
    "q12_approx",
    "percentiles_approx",
    # --- §2.3 contract rows (always inside the gate window) ---
    *[f"q{i}" for i in range(1, 29)],
    "wiki_pipeline",
    # --- remaining extensions; entries CHANGED in round 7 must hold
    # in-window slots: source_mix + corpus_release (mix_keep_cond
    # 64-bit cast) and tfidf_topterms + bm25_rank (shuffle-free df /
    # in-array scoring replans) ---
    "text_quality",
    "ann_ivf",
    "dedup_clusters",
    "contamination",
    "percentiles",
    "source_mix",
    "corpus_release",
    "tfidf_topterms",
    "bm25_rank",
    # --- NEW in round 7 (never certified — must sit inside the gate
    # window): sequence-packing audit ---
    "seq_pack",
    # --- positions 51-62: yield their slots this round (all fresh
    # r6-official green and unchanged in r7: most of the former r6
    # rotation head, the kmeans pair, rep_filter, minhash_lsh /
    # simhash_pairs — displaced by the replanned tfidf/bm25 — and
    # lang_id, displaced by the new seq_pack) ---
    "lang_id",
    "quantize_embeddings",
    "corpus_stats",
    "dedup_corpus",
    "lang_id_chargram",
    "ann_sq8",
    "grouped_agg_udf",
    "kmeans_clusters",
    "ann_kmeans",
    "rep_filter",
    "minhash_lsh",
    "simhash_pairs",
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
