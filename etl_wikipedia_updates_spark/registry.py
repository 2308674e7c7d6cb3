"""Global query registry — single source of truth for __spark_entry__,
tests, and bench.

Registry order is a CERTIFICATION ROTATION over SURVEY.md §2.3's
entries (76 as of round 10). The external correctness gate records the
first 50 entries per round, so the surplus sits past the cutoff each
round; the rotation policy keeps every official row at most one round
stale:

- Entries whose newest official row is OLDEST go FIRST. Round 10: the
  13 that fell past round 8's cutoff (text_quality through ann_ivf)
  whose newest official rows date to r7 — two rounds stale because
  round 9 shipped no rotation at all (11 of them head the window; the
  two rows-only approx entries yielded, see below).
- The contract rows Q1-Q28 + wiki and every entry CHANGED this round
  stay inside the first 50 (a changed query needs a fresh row; its
  old row certifies code that no longer exists). Round 10 changed
  text_quality (NULL-text parity fix, landed with its head slot) and
  bm25_rank (sort+limit top-k replan); corpus_release, dedup_corpus
  and dedup_clusters run through the r10-changed
  operators.dedup.connected_components (convergence-guard fix), and
  wiki_pipeline through the r10-pinned timestamp parse — all inside.
- NEW entries have no official row at all, so they must sit inside
  the first 50 (round 10: span_removal, per-doc duplicated-span
  excision; ann_lsh_multiprobe, the recall-audit-motivated
  multi-probe LSH variant; the plans.corpus additions —
  temperature_mix, charlm_score, shard_manifest, pii_scrub; and
  semantic_dedup, SemDeDup over the shared learned k-means cells).
- The entries that yield their slots are UNCHANGED-this-round entries
  certified green in the immediately-preceding round (the
  r9-official-green extensions in the tail). The corpus additions'
  arrival displaced the three in-window guards an earlier r10
  session held for shared-module edits (span_dedup, token_stats,
  corpus_stats): a never-certified entry outranks a guard whose
  r9-official row is one round old and whose oracle is re-proven
  locally every run by tests/test_queries_oracle.py. With the window
  saturated, the LAST six new entries of the round (distinct_kmv,
  ann_pq, corpus_release_temp, zipf_fit, length_hist,
  embedding_stats) sit at positions 51-56 — no official row this
  round, oracle-tested locally, heading the r11 rotation.

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
    # --- round-10 rotation head: the entries past round 8's cutoff
    # (newest official rows r7, two rounds stale after the r9 no-op)
    # regain certification first — 11 of the 13 here; q12_approx and
    # percentiles_approx (rows-only by design, unchanged) yield their
    # slots to the new oracle-backed semantic_dedup and pii_scrub, see
    # the tail comment. text_quality leads: its deferred NULL-text
    # parity fix lands at this slot ---
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
    # --- §2.3 contract rows (always inside the gate window) ---
    *[f"q{i}" for i in range(1, 29)],
    "wiki_pipeline",
    # --- CHANGED in round 10, so their old official rows certify code
    # that no longer exists: bm25_rank (TakeOrderedAndProject top-k
    # replan); corpus_release / dedup_corpus (both run the
    # convergence-guard-fixed connected_components) ---
    "bm25_rank",
    "corpus_release",
    "dedup_corpus",
    # --- NEW in round 10 (never certified — must sit inside the gate
    # window): per-doc duplicated-span excision, the multi-probe
    # LSH variant the r10 recall audit motivated, the plans.corpus
    # additions (temperature mixing / char-LM quality scoring / shard
    # planning / PII scrub), and semantic_dedup (SemDeDup over the
    # shared learned k-means cells) ---
    "span_removal",
    "ann_lsh_multiprobe",
    "temperature_mix",
    "charlm_score",
    "shard_manifest",
    "semantic_dedup",
    "pii_scrub",
    # --- positions 51-56: distinct_kmv, ann_pq, corpus_release_temp,
    # zipf_fit, length_hist and embedding_stats are ALSO new this
    # round, but the window is saturated (11 three-round-stale
    # recertifications + 29 contract rows + 3 changed + 7 new fill all
    # 50); they take the first slots past the cutoff, are oracle-tested
    # every run locally like every entry, and HEAD the round-11
    # rotation ---
    "distinct_kmv",
    "ann_pq",
    "corpus_release_temp",
    "zipf_fit",
    "length_hist",
    "embedding_stats",
    # --- positions 57-76: yield their slots this round (all with
    # r9-official green rows; span_dedup/token_stats/corpus_stats
    # are UNCHANGED-in-behavior consumers of r10-edited shared
    # modules, oracle-green locally — see docstring).
    # q12_approx and percentiles_approx sit here despite their r7-stale
    # official rows: both are rows-only by design (no oracle hash),
    # unchanged since r7, and their slots buy semantic_dedup and
    # pii_scrub — never-certified oracle-backed entries — first
    # official rows; the weakest checks yield to the strongest ---
    "q12_approx",
    "percentiles_approx",
    "span_dedup",
    "token_stats",
    "corpus_stats",
    "rep_filter",
    "minhash_lsh",
    "lang_id",
    "quantize_embeddings",
    "lang_id_chargram",
    "ann_sq8",
    "grouped_agg_udf",
    "kmeans_clusters",
    "ann_kmeans",
    "simhash_pairs",
    "source_mix",
    "tfidf_topterms",
    "seq_pack",
    "sample_hash",
    "stratified_sample",
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
