"""Physical-plan regression tests: the scale-critical plan properties
(SCALE.md) must survive refactors. Mirrors tools/explain_audit.py for
the load-bearing subset — a wrong plan shape is a perf bug even when
results stay correct.
"""

from __future__ import annotations

import pytest

from etl_wikipedia_updates_spark.registry import REGISTRY


def _plan(spark, name: str, sf_dir: str) -> str:
    df = REGISTRY.queries[name].builder(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


CASES = [
    # top-k compiles to per-partition heaps, never a global sort
    ("q1", ["TakeOrderedAndProject"], ["Exchange rangepartitioning"]),
    ("q10", ["TakeOrderedAndProject"], ["Exchange rangepartitioning"]),
    # predicates reach the parquet reader
    ("q2", ["PushedFilters: [IsNotNull(l_shipdate)"], []),
    ("q18", ["PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,10)]"], []),
    # map-side partial aggregation
    ("q3", ["partial_"], []),
    # dims broadcast; no sort-merge join of a small side
    ("q5", ["BroadcastHashJoin"], []),
    ("q6", ["BroadcastHashJoin"], ["SortMergeJoin"]),
    # brute-force top-k: broadcast probe + ranked window
    ("q25", ["BroadcastNestedLoopJoin", "row_number"], ["SortMergeJoin"]),
    # dictionary joins broadcast in the near-dup family
    ("minhash_lsh", ["BroadcastHashJoin"], []),
    ("ann_ivf", ["BroadcastHashJoin"], []),
    # one ranking window + partial aggregation, no extra exchange layers
    ("percentiles", ["Window", "partial_"], []),
    # the tiny (doc_id, source) side broadcasts onto the exploded shingles
    ("contamination", ["BroadcastHashJoin"], []),
    # k-means: assignment is a projection and cent1 a literal array
    # lookup — the whole summary is join-free (one agg + final sort)
    ("kmeans_clusters", ["HashAggregate"], ["SortMergeJoin", "Join"]),
    # learned-cell probe: broadcast queries + ranked window, no merge join
    ("ann_kmeans", ["BroadcastHashJoin", "row_number"], ["SortMergeJoin"]),
    # grouped-map crosses to Python exactly once; aggregation stays two-phase
    ("grouped_zscore", ["FlatMapGroupsInPandas", "partial_"], []),
    # scalar pandas_udf runs as Arrow-batched eval, not row-at-a-time Python
    ("q28", ["ArrowEvalPython"], ["BatchEvalPython"]),
    # grouped-agg pandas UDAF plans as its dedicated Arrow aggregate
    ("grouped_agg_udf", ["ArrowAggregatePython"], ["BatchEvalPython"]),
    # posting-list pair shape (r5): the pair stream comes from explode
    # generators over grouped lists — no per-key count window (the df
    # cap is a size filter) and no nested-transform whole-pair-array
    # value (flatten would materialize n^2 structs in one buffer)
    ("q26", ["Generate"], ["Window", "flatten"]),
    # total_order = round-robin Exchange(1) + sort: a range exchange
    # would SAMPLE (re-execute) the whole upstream plan
    ("q3", [], ["Exchange rangepartitioning"]),
    ("q26", [], ["Exchange rangepartitioning"]),
    ("cosine_neardup", [], ["Exchange rangepartitioning"]),
    ("bm25_rank", [], ["Exchange rangepartitioning"]),
    # rep_filter: ONE tagged explode serves words and bigrams (a second
    # Generate would mean the array is exploded per signal family) and
    # both aggregations combine map-side
    ("rep_filter", ["Generate", "partial_"], []),
    # source_mix: the per-source budget frame broadcasts back onto the
    # corpus — the corpus itself must never shuffle on the skewed
    # source key before the final audit agg
    ("source_mix", ["BroadcastHashJoin", "partial_"], ["SortMergeJoin"]),
    # bm25 (r7 replan): ZERO corpus-wide shuffles — per-doc scoring is
    # in-array map work, corpus stats are one single-row broadcast
    # agg; a hashpartitioning exchange or an explode would mean the
    # old corpus-scale shuffle crept back
    ("bm25_rank", ["BroadcastExchange"], ["hashpartitioning", "Generate"]),
    # tfidf (r7 replan): the vocab-sized df frame broadcasts onto the
    # reported-docs tf branch; never a merge join
    ("tfidf_topterms", ["BroadcastHashJoin"], ["SortMergeJoin"]),
    # seq_pack (r7): ONE window shuffle on the stream key; token
    # counts are size(split) projections — no explode, no doc-keyed
    # shuffle, and the per-source report reuses the window's
    # partitioning
    (
        "seq_pack",
        ["hashpartitioning(source", "Window"],
        ["Generate", "hashpartitioning(doc_id"],
    ),
]


@pytest.mark.parametrize("name,need,forbid", CASES, ids=[c[0] for c in CASES])
def test_plan_shape(spark, sf_smoke, name, need, forbid):
    plan = _plan(spark, name, sf_smoke)
    for frag in need:
        assert frag in plan, f"{name}: expected {frag!r} in physical plan"
    for frag in forbid:
        assert frag not in plan, f"{name}: forbidden {frag!r} in physical plan"
