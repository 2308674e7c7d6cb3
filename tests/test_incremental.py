"""incremental_dedup (plans/incremental.py): the recrawl workflow.

The load-bearing property the oracle hash alone can't certify: when
the prior side IS a published release (internally deduped under the
same pair relation, ids preceding the snapshot's), the incremental
pass over release ∪ recrawl keeps exactly the docs a from-scratch
dedup of the union keeps — the prior×prior pair skip loses nothing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_wikipedia_updates_spark.operators import dedup as D
from etl_wikipedia_updates_spark.operators import text as T
from etl_wikipedia_updates_spark.plans.incremental import (
    incremental_vs_prior,
)
from etl_wikipedia_updates_spark.plans.northstar import (
    JACCARD_THRESHOLD,
    MINHASH_BANDS,
    MINHASH_PARAMS,
    MINHASH_ROWS,
)


def _docs_frame(spark, rows):
    return spark.createDataFrame(
        [(i, lang, src, txt) for (i, lang, src, txt) in rows],
        ["doc_id", "lang", "source", "text"],
    )


def _from_scratch_kept(docs):
    """From-scratch dedup over the full corpus on the SAME pair
    relation the incremental pass uses (banded MinHash candidates +
    exact-Jaccard verify + CC, min-id survivorship)."""
    dtok = T.doc_shingles(docs).withColumn("tid", T.term_hash_col())
    sig = D.minhash_signatures(
        dtok.select("doc_id", "lang", "tid"), MINHASH_PARAMS
    )
    cand = D.lsh_candidate_pairs(sig, MINHASH_BANDS, MINHASH_ROWS)
    tok_arrays = docs.select(
        "doc_id",
        F.array_sort(
            F.array_distinct(F.transform(T.shingles_col(), T.term_hash_fn))
        ).alias("toks"),
    )
    verified = D.jaccard_verify(cand, tok_arrays, JACCARD_THRESHOLD)
    labels = D.connected_components(verified.select("doc_id", "doc_id2"))
    dropped = {
        r["doc_id"]
        for r in labels.filter(
            F.col("cluster_id") != F.col("doc_id")
        ).collect()
    }
    return {r["doc_id"] for r in docs.collect() if r["doc_id"] not in dropped}


# ~8-token texts: long enough for 3-shingles, distinct enough that only
# the planted pairs collide.
_T = {
    "alpha": "the quick brown fox jumps over the lazy dog today",
    "alpha2": "the quick brown fox jumps over the lazy dog tonight",
    "beta": "spark shuffles keyed data between stages during wide ops",
    "beta2": "spark shuffles keyed data between stages during wide joins",
    "gamma": "ducks quack loudly near the quiet pond every morning",
    "delta": "completely unrelated sentence about gardening tools and soil",
    "eps": "another fully distinct document concerning maritime navigation rules",
}


def test_incremental_equals_from_scratch_on_release_plus_recrawl(spark):
    """release(v1) ∪ recrawl: incremental keep/drop == from-scratch."""
    initial = [
        (0, "en", "s0", _T["alpha"]),
        (1, "en", "s0", _T["alpha2"]),  # near-dup of 0 -> dropped in v1
        (2, "en", "s1", _T["beta"]),
        (3, "en", "s1", _T["gamma"]),
        (4, "en", "s1", _T["delta"]),
    ]
    init_docs = _docs_frame(spark, initial)
    v1_kept = _from_scratch_kept(init_docs)
    assert v1_kept == {0, 2, 3, 4}  # the planted near-dup collapsed
    release = [r for r in initial if r[0] in v1_kept]

    thr = 100
    # 101 reuses the alpha/alpha2 near-dup pair: v1 above just PROVED
    # it band-collides under the fixed MinHash params (the beta/beta2
    # pair does not — Jaccard ~7/9 but zero shared bands at 4x4).
    recrawl = [
        (100, "en", "s0", _T["alpha"]),  # exact dup of prior 0
        (101, "en", "s2", _T["alpha2"]),  # near-dup of prior 0
        (102, "en", "s2", _T["eps"]),  # fresh
        (103, "en", "s2", _T["eps"]),  # within-snapshot dup of 102
        (104, "en", "s0", _T["gamma"]),  # exact dup of prior 3
    ]
    union = _docs_frame(spark, release + recrawl)

    flagged = incremental_vs_prior(union, thr)
    inc_kept_new = {
        r["doc_id"]
        for r in flagged.collect()
        if r["cluster_id"] is None or r["cluster_id"] == r["doc_id"]
    }
    inc_kept = v1_kept | inc_kept_new

    assert inc_kept == _from_scratch_kept(union)
    # and the expected fates, spelled out: 100 (exact) and 101
    # (near-dup) collide with prior 0, 104 with prior 3; 103 collides
    # with the smaller kept 102
    assert inc_kept_new == {102}


def test_incremental_candidates_skip_prior_pairs(spark):
    """lsh_candidate_pairs_vs never emits a prior×prior pair, even
    when prior docs collide with each other (the release-side dup is
    someone else's bug — the incremental pass must not pay for it)."""
    rows = [
        (0, "en", "s0", _T["alpha"]),
        (1, "en", "s0", _T["alpha"]),  # prior x prior exact dup
        (2, "en", "s0", _T["beta"]),
        (10, "en", "s1", _T["alpha2"]),  # new, collides with 0 and 1
        (11, "en", "s1", _T["beta"]),  # new, collides with 2
    ]
    docs = _docs_frame(spark, rows)
    thr = 10
    dtok = T.doc_shingles(docs).withColumn("tid", T.term_hash_col())
    sig = D.minhash_signatures(
        dtok.select("doc_id", "lang", "tid"), MINHASH_PARAMS
    )
    band_all = D.lsh_band_rows(sig, MINHASH_BANDS, MINHASH_ROWS)
    band_new = band_all.filter(F.col("doc_id") >= thr)
    cand = D.lsh_candidate_pairs_vs(band_new, band_all).collect()
    assert cand, "planted collisions must surface"
    for r in cand:
        assert r["doc_id"] < r["doc_id2"]
        assert r["doc_id"] >= thr or r["doc_id2"] >= thr, (
            f"prior x prior pair leaked: {tuple(r)}"
        )
    # the prior x prior dup (0, 1) is exactly the pair that must NOT
    # appear
    assert (0, 1) not in {(r["doc_id"], r["doc_id2"]) for r in cand}


def test_incremental_prior_is_never_dropped(spark):
    """A component spanning prior+new always keeps the prior doc: the
    flagged frame only ever contains new ids, and cluster ids below
    the threshold mark drops AGAINST the release, not of it."""
    rows = [
        (0, "en", "s0", _T["alpha"]),
        (1, "en", "s1", _T["delta"]),
        (10, "en", "s2", _T["alpha2"]),
    ]
    docs = _docs_frame(spark, rows)
    flagged = incremental_vs_prior(docs, 10).collect()
    assert {r["doc_id"] for r in flagged} == {10}
    (row,) = flagged
    assert row["cluster_id"] == 0  # canonical = the prior doc
