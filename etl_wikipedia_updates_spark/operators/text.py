"""Text-analysis operators over a documents table (doc_id, text, lang, ...).

Everything here is whitespace/regex tokenization + relational algebra —
no Python in the hot path. The reference's only text handling is
str() casts and one replace (/root/reference/pipeline.py:119-124); these
operators are the north-star extension of that surface for LLM-corpus
work: token stats, language-ID, quality scores, fingerprints.

Cross-engine determinism: operators that need a token->integer mapping
use ``token_dictionary`` (dense ids from a global sort) so the DuckDB
oracle can reproduce results bit-for-bit. At 100 TB the dictionary's
global sort would be replaced by ``xxhash64(term)`` — a pure map-side
expression with no shuffle — at the cost of oracle parity, not
correctness. The swap is one line and noted on each call site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from etl_wikipedia_updates_spark.functions.deterministic import det_round

# Universal-hash modulus: the Mersenne prime 2^31 - 1. a*x+b stays under
# 2^62 for any dictionary id, so all arithmetic fits in a long on both
# engines (no overflow divergence).
HASH_P = 2_147_483_647


def tokens_col(text_col: str = "text"):
    """Whitespace tokens, lowercased — the canonical tokenizer."""
    return F.split(F.lower(F.col(text_col)), " ")


def doc_tokens(docs: DataFrame, distinct: bool = False) -> DataFrame:
    """Explode documents into (doc_id, lang, term) rows."""
    toks = tokens_col()
    if distinct:
        toks = F.array_distinct(toks)
    return docs.select("doc_id", "lang", F.explode(toks).alias("term"))


def shingles_col(text_col: str = "text", k: int = 3):
    """Distinct k-token shingles (w-shingling): the canonical near-dup
    representation. Unigram token sets degenerate when the vocabulary is
    small (every doc resembles every doc); k-shingles keep sequence
    context, so only true near-duplicates overlap. Docs with fewer than
    k tokens have no shingles (empty array).

    The token array is bound as a lambda variable (transform over a
    1-element array) so ``split(lower(text))`` is evaluated ONCE per
    row. Referencing the split expression directly from every
    ``element_at`` would re-evaluate it per element access — Catalyst
    does not common-subexpression-eliminate into lambda bodies — which
    measured ~12x slower on the documents corpus."""

    def per_tokens(t):
        n = F.size(t)

        def shingle_at(i):
            return F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(k)])

        return F.when(
            n >= k,
            F.array_distinct(
                F.transform(F.sequence(F.lit(1), n - (k - 1)), shingle_at)
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(tokens_col(text_col)), per_tokens), 1)


def doc_shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """Explode documents into (doc_id, lang, term) shingle rows."""
    return docs.select(
        "doc_id", "lang", F.explode(shingles_col(k=k)).alias("term")
    )


TERM_HASH_BASE = 131


def term_hash_col(term_col: str = "term"):
    """Stateless term -> integer id: polynomial char fold
    ``fold((a*131 + ascii(c)) % (2^31-1))`` — a pure map-side
    expression, no distinct, no global sort, no broadcast join. This is
    the 100 TB id path the dictionary docstrings point at, usable in
    the CONTRACT too because ``sql_term_hash`` replays the identical
    integer sequence in DuckDB (verified bit-equal): hash collisions
    are possible but occur identically in both engines, and
    MinHash/SimHash tolerate them by construction. ``token_dictionary``
    remains for operators that need *dense, sorted* ids."""
    return F.expr(
        f"aggregate(split({term_col}, ''), 0L, "
        f"(a, c) -> (a * {TERM_HASH_BASE} + ascii(c)) % {HASH_P})"
    )


def sql_term_hash(expr: str = "term") -> str:
    """DuckDB twin of term_hash_col — identical fold sequence."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), "
        f"c -> CAST(ascii(c) AS BIGINT))), "
        f"(a, v) -> (a * {TERM_HASH_BASE} + v) % {HASH_P})"
    )


def term_dictionary(term_rows: DataFrame) -> DataFrame:
    """(term, tid) dense ids for any exploded (.., term) rows — the
    shingle/token-agnostic core of token_dictionary. Same oracle-parity
    global sort; same xxhash64 swap at scale."""
    terms = term_rows.select("term").distinct()
    return terms.select(
        "term", F.row_number().over(W.orderBy("term")).alias("tid")
    )


def doc_tokens_with_pos(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, term) with 1-based positions (order-preserving)."""
    return docs.select(
        "doc_id", F.posexplode(tokens_col()).alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")


def token_dictionary(docs: DataFrame) -> DataFrame:
    """(term, tid): dense 1-based ids by sorted term order.

    The single-partition row_number window is the deliberate
    oracle-parity choice; the 100 TB swap is
    ``F.xxhash64('term')`` (stateless, shuffle-free). Vocabulary
    tables are tiny relative to corpora either way, and the result is
    broadcast wherever it's joined.
    """
    terms = doc_tokens(docs, distinct=True).select("term").distinct()
    return terms.select(
        "term", F.row_number().over(W.orderBy("term")).alias("tid")
    )


def corpus_top_terms(docs: DataFrame, n: int, per_lang: bool = False) -> DataFrame:
    """Top-n terms by (count desc, term asc), optionally per language."""
    toks = doc_tokens(docs)
    keys = ["lang"] if per_lang else []
    counts = toks.groupBy(*keys, "term").agg(F.count("*").alias("cnt"))
    w = W.partitionBy(*keys).orderBy(F.col("cnt").desc(), F.col("term"))
    return (
        counts.select(*keys, "term", "cnt", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= n)
    )


def quality_features(docs: DataFrame, stopwords: DataFrame) -> DataFrame:
    """Per-doc quality features + a composite score.

    stopwords: a small (term) DataFrame (e.g. corpus_top_terms output),
    broadcast into the ratio join. Integer counts + one final division
    keep every ratio deterministic cross-engine.
    """
    toks = doc_tokens(docs)
    stop = F.broadcast(stopwords.select("term", F.lit(1).alias("is_stop")))
    per_doc = (
        toks.join(stop, "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("term").alias("n_distinct"),
            F.sum(F.length("term")).alias("sum_len"),
            F.count("is_stop").alias("n_stop"),
            F.count(F.when(F.col("term").rlike("^[a-z]+$"), 1)).alias("n_alpha"),
        )
    )
    n = F.col("n_tokens").cast("double")
    stop_ratio = F.col("n_stop") / n
    alpha_ratio = F.col("n_alpha") / n
    len_score = F.least(F.lit(1.0), n / 100)
    score = 0.4 * alpha_ratio + 0.3 * (1 - stop_ratio) + 0.3 * len_score
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        det_round(F.col("sum_len").cast("double") / n, 3).alias("avg_token_len"),
        det_round(stop_ratio, 3).alias("stop_ratio"),
        det_round(alpha_ratio, 3).alias("alpha_ratio"),
        det_round(score, 3).alias("quality_score"),
    )


def predict_language(docs: DataFrame, profiles: DataFrame) -> DataFrame:
    """Language-ID by token-profile overlap.

    profiles: (lang, term) — the per-language top-terms model (from
    ``corpus_top_terms(per_lang=True)``). Each doc is scored by
    |distinct(doc tokens) ∩ profile(lang)| and assigned the argmax
    (ties -> lexicographically smallest lang). Profiles are tiny ->
    broadcast join; one shuffle on doc_id for the argmax window.
    """
    dtoks = doc_tokens(docs, distinct=True).select("doc_id", "term")
    prof = F.broadcast(profiles.select(F.col("lang").alias("cand_lang"), "term"))
    overlap = (
        dtoks.join(prof, "term")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count("*").alias("n_overlap"))
    )
    w = W.partitionBy("doc_id").orderBy(
        F.col("n_overlap").desc(), F.col("cand_lang")
    )
    best = (
        overlap.select("doc_id", "cand_lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("cand_lang").alias("predicted_lang"))
    )
    return docs.select("doc_id", "lang").join(best, "doc_id", "left").select(
        "doc_id",
        "lang",
        F.coalesce("predicted_lang", F.lit("unknown")).alias("predicted_lang"),
    )


def rolling_fingerprint(
    docs: DataFrame, base: int = 131, mod: int = HASH_P
) -> DataFrame:
    """Per-doc polynomial rolling hash over ordered token ids:
    fp = fold(acc * base + tid) mod P.

    Position-sensitive (unlike set-based MinHash/SimHash), so it
    fingerprints *exact* token sequences — the cheap first pass of
    exact-dup detection on a corpus. Token ids are the stateless
    char-fold hash (term_hash_col), so the whole id step is map-side;
    one explode + one shuffle on doc_id, and the fold itself is a JVM
    higher-order function over the re-collected id array.
    """
    with_ids = doc_tokens_with_pos(docs).withColumn("tid", term_hash_col())
    ordered = (
        with_ids.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "tid"))).alias("pt"))
        .select("doc_id", F.transform("pt", lambda s: s.getField("tid")).alias("ids"))
    )
    fp = F.aggregate(
        "ids",
        F.lit(0).cast("long"),
        lambda acc, v: (acc * base + v) % mod,
    )
    return ordered.select("doc_id", fp.alias("fingerprint"))
