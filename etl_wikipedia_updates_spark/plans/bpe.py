"""bpe_token_stats: subword (BPE) tokenization — per-source subword
accounting beside token_stats' whitespace counts.

Engine extension (no reference analog — the reference,
/root/reference/pipeline.py, never tokenizes; this is the
training-pipeline operator that re-denominates corpus sizing in the
tokens a dataloader actually consumes). Whitespace-token counts
mis-size packing and mixing budgets by the subword fertility factor;
this operator learns a byte-pair-encoding merge table from the corpus
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units" — the standard greedy pair-merge fit) and reports
per-source subword totals and fertility.

Determinism and the fit-small pattern (charlm_score's shape):
- The fit vocabulary is the TOP_V words by (corpus frequency DESC,
  word ASC) — a bounded, deterministic collect (TOP_V rows), never
  corpus-scale. Real BPE training samples its corpus the same way.
- The merge loop runs driver-side in pure Python over that bounded
  table (BPE_MERGES iterations of exact integer pair counts; ties
  break to the lexicographically smallest (a, b) pair) and is memoized
  per (session, sf_dir) via _memo_model.
- Merge application is a left-to-right fold: scanning tokens once,
  (acc[-1], x) == (a, b) replaces the accumulator tail with a||b.
  One pass per rule is complete — a merged token a||b can never
  re-form the (a, b) adjacency with its neighbors unless a||b == a or
  b, impossible for non-empty a, b.
- ENCODING applies the learned rules in merge-rank order, each rule
  once — on fit-corpus words this is exactly the sequence of fit
  states, so the oracle can replay it as BPE_MERGES chained CTEs;
  Spark instead folds over the merge-table literal in ONE expression
  (rank order preserved), which is the same function.

Scale shape: the corpus is scanned once into (source, word, count) —
one shuffle with map-side partials, keyed on (source, word), so skewed
WORDS don't skew partitions. Encoding runs on the aggregated
word-count frame, not per occurrence: cost is |distinct (source,
word)| x |merges| x word-length, map-side, embarrassingly parallel. (A
distinct-word dictionary + join-back would encode each word once
instead of once per source it appears in, at the price of an extra
corpus-keyed shuffle; with |sources| small the map-side duplication is
the cheaper side of that trade at any corpus size.) The final audit is
a |sources|-key aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_wikipedia_updates_spark.functions.deterministic import (
    det_round,
    sql_det_round,
)
from etl_wikipedia_updates_spark.operators import text as T
from etl_wikipedia_updates_spark.plans.base import DeclaredQuery, total_order
from etl_wikipedia_updates_spark.plans.northstar import (
    _memo_model,
    _seq_pack,
    seq_pack_sql_from,
)
from etl_wikipedia_updates_spark.tables import load_table, spread

BPE_MERGES = 32  # merge-table size; the oracle unrolls one CTE block per merge
BPE_TOP_V = 2000  # fit-vocabulary bound (top words by freq desc, word asc)


def bpe_fit(word_freqs: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from a (word, freq) table.

    Pure Python, deterministic: pair counts are exact integers over
    the word-frequency-weighted vocabulary; the best pair maximizes
    count with ties to the lexicographically smallest (a, b); each
    adopted rule is applied to the whole vocabulary left-to-right
    before the next count. Stops early when no adjacent pairs remain.
    The unit replay test pins this against the oracle's unrolled CTE
    fit and the Spark encode."""
    vocab: list[tuple[list[str], int]] = [
        (list(w), c) for w, c in word_freqs
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for toks, c in vocab:
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        merged = a + b
        nxt: list[tuple[list[str], int]] = []
        for toks, c in vocab:
            out: list[str] = []
            for x in toks:
                if out and out[-1] == a and x == b:
                    out[-1] = merged
                else:
                    out.append(x)
            nxt.append((out, c))
        vocab = nxt
    return merges


def bpe_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Python replay of the engine encode: rules in rank order, each a
    single left-to-right fold. Used by tests, not by the Spark plan."""
    toks = list(word)
    for a, b in merges:
        out: list[str] = []
        for x in toks:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        toks = out
    return toks


_EMPTY_STR_ARRAY = "cast(array() as array<string>)"


def _chars_col(col: str | Column) -> Column:
    """Code-point array of a word column (name or Column — a Column
    lets the encode run inside a lambda over tokens_col()).
    sequence(1, 0) would count DOWN, so the empty word is guarded
    explicitly; Spark length/substr and DuckDB len/[] both index code
    points, so the twins agree on any charset."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(c) == 0, F.expr(_EMPTY_STR_ARRAY)
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(c)),
            lambda i: c.substr(i, F.lit(1)),
        )
    )


def encode_col(col: str | Column, merges: list[tuple[str, str]]) -> Column:
    """Subword-token array for word column ``col``: fold the merge
    table (bound as a VALUE literal via F.lit/F.struct — never inlined
    into SQL text, the charlm string-escape lesson) over the char
    array; each rule is the inner left-to-right fold. One expression,
    one pass per rule — no explode, no join, no shuffle."""
    chars = _chars_col(col)
    if not merges:
        return chars
    marr = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in merges
        ]
    )
    return F.aggregate(
        marr,
        chars,
        lambda toks, m: F.aggregate(
            toks,
            F.expr(_EMPTY_STR_ARRAY),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == m["a"])
                & (x == m["b"]),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(m["a"], m["b"])),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        ),
    )


def _fit_from_corpus(docs: DataFrame) -> list[tuple[str, str]]:
    """One count job down to the bounded top-V (word, freq) table,
    then the pure-Python merge loop."""
    topv = (
        docs.select(F.explode(T.tokens_col()).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(BPE_TOP_V)
        .collect()
    )
    return bpe_fit([(r["w"], r["c"]) for r in topv], BPE_MERGES)


def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source subword accounting under the corpus-fit BPE table:
    document/word/subword totals, fertility (subwords per whitespace
    word — the factor whitespace-denominated budgets are off by), and
    chars per subword (compression)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    merges = _memo_model(
        spark,
        sf_dir,
        "bpe_merges",
        lambda: _fit_from_corpus(spread(docs)),
    )
    wc = (
        docs.select("source", F.explode(T.tokens_col()).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    enc = wc.select(
        "source",
        "c",
        (F.col("c") * F.length("w")).cast("bigint").alias("nchars"),
        (F.col("c") * F.size(encode_col("w", merges)))
        .cast("bigint")
        .alias("nsub"),
    )
    ndocs = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    return (
        enc.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_words"),
            F.sum("nsub").cast("bigint").alias("n_subwords"),
            det_round(
                F.sum("nsub").cast("double") / F.sum("c").cast("double"), 4
            ).alias("fertility"),
            det_round(
                F.sum("nchars").cast("double") / F.sum("nsub").cast("double"),
                4,
            ).alias("chars_per_subword"),
        )
        .join(ndocs, "source")
        .select(
            "source",
            "n_docs",
            "n_words",
            "n_subwords",
            "fertility",
            "chars_per_subword",
        )
        .transform(total_order, "source")
    )


def _fit_cte_parts(n_merges: int) -> list[str]:
    """The fit+encode CTE chain shared by both oracles (bpe_token_stats
    and seq_pack_subword): identical fit + encode unrolled as chained
    CTEs, ending in enc(w, nsub) — every distinct corpus word's subword
    count under the learned table.

    v0 holds every distinct corpus word as a char array, carrying the
    fit weight (corpus frequency) only for top-V words; each iteration
    counts adjacent pairs over the weighted fit rows, picks the best
    (count DESC, a, b), and folds the rule over EVERY word's token
    array (LEFT JOIN ON TRUE keeps rows when no pair remains — the
    NULL rule is an identity step, matching the Python fit's early
    stop). After n_merges blocks, v{n} holds each word's subword
    tokens — the same rank-order single-pass application Spark's
    encode_col performs.

    Every v{i} is AS MATERIALIZED: each is referenced twice (the next
    pair count and the next apply), and DuckDB 1.0's default otherwise
    INLINES the reference — doubling the expansion per block, 2^n
    scans of the base table by the end of the chain (observed: 'Too
    many open files' before any row came back)."""
    fold = (
        "list_reduce("
        "list_prepend(CAST([] AS VARCHAR[]), list_transform(toks, t -> [t])), "
        "(acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.a AND x[1] = b.b "
        "THEN list_append(list_slice(acc, 1, len(acc) - 1), b.a || b.b) "
        "ELSE list_concat(acc, x) END)"
    )
    parts = [
        "tok AS (SELECT doc_id, source, "
        "unnest(string_split(lower(text), ' ')) AS w "
        "FROM documents WHERE text IS NOT NULL)",
        "wc AS (SELECT source, w, COUNT(*) AS c FROM tok GROUP BY source, w)",
        "wtot AS (SELECT w, SUM(c) AS c FROM wc GROUP BY w)",
        f"topv AS (SELECT w FROM wtot ORDER BY c DESC, w LIMIT {BPE_TOP_V})",
        "v0 AS MATERIALIZED (SELECT wt.w, "
        "CASE WHEN t.w IS NOT NULL THEN wt.c END AS fitc, "
        "CASE WHEN len(wt.w) = 0 THEN CAST([] AS VARCHAR[]) "
        "ELSE list_transform(range(1, len(wt.w) + 1), i -> wt.w[i]) END AS toks "
        "FROM wtot wt LEFT JOIN topv t USING (w))",
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f"px{i} AS (SELECT fitc, toks, unnest(range(1, len(toks))) AS i "
            f"FROM v{i - 1} WHERE fitc IS NOT NULL)"
        )
        parts.append(
            f"pc{i} AS (SELECT toks[i] AS a, toks[i + 1] AS b, "
            f"SUM(fitc) AS c FROM px{i} GROUP BY a, b)"
        )
        parts.append(
            f"b{i} AS (SELECT a, b FROM pc{i} ORDER BY c DESC, a, b LIMIT 1)"
        )
        parts.append(
            f"v{i} AS MATERIALIZED (SELECT w, fitc, "
            "CASE WHEN b.a IS NULL THEN toks "
            f"ELSE {fold} END AS toks FROM v{i - 1} LEFT JOIN b{i} b ON TRUE)"
        )
    parts.append(
        f"enc AS (SELECT w, len(toks) AS nsub FROM v{n_merges})"
    )
    return parts


def _bpe_sql(n_merges: int) -> str:
    """The bpe_token_stats oracle: the shared fit chain + the
    per-source fertility aggregation."""
    parts = _fit_cte_parts(n_merges)
    fert = sql_det_round(
        "CAST(SUM(wc.c * e.nsub) AS DOUBLE) / CAST(SUM(wc.c) AS DOUBLE)", 4
    )
    cps = sql_det_round(
        "CAST(SUM(wc.c * len(wc.w)) AS DOUBLE) "
        "/ CAST(SUM(wc.c * e.nsub) AS DOUBLE)",
        4,
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
nd AS (SELECT source, COUNT(*) AS n_docs FROM documents
       WHERE text IS NOT NULL GROUP BY source)
SELECT wc.source, ANY_VALUE(nd.n_docs) AS n_docs,
       CAST(SUM(wc.c) AS BIGINT) AS n_words,
       CAST(SUM(wc.c * e.nsub) AS BIGINT) AS n_subwords,
       {fert} AS fertility,
       {cps} AS chars_per_subword
FROM wc JOIN enc e USING (w) JOIN nd ON nd.source = wc.source
GROUP BY wc.source
ORDER BY wc.source
"""
    )


BPE_TOKEN_STATS_SQL = _bpe_sql(BPE_MERGES)


# --- seq_pack_subword: the packing audit in dataloader tokens -----------------


def subword_count_col(merges: list[tuple[str, str]]) -> Column:
    """Per-doc subword count: fold the merge table over every
    whitespace token of tokens_col(), entirely map-side. Encoding per
    OCCURRENCE (not per distinct word) is deliberate: the alternative
    — a distinct-word dictionary joined back onto exploded tokens and
    re-aggregated per doc — encodes each word once but pays an
    explode plus a corpus-keyed shuffle; the fold is pure CPU on rows
    the scan already holds, the cheaper side of the trade at any
    corpus size (the module-docstring argument, now per doc)."""
    return F.aggregate(
        T.tokens_col(),
        F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.size(encode_col(w, merges)),
    )


def seq_pack_subword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """seq_pack re-denominated in BPE subwords — the packing audit in
    the tokens a dataloader actually consumes. A whitespace-token
    SEQ_LEN mis-sizes packing by the fertility factor (~1.1-1.5x on
    natural text): n_seqs, split fractions, and fill all shift when
    the stream is measured in subwords. Same corpus-fit merge table as
    bpe_token_stats (one shared memoized fit per sf_dir), same
    two-phase distributed prefix-sum as seq_pack (_seq_pack is shared
    code, so the packing math can never diverge between
    denominations)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    merges = _memo_model(
        spark,
        sf_dir,
        "bpe_merges",
        lambda: _fit_from_corpus(spread(docs)),
    )
    return _seq_pack(
        docs.select(
            "doc_id", "source", subword_count_col(merges).alias("n_tok")
        )
    )


def _seq_pack_subword_sql(n_merges: int) -> str:
    """Oracle: the shared fit chain computes enc(w, nsub); per-doc
    n_tok sums nsub over the doc's token multiset; then the SHARED
    seq_pack window chain (plans.northstar.seq_pack_sql_from) runs
    unchanged over the subword-denominated base."""
    prelude = ",\n".join(_fit_cte_parts(n_merges)) + ",\n"
    base = (
        "SELECT t.doc_id, t.source, CAST(SUM(e.nsub) AS BIGINT) AS n_tok "
        "FROM tok t JOIN enc e USING (w) GROUP BY t.doc_id, t.source"
    )
    return seq_pack_sql_from(base, prelude)


SEQ_PACK_SUBWORD_SQL = _seq_pack_subword_sql(BPE_MERGES)

BPE_QUERIES: list[DeclaredQuery] = [
    DeclaredQuery(
        "bpe_token_stats",
        bpe_token_stats,
        BPE_TOKEN_STATS_SQL,
        "subword (BPE) tokenization: per-source fertility audit",
        eager=True,  # the top-V collect + merge fit run at build time
    ),
    DeclaredQuery(
        "seq_pack_subword",
        seq_pack_subword,
        SEQ_PACK_SUBWORD_SQL,
        "sequence-packing audit denominated in BPE subword tokens",
        eager=True,  # shares the memoized BPE fit (collect at build)
    ),
]
