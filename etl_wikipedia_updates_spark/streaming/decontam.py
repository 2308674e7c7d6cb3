"""Ingest-time benchmark decontamination: stream-static veto in two
modes — shingle OVERLAP (the batch `contamination` rule) and, since
r16, exact-substring SPANS (the batch `span_decontam` rule: one
verbatim SPAN_W-token run vetoes; same _span_occurrences machinery,
so stream and batch agree on what a span is).

The batch `contamination` query (plans/northstar.py) audits a corpus
at rest for benchmark n-gram overlap; a training-data pipeline also
wants the INGEST form — refuse a crawled doc the moment it overlaps a
held-out evaluation set, so contaminated rows never enter the corpus
at all. Unlike near-dup ingest (streaming/neardup.py) this operator
is STATELESS per doc: the benchmark shingle set is a small static
frame built once and broadcast into every micro-batch (the
stream-static join shape), so there is no accumulating store, no
replay subtlety beyond the sink's idempotent batch dirs, and the
streamed result trivially equals the batch rule under any batching.

Rule: a doc is CONTAMINATED iff it shares >= CONTAM_MIN_SHARED
distinct shingles with any single benchmark doc (self-pairs excluded,
so a benchmark doc replayed through the stream is not vetoed by
itself). The benchmark side is df-capped on ITS OWN corpus
(shingles present in more than ``cap`` benchmark docs are
boilerplate — licence headers, prompt scaffolding — and carry no
contamination signal); the batch `contamination` query caps across
both corpora, which an ingest pass cannot know — the delta is
documented here and in the batch twin so the two stay comparable.

Dropped rows are not discarded silently: each batch appends its
(doc_id, bench_doc, shared) verdicts to a ``_contaminated``
quarantine table under the sink (same idempotent per-batch-dir layout
as the sink itself, compactable through the same SnapshotTable fold)
— the audit trail an eval-integrity review reads.

At 100 TB: the benchmark frame is tiny by definition (evaluation
sets are thousands of docs, not billions), the broadcast is a few MB,
and the per-batch cost is one shingle explode over the BATCH joined
map-side against the broadcast — no shuffle of corpus-scale data at
all beyond the per-doc aggregate of matched shingles.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery, StreamingQueryListener

from etl_wikipedia_updates_spark.operators import text as T
from etl_wikipedia_updates_spark.plans.northstar import (
    CONTAM_MIN_SHARED,
    SHINGLE_DF_CAP,
)
from etl_wikipedia_updates_spark.streaming.ingest import append_batch
from etl_wikipedia_updates_spark.streaming.neardup import _compact_store

CONTAM_DIRNAME = "_contaminated"  # _-prefixed: invisible to sink readers


def contam_store_path(sink_path: str) -> str:
    return os.path.join(sink_path, CONTAM_DIRNAME)


def compact_contam_store(
    spark: SparkSession,
    sink_path: str,
    target_files: int = 4,
    below: int | None = None,
) -> dict | None:
    """Fold the quarantine table (see neardup._compact_store)."""
    return _compact_store(
        spark, contam_store_path(sink_path), target_files, below
    )


def bench_shingles(
    bench_docs: DataFrame, cap: int = SHINGLE_DF_CAP
) -> DataFrame:
    """(lang, term, bench_doc): the benchmark corpus's distinct
    shingles, df-capped on the benchmark side (a shingle in more than
    ``cap`` bench docs is boilerplate, not signal — and would multiply
    the per-batch match join by its df). Build once per stream and
    persist: the frame is benchmark-sized, not corpus-sized."""
    sh = T.doc_shingles(bench_docs)
    w = W.partitionBy("lang", "term")
    return (
        sh.withColumn("__df", F.count("*").over(w))
        .filter(F.col("__df") <= cap)
        .drop("__df")
        .select("lang", "term", F.col("doc_id").alias("bench_doc"))
    )


def bench_spans(bench_docs: DataFrame) -> DataFrame:
    """(h, bench_doc): the benchmark corpus's distinct HOP-aligned
    SPAN_W-token span hashes with their owning doc — the static frame
    of SPAN mode (the stream-static statement of the batch
    span_decontam audit; same _span_occurrences machinery, so stream
    and batch agree on what a span is). No df cap: an exact SPAN_W-
    token verbatim run is contamination signal regardless of how many
    bench docs carry it (the shingle cap exists because single
    shingles are weak evidence; a 16-token exact run is not)."""
    from etl_wikipedia_updates_spark.plans.northstar import (
        _span_occurrences,
    )

    return (
        _span_occurrences(bench_docs)
        .select("h", F.col("doc_id").alias("bench_doc"))
        .distinct()
    )


def decontam_span_verdicts(
    docs: DataFrame, bench_sp: DataFrame, exclude_self: bool = True
) -> DataFrame:
    """(doc_id, bench_doc, shared) for every doc carrying at least ONE
    exact benchmark span — the span-mode rule (a single verbatim
    SPAN_W-token run vetoes; there is no min-shared threshold like the
    shingle rule's, matching the batch span_decontam contract of
    contam_doc > 0). ``shared`` counts matched span occurrences
    against the reported bench_doc; reporting shape (strongest match,
    ties to smallest bench_doc) and ``exclude_self`` semantics are
    identical to decontam_verdicts, so both modes share the
    quarantine-table schema."""
    from etl_wikipedia_updates_spark.plans.northstar import (
        _span_occurrences,
    )

    sp = _span_occurrences(docs).select("doc_id", "h")
    joined = sp.join(F.broadcast(bench_sp), "h")
    if exclude_self:
        joined = joined.filter(F.col("doc_id") != F.col("bench_doc"))
    counts = joined.groupBy("doc_id", "bench_doc").agg(
        F.count("*").alias("shared")
    )
    w = W.partitionBy("doc_id").orderBy(
        F.col("shared").desc(), F.col("bench_doc")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "bench_doc", "shared")
    )


def decontam_verdicts(
    docs: DataFrame, bench_sh: DataFrame, exclude_self: bool = True
) -> DataFrame:
    """(doc_id, bench_doc, shared) for every doc sharing >=
    CONTAM_MIN_SHARED distinct shingles with a benchmark doc (its
    strongest single match, ties to the smallest bench_doc — the
    same reporting rule as the batch contamination query).

    ``exclude_self`` drops (doc_id == bench_doc) pairs and is ONLY
    valid when the benchmark rows are a subset of the streamed corpus
    sharing its id universe (the in-table source-slice convention) —
    there the pair is literally the same row and vetoing it would
    empty the benchmark out of its own corpus. For an EXTERNAL
    benchmark with its own id space, pass False: an id collision
    between unrelated corpora would otherwise silently bypass the
    veto for exactly that doc."""
    sh = T.doc_shingles(docs)
    joined = sh.join(F.broadcast(bench_sh), ["lang", "term"])
    if exclude_self:
        joined = joined.filter(F.col("doc_id") != F.col("bench_doc"))
    counts = (
        joined.groupBy("doc_id", "bench_doc")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= CONTAM_MIN_SHARED)
    )
    w = W.partitionBy("doc_id").orderBy(
        F.col("shared").desc(), F.col("bench_doc")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "bench_doc", "shared")
    )


# mode name -> (static-frame builder, per-batch verdict function).
# Both modes share the stream-static join shape, the quarantine-table
# schema, and the idempotent batch-dir sink; they differ only in what
# the broadcast frame holds (df-capped shingles vs distinct exact
# span hashes) and the match rule (>= CONTAM_MIN_SHARED shingles vs
# >= 1 exact SPAN_W-token span — the batch span_decontam contract).
DECONTAM_MODES = {
    "shingles": (bench_shingles, decontam_verdicts),
    "spans": (bench_spans, decontam_span_verdicts),
}


def _mode_fns(mode: str):
    try:
        return DECONTAM_MODES[mode]
    except KeyError:
        raise ValueError(
            f"unknown decontam mode {mode!r}; "
            f"expected one of {sorted(DECONTAM_MODES)}"
        ) from None


def decontam_ingest_batch(
    batch_df: DataFrame,
    bench_sh: DataFrame,
    sink_path: str,
    batch_id: int,
    compact_every: int | None = None,
    exclude_self: bool = True,
    mode: str = "shingles",
) -> None:
    """One micro-batch of decontaminating ingest: clean rows append to
    the sink, contaminated verdicts append to the quarantine table —
    both under this batch's idempotent dir, so an at-least-once replay
    overwrites its own first attempt on both sides. ``bench_sh`` must
    be the ``mode``-matching static frame (bench_shingles output for
    'shingles', bench_spans for 'spans')."""
    spark = batch_df.sparkSession
    verdicts = _mode_fns(mode)[1](
        batch_df, bench_sh, exclude_self=exclude_self
    ).persist()
    try:
        survivors = batch_df.join(
            verdicts.select("doc_id"), "doc_id", "left_anti"
        )
        append_batch(survivors, sink_path, batch_id)
        append_batch(verdicts, contam_store_path(sink_path), batch_id)
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact_contam_store(spark, sink_path, below=batch_id)
    finally:
        verdicts.unpersist()


class _UnpersistOnTermination(StreamingQueryListener):
    """Release a stream's persisted static frame when the query ends.

    The decontam streams persist the benchmark shingle frame ONCE per
    stream (outside the per-batch handler); without a termination hook
    the cache entry outlived its stream and leaked across restarted
    curation streams in the same session. The listener unpersists on
    the owning query's termination event and deregisters itself; it is
    also invoked directly (idempotently, via the once-flag) if the
    query finished before the listener could be registered — the
    availableNow-on-tiny-data race."""

    def __init__(self, spark: SparkSession, query_id: str, df: DataFrame):
        self._spark = spark
        self._qid = query_id
        self._df = df
        self._done = False

    def release(self) -> None:
        if self._done:
            return
        self._done = True
        try:
            self._df.unpersist()
        finally:
            self._spark.streams.removeListener(self)

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        pass

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        if str(event.id) == self._qid:
            self.release()


def _release_on_termination(query: StreamingQuery, df: DataFrame) -> None:
    """Attach a termination-scoped unpersist for ``df`` to ``query``."""
    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    listener = _UnpersistOnTermination(spark, str(query.id), df)
    spark.streams.addListener(listener)
    # The query may have terminated between start() and addListener —
    # a terminated query never fires the event for late listeners, so
    # release inline (release() is idempotent against a double fire).
    if not query.isActive:
        listener.release()


def ingest_with_decontam(
    stream: DataFrame,
    bench_docs: DataFrame,
    sink_path: str,
    checkpoint: str,
    available_now: bool = True,
    compact_every: int | None = None,
    exclude_self: bool = True,
    mode: str = "shingles",
) -> StreamingQuery:
    """Streamed documents -> benchmark-decontaminated sink, with the
    contaminated verdicts quarantined beside it. ``bench_docs`` is the
    static held-out corpus; its shingle set is built and persisted
    ONCE, outside the per-batch handler, and unpersisted when the
    stream terminates (a restarted curation stream rebuilds it — no
    cache leak across streams). ``exclude_self`` as in
    decontam_verdicts: True only when bench_docs is an id-shared
    subset of the stream; False for an external benchmark.
    ``mode``: 'shingles' (overlap veto — the `contamination` rule) or
    'spans' (exact-substring veto — the `span_decontam` rule)."""
    bench_sh = _mode_fns(mode)[0](bench_docs).persist()

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        decontam_ingest_batch(
            batch_df, bench_sh, sink_path, batch_id,
            compact_every=compact_every,
            exclude_self=exclude_self,
            mode=mode,
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    _release_on_termination(query, bench_sh)
    return query


def batch_decontam_keep(
    docs: DataFrame,
    bench_docs: DataFrame,
    exclude_self: bool = True,
    mode: str = "shingles",
) -> DataFrame:
    """The BATCH statement of the streaming rule (equivalence tests
    and backfills): keep docs with no benchmark match. The operator
    is stateless per doc, so the streamed sink equals this under ANY
    batching — no arrival-order caveat needed."""
    build, verdicts_fn = _mode_fns(mode)
    drops = verdicts_fn(
        docs, build(bench_docs), exclude_self=exclude_self
    ).select("doc_id")
    return docs.join(drops, "doc_id", "left_anti")


# --- full per-doc curation: quality -> decontam -> near-dup dedup -------------
def full_curation_ingest_batch(
    batch_df: DataFrame,
    bench_sh: DataFrame,
    sink_path: str,
    batch_id: int,
    compact_every: int | None = None,
    exclude_self: bool = True,
    redact_pii: bool = False,
    temp_rates: DataFrame | None = None,
    decontam_mode: str = "shingles",
) -> None:
    """One micro-batch of the COMPLETE per-doc curation pipeline — the
    ingest-time twin of corpus_release's per-doc stages in one pass:
    (0) optional PII redaction (stateless TRANSFORM — the shared
    plans.corpus.pii_redact expression the pii_scrub audit certifies),
    (1) the Gopher-style repetition quality gate (stateless),
    (2) the benchmark veto (stateless, quarantined; ``decontam_mode``
    picks shingle-overlap or exact-span, as in ingest_with_decontam —
    ``bench_sh`` must be the matching static frame),
    (3) near-dup dedup against the accumulating bucket store,
    (4) optional temperature mixing (``temp_rates``: a STATIC
    (source, rate_ppm) frame — plans.northstar.static_temp_rates over
    a declared corpus or prior snapshot, NEVER the unbounded stream;
    membership is the shared temp_keep_cond integer rule, applied to
    the sink append only, so mix-dropped docs still shadow their later
    near-dups exactly as the release pipeline's dedup-before-mix
    order does).
    Redaction runs FIRST so every downstream signal (quality ratios,
    shingles, near-dup signatures) sees the text a release would ship.
    Stage order is the cheap-to-expensive rule: quality needs no
    state, decontam joins a tiny broadcast, and only the survivors of
    both pay the signature aggregation + store join. Corpus-global
    budget FITTING stays release-time/static — the stream only
    APPLIES precomputed thresholds. The quarantine and bucket stores
    both fold on the ``compact_every`` cadence."""
    from etl_wikipedia_updates_spark.plans.corpus import pii_redact
    from etl_wikipedia_updates_spark.plans.northstar import (
        quality_keep,
        temp_membership,
    )
    from etl_wikipedia_updates_spark.streaming.neardup import (
        dedup_ingest_batch,
    )

    spark = batch_df.sparkSession
    if redact_pii:
        batch_df = pii_redact(batch_df)
    sink_transform = (
        None
        if temp_rates is None
        else (lambda df: temp_membership(df, temp_rates))
    )
    # kept and clean are each consumed by MULTIPLE downstream actions
    # (verdicts, the quarantine write, dedup's band aggregation AND
    # its survivors append); without the persists every action
    # re-runs the quality gate's explode — the dominant per-batch
    # map cost — the same reasoning as verified_ingest_batch's dtok
    # persist.
    kept = quality_keep(batch_df).persist()
    verdicts = _mode_fns(decontam_mode)[1](
        kept, bench_sh, exclude_self=exclude_self
    ).persist()
    clean = kept.join(
        verdicts.select("doc_id"), "doc_id", "left_anti"
    ).persist()
    try:
        append_batch(verdicts, contam_store_path(sink_path), batch_id)
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact_contam_store(spark, sink_path, below=batch_id)
        dedup_ingest_batch(
            clean, sink_path, batch_id, compact_every=compact_every,
            sink_transform=sink_transform,
        )
    finally:
        clean.unpersist()
        verdicts.unpersist()
        kept.unpersist()


def ingest_with_full_curation(
    stream: DataFrame,
    bench_docs: DataFrame,
    sink_path: str,
    checkpoint: str,
    available_now: bool = True,
    compact_every: int | None = None,
    exclude_self: bool = True,
    redact_pii: bool = False,
    temp_rates: DataFrame | None = None,
    decontam_mode: str = "shingles",
) -> StreamingQuery:
    """Streamed documents -> (optionally PII-redacted,) quality-gated,
    decontaminated, near-dup-deduped, (optionally temperature-mixed)
    sink: the one-command crawl-curation ingest. ``temp_rates`` is the
    stream-static temperature model (see full_curation_ingest_batch) —
    fit it with plans.northstar.static_temp_rates over a DECLARED
    static frame. Persisted-bench (released on stream termination),
    exclude_self, and ``decontam_mode`` notes as in
    ingest_with_decontam."""
    bench_sh = _mode_fns(decontam_mode)[0](bench_docs).persist()

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        full_curation_ingest_batch(
            batch_df, bench_sh, sink_path, batch_id,
            compact_every=compact_every,
            exclude_self=exclude_self,
            redact_pii=redact_pii,
            temp_rates=temp_rates,
            decontam_mode=decontam_mode,
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    _release_on_termination(query, bench_sh)
    return query


def batch_full_curation_keep(
    docs: DataFrame,
    bench_docs: DataFrame,
    exclude_self: bool = True,
    redact_pii: bool = False,
    temp_rates: DataFrame | None = None,
    decontam_mode: str = "shingles",
) -> DataFrame:
    """The BATCH statement of the full pipeline: optional PII
    redaction, quality gate, then benchmark veto, then the
    no-smaller-id-shares-a-bucket rule over the survivors, then the
    optional temperature-membership filter against the same static
    (source, rate_ppm) frame the stream applies. Equals the streamed
    sink when the corpus replays in doc_id order (the dedup stage's
    usual arrival-order contract; redaction, the first two gates, and
    temperature membership are stateless and order-free)."""
    from etl_wikipedia_updates_spark.plans.corpus import pii_redact
    from etl_wikipedia_updates_spark.plans.northstar import (
        quality_keep,
        temp_membership,
    )
    from etl_wikipedia_updates_spark.streaming.neardup import (
        batch_neardup_keep,
    )

    if redact_pii:
        docs = pii_redact(docs)
    kept = quality_keep(docs)
    out = batch_neardup_keep(
        batch_decontam_keep(
            kept, bench_docs, exclude_self=exclude_self,
            mode=decontam_mode,
        )
    )
    if temp_rates is not None:
        out = temp_membership(out, temp_rates)
    return out
