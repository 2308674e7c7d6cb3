"""Materialize the corpus_release output as a versioned dataset.

``plans.northstar.corpus_release`` computes the release AUDIT CARD;
this module writes the release ITSELF: the surviving documents (full
rows, split column attached), published through ``SnapshotTable`` so a
training run reads an immutable, pinnable version while the next
release publishes — the same no-missing-instant contract the streaming
sinks use. The audit card rides along as the version's metadata, so a
release and its numbers are always published together.

Layout: hive-partitioned by ``split`` inside the version dir
(``v{N}/split=train/``) — a training job reads only its split's files
(partition pruning); at 100 TB add ``source`` to ``partition_by`` if
per-source scheduling matters. The reference has no release concept
(it appends to one SQLite table); this is the batch counterpart of the
R11-R14 sink contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_wikipedia_updates_spark.plans.northstar import (
    release_audit,
    release_members,
)
from etl_wikipedia_updates_spark.streaming.snapshot import SnapshotTable
from etl_wikipedia_updates_spark.tables import load_table


def release_corpus(
    spark: SparkSession, sf_dir: str, members: DataFrame | None = None
) -> DataFrame:
    """The released corpus as a DataFrame: every surviving document's
    full row plus its ``split``. The join key is the unique doc_id, so
    this is one co-partitionable shuffle join against the member set —
    no broadcast assumption (at web scale the member set is
    corpus-sized)."""
    docs = load_table(spark, sf_dir, "documents")
    if members is None:
        members = release_members(spark, sf_dir)
    return docs.join(members.select("doc_id", "split"), "doc_id")


def write_release(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    keep_last: int = 2,
) -> dict:
    """Publish one release version: data partitioned by split, audit
    card in the version metadata, old versions vacuumed to a horizon.

    The member set — the expensive part (shingle-Jaccard pairs +
    connected components + repetition signals) — is computed ONCE and
    persisted across its two consumers (the audit aggregation and the
    corpus join), then released; without the persist each action
    re-runs the whole pipeline.

    Returns {"version": N, "audit": [card rows as dicts]}.
    """
    table = SnapshotTable(out_root)
    members = release_members(spark, sf_dir).persist()
    try:
        audit = [r.asDict() for r in release_audit(members).collect()]
        version = table.publish(
            release_corpus(spark, sf_dir, members=members),
            meta={"sf_dir": sf_dir, "audit": audit},
            partition_by=["split"],
        )
    finally:
        members.unpersist()
    table.vacuum(keep_last=keep_last)
    return {"version": version, "audit": audit}
