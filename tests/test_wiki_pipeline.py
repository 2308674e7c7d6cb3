"""W1-W5: wiki pipeline conformance (SURVEY §2.3) — behavior unit tests
plus the DuckDB-oracle differential check over the embedded fixture."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from etl_wikipedia_updates_spark.oracle import compare_frames
from etl_wikipedia_updates_spark.pipeline import (
    parse_raw,
    transform,
    wiki_transform,
)
from etl_wikipedia_updates_spark.plans.wiki import (
    FIXTURE_LINES,
    WIKI_SQL,
    wiki_pipeline,
)


def _lines_df(spark):
    return spark.createDataFrame([(l,) for l in FIXTURE_LINES], "value string")


def test_w1_type_filter_and_malformed_skip(spark):
    parsed = parse_raw(_lines_df(spark))
    # 12 fixture lines, 1 malformed
    assert parsed.count() == len(FIXTURE_LINES) - 1
    out = transform(parsed)
    types = {r["raw_json"] for r in out.collect()}
    assert not any('"type": "log"' in t or '"type": "categorize"' in t for t in types)


def test_w2_defaults_for_missing_length(spark):
    out = transform(parse_raw(_lines_df(spark)))
    eps = out.filter(F.col("title") == "Epsilon").first()
    assert eps.length_bytes_old == 0 and eps.length_bytes_new == 0
    zeta = out.filter(F.col("title") == "Zeta").first()
    assert zeta.length_bytes_old == 0 and zeta.length_bytes_new == 77


def test_w3_length_diff(spark):
    out = transform(parse_raw(_lines_df(spark)))
    assert out.filter(F.col("title") == "Alpha")\
        .filter(F.col("username") == "alice")\
        .filter(F.col("length_diff_bytes") == 50).count() == 1
    iota = out.filter(F.col("title") == "Iota").first()
    assert iota.length_diff_bytes == -2


def test_w4_timestamp_parse(spark):
    out = transform(parse_raw(_lines_df(spark)))
    alpha = out.filter(F.col("username") == "alice").first()
    assert str(alpha.event_timestamp) == "2026-01-08 22:35:51"


def test_w4_validity_filter_replaces_crash(spark):
    out = transform(parse_raw(_lines_df(spark)))
    # rows missing bot (Eta) or meta.dt (Theta) are dropped, not fatal
    assert out.filter(F.col("title").isin("Eta", "Theta")).count() == 0


def test_w5_dedup_natural_key(spark):
    out = wiki_transform(_lines_df(spark))
    alpha_alice = out.filter(
        (F.col("title") == "Alpha") & (F.col("username") == "alice")
    ).collect()
    assert len(alpha_alice) == 1
    # deterministic survivor: smallest raw_json (no extra-field variant)
    assert "server_name" not in alpha_alice[0].raw_json
    # same key fields but different user is kept
    assert out.filter(F.col("username") == "alice2").count() == 1


def test_wiki_streaming_end_to_end(spark, tmp_path):
    """The reference's production path as a stream: payload lines →
    parse → transform → watermarked streaming dedup → sink, asserted
    against the batch wiki_pipeline over the same fixture. The batch
    path dedups to the min-raw_json survivor while streaming keeps
    first-arrival, so equality is checked on the natural keys plus all
    non-duplicated columns."""
    lines = _lines_df(spark).withColumn(
        "arrival", F.lit("2026-01-08 22:00:00").cast("timestamp")
    )
    replay = str(tmp_path / "replay")
    lines.coalesce(1).write.parquet(replay + "/chunk_0001")

    from etl_wikipedia_updates_spark.sources.replay import read_replay_stream
    from etl_wikipedia_updates_spark.streaming.ingest import streaming_dedup

    stream = read_replay_stream(
        spark, replay, lines.schema
    )
    transformed = transform(parse_raw(stream))
    deduped = streaming_dedup(
        transformed,
        ["event_timestamp", "username", "title"],
        "event_timestamp",
        "1 hour",
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("wiki_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (str(r.event_timestamp), r.username, r.title, r.length_diff_bytes)
        for r in spark.sql("SELECT * FROM wiki_stream").collect()
        if r.username != "alice" or r.title != "Alpha"  # dup key: survivor differs
    }
    batch = wiki_transform(_lines_df(spark))
    expected = {
        (str(r.event_timestamp), r.username, r.title, r.length_diff_bytes)
        for r in batch.collect()
        if r.username != "alice" or r.title != "Alpha"
    }
    assert got == expected
    # the duplicated natural key appears exactly once in both paths
    n_stream = spark.sql(
        "SELECT COUNT(*) n FROM wiki_stream WHERE username='alice' AND title='Alpha'"
    ).first()["n"]
    assert n_stream == 1
    assert batch.filter("username='alice' AND title='Alpha'").count() == 1


def test_wiki_pipeline_matches_duckdb_oracle(spark):
    spark_pdf = wiki_pipeline(spark, "").toPandas()
    con = duckdb.connect()
    oracle_pdf = con.sql(WIKI_SQL).df()
    res = compare_frames("wiki_pipeline", spark_pdf, oracle_pdf)
    assert res.ok, res.detail
    # 12 lines - log - categorize - malformed - Eta - Theta - 1 dedup = 6
    assert res.spark_rows == 6
