"""etl_wikipedia_updates_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of the reference
streaming-ETL application (cdfrdmn/etl-wikipedia-updates: Wikimedia
recentchange SSE -> transform -> SQLite -> dashboard aggregates) as
idiomatic Spark, plus the relational/semi-structured/text/similarity
operator surface a 100 TB training-data pipeline needs.

Layout:
- ``session``    SparkSession factory (determinism + perf knobs)
- ``tables``     parquet table catalog over the test-data directories
- ``plans``      declared batch queries (Q1-Q28 + named north-star ops)
- ``registry``   the query registry driving __spark_entry__/tests/bench
- ``operators``  dedup / similarity / text-analysis / multimodal (north star)
- ``functions``  reusable column expressions (array math, deterministic aggs)
- ``pipeline``   wiki recentchange event transform (reference parity, W1-W5)
- ``sources``    streaming connectors: file-replay, SSE Python DataSource
- ``streaming``  Structured Streaming ingest, retention, dedup (S1-S5)
"""

__version__ = "0.1.0"
