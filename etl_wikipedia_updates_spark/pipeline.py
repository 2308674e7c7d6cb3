"""Wiki recentchange event transform — reference-parity batch pipeline.

Re-expresses the reference's v2 ingest transform surface (R4-R10) as one
declarative DataFrame chain:

- JSON parse + malformed-record skip  (R4,  /root/reference/pipeline.py:88-102)
- change-type filter edit/new         (R5,  pipeline.py:92)
- projection + nested flatten         (R6,  pipeline.py:104-130)
- scalar casts + 0-defaults           (R7,  pipeline.py:113-116)
- derived length_diff_bytes           (R8,  pipeline.py:116)
- ISO8601 timestamp normalization     (R9,  pipeline.py:120)
- natural-key dedup                   (R10, pipeline.py:216,173-174)
- raw-payload preservation            (R21, pipeline.py:160,207)

Declared deviations from the reference (SURVEY §1.2, FIXTURES.md A):
- missing title/title_url/user stay NULL (the reference stores the
  string 'None' via str(None));
- rows missing meta.dt or bot are *filtered out* with the malformed
  count (the reference raises and kills the event loop);
- raw_json preserves the original payload line verbatim (the reference
  re-serializes the parsed dict — same information, different spacing);
- dedup keeps the row with the smallest raw_json string per key (batch
  has no arrival order; the choice is total and deterministic, and the
  streaming path's dropDuplicatesWithinWatermark keeps first-arrival).

At scale: the whole transform is narrow (no shuffle) until dedup, which
shuffles once on the natural key; Catalyst prunes the JSON parse to the
accessed fields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_wikipedia_updates_spark.operators.dedup import exact_dedup

# Only the fields the reference reads (pipeline.py:92,113-124); unknown
# fields in the payload are ignored by from_json.
RAW_EVENT_SCHEMA = (
    "type string, title string, title_url string, user string, bot boolean, "
    "meta struct<dt:string>, length struct<old:bigint,new:bigint>"
)

CHANGE_TYPES = ("edit", "new")
DEDUP_KEY = ["event_timestamp", "username", "title"]

WIKI_EVENT_COLUMNS = [
    "raw_json",
    "event_timestamp",
    "title",
    "title_url",
    "bot",
    "username",
    "length_bytes_old",
    "length_bytes_new",
    "length_diff_bytes",
]


def parse_raw(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """R4: parse JSON payload lines and drop malformed ones (the
    reference logs and skips them, pipeline.py:96-102). PERMISSIVE mode
    yields an all-null struct for bad JSON, so detection goes through an
    explicit corrupt-record column. Keeps the original line as raw_json
    (R21)."""
    parsed = lines.select(
        F.col(value_col).alias("raw_json"),
        F.from_json(
            F.col(value_col),
            RAW_EVENT_SCHEMA + ", _corrupt string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("e"),
    )
    return parsed.filter(
        F.col("e").isNotNull() & F.col("e").getField("_corrupt").isNull()
    )


def transform(parsed: DataFrame) -> DataFrame:
    """R5-R9: filter to edit/new, flatten, default, derive, normalize.

    Validity filter stands in for the reference's crash-on-missing
    meta.dt / bot (pipeline.py:120,123): such rows are dropped, not
    fatal.
    """
    e = F.col("e")
    # R9: ISO8601 'T'/'Z' normalization exactly as the reference
    # (replace then parse), pipeline.py:120. The parse pattern is
    # PINNED: a format-less to_timestamp is more lenient than the
    # oracle's try_strptime('%Y-%m-%d %H:%M:%S') — e.g. fractional
    # seconds or utc-offset suffixes would parse here but fail there,
    # a latent engine disagreement on which rows are valid. With the
    # explicit pattern both engines reject exactly the same strings
    # (ANSI off -> NULL on mismatch, i.e. the row is dropped). The
    # reference's fromisoformat accepts fractional seconds; Wikimedia
    # dt is second-precision so the delta never binds in practice, and
    # the strict rule is applied identically on both engines.
    ts = F.to_timestamp(
        F.regexp_replace(
            F.regexp_replace(e.getField("meta").getField("dt"), "T", " "),
            "Z",
            "",
        ),
        "yyyy-MM-dd HH:mm:ss",
    )
    flat = (
        parsed.filter(e.getField("type").isin(*CHANGE_TYPES))
        # Validity = the PARSED timestamp is non-null: this drops rows
        # whose meta.dt is missing AND rows whose dt is present but
        # unparseable — the reference's fromisoformat raises on both;
        # a dt-presence check alone would let an unparseable dt through
        # as a NULL event_timestamp row (which then collapses all such
        # rows from one user+title into a single dedup group).
        .filter(ts.isNotNull() & e.getField("bot").isNotNull())
        .select(
            "raw_json",
            ts.alias("event_timestamp"),
            e.getField("title").alias("title"),
            e.getField("title_url").alias("title_url"),
            e.getField("bot").alias("bot"),
            e.getField("user").alias("username"),
            # R7: missing length.old/new default to 0 (pipeline.py:113-115)
            F.coalesce(
                e.getField("length").getField("old"), F.lit(0).cast("bigint")
            ).alias("length_bytes_old"),
            F.coalesce(
                e.getField("length").getField("new"), F.lit(0).cast("bigint")
            ).alias("length_bytes_new"),
        )
        # R8: derived column (pipeline.py:116)
        .withColumn(
            "length_diff_bytes",
            F.col("length_bytes_new") - F.col("length_bytes_old"),
        )
    )
    return flat.select(*WIKI_EVENT_COLUMNS)


def dedup(events: DataFrame) -> DataFrame:
    """R10: natural-key dedup (UNIQUE(event_timestamp, username, title),
    pipeline.py:216) with a deterministic survivor."""
    return exact_dedup(events, DEDUP_KEY, order_by=["raw_json"])


def wiki_transform(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """The full batch pipeline: parse -> transform -> dedup."""
    return dedup(transform(parse_raw(lines, value_col)))
