"""Multimodal columns: opaque binary payloads + Arrow-batched extraction.

Pattern: media (image/audio/video) rides in a table as an opaque
``binary`` column next to typed metadata — the same
payload-beside-typed-columns idea as the reference's raw_json column
(R21, /root/reference/pipeline.py:160,207), at media scale. Decode and
feature-extraction run as ``mapInPandas`` generators: Arrow-batched,
schema-declared, partition-parallel — the Spark-side plumbing is what
matters at 100 TB (batch shape, memory bounds, no row-at-a-time UDFs).

This container has no image/audio codecs, so ``decode_image`` is an
explicit stub (raises NotImplementedError) and ``byte_features`` is the
real, tested path: a deterministic feature extractor over raw bytes
that exercises identical plumbing (binary in -> fixed-schema Arrow
batches out).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BYTE_FEATURE_SCHEMA = (
    "doc_id long, byte_len long, first_byte long, last_byte long, n_space long"
)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column (UTF-8 payload of the text).

    Stands in for an image/audio blob: downstream operators treat it as
    bytes + metadata only.
    """
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def _byte_features_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Per-Arrow-batch feature extraction over raw bytes.

    Pure-Python byte math stands in for a decoder; the batch loop,
    schema contract, and memory profile (one Arrow batch resident at a
    time) are exactly what a real decode/resize/frame-sample UDF uses.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": payloads.map(len),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                "last_byte": payloads.map(lambda b: b[-1] if len(b) else -1),
                "n_space": payloads.map(lambda b: b.count(b" ")),
            }
        )


def byte_features(with_payload: DataFrame) -> DataFrame:
    """(doc_id, byte_len, first_byte, last_byte, n_space) via mapInPandas."""
    return with_payload.select("doc_id", "payload").mapInPandas(
        _byte_features_batches, schema=BYTE_FEATURE_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = "doc_id long, n_frames long, frames array<binary>"


def _frame_sample_batches(
    frame_len: int, stride: int
) -> "callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]":
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = pdf["payload"].map(
                lambda b: [
                    bytes(b[i : i + frame_len])
                    for i in range(0, max(len(b) - frame_len + 1, 0), stride)
                ]
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": frames.map(len),
                    "frames": frames,
                }
            )

    return gen


def frame_sample(
    with_payload: DataFrame, frame_len: int = 16, stride: int = 64
) -> DataFrame:
    """Deterministic every-Nth-frame sampling over a binary payload —
    the video-frame-sample plumbing (fixed-size windows at a stride)
    with a *nested* Arrow schema (array<binary> per row), the batch
    shape a real codec-backed sampler produces. Decode itself stays
    stubbed (decode_image below); the sampler is real and tested.
    """
    return with_payload.select("doc_id", "payload").mapInPandas(
        _frame_sample_batches(frame_len, stride), schema=FRAME_SAMPLE_SCHEMA
    )


def decode_image(with_payload: DataFrame) -> DataFrame:
    """STUB — image decode (no codec libraries in this container).

    The real operator is shaped exactly like ``byte_features``: a
    mapInPandas generator decoding each payload to (height, width,
    channels, thumbnail binary) with a declared schema. Raises until a
    codec (e.g. pillow) is importable.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires an image codec library (not in this "
            "container); byte_features demonstrates the identical "
            "mapInPandas plumbing"
        ) from exc
    raise NotImplementedError("codec present but decoder intentionally stubbed")
