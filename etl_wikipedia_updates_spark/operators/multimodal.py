"""Multimodal columns: opaque binary payloads + Arrow-batched extraction.

Pattern: media (image/audio/video) rides in a table as an opaque
``binary`` column next to typed metadata — the same
payload-beside-typed-columns idea as the reference's raw_json column
(R21, /root/reference/pipeline.py:160,207), at media scale. Decode and
feature-extraction run as ``mapInPandas`` generators: Arrow-batched,
schema-declared, partition-parallel — the Spark-side plumbing is what
matters at 100 TB (batch shape, memory bounds, no row-at-a-time UDFs).

This container has no codec libraries, so ``decode_image`` carries its
own dependency-free decoders for the two classic uncompressed raster
formats (binary PPM and BI_RGB BMP): real header parse, real pixel
math (per-channel means), real resize (nearest-neighbor thumbnail),
and quarantine-don't-crash error rows for everything else.
``byte_features`` and ``frame_sample`` cover the generic
binary-payload plumbing (binary in -> fixed-schema Arrow batches out).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
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
        # NULL payload cells arrive as None (e.g. encode(NULL) upstream);
        # they must yield NULL features — the SQL-null semantics
        # octet_length(NULL) has — not len(None) TypeErrors that kill
        # the task. Int64 (nullable) keeps the Arrow longs exact.
        payloads = pdf["payload"]
        null = payloads.isna()
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": pd.array(
                    [None if n else len(b) for b, n in zip(payloads, null)],
                    dtype="Int64",
                ),
                "first_byte": pd.array(
                    [
                        None if n else (b[0] if len(b) else -1)
                        for b, n in zip(payloads, null)
                    ],
                    dtype="Int64",
                ),
                "last_byte": pd.array(
                    [
                        None if n else (b[-1] if len(b) else -1)
                        for b, n in zip(payloads, null)
                    ],
                    dtype="Int64",
                ),
                "n_space": pd.array(
                    [
                        None if n else b.count(b" ")
                        for b, n in zip(payloads, null)
                    ],
                    dtype="Int64",
                ),
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
            # None payloads yield NULL n_frames/frames (SQL-null
            # semantics), same contract as _byte_features_batches.
            frames = pdf["payload"].map(
                lambda b: None
                if b is None
                else [
                    bytes(b[i : i + frame_len])
                    for i in range(0, max(len(b) - frame_len + 1, 0), stride)
                ]
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": pd.array(
                        [None if f is None else len(f) for f in frames],
                        dtype="Int64",
                    ),
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


DECODE_IMAGE_SCHEMA = (
    "doc_id long, format string, width int, height int, channels int, "
    "mean_r double, mean_g double, mean_b double, "
    "thumb_w int, thumb_h int, thumbnail binary, error string"
)

_BAD = {
    "format": None, "width": None, "height": None, "channels": None,
    "mean_r": None, "mean_g": None, "mean_b": None,
    "thumb_w": None, "thumb_h": None, "thumbnail": None,
}


def _decode_ppm(buf: bytes):
    """Binary PPM (P6, maxval<=255): header tokens then raw RGB rows."""
    # header = magic, width, height, maxval as whitespace/comment-separated
    # tokens; the pixel block starts one byte after the maxval token.
    tokens, i, n = [], 2, len(buf)
    while len(tokens) < 3 and i < n:
        c = buf[i : i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            while i < n and buf[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        else:
            j = i
            while j < n and not buf[j : j + 1].isspace():
                j += 1
            tokens.append(buf[i:j])
            i = j
    if len(tokens) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    i += 1  # single whitespace byte after maxval
    need = w * h * 3
    px = np.frombuffer(buf, dtype=np.uint8, count=need, offset=i)
    return "ppm", px.reshape(h, w, 3)


def _decode_bmp(buf: bytes):
    """Uncompressed (BI_RGB) 24/32-bit BMP with BITMAPINFOHEADER."""
    if len(buf) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    w, h = struct.unpack_from("<ii", buf, 18)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    compression = struct.unpack_from("<I", buf, 30)[0]
    if hdr_size < 40 or compression != 0 or bpp not in (24, 32):
        raise ValueError("only uncompressed 24/32-bit BMP supported")
    bottom_up = h > 0
    h = abs(h)
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)
    px = rows[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    if bottom_up:
        px = px[::-1]
    # BMP stores BGR(A); reorder to RGB and drop alpha
    return "bmp", px[:, :, 2::-1]


def _thumbnail(px, thumb_max: int):
    """Nearest-neighbor downsample to fit thumb_max on the long side —
    the deterministic stand-in for a resize kernel."""
    h, w = px.shape[0], px.shape[1]
    scale = max(1, -(-max(h, w) // thumb_max))  # ceil-div, never upscales
    ys = np.arange(0, h, scale)
    xs = np.arange(0, w, scale)
    thumb = px[np.ix_(ys, xs)]
    return thumb.shape[1], thumb.shape[0], thumb.tobytes()


def _decode_one(doc_id, buf: bytes, thumb_max: int) -> dict:
    # NULL payload cells arrive as None in the pandas batch; they must
    # quarantine like any other bad media, not raise TypeError at the
    # slice below and fail the whole task.
    if buf is None:
        return {"doc_id": doc_id, **_BAD, "error": "null payload"}
    try:
        if buf[:2] == b"P6":
            fmt, px = _decode_ppm(bytes(buf))
        elif buf[:2] == b"BM":
            fmt, px = _decode_bmp(bytes(buf))
        else:
            return {"doc_id": doc_id, **_BAD, "error": "unsupported format"}
        means = px.reshape(-1, px.shape[2]).mean(axis=0)
        tw, th, tbytes = _thumbnail(px, thumb_max)
        return {
            "doc_id": doc_id,
            "format": fmt,
            "width": int(px.shape[1]),
            "height": int(px.shape[0]),
            "channels": int(px.shape[2]),
            "mean_r": float(means[0]),
            "mean_g": float(means[1]),
            "mean_b": float(means[2]),
            "thumb_w": int(tw),
            "thumb_h": int(th),
            "thumbnail": tbytes,
            "error": None,
        }
    except (ValueError, IndexError, struct.error) as exc:
        return {"doc_id": doc_id, **_BAD, "error": str(exc)}


def decode_image(with_payload: DataFrame, thumb_max: int = 8) -> DataFrame:
    """Real image decode over opaque binary payloads — no codec
    libraries needed: a dependency-free parser for binary PPM (P6) and
    uncompressed 24/32-bit BMP. Per image: dimensions, channel count,
    per-channel means (the feature-extract step), and a deterministic
    nearest-neighbor thumbnail (the resize step). Unknown or corrupt
    payloads produce an ``error`` row instead of failing the stage —
    at 100 TB a decode pipeline must quarantine bad media, not die.
    Same mapInPandas plumbing as ``byte_features``: Arrow-batched,
    schema-declared, one batch resident per task.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    _decode_one(d, p, thumb_max)
                    for d, p in zip(pdf["doc_id"], pdf["payload"])
                ]
            )

    return with_payload.select("doc_id", "payload").mapInPandas(
        gen, schema=DECODE_IMAGE_SCHEMA
    )
