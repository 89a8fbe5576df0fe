"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched Pandas UDFs (north-star
extension; the reference's only media handling is passing S3 jpeg
pointers to Textract, get_text_from_s3_image.py:59-68 — the decode itself
happens inside the managed service, exactly like our stub boundary).

Design:
- **Schema**: ``media(media_id, kind, content binary)`` plus decoded
  metadata columns. Content is opaque to Spark; only the UDFs look inside.
- **Plumbing is real, codecs are stubbed**: the container hosts no
  image/audio libraries, so real JPEG/WAV decoding raises
  ``NotImplementedError`` behind an import-try (``decode_real``), while a
  deterministic SGMM container format exercises the full binary path:
  Spark builds the bytes, Arrow ships them to pandas in columnar batches,
  Python parses them byte-level, results flow back as Arrow. Swapping the
  stub for PIL/ffmpeg changes ONE function, none of the plumbing.
- **Oracle-checkable**: the SGMM payload is ASCII (md5 hex chains), so a
  DuckDB oracle can reconstruct every derived value with pure SQL
  arithmetic — the round-trip through binary+Arrow+pandas is verified
  against SQL that never touches binary.

Scale: mapInPandas streams Arrow batches (spark.sql.execution.arrow.
maxRecordsPerBatch) — constant memory per task regardless of partition
size; media tables partition by media_id (same low-partition-scan fix as
dedup.by_doc); frame explosion is a built-in ``explode`` on a sequence,
JVM-side, so only per-frame *decode* pays the Python boundary.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"SGMM"
FEATURE_DIM = 16


# ---------------------------------------------------------------------------
# Synthetic media table (deterministic; the declared testdata mapping)
# ---------------------------------------------------------------------------

def synth_media(documents: DataFrame) -> DataFrame:
    """(media_id, kind, content) — one opaque SGMM blob per document.

    kind = image/audio/video by media_id % 3; dimensions and payload are
    pure arithmetic on media_id so the DuckDB oracle can re-derive them.
    Container layout (ASCII): ``SGMM|kind|width|height|n_frames|payload``
    with payload = md5('sgmm:'||media_id) hex repeated to payload_len.
    """
    mid = F.col("doc_id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (mid % 3 + 1).cast("int"),
    )
    width = F.when(kind == "audio", F.lit(0)).otherwise(16 + mid % 64)
    height = F.when(kind == "audio", F.lit(0)).otherwise(16 + mid % 48)
    n_frames = (
        F.when(kind == "video", 8 + mid % 24)
        .when(kind == "image", F.lit(1))
        .otherwise(F.lit(0))
    )
    payload_len = (64 + mid % 128).cast("int")
    seed = F.md5(F.concat(F.lit("sgmm:"), mid.cast("string")).cast("binary"))
    payload = F.substring(
        F.repeat(seed, F.ceil(payload_len / 32).cast("int") + 1), 1, payload_len
    )
    content = F.concat_ws(
        "|",
        F.lit("SGMM"),
        kind,
        width.cast("string"),
        height.cast("string"),
        n_frames.cast("string"),
        payload,
    ).cast("binary")
    return (
        documents.repartition(F.col("doc_id"))
        .select(mid.alias("media_id"), kind.alias("kind"), content.alias("content"))
    )


# ---------------------------------------------------------------------------
# Codec boundary (the stub)
# ---------------------------------------------------------------------------

def decode_real(content: bytes) -> dict:
    """Real-codec decode — STUB. The runtime has no image/audio libs;
    plug PIL/soundfile/av here. Marked boundary per the build contract."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real media codecs are not available in this runtime; "
            "only the SGMM container is decodable"
        ) from exc
    raise NotImplementedError("real-codec decode not wired up")


def _parse_sgmm(content) -> tuple[str, int, int, int, bytes]:
    content = bytes(content) if content is not None else None
    if content is None or not content.startswith(MAGIC):
        raise ValueError("not an SGMM container")
    _, kind, w, h, nf, payload = content.split(b"|", 5)
    return kind.decode(), int(w), int(h), int(nf), payload


# ---------------------------------------------------------------------------
# Decode / features / resize / frame-sample (Arrow-batched UDFs)
# ---------------------------------------------------------------------------

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("payload_len", IntegerType()),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """Parse the container header out of the binary column.
    mapInPandas: one Arrow batch in, one pandas frame out — no per-row
    serialization, schema declared up front."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                kind, w, h, nf, payload = _parse_sgmm(content)
                rows.append((mid, kind, w, h, nf, len(payload)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    return media.select("media_id", "content").mapInPandas(_decode, DECODED_SCHEMA)


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Deterministic feature vector from the payload bytes (stand-in for
    an embedding model; the bytes→vector batch shape is the real part).
    f_i = (int(md5(payload||':'||i)[:8], 16) % 10000) / 10000."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _, _, _, _, payload = _parse_sgmm(content)
                vec = [
                    (
                        int(
                            hashlib.md5(payload + b":" + str(i).encode()).hexdigest()[:8],
                            16,
                        )
                        % 10000
                    )
                    / 10000.0
                    for i in range(dim)
                ]
                out.append((mid, vec))
            yield pd.DataFrame(out, columns=["media_id", "features"])

    return media.select("media_id", "content").mapInPandas(_features, FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
    ]
)


def resize_media(media: DataFrame, max_w: int, max_h: int) -> DataFrame:
    """Binary-in/binary-out transform: clamp dimensions preserving aspect
    ratio, rewrite the header (payload untouched — a real resize would
    transform pixels here; same signature either way)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                kind, w, h, nf, payload = _parse_sgmm(content)
                if w > 0 and h > 0 and (w > max_w or h > max_h):
                    scale = min(max_w / w, max_h / h)
                    w, h = max(1, math.floor(w * scale)), max(1, math.floor(h * scale))
                rebuilt = b"|".join(
                    [MAGIC, kind.encode(), str(w).encode(), str(h).encode(),
                     str(nf).encode(), payload]
                )
                out.append((mid, rebuilt))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    return media.select("media_id", "content").mapInPandas(_resize, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_k: int = 4) -> DataFrame:
    """Frame sampling for videos: indices 0, k, 2k, … < n_frames.

    The index explosion is JVM-side (sequence + explode over the decoded
    header) — only (media_id, frame_idx) rows exist, no fake frame bytes
    are materialized; a real pipeline would decode ONLY the sampled frames
    in a follow-up mapInPandas, which is the point of sampling first."""
    decoded = decode_media(media)
    frames = decoded.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
        ).alias("frame_idx"),
    )
    return frames.withColumn(
        "frame_id",
        F.substring(
            F.md5(
                F.concat_ws(":", F.col("media_id"), F.col("frame_idx")).cast("binary")
            ),
            1,
            8,
        ),
    )
