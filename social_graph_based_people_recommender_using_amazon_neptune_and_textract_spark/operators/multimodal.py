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


# ---------------------------------------------------------------------------
# Image perceptual-hash near-dup (dHash/aHash + banded Hamming pairs)
# ---------------------------------------------------------------------------
# The first image operator of a LAION-style pipeline: re-encodes/crops of
# the same picture survive exact-byte dedup, so images are fingerprinted
# perceptually (difference hash over a downsampled grayscale grid) and
# paired by banded Hamming distance — the identical serving shape as the
# text tier's SimHash (dedup.py simhash_pairs), scaled from 32 to 64 bits.
#
# Pixel model: the SGMM "image" is the w×h grayscale grid
# pixel(r, c) = ascii(payload[(r·w + c) mod payload_len]) — the
# deterministic stand-in for real pixel decode (swap _parse_sgmm +
# this indexing for PIL and NOTHING downstream changes); the DuckDB
# oracle re-derives every sampled pixel with pure SQL arithmetic.

#: media_id offset for synthetic "re-encode" variants — far above any
#: doc_id at every test scale, so base and variant ids never collide.
MEDIA_VARIANT_OFFSET = 1_000_000_000

#: Every PERTURB_EVERY-th payload byte of a variant is shifted +1 — the
#: deterministic stand-in for re-encode noise: sparse, tiny-amplitude
#: pixel perturbation that leaves most dHash comparisons (strict
#: inequalities between hex-char codes) unflipped.
PERTURB_EVERY = 17

#: Hamming threshold for a near-dup pair. MUST stay < the 8 byte-blocks
#: of the 64-bit hash: if two hashes differ in at most 7 bits, at most 7
#: blocks contain a differing bit, so at least one block is equal and the
#: banded join finds the pair — candidate generation is EXACT (zero
#: false negatives), which is what lets the all-pairs DuckDB twin
#: hash-match the banded plan.
PHASH_MAX_HAMMING = 7


def synth_media_variants(documents: DataFrame) -> DataFrame:
    """Synthetic re-encoded copies: every EVEN image doc spawns one
    variant — same container dims, payload perturbed (+1 on every
    PERTURB_EVERY-th byte), media_id offset by MEDIA_VARIANT_OFFSET.
    The same augmentation device as similarity.aug_embeddings: the
    uniform-random synthetic corpus has no natural near-dups, so the
    dedup operator needs planted ones to have anything to find."""
    d = documents.filter(
        (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 2 == 0)
    )
    mid = F.col("doc_id")
    payload_len = (64 + mid % 128).cast("int")
    seed = F.md5(F.concat(F.lit("sgmm:"), mid.cast("string")).cast("binary"))
    payload = F.substring(
        F.repeat(seed, F.ceil(payload_len / 32).cast("int") + 1), 1, payload_len
    )
    perturbed = F.expr(
        "concat_ws('', transform(sequence(0, length(p) - 1), "
        f"i -> char(ascii(substring(p, i + 1, 1)) "
        f"+ IF(i % {PERTURB_EVERY} = 0, 1, 0))))"
    )
    content = F.concat_ws(
        "|",
        F.lit("SGMM"),
        F.lit("image"),
        (16 + mid % 64).cast("string"),
        (16 + mid % 48).cast("string"),
        F.lit("1"),
        F.col("pp"),
    ).cast("binary")
    return (
        d.select(mid.alias("doc_id"), payload.alias("p"))
        .withColumn("pp", perturbed)
        .select(
            (F.col("doc_id") + MEDIA_VARIANT_OFFSET).alias("media_id"),
            F.lit("image").alias("kind"),
            content.alias("content"),
        )
    )


def synth_media_aug(documents: DataFrame) -> DataFrame:
    """Base media table ∪ image re-encode variants ∪ video re-encode
    variants — the perceptual-dedup corpus (image queries filter
    kind='image', video queries kind='video'; the union changes
    neither side's rows)."""
    return (
        synth_media(documents)
        .unionAll(synth_media_variants(documents))
        .unionAll(synth_video_variants(documents))
    )


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("dhash", LongType()),
        StructField("ahash", LongType()),
    ]
)


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def image_phash(media: DataFrame) -> DataFrame:
    """(media_id, dhash, ahash) for image rows — PINNED per corpus (the
    persistent fingerprint index, same serving model as the SimHash
    table: production pHash systems store fingerprints at ingest and
    never re-decode).

    dHash: nearest-neighbor downsample to an 8×9 grid
    g[r][c] = pixel(⌊r·h/8⌋, ⌊c·w/9⌋); bit r·8+c set iff
    g[r][c+1] > g[r][c] (row-wise gradient sign — invariant to uniform
    brightness shift, robust to sparse noise). aHash: 8×8 grid, bit set
    iff 64·g[r][c] > Σg (strictly above the mean, integer form — no
    float division, so both engines agree bit-for-bit).

    The kind filter runs JVM-side BEFORE the Arrow boundary (column
    pruning + predicate pushdown keep non-image bytes out of the Python
    transfer entirely); the per-image work is the declared codec
    boundary — real pHash is pixel-level Python/PIL work too."""
    from ..pinned import pinned

    (fps,) = pinned(
        ("image_phash", media.semanticHash()),
        lambda: (_image_phash_build(media),),
    )
    return fps


def _image_phash_build(media: DataFrame) -> DataFrame:
    def _ph(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _, w, h, _, payload = _parse_sgmm(content)
                plen = len(payload)

                def px(r: int, c: int) -> int:
                    return payload[(r * w + c) % plen]

                dh = 0
                for r in range(8):
                    rr = (r * h) // 8
                    g = [px(rr, (c * w) // 9) for c in range(9)]
                    for c in range(8):
                        if g[c + 1] > g[c]:
                            dh |= 1 << (r * 8 + c)
                ga = [
                    [px((r * h) // 8, (c * w) // 8) for c in range(8)]
                    for r in range(8)
                ]
                s = sum(sum(row) for row in ga)
                ah = 0
                for r in range(8):
                    for c in range(8):
                        if 64 * ga[r][c] > s:
                            ah |= 1 << (r * 8 + c)
                out.append((int(mid), _signed64(dh), _signed64(ah)))
            yield pd.DataFrame(
                out, columns=["media_id", "dhash", "ahash"]
            ).astype({"media_id": "int64", "dhash": "int64", "ahash": "int64"})

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "content")
        .mapInPandas(_ph, PHASH_SCHEMA)
    )


def phash_pairs(
    media: DataFrame, max_hamming: int = PHASH_MAX_HAMMING
) -> DataFrame:
    """Near-dup image pairs: block on the 8 dHash bytes (each image
    emits 8 (block, byte) keys; a pair within max_hamming < 8 shares at
    least one — the pigeonhole that makes candidate generation exact),
    verify exact Hamming on candidates. Returns
    (media_a, media_b, hamming).

    Scale: never all-pairs — candidates are bounded by per-(block,byte)
    bucket sizes (256 values per block spread uniformly under any
    non-degenerate hash), the same guarantee as simhash_pairs; the
    arithmetic is bit_count/xor, JVM whole-stage codegen."""
    fps = image_phash(media)
    blocked = fps.select(
        "media_id",
        "dhash",
        F.expr(
            "stack(8, "
            + ", ".join(
                f"{i}, CAST(shiftright(dhash, {8 * i}) & 255 AS INT)"
                for i in range(8)
            )
            + ") as (blk, byte)"
        ),
    )
    a = blocked.select(
        F.col("media_id").alias("media_a"), F.col("dhash").alias("fa"),
        "blk", "byte",
    )
    b = blocked.select(
        F.col("media_id").alias("media_b"), F.col("dhash").alias("fb"),
        "blk", "byte",
    )
    cands = (
        a.join(b, ["blk", "byte"])
        .filter(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", "fa", "fb")
        .distinct()
    )
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).cast("int")
    return (
        cands.select("media_a", "media_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def media_dup_clusters(media: DataFrame) -> DataFrame:
    """(media_id, cluster_id, is_canonical) — connected components of
    the pHash pair graph, labels = min media_id per component (so the
    base image, whose id is below every variant's offset id, is always
    the canonical survivor). Same output contract as the text tier's
    dedup_clusters; the closure is the shared adaptive union-find /
    pointer-jumping operator (components.py), pinned per pair graph."""
    from .components import pinned_connected_components

    pairs = pinned_phash_pairs(media)
    cc = pinned_connected_components(pairs, a_col="media_a", b_col="media_b")
    return cc.select(
        F.col("node").alias("media_id"),
        F.col("label").alias("cluster_id"),
        (F.col("label") == F.col("node")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# Image curation gates (the media manifest's inputs)
# ---------------------------------------------------------------------------

#: Aspect-ratio gate: keep iff max(w,h) <= 2*min(w,h) — the LAION-style
#: extreme-aspect filter, pure integer arithmetic (no float compare).
ASPECT_MAX_RATIO = 2

#: Feature-score gate floor. The score is the mean of the 16 extracted
#: features (the declared stand-in for an aesthetic/NSFW scorer — the
#: gate SHAPE is the real part: threshold on a per-image model output).
FEATURE_SCORE_MIN = 0.45


def image_quality_stats(media: DataFrame) -> DataFrame:
    """(media_id, width, height, n_bytes, score) for image rows —
    pinned per corpus (the text tier's ``text_gate_stats`` pattern:
    decode + feature scoring run ONCE per corpus; thresholds stay OUT
    of the pin so every gate combination reuses it). score = mean of
    the 16 features, rounded 6dp (the fold order and the /16 are
    mirrored in the oracle)."""
    from ..pinned import pinned

    def _build():
        imgs = media.filter(F.col("kind") == "image")
        decoded = decode_media(imgs).select(
            "media_id", "width", "height",
            F.col("payload_len").cast("long").alias("n_bytes"),
        )
        feats = extract_features(imgs)
        score = F.round(
            F.aggregate(
                F.col("features"), F.lit(0.0), lambda acc, x: acc + x
            )
            / F.lit(16.0),
            6,
        )
        return (
            decoded.join(
                feats.select("media_id", score.alias("score")), "media_id"
            ),
        )

    (stats,) = pinned(
        ("image_quality_stats", media.semanticHash()), _build
    )
    return stats


# ---------------------------------------------------------------------------
# Video near-dup: frame-sampled perceptual hashes
# ---------------------------------------------------------------------------
# The video pipeline's first dedup operator (the image tier's pHash
# lifted one modality): sample frames on the fixed grid, fingerprint
# each sampled frame, and call two videos near-duplicates when enough
# ALIGNED frame positions match within the Hamming threshold — the
# temporal-alignment form (a re-encode preserves the timeline; clip
# detection would drop the frame_idx equality and is a declared
# non-goal here).
#
# Frame pixel model: frame f of an SGMM video is the w×h grid
# pixel(r, c) = ascii(payload[(f·1009 + r·w + c) mod plen]) — the
# f·1009 offset de-correlates frames; swap _parse_sgmm + this indexing
# for a real frame decoder and nothing downstream changes.

#: Sampled-frame stride for fingerprinting (matches sample_frames'
#: default — fingerprint exactly the frames a pipeline would decode).
VIDEO_PHASH_EVERY = 4

#: Aligned positions that must match within PHASH_MAX_HAMMING for a
#: video pair. The shortest synthetic video (8 frames) samples 2
#: positions, so 2 = "every sampled frame of the shorter video".
VIDEO_MIN_SHARED = 2

#: Hamming threshold for the UNALIGNED matchers (clip/audio). Their
#: banding drops the alignment key, so bucket hotness is the hazard:
#: gradient-sign hashes are byte-biased (adjacent-sample comparisons
#: alternate, concentrating whole bytes on 0xAA/0x55 — measured 2.2%
#: of all rows in ONE (blk, byte) bucket at sf1, an O(hot²) candidate
#: blowup). They therefore band on 4 SIXTEEN-bit blocks, whose hot
#: patterns are the square of the byte frequencies (~0.05%), and the
#: threshold drops to 3 < 4 blocks to keep candidate generation exact
#: by the same pigeonhole. Copies survive: trims match at Hamming 0
#: and re-encode noise flips ≈1.6 bits/window, so ≥ min_shared
#: positions within 3 remain overwhelmingly likely.
UNALIGNED_MAX_HAMMING = 3


def synth_video_variants(documents: DataFrame) -> DataFrame:
    """Re-encoded video copies: every EVEN video doc spawns one variant
    — same dims and frame count, payload perturbed (+1 every
    PERTURB_EVERY-th byte, the image-variant device), media_id offset
    by MEDIA_VARIANT_OFFSET."""
    d = documents.filter(
        (F.col("doc_id") % 3 == 2) & (F.col("doc_id") % 2 == 0)
    )
    mid = F.col("doc_id")
    payload_len = (64 + mid % 128).cast("int")
    seed = F.md5(F.concat(F.lit("sgmm:"), mid.cast("string")).cast("binary"))
    payload = F.substring(
        F.repeat(seed, F.ceil(payload_len / 32).cast("int") + 1), 1, payload_len
    )
    perturbed = F.expr(
        "concat_ws('', transform(sequence(0, length(p) - 1), "
        f"i -> char(ascii(substring(p, i + 1, 1)) "
        f"+ IF(i % {PERTURB_EVERY} = 0, 1, 0))))"
    )
    content = F.concat_ws(
        "|",
        F.lit("SGMM"),
        F.lit("video"),
        (16 + mid % 64).cast("string"),
        (16 + mid % 48).cast("string"),
        (8 + mid % 24).cast("string"),
        F.col("pp"),
    ).cast("binary")
    return (
        d.select(mid.alias("doc_id"), payload.alias("p"))
        .withColumn("pp", perturbed)
        .select(
            (F.col("doc_id") + MEDIA_VARIANT_OFFSET).alias("media_id"),
            F.lit("video").alias("kind"),
            content.alias("content"),
        )
    )


FRAME_PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("dhash", LongType()),
    ]
)


def video_frame_phash(media: DataFrame) -> DataFrame:
    """(media_id, frame_idx, dhash) for every sampled frame of every
    video — PINNED per corpus (the video fingerprint index; frames are
    decoded and hashed once, at ingest). Same dHash as ``image_phash``
    over the frame's pixel grid."""
    from ..pinned import pinned

    (fps,) = pinned(
        ("video_frame_phash", media.semanticHash()),
        lambda: (_video_frame_phash_build(media),),
    )
    return fps


def _video_frame_phash_build(media: DataFrame) -> DataFrame:
    def _ph(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _, w, h, nf, payload = _parse_sgmm(content)
                plen = len(payload)
                for f in range(0, nf, VIDEO_PHASH_EVERY):
                    base_off = f * 1009

                    def px(r: int, c: int) -> int:
                        return payload[(base_off + r * w + c) % plen]

                    dh = 0
                    for r in range(8):
                        rr = (r * h) // 8
                        g = [px(rr, (c * w) // 9) for c in range(9)]
                        for c in range(8):
                            if g[c + 1] > g[c]:
                                dh |= 1 << (r * 8 + c)
                    out.append((int(mid), int(f), _signed64(dh)))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "dhash"]
            ).astype(
                {"media_id": "int64", "frame_idx": "int32", "dhash": "int64"}
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "content")
        .mapInPandas(_ph, FRAME_PHASH_SCHEMA)
    )


def video_dup_pairs(
    media: DataFrame,
    max_hamming: int = PHASH_MAX_HAMMING,
    min_shared: int = VIDEO_MIN_SHARED,
) -> DataFrame:
    """Near-dup video pairs: per aligned frame position, candidates
    come from the 8-byte-block banding of the frame hash (exact by the
    image tier's pigeonhole — threshold < 8 blocks); a pair survives
    when ≥ min_shared positions match within max_hamming. Returns
    (media_a, media_b, n_matched).

    Scale: banding keys are (frame_idx, blk, byte) — candidates are
    bounded per bucket AND per aligned position, never all-pairs
    across videos or across time; the match count is one keyed
    aggregate over the verified position matches."""
    fps = video_frame_phash(media)
    blocked = fps.select(
        "media_id",
        "frame_idx",
        "dhash",
        F.expr(
            "stack(8, "
            + ", ".join(
                f"{i}, CAST(shiftright(dhash, {8 * i}) & 255 AS INT)"
                for i in range(8)
            )
            + ") as (blk, byte)"
        ),
    )
    a = blocked.select(
        F.col("media_id").alias("media_a"), "frame_idx",
        F.col("dhash").alias("fa"), "blk", "byte",
    )
    b = blocked.select(
        F.col("media_id").alias("media_b"), "frame_idx",
        F.col("dhash").alias("fb"), "blk", "byte",
    )
    cands = (
        a.join(b, ["frame_idx", "blk", "byte"])
        .filter(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", "frame_idx", "fa", "fb")
        .distinct()
    )
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).cast("int")
    matched = cands.select(
        "media_a", "media_b", "frame_idx", ham.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
    return (
        matched.groupBy("media_a", "media_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_matched"))
        .filter(F.col("n_matched") >= min_shared)
    )


#: media_id offset for synthetic CLIP copies (trimmed re-uploads) —
#: disjoint from the re-encode variant range.
MEDIA_CLIP_OFFSET = 2_000_000_000

#: Frames trimmed off the front of a planted clip.
CLIP_TRIM_FRAMES = 4


def synth_video_clips(documents: DataFrame) -> DataFrame:
    """Trimmed re-uploads: every ODD video doc spawns a clip that
    starts CLIP_TRIM_FRAMES in — frame f' of the clip shows frame
    f'+4 of the original. Under the frame pixel model
    pixel(f) = payload[(f·1009 + x) mod plen], trimming IS a payload
    rotation by (4·1009) mod plen — the clip's container carries the
    rotated payload and nf−4 frames, so its rendered frames are
    bit-identical to the original's frames 4.. (the property the clip
    detector exploits: exact frame-hash matches at one consistent
    offset)."""
    d = documents.filter(
        (F.col("doc_id") % 3 == 2) & (F.col("doc_id") % 2 == 1)
    )
    mid = F.col("doc_id")
    payload_len = (64 + mid % 128).cast("int")
    seed = F.md5(F.concat(F.lit("sgmm:"), mid.cast("string")).cast("binary"))
    payload = F.substring(
        F.repeat(seed, F.ceil(payload_len / 32).cast("int") + 1), 1, payload_len
    )
    shift = (F.lit(CLIP_TRIM_FRAMES * 1009) % F.length(F.col("p"))).cast(
        "int"
    )
    rotated = F.concat(
        F.expr("substring(p, s + 1)"), F.expr("substring(p, 1, s)")
    )
    content = F.concat_ws(
        "|",
        F.lit("SGMM"),
        F.lit("video"),
        (16 + mid % 64).cast("string"),
        (16 + mid % 48).cast("string"),
        (8 + mid % 24 - CLIP_TRIM_FRAMES).cast("string"),
        F.col("pp"),
    ).cast("binary")
    return (
        d.select(mid.alias("doc_id"), payload.alias("p"))
        .withColumn("s", shift)
        .withColumn("pp", rotated)
        .select(
            (F.col("doc_id") + MEDIA_CLIP_OFFSET).alias("media_id"),
            F.lit("video").alias("kind"),
            content.alias("content"),
        )
    )


def synth_media_clip_aug(documents: DataFrame) -> DataFrame:
    """The clip-detection corpus: variant-augmented media ∪ trimmed
    clips."""
    return synth_media_aug(documents).unionAll(synth_video_clips(documents))


def _banded16(fps, hash_col: str, carry: list[str]):
    """4 sixteen-bit block keys per fingerprint — the unaligned
    matchers' banding (see UNALIGNED_MAX_HAMMING)."""
    return fps.select(
        *carry,
        hash_col,
        F.expr(
            "stack(4, "
            + ", ".join(
                f"{i}, CAST(shiftright({hash_col}, {16 * i}) & 65535 AS INT)"
                for i in range(4)
            )
            + ") as (blk, hword)"
        ),
    )


def video_clip_pairs(
    media: DataFrame,
    max_hamming: int = UNALIGNED_MAX_HAMMING,
    min_shared: int = VIDEO_MIN_SHARED,
) -> DataFrame:
    """UNALIGNED video copy detection — the clip/trim sibling of
    ``video_dup_pairs``: frame matches may sit at ANY temporal offset,
    but a real copy's matches share ONE offset (a trimmed or shifted
    re-upload slides the whole timeline); random cross-video frame
    collisions scatter across offsets and die at the count threshold.
    Returns (media_a, media_b, frame_offset, n_matched) with
    n_matched ≥ min_shared matches at that exact offset.

    Scale: banding on (blk, byte) alone — candidates are bounded per
    hash-byte bucket (the frame-fingerprint table's selectivity), and
    the offset consistency check is arithmetic inside one keyed
    aggregate; still never all-pairs across videos or frames."""
    fps = video_frame_phash(media)
    blocked = _banded16(fps, "dhash", ["media_id", "frame_idx"])
    a = blocked.select(
        F.col("media_id").alias("media_a"),
        F.col("frame_idx").alias("fa"),
        F.col("dhash").alias("ha"),
        "blk",
        "hword",
    )
    b = blocked.select(
        F.col("media_id").alias("media_b"),
        F.col("frame_idx").alias("fb"),
        F.col("dhash").alias("hb"),
        "blk",
        "hword",
    )
    cands = (
        a.join(b, ["blk", "hword"])
        .filter(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", "fa", "fb", "ha", "hb")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int")
    matched = cands.select(
        "media_a",
        "media_b",
        (F.col("fb") - F.col("fa")).cast("long").alias("frame_offset"),
        ham.alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
    return (
        matched.groupBy("media_a", "media_b", "frame_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_matched"))
        .filter(F.col("n_matched") >= min_shared)
    )


# ---------------------------------------------------------------------------
# Audio near-dup: windowed fingerprints (the modality triple's third leg)
# ---------------------------------------------------------------------------
# Shazam/Chromaprint shape, honest stand-in: the audio stream is the
# periodic sample sequence s[t] = ascii(payload[t mod plen]); each
# fingerprint window w covers the 8×9 sample patch starting at
# w·AUDIO_HOP (g[r][c] = s[w·HOP + r·9 + c]) and hashes gradient signs
# — the same 64-bit packing as the image/video tiers, applied to a
# time×offset patch instead of a pixel grid. Window count (duration)
# is carried IN the container's frame field, read like a real
# decoder reads duration — the fingerprinter never inspects ids.
# Copies pair by offset-consistent window matches (audio re-uploads
# are routinely trimmed, so the unaligned form is the default).

#: Sample stride between fingerprint windows.
AUDIO_HOP = 17

#: Windows trimmed off a planted audio clip.
AUDIO_CLIP_TRIM = 3


def synth_audio_corpus(documents: DataFrame) -> DataFrame:
    """The audio-dedup corpus: every audio doc (doc_id % 3 == 1) as a
    container whose frame field carries the WINDOW COUNT
    (6 + doc_id % 10); even audio docs add a re-encode variant
    (payload +1 every PERTURB_EVERY-th byte, +MEDIA_VARIANT_OFFSET);
    odd audio docs add a trimmed clip (payload rotated by
    AUDIO_CLIP_TRIM·AUDIO_HOP mod plen, 3 fewer windows,
    +MEDIA_CLIP_OFFSET) — trimming IS a rotation under the periodic
    sample model, exactly the video-clip device."""
    base_docs = documents.filter(F.col("doc_id") % 3 == 1)
    mid = F.col("doc_id")
    payload_len = (64 + mid % 128).cast("int")
    seed = F.md5(F.concat(F.lit("sgmm:"), mid.cast("string")).cast("binary"))
    payload = F.substring(
        F.repeat(seed, F.ceil(payload_len / 32).cast("int") + 1), 1, payload_len
    )
    n_win = (6 + mid % 10).cast("int")

    def content(nwin_col, payload_col):
        return F.concat_ws(
            "|",
            F.lit("SGMM"),
            F.lit("audio"),
            F.lit("0"),
            F.lit("0"),
            nwin_col.cast("string"),
            payload_col,
        ).cast("binary")

    base = base_docs.select(
        mid.alias("media_id"),
        F.lit("audio").alias("kind"),
        content(n_win, payload).alias("content"),
    )
    perturbed = F.expr(
        "concat_ws('', transform(sequence(0, length(p) - 1), "
        f"i -> char(ascii(substring(p, i + 1, 1)) "
        f"+ IF(i % {PERTURB_EVERY} = 0, 1, 0))))"
    )
    variants = (
        base_docs.filter(mid % 2 == 0)
        .select(mid.alias("doc_id"), payload.alias("p"))
        .withColumn("pp", perturbed)
        .select(
            (F.col("doc_id") + MEDIA_VARIANT_OFFSET).alias("media_id"),
            F.lit("audio").alias("kind"),
            content(
                (6 + F.col("doc_id") % 10).cast("int"), F.col("pp")
            ).alias("content"),
        )
    )
    shift = (
        F.lit(AUDIO_CLIP_TRIM * AUDIO_HOP) % F.length(F.col("p"))
    ).cast("int")
    rotated = F.concat(
        F.expr("substring(p, s + 1)"), F.expr("substring(p, 1, s)")
    )
    clips = (
        base_docs.filter(mid % 2 == 1)
        .select(mid.alias("doc_id"), payload.alias("p"))
        .withColumn("s", shift)
        .withColumn("pp", rotated)
        .select(
            (F.col("doc_id") + MEDIA_CLIP_OFFSET).alias("media_id"),
            F.lit("audio").alias("kind"),
            content(
                (6 + F.col("doc_id") % 10 - AUDIO_CLIP_TRIM).cast("int"),
                F.col("pp"),
            ).alias("content"),
        )
    )
    return base.unionAll(variants).unionAll(clips)


AUDIO_HASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("window_idx", IntegerType()),
        StructField("whash", LongType()),
    ]
)


def audio_window_hash(media: DataFrame) -> DataFrame:
    """(media_id, window_idx, whash) for every fingerprint window of
    every audio row — PINNED per corpus (the audio fingerprint index;
    bytes decode once at ingest)."""
    from ..pinned import pinned

    (fps,) = pinned(
        ("audio_window_hash", media.semanticHash()),
        lambda: (_audio_window_hash_build(media),),
    )
    return fps


def _audio_window_hash_build(media: DataFrame) -> DataFrame:
    def _ph(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _, _, _, n_win, payload = _parse_sgmm(content)
                plen = len(payload)
                for w0 in range(n_win):
                    base_off = w0 * AUDIO_HOP

                    def s(r: int, c: int) -> int:
                        return payload[(base_off + r * 9 + c) % plen]

                    dh = 0
                    for r in range(8):
                        g = [s(r, c) for c in range(9)]
                        for c in range(8):
                            if g[c + 1] > g[c]:
                                dh |= 1 << (r * 8 + c)
                    out.append((int(mid), int(w0), _signed64(dh)))
            yield pd.DataFrame(
                out, columns=["media_id", "window_idx", "whash"]
            ).astype(
                {"media_id": "int64", "window_idx": "int32", "whash": "int64"}
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "content")
        .mapInPandas(_ph, AUDIO_HASH_SCHEMA)
    )


def audio_dup_pairs(
    media: DataFrame,
    max_hamming: int = UNALIGNED_MAX_HAMMING,
    min_shared: int = VIDEO_MIN_SHARED,
) -> DataFrame:
    """Audio copy detection, offset-consistent (the clip form is the
    DEFAULT for audio — re-uploads are routinely trimmed): banded
    window-hash matches at any offset, grouped by
    (pair, window_offset), pair survives at ≥ min_shared matches on
    one offset. Returns (media_a, media_b, window_offset, n_matched)."""
    fps = audio_window_hash(media)
    blocked = _banded16(fps, "whash", ["media_id", "window_idx"])
    a = blocked.select(
        F.col("media_id").alias("media_a"),
        F.col("window_idx").alias("wa"),
        F.col("whash").alias("ha"),
        "blk",
        "hword",
    )
    b = blocked.select(
        F.col("media_id").alias("media_b"),
        F.col("window_idx").alias("wb"),
        F.col("whash").alias("hb"),
        "blk",
        "hword",
    )
    cands = (
        a.join(b, ["blk", "hword"])
        .filter(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", "wa", "wb", "ha", "hb")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int")
    matched = cands.select(
        "media_a",
        "media_b",
        (F.col("wb") - F.col("wa")).cast("long").alias("window_offset"),
        ham.alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
    return (
        matched.groupBy("media_a", "media_b", "window_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_matched"))
        .filter(F.col("n_matched") >= min_shared)
    )


# ---------------------------------------------------------------------------
# Pinned verified-pair indexes (the serving model for copy detection)
# ---------------------------------------------------------------------------
#
# The pair tables are build-once artifacts per corpus snapshot — exactly
# like the components closure (components.pinned_connected_components)
# that consumes them: candidate generation + exact verification run once,
# every serve reads the output-sized verified-pair relation. Consumers:
# the standalone dedup queries AND the media manifests (curation._av_units
# / media_dup_clusters), which previously re-ran the banded join +
# verification per query invocation. Either release hook drops them and
# the bench's cold pass re-pays the generation.


def pinned_phash_pairs(
    media: DataFrame, max_hamming: int = PHASH_MAX_HAMMING
) -> DataFrame:
    """``phash_pairs`` as a PINNED per-(corpus, threshold) product."""
    from ..pinned import pinned

    (p,) = pinned(
        ("phash_pairs", media.semanticHash(), int(max_hamming)),
        lambda: (phash_pairs(media, max_hamming),),
    )
    return p


def pinned_video_dup_pairs(
    media: DataFrame,
    max_hamming: int = PHASH_MAX_HAMMING,
    min_shared: int = VIDEO_MIN_SHARED,
) -> DataFrame:
    """``video_dup_pairs`` as a PINNED per-(corpus, thresholds) product."""
    from ..pinned import pinned

    (p,) = pinned(
        (
            "video_dup_pairs",
            media.semanticHash(),
            int(max_hamming),
            int(min_shared),
        ),
        lambda: (video_dup_pairs(media, max_hamming, min_shared),),
    )
    return p


def pinned_video_clip_pairs(
    media: DataFrame,
    max_hamming: int = UNALIGNED_MAX_HAMMING,
    min_shared: int = VIDEO_MIN_SHARED,
) -> DataFrame:
    """``video_clip_pairs`` as a PINNED per-(corpus, thresholds) product."""
    from ..pinned import pinned

    (p,) = pinned(
        (
            "video_clip_pairs",
            media.semanticHash(),
            int(max_hamming),
            int(min_shared),
        ),
        lambda: (video_clip_pairs(media, max_hamming, min_shared),),
    )
    return p


def pinned_audio_dup_pairs(
    media: DataFrame,
    max_hamming: int = UNALIGNED_MAX_HAMMING,
    min_shared: int = VIDEO_MIN_SHARED,
) -> DataFrame:
    """``audio_dup_pairs`` as a PINNED per-(corpus, thresholds) product."""
    from ..pinned import pinned

    (p,) = pinned(
        (
            "audio_dup_pairs",
            media.semanticHash(),
            int(max_hamming),
            int(min_shared),
        ),
        lambda: (audio_dup_pairs(media, max_hamming, min_shared),),
    )
    return p
