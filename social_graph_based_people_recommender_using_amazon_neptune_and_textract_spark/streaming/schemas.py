"""Explicit StructTypes for the stream records (SURVEY §1.1 D1/D2) and the
Kinesis-record decode path (O11 base64 → O12 JSON parse → O13 validity
filter).

The reference's schemas are implicit dict conventions; we pin them
(SURVEY §1.2) so ``from_json`` yields typed columns and malformed records
become NULLs we can filter and count instead of silently dropping
(upsert_bizcard_to_es.py:62-64 skips invalid records with a counter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

# D1 — image-pointer event (trigger_text_extract_from_s3_image.py:104).
D1_SCHEMA = StructType(
    [
        StructField("s3_bucket", StringType(), False),
        StructField("s3_key", StringType(), False),
    ]
)

# The OCR-boundary record: D1 + extracted text lines (O5 stub output —
# Textract's LINE blocks as array<string>, get_text_from_s3_image.py:70).
TEXT_LINES_SCHEMA = StructType(
    [
        StructField("s3_bucket", StringType(), True),
        StructField("s3_key", StringType(), True),
        StructField("lines", ArrayType(StringType()), True),
    ]
)

# D2 — bizcard text record (get_text_from_s3_image.py:189; README.md:244-282).
_DATA = StructType(
    [
        StructField("addr", StringType(), True),
        StructField("email", StringType(), True),
        StructField("phone_number", StringType(), True),
        StructField("company", StringType(), True),
        StructField("name", StringType(), True),
        StructField("job_title", StringType(), True),
        StructField("created_at", StringType(), True),
    ]
)
D2_SCHEMA = StructType(
    [
        StructField("s3_bucket", StringType(), True),
        StructField("s3_key", StringType(), True),
        StructField("owner", StringType(), True),
        StructField("data", _DATA, True),
    ]
)

# D2 flattened (the shape operators/ingest.py works on).
D2_FLAT_SCHEMA = StructType(
    [
        StructField("s3_bucket", StringType(), True),
        StructField("s3_key", StringType(), True),
        StructField("owner", StringType(), True),
        StructField("company", StringType(), True),
        StructField("name", StringType(), True),
        StructField("job_title", StringType(), True),
        StructField("email", StringType(), True),
        StructField("phone_number", StringType(), True),
        StructField("addr", StringType(), True),
        StructField("created_at", StringType(), True),
    ]
)


def decode_kinesis_records(
    records: DataFrame, payload_col: str = "data", schema: StructType = TEXT_LINES_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """O11+O12+O13: base64 payloads → typed rows, split (valid, invalid).

    The reference decodes each Kinesis record's base64 data, JSON-parses
    it, and skips records missing data/owner/s3_key with a counter
    (upsert_bizcard_to_es.py:59-64). Here ``from_json`` yields NULL for
    malformed payloads; the validity predicate mirrors the reference's
    truthiness check. Returns (valid, invalid) so callers can count
    (O23) instead of silently dropping.
    """
    decoded = records.withColumn(
        "__rec", F.from_json(F.unbase64(F.col(payload_col)).cast("string"), schema)
    )
    parsed = decoded.select("__rec.*")
    field0 = schema.fieldNames()[0]
    valid_pred = (
        F.col("s3_key").isNotNull() & (F.col("s3_key") != "")
        if "s3_key" in schema.fieldNames()
        else F.col(field0).isNotNull()
    )
    return parsed.filter(valid_pred), parsed.filter(~valid_pred | F.col(field0).isNull())
