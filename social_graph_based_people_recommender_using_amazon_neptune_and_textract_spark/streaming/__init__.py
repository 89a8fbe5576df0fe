"""Structured-Streaming wrapper (SURVEY §7 Phase 4) over the batch ingest
operators.

The reference's streaming topology (SURVEY §3.1): S3 object-created events
→ Kinesis image stream → OCR+parse → Kinesis text stream → fan-out to
three consumers (Elasticsearch upsert, Neptune graph upsert, Firehose S3
archive) plus a DynamoDB status table. Here that is ONE file-arrival
source and ONE ``foreachBatch`` that calls the *same* batch functions
(operators/ingest.py) and commits to idempotent keyed sinks — Structured
Streaming checkpointing (at-least-once replay) + deterministic keyed
merges (O20 ids) = effective exactly-once, the same mechanism the
reference gets from Kinesis retries + idempotent ES/Neptune upserts.
"""

from .schemas import (
    D1_SCHEMA,
    D2_FLAT_SCHEMA,
    D2_SCHEMA,
    TEXT_LINES_SCHEMA,
    decode_kinesis_records,
)
from .dedup import StreamingDeduper
from .ingest import IngestPipeline, read_text_lines_stream
from .neardup import StreamingNearDeduper
from .table import KeyedParquetTable

__all__ = [
    "D1_SCHEMA",
    "D2_SCHEMA",
    "D2_FLAT_SCHEMA",
    "TEXT_LINES_SCHEMA",
    "decode_kinesis_records",
    "IngestPipeline",
    "StreamingDeduper",
    "StreamingNearDeduper",
    "read_text_lines_stream",
    "KeyedParquetTable",
]
