"""Record-parsing scalar operators (SURVEY §2.2, O11–O25).

Each function is a pure Column→Column (or DataFrame→DataFrame) transform
using only built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen, zero Python in the hot path. The regex patterns and
stopword list are the reference's exact semantics:

- email regex:  get_text_from_s3_image.py:21
- address stopword scoring (threshold ≥3): get_text_from_s3_image.py:25-29
- phone regex:  get_text_from_s3_image.py:33
- per-line last-match-wins scan: get_text_from_s3_image.py:43-48
- positional company/name/job_title = lines[:3]: get_text_from_s3_image.py:50-54
- owner = basename(s3_key).split('_')[0]: get_text_from_s3_image.py:188
- truncated md5 ids (md5(x)[:8]): upsert_bizcard_to_es.py:66-75,
  upsert_bizcard_to_graph_db.py:96,146
- validity filter (data/owner/s3_key truthy): upsert_bizcard_to_es.py:62-64

Both Spark (Java regex) and the DuckDB oracle (RE2) use leftmost-first
greedy matching for these patterns; parity is asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact reference patterns (get_text_from_s3_image.py:21,33).
EMAIL_RE = r"[a-zA-Z0-9+_\-\.]+@[0-9a-zA-Z][.-0-9a-zA-Z]*.[a-zA-Z]+"
PHONE_RE = r"\({0,1}\+{0,1}[\d ]*[\d]{2,}\){0,1}[\d\- ]{7,}"
# get_text_from_s3_image.py:26
ADDR_STOPWORDS = ["-gu", "-ro", "-do", " gu", " ro", " do", " seoul", " korea"]
ADDR_SCORE_THRESHOLD = 3


def unbase64_json(col: Column) -> Column:
    """O11: Kinesis payload base64 → utf-8 JSON string."""
    return F.unbase64(col).cast("string")


def extract_email(line: Column) -> Column:
    """O14: first email-regex match in a line, '' if none."""
    return F.regexp_extract(line, EMAIL_RE, 0)


def extract_phone(line: Column) -> Column:
    """O15: first phone-regex match in a line, '' if none."""
    return F.regexp_extract(line, PHONE_RE, 0)


def addr_score(line: Column) -> Column:
    """O16: count of Korean-address stopwords contained in lower(line)."""
    score = F.lit(0)
    low = F.lower(line)
    for w in ADDR_STOPWORDS:
        score = score + F.when(low.contains(w), F.lit(1)).otherwise(F.lit(0))
    return score


def extract_addr(line: Column) -> Column:
    """O16: the line itself iff its stopword score ≥ 3, else ''."""
    return F.when(addr_score(line) >= ADDR_SCORE_THRESHOLD, line).otherwise(F.lit(""))


def _last_nonempty(arr: Column) -> Column:
    """Last non-empty element of an array of extraction results, '' if none
    (null-safe under ANSI mode via reverse+get rather than element_at)."""
    return F.coalesce(F.get(F.reverse(F.filter(arr, lambda x: x != "")), 0), F.lit(""))


def scan_email(lines: Column) -> Column:
    """O17 for email: last line whose extraction matches wins
    (get_text_from_s3_image.py:43-48 — later ``doc[k] = ret`` overwrites)."""
    return _last_nonempty(F.transform(lines, extract_email))


def scan_phone(lines: Column) -> Column:
    """O17 for phone_number."""
    return _last_nonempty(F.transform(lines, extract_phone))


def scan_addr(lines: Column) -> Column:
    """O17 for addr."""
    return _last_nonempty(F.transform(lines, extract_addr))


def positional(lines: Column, idx: int) -> Column:
    """O18: company/name/job_title = lines[0:3] (0-based idx), null-safe."""
    return F.coalesce(F.get(lines, idx), F.lit(""))


def basename(path: Column) -> Column:
    """os.path.basename — last '/'-separated segment."""
    return F.element_at(F.split(path, "/"), -1)


def owner_from_key(s3_key: Column) -> Column:
    """O19: owner token = basename(s3_key).split('_')[0]."""
    return F.get(F.split(basename(s3_key), "_"), 0)


def md5_id(col: Column) -> Column:
    """O20: truncated md5 identity — md5(x)[:8], same hex as hashlib."""
    return F.substring(F.md5(col.cast("binary")), 1, 8)


def content_id(name: Column, email: Column, phone: Column) -> Column:
    """O21: md5(lower(name):lower(email):lower(phone))[:8] — the content
    dedup key (upsert_bizcard_to_es.py:73-75)."""
    return md5_id(F.concat_ws(":", F.lower(name), F.lower(email), F.lower(phone)))


def person_id(email: Column) -> Column:
    """Person vertex id = md5(email local part)[:8]
    (upsert_bizcard_to_graph_db.py:146)."""
    return md5_id(F.get(F.split(email, "@"), 0))


def fmt_created_at(ts: Column) -> Column:
    """O22: ISO-8601 Zulu format (get_text_from_s3_image.py:186)."""
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def fmt_mts(ts: Column) -> Column:
    """O22: compact numeric timestamp (trigger_…:56 / get_text_…:109)."""
    return F.date_format(ts, "yyyyMMddHHmmss")


def url_decode(col: Column) -> Column:
    """O25: unquote_plus on S3 object keys."""
    return F.url_decode(F.replace(col, F.lit("+"), F.lit("%20")))


def validity_filter(df, data_col="data", owner_col="owner", key_col="s3_key"):
    """O13: keep records where data/owner/s3_key are all truthy
    (upsert_bizcard_to_es.py:62-64) — nulls and empty strings drop."""
    return df.filter(
        F.col(data_col).isNotNull()
        & F.col(owner_col).isNotNull()
        & (F.col(owner_col) != "")
        & F.col(key_col).isNotNull()
        & (F.col(key_col) != "")
    )


def redact_pii(text: Column) -> Column:
    """PII-redacted text: every email replaced by ``<EMAIL>``, then every
    phone by ``<PHONE>``, using the engine's FROZEN reference patterns
    (EMAIL_RE / PHONE_RE — the same expressions O14/O15 extract with).
    The training-data-pipeline inverse of the parser: where the reference
    HARVESTS contact fields into documents (get_text_from_s3_image.py),
    a corpus pipeline scrubs them before the text ships to a model.
    Order is declared (emails first, phones over the email-redacted
    text); both replacements are narrow per-row expressions — no UDF,
    no shuffle."""
    return F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in ``text`` by the frozen patterns —
    counted on the ORIGINAL text, independent of redaction order."""
    return (
        F.regexp_count(text, F.lit(EMAIL_RE)),
        F.regexp_count(text, F.lit(PHONE_RE)),
    )
