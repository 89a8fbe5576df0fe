"""Testdata loaders + the declared reference→testdata mapping.

The reference ("Octember Bizcard") operates on business-card records and a
person/knows social graph. The driver's testdata is a TPC-H-ish star schema
plus ``events``/``documents``/``embeddings``. This module declares the
deterministic mapping between the two, ONCE, with a DuckDB SQL twin for each
derivation so every downstream query can be oracle-checked:

- **User graph** (SURVEY D4/D5): derived from ``events`` — an interaction
  edge ``src→dst`` for every pair of consecutive events (by ``event_id``)
  with distinct users. Mirrors the reference's "owner gave subject a card"
  edges: directed, no self-loops (upsert_bizcard_to_graph_db.py:98), at most
  one edge per (src,dst) pair (:104-109), weight 1.0 (:101).
- **Bizcard text records** (SURVEY D2): synthesized per ``customer`` row
  (joined to ``nation``) as OCR-like text lines. This is the declared O5
  (Textract) stub boundary: OCR itself is outside Spark (BASELINE.json), so
  the *input* to the parse operators is generated deterministically; the
  parse operators downstream (functions/parse.py) are the real, tested
  reference semantics (get_text_from_s3_image.py:19-56).

Scale notes (100 TB target):
- The consecutive-event self-join is an equi-join on a derived key
  (``event_id + 1``) — both sides shuffle-partition by the key, no global
  sort, no window over a single partition. AQE coalesces the post-join
  partitions.
- ``customer ⋈ nation`` is a broadcast join (25-row dim) — asserted in
  tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: DataFrame PLAN cache keyed by (session, sf_dir, table): a DataFrame
#: is an immutable logical plan, so handing every caller the same object
#: is semantics-free — but it skips the per-call parquet file listing /
#: footer read / analysis that otherwise puts a fixed ~0.1-0.3 s of
#: driver work under EVERY point query (the serving-floor tax the r10
#: pin-served PYMK profile exposed). Keyed by applicationId so a fresh
#: session (new process, new warehouse) never sees another's plans.
_DF_CACHE: dict[tuple, DataFrame] = {}


def _cached(spark: SparkSession, key: tuple, build) -> DataFrame:
    full = (spark.sparkContext.applicationId, *key)
    df = _DF_CACHE.get(full)
    if df is None:
        df = build()
        _DF_CACHE[full] = df
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan; column pruning + filter pushdown are preserved by
    returning the raw scan (callers select/filter and Catalyst pushes).

    ``events.ts`` has shipped in two physical shapes across driver testdata
    generations: parquet TIMESTAMP(NANOS) (which Spark 4 rejects unless read
    as long nanos) and plain TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ).
    Normalize both to a TIMESTAMP whose instant is the stored wall clock
    read as UTC. Both branches are timezone-EXPLICIT and purely
    ARITHMETIC: the NTZ branch decomposes the wall clock into epoch days
    (``unix_date`` on the tz-free NTZ→date cast) plus time-of-day
    micros — every term is timezone-independent, so the instants are
    correct even if host code later changes
    ``spark.sql.session.timeZone`` (round-3 ADVICE: a bare
    ``cast("timestamp")`` is interpreted with the session zone at QUERY
    time, not load time; the round-4 remedy — a per-row string round-trip
    with an explicit 'Z' — was equally correct but allocated a string per
    row on the hottest base table, a measured 45-70% regression on events
    scans). The session zone is still pinned UTC for deterministic
    ``date_format``/``window`` RENDERING downstream.
    """
    def _build() -> DataFrame:
        if name == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            ts_type = df.schema["ts"].dataType.simpleString()
            if ts_type == "bigint":  # nanos-as-long generation
                return df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            # TIMESTAMP_NTZ (micros) generation: wall clock → epoch
            # micros, all tz-free terms (date/hour/minute on NTZ read the
            # wall clock; SECOND is decimal(8,6) so sub-second precision
            # is exact).
            micros = (
                F.unix_date(F.col("ts").cast("date")).cast("long")
                * F.lit(86_400_000_000)
                + F.hour("ts").cast("long") * F.lit(3_600_000_000)
                + F.minute("ts").cast("long") * F.lit(60_000_000)
                + (
                    F.date_part(F.lit("SECOND"), F.col("ts"))
                    * F.lit(1_000_000)
                ).cast("long")
            )
            return df.withColumn("ts", F.timestamp_micros(micros))
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")

    return _cached(spark, ("load_table", sf_dir, name), _build)


# ---------------------------------------------------------------------------
# User graph from events (vertices: D4, edges: D5)
# ---------------------------------------------------------------------------

def user_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed knows-edges: consecutive events with distinct users.

    Columns: src BIGINT, dst BIGINT, weight DOUBLE (always 1.0, mirroring
    upsert_bizcard_to_graph_db.py:101).
    """
    return _cached(
        spark, ("user_graph_edges", sf_dir), lambda: _user_graph_edges(spark, sf_dir)
    )


def _user_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    nxt = ev.select(
        (F.col("event_id") - F.lit(1)).alias("event_id"),
        F.col("user_id").alias("dst_user"),
    )
    pairs = (
        ev.join(nxt, "event_id")
        .select(F.col("user_id").alias("src"), F.col("dst_user").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    return pairs.distinct().withColumn("weight", F.lit(1.0))


def user_graph_vertices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Person vertices: id BIGINT, name STRING, _name STRING (lowercased
    name for case-insensitive lookup, upsert_bizcard_to_graph_db.py:94)."""

    def _build() -> DataFrame:
        ev = load_table(spark, sf_dir, "events").select("user_id").distinct()
        name = F.concat(F.lit("user_"), F.col("user_id").cast("string"))
        return ev.select(
            F.col("user_id").alias("id"),
            name.alias("name"),
            F.lower(name).alias("_name"),
        )

    return _cached(spark, ("user_graph_vertices", sf_dir), _build)


# DuckDB twins — CTE bodies; compose as f"WITH {EDGES_SQL} SELECT ...".
EDGES_SQL = """\
ev AS (SELECT event_id, user_id FROM events),
pairs AS (
  SELECT a.user_id AS src, b.user_id AS dst
  FROM ev a JOIN ev b ON b.event_id = a.event_id + 1
  WHERE a.user_id <> b.user_id
),
edges AS (
  SELECT src, dst, CAST(1.0 AS DOUBLE) AS weight
  FROM (SELECT DISTINCT src, dst FROM pairs)
)"""

VERTICES_SQL = """\
vertices AS (
  SELECT user_id AS id,
         'user_' || CAST(user_id AS VARCHAR) AS name,
         lower('user_' || CAST(user_id AS VARCHAR)) AS "_name"
  FROM (SELECT DISTINCT user_id FROM events)
)"""


# ---------------------------------------------------------------------------
# Bizcard text records from customer ⋈ nation (D2)
# ---------------------------------------------------------------------------

def bizcard_text_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized D2 records: (s3_bucket, s3_key, owner_key, lines).

    Per customer row (the card *subject*), the card *owner* is another
    customer chosen deterministically (``floor(k/3)`` for even k,
    ``floor(k/5)`` for odd k) so that the derived graph has shared 2-hop
    paths. The OCR line layout follows the reference's positional
    convention (get_text_from_s3_image.py:50-54): company, name, job title
    first, then free-form contact lines. Every 5th customer has a second
    email line so the parser's last-match-wins behavior (:43-48) is
    exercised at sf scale.

    ``owner_key`` here is the *email-local-part token* embedded in the
    filename; O19 (owner = basename(s3_key).split('_')[0]) must recover it.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)

    digits = F.replace(F.col("c_name"), F.lit("Customer#"), F.lit(""))
    uname = F.concat(F.lit("c"), digits)
    k = F.col("c_custkey")
    owner_key = F.concat(
        F.lit("c"),
        F.lpad(
            F.when(k % 2 == 0, F.floor(k / 3)).otherwise(F.floor(k / 5)).cast("string"),
            9,
            "0",
        ),
    )
    email_line = F.concat(
        F.lit("Email: "), uname, F.lit("@nation"),
        F.col("c_nationkey").cast("string"), F.lit(".example.com"),
    )
    phone_line = F.concat(
        F.lit("Tel: 02-"),
        F.lpad((k % 10000).cast("string"), 4, "0"),
        F.lit("-"),
        F.lpad(((k * 7) % 10000).cast("string"), 4, "0"),
    )
    addr_line = F.when(
        k % 3 == 0,
        F.concat(k.cast("string"), F.lit(" Teheran-ro, Gangnam-gu, Seoul, Korea")),
    ).otherwise(F.concat(F.lit("Suite "), k.cast("string"), F.lit(" Main Street")))
    alt_email_line = F.concat(F.lit("alt contact z"), digits, F.lit("@alt.example.com"))

    base_lines = F.array(
        F.concat(F.col("n_name"), F.lit(" Trading Co")),
        F.col("c_name"),
        F.concat(F.col("c_mktsegment"), F.lit(" Specialist")),
        email_line,
        phone_line,
        addr_line,
    )
    lines = F.when(k % 5 == 0, F.concat(base_lines, F.array(alt_email_line))).otherwise(
        base_lines
    )

    return j.select(
        F.lit("octember-use1").alias("s3_bucket"),
        F.concat(
            F.lit("bizcard-raw-img/"), owner_key, F.lit("_"), uname, F.lit(".jpg")
        ).alias("s3_key"),
        lines.alias("lines"),
    )


BIZCARD_LINES_SQL = """\
bizcard_raw AS (
  SELECT
    'octember-use1' AS s3_bucket,
    'bizcard-raw-img/' || owner_key || '_' || uname || '.jpg' AS s3_key,
    CASE WHEN c_custkey % 5 = 0
         THEN list_append(base_lines, 'alt contact z' || digits || '@alt.example.com')
         ELSE base_lines END AS lines
  FROM (
    SELECT c_custkey, digits, uname, owner_key,
      [ n_name || ' Trading Co',
        c_name,
        c_mktsegment || ' Specialist',
        'Email: ' || uname || '@nation' || CAST(c_nationkey AS VARCHAR) || '.example.com',
        'Tel: 02-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                   || '-' || lpad(CAST((c_custkey * 7) % 10000 AS VARCHAR), 4, '0'),
        CASE WHEN c_custkey % 3 = 0
             THEN CAST(c_custkey AS VARCHAR) || ' Teheran-ro, Gangnam-gu, Seoul, Korea'
             ELSE 'Suite ' || CAST(c_custkey AS VARCHAR) || ' Main Street' END
      ] AS base_lines
    FROM (
      SELECT c.*, n.n_name,
        replace(c_name, 'Customer#', '') AS digits,
        'c' || replace(c_name, 'Customer#', '') AS uname,
        'c' || lpad(CAST(CASE WHEN c_custkey % 2 = 0 THEN c_custkey // 3
                              ELSE c_custkey // 5 END AS VARCHAR), 9, '0') AS owner_key
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
  )
)"""
