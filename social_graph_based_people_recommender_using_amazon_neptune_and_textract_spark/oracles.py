"""DuckDB oracle SQL twins for every registered query.

Composed from the same mapping constants as the Spark implementations
(sources/tables.py, functions/parse.py) so the declared semantics live in
exactly one place. The driver runs these against the sf0.01 parquet views
and hash-compares with the Spark results (BASELINE.md "bench target").
"""

from __future__ import annotations

from .functions.parse import ADDR_STOPWORDS, ADDR_SCORE_THRESHOLD, EMAIL_RE, PHONE_RE
from .sources.tables import BIZCARD_LINES_SQL, EDGES_SQL, VERTICES_SQL

# Symmetrized (undirected, bag-semantics) edge view — O38c.
BI_SQL = """\
bi AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT dst AS src, src AS dst FROM edges
)"""


def _addr_score(var: str) -> str:
    terms = " + ".join(
        f"(CASE WHEN contains(lower({var}), '{w}') THEN 1 ELSE 0 END)"
        for w in ADDR_STOPWORDS
    )
    return f"({terms})"


_LAST = "coalesce(list_filter(list_transform(lines, x -> regexp_extract(x, '{re}', 0)), x -> x <> '')[-1], '')"

PARSED_SQL = f"""\
parsed AS (
  SELECT s3_bucket, s3_key,
    string_split(string_split(s3_key, '/')[-1], '_')[1] AS owner,
    lines[1] AS company,
    lines[2] AS name,
    lines[3] AS job_title,
    {_LAST.format(re=EMAIL_RE)} AS email,
    {_LAST.format(re=PHONE_RE)} AS phone_number,
    coalesce(list_filter(lines, x -> {_addr_score('x')} >= {ADDR_SCORE_THRESHOLD})[-1], '') AS addr,
    '2024-01-01T00:00:00Z' AS created_at
  FROM bizcard_raw
)"""


# Reusable D3 bizcards CTE chain (validity filter + last-write-wins).
BIZCARDS_CTES = f"""\
{BIZCARD_LINES_SQL}, {PARSED_SQL},
doc AS (
  SELECT
    substr(md5(string_split(s3_key, '/')[-1]), 1, 8) AS doc_id,
    string_split(s3_key, '/')[-1] AS image_id,
    owner, company, name, job_title, email, phone_number, addr, created_at,
    1 AS is_alive,
    substr(md5(lower(name) || ':' || lower(email) || ':' || lower(phone_number)), 1, 8) AS content_id,
    s3_key
  FROM parsed
  WHERE owner <> '' AND s3_key <> ''
),
bizcards AS (
  SELECT doc_id, image_id, owner, company, name, job_title, email,
         phone_number, addr, created_at, is_alive, content_id
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY created_at DESC, s3_key DESC
    ) AS rn FROM doc
  ) WHERE rn = 1
)"""

TOKENIZE = "list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'), x -> x <> '')"


def _bm25_single_sql(corpus_cte: str, id_col: str, text_col: str, terms: list[str]) -> str:
    """BM25 CTE chain over a single-field corpus CTE named ``corpus_cte``.
    Expression shape mirrors search/bm25.py exactly (double literals pinned
    with ::DOUBLE so DuckDB doesn't use DECIMAL arithmetic)."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    tok = TOKENIZE.format(col=text_col)
    return f"""\
toks AS (SELECT {id_col} AS id, {tok} AS tokens FROM {corpus_cte}),
dl AS (SELECT id, len(tokens) AS dl FROM toks),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT id, tok, count(*) AS tf
  FROM (SELECT id, unnest(tokens) AS tok FROM toks)
  WHERE tok IN ({in_list})
  GROUP BY id, tok
),
dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.id,
    ln(1 + (stats.n - dfreq.df + 0.5::DOUBLE) / (dfreq.df + 0.5::DOUBLE))
      * (tf.tf * 2.2::DOUBLE)
      / (tf.tf + 1.2::DOUBLE * (1 - 0.75::DOUBLE + 0.75::DOUBLE * dl.dl / stats.avgdl)) AS c
  FROM tf JOIN dfreq USING (tok) JOIN dl USING (id) CROSS JOIN stats
),
scored AS (
  SELECT id, round(sum(c), 6) AS score FROM contrib GROUP BY id
)"""


def _bm25_fields_sql(terms: list[str]) -> str:
    """Multi-field best-fields BM25 CTE chain over the ``bizcards`` CTE;
    per-field statistics; name boosted 3x (es_search_bizcard.py:66).
    Produces CTE ``scored`` (id, score)."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    tok = TOKENIZE.format(col="text")
    melted = "\n  UNION ALL ".join(
        f"SELECT doc_id AS id, '{f}' AS field, {f} AS text FROM alive"
        for f in ("name", "company", "job_title", "addr")
    )
    return f"""\
alive AS (SELECT * FROM bizcards WHERE is_alive = 1),
melted AS (
  {melted}
),
toks AS (SELECT id, field, {tok} AS tokens FROM melted),
dl AS (SELECT id, field, len(tokens) AS dl FROM toks),
stats AS (SELECT field, count(*) AS n, avg(dl) AS avgdl FROM dl GROUP BY field),
tf AS (
  SELECT id, field, tok, count(*) AS tf
  FROM (SELECT id, field, unnest(tokens) AS tok FROM toks)
  WHERE tok IN ({in_list})
  GROUP BY id, field, tok
),
dfreq AS (SELECT field, tok, count(*) AS df FROM tf GROUP BY field, tok),
contrib AS (
  SELECT tf.id, tf.field,
    ln(1 + (stats.n - dfreq.df + 0.5::DOUBLE) / (dfreq.df + 0.5::DOUBLE))
      * (tf.tf * 2.2::DOUBLE)
      / (tf.tf + 1.2::DOUBLE * (1 - 0.75::DOUBLE + 0.75::DOUBLE * dl.dl / stats.avgdl)) AS c
  FROM tf
  JOIN dfreq USING (field, tok)
  JOIN dl USING (id, field)
  JOIN stats USING (field)
),
fscores AS (
  SELECT id, field, sum(c) AS fscore FROM contrib GROUP BY id, field
),
scored AS (
  SELECT id,
         round(max((CASE WHEN field = 'name' THEN 3.0::DOUBLE ELSE 1.0::DOUBLE END) * fscore), 6) AS score
  FROM fscores GROUP BY id
)"""


DOC_QUERY_TERMS = ["spark", "join", "vector"]
BIZCARD_QUERY = "furniture trading seoul"
BIZCARD_QUERY_TERMS = ["furniture", "trading", "seoul"]
SEARCH_OWNER = "c000000001"

ORACLES: dict[str, str] = {}

ORACLES["search_documents"] = f"""\
WITH {_bm25_single_sql("documents", "doc_id", "text", DOC_QUERY_TERMS)}
SELECT id AS doc_id, score FROM scored
ORDER BY score DESC, doc_id ASC LIMIT 10"""

ORACLES["search_bizcards"] = f"""\
WITH {BIZCARDS_CTES}, {_bm25_fields_sql(BIZCARD_QUERY_TERMS)}
SELECT b.doc_id, b.owner, b.name, s.score
FROM scored s JOIN bizcards b ON s.id = b.doc_id
ORDER BY s.score DESC, b.doc_id ASC LIMIT 10"""

ORACLES["search_bizcards_owner"] = f"""\
WITH {BIZCARDS_CTES}, {_bm25_fields_sql(BIZCARD_QUERY_TERMS)}
SELECT b.doc_id, b.owner, b.name, s.score
FROM scored s JOIN bizcards b ON s.id = b.doc_id
WHERE b.owner = '{SEARCH_OWNER}'
ORDER BY s.score DESC, b.doc_id ASC LIMIT 10"""

ORACLES["search_bizcards_user_only"] = f"""\
WITH {BIZCARDS_CTES}
SELECT doc_id, owner, name, CAST(0.0 AS DOUBLE) AS score
FROM bizcards
WHERE is_alive = 1 AND owner = '{SEARCH_OWNER}'
ORDER BY doc_id ASC LIMIT 10"""

ORACLES["search_documents_count"] = f"""\
WITH {_bm25_single_sql("documents", "doc_id", "text", DOC_QUERY_TERMS)}
SELECT count(*) AS total_hits FROM scored"""

ORACLES["graph_edges"] = f"WITH {EDGES_SQL}\nSELECT src, dst, weight FROM edges"

ORACLES["graph_vertices"] = (
    f'WITH {VERTICES_SQL}\nSELECT id, name, "_name" FROM vertices'
)

ORACLES["graph_degrees"] = f"""\
WITH {EDGES_SQL}, {BI_SQL}
SELECT src AS id, count(*) AS degree FROM bi GROUP BY src"""

# Bucketed-layout round-trip (sources/bucketed.py): same degrees relation
# computed from the bucket-co-located catalog table — layout is physical
# only, so the oracle is graph_degrees' verbatim.
ORACLES["graph_degrees_bucketed"] = ORACLES["graph_degrees"]

ORACLES["graph_counts"] = f"""\
WITH {EDGES_SQL}, {VERTICES_SQL}
SELECT (SELECT count(*) FROM vertices) AS vertex_count,
       (SELECT count(*) FROM edges) AS edge_count"""

# Connected components of the user graph (operators/components.py via
# _q_graph_components): min node id per component, nodes = edge endpoints.
ORACLES["graph_components"] = f"""\
WITH RECURSIVE {EDGES_SQL},
e AS (
  SELECT src AS a, dst AS b FROM edges
  UNION ALL
  SELECT dst AS a, src AS b FROM edges
),
reach(node, label) AS (
  SELECT DISTINCT a, a FROM e
  UNION
  SELECT e.a, r.label FROM e JOIN reach r ON r.node = e.b
)
SELECT node AS id, CAST(min(label) AS BIGINT) AS component_id
FROM reach GROUP BY node"""

ORACLES["one_hop_paths"] = f"""\
WITH {EDGES_SQL}, {VERTICES_SQL}
SELECT vs.name AS src_name, vd.name AS dst_name
FROM edges e
JOIN vertices vs ON e.src = vs.id
JOIN vertices vd ON e.dst = vd.id"""

# Salt cancels out: the oracle is the plain distinct count.
ORACLES["salted_distinct_degrees"] = f"""\
WITH {EDGES_SQL}, {BI_SQL}
SELECT src AS id, count(DISTINCT dst) AS n_distinct FROM bi GROUP BY src"""

ORACLES["pymk_user_3"] = f"""\
WITH {EDGES_SQL}, {VERTICES_SQL}, {BI_SQL},
me AS (SELECT id FROM vertices WHERE "_name" = 'user_3'),
friends AS (
  SELECT me.id AS me_id, bi.dst AS friend_id FROM bi JOIN me ON bi.src = me.id
),
hop2 AS (
  SELECT f.me_id, bi.dst AS cand_id FROM bi JOIN friends f ON bi.src = f.friend_id
),
cand AS (
  SELECT * FROM hop2
  WHERE cand_id <> me_id
    AND NOT EXISTS (SELECT 1 FROM friends f WHERE f.friend_id = hop2.cand_id)
),
scored AS (
  SELECT cand_id, CAST(count(*) AS DOUBLE) AS score
  FROM cand GROUP BY cand_id
  ORDER BY score DESC, cand_id ASC
  LIMIT 10
)
SELECT v.id, v.name, s.score FROM scored s JOIN vertices v ON s.cand_id = v.id"""

ORACLES["pymk_all_top5"] = f"""\
WITH {EDGES_SQL}, {BI_SQL},
hop2 AS (
  SELECT a.src AS user_id, b.dst AS cand_id
  FROM bi a JOIN bi b ON a.dst = b.src
  WHERE b.dst <> a.src
),
cand AS (
  SELECT h.* FROM hop2 h
  WHERE NOT EXISTS (
    SELECT 1 FROM bi WHERE bi.src = h.user_id AND bi.dst = h.cand_id
  )
),
scored AS (
  SELECT user_id, cand_id, CAST(count(*) AS DOUBLE) AS score
  FROM cand GROUP BY user_id, cand_id
),
ranked AS (
  SELECT user_id, cand_id AS id, score,
         CAST(row_number() OVER (
           PARTITION BY user_id ORDER BY score DESC, cand_id ASC
         ) AS INT) AS rank
  FROM scored
)
SELECT user_id, id, score, rank FROM ranked WHERE rank <= 5"""

# O36 full valueMap hydration (neptune_recommend_bizcard.py:69-72):
# every prop minus id/_-prefixed, list-wrapped; JSON-encoded for the
# canonicalizer (list columns are unhashable in pandas sorting).
_PYMK_SCORED_SQL = """\
me AS (SELECT id FROM {v} WHERE "_name" = '{user}'),
friends AS (
  SELECT me.id AS me_id, {bi}.dst AS friend_id FROM {bi} JOIN me ON {bi}.src = me.id
),
hop2 AS (
  SELECT f.me_id, {bi}.dst AS cand_id FROM {bi} JOIN friends f ON {bi}.src = f.friend_id
),
cand AS (
  SELECT * FROM hop2
  WHERE cand_id <> me_id
    AND NOT EXISTS (SELECT 1 FROM friends f WHERE f.friend_id = hop2.cand_id)
),
scored AS (
  SELECT cand_id, CAST(count(*) AS DOUBLE) AS score
  FROM cand GROUP BY cand_id
  ORDER BY score DESC, cand_id ASC
  LIMIT {limit}
)"""


def _wrap_json(props: list[str]) -> str:
    return ",\n  ".join(
        f"CAST(to_json([v.{p}]) AS VARCHAR) AS {p}" for p in props
    )


ORACLES["pymk_user_3_hydrated"] = f"""\
WITH {EDGES_SQL}, {VERTICES_SQL}, {BI_SQL},
{_PYMK_SCORED_SQL.format(v="vertices", bi="bi", user="user_3", limit=10)}
SELECT v.id,
  {_wrap_json(["name"])},
  s.score
FROM scored s JOIN vertices v ON s.cand_id = v.id"""

_BGRAPH_SQL = """\
bvertices AS (
  SELECT id, name, email, phone_number, company, job_title,
         lower(name) AS "_name"
  FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY s3_key DESC) AS rn
    FROM (
      SELECT s3_key, owner,
        substr(md5(string_split(email, '@')[1]), 1, 8) AS id,
        name, email, phone_number, company, job_title
      FROM parsed
    )
  ) WHERE rn = 1
),
bedges AS (
  SELECT src, dst FROM (
    SELECT DISTINCT
      substr(md5(owner), 1, 8) AS src,
      substr(md5(string_split(email, '@')[1]), 1, 8) AS dst
    FROM parsed
  ) WHERE src <> dst
),
bbi AS (SELECT src, dst FROM bedges UNION ALL SELECT dst, src FROM bedges)"""

ORACLES["pymk_bizcard_hydrated"] = f"""\
WITH {BIZCARD_LINES_SQL}, {PARSED_SQL},
{_BGRAPH_SQL},
{_PYMK_SCORED_SQL.format(v="bvertices", bi="bbi", user="customer#000000137", limit=10)}
SELECT v.id,
  {_wrap_json(["name", "email", "phone_number", "company", "job_title"])},
  s.score
FROM scored s JOIN bvertices v ON s.cand_id = v.id"""

# BFS shortest paths (graph/traverse.py) on the bizcard graph: the
# iterative join loop's fixed point is a recursive CTE — min path length
# per reachable vertex within the hop bound.
ORACLES["graph_shortest_paths"] = f"""\
WITH RECURSIVE {BIZCARD_LINES_SQL}, {PARSED_SQL},
bedges AS (
  SELECT src, dst FROM (
    SELECT DISTINCT
      substr(md5(owner), 1, 8) AS src,
      substr(md5(string_split(email, '@')[1]), 1, 8) AS dst
    FROM parsed
  ) WHERE src <> dst
),
bbi AS (SELECT src, dst FROM bedges UNION ALL SELECT dst, src FROM bedges),
walk(id, dist) AS (
  SELECT substr(md5('c000000001'), 1, 8) AS id, 0 AS dist
  UNION ALL
  SELECT bbi.dst, walk.dist + 1
  FROM walk JOIN bbi ON bbi.src = walk.id
  WHERE walk.dist < 4
)
SELECT id, CAST(min(dist) AS INT) AS dist FROM walk GROUP BY id"""

ORACLES["bizcard_parse"] = f"""\
WITH {BIZCARD_LINES_SQL}, {PARSED_SQL}
SELECT s3_bucket, s3_key, owner, company, name, job_title,
       email, phone_number, addr, created_at
FROM parsed"""

ORACLES["bizcards"] = f"""\
WITH {BIZCARDS_CTES}
SELECT * FROM bizcards"""

# O4: the archive round-trip is content-identity, so the oracle is the
# parse projection plus the (constant at this corpus) time partitions.
ORACLES["archive_replay"] = f"""\
WITH {BIZCARD_LINES_SQL}, {PARSED_SQL}
SELECT s3_key, owner, name, email, 2024 AS year, 1 AS month
FROM parsed"""

# O2: producer shard key — md5-derived (deterministic randint stand-in,
# declared deviation), 'part-%05d' over 1..1024.
ORACLES["kinesis_partition_keys"] = f"""\
WITH {BIZCARD_LINES_SQL}
SELECT s3_key,
  'part-' || lpad(CAST((CAST(concat('0x', substr(md5(s3_key), 1, 15)) AS BIGINT) % 1024) + 1 AS VARCHAR), 5, '0') AS partition_key
FROM bizcard_raw"""

# O8: the per-owner album is a partitioned copy — content identity means
# per-owner counts match the parse projection.
ORACLES["album_replay"] = f"""\
WITH {BIZCARD_LINES_SQL}, {PARSED_SQL}
SELECT owner, count(*) AS n_images FROM parsed GROUP BY owner"""

# O25: '+' → ' ' then percent-unescape; the closed escape alphabet the
# Spark query constructs makes replace() chains an exact decoder.
ORACLES["url_decoded_keys"] = f"""\
WITH {BIZCARD_LINES_SQL},
enc AS (
  SELECT s3_key AS raw_key,
         replace(replace(s3_key, '/', '%2F'), '_', '+') AS encoded_key
  FROM bizcard_raw
)
SELECT raw_key, encoded_key,
       replace(replace(encoded_key, '+', ' '), '%2F', '/') AS decoded_key
FROM enc"""

ORACLES["bizcard_vertices"] = f"""\
WITH {BIZCARD_LINES_SQL}, {PARSED_SQL},
base AS (
  SELECT s3_key, owner,
    substr(md5(string_split(email, '@')[1]), 1, 8) AS id,
    name, email, phone_number, company, job_title
  FROM parsed
)
SELECT id, name, email, phone_number, company, job_title,
       lower(name) AS "_name"
FROM (
  SELECT *, row_number() OVER (PARTITION BY id ORDER BY s3_key DESC) AS rn
  FROM base
) WHERE rn = 1"""

ORACLES["bizcard_edges"] = f"""\
WITH {BIZCARD_LINES_SQL}, {PARSED_SQL}
SELECT src, dst, CAST(1.0 AS DOUBLE) AS weight
FROM (
  SELECT DISTINCT
    substr(md5(owner), 1, 8) AS src,
    substr(md5(string_split(email, '@')[1]), 1, 8) AS dst
  FROM parsed
) WHERE src <> dst"""

ORACLES["vertex_lookup"] = f"""\
WITH {VERTICES_SQL}
SELECT id, name, "_name" FROM vertices WHERE id = 3 LIMIT 1"""

ORACLES["edge_exists_first"] = f"""\
WITH {EDGES_SQL}
SELECT src, dst, CAST(TRUE AS BOOLEAN) AS present
FROM (SELECT src, dst FROM edges ORDER BY src, dst LIMIT 1)"""

ORACLES["search_bizcards_envelope"] = f"""\
WITH {BIZCARDS_CTES}, {_bm25_fields_sql(BIZCARD_QUERY_TERMS)},
hits AS (
  SELECT b.doc_id, b.owner, b.name, s.score
  FROM scored s JOIN bizcards b ON s.id = b.doc_id
  ORDER BY s.score DESC, b.doc_id ASC LIMIT 10
)
SELECT 'octember_bizcard' AS "_index", 'bizcard' AS "_type",
       doc_id AS "_id", score AS "_score",
       to_json(struct_pack(doc_id := doc_id, owner := owner, name := name)) AS "_source_json"
FROM hits"""

# Streaming pipeline twins: the streaming ingest must land EXACTLY the
# batch-derived tables (same records, keyed merges), so the oracles are
# the batch CTEs — streaming == batch == SQL, one equivalence chain.
ORACLES["streaming_bizcards"] = f"""\
WITH {BIZCARDS_CTES}
SELECT * FROM bizcards"""

ORACLES["streaming_status"] = f"""\
WITH {BIZCARD_LINES_SQL}
SELECT string_split(s3_key, '/')[-1] AS image_id, s3_bucket, s3_key,
       '20240101000000' AS mts, 'END' AS status
FROM bizcard_raw"""

# Converged state of the stateful status machine (streaming/status_state
# .py): max (rank, mts) per image. The incremental operator is the
# non-SQL part; its fixed point is ordinary SQL.
ORACLES["streaming_status_machine"] = """\
WITH se AS (
  SELECT CAST(user_id AS VARCHAR) || '.jpg' AS image_id,
         CASE CAST(event_id % 3 AS INT)
           WHEN 0 THEN 'START' WHEN 1 THEN 'PROCESS' ELSE 'END' END AS status,
         CAST(event_id % 3 AS INT) AS rank,
         strftime(ts, '%Y%m%d%H%M%S') AS mts
  FROM events
)
SELECT image_id, status, rank, mts FROM (
  SELECT *, row_number() OVER (
    PARTITION BY image_id ORDER BY rank DESC, mts DESC
  ) AS rn FROM se
) WHERE rn = 1"""

ORACLES["bizcard_content_dedup"] = f"""\
WITH {BIZCARDS_CTES}
SELECT content_id, min(doc_id) AS canonical_doc_id,
       count(*) AS n_cards, count(DISTINCT owner) AS n_owners
FROM bizcards GROUP BY content_id"""

ORACLES["status_latest"] = """\
SELECT user_id, event_id, event_type, value,
       strftime(ts, '%Y%m%d%H%M%S') AS mts
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
  ) AS rn FROM events
) WHERE rn = 1"""


# ---------------------------------------------------------------------------
# North-star surface: text analysis, dedup family, similarity search
# ---------------------------------------------------------------------------

from .functions.text import LANG_PROFILES, STOPWORDS_EN  # noqa: E402
from .operators.dedup import (  # noqa: E402
    AUG_CORPUS_SQL,
    BANDS,
    MINHASH_A,
    MINHASH_B,
    N_PERM,
    P_MOD,
    ROWS_PER_BAND,
    SHINGLE_DF_CAP,
    SIMHASH_BITS,
)

_TOKS_DOCS = (
    "toksrc AS (SELECT doc_id, "
    + TOKENIZE.format(col="text")
    + " AS tokens FROM documents)"
)
_TOKS_AUG = (
    "toksrc AS (SELECT doc_id, "
    + TOKENIZE.format(col="text")
    + " AS tokens FROM aug)"
)


def _profile_len(words):
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(tokens, x -> list_contains([{lst}], x)))"


_langs = sorted(LANG_PROFILES)
_lang_scores = ",\n    ".join(
    f"{_profile_len(LANG_PROFILES[l])} AS s_{l}" for l in _langs
)
_best = "greatest(" + ", ".join(f"s_{l}" for l in _langs) + ")"
_pred = "CASE WHEN " + _best + " = 0 THEN 'und' " + " ".join(
    f"WHEN s_{l} = {_best} THEN '{l}'" for l in _langs
) + " END"

ORACLES["text_language_id"] = f"""\
WITH {_TOKS_DOCS},
scored AS (
  SELECT doc_id,
    {_lang_scores}
  FROM toksrc
)
SELECT doc_id, {_pred} AS predicted_lang FROM scored"""

_stop_en = _profile_len(STOPWORDS_EN)
ORACLES["text_quality"] = f"""\
WITH {_TOKS_DOCS},
base AS (
  SELECT t.doc_id,
    CAST(length(d.text) AS BIGINT) AS n_chars,
    CAST(len(tokens) AS BIGINT) AS n_tokens,
    CAST(list_sum(list_transform(tokens, x -> length(x))) AS DOUBLE) AS token_chars,
    {_stop_en} AS n_stop
  FROM toksrc t JOIN documents d USING (doc_id)
)
SELECT doc_id, n_chars, n_tokens,
  round(CASE WHEN n_tokens > 0 THEN token_chars / n_tokens ELSE 0.0::DOUBLE END, 6) AS avg_token_len,
  round(CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0::DOUBLE END, 6) AS stopword_ratio,
  round(
    (CASE WHEN n_tokens >= 10 AND n_tokens <= 1000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END)
    + (CASE WHEN (CASE WHEN n_tokens > 0 THEN token_chars / n_tokens ELSE 0.0::DOUBLE END) >= 3
            AND (CASE WHEN n_tokens > 0 THEN token_chars / n_tokens ELSE 0.0::DOUBLE END) <= 10
            THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)
    + (CASE WHEN (CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0::DOUBLE END) > 0
            THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END), 6) AS quality_score
FROM base"""

ORACLES["text_token_counts"] = f"""\
SELECT doc_id,
  CAST(len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\f\\r\\x0B]+'), x -> x <> '')) AS BIGINT) AS n_ws_tokens,
  CAST(len({TOKENIZE.format(col='text')}) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct({TOKENIZE.format(col='text')})) AS BIGINT) AS n_distinct,
  CAST(len(regexp_extract_all(lower(text),
       ' ?[a-z]+| ?[0-9]+| ?[^ \\t\\n\\f\\r\\x0Ba-z0-9]+|[ \\t\\n\\f\\r\\x0B]+')) AS BIGINT)
    AS n_bpe_pretokens
FROM documents"""

ORACLES["text_fingerprint"] = f"""\
WITH {_TOKS_DOCS}
SELECT doc_id,
  md5(array_to_string(list_sort(list_distinct(tokens)), ' ')) AS fingerprint
FROM toksrc"""

# --- hash sampling / splits (operators/sampling.py) ------------------------

_BUCKET = (
    "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000"
)

ORACLES["docs_hash_sample"] = f"""\
SELECT doc_id, lang, source FROM documents
WHERE {_BUCKET} < 2500"""

ORACLES["docs_split_counts"] = f"""\
SELECT split, count(*) AS n FROM (
  SELECT CASE WHEN {_BUCKET} < 8000 THEN 'train'
              WHEN {_BUCKET} < 9000 THEN 'dev'
              ELSE 'test' END AS split
  FROM documents
) GROUP BY split"""

# Balanced per-stratum sample (operators/sampling.py stratified_topn):
# rank within stratum by the keyed md5 bucket (key breaks hash ties).
_CUST_BUCKET = "CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 10000"
ORACLES["customers_balanced_sample"] = f"""\
SELECT c_custkey, c_nationkey FROM (
  SELECT c_custkey, c_nationkey,
    ROW_NUMBER() OVER (
      PARTITION BY c_nationkey
      ORDER BY {_CUST_BUCKET}, c_custkey
    ) AS rk
  FROM customer
) WHERE rk <= 20"""

# --- warehouse analytics (operators/warehouse.py) --------------------------
# Every float SUM goes through DECIMAL(18,6) in BOTH engines (double
# addition is order-dependent; decimal sums are exact), then the
# decimal→double cast is rounded to the measures' true 4dp scale — the
# engines' casts can sit 1 ulp apart (DuckDB divides the int128 by
# 10^scale in double space) and the round collapses both onto one
# double. Avgs divide the ROUNDED sums so their inputs are identical.

_DQTY = "CAST(l_quantity AS DECIMAL(18,6))"
_DPRICE = "CAST(l_extendedprice AS DECIMAL(18,6))"
_DDISC = "CAST(l_discount AS DECIMAL(18,6))"

ORACLES["lineitem_pricing_summary"] = f"""\
SELECT l_returnflag, l_linestatus,
  round(CAST(SUM({_DQTY}) AS DOUBLE), 4) AS sum_qty,
  round(CAST(SUM({_DPRICE}) AS DOUBLE), 4) AS sum_base_price,
  round(CAST(SUM({_DPRICE} * (1 - {_DDISC})) AS DOUBLE), 4) AS sum_disc_price,
  round(round(CAST(SUM({_DQTY}) AS DOUBLE), 4) / count(*), 6) AS avg_qty,
  round(round(CAST(SUM({_DPRICE}) AS DOUBLE), 4) / count(*), 6) AS avg_price,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
GROUP BY l_returnflag, l_linestatus"""

ORACLES["region_revenue"] = f"""\
SELECT r_name,
  round(CAST(SUM({_DPRICE} * (1 - {_DDISC})) AS DOUBLE), 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE year(o_orderdate) = 1997
GROUP BY r_name"""

# --- dedup family ---------------------------------------------------------

# Streaming exact dedup: the emitted hash set is the batch DISTINCT.
ORACLES["streaming_dedup"] = f"""\
WITH {AUG_CORPUS_SQL}
SELECT DISTINCT md5(text) AS text_hash FROM aug"""

ORACLES["dedup_exact"] = f"""\
WITH {AUG_CORPUS_SQL}
SELECT md5(text) AS text_hash, min(doc_id) AS canonical_doc_id,
       count(*) AS n_docs
FROM aug GROUP BY md5(text)"""

# Edit-distance near-dup (operators/dedup.py dedup_editdistance_pairs):
# identical candidate generation (rare character 3-grams of the normalized
# 64-char prefix, df <= 30) + the same Levenshtein DP. DuckDB range(a, b)
# is half-open = Spark sequence(1, len-2) inclusive; the 'g' flag mirrors
# Spark regexp_replace's replace-all default.
ORACLES["dedup_editdistance"] = f"""\
WITH {AUG_CORPUS_SQL},
n AS (
  SELECT doc_id,
         left(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), 64) AS t
  FROM aug
),
n2 AS (SELECT doc_id, t FROM n WHERE length(t) >= 3),
g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, length(t) - 1),
                i -> substr(t, CAST(i AS INT), 3)))) AS g
  FROM n2
),
dfs AS (SELECT g, count(*) AS df FROM g GROUP BY g),
rg AS (SELECT g.doc_id, g.g FROM g JOIN dfs USING (g) WHERE dfs.df <= 30),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM rg a JOIN rg b ON a.g = b.g AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b, levenshtein(na.t, nb.t) AS dist
FROM cand c
JOIN n2 na ON na.doc_id = c.doc_a
JOIN n2 nb ON nb.doc_id = c.doc_b
WHERE levenshtein(na.t, nb.t) <= 2"""

# Weighted PPS sample (operators/sampling.py weighted_sample): identical
# 52-bit md5 uniform (exact int->double) and two correctly-rounded IEEE
# divisions — priorities are bit-identical, so the raw double is safe to
# hash-compare.
ORACLES["docs_weighted_sample"] = """\
SELECT doc_id, n_chars,
  (CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
        AS BIGINT) + 1 AS DOUBLE) / CAST(4503599627370496 AS DOUBLE))
  / CAST(n_chars AS DOUBLE) AS priority
FROM documents
WHERE n_chars > 0
ORDER BY priority ASC, doc_id ASC
LIMIT 64"""

# Trailing 7-day active users (operators/warehouse.py
# rolling_active_users): same contribution-spreading construction —
# distinct user-days, +0..6 day offsets, count distinct per report day.
ORACLES["events_wau"] = """\
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
sp AS (
  SELECT user_id, day + CAST(i AS INT) AS day
  FROM ud, unnest(range(0, 7)) AS t(i)
)
SELECT day, count(DISTINCT user_id) AS active_users
FROM sp GROUP BY day"""

# The HLL monthly rollup's exact twin (operators/sketches.py
# monthly_distinct_users_exact): same monthly scaffold, exact
# COUNT(DISTINCT) — the hash-checkable half of the sketch pair.
ORACLES["events_monthly_users_exact"] = """\
SELECT CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE) AS month,
       count(DISTINCT user_id) AS users
FROM events GROUP BY 1"""

# Range-clustered layout round-trip (sources/clustered.py): the result
# is layout-independent — a plain user_id range filter over events.
ORACLES["events_user_range_pruned"] = """\
SELECT user_id, count(*) AS n, round(sum("value"), 6) AS value_sum
FROM events
WHERE user_id BETWEEN 4 AND 9
GROUP BY user_id"""

_SHINGLE_CTES = f"""\
{_TOKS_AUG},
shing AS (
  SELECT doc_id, unnest(list_distinct(shingles)) AS shingle FROM (
    SELECT doc_id,
      list_transform(range(0, len(tokens) - 2),
                     i -> tokens[i+1] || ' ' || tokens[i+2] || ' ' || tokens[i+3]) AS shingles
    FROM toksrc
  )
),
sizes AS (SELECT doc_id, count(*) AS sz FROM shing GROUP BY doc_id)"""

_mh_aggs = ",\n    ".join(
    f"min(({MINHASH_A[i]} * hp + {MINHASH_B[i]}) % {P_MOD}) AS mh{i}"
    for i in range(N_PERM)
)
_band_rows = "\n  UNION ALL ".join(
    "SELECT doc_id, {b} AS band, substr(md5({cat}), 1, 16) AS sig FROM mh".format(
        b=b,
        cat=" || '_' || ".join(
            f"CAST(mh{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
        ),
    )
    for b in range(BANDS)
)

_VERIFY = """\
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cands c
  JOIN shing sa ON sa.doc_id = c.doc_a
  JOIN shing sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
),
jac AS (
  SELECT i.doc_a, i.doc_b,
    round(CAST(i.i AS DOUBLE) / (za.sz + zb.sz - i.i), 6) AS jaccard
  FROM inter i
  JOIN sizes za ON za.doc_id = i.doc_a
  JOIN sizes zb ON zb.doc_id = i.doc_b
)"""

# mh signatures → banded buckets → candidate pairs (shared by the
# standalone minhash query and the curation pipeline).
_MH_SIGS = f"""\
mh AS (
  SELECT doc_id,
    {_mh_aggs}
  FROM (
    SELECT doc_id,
      CAST(concat('0x', substr(md5(shingle), 1, 15)) AS BIGINT) % {P_MOD} AS hp
    FROM shing
  ) GROUP BY doc_id
),
banded AS (
  {_band_rows}
)"""

_MH_CANDS = f"""\
{_MH_SIGS},
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.sig = b.sig
  WHERE a.doc_id < b.doc_id
)"""

ORACLES["dedup_minhash_lsh"] = f"""\
WITH {AUG_CORPUS_SQL}, {_SHINGLE_CTES},
{_MH_CANDS},
{_VERIFY}
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.5"""

# Streaming incremental MinHash-LSH (streaming/neardup.py): the drained
# stream's converged pair set is the batch operator's — same oracle.
ORACLES["streaming_dedup_minhash"] = ORACLES["dedup_minhash_lsh"]

# Fuzzy cross-split leakage (operators/contamination.py
# neardup_contamination): the near-dup engine's signatures and LSH
# buckets with candidates RESTRICTED to train×test pairs of the hash
# split — paraphrased benchmark leaks the exact-shingle audit misses.
ORACLES["split_neardup_contamination"] = f"""\
WITH {AUG_CORPUS_SQL}, {_SHINGLE_CTES},
{_MH_SIGS},
spl AS (
  SELECT doc_id,
         CASE WHEN {_BUCKET} < 8000 THEN 'train'
              WHEN {_BUCKET} < 9000 THEN 'dev'
              ELSE 'test' END AS split
  FROM aug
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN spl pa ON pa.doc_id = a.doc_id AND pa.split = 'train'
  JOIN banded b ON a.band = b.band AND a.sig = b.sig
  JOIN spl pb ON pb.doc_id = b.doc_id AND pb.split = 'test'
),
{_VERIFY}
SELECT doc_a AS train_doc_id, doc_b AS test_doc_id, jaccard
FROM jac WHERE jaccard >= 0.5"""

# Cluster assignment (operators/components.py): connected components of
# the verified ≥0.5-Jaccard pair graph — min reachable id via a
# recursive label-propagation CTE (UNION dedups, so it reaches the
# transitive-closure fixpoint exactly like the Spark min-propagation).
ORACLES["dedup_clusters"] = f"""\
WITH RECURSIVE {AUG_CORPUS_SQL}, {_SHINGLE_CTES},
{_MH_CANDS},
{_VERIFY},
pairs AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5),
e AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(node, label) AS (
  SELECT DISTINCT a, a FROM e
  UNION
  SELECT e.a, r.label FROM e JOIN reach r ON r.node = e.b
)
SELECT node AS doc_id, min(label) AS cluster_id,
       (min(label) = node) AS is_canonical
FROM reach GROUP BY node"""

# Token-budget shard packing (operators/packing.py): exclusive prefix
# sum of analyzer-token counts over the doc_id total order, floored
# into budget-sized shards. The oracle's single window IS the naive
# form the Spark operator decomposes into a two-phase prefix sum.
ORACLES["docs_token_shards"] = f"""\
WITH t AS (
  SELECT doc_id,
    CAST(len({TOKENIZE.format(col='text')}) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
    COALESCE(SUM(n_tokens) OVER (
      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS ce
  FROM t
)
SELECT doc_id, n_tokens,
  CAST(FLOOR(ce / 10000.0) AS BIGINT) AS shard_id
FROM c"""

# End-to-end curation pipeline (operators/curation.py): independent gate
# predicates (lang, quality, exact-canonical, near-dup drop) + hash split.
# Gate + curated-set CTEs shared by corpus_curation (over the
# dup-augmented corpus) and docs_training_manifest (over the plain
# corpus, aliased aug AS documents) — both bind the same `aug`/`jac`
# upstream names.
_CURATION_GATES = f"""\
scored_lang AS (
  SELECT doc_id,
    {_lang_scores}
  FROM toksrc
),
lang_keep AS (SELECT doc_id FROM scored_lang WHERE {_pred} = 'en'),
qbase AS (
  SELECT doc_id,
    CAST(len(tokens) AS BIGINT) AS n_tokens,
    CAST(list_sum(list_transform(tokens, x -> length(x))) AS DOUBLE) AS token_chars,
    {_stop_en} AS n_stop
  FROM toksrc
),
qual_keep AS (
  SELECT doc_id FROM (
    SELECT doc_id,
      (CASE WHEN n_tokens >= 10 AND n_tokens <= 1000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END)
      + (CASE WHEN n_tokens > 0 AND token_chars / n_tokens >= 3 AND token_chars / n_tokens <= 10 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)
      + (CASE WHEN n_tokens > 0 AND n_stop / n_tokens > 0 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END) AS q
    FROM qbase
  ) WHERE round(q, 6) >= 0.7
),
canon AS (SELECT min(doc_id) AS doc_id FROM aug GROUP BY md5(text)),
dropped AS (SELECT DISTINCT doc_b AS doc_id FROM jac WHERE jaccard >= 0.5),
curated AS (
  SELECT doc_id FROM aug
  WHERE doc_id IN (SELECT doc_id FROM lang_keep)
    AND doc_id IN (SELECT doc_id FROM qual_keep)
    AND doc_id IN (SELECT doc_id FROM canon)
    AND doc_id NOT IN (SELECT doc_id FROM dropped)
)"""

ORACLES["corpus_curation"] = f"""\
WITH {AUG_CORPUS_SQL}, {_SHINGLE_CTES},
{_MH_CANDS},
{_VERIFY},
{_CURATION_GATES}
SELECT doc_id,
  CASE WHEN {_BUCKET} < 8000 THEN 'train'
       WHEN {_BUCKET} < 9000 THEN 'dev'
       ELSE 'test' END AS split
FROM curated"""

# Training manifest (operators/curation.py training_manifest): the
# composed pipeline over the PLAIN corpus — curation gates + split,
# then shard packing (prefix sum, budget 10000) and sqrt-temperature
# mixing boosts computed over the post-curation train split.
ORACLES["docs_training_manifest"] = f"""\
WITH aug AS (SELECT doc_id, text FROM documents), {_SHINGLE_CTES},
{_MH_CANDS},
{_VERIFY},
{_CURATION_GATES},
tr AS (
  SELECT c.doc_id, d.source,
         CAST(len({TOKENIZE.format(col='d.text')}) AS BIGINT) AS n_tokens
  FROM curated c JOIN documents d USING (doc_id)
  WHERE {_BUCKET.replace('doc_id', 'c.doc_id')} < 8000
),
pre AS (
  SELECT doc_id, source, n_tokens,
    COALESCE(SUM(n_tokens) OVER (
      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS ce
  FROM tr
),
per_src AS (
  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS f FROM tr GROUP BY source
),
tot AS (
  SELECT CAST(sum(f) AS DOUBLE) AS tot,
         sum(sqrt(CAST(f AS DOUBLE))) AS tot_a
  FROM per_src
),
mix AS (
  SELECT source,
         round((sqrt(CAST(f AS DOUBLE)) / tot_a) / (f / tot), 9) AS boost
  FROM per_src, tot
)
SELECT p.doc_id, p.source, p.n_tokens,
       CAST(FLOOR(p.ce / 10000.0) AS BIGINT) AS shard_id,
       m.boost AS boost
FROM pre p JOIN mix m USING (source)"""

# USER-GRAIN ordered funnel (operators/warehouse.py funnel_steps):
# greedy-earliest chain view → click → purchase per user, each step's
# min over events strictly after the chosen previous step — the detail
# table whose stage counts the summary query (events_funnel,
# sessionize.funnel_counts) aggregates.
ORACLES["events_funnel_users"] = """\
WITH f1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
f2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN f1 ON f1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > f1.t1
  GROUP BY e.user_id
),
f3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN f2 ON f2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > f2.t2
  GROUP BY e.user_id
)
SELECT f1.user_id, f1.t1, f2.t2, f3.t3,
  CAST(1 + (f2.t2 IS NOT NULL)::INT + (f3.t3 IS NOT NULL)::INT AS INT)
    AS steps_completed
FROM f1
LEFT JOIN f2 ON f2.user_id = f1.user_id
LEFT JOIN f3 ON f3.user_id = f1.user_id"""

# GPT-style sequence packing (operators/packing.py packed_sequences):
# the concatenated token stream cut into fixed-length windows; each
# document's span is pure arithmetic on (exclusive prefix sum, count).
# The oracle's single global window IS the naive form the operator
# decomposes into the two-phase prefix sum.
ORACLES["docs_packed_sequences"] = f"""\
WITH t AS (
  SELECT doc_id,
    CAST(len({TOKENIZE.format(col='text')}) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
    COALESCE(SUM(n_tokens) OVER (
      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS ce
  FROM t
)
SELECT doc_id, n_tokens,
  CAST(CASE WHEN n_tokens > 0 THEN ce // 512 END AS BIGINT) AS start_seq,
  CAST(CASE WHEN n_tokens > 0 THEN ce % 512 END AS BIGINT) AS start_off,
  CAST(CASE WHEN n_tokens > 0 THEN (ce + n_tokens - 1) // 512 END AS BIGINT)
    AS end_seq,
  CAST(CASE WHEN n_tokens > 0
       THEN (ce + n_tokens - 1) // 512 - ce // 512 + 1 END AS BIGINT)
    AS n_seqs
FROM c"""

# Near-dup cluster-size histogram (operators/dedup.py
# dedup_cluster_sizes): the clusters oracle's final SELECT becomes a
# CTE; two aggregates follow.
_CL = ORACLES["dedup_clusters"]
_CL_SPLIT = _CL.rindex("SELECT node AS doc_id")
# keep everything up to (and incl.) the final CTE, append the old final
# SELECT as a named CTE, then the histogram.
ORACLES["dedup_cluster_sizes"] = (
    _CL[:_CL_SPLIT]
    .rstrip()
    .rstrip(",")  # the CTE list ends with ')' — no trailing comma
    + ",\nclusters AS (\n"
    + _CL[_CL_SPLIT:]
    + ")\nSELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters FROM (\n"
    + "  SELECT cluster_id, count(*) AS cluster_size FROM clusters\n"
    + "  GROUP BY cluster_id)\nGROUP BY cluster_size"
)

# Same rare+hot intersection decomposition as dedup_containment (the
# generic _VERIFY re-joins each candidate pair's FULL shingle sets —
# fine for the selective LSH-bucket candidate sets that share it, but
# this oracle's candidates COME FROM the rare self-join, which already
# yields the rare part of the intersection for free; the old form sat
# at ~106 s at sf1 and tipped over the 120 s budget).
ORACLES["dedup_ngram_pairs"] = f"""\
WITH {AUG_CORPUS_SQL}, {_SHINGLE_CTES},
rare AS (
  SELECT shingle FROM shing GROUP BY shingle
  HAVING count(*) <= {SHINGLE_DF_CAP}
),
rare_shared AS (
  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS i_rare
  FROM shing sa
  JOIN rare r ON sa.shingle = r.shingle
  JOIN shing sb ON sb.shingle = sa.shingle
  WHERE sa.doc_id < sb.doc_id
  GROUP BY sa.doc_id, sb.doc_id
),
hot AS (
  SELECT shingle FROM shing GROUP BY shingle
  HAVING count(*) > {SHINGLE_DF_CAP}
),
hot_post AS (
  SELECT s.doc_id, s.shingle FROM shing s JOIN hot h ON s.shingle = h.shingle
),
hot_shared AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i_hot
  FROM rare_shared c
  JOIN hot_post ha ON ha.doc_id = c.doc_a
  JOIN hot_post hb ON hb.doc_id = c.doc_b AND hb.shingle = ha.shingle
  GROUP BY c.doc_a, c.doc_b
),
inter AS (
  SELECT rs.doc_a, rs.doc_b, rs.i_rare + coalesce(hs.i_hot, 0) AS i
  FROM rare_shared rs LEFT JOIN hot_shared hs
    ON hs.doc_a = rs.doc_a AND hs.doc_b = rs.doc_b
),
jac AS (
  SELECT i.doc_a, i.doc_b,
    round(CAST(i.i AS DOUBLE) / (za.sz + zb.sz - i.i), 6) AS jaccard
  FROM inter i
  JOIN sizes za ON za.doc_id = i.doc_a
  JOIN sizes zb ON zb.doc_id = i.doc_b
)
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.3"""

_sim_sums = ",\n    ".join(
    f"sum(tf * (((h32 >> {j}) & 1) * 2 - 1)) AS b{j}" for j in range(SIMHASH_BITS)
)
_sim_fp = " + ".join(
    f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
)
_SIMHASH_CTES = f"""\
tf AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(tokens) AS tok FROM toksrc)
  GROUP BY doc_id, tok
),
sums AS (
  SELECT doc_id,
    {_sim_sums}
  FROM (
    SELECT doc_id, tf,
      CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS h32
    FROM tf
  ) GROUP BY doc_id
),
sh AS (
  SELECT doc_id, CAST({_sim_fp} AS BIGINT) AS simhash FROM sums
)"""

ORACLES["dedup_simhash"] = f"""\
WITH {AUG_CORPUS_SQL}, {_TOKS_AUG},
{_SIMHASH_CTES}
SELECT doc_id, simhash FROM sh"""

ORACLES["dedup_simhash_pairs"] = f"""\
WITH {AUG_CORPUS_SQL}, {_TOKS_AUG},
{_SIMHASH_CTES},
blocked AS (
  {" UNION ALL ".join(f"SELECT doc_id, simhash, {i} AS blk, CAST((simhash >> {8 * i}) & 255 AS INT) AS byte FROM sh" for i in range(4))}
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS fa, b.simhash AS fb
  FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.byte = b.byte
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM (
  SELECT doc_a, doc_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming FROM cands
) WHERE hamming <= 8"""

# --- similarity search ----------------------------------------------------

ANN_QUERY_IDS = [0, 1, 2]
_qid_list = ", ".join(str(i) for i in ANN_QUERY_IDS)

_VEC = """\
vecs AS (
  SELECT vec_id, label,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM {src}
),
norms AS (
  SELECT vec_id, label, v,
    list_sum(list_transform(v, x -> x * x)) AS n2
  FROM vecs
)"""

_DOT = "list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i]))"

# Deterministic k-means (operators/clustering.py): k=4 seeds = smallest
# vec_ids, ONE Lloyd update (iters=2 ⇒ assign→update→assign), d2 and
# centroid means rounded to 6dp, argmin ties → smallest cluster.
_KM_ASSIGN = """\
{out} AS (
  SELECT vec_id, v, n2, cluster FROM (
    SELECT b.vec_id, b.v, b.n2, c.cluster,
      row_number() OVER (
        PARTITION BY b.vec_id
        ORDER BY round(b.n2 + c.cn2 - 2 * {dot}, 6) ASC, c.cluster ASC
      ) AS r
    FROM norms b CROSS JOIN {cents} c
  ) WHERE r = 1
)"""

# The Lloyd chain (seeds -> a1 -> updated centroids -> a2) references
# only the `norms` CTE, so it is shared verbatim by kmeans_assign and
# dedup_semantic (which runs it over the near-dup-augmented vectors).
_KMEANS_CHAIN = (
    """seeds AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS INT) AS cluster,
         v AS centroid, n2 AS cn2
  FROM (SELECT vec_id, v, n2 FROM norms ORDER BY vec_id ASC LIMIT 4)
),
"""
    + _KM_ASSIGN.format(
        out="a1", cents="seeds", dot=_DOT.format(a="b.v", b="c.centroid")
    )
    + """,
m1 AS (
  SELECT cluster, pos, round(avg(x), 6) AS m FROM (
    SELECT cluster, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM a1
  ) GROUP BY cluster, pos
),
c1n AS (
  SELECT cluster, list(m ORDER BY pos) AS centroid FROM m1 GROUP BY cluster
),
c1 AS (
  SELECT s.cluster,
         coalesce(n.centroid, s.centroid) AS centroid,
         list_sum(list_transform(coalesce(n.centroid, s.centroid), x -> x * x)) AS cn2
  FROM seeds s LEFT JOIN c1n n USING (cluster)
),
"""
    + _KM_ASSIGN.format(
        out="a2", cents="c1", dot=_DOT.format(a="b.v", b="c.centroid")
    )
)

ORACLES["kmeans_assign"] = (
    "WITH "
    + _VEC.format(src="embeddings")
    + ",\n"
    + _KMEANS_CHAIN
    + """
SELECT vec_id, CAST(cluster AS INT) AS cluster FROM a2"""
)

# Semantic dedup (operators/dedup.py semantic_dedup): k-means buckets
# the NEAR-dup-augmented vectors (semdedup_aug_embeddings: vec_id%20==0
# copies -> +100000 with the first component shifted +0.01 in double
# space), exact cosine within clusters only, components closure with
# keep-min canonicals.
ORACLES["dedup_semantic"] = (
    """WITH RECURSIVE semaug AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, label,
         [CAST(embedding[1] AS DOUBLE) + 0.01] ||
         list_transform(embedding[2:], x -> CAST(x AS DOUBLE))
  FROM embeddings WHERE vec_id % 20 = 0
),
"""
    + _VEC.format(src="semaug")
    + ",\n"
    + _KMEANS_CHAIN
    + f""",
spairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM a2 a JOIN a2 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE round({_DOT.format(a="a.v", b="b.v")} / (sqrt(a.n2) * sqrt(b.n2)), 6)
        >= 0.9
),
e AS (
  SELECT vec_a AS a, vec_b AS b FROM spairs
  UNION ALL
  SELECT vec_b AS a, vec_a AS b FROM spairs
),
reach(node, label) AS (
  SELECT DISTINCT a, a FROM e
  UNION
  SELECT e.a, r.label FROM e JOIN reach r ON r.node = e.b
)
SELECT CAST(node AS BIGINT) AS vec_id,
       CAST(min(label) AS BIGINT) AS canonical_vec_id,
       (min(label) = node) AS is_canonical
FROM reach GROUP BY node"""
)

ORACLES["ann_bruteforce"] = f"""\
WITH {_VEC.format(src="embeddings")},
q AS (SELECT vec_id AS query_id, v AS qv, n2 AS qn2 FROM norms WHERE vec_id IN ({_qid_list})),
scored AS (
  SELECT q.query_id, n.vec_id AS neighbor_id,
    round({_DOT.format(a="q.qv", b="n.v")} / (sqrt(q.qn2) * sqrt(n.n2)), 6) AS cos
  FROM norms n CROSS JOIN q
  WHERE n.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 10"""

def _ann_ivf_sql(nprobe: int) -> str:
    return f"""\
WITH {_VEC.format(src="embeddings")},
cent AS (
  SELECT label, list(m ORDER BY pos) AS centroid FROM (
    SELECT label, pos, avg(x) AS m FROM (
      SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM vecs
    ) GROUP BY label, pos
  ) GROUP BY label
),
cnorm AS (
  SELECT label, centroid, list_sum(list_transform(centroid, x -> x * x)) AS cn2 FROM cent
),
q AS (SELECT vec_id AS query_id, v AS qv, n2 AS qn2 FROM norms WHERE vec_id IN ({_qid_list})),
qc AS (
  SELECT q.query_id, q.qv, q.qn2, c.label AS probe_label,
    round({_DOT.format(a="q.qv", b="c.centroid")} / (sqrt(q.qn2) * sqrt(c.cn2)), 6) AS ccos
  FROM q CROSS JOIN cnorm c
),
probe AS (
  SELECT query_id, qv, qn2, probe_label FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY ccos DESC, probe_label ASC) AS r
    FROM qc
  ) WHERE r <= {nprobe}
),
scored AS (
  SELECT p.query_id, p.probe_label, n.vec_id AS neighbor_id,
    round({_DOT.format(a="p.qv", b="n.v")} / (sqrt(p.qn2) * sqrt(n.n2)), 6) AS cos
  FROM norms n JOIN probe p ON n.label = p.probe_label
  WHERE n.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, probe_label, neighbor_id, cos,
    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, probe_label, neighbor_id, cos, rank FROM ranked WHERE rank <= 10"""


ORACLES["ann_ivf"] = _ann_ivf_sql(1)
# Incremental index maintenance (streaming/annindex.py): a drained
# stream serves through the shared ivf_serve path — batch ann_ivf's
# twin verbatim.
ORACLES["streaming_ann_ivf"] = ORACLES["ann_ivf"]
# nprobe=2 — the IVF recall knob: each query scans its 2 nearest clusters.
ORACLES["ann_ivf_probe2"] = _ann_ivf_sql(2)

# Batch kNN-join (operators/similarity.py knn_graph): ann_ivf with
# EVERY vector as a query — probe the nearest centroid, exact top-k
# within the probed cell. The naive all-queries form below is the
# semantic spec; the Spark plan assigns probes via a 1-row broadcast
# centroid fold and blocks candidates on the cell equi-join. The CTE
# chain is shared with emb_diversity_prune (rank-1 consumer).
def _knn_ctes(nprobe: int = 1) -> str:
    """The shared seed-graph chain, parametric in the IVF probe count
    (the r13 recall study's second knob)."""
    return f"""\
{_VEC.format(src="embeddings")},
cent AS (
  SELECT label, list(m ORDER BY pos) AS centroid FROM (
    SELECT label, pos, avg(x) AS m FROM (
      SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM vecs
    ) GROUP BY label, pos
  ) GROUP BY label
),
cnorm AS (
  SELECT label, centroid, list_sum(list_transform(centroid, x -> x * x)) AS cn2 FROM cent
),
qc AS (
  SELECT q.vec_id, q.v, q.n2, c.label AS probe_label,
    round({_DOT.format(a="q.v", b="c.centroid")} / (sqrt(q.n2) * sqrt(c.cn2)), 6) AS ccos
  FROM norms q CROSS JOIN cnorm c
),
probe AS (
  SELECT vec_id, v, n2, probe_label FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, probe_label ASC) AS r
    FROM qc
  ) WHERE r <= {int(nprobe)}
),
kscored AS (
  SELECT p.vec_id, n.vec_id AS neighbor_id,
    round({_DOT.format(a="p.v", b="n.v")} / (sqrt(p.n2) * sqrt(n.n2)), 6) AS cos
  FROM norms n JOIN probe p ON n.label = p.probe_label
  WHERE n.vec_id <> p.vec_id
),
kranked AS (
  SELECT vec_id, neighbor_id, cos,
    CAST(row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
  FROM kscored
)"""


_KNN_CTES = _knn_ctes(1)

ORACLES["emb_knn_graph"] = f"""\
WITH {_KNN_CTES}
SELECT vec_id, neighbor_id, cos, rank FROM kranked WHERE rank <= 5"""

# One NN-Descent refinement round (operators/similarity.py knn_refine):
# symmetrize the seed graph with reverse edges capped at k per target
# (cos DESC, vec_id ASC — deterministic in place of NN-Descent's
# sampling), expand to the two-hop neighborhood, union the original
# neighbors, re-score exactly, keep the global top-k. The twin is the
# direct relational form of the same expansion over the shared kranked
# chain.
def _knn_refine_sql(
    levels: int, nprobe: int = 1, k: int = 5, emit: int | None = None
) -> str:
    """``levels`` chained NN-Descent rounds over the shared kranked
    chain — each level symmetrizes (reverse edges capped at ``k``),
    expands two-hop, unions the current edges, re-scores exactly,
    keeps top-``k``. ``nprobe`` parametrizes the seed graph's IVF
    probe; ``emit`` truncates the FINAL graph to its best ``emit``
    ranks (the r13 over-provisioned-build config: build K > serve k).
    rfund/rfg are MATERIALIZED: each is referenced 2-3× downstream and
    an inlined window-over-joins chain re-expands per reference (the
    BPE multi-round oracle lesson)."""
    k = int(k)
    ctes = [
        "rfg0 AS MATERIALIZED ("
        f"SELECT vec_id, neighbor_id, cos FROM kranked WHERE rank <= {k})"
    ]
    for i in range(1, int(levels) + 1):
        src = f"rfg{i - 1}"
        ctes.append(f"""\
rfrev{i} AS (
  SELECT neighbor_id AS vec_id, vec_id AS neighbor_id FROM (
    SELECT vec_id, neighbor_id,
      row_number() OVER (
        PARTITION BY neighbor_id ORDER BY cos DESC, vec_id ASC) AS rr
    FROM {src}
  ) WHERE rr <= {k}
)""")
        ctes.append(f"""\
rfund{i} AS MATERIALIZED (
  SELECT DISTINCT vec_id, neighbor_id FROM (
    SELECT vec_id, neighbor_id FROM {src}
    UNION ALL
    SELECT vec_id, neighbor_id FROM rfrev{i}
  )
)""")
        ctes.append(f"""\
rfcand{i} AS (
  SELECT a.vec_id, b.neighbor_id AS cand_id
  FROM rfund{i} a JOIN rfund{i} b ON a.neighbor_id = b.vec_id
  WHERE a.vec_id <> b.neighbor_id
  UNION
  SELECT vec_id, neighbor_id AS cand_id FROM {src}
)""")
        ctes.append(f"""\
rfsc{i} AS (
  SELECT c.vec_id, c.cand_id AS neighbor_id,
    round({_DOT.format(a="q.v", b="n.v")} / (sqrt(q.n2) * sqrt(n.n2)), 6)
      AS cos
  FROM rfcand{i} c
  JOIN norms q ON q.vec_id = c.vec_id
  JOIN norms n ON n.vec_id = c.cand_id
)""")
        ctes.append(f"""\
rfg{i} AS MATERIALIZED (
  SELECT * FROM (
    SELECT vec_id, neighbor_id, cos,
      CAST(row_number() OVER (
        PARTITION BY vec_id ORDER BY cos DESC, neighbor_id ASC) AS INT)
        AS rank
    FROM rfsc{i}
  ) WHERE rank <= {k}
)""")
    body = ",\n".join(ctes)
    final = f"rfg{int(levels)}"
    emit_pred = f" WHERE rank <= {int(emit)}" if emit is not None else ""
    return f"""\
WITH {_knn_ctes(nprobe)},
{body}
SELECT vec_id, neighbor_id, cos, rank FROM {final}{emit_pred}"""


ORACLES["emb_knn_refined"] = _knn_refine_sql(1)
ORACLES["emb_knn_refined2"] = _knn_refine_sql(2)
# The r13 convergence study's recommended serving config: build the
# graph OVER-PROVISIONED at K=10 on a 2-probe seed (NN-Descent's
# standard build-K > serve-k practice — the k=5 build plateaus at
# recall 0.47/0.60 for nprobe 1/2 because the 4k² candidate pool is
# too small in 64 dims), two rounds, serve the best 5 ranks.
# Measured recall@5 vs brute force: 0.863 (SCALING.md r13 study).
ORACLES["emb_knn_refined_hi"] = _knn_refine_sql(2, nprobe=2, k=10, emit=5)

# kNN-graph diversity pruning (operators/similarity.py
# diversity_prune): redundant iff the rank-1 neighbor is ≥ min_cos
# close AND has a smaller id (keep-min, one survivor per close pair).
ORACLES["emb_diversity_prune"] = f"""\
WITH {_KNN_CTES},
dp_nn AS (
  SELECT vec_id, neighbor_id AS nn_id, cos AS nn_cos
  FROM kranked WHERE rank = 1
)
SELECT e.vec_id, n.nn_id, n.nn_cos,
  coalesce(NOT (n.nn_cos >= CAST(0.4 AS DOUBLE) AND n.nn_id < e.vec_id),
           TRUE) AS keep
FROM (SELECT vec_id FROM embeddings) e
LEFT JOIN dp_nn n ON n.vec_id = e.vec_id"""

# Converged watermarked hourly rollup == batch GROUP BY on hour buckets.
ORACLES["streaming_event_windows"] = """\
SELECT
  epoch_us(date_trunc('hour', ts)) AS window_start_us,
  epoch_us(date_trunc('hour', ts) + INTERVAL 1 HOUR) AS window_end_us,
  event_type,
  count(*) AS n_events,
  round(sum(value), 6) AS value_sum
FROM events
GROUP BY 1, 2, 3"""

# --- sessionization (operators/sessionize.py) ------------------------------

_SESSIONIZE = """\
marked AS (
  SELECT event_id, user_id, ts, event_type, value,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 43200000000
         THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT event_id, user_id, ts, event_type, value,
    CAST(sum(brk) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS INT) AS session_seq
  FROM marked
)"""

ORACLES["events_sessionized"] = f"""\
WITH {_SESSIONIZE}
SELECT event_id, user_id, event_type, value, session_seq,
       CAST(user_id AS VARCHAR) || '-' || CAST(session_seq AS VARCHAR) AS session_id
FROM sess"""

ORACLES["session_stats"] = f"""\
WITH {_SESSIONIZE}
SELECT user_id, session_seq,
  min(epoch_us(ts)) AS start_us,
  max(epoch_us(ts)) AS end_us,
  count(*) AS n_events,
  count(DISTINCT event_type) AS n_event_types,
  round(sum(value), 6) AS value_sum
FROM sess GROUP BY user_id, session_seq"""

# --- multimodal (SGMM container; see operators/multimodal.py) -------------
# The Spark side builds binary blobs, ships them through Arrow to pandas,
# and parses them byte-level; the oracle re-derives every output with pure
# SQL arithmetic — matching hashes prove the binary round-trip is lossless.

_MEDIA_META = """\
media AS (
  SELECT doc_id AS media_id,
    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
    doc_id % 3 AS k
  FROM documents
),
meta AS (
  SELECT media_id, kind,
    CAST(CASE WHEN kind = 'audio' THEN 0 ELSE 16 + media_id % 64 END AS INT) AS width,
    CAST(CASE WHEN kind = 'audio' THEN 0 ELSE 16 + media_id % 48 END AS INT) AS height,
    CAST(CASE WHEN kind = 'video' THEN 8 + media_id % 24
              WHEN kind = 'image' THEN 1 ELSE 0 END AS INT) AS n_frames,
    CAST(64 + media_id % 128 AS INT) AS payload_len,
    substr(repeat(md5('sgmm:' || CAST(media_id AS VARCHAR)),
                  CAST(ceil((64 + media_id % 128) / 32.0) AS INT) + 1),
           1, CAST(64 + media_id % 128 AS INT)) AS payload
  FROM media
)"""

ORACLES["media_decode"] = f"""\
WITH {_MEDIA_META}
SELECT media_id, kind, width, height, n_frames, payload_len FROM meta"""

ORACLES["media_features"] = f"""\
WITH {_MEDIA_META}
SELECT media_id, CAST(i AS INT) AS feature_idx,
  CAST(CAST(concat('0x', substr(md5(payload || ':' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS DOUBLE) / 10000 AS feature
FROM meta CROSS JOIN (SELECT unnest(range(0, 16)) AS i) idx"""

ORACLES["media_resize_decode"] = f"""\
WITH {_MEDIA_META}
SELECT media_id, kind,
  CAST(CASE WHEN width > 0 AND height > 0 AND (width > 32 OR height > 32)
       THEN greatest(1, floor(width * least(32.0 / width, 32.0 / height)))
       ELSE width END AS INT) AS width,
  CAST(CASE WHEN width > 0 AND height > 0 AND (width > 32 OR height > 32)
       THEN greatest(1, floor(height * least(32.0 / width, 32.0 / height)))
       ELSE height END AS INT) AS height,
  n_frames, payload_len
FROM meta"""

ORACLES["media_frame_sample"] = f"""\
WITH {_MEDIA_META}
SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
  substr(md5(CAST(media_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR)), 1, 8) AS frame_id
FROM (SELECT media_id, unnest(range(0, n_frames, 4)) AS frame_idx
      FROM meta WHERE kind = 'video')"""

# Image perceptual hash (operators/multimodal.py image_phash /
# phash_pairs / media_dup_clusters): the SGMM "image" is the w×h grid
# pixel(r,c) = ascii(payload[(r·w+c) mod plen]); variants perturb every
# 17th payload byte by +1. dHash bits compare horizontally-adjacent
# samples of an 8×9 nearest-neighbor downsample; aHash compares each
# 8×8 sample against the integer mean (64·g > Σg). Bits pack into a
# signed BIGINT via a HUGEINT sum (bit 63 is the sign bit — added as
# the MIN_VALUE literal, summed in HUGEINT, cast back); Hamming is
# bit_count(xor(...)), identical two's-complement semantics in both
# engines. The Spark side bands on the 8 hash bytes; hamming ≤ 7 < 8
# blocks guarantees a shared block (pigeonhole), so the banded plan and
# this all-pairs twin return the SAME pair set.
_IMG_PHASH = """\
img AS (
  SELECT doc_id AS media_id, doc_id AS src_id, FALSE AS pert
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 1000000000, doc_id, TRUE
  FROM documents WHERE doc_id % 3 = 0 AND doc_id % 2 = 0
),
imeta AS (
  SELECT media_id, pert,
    CAST(16 + src_id % 64 AS BIGINT) AS w,
    CAST(16 + src_id % 48 AS BIGINT) AS h,
    CAST(64 + src_id % 128 AS BIGINT) AS plen,
    substr(repeat(md5('sgmm:' || CAST(src_id AS VARCHAR)),
                  CAST(ceil((64 + src_id % 128) / 32.0) AS INT) + 1),
           1, CAST(64 + src_id % 128 AS INT)) AS payload
  FROM img
),
dgrid AS (
  SELECT media_id, r, c,
    ascii(substr(payload, CAST((r*h//8*w + c*w//9) % plen + 1 AS INT), 1))
      + CASE WHEN pert AND ((r*h//8*w + c*w//9) % plen) % 17 = 0
             THEN 1 ELSE 0 END AS g
  FROM imeta
  CROSS JOIN (SELECT unnest(range(0, 8)) AS r) rr
  CROSS JOIN (SELECT unnest(range(0, 9)) AS c) cc
),
dbit AS (
  SELECT a.media_id, a.r * 8 + a.c AS k
  FROM dgrid a
  JOIN dgrid b ON b.media_id = a.media_id AND b.r = a.r AND b.c = a.c + 1
  WHERE a.c < 8 AND b.g > a.g
),
dh AS (
  SELECT i.media_id,
    CAST(coalesce(sum(CASE WHEN k = 63
          THEN CAST(-9223372036854775808 AS HUGEINT)
          ELSE CAST(CAST(1 AS BIGINT) << CAST(k AS INT) AS HUGEINT) END), 0)
      AS BIGINT) AS dhash
  FROM imeta i LEFT JOIN dbit ON dbit.media_id = i.media_id
  GROUP BY i.media_id
),
agrid AS (
  SELECT media_id, r, c,
    ascii(substr(payload, CAST((r*h//8*w + c*w//8) % plen + 1 AS INT), 1))
      + CASE WHEN pert AND ((r*h//8*w + c*w//8) % plen) % 17 = 0
             THEN 1 ELSE 0 END AS g
  FROM imeta
  CROSS JOIN (SELECT unnest(range(0, 8)) AS r) rr
  CROSS JOIN (SELECT unnest(range(0, 8)) AS c) cc
),
asum AS (
  SELECT media_id, CAST(sum(g) AS BIGINT) AS s FROM agrid GROUP BY media_id
),
abit AS (
  SELECT g.media_id, g.r * 8 + g.c AS k
  FROM agrid g JOIN asum USING (media_id)
  WHERE 64 * g.g > asum.s
),
ah AS (
  SELECT i.media_id,
    CAST(coalesce(sum(CASE WHEN k = 63
          THEN CAST(-9223372036854775808 AS HUGEINT)
          ELSE CAST(CAST(1 AS BIGINT) << CAST(k AS INT) AS HUGEINT) END), 0)
      AS BIGINT) AS ahash
  FROM imeta i LEFT JOIN abit ON abit.media_id = i.media_id
  GROUP BY i.media_id
),
phash AS (
  SELECT dh.media_id, dh.dhash, ah.ahash FROM dh JOIN ah USING (media_id)
)"""

ORACLES["media_phash"] = f"""\
WITH {_IMG_PHASH}
SELECT media_id, dhash, ahash FROM phash"""

_IMG_PAIRS = """\
ppairs AS (
  SELECT a.media_id AS media_a, b.media_id AS media_b,
    CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
  FROM phash a JOIN phash b ON a.media_id < b.media_id
  WHERE bit_count(xor(a.dhash, b.dhash)) <= 7
)"""

ORACLES["dedup_media_phash"] = f"""\
WITH {_IMG_PHASH},
{_IMG_PAIRS}
SELECT media_a, media_b, hamming FROM ppairs"""

ORACLES["media_dup_clusters"] = f"""\
WITH RECURSIVE {_IMG_PHASH},
{_IMG_PAIRS},
pe AS (
  SELECT media_a AS a, media_b AS b FROM ppairs
  UNION ALL
  SELECT media_b AS a, media_a AS b FROM ppairs
),
preach(node, label) AS (
  SELECT DISTINCT a, a FROM pe
  UNION
  SELECT pe.a, r.label FROM pe JOIN preach r ON r.node = pe.b
)
SELECT node AS media_id, min(label) AS cluster_id,
       (min(label) = node) AS is_canonical
FROM preach GROUP BY node"""

# Video frame-sampled perceptual hashes (operators/multimodal.py
# video_frame_phash / video_dup_pairs): frame f's pixel grid indexes
# payload at (f·1009 + r·w + c) mod plen; dHash per sampled frame
# (stride 4), pair when ≥ 2 ALIGNED positions match within Hamming 7.
# Banding exactness carries over from the image tier (7 < 8 blocks per
# frame), so this all-pairs-per-position twin equals the banded plan.
_VID_PHASH = """\
vid AS (
  SELECT doc_id AS media_id, doc_id AS src_id, FALSE AS pert
  FROM documents WHERE doc_id % 3 = 2
  UNION ALL
  SELECT doc_id + 1000000000, doc_id, TRUE
  FROM documents WHERE doc_id % 3 = 2 AND doc_id % 2 = 0
),
vmeta AS (
  SELECT media_id, pert,
    CAST(16 + src_id % 64 AS BIGINT) AS w,
    CAST(16 + src_id % 48 AS BIGINT) AS h,
    CAST(8 + src_id % 24 AS BIGINT) AS nf,
    CAST(64 + src_id % 128 AS BIGINT) AS plen,
    substr(repeat(md5('sgmm:' || CAST(src_id AS VARCHAR)),
                  CAST(ceil((64 + src_id % 128) / 32.0) AS INT) + 1),
           1, CAST(64 + src_id % 128 AS INT)) AS payload
  FROM vid
),
vframes AS (
  SELECT media_id, pert, w, h, plen, payload, f
  FROM vmeta, unnest(range(0, nf, 4)) AS t(f)
),
vgrid AS (
  SELECT media_id, f, r, c,
    ascii(substr(payload,
      CAST((f*1009 + r*h//8*w + c*w//9) % plen + 1 AS INT), 1))
      + CASE WHEN pert AND ((f*1009 + r*h//8*w + c*w//9) % plen) % 17 = 0
             THEN 1 ELSE 0 END AS g
  FROM vframes
  CROSS JOIN (SELECT unnest(range(0, 8)) AS r) rr
  CROSS JOIN (SELECT unnest(range(0, 9)) AS c) cc
),
vbit AS (
  SELECT a.media_id, a.f, a.r * 8 + a.c AS k
  FROM vgrid a
  JOIN vgrid b ON b.media_id = a.media_id AND b.f = a.f
             AND b.r = a.r AND b.c = a.c + 1
  WHERE a.c < 8 AND b.g > a.g
),
vdh AS (
  SELECT fr.media_id, fr.f,
    CAST(coalesce(sum(CASE WHEN k = 63
          THEN CAST(-9223372036854775808 AS HUGEINT)
          ELSE CAST(CAST(1 AS BIGINT) << CAST(k AS INT) AS HUGEINT) END), 0)
      AS BIGINT) AS dhash
  FROM vframes fr
  LEFT JOIN vbit ON vbit.media_id = fr.media_id AND vbit.f = fr.f
  GROUP BY fr.media_id, fr.f
)"""

ORACLES["media_video_frame_phash"] = f"""\
WITH {_VID_PHASH}
SELECT media_id, CAST(f AS INT) AS frame_idx, dhash FROM vdh"""

ORACLES["dedup_video_pairs"] = f"""\
WITH {_VID_PHASH},
vmatch AS (
  SELECT a.media_id AS media_a, b.media_id AS media_b
  FROM vdh a JOIN vdh b ON a.f = b.f AND a.media_id < b.media_id
  WHERE bit_count(xor(a.dhash, b.dhash)) <= 7
)
SELECT media_a, media_b, CAST(count(*) AS BIGINT) AS n_matched
FROM vmatch GROUP BY media_a, media_b
HAVING count(*) >= 2"""

# Unaligned clip detection (operators/multimodal.py video_clip_pairs
# over synth_media_clip_aug): the clip corpus adds trimmed re-uploads —
# a clip's container carries the ORIGINAL payload rotated by
# (4·1009) mod plen, so its frame f' renders the original's frame
# f'+4 bit-identically; the oracle folds the rotation into the pixel
# index (shf) instead of rotating the string. Pairs group by the
# frame-index offset: a real copy's matches share one offset.
_VID_CLIP_PHASH = """\
cvid AS (
  SELECT doc_id AS media_id, doc_id AS src_id, FALSE AS pert, 0 AS trim
  FROM documents WHERE doc_id % 3 = 2
  UNION ALL
  SELECT doc_id + 1000000000, doc_id, TRUE, 0
  FROM documents WHERE doc_id % 3 = 2 AND doc_id % 2 = 0
  UNION ALL
  SELECT doc_id + 2000000000, doc_id, FALSE, 1
  FROM documents WHERE doc_id % 3 = 2 AND doc_id % 2 = 1
),
cmeta AS (
  SELECT media_id, pert,
    CAST(16 + src_id % 64 AS BIGINT) AS w,
    CAST(16 + src_id % 48 AS BIGINT) AS h,
    CAST(8 + src_id % 24 - CASE WHEN trim = 1 THEN 4 ELSE 0 END AS BIGINT)
      AS nf,
    CAST(64 + src_id % 128 AS BIGINT) AS plen,
    CAST(CASE WHEN trim = 1 THEN (4 * 1009) % (64 + src_id % 128)
         ELSE 0 END AS BIGINT) AS shf,
    substr(repeat(md5('sgmm:' || CAST(src_id AS VARCHAR)),
                  CAST(ceil((64 + src_id % 128) / 32.0) AS INT) + 1),
           1, CAST(64 + src_id % 128 AS INT)) AS payload
  FROM cvid
),
cframes AS (
  SELECT media_id, pert, w, h, plen, shf, payload, f
  FROM cmeta, unnest(range(0, nf, 4)) AS t(f)
),
cgrid AS (
  SELECT media_id, f, r, c,
    ascii(substr(payload,
      CAST((f*1009 + r*h//8*w + c*w//9 + shf) % plen + 1 AS INT), 1))
      + CASE WHEN pert
             AND ((f*1009 + r*h//8*w + c*w//9 + shf) % plen) % 17 = 0
             THEN 1 ELSE 0 END AS g
  FROM cframes
  CROSS JOIN (SELECT unnest(range(0, 8)) AS r) rr
  CROSS JOIN (SELECT unnest(range(0, 9)) AS c) cc
),
cbit AS (
  SELECT a.media_id, a.f, a.r * 8 + a.c AS k
  FROM cgrid a
  JOIN cgrid b ON b.media_id = a.media_id AND b.f = a.f
             AND b.r = a.r AND b.c = a.c + 1
  WHERE a.c < 8 AND b.g > a.g
),
cdh AS (
  SELECT fr.media_id, fr.f,
    CAST(coalesce(sum(CASE WHEN k = 63
          THEN CAST(-9223372036854775808 AS HUGEINT)
          ELSE CAST(CAST(1 AS BIGINT) << CAST(k AS INT) AS HUGEINT) END), 0)
      AS BIGINT) AS dhash
  FROM cframes fr
  LEFT JOIN cbit ON cbit.media_id = fr.media_id AND cbit.f = fr.f
  GROUP BY fr.media_id, fr.f
)"""

ORACLES["dedup_video_clip_pairs"] = f"""\
WITH {_VID_CLIP_PHASH},
cmatch AS (
  SELECT a.media_id AS media_a, b.media_id AS media_b,
    CAST(b.f - a.f AS BIGINT) AS frame_offset
  FROM cdh a JOIN cdh b ON a.media_id < b.media_id
  WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
)
SELECT media_a, media_b, frame_offset,
  CAST(count(*) AS BIGINT) AS n_matched
FROM cmatch GROUP BY media_a, media_b, frame_offset
HAVING count(*) >= 2"""

# Audio windowed fingerprints (operators/multimodal.py
# audio_window_hash / audio_dup_pairs over synth_audio_corpus): sample
# s[t] = ascii(payload[t mod plen]); window w hashes gradient signs of
# the 8×9 patch at w·17; trimming is a payload rotation (shf), the
# video-clip device. Pairs group by window offset.
_AUD_HASH = """\
aud AS (
  SELECT doc_id AS media_id, doc_id AS src_id, FALSE AS pert, 0 AS trim
  FROM documents WHERE doc_id % 3 = 1
  UNION ALL
  SELECT doc_id + 1000000000, doc_id, TRUE, 0
  FROM documents WHERE doc_id % 3 = 1 AND doc_id % 2 = 0
  UNION ALL
  SELECT doc_id + 2000000000, doc_id, FALSE, 1
  FROM documents WHERE doc_id % 3 = 1 AND doc_id % 2 = 1
),
ameta AS (
  SELECT media_id, pert,
    CAST(6 + src_id % 10 - CASE WHEN trim = 1 THEN 3 ELSE 0 END AS BIGINT)
      AS nw,
    CAST(64 + src_id % 128 AS BIGINT) AS plen,
    CAST(CASE WHEN trim = 1 THEN (3 * 17) % (64 + src_id % 128)
         ELSE 0 END AS BIGINT) AS shf,
    substr(repeat(md5('sgmm:' || CAST(src_id AS VARCHAR)),
                  CAST(ceil((64 + src_id % 128) / 32.0) AS INT) + 1),
           1, CAST(64 + src_id % 128 AS INT)) AS payload
  FROM aud
),
awin AS (
  SELECT media_id, pert, plen, shf, payload, w
  FROM ameta, unnest(range(0, nw)) AS t(w)
),
agrid AS (
  SELECT media_id, w, r, c,
    ascii(substr(payload,
      CAST((w*17 + r*9 + c + shf) % plen + 1 AS INT), 1))
      + CASE WHEN pert AND ((w*17 + r*9 + c + shf) % plen) % 17 = 0
             THEN 1 ELSE 0 END AS g
  FROM awin
  CROSS JOIN (SELECT unnest(range(0, 8)) AS r) rr
  CROSS JOIN (SELECT unnest(range(0, 9)) AS c) cc
),
abit AS (
  SELECT a.media_id, a.w, a.r * 8 + a.c AS k
  FROM agrid a
  JOIN agrid b ON b.media_id = a.media_id AND b.w = a.w
             AND b.r = a.r AND b.c = a.c + 1
  WHERE a.c < 8 AND b.g > a.g
),
adh AS (
  SELECT wn.media_id, wn.w,
    CAST(coalesce(sum(CASE WHEN k = 63
          THEN CAST(-9223372036854775808 AS HUGEINT)
          ELSE CAST(CAST(1 AS BIGINT) << CAST(k AS INT) AS HUGEINT) END), 0)
      AS BIGINT) AS whash
  FROM awin wn
  LEFT JOIN abit ON abit.media_id = wn.media_id AND abit.w = wn.w
  GROUP BY wn.media_id, wn.w
)"""

ORACLES["media_audio_fingerprints"] = f"""\
WITH {_AUD_HASH}
SELECT media_id, CAST(w AS INT) AS window_idx, whash FROM adh"""

ORACLES["dedup_audio_pairs"] = f"""\
WITH {_AUD_HASH},
amatch AS (
  SELECT a.media_id AS media_a, b.media_id AS media_b,
    CAST(b.w - a.w AS BIGINT) AS window_offset
  FROM adh a JOIN adh b ON a.media_id < b.media_id
  WHERE bit_count(xor(a.whash, b.whash)) <= 3
)
SELECT media_a, media_b, window_offset,
  CAST(count(*) AS BIGINT) AS n_matched
FROM amatch GROUP BY media_a, media_b, window_offset
HAVING count(*) >= 2"""

# Unified AV training manifest (operators/curation.py
# media_training_manifest_av): duration/aspect gates → per-modality
# copy closures (video = aligned re-encode ∪ offset-consistent clip
# edges over the clip corpus; audio = offset-consistent edges) →
# canonical (min-id) survivors → per-source quota over BOTH modalities
# → byte-budget prefix-sum shards over the unified media_id order.
ORACLES["media_training_manifest_av"] = f"""\
WITH RECURSIVE {_VID_CLIP_PHASH},
{_AUD_HASH},
avvp AS (
  SELECT a.media_id AS media_a, b.media_id AS media_b
  FROM cdh a JOIN cdh b ON a.f = b.f AND a.media_id < b.media_id
  WHERE bit_count(xor(a.dhash, b.dhash)) <= 7
  GROUP BY a.media_id, b.media_id
  HAVING count(*) >= 2
),
avcp AS (
  SELECT media_a, media_b FROM (
    SELECT a.media_id AS media_a, b.media_id AS media_b, b.f - a.f AS off
    FROM cdh a JOIN cdh b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
  ) GROUP BY media_a, media_b, off
  HAVING count(*) >= 2
),
avve AS (
  SELECT media_a, media_b FROM avvp
  UNION
  SELECT media_a, media_b FROM avcp
),
avvpe AS (
  SELECT media_a AS a, media_b AS b FROM avve
  UNION ALL
  SELECT media_b AS a, media_a AS b FROM avve
),
avvreach(node, label) AS (
  SELECT DISTINCT a, a FROM avvpe
  UNION
  SELECT avvpe.a, r.label FROM avvpe JOIN avvreach r ON r.node = avvpe.b
),
avvnc AS (
  SELECT node AS media_id FROM avvreach GROUP BY node
  HAVING min(label) <> node
),
avae AS (
  SELECT DISTINCT media_a, media_b FROM (
    SELECT a.media_id AS media_a, b.media_id AS media_b, b.w - a.w AS off
    FROM adh a JOIN adh b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.whash, b.whash)) <= 3
    ) GROUP BY media_a, media_b, off
    HAVING count(*) >= 2
),
avape AS (
  SELECT media_a AS a, media_b AS b FROM avae
  UNION ALL
  SELECT media_b AS a, media_a AS b FROM avae
),
avareach(node, label) AS (
  SELECT DISTINCT a, a FROM avape
  UNION
  SELECT avape.a, r.label FROM avape JOIN avareach r ON r.node = avape.b
),
avanc AS (
  SELECT node AS media_id FROM avareach GROUP BY node
  HAVING min(label) <> node
),
avkept AS (
  SELECT media_id, 'video' AS kind, CAST(plen AS BIGINT) AS n_bytes
  FROM cmeta
  WHERE greatest(w, h) <= 2 * least(w, h) AND nf >= 6
    AND media_id NOT IN (SELECT media_id FROM avvnc)
  UNION ALL
  SELECT media_id, 'audio', CAST(plen AS BIGINT)
  FROM ameta
  WHERE nw >= 4
    AND media_id NOT IN (SELECT media_id FROM avanc)
),
avsrc AS (
  SELECT k.media_id, k.kind, k.n_bytes, d.source
  FROM avkept k JOIN documents d
    ON d.doc_id = CASE
      WHEN k.media_id >= 2000000000 THEN k.media_id - 2000000000
      WHEN k.media_id >= 1000000000 THEN k.media_id - 1000000000
      ELSE k.media_id END
),
avq AS (
  SELECT media_id, kind, n_bytes, source FROM (
    SELECT media_id, kind, n_bytes, source,
      row_number() OVER (PARTITION BY source
        ORDER BY md5(CAST(media_id AS VARCHAR)), media_id) AS rk
    FROM avsrc
  ) WHERE rk <= 20
),
avpre AS (
  SELECT media_id, kind, source, n_bytes,
    COALESCE(SUM(n_bytes) OVER (
      ORDER BY media_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS ce
  FROM avq
)
SELECT media_id, kind, source, CAST(n_bytes AS BIGINT) AS n_bytes,
  CAST(FLOOR(ce / 4096.0) AS BIGINT) AS shard_id
FROM avpre"""

# Media training manifest (operators/curation.py
# media_training_manifest): the image-side curation composition —
# aspect + feature-score gates, pHash-canonical survivors, per-source
# quota (cap 20, md5 preference), byte-budget prefix-sum shards
# (budget 4096). The feature score is the mean of the 16 md5-derived
# features (media_features' arithmetic), rounded 6dp before the gate.
ORACLES["media_training_manifest"] = f"""\
WITH RECURSIVE {_IMG_PHASH},
{_IMG_PAIRS},
pe AS (
  SELECT media_a AS a, media_b AS b FROM ppairs
  UNION ALL
  SELECT media_b AS a, media_a AS b FROM ppairs
),
preach(node, label) AS (
  SELECT DISTINCT a, a FROM pe
  UNION
  SELECT pe.a, r.label FROM pe JOIN preach r ON r.node = pe.b
),
noncanon AS (
  SELECT node AS media_id FROM preach GROUP BY node
  HAVING min(label) <> node
),
fscore AS (
  -- Hash the bytes the Spark side actually hashes: re-encode variants
  -- carry the PERTURBED payload (+1 on every 17th byte, mirroring
  -- dgrid/agrid's arithmetic), so the feature score must be computed
  -- from the perturbed string too — regardless of whether the variant
  -- later pairs with its base (ADVICE r11, medium).
  SELECT media_id,
    round(list_sum(list_transform(range(0, 16), i ->
      CAST(CAST(concat('0x', substr(md5(ppayload || ':' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS DOUBLE) / 10000))
      / CAST(16 AS DOUBLE), 6) AS score
  FROM (
    SELECT media_id,
      CASE WHEN pert THEN array_to_string(
        list_transform(range(0, CAST(plen AS INT)), j ->
          chr(ascii(substr(payload, CAST(j AS INT) + 1, 1))
              + CASE WHEN j % 17 = 0 THEN 1 ELSE 0 END)), '')
      ELSE payload END AS ppayload
    FROM imeta
  )
),
gated AS (
  SELECT m.media_id, m.plen
  FROM imeta m JOIN fscore f USING (media_id)
  WHERE greatest(m.w, m.h) <= 2 * least(m.w, m.h)
    AND f.score >= CAST(0.45 AS DOUBLE)
    AND m.media_id NOT IN (SELECT media_id FROM noncanon)
),
srcd AS (
  SELECT g.media_id, g.plen, d.source
  FROM gated g JOIN documents d
    ON d.doc_id = CASE WHEN g.media_id >= 1000000000
                  THEN g.media_id - 1000000000 ELSE g.media_id END
),
mquota AS (
  SELECT media_id, plen, source FROM (
    SELECT media_id, plen, source,
      row_number() OVER (
        PARTITION BY source
        ORDER BY md5(CAST(media_id AS VARCHAR)), media_id) AS rk
    FROM srcd
  ) WHERE rk <= 20
),
mpre AS (
  SELECT media_id, source, plen,
    COALESCE(SUM(plen) OVER (
      ORDER BY media_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS ce
  FROM mquota
)
SELECT media_id, source, CAST(plen AS BIGINT) AS n_bytes,
  CAST(FLOOR(ce / 4096.0) AS BIGINT) AS shard_id
FROM mpre"""

# Cross-modal unified training manifest (operators/curation.py
# training_manifest_unified): the three modality unit streams — the
# SAME gated/deduped pre-quota survivors the standalone manifests use —
# under composite identity uid = kind || '#' || id, ONE per-source
# quota across all modalities (cap 20, md5(uid) preference), ONE
# byte-budget prefix-sum shard stream in uid order; text weighs in at
# octet_length bytes. The audio fragment rides in with its two CTE
# names that collide with the image fragment (agrid/abit) prefixed.
_AUD_HASH_U = _AUD_HASH.replace("agrid", "au_grid").replace(
    "abit", "au_bit"
)
ORACLES["training_manifest_unified"] = f"""\
WITH RECURSIVE aug AS (SELECT doc_id, text FROM documents), {_SHINGLE_CTES},
{_MH_CANDS},
{_VERIFY},
{_CURATION_GATES},
utext AS (
  SELECT 'text' AS kind, CAST(c.doc_id AS BIGINT) AS unit_id, d.source,
    CAST(strlen(d.text) AS BIGINT) AS n_bytes
  FROM curated c JOIN documents d USING (doc_id)
  WHERE {_BUCKET.replace('doc_id', 'c.doc_id')} < 8000
),
{_IMG_PHASH},
{_IMG_PAIRS},
pe AS (
  SELECT media_a AS a, media_b AS b FROM ppairs
  UNION ALL
  SELECT media_b AS a, media_a AS b FROM ppairs
),
preach(node, label) AS (
  SELECT DISTINCT a, a FROM pe
  UNION
  SELECT pe.a, r.label FROM pe JOIN preach r ON r.node = pe.b
),
noncanon AS (
  SELECT node AS media_id FROM preach GROUP BY node
  HAVING min(label) <> node
),
fscore AS (
  SELECT media_id,
    round(list_sum(list_transform(range(0, 16), i ->
      CAST(CAST(concat('0x', substr(md5(ppayload || ':' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS DOUBLE) / 10000))
      / CAST(16 AS DOUBLE), 6) AS score
  FROM (
    SELECT media_id,
      CASE WHEN pert THEN array_to_string(
        list_transform(range(0, CAST(plen AS INT)), j ->
          chr(ascii(substr(payload, CAST(j AS INT) + 1, 1))
              + CASE WHEN j % 17 = 0 THEN 1 ELSE 0 END)), '')
      ELSE payload END AS ppayload
    FROM imeta
  )
),
uimg AS (
  SELECT 'image' AS kind, m.media_id AS unit_id, d.source,
    CAST(m.plen AS BIGINT) AS n_bytes
  FROM imeta m JOIN fscore f USING (media_id)
  JOIN documents d
    ON d.doc_id = CASE WHEN m.media_id >= 1000000000
                  THEN m.media_id - 1000000000 ELSE m.media_id END
  WHERE greatest(m.w, m.h) <= 2 * least(m.w, m.h)
    AND f.score >= CAST(0.45 AS DOUBLE)
    AND m.media_id NOT IN (SELECT media_id FROM noncanon)
),
{_VID_CLIP_PHASH},
{_AUD_HASH_U},
avvp AS (
  SELECT a.media_id AS media_a, b.media_id AS media_b
  FROM cdh a JOIN cdh b ON a.f = b.f AND a.media_id < b.media_id
  WHERE bit_count(xor(a.dhash, b.dhash)) <= 7
  GROUP BY a.media_id, b.media_id
  HAVING count(*) >= 2
),
avcp AS (
  SELECT media_a, media_b FROM (
    SELECT a.media_id AS media_a, b.media_id AS media_b, b.f - a.f AS off
    FROM cdh a JOIN cdh b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
  ) GROUP BY media_a, media_b, off
  HAVING count(*) >= 2
),
avve AS (
  SELECT media_a, media_b FROM avvp
  UNION
  SELECT media_a, media_b FROM avcp
),
avvpe AS (
  SELECT media_a AS a, media_b AS b FROM avve
  UNION ALL
  SELECT media_b AS a, media_a AS b FROM avve
),
avvreach(node, label) AS (
  SELECT DISTINCT a, a FROM avvpe
  UNION
  SELECT avvpe.a, r.label FROM avvpe JOIN avvreach r ON r.node = avvpe.b
),
avvnc AS (
  SELECT node AS media_id FROM avvreach GROUP BY node
  HAVING min(label) <> node
),
avae AS (
  SELECT DISTINCT media_a, media_b FROM (
    SELECT a.media_id AS media_a, b.media_id AS media_b, b.w - a.w AS off
    FROM adh a JOIN adh b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.whash, b.whash)) <= 3
    ) GROUP BY media_a, media_b, off
    HAVING count(*) >= 2
),
avape AS (
  SELECT media_a AS a, media_b AS b FROM avae
  UNION ALL
  SELECT media_b AS a, media_a AS b FROM avae
),
avareach(node, label) AS (
  SELECT DISTINCT a, a FROM avape
  UNION
  SELECT avape.a, r.label FROM avape JOIN avareach r ON r.node = avape.b
),
avanc AS (
  SELECT node AS media_id FROM avareach GROUP BY node
  HAVING min(label) <> node
),
uav AS (
  SELECT k.kind, k.media_id AS unit_id, d.source, k.n_bytes
  FROM (
    SELECT media_id, 'video' AS kind, CAST(plen AS BIGINT) AS n_bytes
    FROM cmeta
    WHERE greatest(w, h) <= 2 * least(w, h) AND nf >= 6
      AND media_id NOT IN (SELECT media_id FROM avvnc)
    UNION ALL
    SELECT media_id, 'audio', CAST(plen AS BIGINT)
    FROM ameta
    WHERE nw >= 4
      AND media_id NOT IN (SELECT media_id FROM avanc)
  ) k JOIN documents d
    ON d.doc_id = CASE
      WHEN k.media_id >= 2000000000 THEN k.media_id - 2000000000
      WHEN k.media_id >= 1000000000 THEN k.media_id - 1000000000
      ELSE k.media_id END
),
uunits AS (
  SELECT kind, unit_id, source, n_bytes,
    kind || '#' || CAST(unit_id AS VARCHAR) AS uid
  FROM (
    SELECT * FROM utext
    UNION ALL SELECT * FROM uimg
    UNION ALL SELECT * FROM uav
  )
),
uquota AS (
  SELECT kind, unit_id, source, n_bytes, uid FROM (
    SELECT *, row_number() OVER (
      PARTITION BY source ORDER BY md5(uid), uid) AS rk
    FROM uunits
  ) WHERE rk <= 20
),
upre AS (
  SELECT kind, unit_id, source, n_bytes,
    COALESCE(SUM(n_bytes) OVER (
      ORDER BY uid ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS ce
  FROM uquota
)
SELECT kind, unit_id, source, CAST(n_bytes AS BIGINT) AS n_bytes,
  CAST(FLOOR(ce / 4096.0) AS BIGINT) AS shard_id
FROM upre"""

ORACLES["dedup_embedding"] = f"""\
WITH aug_emb AS (
  SELECT vec_id, label, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, label, embedding
  FROM embeddings WHERE vec_id % 20 = 0
),
{_VEC.format(src="aug_emb")}
SELECT vec_a, vec_b, cos FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
    round({_DOT.format(a="a.v", b="b.v")} / (sqrt(a.n2) * sqrt(b.n2)), 6) AS cos
  FROM norms a JOIN norms b ON a.label = b.label AND a.vec_id < b.vec_id
) WHERE cos >= 0.99"""

# Incremental index maintenance (search/incremental.py): the corpus is
# upserted batch-by-batch through the ES create-or-replace maintainer; a
# drained maintainer's serving state must equal from-scratch search over
# the whole corpus — so the query shares search_bizcards' oracle verbatim.
ORACLES["streaming_search_bizcards"] = ORACLES["search_bizcards"]

# As-of join (operators/asof.py): window twin of the union+window plan —
# identical total order (ats, is_l, tb NULLS FIRST) so ties resolve the
# same way in both engines; epoch_us mirrors the session_stats pattern.
ORACLES["events_asof_last_click"] = """\
WITH errors AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
),
clicks AS (
  SELECT event_id, user_id, ts, "value" FROM events WHERE event_type = 'click'
),
tagged AS (
  SELECT user_id, ts AS ats, 1 AS is_l, CAST(NULL AS BIGINT) AS tb,
         event_id, CAST(NULL AS BIGINT) AS c_id, CAST(NULL AS DOUBLE) AS c_val
  FROM errors
  UNION ALL
  SELECT user_id, ts, 0, event_id, NULL, event_id, "value" FROM clicks
),
filled AS (
  SELECT user_id, ats, is_l, event_id,
         last_value(c_id IGNORE NULLS) OVER w AS last_click_id,
         last_value(c_val IGNORE NULLS) OVER w AS last_click_value
  FROM tagged
  WINDOW w AS (PARTITION BY user_id
               ORDER BY ats ASC, is_l ASC, tb ASC NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, epoch_us(ats) AS error_ts_us,
       last_click_id, last_click_value
FROM filled WHERE is_l = 1"""

# Bounded range join (operators/rangejoin.py): the oracle is the direct
# inequality join — DuckDB optimizes range predicates natively, Spark
# needs the bucketize-equi-join device; both must produce the same pairs.
ORACLES["events_error_click_pairs_5m"] = """\
SELECT e.event_id, e.user_id,
       epoch_us(e.ts) AS error_ts_us,
       c.event_id AS click_id,
       epoch_us(c.ts) AS click_ts_us
FROM events e
JOIN events c
  ON c.user_id = e.user_id
 AND c.ts >= e.ts - INTERVAL '300 seconds'
 AND c.ts <= e.ts
WHERE e.event_type = 'error' AND c.event_type = 'click'"""

# One-pass ROLLUP (operators/warehouse.py pricing_rollup): detail rows +
# per-returnflag subtotals + grand total; GROUPING bitmask conventions
# agree between engines (first column = MSB), verified empirically.
ORACLES["lineitem_pricing_rollup"] = """\
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_qty,
       count(*) AS count_order,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-31'
GROUP BY ROLLUP (l_returnflag, l_linestatus)"""

# Exact continuous percentiles (operators/warehouse.py value_percentiles):
# Spark `percentile` and DuckDB `quantile_cont` share the sort +
# linear-interpolation definition; 6dp round collapses ulp divergence.
ORACLES["events_value_percentiles"] = """\
SELECT event_type,
  round(quantile_cont("value", 0.5), 6) AS p50,
  round(quantile_cont("value", 0.9), 6) AS p90,
  round(quantile_cont("value", 0.99), 6) AS p99,
  count(*) AS n
FROM events GROUP BY event_type"""

# Winsorization report (operators/warehouse.py winsorized_stats): same
# rounded-bounds-then-clamp construction; quantile_cont ≡ Spark's exact
# percentile.
ORACLES["events_value_winsorized"] = """\
WITH b AS (
  SELECT event_type,
         round(quantile_cont("value", 0.01), 6) AS lo,
         round(quantile_cont("value", 0.99), 6) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type, min(b.lo) AS lo, min(b.hi) AS hi,
  CAST(sum(CASE WHEN e."value" < b.lo THEN 1 ELSE 0 END) AS BIGINT)
    AS n_clipped_low,
  CAST(sum(CASE WHEN e."value" > b.hi THEN 1 ELSE 0 END) AS BIGINT)
    AS n_clipped_high,
  round(sum(least(greatest(e."value", b.lo), b.hi)), 6) / count(*)
    AS winsorized_mean
FROM events e JOIN b USING (event_type)
GROUP BY e.event_type"""

# Within-type z-scores (operators/warehouse.py group_zscores): moments
# rounded at the same declared edges (Σv at 6dp, Σv² at 4dp); every
# later step is one correctly-rounded IEEE op, so the 6dp z matches.
ORACLES["events_zscores"] = """\
WITH m AS (
  SELECT event_type, count(*) AS n,
         round(sum("value"), 6) AS s,
         round(sum("value" * "value"), 4) AS ssq
  FROM events GROUP BY event_type
),
st AS (
  SELECT event_type, s / n AS mean,
         sqrt(greatest((ssq - s * s / n) / (n - 1), 0)) AS std
  FROM m
)
SELECT e.event_id, e.event_type,
       round((e."value" - st.mean) / st.std, 6) AS z
FROM events e JOIN st USING (event_type)"""

# Monthly revenue growth (operators/warehouse.py monthly_revenue_growth):
# identical month aggregate + calendar self-joins; decimal revenue at
# the 4dp edge, growth at 6dp.
ORACLES["orders_monthly_growth"] = """\
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4)
           AS revenue
  FROM orders GROUP BY 1
)
SELECT m.month, m.revenue,
       round((m.revenue - p.revenue) / p.revenue, 6) AS mom_pct,
       round((m.revenue - y.revenue) / y.revenue, 6) AS yoy_pct
FROM m
LEFT JOIN m p ON m.month = CAST(p.month + INTERVAL 1 MONTH AS DATE)
LEFT JOIN m y ON m.month = CAST(y.month + INTERVAL 12 MONTH AS DATE)"""

# Stream-stream windowed join (streaming/joins.py): a drained stream
# must emit exactly the batch bounded_range_join pair set — the oracle
# is shared verbatim.
ORACLES["streaming_error_click_pairs"] = ORACLES["events_error_click_pairs_5m"]

# LEFT OUTER stream-stream windowed join (streaming/joins.py,
# how="leftOuter"): the batch LEFT JOIN with the same pre-filtered
# sides and range condition — unmatched errors carry NULL click cols.
ORACLES["streaming_error_click_left"] = """\
WITH e AS (SELECT * FROM events WHERE event_type = 'error'),
c AS (SELECT * FROM events WHERE event_type = 'click')
SELECT e.event_id, e.user_id,
       epoch_us(e.ts) AS error_ts_us,
       c.event_id AS click_id,
       epoch_us(c.ts) AS click_ts_us
FROM e
LEFT JOIN c
  ON c.user_id = e.user_id
 AND c.ts >= e.ts - INTERVAL '300 seconds'
 AND c.ts <= e.ts"""


# ---------------------------------------------------------------------------
# Round-5 additions: graph analytics, SCD2 history, contamination audit,
# corpus vocabulary head, Markov transitions
# ---------------------------------------------------------------------------

# Triangle count (graph/triangles.py): the oracle uses the simple
# id-ordered triple join (a<b<c, each triangle exactly once); the Spark
# plan's degree-ordered orientation is a physical choice that cannot
# change the count. Wedges = sum d(d-1)/2 over undirected degrees.
ORACLES["graph_triangles"] = f"""\
WITH {EDGES_SQL},
e AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst
),
deg AS (
  SELECT v, count(*) AS d
  FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) GROUP BY v
),
tri AS (
  SELECT count(*) AS triangle_count
  FROM e e1 JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
wed AS (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) AS wedge_count FROM deg)
SELECT CAST(triangle_count AS BIGINT) AS triangle_count,
       wedge_count,
       CASE WHEN wedge_count = 0 THEN 0.0
            ELSE round(3.0 * triangle_count / wedge_count, 6)
       END AS clustering_coeff
FROM tri, wed"""

# SCD2 history (operators/scd.py): run-starts via lag-change filter, then
# lead over the surviving rows — identical total order (ts, event_id) on
# both engines; open runs have NULL valid_to_us and is_current = true.
ORACLES["status_history_scd2"] = """\
WITH runs AS (
  SELECT event_id, user_id, ts, event_type FROM (
    SELECT event_id, user_id, ts, event_type,
           lag(event_type) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ) AS prev_type
    FROM events
  ) WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT event_id, user_id, event_type,
       epoch_us(ts) AS valid_from_us,
       epoch_us(lead(ts) OVER w) AS valid_to_us,
       (lead(ts) OVER w IS NULL) AS is_current
FROM runs
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)"""

# Train/test contamination (operators/contamination.py): 8-token shingles
# hashed to the 64-bit md5 prefix on BOTH engines, train side reduced to
# the distinct shingle set, zero-overlap test docs kept via left join.
_SHINGLE8 = (
    "list_distinct(list_transform("
    "range(0, greatest(len(tokens) - 7, 0)), "
    "i -> substr(md5(array_to_string(tokens[i+1:i+8], ' ')), 1, 16)))"
)
ORACLES["split_contamination"] = f"""\
WITH toksrc AS (
  SELECT doc_id, {TOKENIZE.format(col='text')} AS tokens,
         CASE WHEN {_BUCKET} < 8000 THEN 'train'
              WHEN {_BUCKET} < 9000 THEN 'dev'
              ELSE 'test' END AS split
  FROM documents
),
shingled AS (SELECT doc_id, split, {_SHINGLE8} AS shs FROM toksrc),
test_docs AS (
  SELECT doc_id, CAST(len(shs) AS BIGINT) AS n_shingles, shs
  FROM shingled WHERE split = 'test'
),
test_sh AS (SELECT doc_id, unnest(shs) AS sh FROM test_docs),
train_sh AS (
  SELECT DISTINCT unnest(shs) AS sh FROM shingled WHERE split = 'train'
),
hits AS (
  SELECT doc_id, count(*) AS n_overlap
  FROM test_sh JOIN train_sh USING (sh) GROUP BY doc_id
)
SELECT t.doc_id, t.n_shingles,
       coalesce(h.n_overlap, 0) AS n_overlap,
       coalesce(h.n_overlap, 0) > 0 AS contaminated
FROM test_docs t LEFT JOIN hits h ON t.doc_id = h.doc_id"""

# Decontaminated train split (operators/contamination.py
# decontaminated_train): drop train docs sharing any 8-shingle with the
# test split; survivors with their shingle counts.
ORACLES["split_decontaminated_train"] = f"""\
WITH toksrc AS (
  SELECT doc_id, {TOKENIZE.format(col='text')} AS tokens,
         CASE WHEN {_BUCKET} < 8000 THEN 'train'
              WHEN {_BUCKET} < 9000 THEN 'dev'
              ELSE 'test' END AS split
  FROM documents
),
shingled AS (SELECT doc_id, split, {_SHINGLE8} AS shs FROM toksrc),
train_docs AS (
  SELECT doc_id, CAST(len(shs) AS BIGINT) AS n_shingles, shs
  FROM shingled WHERE split = 'train'
),
test_sh AS (
  SELECT DISTINCT unnest(shs) AS sh FROM shingled WHERE split = 'test'
),
bad AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest(shs) AS sh FROM train_docs)
  JOIN test_sh USING (sh)
)
SELECT doc_id, n_shingles FROM train_docs
WHERE doc_id NOT IN (SELECT doc_id FROM bad)"""

# Corpus vocabulary head (functions/text.py document_frequency_topk):
# declared tie order df desc, token asc.
ORACLES["docs_top_terms"] = f"""\
WITH toksrc AS (
  SELECT doc_id, {TOKENIZE.format(col='text')} AS tokens FROM documents
)
SELECT token, count(*) AS df
FROM (SELECT doc_id, unnest(list_distinct(tokens)) AS token FROM toksrc)
GROUP BY token
ORDER BY df DESC, token ASC
LIMIT 50"""

# Per-user event-type transitions (operators/sessionize.py
# transition_counts): first events transition from the '^' start state.
ORACLES["events_transitions"] = """\
SELECT coalesce(prev_type, '^') AS prev_type, event_type,
       count(*) AS n
FROM (
  SELECT event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         ) AS prev_type
  FROM events
)
GROUP BY 1, 2"""

# PageRank (graph/rank.py): K=3 damped supersteps unrolled as CTE rounds
# over the bag-symmetrized view (BI_SQL multiplicity — both() bag
# semantics); rank normalized to mean 1.0 and rounded to 6dp, ordered by
# the ROUNDED value then id so ulp-level float-sum divergence between
# engines cannot reorder the top-k.
_PR_ROUNDS = "".join(
    f""",
r{k + 1} AS (
  SELECT deg.id, deg.d, 0.15 / (SELECT n FROM nv) + 0.85 * agg.s AS r
  FROM deg JOIN (
    SELECT bi.dst AS id, sum(p.r / p.d) AS s
    FROM bi JOIN r{k} p ON bi.src = p.id GROUP BY bi.dst
  ) agg ON agg.id = deg.id
)"""
    for k in range(3)
)
ORACLES["graph_pagerank_top20"] = f"""\
WITH {EDGES_SQL}, {BI_SQL},
deg AS (SELECT src AS id, count(*) AS d FROM bi GROUP BY src),
nv AS (SELECT count(*) AS n FROM deg),
r0 AS (SELECT id, d, 1.0 / (SELECT n FROM nv) AS r FROM deg){_PR_ROUNDS}
SELECT id, round(r * (SELECT n FROM nv), 6) AS rank_norm
FROM r3
ORDER BY rank_norm DESC, id ASC
LIMIT 20"""

# Unigram LM score (functions/text.py unigram_logprob_scores): the
# corpus scores itself — avg ln(tf/T); zero-token docs stay in the
# report with NULL score. 6dp round absorbs summation-order/libm ulps.
ORACLES["docs_unigram_logprob"] = f"""\
WITH toksrc AS (
  SELECT doc_id, {TOKENIZE.format(col='text')} AS tokens FROM documents
),
tok AS (SELECT doc_id, unnest(tokens) AS token FROM toksrc),
tf AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
tot AS (SELECT count(*) AS t FROM tok),
scored AS (
  SELECT doc_id, count(*) AS n_tokens,
         round(avg(ln(cnt / (SELECT t FROM tot))), 6) AS unigram_logprob
  FROM tok JOIN tf USING (token) GROUP BY doc_id
)
SELECT d.doc_id, coalesce(s.n_tokens, 0) AS n_tokens, s.unigram_logprob
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id"""

# CUBE over (event_type, hour) (operators/warehouse.py events_cube):
# GROUPING bitmask conventions agree (first column = MSB), same as the
# pricing rollup; session tz is UTC so hour() matches the naive oracle.
ORACLES["events_cube"] = """\
SELECT event_type, hr, count(*) AS n,
       round(sum("value"), 4) AS value_sum,
       CAST(GROUPING(event_type, hr) AS BIGINT) AS gid
FROM (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, "value" FROM events)
GROUP BY CUBE (event_type, hr)"""

# TPC-H Q3 shape (operators/warehouse.py topk_order_revenue): exact
# DECIMAL revenue, top-10 cut on the exact value, 4dp display round.
ORACLES["orders_topk_revenue"] = """\
SELECT l_orderkey,
       round(CAST(rev AS DOUBLE), 4) AS revenue,
       epoch_us(o_orderdate) AS o_orderdate_us,
       o_orderpriority
FROM (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         sum(CAST(l_extendedprice AS DECIMAL(18,6))
             * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS rev
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-01-01'
    AND l_shipdate > TIMESTAMP '1998-01-01'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
ORDER BY rev DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10"""

# Fixed-bound histogram (operators/warehouse.py value_histogram):
# declared [0,500) x 10; underflow -> -1, overflow -> 10.
ORACLES["events_value_histogram"] = """\
SELECT event_type, bucket,
       round(CAST(bucket * 50.0 AS DOUBLE), 6) AS bucket_lo,
       count(*) AS n
FROM (
  SELECT event_type,
         CASE WHEN "value" < 0.0 THEN CAST(-1 AS BIGINT)
              WHEN "value" >= 500.0 THEN CAST(10 AS BIGINT)
              ELSE CAST(floor(("value" - 0.0) / 50.0) AS BIGINT) END AS bucket
  FROM events
) GROUP BY event_type, bucket"""

# Personalized PageRank PYMK (graph/rank.py pymk_ppr): K=3 unrolled
# rounds with a CASE teleport on the source; the teleport literal is
# written (1 - 0.85) so both engines compute the identical double.
_PPR_ROUNDS = "".join(
    f""",
p{k + 1} AS (
  SELECT deg.id, deg.d,
         CASE WHEN deg.id = 3 THEN (1 - 0.85) ELSE 0.0 END + 0.85 * agg.s AS r
  FROM deg JOIN (
    SELECT bi.dst AS id, sum(p.r / p.d) AS s
    FROM bi JOIN p{k} p ON bi.src = p.id GROUP BY bi.dst
  ) agg ON agg.id = deg.id
)"""
    for k in range(3)
)
ORACLES["pymk_user_3_ppr"] = f"""\
WITH {EDGES_SQL}, {BI_SQL},
deg AS (SELECT src AS id, count(*) AS d FROM bi GROUP BY src),
p0 AS (
  SELECT id, d, CASE WHEN id = 3 THEN 1.0 ELSE 0.0 END AS r FROM deg
){_PPR_ROUNDS},
friends AS (SELECT DISTINCT dst AS id FROM bi WHERE src = 3)
SELECT id, round(r, 9) AS ppr
FROM p3
WHERE id <> 3 AND id NOT IN (SELECT id FROM friends) AND round(r, 9) > 0
ORDER BY ppr DESC, id ASC
LIMIT 10"""

# Streaming session windows (streaming/sessions.py): the converged
# append-mode session set equals batch sessionize's per-session stats —
# the shared _SESSIONIZE CTE, grouped per session without the seq column
# (the stream identifies a session by its start, not a per-user counter).
ORACLES["streaming_session_stats"] = f"""\
WITH {_SESSIONIZE}
SELECT user_id,
  min(epoch_us(ts)) AS start_us,
  max(epoch_us(ts)) AS end_us,
  count(*) AS n_events,
  round(sum(value), 6) AS value_sum
FROM sess GROUP BY user_id, session_seq"""

# Link-prediction PYMK variants (graph/linkpred.py): SET neighborhood
# semantics (bs = distinct symmetrized pairs), same candidate set and
# source/friend exclusion as the flagship. Jaccard orders on one exact
# IEEE division rounded 9dp; Adamic-Adar on a float sum rounded 6dp
# (addend order differs across engines — same tolerance as PageRank).
_LINKPRED_CTES = f"""\
{EDGES_SQL}, {BI_SQL},
bs AS (SELECT DISTINCT src, dst FROM bi),
deg AS (SELECT src AS id, count(*) AS d FROM bs GROUP BY src),
friends AS (SELECT dst AS id FROM bs WHERE src = 3)"""

ORACLES["pymk_user_3_jaccard"] = f"""\
WITH {_LINKPRED_CTES},
common AS (
  SELECT bs.dst AS id, count(*) AS c
  FROM bs JOIN friends f ON bs.src = f.id
  GROUP BY bs.dst
)
SELECT common.id,
       round(CAST(c AS DOUBLE) / (du.d + dc.d - c), 9) AS jaccard
FROM common
JOIN deg dc ON dc.id = common.id
CROSS JOIN (SELECT d FROM deg WHERE id = 3) du
WHERE common.id <> 3 AND common.id NOT IN (SELECT id FROM friends)
ORDER BY jaccard DESC, common.id ASC
LIMIT 10"""

ORACLES["pymk_user_3_adamic_adar"] = f"""\
WITH {_LINKPRED_CTES},
aa AS (
  SELECT bs.dst AS id, sum(1.0 / ln(deg.d)) AS s
  FROM bs JOIN friends f ON bs.src = f.id
          JOIN deg ON deg.id = bs.src
  GROUP BY bs.dst
)
SELECT id, round(s, 6) AS aa FROM aa
WHERE id <> 3 AND id NOT IN (SELECT id FROM friends)
ORDER BY aa DESC, id ASC
LIMIT 10"""

# Per-document TF-IDF keywords (functions/text.py tfidf_top_terms):
# tf * ln(N/df) on raw counts, ranked per doc on the 6dp-rounded score
# then token asc — both engines order on identical quantities.
ORACLES["docs_tfidf_top3"] = f"""\
WITH toksrc AS (
  SELECT doc_id, {TOKENIZE.format(col='text')} AS tokens FROM documents
),
tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM (SELECT doc_id, unnest(tokens) AS token FROM toksrc)
  GROUP BY doc_id, token
),
dfreq AS (SELECT token, count(*) AS dfr FROM tf GROUP BY token),
n AS (SELECT count(*) AS n FROM documents)
SELECT doc_id, token, tfidf FROM (
  SELECT tf.doc_id, tf.token,
         round(tf * ln(CAST(n.n AS DOUBLE) / dfr), 6) AS tfidf,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY round(tf * ln(CAST(n.n AS DOUBLE) / dfr), 6) DESC,
                    tf.token ASC
         ) AS rn
  FROM tf JOIN dfreq USING (token) CROSS JOIN n
) WHERE rn <= 3"""

# Date-partitioned layout (sources/partitioned.py): the Spark side reads
# the Hive-partitioned rewrite and prunes on event_date; the result is
# layout-independent — a plain one-day filter over events.
ORACLES["events_day_pruned"] = """\
SELECT event_type, count(*) AS n, round(sum("value"), 6) AS value_sum
FROM events
WHERE CAST(ts AS DATE) = DATE '2024-01-15'
GROUP BY event_type"""

# Scan-time data-quality audit (operators/quality.py): NOT EXISTS
# mirrors the anti-join's NULL-FK-is-orphan semantics; duplicate-key and
# blank checks are plain aggregates.
ORACLES["dq_audit_core"] = """\
SELECT
  (SELECT count(*) FROM orders o
   WHERE NOT EXISTS (SELECT 1 FROM customer c
                     WHERE c.c_custkey = o.o_custkey)) AS orders_orphans,
  (SELECT count(*) FROM lineitem l
   WHERE NOT EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_orderkey = l.l_orderkey)) AS lineitem_orphans,
  (SELECT count(*) FROM (
     SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1
  )) AS orders_dup_pk,
  (SELECT count(*) FROM events WHERE user_id IS NULL) AS events_null_user,
  (SELECT count(*) FROM documents
   WHERE text IS NULL OR trim(text) = '') AS docs_blank_text,
  (SELECT count(*) FROM (
     SELECT text FROM documents GROUP BY text HAVING count(*) > 1
  )) AS docs_dup_text"""

# Running totals (operators/warehouse.py customer_running_totals):
# decimal cumulative frame, double+4dp at the edge.
ORACLES["customer_running_totals"] = """\
SELECT o_custkey, o_orderkey, order_seq, running_total FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER w AS order_seq,
         round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS UNBOUNDED PRECEDING
         ) AS DOUBLE), 4) AS running_total
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
) WHERE order_seq <= 5"""

# Grouped argmin (operators/warehouse.py cheapest_supplier_per_part):
# ranking divides the 4dp-rounded decimal sum by the line count — both
# engines divide identical doubles.
ORACLES["part_cheapest_supplier"] = """\
WITH per AS (
  SELECT l_partkey, l_suppkey, count(*) AS n_lines,
         round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 4)
           / count(*) AS avg0
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
pp AS (SELECT l_partkey, sum(n_lines) AS part_lines FROM per GROUP BY l_partkey)
SELECT l_partkey, l_suppkey, round(avg0, 4) AS avg_price FROM (
  SELECT per.l_partkey, per.l_suppkey, per.avg0,
         row_number() OVER (
           PARTITION BY per.l_partkey ORDER BY per.avg0 ASC, per.l_suppkey ASC
         ) AS rn
  FROM per JOIN pp ON pp.l_partkey = per.l_partkey
  WHERE pp.part_lines >= 3
) WHERE rn = 1"""

# Trailing-24h RANGE frame (operators/warehouse.py user_trailing_24h):
# both engines frame on the identical epoch-microsecond integers.
ORACLES["events_trailing_24h"] = """\
SELECT event_id, user_id,
  count(*) OVER w AS n_24h,
  round(CAST(sum(CAST("value" AS DECIMAL(18,6))) OVER w AS DOUBLE), 4)
    AS value_24h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 86399999999 PRECEDING AND CURRENT ROW)"""

# PII redaction over the bizcard OCR text (functions/parse.py
# redact_pii): counts on the original text, emails replaced before
# phones, both with the frozen reference patterns.
ORACLES["bizcard_pii_redacted"] = f"""\
WITH {BIZCARD_LINES_SQL},
txt AS (
  SELECT s3_key, array_to_string(lines, chr(10)) AS text FROM bizcard_raw
)
SELECT s3_key,
  len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
  len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones,
  regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                 '{PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM txt"""

# Stream-static enrichment (streaming/enrich.py): converged partial-merge
# equals the batch join + groupBy.
ORACLES["streaming_enriched_segments"] = """\
SELECT c.c_mktsegment,
       count(*) AS n,
       round(CAST(sum(CAST(e."value" AS DECIMAL(18,6))) AS DOUBLE), 4)
         AS value_sum
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment"""

# Overlapping token-window chunking (functions/text.py chunk_documents):
# width 50 / stride 40; chunk_idx = start/stride (starts are exact
# stride multiples in both engines).
ORACLES["docs_chunks"] = f"""\
WITH toksrc AS (
  SELECT doc_id, {TOKENIZE.format(col='text')} AS tokens FROM documents
),
base AS (
  SELECT doc_id, tokens, len(tokens) AS n FROM toksrc WHERE len(tokens) > 0
),
st AS (
  SELECT doc_id, tokens,
         CAST(unnest(range(0, n, 40)) AS BIGINT) AS start
  FROM base
)
SELECT doc_id, start // 40 AS chunk_idx,
       len(tokens[start + 1 : start + 50]) AS n_chunk_tokens,
       array_to_string(tokens[start + 1 : start + 50], ' ') AS chunk_text
FROM st"""

# RAG sliding-window chunking with provenance offsets (functions/text.py
# sliding_chunks — DISTINCT from chunk_documents, see the r11 shadowing
# revert): chunk k covers tokens [k·48, k·48+64), the final chunk keeps
# its partial tail, no chunk starts past the end (count =
# 1 + ceil(max(n−64,0)/48)); start_tok is the 0-based provenance offset,
# chunk_fp the md5 of the space-rejoined slice.
ORACLES["docs_chunks_sliding"] = f"""\
WITH slt AS (
  SELECT doc_id, {TOKENIZE.format(col='text')} AS toks FROM documents
),
slnc AS (
  SELECT doc_id, toks,
    CASE WHEN len(toks) <= 64 THEN 1
         ELSE 1 + CAST(ceil((len(toks) - 64) / 48.0) AS BIGINT) END
      AS n_chunks
  FROM slt WHERE len(toks) > 0
),
slch AS (
  SELECT doc_id, CAST(k AS INT) AS chunk_idx,
    CAST(k * 48 AS BIGINT) AS start_tok,
    toks[k*48 + 1 : k*48 + 64] AS piece
  FROM slnc, unnest(range(0, n_chunks)) AS u(k)
)
SELECT doc_id, chunk_idx, start_tok,
  CAST(len(piece) AS BIGINT) AS n_tokens,
  md5(array_to_string(piece, ' ')) AS chunk_fp
FROM slch"""

# Chunk-grain dedup (functions/text.py chunk_dupes over the planted
# aug corpus): sliding chunks grouped by fingerprint, groups spanning
# ≥ 2 docs, canonical location = (min doc, min chunk_idx within it).
ORACLES["docs_chunk_dupes"] = f"""\
WITH {AUG_CORPUS_SQL},
cdt AS (
  SELECT doc_id, {TOKENIZE.format(col='text')} AS toks FROM aug
),
cdnc AS (
  SELECT doc_id, toks,
    CASE WHEN len(toks) <= 64 THEN 1
         ELSE 1 + CAST(ceil((len(toks) - 64) / 48.0) AS BIGINT) END
      AS n_chunks
  FROM cdt WHERE len(toks) > 0
),
cdch AS (
  SELECT doc_id, CAST(k AS INT) AS chunk_idx,
    md5(array_to_string(toks[k*48 + 1 : k*48 + 64], ' ')) AS chunk_fp
  FROM cdnc, unnest(range(0, n_chunks)) AS u(k)
),
cdg AS (
  SELECT chunk_fp,
    CAST(count(*) AS BIGINT) AS n_occurrences,
    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
    min(doc_id) AS first_doc
  FROM cdch GROUP BY chunk_fp
  HAVING count(DISTINCT doc_id) >= 2
)
SELECT g.chunk_fp, g.n_occurrences, g.n_docs, g.first_doc,
  CAST(min(c.chunk_idx) AS INT) AS first_chunk_idx
FROM cdg g JOIN cdch c
  ON c.chunk_fp = g.chunk_fp AND c.doc_id = g.first_doc
GROUP BY g.chunk_fp, g.n_occurrences, g.n_docs, g.first_doc"""

# Chunk-grain retrieval (operators/retrieval.py): sliding chunks →
# feature-hash embeddings (dim from m = md5_long mod 32, sign from the
# 16s bit — pure modular integer arithmetic, bit-identical across
# engines) → canonical-per-fingerprint index → cosine top-5 per query
# chunk with provenance. Query = chunk 0 of docs 1,2,3; same-doc
# neighbors excluded; zero-norm chunks unembeddable by declaration.
_CH_DOT = "list_sum(list_transform(range(1, 17), i -> {a}[i] * {b}[i]))"
_CH_QDOCS = "1, 2, 3"
_CH_CTES = f"""\
crt AS (
  SELECT doc_id, {TOKENIZE.format(col='text')} AS toks FROM documents
),
crnc AS (
  SELECT doc_id, toks,
    CASE WHEN len(toks) <= 64 THEN 1
         ELSE 1 + CAST(ceil((len(toks) - 64) / 48.0) AS BIGINT) END
      AS n_chunks
  FROM crt WHERE len(toks) > 0
),
crch AS (
  SELECT doc_id, CAST(k AS INT) AS chunk_idx,
    CAST(k * 48 AS BIGINT) AS start_tok,
    toks[k*48 + 1 : k*48 + 64] AS piece
  FROM crnc, unnest(range(0, n_chunks)) AS u(k)
),
crhs AS (
  SELECT doc_id, chunk_idx, start_tok,
    CAST(len(piece) AS BIGINT) AS n_tokens,
    md5(array_to_string(piece, ' ')) AS chunk_fp,
    list_transform(piece,
      w -> CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) % 32) AS hs
  FROM crch
),
crn AS MATERIALIZED (
  SELECT * FROM (
    SELECT doc_id, chunk_idx, start_tok, n_tokens, chunk_fp, v,
      list_sum(list_transform(v, x -> x * x)) AS n2
    FROM (
      SELECT *, list_transform(range(0, 16), j -> CAST(
          list_sum(list_transform(hs, m ->
            CASE WHEN m % 16 = j
                 THEN (CASE WHEN m >= 16 THEN -1.0 ELSE 1.0 END)
                 ELSE 0.0 END)) AS DOUBLE)) AS v
      FROM crhs
    )
  ) WHERE n2 > 0
),
cridx AS MATERIALIZED (
  SELECT doc_id, chunk_idx, start_tok, n_tokens, chunk_fp, v, n2 FROM (
    SELECT *, row_number() OVER (
      PARTITION BY chunk_fp ORDER BY doc_id ASC, chunk_idx ASC) AS r
    FROM crn
  ) WHERE r = 1
),
crq AS (
  SELECT doc_id AS query_doc, v AS qv, n2 AS qn2
  FROM crn WHERE doc_id IN ({_CH_QDOCS}) AND chunk_idx = 0
)"""
_CH_RANKED = """\
ranked AS (
  SELECT query_doc, neighbor_doc, chunk_idx, start_tok, n_tokens,
    chunk_fp, cos,
    CAST(row_number() OVER (
      PARTITION BY query_doc
      ORDER BY cos DESC, neighbor_doc ASC, chunk_idx ASC) AS INT) AS rank
  FROM scored
)
SELECT query_doc, neighbor_doc, chunk_idx, start_tok, n_tokens,
  chunk_fp, cos, rank
FROM ranked WHERE rank <= 5"""

ORACLES["chunks_ann_topk"] = f"""\
WITH {_CH_CTES},
scored AS (
  SELECT q.query_doc, i.doc_id AS neighbor_doc, i.chunk_idx, i.start_tok,
    i.n_tokens, i.chunk_fp,
    round({_CH_DOT.format(a="q.qv", b="i.v")}
          / (sqrt(q.qn2) * sqrt(i.n2)), 6) AS cos
  FROM cridx i CROSS JOIN crq q WHERE i.doc_id <> q.query_doc
),
{_CH_RANKED}"""

ORACLES["chunks_ann_lsh"] = f"""\
WITH {_CH_CTES},
crib AS MATERIALIZED (
  SELECT i.doc_id, i.chunk_idx, sum(CASE WHEN
      list_sum(list_transform(range(1, 17), j -> i.v[j] *
        (CAST(((b.range * 1009 + j) * 2654435761) % 2001
         AS DOUBLE) / 1000.0 - 1.0))) >= 0
      THEN (CAST(1 AS BIGINT) << b.range) ELSE 0 END) AS bucket
  FROM cridx i CROSS JOIN range(0, 8) b GROUP BY i.doc_id, i.chunk_idx
),
crqb AS (
  SELECT q.query_doc, sum(CASE WHEN
      list_sum(list_transform(range(1, 17), j -> q.qv[j] *
        (CAST(((b.range * 1009 + j) * 2654435761) % 2001
         AS DOUBLE) / 1000.0 - 1.0))) >= 0
      THEN (CAST(1 AS BIGINT) << b.range) ELSE 0 END) AS qbucket
  FROM crq q CROSS JOIN range(0, 8) b GROUP BY q.query_doc
),
probes AS (
  SELECT query_doc,
    CASE WHEN f.range = -1 THEN qbucket
         ELSE xor(qbucket, (CAST(1 AS BIGINT) << f.range)) END AS bucket
  FROM crqb CROSS JOIN range(-1, 8) f
),
cand AS (
  SELECT DISTINCT p.query_doc, ib.doc_id, ib.chunk_idx
  FROM crib ib JOIN probes p ON ib.bucket = p.bucket
  WHERE ib.doc_id <> p.query_doc
),
scored AS (
  SELECT c.query_doc, i.doc_id AS neighbor_doc, i.chunk_idx, i.start_tok,
    i.n_tokens, i.chunk_fp,
    round({_CH_DOT.format(a="q.qv", b="i.v")}
          / (sqrt(q.qn2) * sqrt(i.n2)), 6) AS cos
  FROM cand c
  JOIN cridx i ON i.doc_id = c.doc_id AND i.chunk_idx = c.chunk_idx
  JOIN crq q ON q.query_doc = c.query_doc
),
{_CH_RANKED}"""

# Relational pivot (operators/warehouse.py user_event_pivot): declared
# event-type domain, conditional counts.
ORACLES["user_event_pivot"] = """\
SELECT user_id,
  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_click,
  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_error,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_purchase,
  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_signup,
  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_view
FROM events GROUP BY user_id"""

# NTILE quartiles (operators/warehouse.py customer_spend_quartiles):
# declared tie order (rounded spend desc, custkey asc).
ORACLES["customer_spend_quartiles"] = """\
WITH spend AS (
  SELECT o_custkey AS custkey,
         round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4)
           AS total_spend
  FROM orders GROUP BY o_custkey
)
SELECT custkey, total_spend,
       ntile(4) OVER (ORDER BY total_spend DESC, custkey ASC) AS quartile
FROM spend"""

# k-core by unrolled peeling (graph/kcore.py): 8 rounds cover the
# fixpoint at the driver's scale with margin (measured depth 1 at k=72,
# sf0.01; peeling is idempotent past convergence, so extra rounds are
# no-ops). The trailing weak-filter makes an unconverged unroll visibly
# mismatch instead of silently passing.
_KCORE_K = 72
# MATERIALIZED is load-bearing: inlined, each round references the
# previous one three times, so an 8-round unroll would expand into
# thousands of base-table scans (observed: fd exhaustion).
_KCORE_ROUNDS = "".join(
    f""",
e{i} AS MATERIALIZED (
  SELECT a, b FROM e{i - 1}
  WHERE a NOT IN (SELECT v FROM w{i - 1})
    AND b NOT IN (SELECT v FROM w{i - 1})
),
d{i} AS MATERIALIZED (
  SELECT v, count(*) AS d FROM (
    SELECT a AS v FROM e{i} UNION ALL SELECT b AS v FROM e{i}
  ) GROUP BY v
),
w{i} AS MATERIALIZED (SELECT v FROM d{i} WHERE d < {_KCORE_K})"""
    for i in range(1, 9)
)
ORACLES["graph_kcore_72"] = f"""\
WITH {EDGES_SQL},
e0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst
),
d0 AS MATERIALIZED (
  SELECT v, count(*) AS d FROM (
    SELECT a AS v FROM e0 UNION ALL SELECT b AS v FROM e0
  ) GROUP BY v
),
w0 AS MATERIALIZED (SELECT v FROM d0 WHERE d < {_KCORE_K}){_KCORE_ROUNDS}
SELECT v AS id, d AS degree FROM d8
WHERE v NOT IN (SELECT v FROM w8)"""

# Salted join (operators/skew.py salted_join): the salt provably
# cancels — the oracle is the plain join + groupBy, identical to the
# streaming enrichment's.
ORACLES["salted_enriched_segments"] = ORACLES["streaming_enriched_segments"]

# Q6-shaped pushdown aggregate (operators/warehouse.py revenue_forecast).
ORACLES["lineitem_revenue_forecast"] = """\
SELECT
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
              * CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE), 4) AS revenue,
  count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24"""

# EXISTS → LEFT SEMI (operators/warehouse.py orders_with_returns_by_priority).
ORACLES["orders_with_returns_by_priority"] = """\
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
)
GROUP BY o_orderpriority"""

# Ordered funnel (operators/sessionize.py funnel_counts): first-touch
# anchors — stage k's earliest event strictly after stage k-1's anchor.
ORACLES["events_funnel"] = """\
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t
  GROUP BY e.user_id
)
SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage,
       (SELECT count(*) FROM s1) AS n_users
UNION ALL
SELECT CAST(2 AS BIGINT), 'click', (SELECT count(*) FROM s2)
UNION ALL
SELECT CAST(3 AS BIGINT), 'purchase', (SELECT count(*) FROM s3)"""

# PMI collocations over the vocabulary head (functions/text.py
# collocations_topk): pair space bounded by the top-50 vocab.
ORACLES["docs_collocations_top20"] = f"""\
WITH toksrc AS (
  SELECT doc_id, {TOKENIZE.format(col='text')} AS tokens FROM documents
),
dt AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(tokens)) AS token FROM toksrc
),
vocab AS MATERIALIZED (
  SELECT token, count(*) AS df FROM dt GROUP BY token
  ORDER BY df DESC, token ASC LIMIT 50
),
dv AS MATERIALIZED (
  SELECT dt.doc_id, dt.token FROM dt JOIN vocab ON vocab.token = dt.token
),
pairs AS (
  SELECT a.token AS x, b.token AS y, count(*) AS c_xy
  FROM dv a JOIN dv b ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY a.token, b.token
),
n AS (SELECT count(*) AS n FROM documents)
SELECT x, y, c_xy,
       round(ln(CAST(n.n AS DOUBLE) * c_xy / (vx.df * vy.df)), 6) AS pmi
FROM pairs
JOIN vocab vx ON vx.token = pairs.x
JOIN vocab vy ON vy.token = pairs.y
CROSS JOIN n
ORDER BY pmi DESC, x ASC, y ASC
LIMIT 20"""

# Degree distribution (graph/model.py degrees re-aggregated).
ORACLES["graph_degree_distribution"] = f"""\
WITH {EDGES_SQL}, {BI_SQL},
deg AS (SELECT src AS id, count(*) AS degree FROM bi GROUP BY src)
SELECT degree, count(*) AS n_vertices FROM deg GROUP BY degree"""

# Landmark (multi-source) BFS (graph/traverse.py
# multi_source_shortest_paths): one recursive walk seeded with all
# three landmarks; min(dist) per (landmark, vertex).
ORACLES["graph_landmark_distances"] = f"""\
WITH RECURSIVE {EDGES_SQL}, {BI_SQL},
walk(src_id, id, dist) AS (
  SELECT s.src_id, s.src_id AS id, 0 AS dist
  FROM (VALUES (CAST(3 AS BIGINT)), (CAST(50 AS BIGINT)),
               (CAST(120 AS BIGINT))) s(src_id)
  UNION ALL
  SELECT walk.src_id, bi.dst, walk.dist + 1
  FROM walk JOIN bi ON bi.src = walk.id
  WHERE walk.dist < 3
)
SELECT src_id, id, CAST(min(dist) AS INT) AS dist
FROM walk GROUP BY src_id, id"""

# Landmark-estimated closeness (graph/traverse.py
# closeness_from_landmarks): the same recursive walk, self rows
# excluded, n/Σd per vertex — one exact-integer division, 9dp edge.
ORACLES["graph_closeness_landmarks"] = f"""\
WITH RECURSIVE {EDGES_SQL}, {BI_SQL},
walk(src_id, id, dist) AS (
  SELECT s.src_id, s.src_id AS id, 0 AS dist
  FROM (VALUES (CAST(3 AS BIGINT)), (CAST(50 AS BIGINT)),
               (CAST(120 AS BIGINT))) s(src_id)
  UNION ALL
  SELECT walk.src_id, bi.dst, walk.dist + 1
  FROM walk JOIN bi ON bi.src = walk.id
  WHERE walk.dist < 3
),
mind AS (
  SELECT src_id, id, min(dist) AS dist FROM walk GROUP BY src_id, id
)
SELECT id, count(*) AS n_reached, CAST(sum(dist) AS BIGINT) AS dist_sum,
       round(CAST(count(*) AS DOUBLE) / sum(dist), 9) AS closeness
FROM mind WHERE dist > 0 GROUP BY id"""

# Sign-LSH ANN with Hamming-1 multiprobe over independent tables
# (operators/similarity.py ann_lsh): hyperplane coefficients are
# closed-form integer arithmetic evaluated identically in both engines
# (global plane index = table*bits + b); dots are the same sequential
# fold, so every bucket bit matches exactly. Candidate pairs dedupe
# across tables before the exact rerank.
_LSH_BITS = 6
_LSH_TABLES = 3
ORACLES["ann_lsh"] = f"""\
WITH {_VEC.format(src="embeddings")},
vb AS MATERIALIZED (
  SELECT norms.vec_id, b.range AS gb,
    list_sum(list_transform(range(1, 65),
      i -> v[i] * (CAST(((b.range * 1009 + i) * 2654435761) % 2001
                   AS DOUBLE) / 1000.0 - 1.0))) AS d
  FROM norms CROSS JOIN range(0, {_LSH_TABLES * _LSH_BITS}) b
),
sigs AS MATERIALIZED (
  SELECT vec_id, gb // {_LSH_BITS} AS tbl,
    sum(CASE WHEN d >= 0
        THEN (CAST(1 AS BIGINT) << (gb % {_LSH_BITS})) ELSE 0 END) AS bucket
  FROM vb GROUP BY vec_id, gb // {_LSH_BITS}
),
nb AS MATERIALIZED (
  SELECT norms.vec_id, norms.v, norms.n2, sigs.tbl, sigs.bucket
  FROM norms JOIN sigs USING (vec_id)
),
q AS (
  SELECT vec_id AS query_id, v AS qv, n2 AS qn2, tbl, bucket
  FROM nb WHERE vec_id IN ({_qid_list})
),
probes AS (
  SELECT query_id, qv, qn2, tbl,
    CASE WHEN f.range = -1 THEN bucket
         ELSE xor(bucket, (CAST(1 AS BIGINT) << f.range)) END AS bucket
  FROM q CROSS JOIN range(-1, {_LSH_BITS}) f
),
cand AS (
  SELECT DISTINCT p.query_id, n.vec_id
  FROM nb n JOIN probes p ON n.tbl = p.tbl AND n.bucket = p.bucket
  WHERE n.vec_id <> p.query_id
),
scored AS (
  SELECT c.query_id, c.vec_id AS neighbor_id,
    round({_DOT.format(a="q2.v", b="n2t.v")} / (sqrt(q2.n2) * sqrt(n2t.n2)), 6)
      AS cos
  FROM cand c
  JOIN (SELECT DISTINCT vec_id, v, n2 FROM norms) q2 ON q2.vec_id = c.query_id
  JOIN (SELECT DISTINCT vec_id, v, n2 FROM norms) n2t ON n2t.vec_id = c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
    CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC
    ) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 10"""


# Directed shingle containment (operators/dedup.py containment_pairs):
# same rare-shingle candidate generation as the Jaccard op but with NO
# size-ratio prune (containment imposes none on the small side); the
# intersection is the naive exact verify here — DuckDB at sf0.01 affords
# it, Spark decomposes rare+hot to avoid the pair re-expansion.

# Exact-substring dedup (operators/dedup.py duplicated_spans), Lee et
# al. 2022 style: a char interval is duplicated iff every 30-char
# window it extends occurs >= 2 times corpus-wide. Gaps-and-islands
# span merge: equal-length windows make lag() sufficient (positions
# sorted, interval end monotone), islands break where pos - lag > L.
_SUBSTR_L = 30
_SUBSTR_SPAN_CTES = f"""\
WITH grams AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         CAST(concat('0x', substr(md5(
             substr(text, CAST(i AS INT), {_SUBSTR_L})), 1, 15)) AS BIGINT)
           AS gh
  FROM documents, unnest(range(1, length(text) - {_SUBSTR_L} + 2)) AS t(i)
),
dup AS (SELECT gh FROM grams GROUP BY gh HAVING count(*) >= 2),
dpos AS (SELECT doc_id, pos FROM grams JOIN dup USING (gh)),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {_SUBSTR_L} THEN 0 ELSE 1 END AS b
  FROM dpos),
isl AS (
  SELECT doc_id, pos,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS g
  FROM brk),
spans AS (
  SELECT doc_id,
         min(pos) AS span_start,
         max(pos) + {_SUBSTR_L} - 1 AS span_end,
         max(pos) + {_SUBSTR_L} - min(pos) AS span_len
  FROM isl GROUP BY doc_id, g)"""

ORACLES["dedup_substring"] = f"""\
{_SUBSTR_SPAN_CTES}
SELECT doc_id, span_start, span_end, span_len FROM spans"""

ORACLES["docs_substring_dup_stats"] = f"""\
{_SUBSTR_SPAN_CTES},
per_doc AS (
  SELECT doc_id, count(*) AS n_spans,
         CAST(sum(span_len) AS BIGINT) AS dup_chars
  FROM spans GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(p.n_spans, 0) AS n_spans,
       CAST(coalesce(p.dup_chars, 0) AS BIGINT) AS dup_chars,
       round(coalesce(p.dup_chars, 0) * 1.0
             / greatest(length(d.text), 1), 6) AS dup_frac
FROM documents d LEFT JOIN per_doc p USING (doc_id)"""


# Span stripping (operators/dedup.py strip_duplicated_spans /
# write_clean_corpus): cut every maximal duplicated span. Gaps between
# disjoint sorted spans reassemble via ordered string_agg. Shared CTE
# chain; two finals (fingerprint report / materialized-table readback).
_SUBSTR_CLEAN_CTES = f"""\
{_SUBSTR_SPAN_CTES},
sp2 AS MATERIALIZED (SELECT * FROM spans),
g AS (
  SELECT doc_id, span_start AS s, span_end AS e,
         coalesce(lag(span_end) OVER (PARTITION BY doc_id ORDER BY span_start),
                  0) AS pe
  FROM sp2
),
pieces AS (
  SELECT doc_id, pe + 1 AS from_pos, s - pe - 1 AS piece_len, s AS ord
  FROM g
  UNION ALL
  SELECT doc_id, max(span_end) + 1 AS from_pos, NULL AS piece_len,
         9223372036854775807 AS ord
  FROM sp2 GROUP BY doc_id
),
cleaned AS (
  SELECT p.doc_id,
         string_agg(
           CASE WHEN p.piece_len IS NULL
                THEN substr(d.text, CAST(p.from_pos AS INT))
                ELSE substr(d.text, CAST(p.from_pos AS INT),
                            CAST(p.piece_len AS INT)) END,
           '' ORDER BY p.ord) AS clean
  FROM pieces p JOIN documents d USING (doc_id)
  GROUP BY p.doc_id
),
removed AS (
  SELECT doc_id, CAST(sum(span_len) AS BIGINT) AS n_removed FROM sp2
  GROUP BY doc_id
)"""

ORACLES["docs_substring_stripped"] = f"""\
{_SUBSTR_CLEAN_CTES}
SELECT d.doc_id,
       coalesce(r.n_removed, 0) AS n_removed,
       md5(coalesce(c.clean, d.text)) AS clean_fp
FROM documents d
LEFT JOIN cleaned c USING (doc_id)
LEFT JOIN removed r USING (doc_id)"""

# Materialized stripped corpus (operators/dedup.py write_clean_corpus):
# the engine writes (doc_id, cleaned text, n_removed) as a swapped
# table; the registered query reads it back rolled down to
# length + md5 so the hash check covers every byte without moving it.
ORACLES["docs_substring_clean_table"] = f"""\
{_SUBSTR_CLEAN_CTES}
SELECT d.doc_id,
       CAST(length(coalesce(c.clean, d.text)) AS BIGINT) AS n_clean_chars,
       md5(coalesce(c.clean, d.text)) AS clean_fp
FROM documents d
LEFT JOIN cleaned c USING (doc_id)"""


# The intersection mirrors Spark's rare+hot DECOMPOSITION (r8 verdict
# item 3 — the old form re-joined each candidate pair's FULL shingle
# sets, quadratic in document size, and timed out at sf1; this form is
# numeric in 7 s there): |A∩B| = |A∩B∩rare| + |A∩B∩hot|. The rare part
# falls out of the SAME self-join that generates candidates (shingle df
# ≤ cap bounds its fan-out); the hot part re-joins only the few
# hotter-than-cap shingles' postings against the candidate pairs.
ORACLES["dedup_containment"] = f"""\
WITH {AUG_CORPUS_SQL}, {_SHINGLE_CTES},
rare AS (
  SELECT shingle FROM shing GROUP BY shingle
  HAVING count(*) <= {SHINGLE_DF_CAP}
),
rare_shared AS (
  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS i_rare
  FROM shing sa
  JOIN rare r ON sa.shingle = r.shingle
  JOIN shing sb ON sb.shingle = sa.shingle
  WHERE sa.doc_id < sb.doc_id
  GROUP BY sa.doc_id, sb.doc_id
),
hot AS (
  SELECT shingle FROM shing GROUP BY shingle
  HAVING count(*) > {SHINGLE_DF_CAP}
),
hot_post AS (
  SELECT s.doc_id, s.shingle FROM shing s JOIN hot h ON s.shingle = h.shingle
),
hot_shared AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i_hot
  FROM rare_shared c
  JOIN hot_post ha ON ha.doc_id = c.doc_a
  JOIN hot_post hb ON hb.doc_id = c.doc_b AND hb.shingle = ha.shingle
  GROUP BY c.doc_a, c.doc_b
),
inter AS (
  SELECT rs.doc_a, rs.doc_b, rs.i_rare + coalesce(hs.i_hot, 0) AS i
  FROM rare_shared rs LEFT JOIN hot_shared hs
    ON hs.doc_a = rs.doc_a AND hs.doc_b = rs.doc_b
),
directed AS (
  SELECT i.doc_a AS doc_inner, i.doc_b AS doc_outer,
         round(CAST(i.i AS DOUBLE) / za.sz, 6) AS containment
  FROM inter i JOIN sizes za ON za.doc_id = i.doc_a
  UNION ALL
  SELECT i.doc_b AS doc_inner, i.doc_a AS doc_outer,
         round(CAST(i.i AS DOUBLE) / zb.sz, 6) AS containment
  FROM inter i JOIN sizes zb ON zb.doc_id = i.doc_b
)
SELECT doc_inner, doc_outer, containment
FROM directed WHERE containment >= 0.7"""

# MAD outliers (operators/warehouse.py mad_outliers): exact interpolated
# medians (quantile_cont ≡ Spark percentile) rounded at 6dp; modified z
# is single IEEE ops on identical inputs; x/0 → NULL in both engines and
# NULL z ⇒ is_outlier false.
ORACLES["events_mad_outliers"] = """\
WITH med AS (
  SELECT event_type, round(quantile_cont("value", 0.5), 6) AS med
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type,
         round(quantile_cont(abs(e."value" - m.med), 0.5), 6) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
),
st AS (
  SELECT med.event_type, med.med, mad.mad
  FROM med JOIN mad USING (event_type)
)
SELECT e.event_id, e.event_type,
  round((e."value" - st.med) * 0.6745 / st.mad, 6) AS robust_z,
  coalesce(abs(round((e."value" - st.med) * 0.6745 / st.mad, 6)) > 3.5,
           false) AS is_outlier
FROM events e JOIN st USING (event_type)"""

# Cohort retention (operators/warehouse.py retention_cohorts): distinct
# (customer, month) activity, cohort = min month per customer, matrix on
# (cohort, whole-month offset); sizes re-derived from the offset-0 cell.
ORACLES["orders_retention_cohorts"] = """\
WITH activity AS (
  SELECT o_custkey AS custkey,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS month
  FROM orders GROUP BY 1, 2
),
cohort AS (
  SELECT custkey, min(month) AS cohort_month FROM activity GROUP BY custkey
),
cells AS (
  SELECT c.cohort_month,
         CAST(date_diff('month', c.cohort_month, a.month) AS INT)
           AS month_offset,
         count(*) AS n_customers
  FROM activity a JOIN cohort c USING (custkey)
  GROUP BY 1, 2
)
SELECT s.cohort_month, s.month_offset, s.n_customers,
       round(CAST(s.n_customers AS DOUBLE) / z.n_customers, 6) AS retention
FROM cells s
JOIN (SELECT cohort_month, n_customers FROM cells WHERE month_offset = 0) z
  USING (cohort_month)"""


# Label-propagation communities (graph/communities.py): K synchronous
# rounds unrolled as CTEs — per round, (vertex, label) counts over the
# set-symmetrized view, winner = (count desc, label asc); the window
# row_number pick here is semantically identical to Spark's
# max(struct(c, -label)) aggregate.
_LPA_ROUNDS = 4
_lpa_ctes = ",\n".join(
    f"""\
r{k} AS (
  SELECT id, label FROM (
    SELECT t.id, t.label,
      row_number() OVER (
        PARTITION BY t.id ORDER BY t.c DESC, t.label ASC
      ) AS rn
    FROM (
      SELECT b.dst AS id, l.label, count(*) AS c
      FROM bs b JOIN r{k - 1} l ON b.src = l.id
      GROUP BY b.dst, l.label
    ) t
  ) WHERE rn = 1
)"""
    for k in range(1, _LPA_ROUNDS + 1)
)

ORACLES["graph_lpa_communities"] = f"""\
WITH {EDGES_SQL},
bs AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges
    UNION ALL
    SELECT dst AS src, src AS dst FROM edges
  )
),
r0 AS (SELECT DISTINCT src AS id, src AS label FROM bs),
{_lpa_ctes}
SELECT id, label AS community FROM r{_LPA_ROUNDS}"""

# Deterministic synchronous modularity local-move
# (graph/communities.py modularity_communities): per round each vertex
# moves to argmax_c of the INTEGER-scaled gain
# m2·k_in(i,c) − d_i·(Σtot(c) − d_i·[c=cur]) with ties to the smallest
# label; fixed round budget unrolled like LPA's; final labels
# canonicalized to the smallest member id.
_MOD_ROUNDS = 3
_mod_ctes = ",\n".join(
    f"""\
mstot{k} AS (
  SELECT l.label, CAST(sum(g.d) AS BIGINT) AS stot
  FROM mr{k - 1} l JOIN mdeg g USING (id) GROUP BY l.label
),
mkin{k} AS (
  SELECT b.src AS id, l.label, CAST(count(*) AS BIGINT) AS kin
  FROM bs b JOIN mr{k - 1} l ON b.dst = l.id
  GROUP BY b.src, l.label
),
mcand{k} AS (
  SELECT id, label, max(kin) AS kin, max(cur) AS cur FROM (
    SELECT id, label, kin, CAST(0 AS BIGINT) AS cur FROM mkin{k}
    UNION ALL
    SELECT id, label, CAST(0 AS BIGINT), CAST(1 AS BIGINT) FROM mr{k - 1}
  ) GROUP BY id, label
),
mr{k} AS MATERIALIZED (
  SELECT id, label FROM (
    SELECT c.id, c.label,
      row_number() OVER (
        PARTITION BY c.id
        ORDER BY (mm.m2 * c.kin
                  - g.d * (s.stot - g.d * c.cur)) DESC, c.label ASC
      ) AS rn
    FROM mcand{k} c
    JOIN mdeg g ON g.id = c.id
    JOIN mstot{k} s ON s.label = c.label
    CROSS JOIN mm
  ) WHERE rn = 1
)"""
    for k in range(1, _MOD_ROUNDS + 1)
)

ORACLES["graph_modularity_communities"] = f"""\
WITH {EDGES_SQL},
bs AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges
    UNION ALL
    SELECT dst AS src, src AS dst FROM edges
  )
),
mdeg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS d FROM bs GROUP BY src),
mm AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM bs),
mr0 AS (SELECT DISTINCT src AS id, src AS label FROM bs),
{_mod_ctes},
mcanon AS (
  SELECT label, min(id) AS community FROM mr{_MOD_ROUNDS} GROUP BY label
)
SELECT r.id, c.community
FROM mr{_MOD_ROUNDS} r JOIN mcanon c USING (label)"""


# Count-min heavy hitters (operators/sketches.py cms_heavy_hitters):
# identical fixed affine hashes over the md5 base hash, so the full
# d×w counter table and the min-over-depths estimates are bit-identical
# relations in both engines — the deterministic counterpoint to the
# rows-only HLL query.
from .operators.sketches import CMS_A, CMS_B, CMS_DEPTH, CMS_P, CMS_WIDTH

_cms_h = (
    "CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) "
    f"AS BIGINT) % {CMS_P}"
)
_cms_rows = "\n  UNION ALL\n  ".join(
    f"SELECT user_id, {i} AS depth, "
    f"(({CMS_A[i]} * h + {CMS_B[i]}) % {CMS_P}) % {CMS_WIDTH} AS bucket FROM hashed"
    for i in range(CMS_DEPTH)
)

ORACLES["events_user_cms_top10"] = f"""\
WITH hashed AS (
  SELECT user_id, {_cms_h} AS h FROM events
),
coords AS (
  {_cms_rows}
),
cms AS (
  SELECT depth, bucket, count(*) AS cnt FROM coords GROUP BY depth, bucket
),
exact AS (
  SELECT user_id, count(*) AS exact_cnt FROM events GROUP BY user_id
),
top AS (
  SELECT user_id, exact_cnt FROM exact
  ORDER BY exact_cnt DESC, user_id ASC LIMIT 10
),
th AS (
  SELECT t.user_id, t.exact_cnt, {_cms_h} AS h FROM top t
),
probes AS (
  {_cms_rows.replace("FROM hashed", "FROM th").replace("SELECT user_id,", "SELECT user_id, exact_cnt,")}
)
SELECT p.user_id, p.exact_cnt, min(c.cnt) AS cms_est
FROM probes p JOIN cms c ON c.depth = p.depth AND c.bucket = p.bucket
GROUP BY p.user_id, p.exact_cnt"""


# Z-order layout round-trip (sources/zorder.py): layout-independent —
# the clustered rewrite must not change ANY row, so the oracle is the
# plain conjunctive-range filter over events.
ORACLES["events_zorder_pruned"] = """\
SELECT user_id, count(*) AS n, round(sum("value"), 6) AS value_sum
FROM events
WHERE user_id BETWEEN 10 AND 40
  AND ts BETWEEN TIMESTAMP '2024-01-08' AND TIMESTAMP '2024-01-15'
GROUP BY user_id"""


# Gopher-style repetition metrics (functions/text.py
# repetition_metrics): same analyzer, same gram widths; list_transform
# over 1-indexed DuckDB lists mirrors the JVM transform-over-slice.
# Sums over counts CAST to BIGINT (driver hash safety).
ORACLES["docs_repetition_metrics"] = f"""\
WITH toksrc AS (
  SELECT doc_id, {TOKENIZE.format(col='text')} AS t FROM documents
),
base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens, t FROM toksrc),
bi AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
                                        i -> t[i] || ' ' || t[i + 1])) AS g
  FROM base WHERE len(t) >= 2
),
bic AS (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY doc_id, g),
bia AS (SELECT doc_id, max(c) AS top_bi FROM bic GROUP BY doc_id),
tri AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
                   i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS g
  FROM base WHERE len(t) >= 3
),
tric AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY doc_id, g),
tria AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tri,
         count(*) AS n_tri_distinct
  FROM tric GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens,
  round(2.0 * bia.top_bi / b.n_tokens, 6) AS top_bigram_frac,
  round((tria.n_tri - tria.n_tri_distinct) / CAST(tria.n_tri AS DOUBLE), 6)
    AS dup_trigram_frac,
  coalesce(round(2.0 * bia.top_bi / b.n_tokens, 6) > 0.18, FALSE)
    OR coalesce(
         round((tria.n_tri - tria.n_tri_distinct)
               / CAST(tria.n_tri AS DOUBLE), 6) > 0.30, FALSE)
    AS repetitive
FROM base b
LEFT JOIN bia USING (doc_id)
LEFT JOIN tria USING (doc_id)"""

# Domain quota (operators/quota.py domain_quota): plain per-domain
# row_number twin — the Spark side's salted two-phase top-k must land
# on identical ranks (the equivalence the parity hash certifies).
ORACLES["docs_domain_quota"] = """\
WITH r AS (
  SELECT source, doc_id,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
  FROM documents
)
SELECT source, doc_id, rk FROM r WHERE rk <= 10"""

# Exact stratified sample (operators/quota.py stratified_sample):
# floor(frac·n_s) per stratum, md5-preference order.
# Temperature-scaled mixing weights (operators/sampling.py
# source_mixture_weights): α = 1/2 so the power is IEEE-exact sqrt.
ORACLES["docs_source_mixture"] = f"""\
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(toks)) AS BIGINT) AS n_tokens
  FROM (SELECT source, {TOKENIZE.format(col='text')} AS toks FROM documents)
  GROUP BY source
),
tot AS (
  SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot,
         sum(sqrt(CAST(n_tokens AS DOUBLE))) AS tot_a
  FROM per
)
SELECT source, n_docs, n_tokens,
       round(n_tokens / tot, 9) AS p_natural,
       round(sqrt(CAST(n_tokens AS DOUBLE)) / tot_a, 9) AS p_alpha,
       round((sqrt(CAST(n_tokens AS DOUBLE)) / tot_a)
             / (n_tokens / tot), 9) AS boost
FROM per, tot"""


ORACLES["events_stratified_sample"] = """\
WITH n AS (SELECT event_type, count(*) AS n_s FROM events GROUP BY event_type),
r AS (
  SELECT event_type, event_id,
         CAST(row_number() OVER (
           PARTITION BY event_type
           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS BIGINT) AS rk
  FROM events
)
SELECT r.event_type, r.event_id, r.rk
FROM r JOIN n USING (event_type)
WHERE r.rk <= floor(n.n_s * 0.1)"""

# Bloom-pruned semi-join (operators/bloomjoin.py): the oracle is the
# PLAIN semi-join — parity is the exactness proof that the bloom stage
# only prunes, never changes the answer. l_quantity is integral-valued,
# so the double sum is exact and order-independent; CAST for the hash.
ORACLES["lineitem_bloom_pruned"] = """\
SELECT l_orderkey, count(*) AS n_items,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_totalprice > 480000.0)
GROUP BY l_orderkey"""

# CCNet-style LM tiling (functions/text.py lm_buckets): DuckDB uses the
# real NTILE window; the Spark side reproduces it from the two-phase
# distributed rank — the equivalence ntile_from_rank's docstring pins.
# NULL scores coalesce to -1e18 BEFORE ordering (engines disagree on
# default NULL placement under DESC).
ORACLES["docs_lm_buckets"] = f"""\
WITH toksrc AS (
  SELECT doc_id, {TOKENIZE.format(col='text')} AS tokens FROM documents
),
tok AS (SELECT doc_id, unnest(tokens) AS token FROM toksrc),
tf AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
tot AS (SELECT count(*) AS t FROM tok),
scored AS (
  SELECT doc_id,
         round(avg(ln(cnt / (SELECT t FROM tot))), 6) AS unigram_logprob
  FROM tok JOIN tf USING (token) GROUP BY doc_id
),
rep AS (
  SELECT d.doc_id, s.unigram_logprob,
         coalesce(s.unigram_logprob, -1e18) AS key
  FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
)
SELECT doc_id, unigram_logprob,
       CAST(ntile(3) OVER (ORDER BY key DESC, doc_id ASC) AS INTEGER)
         AS bucket
FROM rep"""


# Fact-to-SCD2 temporal join (__spark_entry__ events_scd2_join): DuckDB
# executes the semantics with its native ASOF JOIN; the Spark side is
# the one-shuffle union+window as-of composition. Dim runs deduped to
# one per (user, valid_from), latest event id wins — the same rule the
# Spark tie_break implements.
ORACLES["events_scd2_join"] = """\
WITH dim_src AS (
  SELECT event_id, user_id, ts, event_type
  FROM events WHERE event_type IN ('signup', 'error')
),
runs AS (
  SELECT event_id, user_id, ts, event_type FROM (
    SELECT event_id, user_id, ts, event_type,
           lag(event_type) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ) AS prev_type
    FROM dim_src
  ) WHERE prev_type IS NULL OR prev_type <> event_type
),
dim AS (
  SELECT user_id, valid_from, status_type, status_event_id FROM (
    SELECT user_id, ts AS valid_from, event_type AS status_type,
           event_id AS status_event_id,
           row_number() OVER (
             PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM runs
  ) WHERE rn = 1
),
facts AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT f.event_id, f.user_id, epoch_us(f.ts) AS ts_us,
       d.status_type, d.status_event_id
FROM facts f ASOF JOIN dim d
  ON f.user_id = d.user_id AND f.ts >= d.valid_from"""

# Exact deciles (operators/ranking.py exact_quantiles): boundary q is
# the raw value at sorted position ceil(q·n/10) — no arithmetic on the
# value, so the doubles are bit-identical across engines.
ORACLES["events_value_deciles"] = """\
WITH r AS (
  SELECT "value" AS v,
         row_number() OVER (ORDER BY "value") AS rn,
         count(*) OVER () AS n
  FROM events
)
SELECT q.q, r.v AS boundary
FROM r
JOIN (SELECT unnest(generate_series(1, 9)) AS q) q
  ON r.rn = CAST(ceil(q.q * r.n / 10.0) AS BIGINT)"""


# Token-distribution entropy (functions/text.py token_entropy): the
# same one-aggregate algebraic form H = ln(n) − Σ c·ln c / n, 6dp.
ORACLES["docs_token_entropy"] = f"""\
WITH toksrc AS (
  SELECT doc_id, {TOKENIZE.format(col='text')} AS tokens FROM documents
),
tok AS (SELECT doc_id, unnest(tokens) AS token FROM toksrc),
tf AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token),
scored AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         count(*) AS n_distinct,
         round(ln(CAST(sum(c) AS DOUBLE)) - sum(c * ln(c)) / sum(c), 6)
           AS entropy
  FROM tf GROUP BY doc_id
)
SELECT d.doc_id, coalesce(s.n_tokens, 0) AS n_tokens,
       coalesce(s.n_distinct, 0) AS n_distinct, s.entropy
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id"""


# --- product quantization (operators/similarity.py ann_pq / _rerank) ------
# Per-subspace deterministic k-means (same seed/round discipline as
# kmeans_assign), codes = nearest sub-centroid, ADC partials rounded to
# integer micro-units so the Σ is exact integer arithmetic in both
# engines. Geometry mirrors the Spark constants: M=4 × 16 dims, KSUB=8,
# ITERS=2 (one update round).
_PQ_M, _PQ_KSUB, _PQ_W = 4, 8, 16


def _pq_dot(a: str, b: str) -> str:
    return f"list_sum(list_transform(range(1, {_PQ_W + 1}), i -> {a}[i] * {b}[i]))"


def _pq_assign_cte(out: str, base: str, cents: str) -> str:
    d = _pq_dot("b.v", "c.centroid")
    return f"""{out} AS (
  SELECT vec_id, v, n2, cluster FROM (
    SELECT b.vec_id, b.v, b.n2, c.cluster,
      row_number() OVER (
        PARTITION BY b.vec_id
        ORDER BY round(b.n2 + c.cn2 - 2 * {d}, 6) ASC, c.cluster ASC
      ) AS r
    FROM {base} b CROSS JOIN {cents} c
  ) WHERE r = 1
)"""


def _pq_subspace_ctes(m: int) -> str:
    lo, hi = m * _PQ_W + 1, (m + 1) * _PQ_W
    return f"""\
sub{m} AS (
  SELECT vec_id, list_slice(v, {lo}, {hi}) AS v FROM vecs
),
n{m} AS (
  SELECT vec_id, v, list_sum(list_transform(v, x -> x * x)) AS n2 FROM sub{m}
),
seed{m} AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS INT) AS cluster,
         v AS centroid, n2 AS cn2
  FROM (SELECT vec_id, v, n2 FROM n{m} ORDER BY vec_id ASC LIMIT {_PQ_KSUB})
),
{_pq_assign_cte(f"a1_{m}", f"n{m}", f"seed{m}")},
m1_{m} AS (
  SELECT cluster, pos, round(avg(x), 6) AS m FROM (
    SELECT cluster, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM a1_{m}
  ) GROUP BY cluster, pos
),
c1n_{m} AS (
  SELECT cluster, list(m ORDER BY pos) AS centroid FROM m1_{m} GROUP BY cluster
),
c1_{m} AS (
  SELECT s.cluster,
         coalesce(n.centroid, s.centroid) AS centroid,
         list_sum(list_transform(coalesce(n.centroid, s.centroid),
                                 x -> x * x)) AS cn2
  FROM seed{m} s LEFT JOIN c1n_{m} n USING (cluster)
),
{_pq_assign_cte(f"code{m}", f"n{m}", f"c1_{m}")},
q{m} AS (
  SELECT vec_id AS query_id, v AS qv, n2 AS qn2
  FROM n{m} WHERE vec_id IN ({_qid_list})
),
d{m} AS (
  SELECT q.query_id, {m} AS sp, c.cluster AS code,
    CAST(round((q.qn2 + c.cn2 - 2 * {_pq_dot("q.qv", "c.centroid")}) * 1e6, 0)
         AS BIGINT) AS pi6
  FROM q{m} q CROSS JOIN c1_{m} c
)"""


_PQ_ADC = f"""\
codes AS (
  {" UNION ALL ".join(f"SELECT vec_id, {m} AS sp, cluster AS code FROM code{m}" for m in range(_PQ_M))}
),
dtab AS (
  {" UNION ALL ".join(f"SELECT * FROM d{m}" for m in range(_PQ_M))}
),
adc AS (
  SELECT d.query_id, c.vec_id AS neighbor_id,
         CAST(sum(d.pi6) AS BIGINT) AS adc_i6
  FROM codes c JOIN dtab d ON d.sp = c.sp AND d.code = c.code
  WHERE c.vec_id <> d.query_id
  GROUP BY d.query_id, c.vec_id
)"""

_PQ_PREFIX = (
    "WITH "
    + _VEC.format(src="embeddings")
    + ",\n"
    + ",\n".join(_pq_subspace_ctes(m) for m in range(_PQ_M))
    + ",\n"
    + _PQ_ADC
)

ORACLES["ann_pq"] = (
    _PQ_PREFIX
    + """
SELECT query_id, neighbor_id, adc_i6 / 1000000.0 AS adc, rank FROM (
  SELECT query_id, neighbor_id, adc_i6,
    CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY adc_i6 ASC, neighbor_id ASC
    ) AS INT) AS rank
  FROM adc
) WHERE rank <= 10"""
)

ORACLES["ann_pq_rerank"] = (
    _PQ_PREFIX
    + """,
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
      row_number() OVER (
        PARTITION BY query_id ORDER BY adc_i6 ASC, neighbor_id ASC
      ) AS r
    FROM adc
  ) WHERE r <= 100
),
qfull AS (
  SELECT vec_id AS query_id, v AS qv, n2 AS qn2
  FROM norms WHERE vec_id IN (""" + _qid_list + """)
),
rer AS (
  SELECT s.query_id, s.neighbor_id,
    round(""" + _DOT.format(a="q.qv", b="n.v") + """
          / (sqrt(q.qn2) * sqrt(n.n2)), 6) AS cos
  FROM short s
  JOIN norms n ON n.vec_id = s.neighbor_id
  JOIN qfull q ON q.query_id = s.query_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT query_id, neighbor_id, cos,
    CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC
    ) AS INT) AS rank
  FROM rer
) WHERE rank <= 10"""
)


# Incremental domain quota (streaming/quota.py): drained kept-set is
# row-identical to the batch operator — shared oracle, same device as
# streaming_dedup_minhash.
ORACLES["streaming_domain_quota"] = ORACLES["docs_domain_quota"]


# Landmark harmonic centrality (graph/traverse.py
# harmonic_from_landmarks): same recursive walk as closeness; Σ 1/d
# computed exactly as Σ (lcm/d) integers, one terminal division.
# lcm(1..3) = 6 for the registered max_hops=3.
ORACLES["graph_harmonic_landmarks"] = f"""\
WITH RECURSIVE {EDGES_SQL}, {BI_SQL},
walk(src_id, id, dist) AS (
  SELECT s.src_id, s.src_id AS id, 0 AS dist
  FROM (VALUES (CAST(3 AS BIGINT)), (CAST(50 AS BIGINT)),
               (CAST(120 AS BIGINT))) s(src_id)
  UNION ALL
  SELECT walk.src_id, bi.dst, walk.dist + 1
  FROM walk JOIN bi ON bi.src = walk.id
  WHERE walk.dist < 3
),
mind AS (
  SELECT src_id, id, min(dist) AS dist FROM walk GROUP BY src_id, id
)
SELECT id, count(*) AS n_reached,
       round(CAST(sum(CAST(6 / dist AS BIGINT)) AS BIGINT) / 6.0, 9)
         AS harmonic
FROM mind WHERE dist > 0 GROUP BY id"""


# Simple exponential smoothing over monthly revenue
# (operators/timeseries.py ses_levels): the recursive CTE executes the
# IDENTICAL sequential IEEE op chain as the Spark fold — α and 1−α are
# the same literals on both sides, series values are exact-decimal sums
# rounded at 4dp, levels rounded at 6dp for display only.
ORACLES["orders_revenue_ses"] = """\
WITH RECURSIVE m AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4)
           AS y
  FROM orders GROUP BY 1
),
idx AS (
  SELECT mon, y, row_number() OVER (ORDER BY mon) AS i FROM m
),
ses(i, mon, y, level) AS (
  SELECT i, mon, y, y AS level FROM idx WHERE i = 1
  UNION ALL
  SELECT idx.i, idx.mon, idx.y, 0.3 * idx.y + 0.7 * ses.level
  FROM ses JOIN idx ON idx.i = ses.i + 1
)
SELECT epoch_us(mon) AS month_us, y AS revenue, round(level, 6) AS level
FROM ses"""


# Incrementally-maintained monthly revenue (streaming/rollup.py):
# drained state ≡ the batch GROUP BY — decimal addition is associative,
# so the oracle is the plain aggregate.
ORACLES["streaming_monthly_revenue"] = """\
SELECT epoch_us(date_trunc('month', o_orderdate)) AS month_us,
       count(*) AS n,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 4)
         AS value_sum
FROM orders
GROUP BY date_trunc('month', o_orderdate)"""


# Multi-series SES (operators/timeseries.py ses_levels_by): one
# recurrence per order priority; the recursive CTE steps every series
# in the same recursion (join on key AND i).
ORACLES["orders_priority_revenue_ses"] = """\
WITH RECURSIVE m AS (
  SELECT o_orderpriority AS k, date_trunc('month', o_orderdate) AS mon,
         round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4)
           AS y
  FROM orders GROUP BY 1, 2
),
idx AS (
  SELECT k, mon, y,
         row_number() OVER (PARTITION BY k ORDER BY mon) AS i
  FROM m
),
ses(k, i, mon, y, level) AS (
  SELECT k, i, mon, y, y AS level FROM idx WHERE i = 1
  UNION ALL
  SELECT idx.k, idx.i, idx.mon, idx.y, 0.3 * idx.y + 0.7 * ses.level
  FROM ses JOIN idx ON idx.k = ses.k AND idx.i = ses.i + 1
)
SELECT k AS o_orderpriority, epoch_us(mon) AS month_us, y AS revenue,
       round(level, 6) AS level
FROM ses"""


# Mergeable bucketed quantiles (operators/warehouse.py
# bucketed_quantiles): same declared [0,500)×100 histogram, cumulative
# crossing rule cum − n < ceil(q·total) ≤ cum, q literals cast DOUBLE.
ORACLES["events_value_p95_bucketed"] = """\
WITH hist AS (
  SELECT event_type, bucket,
         round(CAST(bucket * 5.0 AS DOUBLE), 6) AS bucket_lo,
         count(*) AS n
  FROM (
    SELECT event_type,
           CASE WHEN "value" < 0.0 THEN CAST(-1 AS BIGINT)
                WHEN "value" >= 500.0 THEN CAST(100 AS BIGINT)
                ELSE CAST(floor(("value" - 0.0) / 5.0) AS BIGINT) END AS bucket
    FROM events
  ) GROUP BY event_type, bucket
),
cum AS (
  SELECT event_type, bucket_lo, n,
         CAST(sum(n) OVER (
           PARTITION BY event_type ORDER BY bucket_lo) AS BIGINT) AS cum,
         CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
  FROM hist
),
qv AS (SELECT unnest(CAST([0.5, 0.95, 0.99] AS DOUBLE[])) AS q)
SELECT event_type, qv.q AS q, bucket_lo AS est_lo, cum
FROM cum CROSS JOIN qv
WHERE cum >= ceil(qv.q * total) AND cum - n < ceil(qv.q * total)"""


# Hop-bounded weighted shortest paths (graph/traverse.py
# weighted_shortest_paths): min over enumerated walks of ≤ 3 weighted
# edges from source 3 — the declarative twin of 3 Bellman–Ford rounds.
# Weight (src+dst) % 5 + 1 is symmetric, matching the symmetrized view.
ORACLES["graph_weighted_paths"] = f"""\
WITH RECURSIVE {EDGES_SQL}, {BI_SQL},
wbi AS (SELECT src, dst, (src + dst) % 5 + 1 AS w FROM bi),
walk(id, d, hops) AS (
  SELECT CAST(3 AS BIGINT) AS id, CAST(0 AS BIGINT) AS d, 0 AS hops
  UNION ALL
  SELECT wbi.dst, walk.d + wbi.w, walk.hops + 1
  FROM walk JOIN wbi ON wbi.src = walk.id
  WHERE walk.hops < 3
)
SELECT id, CAST(min(d) AS BIGINT) AS dist FROM walk GROUP BY id"""


# BPE merge candidates (functions/text.py bpe_merge_candidates): top-20
# adjacent-pair counts, ties (x, y) asc.
ORACLES["docs_bpe_merge_candidates"] = f"""\
WITH toksrc AS (
  SELECT doc_id, {TOKENIZE.format(col='text')} AS t FROM documents
),
bi AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> struct_pack(x := t[i], y := t[i + 1])))
           AS p
  FROM toksrc WHERE len(t) >= 2
)
SELECT p.x AS x, p.y AS y, count(*) AS cnt
FROM bi GROUP BY p.x, p.y
ORDER BY cnt DESC, x ASC, y ASC
LIMIT 20"""


def _bpe_train_sql(k: int, final_words: str | None = None) -> str:
    """Generated k-round BPE training twin (functions/text.py
    bpe_train). Each round: weighted adjacent-pair count over the word
    table (p{{n}}), deterministic argmax (t{{n}}: cnt desc, (x, y)
    asc), then the greedy leftmost non-overlapping in-word merge.

    Spark applies the merge as a left fold; SQL has no list fold, so
    the twin uses the equivalent gaps-and-islands form: explode
    positions, mark pair matches m(i) = (s_i, s_{{i+1}}) = (x, y), and
    take the ODD-ranked matches within each consecutive-match island —
    exactly the positions a left-to-right greedy scan merges (within a
    run of overlapping matches, every other one fires, starting with
    the first). Rows following a taken position are consumed.

    CTEs that feed scalar subqueries are MATERIALIZED — inlined, the
    t{{n}} references re-expand the whole upstream chain exponentially
    (the un-hinted form exhausted file handles re-scanning parquet).

    ``final_words='encode_heldout'`` is the INFERENCE twin
    (functions/text.py bpe_encode_tokens_per_doc): training runs on
    the TRAIN hash-split only; the fitted merges t1..tk then replay —
    the identical island machinery, ``n``-prefixed CTEs — over the
    held-out TEST split's distinct words, so out-of-vocabulary words
    segment too; final = per-held-out-doc subword sum."""
    heldout = final_words == "encode_heldout"
    corpus = (
        f"(SELECT text FROM documents WHERE {_BUCKET} < 8000)"
        if heldout
        else "documents"
    )

    def apply_round(pfx: str, n: int, src: str) -> list[str]:
        """The greedy leftmost non-overlapping merge of t{n} applied to
        word table ``src`` → {pfx}w{n} (gaps-and-islands, odd-ranked
        matches taken — see the docstring proof)."""
        return [
            f"""{pfx}x{n} AS (
  SELECT word, freq, unnest(generate_series(1, len(syms))) AS i, syms
  FROM {src}
)""",
            f"""{pfx}m{n} AS (
  SELECT word, freq, i, syms[i] AS s,
         (i < len(syms) AND syms[i] = (SELECT x FROM t{n})
          AND syms[i + 1] = (SELECT y FROM t{n})) AS m
  FROM {pfx}x{n}
)""",
            f"""{pfx}g{n} AS (
  SELECT *, i - row_number() OVER (PARTITION BY word, m ORDER BY i) AS grp
  FROM {pfx}m{n}
)""",
            f"""{pfx}k{n} AS (
  SELECT *, m AND (row_number()
        OVER (PARTITION BY word, m, grp ORDER BY i) % 2 = 1) AS taken
  FROM {pfx}g{n}
)""",
            f"""{pfx}w{n} AS MATERIALIZED (
  SELECT word, freq,
         list(CASE WHEN taken THEN s || (SELECT y FROM t{n}) ELSE s END
              ORDER BY i) AS syms
  FROM (SELECT *, coalesce(lag(taken)
              OVER (PARTITION BY word ORDER BY i), false) AS prev_taken
        FROM {pfx}k{n})
  WHERE NOT prev_taken
  GROUP BY word, freq
)""",
        ]

    parts = [
        f"""w0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq,
         list_transform(generate_series(1, length(word)),
                        i -> substr(word, i, 1)) AS syms
  FROM (SELECT unnest({TOKENIZE.format(col='text')}) AS word
        FROM {corpus})
  GROUP BY word
)"""
    ]
    for n in range(1, k + 1):
        p = n - 1
        parts.append(
            f"""p{n} AS MATERIALIZED (
  SELECT q.x AS x, q.y AS y, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
           i -> struct_pack(x := syms[i], y := syms[i + 1]))) AS q
    FROM w{p} WHERE len(syms) >= 2
  ) GROUP BY q.x, q.y
)"""
        )
        parts.append(
            f"""t{n} AS MATERIALIZED (
  SELECT {n} AS step, x, y, x || y AS merged, cnt FROM p{n}
  ORDER BY cnt DESC, x ASC, y ASC LIMIT 1
)"""
        )
        if n < k or (final_words and not heldout):
            parts.extend(apply_round("", n, f"w{p}"))
    if heldout:
        parts.append(
            f"""nw0 AS MATERIALIZED (
  SELECT word, CAST(1 AS BIGINT) AS freq,
         list_transform(generate_series(1, length(word)),
                        i -> substr(word, i, 1)) AS syms
  FROM (SELECT DISTINCT unnest({TOKENIZE.format(col='text')}) AS word
        FROM documents WHERE {_BUCKET} >= 9000)
)"""
        )
        for n in range(1, k + 1):
            parts.extend(apply_round("n", n, f"nw{n - 1}"))
        final = f"""SELECT d.doc_id AS doc_id,
       CAST(sum(len(w.syms)) AS BIGINT) AS n_subwords
FROM (SELECT doc_id, unnest({TOKENIZE.format(col='text')}) AS word
      FROM documents WHERE {_BUCKET} >= 9000) d
JOIN nw{k} w ON d.word = w.word
GROUP BY d.doc_id"""
        return "WITH " + ",\n".join(parts) + "\n" + final
    if final_words == "subword_counts":
        final = f"""SELECT subword, CAST(sum(freq) AS BIGINT) AS cnt FROM (
  SELECT unnest(syms) AS subword, freq FROM w{k}
) GROUP BY subword
ORDER BY cnt DESC, subword ASC
LIMIT 20"""
        return "WITH " + ",\n".join(parts) + "\n" + final
    if final_words == "tokens_per_doc":
        final = f"""SELECT d.doc_id AS doc_id,
       CAST(sum(len(w.syms)) AS BIGINT) AS n_subwords
FROM (SELECT doc_id, unnest({TOKENIZE.format(col='text')}) AS word
      FROM documents) d
JOIN w{k} w ON d.word = w.word
GROUP BY d.doc_id"""
        return "WITH " + ",\n".join(parts) + "\n" + final
    union = "\nUNION ALL\n".join(f"SELECT * FROM t{n}" for n in range(1, k + 1))
    return "WITH " + ",\n".join(parts) + "\n" + union + "\nORDER BY step"


# Streaming BPE pair mining (streaming/rollup.py
# StreamingTokenPairRollup): drained additive integer counts == the
# one-pass batch bigram count; same top-20 relation.
ORACLES["streaming_bpe_pairs"] = ORACLES["docs_bpe_merge_candidates"]


# Iterative BPE training (functions/text.py bpe_train, k=8).
ORACLES["docs_bpe_vocab_k8"] = _bpe_train_sql(8)

# BPE encode/apply (functions/text.py bpe_subword_counts): top-20
# subword corpus frequencies after the same 8 merges — the vocabulary
# relation explodes; the corpus is never re-read.
ORACLES["docs_bpe_subword_counts"] = _bpe_train_sql(8, "subword_counts")

# BPE corpus encode (functions/text.py bpe_tokens_per_doc): per-doc
# subword counts via the word → segment-length vocabulary join.
ORACLES["docs_bpe_tokens_per_doc"] = _bpe_train_sql(8, "tokens_per_doc")

# BPE inference encode (functions/text.py bpe_encode_tokens_per_doc):
# train on the train hash-split, replay the fitted merges over the
# held-out split's words (OOV included). The streaming form drains to
# the identical relation (each doc lives in exactly one micro-batch).
ORACLES["docs_bpe_encode_heldout"] = _bpe_train_sql(8, "encode_heldout")
ORACLES["streaming_bpe_encode"] = ORACLES["docs_bpe_encode_heldout"]


# Feature hashing (functions/text.py hashed_features): same md5-prefix
# hash, bucket = h % 256, sign from bit 8, signed-count sum.
ORACLES["docs_hashed_features"] = f"""\
WITH toksrc AS (
  SELECT doc_id, {TOKENIZE.format(col='text')} AS tokens FROM documents
),
tok AS (SELECT doc_id, unnest(tokens) AS token FROM toksrc),
h AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(token), 1, 15)) AS BIGINT) AS h
  FROM tok
)
SELECT doc_id, CAST(h % 256 AS BIGINT) AS bucket,
       CAST(sum(((h >> 8) & 1) * 2 - 1) AS BIGINT) AS weight
FROM h GROUP BY doc_id, h % 256"""


# DSIR importance weights (functions/text.py dsir_weights): hashed
# unigram LM log-ratio, target = lang 'en', add-one over 256 buckets.
ORACLES["docs_dsir_weights"] = f"""\
WITH toksrc AS (
  SELECT doc_id, lang, {TOKENIZE.format(col='text')} AS tokens
  FROM documents
),
tok AS (
  SELECT doc_id, (lang = 'en') AS is_target,
         CAST(CAST(concat('0x', substr(md5(token), 1, 15)) AS BIGINT)
              % 256 AS BIGINT) AS b
  FROM (SELECT doc_id, lang, unnest(tokens) AS token FROM toksrc)
),
model AS (
  SELECT b, CAST(count(*) AS BIGINT) AS c_raw,
         CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS c_tgt
  FROM tok GROUP BY b
),
tot AS (
  SELECT CAST(sum(c_raw) AS DOUBLE) AS tot_raw,
         CAST(sum(c_tgt) AS DOUBLE) AS tot_tgt
  FROM model
),
lr AS (
  SELECT b, ln((c_tgt + 1) / (tot_tgt + 256))
           - ln((c_raw + 1) / (tot_raw + 256)) AS lr
  FROM model, tot
),
per AS (
  SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c FROM tok
  GROUP BY doc_id, b
)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
       round(sum(c * lr), 6) AS logratio
FROM per JOIN lr USING (b) GROUP BY doc_id"""


# Snapshot change feed (streaming/table.py table_changes): the same
# old/new pair diffed with EXCEPT ALL (bag semantics) + key-presence
# classification — the SQL statement of the operator's contract.
ORACLES["orders_snapshot_changes"] = """\
WITH old AS (SELECT * FROM orders),
nw AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice * 2
              ELSE o_totalprice END AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 7 <> 0
  UNION ALL
  SELECT o_orderkey + 1000000, o_custkey, o_orderstatus, o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 13 = 0
),
ins AS (SELECT * FROM nw EXCEPT ALL SELECT * FROM old),
rem AS (SELECT * FROM old EXCEPT ALL SELECT * FROM nw)
SELECT o_orderkey, 'insert' AS change FROM ins
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM old)
UNION ALL
SELECT o_orderkey, 'update_post' AS change FROM ins
WHERE o_orderkey IN (SELECT o_orderkey FROM old)
UNION ALL
SELECT o_orderkey, 'update_pre' AS change FROM rem
WHERE o_orderkey IN (SELECT o_orderkey FROM nw)
UNION ALL
SELECT o_orderkey, 'delete' AS change FROM rem
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM nw)"""


# Negative edge sampling (graph/linkpred.py negative_edge_samples):
# same md5-rank proposal, same collision drops.
ORACLES["graph_negative_samples"] = f"""\
WITH {EDGES_SQL}, {BI_SQL},
verts AS (SELECT DISTINCT src AS id FROM bi),
ranked AS (SELECT id, row_number() OVER (ORDER BY id) AS rn FROM verts),
nv AS (SELECT count(*) AS n_verts FROM verts),
prop AS (
  SELECT e.src AS u,
         CAST(concat('0x', substr(md5(
           CAST(e.src AS VARCHAR) || ':' || CAST(e.dst AS VARCHAR)
         ), 1, 15)) AS BIGINT) % (SELECT n_verts FROM nv) + 1 AS rn
  FROM edges e
),
cand AS (
  SELECT p.u, rk.id AS v_neg FROM prop p JOIN ranked rk ON rk.rn = p.rn
)
SELECT u, v_neg FROM cand c
WHERE u <> v_neg
  AND NOT EXISTS (
    SELECT 1 FROM bi WHERE bi.src = c.u AND bi.dst = c.v_neg)"""


# Deterministic random walks (graph/walks.py deterministic_walks):
# per-step argmin of md5(step:walker:candidate) over the distinct
# neighbor set, T=3 unrolled.
def _walk_step(t: int) -> str:
    h = (
        f"md5(CAST({t} AS VARCHAR) || ':' || CAST(c.walk_id AS VARCHAR)"
        " || ':' || CAST(n.dst AS VARCHAR))"
    )
    prev = "w0" if t == 1 else f"s{t - 1}"
    return f"""s{t} AS (
  SELECT walk_id, v AS cur FROM (
    SELECT c.walk_id, n.dst AS v,
      row_number() OVER (
        PARTITION BY c.walk_id ORDER BY {h}, n.dst) AS r
    FROM {prev} c JOIN nbr n ON n.src = c.cur
  ) WHERE r = 1
)"""


ORACLES["graph_walks"] = f"""\
WITH {EDGES_SQL}, {BI_SQL},
nbr AS (SELECT DISTINCT src, dst FROM bi),
w0 AS (SELECT DISTINCT src AS walk_id, src AS cur FROM nbr),
{_walk_step(1)},
{_walk_step(2)},
{_walk_step(3)}
SELECT walk_id, 0 AS step, walk_id AS vertex FROM w0
UNION ALL SELECT walk_id, 1 AS step, cur AS vertex FROM s1
UNION ALL SELECT walk_id, 2 AS step, cur AS vertex FROM s2
UNION ALL SELECT walk_id, 3 AS step, cur AS vertex FROM s3"""


# Skip-gram pairs over the walk corpus (graph/walks.py skipgram_pairs):
# the same walks CTE chain, windowed ordered self-join, (u, v) counts.
ORACLES["graph_skipgram_pairs"] = f"""\
WITH {EDGES_SQL}, {BI_SQL},
nbr AS (SELECT DISTINCT src, dst FROM bi),
w0 AS (SELECT DISTINCT src AS walk_id, src AS cur FROM nbr),
{_walk_step(1)},
{_walk_step(2)},
{_walk_step(3)},
walks AS (
  SELECT walk_id, 0 AS step, walk_id AS vertex FROM w0
  UNION ALL SELECT walk_id, 1 AS step, cur AS vertex FROM s1
  UNION ALL SELECT walk_id, 2 AS step, cur AS vertex FROM s2
  UNION ALL SELECT walk_id, 3 AS step, cur AS vertex FROM s3
)
SELECT a.vertex AS u, b.vertex AS v, count(*) AS cnt
FROM walks a JOIN walks b
  ON a.walk_id = b.walk_id
 AND a.step <> b.step
 AND abs(a.step - b.step) <= 2
GROUP BY a.vertex, b.vertex"""


# Interval-overlap join (operators/intervals.py sessions_status_overlap):
# DuckDB states the raw range predicate directly — the bucketized Spark
# plan must land on identical pairs and exact integer overlaps. Open
# run ends use the declared 2100-01-01 sentinel (4102444800000000 us).
ORACLES["sessions_status_overlap"] = f"""\
WITH {_SESSIONIZE},
sstats AS (
  SELECT user_id, session_seq,
         min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
  FROM sess GROUP BY user_id, session_seq
),
dim_src AS (
  SELECT event_id, user_id, ts, event_type
  FROM events WHERE event_type IN ('signup', 'error')
),
runs0 AS (
  SELECT event_id, user_id, ts, event_type FROM (
    SELECT event_id, user_id, ts, event_type,
           lag(event_type) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ) AS prev_type
    FROM dim_src
  ) WHERE prev_type IS NULL OR prev_type <> event_type
),
runs AS (
  SELECT user_id, status_event_id, status_type, r_start,
         coalesce(r_end, 4102444800000000) AS r_end
  FROM (
    SELECT user_id, event_id AS status_event_id,
           event_type AS status_type,
           epoch_us(ts) AS r_start,
           epoch_us(lead(ts) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC)) AS r_end,
           row_number() OVER (
             PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM runs0
  ) WHERE rn = 1
)
SELECT s.user_id, s.session_seq, r.status_event_id, r.status_type,
       CAST(least(s.end_us, r.r_end) - greatest(s.start_us, r.r_start)
            AS BIGINT) AS overlap_us
FROM sstats s JOIN runs r
  ON s.user_id = r.user_id
 AND s.start_us < r.r_end
 AND r.r_start <= s.end_us"""


# TPC-H Q7-flavored cross-nation trade (operators/warehouse.py
# nation_trade_volume): nation joined in two roles, cross-border only,
# exact-decimal revenue.
ORACLES["nation_trade_volume"] = f"""\
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(CAST(SUM({_DPRICE} * (1 - {_DDISC})) AS DOUBLE), 4) AS revenue
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name <> sn.n_name
GROUP BY cn.n_name, sn.n_name, year(l_shipdate)"""


def _unigram_sql(rounds: int, final: str, seed_cap: int = 48, max_len: int = 4) -> str:
    """Generated unigram-LM tokenizer twin (functions/text.py
    unigram_vocab / unigram_tokens_per_doc; Kudo 2018). Mirrors the
    engine's recurrence EXACTLY: piece probabilities are single IEEE
    divisions of exact integer counts, Viterbi scores are left-to-right
    IEEE products, ties break on the lexicographically smaller pieces
    list — so both engines compute bit-identical doubles and no
    rounding declaration is needed (see the text.py section comment's
    uniqueness proof).

    The per-word Viterbi DP is one DuckDB ``list_reduce`` whose
    accumulator is the DP table (list of best-entry structs, index =
    position + 1); the ≤max_len predecessor candidates are unrolled in
    the generated SQL (DuckDB 1.0 mis-binds variables captured by
    NESTED lambdas and drops list-typed struct fields carried through a
    struct accumulator — both bugs are avoided by keeping the
    accumulator a plain list and the candidate scan lambda-free), with
    piece lookups against a 1-row piece→p MAP. CTEs are MATERIALIZED
    (the BPE twins' file-handle lesson).

    ``final='encode_heldout'`` is the INFERENCE twin
    (functions/text.py unigram_encode_tokens_per_doc): training runs on
    the TRAIN hash-split only; the fitted model then encodes the
    held-out TEST split's distinct words with the UNK fold variant —
    out-of-vocabulary CHARACTERS fall back to single-char pieces at
    0.5/total (strictly dominated by any real char; the declared
    SentencePiece-UNK analogue, one exact IEEE division in both
    engines); final = per-held-out-doc piece sum."""
    sent = "struct_pack(s := CAST(0.0 AS DOUBLE), ps := CAST([] AS VARCHAR[]))"

    def pick(a: str, b: str) -> str:
        return (
            f"(CASE WHEN ({b}).s > ({a}).s OR (({b}).s = ({a}).s "
            f"AND ({b}).ps < ({a}).ps) THEN ({b}) ELSE ({a}) END)"
        )

    def make_fold(unk: bool) -> str:
        def cand(w: int) -> str:
            piece = f"substr(word, len(acc) - {w} + 1, {w})"
            prev = f"list_extract(acc, len(acc) - {w} + 1)"
            fallback = "unk" if (w == 1 and unk) else "CAST(0.0 AS DOUBLE)"
            p = (
                f"coalesce(list_extract(map_extract(vmap, {piece}), 1), "
                f"{fallback})"
            )
            return (
                f"(CASE WHEN len(acc) >= {w} AND {p} > 0.0 THEN "
                f"struct_pack(s := ({prev}).s * {p}, "
                f"ps := ({prev}).ps || [{piece}]) ELSE {sent} END)"
            )

        best = cand(1)
        for w in range(2, max_len + 1):
            best = pick(best, cand(w))
        return f"""list_extract(list_reduce(
      [[struct_pack(s := CAST(1.0 AS DOUBLE), ps := CAST([] AS VARCHAR[]))]] ||
      list_transform(generate_series(1, len(word)),
                     j -> CAST([] AS STRUCT(s DOUBLE, ps VARCHAR[])[])),
      (acc, x) -> acc || [{best}]
    ), len(word) + 1)"""

    fold = make_fold(unk=False)

    def vm(n: int, with_unk: bool = False) -> str:
        unk_col = ",\n         0.5 / t.total AS unk" if with_unk else ""
        return f"""vm{n} AS MATERIALIZED (
  SELECT map(list(piece ORDER BY piece),
             list(CAST(cnt AS DOUBLE) / t.total ORDER BY piece)) AS vmap{unk_col}
  FROM v{n}, (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM v{n}) t
  GROUP BY t.total
)"""

    heldout = final == "encode_heldout"
    corpus = (
        f"(SELECT text FROM documents WHERE {_BUCKET} < 8000)"
        if heldout
        else "documents"
    )
    parts = [
        f"""w0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest({TOKENIZE.format(col='text')}) AS word FROM {corpus})
  GROUP BY word
)""",
        f"""seedcand AS MATERIALIZED (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT w.freq, substr(w.word, q.i + 1, q.width) AS piece
    FROM w0 w, LATERAL (
      SELECT i, width
      FROM unnest(generate_series(0, len(w.word) - 1)) AS s(i),
           unnest(generate_series(1, {max_len})) AS t(width)
      WHERE i + width <= len(w.word)
    ) q
  ) GROUP BY piece
)""",
        f"""v0 AS MATERIALIZED (
  SELECT piece, max(cnt) AS cnt FROM (
    (SELECT piece, cnt FROM seedcand
     ORDER BY cnt DESC, piece ASC LIMIT {seed_cap})
    UNION ALL
    SELECT piece, cnt FROM seedcand WHERE length(piece) = 1
  ) GROUP BY piece
)""",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(vm(p))
        parts.append(
            f"""vit{r} AS MATERIALIZED (
  SELECT word, freq, {fold} AS fin FROM w0, vm{p}
)"""
        )
        parts.append(
            f"""use{r} AS MATERIALIZED (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS used
  FROM (SELECT unnest(fin.ps) AS piece, freq FROM vit{r})
  GROUP BY piece
)"""
        )
        parts.append(
            f"""v{r} AS MATERIALIZED (
  SELECT piece, cnt FROM (
    SELECT v.piece,
           CAST(CASE WHEN length(v.piece) = 1
                THEN greatest(coalesce(u.used, 0), 1)
                ELSE coalesce(u.used, 0) END AS BIGINT) AS cnt
    FROM v{p} v LEFT JOIN use{r} u ON v.piece = u.piece
  ) WHERE cnt > 0
)"""
        )
    if final == "vocab":
        tail = f"SELECT piece, cnt FROM v{rounds} ORDER BY cnt DESC, piece ASC"
        return "WITH " + ",\n".join(parts) + "\n" + tail
    if heldout:
        # inference: fitted model + UNK fold over the TEST split's
        # distinct words, then the per-held-out-doc piece sum
        parts.append(vm(rounds, with_unk=True))
        parts.append(
            f"""nw AS MATERIALIZED (
  SELECT DISTINCT unnest({TOKENIZE.format(col='text')}) AS word
  FROM documents WHERE {_BUCKET} >= 9000
)"""
        )
        parts.append(
            f"""seg AS MATERIALIZED (
  SELECT word, CAST(len(({make_fold(unk=True)}).ps) AS BIGINT) AS n
  FROM nw, vm{rounds}
)"""
        )
        tail = f"""SELECT d.doc_id AS doc_id, CAST(sum(s.n) AS BIGINT) AS n_pieces
FROM (SELECT doc_id, unnest({TOKENIZE.format(col='text')}) AS word
      FROM documents WHERE {_BUCKET} >= 9000) d
JOIN seg s ON d.word = s.word
GROUP BY d.doc_id"""
        return "WITH " + ",\n".join(parts) + "\n" + tail
    # encode: per-word Viterbi piece count under the FITTED model, then
    # the per-doc sum over the exploded corpus
    parts.append(vm(rounds))
    parts.append(
        f"""seg AS MATERIALIZED (
  SELECT word, CAST(len(({fold}).ps) AS BIGINT) AS n FROM w0, vm{rounds}
)"""
    )
    tail = f"""SELECT d.doc_id AS doc_id, CAST(sum(s.n) AS BIGINT) AS n_pieces
FROM (SELECT doc_id, unnest({TOKENIZE.format(col='text')}) AS word
      FROM documents) d
JOIN seg s ON d.word = s.word
GROUP BY d.doc_id"""
    return "WITH " + ",\n".join(parts) + "\n" + tail


# Unigram-LM tokenizer training (functions/text.py unigram_vocab): the
# fitted (piece, cnt) vocabulary after 3 hard-EM rounds.
ORACLES["docs_unigram_vocab"] = _unigram_sql(3, "vocab")

# Unigram-LM corpus encode (functions/text.py unigram_tokens_per_doc):
# per-document Viterbi piece count under the fitted model.
ORACLES["docs_unigram_encode"] = _unigram_sql(3, "encode")

# Unigram-LM inference encode (functions/text.py
# unigram_encode_tokens_per_doc): train on the TRAIN hash-split, encode
# the held-out TEST split with the UNK fold.
ORACLES["docs_unigram_encode_heldout"] = _unigram_sql(3, "encode_heldout")


# Learned quality-classifier margins (functions/text.py
# quality_classifier_margin): hashed features x the declared constant
# integer weight relation (md5 of the bucket id folded into
# [-1000, 1000]) -> exact BIGINT margin per doc.
ORACLES["docs_quality_classifier"] = f"""\
WITH toksrc AS (
  SELECT doc_id, {TOKENIZE.format(col='text')} AS tokens FROM documents
),
h AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(token), 1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(tokens) AS token FROM toksrc)
),
feat AS (
  SELECT doc_id, CAST(h % 256 AS BIGINT) AS bucket,
         CAST(sum(((h >> 8) & 1) * 2 - 1) AS BIGINT) AS weight
  FROM h GROUP BY doc_id, h % 256
),
model AS (
  SELECT CAST(b AS BIGINT) AS bucket,
         CAST(CAST(concat('0x', substr(md5(CAST(b AS VARCHAR)), 1, 15))
                   AS BIGINT) % 2001 - 1000 AS BIGINT) AS w
  FROM generate_series(0, 255) AS t(b)
)
SELECT f.doc_id AS doc_id, CAST(sum(m.w * f.weight) AS BIGINT) AS margin
FROM feat f JOIN model m ON f.bucket = m.bucket
GROUP BY f.doc_id"""


# Bigram LM fluency gate (functions/text.py bigram_logprob_scores):
# Jelinek-Mercer interpolated adjacent-pair log-likelihood, self-scored.
# The unigram complement weight is embedded as the EXACT double the
# engine computes (repr of 1.0 - lam) — see BIGRAM_LAM's note.
def _bigram_logprob_sql(lam: float = 0.8) -> str:
    return f"""\
WITH toksrc AS (
  SELECT doc_id, {TOKENIZE.format(col='text')} AS tokens FROM documents
),
pairs AS (
  SELECT doc_id, q.x AS x, q.y AS y FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(tokens) - 1),
           i -> struct_pack(x := tokens[i], y := tokens[i + 1]))) AS q
    FROM toksrc WHERE len(tokens) >= 2
  )
),
c2 AS (SELECT x, y, count(*) AS cnt2 FROM pairs GROUP BY x, y),
uni AS (SELECT unnest(tokens) AS w FROM toksrc),
c1 AS (SELECT w, count(*) AS cnt1 FROM uni GROUP BY w),
tot AS (SELECT count(*) AS t_all FROM uni),
scored AS (
  SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         round(avg(ln(CAST({lam!r} AS DOUBLE) * (c2.cnt2 / cx.cnt1)
                      + CAST({1.0 - lam!r} AS DOUBLE)
                        * (cy.cnt1 / (SELECT t_all FROM tot)))), 6)
           AS bigram_logprob
  FROM pairs p
  JOIN c2 ON p.x = c2.x AND p.y = c2.y
  JOIN c1 cx ON p.x = cx.w
  JOIN c1 cy ON p.y = cy.w
  GROUP BY p.doc_id
)
SELECT d.doc_id AS doc_id,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       s.bigram_logprob AS bigram_logprob
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id"""


ORACLES["docs_bigram_logprob"] = _bigram_logprob_sql(0.8)


# Interpolated trigram gate with absolute discounting (functions/
# text.py trigram_logprob_scores): identical expression tree — the
# discount D embedded as the same double literal, max() via greatest
# against CAST(0 AS DOUBLE), and the same parenthesization — so the
# only cross-engine divergence is avg() summation order, absorbed by
# the declared 6dp rounding (the bigram gate's discipline).
def _trigram_logprob_sql(d: float = 0.75) -> str:
    return f"""\
WITH toksrc AS MATERIALIZED (
  SELECT doc_id, {TOKENIZE.format(col='text')} AS tokens FROM documents
),
tri AS MATERIALIZED (
  SELECT doc_id, q.x AS x, q.y AS y, q.z AS z FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(tokens) - 2),
           i -> struct_pack(x := tokens[i], y := tokens[i + 1],
                            z := tokens[i + 2]))) AS q
    FROM toksrc WHERE len(tokens) >= 3
  )
),
pairs AS MATERIALIZED (
  SELECT q.x AS x, q.y AS y FROM (
    SELECT unnest(list_transform(generate_series(1, len(tokens) - 1),
           i -> struct_pack(x := tokens[i], y := tokens[i + 1]))) AS q
    FROM toksrc WHERE len(tokens) >= 2
  )
),
c3 AS MATERIALIZED (SELECT x, y, z, count(*) AS cnt3 FROM tri GROUP BY x, y, z),
c2 AS MATERIALIZED (SELECT x, y, count(*) AS cnt2 FROM pairs GROUP BY x, y),
f3 AS MATERIALIZED (SELECT x, y, count(*) AS n1p3 FROM c3 GROUP BY x, y),
f2 AS MATERIALIZED (SELECT x, count(*) AS n1p2 FROM c2 GROUP BY x),
uni AS MATERIALIZED (SELECT unnest(tokens) AS w FROM toksrc),
c1 AS MATERIALIZED (SELECT w, count(*) AS cnt1 FROM uni GROUP BY w),
tot AS MATERIALIZED (SELECT count(*) AS t_all FROM uni),
scored AS (
  SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
    round(avg(ln(
      greatest(c3.cnt3 - CAST({d!r} AS DOUBLE), CAST(0 AS DOUBLE)) / c2xy.cnt2
      + ((CAST({d!r} AS DOUBLE) * f3.n1p3) / c2xy.cnt2)
        * (greatest(c2yz.cnt2 - CAST({d!r} AS DOUBLE), CAST(0 AS DOUBLE)) / cy.cnt1
           + ((CAST({d!r} AS DOUBLE) * f2.n1p2) / cy.cnt1)
             * (cz.cnt1 / (SELECT t_all FROM tot)))
    )), 6) AS trigram_logprob
  FROM tri p
  JOIN c3 ON p.x = c3.x AND p.y = c3.y AND p.z = c3.z
  JOIN c2 c2xy ON p.x = c2xy.x AND p.y = c2xy.y
  JOIN f3 ON p.x = f3.x AND p.y = f3.y
  JOIN c2 c2yz ON p.y = c2yz.x AND p.z = c2yz.y
  JOIN f2 ON p.y = f2.x
  JOIN c1 cy ON p.y = cy.w
  JOIN c1 cz ON p.z = cz.w
  GROUP BY p.doc_id
)
SELECT d.doc_id AS doc_id,
       CAST(coalesce(s.n_trigrams, 0) AS BIGINT) AS n_trigrams,
       s.trigram_logprob AS trigram_logprob
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id"""


ORACLES["docs_trigram_logprob"] = _trigram_logprob_sql(0.75)


def _kn_trigram_logprob_sql(d: float = 0.75) -> str:
    """Interpolated Kneser-Ney trigram (functions/text.py
    kn_trigram_logprob_scores): highest level raw counts, lower levels
    CONTINUATION type counts — N1+(·yz) from trigram types, N1+(·z)
    from bigram types, Chen-&-Goodman gammas on the same tables."""
    return f"""\
WITH kntok AS MATERIALIZED (
  SELECT doc_id, {TOKENIZE.format(col='text')} AS tokens FROM documents
),
kntri AS MATERIALIZED (
  SELECT doc_id, q.x AS x, q.y AS y, q.z AS z FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(tokens) - 2),
           i -> struct_pack(x := tokens[i], y := tokens[i + 1],
                            z := tokens[i + 2]))) AS q
    FROM kntok WHERE len(tokens) >= 3
  )
),
knpairs AS MATERIALIZED (
  SELECT q.x AS x, q.y AS y FROM (
    SELECT unnest(list_transform(generate_series(1, len(tokens) - 1),
           i -> struct_pack(x := tokens[i], y := tokens[i + 1]))) AS q
    FROM kntok WHERE len(tokens) >= 2
  )
),
knc3 AS MATERIALIZED (
  SELECT x, y, z, count(*) AS cnt3 FROM kntri GROUP BY x, y, z),
knc2 AS MATERIALIZED (
  SELECT x, y, count(*) AS cnt2 FROM knpairs GROUP BY x, y),
knf3 AS MATERIALIZED (
  SELECT x, y, count(*) AS n1p3 FROM knc3 GROUP BY x, y),
kncont2 AS MATERIALIZED (
  SELECT y, z, count(*) AS cont2 FROM knc3 GROUP BY y, z),
knmid AS MATERIALIZED (
  SELECT y, count(*) AS midy FROM knc3 GROUP BY y),
knnf2 AS MATERIALIZED (
  SELECT y, count(*) AS nf2 FROM kncont2 GROUP BY y),
kncont1 AS MATERIALIZED (
  SELECT y AS z, count(*) AS cont1 FROM knc2 GROUP BY y),
knbt AS MATERIALIZED (SELECT count(*) AS btypes FROM knc2),
knscored AS (
  SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
    round(avg(ln(
      greatest(c3.cnt3 - CAST({d!r} AS DOUBLE), CAST(0 AS DOUBLE)) / c2xy.cnt2
      + ((CAST({d!r} AS DOUBLE) * f3.n1p3) / c2xy.cnt2)
        * (greatest(ct.cont2 - CAST({d!r} AS DOUBLE), CAST(0 AS DOUBLE)) / m.midy
           + ((CAST({d!r} AS DOUBLE) * nf.nf2) / m.midy)
             * (c1.cont1 / (SELECT btypes FROM knbt)))
    )), 6) AS kn_logprob
  FROM kntri p
  JOIN knc3 c3 ON p.x = c3.x AND p.y = c3.y AND p.z = c3.z
  JOIN knc2 c2xy ON p.x = c2xy.x AND p.y = c2xy.y
  JOIN knf3 f3 ON p.x = f3.x AND p.y = f3.y
  JOIN kncont2 ct ON p.y = ct.y AND p.z = ct.z
  JOIN knmid m ON p.y = m.y
  JOIN knnf2 nf ON p.y = nf.y
  JOIN kncont1 c1 ON p.z = c1.z
  GROUP BY p.doc_id
)
SELECT d.doc_id AS doc_id,
       CAST(coalesce(s.n_trigrams, 0) AS BIGINT) AS n_trigrams,
       s.kn_logprob AS kn_logprob
FROM documents d LEFT JOIN knscored s ON d.doc_id = s.doc_id"""


ORACLES["docs_kn_logprob"] = _kn_trigram_logprob_sql(0.75)


# Streaming classifier gate (streaming/rollup.py StreamingQualityGate):
# drained per-doc margin table == the batch classifier application.
ORACLES["streaming_quality_gate"] = ORACLES["docs_quality_classifier"]


# Per-source boilerplate n-gram removal (operators/dedup.py
# boilerplate_grams / strip_boilerplate / boilerplate_stats — the CCNet
# repeated-line strip with the line unit adapted to word 3-grams).
# Identical frozen analyzer; the stripped fingerprint is md5 of the
# token-rejoined clean text in BOTH engines, so the check is exact.
_BOILER_N = 3
_BOILER_MIN_DOCS = 3
_BOILER_CTES = f"""\
WITH toks AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, source, CAST(i AS BIGINT) AS pos,
         array_to_string(ws[i:i+{_BOILER_N}-1], ' ') AS gram
  FROM toks, unnest(range(1, len(ws) - {_BOILER_N} + 2)) AS t(i)
),
boiler AS (
  SELECT source, gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM grams GROUP BY source, gram
  HAVING count(DISTINCT doc_id) >= {_BOILER_MIN_DOCS}
),
dpos AS (
  SELECT g.doc_id, g.source, g.pos
  FROM grams g JOIN boiler b ON g.source = b.source AND g.gram = b.gram
),
covered AS (
  SELECT DISTINCT doc_id, pos + k AS wi
  FROM dpos, unnest(range(0, {_BOILER_N})) AS r(k)
)"""

ORACLES["docs_boilerplate_grams"] = f"""\
{_BOILER_CTES}
SELECT source, gram, n_docs FROM boiler"""

_BOILER_CLEAN_CTES = f"""\
{_BOILER_CTES},
words AS (
  SELECT t.doc_id, CAST(i AS BIGINT) AS wi, ws[CAST(i AS INT)] AS w
  FROM toks t, unnest(range(1, len(ws) + 1)) AS u(i)
),
clean AS (
  SELECT w.doc_id,
         string_agg(w.w, ' ' ORDER BY w.wi)
           FILTER (WHERE c.wi IS NULL) AS clean_text,
         count(*) FILTER (WHERE c.wi IS NOT NULL) AS n_removed
  FROM words w
  LEFT JOIN covered c ON c.doc_id = w.doc_id AND c.wi = w.wi
  GROUP BY w.doc_id
)"""

ORACLES["docs_boilerplate_stripped"] = f"""\
{_BOILER_CLEAN_CTES}
SELECT t.doc_id,
       CAST(coalesce(cl.n_removed, 0) AS BIGINT) AS n_removed,
       md5(CASE WHEN cl.doc_id IS NULL THEN array_to_string(t.ws, ' ')
                ELSE coalesce(cl.clean_text, '') END) AS clean_fp
FROM toks t LEFT JOIN clean cl ON cl.doc_id = t.doc_id"""

ORACLES["docs_boilerplate_stats"] = f"""\
{_BOILER_CTES},
nb AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_boiler_grams
  FROM boiler GROUP BY source
),
pd AS (SELECT doc_id, count(*) AS rm FROM covered GROUP BY doc_id),
expo AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS docs_affected,
         CAST(sum(pd.rm) AS BIGINT) AS words_removed
  FROM pd JOIN documents d USING (doc_id) GROUP BY d.source
)
SELECT s.source,
       coalesce(nb.n_boiler_grams, 0) AS n_boiler_grams,
       coalesce(expo.docs_affected, 0) AS docs_affected,
       coalesce(expo.words_removed, 0) AS words_removed
FROM (SELECT DISTINCT source FROM documents) s
LEFT JOIN nb USING (source)
LEFT JOIN expo USING (source)"""


# SQ8 scalar quantization (operators/similarity.py sq8_codes /
# ann_sq8_rerank — faiss QT_8bit shape). The grid stats are order-free
# min/max aggregates and every code is a fixed-order IEEE expression
# with an exact floor, so codes are bit-identical cross-engine; the
# approximate scan + exact rerank reuse the blessed _DOT/list_sum
# operation tree. CAST(255 AS DOUBLE) avoids the DECIMAL promotion the
# driver hash rejects.
_SQ8_CTES = """\
WITH vecs AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
dim AS (
  SELECT pos, min(x) AS mn, max(x) AS mx FROM (
    SELECT unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM vecs
  ) GROUP BY pos
),
stats AS (
  SELECT list(mn ORDER BY pos) AS mins,
         list(mx - mn ORDER BY pos) AS ranges
  FROM dim
),
codes AS (
  SELECT vec_id,
    list_transform(range(1, 65), i ->
      CAST(CASE WHEN s.ranges[i] > 0
        THEN floor((v[i] - s.mins[i]) * CAST(255 AS DOUBLE) / s.ranges[i]
                   + 0.5)
        ELSE 0 END AS INT)) AS codes
  FROM vecs, stats s
)"""

ORACLES["emb_sq8_codes"] = f"""\
{_SQ8_CTES}
SELECT vec_id,
       CAST(list_sum(codes) AS BIGINT) AS code_sum,
       md5(array_to_string(codes, ',')) AS code_fp
FROM codes"""

ORACLES["ann_sq8_rerank"] = f"""\
{_SQ8_CTES},
norms AS (
  SELECT vec_id, v, list_sum(list_transform(v, x -> x * x)) AS n2 FROM vecs
),
recon AS (
  SELECT c.vec_id,
    list_transform(range(1, 65), i ->
      s.mins[i] + c.codes[i] * (s.ranges[i] / CAST(255 AS DOUBLE))) AS rv
  FROM codes c, stats s
),
rnorm AS (
  SELECT vec_id, rv, list_sum(list_transform(rv, x -> x * x)) AS rn2
  FROM recon
),
q AS (
  SELECT vec_id AS query_id, v AS qv, n2 AS qn2 FROM norms
  WHERE vec_id IN ({_qid_list})
),
cand AS (
  SELECT q.query_id, r.vec_id,
    round({_DOT.format(a="q.qv", b="r.rv")} / (sqrt(q.qn2) * sqrt(r.rn2)), 6)
      AS acos
  FROM rnorm r CROSS JOIN q WHERE r.vec_id <> q.query_id
),
short AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
      row_number() OVER (PARTITION BY query_id
                         ORDER BY acos DESC, vec_id ASC) AS rr
    FROM cand
  ) WHERE rr <= 50
),
scored AS (
  SELECT s.query_id, n.vec_id AS neighbor_id,
    round({_DOT.format(a="q.qv", b="n.v")} / (sqrt(q.qn2) * sqrt(n.n2)), 6)
      AS cos
  FROM short s
  JOIN norms n ON n.vec_id = s.vec_id
  JOIN q ON q.query_id = s.query_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT query_id, neighbor_id, cos,
    CAST(row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS INT)
      AS rank
  FROM scored
) WHERE rank <= 10"""


# Duplicate-aware soft training weights (operators/dedup.py
# soft_dedup_weights): the clusters oracle's final SELECT becomes a CTE;
# per-cluster sizes then a fan-out-1 left join back over the corpus.
# CAST(1 AS DOUBLE) keeps the division double-typed (no DECIMAL).
_CLW = ORACLES["dedup_clusters"]
_CLW_SPLIT = _CLW.rindex("SELECT node AS doc_id")
ORACLES["docs_soft_dedup_weights"] = (
    _CLW[:_CLW_SPLIT].rstrip().rstrip(",")
    + """,
cl AS (
  SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node
),
cl_sizes AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
  FROM cl GROUP BY cluster_id
),
pd AS (
  SELECT cl.doc_id, s.cluster_size FROM cl JOIN cl_sizes s USING (cluster_id)
)
SELECT a.doc_id,
  CAST(coalesce(pd.cluster_size, 1) AS BIGINT) AS cluster_size,
  round(CAST(1 AS DOUBLE) / coalesce(pd.cluster_size, 1), 6) AS weight
FROM aug a LEFT JOIN pd USING (doc_id)"""
)

# Streaming boilerplate strip (streaming/boilerplate.py): dictionary
# trained in batch and frozen; drained replay of the corpus ==
# the batch strip (shared strip core).
ORACLES["streaming_boilerplate"] = ORACLES["docs_boilerplate_stripped"]

# Drained streaming image dedup == batch phash_pairs (streaming/
# mediadedup.py StreamingImageDeduper convergence contract).
ORACLES["streaming_media_phash"] = ORACLES["dedup_media_phash"]

# Streaming AV copy detection (streaming/avdedup.py): drained
# incremental indexes must equal the batch matchers on the same
# corpora — the streaming queries share the batch oracles verbatim.
ORACLES["streaming_video_phash"] = ORACLES["dedup_video_pairs"]
ORACLES["streaming_video_clips"] = ORACLES["dedup_video_clip_pairs"]
ORACLES["streaming_audio_pairs"] = ORACLES["dedup_audio_pairs"]


# Split-representativeness audit (operators/quality.py
# split_source_balance): the contingency grid over (source x split)
# including empty cells; expected counts and chi-square terms are
# fixed-order IEEE expressions over exact integer counts (BIGINT/BIGINT
# division is DOUBLE in both engines), rounded at 6dp for display.
ORACLES["split_source_balance"] = f"""\
WITH d AS (
  SELECT source,
    CASE WHEN {_BUCKET} < 8000 THEN 'train'
         WHEN {_BUCKET} < 9000 THEN 'dev'
         ELSE 'test' END AS split
  FROM documents
),
obs AS (
  SELECT source, split, CAST(count(*) AS BIGINT) AS n
  FROM d GROUP BY source, split
),
st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src FROM d GROUP BY source),
sp AS (
  SELECT dom.split, CAST(coalesce(cnt.n_split, 0) AS BIGINT) AS n_split
  FROM (VALUES ('train'), ('dev'), ('test')) AS dom(split)
  LEFT JOIN (
    SELECT split, CAST(count(*) AS BIGINT) AS n_split FROM d GROUP BY split
  ) cnt ON cnt.split = dom.split
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM d)
SELECT st.source, sp.split,
  CAST(coalesce(obs.n, 0) AS BIGINT) AS n,
  round(st.n_src * sp.n_split / t.n_all, 6) AS n_expected,
  round(CASE WHEN sp.n_split = 0 THEN CAST(0 AS DOUBLE)
        ELSE (coalesce(obs.n, 0) - st.n_src * sp.n_split / t.n_all)
             * (coalesce(obs.n, 0) - st.n_src * sp.n_split / t.n_all)
             / (st.n_src * sp.n_split / t.n_all) END, 6) AS chi2_term
FROM st CROSS JOIN sp CROSS JOIN tot t
LEFT JOIN obs ON obs.source = st.source AND obs.split = sp.split"""


# Sparse random projection, Johnson-Lindenstrauss (operators/
# similarity.py rp_project / ann_rp_rerank): deterministic Achlioptas
# entries in {-1,0,+1} from the same pure-integer recipe both engines
# evaluate (disjoint salt from the LSH planes); each projected
# coordinate is the blessed list_sum dot, so projections are
# bit-identical cross-engine.
_RP_PROJ = """\
proj AS MATERIALIZED (
  SELECT vec_id,
    list_transform(range(1, 17), i ->
      list_sum(list_transform(range(1, 65), j ->
        v[j] * (CASE
                WHEN ((i * 2003 + j) * 2654435761) % 2001 < 334
                  THEN CAST(1 AS DOUBLE)
                WHEN ((i * 2003 + j) * 2654435761) % 2001 < 667
                  THEN CAST(-1 AS DOUBLE)
                ELSE CAST(0 AS DOUBLE) END)))) AS pv
  FROM vecs
)"""

ORACLES["emb_rp_projections"] = f"""\
WITH {_VEC.format(src="embeddings")},
{_RP_PROJ}
SELECT vec_id, CAST(i AS INT) AS dim, round(pv[i], 6) AS val
FROM proj, unnest(range(1, 17)) AS t(i)"""

ORACLES["ann_rp_rerank"] = f"""\
WITH {_VEC.format(src="embeddings")},
{_RP_PROJ},
pn AS (
  SELECT vec_id, pv, list_sum(list_transform(pv, x -> x * x)) AS pn2
  FROM proj
),
qp AS (
  SELECT vec_id AS query_id, pv AS qpv, pn2 AS qpn2 FROM pn
  WHERE vec_id IN ({_qid_list})
),
cand AS (
  SELECT qp.query_id, p.vec_id,
    round(list_sum(list_transform(range(1, 17), i -> qp.qpv[i] * p.pv[i]))
          / (sqrt(qp.qpn2) * sqrt(p.pn2)), 6) AS acos
  FROM pn p CROSS JOIN qp WHERE p.vec_id <> qp.query_id
),
short AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
      row_number() OVER (PARTITION BY query_id
                         ORDER BY acos DESC, vec_id ASC) AS rr
    FROM cand
  ) WHERE rr <= 100
),
q AS (
  SELECT vec_id AS query_id, v AS qv, n2 AS qn2 FROM norms
  WHERE vec_id IN ({_qid_list})
),
scored AS (
  SELECT s.query_id, n.vec_id AS neighbor_id,
    round({_DOT.format(a="q.qv", b="n.v")} / (sqrt(q.qn2) * sqrt(n.n2)), 6)
      AS cos
  FROM short s
  JOIN norms n ON n.vec_id = s.vec_id
  JOIN q ON q.query_id = s.query_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT query_id, neighbor_id, cos,
    CAST(row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS INT)
      AS rank
  FROM scored
) WHERE rank <= 10"""


# RP ∘ SQ8 composition (operators/similarity.py pinned_rp_sq8 /
# ann_rp_sq8_rerank): quantize the 16-dim projection — both stages'
# formulas verbatim, so the composed codes are bit-identical too.
_RP_SQ8_CTES = f"""\
WITH {_VEC.format(src="embeddings")},
{_RP_PROJ},
dim16 AS (
  SELECT pos, min(x) AS mn, max(x) AS mx FROM (
    SELECT unnest(pv) AS x, generate_subscripts(pv, 1) AS pos FROM proj
  ) GROUP BY pos
),
stats16 AS (
  SELECT list(mn ORDER BY pos) AS mins,
         list(mx - mn ORDER BY pos) AS ranges
  FROM dim16
),
codes16 AS (
  SELECT vec_id,
    list_transform(range(1, 17), i ->
      CAST(CASE WHEN s.ranges[i] > 0
        THEN floor((pv[i] - s.mins[i]) * CAST(255 AS DOUBLE) / s.ranges[i]
                   + 0.5)
        ELSE 0 END AS INT)) AS codes
  FROM proj, stats16 s
)"""

ORACLES["emb_rp_sq8_codes"] = f"""\
{_RP_SQ8_CTES}
SELECT vec_id,
       CAST(list_sum(codes) AS BIGINT) AS code_sum,
       md5(array_to_string(codes, ',')) AS code_fp
FROM codes16"""

ORACLES["ann_rp_sq8_rerank"] = f"""\
{_RP_SQ8_CTES},
recon16 AS (
  SELECT c.vec_id,
    list_transform(range(1, 17), i ->
      s.mins[i] + c.codes[i] * (s.ranges[i] / CAST(255 AS DOUBLE))) AS rv
  FROM codes16 c, stats16 s
),
rn AS (
  SELECT vec_id, rv, list_sum(list_transform(rv, x -> x * x)) AS rn2
  FROM recon16
),
pn AS (
  SELECT vec_id, pv, list_sum(list_transform(pv, x -> x * x)) AS pn2
  FROM proj
),
qp AS (
  SELECT vec_id AS query_id, pv AS qpv, pn2 AS qpn2 FROM pn
  WHERE vec_id IN ({_qid_list})
),
cand AS (
  SELECT qp.query_id, r.vec_id,
    round(list_sum(list_transform(range(1, 17), i -> qp.qpv[i] * r.rv[i]))
          / (sqrt(qp.qpn2) * sqrt(r.rn2)), 6) AS acos
  FROM rn r CROSS JOIN qp WHERE r.vec_id <> qp.query_id
),
short AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
      row_number() OVER (PARTITION BY query_id
                         ORDER BY acos DESC, vec_id ASC) AS rr
    FROM cand
  ) WHERE rr <= 100
),
q AS (
  SELECT vec_id AS query_id, v AS qv, n2 AS qn2 FROM norms
  WHERE vec_id IN ({_qid_list})
),
scored AS (
  SELECT s.query_id, n.vec_id AS neighbor_id,
    round({_DOT.format(a="q.qv", b="n.v")} / (sqrt(q.qn2) * sqrt(n.n2)), 6)
      AS cos
  FROM short s
  JOIN norms n ON n.vec_id = s.vec_id
  JOIN q ON q.query_id = s.query_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT query_id, neighbor_id, cos,
    CAST(row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS INT)
      AS rank
  FROM scored
) WHERE rank <= 10"""
