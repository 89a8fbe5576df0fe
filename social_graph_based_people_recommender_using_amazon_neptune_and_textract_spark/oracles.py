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

ORACLES["graph_counts"] = f"""\
WITH {EDGES_SQL}, {VERTICES_SQL}
SELECT (SELECT count(*) FROM vertices) AS vertex_count,
       (SELECT count(*) FROM edges) AS edge_count"""

ORACLES["one_hop_paths"] = f"""\
WITH {EDGES_SQL}, {VERTICES_SQL}
SELECT vs.name AS src_name, vd.name AS dst_name
FROM edges e
JOIN vertices vs ON e.src = vs.id
JOIN vertices vd ON e.dst = vd.id"""

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

ORACLES["bizcard_parse"] = f"""\
WITH {BIZCARD_LINES_SQL}, {PARSED_SQL}
SELECT s3_bucket, s3_key, owner, company, name, job_title,
       email, phone_number, addr, created_at
FROM parsed"""

ORACLES["bizcards"] = f"""\
WITH {BIZCARDS_CTES}
SELECT * FROM bizcards"""

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

ORACLES["status_latest"] = """\
SELECT user_id, event_id, event_type, value,
       strftime(ts, '%Y%m%d%H%M%S') AS mts
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
  ) AS rn FROM events
) WHERE rn = 1"""
