"""PySpark-native analytics engine with the query and data-processing
capabilities of aws-samples/social-graph-based-people-recommender-using-
amazon-neptune-and-textract ("Octember Bizcard").

The reference is an AWS application whose query execution is delegated to
Elasticsearch (full-text search) and Neptune (graph / PYMK). This package
reimplements the *semantics* natively on Spark DataFrames:

- ``functions.parse``  — the record-parsing scalar operators (SURVEY §2.2,
  O11–O25): regex extraction, truncated-md5 identity, positional projection.
- ``graph``            — vertices/edges DataFrames + join-based traversals
  (SURVEY §2.4, O30–O38), including the flagship 2-hop PYMK.
- ``search``           — tokenize → inverted index → BM25 with field boosts
  → top-k (SURVEY §2.3, O26–O29).
- ``operators``        — keyed last-write-wins upsert (O6/O7), top-k,
  dedup family (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  embedding-cosine), similarity search (brute-force + LSH ANN).
- ``sources``          — testdata loaders, the declared reference→testdata
  mapping, the Textract OCR stub boundary (O5), multimodal binary columns.
- ``streaming``        — Structured Streaming wrapper (O1–O4) running the
  same batch functions via ``foreachBatch``.
- ``plans``            — helpers asserting physical-plan properties
  (pushdown, broadcast, whole-stage codegen) used by tests.

Everything is expressed with built-in ``pyspark.sql.functions`` so Catalyst
can push filters, prune columns and pick join strategies; Python UDFs are
confined to explicitly-marked stub boundaries (OCR decode, multimodal
decode).
"""

__version__ = "0.1.0"
