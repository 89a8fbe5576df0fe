"""Train/test contamination detection by n-gram shingle overlap.

A training-data pipeline that splits a corpus (operators/sampling.py
``hash_split``) must verify the split: a test document sharing long
token n-grams with any train document leaks evaluation data into
training. The standard check (public practice from GPT-3/PaLM/Llama
dataset reports) flags test documents whose token shingles also occur
anywhere in the train split.

Plan shape, built to survive 100 TB:

- Each side is tokenized with the engine-wide frozen analyzer
  (search/index.py ``tokenize``) and exploded into *distinct* n-token
  shingles per document — ``array_distinct`` before the explode keeps a
  document from emitting the same shingle twice.
- The train side is reduced to the distinct shingle SET (no doc ids) —
  so the contamination join has fan-out exactly 1 per (test doc,
  shingle): a shingle occurring in a million train docs is still ONE
  row on the build side. This is what keeps the join safe under
  power-law shingle frequency; no df-cap is needed (contrast
  dedup.py's pair-generating ngram join, which needs one).
- Join key is the 64-bit md5 prefix of the shingle, not the shingle
  string: the shuffle carries 16 bytes instead of ~50+ per row. Both
  sides (and the DuckDB oracle) hash identically, so parity is exact;
  a collision merging two distinct shingles is the same declared
  md5-prefix boundary as every other key in this engine.
- A left join back onto the distinct test-doc relation keeps
  zero-overlap documents in the report (n_overlap = 0), so the result
  is a complete audit table, not just the flagged subset.

Shuffle budget: one explode+distinct per side, one equi-join on the
shingle hash, one count aggregation by doc — all with map-side partial
aggregation; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..search.index import tokenize

NGRAM_N = 8  # token shingle width — the published contamination norm


def _shingle_hashes(toks: Column, n: int) -> Column:
    """Distinct n-token shingles of a MATERIALIZED token-array column as
    64-bit md5-prefix hex. Short documents (< n tokens) shingle to the
    empty array — the guard matters because ``F.sequence(1, stop)`` runs
    DESCENDING when stop < 1 (same pattern as dedup._shingles).

    ``toks`` must be a column REFERENCE, not an inline ``tokenize(...)``
    expression: the transform lambda below re-evaluates its outer
    expressions per element (no subexpression elimination across the
    lambda boundary), so an inlined tokenize re-ran the regexp split per
    shingle. Callers project the token array first (dedup.shingle_bag
    has the same barrier)."""
    m = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), m - F.lit(n - 1)),
        lambda i: F.substring(
            F.md5(F.concat_ws(" ", F.slice(toks, i, n)).cast("binary")), 1, 16
        ),
    )
    return F.array_distinct(
        F.when(m >= F.lit(n), grams).otherwise(F.array().cast("array<string>"))
    )


def contamination_report(
    docs: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    split_col: str = "split",
    train: str = "train",
    test: str = "test",
    n: int = NGRAM_N,
) -> DataFrame:
    """Per test document: (key, n_shingles, n_overlap, contaminated).

    ``n_overlap`` counts the test document's distinct shingles that occur
    anywhere in the train split; ``contaminated`` = n_overlap > 0.
    Documents shorter than ``n`` tokens have no shingles and report 0.
    """
    sh = F.col("_sh")
    test_docs = (
        docs.filter(F.col(split_col) == test)
        .select(F.col(key), tokenize(F.col(text)).alias("_toks"))
        .select(F.col(key), _shingle_hashes(F.col("_toks"), n).alias("_shs"))
    )
    test_sh = test_docs.select(key, F.explode("_shs").alias("_sh"))
    train_sh = (
        docs.filter(F.col(split_col) == train)
        .select(tokenize(F.col(text)).alias("_toks"))
        .select(F.explode(_shingle_hashes(F.col("_toks"), n)).alias("_sh"))
        .distinct()
    )
    hits = (
        test_sh.join(train_sh, "_sh")
        .groupBy(key)
        .agg(F.count(sh).alias("n_overlap"))
    )
    base = test_docs.select(
        key, F.size("_shs").cast("long").alias("n_shingles")
    )
    return (
        base.join(hits, key, "left")
        .select(
            key,
            "n_shingles",
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminated_train(
    docs: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    split_col: str = "split",
    train: str = "train",
    test: str = "test",
    n: int = NGRAM_N,
) -> DataFrame:
    """The audit's ACTIONABLE mirror (the GPT-3/Llama decontamination
    direction: prune TRAIN, keep the eval set intact): drop every train
    document sharing ≥ 1 distinct n-token shingle with ANY test
    document; return the surviving train ids (key, n_shingles).

    Plan shape mirrors ``contamination_report`` with the sides
    swapped: the TEST split reduces to the distinct shingle SET (no doc
    ids — fan-out 1 per train shingle regardless of how many test docs
    share it), train shingles semi-join it, and offending ids
    anti-join out of the train relation. Train docs too short to
    shingle can't leak and always survive."""
    from ..pinned import pinned

    def _build():
        return (
            docs.filter(F.col(split_col) == train)
            .select(F.col(key), tokenize(F.col(text)).alias("_toks"))
            .select(
                F.col(key), _shingle_hashes(F.col("_toks"), n).alias("_shs")
            ),
        )

    # The shingled train relation is a PINNED index: it feeds BOTH the
    # offender derivation and the final anti-join, and — worse — the
    # explode below makes InferFiltersFromGenerate push size/notnull
    # filters back through the projections, re-INLINING the whole
    # tokenize+shingle+md5 expression into a scan-level Filter that
    # re-evaluates it per row (measured 3x the query cost at sf0.1,
    # 7.9 s → 1.6 s materialized). Pinning is the optimizer barrier,
    # the single-scan guarantee, AND warm serving.
    (train_docs,) = pinned(
        ("decontam_train_sh", docs.semanticHash(), key, int(n)), _build
    )
    test_sh = (
        docs.filter(F.col(split_col) == test)
        .select(tokenize(F.col(text)).alias("_toks"))
        .select(F.explode(_shingle_hashes(F.col("_toks"), n)).alias("_sh"))
        .distinct()
    )
    bad = (
        train_docs.select(key, F.explode("_shs").alias("_sh"))
        .join(test_sh, "_sh", "left_semi")
        .select(key)
        .distinct()
    )
    return (
        train_docs.join(bad, key, "left_anti")
        .select(key, F.size("_shs").cast("long").alias("n_shingles"))
    )


def neardup_contamination(
    docs: DataFrame,
    threshold: float = 0.5,
    key: str = "doc_id",
    text: str = "text",
    split_col: str = "split",
    train: str = "train",
    test: str = "test",
) -> DataFrame:
    """FUZZY train/test leakage: near-duplicate pairs ACROSS the split
    boundary — (train_doc_id, test_doc_id, jaccard ≥ threshold). The
    exact-shingle audit (``contamination_report``) misses paraphrased
    or lightly-edited benchmark leaks; production pipelines therefore
    also run the fuzzy pass (GPT-3's 13-gram fuzzy benchmark dedup is
    the public precedent). Reuses the near-dup engine wholesale: word
    3-shingle MinHash signatures, banded LSH buckets, exact Jaccard
    verify — with the candidate join RESTRICTED to train×test pairs,
    so within-split duplicates (a dedup concern, not a leakage one)
    never reach verification.

    Scale: identical bounds to ``dedup_minhash_lsh`` — candidates are
    bucket-local band joins (never all-pairs), the exact verify runs
    only on cross-split candidates, and the split tags ride a
    projection of the corpus scan (no second pass). The verified audit
    relation is PINNED per (corpus, threshold, split labels) — it is
    exactly the leakage report a pipeline materializes once per
    snapshot (the dedup_minhash_lsh verified-table precedent); release
    re-pays the signature pipeline."""
    from ..pinned import pinned

    (audit,) = pinned(
        (
            "neardup_contam",
            docs.semanticHash(),
            float(threshold),
            key,
            text,
            split_col,
            train,
            test,
        ),
        lambda: (
            _neardup_contamination_build(
                docs, threshold, key, text, split_col, train, test
            ),
        ),
    )
    return audit


def _neardup_contamination_build(
    docs: DataFrame,
    threshold: float,
    key: str,
    text: str,
    split_col: str,
    train: str,
    test: str,
) -> DataFrame:
    from .dedup import (
        banded_signatures,
        minhash_signatures_from_shingles,
        shingle_bag,
        verify_jaccard,
    )

    base = docs.select(F.col(key).alias("doc_id"), F.col(text).alias("text"),
                       F.col(split_col).alias("_split"))
    bag = shingle_bag(base.select("doc_id", "text"))
    banded = banded_signatures(minhash_signatures_from_shingles(bag))
    tags = base.select("doc_id", "_split")
    tr = (
        banded.join(tags.filter(F.col("_split") == train), "doc_id")
        .select(F.col("doc_id").alias("doc_a"), "band", "sig")
    )
    te = (
        banded.join(tags.filter(F.col("_split") == test), "doc_id")
        .select(F.col("doc_id").alias("doc_b"), "band", "sig")
    )
    cands = tr.join(te, ["band", "sig"]).select("doc_a", "doc_b").distinct()
    # exact verify only for docs that appear in some cross-split pair
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .unionAll(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    shingles = bag.join(cand_docs, "doc_id", "left_semi").dropDuplicates(
        ["doc_id", "shingle"]
    )
    return (
        verify_jaccard(cands, shingles)
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("doc_a").alias("train_doc_id"),
            F.col("doc_b").alias("test_doc_id"),
            "jaccard",
        )
    )
