"""Deterministic hash-based sampling and dataset splitting.

Training pipelines need samples and train/dev/test splits that are
*stable*: re-running the job, adding executors, or re-partitioning the
input must not move a document between splits (leakage), and an
auditor must be able to recompute membership from the key alone.
``rand()``-based sampling fails all of these; keyed hashing is the
standard fix: bucket = md5(key) mod N, membership = bucket range.

md5-derived (like every hash in this engine) so the DuckDB oracle
reproduces membership bit-for-bit — sampling is oracle-checked, not
rows-only.

Scale: a narrow projection + filter — no shuffle, fully pushdown-
friendly, and the same row lands in the same split on any cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000


def _bucket(col):
    # md5 of the key's string form → first 8 hex digits → mod buckets
    return (
        F.conv(
            F.substring(F.md5(col.cast("string").cast("binary")), 1, 8), 16, 10
        ).cast("long")
        % N_BUCKETS
    )


def hash_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep ~fraction of rows, deterministically by key hash."""
    return df.filter(_bucket(F.col(key)) < int(fraction * N_BUCKETS))


#: The split domain hash_split emits — the KNOWN dimension audits
#: (split_source_balance) cross against, so a fully-empty split still
#: appears in their grids.
SPLIT_NAMES = ("train", "dev", "test")


def hash_split(
    df: DataFrame, key: str, train: float = 0.8, dev: float = 0.1
) -> DataFrame:
    """Adds a ``split`` column: train / dev / test by key-hash range.
    test gets the remainder (1 - train - dev)."""
    b = _bucket(F.col(key))
    t_hi = int(train * N_BUCKETS)
    d_hi = t_hi + int(dev * N_BUCKETS)
    split = (
        F.when(b < t_hi, F.lit("train"))
        .when(b < d_hi, F.lit("dev"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def stratified_topn(
    df: DataFrame, key: str, strata: str, n_per_stratum: int
) -> DataFrame:
    """Balanced per-stratum sample: exactly min(n, |stratum|) rows per
    stratum — the "equal docs per language" rebalancing step a skewed
    corpus needs, where a global fraction would just reproduce the skew.

    Rows rank within their stratum by the keyed md5 (the same hash as
    ``hash_sample``, so membership is auditable from the key alone, and
    adding rows to OTHER strata never changes a stratum's selection);
    the key itself breaks hash ties, making the sample a deterministic
    total function of (stratum, key).

    Scale: one shuffle on the strata column; heavily-skewed strata sort
    within partitions (window top-n); AQE splits skewed strata. For
    corpora where a single stratum dwarfs memory, pre-filter with
    ``hash_sample`` at a safe over-sampling fraction first and rank the
    survivors — the composition stays deterministic."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata).orderBy(
        _bucket(F.col(key)), F.col(key)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


#: 2^52 — the md5-derived uniform uses 13 hex digits (52 bits) so the
#: int → double conversion is EXACT (< 2^53); the subsequent divisions
#: are single correctly-rounded IEEE ops, so priorities are bit-identical
#: across engines (no libm: ln/pow would admit 1-ulp cross-engine drift).
_POW2_52 = float(1 << 52)


def weighted_priority(key, weight):
    """Sequential-Poisson sampling priority (Ohlsson 1998): u / w with
    u = (md5₅₂(key)+1) / 2^52 ∈ (0, 1]. Taking the k SMALLEST priorities
    yields an (approximate) probability-proportional-to-size sample —
    the standard design for "sample documents proportional to length"
    curation steps. Deterministic in the key, so membership is
    auditable and re-runs / repartitioning never move a row."""
    v = F.conv(
        F.substring(F.md5(key.cast("string").cast("binary")), 1, 13), 16, 10
    ).cast("long")
    u = (v + F.lit(1)).cast("double") / F.lit(_POW2_52)
    return u / weight.cast("double")


def weighted_sample(df: DataFrame, key: str, weight: str, k: int) -> DataFrame:
    """Top-k rows by sequential-Poisson priority — a deterministic
    weighted (PPS) sample. Rows with non-positive weight are excluded
    (zero weight = zero inclusion probability).

    Scale: priority is a narrow per-row expression; the global top-k
    plans as TakeOrderedAndProject (per-partition heaps + driver merge
    of k·P rows) — no global sort, no shuffle of the data itself."""
    out = df.filter(F.col(weight) > 0).withColumn(
        "priority", weighted_priority(F.col(key), F.col(weight))
    )
    return out.orderBy(F.col("priority").asc(), F.col(key).asc()).limit(k)


def source_mixture_weights(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled corpus mixing weights (the multilingual /
    multi-source sampling rule of mT5 and XLM-R, α = 0.5 here):
    w_i = f_i^α / Σ_j f_j^α over per-source token counts f_i — the
    exponent flattens the natural distribution so low-resource sources
    are up-sampled without drowning high-resource ones. Returns
    (source, n_docs, n_tokens, p_natural, p_alpha, boost) where boost =
    p_alpha / p_natural is the per-source repetition factor a sampler
    applies.

    α is FIXED at 1/2 so the power is ``sqrt`` — correctly rounded per
    IEEE 754 in every engine, unlike ``pow(x, 0.3)`` whose libm is only
    1-ulp-accurate and engine-dependent; the remaining sums of square
    roots are order-sensitive only below the 9dp display rounding.

    Scale: one corpus scan aggregating to a |sources|-row relation, a
    1-row total combined back by broadcast — nothing here grows with
    corpus size."""
    from ..search.index import tokenize

    from ..checkpoints import checkpoint

    per_src = (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(tokenize(F.col(text_col))))
            .cast("long")
            .alias("n_tokens"),
        )
    )
    # the |sources|-row aggregate feeds BOTH the totals branch and the
    # final projection; without materializing it each branch re-scans
    # the corpus (column pruning defeats ReuseExchange) — checkpoint
    # the tiny relation so 100 TB is tokenized once.
    per_src, _ids = checkpoint(per_src)
    totals = per_src.agg(
        F.sum("n_tokens").cast("double").alias("tot"),
        F.sum(F.sqrt(F.col("n_tokens").cast("double"))).alias("tot_a"),
    )
    return per_src.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("tot"), 9).alias("p_natural"),
        F.round(
            F.sqrt(F.col("n_tokens").cast("double")) / F.col("tot_a"), 9
        ).alias("p_alpha"),
        F.round(
            (F.sqrt(F.col("n_tokens").cast("double")) / F.col("tot_a"))
            / (F.col("n_tokens") / F.col("tot")),
            9,
        ).alias("boost"),
    )
