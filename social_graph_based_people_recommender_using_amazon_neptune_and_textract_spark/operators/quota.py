"""Per-group selection quotas — domain balancing and stratified
sampling, the corpus-composition controls of a pretraining pipeline.

Web-scale corpora are dominated by a few giant domains; public curation
stacks (C4, RefinedWeb, Dolma) cap documents per domain so the mixture
is not 40% one boilerplate site. The same machinery with a per-stratum
FRACTION instead of a cap is exact stratified sampling — the
evaluation-split counterpart (docs_hash_sample is the cheap
Bernoulli-by-hash form; this one hits the allocation exactly).

Both select deterministically: rows are preferred by md5 of their id —
a fixed pseudo-random order both engines compute identically — with the
id itself as the total tie-break.

Scale: ``domain_quota`` is the skew case (one domain can hold a
billion rows, and a plain per-domain window sorts ALL of them in one
task). The cap is small, so the two-phase top-k applies: phase 1 ranks
within (domain, salt) — ``N_SALTS`` parallel tasks per hot domain —
and keeps ≤ cap rows each; phase 2 re-ranks the ≤ cap·N_SALTS
survivors per domain, a bounded relation regardless of corpus size.
``stratified_sample`` keeps a per-stratum FRACTION — the kept set is
corpus-sized, so bounded-survivor salting cannot apply; the per-stratum
sort is the honest cost of exact allocation (range-partition within
stratum at cluster scale; callers who can tolerate ±ε use
docs_hash_sample instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Phase-1 fan-out for the salted per-domain top-k. 16 tasks per hot
#: domain; survivors entering phase 2 are ≤ 16·cap per domain.
N_SALTS = 16


def _pref(id_col: str):
    """The deterministic preference order: md5(id) then id."""
    return [
        F.md5(F.col(id_col).cast("string")).asc(),
        F.col(id_col).asc(),
    ]


def domain_quota(
    df: DataFrame,
    cap: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` rows per domain, preferred by md5(id).
    Returns (domain, id, rk) with rk ∈ [1, cap] — rk is the final
    within-domain preference rank, so downstream tightening (a smaller
    cap) is a filter, not a re-rank."""
    salted = df.select(domain_col, id_col).withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(N_SALTS)),
    )
    w1 = Window.partitionBy(domain_col, "__salt").orderBy(*_pref(id_col))
    survivors = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= cap)
        .drop("__salt", "__r1")
    )
    w2 = Window.partitionBy(domain_col).orderBy(*_pref(id_col))
    return (
        survivors.withColumn("rk", F.row_number().over(w2).cast("long"))
        .filter(F.col("rk") <= cap)
    )


def stratified_sample(
    df: DataFrame,
    frac: float,
    strata_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Exact proportional stratified sample: floor(frac · n_s) rows per
    stratum s, preferred by md5(id). Returns (stratum, id, rk).

    The allocation relation (one row per stratum) rides a broadcast;
    the kept set hits the per-stratum count exactly — the property the
    Bernoulli form only approximates."""
    alloc = (
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("__n_s"))
        .select(
            strata_col,
            F.floor(F.col("__n_s") * F.lit(frac)).alias("__alloc"),
        )
    )
    w = Window.partitionBy(strata_col).orderBy(*_pref(id_col))
    return (
        df.select(strata_col, id_col)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .join(F.broadcast(alloc), strata_col)
        .filter(F.col("rk") <= F.col("__alloc"))
        .drop("__alloc")
    )
