"""Skew-mitigated aggregation: two-phase (salted) group-count.

Celebrity vertices are the canonical skew hazard in the social graph
(SURVEY §4): a single hot key turns one reducer into the job's critical
path. AQE's skew-join splitting covers *joins*; for aggregations whose
per-key state is associative, pre-splitting the key space is the classic
fix:

    phase 1: groupBy(key, salt)  — hot key spreads over S reducers
    phase 2: groupBy(key).sum()  — S partial rows per key re-combine

For plain count/sum Spark's map-side partial aggregation already bounds
hot-key damage (each task emits one partial row per key), so salting is
pointless there. It matters when phase 1 carries *large per-group state*
that map-side combine can't compress — collect_set, approx-distinct
sketches, top-k heaps — which is what ``salted_distinct_count``
demonstrates: distinct counting where one key holds a large value set.

The salt is deterministic (md5 of a companion column, not rand()) so
results are reproducible and the oracle can ignore it entirely —
the salt provably cancels out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def _salt(col, buckets: int):
    # string-cast first: ANSI mode forbids numeric→binary directly
    return (
        F.conv(
            F.substring(F.md5(col.cast("string").cast("binary")), 1, 8), 16, 10
        ).cast("long")
        % buckets
    )


def salted_distinct_count(
    df: DataFrame,
    key: str,
    value: str,
    buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """count(DISTINCT value) per key, skew-safe.

    Phase 1 deduplicates (key, salt, value) — each hot key's value set is
    spread over ``buckets`` reducers instead of one. Phase 2 sums the
    per-bucket distinct counts; correct because the salt is a pure
    function of the value, so a value lands in exactly one bucket and is
    counted exactly once."""
    salted = df.select(
        F.col(key), _salt(F.col(value), buckets).alias("__salt"), F.col(value)
    )
    per_bucket = (
        salted.dropDuplicates([key, "__salt", value])
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return (
        per_bucket.groupBy(key)
        .agg(F.sum("__partial").alias("n_distinct"))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Skew-spread INNER equi-join for the gap AQE doesn't cover.

    AQE's skew-join splitting rescues a skewed SORT-MERGE join by
    splitting oversized partitions — but it only fires per shuffle
    statistics and can't help when the small side is too big to
    broadcast AND the planner mis-estimates, or off-AQE deployments.
    Pre-salting is the deterministic fix: the BIG side gets a salt
    derived from its own key column (hot key spreads over ``buckets``
    reducers), the SMALL side is replicated once per salt bucket
    (explode of a literal range — its cost is buckets × |small|, the
    price of the spread), and the join key becomes (key, salt).

    Result ≡ plain inner join (the salt provably cancels: every big row
    meets every matching small row exactly once, in exactly one bucket).
    The salt on the big side is content-deterministic (same device as
    ``salted_distinct_count``), keyed by a hash of the whole ROW — NOT
    the join key: salting by the key alone would put all copies of the
    hot key in one bucket and spread nothing.
    """
    sb = [F.col(c) for c in big.columns]
    b = big.withColumn("_salt", F.pmod(F.xxhash64(*sb), F.lit(buckets)))
    s = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>")),
    )
    joined = b.join(
        s,
        (b[big_key] == s[small_key]) & (b["_salt"] == s["_salt"]),
        "inner",
    )
    return joined.drop("_salt")
