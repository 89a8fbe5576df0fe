"""Mergeable distinct-count sketches (Apache DataSketches HLL, built
into Spark 3.5+ as ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``).

The 100 TB story exact COUNT(DISTINCT) cannot tell: build a fixed-size
sketch per fine grain ONCE (per day, per partition file), persist the
binary, and answer every coarser rollup — weekly, monthly, arbitrary
day sets — by MERGING sketches, never re-scanning the fact. Merge is
register-wise max: associative, commutative, idempotent — exactly the
algebra partial aggregation and incremental pipelines need (a late
backfill just re-sketches its day and the rollup re-merges).

Accuracy is the standard HLL relative standard error ~1.04/sqrt(2^lgK)
(~1.6% at the default lgK=12). Estimates are NOT bit-stable across
partitionings (partial-merge structure perturbs the register set while
in sparse mode), so there is no DuckDB oracle — the registered query is
rows-only by declaration, and the suite pins the error bound against
the exact count plus the merge-vs-direct consistency instead (the same
evidence style as the multimodal codec boundary).

The exact twin (``rolling_active_users``-style countDistinct) remains
the oracle-checked path; this module is its declared drop-in for scales
where exactness stops being worth a fact re-scan per rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_user_sketches(events: DataFrame, lg_k: int = 12) -> DataFrame:
    """(day, sketch): one fixed-size HLL binary per day — the persisted
    sketch table every coarser distinct rollup merges from. One
    map-side-combined aggregate; sketch size is 2^lg_k registers
    regardless of row count."""
    return events.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sketch")
    )


def rollup_distinct_users(
    daily: DataFrame, period_col=None
) -> DataFrame:
    """Merge daily sketches to a coarser period (default: calendar
    month) and estimate distinct users per period — no fact access,
    work ∝ #days, not #events."""
    period = (
        period_col
        if period_col is not None
        else F.date_trunc("month", F.col("day")).cast("date").alias("month")
    )
    return daily.groupBy(period).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("users_est")
    )


def monthly_distinct_users(events: DataFrame, lg_k: int = 12) -> DataFrame:
    """End-to-end composition: sketch per day, merge per month."""
    return rollup_distinct_users(daily_user_sketches(events, lg_k))
